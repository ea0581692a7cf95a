"""Word-level DTW timestamps (pipeline/word_timing.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_tpu.pipeline.word_timing import (
    WordTiming,
    default_alignment_heads,
    dtw,
    median_filter,
    split_tokens_on_spaces,
)


def test_dtw_recovers_clean_diagonal():
    """A sharply diagonal similarity matrix aligns token i to frame ~i*M/N."""
    N, M = 6, 30
    sim = np.zeros((N, M))
    for i in range(N):
        sim[i, i * 5 : (i + 1) * 5] = 1.0
    ti, fi = dtw(-sim)
    # path is monotone in both indices
    assert (np.diff(ti) >= 0).all() and (np.diff(fi) >= 0).all()
    assert ti[0] == 0 and fi[0] == 0
    assert ti[-1] == N - 1 and fi[-1] == M - 1
    # each token's first frame is its block start (shifted one frame early
    # on the exact-tie boundaries by openai's strict-< tie-break, which
    # dtw() reproduces literally — see test_dtw_matches_openai_scalar)
    jumps = np.pad(np.diff(ti), (1, 0), constant_values=1).astype(bool)
    starts = fi[jumps]
    np.testing.assert_array_equal(starts, [0, 4, 9, 14, 19, 24])


def _dtw_openai_scalar(x):
    """Literal scalar transcription of openai whisper/timing.py dtw_cpu."""
    N, M = x.shape
    cost = np.full((N + 1, M + 1), np.inf)
    trace = -np.ones((N + 1, M + 1), dtype=np.int8)
    cost[0, 0] = 0.0
    for j in range(1, M + 1):
        for i in range(1, N + 1):
            c0 = cost[i - 1, j - 1]
            c1 = cost[i - 1, j]
            c2 = cost[i, j - 1]
            if c0 < c1 and c0 < c2:
                c, t = c0, 0
            elif c1 < c2:
                c, t = c1, 1
            else:
                c, t = c2, 2
            cost[i, j] = x[i - 1, j - 1] + c
            trace[i, j] = t
    i, j = N, M
    text, time = [], []
    while i > 0 or j > 0:
        text.append(i - 1)
        time.append(j - 1)
        t = trace[i, j] if (i > 0 and j > 0) else (1 if i > 0 else 2)
        if t == 0:
            i -= 1
            j -= 1
        elif t == 1:
            i -= 1
        else:
            j -= 1
    return np.array(text[::-1]), np.array(time[::-1])


def test_dtw_matches_openai_scalar():
    """The anti-diagonal-vectorized dtw() is cell-exact vs a literal scalar
    transcription of openai's dtw_cpu (incl. strict-< tie-breaks), fuzzed
    over random and tie-heavy matrices."""
    rng = np.random.default_rng(0)
    cases = [rng.standard_normal((7, 31)), rng.standard_normal((1, 9)),
             rng.standard_normal((5, 1)),
             rng.integers(0, 3, (10, 40)).astype(float)]  # heavy ties
    for x in cases:
        ti, fi = dtw(x)
        rti, rfi = _dtw_openai_scalar(x)
        np.testing.assert_array_equal(ti, rti)
        np.testing.assert_array_equal(fi, rfi)


def test_median_filter_basic():
    x = np.array([[1.0, 9.0, 1.0, 1.0, 9.0, 1.0, 1.0]])
    out = median_filter(x, 3)
    assert out.shape == x.shape
    # isolated spikes removed
    assert out[0, 1] == 1.0 and out[0, 4] == 1.0


def test_default_alignment_heads():
    m = default_alignment_heads(4, 6)
    assert m.shape == (4, 6)
    assert not m[:2].any() and m[2:].all()


def test_split_tokens_on_spaces():
    class V:
        token_eot = 100

        def token_bytes(self, t):
            return {1: b" hello", 2: b" wor", 3: b"ld", 4: b",", 5: b" bye"}[t]

    words, toks = split_tokens_on_spaces(V(), [1, 2, 3, 4, 5])
    assert words == [" hello", " world,", " bye"]
    assert toks == [[1], [2, 3], [4], [5]] or toks == [[1], [2, 3, 4], [5]]


def test_word_timestamps_monotone_and_bounded():
    """End-to-end on a synthetic model: word times must be monotone and lie
    within the segment window (VERDICT done-criterion)."""
    from fixtures import micro_config, random_tensors, synthetic_tokens
    from whisper_tpu.io.vocab import make_vocab
    from whisper_tpu.model.encoder import encode
    from whisper_tpu.model.params import params_from_ggml
    from whisper_tpu.pipeline.word_timing import find_word_timestamps

    cfg = micro_config(n_vocab=51864)
    params = jax.tree.map(
        jnp.asarray, params_from_ggml(random_tensors(cfg, seed=3), cfg)
    )
    vocab = make_vocab(cfg.n_vocab, synthetic_tokens(cfg.n_vocab), cfg.n_vocab)
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((1, cfg.n_mels, 2 * cfg.n_audio_ctx)).astype(np.float32)
    enc = encode(params, jnp.asarray(mel), cfg)

    text_tokens = [500, 600, 700, 800, 900, 1000]
    words = find_word_timestamps(
        params, cfg, vocab, enc.cross_k, enc.cross_v,
        text_tokens, [vocab.token_sot], num_frames=cfg.n_audio_ctx,
        time_offset=0.0,
    )
    assert words, "no words aligned"
    max_t = cfg.n_audio_ctx * 0.02
    prev_end = 0.0
    for w in words:
        assert 0.0 <= w.start <= w.end <= max_t + 1e-6
        assert w.start >= prev_end - 1e-6  # monotone across words
        prev_end = w.start
    # every aligned token accounted for
    got = [t for w in words for t in w.tokens]
    assert got == text_tokens


def test_transcribe_word_timestamps_integration():
    """transcribe(word_timestamps=True) attaches monotone words to segments."""
    import sys

    from fixtures import micro_config, write_synthetic_ggml, synthetic_audio
    from whisper_tpu.model.load import load_model
    from whisper_tpu.pipeline.transcribe import TranscribeOptions, transcribe

    import tempfile, os
    path = os.path.join(tempfile.mkdtemp(), "m.bin")
    write_synthetic_ggml(path, micro_config(), seed=7)
    model = load_model(path, use_native=False)
    audio = synthetic_audio(16000 * 2)
    out = transcribe(model, audio, TranscribeOptions(word_timestamps=True))
    segs = out["segments"]
    assert segs
    # random weights produce arbitrary attention, so don't pin word times to
    # the (random) timestamp-token segment bounds — assert the structural
    # contract: words attach to segments, times are ordered and in-window.
    saw_words = False
    prev = 0.0
    for seg in segs:
        for w in seg.get("words") or []:
            saw_words = True
            assert 0.0 <= w["start"] <= w["end"] <= 31.0
            assert w["start"] >= prev - 1e-6
            prev = w["start"]
            assert w["word"]
    assert saw_words


def test_model_alignment_heads_selection():
    """Published head masks drive head selection for released models; the
    upper-half fallback covers unknown headers and the ambiguous
    large-v1/v2 pair (identical GGML headers)."""
    import numpy as np
    from whisper_tpu.config import ALIGNMENT_HEADS, PRESETS
    from whisper_tpu.pipeline.word_timing import (
        default_alignment_heads, model_alignment_heads)

    cfg = PRESETS["large-v3"]
    m = model_alignment_heads(cfg, cfg.n_text_layer, cfg.n_text_head)
    assert m.sum() == len(ALIGNMENT_HEADS["large-v3"])
    for l, h in ALIGNMENT_HEADS["large-v3"]:
        assert m[l, h]

    # turbo resolves via its 4-layer decoder
    cfg = PRESETS["large-v3-turbo"]
    m = model_alignment_heads(cfg, cfg.n_text_layer, cfg.n_text_head)
    assert m.sum() == len(ALIGNMENT_HEADS["large-v3-turbo"])

    # large v1/v2 are header-identical: fall back, don't guess
    cfg = PRESETS["large-v2"]
    m = model_alignment_heads(cfg, cfg.n_text_layer, cfg.n_text_head)
    np.testing.assert_array_equal(
        m, default_alignment_heads(cfg.n_text_layer, cfg.n_text_head))

    # unknown (synthetic) config: fallback
    from fixtures import micro_config
    cfg = micro_config()
    m = model_alignment_heads(cfg, cfg.n_text_layer, cfg.n_text_head)
    np.testing.assert_array_equal(
        m, default_alignment_heads(cfg.n_text_layer, cfg.n_text_head))

    # every table entry is in range for its preset
    for name, pairs in ALIGNMENT_HEADS.items():
        p = PRESETS[name]
        for l, h in pairs:
            assert 0 <= l < p.n_text_layer and 0 <= h < p.n_text_head, name
