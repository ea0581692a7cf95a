"""Beam search under continuous batching (parallel/beam_engine.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fixtures import micro_config, random_tensors, synthetic_tokens
from whisper_tpu.decoding.task import DecodingOptions, decode_full
from whisper_tpu.io.vocab import make_vocab
from whisper_tpu.model.encoder import encode
from whisper_tpu.model.params import params_from_ggml
from whisper_tpu.parallel.beam_engine import BeamSlotEngine


class _Model:
    def __init__(self, cfg, params, vocab, filters):
        self.config = cfg
        self.params = params
        self.vocab = vocab
        self.filters = filters


@pytest.fixture(scope="module")
def model():
    cfg = micro_config(n_vocab=51864)
    tensors = random_tensors(cfg, seed=13)
    params = jax.tree.map(jnp.asarray, params_from_ggml(tensors, cfg))
    vocab = make_vocab(cfg.n_vocab, synthetic_tokens(cfg.n_vocab), cfg.n_vocab)
    filters = jnp.asarray(
        np.random.default_rng(0).random((cfg.n_mels, 201), np.float32) * 0.02)
    return _Model(cfg, params, vocab, filters)


def _audios(n, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.standard_normal(16000 + 4000 * i).astype(np.float32) * 0.3
            for i in range(n)]


def test_beam_engine_matches_device_beam_with_slot_reuse(model):
    """3x n_slots streams through the beam engine: results token-identical
    to the fused single-segment device beam per stream, with group slots
    reused mid-run (continuous batching of beam groups)."""
    from whisper_tpu.frontend.mel import frame_count, log_mel_spectrogram, mel_window

    cfg, vocab = model.config, model.vocab
    k, n_slots = 3, 2
    audios = _audios(3 * n_slots, seed=7)
    opts = DecodingOptions(beam_size=k, sample_len=14)

    engine = BeamSlotEngine(model, n_slots=n_slots, options=opts,
                            chunk_steps=4)
    results = engine.transcribe_many(audios)
    assert len(results) == len(audios)

    for audio, got in zip(audios, results):
        mel = log_mel_spectrogram(jnp.asarray(audio), model.filters,
                                  frame_count(len(audio)))
        win = mel_window(mel, 0, 2 * cfg.n_audio_ctx)[None]
        enc = encode(model.params, win, cfg, use_flash=False)
        ref = decode_full(model.params, cfg, vocab, enc.cross_k, enc.cross_v,
                          opts, use_device_loop=True)[0]
        assert got.tokens == ref.tokens, (got.tokens, ref.tokens)
        assert got.avg_logprob == pytest.approx(ref.avg_logprob, rel=1e-3,
                                                abs=1e-4)
        assert got.no_speech_prob == pytest.approx(ref.no_speech_prob,
                                                   abs=1e-5)


def test_beam_engine_int8_serving_mode(model):
    """quantize=True beam engine (int8 pools + padded-ctx COW rows): runs,
    and agrees with the bf16 beam engine on worst-case random weights."""
    opts = DecodingOptions(beam_size=3, sample_len=10,
                           without_timestamps=True)
    audios = _audios(3, seed=5)
    got = BeamSlotEngine(model, n_slots=2, options=opts, chunk_steps=4,
                         quantize=True).transcribe_many(audios)
    ref = BeamSlotEngine(model, n_slots=2, options=opts,
                         chunk_steps=4).transcribe_many(audios)
    for g, r in zip(got, ref):
        n = max(min(len(g.tokens), len(r.tokens)), 1)
        agree = sum(a == b for a, b in zip(g.tokens, r.tokens)) / n
        assert agree > 0.5, (g.tokens, r.tokens)


def test_beam_engine_overlapped_schedule_identical(model):
    """The 'overlapped' scheduler (staged slot-agnostic encode/prefill,
    scatter-only installs — engine._transcribe_many_overlapped) is a pure
    host-side policy: beam results must be token-identical to the default
    schedule, including partial payload installs on straggler refills."""
    opts = DecodingOptions(beam_size=3, sample_len=14)
    audios = _audios(5, seed=21)
    ref = BeamSlotEngine(model, n_slots=2, options=opts,
                         chunk_steps=4).transcribe_many(audios)
    eng = BeamSlotEngine(model, n_slots=2, options=opts, chunk_steps=4,
                         schedule="overlapped")
    got = eng.transcribe_many(audios)
    assert eng.stats["staged_buckets"] >= 2
    assert [(r.tokens, round(r.avg_logprob, 4)) for r in got] == \
        [(r.tokens, round(r.avg_logprob, 4)) for r in ref]


def test_beam_engine_rejects_invalid_options(model):
    with pytest.raises(ValueError):
        BeamSlotEngine(model, options=DecodingOptions(beam_size=None))
    with pytest.raises(ValueError):
        BeamSlotEngine(model, options=DecodingOptions(beam_size=3,
                                                      patience=2.0))


def test_beam_engine_streams_match_offline_pipeline(tmp_path):
    """LONG-FORM beam identity: >30 s streams through the beam engine
    (whisper_full window continuation with prompt carry over beam groups)
    produce the same segments as pipeline.transcribe with the same
    beam_size, window for window. use_device_loop=True pins the offline
    t=0 rung to the fused device beam (the semantics the engine chunk loop
    implements) on any backend."""
    from fixtures import synthetic_audio, tiny_config, write_synthetic_ggml
    from whisper_tpu.model.load import load_model
    from whisper_tpu.pipeline.transcribe import TranscribeOptions, transcribe

    path = tmp_path / "ggml-tiny-synth.bin"
    write_synthetic_ggml(path, tiny_config(), seed=9)
    model = load_model(str(path), use_native=False)

    SR = 16000
    audios = [synthetic_audio(SR * 35, seed=1),
              synthetic_audio(SR * 44, seed=2),
              synthetic_audio(SR * 6, seed=4)]
    topts = TranscribeOptions(temperature=0.0, beam_size=2,
                              condition_on_previous_text=True,
                              use_device_loop=True)

    ref = [transcribe(model, a, topts) for a in audios]

    engine = BeamSlotEngine(
        model, n_slots=2, chunk_steps=8,
        options=DecodingOptions(beam_size=2))
    got = engine.transcribe_streams(audios, topts)

    assert engine.stats["windows"] >= 4  # multi-window streams actually ran
    for r, g in zip(ref, got):
        assert g["language"] == r["language"]
        assert g["duration"] == r["duration"]
        assert g["text"] == r["text"]
        assert len(g["segments"]) == len(r["segments"])
        for rs, gs in zip(r["segments"], g["segments"]):
            assert gs["tokens"] == rs["tokens"]
            assert gs["t0"] == rs["t0"] and gs["t1"] == rs["t1"]
            assert gs["seek"] == rs["seek"]
            assert gs["no_speech_prob"] == pytest.approx(
                rs["no_speech_prob"], abs=1e-5)
            assert gs["avg_logprob"] == pytest.approx(
                rs["avg_logprob"], rel=1e-4, abs=1e-5)


def test_beam_engine_streams_rejects_mismatched_beam(model):
    from whisper_tpu.pipeline.transcribe import TranscribeOptions

    engine = BeamSlotEngine(model, n_slots=2,
                            options=DecodingOptions(beam_size=3))
    with pytest.raises(ValueError):
        engine.transcribe_streams([_audios(1)[0]],
                                  TranscribeOptions(beam_size=5))
    with pytest.raises(ValueError):
        engine.transcribe_streams([_audios(1)[0]],
                                  TranscribeOptions(beam_size=None))


def test_span_cow_prefix_semantics():
    """span_cow copies only the live column prefix of forked rows: forked
    rows' first max-forked-n_past columns come from the source row, their
    tail keeps the old bytes (never read), unforked rows are untouched."""
    import jax.numpy as jnp

    from whisper_tpu.parallel.beam_engine import span_cow

    rng = np.random.default_rng(0)
    B, L, H, D, C = 6, 2, 2, 4, 40
    k = jnp.asarray(rng.standard_normal((B, L, H, D, C)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, L, H, D, C)).astype(np.float32))
    # rows 2,3 fork from row 0; n_past 7 for their group, 30 elsewhere
    src = jnp.asarray([0, 1, 0, 0, 4, 5], jnp.int32)
    n_past = jnp.asarray([7, 7, 7, 7, 30, 30], jnp.int32)
    ck, cv = span_cow(k, v, src, n_past, buckets=(8, 16))
    ck, cv = np.asarray(ck), np.asarray(cv)
    span = 8  # max forked n_past = 7 -> bucket 8
    for b, s in enumerate([0, 1, 0, 0, 4, 5]):
        np.testing.assert_array_equal(ck[b, ..., :span],
                                      np.asarray(k)[s, ..., :span])
        np.testing.assert_array_equal(ck[b, ..., span:],
                                      np.asarray(k)[b, ..., span:])
        np.testing.assert_array_equal(cv[b, ..., :span],
                                      np.asarray(v)[s, ..., :span])
    # identity src -> branch 0, bit-identical buffers
    ident = jnp.arange(B, dtype=jnp.int32)
    ck2, cv2 = span_cow(k, v, ident, n_past, buckets=(8, 16))
    np.testing.assert_array_equal(np.asarray(ck2), np.asarray(k))
    # forks at large n_past take the full-C bucket
    src3 = jnp.asarray([4, 1, 2, 3, 0, 5], jnp.int32)
    ck3, _ = span_cow(k, v, src3, n_past, buckets=(8, 16))
    np.testing.assert_array_equal(np.asarray(ck3)[0], np.asarray(k)[4])


def test_bounded_cow_rows_exact():
    """bounded_cow_rows == a full jnp.take row permute for cow-shaped
    copy_src (sources are never destinations), for every relation between
    the fork count and the pass size m: cnt == 0 (zero passes), cnt < m,
    cnt == m, cnt > m (multiple passes), and QuantKV pytree leaves."""
    import jax.numpy as jnp

    from whisper_tpu.model.quant import QuantKV
    from whisper_tpu.parallel.beam_engine import bounded_cow_rows

    rng = np.random.default_rng(1)
    B, L, H, D, C = 10, 2, 2, 4, 12
    trash = B - 1

    def bufs():
        k = jnp.asarray(rng.standard_normal((B, L, H, D, C)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((B, L, H, D, C)).astype(np.float32))
        return k, v

    cases = [
        (list(range(B)), 0),                      # identity: zero copies
        ([0, 1, 0, 3, 4, 5, 6, 7, 8, 9], 1),      # 1 fork
        ([0, 1, 0, 0, 4, 4, 6, 6, 8, 9], 4),      # cnt == m for m=4
        ([0, 0, 0, 0, 4, 4, 4, 7, 7, 9], 6),      # cnt > m: multi-pass
    ]
    for m in (2, 4, 8):
        for src_list, cnt_want in cases:
            src = jnp.asarray(src_list, jnp.int32)
            k, v = bufs()
            ck, cv, cnt = bounded_cow_rows(k, v, src, m, trash)
            assert int(cnt) == cnt_want
            np.testing.assert_array_equal(np.asarray(ck),
                                          np.asarray(jnp.take(k, src, axis=0)))
            np.testing.assert_array_equal(np.asarray(cv),
                                          np.asarray(jnp.take(v, src, axis=0)))

    # QuantKV pytrees: data + scale leaves both move.
    src = jnp.asarray([0, 0, 2, 2, 4, 5, 6, 7, 8, 9], jnp.int32)
    k, v = bufs()
    qk = QuantKV(jnp.round(k * 10).astype(jnp.int8),
                 jnp.abs(jnp.asarray(
                     rng.standard_normal((B, L, H, C)).astype(np.float32))))
    qv = QuantKV(jnp.round(v * 10).astype(jnp.int8),
                 jnp.abs(jnp.asarray(
                     rng.standard_normal((B, L, H, C)).astype(np.float32))))
    ck, cv, cnt = bounded_cow_rows(qk, qv, src, 2, trash)
    assert int(cnt) == 2
    for got, ref in ((ck, qk), (cv, qv)):
        np.testing.assert_array_equal(
            np.asarray(got.data), np.asarray(jnp.take(ref.data, src, axis=0)))
        np.testing.assert_array_equal(
            np.asarray(got.scale), np.asarray(jnp.take(ref.scale, src, axis=0)))


def test_bounded_cow_rows_in_jit_scan():
    """bounded_cow_rows must trace inside a scanned/jitted chunk body (the
    while_loop pass count is data-dependent; shapes are static)."""
    import jax
    import jax.numpy as jnp

    from whisper_tpu.parallel.beam_engine import bounded_cow_rows

    B = 8

    @jax.jit
    def step(k, v, src):
        def body(carry, s):
            ck, cv = carry
            ck, cv, _ = bounded_cow_rows(ck, cv, s, 3, B - 1)
            return (ck, cv), None
        (k, v), _ = jax.lax.scan(body, (k, v), src)
        return k, v

    rng = np.random.default_rng(2)
    k = jnp.asarray(rng.standard_normal((B, 2, 3, 4)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, 2, 3, 4)).astype(np.float32))
    # two steps: fork 1<-0 then 5<-4 (cow-shaped each step)
    src = jnp.asarray([[0, 0, 2, 3, 4, 5, 6, 7],
                       [0, 1, 2, 3, 4, 4, 6, 7]], jnp.int32)
    ck, cv = step(k, v, src)
    ref_k = jnp.take(jnp.take(k, src[0], axis=0), src[1], axis=0)
    np.testing.assert_array_equal(np.asarray(ck), np.asarray(ref_k))


def test_layer_dot_permute_exact():
    """layer_dot_permute == jnp.take row gather for int8+scale pytrees and
    bf16 leaves (int32 one-hot accumulation / single-term float sums)."""
    import jax.numpy as jnp

    from whisper_tpu.kernels.beam_gather import layer_dot_permute
    from whisper_tpu.model.quant import QuantKV

    rng = np.random.default_rng(3)
    B, L, H, D, C = 7, 3, 2, 4, 10
    src = jnp.asarray([0, 0, 2, 2, 2, 5, 3], jnp.int32)
    qk = QuantKV(
        jnp.asarray(rng.integers(-127, 128, (B, L, H, D, C)), jnp.int8),
        jnp.asarray(rng.standard_normal((B, L, H, C)).astype(np.float32)))
    bf = jnp.asarray(rng.standard_normal((B, L, H, D, C))).astype(jnp.bfloat16)
    out_q, out_b = layer_dot_permute((qk, bf), src)
    np.testing.assert_array_equal(
        np.asarray(out_q.data), np.asarray(jnp.take(qk.data, src, axis=0)))
    np.testing.assert_array_equal(
        np.asarray(out_q.scale), np.asarray(jnp.take(qk.scale, src, axis=0)))
    np.testing.assert_array_equal(
        np.asarray(out_b, jnp.float32),
        np.asarray(jnp.take(bf, src, axis=0), jnp.float32))
