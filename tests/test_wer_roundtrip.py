"""Closed-loop accuracy round-trip: train from scratch on synthetic
tone-words, export GGML, reload through the production loader, transcribe
held-out audio, score with the WER harness (VERDICT r3 item 6 — training and
eval proven against each other; no external assets needed) — and validate
word-level DTW timing SEMANTICALLY against the corpus's constructed word
positions (VERDICT r4 item 8: the tone-word corpus has KNOWN boundaries, so
pipeline/word_timing.py can be checked against ground truth, which no
synthetic-weights test can do).

The heavyweight WER version (more steps, subprocess `cli eval`) lives in
scripts/wer_roundtrip.py — measured 18.2% WER at 700 steps. These tests use
a smaller budget and generous bounds: the point is nonzero accuracy through
the full path, not a benchmark.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_tpu.config import WhisperConfig
from whisper_tpu.io.ggml import write_ggml
from whisper_tpu.io.vocab import make_vocab
from whisper_tpu.io.wav import write_wav
from whisper_tpu.model.load import load_model, random_model
from whisper_tpu.model.params import params_to_ggml
from whisper_tpu.training.finetune import finetune
from whisper_tpu.utils.synth import SR, WORD_SEC, make_pair, word_tokens
from whisper_tpu.utils.wer import evaluate_dataset

N_VOCAB = 51864
GAP_SEC = 0.05  # silence between tone words (utils/synth.make_pair)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """Train the micro model on tone-words once; both the WER round-trip and
    the word-timing validation consume the same GGML-reloaded model."""
    tmp_path = tmp_path_factory.mktemp("wer_roundtrip")
    cfg = WhisperConfig(
        n_vocab=N_VOCAB, n_audio_ctx=64, n_audio_state=64, n_audio_head=2,
        n_audio_layer=2, n_text_ctx=96, n_text_state=64, n_text_head=2,
        n_text_layer=2, n_mels=80, f16=0)
    model = random_model(cfg, seed=0, on_device=False)
    model.vocab = make_vocab(N_VOCAB, word_tokens(N_VOCAB), N_VOCAB)

    rng = np.random.default_rng(0)
    train_pairs = [make_pair(rng) for _ in range(96)]
    held_out = [make_pair(rng) for _ in range(8)]

    # tokenizer round-trips the constructed transcripts exactly
    for _, text in train_pairs[:4]:
        ids = model.vocab.encode(" " + text)
        assert model.vocab.decode(ids).strip() == text

    # 700 steps (the scripts/wer_roundtrip.py budget that measured 18.2%
    # WER): the 350-step model still substitutes the FIRST word of every
    # utterance, which breaks the exact-transcript filter the word-timing
    # test needs. The fixture is module-scoped, so both tests share one run.
    state = finetune(model, train_pairs, steps=700, batch_size=16,
                     lr=1e-3, warmup=20, log_every=1000, seed=0)

    # full production path: params -> GGML -> loader
    tensors = params_to_ggml(jax.tree.map(np.asarray, state.params), cfg)
    ggml = str(tmp_path / "model.bin")
    write_ggml(ggml, cfg, np.asarray(model.filters), word_tokens(N_VOCAB),
               tensors)
    reloaded = load_model(ggml, dtype=jnp.float32)
    return reloaded, held_out, tmp_path


@pytest.mark.slow
def test_wer_roundtrip_synthetic(trained):
    reloaded, held_out, tmp_path = trained

    def dataset():
        for i, (audio, text) in enumerate(held_out):
            p = str(tmp_path / f"utt{i}.wav")
            write_wav(p, audio, SR)
            yield p, text

    res = evaluate_dataset(reloaded, dataset(), without_timestamps=True,
                           language="en")
    # untrained = 100%+; the 700-step script run measures 18%. 350 steps
    # with a generous bound keeps the test robust to optimizer noise.
    assert res["wer"] < 0.6, res
    assert res["words"] > 0 and res["utterances"] == len(held_out)


@pytest.mark.slow
def test_word_timing_semantic(trained):
    """DTW word timing vs CONSTRUCTED ground truth: word i of a tone-word
    utterance occupies [GAP + i*(WORD+GAP), ... + WORD] seconds by
    construction (utils/synth.make_pair), so every predicted word midpoint
    must land within the true word's neighborhood — a semantic check of
    pipeline/word_timing.py that the alignment actually tracks audio, not
    just a monotonicity smoke test (the reference's per-token t0/t1 intent,
    main.rs:317-331, validated end to end)."""
    from whisper_tpu.pipeline.transcribe import TranscribeOptions, transcribe

    reloaded, _, _ = trained
    rng = np.random.default_rng(99)
    pitch = WORD_SEC + GAP_SEC  # word i starts at GAP + i*pitch

    checked = multiword = 0
    true_mids, pred_mids = [], []
    for _ in range(16):
        audio, text = make_pair(rng)  # train-distribution, fresh stream
        truth = text.split()
        out = transcribe(reloaded, audio,
                         TranscribeOptions(language="en", temperature=0.0,
                                           word_timestamps=True))
        words = [w for s in out["segments"] for w in (s.get("words") or [])]
        # only utterances the model transcribes exactly are comparable
        if [w["word"].strip() for w in words] != truth:
            continue
        checked += 1
        multiword += len(truth) >= 2
        for i, w in enumerate(words):
            true_mids.append(GAP_SEC + i * pitch + WORD_SEC / 2)
            pred_mids.append((w["start"] + w["end"]) / 2)

    # the 700-step model (18.2% WER in the script run) transcribes several
    # held-out utterances exactly, including multi-word ones
    assert checked >= 3 and multiword >= 1, (checked, multiword)
    true_mids = np.array(true_mids)
    pred_mids = np.array(pred_mids)
    errs = np.abs(pred_mids - true_mids)
    # The micro model's 2-layer / 64-d cross attention localizes coarsely
    # (measured word-midpoint errors 0.01-0.53 s at this budget), so the
    # semantic claim tested is "the alignment TRACKS audio time", not
    # frame-exactness: (a) predicted midpoints regress on the constructed
    # tone midpoints with slope ~1 — any degenerate aligner (constant,
    # all-zero, segment-bound-copying) has slope ~0 and fails; (b) every
    # error stays within two word pitches, median within one.
    slope = float(np.polyfit(true_mids, pred_mids, 1)[0])
    assert 0.5 < slope < 1.7, (slope, list(zip(true_mids, pred_mids)))
    assert float(np.median(errs)) < pitch, errs
    assert float(errs.max()) < 2 * pitch, errs


def test_make_pair_structured_repeat():
    """repeat=k speaks each chosen word k times (the structured corpus the
    speculative-acceptance harness uses — continuations become partially
    prefix-predictable, unlike the i.i.d. default) and the audio grows
    accordingly; transcripts stay exact word sequences."""
    rng1 = np.random.default_rng(7)
    rng2 = np.random.default_rng(7)
    audio1, text1 = make_pair(rng1, n_words=(3, 3))
    audio2, text2 = make_pair(rng2, n_words=(3, 3), repeat=2)
    w1, w2 = text1.split(), text2.split()
    # same chosen words, each doubled in order
    assert w2 == [w for w in w1 for _ in range(2)]
    # six spoken words vs three: audio is ~2x the voiced length
    assert len(audio2) > 1.8 * len(audio1)
