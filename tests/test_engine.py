"""Continuous-batching slot engine: token identity + slot reuse, no recompiles."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fixtures import (micro_config, random_tensors, synthetic_audio,
                      synthetic_tokens)
from whisper_tpu.decoding.task import DecodingOptions, decode_full
from whisper_tpu.io.vocab import make_vocab
from whisper_tpu.model.encoder import encode
from whisper_tpu.model.params import params_from_ggml
from whisper_tpu.parallel.engine import SlotEngine, _decode_chunk


class _Model:
    def __init__(self, cfg, params, vocab, filters):
        self.config = cfg
        self.params = params
        self.vocab = vocab
        self.filters = filters


@pytest.fixture(scope="module")
def model():
    cfg = micro_config(n_vocab=51864)
    tensors = random_tensors(cfg, seed=11)
    params = jax.tree.map(jnp.asarray, params_from_ggml(tensors, cfg))
    vocab = make_vocab(cfg.n_vocab, synthetic_tokens(cfg.n_vocab), cfg.n_vocab)
    filters = jnp.asarray(
        np.random.default_rng(0).random((cfg.n_mels, 201), np.float32) * 0.02
    )
    return _Model(cfg, params, vocab, filters)


def _audios(n, seed=0):
    rng = np.random.default_rng(seed)
    # different lengths AND content -> different transcripts/durations
    return [
        rng.standard_normal(16000 + 4000 * i).astype(np.float32) * 0.3
        for i in range(n)
    ]


def test_engine_matches_device_loop_with_slot_reuse(model):
    """3x n_slots streams of different lengths: results must be token-identical
    to the fused single-segment device loop, with slots reused mid-run and
    the chunk function compiled exactly once."""
    from whisper_tpu.frontend.mel import frame_count, log_mel_spectrogram, mel_window

    cfg, vocab = model.config, model.vocab
    n_slots = 2
    audios = _audios(3 * n_slots, seed=5)
    opts = DecodingOptions(sample_len=24)

    engine = SlotEngine(model, n_slots=n_slots, options=opts, chunk_steps=4)
    before = _decode_chunk._cache_size()
    results = engine.transcribe_many(audios)
    compiles = _decode_chunk._cache_size() - before

    assert len(results) == len(audios)
    # one compiled chunk program serves every refill / mixed-progress state
    assert compiles == 1

    # reference: each stream through the standard fused device loop
    for audio, got in zip(audios, results):
        mel = log_mel_spectrogram(jnp.asarray(audio), model.filters,
                                  frame_count(len(audio)))
        win = mel_window(mel, 0, 2 * cfg.n_audio_ctx)[None]
        enc = encode(model.params, win, cfg, use_flash=False)
        ref = decode_full(model.params, cfg, vocab, enc.cross_k, enc.cross_v,
                          opts, use_device_loop=True)[0]
        assert got.tokens == ref.tokens, (got.tokens, ref.tokens)
        assert abs(got.avg_logprob - ref.avg_logprob) < 2e-3


def test_engine_order_and_progress_independence(model):
    """Submission order is preserved; a short stream finishing early must not
    perturb a long stream sharing the pool (ragged n_past correctness)."""
    opts = DecodingOptions(sample_len=16, without_timestamps=True)
    audios = _audios(4, seed=9)
    engine = SlotEngine(model, n_slots=2, options=opts, chunk_steps=2)
    results = engine.transcribe_many(audios)
    solo = SlotEngine(model, n_slots=2, options=opts, chunk_steps=2)
    # decode each audio alone in a fresh engine: same tokens
    for audio, got in zip(audios, results):
        alone = SlotEngine(model, n_slots=2, options=opts, chunk_steps=2)
        ref = alone.transcribe_many([audio])[0]
        assert got.tokens == ref.tokens


def test_engine_int8_serving_mode(model):
    """quantize=True engine: int8 cross pool + int8 KV pool, slot reuse."""
    opts = DecodingOptions(sample_len=16, without_timestamps=True)
    audios = _audios(4, seed=3)
    engine = SlotEngine(model, n_slots=2, options=opts, chunk_steps=4,
                        quantize=True)
    results = engine.transcribe_many(audios)
    assert len(results) == 4
    # int8 vs bf16: high token agreement (worst case: random weights)
    ref_engine = SlotEngine(model, n_slots=2, options=opts, chunk_steps=4)
    refs = ref_engine.transcribe_many(audios)
    for got, ref in zip(results, refs):
        n = max(min(len(got.tokens), len(ref.tokens)), 1)
        agree = sum(a == b for a, b in zip(got.tokens, ref.tokens)) / n
        assert agree > 0.5, (got.tokens, ref.tokens)


def test_engine_partial_bucket_trash_slot(model):
    """A queue that never fills a whole admission bucket (5 streams, 3
    slots: the first admission is 3 streams into a 4-bucket, padding one
    entry into the trash row) exercises the trash-row padding: results must
    still be token-identical to the per-stream device loop and the trash
    row must never surface in any result."""
    from whisper_tpu.frontend.mel import frame_count, log_mel_spectrogram, mel_window
    from whisper_tpu.decoding.device_loop import build_masks, decode_segment_device
    from whisper_tpu.model.decoder import init_cache
    from whisper_tpu.model.encoder import encode as enc_fn

    cfg, vocab = model.config, model.vocab
    audios = _audios(5, seed=9)
    opts = DecodingOptions(sample_len=16)
    engine = SlotEngine(model, n_slots=3, options=opts, chunk_steps=4)
    results = engine.transcribe_many(audios)
    assert len(results) == 5 and all(r is not None for r in results)

    # reference: the fused single-segment loop, one stream at a time
    sup, blank = build_masks(vocab)
    init = jnp.asarray([[vocab.token_sot]], jnp.int32)
    for audio, res in zip(audios, results):
        mel = log_mel_spectrogram(jnp.asarray(audio), model.filters,
                                  frame_count(len(audio)))
        win = mel_window(mel, 0, 2 * cfg.n_audio_ctx)[None]
        enc = enc_fn(model.params, win, cfg)
        cache = init_cache(cfg, 1, ctx=1 + engine.max_new + 8)
        toks, lengths, _, _ = decode_segment_device(
            model.params, init, 1, 0, cache, enc.cross_k, enc.cross_v,
            sup, blank, cfg, sample_len=engine.max_new, use_timestamps=True)
        want = [int(t) for t in np.asarray(toks)[0, : int(lengths[0])]]
        assert res.tokens == want


def test_engine_streams_match_offline_pipeline(tmp_path):
    """LONG-FORM identity: >30 s streams through the engine (per-slot
    window continuation + prompt carry + no-speech gate + fallback route)
    produce the same segments as pipeline.transcribe, window for window."""
    from fixtures import synthetic_audio, tiny_config, write_synthetic_ggml
    from whisper_tpu.model.load import load_model
    from whisper_tpu.pipeline.transcribe import TranscribeOptions, transcribe

    path = tmp_path / "ggml-tiny-synth.bin"
    write_synthetic_ggml(path, tiny_config(), seed=9)
    model = load_model(str(path), use_native=False)

    SR = 16000
    audios = [synthetic_audio(SR * 35, seed=1),
              synthetic_audio(SR * 50, seed=2),
              synthetic_audio(SR * 8, seed=3)]
    topts = TranscribeOptions(temperature=0.0, condition_on_previous_text=True)

    ref = [transcribe(model, a, topts) for a in audios]

    engine = SlotEngine(model, n_slots=2, chunk_steps=8)
    got = engine.transcribe_streams(audios, topts)

    assert engine.stats["windows"] >= 5  # multi-window streams actually ran
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


def test_engine_streams_fallback_escalation(tmp_path):
    """A gate rigged to always fail at t=0 (logprob_threshold=0) forces the
    engine to escalate windows through the lockstep ladder — output must
    still match the offline pipeline (which escalates identically)."""
    from fixtures import synthetic_audio, tiny_config, write_synthetic_ggml
    from whisper_tpu.model.load import load_model
    from whisper_tpu.pipeline.transcribe import TranscribeOptions, transcribe

    path = tmp_path / "ggml-tiny-synth.bin"
    write_synthetic_ggml(path, tiny_config(), seed=9)
    model = load_model(str(path), use_native=False)

    SR = 16000
    audio = synthetic_audio(SR * 12, seed=5)
    topts = TranscribeOptions(
        temperature=(0.0, 0.5, 1.0), logprob_threshold=0.0,
        no_speech_threshold=None, condition_on_previous_text=True)

    ref = transcribe(model, audio, topts)
    engine = SlotEngine(model, n_slots=2, chunk_steps=8)
    got = engine.transcribe_streams([audio], topts)[0]

    assert engine.stats["fallbacks"] >= 1
    assert got["text"] == ref["text"]
    assert [s["tokens"] for s in got["segments"]] == [
        s["tokens"] for s in ref["segments"]]
    # escalation actually happened (avg_logprob of random weights < 0)
    assert all(s["temperature"] > 0 for s in got["segments"])


def test_engine_int16_audio_identical_to_f32(model):
    """int16 PCM ships raw (4x fewer bytes over the tunnel) and converts on
    device by /32768 — bit-identical to feeding the f32 conversion."""
    opts = DecodingOptions(sample_len=12, without_timestamps=True)
    rng = np.random.default_rng(21)
    i16 = [np.clip(rng.standard_normal(16000 + 5000 * i) * 3000, -32768,
                   32767).astype(np.int16) for i in range(3)]
    f32 = [a.astype(np.float32) / 32768.0 for a in i16]
    got = SlotEngine(model, n_slots=2, options=opts,
                     chunk_steps=4).transcribe_many(i16)
    ref = SlotEngine(model, n_slots=2, options=opts,
                     chunk_steps=4).transcribe_many(f32)
    for g, r in zip(got, ref):
        assert g.tokens == r.tokens


def test_engine_device_resident_audio_identical(model):
    """Pre-staged device arrays (the direct-to-device serving path /
    BENCH_PRESTAGED mode) take the no-host-staging admission branch and
    must be token-identical to host numpy admission."""
    opts = DecodingOptions(sample_len=12, without_timestamps=True)
    host = _audios(5, seed=33)
    dev = [jnp.asarray(a) for a in host]
    got = SlotEngine(model, n_slots=2, options=opts,
                     chunk_steps=4).transcribe_many(dev)
    ref = SlotEngine(model, n_slots=2, options=opts,
                     chunk_steps=4).transcribe_many(host)
    for g, r in zip(got, ref):
        assert g.tokens == r.tokens


def test_engine_streams_word_timestamps_match_offline(tmp_path):
    """word_timestamps through the engine: finish_window's DTW epilogue
    runs on the slot's resident cross rows — the same encoder memory the
    offline path passes as ``enc`` — so word lists must match exactly."""
    from fixtures import synthetic_audio, tiny_config, write_synthetic_ggml
    from whisper_tpu.model.load import load_model
    from whisper_tpu.pipeline.transcribe import TranscribeOptions, transcribe

    path = tmp_path / "ggml-tiny-synth.bin"
    write_synthetic_ggml(path, tiny_config(), seed=9)
    model = load_model(str(path), use_native=False)

    SR = 16000
    audios = [synthetic_audio(SR * 35, seed=1),
              synthetic_audio(SR * 6, seed=3)]
    topts = TranscribeOptions(temperature=0.0, word_timestamps=True,
                              condition_on_previous_text=True)

    ref = [transcribe(model, a, topts) for a in audios]
    engine = SlotEngine(model, n_slots=2, chunk_steps=8)
    got = engine.transcribe_streams(audios, topts)

    assert any(s["words"] for r in got for s in r["segments"])
    for r, g in zip(ref, got):
        assert g["text"] == r["text"]
        for rs, gs in zip(r["segments"], g["segments"]):
            assert gs["tokens"] == rs["tokens"]
            assert gs["words"] == rs["words"]


def test_engine_warmup_precompiles(model, caplog):
    """engine.warmup() (cli serve --warmup) compiles every serving program
    up front: a subsequent stream run in the same 30 s mel size class
    triggers ZERO new XLA compiles."""
    import logging

    from whisper_tpu.pipeline.transcribe import TranscribeOptions

    topts = TranscribeOptions(temperature=0.0)
    engine = SlotEngine(model, n_slots=2, chunk_steps=4)
    engine.warmup(topts)

    jax.config.update("jax_log_compiles", True)
    try:
        with caplog.at_level(logging.WARNING):
            rng = np.random.default_rng(3)
            audios = [
                (rng.standard_normal(16000 * 4) * 0.1).astype(np.float32),
                (rng.standard_normal(16000 * 6) * 0.1).astype(np.float32),
            ]
            res = engine.transcribe_streams(audios, topts)
    finally:
        jax.config.update("jax_log_compiles", False)
    assert len(res) == 2 and all(r["text"] is not None for r in res)
    compiles = [r.getMessage() for r in caplog.records
                if "ompiling" in r.getMessage()]
    assert not compiles, compiles


def test_engine_streams_dont_clobber_option_masks(model):
    """_prepare_streams re-derives the rule masks from per-call
    TranscribeOptions; a later transcribe_many must decode with the
    CONSTRUCTOR DecodingOptions masks again (suppress_blank=False and an
    empty suppress list here), not the stream call's leftovers."""
    from whisper_tpu.decoding.task import DecodingOptions
    from whisper_tpu.pipeline.transcribe import TranscribeOptions

    SR = 16000
    audios = [synthetic_audio(SR * 6, seed=7), synthetic_audio(SR * 9, seed=8)]
    opts = DecodingOptions(suppress_tokens=[], suppress_blank=False,
                           without_timestamps=True)

    ref = SlotEngine(model, n_slots=2, options=opts).transcribe_many(audios)

    engine = SlotEngine(model, n_slots=2, options=opts)
    engine.transcribe_streams([synthetic_audio(SR * 6, seed=1)],
                              TranscribeOptions(temperature=0.0))
    got = engine.transcribe_many(audios)
    assert [r.tokens for r in got] == [r.tokens for r in ref]


def test_engine_streams_offset_duration_match_offline(tmp_path):
    """Engine streams honor offset_ms/duration_ms with the offline loop's
    exact clip arithmetic (same segments as pipeline.transcribe)."""
    from fixtures import tiny_config, write_synthetic_ggml
    from whisper_tpu.model.load import load_model
    from whisper_tpu.pipeline.transcribe import TranscribeOptions, transcribe

    path = tmp_path / "ggml-tiny-synth.bin"
    write_synthetic_ggml(path, tiny_config(), seed=9)
    model = load_model(str(path), use_native=False)

    SR = 16000
    audio = synthetic_audio(SR * 80, seed=2)
    topts = TranscribeOptions(temperature=0.0, offset_ms=15_000,
                              duration_ms=40_000,
                              condition_on_previous_text=True)
    ref = transcribe(model, audio, topts)

    engine = SlotEngine(model, n_slots=2, chunk_steps=8)
    got = engine.transcribe_streams([audio], topts)[0]
    assert got["text"] == ref["text"]
    assert len(got["segments"]) == len(ref["segments"])
    for rs, gs in zip(ref["segments"], got["segments"]):
        assert gs["tokens"] == rs["tokens"]
        assert gs["t0"] == rs["t0"] and gs["t1"] == rs["t1"]
        assert gs["seek"] == rs["seek"]
    # a clip that ends before it starts produces no windows at all
    empty = engine.transcribe_streams(
        [audio], TranscribeOptions(temperature=0.0, offset_ms=90_000))[0]
    assert empty["segments"] == []


def test_engine_streams_reject_audio_ctx(model):
    """audio_ctx cannot be honored per-stream (pools are sized at engine
    construction) — must raise, not silently ignore."""
    import pytest as _pytest

    from whisper_tpu.pipeline.transcribe import TranscribeOptions

    engine = SlotEngine(model, n_slots=2)
    with _pytest.raises(ValueError, match="audio_ctx"):
        engine.transcribe_streams(
            [synthetic_audio(16000 * 6, seed=1)],
            TranscribeOptions(temperature=0.0, audio_ctx=32))


def test_engine_static_audio_ctx_matches_offline(tmp_path):
    """Engine-wide audio_ctx (the reference's static exp_n_audio_ctx,
    main.rs:1803-1807) through transcribe_streams: segments must match the
    offline pipeline at the same numeric audio_ctx, and the cross pools
    must actually be sized to it (the decode-read saving is real)."""
    from fixtures import micro_config, write_synthetic_ggml
    from whisper_tpu.model.load import load_model
    from whisper_tpu.pipeline.transcribe import TranscribeOptions, transcribe

    path = tmp_path / "ggml-micro-synth.bin"
    write_synthetic_ggml(path, micro_config(), seed=9)
    lmodel = load_model(str(path), use_native=False)

    ctx = 32  # < micro_config's n_audio_ctx
    audio = synthetic_audio(16000 * 4, seed=2)
    topts = TranscribeOptions(temperature=0.0, language="en", audio_ctx=ctx)
    ref = transcribe(lmodel, audio, topts)
    eng = SlotEngine(lmodel, n_slots=2, chunk_steps=4, audio_ctx=ctx)
    got = eng.transcribe_streams([audio], topts)[0]
    assert [s["text"] for s in got["segments"]] == \
        [s["text"] for s in ref["segments"]]
    assert jax.tree.leaves(eng._cross_pool_k)[0].shape[-1] == ctx

    # mismatched per-call override must be refused, not silently diverge
    with pytest.raises(ValueError, match="audio_ctx"):
        eng.transcribe_streams(
            [audio], TranscribeOptions(temperature=0.0, audio_ctx=ctx * 2))


def test_engine_custom_admit_buckets(model):
    """admit_buckets override produces identical results through a different
    admission bucketing (each bucket is one compiled encode/prefill shape)."""
    audios = _audios(5, seed=9)
    opts = DecodingOptions(sample_len=24)
    ref = SlotEngine(model, n_slots=2, options=opts,
                     chunk_steps=4).transcribe_many(audios)
    eng = SlotEngine(model, n_slots=2, options=opts, chunk_steps=4,
                     admit_buckets=(4, 1))
    assert eng._ADMIT_BUCKETS == (4, 1)
    got = eng.transcribe_many(audios)
    assert [r.tokens for r in got] == [r.tokens for r in ref]


def test_engine_schedules_identical(model):
    """The three harvest schedules (pipelined / eager / predictive) are pure
    host-side refill policies: results must be token-identical, and only the
    eager-capable schedules may take early pulls."""
    audios = _audios(6, seed=13)
    opts = DecodingOptions(sample_len=24)
    outs = {}
    for sched in ("pipelined", "eager", "predictive", "overlapped"):
        eng = SlotEngine(model, n_slots=2, options=opts, chunk_steps=4,
                         schedule=sched)
        outs[sched] = eng.transcribe_many(audios)
        if sched == "pipelined":
            assert eng.stats["eager_rounds"] == 0
        elif sched == "overlapped":
            assert eng.stats["staged_buckets"] >= 3  # 6 streams, 2 slots
        else:
            # eager pulls before every admission round with work queued;
            # predictive's budget check (ceil(24/4)=6 rounds min) fires for
            # the refill waves. A regression collapsing either into
            # pipelined behavior must fail here, not just the 'pipelined
            # == 0' half.
            assert eng.stats["eager_rounds"] > 0, sched
    base = [(r.tokens, round(r.avg_logprob, 4)) for r in outs["pipelined"]]
    for sched in ("eager", "predictive", "overlapped"):
        assert [(r.tokens, round(r.avg_logprob, 4)) for r in outs[sched]] == base

    with pytest.raises(ValueError):
        SlotEngine(model, n_slots=2, options=opts, schedule="bogus")
