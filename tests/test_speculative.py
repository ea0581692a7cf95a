"""Speculative greedy decoding (decoding/speculative.py): exactness at both
acceptance extremes — a perfect draft (the target itself) and a useless one
(different random weights) must both emit token-identical greedy output."""

import jax.numpy as jnp
import numpy as np
import pytest

from fixtures import micro_config, random_tensors, synthetic_tokens
from whisper_tpu.decoding.speculative import decode_speculative
from whisper_tpu.decoding.task import DecodingOptions, decode_full
from whisper_tpu.io.vocab import make_vocab
from whisper_tpu.model.encoder import encode
from whisper_tpu.model.params import params_from_ggml

import jax


@pytest.fixture(scope="module")
def setup():
    cfg = micro_config(n_vocab=51864)
    params_t = jax.tree.map(
        jnp.asarray, params_from_ggml(random_tensors(cfg, seed=11), cfg))
    params_d = jax.tree.map(
        jnp.asarray, params_from_ggml(random_tensors(cfg, seed=23), cfg))
    vocab = make_vocab(cfg.n_vocab, synthetic_tokens(cfg.n_vocab), cfg.n_vocab)
    rng = np.random.default_rng(4)
    mel = rng.standard_normal((1, cfg.n_mels, 2 * cfg.n_audio_ctx)).astype(
        np.float32)
    enc_t = encode(params_t, jnp.asarray(mel), cfg)
    enc_d = encode(params_d, jnp.asarray(mel), cfg)
    return cfg, vocab, params_t, enc_t, params_d, enc_d


@pytest.mark.parametrize("opts_kwargs", [
    dict(sample_len=24),
    dict(sample_len=24, without_timestamps=True),
])
def test_perfect_draft_token_identity_and_speedup(setup, opts_kwargs):
    """draft == target: 100% acceptance — identical tokens, and the target
    runs far fewer forwards than tokens emitted."""
    cfg, vocab, params_t, enc_t, _, _ = setup
    opts = DecodingOptions(**opts_kwargs)

    ref = decode_full(params_t, cfg, vocab, enc_t.cross_k, enc_t.cross_v,
                      opts)[0]
    got, stats = decode_speculative(
        params_t, cfg, vocab, enc_t.cross_k, enc_t.cross_v,
        params_t, cfg, enc_t.cross_k, enc_t.cross_v, opts, gamma=4)

    assert got.tokens == ref.tokens
    assert got.avg_logprob == pytest.approx(ref.avg_logprob, rel=1e-5,
                                            abs=1e-6)
    assert got.no_speech_prob == pytest.approx(ref.no_speech_prob, abs=1e-6)
    n = len(got.tokens) + 1  # + EOT
    # perfect draft: every proposal accepted; one verify forward covers
    # gamma tokens, so target forwards << emitted tokens
    assert stats["accepted"] == stats["proposed"]
    assert stats["target_steps"] + stats["rounds"] <= n  # sanity
    assert stats["target_steps"] < n / 2


def test_useless_draft_token_identity(setup):
    """Unrelated draft weights: near-zero acceptance — output must STILL be
    token-identical to plain greedy (correctness never depends on the
    draft)."""
    cfg, vocab, params_t, enc_t, params_d, enc_d = setup
    opts = DecodingOptions(sample_len=20)

    ref = decode_full(params_t, cfg, vocab, enc_t.cross_k, enc_t.cross_v,
                      opts)[0]
    got, stats = decode_speculative(
        params_t, cfg, vocab, enc_t.cross_k, enc_t.cross_v,
        params_d, cfg, enc_d.cross_k, enc_d.cross_v, opts, gamma=3)

    assert got.tokens == ref.tokens
    assert got.avg_logprob == pytest.approx(ref.avg_logprob, rel=1e-5,
                                            abs=1e-6)
    assert stats["proposed"] > 0


def test_speculative_rejects_non_greedy(setup):
    cfg, vocab, params_t, enc_t, params_d, enc_d = setup
    for bad in (DecodingOptions(beam_size=2),
                DecodingOptions(temperature=0.7),
                DecodingOptions(best_of=3, temperature=0.7)):
        with pytest.raises(ValueError):
            decode_speculative(
                params_t, cfg, vocab, enc_t.cross_k, enc_t.cross_v,
                params_d, cfg, enc_d.cross_k, enc_d.cross_v, bad)


def test_transcribe_with_draft_matches_plain(tmp_path):
    """pipeline.transcribe with model.draft set (speculative t=0 rung) is
    segment-identical to plain transcribe across a multi-window long-form
    run with prompt carry."""
    from fixtures import synthetic_audio, write_synthetic_ggml
    from whisper_tpu.model.load import load_model
    from whisper_tpu.pipeline.transcribe import TranscribeOptions, transcribe

    cfg = micro_config(n_vocab=51864)
    write_synthetic_ggml(tmp_path / "t.bin", cfg, seed=9)
    write_synthetic_ggml(tmp_path / "d.bin", cfg, seed=31)
    model = load_model(str(tmp_path / "t.bin"), use_native=False)
    audio = synthetic_audio(16000 * 4, seed=2)
    topts = TranscribeOptions(temperature=0.0,
                              condition_on_previous_text=True,
                              speculative_gamma=3)

    ref = transcribe(model, audio, topts)

    model.draft = load_model(str(tmp_path / "d.bin"), use_native=False)
    got = transcribe(model, audio, topts)

    assert got["text"] == ref["text"]
    assert len(got["segments"]) > 1  # actually multi-window
    assert [s["tokens"] for s in got["segments"]] == [
        s["tokens"] for s in ref["segments"]]


@pytest.mark.parametrize("perfect,use_ts", [(True, True), (True, False),
                                            (False, True), (False, False)])
def test_device_speculative_matches_device_greedy(setup, perfect, use_ts):
    """The fused on-device speculative loop (one jitted while_loop, ragged
    per-row acceptance) is token-identical to decode_segment_device."""
    from whisper_tpu.decoding.device_loop import (build_masks,
                                                  decode_segment_device)
    from whisper_tpu.decoding.device_speculative import (
        decode_segment_speculative_device)
    from whisper_tpu.io.vocab import make_vocab
    from whisper_tpu.model.decoder import init_cache
    from whisper_tpu.model.encoder import encode as _encode

    cfg, vocab, params_t, _, params_d, _ = setup
    if perfect:
        params_d = params_t
    B, SL, GAMMA = 3, 18, 4
    rng = np.random.default_rng(6)
    mel = rng.standard_normal((B, cfg.n_mels, 2 * cfg.n_audio_ctx)).astype(
        np.float32)
    enc_t = _encode(params_t, jnp.asarray(mel), cfg)
    enc_d = _encode(params_d, jnp.asarray(mel), cfg)
    sup, blank = build_masks(vocab)
    init_tokens = jnp.asarray(
        np.tile(np.array([vocab.token_sot], np.int32), (B, 1)))
    ctx = 1 + SL + GAMMA + 4

    ref_toks, ref_len, ref_lp, ref_nosp = decode_segment_device(
        params_t, init_tokens, 1, 0, init_cache(cfg, B, ctx=ctx),
        enc_t.cross_k, enc_t.cross_v, sup, blank, cfg,
        sample_len=SL, use_timestamps=use_ts)

    toks, lens, lps, nosp, rounds, accepted = (
        decode_segment_speculative_device(
            params_t, params_d, init_tokens, 1, 0,
            init_cache(cfg, B, ctx=ctx), init_cache(cfg, B, ctx=ctx),
            enc_t.cross_k, enc_t.cross_v, enc_d.cross_k, enc_d.cross_v,
            sup, blank, cfg, cfg, sample_len=SL, gamma=GAMMA,
            use_timestamps=use_ts))

    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref_toks))
    np.testing.assert_array_equal(np.asarray(lens), np.asarray(ref_len))
    np.testing.assert_allclose(np.asarray(lps), np.asarray(ref_lp),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(nosp), np.asarray(ref_nosp),
                               rtol=1e-5, atol=1e-6)
    if perfect:
        # 100% acceptance: rounds are a fraction of emitted tokens
        total = int(np.asarray(ref_len).sum()) + B  # + EOTs
        assert int(rounds) < total / 2
        assert int(accepted) > 0


def test_device_speculative_full_wrapper_matches_decode_full(setup):
    """decode_speculative_device_full == decode_full greedy with prompts
    (bucketed prefill, openai budget clamp, result construction)."""
    from whisper_tpu.decoding.device_speculative import (
        decode_speculative_device_full)

    cfg, vocab, params_t, enc_t, params_d, enc_d = setup
    opts = DecodingOptions(sample_len=20, prompt=[311, 412, 513])

    ref = decode_full(params_t, cfg, vocab, enc_t.cross_k, enc_t.cross_v,
                      opts)
    got, stats = decode_speculative_device_full(
        params_t, cfg, vocab, enc_t.cross_k, enc_t.cross_v,
        params_d, cfg, enc_d.cross_k, enc_d.cross_v, opts, gamma=3)

    assert stats["rounds"] >= 1
    for r, g in zip(ref, got):
        assert g.tokens == r.tokens
        assert g.avg_logprob == pytest.approx(r.avg_logprob, rel=1e-4,
                                              abs=1e-5)
        assert g.no_speech_prob == pytest.approx(r.no_speech_prob, abs=1e-5)


def test_transcribe_with_draft_device_loop_matches_plain(tmp_path):
    """pipeline.transcribe routes the t=0 rung through the FUSED device
    speculative loop when use_device_loop=True — segment-identical to the
    plain device-loop transcribe."""
    from fixtures import synthetic_audio, write_synthetic_ggml
    from whisper_tpu.model.load import load_model
    from whisper_tpu.pipeline.transcribe import TranscribeOptions, transcribe

    cfg = micro_config(n_vocab=51864)
    write_synthetic_ggml(tmp_path / "t.bin", cfg, seed=9)
    write_synthetic_ggml(tmp_path / "d.bin", cfg, seed=31)
    model = load_model(str(tmp_path / "t.bin"), use_native=False)
    audio = synthetic_audio(16000 * 3, seed=5)
    topts = TranscribeOptions(temperature=0.0, use_device_loop=True,
                              speculative_gamma=3)

    ref = transcribe(model, audio, topts)
    model.draft = load_model(str(tmp_path / "d.bin"), use_native=False)
    got = transcribe(model, audio, topts)

    assert got["text"] == ref["text"]
    assert [s["tokens"] for s in got["segments"]] == [
        s["tokens"] for s in ref["segments"]]


@pytest.mark.parametrize("perfect", [True, False])
def test_device_speculative_int8_cache_matches_greedy(setup, perfect):
    """Speculative verify blocks through the int8 KV cache (the ragged
    multi-column quantized scatter): token-identical to the greedy device
    loop on the same quantized cache. Scales are per-position, so block
    appends quantize exactly like stepwise appends. The imperfect-draft
    case exercises stale rejected data+scale columns being overwritten by
    the next round's block at per-row offsets."""
    from whisper_tpu.decoding.device_loop import (build_masks,
                                                  decode_segment_device)
    from whisper_tpu.decoding.device_speculative import (
        decode_segment_speculative_device)
    from whisper_tpu.model.decoder import KVCache
    from whisper_tpu.model.encoder import encode as _encode
    from whisper_tpu.model.quant import init_quant_cache

    cfg, vocab, params_t, enc_t, params_d, enc_d = setup
    if perfect:
        params_d = params_t
    B, SL, GAMMA = 2, 14, 3
    rng = np.random.default_rng(8)
    mel = rng.standard_normal((B, cfg.n_mels, 2 * cfg.n_audio_ctx)).astype(
        np.float32)
    enc = _encode(params_t, jnp.asarray(mel), cfg)
    encd = _encode(params_d, jnp.asarray(mel), cfg)
    sup, blank = build_masks(vocab)
    init_tokens = jnp.asarray(
        np.tile(np.array([vocab.token_sot], np.int32), (B, 1)))
    ctx = 1 + SL + GAMMA + 4

    def qcache():
        return KVCache(*init_quant_cache(cfg, B, ctx=ctx))

    ref = decode_segment_device(
        params_t, init_tokens, 1, 0, qcache(), enc.cross_k, enc.cross_v,
        sup, blank, cfg, sample_len=SL)
    got = decode_segment_speculative_device(
        params_t, params_d, init_tokens, 1, 0, qcache(), qcache(),
        enc.cross_k, enc.cross_v, encd.cross_k, encd.cross_v,
        sup, blank, cfg, cfg, sample_len=SL, gamma=GAMMA)

    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))


def test_device_speculative_rejects_bad_gamma(setup):
    from whisper_tpu.decoding.device_speculative import (
        decode_speculative_device_full)

    cfg, vocab, params_t, enc_t, params_d, enc_d = setup
    for g in (0, 1):
        with pytest.raises(ValueError, match="gamma"):
            decode_speculative_device_full(
                params_t, cfg, vocab, enc_t.cross_k, enc_t.cross_v,
                params_d, cfg, enc_d.cross_k, enc_d.cross_v,
                DecodingOptions(sample_len=4), gamma=g)
