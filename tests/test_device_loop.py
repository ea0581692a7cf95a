"""On-device decode loop must match the host loop token-for-token (greedy)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_tpu.decoding.device_loop import build_masks, decode_segment_device
from whisper_tpu.decoding.task import DecodingOptions, decode_full
from whisper_tpu.io.vocab import make_vocab
from whisper_tpu.model.decoder import init_cache
from whisper_tpu.model.encoder import encode
from whisper_tpu.model.params import params_from_ggml

from fixtures import micro_config, random_tensors, synthetic_tokens


@pytest.fixture(scope="module")
def setup():
    cfg = micro_config(n_vocab=51864)
    tensors = random_tensors(cfg, seed=21)
    params = jax.tree.map(jnp.asarray, params_from_ggml(tensors, cfg))
    vocab = make_vocab(cfg.n_vocab, synthetic_tokens(cfg.n_vocab), cfg.n_vocab)
    rng = np.random.default_rng(3)
    mel = rng.standard_normal((2, cfg.n_mels, 2 * cfg.n_audio_ctx)).astype(np.float32)
    enc = encode(params, jnp.asarray(mel), cfg)
    return cfg, params, vocab, enc


def _host_greedy(cfg, params, vocab, enc, use_timestamps, sample_len):
    opts = DecodingOptions(
        without_timestamps=not use_timestamps,
        sample_len=sample_len,
        suppress_tokens=(-1,),
        suppress_blank=True,
    )
    return decode_full(params, cfg, vocab, enc.cross_k, enc.cross_v, opts)


def _device_greedy(cfg, params, vocab, enc, use_timestamps, sample_len):
    sup, blank = build_masks(vocab)
    B = enc.cross_k.shape[1]
    init = [vocab.token_sot] + ([] if use_timestamps else [vocab.token_not])
    init_tokens = jnp.asarray(np.tile(np.array(init, np.int32), (B, 1)))
    cache = init_cache(cfg, B)
    toks, lengths, sum_lp, nosp = decode_segment_device(
        params, init_tokens, len(init), init.index(vocab.token_sot),
        cache, enc.cross_k, enc.cross_v, sup, blank, cfg,
        sample_len=sample_len, use_timestamps=use_timestamps,
    )
    return np.asarray(toks), np.asarray(lengths), np.asarray(sum_lp), np.asarray(nosp)


@pytest.mark.parametrize("use_timestamps", [False, True])
def test_device_matches_host(setup, use_timestamps):
    cfg, params, vocab, enc = setup
    sample_len = 24
    host = _host_greedy(cfg, params, vocab, enc, use_timestamps, sample_len)
    toks, lengths, sum_lp, nosp = _device_greedy(
        cfg, params, vocab, enc, use_timestamps, sample_len
    )
    for i in range(len(host)):
        h = host[i].tokens
        d = toks[i][: lengths[i]].tolist()
        assert d == h, f"seq {i}: device {d} != host {h}"
        # no-speech prob identical source position
        assert abs(nosp[i] - host[i].no_speech_prob) < 1e-4
        # avg logprob close (host adds the EOT step logprob too)
        if lengths[i] < sample_len:  # finished: logprob accounting comparable
            host_avg = host[i].avg_logprob
            dev_avg = sum_lp[i] / (lengths[i] + 1)
            assert abs(dev_avg - host_avg) < 0.15


def test_device_path_with_prompt_matches_host(setup):
    """decode_full(use_device_loop) == host path, with prompt conditioning
    (exercises bucketed prefill and sot_index > 0)."""
    cfg, params, vocab, enc = setup
    prompt = list(range(200, 240))
    opts = DecodingOptions(sample_len=16, prompt=prompt)
    host = decode_full(params, cfg, vocab, enc.cross_k, enc.cross_v, opts,
                       use_device_loop=False)
    dev = decode_full(params, cfg, vocab, enc.cross_k, enc.cross_v, opts,
                      use_device_loop=True)
    for h, d in zip(host, dev):
        assert d.tokens == h.tokens
        assert abs(d.no_speech_prob - h.no_speech_prob) < 1e-4


def test_device_loop_temperature_runs(setup):
    cfg, params, vocab, enc = setup
    sup, blank = build_masks(vocab)
    B = enc.cross_k.shape[1]
    init_tokens = jnp.asarray(np.tile([[vocab.token_sot]], (B, 1)).astype(np.int32))
    cache = init_cache(cfg, B)
    toks, lengths, _, _ = decode_segment_device(
        params, init_tokens, 1, 0, cache, enc.cross_k, enc.cross_v, sup, blank, cfg,
        sample_len=12, use_timestamps=True, temperature=0.7, seed=5,
    )
    assert toks.shape == (B, 12)
    assert (np.asarray(lengths) <= 12).all()


def test_build_masks_forwards_custom_suppress_list():
    """Custom suppress_tokens specs must reach the device mask (they were
    silently replaced by the default non-speech set before)."""
    from whisper_tpu.decoding.rules import build_suppress_list
    from fixtures import micro_config, synthetic_tokens
    from whisper_tpu.io.vocab import make_vocab

    cfg = micro_config(n_vocab=51864)
    vocab = make_vocab(cfg.n_vocab, synthetic_tokens(cfg.n_vocab), cfg.n_vocab)

    custom = (123, 456)  # no -1: non-speech set must NOT be applied
    sup, _ = build_masks(vocab, suppress_tokens=custom)
    sup = np.asarray(sup)
    expect = np.zeros(cfg.n_vocab, bool)
    expect[build_suppress_list(vocab, custom)] = True
    np.testing.assert_array_equal(sup, expect)
    assert sup[123] and sup[456]

    # falsy spec -> no suppression at all (host adds no filter then)
    sup_none, _ = build_masks(vocab, suppress_tokens=None)
    assert not np.asarray(sup_none).any()

    # default spec unchanged: -1 expands to non-speech + specials
    sup_def, _ = build_masks(vocab)
    expect_def = np.zeros(cfg.n_vocab, bool)
    expect_def[build_suppress_list(vocab)] = True
    np.testing.assert_array_equal(np.asarray(sup_def), expect_def)


def test_temperature_sampling_host_matches_device():
    """t>0: the host loop now uses the device loop's PRNG schedule
    (PRNGKey(seed), split per step, gumbel categorical) — same backend,
    same seed => identical samples (round-1 review weak #4)."""
    from fixtures import micro_config, random_tensors, synthetic_tokens
    from whisper_tpu.decoding.task import DecodingOptions, decode_full
    from whisper_tpu.io.vocab import make_vocab
    from whisper_tpu.model.encoder import encode
    from whisper_tpu.model.params import params_from_ggml

    cfg = micro_config(n_vocab=51864)
    params = jax.tree.map(
        jnp.asarray, params_from_ggml(random_tensors(cfg, seed=21), cfg))
    vocab = make_vocab(cfg.n_vocab, synthetic_tokens(cfg.n_vocab), cfg.n_vocab)
    rng = np.random.default_rng(2)
    mel = rng.standard_normal((2, cfg.n_mels, 2 * cfg.n_audio_ctx)).astype(np.float32)
    enc = encode(params, jnp.asarray(mel), cfg)

    opts = DecodingOptions(temperature=0.8, sample_len=16, seed=7,
                           without_timestamps=True)
    host = decode_full(params, cfg, vocab, enc.cross_k, enc.cross_v, opts,
                       use_device_loop=False)
    dev = decode_full(params, cfg, vocab, enc.cross_k, enc.cross_v, opts,
                      use_device_loop=True)
    for h, d in zip(host, dev):
        assert h.tokens == d.tokens


def test_budget_edge_with_long_prompt_matches_host():
    """openai's sample-append-then-break arithmetic at the n_text_ctx edge:
    with a prompt long enough that prefill+sample_len overflows the context,
    the device loop must sample exactly n_text_ctx - true_len + 1 tokens —
    the r2 clamp keyed on the PADDED width and fell short by pad slack + 1."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from fixtures import micro_config, random_tensors, synthetic_tokens
    from whisper_tpu.decoding.task import DecodingOptions, decode_full
    from whisper_tpu.io.vocab import make_vocab
    from whisper_tpu.model.encoder import encode
    from whisper_tpu.model.params import params_from_ggml

    cfg = micro_config(n_vocab=51864)  # n_text_ctx = 96
    params = jax.tree.map(jnp.asarray,
                          params_from_ggml(random_tensors(cfg, seed=3), cfg))
    vocab = make_vocab(cfg.n_vocab, synthetic_tokens(cfg.n_vocab), cfg.n_vocab)
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, cfg.n_mels, 2 * cfg.n_audio_ctx)).astype(np.float32)
    enc = encode(params, jnp.asarray(mel), cfg)
    # prompt of 40 -> initial [prev]+40+[sot] = 42, padded 64;
    # budget = 96 - 42 + 1 = 55 > 96 - 64 = 32 (the old clamp)
    prompt = [int(t) for t in rng.integers(100, 5000, size=40)]
    opts = DecodingOptions(temperature=0.0, prompt=prompt, sample_len=90)
    host = decode_full(params, cfg, vocab, enc.cross_k, enc.cross_v, opts,
                       use_device_loop=False)[0]
    dev = decode_full(params, cfg, vocab, enc.cross_k, enc.cross_v, opts,
                      use_device_loop=True)[0]
    assert dev.tokens == host.tokens
    assert len(dev.tokens) <= cfg.n_text_ctx - 42 + 1
    assert abs(dev.avg_logprob - host.avg_logprob) < 1e-3
