"""Device-side rules+topk beam path must match the host beam exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_tpu.decoding.task import DecodingOptions, decode_full
from whisper_tpu.io.vocab import make_vocab
from whisper_tpu.model.encoder import encode
from whisper_tpu.model.params import params_from_ggml

from fixtures import micro_config, random_tensors, synthetic_tokens


@pytest.fixture(scope="module")
def setup():
    cfg = micro_config(n_vocab=51864)
    tensors = random_tensors(cfg, seed=31)
    params = jax.tree.map(jnp.asarray, params_from_ggml(tensors, cfg))
    vocab = make_vocab(cfg.n_vocab, synthetic_tokens(cfg.n_vocab), cfg.n_vocab)
    rng = np.random.default_rng(5)
    mel = rng.standard_normal((1, cfg.n_mels, 2 * cfg.n_audio_ctx)).astype(np.float32)
    enc = encode(params, jnp.asarray(mel), cfg)
    return cfg, params, vocab, enc


@pytest.mark.parametrize("without_timestamps", [True, False])
def test_beam_topk_matches_host(setup, without_timestamps):
    """Host beam vs device rules+topk steps (patience forces the topk path)."""
    cfg, params, vocab, enc = setup
    opts = DecodingOptions(
        beam_size=3, sample_len=14, without_timestamps=without_timestamps,
        patience=1.0,  # patience != None keeps the host bookkeeping path
    )
    host = decode_full(params, cfg, vocab, enc.cross_k, enc.cross_v,
                       DecodingOptions(beam_size=3, sample_len=14,
                                       without_timestamps=without_timestamps),
                       use_device_loop=False)[0]
    dev = decode_full(params, cfg, vocab, enc.cross_k, enc.cross_v, opts,
                      use_device_loop=True)[0]
    assert dev.tokens == host.tokens
    assert abs(dev.avg_logprob - host.avg_logprob) < 1e-3


def test_device_beam_with_prompt_matches_host(setup):
    """Prompt conditioning (sot_index > 0, bucketed prefill) on the device beam."""
    cfg, params, vocab, enc = setup
    opts = DecodingOptions(beam_size=3, sample_len=10, prompt=list(range(300, 340)))
    host = decode_full(params, cfg, vocab, enc.cross_k, enc.cross_v, opts,
                       use_device_loop=False)[0]
    dev = decode_full(params, cfg, vocab, enc.cross_k, enc.cross_v, opts,
                      use_device_loop=True)[0]
    assert dev.tokens == host.tokens


@pytest.mark.parametrize("without_timestamps", [True, False])
def test_device_beam_matches_host(setup, without_timestamps):
    """Fully on-device beam loop vs the host beam — token exact."""
    cfg, params, vocab, enc = setup
    opts = DecodingOptions(
        beam_size=3, sample_len=14, without_timestamps=without_timestamps
    )
    host = decode_full(params, cfg, vocab, enc.cross_k, enc.cross_v, opts,
                       use_device_loop=False)[0]
    dev = decode_full(params, cfg, vocab, enc.cross_k, enc.cross_v, opts,
                      use_device_loop=True)[0]
    assert dev.tokens == host.tokens
    assert abs(dev.avg_logprob - host.avg_logprob) < 1e-3
    assert abs(dev.no_speech_prob - host.no_speech_prob) < 1e-4
