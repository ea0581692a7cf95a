"""Multilingual paths: language detection, task tokens, translate (BASELINE config 2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_tpu.decoding.task import DecodingOptions, DecodingTask, decode_full, detect_language
from whisper_tpu.io.vocab import make_vocab
from whisper_tpu.model.encoder import encode
from whisper_tpu.model.params import params_from_ggml

from fixtures import micro_config, random_tensors, synthetic_tokens


@pytest.fixture(scope="module")
def setup():
    cfg = micro_config(n_vocab=51865)  # multilingual
    tensors = random_tensors(cfg, seed=13)
    params = jax.tree.map(jnp.asarray, params_from_ggml(tensors, cfg))
    vocab = make_vocab(cfg.n_vocab, synthetic_tokens(51864), 51864)
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((1, cfg.n_mels, 2 * cfg.n_audio_ctx)).astype(np.float32)
    enc = encode(params, jnp.asarray(mel), cfg)
    return cfg, params, vocab, enc


def test_sot_sequence_multilingual(setup):
    cfg, params, vocab, enc = setup
    task = DecodingTask(cfg, vocab, DecodingOptions(language="de", task="transcribe"))
    assert task.sot_sequence == [
        vocab.token_sot, vocab.language_token("de"), vocab.token_transcribe
    ]
    task = DecodingTask(cfg, vocab, DecodingOptions(language="fr", task="translate"))
    assert task.sot_sequence[2] == vocab.token_translate
    task = DecodingTask(
        cfg, vocab, DecodingOptions(language="en", without_timestamps=True)
    )
    assert task.sot_sequence[-1] == vocab.token_not


def test_detect_language_returns_valid(setup):
    cfg, params, vocab, enc = setup
    langs, probs = detect_language(params, cfg, vocab, enc.cross_k, enc.cross_v)
    assert langs[0] in vocab.languages
    p = probs[0]
    assert abs(sum(p.values()) - 1.0) < 1e-3
    assert p[langs[0]] == max(p.values())


def test_translate_vs_transcribe_condition_logits(setup):
    """The task token must condition the model: first-step logits differ."""
    from whisper_tpu.model.decoder import decode_step, init_cache

    cfg, params, vocab, enc = setup
    out = {}
    for task in ("transcribe", "translate"):
        t = DecodingTask(cfg, vocab, DecodingOptions(language="de", task=task))
        toks = jnp.asarray(np.array([t.initial_tokens], np.int32))
        cache = init_cache(cfg, 1)
        lg, _ = decode_step(params, toks, jnp.int32(0), cache,
                            enc.cross_k, enc.cross_v, cfg)
        out[task] = np.asarray(lg)[0, -1]
    assert np.abs(out["transcribe"] - out["translate"]).max() > 1e-3


def test_device_loop_multilingual_matches_host(setup):
    cfg, params, vocab, enc = setup
    opts = DecodingOptions(language="zh", task="transcribe", sample_len=12)
    host = decode_full(params, cfg, vocab, enc.cross_k, enc.cross_v, opts,
                       use_device_loop=False)[0]
    dev = decode_full(params, cfg, vocab, enc.cross_k, enc.cross_v, opts,
                      use_device_loop=True)[0]
    assert dev.tokens == host.tokens


def test_speed_up_mel_smoke():
    from whisper_tpu.frontend.mel import log_mel_spectrogram, mel_filter_bank
    from fixtures import synthetic_audio

    audio = synthetic_audio(16000 * 2)
    filters_small = mel_filter_bank(80)[:, :101]  # fft_size//4 + 1 bins
    out = log_mel_spectrogram(
        jnp.asarray(audio), jnp.asarray(filters_small), 200,
        center=False, fold=True, speed_up=True,
    )
    assert out.shape == (80, 200)
    assert np.isfinite(np.asarray(out)).all()
