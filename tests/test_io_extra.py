"""Extra IO coverage: float/24-bit WAV, f16 model load, convert CLI."""

import numpy as np
import pytest

from whisper_tpu.config import SAMPLE_RATE
from whisper_tpu.errors import AudioError
from whisper_tpu.io.wav import load_wav, resample_poly

from fixtures import synthetic_audio, tiny_config, write_synthetic_ggml


def test_float32_wav(tmp_path):
    from scipy.io import wavfile

    audio = synthetic_audio(SAMPLE_RATE)
    p = str(tmp_path / "f.wav")
    wavfile.write(p, SAMPLE_RATE, audio.astype(np.float32))
    loaded = load_wav(p)
    np.testing.assert_allclose(loaded, audio, atol=1e-6)


def test_int32_wav(tmp_path):
    from scipy.io import wavfile

    audio = synthetic_audio(SAMPLE_RATE)
    p = str(tmp_path / "i32.wav")
    wavfile.write(p, SAMPLE_RATE, (audio * 2147483647).astype(np.int32))
    loaded = load_wav(p)
    np.testing.assert_allclose(loaded, audio, atol=1e-4)


def test_native_24bit_wav(tmp_path):
    from whisper_tpu.runtime import native

    if not native.available():
        pytest.skip("native lib not built")
    # hand-roll a 24-bit PCM WAV
    import struct

    audio = synthetic_audio(SAMPLE_RATE // 2)
    pcm24 = b""
    vals = np.clip((audio * 8388607).astype(np.int32), -8388608, 8388607)
    raw = bytearray()
    for v in vals:
        raw += int(v & 0xFFFFFF).to_bytes(3, "little")
    data = bytes(raw)
    p = str(tmp_path / "b24.wav")
    with open(p, "wb") as f:
        byte_rate = SAMPLE_RATE * 3
        f.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, SAMPLE_RATE, byte_rate, 3, 24))
        f.write(b"data" + struct.pack("<I", len(data)) + data)
    rate, loaded = native.native_load_wav(p)
    assert rate == SAMPLE_RATE
    np.testing.assert_allclose(loaded, audio, atol=2e-3)


def test_resample():
    audio = synthetic_audio(8000)
    up = resample_poly(audio, 16000, 8000)
    assert len(up) == 16000


def test_unsupported_rate_without_resample(tmp_path):
    from scipy.io import wavfile

    p = str(tmp_path / "8k.wav")
    wavfile.write(p, 8000, (synthetic_audio(8000) * 32767).astype(np.int16))
    with pytest.raises(AudioError):
        load_wav(p, resample=False)


def test_f16_model_load_and_encode(tmp_path):
    """f16 checkpoint -> bf16 model -> encoder runs (the production load)."""
    import dataclasses

    import jax.numpy as jnp

    from whisper_tpu.frontend.mel import mel_filter_bank
    from whisper_tpu.io.ggml import write_ggml
    from whisper_tpu.model.encoder import encode
    from whisper_tpu.model.load import load_model
    from fixtures import random_tensors, synthetic_tokens

    cfg = dataclasses.replace(tiny_config(), f16=1)
    p = str(tmp_path / "f16.bin")
    write_ggml(p, cfg, mel_filter_bank(80), synthetic_tokens(cfg.n_vocab),
               random_tensors(cfg, seed=5))
    model = load_model(p, dtype=jnp.bfloat16)
    assert model.dtype == jnp.bfloat16
    mel = jnp.zeros((1, cfg.n_mels, 2 * cfg.n_audio_ctx), jnp.float32)
    out = encode(model.params, mel, model.config)
    assert out.hidden.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out.hidden, dtype=np.float32)).all()


def test_convert_cli_roundtrip(tmp_path, capsys):
    from whisper_tpu.cli import main
    from whisper_tpu.io.ggml import load_ggml

    src = str(tmp_path / "f32.bin")
    dst = str(tmp_path / "f16.bin")
    write_synthetic_ggml(src, tiny_config(), seed=2)
    assert main(["convert", src, dst, "--f16"]) == 0
    b = load_ggml(dst, verbose=False)
    assert b.config.f16 == 1
    a = load_ggml(src, verbose=False)
    np.testing.assert_allclose(
        b.tensors["decoder.blocks.0.mlp.0.weight"].astype(np.float32),
        a.tensors["decoder.blocks.0.mlp.0.weight"], atol=1e-3,
    )