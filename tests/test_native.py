"""Native C++ sidecar (libwhisper_rt.so) vs pure-Python implementations."""

import subprocess
import sys

import numpy as np
import pytest

from whisper_tpu.runtime import native

from fixtures import synthetic_audio, tiny_config, write_synthetic_ggml

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libwhisper_rt.so not built"
)


def test_native_wav_matches_python(tmp_path):
    from scipy.io import wavfile

    from whisper_tpu.io.wav import load_wav

    audio = synthetic_audio(16000 * 3)
    p = str(tmp_path / "a.wav")
    wavfile.write(p, 16000, (audio * 32767).astype(np.int16))
    out = native.native_load_wav(p)
    assert out is not None
    rate, data = out
    assert rate == 16000
    np.testing.assert_allclose(data, (audio * 32767).astype(np.int16) / 32768.0, atol=1e-6)
    # load_wav prefers the native path; must agree with it
    np.testing.assert_allclose(load_wav(p), data, atol=1e-7)


def test_native_wav_stereo_downmix(tmp_path):
    from scipy.io import wavfile

    audio = synthetic_audio(16000)
    stereo = np.stack([audio, -audio], axis=1)  # downmix to ~0
    p = str(tmp_path / "s.wav")
    wavfile.write(p, 16000, (stereo * 32767).astype(np.int16))
    rate, data = native.native_load_wav(p)
    assert np.abs(data).max() < 1e-3


def test_native_ggml_matches_python(tmp_path):
    from whisper_tpu.io.ggml import load_ggml

    cfg = tiny_config()
    path = str(tmp_path / "m.bin")
    write_synthetic_ggml(path, cfg, seed=3)
    out = native.native_open_ggml(path)
    assert out is not None
    header, filters, tokens, tensors = out
    ckpt = load_ggml(path, verbose=False)
    assert header == [
        cfg.n_vocab, cfg.n_audio_ctx, cfg.n_audio_state, cfg.n_audio_head,
        cfg.n_audio_layer, cfg.n_text_ctx, cfg.n_text_state, cfg.n_text_head,
        cfg.n_text_layer, cfg.n_mels, cfg.f16,
    ]
    np.testing.assert_array_equal(filters, ckpt.filters)
    assert tokens[:10] == [ckpt.vocab.id_to_token[i] for i in range(10)]
    assert set(tensors) == set(ckpt.tensors)
    for name in ("encoder.conv1.weight", "decoder.blocks.1.cross_attn.key.weight"):
        np.testing.assert_array_equal(tensors[name], ckpt.tensors[name])


def test_native_ggml_bad_magic(tmp_path):
    p = tmp_path / "bad.bin"
    p.write_bytes(b"\x01" * 128)
    with pytest.raises(RuntimeError, match="bad magic"):
        native.native_open_ggml(str(p))


def test_load_model_via_native(tmp_path):
    from whisper_tpu.model.load import load_model

    cfg = tiny_config()
    path = str(tmp_path / "m.bin")
    write_synthetic_ggml(path, cfg, seed=4)
    m_native = load_model(path, use_native=True)
    m_python = load_model(path, use_native=False)
    np.testing.assert_array_equal(
        np.asarray(m_native.params["encoder"]["blocks"]["q_w"]),
        np.asarray(m_python.params["encoder"]["blocks"]["q_w"]),
    )


def test_native_audio_loader_threads(tmp_path):
    """Threaded prefetch loader: all files decoded, submission order, content
    identical to the synchronous path."""
    import numpy as np
    from scipy.io import wavfile

    from whisper_tpu.runtime.native import NativeAudioLoader, native_load_wav

    rng = np.random.default_rng(0)
    paths = []
    for i in range(6):
        audio = (rng.standard_normal(16000 + 1000 * i) * 8000).astype(np.int16)
        p = str(tmp_path / f"a{i}.wav")
        wavfile.write(p, 16000, audio)
        paths.append(p)

    loader = NativeAudioLoader(paths, n_threads=3)
    got = list(loader)
    loader.close()
    assert [g[0] for g in got] == list(range(6))
    for i, rate, audio in got:
        ref = native_load_wav(paths[i])
        if ref is None:  # sidecar unavailable: loader fell back to python
            continue
        assert rate == ref[0] == 16000
        np.testing.assert_allclose(audio, ref[1], atol=0)


def test_native_audio_loader_missing_file(tmp_path):
    from whisper_tpu.runtime.native import NativeAudioLoader, available

    if not available():
        return
    loader = NativeAudioLoader([str(tmp_path / "nope.wav")], n_threads=2)
    assert loader.get(0) is None
    loader.close()
