"""Mel frontend parity (SURVEY.md §7 step 2).

Three-way check: jax DFT-as-matmul impl vs an independent float64 numpy
rfft implementation (both modes), and vs transformers' WhisperFeatureExtractor
(openai semantics) for the center/no-fold mode.
"""

import numpy as np
import pytest

from whisper_tpu.config import HOP_LENGTH
from whisper_tpu.frontend.mel import (
    frame_count,
    log_mel_numpy,
    log_mel_spectrogram,
    mel_filter_bank,
    mel_window,
)

from fixtures import synthetic_audio


@pytest.fixture(scope="module")
def filters():
    return mel_filter_bank(80)


@pytest.fixture(scope="module")
def audio():
    return synthetic_audio(16000 * 11)  # 11 s, like jfk.wav


def test_reference_mode_vs_numpy(audio, filters):
    """center=False + fold=True: the whisper.cpp-1.0.3 contract (main.rs:1553-1671)."""
    n_frames = frame_count(len(audio), center=False)
    assert n_frames == len(audio) // HOP_LENGTH  # main.rs:1575
    ours = np.asarray(log_mel_spectrogram(audio, filters, n_frames, center=False, fold=True))
    golden = log_mel_numpy(audio, filters, center=False, fold=True)
    assert ours.shape == (80, n_frames)
    np.testing.assert_allclose(ours, golden, atol=2e-4)


def test_openai_mode_vs_numpy(audio, filters):
    n_frames = frame_count(len(audio), center=True)
    ours = np.asarray(log_mel_spectrogram(audio, filters, n_frames, center=True, fold=False))
    golden = log_mel_numpy(audio, filters, center=True, fold=False)
    np.testing.assert_allclose(ours, golden, atol=2e-4)


def test_openai_mode_vs_transformers(audio, filters):
    """Bit-comparable mel vs the HF/openai feature extractor (pads to 30 s)."""
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor(feature_size=80)
    hf = fe(audio, sampling_rate=16000, return_tensors="np", padding="max_length")[
        "input_features"
    ][0]  # (80, 3000)
    padded = np.zeros(480_000, dtype=np.float32)
    padded[: len(audio)] = audio
    ours = np.asarray(log_mel_spectrogram(padded, filters, 3000, center=True, fold=False))
    assert ours.shape == hf.shape == (80, 3000)
    np.testing.assert_allclose(ours, hf, atol=2e-4)


def test_mel_window_zero_pad(audio, filters):
    n_frames = frame_count(len(audio), center=False)
    mel = np.asarray(log_mel_spectrogram(audio, filters, n_frames, center=False, fold=True))
    win = np.asarray(mel_window(mel, 0, 3000))
    assert win.shape == (80, 3000)
    np.testing.assert_array_equal(win[:, :n_frames], mel)
    np.testing.assert_array_equal(win[:, n_frames:], 0.0)
    # window past the end (main.rs:1822-1829 clamps)
    win2 = np.asarray(mel_window(mel, n_frames + 10, 3000))
    np.testing.assert_array_equal(win2, 0.0)


def test_tail_frames_zero_padded(filters):
    """Frames whose 400-sample window crosses the end read zeros
    (main.rs:1596-1600)."""
    audio = synthetic_audio(16000)  # 100 frames; frame 99 needs samples 15840..16240
    n_frames = frame_count(len(audio), center=False)
    ours = np.asarray(log_mel_spectrogram(audio, filters, n_frames, center=False, fold=True))
    golden = log_mel_numpy(audio, filters, center=False, fold=True)
    np.testing.assert_allclose(ours, golden, atol=2e-4)
