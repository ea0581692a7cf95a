"""Streaming mode: incremental feeds, offline-identical final transcript."""

import numpy as np
import pytest

from whisper_tpu.config import SAMPLE_RATE
from whisper_tpu.model.load import random_model
from whisper_tpu.pipeline.streaming import StreamingTranscriber
from whisper_tpu.pipeline.transcribe import TranscribeOptions, transcribe

from fixtures import synthetic_audio, tiny_config


@pytest.fixture(scope="module")
def model():
    return random_model(tiny_config(), seed=13, on_device=False)


def _loud_onset_audio(seconds):
    """Loudest frame early: the global mel max is known from the start, so
    streaming commits are decoded against the offline normalization."""
    audio = synthetic_audio(SAMPLE_RATE * seconds) * 0.2
    audio[: SAMPLE_RATE // 2] *= 5.0
    return audio.astype(np.float32)


def test_streaming_matches_offline_5s_increments(model):
    audio = _loud_onset_audio(70)
    offline = transcribe(model, audio, TranscribeOptions())

    st = StreamingTranscriber(model, TranscribeOptions())
    committed = []
    drafts = 0
    for start in range(0, len(audio), 5 * SAMPLE_RATE):
        out = st.feed(audio[start : start + 5 * SAMPLE_RATE])
        committed.extend(out["committed"])
        drafts += bool(out["draft"])
    final = st.finalize()

    assert final["text"] == offline["text"]
    assert len(final["segments"]) == len(offline["segments"])
    for a, b in zip(final["segments"], offline["segments"]):
        assert a["tokens"] == b["tokens"]
        assert a["t0"] == b["t0"] and a["t1"] == b["t1"]
    # windows were committed before finalize (true streaming, not buffering)
    assert committed, "no segments committed during feeding"
    assert all(
        c["tokens"] == s["tokens"]
        for c, s in zip(committed, final["segments"])
    )
    assert drafts > 0


def test_streaming_normalization_drift_fallback(model):
    """A loud LATE section changes the global mel max after windows were
    committed; finalize() must detect the drift and still return the exact
    offline transcript."""
    audio = synthetic_audio(SAMPLE_RATE * 70) * 0.05
    audio[-SAMPLE_RATE:] *= 40.0  # loudest frame at the very end
    audio = audio.astype(np.float32)
    offline = transcribe(model, audio, TranscribeOptions())

    st = StreamingTranscriber(model, TranscribeOptions())
    for start in range(0, len(audio), 10 * SAMPLE_RATE):
        st.feed(audio[start : start + 10 * SAMPLE_RATE])
    final = st.finalize()
    assert final["text"] == offline["text"]
    assert [s["tokens"] for s in final["segments"]] == [
        s["tokens"] for s in offline["segments"]
    ]


def test_streaming_finalize_idempotent_and_feed_after_final(model):
    audio = _loud_onset_audio(5)
    st = StreamingTranscriber(model, TranscribeOptions())
    st.feed(audio)
    a = st.finalize()
    assert st.finalize() is a
    with pytest.raises(RuntimeError):
        st.feed(audio)
