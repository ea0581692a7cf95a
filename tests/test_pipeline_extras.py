"""Temperature-fallback ladder, evaluation harness, prefix conditioning."""

import numpy as np
import pytest

import jax

from whisper_tpu.config import SAMPLE_RATE
from whisper_tpu.model.load import random_model
from whisper_tpu.pipeline.transcribe import TranscribeOptions, transcribe
from whisper_tpu.utils.wer import evaluate_dataset

from fixtures import synthetic_audio, tiny_config


@pytest.fixture(scope="module")
def model():
    return random_model(tiny_config(), seed=3, on_device=False)


def test_temperature_fallback_ladder(model):
    """An impossible compression gate forces the ladder to the last rung."""
    audio = synthetic_audio(SAMPLE_RATE * 4)
    result = transcribe(
        model, audio,
        TranscribeOptions(
            temperature=(0.0, 0.5, 1.0),
            compression_ratio_threshold=-1.0,  # every result "too repetitive"
            logprob_threshold=None,
            no_speech_threshold=None,
            condition_on_previous_text=False,
        ),
    )
    assert result["segments"]
    assert all(seg["temperature"] == 1.0 for seg in result["segments"])


def test_fallback_stops_at_passing_rung(model):
    audio = synthetic_audio(SAMPLE_RATE * 4)
    result = transcribe(
        model, audio,
        TranscribeOptions(
            temperature=(0.0, 1.0),
            compression_ratio_threshold=1e9,  # never repetitive
            logprob_threshold=-1e9,           # never too unlikely
            no_speech_threshold=None,
            condition_on_previous_text=False,
        ),
    )
    assert all(seg["temperature"] == 0.0 for seg in result["segments"])


def test_evaluate_dataset(model):
    dataset = [
        (synthetic_audio(SAMPLE_RATE * 3, seed=1), "hello world"),
        (synthetic_audio(SAMPLE_RATE * 3, seed=2), "another reference"),
    ]
    out = evaluate_dataset(
        model, dataset,
        options=TranscribeOptions(temperature=0.0, condition_on_previous_text=False),
    )
    assert out["utterances"] == 2
    assert 0.0 <= out["wer"]  # random weights: garbage, but the metric runs
    assert out["rtf"] > 0
    assert out["audio_seconds"] == pytest.approx(6.0)


def test_prefix_conditioning(model):
    """options.prefix forces the start of the segment output."""
    from whisper_tpu.decoding.task import DecodingOptions, DecodingTask

    vocab = model.vocab
    t = DecodingTask(
        model.config, vocab,
        DecodingOptions(prefix=[101, 102], without_timestamps=True, sample_len=4),
    )
    assert t.initial_tokens[-2:] == [101, 102]
    assert t.sample_begin == len(t.initial_tokens)
