"""Chunk-parallel long-form pipeline + serving engine tests (CPU mesh)."""

import numpy as np
import pytest

import jax

from whisper_tpu.config import SAMPLE_RATE
from whisper_tpu.model.load import random_model
from whisper_tpu.parallel.mesh import make_mesh
from whisper_tpu.parallel.serving import BatchTranscriber
from whisper_tpu.pipeline.chunked import transcribe_chunked
from whisper_tpu.pipeline.transcribe import TranscribeOptions

from fixtures import synthetic_audio, tiny_config


@pytest.fixture(scope="module")
def model():
    import dataclasses

    cfg = dataclasses.replace(tiny_config(), n_audio_head=4, n_text_head=4)
    return random_model(cfg, seed=7, on_device=False)


def test_chunked_single_device(model):
    audio = synthetic_audio(SAMPLE_RATE * 70)  # 3 windows
    out = transcribe_chunked(
        model, audio, TranscribeOptions(condition_on_previous_text=False),
        batch_windows=4,
    )
    assert out["duration"] == pytest.approx(70.0)
    seeks = {seg["seek"] for seg in out["segments"]}
    assert len(seeks) >= 2
    for seg in out["segments"]:
        assert seg["t1"] >= seg["t0"] - 1e-6


def test_chunked_on_mesh(model):
    mesh = make_mesh(8, tp=4)  # dp=2
    audio = synthetic_audio(SAMPLE_RATE * 70)
    out_mesh = transcribe_chunked(
        model, audio, TranscribeOptions(condition_on_previous_text=False),
        mesh=mesh, batch_windows=4,
    )
    out_single = transcribe_chunked(
        model, audio, TranscribeOptions(condition_on_previous_text=False),
        batch_windows=4,
    )
    # sharded and single-device decode must produce identical tokens
    assert [s["tokens"] for s in out_mesh["segments"]] == [
        s["tokens"] for s in out_single["segments"]
    ]


def test_batch_transcriber(model):
    engine = BatchTranscriber(model, batch_size=2)
    audios = [synthetic_audio(SAMPLE_RATE * 5, seed=i) for i in (1, 2)]
    results = engine.transcribe_batch(audios)
    assert len(results) == 2
    for r in results:
        assert isinstance(r.tokens, list)
        assert r.avg_logprob <= 0.0
    with pytest.raises(ValueError):
        engine.transcribe_batch(audios[:1])


def test_batch_transcriber_on_mesh(model):
    mesh = make_mesh(8, tp=4)
    engine = BatchTranscriber(model, batch_size=2, mesh=mesh)
    audios = [synthetic_audio(SAMPLE_RATE * 5, seed=i) for i in (1, 2)]
    single = BatchTranscriber(model, batch_size=2).transcribe_batch(audios)
    sharded = engine.transcribe_batch(audios)
    assert [r.tokens for r in sharded] == [r.tokens for r in single]
