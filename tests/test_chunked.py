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


def test_merge_window_segments_overlap_midpoint_rule():
    """Each segment is kept by exactly one window; boundary fragments from a
    window edge are replaced by the neighbor's full-view version."""
    import dataclasses as dc

    from whisper_tpu.decoding.result import Segment
    from whisper_tpu.pipeline.chunked import merge_window_segments

    def seg(t0, t1, text):
        return Segment(id=0, seek=0, t0=t0, t1=t1, text=text, tokens=[],
                       avg_logprob=0.0, no_speech_prob=0.0, temperature=0.0,
                       compression_ratio=1.0)

    # windows at frames 0 and 2500 (25 s) with 500-frame (5 s) overlap:
    # cut at 25 + 2.5 = 27.5 s
    w0 = [seg(0.0, 10.0, " a"), seg(10.0, 26.0, " b"), seg(26.5, 29.9, " clip")]
    w1 = [seg(25.2, 27.0, " dup-b-tail"), seg(27.2, 31.0, " c"),
          seg(31.0, 40.0, " d")]
    merged = merge_window_segments([(0, w0), (2500, w1)], overlap_frames=500)
    texts = [s.text for s in merged]
    # " clip" (mid 28.2 >= 27.5) dropped from w0; " dup-b-tail" (mid 26.1
    # < 27.5) dropped from w1; " c" (mid 29.1) kept by w1.
    assert texts == [" a", " b", " c", " d"]
    assert [s.id for s in merged] == [0, 1, 2, 3]


def test_chunked_overlap_end_to_end(model):
    """Overlap mode runs end-to-end and yields time-ordered segments."""
    audio = synthetic_audio(SAMPLE_RATE * 70)
    out = transcribe_chunked(model, audio, overlap_seconds=5.0,
                             without_timestamps=False)
    mids = [(s["t0"] + s["t1"]) / 2 for s in out["segments"]]
    assert mids == sorted(mids)
    assert out["duration"] > 0


def test_extract_segments_single_timestamp_ending_tail(model):
    """A trailing single timestamp closes the final segment AT that
    timestamp (the sequential finish_window grammar), not at the window
    end (regression: chunked used to stamp t1 = window end)."""
    from whisper_tpu.decoding.result import DecodingResult
    from whisper_tpu.pipeline.chunked import extract_segments

    vocab = model.vocab
    beg = vocab.token_beg
    toks = [beg, 7, beg + 10, beg + 10, 8, beg + 20]
    result = DecodingResult(
        tokens=toks, text="", avg_logprob=-0.1, no_speech_prob=0.0,
        temperature=0.0, compression_ratio=1.0,
    )
    segs = extract_segments(result, vocab, time_offset=0.0,
                            window_duration=30.0, seek=0)
    assert len(segs) == 2
    assert segs[0].t1 == pytest.approx(10 * 0.02)
    assert segs[1].t1 == pytest.approx(20 * 0.02)  # NOT 30.0
