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


def test_audio_ctx_auto_shrinks_final_window():
    """audio_ctx='auto' (per-window derivation from remaining content,
    main.rs:362 exp_n_audio_ctx semantics made adaptive): full windows run
    the unchanged full-ctx program — token-identical first window — and the
    short final window encodes a 256-frame-bucketed context instead of the
    full one."""
    import dataclasses as _dc

    import numpy as np

    from fixtures import micro_config
    from whisper_tpu.model.load import random_model
    from whisper_tpu.pipeline.transcribe import transcribe

    cfg = _dc.replace(micro_config(n_vocab=51864), n_audio_ctx=512,
                      n_text_ctx=448)
    model = random_model(cfg, seed=11, on_device=False)
    rng = np.random.default_rng(0)
    audio = rng.standard_normal(16000 * 12).astype(np.float32) * 0.1
    # 12 s = 1200 content frames over 1024-frame windows: window 1 full,
    # window 2 remaining 176 -> auto window max(512, 256) = 512 frames.
    full = transcribe(model, audio, language="en", use_flash=False)
    auto = transcribe(model, audio, language="en", use_flash=False,
                      audio_ctx="auto")
    f_segs, a_segs = full["segments"], auto["segments"]
    assert f_segs and a_segs
    # first (full) window: identical program -> identical segments
    f1 = [s for s in f_segs if s["seek"] == 0]
    a1 = [s for s in a_segs if s["seek"] == 0]
    assert [s["tokens"] for s in f1] == [s["tokens"] for s in a1]
    # the auto run still consumed the full clip
    assert auto["duration"] == full["duration"]


def test_audio_ctx_auto_rejected_by_streaming():
    import dataclasses as _dc

    import pytest

    from fixtures import micro_config
    from whisper_tpu.model.load import random_model
    from whisper_tpu.pipeline.streaming import StreamingTranscriber

    model = random_model(micro_config(n_vocab=51864), seed=3, on_device=False)
    with pytest.raises(ValueError, match="offline-only"):
        StreamingTranscriber(model, language="en", audio_ctx="auto")
