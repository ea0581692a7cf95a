"""End-to-end transcription pipeline tests (sliding window, segments, CLI)."""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_tpu.config import SAMPLE_RATE
from whisper_tpu.model.load import load_model
from whisper_tpu.pipeline.transcribe import TranscribeOptions, transcribe

from fixtures import synthetic_audio, tiny_config, write_synthetic_ggml


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("ckpt") / "ggml-tiny-synth.bin"
    write_synthetic_ggml(path, tiny_config(), seed=9)
    return load_model(str(path), use_native=False)


def test_transcribe_short(model):
    """Single window; random weights -> garbage text but valid structure."""
    audio = synthetic_audio(SAMPLE_RATE * 8)
    result = transcribe(
        model, audio,
        TranscribeOptions(temperature=0.0, condition_on_previous_text=False),
    )
    assert result["language"] == "en"
    assert result["duration"] == pytest.approx(8.0)
    assert isinstance(result["text"], str)
    for seg in result["segments"]:
        assert 0.0 <= seg["t0"] <= seg["t1"] <= 40.0
        assert seg["seek"] == 0


def test_transcribe_long_multiwindow(model):
    """> 30 s audio exercises the sliding-window seek loop."""
    audio = synthetic_audio(SAMPLE_RATE * 35)
    result = transcribe(
        model, audio,
        TranscribeOptions(temperature=0.0, condition_on_previous_text=True),
    )
    seeks = {seg["seek"] for seg in result["segments"]}
    assert len(seeks) >= 2, "expected at least two windows"
    # segments ordered and timestamps monotone across the file
    t_prev = 0.0
    for seg in result["segments"]:
        assert seg["t0"] >= t_prev - 1e-6
        t_prev = seg["t0"]


def test_transcribe_no_timestamps(model):
    """without_timestamps drops the timestamp grammar (openai semantics: the
    <|notimestamps|> task token is used; sampled timestamps — which a trained
    model won't emit but random weights may — never reach the text)."""
    audio = synthetic_audio(SAMPLE_RATE * 6)
    result = transcribe(
        model, audio,
        TranscribeOptions(
            temperature=0.0, without_timestamps=True, condition_on_previous_text=False
        ),
    )
    assert result["segments"], "expected at least one segment"
    for seg in result["segments"]:
        # decode() strips ids >= eot, so no "[_TT_x]" artifacts in text
        assert "[_TT_" not in seg["text"] and "<|" not in seg["text"]


def test_wav_roundtrip(tmp_path, model):
    from scipy.io import wavfile

    from whisper_tpu.io.wav import load_wav

    audio = synthetic_audio(SAMPLE_RATE * 2)
    p = str(tmp_path / "a.wav")
    wavfile.write(p, SAMPLE_RATE, (audio * 32767).astype(np.int16))
    loaded = load_wav(p)
    assert loaded.shape == audio.shape
    np.testing.assert_allclose(loaded, audio, atol=1e-3)

    # stereo downmix + resample path
    stereo = np.stack([audio, audio], axis=1)
    p2 = str(tmp_path / "b.wav")
    wavfile.write(p2, 8000, (stereo[: SAMPLE_RATE] * 32767).astype(np.int16))
    loaded2 = load_wav(p2)
    assert loaded2.ndim == 1
    assert len(loaded2) == 2 * SAMPLE_RATE  # 8k -> 16k doubles samples


def test_cli_transcribe(tmp_path, model, capsys):
    from scipy.io import wavfile

    from whisper_tpu.cli import main

    ckpt = str(tmp_path / "m.bin")
    write_synthetic_ggml(ckpt, tiny_config(), seed=9)
    wav = str(tmp_path / "x.wav")
    audio = synthetic_audio(SAMPLE_RATE * 4)
    wavfile.write(wav, SAMPLE_RATE, (audio * 32767).astype(np.int16))
    out_json = str(tmp_path / "out.json")
    rc = main(
        ["transcribe", ckpt, wav, "--no-condition-on-previous-text",
         "--temperature", "0", "--output-json", out_json]
    )
    assert rc == 0
    captured = capsys.readouterr()
    assert "realtime" in captured.out
    import json

    with open(out_json) as f:
        data = json.load(f)
    assert wav in data and "segments" in data[wav]


def test_cli_eval(tmp_path, capsys):
    from scipy.io import wavfile

    from whisper_tpu.cli import main

    ckpt = str(tmp_path / "m.bin")
    write_synthetic_ggml(ckpt, tiny_config(), seed=9)
    for i in range(2):
        audio = synthetic_audio(SAMPLE_RATE * 2, seed=i)
        wavfile.write(str(tmp_path / f"u{i}.wav"), SAMPLE_RATE,
                      (audio * 32767).astype(np.int16))
        (tmp_path / f"u{i}.txt").write_text("some reference text")
    rc = main(["eval", ckpt, str(tmp_path), "--dtype", "float32",
               "--no-condition-on-previous-text"])
    assert rc == 0
    out = capsys.readouterr().out
    assert '"wer"' in out and '"utterances": 2' in out


def test_cli_info(tmp_path, capsys):
    from whisper_tpu.cli import main

    ckpt = str(tmp_path / "m.bin")
    write_synthetic_ggml(ckpt, tiny_config(), seed=1)
    assert main(["info", ckpt]) == 0
    out = capsys.readouterr().out
    assert "tensors" in out and "89" in out


def test_cli_detect_language(tmp_path, capsys):
    from scipy.io import wavfile

    from whisper_tpu.cli import main

    wav = str(tmp_path / "x.wav")
    audio = synthetic_audio(SAMPLE_RATE * 2, seed=3)
    wavfile.write(wav, SAMPLE_RATE, (audio * 32767).astype(np.int16))

    ml = str(tmp_path / "ml.bin")
    write_synthetic_ggml(ml, tiny_config(n_vocab=51865), seed=5)
    assert main(["detect-language", ml, wav, "--top", "3"]) == 0
    out = capsys.readouterr().out
    assert wav in out and "=" in out  # "lang (xx=0.123, ...)"

    en = str(tmp_path / "en.bin")
    write_synthetic_ggml(en, tiny_config(), seed=9)
    assert main(["detect-language", en, wav]) == 0
    assert "English-only" in capsys.readouterr().out


def test_clip_range_offset_duration(model):
    """whisper.cpp offset_ms/duration_ms semantics: absolute timestamps,
    loop bounded to the clip, no-op when unset, empty past the end."""
    audio = synthetic_audio(SAMPLE_RATE * 35)
    base = TranscribeOptions(temperature=0.0,
                             condition_on_previous_text=False)

    full = transcribe(model, audio, base)
    # offset 0 / duration covering everything is exactly the plain run
    same = transcribe(model, audio, dataclasses.replace(
        base, offset_ms=0, duration_ms=10 ** 9))
    assert same["segments"] == full["segments"]

    off = transcribe(model, audio, dataclasses.replace(
        base, offset_ms=31_000))
    assert off["segments"], "clip inside the audio must decode"
    assert all(seg["t0"] >= 31.0 for seg in off["segments"])
    assert all(seg["seek"] >= 3100 for seg in off["segments"])

    dur = transcribe(model, audio, dataclasses.replace(
        base, duration_ms=20_000))
    assert dur["segments"]
    # no window may START past the clip end (the last window can extend)
    assert all(seg["seek"] < 2000 for seg in dur["segments"])

    past = transcribe(model, audio, dataclasses.replace(
        base, offset_ms=60_000))
    assert past["segments"] == [] and past["text"] == ""

    # chunk-parallel path honors the same clip range
    from whisper_tpu.pipeline.chunked import transcribe_chunked

    coff = transcribe_chunked(model, audio, dataclasses.replace(
        base, offset_ms=31_000))
    assert coff["segments"] and all(
        seg["t0"] >= 31.0 for seg in coff["segments"])
    cpast = transcribe_chunked(model, audio, dataclasses.replace(
        base, offset_ms=60_000))
    assert cpast["segments"] == []


def test_audio_ctx_stops_at_content_end(model):
    """content_frames subtracts the fixed 30 s pad, NOT the (audio_ctx-
    shrunken) window length — the loop must never slide into pure zero
    padding past the real audio (regression: with audio_ctx=750 it used
    to decode ~15 s of synthetic silence)."""
    audio = synthetic_audio(SAMPLE_RATE * 8)
    result = transcribe(
        model, audio,
        TranscribeOptions(temperature=0.0, condition_on_previous_text=False,
                          audio_ctx=750),
    )
    for seg in result["segments"]:
        assert seg["seek"] * 0.01 < 8.0, seg  # every window starts in audio


def test_finish_window_prompt_carries_committed_tokens_only(model):
    """openai parity: all_tokens extends with SEGMENT tokens only — on a
    seek-rewind the un-segmented tail is re-decoded by the next window and
    must not leak into its conditioning prompt."""
    from whisper_tpu.decoding.result import DecodingResult
    from whisper_tpu.pipeline.transcribe import TranscribeOptions, finish_window

    vocab = model.vocab
    beg = vocab.token_beg
    # <|0.00|> x y <|1.00|><|1.00|> z w   (paired ts, unterminated tail)
    toks = [beg, 100, 101, beg + 50, beg + 50, 102, 103]
    result = DecodingResult(
        tokens=toks, text="", avg_logprob=-0.1, no_speech_prob=0.0,
        temperature=0.0, compression_ratio=1.0,
    )
    segments, seek, new_tokens, _ = finish_window(
        model, result, seek=0, content_frames=3000, n_frames_window=3000,
        opts=TranscribeOptions(no_speech_threshold=None),
        segment_id_base=0, language="en",
    )
    assert len(segments) == 1
    assert segments[0].tokens == [beg, 100, 101, beg + 50]
    # prompt carry excludes the tail [beg+50, 102, 103] being re-decoded
    assert new_tokens == [beg, 100, 101, beg + 50]
    assert seek == 50 * 2  # rewound to the last paired timestamp
