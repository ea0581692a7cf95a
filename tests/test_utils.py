"""WER metric, normalizer, timers, checkpoint save/restore."""

import numpy as np
import pytest

from whisper_tpu.utils.wer import edit_distance, normalize_text, wer


def test_normalize():
    assert normalize_text("Hello, World!") == "hello world"
    # full EnglishTextNormalizer semantics: contractions expand
    assert normalize_text("it's  FINE.") == "it is fine"
    assert normalize_text("café") == "cafe"


def test_edit_distance():
    assert edit_distance(list("abc"), list("abc"))[3] == 0
    s, d, i, c = edit_distance("the cat sat".split(), "the cat".split())
    assert (s, d, i, c) == (0, 1, 0, 1)
    s, d, i, c = edit_distance("the cat".split(), "the big cat".split())
    assert (s, d, i, c) == (0, 0, 1, 1)
    s, d, i, c = edit_distance("a b c".split(), "a x c".split())
    assert (s, d, i, c) == (1, 0, 0, 1)


def test_wer_corpus():
    out = wer(["the cat sat on the mat"], ["the cat sat on mat"])
    assert out["wer"] == pytest.approx(1 / 6)
    out = wer(["hello world", "foo bar baz"], ["hello world", "foo bar baz"])
    assert out["wer"] == 0.0
    out = wer(["a b"], ["x y"])
    assert out["wer"] == 1.0


def test_timers():
    from whisper_tpu.utils.logging import StageTimers

    t = StageTimers()
    with t.stage("mel"):
        pass
    with t.stage("mel"):
        pass
    assert t.counts["mel"] == 2
    assert "t_mel" in t.report()


def test_params_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from whisper_tpu.model.params import random_params
    from whisper_tpu.training.checkpoint import restore_params, save_params

    from fixtures import micro_config

    params = random_params(micro_config(n_vocab=512), seed=1)
    path = str(tmp_path / "ckpt")
    save_params(path, params)
    back = restore_params(path)
    np.testing.assert_array_equal(
        back["encoder"]["blocks"]["q_w"], params["encoder"]["blocks"]["q_w"]
    )


def test_train_state_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from whisper_tpu.model.params import random_params
    from whisper_tpu.training.checkpoint import restore_train_state, save_train_state
    from whisper_tpu.training.train import init_train_state, make_optimizer

    from fixtures import micro_config

    params = jax.tree.map(jnp.asarray, random_params(micro_config(n_vocab=512), seed=1))
    opt = make_optimizer()
    state = init_train_state(params, opt)
    path = str(tmp_path / "train_ckpt")
    save_train_state(path, state)
    restored = restore_train_state(path, state)
    assert int(restored.step) == 0
    np.testing.assert_array_equal(
        np.asarray(restored.params["decoder"]["te"]),
        np.asarray(state.params["decoder"]["te"]),
    )


def test_cached_load(tmp_path):
    from whisper_tpu.training.checkpoint import cached_load

    from fixtures import tiny_config, write_synthetic_ggml

    p = str(tmp_path / "m.bin")
    write_synthetic_ggml(p, tiny_config(), seed=2)
    m1 = cached_load(p, cache_dir=str(tmp_path / "cache"), use_native=False)
    m2 = cached_load(p, cache_dir=str(tmp_path / "cache"))  # hits the cache
    np.testing.assert_array_equal(
        np.asarray(m1.params["encoder"]["pe"]), np.asarray(m2.params["encoder"]["pe"])
    )
    assert m1.config == m2.config
    assert m2.vocab.id_to_token[0] == m1.vocab.id_to_token[0]


def test_presets_cover_all_released_families():
    from whisper_tpu.config import PRESETS

    assert {"tiny", "tiny.en", "base", "base.en", "small", "small.en",
            "medium", "medium.en", "large", "large-v2", "large-v3",
            "large-v3-turbo"} <= set(PRESETS)
    turbo = PRESETS["large-v3-turbo"]
    assert turbo.n_text_layer == 4 and turbo.n_mels == 128
    assert turbo.model_type == "large-v3-turbo"
    assert PRESETS["large-v3"].model_type == "large-v3"
    assert PRESETS["large"].model_type == "large"


def test_output_writers_formats(tmp_path):
    """txt/srt/vtt/tsv writers follow openai whisper/utils.py conventions:
    srt 1-based cues + comma + mandatory hours; vtt dot + optional hours;
    tsv integer-ms; txt one segment per line."""
    import io

    from whisper_tpu.utils.writers import (write_srt, write_transcripts,
                                           write_tsv, write_txt, write_vtt)

    result = {
        "text": " hello world again",
        "segments": [
            {"t0": 0.0, "t1": 2.5, "text": " hello world"},
            {"t0": 3661.02, "t1": 3662.5, "text": " again"},
        ],
    }
    buf = io.StringIO(); write_txt(result, buf)
    assert buf.getvalue() == "hello world\nagain\n"

    buf = io.StringIO(); write_srt(result, buf)
    assert buf.getvalue() == (
        "1\n00:00:00,000 --> 00:00:02,500\nhello world\n\n"
        "2\n01:01:01,020 --> 01:01:02,500\nagain\n\n")

    buf = io.StringIO(); write_vtt(result, buf)
    assert buf.getvalue() == (
        "WEBVTT\n\n"
        "00:00.000 --> 00:02.500\nhello world\n\n"
        "01:01:01.020 --> 01:01:02.500\nagain\n\n")

    buf = io.StringIO(); write_tsv(result, buf)
    assert buf.getvalue() == (
        "start\tend\ttext\n0\t2500\thello world\n3661020\t3662500\tagain\n")

    paths = write_transcripts({"/x/a.wav": result}, str(tmp_path),
                              ["srt", "json"])
    assert sorted(p.rsplit(".", 1)[1] for p in paths) == ["json", "srt"]
    assert (tmp_path / "a.srt").read_text().startswith("1\n00:00:00,000")


def test_subtitle_highlight_words():
    """highlight_words: one srt/vtt cue per word, current word underlined
    (openai writer option); segments without words fall back to one cue."""
    import io

    from whisper_tpu.utils.writers import write_srt, write_vtt

    result = {"segments": [{
        "t0": 0.0, "t1": 2.0, "text": " hi there",
        "words": [
            {"word": " hi", "start": 0.2, "end": 0.8},
            {"word": " there", "start": 0.9, "end": 1.8},
        ]}, {"t0": 2.0, "t1": 3.0, "text": " plain", "words": []}]}
    buf = io.StringIO(); write_srt(result, buf, highlight_words=True)
    out = buf.getvalue()
    assert "1\n00:00:00,200 --> 00:00:00,800\n<u>hi</u> there\n" in out
    assert "2\n00:00:00,900 --> 00:00:01,800\nhi <u>there</u>\n" in out
    assert "3\n00:00:02,000 --> 00:00:03,000\nplain\n" in out

    buf = io.StringIO(); write_vtt(result, buf, highlight_words=True)
    assert "00:00.200 --> 00:00.800\n<u>hi</u> there\n" in buf.getvalue()
