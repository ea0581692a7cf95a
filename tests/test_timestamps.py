"""Token-level timestamp algorithm tests."""

import numpy as np

from whisper_tpu.decoding.result import Segment
from whisper_tpu.io.vocab import make_vocab
from whisper_tpu.pipeline.timestamps import (
    compute_token_timestamps,
    signal_energy,
    token_voice_length,
)

from fixtures import synthetic_tokens


def _vocab():
    return make_vocab(51864, synthetic_tokens(51864), 51864)


def _segment(vocab, tokens, t0=0.0, t1=4.0, seek=0):
    return Segment(
        id=0, seek=seek, t0=t0, t1=t1, text="", tokens=tokens,
        avg_logprob=-0.5, no_speech_prob=0.1, temperature=0.0,
        compression_ratio=1.0,
    )


def test_voice_length():
    assert token_voice_length(b" the") > token_voice_length(b" a")
    assert token_voice_length(b".") < token_voice_length(b"word")


def test_monotone_and_bounded():
    vocab = _vocab()
    seg = _segment(vocab, [100, 200, 300, 400], t0=1.0, t1=3.0)
    td = compute_token_timestamps(seg, vocab)
    assert len(td) == 4
    prev = 1.0
    for t in td:
        assert t.t0 >= prev - 1e-6
        assert t.t1 >= t.t0 - 1e-6
        prev = t.t0
    assert td[0].t0 == 1.0
    assert abs(td[-1].t1 - 3.0) < 1e-6


def test_timestamp_tokens_anchor():
    vocab = _vocab()
    beg = vocab.token_beg
    # [<|0.00|>, text, text, <|2.00|>] in a 0..2s segment
    seg = _segment(vocab, [beg, 100, 200, beg + 100], t0=0.0, t1=2.0)
    td = compute_token_timestamps(seg, vocab)
    assert td[0].t0 == 0.0 and td[0].t1 == 0.0
    assert abs(td[3].t0 - 2.0) < 1e-6
    assert 0.0 <= td[1].t0 <= td[1].t1 <= 2.0


def test_seek_offset_anchors():
    vocab = _vocab()
    beg = vocab.token_beg
    # window starting at seek=3000 frames (30 s): <|1.00|> anchors at 31 s
    seg = _segment(vocab, [beg + 50, 100], t0=31.0, t1=32.0, seek=3000)
    td = compute_token_timestamps(seg, vocab)
    assert abs(td[0].t0 - 31.0) < 1e-6


def test_energy_tightening():
    vocab = _vocab()
    audio = np.zeros(16000 * 2, dtype=np.float32)
    audio[16000:24000] = 0.5  # speech only in 1.0..1.5 s
    energy = signal_energy(audio)
    seg = _segment(vocab, [100], t0=0.0, t1=2.0)
    td = compute_token_timestamps(seg, vocab, energy=energy)
    assert td[0].t0 >= 0.9
    assert td[0].t1 <= 1.6


def test_transcribe_integration():
    import jax.numpy as jnp

    from whisper_tpu.model.load import random_model
    from whisper_tpu.pipeline.transcribe import TranscribeOptions, transcribe
    from fixtures import synthetic_audio, tiny_config

    model = random_model(tiny_config(), seed=0, on_device=False)
    audio = synthetic_audio(16000 * 4)
    out = transcribe(
        model, audio,
        TranscribeOptions(
            temperature=0.0, condition_on_previous_text=False, token_timestamps=True
        ),
    )
    for seg in out["segments"]:
        assert seg["token_data"] is not None
        for t in seg["token_data"]:
            assert t["t1"] >= t["t0"] - 1e-6
