"""Closed-loop WER round-trip: train from scratch on synthetic tone-words,
export GGML, reload through the production loader, transcribe held-out audio,
score with the WER harness (VERDICT r3 item 6 — the training and eval
subsystems proven against each other; no external assets needed).

The heavyweight version (more steps, subprocess `cli eval`) lives in
scripts/wer_roundtrip.py — measured 18.2% WER at 700 steps. This test uses a
smaller budget and a generous bound: the point is a nonzero-accuracy
round-trip through the full path, not a benchmark.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_tpu.config import WhisperConfig
from whisper_tpu.io.ggml import write_ggml
from whisper_tpu.io.vocab import make_vocab
from whisper_tpu.io.wav import load_wav, write_wav
from whisper_tpu.model.load import load_model, random_model
from whisper_tpu.model.params import params_to_ggml
from whisper_tpu.training.finetune import finetune
from whisper_tpu.utils.synth import SR, make_pair, word_tokens
from whisper_tpu.utils.wer import evaluate_dataset

N_VOCAB = 51864


@pytest.mark.slow
def test_wer_roundtrip_synthetic(tmp_path):
    cfg = WhisperConfig(
        n_vocab=N_VOCAB, n_audio_ctx=64, n_audio_state=64, n_audio_head=2,
        n_audio_layer=2, n_text_ctx=96, n_text_state=64, n_text_head=2,
        n_text_layer=2, n_mels=80, f16=0)
    model = random_model(cfg, seed=0, on_device=False)
    model.vocab = make_vocab(N_VOCAB, word_tokens(N_VOCAB), N_VOCAB)

    rng = np.random.default_rng(0)
    train_pairs = [make_pair(rng) for _ in range(96)]
    held_out = [make_pair(rng) for _ in range(8)]

    # tokenizer round-trips the constructed transcripts exactly
    for _, text in train_pairs[:4]:
        ids = model.vocab.encode(" " + text)
        assert model.vocab.decode(ids).strip() == text

    state = finetune(model, train_pairs, steps=350, batch_size=16,
                     lr=1e-3, warmup=20, log_every=1000, seed=0)

    # full production path: params -> GGML -> loader -> wav files -> WER
    tensors = params_to_ggml(jax.tree.map(np.asarray, state.params), cfg)
    ggml = str(tmp_path / "model.bin")
    write_ggml(ggml, cfg, np.asarray(model.filters), word_tokens(N_VOCAB),
               tensors)
    reloaded = load_model(ggml, dtype=jnp.float32)

    def dataset():
        for i, (audio, text) in enumerate(held_out):
            p = str(tmp_path / f"utt{i}.wav")
            write_wav(p, audio, SR)
            yield p, text

    res = evaluate_dataset(reloaded, dataset(), without_timestamps=True,
                           language="en")
    # untrained = 100%+; the 700-step script run measures 18%. 350 steps
    # with a generous bound keeps the test robust to optimizer noise.
    assert res["wer"] < 0.6, res
    assert res["words"] > 0 and res["utterances"] == len(held_out)
