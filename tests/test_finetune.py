"""Fine-tuning recipe (training/finetune.py)."""

import numpy as np
import pytest

import jax

from fixtures import micro_config, synthetic_audio
from whisper_tpu.model.load import random_model
from whisper_tpu.training.finetune import (
    build_target_tokens,
    evaluate,
    finetune,
    make_batches,
)


@pytest.fixture(scope="module")
def model():
    return random_model(micro_config(n_vocab=51865), seed=3, on_device=False)


def _pairs(n, seed=0):
    rng = np.random.default_rng(seed)
    texts = ["hello there", "general kenobi", "testing one two", "whisper on tpu"]
    return [
        (rng.standard_normal(16000 * 2).astype(np.float32) * 0.1,
         texts[i % len(texts)])
        for i in range(n)
    ]


def test_build_target_tokens_format(model):
    v = model.vocab
    seq = build_target_tokens(v, "hi", language="en")
    assert seq[0] == v.token_sot
    assert seq[1] == v.language_token("en")
    assert seq[2] == v.token_transcribe
    assert seq[3] == v.token_not
    assert seq[-1] == v.token_eot
    seq_ts = build_target_tokens(v, "hi", timestamps=True)
    assert v.token_not not in seq_ts[:4]


def test_make_batches_shapes_and_masks(model):
    pairs = _pairs(6)
    it = make_batches(model, pairs, batch_size=2)
    mel, tokens, mask = next(it)
    assert mel.shape[0] == 2 and mel.shape[1] == model.config.n_mels
    assert tokens.shape == mask.shape
    assert tokens.shape[1] % 32 == 0
    m = np.asarray(mask)
    assert m.sum() > 0 and ((m == 0) | (m == 1)).all()


def test_finetune_reduces_loss(model):
    """A few adamw steps on a tiny fixed set must reduce the eval loss."""
    pairs = _pairs(4)
    before = evaluate(model, model.params, pairs, batch_size=2, language="en")
    state = finetune(model, pairs, steps=6, batch_size=2, lr=3e-4, warmup=1,
                     log_every=100)
    after = evaluate(model, state.params, pairs, batch_size=2, language="en")
    assert after < before, (before, after)
    assert int(state.step) == 6
