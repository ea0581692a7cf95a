"""Distillation recipe (training/distill.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fixtures import micro_config, synthetic_audio
from whisper_tpu.model.load import random_model
from whisper_tpu.training.distill import (
    DistillResult,
    distill,
    init_student_params,
    pick_layer_map,
    student_config,
)


def test_pick_layer_map():
    assert pick_layer_map(32, 2) == [0, 31]
    assert pick_layer_map(32, 4) == [0, 10, 21, 31]
    assert pick_layer_map(4, 1) == [3]
    assert pick_layer_map(4, 4) == [0, 1, 2, 3]


@pytest.fixture(scope="module")
def teacher():
    import dataclasses

    cfg = dataclasses.replace(micro_config(n_vocab=51865), n_text_layer=4)
    return random_model(cfg, seed=5, on_device=False)


def test_student_init_layers_match_teacher(teacher):
    cfg = teacher.config
    student = init_student_params(teacher.params, cfg, 2)
    blocks = student["decoder"]["blocks"]
    t_blocks = teacher.params["decoder"]["blocks"]
    # student layer 0 == teacher layer 0; student layer 1 == teacher last
    for key in ("q_w", "mlp0_w", "cross_k_w"):
        np.testing.assert_array_equal(
            np.asarray(blocks[key][0]), np.asarray(t_blocks[key][0]))
        np.testing.assert_array_equal(
            np.asarray(blocks[key][1]),
            np.asarray(t_blocks[key][cfg.n_text_layer - 1]))
    # encoder is shared by reference (frozen, zero extra HBM)
    assert student["encoder"] is teacher.params["encoder"]


def test_distill_runs_and_reduces_loss(teacher):
    rng = np.random.default_rng(0)
    texts = ["hello world", "kernels go brr", "tpu whisper"]
    pairs = [
        (rng.standard_normal(16000).astype(np.float32) * 0.1, texts[i % 3])
        for i in range(6)
    ]
    out = distill(teacher, pairs, n_text_layer=2, steps=6, batch_size=2,
                  lr=3e-3, log_every=3)
    assert isinstance(out, DistillResult)
    assert out.config.n_text_layer == 2
    assert len(out.losses) == 6
    assert all(np.isfinite(out.losses))
    # the student must train: final loss below the first step's
    assert out.losses[-1] < out.losses[0]
    # the result is a runnable model pytree: greedy-decode one step with it
    from whisper_tpu.model.decoder import decode_step, init_cache
    from whisper_tpu.frontend.mel import frame_count, log_mel_spectrogram, mel_window
    from whisper_tpu.model.encoder import encode

    cfg = out.config
    audio = synthetic_audio(16000)
    mel = log_mel_spectrogram(jnp.asarray(audio), teacher.filters,
                              frame_count(len(audio)))
    win = mel_window(mel, 0, 2 * cfg.n_audio_ctx)[None]
    enc = encode(out.params, win, cfg)
    cache = init_cache(cfg, 1, ctx=8)
    logits, _ = decode_step(
        out.params, jnp.full((1, 1), teacher.vocab.token_sot, jnp.int32),
        jnp.int32(0), cache, enc.cross_k, enc.cross_v, cfg)
    assert logits.shape == (1, 1, cfg.n_vocab)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_save_load_draft_roundtrip(teacher, tmp_path):
    """save_draft/load_draft round-trips the decoder subtree exactly and the
    loaded draft plugs into the speculative serving topology (shared
    encoder, cross from the teacher's hidden state)."""
    from whisper_tpu.training.distill import load_draft, save_draft

    cfg = teacher.config
    student = init_student_params(teacher.params, cfg, 2)
    s_cfg = student_config(cfg, 2)
    p = str(tmp_path / "draft.npz")
    save_draft(p, student, s_cfg)
    loaded, lcfg = load_draft(p, teacher.params, cfg)
    assert lcfg.n_text_layer == 2
    assert loaded["encoder"] is teacher.params["encoder"]
    ref = jax.tree.leaves(student["decoder"])
    got = jax.tree.leaves(loaded["decoder"])
    assert len(ref) == len(got)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the loaded draft runs through the draft cross projection + forward
    from whisper_tpu.model.encoder import cross_kv_from_hidden, encode
    from whisper_tpu.training.train import decoder_forward_train

    mel = jnp.zeros((1, cfg.n_mels, 2 * cfg.n_audio_ctx), jnp.float32)
    enc = encode(teacher.params, mel, cfg, use_flash=False)
    ck, cv = cross_kv_from_hidden(loaded, enc.hidden, lcfg)
    toks = jnp.zeros((1, 8), jnp.int32)
    logits = decoder_forward_train(loaded, toks, ck, cv, lcfg)
    assert logits.shape == (1, 8, cfg.n_vocab)
