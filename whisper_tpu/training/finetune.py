"""Fine-tuning recipe: (audio, transcript) pairs -> updated checkpoint.

The reference has no training at all; this is the supervised fine-tuning
driver on top of training/train.py's sharded step: it tokenizes transcripts
with the model's own (exact-BPE) tokenizer into Whisper's teacher-forcing
format  [sot, (lang, task,) <|0.00|>?, text..., eot], mels the audio,
batches with right-padding + loss masks, and runs adamw with warmup-cosine,
periodic eval, and orbax checkpointing. Works on a (dp, tp) mesh (pass one)
or a single chip.

Typical use:

    model = load_model("ggml-small.bin")
    ft = finetune(model, train_pairs, steps=2000, batch_size=8,
                  checkpoint_dir="ckpts/")
    save_params("ckpts/final", ft.params)
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import WhisperConfig
from ..frontend.mel import frame_count, log_mel_spectrogram, mel_window
from ..utils.logging import get_logger
from .train import TrainState, init_train_state, loss_fn, make_train_step

log = get_logger("finetune")


def build_target_tokens(vocab, text: str, language: str = "en",
                        task: str = "transcribe",
                        timestamps: bool = False) -> List[int]:
    """Teacher-forcing token sequence for one transcript (openai format)."""
    seq = [vocab.token_sot]
    if vocab.is_multilingual:
        seq.append(vocab.language_token(language))
        seq.append(vocab.token_translate if task == "translate"
                   else vocab.token_transcribe)
    if not timestamps:
        seq.append(vocab.token_not)
    seq.extend(vocab.encode(" " + text.strip()))
    seq.append(vocab.token_eot)
    return seq


def make_batches(
    model,
    pairs: Sequence[Tuple[np.ndarray, str]],
    batch_size: int,
    language: str = "en",
    max_tokens: int = 224,
    seed: int = 0,
    shuffle: bool = True,
):
    """Yield (mel, tokens, mask) batches forever (epoch reshuffles)."""
    cfg, vocab = model.config, model.vocab
    n_frames = 2 * cfg.n_audio_ctx
    toks = [build_target_tokens(vocab, t, language)[:max_tokens] for _, t in pairs]
    mels = []
    for audio, _ in pairs:
        audio = np.asarray(audio, np.float32)
        mel = log_mel_spectrogram(
            jnp.asarray(audio), model.filters, frame_count(len(audio)))
        mels.append(np.asarray(mel_window(mel, 0, n_frames)))
    rng = np.random.default_rng(seed)
    order = np.arange(len(pairs))
    T = max(len(t) for t in toks)
    T = -(-T // 32) * 32  # pad to a bucket so one program serves all batches
    while True:
        if shuffle:
            rng.shuffle(order)
        for i in range(0, len(order) - batch_size + 1, batch_size):
            idx = order[i : i + batch_size]
            mel_b = np.stack([mels[j] for j in idx])
            tok_b = np.zeros((batch_size, T), np.int32)
            mask_b = np.zeros((batch_size, T), np.int32)
            for r, j in enumerate(idx):
                tok_b[r, : len(toks[j])] = toks[j]
                mask_b[r, : len(toks[j])] = 1
            yield jnp.asarray(mel_b), jnp.asarray(tok_b), jnp.asarray(mask_b)


def finetune(
    model,
    pairs: Sequence[Tuple[np.ndarray, str]],
    steps: int = 100,
    batch_size: int = 4,
    lr: float = 1e-5,
    warmup: int = 10,
    weight_decay: float = 0.01,
    language: str = "en",
    mesh=None,
    eval_pairs: Optional[Sequence[Tuple[np.ndarray, str]]] = None,
    eval_every: int = 50,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 200,
    log_every: int = 10,
    seed: int = 0,
) -> TrainState:
    """Run supervised fine-tuning; returns the final TrainState."""
    cfg = model.config
    params = model.params
    if mesh is not None:
        from ..parallel.sharding import shard_params

        params = shard_params(params, mesh)

    schedule = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps=warmup, decay_steps=max(steps, warmup + 1))
    optimizer = optax.adamw(schedule, weight_decay=weight_decay)
    state = init_train_state(params, optimizer)
    train_step = make_train_step(cfg, optimizer)
    batches = make_batches(model, pairs, batch_size, language, seed=seed)

    for step in range(1, steps + 1):
        mel, tokens, mask = next(batches)
        state, loss = train_step(state, mel, tokens, mask)
        if step % log_every == 0 or step == steps:
            log.info("step %d/%d loss %.4f lr %.2e",
                     step, steps, float(loss), float(schedule(step)))
        if eval_pairs and step % eval_every == 0:
            ev = evaluate(model, state.params, eval_pairs, batch_size, language)
            log.info("step %d eval loss %.4f", step, ev)
        if checkpoint_dir and step % checkpoint_every == 0:
            from .checkpoint import save_train_state

            save_train_state(f"{checkpoint_dir}/step_{step}", state)
    return state


def evaluate(model, params, pairs, batch_size: int, language: str) -> float:
    """Mean teacher-forced loss over eval pairs (single pass)."""
    cfg = model.config
    batches = make_batches(model, pairs, batch_size, language, shuffle=False)
    n = max(len(pairs) // batch_size, 1)
    total = 0.0
    for _ in range(n):
        mel, tokens, mask = next(batches)
        total += float(loss_fn(params, mel, tokens, mask, cfg))
    return total / n
