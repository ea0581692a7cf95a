"""Checkpoint save/restore (orbax) — params and train state.

The reference is load-only (GGML read path, SURVEY §5 "Checkpoint / resume");
here the framework can also persist: converted-params caching for fast model
reload, and full TrainState checkpointing for long fine-tuning jobs
(checkpoint-restart of batch jobs, the one elastic/fault concern in scope).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_params(path: str, params: Any) -> None:
    """Save a params pytree to an orbax checkpoint directory."""
    ocp = _ocp()
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.tree.map(np.asarray, params), force=True)


def restore_params(path: str) -> Any:
    ocp = _ocp()
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path)


def save_train_state(path: str, state) -> None:
    """Persist TrainState (params + optimizer state + step)."""
    ocp = _ocp()
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.tree.map(np.asarray, state._asdict()), force=True)


def restore_train_state(path: str, template) -> Any:
    """Restore into the structure of ``template`` (a TrainState)."""
    from .train import TrainState

    ocp = _ocp()
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, jax.tree.map(np.asarray, template._asdict()))
    return TrainState(**restored)


def cached_load(ggml_path: str, cache_dir: Optional[str] = None, **kwargs):
    """load_model with a converted-pytree cache for fast reload.

    The GGML parse + pytree stacking dominates cold load for big models; the
    orbax cache (keyed by file size + mtime) skips it on subsequent loads.
    """
    import dataclasses
    import json

    import jax.numpy as jnp

    from ..io.ggml import load_ggml
    from ..io.vocab import make_vocab
    from ..model.load import WhisperModel, load_model

    st = os.stat(ggml_path)
    key = f"{os.path.basename(ggml_path)}-{st.st_size}-{int(st.st_mtime)}"
    cache_dir = cache_dir or os.path.join(
        os.path.dirname(os.path.abspath(ggml_path)), ".whisper_tpu_cache"
    )
    cdir = os.path.join(cache_dir, key)
    meta_path = os.path.join(cache_dir, key + ".meta.json")

    if os.path.exists(cdir) and os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        from ..config import WhisperConfig

        config = WhisperConfig(**meta["config"])
        params = restore_params(cdir)
        params = jax.tree.map(jnp.asarray, params)
        tokens = [bytes.fromhex(t) for t in meta["tokens"]]
        vocab = make_vocab(config.n_vocab, tokens, len(tokens))
        filters = jnp.asarray(np.array(meta["filters"], dtype=np.float32))
        return WhisperModel(config=config, params=params, filters=filters, vocab=vocab)

    model = load_model(ggml_path, **kwargs)
    os.makedirs(cache_dir, exist_ok=True)
    save_params(cdir, model.params)
    with open(meta_path, "w") as f:
        json.dump(
            {
                "config": {
                    k: getattr(model.config, k)
                    for k in (
                        "n_vocab", "n_audio_ctx", "n_audio_state", "n_audio_head",
                        "n_audio_layer", "n_text_ctx", "n_text_state", "n_text_head",
                        "n_text_layer", "n_mels", "f16", "gelu_impl",
                    )
                },
                "tokens": [
                    model.vocab.id_to_token[i].hex()
                    for i in range(len(model.vocab.id_to_token))
                ],
                "filters": np.asarray(model.filters).tolist(),
            },
            f,
        )
    return model
