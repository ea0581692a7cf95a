"""Model loading: GGML file -> device-resident WhisperModel.

The TPU equivalent of ``WhisperContext::new`` (/root/reference/src/main.rs:
366-503): parse the checkpoint (native C++ sidecar when built, pure Python
otherwise), assemble the stacked parameter pytree, and device_put everything.
No arenas — XLA owns HBM.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import WhisperConfig
from ..io.ggml import GGMLCheckpoint, load_ggml
from ..io.vocab import WhisperVocab, make_vocab
from ..utils.logging import StageTimers, get_logger
from .params import Params, params_from_ggml, random_params

log = get_logger("model")


@dataclasses.dataclass
class WhisperModel:
    config: WhisperConfig
    params: Params                    # jnp pytree
    filters: jnp.ndarray              # (n_mel, 201) f32
    vocab: WhisperVocab
    timers: StageTimers = dataclasses.field(default_factory=StageTimers)
    # Optional DRAFT model for speculative greedy decoding (same vocab,
    # usually a distilled/smaller geometry). pipeline.transcribe routes its
    # t=0 rung through decoding/speculative.py when set.
    draft: Optional["WhisperModel"] = None

    @property
    def dtype(self):
        return self.params["decoder"]["te"].dtype


def _checkpoint_via_native(path: str) -> Optional[GGMLCheckpoint]:
    from ..runtime.native import native_open_ggml

    out = native_open_ggml(path)
    if out is None:
        return None
    header, filters, tokens, tensors = out
    config = WhisperConfig(*header).validate()
    vocab = make_vocab(config.n_vocab, tokens, len(tokens))
    return GGMLCheckpoint(config=config, filters=filters, vocab=vocab, tensors=tensors)


def load_model(
    path: str,
    dtype=jnp.float32,
    gelu_impl: str = "erf",
    use_native: bool = True,
    device=None,
) -> WhisperModel:
    """Load a GGML checkpoint onto the default device.

    ``dtype`` is the compute/storage dtype for the weights (f32 for parity
    tests, bf16 for production throughput). Moments/softmax always run f32.
    """
    t0 = time.perf_counter()
    ckpt = _checkpoint_via_native(path) if use_native else None
    if ckpt is None:
        ckpt = load_ggml(path)
    config = dataclasses.replace(ckpt.config, gelu_impl=gelu_impl)
    np_dtype = np.dtype(jnp.dtype(dtype).name) if dtype != jnp.bfloat16 else None
    if dtype == jnp.bfloat16:
        host = params_from_ggml(ckpt.tensors, config, dtype=np.float32)
        params = jax.device_put(
            jax.tree.map(lambda a: jnp.asarray(a, dtype=jnp.bfloat16), host), device
        )
    else:
        host = params_from_ggml(ckpt.tensors, config, dtype=np_dtype)
        params = jax.device_put(jax.tree.map(jnp.asarray, host), device)
    filters = jax.device_put(jnp.asarray(ckpt.filters, dtype=jnp.float32), device)
    model = WhisperModel(config=config, params=params, filters=filters, vocab=ckpt.vocab)
    model.timers.totals["load"] = time.perf_counter() - t0
    model.timers.counts["load"] = 1
    log.info("loaded %s (%s) in %.2fs", path, config.model_type, model.timers.totals["load"])
    return model


def random_model(config: WhisperConfig, seed: int = 0, dtype=jnp.float32,
                 on_device: bool = True) -> WhisperModel:
    """Random-weight model for benchmarks and shape tests (no checkpoint).

    ``on_device=True`` generates weights with jax.random directly in HBM —
    host-side generation of a large-v3-sized pytree costs minutes of
    host->device transfer on tunneled chips.
    """
    from ..frontend.mel import mel_filter_bank

    if on_device:
        from .params import random_params_device

        params = random_params_device(config, seed=seed, dtype=dtype)
    else:
        host = random_params(config, seed=seed)
        params = jax.tree.map(lambda a: jnp.asarray(a, dtype=dtype), host)
    filters = jnp.asarray(mel_filter_bank(config.n_mels), dtype=jnp.float32)
    tokens = [f"tok{i}".encode() for i in range(config.n_vocab)]
    vocab = make_vocab(config.n_vocab, tokens, config.n_vocab)
    return WhisperModel(config=config, params=params, filters=filters, vocab=vocab)
