"""Ahead-of-time compiled serving artifacts (cold-start story).

First compilation of a large-v3 serving configuration takes minutes; the
persistent `.jax_cache` amortizes reruns on one machine, but a serving fleet
wants a *shippable artifact*. `jax.export` serializes the lowered StableHLO
(+ calling convention) of a jitted function; this module registers the
framework's pytree types and offers save/load helpers so a serving image can
package pre-lowered decode/encode programs and skip tracing entirely.

Note: the serialized artifact is platform-tagged (cpu/tpu); export on the
target platform class. Compilation of StableHLO -> executable still happens
at load (fast relative to tracing+optimization of the full program).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Sequence

import jax
from jax import export as _export

_REGISTERED = False


def _register_types() -> None:
    """Register the framework's NamedTuple pytree nodes for serialization."""
    global _REGISTERED
    if _REGISTERED:
        return
    from ..model.decoder import KVCache
    from ..model.quant import QuantKV

    for t, name in ((KVCache, "whisper_tpu.KVCache"),
                    (QuantKV, "whisper_tpu.QuantKV")):
        try:
            _export.register_namedtuple_serialization(t, serialized_name=name)
        except ValueError:
            pass  # already registered in this process
    _REGISTERED = True


def export_fn(fn: Callable, *example_args, **jit_kwargs) -> bytes:
    """Trace + lower ``fn`` on example args and serialize the artifact."""
    _register_types()
    exp = _export.export(jax.jit(fn, **jit_kwargs))(*example_args)
    return exp.serialize()


def load_fn(data: bytes) -> Callable:
    """Deserialize an exported artifact; returns a callable (same signature
    as the original on matching shapes/dtypes)."""
    _register_types()
    exp = _export.deserialize(data)
    return exp.call


# Artifact container: MAGIC + u32le meta-json length + meta json + payload.
# The meta dict records the flag tuple the program was exported with
# (model/batch/decode_tokens/kv/weight/enc dtypes/beam/use_flash) so a
# consumer can refuse an artifact that doesn't match its own flags — the
# call signature (params, audio) is identical across configs, so a stale
# artifact would otherwise run silently mislabeled. Files without the
# magic are legacy raw jax.export payloads (meta None).
_MAGIC = b"WTAOT01\n"


def save(path: str, fn: Callable, *example_args, meta: dict | None = None,
         **jit_kwargs) -> None:
    import json
    import struct

    payload = export_fn(fn, *example_args, **jit_kwargs)
    with open(path, "wb") as f:
        if meta is not None:
            mj = json.dumps(meta, sort_keys=True).encode()
            f.write(_MAGIC + struct.pack("<I", len(mj)) + mj)
        f.write(payload)


def _split(data: bytes):
    import json
    import struct

    if not data.startswith(_MAGIC):
        return None, data
    n = struct.unpack("<I", data[len(_MAGIC) : len(_MAGIC) + 4])[0]
    off = len(_MAGIC) + 4
    return json.loads(data[off : off + n]), data[off + n :]


def load(path: str) -> Callable:
    with open(path, "rb") as f:
        _, payload = _split(f.read())
    return load_fn(payload)


def load_meta(path: str) -> dict | None:
    """The flag-tuple meta dict an artifact was saved with (None for legacy
    raw payloads)."""
    with open(path, "rb") as f:
        meta, _ = _split(f.read())
    return meta


def write_artifact(path: str, data: bytes, meta: dict | None = None) -> None:
    """Write already-exported payload bytes with the meta header."""
    import json
    import struct

    with open(path, "wb") as f:
        if meta is not None:
            mj = json.dumps(meta, sort_keys=True).encode()
            f.write(_MAGIC + struct.pack("<I", len(mj)) + mj)
        f.write(data)


def export_decode_segment(params, cfg, vocab, batch: int, sample_len: int,
                          prefill: int = 32, dtype=None,
                          **decode_kwargs) -> bytes:
    """Convenience: serialize the fused greedy decode loop for one serving
    shape (batch, prefill bucket, sample budget).

    ``dtype`` fixes the KV cache / cross-memory calling convention
    (jax.export pins input dtypes). Default bf16 — what the serving
    encoder emits; an f32 artifact would force upcasting multi-GB cross
    arrays against the 15.75 GB HBM budget."""
    import jax.numpy as jnp
    import numpy as np

    from ..decoding.device_loop import build_masks, decode_segment_device
    from ..model.decoder import init_cache

    dtype = dtype or jnp.bfloat16
    sup, blank = build_masks(vocab)
    tokens = jnp.zeros((batch, prefill), jnp.int32)
    cache = init_cache(cfg, batch, dtype=dtype, ctx=prefill + sample_len + 8)
    L, H, D = cfg.n_text_layer, cfg.n_text_head, cfg.d_head_text
    cross = jnp.zeros((L, batch, H, D, cfg.n_audio_ctx), dtype)
    fn = functools.partial(
        decode_segment_device, cfg=cfg, sample_len=sample_len, **decode_kwargs)
    return export_fn(
        fn, params, tokens, prefill, 0, cache, cross, cross, sup, blank)


def export_serving_step(model, batch: int, decode_tokens: int,
                        kv_dtype: str = "int8", use_flash: bool = False,
                        beam_size=None) -> bytes:
    """Serialize the FULL serving step (mel -> encoder -> fused decode) for
    one shape — exactly the program the throughput bench runs
    (utils/benchmark.make_serving_step), so the shipped artifact is the
    benched artifact. Params/audio are abstract arguments."""
    import jax.numpy as jnp
    import numpy as np

    from .benchmark import make_serving_step

    step = make_serving_step(model, batch, decode_tokens, kv_dtype,
                             use_flash, beam_size)
    audio = jnp.zeros((16000 * 30,), jnp.float32)
    return export_fn(step, model.params, audio)
