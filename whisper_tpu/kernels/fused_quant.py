"""Pallas fused producer->int8 kernels for the W8A8 encoder serving mode.

Motivation (measured, v5e, large-v3 encoder at b64, one process, interleaved):
the W8A8 encoder's int8 matmuls save ~260 ms over bf16 (1734 -> 1475 ms with
a free activation quantizer), but the standalone ``quantize_act`` passes cost
~240 ms (1475 -> 1716 ms production), cancelling almost the entire MXU gain.
Each XLA-level quantize is ~2 extra f32-converted reads + an int8 write of a
246 MB (d=1280) or 983 MB (d=5120) activation tensor at the ~311-400 GB/s
read+write HBM rate.

These kernels fuse the quantization into the pass the producer already pays.
Per-site A/B in the full encoder (large-v3 b64, one process, interleaved —
/tmp-style bisect recorded in model/encoder.py) showed only ONE site wins:

  * ``act_quant``  — plain per-token int8 quant in one read. WIRED (-52 ms):
                     at the attention-output site its input is merge_heads
                     (a transpose) which unfused XLA materializes and then
                     reads twice (amax pass + quant pass); also used on the
                     shared hidden state before the W8A8 cross-KV
                     projections. In-device-loop isolation: 139 GB/s vs
                     XLA's 146 (act site parity, transpose input wins).
  * ``ln_quant``   — LayerNorm (f32 moments) + affine + per-token int8 quant
                     in one read. MEASURED NEGATIVE in context (+45 ms over
                     XLA layer_norm+quantize_act at the QKV/MLP0 pre-LN
                     sites, main.rs:1880-1887, 1944-1952) despite winning in
                     isolation (2.74 vs 3.17 ms/iter device-looped): XLA
                     fuses the residual-add producer and the amax reduce
                     into its LN chains for free, and the Pallas boundary
                     forces the bf16 intermediate to materialize. Kept as
                     the anchor for that finding.
  * ``gelu_quant`` — GELU + per-token int8 quant in one read (MLP0->MLP1
                     activation, main.rs:1957-1961). MEASURED NEGATIVE in
                     context (+98 ms): the unfused amax pass fuses into the
                     int8-matmul epilogue, so the kernel only adds a
                     boundary. Kept with ln_quant as the record.

Numerics: identical CONTRACT to model.quant.quantize_act (amax/127 per-token
scale, clip to [-127, 127]); the quantized value is computed from the f32
intermediate passed through a bf16 roundtrip so levels match the unfused
path's bf16 activation (reduction order inside mean/var/amax may still differ
by float-associativity — token agreement is gated in tests/test_quant.py).

Inference-only: serving-mode kernels with no VJP (training runs the bf16
path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fused_kernel(x_ref, w_ref, b_ref, y8_ref, s_ref, *, mode, eps, gelu_impl,
                  bf16_round):
    x = x_ref[...].astype(jnp.float32)  # (block_r, D)
    if mode == "ln":
        mean = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + eps)
        y = y * w_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    elif mode == "gelu":
        # Mosaic has no erf/erfc lowering; exact-mode GELU uses the
        # Abramowitz-Stegun 7.1.26 rational erf approximation in f32
        # (max abs err 1.5e-7 — two orders below one bf16 ulp, so levels
        # match jax.nn.gelu(approximate=False) after the bf16 roundtrip).
        if gelu_impl == "tanh":
            inner = 0.7978845608028654 * (x + 0.044715 * x * x * x)
            y = 0.5 * x * (1.0 + jnp.tanh(inner))
        else:
            z = jnp.abs(x) * (2.0 ** -0.5)
            t = 1.0 / (1.0 + 0.3275911 * z)
            poly = t * (0.254829592 + t * (-0.284496736 + t * (
                1.421413741 + t * (-1.453152027 + t * 1.061405429))))
            erf_abs = 1.0 - poly * jnp.exp(-z * z)
            y = 0.5 * x * (1.0 + jnp.sign(x) * erf_abs)
    else:  # "act"
        y = x
        bf16_round = False  # x is already the bf16 activation; roundtrip is a no-op
    if bf16_round:
        # Match the unfused path, which quantizes the bf16 activation.
        y = y.astype(jnp.bfloat16).astype(jnp.float32)
    amax = jnp.max(jnp.abs(y), axis=1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    y8_ref[...] = jnp.clip(jnp.round(y / scale), -127, 127).astype(jnp.int8)
    s_ref[...] = scale


def _run(x: jnp.ndarray, w, b, *, mode: str, eps: float, gelu_impl: str,
         interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    *lead, d = x.shape
    rows = 1
    for s in lead:
        rows *= s
    x2 = x.reshape(rows, d)
    block_r = 256 if d <= 2048 else 128
    rows_pad = (rows + block_r - 1) // block_r * block_r
    if rows_pad != rows:
        x2 = jnp.pad(x2, ((0, rows_pad - rows), (0, 0)))
    if w is None:
        # dummy affine operands so the kernel signature is uniform
        w = jnp.ones((d,), x.dtype)
        b = jnp.zeros((d,), x.dtype)
    w2 = w.reshape(1, d)
    b2 = b.reshape(1, d)

    grid = (rows_pad // block_r,)
    y8, scale = pl.pallas_call(
        functools.partial(
            _fused_kernel, mode=mode, eps=eps, gelu_impl=gelu_impl,
            bf16_round=(x.dtype == jnp.bfloat16),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_r, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_r, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows_pad, d), jnp.int8),
            jax.ShapeDtypeStruct((rows_pad, 1), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=8 * rows_pad * d,
            bytes_accessed=rows_pad * d * (x.dtype.itemsize + 1),
            transcendentals=rows_pad * d if mode == "gelu" else 0,
        ),
    )(x2, w2, b2)
    if rows_pad != rows:
        y8 = y8[:rows]
        scale = scale[:rows]
    return y8.reshape(*lead, d), scale.reshape(*lead, 1)


def ln_quant(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
             eps: float = 1e-5, interpret=None):
    """LayerNorm(x)*w+b -> (int8 (..., D), f32 per-token scale (..., 1))."""
    return _run(x, w, b, mode="ln", eps=eps, gelu_impl="erf",
                interpret=interpret)


def gelu_quant(x: jnp.ndarray, impl: str = "erf", interpret=None):
    """gelu(x) -> (int8, per-token scale). impl as kernels.ops.gelu."""
    return _run(x, None, None, mode="gelu", eps=0.0, gelu_impl=impl,
                interpret=interpret)


def act_quant(x: jnp.ndarray, interpret=None):
    """x -> (int8, per-token scale) in a single read (vs quantize_act's two)."""
    return _run(x, None, None, mode="act", eps=0.0, gelu_impl="erf",
                interpret=interpret)
