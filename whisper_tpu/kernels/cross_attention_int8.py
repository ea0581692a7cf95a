"""Pallas kernel: decode-step cross-attention over the int8 cross memory.

**Status: tested, NOT wired — measured SLOWER than XLA's fused path.**
Honest numbers (large-v3, v5e, 64-token segment): XLA int8 path 0.56 s (b24)
/ 0.92 s (b48); this kernel 1.43 s / 3.49 s at one (b,h) per program and
1.15 s / 2.90 s grouped G=8. Why XLA wins: the decode-regime blocks are tiny
(~100 KB/head), so per-program startup dominates at small G, and at any G the
int8->bf16 dequant materializes on the VPU at ~DMA speed without overlapping,
while XLA folds the convert into the MXU operand read of its fused
convert+dot+softmax+dot. XLA's path already runs at ~81% of the HBM roofline
(ceiling for any kernel: 1.23x), so this stays a documented negative result —
same conclusion as kernels/decode_attention.py for the bf16 cache.

Background: the cross-attention memory read dominates decode HBM traffic (the
reference's ``memory_cross_k/v`` arenas, main.rs:1336-1354, re-read per token
exactly like whisper.cpp). With int8 storage (model/quant.py) the kernel
streams the int8 K/V blocks HBM->VMEM directly, dequantizes in VMEM, and
keeps all O(C) temporaries on-chip.

Math replicates model.quant.qk_logits / pv_out bit-for-bit in structure:

    logits = dot(q_bf16, dequant8(k)) * k_scale          (f32 accum)
    p      = softmax(logits)                             (f32)
    out    = dot((p * v_scale).astype(bf16), dequant8(v))

Shapes (kv-major, decode regime): q (B, H, T, D) with T = 1..few (the beam
fold multiplies T, not B); k/v data (B, H, D, C) int8; scales (B, H, C) f32.
One grid program per (b, h): K/V head slices are ~100 KB int8, far under
VMEM, and the grid pipeline double-buffers the streaming automatically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref, *, t_kv):
    # q_ref (G, Tp, D) bf16; k_ref/v_ref (G, D, Cp) int8;
    # ks_ref/vs_ref (G, 1, Cp) f32; o_ref (G, Tp, D) bf16.
    # G (b,h) pairs per program: one-per-program made the grid 2M tiny
    # invocations per segment and program overhead dominated (measured 4x
    # slower than XLA); G=8 amortizes startup while staying well under VMEM.
    q = q_ref[:]
    k = k_ref[:].astype(q.dtype)
    raw = jax.lax.dot_general(
        q, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )                                                   # (G, Tp, Cp)
    logits = raw * ks_ref[:, 0, :][:, None, :]
    key_ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 2)
    logits = jnp.where(key_ids < t_kv, logits, -1e30)
    m = jnp.max(logits, axis=2, keepdims=True)
    e = jnp.exp(logits - m)
    probs = e / jnp.sum(e, axis=2, keepdims=True)       # f32
    p = (probs * vs_ref[:, 0, :][:, None, :]).astype(q.dtype)  # (G, Tp, Cp)
    v = v_ref[:].astype(q.dtype)                        # (G, D, Cp)
    o = jax.lax.dot_general(
        p, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )                                                   # (G, Tp, D)
    o_ref[:] = o.astype(o_ref.dtype)


def cross_attention_int8(
    q: jnp.ndarray,        # (B, H, T, D) bf16/f32
    k_data: jnp.ndarray,   # (B, H, D, C) int8
    k_scale: jnp.ndarray,  # (B, H, C) f32
    v_data: jnp.ndarray,
    v_scale: jnp.ndarray,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """softmax(q·dequant(k)) · dequant(v), int8-resident. Returns (B,H,T,D)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, T, D = q.shape
    C = k_data.shape[-1]
    BH = B * H
    tp = _round_up(max(T, 1), 16)   # bf16 sublane minimum
    cp = _round_up(C, 128)
    G = 1
    for cand in (8, 4, 2):
        if BH % cand == 0:
            G = cand
            break

    q3 = q.reshape(BH, T, D)
    if tp != T:
        q3 = jnp.pad(q3, ((0, 0), (0, tp - T), (0, 0)))
    k3 = k_data.reshape(BH, D, C)
    v3 = v_data.reshape(BH, D, C)
    ks = k_scale.reshape(BH, C).astype(jnp.float32)
    vs = v_scale.reshape(BH, C).astype(jnp.float32)
    if cp != C:
        k3 = jnp.pad(k3, ((0, 0), (0, 0), (0, cp - C)))
        v3 = jnp.pad(v3, ((0, 0), (0, 0), (0, cp - C)))
        ks = jnp.pad(ks, ((0, 0), (0, cp - C)))
        vs = jnp.pad(vs, ((0, 0), (0, cp - C)))
    # (BH, 1, Cp): TPU block shapes need the last two dims (÷8 or full, ÷128)
    ks = ks[:, None, :]
    vs = vs[:, None, :]

    out = pl.pallas_call(
        functools.partial(_kernel, t_kv=C),
        grid=(BH // G,),
        in_specs=[
            pl.BlockSpec((G, tp, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, D, cp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1, cp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, D, cp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1, cp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (G, tp, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((BH, tp, D), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * BH * tp * cp * D * 2,
            bytes_accessed=BH * (2 * D * cp + 2 * 4 * cp + 2 * tp * D * 2),
            transcendentals=BH * tp * cp,
        ),
    )(q3, k3, ks, v3, vs)
    if tp != T:
        out = out[:, :T, :]
    return out.reshape(B, H, T, D)
