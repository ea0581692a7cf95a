"""Pallas TPU attention kernel.

The TPU replacement for galois_flash_attn (/root/reference/src/main.rs:1795,
used in the encoder hot loop at main.rs:1922): the reference's hand-written
AVX kernel becomes a Pallas kernel tiled for the MXU.

Shape regime: Whisper attention is T<=1500, d_head=64 — K and V for one head
fit comfortably in VMEM (1500x64 bf16 = 188 KB), so no online-softmax streaming
is needed: the grid is (batch*heads, q_blocks); each program loads its full
K/V head slice, computes one (BLOCK_Q, T) score tile in f32 on the MXU,
softmaxes it, and contracts with V. Simpler than a streamed flash kernel and
faster at these sizes (no rescaling passes), while keeping the O(T^2) scores
in VMEM only — never materialized in HBM, which is what matters for the
HBM-bound regime.

Supports non-causal (encoder) and causal (decoder training) variants and
ragged key lengths (key_len mask) for padded batches.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Measured on v5e (large-v3 encoder shapes, 24x20 heads x 1500 ctx):
# block_q 256 = 0.212 s / 32 layers, 512 = 0.193, 768 = 0.189 — bigger q
# tiles amortize the K/V VMEM residency better; 768 divides 1536 evenly.
BLOCK_Q = 768


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, causal, t_kv, block_q,
                 qk_int8=False):
    # q_ref: (1, block_q, D); k_ref/v_ref: (1, T_pad, D); o_ref: (1, block_q, D)
    qi = pl.program_id(1)
    if qk_int8:
        # MEASURED NEGATIVE at the serving shape — kept as a tested option,
        # not wired into any production path. Quantizes Q/K per row
        # IN-KERNEL and runs the score dot on the int8 MXU; the d^-0.5
        # scale folds into the per-row Q scales. A/B at (64,20,1536,64)
        # (b64 large-v3 W8A8 window, one process, interleaved, v5e):
        # bf16/f32 QK 18.0 ms/call vs this path 20.9 ms/call (+16%) — the
        # VPU amax/round/clip passes cost more than the int8 dot saves,
        # and the f32 MXU path already runs at 54.6 TFLOPs here. Max output
        # diff vs bf16 QK: 7.8e-3 (per-row scales, ~1% score noise).
        qf = q_ref[0].astype(jnp.float32)
        kf = k_ref[0].astype(jnp.float32)
        qs = jnp.maximum(jnp.max(jnp.abs(qf), axis=1, keepdims=True), 1e-6) / 127.0
        ks = jnp.maximum(jnp.max(jnp.abs(kf), axis=1, keepdims=True), 1e-6) / 127.0
        q8 = jnp.clip(jnp.round(qf / qs), -127, 127).astype(jnp.int8)
        k8 = jnp.clip(jnp.round(kf / ks), -127, 127).astype(jnp.int8)
        s32 = jax.lax.dot_general(
            q8, k8, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        s = s32.astype(jnp.float32) * (qs * scale) * ks.reshape(1, -1)
    else:
        # The f32 upcast before the QK dot is DELIBERATE: a controlled A/B on
        # v5e (24x20 heads, 1536 ctx, one process, interleaved repeats)
        # measured f32-upcast QK at 54.6 TFLOPs vs 50.1 for the bf16-operand
        # dot with a post-scale — Mosaic's f32 MXU path wins at this shape,
        # contrary to the usual keep-operands-bf16 rule.
        q = q_ref[0].astype(jnp.float32) * scale
        k = k_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (block_q, T_pad)
    key_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    mask = key_ids < t_kv
    if causal:
        q_ids = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        mask = mask & (key_ids <= q_ids)
    s = jnp.where(mask, s, -1e30)
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=1, keepdims=True)
    p = (e / denom).astype(v_ref.dtype)
    o = jax.lax.dot_general(
        p, v_ref[0], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0] = o.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,  # unsupported in the kernel: fallback
    causal: bool = False,
    interpret: Optional[bool] = None,
    block_q: int = BLOCK_Q,
    qk_int8: bool = False,
) -> jnp.ndarray:
    """softmax(q k^T / sqrt(D)) v over (..., H, T, D) tensors.

    Callers are expected to be inside jit already. On non-TPU backends the
    kernel runs in interpreter mode (slow; tests only). ``qk_int8`` runs the
    score dot on the int8 MXU path with in-kernel per-row quantization —
    a MEASURED NEGATIVE at the serving shape (see _attn_kernel), kept as a
    tested option only.

    ``mask`` is unsupported by the kernel: that path falls back to the plain
    XLA sdpa, which also DROPS ``qk_int8`` (the int8 score dot only exists in
    the Pallas kernel) — asserted below so the flag is never silently lost.
    """
    if mask is not None:
        assert not qk_int8, "qk_int8 is only supported by the Pallas kernel (mask=None)"
        from .ops import sdpa

        return sdpa(q, k, v, mask=mask, use_flash=False)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    orig_shape = q.shape
    *lead, tq, d = q.shape
    tk = k.shape[-2]
    bh = 1
    for s in lead:
        bh *= s
    q3 = q.reshape(bh, tq, d)
    k3 = k.reshape(bh, tk, d)
    v3 = v.reshape(bh, tk, d)

    tq_pad = _round_up(tq, block_q)
    tk_pad = _round_up(tk, 128)
    if tq_pad != tq:
        q3 = jnp.pad(q3, ((0, 0), (0, tq_pad - tq), (0, 0)))
    if tk_pad != tk:
        k3 = jnp.pad(k3, ((0, 0), (0, tk_pad - tk), (0, 0)))
        v3 = jnp.pad(v3, ((0, 0), (0, tk_pad - tk), (0, 0)))

    grid = (bh, tq_pad // block_q)
    out = pl.pallas_call(
        functools.partial(
            _attn_kernel,
            scale=d ** -0.5,
            causal=causal,
            t_kv=tk,
            block_q=block_q,
            qk_int8=qk_int8,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, tq_pad, d), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * tq_pad * tk_pad * d * 2,
            bytes_accessed=bh * (tq_pad + 2 * tk_pad + tq_pad) * d * q.dtype.itemsize,
            transcendentals=bh * tq_pad * tk_pad,
        ),
    )(q3, k3, v3)
    if tq_pad != tq:
        out = out[:, :tq, :]
    return out.reshape(orig_shape)


# ---------------------------------------------------------------------------
# Differentiable wrapper: Pallas forward, exact XLA backward.
#
# pallas_call has no automatic VJP, so training paths use this custom_vjp:
# the forward runs the kernel (causal or not), the backward recomputes the
# attention matrix with XLA einsums and applies the standard closed-form
# attention gradients — exact (same math, f32 statistics), with the O(T^2)
# probabilities materialized only inside the backward.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_sdpa(q, k, v, causal: bool = False):
    """Differentiable flash attention (training decoder/encoder paths)."""
    return flash_attention(q, k, v, causal=causal)


def _flash_sdpa_fwd(q, k, v, causal):
    return flash_attention(q, k, v, causal=causal), (q, k, v)


def _flash_sdpa_bwd(causal, residuals, g):
    q, k, v = residuals
    d = q.shape[-1]
    scale = d ** -0.5
    s = jnp.einsum("...td,...cd->...tc", q, k,
                   preferred_element_type=jnp.float32) * scale
    if causal:
        tq, tk = s.shape[-2], s.shape[-1]
        mask = jnp.tril(jnp.ones((tq, tk), dtype=bool), k=tk - tq)
        s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)                      # f32
    g32 = g.astype(jnp.float32)
    dv = jnp.einsum("...tc,...td->...cd", p, g32)
    dp = jnp.einsum("...td,...cd->...tc", g32, v.astype(jnp.float32))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("...tc,...cd->...td", ds, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("...tc,...td->...cd", ds, q.astype(jnp.float32)) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


flash_sdpa.defvjp(_flash_sdpa_fwd, _flash_sdpa_bwd)
