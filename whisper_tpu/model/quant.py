"""int8 quantization for the decode-step bandwidth giants.

Every decoder step re-reads the full cross-attention memory (the dominant
HBM traffic at serving batch: ~6 GB/step for large-v3 b24 in bf16) and the
growing self-attention cache. Both are quantized to int8 with PER-POSITION
scales (one scale per (layer, batch, head, ctx) vector along d_head), chosen
because they factor out of both attention contractions:

    logits[t,c] = sum_d q[t,d] * (i8[d,c] * s[c]) = (q @ i8)[t,c] * s[c]
    out[t,d]    = sum_c p[t,c] * (v8[d,c] * s[c]) = ((p*s) @ v8^T)[t,d]

so the MXU consumes the int8 buffer directly (converted on read, never
dequantized in HBM) and the scale is a cheap VPU multiply on the small side.

Opt-in (serving mode): quantization perturbs attention logits, so the
bf16 path remains the parity default.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QuantKV(NamedTuple):
    """int8 KV with per-position scales. data (..., D, C) int8; scale (..., C) f32."""

    data: jnp.ndarray
    scale: jnp.ndarray


def _quantize_one(x: jnp.ndarray) -> QuantKV:
    # Arithmetic stays in the input dtype (bf16 represents integers <= 256
    # exactly, so the rounded levels are lossless); only the tiny scale
    # reduction is f32. Avoids f32 copies of multi-GB buffers.
    amax = jnp.max(jnp.abs(x), axis=-2).astype(jnp.float32)  # (..., C)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    # Store the scale ROUNDED to the divisor actually used: quantizing
    # divides by the bf16-cast scale, so dequant must multiply by the same
    # value — an un-rounded f32 scale adds a systematic per-position gain
    # error of up to 2^-9 (~0.2%) on top of int8 rounding noise.
    scale = scale.astype(x.dtype).astype(jnp.float32)
    q = jnp.clip(jnp.round(x / scale[..., None, :].astype(x.dtype)), -127, 127)
    return QuantKV(data=q.astype(jnp.int8), scale=scale)


def quantize_kv(x: jnp.ndarray) -> QuantKV:
    """(..., D, C) float -> int8 + per-position (along C) scale.

    5-D (layer-stacked) inputs are quantized one layer at a time so the
    temporaries stay at 1/L of the buffer size (quantizing a 6 GB cross
    memory in one shot OOMs a 16 GB chip on temps alone)."""
    if x.ndim >= 5:
        return jax.lax.map(_quantize_one, x)
    return _quantize_one(x)


def qk_logits(q: jnp.ndarray, kq: QuantKV) -> jnp.ndarray:
    """einsum('bhtd,bhdc->bhtc') against int8 K; returns f32 logits."""
    raw = jnp.einsum(
        "bhtd,bhdc->bhtc", q, kq.data.astype(q.dtype),
        preferred_element_type=jnp.float32,
    )
    return raw * kq.scale[..., None, :]


def pv_out(probs: jnp.ndarray, vq: QuantKV, out_dtype) -> jnp.ndarray:
    """einsum('bhtc,bhdc->bhtd') against int8 V with scale folded into probs."""
    p = (probs * vq.scale[..., None, :]).astype(jnp.bfloat16)
    return jnp.einsum(
        "bhtc,bhdc->bhtd", p, vq.data.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)


def quantize_cross(cross_k: jnp.ndarray, cross_v: jnp.ndarray):
    """Quantize the encoder's (L,B,H,D,Ta) cross memory."""
    return quantize_kv(cross_k), quantize_kv(cross_v)


def quant_sdpa(q, kq: QuantKV, vq: QuantKV, mask, out_dtype):
    """Masked attention over int8 KV (kv-major (...,D,C) data, (...,C) scale)."""
    logits = qk_logits(q, kq)
    logits = jnp.where(mask, logits, jnp.float32(-1e30))
    probs = jax.nn.softmax(logits, axis=-1)
    return pv_out(probs, vq, out_dtype)


def init_quant_cache(cfg, batch: int, ctx: int | None = None,
                     pad_ctx: bool = False):
    """int8 KV cache: data (B,L,H,D,C) int8 + per-position scale (B,L,H,C)
    (batch-leading so a sequence's cache is contiguous — see KVCache).
    ``pad_ctx`` rounds C up to a 128 multiple — only needed by the
    standalone raw-DMA row permute (kernels/beam_gather.permute_rows_multi
    needs tile-aligned rows); the production beam paths use the lane-dot
    fork copy and size the cache exactly (ctx 75-vs-128 measured 21.4 vs
    23.4 ms/step)."""
    L, H, D = cfg.n_text_layer, cfg.n_text_head, cfg.d_head_text
    C = min(ctx or cfg.n_text_ctx, cfg.n_text_ctx)
    if pad_ctx:
        C = -(-C // 128) * 128

    # K and V must be DISTINCT buffers: sharing one zeros array breaks
    # donation ("attempt to donate the same buffer twice") in the serving
    # engine's in-place pool updates.
    def one():
        return QuantKV(jnp.zeros((batch, L, H, D, C), jnp.int8),
                       jnp.zeros((batch, L, H, C), jnp.float32))

    return one(), one()


# ---- weight-only int8 (decoder) ----
#
# The decode step re-reads every decoder weight each token (~1.7 GB/step for
# large-v3 in bf16). Per-OUTPUT-channel scales factor out of the matmul:
#     y[o] = sum_i x[i] * (w8[o,i] * s[o]) = (x @ w8^T)[o] * s[o]
# so the dot consumes int8 weights directly and the scale is one multiply on
# the output row. Tied embeddings quantize per vocab row (logits scale on the
# output; embedding lookups rescale the gathered rows).

_WEIGHT_KEYS = (
    "q_w", "k_w", "v_w", "out_w", "mlp0_w", "mlp1_w",
    "cross_q_w", "cross_k_w", "cross_v_w", "cross_out_w",
)


def quantize_weight(w: jnp.ndarray):
    """(..., O, I) float -> (int8, per-O scale). Leading layer axis allowed."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-1)  # (..., O)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(
        jnp.round(w.astype(jnp.float32) / scale[..., None]), -127, 127
    ).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def fuse_decoder_qkv(params: dict) -> dict:
    """Concatenate each decoder block's self-attention Q/K/V projections
    into ONE (3*n_state, n_state) matmul ("qkv_w"/"qkv_b", + "qkv_w_scale"
    when the tree is int8-quantized), removing the separate entries.

    Motivation (scripts/itemize_decode_floor.py): the decode step's cost is
    dominated by a ~0.5 ms/LAYER row-independent per-fusion sequencing
    overhead, so merging three small matmul fusions into one shaves fixed
    cost, not FLOPs. Numerics are bit-identical: each output channel's dot
    product is unchanged by concatenating along the OUTPUT axis (quantize
    BEFORE fusing — per-out-channel scales concatenate exactly), and K's
    missing bias becomes explicit zeros.

    Only for UNSHARDED serving params: parallel/sharding.param_pspecs has no
    spec for the fused entry (tp shards Q/K/V per head; a concatenated out
    axis would stripe across them).
    """
    out = dict(params)
    dec = dict(params["decoder"])
    blocks = dict(dec["blocks"])
    q_w, k_w, v_w = blocks.pop("q_w"), blocks.pop("k_w"), blocks.pop("v_w")
    q_b, v_b = blocks.pop("q_b"), blocks.pop("v_b")
    blocks["qkv_w"] = jnp.concatenate([q_w, k_w, v_w], axis=-2)
    blocks["qkv_b"] = jnp.concatenate([q_b, jnp.zeros_like(q_b), v_b],
                                      axis=-1)
    if "q_w_scale" in blocks:
        blocks["qkv_w_scale"] = jnp.concatenate(
            [blocks.pop("q_w_scale"), blocks.pop("k_w_scale"),
             blocks.pop("v_w_scale")], axis=-1)
    dec["blocks"] = blocks
    out["decoder"] = dec
    return out


def quantize_decoder_weights(params: dict) -> dict:
    """Return params with the decoder's matmul weights in int8 (+ scales).

    The decoder consumers (model.decoder._plinear / the logits matmul) pick
    up the ``*_scale`` entries automatically. Encoder weights stay bf16:
    they're read once per 30 s window, not once per token.
    """
    out = dict(params)
    dec = dict(params["decoder"])
    blocks = dict(dec["blocks"])
    for key in _WEIGHT_KEYS:
        q, s = quantize_weight(blocks[key])
        blocks[key] = q
        blocks[key + "_scale"] = s
    dec["blocks"] = blocks
    te_q, te_s = quantize_weight(dec["te"])
    dec["te"] = te_q
    dec["te_scale"] = te_s
    out["decoder"] = dec
    return out


# ---------------------------------------------------------------------------
# W8A8 encoder (serving mode): int8 weights x int8 dynamically-quantized
# activations on the MXU's int8 path (~212 TOPs measured vs 131.9 bf16
# TFLOPs on v5e). Per-token activation scales + per-channel weight scales.
# ---------------------------------------------------------------------------

_ENC_WEIGHT_KEYS = ("q_w", "k_w", "v_w", "out_w", "mlp0_w", "mlp1_w")


def quantize_encoder_weights(params: dict) -> dict:
    """Return params with the encoder blocks' matmul weights in int8
    (+ per-out-channel scales). The conv stem, positional embedding, and
    layer norms stay bf16 (negligible FLOPs); attention QK/PV stay bf16 in
    the flash kernel (~16% of encoder FLOPs). Consumers
    (model.encoder._elinear) pick up the ``*_scale`` entries and switch to
    dynamic per-token activation quantization (W8A8)."""
    out = dict(params)
    enc = dict(params["encoder"])
    blocks = dict(enc["blocks"])
    for key in _ENC_WEIGHT_KEYS:
        q, s = quantize_weight(blocks[key])
        blocks[key] = q
        blocks[key + "_scale"] = s
    enc["blocks"] = blocks
    out["encoder"] = enc
    return out


def dyn_qlinear(y: jnp.ndarray, w8: jnp.ndarray, w_scale: jnp.ndarray,
                b: jnp.ndarray | None = None) -> jnp.ndarray:
    """x(..., I) @ w8(O, I)^T with dynamic per-token activation int8
    quantization: both MXU operands are int8 (the v5e int8 path is ~1.6x
    the bf16 rate), accumulation int32, dequant by a_scale[t] * w_scale[o].
    """
    y8, a_scale = quantize_act(y)
    return q8_matmul(y8, a_scale, w8, w_scale, b, y.dtype)


def quantize_act(y: jnp.ndarray):
    """Dynamic per-token activation quantization: (..., I) float ->
    ((..., I) int8, (..., 1) f32 scale). Factored out so one LN output is
    quantized ONCE and shared by the three QKV projections (the amax +
    round passes are full reads/writes of the activation tensor)."""
    amax = jnp.max(jnp.abs(y.astype(jnp.float32)), axis=-1, keepdims=True)
    a_scale = jnp.maximum(amax, 1e-8) / 127.0
    y8 = jnp.clip(jnp.round(y.astype(jnp.float32) / a_scale),
                  -127, 127).astype(jnp.int8)
    return y8, a_scale


def q8_matmul(y8: jnp.ndarray, a_scale: jnp.ndarray, w8: jnp.ndarray,
              w_scale: jnp.ndarray, b: jnp.ndarray | None,
              out_dtype) -> jnp.ndarray:
    """int8 x int8 matmul with int32 accumulation and per-token x
    per-channel dequant."""
    acc = jnp.einsum("...i,oi->...o", y8, w8,
                     preferred_element_type=jnp.int32)
    out = (acc.astype(jnp.float32) * a_scale * w_scale).astype(out_dtype)
    if b is not None:
        out = out + b
    return out
