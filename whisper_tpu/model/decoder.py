"""Whisper text decoder with KV cache — the half the reference never finished.

The reference scaffolds the decoder (weights fully loaded at
/root/reference/src/main.rs:1139-1334, KV arenas ``memory_k``/``memory_v`` at
main.rs:1336-1354) but implements no forward pass. Semantics here follow the
parent whisper.cpp-1.0.3 / openai-whisper decoder, built TPU-first:

  * self-attention K/V cache as a functional (B, n_layer, H, d, n_text_ctx)
    array pair updated with ``dynamic_update_slice`` at ``n_past`` — the XLA
    equivalent of the reference's F16 arena views at layer offsets (but
    batch-leading and kv-major; see KVCache for the measured rationale);
  * cross-attention reads the encoder's precomputed memory (K pre-scaled by
    d^-0.25, matching main.rs:1994-1996; Q scaled by the same factor here so
    the product is the standard 1/sqrt(d));
  * fixed shapes everywhere: prompts are right-padded to a static length and
    masked, so the whole segment decode compiles exactly twice (prefill +
    single-token step) regardless of prompt length;
  * blocks run under ``lax.scan`` over stacked layer params.

Logits are the tied token embedding transpose (openai semantics).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

import os

from ..config import WhisperConfig
from ..kernels.ops import gelu, layer_norm, linear, merge_heads, split_heads

# Layer-scan unroll factor (experiment knob). MEASURED NEGATIVE on v5e:
# greedy large-v3 b24 int8 RTF 542x (unroll=1) -> 433x (2) -> 315x (4) —
# unrolling defeats XLA's per-iteration weight prefetch pipelining instead
# of helping it. Keep 1.
_SCAN_UNROLL = int(os.environ.get("WHISPER_TPU_SCAN_UNROLL", "1"))


class KVCache(NamedTuple):
    # KV-MAJOR, BATCH-LEADING storage (B, n_layer, H, d_head, n_text_ctx):
    #   * the context axis is minor, so (a) tile padding is 448->512 instead
    #     of the 2x a d_head=64 minor dim costs, and (b) both attention
    #     contractions hit the stored layout directly (q@k contracts d with
    #     k already d-by-C; probs@v contracts C on the minor dim of both) —
    #     no per-step relayout copies;
    #   * the BATCH axis leads (not the layer axis) so one sequence's whole
    #     cache is CONTIGUOUS: the beam-search row permute and the serving
    #     engine's slot refills are then single-span DMAs. With layer
    #     leading, a row is L strided ~96 KB chunks and the beam permute
    #     measured 5x its wire cost in per-chunk DMA latency (v5e).
    # The reference's flat F16 arena (main.rs:1336-1354) is the same idea:
    # lay the memory out for the read pattern, not the producer.
    k: jnp.ndarray
    v: jnp.ndarray


def init_cache(cfg: WhisperConfig, batch: int, dtype=jnp.float32,
               pad_ctx: bool = False, ctx: int | None = None) -> KVCache:
    # ``ctx`` right-sizes the cache when the maximum sequence length is known
    # statically (prefill + sample_len in the device decode loop) — attention
    # cost scales with the stored context, so a 64-token serving segment
    # shouldn't pay for 448. pad_ctx rounds up to a 128 multiple (required by
    # the Pallas DMA decode kernel); measured on-chip that padding alone costs
    # ~10% decode RTF at the full 448 ctx, so exact sizing is the default.
    c = ctx if ctx is not None else cfg.n_text_ctx
    c = min(c, cfg.n_text_ctx)
    if pad_ctx:
        c = -(-c // 128) * 128
    shape = (batch, cfg.n_text_layer, cfg.n_text_head, cfg.d_head_text, c)
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


def _kvmajor_sdpa(q, k, v, mask, scale):
    """softmax(q k^T * scale + mask) v with f32 softmax statistics.

    q (B,H,T,D) head-split; k/v (B,H,D,C) kv-major.
    mask bool (T,C) broadcastable, True = attend.
    """
    logits = jnp.einsum("bhtd,bhdc->bhtc", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    logits = jnp.where(mask, logits, jnp.float32(-1e30))
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhtc,bhdc->bhtd", probs, v, preferred_element_type=jnp.float32).astype(q.dtype)


def _deferred_sdpa(q, k_slice, v_slice, k_new, v_new, n_past, scale):
    """T=1 RAGGED self-attention where the current token's K/V are NOT yet
    written to the cache slice (decode_step defer_append): history logits
    come from the slice, the current column is patched in LOGIT space
    (``lnew`` is exactly what the stored column would produce), and the
    current V rides as a rank-1 correction after the PV product. Masked
    history probabilities are exactly 0 (f32 exp(-1e30 - max) underflows),
    so the split product equals the stored-column product up to f32 sum
    ordering of one term.

    q (B,H,1,D); k_slice/v_slice (B,H,D,C); k_new/v_new (B,H,D,1);
    n_past (B,).
    """
    key_pos = jnp.arange(k_slice.shape[-1])[None]            # (1, C)
    np_b = n_past[:, None]                                   # (B, 1)
    hist = (key_pos < np_b)[:, None, None]                   # (B,1,1,C)
    cur = (key_pos == np_b)[:, None, None]
    logits = jnp.einsum("bhtd,bhdc->bhtc", q, k_slice,
                        preferred_element_type=jnp.float32) * scale
    lnew = jnp.einsum("bhtd,bhd->bht", q, k_new[..., 0],
                      preferred_element_type=jnp.float32) * scale
    logits = jnp.where(cur, lnew[..., None], logits)
    logits = jnp.where(hist | cur, logits, jnp.float32(-1e30))
    probs = jax.nn.softmax(logits, axis=-1)
    ph = jnp.where(hist, probs, 0).astype(v_slice.dtype)
    o = jnp.einsum("bhtc,bhdc->bhtd", ph, v_slice,
                   preferred_element_type=jnp.float32)
    # Current-column V correction replicates _kvmajor_sdpa's rounding for
    # the stored column: probs cast to the V dtype before the f32-accum
    # product (keeps deferred ≡ direct beyond mere tolerance).
    p_cur = jnp.sum(jnp.where(cur, probs, 0), axis=-1)       # (B,H,1)
    pc = p_cur.astype(v_slice.dtype).astype(jnp.float32)
    o = o + pc[..., None] * v_new[..., 0][:, :, None, :].astype(jnp.float32)
    return o.astype(q.dtype)


def _deferred_quant_sdpa(qs, ck, cv, k8, v8, n_past, out_dtype):
    """int8-cache variant of ``_deferred_sdpa`` (per-position scales fold
    into the products exactly as quant.qk_logits/pv_out do)."""
    from .quant import qk_logits

    key_pos = jnp.arange(ck.data.shape[-1])[None]
    np_b = n_past[:, None]
    hist = (key_pos < np_b)[:, None, None]
    cur = (key_pos == np_b)[:, None, None]
    logits = qk_logits(qs, ck)                               # (B,H,1,C) f32
    lnew = jnp.einsum("bhtd,bhd->bht", qs, k8.data[..., 0].astype(qs.dtype),
                      preferred_element_type=jnp.float32) * k8.scale
    logits = jnp.where(cur, lnew[..., None], logits)
    logits = jnp.where(hist | cur, logits, jnp.float32(-1e30))
    probs = jax.nn.softmax(logits, axis=-1)
    ph = (jnp.where(hist, probs, 0) * cv.scale[:, :, None, :]).astype(
        jnp.bfloat16)
    o = jnp.einsum("bhtc,bhdc->bhtd", ph, cv.data.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    # Current-column V correction replicates pv_out's rounding for the
    # stored column: (prob * scale) rounds to bf16 BEFORE multiplying the
    # int8 value (exact in f32), so deferred ≡ direct up to one f32 sum
    # reordering instead of a ~2^-9 systematic gain difference.
    p_cur = jnp.sum(jnp.where(cur, probs, 0), axis=-1)       # (B,H,1)
    pc = (p_cur * v8.scale).astype(jnp.bfloat16).astype(jnp.float32)
    o = o + pc[..., None] * v8.data[..., 0].astype(jnp.float32)[:, :, None, :]
    return o.astype(out_dtype)


def to_kv_major(x: jnp.ndarray, n_head: int) -> jnp.ndarray:
    """(..., T, S) -> (..., H, D, T)."""
    *lead, t, s = x.shape
    x = x.reshape(*lead, t, n_head, s // n_head)
    return jnp.moveaxis(x, -3, -1)  # (..., H, D, T)


def _plinear(y, blk, name, bias_name=None):
    """linear() that transparently consumes int8 weights (+ per-out-channel
    scale under ``<name>_scale``, see model.quant.quantize_decoder_weights)."""
    w = blk[name]
    s = blk.get(name + "_scale")
    b = blk[bias_name] if bias_name else None
    if s is None:
        return linear(y, w, b)
    out = jnp.einsum(
        "...i,oi->...o", y, w.astype(y.dtype), preferred_element_type=jnp.float32
    )
    out = (out * s).astype(y.dtype)
    return out + b if b is not None else out


def _cross_mlp(x, blk, cross_k, cross_v, cfg: WhisperConfig,
               return_cross_probs: bool = False):
    """Cross-attention over the precomputed encoder memory + MLP — the
    block tail shared by the direct decode path (_decoder_block) and the
    chunked beam path (_chunk_block). Returns (x, cross_probs|None)."""
    h = cfg.n_text_head
    d = cfg.d_head_text
    B, T, _ = x.shape

    y = layer_norm(x, blk["cross_attn_ln_w"], blk["cross_attn_ln_b"])
    qc = split_heads(_plinear(y, blk, "cross_q_w", "cross_q_b"), h)
    # cross_k is pre-scaled by d^-0.25 (encoder.py); scale q by the rest.
    qc = qc * (d ** -0.25)
    from .quant import QuantKV, pv_out, qk_logits

    # Group-shared cross memory: beam rows of one audio share identical
    # encoder output — cross batch G with decoder batch B = G*k folds the
    # beam axis into the query's time axis, so the memory is stored and READ
    # once per group instead of per beam (it dominates decode HBM traffic).
    Bc = getattr(cross_k, "data", cross_k).shape[0]
    if Bc != B:
        kk = B // Bc
        qc = qc.reshape(Bc, kk, h, T, d).transpose(0, 2, 1, 3, 4).reshape(
            Bc, h, kk * T, d
        )
    cross_probs = None
    if isinstance(cross_k, QuantKV):
        # int8 serving mode: per-position scales fold into the products.
        # XLA's fused einsum path measures 81% of the HBM roofline here; a
        # hand-written Pallas kernel (kernels/cross_attention_int8.py) was
        # 2.5-4x SLOWER (per-program overhead + VPU-side dequant that XLA
        # instead folds into the MXU operand read) — kept as a tested
        # negative result, not wired.
        logits = qk_logits(qc, cross_k)
        probs = jax.nn.softmax(logits, axis=-1)
        if return_cross_probs:
            cross_probs = probs.astype(jnp.float32)
        o = pv_out(probs, cross_v, x.dtype)
    elif return_cross_probs:
        # word-timing path (pipeline/word_timing.py): expose the attention
        # distribution over audio positions (the reference's WhisperTokenData
        # t0/t1 intent, main.rs:317-331, realized via openai's DTW method).
        logits = jnp.einsum(
            "bhtd,bhdc->bhtc", qc, cross_k, preferred_element_type=jnp.float32
        )
        probs = jax.nn.softmax(logits, axis=-1)
        cross_probs = probs
        o = jnp.einsum(
            "bhtc,bhdc->bhtd", probs.astype(cross_v.dtype), cross_v,
            preferred_element_type=jnp.float32,
        ).astype(qc.dtype)
    else:
        Ta = cross_k.shape[-1]
        full = jnp.ones((qc.shape[-2], Ta), dtype=bool)
        o = _kvmajor_sdpa(qc, cross_k, cross_v, full, 1.0)
    if Bc != B:
        o = o.reshape(Bc, h, kk, T, d).transpose(0, 2, 1, 3, 4).reshape(B, h, T, d)
    x = x + _plinear(merge_heads(o), blk, "cross_out_w", "cross_out_b")

    # ---- MLP ----
    y = layer_norm(x, blk["mlp_ln_w"], blk["mlp_ln_b"])
    y = gelu(_plinear(y, blk, "mlp0_w", "mlp0_b"), cfg.gelu_impl)
    x = x + _plinear(y, blk, "mlp1_w", "mlp1_b")
    return x, cross_probs


def _project_qkv(y, blk, h):
    """Self-attention Q/K/V projections (fused single matmul when the
    checkpoint was prepared with model.quant.fuse_decoder_qkv)."""
    if "qkv_w" in blk:
        # fused single Q/K/V matmul (model.quant.fuse_decoder_qkv): shaves
        # two fusions off the row-independent per-layer sequencing floor.
        qkv = _plinear(y, blk, "qkv_w", "qkv_b")
        n = qkv.shape[-1] // 3
        q = split_heads(qkv[..., :n], h)                         # (B,H,T,D)
        k_new = to_kv_major(qkv[..., n:2 * n], h)                # (B,H,D,T)
        v_new = to_kv_major(qkv[..., 2 * n:], h)
    else:
        q = split_heads(_plinear(y, blk, "q_w", "q_b"), h)       # (B,H,T,D)
        k_new = to_kv_major(_plinear(y, blk, "k_w"), h)          # (B,H,D,T); no bias
        v_new = to_kv_major(_plinear(y, blk, "v_w", "v_b"), h)
    return q, k_new, v_new


def _chunk_block(x, blk, pool_k, pool_v, tail_k, tail_v, layer,
                 cross_k, cross_v, n_past0, tail_len, oh, cfg: WhisperConfig):
    """Chunked-COW decoder block (beam serving engine, T=1 only): the
    multi-GB prefix pool is READ-ONLY — beam forks neither gather nor
    write back pool rows (every loop-level/per-layer reorder measured
    28+ ms/step of full-buffer materialization at 165 rows,
    scripts/bisect_beam_chunk.py). Instead:

      * each row's prefix is read THROUGH its fork indirection with a
        one-hot-masked expanded einsum over the row's beam group
        ('sjihc' intermediates): the pool bytes stream exactly once (same
        bytes the attention was already due), the k-fold FLOP expansion is
        noise next to the MXU, and the masked terms are EXACT zeros so the
        selected logits equal the direct path's values term for term;
      * the current chunk's appends land in a small per-chunk TAIL buffer
        (B, L, H, D, chunk_steps) attended directly; fork copies touch only
        the tail (<= chunk/pool_ctx of the bytes, done at loop level);
      * the pool is materialized ONCE per chunk boundary (composed
        prefix_src permute + tail flush, parallel/beam_engine.py) —
        amortized /chunk_steps.

    ``oh`` (S, k, k) bool: oh[s, i, j] = row i of group s reads prefix row
    j (group-local composed fork source). ``n_past0`` (B,) prefix lengths
    at chunk start; ``tail_len`` (B,) columns already in the tail.
    Returns (x', tail_k', tail_v').
    """
    h = cfg.n_text_head
    d = cfg.d_head_text
    B, T, _ = x.shape
    S, k, _ = oh.shape
    Cp = getattr(pool_k, "data", pool_k).shape[-1]
    CT = getattr(tail_k, "data", tail_k).shape[-1]

    y = layer_norm(x, blk["attn_ln_w"], blk["attn_ln_b"])
    q, k_new, v_new = _project_qkv(y, blk, h)        # (B,H,1,D), (B,H,D,1)

    from .quant import QuantKV, _quantize_one, pv_out, qk_logits

    def _slice_l(buf):
        return jax.lax.dynamic_index_in_dim(buf, layer, 1, keepdims=False)

    def _append_tail(buf, new, scale_rank=False):
        """Scatter ``new`` at (b, layer, ..., tail_len[b])."""
        rows = jnp.arange(B)
        lidx = jnp.full((B,), layer)
        if scale_rank:      # (B, H, 1) -> (b, layer, :, tail_len[b])
            return buf.at[rows, lidx, :, tail_len].set(new[..., 0])
        return buf.at[rows, lidx, :, :, tail_len].set(new[..., 0])

    quant = isinstance(pool_k, QuantKV)
    qs = (q * (d ** -0.5)).astype(q.dtype)
    ohf = oh.astype(jnp.float32)
    oht = oh.transpose(0, 2, 1)                       # (S, j, i)

    # ---- tail append (direct, per-row ragged column) ----
    if quant:
        k8, v8 = _quantize_one(k_new), _quantize_one(v_new)
        tail_k = QuantKV(_append_tail(tail_k.data, k8.data),
                         _append_tail(tail_k.scale, k8.scale, scale_rank=True))
        tail_v = QuantKV(_append_tail(tail_v.data, v8.data),
                         _append_tail(tail_v.scale, v8.scale, scale_rank=True))
    else:
        tail_k = _append_tail(tail_k, k_new.astype(tail_k.dtype))
        tail_v = _append_tail(tail_v, v_new.astype(tail_v.dtype))

    # ---- prefix logits through the fork indirection (expanded einsum) ----
    # quant matches qk_logits rounding (q pre-scaled in bf16, scale applied
    # f32 per position); bf16 matches _kvmajor_sdpa (unscaled q, logits
    # scaled in f32). The one-hot select sums exact zeros, so the picked
    # values equal the direct path's term for term.
    if quant:
        q_g = qs[:, :, 0, :].reshape(S, k, h, d)      # (S,k,H,D) pre-scaled
        kp = QuantKV(_slice_l(pool_k.data), _slice_l(pool_k.scale))
        kp_g = kp.data.reshape(S, k, h, d, Cp).astype(q.dtype)
        raw = jnp.einsum("sihd,sjhdc->sijhc", q_g, kp_g,
                         preferred_element_type=jnp.float32)
        sel = jnp.einsum("sij,sijhc->sihc", ohf, raw)          # exact select
        sscale = jnp.einsum("sij,sjhc->sihc", ohf,
                            kp.scale.reshape(S, k, h, Cp))
        logits_pre = sel * sscale
    else:
        q_g = q[:, :, 0, :].reshape(S, k, h, d)       # unscaled
        kp = _slice_l(pool_k)
        raw = jnp.einsum("sihd,sjhdc->sijhc", q_g,
                         kp.reshape(S, k, h, d, Cp),
                         preferred_element_type=jnp.float32)
        logits_pre = jnp.einsum("sij,sijhc->sihc", ohf, raw) * (d ** -0.5)
    logits_pre = logits_pre.reshape(B, h, 1, Cp)

    # ---- tail logits (direct) ----
    if quant:
        tk = QuantKV(_slice_l(tail_k.data), _slice_l(tail_k.scale))
        logits_tail = qk_logits(qs, tk)
    else:
        tk = _slice_l(tail_k)
        logits_tail = jnp.einsum("bhtd,bhdc->bhtc", q, tk,
                                 preferred_element_type=jnp.float32) * (d ** -0.5)

    # ---- masked softmax over [prefix | tail] ----
    pre_pos = jnp.arange(Cp)[None, :]                 # (1, Cp)
    tail_pos = jnp.arange(CT)[None, :]
    m_pre = (pre_pos < n_past0[:, None])[:, None, None]       # (B,1,1,Cp)
    m_tail = (tail_pos <= tail_len[:, None])[:, None, None]   # incl. current
    logits = jnp.concatenate(
        [jnp.where(m_pre, logits_pre, jnp.float32(-1e30)),
         jnp.where(m_tail, logits_tail, jnp.float32(-1e30))], axis=-1)
    probs = jax.nn.softmax(logits, axis=-1)
    p_pre, p_tail = probs[..., :Cp], probs[..., Cp:]

    # ---- PV: expanded prefix + direct tail, f32 partial sums ----
    p_pre_g = p_pre[:, :, 0, :].reshape(S, k, h, Cp)
    if quant:
        vp = QuantKV(_slice_l(pool_v.data), _slice_l(pool_v.scale))
        sscale_v = jnp.einsum("sij,sjhc->sihc", ohf,
                              vp.scale.reshape(S, k, h, Cp))
        p2v = (p_pre_g * sscale_v).astype(jnp.bfloat16)        # pv_out rounding
        P2 = oht[..., None, None] * p2v[:, None]               # (S,j,i,H,Cp)
        o_pre = jnp.einsum(
            "sjihc,sjhdc->sihd", P2,
            vp.data.reshape(S, k, h, d, Cp).astype(jnp.bfloat16),
            preferred_element_type=jnp.float32)
        tv = QuantKV(_slice_l(tail_v.data), _slice_l(tail_v.scale))
        o_tail = pv_out(p_tail, tv, jnp.float32)
    else:
        vp = _slice_l(pool_v)
        p2 = p_pre_g.astype(vp.dtype)
        P2 = oht[..., None, None].astype(vp.dtype) * p2[:, None]
        o_pre = jnp.einsum("sjihc,sjhdc->sihd", P2,
                           vp.reshape(S, k, h, d, Cp),
                           preferred_element_type=jnp.float32)
        tv = _slice_l(tail_v)
        o_tail = jnp.einsum("bhtc,bhdc->bhtd", p_tail.astype(tv.dtype), tv,
                            preferred_element_type=jnp.float32)
    o = (o_pre.reshape(B, h, 1, d) + o_tail).astype(x.dtype)
    x = x + _plinear(merge_heads(o), blk, "out_w", "out_b")
    x, _ = _cross_mlp(x, blk, cross_k, cross_v, cfg)
    return x, tail_k, tail_v


def _decoder_block(x, blk, ck_all, cv_all, layer, cross_k, cross_v, n_past,
                   cfg: WhisperConfig, return_cross_probs: bool = False,
                   permute_rows=None, defer_append: bool = False):
    """One decoder block. The KV cache is the FULL (B,L,H,D,C) buffer, updated
    in place at (:, layer, ..., n_past) — threading one buffer through the
    layer scan's carry lets XLA keep every update in-place instead of copying
    the cache per layer (the copy variant OOMs large-v3 on a 16 GB chip).

    ``permute_rows`` ((B,) int32 or None) fuses the beam-search cache reorder
    into the layer visit: the layer's slice is gathered by source row exactly
    where attention reads it anyway, the new K/V appends into the gathered
    slice, and the whole slice writes back in place. A loop-level reorder of
    the full cache costs ~3 full-cache passes on TPU (XLA copies the carry
    in and out of any reorder op — measured identically for jnp.take, a
    BlockSpec Pallas permute, and a raw-DMA Pallas permute); in here the
    gather rides the scan's existing in-place carry and the read feeds the
    attention that was already due."""
    h = cfg.n_text_head
    d = cfg.d_head_text
    B, T, _ = x.shape
    C = getattr(ck_all, "data", ck_all).shape[-1]

    # ---- causal self-attention over the cache ----
    y = layer_norm(x, blk["attn_ln_w"], blk["attn_ln_b"])
    q, k_new, v_new = _project_qkv(y, blk, h)

    from .quant import QuantKV, _quantize_one, quant_sdpa

    ragged = getattr(n_past, "ndim", 0) == 1  # per-row positions (serving slots)
    key_pos = jnp.arange(C)[None, :]                             # (1, C)
    if ragged:
        # (B, 1, T, C) mask: each row has its own past length.
        q_pos = n_past[:, None, None] + jnp.arange(T)[None, :, None]  # (B,T,1)
        mask = (key_pos[None] <= q_pos)[:, None]                 # (B,1,T,C)
    else:
        q_pos = n_past + jnp.arange(T)[:, None]                  # (T, 1)
        mask = key_pos <= q_pos                                  # causal + past

    def _append(buf, new, scale_rank=False):
        """Write ``new`` at position n_past (scalar: slice; vector: per-row
        scatter — the serving engine's slots each carry their own past; the
        speculative verify block scatters T columns at per-row offsets).
        The cache is batch-leading (B, L, ...); ``layer`` indexes axis 1."""
        if not ragged:
            offs = (0, layer, 0, n_past) if scale_rank else (0, layer, 0, 0, n_past)
            return jax.lax.dynamic_update_slice(buf, new[:, None], offs)
        rows = jnp.arange(B)
        if T == 1:
            lidx = jnp.full((B,), layer)
            if scale_rank:  # new (B, H, 1) -> scatter at (b, layer, :, n_past[b])
                return buf.at[rows, lidx, :, n_past].set(new[..., 0])
            # new (B, H, D, 1) -> scatter at (b, layer, :, :, n_past[b])
            return buf.at[rows, lidx, :, :, n_past].set(new[..., 0])
        # ragged multi-token block (device speculative verify): columns
        # n_past[b]..n_past[b]+T-1 per row. Advanced indices separated by
        # slices put the broadcast (B, T) dims first, so new (B, ..., T)
        # moves its column axis to position 1.
        r = rows[:, None]
        lidx = jnp.full((B, 1), layer)
        cols = n_past[:, None] + jnp.arange(T)[None, :]
        if scale_rank:  # new (B, H, T) -> (B, T, H)
            return buf.at[r, lidx, :, cols].set(jnp.moveaxis(new, -1, 1))
        # new (B, H, D, T) -> (B, T, H, D)
        return buf.at[r, lidx, :, :, cols].set(jnp.moveaxis(new, -1, 1))

    def _slice_l(buf):
        return jax.lax.dynamic_index_in_dim(buf, layer, 1, keepdims=False)

    def _append_in_slice(sl, new, scale_rank=False):
        """Write ``new`` at column n_past of a gathered layer slice
        (per-row columns when ``n_past`` is a vector — the beam ENGINE's
        groups carry ragged positions through the fused permute path)."""
        if not ragged:
            offs = (0, 0, n_past) if scale_rank else (0, 0, 0, n_past)
            return jax.lax.dynamic_update_slice(sl, new, offs)
        rows = jnp.arange(B)
        if T == 1:
            if scale_rank:            # sl (B,H,C), new (B,H,1)
                return sl.at[rows, :, n_past].set(new[..., 0])
            return sl.at[rows, :, :, n_past].set(new[..., 0])
        r = rows[:, None]
        cols = n_past[:, None] + jnp.arange(T)[None, :]
        if scale_rank:                # new (B,H,T) -> (B,T,H)
            return sl.at[r, :, cols].set(jnp.moveaxis(new, -1, 1))
        return sl.at[r, :, :, cols].set(jnp.moveaxis(new, -1, 1))

    def _writeback(buf, sl):
        offs = (0, layer) + (0,) * (buf.ndim - 2)
        return jax.lax.dynamic_update_slice(buf, sl[:, None], offs)

    deferred = None
    if defer_append:
        # Ragged T=1 serving steps: do NOT write K/V into the cache here.
        # The per-layer ragged scatter is latency-bound (4 scatters x
        # n_layer per step measured ~7.5 ms/step on v5e at 165 rows —
        # scripts/bisect_beam_chunk.py 'scalarnp' probe); instead the new
        # column is patched into the attention in logit space and all
        # layers' K/V scatter ONCE per step in decode_step after the scan.
        if not (ragged and T == 1):
            raise ValueError("defer_append requires ragged n_past and T=1")
        if isinstance(ck_all, QuantKV):
            k8 = _quantize_one(k_new)
            v8 = _quantize_one(v_new)
            if permute_rows is not None:
                gather = lambda a: jnp.take(a, permute_rows, axis=0)
                ck = QuantKV(gather(_slice_l(ck_all.data)),
                             gather(_slice_l(ck_all.scale)))
                cv = QuantKV(gather(_slice_l(cv_all.data)),
                             gather(_slice_l(cv_all.scale)))
                ck_all = QuantKV(_writeback(ck_all.data, ck.data),
                                 _writeback(ck_all.scale, ck.scale))
                cv_all = QuantKV(_writeback(cv_all.data, cv.data),
                                 _writeback(cv_all.scale, cv.scale))
            else:
                ck = QuantKV(_slice_l(ck_all.data), _slice_l(ck_all.scale))
                cv = QuantKV(_slice_l(cv_all.data), _slice_l(cv_all.scale))
            o = _deferred_quant_sdpa(q * (d ** -0.5), ck, cv, k8, v8,
                                     n_past, x.dtype)
            deferred = (k8, v8)
        else:
            kn = k_new.astype(ck_all.dtype)
            vn = v_new.astype(cv_all.dtype)
            if permute_rows is not None:
                gather = lambda a: jnp.take(a, permute_rows, axis=0)
                ck = gather(_slice_l(ck_all))
                cv = gather(_slice_l(cv_all))
                ck_all = _writeback(ck_all, ck)
                cv_all = _writeback(cv_all, cv)
            else:
                ck = _slice_l(ck_all)
                cv = _slice_l(cv_all)
            o = _deferred_sdpa(q, ck, cv, kn, vn, n_past, d ** -0.5)
            deferred = (kn, vn)
    elif isinstance(ck_all, QuantKV):
        # int8 cache: quantize the appended positions, update data + scale.
        k8 = _quantize_one(k_new)
        v8 = _quantize_one(v_new)
        if permute_rows is not None:
            gather = lambda a: jnp.take(a, permute_rows, axis=0)
            ck = QuantKV(
                _append_in_slice(gather(_slice_l(ck_all.data)), k8.data),
                _append_in_slice(gather(_slice_l(ck_all.scale)), k8.scale,
                                 scale_rank=True),
            )
            cv = QuantKV(
                _append_in_slice(gather(_slice_l(cv_all.data)), v8.data),
                _append_in_slice(gather(_slice_l(cv_all.scale)), v8.scale,
                                 scale_rank=True),
            )
            ck_all = QuantKV(_writeback(ck_all.data, ck.data),
                             _writeback(ck_all.scale, ck.scale))
            cv_all = QuantKV(_writeback(cv_all.data, cv.data),
                             _writeback(cv_all.scale, cv.scale))
        else:
            ck_all = QuantKV(
                _append(ck_all.data, k8.data),
                _append(ck_all.scale, k8.scale, scale_rank=True),
            )
            cv_all = QuantKV(
                _append(cv_all.data, v8.data),
                _append(cv_all.scale, v8.scale, scale_rank=True),
            )
            ck = QuantKV(_slice_l(ck_all.data), _slice_l(ck_all.scale))
            cv = QuantKV(_slice_l(cv_all.data), _slice_l(cv_all.scale))
        o = quant_sdpa(q * (d ** -0.5), ck, cv, mask, x.dtype)
    else:
        # Append at n_past — the functional version of the reference's
        # view_1d(memory_k, ..., offset=il*n_ctx + n_past) + cpy pattern.
        if permute_rows is not None:
            gather = lambda a: jnp.take(a, permute_rows, axis=0)
            ck = _append_in_slice(gather(_slice_l(ck_all)),
                                  k_new.astype(ck_all.dtype))
            cv = _append_in_slice(gather(_slice_l(cv_all)),
                                  v_new.astype(cv_all.dtype))
            ck_all = _writeback(ck_all, ck)
            cv_all = _writeback(cv_all, cv)
        else:
            ck_all = _append(ck_all, k_new.astype(ck_all.dtype))
            cv_all = _append(cv_all, v_new.astype(cv_all.dtype))
            ck = _slice_l(ck_all)
            cv = _slice_l(cv_all)
        o = _kvmajor_sdpa(q, ck, cv, mask, d ** -0.5)
    x = x + _plinear(merge_heads(o), blk, "out_w", "out_b")
    x, cross_probs = _cross_mlp(x, blk, cross_k, cross_v, cfg,
                                return_cross_probs)
    if return_cross_probs:
        return x, ck_all, cv_all, cross_probs
    if defer_append:
        return x, ck_all, cv_all, deferred
    return x, ck_all, cv_all


@functools.partial(jax.jit, static_argnames=("cfg", "defer_append"))
def decode_step(
    params: dict,
    tokens: jnp.ndarray,   # (B, T) int32, right-padded
    n_past: jnp.ndarray,   # scalar int32: number of cached positions
    cache: KVCache,
    cross_k: jnp.ndarray,  # (L, B, H, D, Ta) kv-major
    cross_v: jnp.ndarray,
    cfg: WhisperConfig,
    permute_rows=None,     # (B,) int32: fused beam cache reorder (see block)
    defer_append: bool = False,  # ragged T=1: one scatter/step (see block)
) -> Tuple[jnp.ndarray, KVCache]:
    """Forward ``T`` new tokens; returns (logits (B, T, n_vocab) f32, cache').

    Padded tail positions write garbage K/V *beyond* ``n_past + true_len``;
    callers advance ``n_past`` by the true length only, so the next call's
    dynamic_update_slice overwrites them — padding never corrupts the stream.

    ``permute_rows`` reorders the cache by source row (cache' row i derives
    from cache row permute_rows[i]) fused into the per-layer visit — the
    beam loop's alternative to a loop-level full-cache permute.

    ``defer_append`` (ragged T=1 serving chunks only): the per-layer ragged
    K/V scatter appends are replaced by logit-space patching inside the
    block and ONE batched scatter per buffer after the layer scan.
    MEASURED NEGATIVE on TPU — kept as a tested mechanism, NOT used by the
    engines. v5e, 165 rows, int8 ctx104, one process interleaved
    (scripts/bisect_beam_chunk.py): plaindefer 31.5 ms/step vs per-layer-
    append floor 29.4 — the post-scan batched scatter plus the logit-space
    patch cost MORE than the per-layer scatters they replace (raggedness
    itself is only 7.4 ms/step: scalar-n_past probe 22.0); with the fused
    beam permute, fuseddefer 57.4 vs fused 56.7, and the on-chip tokens
    diverged from the direct path (bf16 tie-breaks across program
    variants), so it is also not identity-safe for serving.
    """
    from ..parallel.sharding import constrain_cache, constrain_cross

    # Pin the KV/cross layouts when tracing under a (dp, tp) mesh (no-op
    # otherwise) — the multi-GB decode buffers must not depend on XLA's
    # sharding propagation (SURVEY §2.2 distributed-backend contract).
    # The self cache is batch-leading (B, L, ...); cross is layer-leading.
    cache = KVCache(constrain_cache(cache.k), constrain_cache(cache.v))
    cross_k = constrain_cross(cross_k)
    cross_v = constrain_cross(cross_v)

    dec = params["decoder"]
    B, T = tokens.shape
    te_scale = dec.get("te_scale")  # set when the embedding is int8-quantized
    x = dec["te"][tokens].astype(dec["pe"].dtype)
    if te_scale is not None:
        x = x * te_scale[tokens][..., None].astype(x.dtype)
    if getattr(n_past, "ndim", 0) == 1:
        # ragged serving slots: per-row positions -> (B, T, S) pe gather
        x = x + dec["pe"][n_past[:, None] + jnp.arange(T)[None]]
    else:
        pe = jax.lax.dynamic_slice_in_dim(dec["pe"], n_past, T, axis=0)
        x = x + pe[None]

    def body(carry, xs):
        x, ck_all, cv_all, layer = carry
        blk, xk, xv = xs
        out = _decoder_block(
            x, blk, ck_all, cv_all, layer, xk, xv, n_past, cfg,
            permute_rows=permute_rows, defer_append=defer_append,
        )
        x, ck_all, cv_all = out[:3]
        ys = out[3] if defer_append else None
        return (x, ck_all, cv_all, layer + 1), ys

    (x, new_k, new_v, _), deferred = jax.lax.scan(
        body,
        (x, cache.k, cache.v, jnp.int32(0)),
        (dec["blocks"], cross_k, cross_v),
        unroll=_SCAN_UNROLL,
    )
    if defer_append:
        # ONE batched scatter per buffer: all layers' new K/V columns land
        # at each row's n_past in a single op (vs 2-4 scatters x n_layer
        # inside the scan). Stacked ys are (L, B, H, D, 1) / scales
        # (L, B, H, 1); the cache is batch-leading (B, L, ...).
        rows = jnp.arange(tokens.shape[0])

        def scat_data(buf, val):          # val (L,B,H,D,1) -> (B,L,H,D)
            return buf.at[rows, :, :, :, n_past].set(
                jnp.moveaxis(val[..., 0], 0, 1))

        def scat_scale(buf, val):         # val (L,B,H,1) -> (B,L,H)
            return buf.at[rows, :, :, n_past].set(
                jnp.moveaxis(val[..., 0], 0, 1))

        k_def, v_def = deferred
        from .quant import QuantKV

        if isinstance(new_k, QuantKV):
            new_k = QuantKV(scat_data(new_k.data, k_def.data),
                            scat_scale(new_k.scale, k_def.scale))
            new_v = QuantKV(scat_data(new_v.data, v_def.data),
                            scat_scale(new_v.scale, v_def.scale))
        else:
            new_k = scat_data(new_k, k_def)
            new_v = scat_data(new_v, v_def)
    x = layer_norm(x, dec["ln_w"], dec["ln_b"])
    logits = jnp.einsum(
        "bts,vs->btv", x, dec["te"].astype(x.dtype), preferred_element_type=jnp.float32
    )
    if te_scale is not None:
        logits = logits * te_scale[None, None, :]
    return logits, KVCache(k=new_k, v=new_v)


@functools.partial(jax.jit, static_argnames=("cfg", "k"))
def decode_step_chunk(
    params: dict,
    tokens: jnp.ndarray,     # (B, 1) int32
    n_past0: jnp.ndarray,    # (B,) prefix length at chunk start (frozen)
    tail_len: jnp.ndarray,   # (B,) columns already appended this chunk
    pool: KVCache,           # READ-ONLY prefix pool (arrays or QuantKV)
    tail: KVCache,           # (B, L, H, D, chunk_steps) tail buffers
    prefix_src: jnp.ndarray, # (B,) composed fork source (global row idx)
    cross_k: jnp.ndarray,
    cross_v: jnp.ndarray,
    cfg: WhisperConfig,
    k: int,                  # beam width (group size; prefix_src stays in-group)
) -> Tuple[jnp.ndarray, KVCache]:
    """One beam-serving decode step with the pool untouched (_chunk_block):
    appends go to ``tail``; the prefix is read through ``prefix_src``.
    Returns (logits (B, 1, n_vocab) f32, tail'). The caller owns the
    chunk-boundary materialization (pool permute by the composed
    prefix_src + tail flush — parallel/beam_engine.py)."""
    from ..parallel.sharding import constrain_cache, constrain_cross

    pool = KVCache(constrain_cache(pool.k), constrain_cache(pool.v))
    tail = KVCache(constrain_cache(tail.k), constrain_cache(tail.v))
    cross_k = constrain_cross(cross_k)
    cross_v = constrain_cross(cross_v)

    dec = params["decoder"]
    B = tokens.shape[0]
    te_scale = dec.get("te_scale")
    x = dec["te"][tokens].astype(dec["pe"].dtype)
    if te_scale is not None:
        x = x * te_scale[tokens][..., None].astype(x.dtype)
    x = x + dec["pe"][(n_past0 + tail_len)[:, None]]

    oh = ((prefix_src - (jnp.arange(B) // k) * k).reshape(B // k, k)[
        :, :, None] == jnp.arange(k)[None, None, :])           # (S, k, k)

    def body(carry, xs):
        x, tk, tv, layer = carry
        blk, xk, xv = xs
        x, tk, tv = _chunk_block(
            x, blk, pool.k, pool.v, tk, tv, layer, xk, xv,
            n_past0, tail_len, oh, cfg)
        return (x, tk, tv, layer + 1), None

    (x, tk, tv, _), _ = jax.lax.scan(
        body,
        (x, tail.k, tail.v, jnp.int32(0)),
        (dec["blocks"], cross_k, cross_v),
        unroll=_SCAN_UNROLL,
    )
    x = layer_norm(x, dec["ln_w"], dec["ln_b"])
    logits = jnp.einsum(
        "bts,vs->btv", x, dec["te"].astype(x.dtype),
        preferred_element_type=jnp.float32)
    if te_scale is not None:
        logits = logits * te_scale[None, None, :]
    return logits, KVCache(k=tk, v=tv)


def init_tail(cfg: WhisperConfig, batch: int, chunk_steps: int,
              quantize: bool, dtype=jnp.bfloat16) -> KVCache:
    """Per-chunk tail buffers for the chunked-COW beam path."""
    from .quant import QuantKV

    L, H, D = cfg.n_text_layer, cfg.n_text_head, cfg.d_head_text
    if quantize:
        def one():
            return QuantKV(
                jnp.zeros((batch, L, H, D, chunk_steps), jnp.int8),
                jnp.zeros((batch, L, H, chunk_steps), jnp.float32))
        return KVCache(one(), one())
    shape = (batch, L, H, D, chunk_steps)
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


@functools.partial(jax.jit, static_argnames=("cfg",))
def cross_attention_probs(
    params: dict,
    tokens: jnp.ndarray,   # (B, T) int32 — full teacher-forced sequence
    cross_k: jnp.ndarray,  # (L, B, H, D, Ta) kv-major, bf16/f32
    cross_v: jnp.ndarray,
    cfg: WhisperConfig,
) -> jnp.ndarray:
    """One causal forward over ``tokens`` returning the cross-attention
    distribution (L, B, H, T, Ta) f32 per layer — the alignment signal for
    word-level timestamps (pipeline/word_timing.py). Not on the serving hot
    path; runs once per finished segment."""
    dec = params["decoder"]
    B, T = tokens.shape
    te_scale = dec.get("te_scale")
    x = dec["te"][tokens].astype(dec["pe"].dtype)
    if te_scale is not None:
        x = x * te_scale[tokens][..., None].astype(x.dtype)
    x = x + dec["pe"][:T][None]
    cache = init_cache(cfg, B, dtype=x.dtype, ctx=T)

    def body(carry, xs):
        x, ck_all, cv_all, layer = carry
        blk, xk, xv = xs
        x, ck_all, cv_all, probs = _decoder_block(
            x, blk, ck_all, cv_all, layer, xk, xv, jnp.int32(0), cfg,
            return_cross_probs=True,
        )
        return (x, ck_all, cv_all, layer + 1), probs

    (_, _, _, _), probs = jax.lax.scan(
        body,
        (x, cache.k, cache.v, jnp.int32(0)),
        (dec["blocks"], cross_k, cross_v),
    )
    return probs  # (L, B, H, T, Ta)
