"""Whisper audio encoder, TPU-first.

Mirrors ``whisper_encode`` (/root/reference/src/main.rs:1799-2063) functionally:

    mel window (B, n_mels, 2*n_ctx)
    -> conv1 k=3 s=1 'same' + bias + gelu          (main.rs:1834-1855)
    -> conv2 k=3 s=2 'same' + bias + gelu          (main.rs:1856-1860)  T: 3000->1500
    -> transpose + positional embedding            (main.rs:1862-1875)
    -> n_layer x [pre-LN attn block + pre-LN MLP]  (main.rs:1877-1975)
    -> final LN                                    (main.rs:1979-1986)
    -> cross-attention K/V precompute              (main.rs:1990-2060)

Design deltas from the reference (deliberate, TPU-idiomatic):
  * blocks run under ``lax.scan`` over stacked layer params instead of a
    Python loop with per-layer arenas (main.rs:1877-1878) — one compiled
    block body, O(1) HLO size in depth;
  * no F16 head-split copies (main.rs:1898-1920) — attention is computed via
    einsum/Pallas directly on the head-split view;
  * cross K/V are *returned* as arrays (functional), not written into a
    mutable byte arena (main.rs:2018-2030); K is stored pre-scaled by
    (d_head)^-0.25 exactly like the reference (main.rs:1994-1996) and the
    decoder scales Q by the same factor.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import WhisperConfig
from ..kernels.ops import gelu, layer_norm, linear, merge_heads, sdpa, split_heads


class EncoderOutput(NamedTuple):
    # Final hidden states (B, n_audio_ctx, n_audio_state).
    hidden: jnp.ndarray
    # Pre-computed cross-attention memory, KV-MAJOR storage:
    # (n_text_layer, B, n_head, d_head, n_audio_ctx), K pre-scaled by d^-0.25.
    # The context axis is minor so both decoder attention contractions read
    # the stored layout directly (no per-step relayout), and tile padding is
    # 1500->1536 (2.4%) instead of the 2x a d_head=64 minor dim would cost.
    cross_k: jnp.ndarray
    cross_v: jnp.ndarray


def _conv_stem(x: jnp.ndarray, p: dict, cfg: WhisperConfig) -> jnp.ndarray:
    """(B, n_mels, T) -> (B, T//2, n_state). conv weights are (out, in, k).

    Activations follow the weight dtype: a bf16 model computes in bf16 (f32
    accumulation via preferred_element_type) regardless of the mel input
    dtype — otherwise an f32 mel silently upgrades the whole encoder (and the
    cross-KV memory) to f32, doubling HBM.
    """
    x = x.astype(p["conv1_w"].dtype)
    dn = jax.lax.conv_dimension_numbers(x.shape, p["conv1_w"].shape, ("NCH", "OIH", "NCH"))
    x = jax.lax.conv_general_dilated(
        x, p["conv1_w"].astype(x.dtype), window_strides=(1,), padding=[(1, 1)],
        dimension_numbers=dn, preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    x = gelu(x + p["conv1_b"][None, :, None], cfg.gelu_impl)
    x = jax.lax.conv_general_dilated(
        x, p["conv2_w"].astype(x.dtype), window_strides=(2,), padding=[(1, 1)],
        dimension_numbers=dn, preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    x = gelu(x + p["conv2_b"][None, :, None], cfg.gelu_impl)
    return jnp.swapaxes(x, 1, 2)  # (B, T/2, n_state)


def _elinear(y, blk: dict, name: str, bias_name: str | None = None):
    """linear() that transparently consumes W8A8-quantized encoder weights
    (int8 + ``<name>_scale``, model.quant.quantize_encoder_weights):
    activations are dynamically quantized per token so BOTH MXU operands are
    int8 — the serving-mode encoder path (~1.6x the bf16 matmul rate)."""
    w = blk[name]
    s = blk.get(name + "_scale")
    b = blk[bias_name] if bias_name else None
    if s is None:
        return linear(y, w, b)
    from .quant import dyn_qlinear

    return dyn_qlinear(y, w, s, b)


def _encoder_block(x: jnp.ndarray, blk: dict, cfg: WhisperConfig,
                   use_flash: bool) -> jnp.ndarray:
    h = cfg.n_audio_head
    if blk.get("q_w_scale") is not None:
        # W8A8 serving mode. The activation quantizers sit where XLA already
        # had a producer to fuse the amax pass into, so a Pallas fused
        # producer->quant kernel only helps at ONE site (measured per-site
        # bisect, large-v3 b64, one process: unfused 1715 ms; +fused-LN-quant
        # +45; +fused-GELU-quant +98; +fused act_quant -52 -> this config
        # ~1663 ms; all-fused 1805; free-quant floor 1475):
        #   * LN / GELU sites: XLA fuses residual-add + LN/epilogue + amax
        #     into the surrounding chains for free — a Pallas boundary there
        #     forces the bf16 intermediate to materialize and loses the
        #     epilogue fusion. Keep XLA (quantize_act).
        #   * attention-output site: the input is merge_heads (a transpose),
        #     which unfused XLA materializes and then reads TWICE (amax +
        #     quant passes); kernels/fused_quant.act_quant reads it once.
        # LN output is quantized ONCE for all three QKV projections.
        from ..kernels.fused_quant import act_quant
        from .quant import q8_matmul, quantize_act

        y8, a_scale = quantize_act(
            layer_norm(x, blk["attn_ln_w"], blk["attn_ln_b"]))
        q = q8_matmul(y8, a_scale, blk["q_w"], blk["q_w_scale"],
                      blk["q_b"], x.dtype)
        k = q8_matmul(y8, a_scale, blk["k_w"], blk["k_w_scale"],
                      None, x.dtype)  # K has no bias (main.rs:1894)
        v = q8_matmul(y8, a_scale, blk["v_w"], blk["v_w_scale"],
                      blk["v_b"], x.dtype)
        # QK stays bf16/f32 even in W8A8 mode: routing the score dot onto
        # the int8 MXU (flash_attention qk_int8=True, in-kernel per-row
        # quantization) measured SLOWER at the serving shape — 20.9 ms vs
        # 18.0 ms per call at (64,20,1536,64), one process, interleaved —
        # the VPU quant passes cost more than the int8 dot saves (and the
        # f32 MXU path already runs at 54.6 TFLOPs here). Measured negative,
        # kept as a tested kernel option; see flash_attention.py.
        o = sdpa(split_heads(q, h), split_heads(k, h), split_heads(v, h),
                 use_flash=use_flash)
        o8, o_scale = act_quant(merge_heads(o))
        x = x + q8_matmul(o8, o_scale, blk["out_w"], blk["out_w_scale"],
                          blk["out_b"], x.dtype)
        # MLP with pre-LN (main.rs:1944-1968).
        m8, m_scale = quantize_act(
            layer_norm(x, blk["mlp_ln_w"], blk["mlp_ln_b"]))
        y = q8_matmul(m8, m_scale, blk["mlp0_w"], blk["mlp0_w_scale"],
                      blk["mlp0_b"], x.dtype)
        g8, g_scale = quantize_act(gelu(y, cfg.gelu_impl))
        x = x + q8_matmul(g8, g_scale, blk["mlp1_w"], blk["mlp1_w_scale"],
                          blk["mlp1_b"], x.dtype)
        return x
    # Self-attention with pre-LN (main.rs:1880-1942).
    y = layer_norm(x, blk["attn_ln_w"], blk["attn_ln_b"])
    q = _elinear(y, blk, "q_w", "q_b")
    k = _elinear(y, blk, "k_w")  # K has no bias (main.rs:1894)
    v = _elinear(y, blk, "v_w", "v_b")
    o = sdpa(split_heads(q, h), split_heads(k, h), split_heads(v, h),
             use_flash=use_flash)
    x = x + _elinear(merge_heads(o), blk, "out_w", "out_b")
    # MLP with pre-LN (main.rs:1944-1968).
    y = layer_norm(x, blk["mlp_ln_w"], blk["mlp_ln_b"])
    y = gelu(_elinear(y, blk, "mlp0_w", "mlp0_b"), cfg.gelu_impl)
    x = x + _elinear(y, blk, "mlp1_w", "mlp1_b")
    return x


@functools.partial(jax.jit, static_argnames=("cfg", "use_flash", "quantize_kv"))
def encode(params: dict, mel: jnp.ndarray, cfg: WhisperConfig,
           use_flash: bool = False, quantize_kv: bool = False) -> EncoderOutput:
    """Run the encoder on a mel window.

    mel: (B, n_mels, 2*n_audio_ctx) — the zero-padded window the driver
    extracts (main.rs:1816-1833).
    """
    enc = params["encoder"]
    x = _conv_stem(mel, enc, cfg)
    n_ctx = x.shape[1]
    x = x + enc["pe"][:n_ctx].astype(x.dtype)[None]

    def body(carry, blk):
        return _encoder_block(carry, blk, cfg, use_flash), None

    x, _ = jax.lax.scan(body, x, enc["blocks"])
    x = layer_norm(x, enc["ln_post_w"], enc["ln_post_b"])
    cross_k, cross_v = cross_kv_from_hidden(params, x, cfg, quantize_kv)
    return EncoderOutput(hidden=x, cross_k=cross_k, cross_v=cross_v)


def cross_kv_from_hidden(params: dict, x: jnp.ndarray, cfg: WhisperConfig,
                         quantize_kv: bool = False):
    """Cross-attention K/V memory for every decoder layer from an encoded
    hidden state (main.rs:1990-2060). Factored out of :func:`encode` so a
    distil-style draft — which keeps the target's frozen encoder and only
    differs in its decoder — can project ITS cross memory from the
    TARGET's hidden state without a second encoder forward
    (utils/benchmark.run_speculative_benchmark draft='distil2')."""
    dec_blocks = params["decoder"]["blocks"]
    kscale = jnp.asarray(cfg.d_head_text ** -0.25, dtype=x.dtype)

    from .decoder import to_kv_major

    h = cfg.n_text_head

    # W8A8 cross projections in full serving mode: the hidden state is
    # shared by all 64 per-layer projections, so it quantizes ONCE; the
    # resulting memory is int8-requantized right after anyway
    # (quantize_kv), so the input-side noise is second-order — agreement
    # gated in tests/test_quant.py.
    x8 = xs = None
    if quantize_kv and params["encoder"]["blocks"].get("q_w_scale") is not None:
        from ..kernels.fused_quant import act_quant

        x8, xs = act_quant(x)

    def _lin(w, scale, b=None):
        # int8-quantized decoder weights (model.quant.quantize_decoder_weights)
        # carry per-out-channel scales that MUST be applied there too — the
        # serving bench quantizes params before encoding, and dropping the
        # scale would write garbage cross memory.
        if scale is not None and x8 is not None:
            from .quant import q8_matmul

            return q8_matmul(x8, xs, w, scale, b, x.dtype)
        y = jnp.einsum("...i,oi->...o", x, w.astype(x.dtype),
                       preferred_element_type=jnp.float32)
        if scale is not None:
            y = y * scale
        y = y.astype(x.dtype)
        return y + b if b is not None else y

    def cross_kv(blk_ck_w, ck_s, blk_cv_w, cv_s, blk_cv_b):
        k = _lin(blk_ck_w, ck_s) * kscale  # no bias; ^-0.25 scale (main.rs:1992-1996)
        v = _lin(blk_cv_w, cv_s, blk_cv_b)
        k, v = to_kv_major(k, h), to_kv_major(v, h)  # (B, H, D, Ta)
        if quantize_kv:
            from .quant import _quantize_one

            return _quantize_one(k), _quantize_one(v)
        return k, v

    ws = (dec_blocks["cross_k_w"], dec_blocks.get("cross_k_w_scale"),
          dec_blocks["cross_v_w"], dec_blocks.get("cross_v_w_scale"),
          dec_blocks["cross_v_b"])
    vmap_axes = (0, None, 0, None, 0) if ws[1] is None else (0, 0, 0, 0, 0)
    if quantize_kv:
        # int8 serving mode: layers must be SEQUENTIAL (lax.map) so the bf16
        # K/V temporaries stay at one layer's size — a vmap here batches all
        # layers and materializes the full bf16 cross memory (5.9 GB at b24,
        # 7.9 GB at b32) before quantizing, exhausting HBM at serving batch.
        if ws[1] is None:
            cross_k, cross_v = jax.lax.map(
                lambda t: cross_kv(t[0], None, t[1], None, t[2]),
                (ws[0], ws[2], ws[4]))
        else:
            cross_k, cross_v = jax.lax.map(lambda t: cross_kv(*t), ws)
    else:
        cross_k, cross_v = jax.vmap(cross_kv, in_axes=vmap_axes)(*ws)
    return cross_k, cross_v
