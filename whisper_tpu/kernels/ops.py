"""Core compute ops shared by encoder/decoder: layernorm, gelu, attention.

These are the TPU equivalents of the reference's galois op wrappers
(/root/reference/src/main.rs:1709-1797): ``galois_norm`` -> layer_norm,
``galois_gelu`` -> gelu, ``galois_flash_attn`` -> attention. Elementwise ops
(add/mul/scale/repeat/cpy) need no wrappers — XLA fuses jnp arithmetic.

``attention`` dispatches to the Pallas flash kernel on TPU for long sequences
and to a plain XLA softmax-attention elsewhere; both compute
softmax(q k^T / sqrt(d)) v exactly (the reference pre-scales K by
(d)^-0.25 and Q by (d)^-0.25 — same product, main.rs:1994-1996).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def layer_norm(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm over the last axis with affine (galois_norm + repeat/mul/add,
    main.rs:1880-1887). Accumulates moments in f32 regardless of input dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * w + b).astype(x.dtype)


def gelu(x: jnp.ndarray, impl: str = "erf") -> jnp.ndarray:
    """GELU. impl='erf' matches openai/whisper & HF exactly; impl='tanh' is
    ggml's approximation (galois_gelu, main.rs:1775-1779)."""
    return jax.nn.gelu(x, approximate=(impl == "tanh"))


def split_heads(x: jnp.ndarray, n_head: int) -> jnp.ndarray:
    """(..., T, S) -> (..., n_head, T, d_head). The functional version of the
    reference's F16-copy + permute(0,2,1,3) head split (main.rs:1898-1920)."""
    *lead, t, s = x.shape
    x = x.reshape(*lead, t, n_head, s // n_head)
    return jnp.moveaxis(x, -2, -3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(..., n_head, T, d_head) -> (..., T, S) (KQV merge, main.rs:1924-1929)."""
    x = jnp.moveaxis(x, -3, -2)
    *lead, t, h, d = x.shape
    return x.reshape(*lead, t, h * d)


def sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    use_flash: bool | None = None,
    qk_int8: bool = False,
) -> jnp.ndarray:
    """Scaled dot-product attention over head-split tensors.

    q (..., H, Tq, D), k (..., H, Tk, D), v (..., H, Tk, D) -> (..., H, Tq, D).
    ``mask`` is an additive bias broadcastable to (..., H, Tq, Tk) or a boolean
    mask (True = attend). Softmax statistics in f32. ``qk_int8`` applies only
    to the flash path (int8 MXU score dot, W8A8 serving mode).
    """
    if use_flash is None:
        use_flash = False
    if use_flash:
        from .flash_attention import flash_attention

        return flash_attention(q, k, v, mask=mask, qk_int8=qk_int8)
    d = q.shape[-1]
    scale = d ** -0.5
    logits = jnp.einsum(
        "...qd,...kd->...qk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        if mask.dtype == jnp.bool_:
            logits = jnp.where(mask, logits, jnp.float32(-1e30))
        else:
            logits = logits + mask
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("...qk,...kd->...qd", probs, v, preferred_element_type=jnp.float32).astype(q.dtype)


def linear(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None = None) -> jnp.ndarray:
    """x (..., in) @ w(out, in)^T + b. GGML matmul convention: `a` is the
    weight with ggml ne (in, out) = numpy (out, in) (main.rs:1752-1767)."""
    y = jnp.einsum("...i,oi->...o", x, w, preferred_element_type=jnp.float32).astype(x.dtype)
    if b is not None:
        y = y + b
    return y
