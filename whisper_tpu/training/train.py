"""Training: teacher-forced loss + sharded train step (fine-tuning support).

The reference is inference-only; a production framework needs fine-tuning and
the multi-chip dryrun exercises exactly this path: full forward (encoder +
teacher-forced decoder), cross-entropy, grads, optax adamw update — jitted
over a (dp, tp) mesh with the sharding rules from parallel.sharding.
"""

from __future__ import annotations


from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import WhisperConfig
from ..kernels.ops import gelu, layer_norm, linear, merge_heads, sdpa, split_heads
from ..model.decoder import _kvmajor_sdpa
from ..model.encoder import encode


def decoder_forward_train(params, tokens, cross_k, cross_v, cfg: WhisperConfig):
    """Teacher-forced decoder over a full token sequence (no KV cache append;
    keys/values computed in place — the training-shaped sibling of
    model.decoder.decode_step)."""
    dec = params["decoder"]
    B, T = tokens.shape
    x = dec["te"][tokens].astype(dec["pe"].dtype) + dec["pe"][:T][None]
    h = cfg.n_text_head
    d = cfg.d_head_text
    causal = jnp.tril(jnp.ones((T, T), dtype=bool))
    # Causal flash kernel (custom VJP: Pallas forward, exact XLA backward)
    # on single-chip TPU; XLA sdpa under meshes (pallas_call has no SPMD
    # partitioning rules) and on CPU.
    import jax.sharding as _js

    use_flash = (
        jax.default_backend() == "tpu" and _js.get_abstract_mesh().empty
    )

    def body(carry, xs):
        x = carry
        blk, xk, xv = xs
        y = layer_norm(x, blk["attn_ln_w"], blk["attn_ln_b"])
        q = split_heads(linear(y, blk["q_w"], blk["q_b"]), h)
        k = split_heads(linear(y, blk["k_w"]), h)
        v = split_heads(linear(y, blk["v_w"], blk["v_b"]), h)
        if use_flash:
            from ..kernels.flash_attention import flash_sdpa

            o = flash_sdpa(q, k, v, True)
        else:
            o = sdpa(q, k, v, mask=causal)
        x = x + linear(merge_heads(o), blk["out_w"], blk["out_b"])
        y = layer_norm(x, blk["cross_attn_ln_w"], blk["cross_attn_ln_b"])
        qc = split_heads(linear(y, blk["cross_q_w"], blk["cross_q_b"]), h)
        # xk (B,H,D,Ta) kv-major, pre-scaled by d^-0.25 (encoder); scale q by
        # the other d^-0.25 for the standard 1/sqrt(d) product.
        Ta = xk.shape[-1]
        full = jnp.ones((x.shape[1], Ta), dtype=bool)
        o = _kvmajor_sdpa(qc * (d ** -0.25), xk, xv, full, 1.0)
        x = x + linear(merge_heads(o), blk["cross_out_w"], blk["cross_out_b"])
        y = layer_norm(x, blk["mlp_ln_w"], blk["mlp_ln_b"])
        y = gelu(linear(y, blk["mlp0_w"], blk["mlp0_b"]), cfg.gelu_impl)
        x = x + linear(y, blk["mlp1_w"], blk["mlp1_b"])
        return x, None

    x, _ = jax.lax.scan(body, x, (dec["blocks"], cross_k, cross_v))
    x = layer_norm(x, dec["ln_w"], dec["ln_b"])
    logits = jnp.einsum(
        "bts,vs->btv", x, dec["te"].astype(x.dtype), preferred_element_type=jnp.float32
    )
    return logits


def loss_fn(params, mel, tokens, token_mask, cfg: WhisperConfig):
    """Next-token cross entropy. mel (B, n_mels, 2*ctx), tokens (B, T)."""
    enc_out = encode(params, mel, cfg)
    logits = decoder_forward_train(params, tokens[:, :-1], enc_out.cross_k, enc_out.cross_v, cfg)
    targets = tokens[:, 1:]
    mask = token_mask[:, 1:].astype(jnp.float32)
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, targets)
    return (ce * mask).sum() / jnp.maximum(mask.sum(), 1.0)


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def make_optimizer(lr: float = 1e-4, weight_decay: float = 0.01):
    return optax.adamw(lr, weight_decay=weight_decay)


def make_train_step(cfg: WhisperConfig, optimizer):
    @jax.jit
    def train_step(state: TrainState, mel, tokens, token_mask):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, mel, tokens, token_mask, cfg)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state, step=state.step + 1), loss

    return train_step


def init_train_state(params, optimizer) -> TrainState:
    return TrainState(params=params, opt_state=optimizer.init(params), step=jnp.int32(0))
