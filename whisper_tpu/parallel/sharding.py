"""Parameter and activation sharding rules (Megatron-style tensor parallel).

Per-block layout (weights are (layer, out, in) stacked):

  * q/k/v projections: shard OUT (= heads*d_head) over tp — each chip owns a
    head slice, attention is fully local per head;
  * attention out-proj and mlp.2: shard IN over tp — the contraction is
    partial-summed and XLA inserts the psum (reduce-scatter+all-gather under
    dp as needed);
  * mlp.0: shard OUT (4*state) over tp;
  * embeddings / layernorms / biases on sharded-out dims follow their weight;
  * token embedding: shard vocab over tp — the logits matmul becomes a local
    slice + all-gather (cheaper than replicating a 51865*d matrix per chip).

Batch ("dp") shards the leading batch axis of activations, KV caches, and mel.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def param_pspecs(config=None) -> Dict[str, Any]:
    """PartitionSpec pytree matching the params pytree structure."""
    enc_blocks = {
        "attn_ln_w": P(None, None),
        "attn_ln_b": P(None, None),
        "q_w": P(None, "tp", None),
        "q_b": P(None, "tp"),
        "k_w": P(None, "tp", None),
        "v_w": P(None, "tp", None),
        "v_b": P(None, "tp"),
        "out_w": P(None, None, "tp"),
        "out_b": P(None, None),
        "mlp_ln_w": P(None, None),
        "mlp_ln_b": P(None, None),
        "mlp0_w": P(None, "tp", None),
        "mlp0_b": P(None, "tp"),
        "mlp1_w": P(None, None, "tp"),
        "mlp1_b": P(None, None),
    }
    dec_blocks = dict(
        enc_blocks,
        **{
            "cross_attn_ln_w": P(None, None),
            "cross_attn_ln_b": P(None, None),
            "cross_q_w": P(None, "tp", None),
            "cross_q_b": P(None, "tp"),
            "cross_k_w": P(None, "tp", None),
            "cross_v_w": P(None, "tp", None),
            "cross_v_b": P(None, "tp"),
            "cross_out_w": P(None, None, "tp"),
            "cross_out_b": P(None, None),
        },
    )
    return {
        "encoder": {
            "pe": P(None, None),
            "conv1_w": P("tp", None, None),
            "conv1_b": P("tp"),
            "conv2_w": P("tp", None, None),
            "conv2_b": P("tp"),
            "ln_post_w": P(None),
            "ln_post_b": P(None),
            "blocks": enc_blocks,
        },
        "decoder": {
            "pe": P(None, None),
            "te": P("tp", None),
            "ln_w": P(None),
            "ln_b": P(None),
            "blocks": dec_blocks,
        },
    }


def _augment_specs(params, specs):
    """Extend the static spec tree to cover int8-quantized param trees.

    model.quant.quantize_{decoder,encoder}_weights add per-out-channel
    ``<name>_scale`` leaves next to each quantized weight. A scale's shape
    is its weight's shape minus the trailing (contraction) axis, so its
    spec is the weight's spec minus the last entry — e.g. q_w (L, O, I)
    P(None, "tp", None) -> q_w_scale (L, O) P(None, "tp"); te (V, D)
    P("tp", None) -> te_scale (V,) P("tp")."""
    if not isinstance(params, dict):
        return specs
    out = {}
    for key, val in params.items():
        if key in specs:
            out[key] = _augment_specs(val, specs[key])
        elif key.endswith("_scale") and key[: -len("_scale")] in specs:
            base = specs[key[: -len("_scale")]]
            out[key] = P(*tuple(base)[:-1])
        else:
            raise KeyError(f"no partition spec for param {key!r}")
    return out


def shard_params(params, mesh: Mesh):
    """Place the params pytree with tensor-parallel shardings. Works under a
    multi-process (multi-host) mesh too: there each process materializes
    only its addressable shards via the callback constructor — plain
    device_put cannot target non-addressable devices. Accepts both plain
    and int8-quantized (``*_scale``-bearing) param trees."""
    import numpy as np

    specs = _augment_specs(params, param_pspecs())
    multi = jax.process_count() > 1

    def put(arr, spec):
        sharding = NamedSharding(mesh, spec)
        if not multi:
            return jax.device_put(arr, sharding)
        a = np.asarray(arr)
        return jax.make_array_from_callback(
            a.shape, sharding, lambda idx, a=a: a[idx])

    return jax.tree.map(put, params, specs, is_leaf=lambda x: isinstance(x, P))


def batch_pspec() -> P:
    """Activations / mel / tokens: shard batch over dp."""
    return P("dp")


def cache_pspec() -> P:
    """Self-attn KV cache (B, L, H, D, C): batch over dp, heads over tp."""
    return P("dp", None, "tp", None, None)


def cross_pspec() -> P:
    """Cross K/V (L, B, H, D, Ta): batch over dp, heads over tp."""
    return P(None, "dp", "tp", None, None)


def _constrain(x, spec5: P, spec4: P):
    mesh = jax.sharding.get_abstract_mesh()
    if mesh.empty or not {"dp", "tp"} <= set(mesh.axis_names):
        return x

    def one(arr):
        spec = spec5 if arr.ndim == 5 else spec4
        return jax.lax.with_sharding_constraint(arr, NamedSharding(mesh, spec))

    return jax.tree.map(one, x)


def constrain_cache(x):
    """Pin a batch-leading (B, L, H, D, C)-or-(B, L, H, C) self-attn cache
    (or QuantKV) to the dp/tp layout when tracing under a (dp, tp) mesh
    context; no-op otherwise. Called from model/decoder.decode_step so
    sharded decode never relies on XLA's propagation for multi-GB buffers."""
    return _constrain(x, P("dp", None, "tp", None, None), P("dp", None, "tp", None))


def constrain_cross(x):
    """Pin a layer-leading (L, B, H, D, Ta)-or-(L, B, H, Ta) cross memory
    (or QuantKV) to the dp/tp layout under a (dp, tp) mesh; see
    constrain_cache."""
    return _constrain(x, P(None, "dp", "tp", None, None), P(None, "dp", "tp", None))
