"""Parameter pytree: layout, GGML <-> pytree conversion, random init.

The reference holds weights in per-layer structs (``WhisperLayerEncoder`` /
``WhisperLayerDecoder`` / ``WhisperModel``, /root/reference/src/main.rs:661-806).
Here each per-layer tensor is *stacked* along a leading layer axis so the
transformer blocks run under a single ``lax.scan`` — one compiled block
regardless of depth, which is the XLA-friendly shape for both compile time
and sharding (the layer axis never crosses chips; head/mlp axes do).

Linear weights keep the GGML/torch (out, in) convention; matmuls contract as
``x @ w.T``. Conv biases stored (n_state, 1) in the file are squeezed.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ..config import WhisperConfig

Params = Dict[str, Any]

# (pytree field -> ggml name suffix) for one encoder block (main.rs:1065-1136).
_ENC_BLOCK = {
    "attn_ln_w": "attn_ln.weight",
    "attn_ln_b": "attn_ln.bias",
    "q_w": "attn.query.weight",
    "q_b": "attn.query.bias",
    "k_w": "attn.key.weight",
    "v_w": "attn.value.weight",
    "v_b": "attn.value.bias",
    "out_w": "attn.out.weight",
    "out_b": "attn.out.bias",
    "mlp_ln_w": "mlp_ln.weight",
    "mlp_ln_b": "mlp_ln.bias",
    "mlp0_w": "mlp.0.weight",
    "mlp0_b": "mlp.0.bias",
    "mlp1_w": "mlp.2.weight",
    "mlp1_b": "mlp.2.bias",
}

# One decoder block adds cross-attention (main.rs:1238-1333).
_DEC_BLOCK = dict(
    _ENC_BLOCK,
    **{
        "cross_attn_ln_w": "cross_attn_ln.weight",
        "cross_attn_ln_b": "cross_attn_ln.bias",
        "cross_q_w": "cross_attn.query.weight",
        "cross_q_b": "cross_attn.query.bias",
        "cross_k_w": "cross_attn.key.weight",
        "cross_v_w": "cross_attn.value.weight",
        "cross_v_b": "cross_attn.value.bias",
        "cross_out_w": "cross_attn.out.weight",
        "cross_out_b": "cross_attn.out.bias",
    },
)


def _stack(tensors: Dict[str, np.ndarray], prefix: str, n_layer: int,
           block_map: Dict[str, str], dtype) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for field, suffix in block_map.items():
        out[field] = np.stack(
            [tensors[f"{prefix}.{i}.{suffix}"].astype(dtype) for i in range(n_layer)]
        )
    return out


def params_from_ggml(tensors: Dict[str, np.ndarray], config: WhisperConfig,
                     dtype=np.float32) -> Params:
    """Assemble the named GGML tensors into the model pytree (numpy)."""
    c = config
    g = {k: v for k, v in tensors.items()}

    def t(name):
        return g[name].astype(dtype)

    params: Params = {
        "encoder": {
            "pe": t("encoder.positional_embedding"),
            "conv1_w": t("encoder.conv1.weight"),
            "conv1_b": t("encoder.conv1.bias").reshape(-1),
            "conv2_w": t("encoder.conv2.weight"),
            "conv2_b": t("encoder.conv2.bias").reshape(-1),
            "ln_post_w": t("encoder.ln_post.weight"),
            "ln_post_b": t("encoder.ln_post.bias"),
            "blocks": _stack(g, "encoder.blocks", c.n_audio_layer, _ENC_BLOCK, dtype),
        },
        "decoder": {
            "pe": t("decoder.positional_embedding"),
            "te": t("decoder.token_embedding.weight"),
            "ln_w": t("decoder.ln.weight"),
            "ln_b": t("decoder.ln.bias"),
            "blocks": _stack(g, "decoder.blocks", c.n_text_layer, _DEC_BLOCK, dtype),
        },
    }
    return params


def params_to_ggml(params: Params, config: WhisperConfig) -> Dict[str, np.ndarray]:
    """Inverse of params_from_ggml (for checkpoint re-export and round-trip tests)."""
    c = config
    out: Dict[str, np.ndarray] = {
        "encoder.positional_embedding": np.asarray(params["encoder"]["pe"]),
        "encoder.conv1.weight": np.asarray(params["encoder"]["conv1_w"]),
        "encoder.conv1.bias": np.asarray(params["encoder"]["conv1_b"]).reshape(-1, 1),
        "encoder.conv2.weight": np.asarray(params["encoder"]["conv2_w"]),
        "encoder.conv2.bias": np.asarray(params["encoder"]["conv2_b"]).reshape(-1, 1),
        "encoder.ln_post.weight": np.asarray(params["encoder"]["ln_post_w"]),
        "encoder.ln_post.bias": np.asarray(params["encoder"]["ln_post_b"]),
        "decoder.positional_embedding": np.asarray(params["decoder"]["pe"]),
        "decoder.token_embedding.weight": np.asarray(params["decoder"]["te"]),
        "decoder.ln.weight": np.asarray(params["decoder"]["ln_w"]),
        "decoder.ln.bias": np.asarray(params["decoder"]["ln_b"]),
    }
    for prefix, n_layer, block_map, blocks in (
        ("encoder.blocks", c.n_audio_layer, _ENC_BLOCK, params["encoder"]["blocks"]),
        ("decoder.blocks", c.n_text_layer, _DEC_BLOCK, params["decoder"]["blocks"]),
    ):
        for field, suffix in block_map.items():
            stacked = np.asarray(blocks[field])
            for i in range(n_layer):
                out[f"{prefix}.{i}.{suffix}"] = stacked[i]
    return out


def random_params_device(config: WhisperConfig, seed: int = 0, scale: float = 0.02,
                         dtype=None) -> Params:
    """Random pytree generated directly in device memory (jitted jax.random) —
    avoids multi-GB host->device staging for big-model benchmarks."""
    import functools

    import jax
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.float32
    c = config

    def build():
        key = [jax.random.PRNGKey(seed)]

        def rnd(*shape):
            key[0], sub = jax.random.split(key[0])
            return scale * jax.random.normal(sub, shape, dtype)

        def ones(*shape):
            return jnp.ones(shape, dtype)

        def zeros(*shape):
            return jnp.zeros(shape, dtype)

        a, t, v, m = c.n_audio_state, c.n_text_state, c.n_vocab, c.n_mels
        La, Lt = c.n_audio_layer, c.n_text_layer

        def enc_blocks():
            return {
                "attn_ln_w": ones(La, a), "attn_ln_b": zeros(La, a),
                "q_w": rnd(La, a, a), "q_b": zeros(La, a),
                "k_w": rnd(La, a, a),
                "v_w": rnd(La, a, a), "v_b": zeros(La, a),
                "out_w": rnd(La, a, a), "out_b": zeros(La, a),
                "mlp_ln_w": ones(La, a), "mlp_ln_b": zeros(La, a),
                "mlp0_w": rnd(La, 4 * a, a), "mlp0_b": zeros(La, 4 * a),
                "mlp1_w": rnd(La, a, 4 * a), "mlp1_b": zeros(La, a),
            }

        def dec_blocks():
            return {
                "attn_ln_w": ones(Lt, t), "attn_ln_b": zeros(Lt, t),
                "q_w": rnd(Lt, t, t), "q_b": zeros(Lt, t),
                "k_w": rnd(Lt, t, t),
                "v_w": rnd(Lt, t, t), "v_b": zeros(Lt, t),
                "out_w": rnd(Lt, t, t), "out_b": zeros(Lt, t),
                "mlp_ln_w": ones(Lt, t), "mlp_ln_b": zeros(Lt, t),
                "mlp0_w": rnd(Lt, 4 * t, t), "mlp0_b": zeros(Lt, 4 * t),
                "mlp1_w": rnd(Lt, t, 4 * t), "mlp1_b": zeros(Lt, t),
                "cross_attn_ln_w": ones(Lt, t), "cross_attn_ln_b": zeros(Lt, t),
                "cross_q_w": rnd(Lt, t, t), "cross_q_b": zeros(Lt, t),
                "cross_k_w": rnd(Lt, t, t),
                "cross_v_w": rnd(Lt, t, t), "cross_v_b": zeros(Lt, t),
                "cross_out_w": rnd(Lt, t, t), "cross_out_b": zeros(Lt, t),
            }

        return {
            "encoder": {
                "pe": rnd(c.n_audio_ctx, a),
                "conv1_w": rnd(a, m, 3), "conv1_b": zeros(a),
                "conv2_w": rnd(a, a, 3), "conv2_b": zeros(a),
                "ln_post_w": ones(a), "ln_post_b": zeros(a),
                "blocks": enc_blocks(),
            },
            "decoder": {
                "pe": rnd(c.n_text_ctx, t),
                "te": rnd(v, t),
                "ln_w": ones(t), "ln_b": zeros(t),
                "blocks": dec_blocks(),
            },
        }

    return jax.jit(build)()


def random_params(config: WhisperConfig, seed: int = 0, scale: float = 0.02,
                  dtype=np.float32) -> Params:
    """Random-weight pytree for tests/benchmarks (no checkpoint needed)."""
    from ..io.ggml import tensor_schema

    rng = np.random.default_rng(seed)
    tensors = {}
    for name, (shape, _kind) in tensor_schema(config).items():
        if name.endswith("_ln.weight") or name.endswith("ln.weight") or name.endswith("ln_post.weight"):
            arr = np.ones(shape, dtype=np.float32)
        elif name.endswith(".bias") or name.endswith("ln.bias"):
            arr = np.zeros(shape, dtype=np.float32)
        else:
            arr = rng.standard_normal(shape).astype(np.float32) * scale
        tensors[name] = arr
    return params_from_ggml(tensors, config, dtype=dtype)
