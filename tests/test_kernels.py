"""Pallas kernel tests (interpreter mode on the CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_tpu.kernels.flash_attention import flash_attention
from whisper_tpu.kernels.ops import sdpa


@pytest.mark.parametrize("tq,tk,causal", [(256, 256, False), (1500, 1500, False),
                                          (448, 448, True), (100, 300, False)])
def test_flash_attention_matches_sdpa(tq, tk, causal):
    rng = np.random.default_rng(0)
    B, H, D = 1, 2, 64
    q = jnp.asarray(rng.standard_normal((B, H, tq, D)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, tk, D)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, tk, D)), dtype=jnp.float32)
    out = flash_attention(q, k, v, causal=causal, interpret=True)
    if causal:
        cm = jnp.tril(jnp.ones((tq, tk), dtype=bool))
        ref = sdpa(q, k, v, mask=cm)
    else:
        ref = sdpa(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_flash_in_encoder_matches_xla():
    from whisper_tpu.model.encoder import encode
    from whisper_tpu.model.params import params_from_ggml
    from fixtures import micro_config, random_tensors

    cfg = micro_config()
    tensors = random_tensors(cfg, seed=2)
    params = jax.tree.map(jnp.asarray, params_from_ggml(tensors, cfg))
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, cfg.n_mels, 2 * cfg.n_audio_ctx)),
        dtype=jnp.float32,
    )
    ref = encode(params, mel, cfg, use_flash=False)
    out = encode(params, mel, cfg, use_flash=True)
    np.testing.assert_allclose(
        np.asarray(out.hidden), np.asarray(ref.hidden), atol=5e-4
    )


def test_cross_attention_int8_kernel_matches_xla():
    """Pallas int8 cross-attention (interpret mode) vs the XLA reference path
    (quant.qk_logits/pv_out) — same math, on-chip temporaries only."""
    import numpy as np
    import jax.numpy as jnp

    from whisper_tpu.kernels.cross_attention_int8 import cross_attention_int8
    from whisper_tpu.model.quant import QuantKV, _quantize_one, qk_logits, pv_out

    rng = np.random.default_rng(3)
    B, H, T, D, C = 2, 3, 1, 64, 300
    q = jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, D, C)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, D, C)).astype(np.float32))
    kq, vq = _quantize_one(k), _quantize_one(v)

    logits = qk_logits(q, kq)
    probs = jax.nn.softmax(logits, axis=-1)
    ref = pv_out(probs, vq, jnp.float32)

    out = cross_attention_int8(q, kq.data, kq.scale, vq.data, vq.scale,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-2)


def test_cross_attention_int8_kernel_multi_query():
    """T>1 (prefill / beam fold) with non-128-multiple C padding."""
    import numpy as np
    import jax.numpy as jnp

    from whisper_tpu.kernels.cross_attention_int8 import cross_attention_int8
    from whisper_tpu.model.quant import _quantize_one, qk_logits, pv_out

    rng = np.random.default_rng(4)
    B, H, T, D, C = 1, 2, 20, 64, 130
    q = jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, D, C)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, D, C)).astype(np.float32))
    kq, vq = _quantize_one(k), _quantize_one(v)
    ref = pv_out(jax.nn.softmax(qk_logits(q, kq), axis=-1), vq, jnp.float32)
    out = cross_attention_int8(q, kq.data, kq.scale, vq.data, vq.scale,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-2)
