"""Pallas cached-attention kernel vs the XLA decode path (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_tpu.kernels.decode_attention import cached_attention
from whisper_tpu.model.decoder import _kvmajor_sdpa


@pytest.mark.parametrize("T,n_past", [(1, 0), (1, 37), (8, 100)])
def test_cached_attention_matches_xla(T, n_past):
    rng = np.random.default_rng(0)
    B, H, D, C, L = 2, 4, 64, 128, 3
    q = jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32))
    ck = jnp.asarray(rng.standard_normal((L, B, H, D, C)).astype(np.float32))
    cv = jnp.asarray(rng.standard_normal((L, B, H, D, C)).astype(np.float32))
    layer = 1
    out = cached_attention(q, ck, cv, layer, n_past, interpret=True)
    key_pos = jnp.arange(C)[None, :]
    q_pos = n_past + jnp.arange(T)[:, None]
    ref = _kvmajor_sdpa(q, ck[layer], cv[layer], key_pos <= q_pos, D ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_padded_cache_context():
    """pad_ctx rounds to a 128 multiple (kernel requirement); default exact."""
    from whisper_tpu.model.decoder import init_cache
    from fixtures import micro_config

    cfg = micro_config()  # n_text_ctx=96
    assert init_cache(cfg, 2).k.shape[-1] == 96
    assert init_cache(cfg, 2, pad_ctx=True).k.shape[-1] == 128
