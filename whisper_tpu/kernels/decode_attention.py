"""Pallas decode-step attention over the HBM-resident KV cache.

Hypothesis this kernel tested: the XLA formulation of per-layer cached
attention (`dynamic_index_in_dim` on the full (L,B,H,D,C) cache, then einsum)
materializes the layer slice, so DMA-ing the tile straight from HBM
(scalar-prefetched layer index, one DMA per batch row) should win.

MEASURED RESULT (TPU v5e, large-v3 b24 shapes): the kernel is correct (tested
vs the XLA path to bf16 tolerance) but ~1.7x SLOWER per layer than XLA
(0.70 ms vs 0.41 ms isolated) — XLA fuses the dynamic slice into the
attention well enough that the hand-rolled DMA + single-core grid overhead
loses. Kept as tested infrastructure for future decode-kernel work (e.g.
int8 cache tiles or fused self+cross blocks), NOT wired into the decode path.

    grid (B,); scalar-prefetch: [layer, n_past]
    q (B,H,T,D) VMEM  x  cache[layer,b] (H,D,C) DMA  ->  out (B,H,T,D)

C (cache context) must be 128-aligned — init_cache pads accordingly.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cached_attn_kernel(
    idx_ref,          # scalar prefetch: [layer, n_past]
    q_ref,            # (1, H, T, D) VMEM
    k_hbm,            # (L, B, H, D, C) ANY/HBM
    v_hbm,
    o_ref,            # (1, H, T, D) VMEM
    k_tile,           # (H, D, C) VMEM scratch
    v_tile,
    sem,              # DMA semaphores (2,)
    *,
    scale: float,
):
    layer = idx_ref[0]
    n_past = idx_ref[1]
    b = pl.program_id(0)

    # One big DMA per batch row (all heads): fewer, larger transfers — a
    # per-(b,h) grid serializes hundreds of tiny programs on the single core.
    ck = pltpu.make_async_copy(k_hbm.at[layer, b], k_tile, sem.at[0])
    cv = pltpu.make_async_copy(v_hbm.at[layer, b], v_tile, sem.at[1])
    ck.start()
    cv.start()

    q = q_ref[0].astype(jnp.float32) * scale              # (H, T, D)
    ck.wait()
    k = k_tile[:].astype(jnp.float32)                      # (H, D, C)
    s = jax.lax.dot_general(
        q, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )                                                      # (H, T, C)
    H, T, C = s.shape
    key_pos = jax.lax.broadcasted_iota(jnp.int32, (H, T, C), 2)
    q_pos = n_past + jax.lax.broadcasted_iota(jnp.int32, (H, T, C), 1)
    s = jnp.where(key_pos <= q_pos, s, -1e30)
    m = jnp.max(s, axis=2, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=2, keepdims=True)
    cv.wait()
    v = v_tile[:].astype(jnp.float32)                      # (H, D, C)
    o = jax.lax.dot_general(
        p, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )                                                      # (H, T, D)
    o_ref[0] = o.astype(o_ref.dtype)


def cached_attention(
    q: jnp.ndarray,        # (B, H, T, D)
    cache_k: jnp.ndarray,  # (L, B, H, D, C)
    cache_v: jnp.ndarray,
    layer,                 # traced scalar
    n_past,                # traced scalar
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """softmax(q k^T / sqrt(D) + causal(n_past)) v for ONE layer of the cache,
    reading the layer tile straight out of the full HBM buffer."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, T, D = q.shape
    L, _, _, _, C = cache_k.shape
    idx = jnp.stack([jnp.asarray(layer, jnp.int32), jnp.asarray(n_past, jnp.int32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, T, D), lambda b, idx: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, H, T, D), lambda b, idx: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((H, D, C), cache_k.dtype),
            pltpu.VMEM((H, D, C), cache_v.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_cached_attn_kernel, scale=D ** -0.5),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, T, D), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * T * C * D * 2,
            bytes_accessed=B * H * (2 * D * C * cache_k.dtype.itemsize + 2 * T * D * 4),
            transcendentals=B * H * T * C,
        ),
    )(idx, q, cache_k, cache_v)
