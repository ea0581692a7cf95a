#!/usr/bin/env python
"""Can the BEAM decode floor amortize steps gamma-at-a-time? (VERDICT r4
item 6 — the decision probe for a spec-style multi-token beam verify.)

The greedy spec win comes from one target forward emitting up to gamma
tokens: the ~10 ms/step row-independent layer-scan cost and the per-forward
cross read amortize over the block. A beam analogue (draft proposes, beam
scores gamma positions per scan pass) only makes sense if a (B, gamma)
block forward at beam-engine row counts is MUCH cheaper than gamma T=1
steps — this probe measures exactly that upper bound, before any of the
beam-verify machinery (per-position top-k, fork bookkeeping, rejected-row
redundancy) eats into it.

Times a jitted scan emitting 16 token-positions as T=1 x16, T=4 x4,
T=8 x2 at the beam engine's shapes (rows folded over group-shared cross)
and the lockstep beam shape. Per-emitted-token ratios < ~0.6 would justify
building the verify pass; ~1.0 means the MXU already pays per token at
these widths and the idea is dead on arrival.

Run (TPU, serialized): python scripts/beam_gamma_probe.py
"""

import dataclasses
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if __name__ == "__main__":
    jax.config.update("jax_platforms", os.environ.get("PROBE_PLATFORM", "axon"))
    _cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from whisper_tpu.config import PRESETS
from whisper_tpu.model.decoder import KVCache, decode_step
from whisper_tpu.model.load import random_model
from whisper_tpu.model.quant import (QuantKV, init_quant_cache,
                                     quantize_decoder_weights)

TOKENS = 16   # emitted positions per timed call
CTX = 104


@functools.partial(jax.jit, static_argnames=("cfg", "t_width"),
                   donate_argnums=(1,))
def loop(params, cache, cross_k, cross_v, tok0, cfg, t_width: int):
    """Emit TOKENS positions as TOKENS//t_width forwards of width t_width.
    The fed block is derived from the previous iteration's logits (argmax
    broadcast across the block) so the full compute chain stays live."""
    B = tok0.shape[0]

    def body(carry, _):
        cache, tok, n_past, logits = carry
        nxt = jnp.argmax(logits, -1).astype(jnp.int32)          # (B,)
        block = jnp.broadcast_to(nxt[:, None], (B, t_width))
        lg, cache = decode_step(params, block, n_past,
                                KVCache(cache[0], cache[1]), cross_k,
                                cross_v, cfg)
        return ((cache.k, cache.v), nxt, n_past + t_width,
                lg[:, -1].astype(jnp.float32)), None

    lg0 = jnp.zeros((B, cfg.n_vocab), jnp.float32)
    carry, _ = jax.lax.scan(
        body, ((cache.k, cache.v), tok0, jnp.full((B,), 8, jnp.int32), lg0),
        None, length=TOKENS // t_width)
    return carry[2], carry[1], carry[3][:, :8]


def main():
    print("devices:", jax.devices(), flush=True)
    cfg = PRESETS["large-v3"]
    model = random_model(cfg, seed=0, dtype=jnp.bfloat16)
    params = jax.jit(quantize_decoder_weights)(model.params)
    H, D, L = cfg.n_text_head, cfg.d_head_text, cfg.n_text_layer

    def make(B, Bc):
        cache = KVCache(*init_quant_cache(cfg, B, ctx=CTX + TOKENS))
        ck = jnp.zeros((L, Bc, H, D, 1500), jnp.int8)
        cs = jnp.ones((L, Bc, H, 1500), jnp.float32)
        cross_k = QuantKV(ck, cs)
        cross_v = QuantKV(jnp.zeros_like(ck), jnp.ones_like(cs))
        return cache, cross_k, cross_v, jnp.zeros((B,), jnp.int32)

    shapes = [("beam-engine 33gx5", 165, 33),
              ("lockstep-beam 48gx5", 240, 48),
              ("greedy-engine s64", 65, 65)]
    widths = [1, 4, 8]
    results = {}
    for name, B, Bc in shapes:
        cache, ck, cv, tok0 = make(B, Bc)
        per_tok = {}
        for t in widths:
            t0 = time.perf_counter()
            out = loop(params, cache, ck, cv, tok0, cfg, t)
            jax.device_get(out[2].ravel()[:4])
            compile_s = time.perf_counter() - t0
            walls = []
            for _ in range(4):
                cache = KVCache(*init_quant_cache(cfg, B, ctx=CTX + TOKENS))
                jax.device_get(cache.k.data.ravel()[:4])
                t1 = time.perf_counter()
                out = loop(params, cache, ck, cv, tok0, cfg, t)
                jax.device_get(out[2].ravel()[:4])
                walls.append((time.perf_counter() - t1) / TOKENS)
            per_tok[t] = min(walls)
            print(f"{name:22s} T={t}  {min(walls)*1000:6.2f} ms/token "
                  f"(compile {compile_s:.0f}s; all: "
                  + ", ".join(f"{w*1000:.2f}" for w in walls) + ")",
                  flush=True)
        for t in widths[1:]:
            print(f"{name:22s} T={t} per-token ratio vs T=1: "
                  f"{per_tok[t] / per_tok[1]:.3f}", flush=True)
        results[name] = per_tok
        del cache, ck, cv, out


if __name__ == "__main__":
    main()
