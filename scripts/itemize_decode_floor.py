#!/usr/bin/env python
"""Itemize the fixed per-step decode cost (VERDICT r3 item 5).

The beam/greedy decode floor (~20-23 ms/step) bounds every serving path.
Decompose it empirically: time a 16-step jitted decode scan while varying
one axis at a time — layer count (slope = per-layer cost, intercept = fixed
overhead incl. logits+rules), row count (bandwidth share), cross width
(cross-read share), and with the rules/top-k/bookkeeping replaced by
argmax-free passthrough. One process, interleaved reps.

Run: python scripts/itemize_decode_floor.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if __name__ == "__main__":
    jax.config.update("jax_platforms", "axon")
    _cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import dataclasses

import jax.numpy as jnp
import numpy as np

from whisper_tpu.config import PRESETS
from whisper_tpu.decoding.device_loop import LoopState, _apply_rules_device, build_masks
from whisper_tpu.io.vocab import device_special_ids
from whisper_tpu.model.decoder import KVCache, decode_step
from whisper_tpu.model.load import random_model
from whisper_tpu.model.quant import init_quant_cache, quantize_decoder_weights

STEPS = 16
CTX = 104


def slice_layers(params, n):
    dec = dict(params["decoder"])
    dec["blocks"] = jax.tree.map(lambda a: a[:n], dec["blocks"])
    return {"encoder": params["encoder"], "decoder": dec}


@functools.partial(jax.jit, static_argnames=("cfg", "mode"), donate_argnums=(1,))
def loop(params, cache, cross_k, cross_v, sup, blank, tok0, cfg, mode):
    eot, beg, not_, _ = device_special_ids(cfg.n_vocab)
    B = tok0.shape[0]

    def body(carry, _):
        cache, tok, n_past, logits = carry
        if mode == "full":
            st = LoopState(cache_k=None, cache_v=None, tokens_out=None,
                           last_tok=tok, prev_tok=tok, last_ts=tok,
                           finished=None, length=None, sum_logprobs=None,
                           key=None)
            filt = _apply_rules_device(
                logits, n_past, st, sup, blank, (eot, beg, not_, cfg.n_vocab),
                True, 50)
            nxt = jnp.argmax(filt, -1).astype(jnp.int32)
        elif mode == "norules":
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
        else:  # "nologitsuse": sever the logits->token dep (constant token)
            nxt = tok
        lg, cache = decode_step(params, nxt[:, None], n_past,
                                KVCache(cache[0], cache[1]), cross_k,
                                cross_v, cfg)
        return ((cache.k, cache.v), nxt, n_past + 1,
                lg[:, 0].astype(jnp.float32)), None

    lg0 = jnp.zeros((B, cfg.n_vocab), jnp.float32)
    carry, _ = jax.lax.scan(
        body, ((cache.k, cache.v), tok0, jnp.full((B,), 8, jnp.int32), lg0),
        None, length=STEPS)
    return carry[2]


def main():
    print("devices:", jax.devices(), flush=True)
    cfg0 = PRESETS["large-v3"]
    model = random_model(cfg0, seed=0, dtype=jnp.bfloat16)
    model.params = jax.jit(quantize_decoder_weights)(model.params)
    sup, blank = build_masks(model.vocab)
    L_all, H, D = cfg0.n_text_layer, cfg0.n_text_head, cfg0.d_head_text

    def make(B, L, Ta, mode):
        cfg = dataclasses.replace(cfg0, n_text_layer=L)
        params = slice_layers(model.params, L)
        cache = KVCache(*init_quant_cache(cfg, B, ctx=CTX))
        key = jax.random.PRNGKey(0)
        ck = jnp.zeros((L, B, H, D, Ta), jnp.int8)
        cs = jnp.ones((L, B, H, Ta), jnp.float32)
        from whisper_tpu.model.quant import QuantKV
        cross_k = QuantKV(ck, cs)
        cross_v = QuantKV(jnp.zeros_like(ck), jnp.ones_like(cs))
        tok0 = jnp.zeros((B,), jnp.int32)
        return params, cache, cross_k, cross_v, tok0, cfg

    cases = [
        ("base B125 L32 Ta1500 full", (125, 32, 1500, "full")),
        ("L16", (125, 16, 1500, "full")),
        ("L8", (125, 8, 1500, "full")),
        ("B64", (64, 32, 1500, "full")),
        ("B32", (32, 32, 1500, "full")),
        ("Ta512", (125, 32, 512, "full")),
        ("Ta128", (125, 32, 128, "full")),
        ("norules", (125, 32, 1500, "norules")),
        ("notoken (no logits consumer)", (125, 32, 1500, "nologitsuse")),
    ]
    made = {}
    for name, spec in cases:
        made[name] = make(*spec)
        t0 = time.perf_counter()
        p, c, ck, cv, t, cfg = made[name]
        out = loop(p, c, ck, cv, sup, blank, t, cfg, spec[3])
        jax.device_get(out.ravel()[:4])
        made[name] = (p, None, ck, cv, t, cfg, spec)  # cache donated; rebuild per rep
        print(f"compile {name}: {time.perf_counter()-t0:.1f}s", flush=True)

    results = {n: [] for n, _ in cases}
    for rep in range(3):
        for name, spec in cases:
            p, _, ck, cv, t, cfg, _ = made[name]
            cache = KVCache(*init_quant_cache(cfg, spec[0], ctx=CTX))
            jax.device_get(cache.k.data.ravel()[:4])
            t0 = time.perf_counter()
            out = loop(p, cache, ck, cv, sup, blank, t, cfg, spec[3])
            jax.device_get(out.ravel()[:4])
            results[name].append((time.perf_counter() - t0) / STEPS)
    print()
    for name, _ in cases:
        best = min(results[name]) * 1000
        print(f"{name:32s} {best:7.2f} ms/step   all: "
              + ", ".join(f"{w*1000:.2f}" for w in results[name]), flush=True)


if __name__ == "__main__":
    main()
