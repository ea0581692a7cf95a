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
    # Return something that depends on the FULL compute chain: the final
    # logits live through every step's cache append -> attention -> logits.
    # (Returning only n_past lets XLA dead-code-eliminate the entire
    # decoder — first version of this harness measured a "2 ms/step
    # decoder" that was just the counter loop.)
    return carry[2], carry[1], carry[3][:, :8]


def main():
    print("devices:", jax.devices(), flush=True)
    cfg0 = PRESETS["large-v3"]
    model = random_model(cfg0, seed=0, dtype=jnp.bfloat16)
    model.params = jax.jit(quantize_decoder_weights)(model.params)
    sup, blank = build_masks(model.vocab)
    L_all, H, D = cfg0.n_text_layer, cfg0.n_text_head, cfg0.d_head_text

    def make(B, Bc, L, Ta, mode):
        """B decode rows over Bc cross rows (Bc<B = the beam engine's
        group-folded cross; Bc==B = greedy/lockstep)."""
        cfg = dataclasses.replace(cfg0, n_text_layer=L)
        params = slice_layers(model.params, L)
        cache = KVCache(*init_quant_cache(cfg, B, ctx=CTX))
        ck = jnp.zeros((L, Bc, H, D, Ta), jnp.int8)
        cs = jnp.ones((L, Bc, H, Ta), jnp.float32)
        from whisper_tpu.model.quant import QuantKV
        cross_k = QuantKV(ck, cs)
        cross_v = QuantKV(jnp.zeros_like(ck), jnp.ones_like(cs))
        tok0 = jnp.zeros((B,), jnp.int32)
        return params, cache, cross_k, cross_v, tok0, cfg

    cases = [
        ("greedy B49 L32 Ta1500 full", (49, 49, 32, 1500, "full")),
        ("  L16", (49, 49, 16, 1500, "full")),
        ("  L8", (49, 49, 8, 1500, "full")),
        ("  B25", (25, 25, 32, 1500, "full")),
        ("  Ta512", (49, 49, 32, 512, "full")),
        ("  norules", (49, 49, 32, 1500, "norules")),
        ("  notoken (no logits consumer)", (49, 49, 32, 1500, "nologitsuse")),
        ("lockstep-shape B64", (64, 64, 32, 1500, "full")),
        ("beam-engine rows B125 Bc25", (125, 25, 32, 1500, "norules")),
    ]
    # One case at a time: 9 simultaneous (L,B,H,D,1500) cross pairs OOM the
    # chip. Pure-device loops measured rock-stable (<1% spread) run-to-run,
    # so sequential cases stay comparable; 4 reps each, best-of.
    for name, spec in cases:
        p, cache, ck, cv, t, cfg = make(*spec)
        t0 = time.perf_counter()
        out = loop(p, cache, ck, cv, sup, blank, t, cfg, spec[3])
        jax.device_get(out[2].ravel()[:4])
        compile_s = time.perf_counter() - t0
        walls = []
        for rep in range(4):
            cache = KVCache(*init_quant_cache(cfg, spec[0], ctx=CTX))
            jax.device_get(cache.k.data.ravel()[:4])
            t0 = time.perf_counter()
            out = loop(p, cache, ck, cv, sup, blank, t, cfg, spec[3])
            jax.device_get(out[2].ravel()[:4])
            walls.append((time.perf_counter() - t0) / STEPS)
        print(f"{name:32s} {min(walls)*1000:7.2f} ms/step   "
              f"(compile {compile_s:.0f}s; all: "
              + ", ".join(f"{w*1000:.2f}" for w in walls) + ")", flush=True)
        del p, cache, ck, cv, out


if __name__ == "__main__":
    main()
