#!/usr/bin/env python
"""Diagnose SpecSlotEngine free-run acceptance vs the draft's teacher-forced
acceptance (0.984 held-out vs ~0.1 observed in the engine A/B).

Three engines on the same held-out engine-domain noise:
  a) self-draft, bf16, quantize=False  — machinery ceiling (must be ~1.0)
  b) trained draft, int8 target, timestamps ON  (the A/B config)
  c) trained draft, int8 target, timestamps OFF (is it the ts rules?)

Prints accepted/(rounds*(gamma-1)) per engine plus a transcript-agreement
check of (b) against the labels the draft was trained on.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if __name__ == "__main__":
    jax.config.update("jax_platforms", os.environ.get("DIAG_PLATFORM", "axon"))
    _cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from whisper_tpu.config import PRESETS
from whisper_tpu.decoding.task import DecodingOptions
from whisper_tpu.model.load import random_model
from whisper_tpu.model.quant import quantize_decoder_weights
from whisper_tpu.parallel.engine import SlotEngine
from whisper_tpu.parallel.spec_engine import SpecSlotEngine

GAMMA = int(os.environ.get("DIAG_GAMMA", "4"))
N = 16


def noise_rows(seed):
    r = np.random.default_rng(seed)
    full = r.standard_normal((N, 16000 * 30)).astype(np.float32) * 0.1
    i16 = np.clip(full * 32768, -32768, 32767).astype(np.int16)
    secs = [24.0, 27.0, 30.0]
    rows = []
    for b in range(N):
        row = i16[b].copy()
        row[int(16000 * secs[(seed + b) % 3]):] = 0
        rows.append(row)
    return rows


def run(tag, engine, pcm):
    res = engine.transcribe_many(pcm)
    st = engine.spec_stats()
    rounds, acc = st["rounds"], st["accepted"]
    per = acc / max(rounds * (GAMMA - 1), 1)
    print(f"[{tag}] rounds={rounds} accepted={acc} "
          f"accept_frac={per:.3f}", flush=True)
    return res


def main():
    print("devices:", jax.devices(), flush=True)
    cfg = PRESETS["large-v3"]
    model = random_model(cfg, seed=0, dtype=jnp.bfloat16)
    bf16_params = model.params
    pcm = noise_rows(7000)

    kw = dict(n_slots=N, chunk_steps=16, max_new_tokens=64, gamma=GAMMA)

    # (a) machinery ceiling: draft IS the target, everything bf16 (tiny
    # slot count: the 32L self-draft doubles the bf16 pools)
    eng = SpecSlotEngine(
        model, ({"decoder": bf16_params["decoder"]}, cfg),
        options=DecodingOptions(without_timestamps=False),
        quantize=False, n_slots=4, chunk_steps=16, max_new_tokens=64,
        gamma=GAMMA)
    run("a:self bf16 ts", eng, pcm[:8])
    del eng

    model.params = jax.jit(quantize_decoder_weights)(bf16_params)
    draft = os.environ.get("DIAG_DRAFT", "draft_large-v3_2l.npz")

    # (b) the A/B config
    eng = SpecSlotEngine(
        model, draft, options=DecodingOptions(without_timestamps=False),
        quantize=True, **kw)
    res_b = run("b:draft int8 ts", eng, pcm)
    del eng

    # greedy reference transcripts (the labels' source numerics)
    geng = SlotEngine(model, n_slots=N, chunk_steps=16, max_new_tokens=64,
                      options=DecodingOptions(without_timestamps=False),
                      quantize=True)
    res_g = geng.transcribe_many(pcm)
    agree = sum(a.tokens == b.tokens for a, b in zip(res_g, res_b))
    print(f"spec-vs-greedy transcript identity: {agree}/{N}", flush=True)
    uniq = len({tuple(r.tokens) for r in res_g})
    print(f"greedy unique transcripts: {uniq}/{N}", flush=True)
    del geng

    # (c) timestamps off
    eng = SpecSlotEngine(
        model, draft, options=DecodingOptions(without_timestamps=True),
        quantize=True, **kw)
    run("c:draft int8 nots", eng, pcm)


if __name__ == "__main__":
    main()
