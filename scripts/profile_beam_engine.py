#!/usr/bin/env python
"""Bisect the beam-group engine's per-step cost on the real chip (r4 item 1).

Measured question: why does the BeamSlotEngine chunk run ~59 ms/step
(0.94 s pull / 16-step round, 24 groups x k=5 = 120 rows) when the lockstep
beam while_loop runs 23.3 ms/step at MORE rows (b32 k5 = 160)?

Prime suspect: layout. The lockstep loop is one while_loop inside one jit —
XLA carries the cache batch-MINOR and lane_dot_permute's transposed-view
trick elides to bitcasts. The engine chunk is a jit called once per round
with the state DONATED across the boundary: if the boundary pins default
layouts, either (a) the scan carry inside stays default and the lane-dot
transposes MATERIALIZE (full-cache relayout every forked step), or (b) the
carry goes batch-minor and the boundary pays 2 full-cache relayouts per
chunk. (a) scales with steps, (b) amortizes with chunk length.

Run (one process, serialized with any other TPU work):
    python scripts/profile_beam_engine.py [quick]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "axon")
cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from whisper_tpu.config import PRESETS
from whisper_tpu.decoding.task import DecodingOptions
from whisper_tpu.model.load import random_model
from whisper_tpu.model.quant import quantize_decoder_weights
from whisper_tpu.parallel.beam_engine import BeamSlotEngine, _decode_chunk_beam
from whisper_tpu.pipeline.transcribe import TranscribeOptions

N_SLOTS = int(os.environ.get("N_SLOTS", "24"))
K = 5
CHUNK = int(os.environ.get("CHUNK", "16"))
MAX_NEW = 64
QUICK = "quick" in sys.argv[1:]


def sync(tree):
    leaves = jax.tree.leaves(tree)
    jax.device_get(leaves[0].ravel()[:4])


def timeit(label, fn, reps=4, inner=1):
    # one untimed call already happened (compile); interleave reps
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn()
        sync(out)
        walls.append((time.perf_counter() - t0) / inner)
    best = min(walls)
    print(f"{label:55s} {best*1000:9.1f} ms  (all: "
          + ", ".join(f"{w*1000:.1f}" for w in walls) + ")", flush=True)
    return best


def main():
    print("devices:", jax.devices(), flush=True)
    model = random_model(PRESETS["large-v3"], seed=0, dtype=jnp.bfloat16)
    model.params = jax.jit(quantize_decoder_weights)(model.params)

    rng = np.random.default_rng(0)
    secs = [24.0, 27.0, 30.0]
    audios = [
        jnp.asarray(np.clip(rng.standard_normal(int(16000 * secs[i % 3]))
                            * 0.1 * 32768, -32768, 32767).astype(np.int16))
        for i in range(N_SLOTS)
    ]
    jax.device_get([a[:1] for a in audios])

    engine = BeamSlotEngine(
        model, n_slots=N_SLOTS, chunk_steps=CHUNK,
        options=DecodingOptions(without_timestamps=False, beam_size=K),
        max_new_tokens=MAX_NEW, quantize=True)
    print(f"pool_ctx={engine.pool_ctx} max_new={engine.max_new} "
          f"rows={(N_SLOTS+1)*K}", flush=True)

    if "hlo" in sys.argv[1:]:
        engine._admit_many(list(range(N_SLOTS)), audios)
        return hlo_only(engine)

    # --- wave phase split (prestaged audio: engine stats) ---
    t0 = time.perf_counter()
    engine.transcribe_many(audios)  # compile + fill
    print(f"first wave (compiles): {time.perf_counter()-t0:.1f}s", flush=True)
    for i in range(2 if QUICK else 3):
        t0 = time.perf_counter()
        engine.transcribe_many(audios)
        wall = time.perf_counter() - t0
        rtf = sum(len(a) for a in audios) / 16000.0 / wall
        print(f"wave {i}: wall {wall:.2f}s rtf {rtf:.1f}x stats "
              f"{ {k: round(v, 2) if isinstance(v, float) else v for k, v in engine.stats.items()} }",
              flush=True)

    # --- standalone chunk timing on a freshly admitted state ---
    # admit all 24 groups, then time the chunk program in isolation
    engine._admit_many(list(range(N_SLOTS)), audios)
    topts = TranscribeOptions(beam_size=K)

    def prod_chunk():
        engine._state = _decode_chunk_beam(
            engine.params, engine._state,
            engine._cross_pool_k, engine._cross_pool_v,
            engine.sup_mask, engine.blank_mask, engine.cfg,
            steps=CHUNK, k=K, use_timestamps=True,
            max_initial_index=engine.max_initial_index)
        return engine._state.n_past

    prod_chunk()  # compile (cached from the wave)
    per_chunk = timeit(f"production _decode_chunk_beam ({CHUNK} steps)",
                       prod_chunk, reps=3 if QUICK else 5)
    print(f"  -> {per_chunk/CHUNK*1000:.1f} ms/step", flush=True)

    # NOTE: after ~4 chunks all rows pass max_new and freeze (no more cow
    # forks, n_past stops) — re-admit to keep steps representative.
    engine._admit_many(list(range(N_SLOTS)), audios)
    per_chunk2 = timeit("same, freshly re-admitted", prod_chunk,
                        reps=3 if QUICK else 5)
    print(f"  -> {per_chunk2/CHUNK*1000:.1f} ms/step", flush=True)

    hlo_only(engine)


def hlo_only(engine):
    # --- HLO layout check: what layout does the chunk carry the cache in? ---
    lowered = _decode_chunk_beam.lower(
        engine.params, engine._state,
        engine._cross_pool_k, engine._cross_pool_v,
        engine.sup_mask, engine.blank_mask, engine.cfg,
        steps=CHUNK, k=K, use_timestamps=True,
        max_initial_index=engine.max_initial_index)
    txt = lowered.compile().as_text()
    import re
    for name, leaf in (("codes", jax.tree.leaves(engine._state.cache_k)[0]),
                       ("scale", jax.tree.leaves(engine._state.cache_k)[-1])):
        kind = {1: "s8", 2: "bf16", 4: "f32"}[leaf.dtype.itemsize]
        shape_str = kind + "[" + ",".join(str(s) for s in leaf.shape) + "]"
        pats = sorted(set(re.findall(
            re.escape(shape_str) + r"\{[0-9,]+\}", txt)))
        print(f"cache_k.{name} {shape_str} layouts in compiled HLO:",
              flush=True)
        for p in pats[:12]:
            print(f"  {p}  x{txt.count(p)}", flush=True)
        bigcopy = len(re.findall(r"copy[^\n]*" + re.escape(shape_str), txt))
        print(f"  copies mentioning this shape: {bigcopy}", flush=True)
    ncopy = len(re.findall(r"= [a-z0-9\[\],{}]+ copy\(", txt))
    print(f"copy instructions total: {ncopy}", flush=True)
    with open("/tmp/beam_chunk_hlo.txt", "w") as f:
        f.write(txt)
    print("full HLO -> /tmp/beam_chunk_hlo.txt", flush=True)


if __name__ == "__main__":
    main()
