#!/usr/bin/env python
"""CPU determinism check for the beam-chunk cow variants (micro config).

The TPU bisect's cross-check reported prod != take, which should be
semantically impossible (both are leaf[i] <- leaf[src[i]]). Reproduce on CPU
with full-state snapshots to find whether the divergence is semantic or an
artifact of the bisect harness.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
from fixtures import micro_config  # noqa: E402

from whisper_tpu.decoding.task import DecodingOptions  # noqa: E402
from whisper_tpu.model.load import random_model  # noqa: E402
from whisper_tpu.model.quant import quantize_decoder_weights  # noqa: E402
from whisper_tpu.parallel.beam_engine import BeamSlotEngine  # noqa: E402
from bisect_beam_chunk import chunk_variant  # noqa: E402

K = 3
N_SLOTS = 3
CHUNK = 4


def main():
    model = random_model(micro_config(n_vocab=51864), seed=3, on_device=False)
    model.params = jax.jit(quantize_decoder_weights)(model.params)
    rng = np.random.default_rng(0)
    audios = [rng.standard_normal(16000).astype(np.float32) * 0.1
              for _ in range(N_SLOTS)]
    engine = BeamSlotEngine(
        model, n_slots=N_SLOTS, chunk_steps=CHUNK,
        options=DecodingOptions(without_timestamps=False, beam_size=K),
        max_new_tokens=8, quantize=True, use_flash=False)
    engine._admit_many(list(range(N_SLOTS)), audios)
    snap = jax.tree.map(lambda a: np.asarray(a), engine._state)

    outs = {}
    for v in ("prod", "take", "fused"):
        engine._state = jax.tree.map(jnp.asarray, snap)
        for _ in range(2):
            engine._state = chunk_variant(
                engine.params, engine._state,
                engine._cross_pool_k, engine._cross_pool_v,
                engine.sup_mask, engine.blank_mask, cfg=engine.cfg,
                steps=CHUNK, k=K, use_timestamps=True,
                max_initial_index=engine.max_initial_index, variant=v)
        outs[v] = jax.tree.map(lambda a: np.asarray(a), engine._state)

    ref = outs["prod"]
    for v in ("take", "fused"):
        got = outs[v]
        bad = []
        for f in ref._fields:
            a, b = getattr(ref, f), getattr(got, f)
            la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
            if not all(np.array_equal(x, y) for x, y in zip(la, lb)):
                bad.append(f)
        print(f"{v}: " + ("IDENTICAL" if not bad else f"differs in {bad}"))
        if bad and "tokens" in bad:
            dt = (ref.tokens != got.tokens)
            print("  token diffs at", np.argwhere(dt)[:10])
        if bad and "cache_k" in bad:
            for i, (x, y) in enumerate(zip(jax.tree.leaves(ref.cache_k),
                                           jax.tree.leaves(got.cache_k))):
                d = np.argwhere(x != y)
                print(f"  cache_k leaf {i}: {len(d)} mismatched elems; "
                      f"first rows {sorted(set(d[:100, 0].tolist()))[:10]}")


if __name__ == "__main__":
    main()
