"""A/B the greedy SlotEngine device floor across n_slots (and chunk_steps)
in ONE process with alternating blocks (CLAUDE.md timing rules: engine-style
workloads vary 1.5-2x BETWEEN processes; alternate configs within one
process and aggregate >=90 s per block).

Usage: python scripts/ab_engine_slots.py [config ...]
  config = "s48c16" (slots 48, chunk 16), optionally "b32" (admission
  bucket cap), "e" (W8A8 admission encodes), "dg4" (speculative engine,
  gamma 4, draft from AB_DRAFT), "a1280" (static engine audio_ctx; pair
  with AB_SECS=24 so every stream fits the trimmed cross width), and a
  scheduler suffix "-eager" / "-predictive" / "-pipelined" /
  "-overlapped" (default pipelined) — e.g. "s64c16b32e-overlapped".
  Default: s48c16 s64c16 s48c16 s64c16

Each block: build the engine fresh (pools freed between blocks so two
64-slot cross pools never coexist in HBM), warm up one wave, run timed
waves for BLOCK_S seconds, print per-block RTF, then free. Repeats come
from listing a config twice.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BLOCK_S = int(os.environ.get("AB_BLOCK_S", "90"))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from whisper_tpu.config import PRESETS
    from whisper_tpu.decoding.task import DecodingOptions
    from whisper_tpu.model.load import random_model
    from whisper_tpu.model.quant import quantize_decoder_weights
    from whisper_tpu.parallel.engine import SlotEngine

    configs = sys.argv[1:] or ["s48c16", "s64c16", "s48c16", "s64c16"]
    print("devices:", jax.devices(), flush=True)
    model = random_model(PRESETS[os.environ.get("AB_MODEL", "large-v3")],
                         seed=0, dtype=jnp.bfloat16)
    model.params = jax.jit(quantize_decoder_weights)(model.params)
    print("model built", flush=True)

    # prestaged audio (device-resident; floor mode), enough for 2*64 streams.
    # AB_SECS overrides the duration mix (e.g. "24" for an all-short
    # workload — the engine audio_ctx measurement pairs it with "a<ctx>").
    rng = np.random.default_rng(0)
    secs = [float(s) for s in os.environ.get("AB_SECS", "24,27,30").split(",")]
    raw = [np.clip(
        rng.standard_normal(int(16000 * secs[i % len(secs)])) * 0.1 * 32768,
        -32768, 32767).astype(np.int16) for i in range(128)]

    results = {}
    for tag in configs:
        import re

        base, _, sched = tag.partition("-")
        sched = sched or "pipelined"
        m = re.fullmatch(
            r"s(\d+)c(\d+)(?:b(\d+))?(e?)(d?)(?:g(\d+))?(?:a(\d+))?", base)
        if not m:
            raise SystemExit(f"bad config {tag!r}")
        n_slots, chunk = int(m.group(1)), int(m.group(2))
        audio_ctx = int(m.group(7)) if m.group(7) else None
        buckets = None
        if m.group(3):
            cap = int(m.group(3))
            buckets = tuple(b for b in (64, 32, 16, 8, 4, 2, 1) if b <= cap)
        params = model.params
        if m.group(4):  # W8A8 admission encodes
            from whisper_tpu.model.quant import quantize_encoder_weights

            model.params = jax.jit(quantize_encoder_weights)(params)
        n_streams = 2 * n_slots
        audios = [jnp.asarray(a) for a in raw[:n_streams]]
        jax.device_get([a[:1] for a in audios])
        total_audio = sum(int(a.shape[0]) for a in audios) / 16000.0
        kw = dict(n_slots=n_slots, chunk_steps=chunk,
                  options=DecodingOptions(without_timestamps=False),
                  max_new_tokens=64, quantize=True, schedule=sched,
                  admit_buckets=buckets, audio_ctx=audio_ctx)
        if m.group(5):  # 'd': speculative engine with the AB_DRAFT npz
            from whisper_tpu.parallel.spec_engine import SpecSlotEngine

            engine = SpecSlotEngine(
                model, os.environ.get("AB_DRAFT", "draft_large-v3_2l.npz"),
                gamma=int(m.group(6) or os.environ.get("AB_GAMMA", "4")),
                **kw)
        else:
            engine = SlotEngine(model, **kw)
        model.params = params  # undo the per-block W8A8 for later blocks
        print(f"[{tag}] engine built; warming up", flush=True)
        engine.transcribe_many(audios[: n_slots + 16])  # warmup/compile
        print(f"[{tag}] warm", flush=True)
        waves, done = 0, 0.0
        t0 = time.perf_counter()
        while True:
            engine.transcribe_many(audios)
            waves += 1
            done += total_audio
            if time.perf_counter() - t0 >= BLOCK_S:
                break
        wall = time.perf_counter() - t0
        rtf = done / wall
        stats = {k: round(v, 2) if isinstance(v, float) else v
                 for k, v in engine.stats.items()}
        spec = (f" spec={engine.spec_stats()}"
                if hasattr(engine, "spec_stats") else "")
        print(f"[{tag}] rtf={rtf:.1f} waves={waves} wall={wall:.1f}s "
              f"stats={stats}{spec}", flush=True)
        results.setdefault(tag, []).append(rtf)
        del engine, audios  # free pools before the next block
    print("== summary ==")
    for tag, vals in results.items():
        print(f"{tag}: {[round(v, 1) for v in vals]} "
              f"mean={sum(vals) / len(vals):.1f}")


if __name__ == "__main__":
    main()
