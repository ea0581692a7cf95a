"""Throughput benchmark: audio-seconds transcribed per second per chip (RTF).

Measures the production serving path on real shapes: batched 30 s windows
through mel + encoder + a fixed greedy decode budget (64 tokens/window —
typical token count for 30 s of speech). The reference publishes no numbers
(BASELINE.md); the north star is >=100x realtime for large-v3 on one chip.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np


def run_engine_benchmark(
    model_name: str = "large-v3",
    n_slots: int = 48,
    n_streams: Optional[int] = None,
    chunk_steps: int = 16,
    quantize: bool = True,
    max_new_tokens: int = 64,
    seconds: int = 120,
    prestage: bool = False,
    beam_size: Optional[int] = None,
    enc_int8: bool = False,
    max_bucket: Optional[int] = None,
    schedule: Optional[str] = None,
    draft: Optional[str] = None,
    gamma: int = 4,
) -> dict:
    """Continuous-batching serving throughput: a SlotEngine with ``n_slots``
    draining ``n_streams`` independent 30 s streams of staggered lengths
    (24/27/30 s — forces ragged finishes and mid-decode refills).

    ``prestage=True`` puts the PCM on device before the timed run (the
    engine's device-resident admission path): real serving stacks that
    receive audio straight to device memory, and — on this sandbox's
    tunneled chip, whose host->device link is far slower than a production
    PCIe/on-host path — the engine's device floor with the tunnel's upload
    wall taken out of the measurement.

    ``beam_size``: serve with the BeamSlotEngine (a slot = a beam group of
    that width; n_slots stays the group count, so decode rows =
    n_slots * beam_size)."""
    import jax
    import jax.numpy as jnp

    from ..config import PRESETS
    from ..decoding.task import DecodingOptions
    from ..model.load import random_model
    from ..parallel.engine import SlotEngine

    model = random_model(PRESETS[model_name], seed=0, dtype=jnp.bfloat16)
    if quantize:
        # serving mode: int8 decoder weights alongside the int8 pools
        # (also frees ~1.6 GB of HBM for the slot pools on large-v3)
        from ..model.quant import quantize_decoder_weights

        model.params = jax.jit(quantize_decoder_weights)(model.params)
    if enc_int8:
        # W8A8 admission encodes (engine encode runs per admission bucket,
        # the device-bound phase in prestaged mode)
        from ..model.quant import quantize_encoder_weights

        model.params = jax.jit(quantize_encoder_weights)(model.params)
    n_streams = n_streams or 2 * n_slots
    rng = np.random.default_rng(0)
    secs = [24.0, 27.0, 30.0]
    # int16 PCM, as real serving receives it — the engine ships it to the
    # device raw (2 bytes/sample; host->device bandwidth is the measured
    # admission bottleneck on the tunneled chip) and converts on device.
    audios = [
        np.clip(rng.standard_normal(int(16000 * secs[i % 3])) * 0.1 * 32768,
                -32768, 32767).astype(np.int16)
        for i in range(n_streams)
    ]
    total_audio = sum(len(a) for a in audios) / 16000.0
    if prestage:
        audios = [jnp.asarray(a) for a in audios]
        # block_until_ready is a NO-OP on the axon backend (CLAUDE.md):
        # force every upload to land with one tiny batched fetch so the
        # timed region really starts with device-resident audio.
        jax.device_get([a[:1] for a in audios])
    buckets = None
    if max_bucket:
        buckets = tuple(b for b in (32, 16, 8, 4, 2, 1) if b <= max_bucket)
    sched_kw = {"schedule": schedule} if schedule else {}
    if beam_size:
        from ..parallel.beam_engine import BeamSlotEngine

        engine = BeamSlotEngine(
            model, n_slots=n_slots, chunk_steps=chunk_steps,
            options=DecodingOptions(without_timestamps=False,
                                    beam_size=beam_size),
            max_new_tokens=max_new_tokens, quantize=quantize,
            admit_buckets=buckets, **sched_kw,
        )
    elif draft:
        # speculative continuous batching: gamma-token verify chunks
        # against a trained shared-encoder draft (BENCH_DRAFT=<npz>)
        from ..parallel.spec_engine import SpecSlotEngine

        engine = SpecSlotEngine(
            model, draft, n_slots=n_slots, chunk_steps=chunk_steps,
            options=DecodingOptions(without_timestamps=False),
            max_new_tokens=max_new_tokens, quantize=quantize,
            admit_buckets=buckets, gamma=gamma, **sched_kw,
        )
    else:
        engine = SlotEngine(
            model, n_slots=n_slots, chunk_steps=chunk_steps,
            options=DecodingOptions(without_timestamps=False),
            max_new_tokens=max_new_tokens, quantize=quantize,
            admit_buckets=buckets, **sched_kw,
        )
    # Warmup: compile every admission-bucket shape + chunk + refill by
    # draining a full first wave plus a refill wave (compiles are minutes
    # on a remote chip and must not land in the timed run).
    engine.transcribe_many(audios[: min(len(audios), n_slots + 16)])
    engine._state = None
    engine._cross_pool_k = engine._cross_pool_v = None

    # Timed waves until the budget is spent (engine runs drain a whole
    # queue, so ``seconds`` bounds the number of waves — at least one).
    waves = 0
    audio_done = 0.0
    t0 = time.perf_counter()
    deadline = t0 + seconds
    while True:
        results = engine.transcribe_many(audios)
        waves += 1
        audio_done += total_audio
        if time.perf_counter() >= deadline:
            break
    wall = time.perf_counter() - t0
    rtf = audio_done / wall
    detail = {
        "model": model.config.model_type,
        "n_slots": n_slots,
        "n_streams": n_streams,
        "chunk_steps": chunk_steps,
        "quantize": quantize,
        "prestage": prestage,
        "beam_size": beam_size,
        "schedule": schedule or "overlapped",
        "wall_s": round(wall, 2),
        "waves": waves,
        "n_results": sum(r is not None for r in results),
        "stats": {k: round(v, 2) if isinstance(v, float) else v
                  for k, v in engine.stats.items()},
        "backend": jax.default_backend(),
    }
    if draft:
        detail["gamma"] = gamma
        detail["spec"] = engine.spec_stats()
    return {
        "metric": f"rtf_{model.config.model_type}_engine_s{n_slots}_q{n_streams}"
        + (f"_beam{beam_size}" if beam_size else "")
        + (f"_spec_g{gamma}" if draft else "")
        + ("_int8" if quantize else "") + ("_eint8" if enc_int8 else "")
        + ("_prestaged" if prestage else ""),
        "value": round(rtf, 2),
        "unit": "audio_sec/sec/chip",
        "vs_baseline": round(rtf / 100.0, 3),
        "detail": detail,
    }


def make_serving_step(model, batch: int, decode_tokens: int,
                      kv_dtype: str, use_flash: bool,
                      beam_size: Optional[int] = None):
    """Build the full serving step ``step(params, audio) -> (tokens,
    lengths)``: mel -> encoder -> fused on-device decode loop, all static
    shapes. Shared by the throughput bench and the AOT export path
    (utils/aot.export_serving_step) so the shippable artifact is exactly
    the benched program. Params are ARGUMENTS (not closure captures): the
    remote-compile service rejects multi-GB baked constants, and jax.export
    needs them abstract."""
    import jax
    import jax.numpy as jnp

    from ..decoding.device_loop import build_masks, decode_segment_device
    from ..frontend.mel import frame_count, log_mel_spectrogram, mel_window
    from ..model.decoder import init_cache
    from ..model.encoder import encode

    cfg = model.config
    vocab = model.vocab
    n_frames = 2 * cfg.n_audio_ctx
    n_samples = 16000 * 30
    sup_mask, blank_mask = build_masks(vocab)
    filters = model.filters
    init = [vocab.token_sot]
    if cfg.is_multilingual:
        init += [vocab.language_token("en"), vocab.token_transcribe]
    init_tokens = jnp.asarray(
        np.tile(np.array(init, np.int32), (batch, 1)))
    seg_ctx = len(init) + decode_tokens + 8

    def step(params, audio):
        mel = log_mel_spectrogram(audio, filters, frame_count(n_samples))
        win = mel_window(mel, 0, n_frames)
        mel_b = jnp.broadcast_to(win[None], (batch, cfg.n_mels, n_frames))
        enc = encode(params, mel_b, cfg, use_flash=use_flash,
                     quantize_kv=(kv_dtype == "int8"))
        cross_k, cross_v = enc.cross_k, enc.cross_v
        if beam_size:
            from ..decoding.device_beam import beam_decode_device

            k = beam_size
            # Exact-size cache: the lane-dot fork copy needs no row
            # alignment, and ctx 75-vs-128 measured 21.4 vs 23.4 ms/step.
            if kv_dtype == "int8":
                from ..model.decoder import KVCache
                from ..model.quant import init_quant_cache

                cache = KVCache(*init_quant_cache(cfg, batch * k,
                                                  ctx=seg_ctx))
            else:
                cache = init_cache(cfg, batch * k, dtype=jnp.bfloat16,
                                   ctx=seg_ctx)
            out = beam_decode_device(
                params, jnp.repeat(init_tokens, k, axis=0), len(init), 0,
                cache, cross_k, cross_v, sup_mask, blank_mask, cfg,
                beam_size=k, sample_len=decode_tokens,
            )
            return out[2], out[5]
        if kv_dtype == "int8":
            from ..model.decoder import KVCache
            from ..model.quant import init_quant_cache

            cache = KVCache(*init_quant_cache(cfg, batch, ctx=seg_ctx))
        else:
            cache = init_cache(cfg, batch, dtype=jnp.bfloat16, ctx=seg_ctx)
        toks, lengths, sum_lp, nosp = decode_segment_device(
            params, init_tokens, len(init), 0, cache,
            cross_k, cross_v, sup_mask, blank_mask, cfg,
            sample_len=decode_tokens, use_timestamps=True,
        )
        return toks, lengths

    return step


def run_benchmark(
    model_path: Optional[str] = None,
    model_name: str = "large-v3",
    seconds: int = 120,
    batch: int = 8,
    dtype: str = "bfloat16",
    decode_tokens: int = 64,
    use_flash: Optional[bool] = None,
    # serving defaults (bench.py and aot.export_serving_step agree):
    # "bfloat16" opts any of the three back into the numerics-parity mode.
    kv_dtype: str = "int8",      # quantized cross memory / KV cache
    weight_dtype: str = "int8",  # quantized decoder weights
    beam_size: Optional[int] = None,  # on-device beam search instead of greedy
    aot_path: Optional[str] = None,  # consume/produce a jax.export artifact
    enc_dtype: str = "int8",     # W8A8 encoder matmuls
) -> dict:
    import os

    import jax
    import jax.numpy as jnp

    from ..config import PRESETS
    from ..model.load import load_model, random_model

    # Refuse oversized (batch, beam, dtype) combinations with a typed error
    # BEFORE allocating weights or compiling (the measured b56 beam crash
    # boundary lives just past the budget — config.check_serving_hbm
    # calibration table).
    from ..config import check_serving_hbm

    def _check(cfg):
        seg_ctx = (3 if cfg.is_multilingual else 1) + decode_tokens + 8
        check_serving_hbm(
            cfg, batch, beam=beam_size or 1, ctx=seg_ctx,
            kv_dtype_bytes=1 if kv_dtype == "int8" else 2,
            what=(f"run_benchmark(batch={batch}, beam={beam_size}, "
                  f"kv={kv_dtype})"))

    jdtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    if model_path:
        model = load_model(model_path, dtype=jdtype)
    else:
        _check(PRESETS[model_name])
        model = random_model(PRESETS[model_name], seed=0, dtype=jdtype)
    cfg = model.config
    if model_path:
        _check(cfg)

    if use_flash is None:
        use_flash = jax.default_backend() == "tpu"

    if weight_dtype == "int8":
        from ..model.quant import quantize_decoder_weights

        model.params = jax.jit(quantize_decoder_weights)(model.params)
    if enc_dtype == "int8":
        from ..model.quant import quantize_encoder_weights

        model.params = jax.jit(quantize_encoder_weights)(model.params)
    # fused QKV: two fewer fusions/layer on the per-layer sequencing floor
    # (quantize FIRST — per-out-channel scales then concatenate exactly)
    from ..model.quant import fuse_decoder_qkv

    model.params = fuse_decoder_qkv(model.params)

    rng = np.random.default_rng(0)
    window_sec = 30.0
    audio = jnp.asarray(
        rng.standard_normal(16000 * 30).astype(np.float32) * 0.1)

    # The artifact's call signature (params, audio) is identical across
    # configs, so a stale artifact would run silently mislabeled — compare
    # the flag tuple it was exported with and recompile on mismatch.
    aot_meta = {
        "kind": "serving_step", "model": cfg.model_type, "batch": batch,
        "decode_tokens": decode_tokens, "kv_dtype": kv_dtype,
        "weight_dtype": weight_dtype, "enc_dtype": enc_dtype,
        "use_flash": bool(use_flash), "beam_size": beam_size,
    }
    aot_mode = None
    step = None
    if aot_path and os.path.exists(aot_path):
        # Shippable cold-start artifact (utils/aot.py): the pre-lowered
        # StableHLO of this exact step — skips tracing + XLA optimization of
        # the traced program; only StableHLO->executable compilation remains.
        from . import aot

        meta = aot.load_meta(aot_path)
        if meta == aot_meta:
            step = aot.load(aot_path)
            aot_mode = "loaded"
        elif meta is None:  # legacy raw payload: cannot verify the flags
            step = aot.load(aot_path)
            aot_mode = "loaded-unverified"
        else:
            aot_mode = "stale-ignored"
    if step is None:
        step = jax.jit(make_serving_step(
            model, batch, decode_tokens, kv_dtype, use_flash, beam_size))

    def one_batch():
        toks, lengths = step(model.params, audio)
        return np.asarray(toks), np.asarray(lengths)

    # Warmup (compile).
    t0 = time.perf_counter()
    one_batch()
    compile_time = time.perf_counter() - t0

    if aot_path and aot_mode in (None, "stale-ignored"):
        from . import aot

        aot.save(aot_path, make_serving_step(
            model, batch, decode_tokens, kv_dtype, use_flash, beam_size),
            model.params, audio, meta=aot_meta)
        aot_mode = "re-exported" if aot_mode == "stale-ignored" else "exported"

    # Timed runs until the budget is spent.
    iters = 0
    t0 = time.perf_counter()
    deadline = t0 + max(5.0, seconds - compile_time)
    while time.perf_counter() < deadline:
        one_batch()
        iters += 1
    wall = time.perf_counter() - t0
    audio_sec = iters * batch * window_sec
    rtf = audio_sec / wall if wall > 0 else 0.0

    return {
        "metric": f"rtf_{cfg.model_type}_b{batch}_"
        + (f"beam{beam_size}x" if beam_size else "greedy")
        + f"{decode_tokens}"
        + ("_kvint8" if kv_dtype == "int8" else "")
        + ("_wint8" if weight_dtype == "int8" else "")
        + ("_eint8" if enc_dtype == "int8" else ""),
        "value": round(rtf, 2),
        "unit": "audio_sec/sec/chip",
        "vs_baseline": round(rtf / 100.0, 3),
        "detail": {
            "model": cfg.model_type,
            "batch": batch,
            "dtype": dtype,
            "kv_dtype": kv_dtype,
            "weight_dtype": weight_dtype,
            "enc_dtype": enc_dtype,
            "decode_tokens": decode_tokens,
            "iters": iters,
            "wall_s": round(wall, 2),
            "compile_s": round(compile_time, 1),
            "aot": aot_mode,
            "use_flash": bool(use_flash),
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
        },
    }


def run_speculative_benchmark(
    model_name: str = "large-v3",
    batch: int = 8,
    gamma: int = 4,
    draft: str = "self",       # "self" (upper bound) | "distil2" (2-layer)
    seconds: int = 120,
    decode_tokens: int = 64,
) -> dict:
    """A/B the fused speculative loop against the plain greedy device loop
    on identical windows, interleaved in one process (the axon variance
    rule). Three synthetic drafts: ``prefix2`` (target layers >= 2 zeroed
    into compute-priced no-ops, 2-layer prefix drafts — acceptance exactly
    1.0 with a genuinely cheap draft: the TRUE mechanical upper bound),
    ``self`` (draft == target: acceptance 1.0 but full-priced draft), and
    ``distil2`` (random 2-layer draft sharing the target's frozen encoder,
    distil-whisper style: acceptance ~0, the worst-case overhead bound).
    Real draft checkpoints land between prefix2 and distil2."""
    import dataclasses
    import time

    import jax
    import jax.numpy as jnp

    from ..config import PRESETS
    from ..decoding.device_loop import build_masks, decode_segment_device
    from ..decoding.device_speculative import (
        decode_segment_speculative_device)
    from ..frontend.mel import frame_count, log_mel_spectrogram, mel_window
    from ..model.decoder import init_cache
    from ..model.encoder import encode
    from ..model.load import random_model

    import os as _os

    cfg = PRESETS[model_name]
    model = random_model(cfg, seed=0, dtype=jnp.bfloat16)
    if draft == "self":
        dmodel, dcfg = model, cfg
    elif draft.endswith(".npz") or _os.path.exists(draft):
        # a TRAINED draft from training/distill.save_draft (e.g.
        # scripts/distill_draft.py): shares the target's encoder, cross
        # memory projected from the target's hidden state (the distil2
        # serving topology, but with real acceptance)
        from ..training.distill import load_draft

        dparams, dcfg = load_draft(draft, model.params, cfg,
                                   dtype=jnp.bfloat16)
        dmodel = dataclasses.replace(model, config=dcfg, params=dparams)
        draft = _os.path.basename(draft).rsplit(".", 1)[0]
    elif draft == "distil2":
        dcfg = dataclasses.replace(cfg, n_text_layer=2)
        dmodel = random_model(dcfg, seed=7, dtype=jnp.bfloat16)
    elif draft == "prefix2":
        # TRUE upper bound with realistic costs: zero the residual-branch
        # output projections of target decoder layers >= 2 (the layers
        # become compute-priced no-ops), and use the 2-layer prefix as the
        # draft — identical predictions, so acceptance is exactly 1.0 while
        # the target still pays full-depth matmul time.
        dcfg = dataclasses.replace(cfg, n_text_layer=2)
        p = jax.tree.map(lambda a: a, model.params)  # shallow copy
        blocks = dict(p["decoder"]["blocks"])
        for k in ("out_w", "out_b", "mlp1_w", "mlp1_b",
                  "cross_out_w", "cross_out_b"):
            blocks[k] = blocks[k].at[2:].set(0)
        p["decoder"] = dict(p["decoder"], blocks=blocks)
        model.params = p
        dblocks = {k: v[:2] for k, v in blocks.items()}
        dparams = {"encoder": p["encoder"],
                   "decoder": dict(p["decoder"], blocks=dblocks)}
        dmodel = dataclasses.replace(model, config=dcfg, params=dparams)
    else:
        raise ValueError(f"unknown draft {draft!r}")

    vocab = model.vocab
    use_flash = jax.default_backend() == "tpu"
    sup, blank = build_masks(vocab)
    init = [vocab.token_sot]
    if cfg.is_multilingual:
        init += [vocab.language_token("en"), vocab.token_transcribe]
    init_tokens = jnp.asarray(np.tile(np.array(init, np.int32), (batch, 1)))
    ctx = len(init) + decode_tokens + gamma + 8
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal(16000 * 30).astype(np.float32) * 0.1)
    n_frames = 2 * cfg.n_audio_ctx

    @jax.jit
    def greedy_step(params, audio):
        mel = log_mel_spectrogram(audio, model.filters,
                                  frame_count(16000 * 30))
        win = mel_window(mel, 0, n_frames)
        mel_b = jnp.broadcast_to(win[None], (batch, cfg.n_mels, n_frames))
        enc = encode(params, mel_b, cfg, use_flash=use_flash)
        toks, lengths, _, _ = decode_segment_device(
            params, init_tokens, len(init), 0,
            init_cache(cfg, batch, dtype=jnp.bfloat16, ctx=ctx),
            enc.cross_k, enc.cross_v, sup, blank, cfg,
            sample_len=decode_tokens)
        return toks, lengths

    @jax.jit
    def spec_step(params_t, params_d, audio):
        mel = log_mel_spectrogram(audio, model.filters,
                                  frame_count(16000 * 30))
        win = mel_window(mel, 0, n_frames)
        mel_b = jnp.broadcast_to(win[None], (batch, cfg.n_mels, n_frames))
        enc_t = encode(params_t, mel_b, cfg, use_flash=use_flash)
        if draft == "self":
            ck_d, cv_d = enc_t.cross_k, enc_t.cross_v
        elif draft == "prefix2":
            # same encoder + same layer-0/1 cross projections: slice
            ck_d, cv_d = enc_t.cross_k[:2], enc_t.cross_v[:2]
        else:
            # distil-style draft: real distil drafts keep the target's
            # FROZEN encoder and differ only in the decoder, so the draft
            # cross memory projects from the TARGET's hidden state — no
            # second encoder forward (which would dominate the overhead
            # bound with a cost no real draft pays).
            from ..model.encoder import cross_kv_from_hidden

            ck_d, cv_d = cross_kv_from_hidden(params_d, enc_t.hidden, dcfg)
        toks, lengths, _, _, rounds, accepted = (
            decode_segment_speculative_device(
                params_t, params_d, init_tokens, len(init), 0,
                init_cache(cfg, batch, dtype=jnp.bfloat16, ctx=ctx),
                init_cache(dcfg, batch, dtype=jnp.bfloat16, ctx=ctx),
                enc_t.cross_k, enc_t.cross_v, ck_d, cv_d,
                sup, blank, cfg, dcfg, sample_len=decode_tokens,
                gamma=gamma))
        return toks, lengths, rounds, accepted

    def pull(x):  # axon: block_until_ready is a no-op; fetch a few elements
        return np.asarray(x.ravel()[:4])

    t0 = time.perf_counter()
    g = greedy_step(model.params, audio); pull(g[0])
    s = spec_step(model.params, dmodel.params, audio); pull(s[0])
    compile_s = time.perf_counter() - t0
    rounds, accepted = int(s[2]), int(s[3])

    walls = {"greedy": 0.0, "spec": 0.0}
    iters = 0
    deadline = time.perf_counter() + max(5.0, seconds - compile_s)
    while time.perf_counter() < deadline:
        t = time.perf_counter()
        g = greedy_step(model.params, audio); pull(g[0])
        walls["greedy"] += time.perf_counter() - t
        t = time.perf_counter()
        s = spec_step(model.params, dmodel.params, audio); pull(s[0])
        walls["spec"] += time.perf_counter() - t
        iters += 1

    audio_done = iters * batch * 30.0
    rtf_spec = audio_done / walls["spec"]
    rtf_greedy = audio_done / walls["greedy"]
    emitted = int(np.asarray(g[1]).sum()) + batch
    return {
        "metric": f"rtf_{cfg.model_type}_spec_b{batch}_g{gamma}_{draft}",
        "value": round(rtf_spec, 2),
        "unit": "audio_sec/sec/chip",
        "vs_baseline": round(rtf_spec / 100.0, 3),
        "detail": {
            "model": cfg.model_type, "draft": draft, "batch": batch,
            "gamma": gamma, "iters": iters,
            "rtf_greedy_same_process": round(rtf_greedy, 2),
            "speedup_vs_greedy": round(rtf_spec / rtf_greedy, 3),
            "rounds": rounds, "accepted": accepted,
            "accepted_per_row_round": round(
                accepted / max(rounds * batch, 1), 2),  # max = gamma-1
            "tokens_emitted": emitted,
            "compile_s": round(compile_s, 1),
            "backend": jax.default_backend(),
        },
    }
