#!/usr/bin/env python
"""Bisect the beam-engine chunk's 60 ms/step (vs lockstep 23.3) on-chip.

HLO finding (scripts/profile_beam_engine.py hlo): the chunk's scan carries
the int8 cache in DEFAULT layout {3,2,4,1,0} (batch MAJOR — row-contiguous),
not the batch-minor {0,3,2,4,1} the lockstep while_loop carries. So
lane_dot_permute's transposed view MATERIALIZES: every forked step pays 4
full-cache relayout copies (~25M cycles each in the compiled HLO). With a
batch-major carry the natural row permute is a plain axis-0 gather.

Variants (same state shapes, one process, interleaved):
  prod      production _decode_chunk_beam (cond + lane_dot)
  identity  cow branch removed entirely (WRONG results; floor)
  take      cond + jnp.take(leaf, src, axis=0)
  fused     decode_step(permute_rows=copy_src) every step, no cond
  fusedcond cond between decode_step-with-permute and decode_step-plain
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if __name__ == "__main__":  # importable without claiming the TPU
    jax.config.update("jax_platforms", "axon")
    _cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from whisper_tpu.config import PRESETS, WhisperConfig
from whisper_tpu.decoding.device_beam import beam_update, cow_assign
from whisper_tpu.decoding.device_loop import LoopState, _apply_rules_device
from whisper_tpu.decoding.task import DecodingOptions
from whisper_tpu.io.vocab import device_special_ids
from whisper_tpu.model.decoder import KVCache, decode_step
from whisper_tpu.model.load import random_model
from whisper_tpu.model.quant import quantize_decoder_weights
from whisper_tpu.parallel.beam_engine import BeamEngineState, _decode_chunk_beam
from whisper_tpu.parallel.beam_engine import BeamSlotEngine

N_SLOTS = int(os.environ.get("SLOTS", "24"))
K = 5
CHUNK = 16
MAX_NEW = int(os.environ.get("MAX_NEW", "64"))  # 88 -> pool_ctx 128 (cowk)


def _chunk_body(params, state, cross_k, cross_v, sup_mask, blank_mask,
                cfg: WhisperConfig, steps: int, k: int,
                use_timestamps: bool, max_initial_index, variant: str):
    v = cfg.n_vocab
    eot, beg, not_, _nosp = device_special_ids(v)
    S = state.active.shape[0]
    Sk = S * k
    base = (jnp.arange(S, dtype=jnp.int32) * k)[:, None]

    from whisper_tpu.parallel.beam_engine import _bu_group

    def body(st, _):
        rule_state = LoopState(
            cache_k=None, cache_v=None, tokens_out=None,
            last_tok=st.last_tok, prev_tok=st.prev_tok, last_ts=st.last_ts,
            finished=None, length=None, sum_logprobs=None, key=None,
        )
        step_rows = jnp.repeat(st.step, k)
        filt = _apply_rules_device(
            st.logits, step_rows, rule_state, sup_mask, blank_mask,
            (eot, beg, not_, v), use_timestamps, max_initial_index,
        )
        logprobs = jax.nn.log_softmax(filt, axis=-1)
        top_lp_p, top_ids_p = jax.lax.top_k(logprobs, k + 1)
        top_lp = top_lp_p[st.phys].reshape(S, k, k + 1)
        top_ids = top_ids_p[st.phys].reshape(S, k, k + 1)

        (new_sum_lp, new_tok, new_src, tokens_new,
         fin_t, fin_s, fin_l, fin_c) = jax.vmap(
            _bu_group, in_axes=(0,) * 9 + (None, None))(
            top_lp, top_ids, st.sum_lp, st.tokens,
            st.fin_tokens, st.fin_scores, st.fin_len, st.fin_count,
            st.step, k, eot)

        act = st.active
        actk = jnp.repeat(act, k)
        new_sum_lp = jnp.where(act[:, None], new_sum_lp, st.sum_lp)
        tokens_new = jnp.where(act[:, None, None], tokens_new, st.tokens)
        fin_t = jnp.where(act[:, None, None], fin_t, st.fin_tokens)
        fin_s = jnp.where(act[:, None], fin_s, st.fin_scores)
        fin_l = jnp.where(act[:, None], fin_l, st.fin_len)
        fin_c = jnp.where(act, fin_c, st.fin_count)
        ident_src = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32)[None], (S, k))
        new_src = jnp.where(act[:, None], new_src, ident_src)

        phys_l = st.phys.reshape(S, k) - base
        new_phys_l, copy_src_l = cow_assign(phys_l, new_src, k)
        new_phys = (new_phys_l + base).reshape(Sk)
        copy_src = (copy_src_l + base).reshape(Sk)

        nt_flat = jnp.where(actk, new_tok.reshape(Sk), eot)
        nt_phys = jnp.zeros((Sk,), jnp.int32).at[new_phys].set(nt_flat)
        par_last_tok = st.last_tok[copy_src]
        par_last_ts = st.last_ts[copy_src]
        new_last_tok = jnp.where(actk, nt_phys, st.last_tok)
        new_prev_tok = jnp.where(actk, par_last_tok, st.prev_tok)
        new_last_ts = jnp.where(
            actk, jnp.where(nt_phys >= beg, nt_phys, par_last_ts), st.last_ts)

        n_past_rows = jnp.repeat(st.n_past, k)
        is_ident = jnp.all(copy_src == jnp.arange(Sk))

        if variant == "identity":
            cache_k, cache_v = st.cache_k, st.cache_v
        elif variant in ("prod", "prodwhile"):
            def _cow(args):
                from whisper_tpu.kernels.beam_gather import lane_dot_permute
                return lane_dot_permute((args[0], args[1]), args[2])
            cache_k, cache_v = jax.lax.cond(
                is_ident, lambda a: (a[0], a[1]), _cow,
                (st.cache_k, st.cache_v, copy_src))
        elif variant == "take":
            def _cow(args):
                take = lambda t: jax.tree.map(
                    lambda a: jnp.take(a, args[2], axis=0), t)
                return take(args[0]), take(args[1])
            cache_k, cache_v = jax.lax.cond(
                is_ident, lambda a: (a[0], a[1]), _cow,
                (st.cache_k, st.cache_v, copy_src))
        elif variant in ("cowk", "cowku"):
            # In THIS chunk the scan carries the cache in DEFAULT layout
            # (profile_beam_engine.py hlo) — exactly what a Pallas custom
            # call needs, so the aliased sparse-DMA kernel pays no
            # reconciliation here (unlike the lockstep batch-minor carry).
            # Requires a 128-aligned pool (run with MAX_NEW=88 -> ctx 128).
            from whisper_tpu.kernels.beam_gather import cow_copy_rows

            def _cow(args):
                return cow_copy_rows((args[0], args[1]), args[2])
            if variant == "cowku":
                cache_k, cache_v = _cow(
                    (st.cache_k, st.cache_v, copy_src))
            else:
                cache_k, cache_v = jax.lax.cond(
                    is_ident, lambda a: (a[0], a[1]), _cow,
                    (st.cache_k, st.cache_v, copy_src))
        elif variant in ("layerdot", "layerdotcond"):
            # One-hot dot in the carry's NATIVE (layer-major) view — the
            # lane_dot trick re-derived for THIS chunk's {3,2,4,0,1} carry.
            from whisper_tpu.kernels.beam_gather import layer_dot_permute

            def _cow(args):
                return layer_dot_permute((args[0], args[1]), args[2])
            if variant == "layerdot":
                cache_k, cache_v = _cow(
                    (st.cache_k, st.cache_v, copy_src))
            else:
                cache_k, cache_v = jax.lax.cond(
                    is_ident, lambda a: (a[0], a[1]), _cow,
                    (st.cache_k, st.cache_v, copy_src))
        elif variant.startswith("bounded"):
            # Loop-level EXACT bounded row copy: only rows with
            # copy_src != identity move, in while_loop passes of M rows
            # (0 passes when nothing forks). boundedNN sets M=NN.
            from whisper_tpu.parallel.beam_engine import bounded_cow_rows

            m = int(variant[len("bounded"):] or "48")
            cache_k, cache_v, _cnt = bounded_cow_rows(
                st.cache_k, st.cache_v, copy_src, m, Sk - 1)
        elif variant == "span":
            # Loop-level cow over only the first `span` context columns,
            # span bucketed by lax.switch (production helper): forks happen
            # in a group's YOUTH (small n_past), so the gather/writeback
            # touches a fraction of the pool.
            from whisper_tpu.parallel.beam_engine import span_cow

            cache_k, cache_v = span_cow(
                st.cache_k, st.cache_v, copy_src, n_past_rows)
        else:
            cache_k, cache_v = st.cache_k, st.cache_v

        if variant == "scalarnp":
            # WRONG results — floor probe: same shapes with a SCALAR n_past
            # (no per-row pe gather / ragged mask / per-row scatter append).
            # Separates raggedness cost from carry-layout cost in the
            # engine-chunk-vs-lockstep floor gap.
            lg, new_cache = decode_step(
                params, nt_phys[:, None], jnp.int32(48),
                KVCache(cache_k, cache_v), cross_k, cross_v, cfg)
        elif variant == "fuseddefer":
            # production since late r4: fused per-layer permute + DEFERRED
            # appends (one scatter per buffer per step instead of
            # 4 x n_layer ragged scatters)
            lg, new_cache = decode_step(
                params, nt_phys[:, None], n_past_rows,
                KVCache(cache_k, cache_v), cross_k, cross_v, cfg,
                permute_rows=copy_src, defer_append=True)
        elif variant == "plaindefer":
            # WRONG results (no cow): the floor with deferred appends
            lg, new_cache = decode_step(
                params, nt_phys[:, None], n_past_rows,
                KVCache(cache_k, cache_v), cross_k, cross_v, cfg,
                defer_append=True)
        elif variant in ("fused", "fusedwhile"):
            lg, new_cache = decode_step(
                params, nt_phys[:, None], n_past_rows,
                KVCache(cache_k, cache_v), cross_k, cross_v, cfg,
                permute_rows=copy_src)
        elif variant == "fusedcond":
            def with_perm(args):
                return decode_step(params, args[0][:, None], args[1],
                                   KVCache(args[2], args[3]), cross_k,
                                   cross_v, cfg, permute_rows=args[4])
            def no_perm(args):
                return decode_step(params, args[0][:, None], args[1],
                                   KVCache(args[2], args[3]), cross_k,
                                   cross_v, cfg)
            lg, new_cache = jax.lax.cond(
                is_ident, no_perm, with_perm,
                (nt_phys, n_past_rows, cache_k, cache_v, copy_src))
        else:
            lg, new_cache = decode_step(
                params, nt_phys[:, None], n_past_rows,
                KVCache(cache_k, cache_v), cross_k, cross_v, cfg)
        new_step = st.step + jnp.where(act, 1, 0)
        still = act & (new_step < st.max_new_row) & ~(fin_c >= k)
        new = BeamEngineState(
            cache_k=new_cache.k, cache_v=new_cache.v,
            logits=lg[:, 0].astype(jnp.float32),
            phys=new_phys,
            last_tok=new_last_tok, prev_tok=new_prev_tok,
            last_ts=new_last_ts,
            tokens=tokens_new, sum_lp=new_sum_lp,
            fin_tokens=fin_t, fin_scores=fin_s, fin_len=fin_l, fin_count=fin_c,
            n_past=st.n_past + jnp.where(act, 1, 0),
            step=new_step,
            active=still,
            no_speech=st.no_speech,
            max_new_row=st.max_new_row,
        )
        ys = _cnt if variant.startswith("bounded") else None
        return new, ys

    if variant.endswith("while"):
        # lockstep-loop structure: does XLA pick the batch-minor carry (as
        # in decoding/device_beam.beam_decode_device) when the chunk is a
        # while_loop instead of a scan?
        def wbody(carry):
            st, i = carry
            new, _ = body(st, None)
            return (new, i + 1)

        state, _ = jax.lax.while_loop(
            lambda c: c[1] < steps, wbody, (state, jnp.int32(0)))
        return state, jnp.zeros((steps,), jnp.int32)
    state, ys = jax.lax.scan(body, state, None, length=steps)
    if ys is None:
        ys = jnp.zeros((steps,), jnp.int32)
    return state, ys


chunk_variant = jax.jit(
    _chunk_body,
    static_argnames=("cfg", "steps", "k", "use_timestamps",
                     "max_initial_index", "variant"),
    donate_argnames=("state",),
)


# "pinned": the production body ('prod' cow) with the cache pinned at the
# jit BOUNDARY to the batch-minor layout the lockstep while_loop carries —
# codes {0,3,2,4,1} (major_to_minor (1,4,2,3,0)), scales {0,2,3,1}
# ((1,3,2,0)) — so lane_dot_permute's transposed views elide to bitcasts.
def make_pinned(template_state):
    from jax.experimental.layout import Format, Layout

    sh = jax.sharding.SingleDeviceSharding(jax.devices()[0])
    fmt5 = Format(Layout((1, 4, 2, 3, 0)), sh)
    fmt4 = Format(Layout((1, 3, 2, 0)), sh)

    def _fmt(leaf):
        return fmt5 if leaf.ndim == 5 else fmt4

    fmt_state = template_state._replace(
        cache_k=jax.tree.map(_fmt, template_state.cache_k),
        cache_v=jax.tree.map(_fmt, template_state.cache_v),
        logits=None, phys=None, last_tok=None, prev_tok=None, last_ts=None,
        tokens=None, sum_lp=None, fin_tokens=None, fin_scores=None,
        fin_len=None, fin_count=None, n_past=None, step=None, active=None,
        no_speech=None, max_new_row=None)
    # pjit rejects kwargs when in_shardings is given: statics positional.
    jf = jax.jit(
        _chunk_body,
        static_argnums=(6, 7, 8, 9, 10, 11),
        donate_argnums=(1,),
        in_shardings=(None, fmt_state, None, None, None, None),
        out_shardings=(fmt_state, None))

    def pin_state(state):
        put = lambda t: jax.tree.map(
            lambda a: jax.device_put(a, _fmt(a)), t)
        return state._replace(cache_k=put(state.cache_k),
                              cache_v=put(state.cache_v))

    return jf, pin_state


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
    engine._admit_many(list(range(N_SLOTS)), audios)
    print(f"pool_ctx={engine.pool_ctx} rows={(N_SLOTS+1)*K}", flush=True)

    variants = sys.argv[1:] or ["prod", "identity", "take", "fused",
                                "fusedcond"]

    pinned_jit, pin_state = make_pinned(engine._state)

    def run(variant):
        if variant == "newprod":
            # the production chunk (chunked-COW: read-only pool + tail)
            engine._state = _decode_chunk_beam(
                engine.params, engine._state,
                engine._cross_pool_k, engine._cross_pool_v,
                engine.sup_mask, engine.blank_mask, engine.cfg,
                steps=CHUNK, k=K, use_timestamps=True,
                max_initial_index=engine.max_initial_index)
            run.last_cnts = jnp.zeros((CHUNK,), jnp.int32)
            return engine._state.n_past
        if variant == "pinned":
            jf, body_variant = pinned_jit, "prod"
        else:
            jf, body_variant = chunk_variant, variant
        engine._state, cnts = jf(
            engine.params, engine._state,
            engine._cross_pool_k, engine._cross_pool_v,
            engine.sup_mask, engine.blank_mask, engine.cfg,
            CHUNK, K, True, engine.max_initial_index, body_variant)
        run.last_cnts = cnts
        return engine._state.n_past

    def prep(variant):
        """Fresh deterministic state; pinned layout when the variant needs
        it (refill outputs default-layout pools)."""
        engine._admit_many(list(range(N_SLOTS)), audios)
        if variant == "pinned":
            engine._state = pin_state(engine._state)
        jax.device_get(engine._state.n_past.ravel()[:4])

    # compile all variants first
    for v in variants:
        prep(v)
        t0 = time.perf_counter()
        out = run(v)
        jax.device_get(out.ravel()[:4])
        print(f"compile {v}: {time.perf_counter()-t0:.1f}s", flush=True)

    # Interleaved timing. Re-admit before EACH variant so every measurement
    # sees live rows with cow forks (rows freeze after max_new/chunk_steps
    # chunks); time 2 chunks = steps 0..31, all active at max_new=64.
    results = {v: [] for v in variants}
    for rep in range(4):
        for v in variants:
            prep(v)
            t0 = time.perf_counter()
            run(v)
            out = run(v)
            jax.device_get(out.ravel()[:4])
            results[v].append((time.perf_counter() - t0) / 2)
    print()
    for v in variants:
        best = min(results[v])
        print(f"{v:10s} best {best*1000:8.1f} ms/chunk = "
              f"{best/CHUNK*1000:6.1f} ms/step   all: "
              + ", ".join(f"{w*1000:.0f}" for w in results[v]), flush=True)

    # correctness cross-check: identical deterministic admission -> 2 chunks
    # -> identical tokens/scores for every cow-correct variant ('identity'
    # is knowingly wrong and excluded)
    ref = None
    for v in variants:
        if v in ("identity", "scalarnp", "plaindefer"):
            continue
        prep(v)
        run(v)
        c1 = run.last_cnts
        run(v)
        got = jax.device_get((engine._state.tokens, engine._state.sum_lp,
                              engine._state.fin_count))
        if v.startswith("bounded"):
            cnts = np.concatenate([jax.device_get(c1),
                                   jax.device_get(run.last_cnts)])
            print(f"  copies/step [{v}] max={cnts.max()} "
                  f"mean={cnts.mean():.1f} steps0-31={cnts.tolist()}",
                  flush=True)
        if ref is None:
            ref, refv = got, v
            continue
        ok = all(np.array_equal(a, b) for a, b in zip(ref, got))
        print(f"tokens[{v}] == tokens[{refv}]: {ok}", flush=True)
        if not ok:
            print("  MISMATCH — variant is NOT production-safe", flush=True)


if __name__ == "__main__":
    main()
