"""Beam search under continuous batching: a slot pool of beam GROUPS.

The greedy ``SlotEngine`` (engine.py) admits one stream per slot row; here a
slot is a GROUP of ``beam_size`` physical rows sharing one stream's encoder
memory (group-shared cross attention — the decoder folds the beam axis into
the query time axis, model/decoder.py). Groups decode in compiled chunks with
per-group positions (ragged ``n_past``), each chunk step running the exact
on-device beam semantics of decoding/device_beam.py: rules + top-(k+1) in
PHYSICAL row order, openai's stable-sort bookkeeping per group
(``beam_update``), copy-on-write row reassignment (``cow_assign``; fork
copies ride decode_step's fused per-layer ``permute_rows`` gather — measured
table in ``_decode_chunk_beam``), and EOT routing into per-group finished
sets. A finished group's slot is refilled between chunks without touching its
neighbors — the continuous-batching lineage of the reference's KV arena
(main.rs:1336-1354), now with beams.

Token-identical to the fused single-segment beam loop per stream
(tests/test_beam_engine.py).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import WhisperConfig
from ..io.vocab import device_special_ids
from ..decoding.device_beam import beam_update, cow_assign
from ..decoding.device_loop import LoopState, _apply_rules_device
from ..decoding.result import DecodingResult, compression_ratio
from ..decoding.task import DecodingOptions, DecodingTask
from ..model.decoder import (KVCache, decode_step, decode_step_chunk,
                             init_cache, init_tail)
from .engine import SlotEngine, _encode_prefill, _under_mesh

NEG = jnp.float32(-1e30)

def bounded_cow_rows(cache_k, cache_v, copy_src, m: int, trash_row: int):
    """Exact loop-level beam fork copy touching only rows that ACTUALLY
    fork, in fixed-size passes of ``m`` rows.

    ``cow_assign`` already minimizes data movement (a pure permutation of
    parents updates pointers only), so ``copy_src[r] != r`` holds for just
    the freshly forked rows — typically a handful per step under staggered
    admission, yet the fused per-layer permute (decode_step permute_rows)
    gathers and writes back EVERY row of EVERY layer slice regardless:
    measured 56.7 ms/step vs a 29.4 no-cow floor at 165 rows int8 ctx104
    (scripts/bisect_beam_chunk.py). This instead scatters only the forked
    rows: the cache is batch-leading, so one row is one contiguous
    (L,H,D,C) span and an m-row gather+scatter is m DMA spans.

    Exactness without `lax.cond` (conds carrying the multi-GB pool pay
    catastrophic branch-boundary copies — measured 621 ms/step with
    decode_step inside a cond, 778 with a 5-way switch): a while_loop runs
    ceil(cnt / m) passes — ZERO passes (no cache traffic at all) when
    nothing forked, one pass in the common case, more only in fork storms
    (worst case cnt = (k-1)/k of rows when every group forks maximally in
    the same step). Conflict-freedom across passes is cow_assign's
    invariant: copy sources are never destinations.

    ``cache_k``/``cache_v`` are arrays or QuantKV pytrees; ``copy_src``
    (B,) int32 in physical-row order; padded pass slots copy
    trash_row->trash_row (the trash group never forks).
    """
    n = copy_src.shape[0]
    rows = jnp.arange(n, dtype=jnp.int32)
    need = copy_src != rows
    cnt = jnp.sum(need.astype(jnp.int32))
    # Needed rows first, in row order (argsort: False sorts before True).
    order = jnp.argsort(~need, stable=True).astype(jnp.int32)
    pad = (-n) % m
    if pad:
        order = jnp.concatenate(
            [order, jnp.full((pad,), trash_row, jnp.int32)])

    def one_pass(j, ck, cv):
        idx = jax.lax.dynamic_slice_in_dim(order, j * m, m)
        valid = (jnp.arange(m, dtype=jnp.int32) + j * m) < cnt
        dst = jnp.where(valid, idx, trash_row)
        src = jnp.where(valid, copy_src[dst], trash_row)
        copy = lambda buf: buf.at[dst].set(buf[src])
        return jax.tree.map(copy, ck), jax.tree.map(copy, cv)

    def cond(c):
        return c[0] * m < cnt

    def body(c):
        j, ck, cv = c
        ck, cv = one_pass(j, ck, cv)
        return (j + 1, ck, cv)

    _, ck, cv = jax.lax.while_loop(
        cond, body, (jnp.int32(0), cache_k, cache_v))
    return ck, cv, cnt


def span_cow(cache_k, cache_v, copy_src, n_past_rows,
             buckets=(16, 32, 48, 64, 96)):
    """Loop-level beam fork copy over only the first ``span`` context
    columns, ``span`` bucketed by ``lax.switch``. MEASURED NEGATIVE on
    TPU — kept as the recorded experiment (scripts/bisect_beam_chunk.py
    variant "span"), NOT wired into production.

    The idea: beam forks concentrate in a group's YOUTH (the lockstep
    loop's identity cond skips 83% of steps; under continuous batching
    some group is always young), and a young group's rows only have
    ``n_past`` valid columns — so the gather/writeback needs to touch
    max(n_past over forked rows) columns, not the whole pool. Columns >=
    span of a forked row keep the previous occupant's bytes: never read
    (attention masks keys at the row's n_past) and overwritten by later
    appends.

    Measured (v5e, 32 groups x k5 int8 ctx104, steps 0-31): 778 ms/step vs
    fused 57.0 / no-cow floor 30.4 — lax.switch pays catastrophic
    branch-boundary copies on the multi-GB carried pool, and the on-chip
    tokens diverged from the fused variant (bf16 tie-breaks across program
    variants; not diagnosed further since the perf already kills it).
    Exact on CPU f32 (tests/test_beam_engine.py span unit test).

    Branch 0 is identity (no row forked); the others gather rows of the
    ``[:b]`` column prefix and write it back in place.
    """
    Sk = copy_src.shape[0]
    forked = copy_src != jnp.arange(Sk, dtype=copy_src.dtype)
    span = jnp.max(jnp.where(forked, n_past_rows, 0))
    C = jax.tree.leaves(cache_k)[0].shape[-1]
    bs = [b for b in buckets if b < C] + [C]
    idx = jnp.where(span == 0, 0,
                    jnp.searchsorted(jnp.asarray(bs), span) + 1)

    def mk(b):
        def f(args):
            ck, cv, src = args

            def one(t):
                def leaf(a):
                    head = jax.lax.slice_in_dim(a, 0, b, axis=-1)
                    head = jnp.take(head, src, axis=0)
                    return jax.lax.dynamic_update_slice(
                        a, head, (0,) * a.ndim)
                return jax.tree.map(leaf, t)
            return one(ck), one(cv)
        return f

    branches = [lambda a: (a[0], a[1])] + [mk(b) for b in bs]
    return jax.lax.switch(idx, branches, (cache_k, cache_v, copy_src))


from typing import NamedTuple


class BeamEngineState(NamedTuple):
    cache_k: jnp.ndarray      # ((S)*k, L, H, D, C) physical rows, pytree ok
    cache_v: jnp.ndarray
    logits: jnp.ndarray       # ((S)*k, V) f32, PHYSICAL row order
    phys: jnp.ndarray         # (S*k,) int32 — physical row per (group, beam)
    last_tok: jnp.ndarray     # (S*k,) rule state, PHYSICAL order
    prev_tok: jnp.ndarray
    last_ts: jnp.ndarray
    tokens: jnp.ndarray       # (S, k, GMAX) active-beam histories (beam order)
    sum_lp: jnp.ndarray       # (S, k)
    fin_tokens: jnp.ndarray   # (S, k, GMAX)
    fin_scores: jnp.ndarray   # (S, k)
    fin_len: jnp.ndarray      # (S, k)
    fin_count: jnp.ndarray    # (S,)
    n_past: jnp.ndarray       # (S,) per-GROUP position
    step: jnp.ndarray         # (S,) sampled positions per group
    active: jnp.ndarray       # (S,) bool
    no_speech: jnp.ndarray    # (S,) f32
    max_new_row: jnp.ndarray  # (S,) int32 per-group sample budget (wrapped
                              # prompts shorten it — the openai clamp
                              # n_text_ctx - true_len + 1, task.py)


def _bu_group(top_lp, top_ids, sum_lp, tokens, fin_t, fin_s, fin_l, fin_c,
              step, k: int, eot: int):
    """beam_update for ONE group (vmapped over slots — each group carries
    its own ``step``, which the batched beam_update takes as a scalar)."""
    out = beam_update(
        top_lp, top_ids, sum_lp[None], tokens[None], fin_t[None], fin_s[None],
        fin_l[None], fin_c[None], step, k, eot)
    return tuple(o[0] for o in out)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "steps", "k", "use_timestamps",
                     "max_initial_index"),
    donate_argnames=("state",),
)
def _decode_chunk_beam(
    params, state: BeamEngineState, cross_k, cross_v, sup_mask, blank_mask,
    cfg: WhisperConfig, steps: int, k: int, use_timestamps: bool,
    max_initial_index: Optional[int],
):
    v = cfg.n_vocab
    eot, beg, not_, _nosp = device_special_ids(v)
    S = state.active.shape[0]
    Sk = S * k
    base = (jnp.arange(S, dtype=jnp.int32) * k)[:, None]

    # CHUNKED COW (see model/decoder._chunk_block): the pool is READ-ONLY
    # for the whole chunk — fork copies compose a per-row pointer and move
    # only the small per-chunk tail; ONE materialization at the boundary.
    # Every per-step alternative measured 27+ ms/step of full-pool
    # materialization at 165 rows (fused per-layer permute 58.6 vs no-cow
    # floor 30.1; take / lane_dot / layer_dot / bounded scatter / aliased
    # DMA kernel all worse — scripts/bisect_beam_chunk.py history).
    from ..model.quant import QuantKV

    pool_k, pool_v = state.cache_k, state.cache_v
    quantize = isinstance(pool_k, QuantKV)
    n_past0 = state.n_past                              # (S,) frozen in-chunk
    n_past0_rows = jnp.repeat(n_past0, k)
    tail0 = init_tail(cfg, Sk, steps, quantize,
                      dtype=None if quantize else pool_k.dtype)
    state = state._replace(cache_k=None, cache_v=None)  # pool not carried

    def body(carry):
        st, tail_k, tail_v, prefix_src, tl_g = carry
        rule_state = LoopState(
            cache_k=None, cache_v=None, tokens_out=None,
            last_tok=st.last_tok, prev_tok=st.prev_tok, last_ts=st.last_ts,
            finished=None, length=None, sum_logprobs=None, key=None,
        )
        # step is per group; rules take a per-row step vector.
        step_rows = jnp.repeat(st.step, k)
        filt = _apply_rules_device(
            st.logits, step_rows, rule_state, sup_mask, blank_mask,
            (eot, beg, not_, v), use_timestamps, max_initial_index,
        )
        logprobs = jax.nn.log_softmax(filt, axis=-1)
        # plain lax.top_k on purpose — see the measured note in
        # device_beam.py step_fn (blocked vocab_topk loses in-loop).
        top_lp_p, top_ids_p = jax.lax.top_k(logprobs, k + 1)
        top_lp = top_lp_p[st.phys].reshape(S, k, k + 1)
        top_ids = top_ids_p[st.phys].reshape(S, k, k + 1)

        (new_sum_lp, new_tok, new_src, tokens_new,
         fin_t, fin_s, fin_l, fin_c) = jax.vmap(
            _bu_group, in_axes=(0,) * 9 + (None, None))(
            top_lp, top_ids, st.sum_lp, st.tokens,
            st.fin_tokens, st.fin_scores, st.fin_len, st.fin_count,
            st.step, k, eot)

        # Freeze finished/empty groups: keep their bookkeeping as-is and
        # make their row updates identity.
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

        # Chunked COW: forks compose the prefix pointer and fork-copy only
        # the small tail buffers; the pool is untouched until the boundary.
        take_rows = lambda a: jnp.take(a, copy_src, axis=0)
        prefix_src = jnp.take(prefix_src, copy_src)
        tail_k = jax.tree.map(take_rows, tail_k)
        tail_v = jax.tree.map(take_rows, tail_v)
        tl_rows = jnp.repeat(tl_g, k)
        lg, new_tail = decode_step_chunk(
            params, nt_phys[:, None], n_past0_rows, tl_rows,
            KVCache(pool_k, pool_v), KVCache(tail_k, tail_v), prefix_src,
            cross_k, cross_v, cfg, k,
        )
        new_step = st.step + jnp.where(act, 1, 0)
        still = act & (new_step < st.max_new_row) & ~(fin_c >= k)
        new = BeamEngineState(
            cache_k=None, cache_v=None,
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
        return (new, new_tail.k, new_tail.v, prefix_src,
                tl_g + jnp.where(act, 1, 0))

    # all-finished early exit (see engine._decode_chunk): tail chunks of a
    # generation otherwise step fully-inactive groups.
    def wbody(carry):
        c, i = carry
        return body(c), i + 1

    rows = jnp.arange(Sk, dtype=jnp.int32)
    carry0 = (state, tail0.k, tail0.v, rows, jnp.zeros((S,), jnp.int32))
    (state, tail_k, tail_v, prefix_src, tl_g), _ = jax.lax.while_loop(
        lambda c: (c[1] < steps) & jnp.any(c[0][0].active),
        wbody, (carry0, jnp.int32(0)))

    # ---- chunk-boundary materialization: ONE pool pass per chunk ----
    # (a) permute rows by the composed fork source; (b) flush the tail
    # columns at each row's chunk-start offset. Rows with nothing to flush
    # redirect to the trash group's last row (duplicate trash-row indices
    # collide on garbage only; cow_assign keeps real (row, col) unique).
    take_f = lambda a: jnp.take(a, prefix_src, axis=0)
    pool_k = jax.tree.map(take_f, pool_k)
    pool_v = jax.tree.map(take_f, pool_v)
    tl_rows = jnp.repeat(tl_g, k)
    t_idx = jnp.arange(steps, dtype=jnp.int32)
    valid = t_idx[None, :] < tl_rows[:, None]                 # (Sk, CT)
    r2 = jnp.where(valid, rows[:, None], Sk - 1)
    cols = jnp.where(valid, n_past0_rows[:, None] + t_idx[None, :],
                     t_idx[None, :])

    def flush_data(buf, tbuf):    # (B,L,H,D,Cp) <- (B,L,H,D,CT)
        return buf.at[r2, :, :, :, cols].set(jnp.moveaxis(tbuf, -1, 1))

    def flush_scale(buf, tbuf):   # (B,L,H,Cp) <- (B,L,H,CT)
        return buf.at[r2, :, :, cols].set(jnp.moveaxis(tbuf, -1, 1))

    if quantize:
        pool_k = QuantKV(flush_data(pool_k.data, tail_k.data),
                         flush_scale(pool_k.scale, tail_k.scale))
        pool_v = QuantKV(flush_data(pool_v.data, tail_v.data),
                         flush_scale(pool_v.scale, tail_v.scale))
    else:
        pool_k = flush_data(pool_k, tail_k)
        pool_v = flush_data(pool_v, tail_v)
    return state._replace(cache_k=pool_k, cache_v=pool_v)


@jax.jit
def _beam_snapshot(active, step, tokens, sum_lp, fin_tokens, fin_scores,
                   fin_len, fin_count, no_speech):
    return tuple(jnp.copy(a) for a in (
        active, step, tokens, sum_lp, fin_tokens, fin_scores, fin_len,
        fin_count, no_speech))


@functools.partial(
    jax.jit, donate_argnames=("state", "cross_k_pool", "cross_v_pool"))
def _beam_refill(state: BeamEngineState, cross_k_pool, cross_v_pool,
                 groups, row_ids, ck_rows, cv_rows, cache_rows_k,
                 cache_rows_v, logits_rows, n_inits, max_news, nosp_rows,
                 eot):
    """Install an admission bucket of beam GROUPS: scatter the k prefilled
    cache rows per group, the group-shared cross rows, and reset the group
    bookkeeping. ``groups`` (n,) group indices (trash-padded);
    ``row_ids`` (n*k,) their flat physical rows; ``n_inits``/``max_news``
    (n,) per-group prompt lengths and sample budgets (ragged long-form
    windows)."""
    scat_rows = lambda p, r: jax.tree.map(
        lambda pp, rr: pp.at[row_ids].set(rr), p, r)
    scat_g1 = lambda p, r: jax.tree.map(
        lambda pp, rr: pp.at[:, groups].set(rr), p, r)
    n = groups.shape[0]
    S = state.active.shape[0]
    trash = S - 1
    kk = state.sum_lp.shape[1]
    sum_lp0 = jnp.tile(
        jnp.concatenate([jnp.zeros((1,)), jnp.full((kk - 1,), NEG)])[None],
        (n, 1)).astype(jnp.float32)
    eot_fill = jnp.broadcast_to(
        eot.astype(jnp.int32), (n,) + state.tokens.shape[1:])
    new = BeamEngineState(
        cache_k=scat_rows(state.cache_k, cache_rows_k),
        cache_v=scat_rows(state.cache_v, cache_rows_v),
        logits=state.logits.at[row_ids].set(logits_rows),
        phys=state.phys.at[row_ids].set(row_ids),
        last_tok=state.last_tok.at[row_ids].set(-1),
        prev_tok=state.prev_tok.at[row_ids].set(-1),
        last_ts=state.last_ts.at[row_ids].set(-1),
        tokens=state.tokens.at[groups].set(eot_fill),
        sum_lp=state.sum_lp.at[groups].set(sum_lp0),
        fin_tokens=state.fin_tokens.at[groups].set(eot_fill),
        fin_scores=state.fin_scores.at[groups].set(NEG),
        fin_len=state.fin_len.at[groups].set(0),
        fin_count=state.fin_count.at[groups].set(0),
        n_past=state.n_past.at[groups].set(n_inits),
        step=state.step.at[groups].set(0),
        active=state.active.at[groups].set(True).at[trash].set(False),
        no_speech=state.no_speech.at[groups].set(nosp_rows),
        max_new_row=state.max_new_row.at[groups].set(max_news),
    )
    return (new, scat_g1(cross_k_pool, ck_rows),
            scat_g1(cross_v_pool, cv_rows))


class BeamSlotEngine(SlotEngine):
    """Continuous-batching BEAM transcription over a pool of beam groups.

    Greedy-only restrictions of ``SlotEngine`` are replaced by openai beam
    semantics (beam_size candidates + finished-set, length-ranked finalize,
    identical to decoding/task._decode_full_device_beam per stream).
    ``transcribe_many`` serves independent <=30 s windows;
    ``transcribe_streams`` (inherited scheduler, beam hooks) runs the full
    whisper_full sliding-window loop per stream — window continuation with
    prompt carry, no-speech gate, and t>0 best_of escalation through the
    lockstep ladder, exactly as the offline pipeline's beam configuration."""

    def __init__(self, model, n_slots: int = 8,
                 options: Optional[DecodingOptions] = None,
                 chunk_steps: int = 8, max_new_tokens: Optional[int] = None,
                 use_flash: Optional[bool] = None, quantize: bool = False,
                 mesh=None, admit_buckets=None, schedule: str = "overlapped"):
        options = options or DecodingOptions(beam_size=5)
        if not options.beam_size or options.beam_size < 2:
            raise ValueError("BeamSlotEngine needs options.beam_size >= 2")
        if options.patience is not None:
            raise ValueError(
                "patience enlarges the finished set past beam_size; the "
                "on-device beam keeps exactly beam_size candidates — use the "
                "host beam (decode_full use_device_loop=False) for patience")
        self.beam_size = options.beam_size
        # SlotEngine.__init__ rejects beam options; bypass its guard by
        # passing a greedy twin, then restore.
        greedy_opts = DecodingOptions(
            **{**options.__dict__, "beam_size": None})
        super().__init__(model, n_slots=n_slots, options=greedy_opts,
                         chunk_steps=chunk_steps,
                         max_new_tokens=max_new_tokens, use_flash=use_flash,
                         quantize=quantize, mesh=mesh,
                         admit_buckets=admit_buckets, schedule=schedule)
        self.options = options
        task = DecodingTask(self.cfg, self.vocab, options)
        self.ranker = task.ranker

    # -- long-form scheduler hooks (SlotEngine.transcribe_streams drives
    #    these; a slot is a beam GROUP, a window decodes with beam search
    #    and escalates through the t>0 best_of rungs exactly as the offline
    #    ladder does after a failed t=0 beam rung) --

    def _check_stream_options(self, topts) -> None:
        if (topts.beam_size or 0) != self.beam_size:
            raise ValueError(
                f"BeamSlotEngine streams need options.beam_size == "
                f"{self.beam_size} (the engine's group width); got "
                f"{topts.beam_size!r}")
        if topts.patience is not None:
            raise ValueError(
                "patience is unsupported on the on-device beam; use "
                "pipeline.transcribe with use_device_loop=False")
        self._check_common_stream_options(topts)

    @_under_mesh
    def _stream_chunk_snapshot(self, topts):
        self._state = _decode_chunk_beam(
            self.params, self._state,
            self._cross_pool_k, self._cross_pool_v,
            self.sup_mask, self.blank_mask, self.cfg,
            steps=self.chunk_steps, k=self.beam_size,
            use_timestamps=not topts.without_timestamps,
            max_initial_index=self.max_initial_index,
        )
        return _beam_snapshot(
            self._state.active, self._state.step, self._state.tokens,
            self._state.sum_lp, self._state.fin_tokens,
            self._state.fin_scores, self._state.fin_len,
            self._state.fin_count, self._state.no_speech)

    def _stream_result(self, s: int, pulled) -> DecodingResult:
        (active, step, tokens, sum_lp, fin_t, fin_s, fin_l, fin_c,
         nosp) = pulled
        return self._finalize_group(s, step, tokens, sum_lp, fin_t, fin_s,
                                    fin_l, fin_c, nosp)

    # -- admission --

    def _fresh_cache(self, batch: int, dtype):
        if self.quantize:
            from ..model.quant import init_quant_cache

            # Exact-size pool: the lane-dot fork copy needs no row
            # alignment (ctx 75-vs-128 measured 21.4 vs 23.4 ms/step in the
            # device-beam harness) and refill scatters are XLA-native.
            return KVCache(*init_quant_cache(
                self.cfg, batch, ctx=self.pool_ctx))
        return init_cache(self.cfg, batch, dtype=dtype, ctx=self.pool_ctx)

    def _init_state(self, cache_dtype):
        S, k, cfg = self.n_slots + 1, self.beam_size, self.cfg
        cache = self._shard_pool(self._fresh_cache(S * k, cache_dtype))
        eot = device_special_ids(cfg.n_vocab)[0]
        self._state = BeamEngineState(
            cache_k=cache.k, cache_v=cache.v,
            logits=jnp.zeros((S * k, cfg.n_vocab), jnp.float32),
            phys=jnp.arange(S * k, dtype=jnp.int32),
            last_tok=jnp.full((S * k,), -1, jnp.int32),
            prev_tok=jnp.full((S * k,), -1, jnp.int32),
            last_ts=jnp.full((S * k,), -1, jnp.int32),
            tokens=jnp.full((S, k, self.max_new), eot, jnp.int32),
            sum_lp=jnp.zeros((S, k), jnp.float32),
            fin_tokens=jnp.full((S, k, self.max_new), eot, jnp.int32),
            fin_scores=jnp.full((S, k), NEG),
            fin_len=jnp.zeros((S, k), jnp.int32),
            fin_count=jnp.zeros((S,), jnp.int32),
            n_past=jnp.zeros((S,), jnp.int32),
            step=jnp.zeros((S,), jnp.int32),
            active=jnp.zeros((S,), bool),
            no_speech=jnp.zeros((S,), jnp.float32),
            max_new_row=jnp.full((S,), self.max_new, jnp.int32),
        )

    def _encode_bucket(self, wins, bucket: int, tokens=None, lengths=None,
                       sot_idx=None, max_news=None) -> dict:
        k = self.beam_size
        if tokens is None:
            tokens = jnp.broadcast_to(
                self._padded_init, (bucket, self._padded_init.shape[1]))
            lengths = jnp.full((bucket,), self.init_len, jnp.int32)
            sot_idx = jnp.full((bucket,), self.sot_index, jnp.int32)
        if max_news is None:
            max_news = jnp.full((bucket,), self.max_new, jnp.int32)
        # Prefill all k rows per group with the group's (possibly wrapped)
        # prompt: the encoder runs per GROUP; cross rows stay group-shared
        # (the decoder folds the beam axis), so the prefill decode_step sees
        # Bc=bucket cross with B=bucket*k token rows.
        tokens_k = jnp.repeat(tokens, k, axis=0)
        lengths_k = jnp.repeat(lengths, k)
        sot_k = jnp.repeat(sot_idx, k)
        ck, cv, cache, first_logits, nosp = _encode_prefill_beam(
            self.params, wins, tokens_k, lengths_k, sot_k,
            self.cfg, self.use_flash, self.quantize, self.pool_ctx,
            self._nosp_token(), k)
        if self._state is None:
            self._init_state(getattr(ck, "data", ck).dtype)
        if self._cross_pool_k is None:
            def pool_like(row):
                return jax.tree.map(
                    lambda a: jnp.zeros(
                        (a.shape[0], self.n_slots + 1) + a.shape[2:],
                        a.dtype), row)

            self._cross_pool_k = self._shard_pool(pool_like(ck))
            self._cross_pool_v = self._shard_pool(pool_like(cv))
        return {"bucket": bucket, "ck": ck, "cv": cv, "cache": cache,
                "logits": first_logits, "lengths": lengths,
                "max_news": max_news, "nosp": nosp}

    def _install_rows(self, staged: dict, slot_list, rows) -> None:
        k = self.beam_size
        bucket = staged["bucket"]
        groups = np.full((bucket,), self.n_slots, np.int32)
        groups[np.asarray(rows, np.int32)] = np.asarray(slot_list, np.int32)
        row_ids = (groups[:, None] * k + np.arange(k)[None]).reshape(-1)
        eot = device_special_ids(self.cfg.n_vocab)[0]
        self._state, self._cross_pool_k, self._cross_pool_v = _beam_refill(
            self._state, self._cross_pool_k, self._cross_pool_v,
            jnp.asarray(groups), jnp.asarray(row_ids.astype(np.int32)),
            staged["ck"], staged["cv"], staged["cache"].k, staged["cache"].v,
            staged["logits"], staged["lengths"], staged["max_news"],
            staged["nosp"], jnp.int32(eot))

    # -- scheduler: transcribe_many is INHERITED — SlotEngine's loop drives
    #    the beam chunk/snapshot/finalize through the _stream_chunk_snapshot
    #    and _stream_result hooks above, so there is exactly one scheduler --

    def _finalize_group(self, g, step, tokens, sum_lp, fin_t, fin_s, fin_l,
                        fin_c, nosp) -> DecodingResult:
        """openai finalize, exactly as decoding/task._decode_full_device_beam:
        finished sequences first; pad from in-flight beams by score; rank."""
        k = self.beam_size
        seqs: List[List[int]] = []
        lps: List[float] = []
        for i in range(int(fin_c[g])):
            seqs.append([int(t) for t in fin_t[g, i, : int(fin_l[g, i])]])
            lps.append(float(fin_s[g, i]))
        if len(seqs) < k:
            for i in np.argsort(-sum_lp[g]):
                if len(seqs) >= k:
                    break
                seqs.append([int(t) for t in tokens[g, int(i), : int(step[g])]])
                lps.append(float(sum_lp[g, int(i)]))
        sel = self.ranker.rank([seqs], [lps])[0]
        toks = seqs[sel]
        text = self.vocab.decode(toks).strip()
        return DecodingResult(
            tokens=toks, text=text,
            avg_logprob=lps[sel] / (len(toks) + 1),
            no_speech_prob=float(nosp[g]),
            temperature=0.0,
            compression_ratio=compression_ratio(text),
        )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "use_flash", "quantize", "pool_ctx", "nosp",
                     "k"))
def _encode_prefill_beam(params, wins, tokens_k, lengths_k, sot_k,
                         cfg: WhisperConfig, use_flash: bool, quantize: bool,
                         pool_ctx: int, nosp: int, k: int):
    """Encode a bucket of streams + prefill bucket*k beam rows against the
    group-shared cross memory; one dispatch."""
    from ..model.encoder import encode

    enc = encode(params, wins, cfg, use_flash=use_flash, quantize_kv=quantize)
    bucket = wins.shape[0]
    if quantize:
        from ..model.quant import init_quant_cache

        cache = KVCache(*init_quant_cache(cfg, bucket * k, ctx=pool_ctx))
    else:
        dtype = getattr(enc.cross_k, "data", enc.cross_k).dtype
        cache = init_cache(cfg, bucket * k, dtype=dtype, ctx=pool_ctx)
    logits_all, cache = decode_step(
        params, tokens_k, jnp.int32(0), cache, enc.cross_k, enc.cross_v, cfg)
    rows = jnp.arange(bucket * k)
    first_logits = logits_all[rows, lengths_k - 1].astype(jnp.float32)
    probs_sot = jax.nn.softmax(
        logits_all[rows[::k], sot_k[::k]].astype(jnp.float32), axis=-1)
    return (enc.cross_k, enc.cross_v, cache, first_logits, probs_sot[:, nosp])
