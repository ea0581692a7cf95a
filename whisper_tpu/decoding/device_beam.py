"""Fully on-device beam search decode loop.

The host beam (decoding.sequence.BeamSearchDecoder) pays one device dispatch +
one result transfer per token — ~50 ms/step on tunneled chips even with the
top-k step (decoding.topk_step). Here the whole beam decode runs as ONE jitted
``lax.while_loop``, replicating openai's update semantics exactly:

  * candidate set = top (k+1) extensions per beam (same as openai's argsort
    prefix), flattened in (beam, rank) order and stable-sorted by score — the
    same order python's ``sorted`` over the insertion-ordered dict produces;
  * duplicate-candidate dedup is only ever needed at step 0 (identical
    prefixes); initializing ``sum_logprobs = [0, -inf, ..., -inf]`` makes
    beams 1..k propose nothing, which is equivalent;
  * EOT candidates are routed to a finished set in score order, capped at
    ``beam_size`` in INSERTION order (openai's max_candidates semantics:
    later, better candidates do NOT evict earlier ones);
  * the KV cache is reordered COPY-ON-WRITE: each beam carries a pointer to
    the physical cache row holding its history (``BeamState.phys``), a pure
    permutation of parents updates pointers only, and only genuinely forked
    parents copy a row — into rows freed by dropped beams, via a one-hot
    dot on the layout-matching transposed view of the cache
    (kernels/beam_gather.lane_dot_permute: the transposes elide to bitcasts
    against the batch-minor carry, so no reconciliation copies). This
    replaces openai's host-side materialized cache reorder, whose
    loop-level equivalent measured ~2x the chip's read+write ceiling per
    step (XLA copies the while-carry around any reorder op — table in
    step_fn).

Verified token-exact against the host beam in tests/test_topk_beam.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import WhisperConfig
from ..io.vocab import device_special_ids
from ..model.decoder import KVCache, decode_step
from .device_loop import LoopState, _apply_rules_device

NEG = jnp.float32(-1e30)


def beam_update(
    top_lp: jnp.ndarray,      # (G*k, k+1) candidate logprobs per beam
    top_ids: jnp.ndarray,     # (G*k, k+1) candidate token ids per beam
    sum_lp: jnp.ndarray,      # (G, k) running beam scores
    tokens: jnp.ndarray,      # (G, k, SL) sampled-token history of active beams
    fin_tokens: jnp.ndarray,  # (G, k, SL)
    fin_scores: jnp.ndarray,  # (G, k)
    fin_len: jnp.ndarray,     # (G, k)
    fin_count: jnp.ndarray,   # (G,)
    step,                     # scalar: index of the position being sampled
    k: int,
    eot: int,
):
    """One beam-search bookkeeping step (openai update semantics), pure math.

    Exactly mirrors BeamSearchDecoder.update_from_topk (sequence.py): stable
    sort of the k(k+1) candidates by score, first k non-EOT become the new
    beams, EOT candidates are routed to the finished set ONLY while fewer
    than k non-EOT candidates precede them (openai's break-after-k-saved),
    capped at k in insertion order. Tested directly against the host decoder
    in tests/test_topk_beam.py.

    Returns (new_sum_lp, new_tok, new_src, tokens_new,
             fin_tokens, fin_scores, fin_len, fin_count).
    """
    G = sum_lp.shape[0]
    GK = G * k

    cand_score = (sum_lp.reshape(GK, 1) + top_lp).reshape(G, k * (k + 1))
    cand_tok = top_ids.reshape(G, k * (k + 1))
    cand_src = jnp.repeat(jnp.arange(k), k + 1)[None, :]   # (1, k(k+1)) beam idx

    # Stable sort by descending score == python sorted() over the
    # insertion-ordered candidate dict.
    order = jnp.argsort(-cand_score, axis=1, stable=True)  # (G, k(k+1))
    s_score = jnp.take_along_axis(cand_score, order, axis=1)
    s_tok = jnp.take_along_axis(cand_tok, order, axis=1)
    s_src = jnp.take_along_axis(cand_src.repeat(G, 0), order, axis=1)

    is_eot = s_tok == eot
    # Active selection: first k non-EOT candidates in sorted order.
    nf_rank = jnp.cumsum(~is_eot, axis=1) - 1              # rank among non-eot
    take_active = (~is_eot) & (nf_rank < k)
    # scatter: active slot j <- candidate with nf_rank == j
    slot = jnp.where(take_active, nf_rank, k)              # k = dropped
    idx_sorted = jnp.argsort(jnp.where(take_active, slot, k + 1), axis=1,
                             stable=True)[:, :k]           # (G, k) candidate idx
    new_sum_lp = jnp.take_along_axis(s_score, idx_sorted, axis=1)
    new_tok = jnp.take_along_axis(s_tok, idx_sorted, axis=1)
    new_src = jnp.take_along_axis(s_src, idx_sorted, axis=1)  # (G, k) beam idx

    tokens_new = jnp.take_along_axis(tokens, new_src[:, :, None], axis=1)
    tokens_new = jax.lax.dynamic_update_slice(
        tokens_new, new_tok[:, :, None], (0, 0, step)
    )

    # Finished insertion (capacity k, insertion order). openai's update
    # loop breaks once beam_size non-EOT candidates are saved, so an EOT
    # candidate is only CONSIDERED while fewer than k non-EOT candidates
    # precede it in sorted order (at an EOT position, cumsum(~is_eot)
    # counts exactly the preceding non-EOTs).
    considered = is_eot & (jnp.cumsum(~is_eot, axis=1) < k)
    eot_rank = jnp.cumsum(considered, axis=1) - 1
    ins_pos = fin_count[:, None] + eot_rank                 # (G, k(k+1))
    accept = considered & (ins_pos < k)
    # finished sequence = source beam history + EOT (EOT not stored; the
    # buffer is EOT-padded already). length = step tokens sampled so far.
    # Insertion positions of accepted candidates are distinct within a
    # group (eot_rank is strictly increasing over considered EOTs), so
    # each slot selects its candidate with a vectorized one-hot match —
    # no sequential fori_loop scatter.
    match = accept[:, :, None] & (
        ins_pos[:, :, None] == jnp.arange(k)[None, None, :]
    )                                                       # (G, C, k)
    has = jnp.any(match, axis=1)                            # (G, k)
    cand_idx = jnp.argmax(match, axis=1)                    # (G, k)
    sel_src = jnp.take_along_axis(s_src, cand_idx, axis=1)  # (G, k)
    sel_score = jnp.take_along_axis(s_score, cand_idx, axis=1)
    hist = jnp.take_along_axis(tokens, sel_src[:, :, None], axis=1)  # (G,k,SL)
    fin_tokens = jnp.where(has[:, :, None], hist, fin_tokens)
    fin_scores = jnp.where(has, sel_score, fin_scores)
    fin_len = jnp.where(has, step, fin_len)
    fin_count = jnp.minimum(fin_count + jnp.sum(considered, axis=1), k)

    return (new_sum_lp, new_tok, new_src, tokens_new,
            fin_tokens, fin_scores, fin_len, fin_count)


def cow_assign(phys: jnp.ndarray, new_src: jnp.ndarray, k: int):
    """Copy-on-write physical-row assignment for the beam KV cache.

    Instead of materially permuting cache rows every mixing step (measured at
    ~2x the chip's read+write ceiling — XLA copies the while-carry around any
    loop-level reorder, table below in ``beam_decode_device``), each beam
    carries a pointer to the physical row holding its history. A mixing step
    then only MOVES data when a parent beam forks (is selected by several
    children): one child inherits the parent's row for free, the others copy
    it into rows freed by dropped beams. A pure permutation of parents (the
    common confident-speech case) updates pointers only — zero cache traffic.

    phys:    (G, k) int32 — current group-local physical row per beam.
    new_src: (G, k) int32 — group-local source beam per new beam.

    Returns ``(new_phys, copy_src)``, both (G, k) int32: ``new_phys[j]`` is
    the physical row assigned to new beam j (a bijection per group), and
    ``copy_src`` is in PHYSICAL-row order — ``copy_src[r]`` is the row whose
    contents row r must hold. It equals r except on freshly forked rows, and
    its sources are never themselves destinations (kept rows are never freed
    rows), so the copies are conflict-free in any order — the invariant the
    in-place aliased kernel (kernels/beam_gather.cow_copy_rows) relies on.
    """
    G = phys.shape[0]
    rr = jnp.arange(k)
    parent = jnp.take_along_axis(phys, new_src, axis=1)              # (G, k)
    # dup[j]: some j' < j selected the same source beam (first child keeps).
    tri = jnp.tril(jnp.ones((k, k), bool), -1)
    dup = jnp.any(
        (new_src[:, :, None] == new_src[:, None, :]) & tri[None], axis=2)
    keep = ~dup
    # Rows still referenced by a keeper; the rest are free for fork copies.
    used = jnp.any(
        (parent[:, :, None] == rr[None, None, :]) & keep[:, :, None], axis=1)
    free_rank = jnp.cumsum(~used, axis=1) - 1                        # per row
    # rank t -> row index: the t-th free row in ascending order.
    match = (~used)[:, None, :] & (free_rank[:, None, :] == rr[None, :, None])
    free_row = jnp.argmax(match, axis=2)                             # (G, k)
    dup_rank = jnp.cumsum(dup, axis=1) - 1
    assigned = jnp.take_along_axis(
        free_row, jnp.clip(dup_rank, 0, k - 1), axis=1)
    new_phys = jnp.where(keep, parent, assigned).astype(jnp.int32)
    garr = jnp.arange(G)[:, None]
    copy_src = jnp.zeros((G, k), jnp.int32).at[garr, new_phys].set(parent)
    return new_phys, copy_src


class BeamState(NamedTuple):
    cache_k: jnp.ndarray      # (G*k, L, ...) batch-leading, PHYSICAL row order
    cache_v: jnp.ndarray
    phys: jnp.ndarray         # (G*k,) int32 — physical cache row per beam
    tokens: jnp.ndarray       # (G, k, sample_len) sampled tokens of ACTIVE beams
    sum_lp: jnp.ndarray       # (G, k)
    last_tok: jnp.ndarray     # (G*k,) rule state, PHYSICAL row order
    prev_tok: jnp.ndarray
    last_ts: jnp.ndarray
    fin_tokens: jnp.ndarray   # (G, k, sample_len) finished sequences (incl. no EOT)
    fin_scores: jnp.ndarray   # (G, k) sum logprob of finished (NEG if empty)
    fin_len: jnp.ndarray      # (G, k) token count of finished sequences
    fin_count: jnp.ndarray    # (G,)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "beam_size", "sample_len", "use_timestamps",
                     "max_initial_index"),
)
def beam_decode_device(
    params,
    init_tokens: jnp.ndarray,   # (G*k, P) right-padded, identical within group
    init_len,
    sot_index,
    cache: KVCache,             # batch G*k
    cross_k, cross_v,           # batch G*k (pre-tiled)
    suppress_mask, blank_mask,
    cfg: WhisperConfig,
    beam_size: int,
    sample_len: int,
    use_timestamps: bool = True,
    max_initial_index: Optional[int] = 50,
):
    """Returns (active_tokens (G,k,SL), active_sum_lp (G,k),
                fin_tokens (G,k,SL), fin_scores (G,k), fin_len (G,k),
                fin_count (G,), steps, no_speech_probs (G,))."""
    v = cfg.n_vocab
    eot, beg, not_, nosp = device_special_ids(v)
    k = beam_size
    GK = init_tokens.shape[0]
    G = GK // k

    logits_all, cache = decode_step(
        params, init_tokens, jnp.int32(0), cache, cross_k, cross_v, cfg
    )
    logits_all = logits_all.astype(jnp.float32)
    probs_at_sot = jax.nn.softmax(logits_all[:, sot_index], axis=-1)
    no_speech_probs = probs_at_sot[::k, nosp]
    first_logits = jnp.take_along_axis(
        logits_all, jnp.full((GK, 1, 1), init_len - 1), axis=1
    )[:, 0]

    sum_lp0 = jnp.tile(
        jnp.concatenate([jnp.zeros((1,)), jnp.full((k - 1,), NEG)])[None, :], (G, 1)
    ).astype(jnp.float32)

    state = BeamState(
        cache_k=cache.k, cache_v=cache.v,
        phys=jnp.arange(GK, dtype=jnp.int32),
        tokens=jnp.full((G, k, sample_len), eot, jnp.int32),
        sum_lp=sum_lp0,
        last_tok=jnp.full((GK,), -1, jnp.int32),
        prev_tok=jnp.full((GK,), -1, jnp.int32),
        last_ts=jnp.full((GK,), -1, jnp.int32),
        fin_tokens=jnp.full((G, k, sample_len), eot, jnp.int32),
        fin_scores=jnp.full((G, k), NEG),
        fin_len=jnp.zeros((G, k), jnp.int32),
        fin_count=jnp.zeros((G,), jnp.int32),
    )

    def cond_fn(carry):
        state, logits, n_past, step = carry
        return (step < sample_len) & ~jnp.all(state.fin_count >= k)

    base = (jnp.arange(G, dtype=jnp.int32) * k)[:, None]  # group row offsets

    def step_fn(carry):
        state, logits, n_past, step = carry

        # Logits and rule state live in PHYSICAL row order (each physical
        # row is one sequence history); the rules are row-local, so they
        # apply before any beam<->row mapping.
        rule_state = LoopState(
            cache_k=None, cache_v=None, tokens_out=None,
            last_tok=state.last_tok, prev_tok=state.prev_tok,
            last_ts=state.last_ts, finished=None, length=None,
            sum_logprobs=None, key=None,
        )
        filt = _apply_rules_device(
            logits, step, rule_state, suppress_mask, blank_mask,
            (eot, beg, not_, v), use_timestamps, max_initial_index,
        )
        logprobs = jax.nn.log_softmax(filt, axis=-1)          # (GK, V) phys
        # Plain lax.top_k ON PURPOSE: standalone it costs 13.5 ms at 240
        # rows and the blocked topk_step.vocab_topk 3.0 ms, but a
        # same-process A/B of the FULL serving step (b48 k5 int8, 5-iter
        # reps x3, interleaved) measured plain 3.153 s/window vs blocked
        # 3.288 — inside this while_loop XLA's own lowering/fusion already
        # hides the top_k, and the pad/reshape blocking only adds traffic.
        top_lp_p, top_ids_p = jax.lax.top_k(logprobs, k + 1)  # (GK, k+1) phys
        # Tiny gather to beam order for the bookkeeping (k+1 floats/row —
        # NOT the (GK, V) logits and NOT the cache).
        top_lp = top_lp_p[state.phys]
        top_ids = top_ids_p[state.phys]

        (new_sum_lp, new_tok, new_src, tokens_new,
         fin_tokens, fin_scores, fin_len, fin_count) = beam_update(
            top_lp, top_ids, state.sum_lp, state.tokens,
            state.fin_tokens, state.fin_scores, state.fin_len, state.fin_count,
            step, k, eot,
        )

        # Copy-on-write row assignment: pointer update for permutations,
        # physical copies only where a parent beam forked. Measured matrix
        # (v5e, large-v3, G=32 k=5 = 160 rows, int8 cache ctx 128, ms/step,
        # ONE process interleaved; kernel rows re-measured same-day as the
        # lane-dot rows — the r3-recorded 35.3 for the same production
        # config shows tunnel day-to-day variance):
        #     no copies at all (pointer bookkeeping only)     20.5  (floor)
        #     cond + lane-dot transposed view  [PRODUCTION]   23.3
        #     cond + aliased COW DMA kernel                   27.1
        #     lane-dot, no cond                               37.1
        #     COW kernel, no cond                             45.6
        #     COW kernel with IDENTITY src (zero DMAs!)       45.1
        #     M-slot gather + in-place scatter (XLA-native)   47.6-49.7
        #     one-hot dot over the (G,k) beam axis, cond      27.0
        #     same, no cond                                   59.3
        # The identity-src row is the tell: the cost was never the row
        # copies but LAYOUT RECONCILIATION — XLA carries the cache
        # batch-MINOR ({0,3,2,4,1}: decode attention vectorizes over batch
        # lanes) while any Pallas custom call requires default layout (and
        # an XLA dot over a non-minor axis relayouts too), so full-cache
        # conversion copies bracket the op. lane_dot_permute sidesteps it:
        # dot on the transposed view whose default layout IS the carried
        # layout (transpose -> bitcast), fork-step cost 16.6 ms =~ the
        # cache read+write at wire rate. COW still skips permutation-only
        # steps entirely (identity cond).
        phys_l = state.phys.reshape(G, k) - base
        new_phys_l, copy_src_l = cow_assign(phys_l, new_src, k)
        new_phys = (new_phys_l + base).reshape(GK)
        copy_src = (copy_src_l + base).reshape(GK)

        # Rule state per PHYSICAL row: scatter each new beam's token to its
        # row; the parent row's state is at copy_src (== own row when kept).
        nt_flat = new_tok.reshape(GK)
        nt_phys = jnp.zeros((GK,), jnp.int32).at[new_phys].set(nt_flat)
        par_last_tok = state.last_tok[copy_src]
        par_last_ts = state.last_ts[copy_src]
        new_last_ts = jnp.where(nt_phys >= beg, nt_phys, par_last_ts)

        def _cow(args):
            ck, cv, src = args
            from ..kernels.beam_gather import lane_dot_permute

            return lane_dot_permute((ck, cv), src)

        new_cache_k, new_cache_v = jax.lax.cond(
            jnp.all(copy_src == jnp.arange(GK)),
            lambda args: (args[0], args[1]),
            _cow,
            (state.cache_k, state.cache_v, copy_src),
        )

        new_state = BeamState(
            cache_k=new_cache_k, cache_v=new_cache_v,
            phys=new_phys,
            tokens=tokens_new, sum_lp=new_sum_lp,
            last_tok=nt_phys, prev_tok=par_last_tok, last_ts=new_last_ts,
            fin_tokens=fin_tokens, fin_scores=fin_scores, fin_len=fin_len,
            fin_count=fin_count,
        )
        lg, new_cache = decode_step(
            params, nt_phys[:, None], n_past,
            KVCache(new_cache_k, new_cache_v), cross_k, cross_v, cfg,
        )
        new_state = new_state._replace(cache_k=new_cache.k, cache_v=new_cache.v)
        return (new_state, lg[:, 0].astype(jnp.float32), n_past + 1, step + 1)

    (state, _, _, steps) = jax.lax.while_loop(
        cond_fn, step_fn,
        (state, first_logits, jnp.asarray(init_len, jnp.int32), jnp.int32(0)),
    )
    return (
        state.tokens, state.sum_lp,
        state.fin_tokens, state.fin_scores, state.fin_len, state.fin_count,
        steps, no_speech_probs,
    )