"""Fused ON-DEVICE speculative greedy decoding.

The host speculative loop (decoding/speculative.py) pays one dispatch per
draft step — ~25 ms each over a tunneled chip, which buries the algorithmic
win. Here the WHOLE speculative decode is ONE jitted program, the same shape
as decoding/device_loop.decode_segment_device: a ``lax.while_loop`` whose
body does

  1. emit the known next token from the carried target logits (identical
     rule/argmax/bookkeeping math to the greedy device loop),
  2. ``lax.scan`` the DRAFT forward ``gamma`` single-token steps (proposals
     p_1..p_{gamma-1}; the last feed keeps the draft cache covering the
     full-accept prefix so both caches rewind with one shared ``n_past``),
  3. ONE target forward over the (B, gamma) block ``[t_n, p_1..p_{gamma-1}]``,
  4. ``lax.scan`` over the gamma output positions applying the logit rules
     with the evolving per-row rule state, accepting the longest
     argmax-agreeing prefix per row; the first disagreement's logits carry
     into the next round as the known-token logits.

Rows are RAGGED: each row carries its own ``n_past``/step (rows accept
different counts per round — the same per-row position mechanism the
serving engine uses). Rejecting a suffix is just not advancing ``n_past``
(decode_step masks reads past it; stale rows are overwritten next block).

Greedy only, and exact in exact arithmetic: token-identical to
``decode_segment_device`` (tested at both acceptance extremes on the CPU
backend). The T=gamma block vs T=1 step matmul-tiling caveat from
decoding/speculative.py applies on real hardware.
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


class SpecState(NamedTuple):
    cache_tk: jnp.ndarray
    cache_tv: jnp.ndarray
    cache_dk: jnp.ndarray
    cache_dv: jnp.ndarray
    logits: jnp.ndarray       # (B, V) target logits for the next position
    n_past: jnp.ndarray       # (B,) shared target/draft position
    step: jnp.ndarray         # (B,) tokens emitted so far
    tokens_out: jnp.ndarray   # (B, sample_len)
    last_tok: jnp.ndarray     # (B,) rule state
    prev_tok: jnp.ndarray
    last_ts: jnp.ndarray
    finished: jnp.ndarray     # (B,)
    length: jnp.ndarray       # (B,) non-EOT tokens emitted
    sum_logprobs: jnp.ndarray
    rounds: jnp.ndarray       # () stats: while-loop iterations
    accepted: jnp.ndarray     # () stats: accepted draft proposals


@functools.partial(
    jax.jit,
    static_argnames=("cfg_t", "cfg_d", "sample_len", "gamma",
                     "use_timestamps", "max_initial_index"),
)
def decode_segment_speculative_device(
    params_t, params_d,
    init_tokens: jnp.ndarray,      # (B, P) right-padded prompt+sot
    init_len, sot_index,
    cache_t: KVCache, cache_d: KVCache,
    cross_k_t, cross_v_t, cross_k_d, cross_v_d,
    suppress_mask, blank_mask,
    cfg_t: WhisperConfig, cfg_d: WhisperConfig,
    sample_len: int,
    gamma: int = 4,
    use_timestamps: bool = True,
    max_initial_index: Optional[int] = 50,
):
    """Returns (tokens (B, sample_len), lengths, sum_logprobs,
    no_speech_probs, rounds, accepted)."""
    if gamma < 2:  # static: fails at trace time with a clear message
        raise ValueError("gamma >= 2 (gamma-1 draft proposals per round)")
    v = cfg_t.n_vocab
    eot, beg, not_, nosp = device_special_ids(v)
    B = init_tokens.shape[0]
    rows = jnp.arange(B)
    consts = (eot, beg, not_, v)

    # Prefill both models on the same prompt.
    la_t, cache_t = decode_step(
        params_t, init_tokens, jnp.int32(0), cache_t,
        cross_k_t, cross_v_t, cfg_t)
    _, cache_d = decode_step(
        params_d, init_tokens, jnp.int32(0), cache_d,
        cross_k_d, cross_v_d, cfg_d)
    la_t = la_t.astype(jnp.float32)
    probs_at_sot = jax.nn.softmax(la_t[:, sot_index], axis=-1)
    no_speech_probs = probs_at_sot[:, nosp]
    first_logits = jnp.take_along_axis(
        la_t, jnp.full((B, 1, 1), init_len - 1), axis=1)[:, 0]

    def rules(logits, step, last, prev, lts):
        st = LoopState(
            cache_k=None, cache_v=None, tokens_out=None,
            last_tok=last, prev_tok=prev, last_ts=lts,
            finished=None, length=None, sum_logprobs=None, key=None)
        return _apply_rules_device(
            logits, step, st, suppress_mask, blank_mask, consts,
            use_timestamps, max_initial_index)

    state = SpecState(
        cache_tk=cache_t.k, cache_tv=cache_t.v,
        cache_dk=cache_d.k, cache_dv=cache_d.v,
        logits=first_logits,
        n_past=jnp.full((B,), jnp.asarray(init_len, jnp.int32)),
        step=jnp.zeros((B,), jnp.int32),
        tokens_out=jnp.full((B, sample_len), eot, jnp.int32),
        last_tok=jnp.full((B,), -1, jnp.int32),
        prev_tok=jnp.full((B,), -1, jnp.int32),
        last_ts=jnp.full((B,), -1, jnp.int32),
        finished=jnp.zeros((B,), bool),
        length=jnp.zeros((B,), jnp.int32),
        sum_logprobs=jnp.zeros((B,), jnp.float32),
        rounds=jnp.int32(0), accepted=jnp.int32(0),
    )

    def emit(st_fields, tok, lp, live):
        """Shared emission bookkeeping (greedy device-loop math): write
        ``tok`` at each live row's current step, accumulate logprob, count
        non-EOT length, advance rule state, handle EOT/budget."""
        (step, tokens_out, last, prev, lts, finished, length, sum_lp) = st_fields
        tok = jnp.where(live, tok, eot)
        now_fin = finished | (live & (tok == eot))
        sum_lp = sum_lp + jnp.where(live, lp, 0.0)
        length = length + jnp.where(live & (tok != eot), 1, 0)
        pos = jnp.clip(step, 0, sample_len - 1)
        tokens_out = tokens_out.at[rows, pos].set(
            jnp.where(live, tok, tokens_out[rows, pos]))
        is_ts = live & (tok >= beg) & (tok != eot)
        last_n = jnp.where(live, tok, last)
        prev_n = jnp.where(live, last, prev)
        lts_n = jnp.where(is_ts, tok, lts)
        step_n = step + jnp.where(live, 1, 0)
        # budget: a row that has emitted sample_len tokens is done
        now_fin = now_fin | (step_n >= sample_len)
        return (step_n, tokens_out, last_n, prev_n, lts_n, now_fin,
                length, sum_lp), tok

    def body(st: SpecState):
        # -- 1. emit the known token from the carried logits --
        live0 = ~st.finished
        filt = rules(st.logits, st.step, st.last_tok, st.prev_tok, st.last_ts)
        logprobs = jax.nn.log_softmax(filt, axis=-1)
        nxt = jnp.argmax(filt, axis=-1).astype(jnp.int32)
        lp = jnp.take_along_axis(logprobs, nxt[:, None], axis=-1)[:, 0]
        fields = (st.step, st.tokens_out, st.last_tok, st.prev_tok,
                  st.last_ts, st.finished, st.length, st.sum_logprobs)
        fields, nxt = emit(fields, nxt, lp, live0)
        (step, tokens_out, last, prev, lts, finished, length, sum_lp) = fields
        live = ~finished  # rows still decoding after the known token

        # -- 2. draft roll: gamma feeds, gamma-1 usable proposals --
        def draft_step(carry, j):
            cdk, cdv, tok, dlast, dprev, dlts, dstep = carry
            lg, cd = decode_step(
                params_d, tok[:, None], st.n_past + j,
                KVCache(cdk, cdv), cross_k_d, cross_v_d, cfg_d)
            dl = rules(lg[:, 0].astype(jnp.float32), dstep, dlast, dprev,
                       dlts)
            p = jnp.argmax(dl, axis=-1).astype(jnp.int32)
            is_ts = p >= beg
            return (cd.k, cd.v, p, p, dlast,
                    jnp.where(is_ts, p, dlts), dstep + 1), p

        (cdk, cdv, _, _, _, _, _), props = jax.lax.scan(
            draft_step,
            (st.cache_dk, st.cache_dv, nxt, last, prev, lts, step),
            jnp.arange(gamma, dtype=jnp.int32))
        props = props[:-1]  # (gamma-1, B); the last feed only syncs caches

        # -- 3. one target forward over the block [nxt, p_1..p_{gamma-1}] --
        block = jnp.concatenate([nxt[:, None], props.T], axis=1)  # (B, gamma)
        lg, cache_t2 = decode_step(
            params_t, block, st.n_past,
            KVCache(st.cache_tk, st.cache_tv), cross_k_t, cross_v_t, cfg_t)
        O = lg.astype(jnp.float32)  # (B, gamma, V)

        # -- 4. accept the longest agreeing prefix, rules re-applied --
        def verify_step(carry, xs):
            fields, accepting, next_logits, n_acc = carry
            o_j, p_j, is_last = xs
            (stp, t_out, la_, pr_, lt_, fin, ln, slp) = fields
            filt = rules(o_j, stp, la_, pr_, lt_)
            lgp = jax.nn.log_softmax(filt, axis=-1)
            g = jnp.argmax(filt, axis=-1).astype(jnp.int32)
            glp = jnp.take_along_axis(lgp, g[:, None], axis=-1)[:, 0]
            match = accepting & ~fin & ~is_last & (g == p_j)
            fields, _ = emit(fields, g, glp, match)
            # first disagreement (or the bonus full-accept position): these
            # logits are the next round's known-token logits
            take = accepting & (~match | is_last)
            next_logits = jnp.where(take[:, None], o_j, next_logits)
            return ((fields[0], fields[1], fields[2], fields[3], fields[4],
                     fields[5], fields[6], fields[7]),
                    accepting & match, next_logits,
                    n_acc + match.astype(jnp.int32)), None

        props_pad = jnp.concatenate(
            [props, jnp.full((1, B), eot, jnp.int32)])     # (gamma, B)
        is_last = jnp.arange(gamma) == gamma - 1
        (fields, _, next_logits, n_acc), _ = jax.lax.scan(
            verify_step,
            (fields, live, st.logits, jnp.zeros((B,), jnp.int32)),
            (jnp.moveaxis(O, 1, 0), props_pad, is_last))
        (step, tokens_out, last, prev, lts, finished, length, sum_lp) = fields

        # caches advance over the known token + accepted proposals; frozen
        # rows keep their n_past (their block rows were trash writes past
        # their valid prefix)
        n_past = st.n_past + jnp.where(live0, 1 + n_acc, 0)
        return SpecState(
            cache_tk=cache_t2.k, cache_tv=cache_t2.v,
            cache_dk=cdk, cache_dv=cdv,
            logits=next_logits, n_past=n_past, step=step,
            tokens_out=tokens_out, last_tok=last, prev_tok=prev,
            last_ts=lts, finished=finished, length=length,
            sum_logprobs=sum_lp,
            rounds=st.rounds + 1, accepted=st.accepted + jnp.sum(n_acc),
        )

    state = jax.lax.while_loop(
        lambda s: ~jnp.all(s.finished), body, state)
    return (state.tokens_out, state.length, state.sum_logprobs,
            no_speech_probs, state.rounds, state.accepted)


def decode_speculative_device_full(
    params_t, cfg_t, vocab, cross_k_t, cross_v_t,
    params_d, cfg_d, cross_k_d, cross_v_d,
    options, gamma: int = 4,
):
    """decode_full-shaped wrapper: builds the prompt/masks/budget exactly
    like task._decode_full_device and runs the fused speculative loop.
    Returns (List[DecodingResult], stats)."""
    import numpy as np

    from .task import (_cache_dtype, _cross_batch, _device_decode_prologue,
                       _greedy_device_results)
    from ..model.decoder import init_cache

    if options.beam_size is not None or (options.best_of or 1) != 1:
        raise ValueError("speculative decoding is greedy-only")
    if options.temperature != 0:
        raise ValueError("speculative decoding requires temperature == 0")
    if cfg_t.n_vocab != cfg_d.n_vocab:
        raise ValueError("draft and target must share the vocabulary")
    if gamma < 2:
        raise ValueError("gamma >= 2 (gamma-1 draft proposals per round)")

    n_audio = _cross_batch(cross_k_t)
    (task, padded, true_len, sup_mask, blank_mask, max_initial_index,
     sample_len) = _device_decode_prologue(cfg_t, vocab, options, n_audio)
    # + gamma: verify blocks write up to gamma-1 columns past the last
    # accepted position before the loop notices every row finished.
    ctx = padded.shape[1] + sample_len + gamma + 8
    cache_t = init_cache(cfg_t, n_audio, dtype=_cache_dtype(cross_k_t),
                         ctx=ctx)
    cache_d = init_cache(cfg_d, n_audio, dtype=_cache_dtype(cross_k_d),
                         ctx=ctx)
    toks, lengths, sum_lp, nosp, rounds, accepted = (
        decode_segment_speculative_device(
            params_t, params_d, jnp.asarray(padded), true_len,
            task.sot_index, cache_t, cache_d,
            cross_k_t, cross_v_t, cross_k_d, cross_v_d,
            sup_mask, blank_mask, cfg_t, cfg_d,
            sample_len=sample_len, gamma=gamma,
            use_timestamps=not options.without_timestamps,
            max_initial_index=max_initial_index,
        ))
    results = _greedy_device_results(toks, lengths, sum_lp, nosp, vocab,
                                     temperature=0.0)
    stats = {"rounds": int(rounds), "accepted": int(accepted)}
    return results, stats
