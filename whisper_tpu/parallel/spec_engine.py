"""Speculative decoding under continuous batching: a SlotEngine whose decode
chunk verifies ``gamma`` draft tokens per target forward.

The decode floor itemization (scripts/itemize_decode_floor.py, r4) measured a
~10 ms/step ROW-INDEPENDENT cost — the 32-iteration layer scan's per-op
sequencing — plus a cross-memory read that is paid PER FORWARD, not per
token. A verify pass amortizes both over up to ``gamma`` emitted tokens: the
fused lockstep loop (decoding/device_speculative.py) measured 1.5-1.8x
greedy at b8. This module composes that loop with the serving engine
(parallel/engine.py): the slot pool, bucketed admission, chunked scheduling,
and long-form stream hooks are inherited; only the chunk program changes.

Per chunk round (all rows, ragged per-slot positions — the engine's vector
``n_past``):
  1. emit the known next token from the carried target logits (bit-identical
     rule/argmax/budget math to ``engine._decode_chunk``),
  2. scan the DRAFT decoder gamma single-token steps (proposals
     p_1..p_{gamma-1}; the last feed syncs the draft cache over the
     full-accept prefix),
  3. ONE target forward over the (S, gamma) block [t, p_1..p_{gamma-1}],
  4. accept the longest rule-filtered-argmax-agreeing prefix per row; the
     first disagreement's logits carry to the next round.

The draft shares the target's encoder (distil topology,
training/distill.py): admission projects the draft's cross memory from the
target's hidden state (model/encoder.cross_kv_from_hidden) in the same
encode/prefill dispatch, and the engine keeps a per-slot draft cross pool
(L_draft layers — small next to the target pool) plus a draft KV pool.

Greedy-exact: token-identical to the greedy SlotEngine at every acceptance
rate in exact arithmetic — gated on CPU at both extremes (draft == target
and a random draft; tests/test_spec_engine.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import WhisperConfig
from ..io.vocab import device_special_ids
from ..decoding.device_loop import LoopState, _apply_rules_device
from ..model.decoder import KVCache, decode_step, init_cache
from .engine import SlotEngine, _under_mesh


class SpecEngineState(NamedTuple):
    # engine.EngineState fields (same names: the inherited harvest /
    # snapshot / result hooks read them positionally via _snapshot args)
    cache_k: jnp.ndarray
    cache_v: jnp.ndarray
    logits: jnp.ndarray
    n_past: jnp.ndarray
    step: jnp.ndarray
    active: jnp.ndarray
    tokens_out: jnp.ndarray
    length: jnp.ndarray
    sum_logprobs: jnp.ndarray
    last_tok: jnp.ndarray
    prev_tok: jnp.ndarray
    last_ts: jnp.ndarray
    max_new_row: jnp.ndarray
    no_speech: jnp.ndarray
    # draft additions
    cache_dk: jnp.ndarray
    cache_dv: jnp.ndarray
    rounds: jnp.ndarray      # () int32 — verify rounds executed (stats)
    accepted: jnp.ndarray    # () int32 — accepted draft proposals (stats)


@functools.partial(
    jax.jit,
    static_argnames=("cfg_t", "cfg_d", "rounds", "gamma", "use_timestamps",
                     "max_initial_index"),
    donate_argnames=("state",),
)
def _decode_chunk_spec(
    params_t, params_d, state: SpecEngineState,
    cross_k, cross_v, cross_dk, cross_dv, sup_mask, blank_mask,
    cfg_t: WhisperConfig, cfg_d: WhisperConfig,
    rounds: int, gamma: int, use_timestamps: bool,
    max_initial_index: Optional[int],
):
    v = cfg_t.n_vocab
    eot, beg, not_, _nosp = device_special_ids(v)
    S = state.logits.shape[0]
    rows_i = jnp.arange(S)
    consts = (eot, beg, not_, v)
    GMAX = state.tokens_out.shape[1]

    def rules(logits, step, last, prev, lts):
        st = LoopState(
            cache_k=None, cache_v=None, tokens_out=None,
            last_tok=last, prev_tok=prev, last_ts=lts,
            finished=None, length=None, sum_logprobs=None, key=None)
        return _apply_rules_device(
            logits, step, st, sup_mask, blank_mask, consts,
            use_timestamps, max_initial_index)

    def emit(fields, tok, lp, live):
        """Engine-greedy emission (the exact math of engine._decode_chunk's
        body) applied to the rows in ``live``."""
        (step, t_out, last, prev, lts, act, length, slp, max_new) = fields
        tok = jnp.where(live, tok, eot)
        hit_cap = step + 1 >= max_new
        now_eot = live & ((tok == eot) | hit_cap)
        slp = slp + jnp.where(live, lp, 0.0)
        length = length + jnp.where(live & (tok != eot), 1, 0)
        pos = jnp.clip(step, 0, GMAX - 1)
        t_out = t_out.at[rows_i, pos].set(
            jnp.where(live, tok, t_out[rows_i, pos]))
        is_ts = live & ~now_eot & (tok >= beg)
        last_n = jnp.where(live, tok, last)
        prev_n = jnp.where(live, last, prev)
        lts_n = jnp.where(is_ts, tok, lts)
        step_n = step + jnp.where(live, 1, 0)
        act_n = act & ~now_eot
        return (step_n, t_out, last_n, prev_n, lts_n, act_n, length, slp,
                max_new), tok

    def body(st: SpecEngineState):
        live0 = st.active
        # -- 1. emit the known token from the carried logits --
        filt = rules(st.logits, st.step, st.last_tok, st.prev_tok, st.last_ts)
        logprobs = jax.nn.log_softmax(filt, axis=-1)
        nxt = jnp.argmax(filt, axis=-1).astype(jnp.int32)
        lp = jnp.take_along_axis(logprobs, nxt[:, None], axis=-1)[:, 0]
        fields = (st.step, st.tokens_out, st.last_tok, st.prev_tok,
                  st.last_ts, st.active, st.length, st.sum_logprobs,
                  st.max_new_row)
        fields, nxt = emit(fields, nxt, lp, live0)

        # -- 2. draft roll: gamma feeds, gamma-1 usable proposals --
        (step, t_out, last, prev, lts, act, length, slp, max_new) = fields

        def draft_step(carry, j):
            cdk, cdv, tok, dlast, dprev, dlts, dstep = carry
            lg, cd = decode_step(
                params_d, tok[:, None], st.n_past + j,
                KVCache(cdk, cdv), cross_dk, cross_dv, cfg_d)
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
        props = props[:-1]  # (gamma-1, S): the last feed only syncs caches

        # -- 3. one target forward over the block [nxt, p_1..p_{gamma-1}] --
        block = jnp.concatenate([nxt[:, None], props.T], axis=1)
        lg, cache_t2 = decode_step(
            params_t, block, st.n_past,
            KVCache(st.cache_k, st.cache_v), cross_k, cross_v, cfg_t)
        O = lg.astype(jnp.float32)  # (S, gamma, V)

        # -- 4. accept the longest agreeing prefix, rules re-applied --
        def verify_step(carry, xs):
            fields, accepting, next_logits, n_acc = carry
            o_j, p_j, is_last = xs
            (stp, t_o, la_, pr_, lt_, ac_, ln, sl, mn) = fields
            filt_j = rules(o_j, stp, la_, pr_, lt_)
            lgp = jax.nn.log_softmax(filt_j, axis=-1)
            g = jnp.argmax(filt_j, axis=-1).astype(jnp.int32)
            glp = jnp.take_along_axis(lgp, g[:, None], axis=-1)[:, 0]
            match = accepting & ac_ & ~is_last & (g == p_j)
            fields, _ = emit(fields, g, glp, match)
            take = accepting & (~match | is_last)
            next_logits = jnp.where(take[:, None], o_j, next_logits)
            return (fields, accepting & match, next_logits,
                    n_acc + match.astype(jnp.int32)), None

        props_pad = jnp.concatenate(
            [props, jnp.full((1, S), eot, jnp.int32)])
        is_last = jnp.arange(gamma) == gamma - 1
        (fields, _, next_logits, n_acc), _ = jax.lax.scan(
            verify_step,
            (fields, act, st.logits, jnp.zeros((S,), jnp.int32)),
            (jnp.moveaxis(O, 1, 0), props_pad, is_last))
        (step, t_out, last, prev, lts, act, length, slp, _mn) = fields

        n_past = st.n_past + jnp.where(live0, 1 + n_acc, 0)
        return SpecEngineState(
            cache_k=cache_t2.k, cache_v=cache_t2.v,
            logits=next_logits, n_past=n_past, step=step, active=act,
            tokens_out=t_out, length=length, sum_logprobs=slp,
            last_tok=last, prev_tok=prev, last_ts=lts,
            max_new_row=st.max_new_row, no_speech=st.no_speech,
            cache_dk=cdk, cache_dv=cdv,
            rounds=st.rounds + 1,
            accepted=st.accepted + jnp.sum(jnp.where(live0, n_acc, 0)),
        )

    def wbody(carry):
        st, i = carry
        return body(st), i + 1

    state, _ = jax.lax.while_loop(
        lambda c: (c[1] < rounds) & jnp.any(c[0].active),
        wbody, (state, jnp.int32(0)))
    return state


@functools.partial(
    jax.jit,
    donate_argnames=("state", "cross_k_pool", "cross_v_pool",
                     "cross_dk_pool", "cross_dv_pool"))
def _refill_many_spec(state: SpecEngineState, cross_k_pool, cross_v_pool,
                      cross_dk_pool, cross_dv_pool, slots,
                      ck_rows, cv_rows, dck_rows, dcv_rows,
                      cache_k_rows, cache_v_rows, dcache_k_rows,
                      dcache_v_rows, logits_rows, init_lens, max_news,
                      nosp_rows):
    """engine._refill_many plus the draft pools (scattered with the same
    slot vector; see its docstring for the donation/trash-row mechanics)."""
    scat0 = lambda p, r: jax.tree.map(lambda pp, rr: pp.at[slots].set(rr), p, r)
    scat1 = lambda p, r: jax.tree.map(
        lambda pp, rr: pp.at[:, slots].set(rr), p, r)
    S = state.active.shape[0]
    trash = S - 1
    new_state = SpecEngineState(
        cache_k=scat0(state.cache_k, cache_k_rows),
        cache_v=scat0(state.cache_v, cache_v_rows),
        cache_dk=scat0(state.cache_dk, dcache_k_rows),
        cache_dv=scat0(state.cache_dv, dcache_v_rows),
        logits=state.logits.at[slots].set(logits_rows),
        n_past=state.n_past.at[slots].set(init_lens),
        step=state.step.at[slots].set(0),
        active=state.active.at[slots].set(True).at[trash].set(False),
        tokens_out=state.tokens_out,
        length=state.length.at[slots].set(0),
        sum_logprobs=state.sum_logprobs.at[slots].set(0.0),
        last_tok=state.last_tok.at[slots].set(-1),
        prev_tok=state.prev_tok.at[slots].set(-1),
        last_ts=state.last_ts.at[slots].set(-1),
        max_new_row=state.max_new_row.at[slots].set(max_news),
        no_speech=state.no_speech.at[slots].set(nosp_rows),
        rounds=state.rounds, accepted=state.accepted,
    )
    return (new_state, scat1(cross_k_pool, ck_rows),
            scat1(cross_v_pool, cv_rows),
            scat1(cross_dk_pool, dck_rows),
            scat1(cross_dv_pool, dcv_rows))


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "dcfg", "use_flash", "quantize", "pool_ctx",
                     "nosp"))
def _encode_prefill_spec(params, dparams, wins, tokens, lengths, sot_idx,
                         cfg: WhisperConfig, dcfg: WhisperConfig,
                         use_flash: bool, quantize: bool, pool_ctx: int,
                         nosp: int):
    """engine._encode_prefill plus the draft half: the draft's cross memory
    projects from the TARGET's hidden state (shared frozen encoder — no
    second encoder forward), and the draft cache prefills on the same
    prompt. Still ONE dispatch for the whole admission device side."""
    from ..model.encoder import cross_kv_from_hidden, encode

    enc = encode(params, wins, cfg, use_flash=use_flash, quantize_kv=quantize)
    dck, dcv = cross_kv_from_hidden(dparams, enc.hidden, dcfg)
    bucket = wins.shape[0]
    if quantize:
        from ..model.quant import init_quant_cache

        cache = KVCache(*init_quant_cache(cfg, bucket, ctx=pool_ctx))
    else:
        dtype = getattr(enc.cross_k, "data", enc.cross_k).dtype
        cache = init_cache(cfg, bucket, dtype=dtype, ctx=pool_ctx)
    logits_all, cache = decode_step(
        params, tokens, jnp.int32(0), cache, enc.cross_k, enc.cross_v, cfg)
    dcache = init_cache(dcfg, bucket, dtype=dck.dtype, ctx=pool_ctx)
    _, dcache = decode_step(
        dparams, tokens, jnp.int32(0), dcache, dck, dcv, dcfg)
    rows = jnp.arange(bucket)
    first_logits = logits_all[rows, lengths - 1].astype(jnp.float32)
    probs_sot = jax.nn.softmax(
        logits_all[rows, sot_idx].astype(jnp.float32), axis=-1)
    return (enc.cross_k, enc.cross_v, dck, dcv, cache, dcache,
            first_logits, probs_sot[:, nosp])


class SpecSlotEngine(SlotEngine):
    """Greedy continuous batching with speculative gamma-token verify chunks.

    ``draft`` is either a ``training.distill.save_draft`` .npz path (loaded
    against this model's params — shared encoder) or a ``(params, config)``
    pair whose config shares the target's vocab. ``chunk_steps`` keeps its
    engine meaning (max tokens per chunk); each chunk runs
    ceil(chunk_steps / gamma) verify rounds, each emitting 1..gamma tokens.

    Everything else — bucketed admission, the slot pool, all four harvest
    schedules including 'overlapped' staging, long-form
    ``transcribe_streams`` with prompt carry and the t>0 fallback ladder —
    is inherited from SlotEngine; only the chunk/refill/prefill programs
    carry the extra draft state. Token-identical to the greedy SlotEngine
    in exact arithmetic at ANY acceptance rate (tests/test_spec_engine.py
    gates both extremes on CPU)."""

    def __init__(self, model, draft, n_slots: int = 8,
                 options=None, chunk_steps: int = 8,
                 max_new_tokens: Optional[int] = None,
                 use_flash: Optional[bool] = None, quantize: bool = False,
                 mesh=None, admit_buckets=None,
                 schedule: str = "overlapped", gamma: int = 4,
                 audio_ctx: Optional[int] = None):
        if gamma < 2:
            raise ValueError("gamma >= 2 (gamma-1 draft proposals per round)")
        if mesh is not None:
            raise ValueError(
                "SpecSlotEngine is single-chip for now (the draft pools are "
                "not wired through the tp shard specs); use SlotEngine for "
                "tensor-parallel serving")
        if isinstance(draft, (str,)):
            from ..training.distill import load_draft

            dparams, dcfg = load_draft(draft, model.params, model.config)
        else:
            dparams, dcfg = draft
        if dcfg.n_vocab != model.config.n_vocab:
            raise ValueError("draft and target must share the vocabulary")
        self.gamma = gamma
        self.draft_cfg = dcfg
        self.draft_params = dparams
        super().__init__(model, n_slots=n_slots, options=options,
                         chunk_steps=chunk_steps,
                         max_new_tokens=max_new_tokens, use_flash=use_flash,
                         quantize=quantize, mesh=None,
                         admit_buckets=admit_buckets, schedule=schedule,
                         audio_ctx=audio_ctx)
        # the draft decoder gets the same QKV fusion as the target
        from ..model.quant import fuse_decoder_qkv

        if "qkv_w" not in self.draft_params["decoder"]["blocks"]:
            self.draft_params = fuse_decoder_qkv(self.draft_params)
        # verify blocks write up to gamma-1 columns past the last accepted
        # position; give the pool that slack (device_speculative ctx rule)
        w = self._padded_init.shape[1]
        self.pool_ctx = min(w + self.max_new + gamma + 8,
                            self.cfg.n_text_ctx)
        self.max_new = min(self.max_new, self.pool_ctx - w - gamma)
        self._chunk_rounds = max(1, -(-chunk_steps // gamma))
        self._cross_pool_dk = None
        self._cross_pool_dv = None

    def _align_pool_ctx(self, needed: int) -> int:
        # long-form streams grow the pool for wrapped prompts; keep the
        # verify-block slack on top (see __init__)
        return min(needed + self.gamma, self.cfg.n_text_ctx)

    def _check_hbm_budget(self, pool_ctx: Optional[int] = None) -> None:
        from ..config import check_serving_hbm

        d, S = self.draft_cfg, self.n_slots + 1
        c = pool_ctx if pool_ctx is not None else self.pool_ctx
        # draft pools ride on top of the target estimate: bf16 cross rows
        # (L_d layers) + bf16 draft KV + one admission bucket of both
        eb = self._ADMIT_BUCKETS[0]
        dcross = 2 * d.n_text_layer * (S + eb) * d.n_audio_state \
            * d.n_audio_ctx * 2
        dkv = 2 * d.n_text_layer * (S + eb) * d.n_text_state * c * 2
        check_serving_hbm(
            self.cfg, S, ctx=c,
            kv_dtype_bytes=1 if self.quantize else 2,
            enc_batch=eb, engine=True, extra_bytes=dcross + dkv,
            what=(f"SpecSlotEngine(n_slots={self.n_slots}, "
                  f"gamma={self.gamma}, quantize={self.quantize}, "
                  f"draft={d.n_text_layer}L)"))

    def _init_state(self, cache_dtype):
        S, cfg = self.n_slots + 1, self.cfg
        cache = self._fresh_cache(S, cache_dtype)
        dcache = init_cache(self.draft_cfg, S, dtype=self._draft_dtype,
                            ctx=self.pool_ctx)
        self._state = SpecEngineState(
            cache_k=cache.k, cache_v=cache.v,
            cache_dk=dcache.k, cache_dv=dcache.v,
            logits=jnp.zeros((S, cfg.n_vocab), jnp.float32),
            n_past=jnp.zeros((S,), jnp.int32),
            step=jnp.zeros((S,), jnp.int32),
            active=jnp.zeros((S,), bool),
            tokens_out=jnp.full((S, self.max_new), -1, jnp.int32),
            length=jnp.zeros((S,), jnp.int32),
            sum_logprobs=jnp.zeros((S,), jnp.float32),
            last_tok=jnp.full((S,), -1, jnp.int32),
            prev_tok=jnp.full((S,), -1, jnp.int32),
            last_ts=jnp.full((S,), -1, jnp.int32),
            max_new_row=jnp.full((S,), self.max_new, jnp.int32),
            no_speech=jnp.zeros((S,), jnp.float32),
            rounds=jnp.int32(0), accepted=jnp.int32(0),
        )

    def _encode_bucket(self, wins, bucket: int, tokens=None, lengths=None,
                       sot_idx=None, max_news=None) -> dict:
        if tokens is None:
            tokens = jnp.broadcast_to(
                self._padded_init, (bucket, self._padded_init.shape[1]))
            lengths = jnp.full((bucket,), self.init_len, jnp.int32)
            sot_idx = jnp.full((bucket,), self.sot_index, jnp.int32)
        if max_news is None:
            max_news = jnp.full((bucket,), self.max_new, jnp.int32)
        (ck, cv, dck, dcv, cache, dcache, first_logits,
         nosp) = _encode_prefill_spec(
            self.params, self.draft_params, wins, tokens, lengths, sot_idx,
            self.cfg, self.draft_cfg, self.use_flash, self.quantize,
            self.pool_ctx, self._nosp_token())
        if self._state is None:
            self._draft_dtype = dck.dtype
            self._init_state(getattr(ck, "data", ck).dtype)
        if self._cross_pool_k is None:
            def pool_like(row):
                return jax.tree.map(
                    lambda a: jnp.zeros(
                        (a.shape[0], self.n_slots + 1) + a.shape[2:],
                        a.dtype), row)

            self._cross_pool_k = pool_like(ck)
            self._cross_pool_v = pool_like(cv)
            self._cross_pool_dk = pool_like(dck)
            self._cross_pool_dv = pool_like(dcv)
        return {"bucket": bucket, "ck": ck, "cv": cv, "dck": dck,
                "dcv": dcv, "cache": cache, "dcache": dcache,
                "logits": first_logits, "lengths": lengths,
                "max_news": max_news, "nosp": nosp}

    def _install_rows(self, staged: dict, slot_list, rows) -> None:
        bucket = staged["bucket"]
        slot_arr = np.full((bucket,), self.n_slots, np.int32)
        slot_arr[np.asarray(rows, np.int32)] = np.asarray(slot_list, np.int32)
        (self._state, self._cross_pool_k, self._cross_pool_v,
         self._cross_pool_dk, self._cross_pool_dv) = _refill_many_spec(
            self._state, self._cross_pool_k, self._cross_pool_v,
            self._cross_pool_dk, self._cross_pool_dv,
            jnp.asarray(slot_arr), staged["ck"], staged["cv"],
            staged["dck"], staged["dcv"],
            staged["cache"].k, staged["cache"].v,
            staged["dcache"].k, staged["dcache"].v,
            staged["logits"], staged["lengths"], staged["max_news"],
            staged["nosp"])

    @_under_mesh
    def _stream_chunk_snapshot(self, topts):
        from .engine import _snapshot

        self._state = _decode_chunk_spec(
            self.params, self.draft_params, self._state,
            self._cross_pool_k, self._cross_pool_v,
            self._cross_pool_dk, self._cross_pool_dv,
            self.sup_mask, self.blank_mask, self.cfg, self.draft_cfg,
            rounds=self._chunk_rounds, gamma=self.gamma,
            use_timestamps=not topts.without_timestamps,
            max_initial_index=self.max_initial_index,
        )
        return _snapshot(
            self._state.active, self._state.length,
            self._state.sum_logprobs, self._state.tokens_out,
            self._state.no_speech)

    def spec_stats(self) -> dict:
        """Cumulative device-side speculative counters (one small pull)."""
        if self._state is None:
            return {"rounds": 0, "accepted": 0}
        r, a = jax.device_get((self._state.rounds, self._state.accepted))
        return {"rounds": int(r), "accepted": int(a)}
