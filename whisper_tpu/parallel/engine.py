"""Continuous-batching serving engine with a paged per-slot KV pool.

The lockstep ``BatchTranscriber`` (serving.py) drains a whole batch before
admitting new work; real serving has streams arriving and finishing at
different times. This engine keeps a FIXED device-resident pool of S slots —
KV cache, cross memory, logits, rule state — and decodes all active slots
together in compiled chunks of Q tokens while each slot carries its own
position counter (``n_past`` is a vector; model/decoder.py's ragged path).
When a slot finishes, its row is refilled from the request queue *between
chunks* with one jitted ``_refill`` call — no recompilation, no waiting for
the rest of the batch ("iteration-level scheduling" at chunk granularity).

Paging design note: Whisper decode contexts are small and statically bounded
(<= prefill + sample budget), so the pool page size is one slot-segment — the
vLLM-style sub-segment block table would add gather indirection to every
attention read and buy nothing here (no sequence ever grows past its page).
The reference's KV arena (main.rs:1336-1354) is the single-stream ancestor of
this pool.

Admissions are bucketed (16/8/4/2/1): joiners share one stacked host->device
audio transfer, per-length vmapped mels, one encode/prefill forward, and one
fixed-size scatter install per bucket (partial buckets pad into a trash row,
so each bucket size is exactly one compiled program). Results are
token-identical to the fused single-segment device loop (tests/test_engine.py).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import WhisperConfig
from ..decoding.device_loop import LoopState, _apply_rules_device, build_masks
from ..decoding.result import DecodingResult, compression_ratio
from ..decoding.task import DecodingOptions, DecodingTask, _pad_to_bucket
from ..frontend.mel import frame_count, log_mel_spectrogram, mel_window
from ..model.decoder import KVCache, decode_step, init_cache
from ..model.encoder import encode

NEG = jnp.float32(-1e30)


class EngineState(NamedTuple):
    cache_k: jnp.ndarray      # (S, L, H, D, C) slot KV pool (batch-leading:
                              # a slot's cache is contiguous, so refills are
                              # single-span DMAs — see model/decoder.KVCache)
    cache_v: jnp.ndarray
    logits: jnp.ndarray       # (S, V) f32 — next-token logits per slot
    n_past: jnp.ndarray       # (S,) int32
    step: jnp.ndarray         # (S,) int32 — sampled tokens so far
    active: jnp.ndarray       # (S,) bool
    tokens_out: jnp.ndarray   # (S, GMAX) int32 (eot-padded)
    length: jnp.ndarray       # (S,) int32
    sum_logprobs: jnp.ndarray  # (S,) f32
    last_tok: jnp.ndarray     # (S,) rule state
    prev_tok: jnp.ndarray
    last_ts: jnp.ndarray


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "steps", "use_timestamps", "max_initial_index",
                     "max_new"),
    donate_argnames=("state",),  # multi-GB pools update in place
)
def _decode_chunk(
    params, state: EngineState, cross_k, cross_v, sup_mask, blank_mask,
    cfg: WhisperConfig, steps: int, use_timestamps: bool,
    max_initial_index: Optional[int], max_new: int,
):
    v = cfg.n_vocab
    eot = 50256 if v == 51864 else 50257
    beg = eot + 107 if v != 51866 else eot + 108
    not_ = beg - 1
    S = state.logits.shape[0]
    rows = jnp.arange(S)

    def body(st: EngineState, _):
        rule_state = LoopState(
            cache_k=None, cache_v=None, tokens_out=None,
            last_tok=st.last_tok, prev_tok=st.prev_tok, last_ts=st.last_ts,
            finished=None, length=None, sum_logprobs=None, key=None,
        )
        filt = _apply_rules_device(
            st.logits, st.step, rule_state, sup_mask, blank_mask,
            (eot, beg, not_, v), use_timestamps, max_initial_index,
        )
        logprobs = jax.nn.log_softmax(filt, axis=-1)
        nxt = jnp.argmax(filt, axis=-1).astype(jnp.int32)
        step_lp = jnp.take_along_axis(logprobs, nxt[:, None], axis=-1)[:, 0]
        nxt = jnp.where(st.active, nxt, eot)
        hit_cap = st.step + 1 >= max_new
        now_eot = st.active & ((nxt == eot) | hit_cap)
        sum_lp = st.sum_logprobs + jnp.where(st.active, step_lp, 0.0)
        # a non-EOT token counts toward the transcript even when it is the
        # budget-capped last one (device_loop's sample_len semantics)
        length = st.length + jnp.where(st.active & (nxt != eot), 1, 0)
        pos = jnp.clip(st.step, 0, st.tokens_out.shape[1] - 1)
        tokens_out = st.tokens_out.at[rows, pos].set(
            jnp.where(st.active, nxt, st.tokens_out[rows, pos])
        )
        is_ts = st.active & ~now_eot & (nxt >= beg)

        lg, cache = decode_step(
            params, nxt[:, None], st.n_past,
            KVCache(st.cache_k, st.cache_v), cross_k, cross_v, cfg,
        )
        new = EngineState(
            cache_k=cache.k, cache_v=cache.v,
            logits=lg[:, 0].astype(jnp.float32),
            n_past=st.n_past + jnp.where(st.active, 1, 0),
            step=st.step + jnp.where(st.active, 1, 0),
            active=st.active & ~now_eot,
            tokens_out=tokens_out, length=length, sum_logprobs=sum_lp,
            last_tok=jnp.where(st.active, nxt, st.last_tok),
            prev_tok=jnp.where(st.active, st.last_tok, st.prev_tok),
            last_ts=jnp.where(is_ts, nxt, st.last_ts),
        )
        return new, None

    state, _ = jax.lax.scan(body, state, None, length=steps)
    return state


@functools.partial(
    jax.jit, donate_argnames=("state", "cross_k_pool", "cross_v_pool"))
def _refill_many(state: EngineState, cross_k_pool, cross_v_pool,
                 slots, ck_rows, cv_rows, cache_k_rows, cache_v_rows,
                 logits_rows, n_init):
    """Install a whole admission bucket in ONE dispatch: scatter the
    prefilled KV rows, the encoder cross rows, and the per-slot state for
    every slot in ``slots`` ((n,) int32). On a tunneled chip, the per-slot
    _refill chain (3 dispatches x n streams) dominated admission wall time;
    this is the n-row scatter version of the same update. The pools are
    DONATED — without donation the scatter double-buffers the multi-GB
    cross pools and OOMs a 48-slot large-v3 engine."""
    scat0 = lambda p, r: jax.tree.map(lambda pp, rr: pp.at[slots].set(rr), p, r)
    scat1 = lambda p, r: jax.tree.map(
        lambda pp, rr: pp.at[:, slots].set(rr), p, r)
    n = logits_rows.shape[0]
    ones = jnp.ones((n,), jnp.int32)
    S = state.active.shape[0]  # includes the trash row at index S-1
    trash = S - 1
    new_state = EngineState(
        cache_k=scat0(state.cache_k, cache_k_rows),
        cache_v=scat0(state.cache_v, cache_v_rows),
        logits=state.logits.at[slots].set(logits_rows),
        n_past=state.n_past.at[slots].set(n_init * ones),
        step=state.step.at[slots].set(0),
        active=state.active.at[slots].set(True).at[trash].set(False),
        tokens_out=state.tokens_out,  # rows are read out before refill
        length=state.length.at[slots].set(0),
        sum_logprobs=state.sum_logprobs.at[slots].set(0.0),
        last_tok=state.last_tok.at[slots].set(-1),
        prev_tok=state.prev_tok.at[slots].set(-1),
        last_ts=state.last_ts.at[slots].set(-1),
    )
    return (new_state, scat1(cross_k_pool, ck_rows),
            scat1(cross_v_pool, cv_rows))


@jax.jit
def _snapshot(active, length, sum_logprobs, tokens_out):
    """Fresh-buffer copies of the per-round harvest arrays (~KBs). The
    decode chunk DONATES the engine state, so these must not alias it —
    without donation on this jit, XLA materializes genuine copies."""
    return (jnp.copy(active), jnp.copy(length),
            jnp.copy(sum_logprobs), jnp.copy(tokens_out))


class SlotEngine:
    """Greedy continuous-batching transcription over a fixed slot pool."""

    def __init__(
        self,
        model,
        n_slots: int = 8,
        options: Optional[DecodingOptions] = None,
        chunk_steps: int = 8,
        max_new_tokens: Optional[int] = None,
        use_flash: Optional[bool] = None,
        quantize: bool = False,
    ):
        if options is not None and (options.beam_size or (options.best_of or 1) != 1
                                    or options.temperature != 0):
            raise ValueError("SlotEngine is greedy-only; use decode_full for beams")
        self.model = model
        self.cfg = model.config
        self.vocab = model.vocab
        self.n_slots = n_slots
        self.chunk_steps = chunk_steps
        self.options = options or DecodingOptions()
        self.quantize = quantize  # int8 cross pool + KV pool (serving mode)
        self.use_flash = (jax.default_backend() == "tpu"
                          if use_flash is None else use_flash)

        task = DecodingTask(self.cfg, self.vocab, self.options)
        self.initial_tokens = task.initial_tokens
        self.sot_index = task.sot_index
        self.max_new = max_new_tokens or task.sample_len
        padded, self.init_len = _pad_to_bucket(
            np.tile(np.array(self.initial_tokens, np.int32), (1, 1)))
        self._padded_init = jnp.asarray(padded)
        # slot-pool context: prefill + generation budget (+EOT slack)
        self.pool_ctx = min(padded.shape[1] + self.max_new + 8,
                            self.cfg.n_text_ctx)
        self.max_new = min(self.max_new, self.pool_ctx - padded.shape[1])

        self.sup_mask, self.blank_mask = build_masks(
            self.vocab, suppress_tokens=self.options.suppress_tokens)
        if not self.options.suppress_blank:
            self.blank_mask = jnp.zeros_like(self.blank_mask)
        self.max_initial_index = None
        if (self.options.max_initial_timestamp is not None
                and not self.options.without_timestamps):
            self.max_initial_index = round(self.options.max_initial_timestamp / 0.02)

        self._n_frames = 2 * self.cfg.n_audio_ctx
        self._cross_pool_k = None  # lazily sized (L, S, H, D, Ta)
        self._cross_pool_v = None
        self._state: Optional[EngineState] = None

    # -- stream admission (bucketed: joiners encode/prefill together) --

    # Admission bucket sizes (largest first). Encoder MXU utilization climbs
    # steeply with batch on large models, so joiners share as large an
    # encode/prefill call as the queue allows; each bucket is one compiled
    # shape (cached). 16 is the largest that leaves the encoder's 1500-ctx
    # activations room next to a 48-slot int8 pool on a 16 GB chip.
    _ADMIT_BUCKETS = (16, 8, 4, 2, 1)

    def _encode_batch(self, audios: Sequence[np.ndarray], bucket: int):
        """Encode up to ``bucket`` streams in one forward (padded; only the
        first len(audios) rows are meaningful). Admission cost on remote
        chips is dominated by host->device transfers and dispatches, so the
        bucket's audio ships as ONE stacked transfer; mel stays per-stream
        (on device slices of the stack) because its reflect-padding and
        global max-normalization are per-stream exact — tested
        token-identical to the offline pipeline."""
        arrs = [np.asarray(a, np.float32) for a in audios]
        max_len = max(len(a) for a in arrs)
        stacked = np.zeros((len(arrs), max_len), np.float32)
        for i, a in enumerate(arrs):
            stacked[i, : len(a)] = a
        audio_dev = jnp.asarray(stacked)  # one transfer for the bucket
        # One vmapped mel per distinct length (vmap preserves the
        # per-stream reflect padding and global max-normalization exactly;
        # same-length streams share a single dispatch).
        by_len: dict = {}
        for i, a in enumerate(arrs):
            by_len.setdefault(len(a), []).append(i)
        win_rows: List[Optional[jnp.ndarray]] = [None] * len(arrs)
        for ln, idxs in by_len.items():
            group = audio_dev[jnp.asarray(idxs, jnp.int32), :ln]
            mels = jax.vmap(
                lambda a: log_mel_spectrogram(
                    a, self.model.filters, frame_count(ln))
            )(group)
            wins_g = jax.vmap(
                lambda m: mel_window(m, 0, self._n_frames))(mels)
            for j, i in enumerate(idxs):
                win_rows[i] = wins_g[j]
        wins = jnp.stack(win_rows)
        if len(audios) < bucket:
            wins = jnp.concatenate(
                [wins, jnp.zeros((bucket - len(audios),) + wins.shape[1:],
                                 wins.dtype)])
        enc = encode(self.model.params, wins, self.cfg, use_flash=self.use_flash,
                     quantize_kv=self.quantize)
        return enc.cross_k, enc.cross_v  # (L, bucket, H, D, Ta)

    def _fresh_cache(self, batch: int, dtype):
        if self.quantize:
            from ..model.quant import init_quant_cache

            return KVCache(*init_quant_cache(self.cfg, batch, ctx=self.pool_ctx))
        return init_cache(self.cfg, batch, dtype=dtype, ctx=self.pool_ctx)

    def _prefill_batch(self, cross_k, cross_v, bucket: int):
        """Prefill the shared initial tokens for a whole admission bucket."""
        dtype = getattr(cross_k, "data", cross_k).dtype
        cache = self._fresh_cache(bucket, dtype)
        tokens = jnp.broadcast_to(
            self._padded_init, (bucket, self._padded_init.shape[1]))
        logits_all, cache = decode_step(
            self.model.params, tokens, jnp.int32(0), cache,
            cross_k, cross_v, self.cfg)
        first_logits = logits_all[:, self.init_len - 1].astype(jnp.float32)
        return cache, first_logits

    def _init_state(self, cache_dtype):
        # One extra TRASH row (index n_slots): bucket installs are always
        # full fixed-size scatters — unused entries land in the trash row,
        # so every admission compiles exactly one program per bucket size
        # instead of one per (bucket, fill-count) pair.
        S, cfg = self.n_slots + 1, self.cfg
        cache = self._fresh_cache(S, cache_dtype)
        self._state = EngineState(
            cache_k=cache.k, cache_v=cache.v,
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
        )

    def _admit_many(self, slots: Sequence[int], audios: Sequence[np.ndarray]):
        """Admit several streams with shared encode/prefill calls (one bucket
        at a time, largest first), then install each into its slot."""
        i = 0
        while i < len(slots):
            remaining = len(slots) - i
            # Smallest bucket that covers the remainder: a partial bucket
            # shares ONE encode/prefill (padded rows land in the trash row)
            # instead of cascading into ever-smaller dispatch chains — on a
            # tunneled chip the extra dispatch latency costs more than the
            # padded encoder rows. Remainders past the largest bucket take
            # the largest and loop.
            bucket = next(
                (b for b in reversed(self._ADMIT_BUCKETS) if b >= remaining),
                self._ADMIT_BUCKETS[0])
            n = min(bucket, remaining)
            ck, cv = self._encode_batch(audios[i : i + n], bucket)
            if self._state is None:
                self._init_state(getattr(ck, "data", ck).dtype)
            if self._cross_pool_k is None:
                def pool_like(row):
                    return jax.tree.map(
                        lambda a: jnp.zeros(
                            (a.shape[0], self.n_slots + 1) + a.shape[2:],
                            a.dtype),
                        row,
                    )

                self._cross_pool_k = pool_like(ck)
                self._cross_pool_v = pool_like(cv)
            cache, first_logits = self._prefill_batch(ck, cv, bucket)
            # Install the whole bucket in one FIXED-SIZE dispatch (cross
            # memory is layer-leading (L, B, ...); the KV cache is
            # batch-leading (B, L, ...) so a slot row is contiguous).
            # Partially-filled buckets pad their slot vector with the trash
            # row, so each bucket size is exactly one compiled program.
            pad = [self.n_slots] * (bucket - n)
            slot_vec = jnp.asarray(
                np.array(list(slots[i : i + n]) + pad, np.int32))
            self._state, self._cross_pool_k, self._cross_pool_v = _refill_many(
                self._state, self._cross_pool_k, self._cross_pool_v,
                slot_vec, ck, cv, cache.k, cache.v,
                first_logits, jnp.int32(self.init_len))
            i += n
            if i < len(slots):
                # Bound in-flight admissions to ONE bucket: each holds ~2 GB
                # of encoder cross rows on large-v3, and letting several
                # queue asynchronously OOMs next to the resident pools.
                jax.device_get(self._state.n_past[:1])

    def _harvest(self, slot: int, tokens_out, length, sum_logprobs
                 ) -> DecodingResult:
        """Build a result from HOST copies of the state arrays — the caller
        pulls them once per scheduler round (per-slot device reads cost a
        full round-trip each on remote chips)."""
        n = int(length[slot])
        seq = [int(t) for t in tokens_out[slot, :n]]
        sum_lp = float(sum_logprobs[slot])
        text = self.vocab.decode(seq).strip()
        return DecodingResult(
            tokens=seq, text=text,
            avg_logprob=sum_lp / (len(seq) + 1),
            no_speech_prob=0.0,  # engine skips the no-speech gate (serving)
            temperature=0.0,
            compression_ratio=compression_ratio(text),
        )

    # -- the scheduler loop --

    def transcribe_many(self, audios: Sequence[np.ndarray]) -> List[DecodingResult]:
        """Drain a queue of independent 30 s-or-shorter streams; results are
        returned in submission order. Slots are refilled as they free up.

        The loop is PIPELINED one round deep: after dispatching chunk N the
        host harvests the (already computed) snapshot of chunk N-1, admits
        into the slots it freed, and only then blocks on N's snapshot next
        round. JAX dispatch is asynchronous, so the admission's host work
        (audio stacking, transfers, dispatch latency — ~25 ms RTT per
        dispatch on a tunneled chip) overlaps chunk N's device time instead
        of serializing with it; a finished stream is detected one chunk
        late, which costs nothing on-device (inactive rows decode anyway)
        and one chunk of slot idleness off the freed slot.

        Phase wall-times accumulate in ``self.stats`` (admit / chunk / pull
        seconds + round count) so serving deployments can see where the
        scheduler spends its budget."""
        import time as _time

        queue = list(enumerate(audios))
        results: List[Optional[DecodingResult]] = [None] * len(queue)
        slot_req = [-1] * self.n_slots  # request index per slot
        queue.reverse()  # pop() from the front
        self.stats = {"admit_s": 0.0, "chunk_s": 0.0, "pull_s": 0.0, "rounds": 0}
        snap = None  # (req_map, device snapshot) of the previous round

        while queue or any(r >= 0 for r in slot_req) or snap is not None:
            # fill slots freed as of the last harvested snapshot (batched
            # admission: joiners share encode/prefill)
            join_slots, join_audios = [], []
            for s in range(self.n_slots):
                if slot_req[s] < 0 and queue:
                    idx, audio = queue.pop()
                    join_slots.append(s)
                    join_audios.append(audio)
                    slot_req[s] = idx
            if join_slots:
                t0 = _time.perf_counter()
                self._admit_many(join_slots, join_audios)
                self.stats["admit_s"] += _time.perf_counter() - t0
            # dispatch one decode chunk for all slots (async)
            if any(r >= 0 for r in slot_req):
                t0 = _time.perf_counter()
                self._state = _decode_chunk(
                    self.model.params, self._state,
                    self._cross_pool_k, self._cross_pool_v,
                    self.sup_mask, self.blank_mask, self.cfg,
                    steps=self.chunk_steps,
                    use_timestamps=not self.options.without_timestamps,
                    max_initial_index=self.max_initial_index,
                    max_new=self.max_new,
                )
                # Small COPIES of the harvest arrays (_decode_chunk donates
                # the state, so next round's chunk invalidates these buffers
                # — the snapshot must own fresh ones).
                new_snap = (list(slot_req), _snapshot(
                    self._state.active, self._state.length,
                    self._state.sum_logprobs, self._state.tokens_out))
                self.stats["chunk_s"] += _time.perf_counter() - t0
            else:
                new_snap = None
            # harvest the PREVIOUS round's snapshot — its device work
            # finished before this round's chunk started, so the pull
            # does not wait on the in-flight chunk.
            if snap is not None:
                req_map, arrs = snap
                t0 = _time.perf_counter()
                active, length, sum_lp, toks = jax.device_get(arrs)
                self.stats["pull_s"] += _time.perf_counter() - t0
                for s in range(self.n_slots):
                    if (req_map[s] >= 0 and not active[s]
                            and slot_req[s] == req_map[s]):
                        results[req_map[s]] = self._harvest(
                            s, toks, length, sum_lp)
                        slot_req[s] = -1
            snap = new_snap
            self.stats["rounds"] += 1
        return results  # type: ignore[return-value]
