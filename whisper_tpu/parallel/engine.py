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
from ..io.vocab import device_special_ids
from ..decoding.device_loop import LoopState, _apply_rules_device, build_masks
from ..decoding.result import DecodingResult, compression_ratio
from ..decoding.task import (DecodingOptions, DecodingTask, _pad_to_bucket,
                             decode_full)
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
    max_new_row: jnp.ndarray  # (S,) int32 — per-slot sample budget (prompts
                              # shorten it: offline clamps sample_len to
                              # n_text_ctx - padded prompt, task.py:354)
    no_speech: jnp.ndarray    # (S,) f32 — P(no-speech) at the window's SOT
                              # position, set at refill (gate input)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "steps", "use_timestamps", "max_initial_index"),
    donate_argnames=("state",),  # multi-GB pools update in place
)
def _decode_chunk(
    params, state: EngineState, cross_k, cross_v, sup_mask, blank_mask,
    cfg: WhisperConfig, steps: int, use_timestamps: bool,
    max_initial_index: Optional[int],
):
    v = cfg.n_vocab
    eot, beg, not_, _nosp = device_special_ids(v)
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
        hit_cap = st.step + 1 >= st.max_new_row
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
            max_new_row=st.max_new_row,
            no_speech=st.no_speech,
        )
        return new, None

    # while_loop with an all-finished early exit instead of a fixed scan:
    # windows end before the sample budget (EOT), so the tail chunks of a
    # generation otherwise decode 16 steps of fully-inactive rows. Identity
    # is exact — inactive rows are frozen by construction, so skipped steps
    # compute nothing.
    def wbody(carry):
        st, i = carry
        new, _ = body(st, None)
        return new, i + 1

    state, _ = jax.lax.while_loop(
        lambda c: (c[1] < steps) & jnp.any(c[0].active),
        wbody, (state, jnp.int32(0)))
    return state


@functools.partial(
    jax.jit, donate_argnames=("state", "cross_k_pool", "cross_v_pool"))
def _refill_many(state: EngineState, cross_k_pool, cross_v_pool,
                 slots, ck_rows, cv_rows, cache_k_rows, cache_v_rows,
                 logits_rows, init_lens, max_news, nosp_rows):
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
    S = state.active.shape[0]  # includes the trash row at index S-1
    trash = S - 1
    new_state = EngineState(
        cache_k=scat0(state.cache_k, cache_k_rows),
        cache_v=scat0(state.cache_v, cache_v_rows),
        logits=state.logits.at[slots].set(logits_rows),
        n_past=state.n_past.at[slots].set(init_lens),
        step=state.step.at[slots].set(0),
        active=state.active.at[slots].set(True).at[trash].set(False),
        tokens_out=state.tokens_out,  # rows are read out before refill
        length=state.length.at[slots].set(0),
        sum_logprobs=state.sum_logprobs.at[slots].set(0.0),
        last_tok=state.last_tok.at[slots].set(-1),
        prev_tok=state.prev_tok.at[slots].set(-1),
        last_ts=state.last_ts.at[slots].set(-1),
        max_new_row=state.max_new_row.at[slots].set(max_news),
        no_speech=state.no_speech.at[slots].set(nosp_rows),
    )
    return (new_state, scat1(cross_k_pool, ck_rows),
            scat1(cross_v_pool, cv_rows))


@functools.partial(jax.jit, static_argnames=("n_frames",))
def _mel_windows(audio, filters, n_frames: int):
    """(G, n_samples) same-length stacked audio -> (G, n_mels, n_frames)
    30 s windows at offset 0, in ONE dispatch (mel + window + pad fused —
    the eager per-stream mel/window chain cost ~2-3 round-trips per length
    group on a tunneled chip). Per-stream reflect padding and global
    max-normalization are preserved exactly (vmap).

    int16 input is converted on DEVICE (pcm/32768, the io/wav convention,
    main.rs:1673-1679): real audio is 16-bit PCM natively, and shipping
    int16 quarters the host->device bytes — the measured bottleneck of
    engine admission on the tunneled chip."""

    def one(a):
        if a.dtype == jnp.int16:
            a = a.astype(jnp.float32) / 32768.0
        m = log_mel_spectrogram(a, filters, frame_count(a.shape[0]))
        n_len = m.shape[1]
        if n_len >= n_frames:
            return m[:, :n_frames]
        return jnp.pad(m, ((0, 0), (0, n_frames - n_len)))

    return jax.vmap(one)(audio)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "use_flash", "quantize", "pool_ctx", "nosp"))
def _encode_prefill(params, wins, tokens, lengths, sot_idx,
                    cfg: WhisperConfig, use_flash: bool, quantize: bool,
                    pool_ctx: int, nosp: int):
    """Encode one admission bucket + prefill its prompts + read the
    per-row first logits and no-speech probabilities — ONE dispatch for
    the whole admission device side (was ~6: encode, prefill, and an
    eager gather/softmax chain, each a round-trip on a tunneled chip)."""
    enc = encode(params, wins, cfg, use_flash=use_flash,
                 quantize_kv=quantize)
    bucket = wins.shape[0]
    if quantize:
        from ..model.quant import init_quant_cache

        cache = KVCache(*init_quant_cache(cfg, bucket, ctx=pool_ctx))
    else:
        dtype = getattr(enc.cross_k, "data", enc.cross_k).dtype
        cache = init_cache(cfg, bucket, dtype=dtype, ctx=pool_ctx)
    logits_all, cache = decode_step(
        params, tokens, jnp.int32(0), cache, enc.cross_k, enc.cross_v, cfg)
    rows = jnp.arange(bucket)
    first_logits = logits_all[rows, lengths - 1].astype(jnp.float32)
    probs_sot = jax.nn.softmax(
        logits_all[rows, sot_idx].astype(jnp.float32), axis=-1)
    return (enc.cross_k, enc.cross_v, cache, first_logits,
            probs_sot[:, nosp])


@jax.jit
def _snapshot(active, length, sum_logprobs, tokens_out, no_speech):
    """Fresh-buffer copies of the per-round harvest arrays (~KBs). The
    decode chunk DONATES the engine state, so these must not alias it —
    without donation on this jit, XLA materializes genuine copies."""
    return (jnp.copy(active), jnp.copy(length),
            jnp.copy(sum_logprobs), jnp.copy(tokens_out),
            jnp.copy(no_speech))


def _under_mesh(fn):
    """Run an engine method inside the engine's mesh context (no-op without
    a mesh): every jit traced inside sees the (dp, tp) axes, so the param
    shardings and decode_step's KV-layout constraints apply."""

    @functools.wraps(fn)
    def wrapped(self, *args, **kwargs):
        if self.mesh is None:
            return fn(self, *args, **kwargs)
        with jax.set_mesh(self.mesh):
            return fn(self, *args, **kwargs)

    return wrapped


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
        mesh=None,
        admit_buckets: Optional[Sequence[int]] = None,
        schedule: str = "overlapped",
        audio_ctx: Optional[int] = None,
    ):
        # Default schedule measured r5 (one-process interleaved blocks,
        # s64c16 prestaged, scripts/ab_engine_slots.py): overlapped 464.0
        # vs predictive 453.6 mean — staging the next bucket's encode
        # behind the in-flight chunk wins once the v2 fixes (predictive
        # early pull, deferred post-burst staging) landed.
        if options is not None and (options.beam_size or (options.best_of or 1) != 1
                                    or options.temperature != 0):
            raise ValueError("SlotEngine is greedy-only; use decode_full for beams")
        if audio_ctx is not None and not (
                0 < audio_ctx <= model.config.n_audio_ctx):
            raise ValueError(
                f"audio_ctx must be in (0, {model.config.n_audio_ctx}]")
        if schedule not in ("pipelined", "eager", "predictive", "overlapped"):
            raise ValueError(
                "schedule must be 'pipelined' (harvest one round late, "
                "device always fed), 'eager' (pull the previous snapshot "
                "before every admission), 'predictive' (eager only on "
                "rounds where a slot's token budget says it can have "
                "finished — the zero-idle-chunk refill without paying the "
                "eager pull's device drain on no-finish rounds), or "
                "'overlapped' (stage the next admission bucket's "
                "encode/prefill BEHIND the in-flight decode chunk and "
                "install by scatter as slots free — admission host work "
                "and encode device time leave the critical path)")
        self.schedule = schedule
        self.model = model
        self.cfg = model.config
        self.vocab = model.vocab
        self.n_slots = n_slots
        # Tensor-parallel serving: a (dp=1, tp=N) Mesh shards attention
        # heads / MLP hidden / vocab over tp for every engine program
        # (decode_step pins the KV-pool layouts via constrain_cache/cross;
        # sharding.py has the param specs). The slot axis stays unsharded —
        # slots join/leave by row scatter, which must stay a local DMA.
        self.mesh = mesh
        self.params = model.params
        if mesh is not None:
            if mesh.shape.get("dp", 1) != 1:
                raise ValueError(
                    "SlotEngine shards tensor-parallel only; use a dp=1 "
                    "mesh (slots are the batch axis and must stay local)")
            from .sharding import shard_params

            already = any(
                isinstance(getattr(leaf, "sharding", None),
                           jax.sharding.NamedSharding)
                and leaf.sharding.mesh == mesh
                for leaf in jax.tree.leaves(model.params))
            self.params = (model.params if already
                           else shard_params(model.params, mesh))
        else:
            # Unsharded serving: fuse each block's Q/K/V into one matmul —
            # bit-identical outputs, two fewer fusions on the per-layer
            # sequencing floor (quant.fuse_decoder_qkv; tp keeps the split
            # weights — the specs shard Q/K/V by head).
            from ..model.quant import fuse_decoder_qkv

            if "qkv_w" not in self.params["decoder"]["blocks"]:
                self.params = fuse_decoder_qkv(self.params)
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
        # transcribe_many restores these at entry: _prepare_streams
        # re-derives the live masks from per-call TranscribeOptions, which
        # must not silently leak into later constructor-options decodes
        self._option_masks = (self.sup_mask, self.blank_mask,
                              self.max_initial_index)

        if admit_buckets is not None:
            self._ADMIT_BUCKETS = tuple(
                sorted({int(b) for b in admit_buckets}, reverse=True))
        # Engine-wide audio-context override (the reference's
        # exp_n_audio_ctx, main.rs:362, 1803-1807 — a STATIC per-run knob
        # there too): every window encodes only the first audio_ctx
        # positions, the cross pools size to it (they are lazily shaped
        # from the first encode), and decode's cross reads — ~85% of the
        # decode floor — shrink proportionally. Per-WINDOW 'auto' bucketing
        # stays offline-only by measured arithmetic: serving mixed widths
        # needs either per-row masking (saves no HBM reads) or a second
        # chunk program per width class, whose duplicated ~10 ms/step
        # row-independent scan cost exceeds the tail windows' cross
        # savings at engine batch (docs/ROADMAP.md r5).
        self.audio_ctx = audio_ctx
        # Refuse configurations whose pools cannot fit the chip BEFORE any
        # allocation or compile (the reference's MEM_REQ intent,
        # main.rs:119-189): an oversized slot/beam count otherwise crashes
        # or hangs the worker mid-allocation (measured, BASELINE.md).
        self._check_hbm_budget()
        self._n_frames = 2 * (audio_ctx or self.cfg.n_audio_ctx)
        self._cross_pool_k = None  # lazily sized (L, S, H, D, Ta)
        self._cross_pool_v = None
        self._state: Optional[EngineState] = None

    def _check_hbm_budget(self, pool_ctx: Optional[int] = None) -> None:
        """config.check_serving_hbm over THIS engine's geometry (slot pool
        + trash row, beam width, admission bucket transient). tp shards the
        pools over the mesh, so the per-chip estimate divides by tp."""
        from ..config import check_serving_hbm

        tp = self.mesh.shape.get("tp", 1) if self.mesh is not None else 1
        beam = getattr(self, "beam_size", None) or 1
        check_serving_hbm(
            self.cfg, -(-(self.n_slots + 1) // tp),
            beam=beam,
            ctx=pool_ctx if pool_ctx is not None else self.pool_ctx,
            kv_dtype_bytes=1 if self.quantize else 2,
            enc_batch=-(-self._ADMIT_BUCKETS[0] // tp), engine=True,
            what=(f"{type(self).__name__}(n_slots={self.n_slots}, "
                  f"beam={beam}, quantize={self.quantize})"))

    # -- stream admission (bucketed: joiners encode/prefill together) --

    # Admission bucket sizes (largest first). Encoder MXU utilization climbs
    # steeply with batch on large models, so joiners share as large an
    # encode/prefill call as the queue allows; each bucket is one compiled
    # shape (cached). 16 is the default cap: the largest that leaves the
    # encoder's 1500-ctx activations room next to a 48-slot int8 pool on a
    # 16 GB chip. Overridable per engine (``admit_buckets``) for smaller
    # pools / bigger chips.
    _ADMIT_BUCKETS = (16, 8, 4, 2, 1)

    def _window_batch(self, audios: Sequence[np.ndarray], bucket: int):
        """(bucket, n_mels, n_frames) stacked 30 s windows for up to
        ``bucket`` streams (zero rows pad the tail). Admission cost on
        remote chips is dominated by host->device transfers and dispatch
        round-trips, so the bucket's audio ships as ONE stacked transfer
        and mel+window run as ONE fused dispatch per distinct length
        (per-stream reflect padding / global max-normalization exact —
        tested token-identical to the offline pipeline).

        Device-resident inputs (jax.Array) skip the host staging entirely —
        the path for serving stacks where audio lands on-device upstream
        (network receive -> device DMA) and for measuring the engine's
        device floor without the tunnel's host->device wall."""
        if all(isinstance(a, jax.Array) for a in audios):
            return self._window_batch_device(audios, bucket)
        arrs = [np.asarray(a) for a in audios]
        # Preserve int16 PCM end-to-end (device-side /32768 in _mel_windows
        # is bit-identical to the host conversion): 4x fewer bytes over the
        # slow tunnel. Mixed dtypes fall back to f32.
        dtype = (np.int16 if all(a.dtype == np.int16 for a in arrs)
                 else np.float32)
        arrs = [a.astype(dtype, copy=False) for a in arrs]
        max_len = max(len(a) for a in arrs)
        stacked = np.zeros((len(arrs), max_len), dtype)
        for i, a in enumerate(arrs):
            stacked[i, : len(a)] = a
        audio_dev = jnp.asarray(stacked)  # one transfer for the bucket
        by_len: dict = {}
        for i, a in enumerate(arrs):
            by_len.setdefault(len(a), []).append(i)
        win_rows: List[Optional[jnp.ndarray]] = [None] * len(arrs)
        for ln, idxs in by_len.items():
            group = audio_dev[jnp.asarray(idxs, jnp.int32), :ln]
            wins_g = _mel_windows(group, self.model.filters, self._n_frames)
            for j, i in enumerate(idxs):
                win_rows[i] = wins_g[j]
        wins = jnp.stack(win_rows)
        if len(audios) < bucket:
            wins = jnp.concatenate(
                [wins, jnp.zeros((bucket - len(audios),) + wins.shape[1:],
                                 wins.dtype)])
        return wins

    def _window_batch_device(self, audios: Sequence[jax.Array], bucket: int):
        """Device-resident variant of ``_window_batch``: no host transfer,
        one fused mel dispatch per distinct length (same numerics — the
        int16 /32768 conversion and per-stream normalization live inside
        ``_mel_windows`` either way)."""
        by_len: dict = {}
        for i, a in enumerate(audios):
            by_len.setdefault(a.shape[0], []).append(i)
        win_rows: List[Optional[jnp.ndarray]] = [None] * len(audios)
        for ln, idxs in by_len.items():
            group = jnp.stack([audios[i] for i in idxs])
            wins_g = _mel_windows(group, self.model.filters, self._n_frames)
            for j, i in enumerate(idxs):
                win_rows[i] = wins_g[j]
        wins = jnp.stack(win_rows)
        if len(audios) < bucket:
            wins = jnp.concatenate(
                [wins, jnp.zeros((bucket - len(audios),) + wins.shape[1:],
                                 wins.dtype)])
        return wins

    def _fresh_cache(self, batch: int, dtype):
        if self.quantize:
            from ..model.quant import init_quant_cache

            return KVCache(*init_quant_cache(self.cfg, batch, ctx=self.pool_ctx))
        return init_cache(self.cfg, batch, dtype=dtype, ctx=self.pool_ctx)

    def _nosp_token(self) -> int:
        return device_special_ids(self.cfg.n_vocab)[3]

    def _shard_pool(self, tree):
        """Pin KV/cross pool leaves (heads on axis 2 in both the
        slot-leading (S,L,H,D,C) cache and the layer-leading (L,S,H,D,Ta)
        cross layout; 4-D leaves are int8 scales) to tp. Keeps the pools
        born sharded so the donated carries never reshard."""
        if self.mesh is None:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec as P

        def put(a):
            spec = (P(None, None, "tp", None, None) if a.ndim == 5
                    else P(None, None, "tp", None))
            return jax.device_put(a, NamedSharding(self.mesh, spec))

        return jax.tree.map(put, tree)

    def _init_state(self, cache_dtype):
        # One extra TRASH row (index n_slots): bucket installs are always
        # full fixed-size scatters — unused entries land in the trash row,
        # so every admission compiles exactly one program per bucket size
        # instead of one per (bucket, fill-count) pair.
        S, cfg = self.n_slots + 1, self.cfg
        cache = self._shard_pool(self._fresh_cache(S, cache_dtype))
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
            max_new_row=jnp.full((S,), self.max_new, jnp.int32),
            no_speech=jnp.zeros((S,), jnp.float32),
        )

    def _admit_many(self, slots: Sequence[int], audios: Sequence[np.ndarray]):
        """Admit several streams with shared encode/prefill calls (one bucket
        at a time, largest first), then install each into its slot.

        Phase sub-timers land in ``self.stats`` when present: ``stage_s``
        (host window staging: stacking + mel dispatch), ``install_s``
        (encode/prefill + refill dispatch) and ``admit_sync_s`` (the
        inter-bucket OOM-bounding waits — device encode time the host
        blocks on)."""
        import time as _time

        stats = getattr(self, "stats", None)
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
            t0 = _time.perf_counter()
            wins = self._window_batch(audios[i : i + n], bucket)
            t1 = _time.perf_counter()
            self._install_bucket(list(slots[i : i + n]), wins, bucket)
            t2 = _time.perf_counter()
            if stats is not None:
                stats["stage_s"] = stats.get("stage_s", 0.0) + (t1 - t0)
                stats["install_s"] = stats.get("install_s", 0.0) + (t2 - t1)
            i += n
            if i < len(slots):
                # Bound in-flight admissions to ONE bucket: each holds ~2 GB
                # of encoder cross rows on large-v3, and letting several
                # queue asynchronously OOMs next to the resident pools.
                jax.device_get(self._state.n_past[:1])
                if stats is not None:
                    stats["admit_sync_s"] = (stats.get("admit_sync_s", 0.0)
                                             + (_time.perf_counter() - t2))

    def _install_bucket(self, slot_list, wins, bucket: int,
                        tokens=None, lengths=None, sot_idx=None,
                        max_news=None):
        """Encode + prefill + install one admission bucket in TWO dispatches
        (_encode_prefill, then the fixed-size _refill_many scatter; cross
        memory is layer-leading (L, B, ...); the KV cache is batch-leading
        (B, L, ...) so a slot row is contiguous). Partially-filled buckets
        pad their slot vector with the trash row, so each bucket size is
        exactly one compiled program. Without per-row arguments every row
        prefills the engine's shared initial tokens (<=30 s path); the
        long-form path passes per-row wrapped prompts."""
        staged = self._encode_bucket(wins, bucket, tokens, lengths, sot_idx,
                                     max_news)
        self._install_rows(staged, list(slot_list), list(range(len(slot_list))))

    def _encode_bucket(self, wins, bucket: int, tokens=None, lengths=None,
                       sot_idx=None, max_news=None) -> dict:
        """Encode + prefill one admission bucket WITHOUT binding it to slots:
        the slot-agnostic half of admission (the payload carries encoder
        cross rows, prefilled KV rows, first logits and per-row budgets).
        The "overlapped" schedule dispatches this while a decode chunk is
        in flight and installs rows later as slots free; the classic path
        installs the whole payload immediately (_install_bucket)."""
        if tokens is None:
            tokens = jnp.broadcast_to(
                self._padded_init, (bucket, self._padded_init.shape[1]))
            lengths = jnp.full((bucket,), self.init_len, jnp.int32)
            sot_idx = jnp.full((bucket,), self.sot_index, jnp.int32)
        ck, cv, cache, first_logits, nosp = _encode_prefill(
            self.params, wins, tokens, lengths, sot_idx,
            self.cfg, self.use_flash, self.quantize, self.pool_ctx,
            self._nosp_token())
        if max_news is None:
            max_news = jnp.full((bucket,), self.max_new, jnp.int32)
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

            self._cross_pool_k = self._shard_pool(pool_like(ck))
            self._cross_pool_v = self._shard_pool(pool_like(cv))
        return {"bucket": bucket, "ck": ck, "cv": cv, "cache": cache,
                "logits": first_logits, "lengths": lengths,
                "max_news": max_news, "nosp": nosp}

    def _install_rows(self, staged: dict, slot_list, rows) -> None:
        """Scatter payload rows ``rows`` of a staged bucket into
        ``slot_list`` (1:1). Unselected rows land in the trash slot, so a
        payload can be consumed across SEVERAL calls (each the same
        compiled fixed-size scatter) as slots free up — _refill_many does
        not donate the payload rows, only the pools."""
        bucket = staged["bucket"]
        slot_arr = np.full((bucket,), self.n_slots, np.int32)
        slot_arr[np.asarray(rows, np.int32)] = np.asarray(slot_list, np.int32)
        self._state, self._cross_pool_k, self._cross_pool_v = _refill_many(
            self._state, self._cross_pool_k, self._cross_pool_v,
            jnp.asarray(slot_arr), staged["ck"], staged["cv"],
            staged["cache"].k, staged["cache"].v,
            staged["logits"], staged["lengths"], staged["max_news"],
            staged["nosp"])

    def _harvest(self, slot: int, tokens_out, length, sum_logprobs,
                 no_speech=None, strip=True) -> DecodingResult:
        """Build a result from HOST copies of the state arrays — the caller
        pulls them once per scheduler round (per-slot device reads cost a
        full round-trip each on remote chips)."""
        n = int(length[slot])
        seq = [int(t) for t in tokens_out[slot, :n]]
        sum_lp = float(sum_logprobs[slot])
        text = self.vocab.decode(seq)
        if strip:
            text = text.strip()
        return DecodingResult(
            tokens=seq, text=text,
            avg_logprob=sum_lp / (len(seq) + 1),
            no_speech_prob=(float(no_speech[slot])
                            if no_speech is not None else 0.0),
            temperature=0.0,
            compression_ratio=compression_ratio(text),
        )

    # -- the scheduler loop --

    @_under_mesh
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

        # a prior transcribe_streams/warmup re-derived the rule masks from
        # ITS TranscribeOptions; this path decodes with the constructor's
        self.sup_mask, self.blank_mask, self.max_initial_index = \
            self._option_masks
        if self.schedule == "overlapped":
            return self._transcribe_many_overlapped(audios)
        queue = list(enumerate(audios))
        results: List[Optional[DecodingResult]] = [None] * len(queue)
        slot_req = [-1] * self.n_slots  # request index per slot
        queue.reverse()  # pop() from the front
        self.stats = {"admit_s": 0.0, "chunk_s": 0.0, "pull_s": 0.0,
                      "rounds": 0, "eager_rounds": 0}
        snap = None  # (req_map, device snapshot) of the previous round
        # Budget-based minimum rounds before an admitted stream can free its
        # slot (schedule="predictive"): step advances once per chunk-step
        # while active, so a slot cannot budget-finish before
        # ceil(max_new / chunk_steps) chunks. EOT can finish a row EARLIER;
        # those are still caught by the normal end-of-round pull (one round
        # late, exactly the pipelined behavior).
        min_rounds = max(1, -(-self.max_new // self.chunk_steps))
        rounds_left = [0] * self.n_slots

        def pull_and_free(snap):
            """Harvest a snapshot: one blocking device_get (this is where
            the scheduler waits for the device), then free finished slots."""
            req_map, arrs = snap
            t0 = _time.perf_counter()
            pulled = jax.device_get(arrs)
            active = pulled[0]
            self.stats["pull_s"] += _time.perf_counter() - t0
            for s in range(self.n_slots):
                if (req_map[s] >= 0 and not active[s]
                        and slot_req[s] == req_map[s]):
                    results[req_map[s]] = self._stream_result(s, pulled)
                    slot_req[s] = -1

        while queue or any(r >= 0 for r in slot_req) or snap is not None:
            # Schedule choice (measured on the tunneled v5e, s64 int8
            # prestaged, one process interleaved — scripts/ab_engine_slots):
            # "pipelined" harvests one round LATE (the pull happens after
            # the next chunk is dispatched, so the device is always fed,
            # but a finished slot decodes one extra garbage chunk before
            # its refill). "eager" pulls the previous snapshot FIRST every
            # round — zero idle chunks, but on rounds where nothing could
            # have finished the early pull drains the device queue for
            # nothing. "predictive" pulls early ONLY when some occupied
            # slot's token budget allows it to have finished.
            if snap is not None and queue and (
                    self.schedule == "eager"
                    or (self.schedule == "predictive"
                        and any(slot_req[s] >= 0 and rounds_left[s] <= 0
                                for s in range(self.n_slots)))):
                pull_and_free(snap)
                snap = None
                self.stats["eager_rounds"] += 1
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
                for s in join_slots:
                    rounds_left[s] = min_rounds
            # dispatch one decode chunk for all slots (async) and take
            # fresh-buffer snapshots of the harvest arrays (the chunk
            # donates the state, so next round's chunk invalidates the
            # originals). _stream_chunk_snapshot/_stream_result are the
            # same hooks the long-form scheduler uses — BeamSlotEngine
            # overrides them, so THIS loop serves both engines.
            if any(r >= 0 for r in slot_req):
                t0 = _time.perf_counter()
                new_snap = (list(slot_req),
                            self._stream_chunk_snapshot(self.options))
                self.stats["chunk_s"] += _time.perf_counter() - t0
                for s in range(self.n_slots):
                    rounds_left[s] -= 1
            else:
                new_snap = None
            # harvest the PREVIOUS round's snapshot — its device work
            # finished before this round's chunk started, so the pull
            # does not wait on the in-flight chunk.
            if snap is not None:
                pull_and_free(snap)
            snap = new_snap
            self.stats["rounds"] += 1
        return results  # type: ignore[return-value]

    @_under_mesh
    def _transcribe_many_overlapped(
            self, audios: Sequence[np.ndarray]) -> List[DecodingResult]:
        """The "overlapped" scheduler: admission leaves the critical path.

        The classic schedules serialize each wave boundary on the host —
        pull, stage windows, dispatch encode, sync, repeat per bucket —
        while the device idles between buckets (measured ≈ admit_s + pull_s
        per wave, docs/ROADMAP.md r4 item 6). Here the queue-head bucket's
        encode/prefill is dispatched DURING decode rounds (it needs no slot
        assignment — _encode_bucket is slot-agnostic), so by the time slots
        free the payload is already computed: installs are single scatter
        dispatches, and a multi-bucket burst chains
        install -> encode(next) -> install with the host's sync waits hiding
        under the device's encode time. The decode chunk is also dispatched
        BEFORE the pull each round, so the harvest transfer rides under the
        in-flight chunk.

        Memory invariant (the OOM bound the classic path enforces with its
        inter-bucket device_get): at most ONE staged payload is live at a
        time, and a new encode is dispatched only after the previous
        install has EXECUTED (synced via a probe on the refilled state) —
        never two buckets of encoder cross rows next to the resident pools.

        Payloads install in row subsets as slots free (same compiled
        scatter, unselected rows to the trash slot), so straggler refills
        consume the staged bucket piecemeal — batched encodes even when
        slots free one at a time. Token-identical to the other schedules
        (tests/test_engine.py::test_engine_schedules_identical)."""
        import time as _time

        queue = list(enumerate(audios))
        results: List[Optional[DecodingResult]] = [None] * len(queue)
        slot_req = [-1] * self.n_slots
        queue.reverse()  # pop() from the front
        self.stats = {"admit_s": 0.0, "chunk_s": 0.0, "pull_s": 0.0,
                      "rounds": 0, "eager_rounds": 0, "stage_s": 0.0,
                      "install_s": 0.0, "staged_buckets": 0,
                      "partial_installs": 0}
        snap = None
        staged = None          # payload dict + "pending": [(row, req_idx)]
        install_probe = None   # n_past ref from the LAST install dispatch
        # predictive early-pull bookkeeping (see transcribe_many): a slot
        # cannot budget-finish before ceil(max_new / chunk_steps) chunks, so
        # pulling BEFORE the chunk dispatch on those rounds merges the
        # finish-detect round into the refill round (measured: without it
        # the boundary burns one no-op chunk round per wave).
        min_rounds = max(1, -(-self.max_new // self.chunk_steps))
        rounds_left = [0] * self.n_slots

        def stage_next():
            """Dispatch windows + encode/prefill for the queue head (slot-
            agnostic; rides behind whatever is in the device queue)."""
            n = min(len(queue), self.n_slots, self._ADMIT_BUCKETS[0])
            if n == 0:
                return None
            bucket = next(
                (b for b in reversed(self._ADMIT_BUCKETS) if b >= n),
                self._ADMIT_BUCKETS[0])
            n = min(bucket, n)
            items = [queue.pop() for _ in range(n)]
            t0 = _time.perf_counter()
            wins = self._window_batch([a for _, a in items], bucket)
            st = self._encode_bucket(wins, bucket)
            self.stats["stage_s"] += _time.perf_counter() - t0
            self.stats["staged_buckets"] += 1
            st["pending"] = [(row, idx) for row, (idx, _a) in enumerate(items)]
            return st

        def stage_synced():
            """One-payload-in-flight bound: wait for the last install to
            EXECUTE (frees the previous payload's device buffers) before
            enqueueing another bucket's encode."""
            nonlocal install_probe
            if install_probe is not None:
                t0 = _time.perf_counter()
                jax.device_get(install_probe)
                self.stats["admit_s"] += _time.perf_counter() - t0
                install_probe = None
            return stage_next()

        def pull_and_free(snap):
            req_map, arrs = snap
            t0 = _time.perf_counter()
            pulled = jax.device_get(arrs)
            active = pulled[0]
            self.stats["pull_s"] += _time.perf_counter() - t0
            for s in range(self.n_slots):
                if (req_map[s] >= 0 and not active[s]
                        and slot_req[s] == req_map[s]):
                    results[req_map[s]] = self._stream_result(s, pulled)
                    slot_req[s] = -1

        def consume_staged():
            """Install staged payload rows into free slots; a whole-wave
            burst chains install -> encode(next) -> install, each sync
            hiding under the device's encode. A bucket staged with no free
            slots left to fill is DEFERRED to the next round's top-up (its
            probe then costs one RTT, not an encode wait)."""
            nonlocal staged, install_probe
            while staged is not None:
                free = [s for s in range(self.n_slots) if slot_req[s] < 0]
                if not free:
                    break
                take = staged["pending"][: len(free)]
                t0 = _time.perf_counter()
                self._install_rows(staged, free[: len(take)],
                                   [row for row, _ in take])
                self.stats["install_s"] += _time.perf_counter() - t0
                # a fresh tiny buffer: the state itself is DONATED to
                # the next chunk/refill, which would delete a direct ref
                install_probe = jnp.copy(self._state.n_past[:1])
                for s, (_row, idx) in zip(free, take):
                    slot_req[s] = idx
                    rounds_left[s] = min_rounds
                staged["pending"] = staged["pending"][len(take):]
                if staged["pending"]:
                    self.stats["partial_installs"] += 1
                    break  # slots exhausted; rest installs as they free
                staged = None
                if queue and len(free) > len(take):
                    staged = stage_synced()  # burst: more slots to fill NOW

        while (queue or staged is not None or snap is not None
               or any(r >= 0 for r in slot_req)):
            # 0. early pull when some occupied slot's budget says it can
            #    have finished (the predictive policy): refills then land
            #    BEFORE this round's chunk instead of one round later.
            if snap is not None and (staged is not None or queue) and any(
                    slot_req[s] >= 0 and rounds_left[s] <= 0
                    for s in range(self.n_slots)):
                pull_and_free(snap)
                snap = None
                self.stats["eager_rounds"] += 1
                consume_staged()
            # 1. decode chunk FIRST: the device stays fed through the pull
            #    and any admission host work this round.
            if any(r >= 0 for r in slot_req):
                t0 = _time.perf_counter()
                new_snap = (list(slot_req),
                            self._stream_chunk_snapshot(self.options))
                self.stats["chunk_s"] += _time.perf_counter() - t0
                for s in range(self.n_slots):
                    rounds_left[s] -= 1
            else:
                new_snap = None
            # 2. top up staging (encode queues behind the chunk).
            if staged is None and queue:
                staged = stage_synced()
            # 3. harvest the previous round's snapshot (computed before this
            #    round's chunk started — the fetch rides under it).
            if snap is not None:
                pull_and_free(snap)
            snap = new_snap
            # 4. consume staged payloads into slots freed by the harvest.
            consume_staged()
            self.stats["rounds"] += 1
        self.stats["admit_s"] += self.stats["stage_s"] + self.stats["install_s"]
        return results  # type: ignore[return-value]

    # -- long-form streams (whisper_full semantics through the engine) --

    @_under_mesh
    def transcribe_streams(self, audios: Sequence[np.ndarray],
                           options=None, **kwargs) -> List[dict]:
        """Continuous-batching LONG-FORM transcription: every stream runs
        the 30 s sliding-window loop (seek advancement, prompt carry,
        no-speech gate, temperature-fallback escalation — the reference's
        scaffolded ``whisper_full`` state, main.rs:29/354-361) while the
        engine keeps the chip busy across streams: each slot decodes one
        window; a finished window re-queues the stream's NEXT window, whose
        encode/prefill batches with other admissions.

        Semantics are shared with the offline pipeline by construction: the
        greedy t=0 decode is the engine chunk loop (token-identical to the
        fused device loop — tests/test_engine.py), segment extraction /
        seek / prompt bookkeeping is pipeline.transcribe.finish_window, the
        escalation gate is pipeline.transcribe.gate_needs_fallback, and
        failed windows escalate through decode_full at the remaining ladder
        temperatures (the lockstep fallback path). Output matches
        pipeline.transcribe on multi-window audio (test_engine.py).

        Returns one dict per stream: {text, segments, language, duration}.
        """
        import dataclasses as _dc

        from ..frontend.mel import mel_window
        from ..pipeline.transcribe import (
            TranscribeOptions, finish_window, gate_needs_fallback,
            _tokenize_prompt)

        topts = options or TranscribeOptions(**kwargs)
        if options is not None and kwargs:
            topts = _dc.replace(options, **kwargs)
        self._check_stream_options(topts)
        temps = self._prepare_streams(topts)

        import time as _time

        streams = [self._init_stream(i, a, topts) for i, a in enumerate(audios)]
        pending = [st for st in streams if not st["done"]]
        pending.reverse()
        slot_stream = [None] * self.n_slots
        # Admission tickets guard the one-round-lag harvest: when a stream's
        # NEXT window re-enters the same slot, the stale snapshot (taken
        # before re-admission, still showing the previous window's finished
        # state) must not be harvested as the new window's result.
        slot_ticket = [0] * self.n_slots
        next_ticket = 1
        self.stats = {"admit_s": 0.0, "chunk_s": 0.0, "pull_s": 0.0,
                      "fallback_s": 0.0, "rounds": 0, "windows": 0,
                      "fallbacks": 0}
        snap = None

        while pending or any(s is not None for s in slot_stream) or snap:
            join = []
            for s in range(self.n_slots):
                if slot_stream[s] is None and pending:
                    st = pending.pop()
                    slot_stream[s] = st
                    slot_ticket[s] = next_ticket
                    next_ticket += 1
                    join.append((s, st))
            if join:
                t0 = _time.perf_counter()
                self._admit_stream_windows(join, topts)
                self.stats["admit_s"] += _time.perf_counter() - t0
            if any(s is not None for s in slot_stream):
                t0 = _time.perf_counter()
                new_snap = (list(slot_stream), list(slot_ticket),
                            self._stream_chunk_snapshot(topts))
                self.stats["chunk_s"] += _time.perf_counter() - t0
            else:
                new_snap = None
            if snap is not None:
                stream_map, tick_map, arrs = snap
                t0 = _time.perf_counter()
                pulled = jax.device_get(arrs)
                active = pulled[0]
                self.stats["pull_s"] += _time.perf_counter() - t0
                for s in range(self.n_slots):
                    st = stream_map[s]
                    if (st is None or active[s] or slot_stream[s] is not st
                            or slot_ticket[s] != tick_map[s]):
                        continue
                    done = self._advance_stream(s, st, pulled, topts, temps)
                    slot_stream[s] = None
                    if done:
                        st["done"] = True
                    else:
                        pending.append(st)
            snap = new_snap
            self.stats["rounds"] += 1

        return [self._stream_output(st) for st in streams]

    def warmup(self, options=None, seconds: float = 2.0):
        """Compile the serving programs BEFORE taking traffic: one
        transcribe_streams run per admission bucket size (<= n_slots), which
        traces the per-bucket mel-window/encode/prefill/install programs,
        the decode chunk, the stream snapshot + pull, and (multilingual,
        language unpinned) the language-detect program. ``cli serve
        --warmup`` calls this so the first request pays queueing, not
        minutes of tracing. Compiles land in the persistent jax cache, so a
        restarted daemon warms from disk.

        Streams longer than one window and prompt-carry widths beyond the
        first 32-token class still trace their (cheap) host-side variants
        on first use; the expensive programs are all shape-stable and
        covered here. Silence is enough — programs are shape-specialized,
        not value-specialized."""
        if options is None and getattr(self, "beam_size", None):
            from ..pipeline.transcribe import TranscribeOptions

            options = TranscribeOptions(beam_size=self.beam_size)
        audio = np.zeros(max(1, int(16000 * seconds)), np.int16)
        # every bucket size <= n_slots, PLUS n_slots itself: when n_slots is
        # not itself a bucket (e.g. 6), a full-house admission picks the
        # smallest COVERING bucket (8) — run k=n_slots so that program
        # compiles too instead of on the first busy burst
        ks = sorted({b for b in self._ADMIT_BUCKETS if b <= self.n_slots}
                    | {self.n_slots})
        for k in ks:
            self.transcribe_streams([audio] * k, options)
        return self

    def _advance_stream(self, s: int, st: dict, pulled, topts, temps) -> bool:
        """Consume slot ``s``'s finished window into stream ``st``: the
        fallback gate/ladder, finish_window segment + seek + prompt-carry
        bookkeeping. Returns True when the stream has no more windows."""
        import time as _time

        from ..pipeline.transcribe import finish_window, gate_needs_fallback

        result = self._stream_result(s, pulled)
        self.stats["windows"] += 1
        if gate_needs_fallback(result, topts):
            t1 = _time.perf_counter()
            result = self._fallback_ladder(st, result, topts, temps)
            self.stats["fallback_s"] += _time.perf_counter() - t1
            self.stats["fallbacks"] += 1
        enc_arg = self._slot_enc(s) if topts.word_timestamps else None
        segments, new_seek, new_tokens, reset = finish_window(
            self.model, result, st["seek"], st["content_frames"],
            self._n_frames, topts, len(st["segments"]),
            st["language"], enc=enc_arg,
        )
        st["segments"].extend(segments)
        st["all_tokens"].extend(new_tokens)
        if reset:
            st["prompt_reset_since"] = len(st["all_tokens"])
        st["seek"] = new_seek
        return st["seek"] >= st["content_frames"]

    @staticmethod
    def _stream_output(st: dict) -> dict:
        import dataclasses as _dc

        segs = st["segments"]
        return {
            "text": "".join(seg.text for seg in segs),
            "segments": [_dc.asdict(seg) for seg in segs],
            "language": st["language"],
            "duration": st["duration"],
        }

    def _prepare_streams(self, topts) -> list:
        """Validate stream options, size the slot pool for wrapped prompts,
        and align the rule masks/timestamp cap with ``topts``. Returns the
        temperature ladder. Shared by ``transcribe_streams`` and the
        queue-fed ``EngineServer`` (parallel/server.py)."""
        temps = ([topts.temperature]
                 if isinstance(topts.temperature, (int, float))
                 else list(topts.temperature))
        if temps[0] != 0:
            raise ValueError("engine streams require a t=0 first ladder rung")

        # The slot pool must fit the longest wrapped prompt; growing it is
        # only possible before the pool exists.
        no_prompt = len(self.initial_tokens)
        p_max = self.cfg.n_text_ctx // 2 + no_prompt + 2
        w_max = -(-p_max // 32) * 32
        needed = min(w_max + self.max_new + 8, self.cfg.n_text_ctx)
        if needed > self.pool_ctx:
            if self._state is not None:
                raise RuntimeError(
                    "engine pool already sized without prompt budget; use a "
                    "fresh SlotEngine for transcribe_streams")
            needed = self._align_pool_ctx(needed)
            self._check_hbm_budget(pool_ctx=needed)  # re-check grown pool
            self.pool_ctx = needed
        # Align the rule masks and timestamp cap with the stream options.
        self.sup_mask, self.blank_mask = build_masks(
            self.vocab, suppress_tokens=topts.suppress_tokens)
        self.max_initial_index = None
        if not topts.without_timestamps:
            self.max_initial_index = round(1.0 / 0.02)
        return temps

    # -- long-form scheduler hooks (overridden by BeamSlotEngine) --

    def _check_stream_options(self, topts) -> None:
        if topts.beam_size or (topts.best_of or 1) != 1:
            raise ValueError(
                "SlotEngine streams are greedy-first; beam windows belong to "
                "BeamSlotEngine.transcribe_streams (or pipeline.transcribe)")
        self._check_common_stream_options(topts)

    def _check_common_stream_options(self, topts) -> None:
        # The engine's cross pools and mel windows are sized ONCE at
        # construction (the ``audio_ctx`` constructor knob — the
        # reference's static exp_n_audio_ctx, main.rs:1803-1807). A
        # per-call numeric override is honored only when it matches;
        # per-window 'auto' stays offline-only (see __init__ note on the
        # measured arithmetic).
        if topts.audio_ctx is not None and topts.audio_ctx != self.audio_ctx:
            raise ValueError(
                f"engine streams decode at the engine's construction-time "
                f"audio_ctx ({self.audio_ctx or 'full'}); per-call "
                f"audio_ctx={topts.audio_ctx!r} cannot be honored — build "
                f"the engine with audio_ctx={topts.audio_ctx!r} (short-"
                f"stream deployments) or use pipeline.transcribe "
                f"(audio_ctx='auto' per-window bucketing)")

    def _align_pool_ctx(self, needed: int) -> int:
        return needed

    @_under_mesh
    def _stream_chunk_snapshot(self, topts):
        """Dispatch one decode chunk (async) and return fresh-buffer device
        snapshots of the harvest arrays (pulled one round later)."""
        self._state = _decode_chunk(
            self.params, self._state,
            self._cross_pool_k, self._cross_pool_v,
            self.sup_mask, self.blank_mask, self.cfg,
            steps=self.chunk_steps,
            use_timestamps=not topts.without_timestamps,
            max_initial_index=self.max_initial_index,
        )
        return _snapshot(
            self._state.active, self._state.length,
            self._state.sum_logprobs, self._state.tokens_out,
            self._state.no_speech)

    def _stream_result(self, s: int, pulled) -> DecodingResult:
        """Window result for slot ``s`` from the pulled snapshot — built
        exactly as the offline t=0 rung builds it (text stripped before
        compression_ratio, decoding/task.py) so the fallback gate and the
        segment fields match the lockstep pipeline bit-for-bit."""
        active, length, sum_lp, toks, nosp = pulled
        return self._harvest(s, toks, length, sum_lp, nosp)

    @_under_mesh
    def _slot_enc(self, s: int):
        """The slot's resident encoder memory as an ``enc``-like batch-1 view
        for finish_window's word-timing epilogue (the same rows the window
        decoded against — identical to the offline path's per-window
        ``encode`` output). Sliced before the slot can be refilled; with
        quantize=True the alignment signal comes from the int8 cross rows
        (dequantized inside the block), a within-tolerance approximation of
        the offline bf16 timing signal."""
        from types import SimpleNamespace

        return SimpleNamespace(
            cross_k=jax.tree.map(lambda a: a[:, s : s + 1],
                                 self._cross_pool_k),
            cross_v=jax.tree.map(lambda a: a[:, s : s + 1],
                                 self._cross_pool_v),
        )

    @_under_mesh
    def _init_stream(self, idx: int, audio: np.ndarray, topts) -> dict:
        """Host+device state for one long-form stream: the full padded mel
        (device-resident; windows are sliced per admission), the offline
        loop's content-frame accounting, and the prompt-carry buffers.
        Audio is padded to 30 s multiples so mel compiles one program per
        30 s size class; the extra zeros cannot change the global max-8dB
        clamp (silence never carries the max), so the mel prefix is
        IDENTICAL to the offline pipeline's."""
        from ..config import N_SAMPLES_PER_CHUNK
        from ..decoding.task import detect_language
        from ..frontend.mel import frame_count, log_mel_spectrogram, mel_window
        from ..pipeline.transcribe import _tokenize_prompt

        audio = np.asarray(audio)
        if audio.dtype != np.int16:
            audio = audio.astype(np.float32)
        center = topts.mel_mode == "openai"
        offline_len = len(audio) + N_SAMPLES_PER_CHUNK
        padded_len = -(-offline_len // N_SAMPLES_PER_CHUNK) * N_SAMPLES_PER_CHUNK
        padded = np.zeros(padded_len, audio.dtype)
        padded[: len(audio)] = audio
        dev = jnp.asarray(padded)  # int16 PCM ships 2 bytes/sample
        if dev.dtype == jnp.int16:
            dev = dev.astype(jnp.float32) / 32768.0  # io/wav convention
        mel = log_mel_spectrogram(
            dev, self.model.filters,
            frame_count(padded_len, center=center),
            center=center, fold=not center)
        # real-audio frames = total minus the fixed 30 s zero pad (NOT the
        # window length, which audio_ctx can shrink below the pad —
        # transcribe.py's content_frames arithmetic)
        from ..config import HOP_LENGTH

        content_frames = (frame_count(offline_len, center=center)
                          - N_SAMPLES_PER_CHUNK // HOP_LENGTH)
        # Clip range, same arithmetic as the offline loop (transcribe.py:
        # seek_start = offset_ms/10, duration clamps the end frame) so
        # engine streams honor offset_ms/duration_ms instead of silently
        # transcribing from 0:00.
        seek_start = max(0, topts.offset_ms // 10)
        if topts.duration_ms is not None:
            content_frames = min(content_frames,
                                 seek_start + topts.duration_ms // 10)

        language = topts.language
        if language is None:
            if not self.cfg.is_multilingual:
                language = "en"
            else:
                win = mel_window(mel, seek_start, self._n_frames)[None]
                enc = encode(self.params, win, self.cfg,
                             use_flash=self.use_flash)
                langs, _ = detect_language(
                    self.params, self.cfg, self.vocab,
                    enc.cross_k, enc.cross_v)
                language = langs[0]

        all_tokens: List[int] = []
        if topts.initial_prompt is not None:
            all_tokens.extend(_tokenize_prompt(self.vocab, topts.initial_prompt))
        return {
            "idx": idx, "mel": mel, "content_frames": content_frames,
            "language": language, "seek": seek_start, "all_tokens": all_tokens,
            "prompt_reset_since": 0, "segments": [],
            "done": content_frames <= seek_start,
            "duration": len(audio) / 16000.0,
            # per-stream option override: the serving daemon inits streams
            # with request-level TranscribeOptions (task/language/prompt),
            # which must survive into every later window + fallback decode
            "topts": topts,
        }

    def _window_options(self, st: dict, topts, temperature: float):
        """The DecodingOptions the OFFLINE ladder would use for this window
        at this temperature (transcribe._decode_with_fallback kwargs)."""
        topts = st.get("topts") or topts
        prompt = (st["all_tokens"][st["prompt_reset_since"]:]
                  if topts.condition_on_previous_text else [])
        kwargs = dict(
            task=topts.task, language=st["language"],
            temperature=temperature,
            length_penalty=topts.length_penalty, prompt=prompt or None,
            without_timestamps=topts.without_timestamps,
            suppress_tokens=topts.suppress_tokens,
        )
        # patience rides with beam_size only (openai drops both at t>0)
        if temperature > 0:
            kwargs["best_of"] = topts.best_of
        else:
            kwargs["beam_size"] = topts.beam_size
            kwargs["patience"] = topts.patience
        return DecodingOptions(**kwargs)

    @_under_mesh
    def _admit_stream_windows(self, join, topts) -> None:
        """Admit (slot, stream) pairs: slice each stream's current window
        from its resident mel, encode/prefill bucket-batched with per-row
        wrapped prompts, and install. Per-row sample budgets replicate the
        offline clamp sample_len <= n_text_ctx - padded_prompt
        (decoding/task.py:354) so truncation behavior is identical."""
        from ..frontend.mel import mel_window

        i = 0
        while i < len(join):
            remaining = len(join) - i
            bucket = next(
                (b for b in reversed(self._ADMIT_BUCKETS) if b >= remaining),
                self._ADMIT_BUCKETS[0])
            n = min(bucket, remaining)
            group = join[i : i + n]
            wins = [mel_window(st["mel"], st["seek"], self._n_frames)
                    for _, st in group]
            wins = jnp.stack(wins)
            if n < bucket:
                wins = jnp.concatenate(
                    [wins, jnp.zeros((bucket - n,) + wins.shape[1:],
                                     wins.dtype)])

            rows, lens, sots, caps = [], [], [], []
            for _, st in group:
                task = DecodingTask(
                    self.cfg, self.vocab, self._window_options(st, topts, 0.0))
                toks = np.array(task.initial_tokens, np.int32)
                true_len = len(toks)
                rows.append(toks)
                lens.append(true_len)
                sots.append(task.sot_index)
                # openai's budget: sample-append-then-break allows
                # n_text_ctx - true_len + 1 tokens (task.py device clamp).
                caps.append(max(0, min(task.sample_len, self.max_new,
                                       self.cfg.n_text_ctx - true_len + 1)))
            w = -(-max(len(r) for r in rows) // 32) * 32
            mat = np.zeros((bucket, w), np.int32)
            for j, r in enumerate(rows):
                mat[j, : len(r)] = r
            self._install_bucket(
                [s for s, _ in group], wins, bucket,
                tokens=jnp.asarray(mat),
                lengths=jnp.asarray(np.array(
                    lens + [1] * (bucket - n), np.int32)),
                sot_idx=jnp.asarray(np.array(
                    sots + [0] * (bucket - n), np.int32)),
                max_news=jnp.asarray(np.array(
                    caps + [0] * (bucket - n), np.int32)),
            )
            i += n
            if i < len(join):
                jax.device_get(self._state.n_past[:1])

    @_under_mesh
    def _fallback_ladder(self, st: dict, t0_result: DecodingResult,
                         topts, temps) -> DecodingResult:
        """Escalate a gated window through the remaining ladder rungs on
        the lockstep path (decode_full), exactly as the offline
        _decode_with_fallback continues after its failed t=0 rung. Rare by
        construction (gated), so the synchronous window re-encode is off
        the steady-state path."""
        from ..frontend.mel import mel_window
        from ..pipeline.transcribe import gate_needs_fallback

        win = mel_window(st["mel"], st["seek"], self._n_frames)[None]
        enc = encode(self.params, win, self.cfg,
                     use_flash=self.use_flash)
        result = t0_result
        for t in temps[1:]:
            options = self._window_options(st, topts, t)
            result = decode_full(
                self.params, self.cfg, self.vocab,
                enc.cross_k, enc.cross_v, options,
                use_device_loop=jax.default_backend() == "tpu",
            )[0]
            if not gate_needs_fallback(result, topts):
                break
        return result
