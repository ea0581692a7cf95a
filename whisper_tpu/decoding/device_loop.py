"""Fully on-device greedy/sampling decode loop.

Why this exists: the host-orchestrated loop (decoding.task) pays a
device->host logits transfer per token — ~35 ms over a tunneled TPU, which
caps serving RTF regardless of FLOPs. Here the WHOLE segment decode (prefill
+ up to sample_len steps + logit rules + sampling + stop handling) is ONE
jitted program: `lax.scan` over steps, rules vectorized over the vocab, a
single small transfer at the end. This is SURVEY.md hard part (d): "a decode
loop that stays on-device without recompiles across segment lengths".

The rule grammar matches decoding.rules (openai semantics) exactly — tested
token-for-token against the host loop:

  * suppress mask (precomputed host-side, passed as a (V,) array);
  * blank/EOT suppression at sample_begin;
  * timestamp grammar via carried per-sequence state (last token, previous
    token, last timestamp): pairing, non-decrease, first-token-is-timestamp,
    max_initial_timestamp, and the probability-mass rule;
  * greedy argmax or temperature sampling (jax.random.categorical).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config import WhisperConfig
from ..io.vocab import device_special_ids
from ..model.decoder import KVCache, decode_step

NEG = jnp.float32(-1e30)


class LoopState(NamedTuple):
    cache_k: jnp.ndarray
    cache_v: jnp.ndarray
    tokens_out: jnp.ndarray   # (B, sample_len) generated tokens (eot-padded)
    last_tok: jnp.ndarray     # (B,)
    prev_tok: jnp.ndarray     # (B,)
    last_ts: jnp.ndarray      # (B,) last sampled timestamp token (or beg-1)
    finished: jnp.ndarray     # (B,) bool
    length: jnp.ndarray       # (B,) generated length (excl. EOT)
    sum_logprobs: jnp.ndarray  # (B,)
    key: jnp.ndarray


def _apply_rules_device(
    logits: jnp.ndarray,          # (B, V) f32
    step: jnp.ndarray,            # scalar or (B,): 0 at first sampled position
    state: LoopState,
    suppress_mask: jnp.ndarray,   # (V,) bool: True = never sample
    blank_mask: jnp.ndarray,      # (V,) bool: suppressed at step 0 only
    vocab_consts: Tuple[int, int, int, int],
    use_timestamps: bool,
    max_initial_index: Optional[int],
) -> jnp.ndarray:
    eot, beg, not_, n_vocab = vocab_consts
    B = logits.shape[0]
    ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    # step may be per-row (the serving engine's slots each carry their own
    # position); normalize to (B, 1) so every rule broadcasts either way.
    step = jnp.broadcast_to(jnp.atleast_1d(jnp.asarray(step)), (B,))[:, None]

    logits = jnp.where(suppress_mask[None, :], NEG, logits)
    logits = jnp.where((step == 0) & blank_mask[None, :], NEG, logits)

    if use_timestamps:
        logits = logits.at[:, not_].set(NEG)
        last_was = state.last_tok >= beg            # (B,)
        penult_was = (step[:, 0] < 2) | (state.prev_tok >= beg)
        is_ts = ids >= beg
        is_text = ids < eot
        # pair closed -> no timestamps; pair open -> no text
        logits = jnp.where((last_was & penult_was)[:, None] & is_ts, NEG, logits)
        logits = jnp.where((last_was & ~penult_was)[:, None] & is_text, NEG, logits)
        # non-decreasing: mask [beg, last_allowed)
        seen_ts = state.last_ts >= beg
        last_allowed = jnp.where(
            last_was & ~penult_was, state.last_ts, state.last_ts + 1
        )
        mask_ts_lo = seen_ts[:, None] & (ids >= beg) & (ids < last_allowed[:, None])
        logits = jnp.where(mask_ts_lo, NEG, logits)
        # first sampled token must be a timestamp, bounded by max_initial
        first = step == 0
        logits = jnp.where(first & (ids < beg), NEG, logits)
        if max_initial_index is not None:
            logits = jnp.where(first & (ids > beg + max_initial_index), NEG, logits)
        # probability-mass rule
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        ts_mass = jax.nn.logsumexp(jnp.where(ids >= beg, logprobs, NEG), axis=-1)
        max_text = jnp.max(jnp.where(ids < beg, logprobs, NEG), axis=-1)
        force_ts = ts_mass > max_text
        logits = jnp.where(force_ts[:, None] & (ids < beg), NEG, logits)
    return logits


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "sample_len", "use_timestamps", "max_initial_index", "temperature",
    ),
)
def decode_segment_device(
    params,
    init_tokens: jnp.ndarray,     # (B, P) right-padded prompt+sot sequence
    init_len: int | jnp.ndarray,  # scalar: true prefill length (shared)
    sot_index: int | jnp.ndarray,
    cache: KVCache,
    cross_k: jnp.ndarray,
    cross_v: jnp.ndarray,
    suppress_mask: jnp.ndarray,
    blank_mask: jnp.ndarray,
    cfg: WhisperConfig,
    sample_len: int,
    use_timestamps: bool = True,
    max_initial_index: Optional[int] = 50,
    temperature: float = 0.0,
    seed: int = 0,
):
    """Returns (tokens (B, sample_len), lengths, sum_logprobs, no_speech_probs).

    One compiled program per (P-bucket, sample_len, flags) combination.
    """
    v = cfg.n_vocab
    eot, beg, not_, nosp = device_special_ids(v)
    B = init_tokens.shape[0]

    logits_all, cache = decode_step(
        params, init_tokens, jnp.int32(0), cache, cross_k, cross_v, cfg
    )
    logits_all = logits_all.astype(jnp.float32)
    probs_at_sot = jax.nn.softmax(logits_all[:, sot_index], axis=-1)
    no_speech_probs = probs_at_sot[:, nosp]
    first_logits = jnp.take_along_axis(
        logits_all, jnp.full((B, 1, 1), init_len - 1), axis=1
    )[:, 0]

    state = LoopState(
        cache_k=cache.k,
        cache_v=cache.v,
        tokens_out=jnp.full((B, sample_len), eot, jnp.int32),
        last_tok=jnp.full((B,), -1, jnp.int32),
        prev_tok=jnp.full((B,), -1, jnp.int32),
        last_ts=jnp.full((B,), -1, jnp.int32),
        finished=jnp.zeros((B,), bool),
        length=jnp.zeros((B,), jnp.int32),
        sum_logprobs=jnp.zeros((B,), jnp.float32),
        key=jax.random.PRNGKey(seed),
    )

    def cond_fn(carry):
        state, logits, n_past, step = carry
        return (step < sample_len) & ~jnp.all(state.finished)

    def step_fn(carry):
        state, logits, n_past, step = carry
        filt = _apply_rules_device(
            logits, step, state, suppress_mask, blank_mask,
            (eot, beg, not_, v), use_timestamps, max_initial_index,
        )
        logprobs = jax.nn.log_softmax(filt, axis=-1)
        if temperature == 0.0:
            nxt = jnp.argmax(filt, axis=-1).astype(jnp.int32)
        else:
            key, sub = jax.random.split(state.key)
            nxt = jax.random.categorical(sub, filt / temperature, axis=-1).astype(jnp.int32)
            state = state._replace(key=key)
        step_lp = jnp.take_along_axis(logprobs, nxt[:, None], axis=-1)[:, 0]
        nxt = jnp.where(state.finished, eot, nxt)
        now_finished = state.finished | (nxt == eot)
        sum_lp = state.sum_logprobs + jnp.where(state.finished, 0.0, step_lp)
        length = state.length + jnp.where(now_finished, 0, 1)

        tokens_out = jax.lax.dynamic_update_slice(
            state.tokens_out, nxt[:, None], (0, step)
        )
        is_ts = (nxt >= beg) & ~now_finished
        new_state = state._replace(
            tokens_out=tokens_out,
            prev_tok=state.last_tok,
            last_tok=nxt,
            last_ts=jnp.where(is_ts, nxt, state.last_ts),
            finished=now_finished,
            length=length,
            sum_logprobs=sum_lp,
        )
        lg, new_cache = decode_step(
            params, nxt[:, None],
            n_past, KVCache(new_state.cache_k, new_state.cache_v),
            cross_k, cross_v, cfg,
        )
        new_state = new_state._replace(cache_k=new_cache.k, cache_v=new_cache.v)
        return (new_state, lg[:, 0].astype(jnp.float32), n_past + 1, step + 1)

    # while_loop (not scan): exits as soon as every sequence hit EOT — real
    # segments are ~30-60 tokens, far short of the 224-token worst case.
    (state, _, _, _) = jax.lax.while_loop(
        cond_fn,
        step_fn,
        (state, first_logits, jnp.asarray(init_len, jnp.int32), jnp.int32(0)),
    )
    return state.tokens_out, state.length, state.sum_logprobs, no_speech_probs


def build_masks(
    vocab, suppress_tokens: Optional[Sequence[int]] = (-1,)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Host-side precompute of the (V,) suppression and blank masks.

    ``suppress_tokens`` follows openai's spec (-1 expands to non-speech
    tokens; explicit ids honored; None/empty -> special tokens only) and is
    forwarded verbatim so device decodes match the host filters
    (rules.SuppressTokens) for custom lists."""
    import numpy as np

    from .rules import build_suppress_list

    v = vocab.n_vocab
    sup = np.zeros(v, bool)
    # Falsy spec -> no SuppressTokens filter at all (host/openai semantics:
    # the filter, specials included, is only added when the spec is truthy).
    if suppress_tokens:
        sup[build_suppress_list(vocab, suppress_tokens)] = True
    blank = np.zeros(v, bool)
    blank_tok = vocab.token_to_id.get(b" ")
    if blank_tok is not None:
        blank[blank_tok] = True
    blank[vocab.token_eot] = True
    return jnp.asarray(sup), jnp.asarray(blank)
