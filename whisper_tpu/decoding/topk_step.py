"""Device-side rules + top-k decode step for host-orchestrated search.

Beam search needs host bookkeeping (hypothesis sets are irregular), but the
naive loop transfers the full (n_seq, n_vocab) logits every step — ~35 ms on a
tunneled chip. Here the jitted step applies the SAME rule grammar as
device_loop on device and returns only the top-(beam_size+1) logprobs and
token ids (a few hundred bytes), which is exactly what openai's beam update
consumes. Logit rules see per-sequence state (last/prev token, last timestamp,
step index) that the host mirrors from its token history.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import WhisperConfig
from ..io.vocab import device_special_ids
from ..model.decoder import KVCache, decode_step
from .device_loop import LoopState, _apply_rules_device


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "k", "use_timestamps", "max_initial_index"),
)
def decode_step_topk(
    params,
    tokens: jnp.ndarray,        # (n_seq, T) tokens to feed this step
    n_past,
    cache: KVCache,
    cross_k, cross_v,
    suppress_mask, blank_mask,
    last_tok, prev_tok, last_ts,  # (n_seq,) host-mirrored rule state
    step,                          # scalar: sampled-token count so far
    cfg: WhisperConfig,
    k: int,
    use_timestamps: bool = True,
    max_initial_index=50,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, KVCache]:
    """Returns (topk_logprobs (n,k), topk_ids (n,k), logprobs_fyi (n,2), cache')."""
    v = cfg.n_vocab
    eot, beg, not_, _nosp = device_special_ids(v)

    logits, cache = decode_step(params, tokens, n_past, cache, cross_k, cross_v, cfg)
    logits = logits[:, -1].astype(jnp.float32)

    state = LoopState(
        cache_k=cache.k, cache_v=cache.v, tokens_out=jnp.zeros((1, 1), jnp.int32),
        last_tok=last_tok, prev_tok=prev_tok, last_ts=last_ts,
        finished=jnp.zeros(last_tok.shape, bool),
        length=jnp.zeros(last_tok.shape, jnp.int32),
        sum_logprobs=jnp.zeros(last_tok.shape, jnp.float32),
        key=jax.random.PRNGKey(0),
    )
    filt = _apply_rules_device(
        logits, step, state, suppress_mask, blank_mask,
        (eot, beg, not_, v), use_timestamps, max_initial_index,
    )
    logprobs = jax.nn.log_softmax(filt, axis=-1)
    top_lp, top_ids = jax.lax.top_k(logprobs, k)
    eot_lp = logprobs[:, eot][:, None]
    return top_lp, top_ids.astype(jnp.int32), eot_lp, cache


def rule_state_from_tokens(tokens: np.ndarray, sample_begin: int, beg: int):
    """Host mirror of the device rule state given the token history."""
    n = tokens.shape[0]
    last_tok = np.full(n, -1, np.int32)
    prev_tok = np.full(n, -1, np.int32)
    last_ts = np.full(n, -1, np.int32)
    sampled = tokens[:, sample_begin:]
    if sampled.shape[1] >= 1:
        last_tok = sampled[:, -1].astype(np.int32)
    if sampled.shape[1] >= 2:
        prev_tok = sampled[:, -2].astype(np.int32)
    for i in range(n):
        ts = sampled[i][sampled[i] >= beg]
        if ts.size:
            last_ts[i] = ts[-1]
    return (
        jnp.asarray(last_tok),
        jnp.asarray(prev_tok),
        jnp.asarray(last_ts),
        jnp.int32(sampled.shape[1]),
    )
