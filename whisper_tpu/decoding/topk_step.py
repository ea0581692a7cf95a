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


def vocab_topk(x: jnp.ndarray, k: int, block: int = 128):
    """Exact blocked top-k over the vocab axis. Context-dependent win —
    wired HERE (standalone per-step jit) but measured NEGATIVE inside the
    fused while_loop decoders, which keep plain ``lax.top_k``.

    Measured on v5e, (240, 51866) f32, k=6: STANDALONE (50-iter fori
    chains, one process, interleaved) lax.top_k costs 13.5 ms/iter vs 3.0
    for this blocked version (block sweep: 128 2.98 / 256 4.06 / 512 5.14
    / 1024 5.41; a 3-stage block-max variant no better and tie-fragile).
    But a same-process A/B of the FULL fused beam serving step (b48 k5
    int8, 64 tokens) measured plain 3.153 s/window vs blocked 3.288 —
    in-loop, XLA's own top_k lowering/fusion already hides the cost and
    the pad/reshape blocking only adds traffic. So device_beam.py /
    beam_engine.py use lax.top_k; this host-orchestrated step (a
    standalone jit, the context where the standalone numbers apply, on
    few rows) uses the blocked form.

    Exact including ties: a global top-k element is a top-k element of its
    own block, and both stages break value ties toward lower candidate
    position, which is lower token id — the same order ``lax.top_k`` uses
    (tested in tests/test_topk_beam.py).

    x: (rows, V) floats. Returns (vals (rows, k), ids (rows, k) int32).
    """
    rows, v = x.shape
    nb = (v + block - 1) // block
    pad = nb * block - v
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)), constant_values=-jnp.inf)
    xb = x.reshape(rows, nb, block)
    bv, bi = jax.lax.top_k(xb, k)                          # (rows, nb, k)
    cand_v = bv.reshape(rows, nb * k)
    cand_i = (bi + (jnp.arange(nb) * block)[None, :, None]).reshape(
        rows, nb * k)
    vals, sel = jax.lax.top_k(cand_v, k)
    ids = jnp.take_along_axis(cand_i, sel, axis=1)
    return vals, ids.astype(jnp.int32)


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
    top_lp, top_ids = vocab_topk(logprobs, k)
    eot_lp = logprobs[:, eot][:, None]
    return top_lp, top_ids, eot_lp, cache


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
