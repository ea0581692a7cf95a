"""Speculative greedy decoding: a small DRAFT model proposes, the target
verifies blocks of tokens in one forward.

Greedy speculative decoding is exact IN EXACT ARITHMETIC: the emitted
sequence is token-identical to plain greedy decoding of the target model
(tests/test_speculative.py checks both the 100%-acceptance and
~0%-acceptance extremes, CPU fp32). One caveat on real hardware: the verify
block is a T=gamma forward while plain greedy steps are T=1 forwards —
different matmul tilings can round near-tied logits to a different argmax
on TPU bf16, the same class of divergence as any batched-vs-single forward
(on-chip identity should be spot-checked per deployment). Each round

  1. emits the already-known next token ``t_n`` (argmax of the target's
     rule-filtered logits — exactly the host loop's per-token block,
     task.py:run),
  2. rolls the draft forward ``gamma-1`` greedy steps to propose
     ``p_1..p_{gamma-1}`` (the same rule filters applied, which only helps
     acceptance — correctness never depends on the draft),
  3. runs ONE target forward over the block ``[t_n, p_1..p_{gamma-1}]``
     (decode_step's multi-token path — the same program prefill uses) and
     accepts the longest prefix where the target's own rule-filtered argmax
     agrees; the first disagreement is the next round's known token.

Cache bookkeeping: decode_step writes K/V at ``n_past..n_past+g-1`` and masks
reads past ``n_past``, so rejecting a suffix is just NOT advancing ``n_past``
over it — stale rows are overwritten by the next block. The draft consumes
one extra token per round (its last own proposal) so its cache always covers
the full accepted prefix and rewinds with the same ``n_past``.

This is the host reference implementation (one device dispatch per draft
step). On remote/tunneled chips dispatch latency dominates, so the wall-clock
win requires a real draft checkpoint AND the fused on-device variant
(ROADMAP); with random weights only the mechanics are testable.

The reference has no decoder at all (SURVEY §3.5); upstream context:
distil-whisper-style draft models make large-v3 ~2x faster at greedy.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..model.decoder import decode_step, init_cache
from .result import DecodingResult, compression_ratio
from .rules import log_softmax
from .task import DecodingTask, _cache_dtype, _pad_to_bucket


def decode_speculative(
    params_t, cfg_t, vocab, cross_k_t, cross_v_t,
    params_d, cfg_d, cross_k_d, cross_v_d,
    options, gamma: int = 4,
) -> Tuple[DecodingResult, dict]:
    """Greedy speculative decode of ONE segment (batch 1).

    ``cross_*_t`` come from the target's encoder, ``cross_*_d`` from the
    DRAFT's own encoder over the same mel window. Vocab (token ids) must
    match; geometries may differ. Returns (result, stats) where stats
    reports rounds / proposed / accepted for telemetry and tests.
    """
    if options.beam_size is not None or (options.best_of or 1) != 1:
        raise ValueError("speculative decoding is greedy-only")
    if options.temperature != 0:
        raise ValueError("speculative decoding requires temperature == 0")
    if cfg_t.n_vocab != cfg_d.n_vocab:
        raise ValueError("draft and target must share the vocabulary")
    if gamma < 2:
        raise ValueError("gamma >= 2 (gamma-1 draft proposals per round)")

    task = DecodingTask(cfg_t, vocab, options)
    eot = vocab.token_eot
    sample_len = task.sample_len

    tokens = np.tile(np.array(task.initial_tokens, np.int32), (1, 1))
    cache_t = init_cache(cfg_t, 1, dtype=_cache_dtype(cross_k_t))
    cache_d = init_cache(cfg_d, 1, dtype=_cache_dtype(cross_k_d))

    # Prefill both models on the (bucket-padded) prompt.
    padded, true_len = _pad_to_bucket(tokens)
    la_t, cache_t = decode_step(
        params_t, jnp.asarray(padded), jnp.int32(0), cache_t,
        cross_k_t, cross_v_t, cfg_t)
    _, cache_d = decode_step(
        params_d, jnp.asarray(padded), jnp.int32(0), cache_d,
        cross_k_d, cross_v_d, cfg_d)
    la_t = np.asarray(la_t, dtype=np.float32)
    probs_at_sot = np.exp(log_softmax(la_t[:, task.sot_index]))
    no_speech_prob = float(probs_at_sot[0, vocab.token_nosp])
    logits_t = la_t[:, true_len - 1]          # predicts the next token
    n_t = n_d = true_len

    sum_logprobs = np.zeros(1, dtype=np.float64)
    stats = {"rounds": 0, "proposed": 0, "accepted": 0, "target_steps": 0}

    def pick(logits: np.ndarray, toks: np.ndarray) -> Tuple[int, float]:
        """Rule-filtered greedy choice + its logprob (GreedyDecoder
        bookkeeping: logprob taken from the FILTERED distribution)."""
        filt = logits.copy()
        for f in task.filters:
            f(filt, toks)
        nxt = int(filt[0].argmax())
        lp = float(log_softmax(filt)[0, nxt])
        return nxt, lp

    emitted = 0
    completed = False
    while emitted < sample_len and not completed:
        # 1. the known next token, straight from the target's logits.
        t_n, lp = pick(logits_t, tokens)
        sum_logprobs[0] += lp
        tokens = np.concatenate(
            [tokens, np.array([[t_n]], np.int32)], axis=-1)
        emitted += 1
        if t_n == eot or tokens.shape[-1] > cfg_t.n_text_ctx:
            completed = True
            break
        stats["rounds"] += 1

        # 2. draft proposals p_1..p_{g-1} (greedy, same filters).
        g = int(min(gamma, sample_len - emitted + 1))
        lg_d, cache_d = decode_step(
            params_d, jnp.asarray([[t_n]], jnp.int32), jnp.int32(n_d),
            cache_d, cross_k_d, cross_v_d, cfg_d)
        logits_d = np.asarray(lg_d[:, 0], np.float32)
        n_d += 1
        proposals = []
        toks_d = tokens
        for _ in range(g - 1):
            p, _lp = pick(logits_d, toks_d)
            proposals.append(p)
            toks_d = np.concatenate(
                [toks_d, np.array([[p]], np.int32)], axis=-1)
            lg_d, cache_d = decode_step(
                params_d, jnp.asarray([[p]], jnp.int32), jnp.int32(n_d),
                cache_d, cross_k_d, cross_v_d, cfg_d)
            logits_d = np.asarray(lg_d[:, 0], np.float32)
            n_d += 1
        stats["proposed"] += len(proposals)

        # 3. one target forward over [t_n, p_1..p_{g-1}]; verify.
        block = np.array([[t_n] + proposals], np.int32)
        la, cache_t = decode_step(
            params_t, jnp.asarray(block), jnp.int32(n_t), cache_t,
            cross_k_t, cross_v_t, cfg_t)
        la = np.asarray(la, np.float32)
        stats["target_steps"] += 1
        accepted = 0
        for j, p in enumerate(proposals):
            nxt, lp = pick(la[:, j], tokens)
            if nxt != p:
                logits_t = la[:, j]  # disagreement: nxt is next round's t_n
                break
            sum_logprobs[0] += lp
            tokens = np.concatenate(
                [tokens, np.array([[nxt]], np.int32)], axis=-1)
            emitted += 1
            accepted += 1
            if nxt == eot or tokens.shape[-1] > cfg_t.n_text_ctx:
                completed = True
                break
            if emitted >= sample_len:
                completed = True
                break
        else:
            # every proposal accepted: the block's last logits are live.
            logits_t = la[:, g - 1]
        stats["accepted"] += accepted
        # rewind both caches to the accepted prefix (stale rows past n_past
        # are masked on read and overwritten by the next block).
        n_t += 1 + accepted
        n_d = n_t

    seq = tokens[0].tolist()
    end = seq.index(eot, task.sample_begin) if eot in seq[task.sample_begin:] \
        else len(seq)
    toks = [int(t) for t in seq[task.sample_begin:end]]
    text = vocab.decode(toks).strip()
    result = DecodingResult(
        tokens=toks, text=text,
        avg_logprob=float(sum_logprobs[0]) / (len(toks) + 1),
        no_speech_prob=no_speech_prob,
        temperature=0.0,
        compression_ratio=compression_ratio(text),
    )
    return result, stats
