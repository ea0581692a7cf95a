"""Word-level timestamps via cross-attention DTW (openai's timing method).

The reference scaffolds per-token timing data (``WhisperTokenData.t0/t1``,
/root/reference/src/main.rs:317-331) but never computes it; whisper.cpp's
experimental token-level heuristic lives in pipeline/timestamps.py. This
module implements the higher-quality method openai ships (whisper/timing.py
semantics, re-expressed): teacher-force the segment's tokens once, read the
decoder's cross-attention distributions (model/decoder.cross_attention_probs),
median-filter and z-normalize the alignment-head average, dynamic-time-warp
the (token, audio-frame) cost matrix, and read word boundaries off the
monotone path.

Alignment heads: the published per-release head sets ship with the presets
(config.ALIGNMENT_HEADS) and are selected automatically from the GGML header
(model_alignment_heads); unknown models — and large-v1/v2, whose headers are
identical — use openai's fallback: every head of the upper half of the
decoder layers.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

AUDIO_TIME_PER_TOKEN = 0.02  # seconds per (2x-downsampled) audio position


@dataclasses.dataclass
class WordTiming:
    word: str
    tokens: List[int]
    start: float
    end: float
    probability: float = 0.0


def median_filter(x: np.ndarray, width: int) -> np.ndarray:
    """Median filter along the last axis with edge reflection (odd width)."""
    if width <= 1:
        return x
    pad = width // 2
    if x.shape[-1] <= pad:
        return x
    xp = np.concatenate(
        [x[..., 1 : pad + 1][..., ::-1], x, x[..., -pad - 1 : -1][..., ::-1]],
        axis=-1,
    )
    windows = np.lib.stride_tricks.sliding_window_view(xp, width, axis=-1)
    return np.median(windows, axis=-1)


def dtw(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Dynamic time warping over an (N_tokens, M_frames) cost matrix.

    Returns (text_indices, time_indices) of the minimum-cost monotone path
    (openai's dtw_cpu semantics: moves are down, right, diagonal; strict-<
    tie-breaks exactly as whisper/timing.py's scalar loop). Vectorized over
    anti-diagonals: cell (i, j) depends only on diagonals d-1 and d-2, so
    each of the N+M-1 diagonals is one numpy vector step — ~100x fewer
    Python iterations than the naive O(N*M) scalar loop on a 30 s segment
    (~100 x 1500), which cost 0.1-0.3 s host time per segment."""
    N, M = cost.shape
    D = np.full((N + 1, M + 1), np.inf, dtype=np.float64)
    D[0, 0] = 0.0
    trace = np.zeros((N + 1, M + 1), dtype=np.int8)
    for d in range(2, N + M + 1):
        lo, hi = max(1, d - M), min(N, d - 1)
        if lo > hi:
            continue
        i = np.arange(lo, hi + 1)
        j = d - i
        c0 = D[i - 1, j - 1]
        c1 = D[i - 1, j]
        c2 = D[i, j - 1]
        t = np.where((c0 < c1) & (c0 < c2), 0, np.where(c1 < c2, 1, 2))
        val = np.where(t == 0, c0, np.where(t == 1, c1, c2))
        D[i, j] = val + cost[i - 1, j - 1]
        trace[i, j] = t
    i, j = N, M
    text_indices, time_indices = [], []
    while i > 0 or j > 0:
        text_indices.append(i - 1)
        time_indices.append(j - 1)
        if i > 0 and j > 0:
            t = trace[i, j]
        elif i > 0:
            t = 1
        else:
            t = 2
        if t == 0:
            i -= 1
            j -= 1
        elif t == 1:
            i -= 1
        else:
            j -= 1
    return np.array(text_indices[::-1]), np.array(time_indices[::-1])


def default_alignment_heads(n_layer: int, n_head: int) -> np.ndarray:
    """(L, H) bool mask — openai's fallback: all heads of the upper half."""
    mask = np.zeros((n_layer, n_head), dtype=bool)
    mask[n_layer // 2 :] = True
    return mask


def model_alignment_heads(cfg, n_layer: int, n_head: int) -> np.ndarray:
    """(L, H) bool mask for the model ``cfg`` describes: the published
    per-release head set (config.ALIGNMENT_HEADS) when the GGML header
    resolves a released model unambiguously, else the upper-half fallback
    (unknown models, and large-v1/v2 whose headers are identical)."""
    from ..config import lookup_alignment_heads

    pairs = lookup_alignment_heads(cfg)
    if not pairs:
        return default_alignment_heads(n_layer, n_head)
    mask = np.zeros((n_layer, n_head), dtype=bool)
    for l, h in pairs:
        if l < n_layer and h < n_head:
            mask[l, h] = True
    if not mask.any():  # defensive: malformed table entry
        return default_alignment_heads(n_layer, n_head)
    return mask


def split_tokens_on_spaces(vocab, tokens: Sequence[int]):
    """Group tokens into words: a token whose text begins with a space (or
    follows punctuation rules) starts a new word (openai's spaced-language
    splitter, simplified to byte-level rules)."""
    words: List[str] = []
    word_tokens: List[List[int]] = []
    for tok in tokens:
        if tok >= vocab.token_eot:
            continue
        piece = vocab.token_bytes(int(tok)).decode("utf-8", errors="replace")
        special = tok >= vocab.token_eot
        with_space = piece.startswith(" ")
        punctuation = piece.strip() in "\"'“¿([{-\"'.。,，!！?？:：”)]}、"
        if not words or (with_space and not punctuation) or special:
            words.append(piece)
            word_tokens.append([int(tok)])
        else:
            words[-1] += piece
            word_tokens[-1].append(int(tok))
    return words, word_tokens


def find_word_timestamps(
    params,
    cfg,
    vocab,
    cross_k,
    cross_v,
    text_tokens: Sequence[int],
    initial_tokens: Sequence[int],
    *,
    num_frames: Optional[int] = None,
    time_offset: float = 0.0,
    alignment_heads: Optional[np.ndarray] = None,
    medfilt_width: int = 7,
) -> List[WordTiming]:
    """Word boundary times for one decoded segment.

    cross_k/cross_v: the segment's encoder memory (batch 1, bf16/f32 —
    timing is a per-segment epilogue, not the serving hot path).
    text_tokens: the sampled tokens (timestamp tokens included are fine;
    they are filtered). num_frames: valid audio positions (content frames /
    2); attention beyond it is ignored.
    """
    import jax.numpy as jnp

    from ..model.decoder import cross_attention_probs

    eot = vocab.token_eot
    # openai filters timestamp/special tokens before the alignment pass; the
    # trailing EOT row of the matrix supplies the final word's end boundary.
    text_tokens = [int(t) for t in text_tokens if int(t) < eot]
    if not text_tokens:
        return []
    sequence = list(initial_tokens) + text_tokens + [eot]
    tokens_arr = jnp.asarray(np.array(sequence, np.int32)[None])
    # (L, 1, H, T, Ta) on DEVICE. Select the alignment heads and slice the
    # valid frames there and fetch only (N_heads, T, nf) — the full tensor
    # is ~300-400 MB f32 for large-v3 (32x20xTx1500), and large device_get
    # fetches hang for minutes on the tunneled chip (CLAUDE.md).
    probs_dev = cross_attention_probs(params, tokens_arr, cross_k, cross_v, cfg)
    L, _, H, T, Ta = probs_dev.shape
    if alignment_heads is None:
        alignment_heads = model_alignment_heads(cfg, L, H)
    idx_l, idx_h = np.nonzero(alignment_heads)
    w_dev = probs_dev[jnp.asarray(idx_l), 0, jnp.asarray(idx_h)]  # (N, T, Ta)
    nf = Ta if num_frames is None else max(1, min(num_frames, Ta))
    w_dev = w_dev[..., :nf]
    # openai slices to num_frames BEFORE the softmax (whisper/timing.py);
    # a softmax restricted to the slice == the full softmax renormalized
    # over it, exactly — so renormalize rather than re-running attention.
    w_dev = w_dev / jnp.clip(
        jnp.sum(w_dev, axis=-1, keepdims=True), 1e-10, None)
    w = np.asarray(w_dev, dtype=np.float32)
    # openai order: z-normalize over the token axis, THEN median-filter
    # (the two don't commute).
    std = w.std(axis=-2, keepdims=True)
    mean = w.mean(axis=-2, keepdims=True)
    w = (w - mean) / np.maximum(std, 1e-8)
    w = median_filter(w, medfilt_width)
    matrix = w.mean(axis=0)                         # (T, nf)
    # align only the sampled region (skip sot/prompt prefix, keep final EOT)
    begin = len(initial_tokens)
    matrix = matrix[begin:]
    text_indices, time_indices = dtw(-matrix.astype(np.float64))

    words, word_tokens = split_tokens_on_spaces(vocab, text_tokens)
    if not words:
        return []
    # token boundary time = first path position where the token index jumps
    jumps = np.pad(np.diff(text_indices), (1, 0), constant_values=1).astype(bool)
    jump_times = time_indices[jumps] * AUDIO_TIME_PER_TOKEN
    n_aligned = matrix.shape[0]
    token_starts = np.zeros(n_aligned)
    token_starts[: len(jump_times)] = jump_times[:n_aligned]
    # boundaries per word from cumulative token counts
    out: List[WordTiming] = []
    idx = 0
    for word, toks in zip(words, word_tokens):
        start_idx = idx
        idx += len(toks)
        if start_idx >= n_aligned:
            break
        start = float(token_starts[start_idx])
        end = float(token_starts[idx]) if idx < n_aligned else float(
            (time_indices[-1] + 1) * AUDIO_TIME_PER_TOKEN
        )
        if word.strip():
            out.append(
                WordTiming(
                    word=word, tokens=toks,
                    start=round(time_offset + start, 2),
                    end=round(time_offset + max(end, start), 2),
                )
            )
    return out
