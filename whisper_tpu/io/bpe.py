"""Exact GPT-2 byte-level BPE, reconstructed from the GGML vocab itself.

Whisper's GGML checkpoints store token byte strings in id order but no merges
table (the reference reads only the byte table, main.rs:578-592). Exact BPE
is still recoverable because a byte-level BPE vocab's id order IS its merge
creation order: token ``z`` created by merge ``r`` has id ``base + r``, and
every merge in ``z``'s derivation has a strictly smaller id. So, walking ids
in order and BPE-splitting each multi-byte token with the merges recovered so
far must yield exactly two pieces — that pair is merge ``r``. This recovers
the original merges table exactly (no greedy-longest-match approximation),
which makes prompt conditioning token-identical to openai-whisper.

Pre-tokenization uses GPT-2's regex (the same pattern tiktoken's ``gpt2``
encoding and whisper's multilingual tokenizer use), via the ``regex`` module
for ``\\p{L}``/``\\p{N}`` classes.

Provenance: algorithm semantics follow openai/gpt-2 ``encoder.py`` (MIT);
the merge-table reconstruction is original.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import regex as _regex

# GPT-2 / whisper-multilingual pre-tokenizer pattern (tiktoken "gpt2").
_PAT = _regex.compile(
    r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""
)


class ByteBPE:
    """Byte-level BPE encoder over a raw-bytes id table.

    Parameters
    ----------
    id_to_token : id -> raw token bytes (as stored in GGML files).
    n_text : number of text tokens (ids >= n_text are special/timestamp
        tokens synthesized outside the BPE vocab and excluded).
    """

    def __init__(self, id_to_token: Dict[int, bytes], n_text: int):
        self._byte_id: Dict[int, int] = {}   # byte value -> token id
        self._ranks: Dict[Tuple[int, int], int] = {}  # (id, id) -> merged id
        self._id_to_token = id_to_token
        self._n_text = n_text
        self._build()

    # -- reconstruction --

    def _build(self) -> None:
        for tid in range(self._n_text):
            b = self._id_to_token.get(tid)
            if b is None:
                continue
            if len(b) == 1:
                self._byte_id.setdefault(b[0], tid)

        if len(self._byte_id) < 256:
            # Not a byte-level BPE vocab (e.g. synthetic test fixtures).
            self.valid = False
            return

        skipped = 0
        for tid in range(self._n_text):
            b = self._id_to_token.get(tid)
            if b is None or len(b) < 2:
                continue
            pieces = self._merge_bytes(b)
            if pieces is not None and len(pieces) == 2:
                self._ranks[(pieces[0], pieces[1])] = tid
            else:
                # Token not derivable as a single merge over earlier tokens
                # (never happens for true BPE vocabs; tolerate noise).
                skipped += 1
        self.valid = skipped < self._n_text // 100

    def _merge_bytes(self, data: bytes) -> Optional[List[int]]:
        """BPE over raw bytes using the merges recovered so far."""
        try:
            parts = [self._byte_id[c] for c in data]
        except KeyError:
            return None
        return self._merge_ids(parts)

    def _merge_ids(self, parts: List[int]) -> List[int]:
        """Standard BPE: repeatedly merge the adjacent pair whose merged
        token has the lowest id (= lowest merge rank)."""
        ranks = self._ranks
        while len(parts) > 1:
            best_rank = None
            best_i = -1
            for i in range(len(parts) - 1):
                r = ranks.get((parts[i], parts[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank = r
                    best_i = i
            if best_rank is None:
                break
            parts[best_i : best_i + 2] = [best_rank]
        return parts

    # -- encoding --

    def encode(self, text: str) -> List[int]:
        """Exact GPT-2 BPE token ids for ``text`` (no special tokens)."""
        if not self.valid:
            raise ValueError("vocab is not a byte-level BPE table")
        out: List[int] = []
        for word in _PAT.findall(text):
            out.extend(self._merge_bytes(word.encode("utf-8")) or [])
        return out

    def encode_first(self, text: str) -> Optional[int]:
        """First token of the encoding (openai's miscellaneous-symbol rule)."""
        ids = self.encode(text)
        return ids[0] if ids else None

    @property
    def n_merges(self) -> int:
        return len(self._ranks)
