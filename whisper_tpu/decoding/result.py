"""Decoding result types.

The richer version of the reference's scaffolding (``WhisperTokenData`` at
/root/reference/src/main.rs:317-331, ``WhisperSegment`` at main.rs:599-604):
those structs exist in the reference with no code path; here they are the
actual decode outputs.
"""

from __future__ import annotations

import dataclasses
import zlib
from typing import List, Optional


@dataclasses.dataclass
class TokenData:
    """Per-token data (reference WhisperTokenData, main.rs:317-331)."""

    id: int
    p: float = 0.0       # probability of the token
    t0: float = -1.0     # start time (s), token-level (if computed)
    t1: float = -1.0     # end time (s)


@dataclasses.dataclass
class DecodingResult:
    tokens: List[int]
    text: str
    avg_logprob: float
    no_speech_prob: float
    temperature: float
    compression_ratio: float
    token_probs: Optional[List[float]] = None


@dataclasses.dataclass
class Segment:
    """One output segment (reference WhisperSegment, main.rs:599-604)."""

    id: int
    seek: int            # mel-frame offset of the window this came from
    t0: float            # start time in seconds
    t1: float            # end time in seconds
    text: str
    tokens: List[int]
    avg_logprob: float
    no_speech_prob: float
    temperature: float
    compression_ratio: float
    token_data: Optional[List[TokenData]] = None
    # word-level timestamps (cross-attention DTW, pipeline/word_timing.py)
    words: Optional[List[dict]] = None


def compression_ratio(text: str) -> float:
    """zlib compressibility of the text — openai's repetition gate."""
    data = text.encode("utf-8")
    if not data:
        return 0.0
    return len(data) / len(zlib.compress(data))
