"""Typed error model for whisper_tpu.

Mirrors the reference's error enum (``WsError`` at /root/reference/src/main.rs:50-92)
as a Python exception hierarchy: every load/parse failure mode the reference
distinguishes gets its own exception type so callers can match on them.
"""

from __future__ import annotations


class WhisperError(Exception):
    """Base class for all whisper_tpu errors (reference: WsError)."""


class BadMagicError(WhisperError):
    """Model file does not start with the GGML magic (main.rs:56-57, 368-371)."""

    def __init__(self, path: str, magic: int):
        super().__init__(f"invalid model file {path!r} (bad magic: 0x{magic:08x})")
        self.path = path
        self.magic = magic


class UnknownTensorError(WhisperError):
    """Checkpoint contains a tensor name not in the model schema (main.rs:60-61)."""

    def __init__(self, name: str):
        super().__init__(f"unknown tensor {name!r} in model file")
        self.name = name


class WrongSizeTensorError(WhisperError):
    """Tensor element count mismatch (main.rs:64-65)."""

    def __init__(self, name: str, got: int, expected: int):
        super().__init__(
            f"tensor {name!r} has wrong size in model file, got:{got}, expected:{expected}"
        )
        self.name = name
        self.got = got
        self.expected = expected


class WrongShapeTensorError(WhisperError):
    """Tensor shape mismatch (main.rs:66-67)."""

    def __init__(self, name: str, got, expected):
        super().__init__(
            f"tensor {name!r} has wrong shape in model file, got:{got}, expected:{expected}"
        )
        self.name = name
        self.got = tuple(got)
        self.expected = tuple(expected)


class WrongBytesTensorError(WhisperError):
    """Tensor byte count mismatch (main.rs:68-69)."""

    def __init__(self, name: str, got: int, expected: int):
        super().__init__(
            f"tensor {name!r} has wrong bytes in model file, got:{got}, expected:{expected}"
        )
        self.name = name
        self.got = got
        self.expected = expected


class TruncatedFileError(WhisperError):
    """Model file ended mid-record."""


class UnsupportedFtypeError(WhisperError):
    """Tensor record carries a ggml ftype this format version doesn't have.

    whisper.cpp-1.0.3 files hold f32 (0) / f16 (1) tensors only; later
    quantized ggml types (q4/q5/q8, ftype 2+) are a different container
    generation and would misparse silently if treated as f16.
    """

    def __init__(self, name: str, ftype: int):
        super().__init__(
            f"tensor {name!r} has unsupported ggml ftype {ftype} "
            "(whisper.cpp-1.0.3 files are f32/f16 only)")
        self.name = name
        self.ftype = ftype


class HbmBudgetError(WhisperError):
    """Serving configuration's HBM estimate exceeds the chip budget.

    Raised BEFORE pools are allocated or programs compiled — the TPU
    analogue of the reference's MEM_REQ_* pre-allocation sizing tables
    (main.rs:119-189): an oversized (batch, beam, dtype) combination must
    fail with a clear error instead of crashing or hanging the worker
    mid-allocation (config.check_serving_hbm; calibration in config.py)."""

    def __init__(self, what: str, estimate: dict, budget_bytes: int,
                 batch: int = 0, beam: int = 1):
        gb = 2**30
        terms = ", ".join(f"{k} {v / gb:.2f}" for k, v in estimate.items()
                          if k != "total")
        super().__init__(
            f"{what} needs ~{estimate['total'] / gb:.2f} GB HBM "
            f"(batch={batch}, beam={beam}; {terms} GB) but only "
            f"{budget_bytes / gb:.2f} GB is budgeted — reduce batch/beam, "
            f"quantize the KV pools (int8), or raise WHISPER_TPU_HBM_BYTES "
            f"if the chip is larger")
        self.what = what
        self.estimate = estimate
        self.budget_bytes = budget_bytes
        self.batch = batch
        self.beam = beam


class AudioError(WhisperError):
    """WAV/PCM ingestion failure."""


class DecodingError(WhisperError):
    """Decoding loop failure (all temperature fallbacks exhausted, etc.)."""
