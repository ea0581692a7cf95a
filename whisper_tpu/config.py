"""Model configuration.

The 11-field i32 GGML hyperparameter header (reference: ``WhisperHparams::load``
at /root/reference/src/main.rs:606-659) becomes a frozen dataclass; the model
size is derived from ``n_audio_layer`` exactly as the reference's
``EModel::from_audio_layer`` (main.rs:104-115).

The reference's static arena budgets (``MEM_REQ_*`` tables, main.rs:117-189)
are obsolete under XLA's allocator; we keep only an HBM budget estimate used
for load-time sanity asserts and the load banner.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

# Audio frontend constants (reference: main.rs:25-29).
SAMPLE_RATE = 16_000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_SIZE = 30  # seconds per window
N_SAMPLES_PER_CHUNK = SAMPLE_RATE * CHUNK_SIZE  # 480_000
FRAMES_PER_SECOND = SAMPLE_RATE // HOP_LENGTH  # 100 mel frames / s
TIME_PRECISION = 0.02  # seconds per timestamp token tick (2 mel frames)

# n_audio_layer -> model family name (reference: EModel::from_audio_layer,
# main.rs:105-114, extended with the post-reference large-v3 variants which
# share n_audio_layer=32 with large; disambiguated by n_mels/n_vocab).
_AUDIO_LAYER_TO_NAME = {4: "tiny", 6: "base", 12: "small", 24: "medium", 32: "large"}


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    """Whisper hyperparameters, one field per GGML header i32 (main.rs:606-619)."""

    n_vocab: int = 51864
    n_audio_ctx: int = 1500
    n_audio_state: int = 384
    n_audio_head: int = 6
    n_audio_layer: int = 4
    n_text_ctx: int = 448
    n_text_state: int = 384
    n_text_head: int = 6
    n_text_layer: int = 4
    n_mels: int = 80
    f16: int = 1

    # Build-side knobs (not part of the GGML header).
    # "erf" matches openai/whisper + HF transformers exactly; "tanh" matches
    # ggml's approximate GELU (reference galois_gelu, main.rs:1777).
    gelu_impl: str = "erf"

    @property
    def model_type(self) -> str:
        name = _AUDIO_LAYER_TO_NAME.get(self.n_audio_layer, "unknown")
        if name == "large" and self.n_mels == 128:
            # v3 family; turbo prunes the decoder to 4 layers
            name = ("large-v3-turbo" if self.n_text_layer == 4
                    else "large-v3")
        return name

    @property
    def is_multilingual(self) -> bool:
        # Reference: WhisperVocab::is_multilingual (main.rs:594-596), extended
        # to cover large-v3's 51866-token vocab (adds one extra language token).
        return self.n_vocab >= 51865

    @property
    def d_head_audio(self) -> int:
        return self.n_audio_state // self.n_audio_head

    @property
    def d_head_text(self) -> int:
        return self.n_text_state // self.n_text_head

    def validate(self) -> "WhisperConfig":
        if self.n_audio_state % self.n_audio_head:
            raise ValueError("n_audio_state must be divisible by n_audio_head")
        if self.n_text_state % self.n_text_head:
            raise ValueError("n_text_state must be divisible by n_text_head")
        if self.n_mels not in (80, 128):
            raise ValueError(f"unsupported n_mels={self.n_mels}")
        return self

    def serving_hbm_estimate(
        self,
        batch: int = 1,
        ctx: Optional[int] = None,
        dtype_bytes: int = 2,
        kv_dtype_bytes: int = 2,
        beam: int = 1,
        enc_batch: Optional[int] = None,
        engine: bool = False,
    ) -> Dict[str, int]:
        """Per-term HBM budget for a serving configuration — the full version
        of the reference's MEM_REQ_* tables (main.rs:94-189): weights + cross
        memory + self-KV cache + peak encoder activations + transients, in
        bytes. ``batch`` counts STREAMS (beam groups): cross memory is
        group-shared (the decoder folds the beam axis into the query time
        axis, model/decoder.py), so cross rows = batch while KV rows =
        batch * beam. ``enc_batch`` is the encode batch (the engine admission
        bucket; defaults to batch — the lockstep path encodes all windows at
        once). ``engine=True`` adds the admission transient: the pre-scatter
        bucket's cross + KV rows coexist with the resident pools between
        _encode_prefill and the donated _refill_many scatter. beam > 1 adds
        one full KV-pool copy (the COW boundary materialization / fork
        permute is out-of-place).

        Use :func:`check_serving_hbm` to enforce this against the chip
        budget before compiling (e.g. large-v3 bf16 cross at 48 groups alone
        is 11.8 GB — int8 or a smaller batch is required on a 16 GB chip)."""
        c = min(ctx if ctx is not None else self.n_text_ctx, self.n_text_ctx)
        t, a = self.n_text_state, self.n_audio_state
        eb = min(enc_batch if enc_batch is not None else batch, batch)

        def cross_rows(n: int) -> int:
            b = 2 * self.n_text_layer * n * a * self.n_audio_ctx * kv_dtype_bytes
            if kv_dtype_bytes == 1:  # int8 adds per-position f32 scales
                b += (2 * self.n_text_layer * n * self.n_text_head
                      * self.n_audio_ctx * 4)
            return b

        def kv_rows(n: int) -> int:
            b = 2 * self.n_text_layer * n * t * c * kv_dtype_bytes
            if kv_dtype_bytes == 1:
                b += 2 * self.n_text_layer * n * self.n_text_head * c * 4
            return b

        cross = cross_rows(batch)
        kv = kv_rows(batch * beam)
        # encoder peak: ~4 live (B, 1500, a) activations + one (B, 1500, 4a)
        acts = eb * self.n_audio_ctx * a * (4 + 4) * dtype_bytes
        transient = 0
        if engine:  # admission bucket rows alongside the resident pools
            transient += cross_rows(eb) + kv_rows(eb * beam)
        if beam > 1:  # COW materialization: out-of-place full-pool permute
            transient += kv_rows(batch * beam)
        weights = self.hbm_bytes_estimate()
        total = weights + cross + kv + acts + transient
        return {"weights": weights, "cross": cross, "kv_cache": kv,
                "activations": acts, "transient": transient, "total": total}

    def hbm_bytes_estimate(self) -> int:
        """Analytic weight-size accounting; the TPU analogue of the reference's
        ctx_size bookkeeping (main.rs:823-944). Used for the load banner;
        see serving_hbm_estimate() for the full per-configuration budget."""
        ws = 2 if self.f16 == 1 else 4
        f32 = 4
        a, t, v, m = self.n_audio_state, self.n_text_state, self.n_vocab, self.n_mels
        size = 0
        # encoder stem + epilogue (main.rs:836-847)
        size += self.n_audio_ctx * a * f32  # e_pe
        size += 3 * m * a * ws + a * f32  # conv1
        size += 3 * a * a * ws + a * f32  # conv2
        size += 2 * a * f32  # ln_post
        # decoder embeddings (main.rs:850-859)
        size += self.n_text_ctx * t * f32 + v * t * ws + 2 * t * f32
        # encoder blocks: 4 n_state^2 attn mats + 8 n_state^2 mlp + small vecs
        size += self.n_audio_layer * (4 * a * a * ws + 8 * a * a * ws + 10 * a * f32)
        # decoder blocks: self-attn + cross-attn + mlp
        size += self.n_text_layer * (8 * t * t * ws + 8 * t * t * ws + 16 * t * f32)
        return size


# Canonical configs for each released model family, usable without a checkpoint
# (e.g. random-weight benchmarking). Header values match the released GGML files.
PRESETS: Dict[str, WhisperConfig] = {
    "tiny.en": WhisperConfig(51864, 1500, 384, 6, 4, 448, 384, 6, 4, 80, 1),
    "tiny": WhisperConfig(51865, 1500, 384, 6, 4, 448, 384, 6, 4, 80, 1),
    "base.en": WhisperConfig(51864, 1500, 512, 8, 6, 448, 512, 8, 6, 80, 1),
    "base": WhisperConfig(51865, 1500, 512, 8, 6, 448, 512, 8, 6, 80, 1),
    "small.en": WhisperConfig(51864, 1500, 768, 12, 12, 448, 768, 12, 12, 80, 1),
    "small": WhisperConfig(51865, 1500, 768, 12, 12, 448, 768, 12, 12, 80, 1),
    "medium.en": WhisperConfig(51864, 1500, 1024, 16, 24, 448, 1024, 16, 24, 80, 1),
    "medium": WhisperConfig(51865, 1500, 1024, 16, 24, 448, 1024, 16, 24, 80, 1),
    # "large" (v1) and v2 share every header field; GGML cannot distinguish
    # them (EModel keys on n_audio_layer alone, main.rs:104-115).
    "large": WhisperConfig(51865, 1500, 1280, 20, 32, 448, 1280, 20, 32, 80, 1),
    "large-v2": WhisperConfig(51865, 1500, 1280, 20, 32, 448, 1280, 20, 32, 80, 1),
    "large-v3": WhisperConfig(51866, 1500, 1280, 20, 32, 448, 1280, 20, 32, 128, 1),
    # v3 with the decoder pruned to 4 layers (openai's distilled release);
    # the serving sweet spot — the decoder dominates per-token cost.
    "large-v3-turbo": WhisperConfig(51866, 1500, 1280, 20, 32, 448, 1280, 20, 4, 128, 1),
}

# Published per-model alignment heads — the (decoder_layer, head) pairs whose
# cross-attention tracks audio time, used for word-level timestamps
# (pipeline/word_timing.py; the reference's per-token t0/t1 intent,
# main.rs:317-331). Values are the public head sets openai ships with each
# released checkpoint (the `alignment_heads` of the released generation
# configs / the decompressed `_ALIGNMENT_HEADS` masks), transcribed here
# because this sandbox has no network egress; re-validate against upstream
# whenever real checkpoints are available (docs/ROADMAP.md accuracy items).
# Unknown or ambiguous models fall back to openai's upper-half-layers rule.
ALIGNMENT_HEADS: Dict[str, Tuple[Tuple[int, int], ...]] = {
    "tiny.en": ((1, 0), (2, 0), (2, 5), (3, 0), (3, 1), (3, 2), (3, 3), (3, 4)),
    "tiny": ((2, 2), (3, 0), (3, 2), (3, 3), (3, 4), (3, 5)),
    # base.en: no reliably-reproducible offline record (tests/test_word_timing
    # range-checks every entry against its preset geometry and rejected the
    # candidate set); absent -> upper-half fallback until assets allow
    # transcribing the published config.
    "base": ((3, 1), (4, 2), (4, 3), (4, 7), (5, 1), (5, 2), (5, 4), (5, 6)),
    "small.en": ((6, 6), (7, 0), (7, 3), (7, 8), (8, 2), (8, 5), (8, 7),
                 (9, 0), (9, 4), (9, 8), (9, 10)),
    "small": ((5, 3), (5, 9), (8, 0), (8, 4), (8, 7), (8, 8), (9, 0), (9, 7),
              (9, 9), (10, 5)),
    "medium.en": ((11, 4), (14, 1), (14, 12), (14, 14), (15, 4), (16, 0),
                  (16, 4), (16, 9), (17, 12), (17, 14), (18, 7), (18, 10),
                  (18, 15), (20, 0), (20, 3), (20, 9), (20, 14), (21, 12)),
    "medium": ((13, 15), (15, 4), (15, 15), (16, 1), (20, 0), (23, 4)),
    "large": ((9, 19), (11, 2), (11, 4), (11, 17), (22, 7), (22, 11),
              (22, 17), (23, 2), (23, 15)),  # large-v1
    "large-v2": ((10, 12), (13, 17), (16, 11), (16, 12), (16, 13), (17, 15),
                 (17, 16), (18, 4), (18, 11), (18, 19), (19, 11), (21, 2),
                 (21, 3), (22, 3), (22, 9), (22, 12), (23, 5), (23, 7),
                 (23, 13), (25, 5), (26, 1), (26, 12), (27, 15)),
    "large-v3": ((7, 0), (10, 17), (12, 18), (13, 12), (16, 1), (17, 14),
                 (19, 11), (21, 4), (24, 1), (25, 6)),
    "large-v3-turbo": ((2, 4), (2, 11), (3, 3), (3, 6), (3, 11), (3, 14)),
}


def lookup_alignment_heads(cfg: "WhisperConfig") -> Optional[Tuple[Tuple[int, int], ...]]:
    """The published alignment-head set for the model a GGML header
    describes, or None when the header is ambiguous. The header pins
    (n_audio_layer, n_vocab, n_text_layer): every released model resolves
    uniquely EXCEPT large-v1 vs large-v2 (identical headers,
    main.rs:104-115 keys on n_audio_layer alone) — those return None and
    word timing uses the upper-half-layers fallback rather than guess."""
    for name, preset in PRESETS.items():
        if (
            preset.n_audio_layer == cfg.n_audio_layer
            and preset.n_vocab == cfg.n_vocab
            and preset.n_text_layer == cfg.n_text_layer
        ):
            if name == "large" or name == "large-v2":
                if cfg.n_audio_layer == 32 and cfg.n_vocab == 51865:
                    return None  # v1/v2 indistinguishable from the header
            return ALIGNMENT_HEADS.get(name)
    return None


# ---- serving HBM budget enforcement (the reference's MEM_REQ intent:
# fail BEFORE allocating, main.rs:119-189) ----

# Fraction of physical HBM the estimator may plan against. Calibrated on the
# v5e (15.75 GB) against the measured fit/crash boundary (BASELINE.md):
#   fits:    lockstep greedy b64 (12.9 GB est), lockstep beam b48 (13.0),
#            engine s64 bucket16 (13.9), engine s48 bucket32 (14.3),
#            beam engine 32 groups (12.8)
#   crashes: lockstep beam b56 (14.7), beam engine 48 groups (16.1)
# 0.92 * 15.75 = 14.49 GB sits between the largest measured fit (14.3) and
# the smallest measured crash (14.7); the ~8% reserve covers XLA's runtime
# reservation + fragmentation. Override the physical size with
# WHISPER_TPU_HBM_BYTES (an int) when serving on a different chip.
HBM_UTILIZATION = 0.92
DEFAULT_HBM_BYTES = int(15.75 * 2**30)


def _physical_hbm_bytes() -> int:
    import os

    env = os.environ.get("WHISPER_TPU_HBM_BYTES")
    if env:
        return int(env)
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats()
        if stats and stats.get("bytes_limit"):
            return int(stats["bytes_limit"])
    except Exception:
        pass
    return DEFAULT_HBM_BYTES


def check_serving_hbm(
    cfg: "WhisperConfig",
    batch: int,
    *,
    beam: int = 1,
    ctx: Optional[int] = None,
    kv_dtype_bytes: int = 2,
    enc_batch: Optional[int] = None,
    engine: bool = False,
    what: str = "serving config",
    budget_bytes: Optional[int] = None,
    extra_bytes: int = 0,
) -> Dict[str, int]:
    """Refuse a serving configuration whose HBM estimate exceeds the chip
    budget — raising a typed :class:`~whisper_tpu.errors.HbmBudgetError`
    BEFORE any pool allocation or compile, instead of letting the worker
    crash or hang mid-allocation (the measured failure mode of oversized
    beam batches, BASELINE.md). Returns the per-term estimate on success.

    Called by SlotEngine/BeamSlotEngine construction, ``cli serve/batch``,
    and the benchmarks; see :meth:`WhisperConfig.serving_hbm_estimate` for
    the cost model and the module constants above for the calibration."""
    from .errors import HbmBudgetError

    est = cfg.serving_hbm_estimate(
        batch=batch, ctx=ctx, kv_dtype_bytes=kv_dtype_bytes, beam=beam,
        enc_batch=enc_batch, engine=engine)
    if extra_bytes:  # caller-specific additions (e.g. the spec draft pools)
        est = dict(est, extra=extra_bytes, total=est["total"] + extra_bytes)
    if budget_bytes is None:
        budget_bytes = int(_physical_hbm_bytes() * HBM_UTILIZATION)
    if est["total"] > budget_bytes:
        raise HbmBudgetError(what, est, budget_bytes, batch=batch, beam=beam)
    return est
