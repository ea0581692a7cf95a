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
from typing import Dict, Optional

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
    ) -> Dict[str, int]:
        """Per-term HBM budget for a serving configuration — the full version
        of the reference's MEM_REQ_* tables (main.rs:94-189): weights + cross
        memory + self-KV cache + peak encoder activations, in bytes. Use to
        sanity-check a (model, batch, dtype) combination against chip HBM
        before compiling (e.g. large-v3 bf16 cross at b48 alone is 11.8 GB —
        int8 or a smaller batch is required on a 16 GB chip)."""
        c = min(ctx if ctx is not None else self.n_text_ctx, self.n_text_ctx)
        t, a = self.n_text_state, self.n_audio_state
        cross = 2 * self.n_text_layer * batch * a * self.n_audio_ctx * kv_dtype_bytes
        if kv_dtype_bytes == 1:  # int8 adds per-position f32 scales
            cross += 2 * self.n_text_layer * batch * self.n_text_head * self.n_audio_ctx * 4
        kv = 2 * self.n_text_layer * batch * t * c * kv_dtype_bytes
        if kv_dtype_bytes == 1:
            kv += 2 * self.n_text_layer * batch * self.n_text_head * c * 4
        # encoder peak: ~4 live (B, 1500, a) activations + one (B, 1500, 4a)
        acts = batch * self.n_audio_ctx * a * (4 + 4) * dtype_bytes
        weights = self.hbm_bytes_estimate()
        total = weights + cross + kv + acts
        return {"weights": weights, "cross": cross, "kv_cache": kv,
                "activations": acts, "total": total}

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
