"""Batched multi-stream serving (BASELINE config 5).

Many independent audio streams transcribed concurrently on a (dp, tp) mesh:
mel + encoder run as one batched forward (batch sharded over dp, heads/mlp
over tp), then the decode loop runs all streams in lockstep — one device step
per token for the whole batch, host-side logit rules vectorized over streams.
Streams that finish early are frozen at EOT (their KV writes are masked by
their own finished state) until the batch drains.

The reference has no analogue (single stream, single thread,
/root/reference/src/main.rs:2065-2075); this is the TPU-native scale-out the
SURVEY (§2.2) prescribes.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..decoding.result import DecodingResult
from ..decoding.task import DecodingOptions
from ..frontend.mel import frame_count, log_mel_spectrogram, mel_window
from ..model.encoder import encode
from ..model.load import WhisperModel
from .mesh import make_mesh
from .sharding import batch_pspec, shard_params

N_FRAMES = 3000


class BatchTranscriber:
    """Fixed-batch greedy transcription engine over a device mesh."""

    def __init__(
        self,
        model: WhisperModel,
        batch_size: int,
        mesh=None,
        use_flash: bool = False,
        options: Optional[DecodingOptions] = None,
    ):
        self.model = model
        self.batch_size = batch_size
        self.mesh = mesh
        self.use_flash = use_flash
        self.options = options or DecodingOptions(without_timestamps=True)
        if mesh is not None:
            self.params = shard_params(model.params, mesh)
        else:
            self.params = model.params

    def _mel_batch(self, audios: Sequence[np.ndarray]) -> jnp.ndarray:
        cfg = self.model.config
        out = []
        for audio in audios:
            n = frame_count(len(audio))
            mel = log_mel_spectrogram(jnp.asarray(audio), self.model.filters, n)
            out.append(mel_window(mel, 0, N_FRAMES if cfg.n_audio_ctx == 1500
                                  else 2 * cfg.n_audio_ctx))
        return jnp.stack(out)

    def transcribe_batch(self, audios: Sequence[np.ndarray]) -> List[DecodingResult]:
        """One 30 s window per stream, greedy, all streams in lockstep."""
        cfg, vocab = self.model.config, self.model.vocab
        if len(audios) != self.batch_size:
            raise ValueError(f"expected {self.batch_size} streams, got {len(audios)}")

        mel = self._mel_batch(audios)
        if self.mesh is not None:
            from jax.sharding import NamedSharding

            mel = jax.device_put(mel, NamedSharding(self.mesh, batch_pspec()))
        enc = encode(self.params, mel, cfg, use_flash=self.use_flash)

        from ..decoding.task import decode_full

        use_device = self.options.beam_size is None and (self.options.best_of or 1) == 1
        return decode_full(
            self.params, cfg, vocab, enc.cross_k, enc.cross_v, self.options,
            use_device_loop=use_device,
        )


def auto_engine(model: WhisperModel, batch_size: int = 8, tp: Optional[int] = None):
    """Build a BatchTranscriber on all visible devices (mesh if >1).

    The mesh is built with ``config=model.config`` so the auto-picked tp
    divides the model's head counts (make_mesh's own invalid-split guard),
    and ``batch_size`` is rounded up to a multiple of the resulting dp so
    the batch axis shards evenly."""
    devices = jax.devices()
    mesh = (make_mesh(tp=tp, config=model.config)
            if len(devices) > 1 else None)
    if mesh is not None:
        dp = mesh.shape.get("dp", 1)
        batch_size = -(-batch_size // dp) * dp
    return BatchTranscriber(model, batch_size, mesh=mesh)
