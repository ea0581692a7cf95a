"""Log-mel spectrogram frontend.

Reference pipeline (``log_mel_spectrogram`` + ``clamp_and_normalize``,
/root/reference/src/main.rs:1553-1671):

    hann[i] = 0.5 * (1 - cos(2*pi*i/400))                 (main.rs:1567-1569)
    n_frames = n_samples // 160                           (main.rs:1575)
    frame i  = samples[i*160 : i*160+400], zero-padded    (main.rs:1593-1601)
    power    = re^2 + im^2 of the 400-pt FFT              (main.rs:1603-1606)
    fold     : power[j] += power[400-j], j in 1..200      (main.rs:1608-1610)
    mel      = filters(80,201) @ power[0:201]             (main.rs:1620-1625)
    log10(max(mel, 1e-10))                                (main.rs:1627-1631)
    global   : clamp to max-8, then (x+4)/4               (main.rs:1654-1671)

TPU-first design: instead of the reference's recursive scalar FFT fanned over
OS threads (main.rs:1581-1644), the whole frontend is three MXU matmuls —
frames x DFT-cosine, frames x DFT-sine, power x mel-filters — batched over all
frames at once. A 400-point real DFT as two (400, 201) matmuls is exact (no
radix padding games) and lands on the systolic array, which is faster than any
hand-scheduled FFT at this size.

Two parity modes (they differ in framing AND in bin folding):
  * reference / whisper.cpp-1.0.3: center=False, fold=True — no reflect
    padding, and the symmetric-bin fold above doubles power bins 1..199.
  * openai-whisper / HF (default): center=True, fold=False — reflect-pad 200
    samples both sides, frames computed on the padded signal with the last
    frame dropped, one-sided power spectrum with NO doubling (openai's
    ``stft(...).abs()**2``). Default because token-parity targets openai.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import HOP_LENGTH, N_FFT

_N_BINS = N_FFT // 2 + 1  # 201


@functools.lru_cache(maxsize=4)
def _dft_matrices_np(n_fft: int = N_FFT):
    """Real-DFT basis: C[j,k]=cos(2*pi*j*k/N), S[j,k]=-sin(...), k=0..N/2.

    Cached as numpy (converting inside jit would capture trace-local arrays)."""
    j = np.arange(n_fft)[:, None].astype(np.float64)
    k = np.arange(n_fft // 2 + 1)[None, :].astype(np.float64)
    ang = 2.0 * np.pi * j * k / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


@functools.lru_cache(maxsize=4)
def hann_window_np(n_fft: int = N_FFT) -> np.ndarray:
    """Periodic Hann, 0.5*(1-cos(2*pi*i/N)) (main.rs:1567-1569)."""
    i = np.arange(n_fft, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * i / n_fft))).astype(np.float32)


def frame_count(n_samples: int, center: bool = True) -> int:
    if center:
        return n_samples // HOP_LENGTH  # 1 + n//160 frames, last dropped
    return n_samples // HOP_LENGTH  # main.rs:1575


@functools.partial(jax.jit, static_argnames=("n_frames", "center", "fold", "speed_up"))
def log_mel_spectrogram(
    audio: jnp.ndarray,
    filters: jnp.ndarray,
    n_frames: int,
    center: bool = True,
    fold: bool = False,
    speed_up: bool = False,
) -> jnp.ndarray:
    """audio (n_samples,) f32, filters (n_mel, 201) -> mel (n_mel, n_frames).

    Output is mel-major like the reference's ``data[j*n_len+i]`` layout
    (main.rs:1633). ``n_frames`` must be ``frame_count(len(audio), center)``
    (static so the kernel compiles once per audio-bucket length).
    """
    n = audio.shape[0]
    if center:
        # openai: reflect-pad N_FFT//2 both sides; frame i starts at i*hop.
        padded = jnp.pad(audio, (N_FFT // 2, N_FFT // 2), mode="reflect")
    else:
        padded = audio
    # Zero-pad the tail so every frame gather is in-bounds (reference zero-fills
    # reads past the end, main.rs:1596-1600).
    need = (n_frames - 1) * HOP_LENGTH + N_FFT
    padded = jnp.pad(padded, (0, max(0, need - padded.shape[0])))

    idx = (
        np.arange(n_frames)[:, None] * HOP_LENGTH + np.arange(N_FFT)[None, :]
    )  # static index matrix
    frames = padded[idx] * jnp.asarray(hann_window_np())[None, :]  # (n_frames, 400)

    # HIGHEST precision: on TPU the default bf16 matmul passes lose ~3 decimal
    # digits, which is audible in the mel features; these matmuls are a
    # negligible share of total FLOPs so run them at full f32 MXU precision.
    cos_np, sin_np = _dft_matrices_np()
    cos_m, sin_m = jnp.asarray(cos_np), jnp.asarray(sin_np)
    re = jnp.dot(frames, cos_m, precision=jax.lax.Precision.HIGHEST)  # (n_frames, 201)
    im = jnp.dot(frames, sin_m, precision=jax.lax.Precision.HIGHEST)
    power = re * re + im * im

    if fold:
        # Symmetric-bin fold (main.rs:1608-1610): doubles bins 1..199 only.
        # whisper.cpp-1.0.3 semantics; openai takes the one-sided spectrum as-is.
        foldv = jnp.ones((_N_BINS,), dtype=jnp.float32).at[1:-1].set(2.0)
        power = power * foldv[None, :]

    if speed_up:
        # 2x speed-up path (main.rs:1580, 1612-1617): average adjacent power
        # bins — frequency-domain downscaling == time-domain speedup. The
        # reference ships this behind a flag that is always false at the call
        # site (main.rs:1700); kept for parity. Filters must then span
        # fft_size//4 + 1 bins.
        power = 0.5 * (power[:, 0:-1:2] + power[:, 1::2])  # (n_frames, 100)
        power = jnp.pad(power, ((0, 0), (0, 1)))           # bin n_fft/4 -> 101

    mel = jnp.dot(power[:, : filters.shape[1]], filters.T,
                  precision=jax.lax.Precision.HIGHEST)  # (n_frames, n_mel)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec, log_spec.max() - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return log_spec.T  # mel-major (n_mel, n_frames)


def log_mel_numpy(audio: np.ndarray, filters: np.ndarray, center: bool = False,
                  fold: bool = True) -> np.ndarray:
    """Independent float64 numpy golden implementation (np.fft.rfft based).

    Used only by tests to validate the jax path; mirrors the reference math
    when center=False and openai-whisper when center=True.
    """
    audio = np.asarray(audio, dtype=np.float64)
    if center:
        audio = np.pad(audio, N_FFT // 2, mode="reflect")
        n_frames = (len(audio) - N_FFT // 2 * 2) // HOP_LENGTH
    else:
        n_frames = len(audio) // HOP_LENGTH
    hann = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(N_FFT) / N_FFT))
    need = (n_frames - 1) * HOP_LENGTH + N_FFT
    if len(audio) < need:
        audio = np.pad(audio, (0, need - len(audio)))
    out = np.empty((filters.shape[0], n_frames), dtype=np.float64)
    for i in range(n_frames):
        fr = audio[i * HOP_LENGTH : i * HOP_LENGTH + N_FFT] * hann
        spec = np.fft.rfft(fr, n=N_FFT)
        power = np.abs(spec) ** 2
        if fold:
            power[1:-1] *= 2.0
        mel = filters.astype(np.float64) @ power
        out[:, i] = np.log10(np.maximum(mel, 1e-10))
    out = np.maximum(out, out.max() - 8.0)
    out = (out + 4.0) / 4.0
    return out.astype(np.float32)


def mel_window(mel: jnp.ndarray, offset: int, n_frames_window: int) -> jnp.ndarray:
    """Slice ``n_frames_window`` frames starting at ``offset``, zero-padding past
    the end — the encoder's input windowing (main.rs:1816-1829)."""
    n_mel, n_len = mel.shape
    pad = jnp.zeros((n_mel, n_frames_window), dtype=mel.dtype)
    i0 = min(offset, n_len)
    i1 = min(offset + n_frames_window, n_len)
    if i1 > i0:
        pad = pad.at[:, : i1 - i0].set(mel[:, i0:i1])
    return pad


def mel_filter_bank(n_mels: int = 80, n_fft: int = N_FFT, sample_rate: int = 16000) -> np.ndarray:
    """Slaney-normalized mel filterbank, (n_mels, n_fft//2+1).

    Real GGML checkpoints carry their filterbank in the file (main.rs:505-536);
    this generator produces the same matrix (librosa/openai mel_filters
    semantics) for synthetic checkpoints and tests.
    """
    from transformers.audio_utils import mel_filter_bank as hf_mel_filter_bank

    return hf_mel_filter_bank(
        num_frequency_bins=n_fft // 2 + 1,
        num_mel_filters=n_mels,
        min_frequency=0.0,
        max_frequency=sample_rate / 2.0,
        sampling_rate=sample_rate,
        norm="slaney",
        mel_scale="slaney",
    ).T.astype(np.float32)
