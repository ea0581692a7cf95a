"""Chunk-parallel long-form transcription.

Sequential long-form decoding (pipeline.transcribe) is inherently serial: the
seek position and the conditioning prompt depend on the previous window's
output. When previous-text conditioning is off, that dependency disappears —
every 30 s window is independent work. This mode cuts the audio into fixed
disjoint windows, encodes them as ONE batch, and decodes them all in lockstep
through the fused device loop. On a mesh the batch shards over dp — this is
the "chunk-parallel encoder across chips" scale-out path (BASELINE config 5);
the reference's closest concept is its unused WHISPER_CHUNK_SIZE constant
(/root/reference/src/main.rs:29).

Boundary accuracy: with ``overlap_seconds > 0`` windows overlap and the
merge keeps each segment from the window that sees it furthest from its
edges (cut at the overlap midpoint, HF-style) — a word clipped by one
window's edge lies fully inside its neighbor. ``overlap_seconds=0`` keeps
the fastest disjoint behavior; sequential mode remains the accuracy-first
path.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..config import HOP_LENGTH, N_SAMPLES_PER_CHUNK, SAMPLE_RATE
from ..decoding.result import Segment
from ..decoding.task import DecodingOptions, decode_full
from ..frontend.mel import frame_count, log_mel_spectrogram, mel_window
from ..model.encoder import encode
from ..model.load import WhisperModel
from .transcribe import N_FRAMES, TranscribeOptions

_MAX_BATCH = 16  # windows per device batch (HBM bound for large-v3)


def transcribe_chunked(
    model: WhisperModel,
    audio: Union[str, np.ndarray],
    options: Optional[TranscribeOptions] = None,
    mesh=None,
    batch_windows: int = _MAX_BATCH,
    overlap_seconds: float = 0.0,
    **kwargs,
) -> dict:
    """Fixed-stride chunk-parallel transcription (no prompt conditioning).

    overlap_seconds > 0 overlaps adjacent windows and merges their segments
    at the overlap midpoints (boundary-word fix; ~overlap/30 extra compute).
    """
    opts = options or TranscribeOptions(**kwargs)
    cfg, vocab = model.config, model.vocab

    if isinstance(audio, str):
        from ..io.wav import load_wav

        audio = load_wav(audio)
    audio = np.asarray(audio, dtype=np.float32)

    params = model.params
    if mesh is not None:
        from ..parallel.sharding import shard_params

        params = shard_params(model.params, mesh)

    with model.timers.stage("mel"):
        padded = np.pad(audio, (0, N_SAMPLES_PER_CHUNK))
        center = opts.mel_mode == "openai"
        mel = log_mel_spectrogram(
            jnp.asarray(padded), model.filters, frame_count(len(padded), center),
            center=center, fold=not center,
        )
    content_frames = mel.shape[-1] - N_FRAMES
    # clip range (whisper.cpp offset_ms/duration_ms; 10 ms frames)
    seek_start = max(0, opts.offset_ms // 10)
    if opts.duration_ms is not None:
        content_frames = min(content_frames,
                             seek_start + opts.duration_ms // 10)
    overlap_frames = int(overlap_seconds * SAMPLE_RATE / HOP_LENGTH)
    overlap_frames = max(0, min(overlap_frames, N_FRAMES - 100))
    stride = N_FRAMES - overlap_frames
    if seek_start and seek_start >= content_frames:
        offsets = []  # clip starts past the audio: nothing to decode
    else:
        # seek_start=0 keeps the historical one-window floor for short clips
        offsets = list(range(seek_start, max(content_frames, seek_start + 1),
                             stride))

    language = opts.language or ("en" if not cfg.is_multilingual else None)
    window_results: List[tuple] = []  # (offset_frames, [Segment])
    for group_start in range(0, len(offsets), batch_windows):
        group = offsets[group_start : group_start + batch_windows]
        windows = jnp.stack([mel_window(mel, off, N_FRAMES) for off in group])
        if mesh is not None:
            from jax.sharding import NamedSharding

            from ..parallel.sharding import batch_pspec

            # pad group to a dp multiple for even sharding
            dp = mesh.shape["dp"]
            pad_to = -(-len(group) // dp) * dp
            if pad_to != len(group):
                windows = jnp.concatenate(
                    [windows, jnp.zeros((pad_to - len(group), *windows.shape[1:]), windows.dtype)]
                )
            windows = jax.device_put(windows, NamedSharding(mesh, batch_pspec()))

        with model.timers.stage("encode"):
            enc = encode(params, windows, cfg, use_flash=opts.use_flash)

        if language is None:
            from ..decoding.task import detect_language

            langs, _ = detect_language(params, cfg, vocab, enc.cross_k, enc.cross_v)
            language = langs[0]

        dec_opts = DecodingOptions(
            task=opts.task,
            language=language,
            temperature=0.0,
            without_timestamps=opts.without_timestamps,
            suppress_tokens=opts.suppress_tokens,
        )
        with model.timers.stage("decode"):
            results = decode_full(
                params, cfg, vocab, enc.cross_k, enc.cross_v, dec_opts,
                use_device_loop=True,
            )

        for idx, off in enumerate(group):
            result = results[idx]
            if (
                opts.no_speech_threshold is not None
                and result.no_speech_prob > opts.no_speech_threshold
                and (
                    opts.logprob_threshold is None
                    or result.avg_logprob < opts.logprob_threshold
                )
            ):
                window_results.append((off, []))
                continue
            time_offset = off * HOP_LENGTH / SAMPLE_RATE
            window_frames = min(N_FRAMES, content_frames - off)
            window_results.append((off, extract_segments(
                result, vocab, time_offset,
                window_frames * HOP_LENGTH / SAMPLE_RATE,
                seek=off,
            )))

    all_segments = merge_window_segments(window_results, overlap_frames)
    text = "".join(seg.text for seg in all_segments)
    return {
        "text": text,
        "segments": [dataclasses.asdict(s) for s in all_segments],
        "language": language or "en",
        "duration": len(audio) / SAMPLE_RATE,
    }


def merge_window_segments(
    window_results: List[tuple], overlap_frames: int
) -> List[Segment]:
    """Merge per-window segment lists from (possibly overlapping) windows.

    Each segment is kept by exactly one window — the one whose keep-range
    [own_start + overlap/2, next_start + overlap/2) contains the segment's
    midpoint — so boundary-clipped fragments from a window edge are replaced
    by the neighbor's full-view version (HF chunked long-form semantics).
    Disjoint windows (overlap 0) reduce to plain concatenation.
    """
    spf = HOP_LENGTH / SAMPLE_RATE  # seconds per mel frame
    half = overlap_frames * spf / 2.0
    out: List[Segment] = []
    for i, (off, segments) in enumerate(window_results):
        lo = -np.inf if i == 0 else off * spf + half
        if i + 1 < len(window_results):
            hi = window_results[i + 1][0] * spf + half
        else:
            hi = np.inf
        for seg in segments:
            mid = (seg.t0 + seg.t1) / 2.0
            if lo <= mid < hi:
                out.append(dataclasses.replace(seg, id=len(out)))
    return out


def extract_segments(result, vocab, time_offset: float, window_duration: float,
                     seek: int, base_id: int = 0) -> List[Segment]:
    """Split one window's tokens into timestamp-delimited segments (the same
    grammar the sequential pipeline applies)."""
    tokens = np.array(result.tokens)
    segments: List[Segment] = []

    def mk(start, end, seg_tokens):
        # clamp into the window (degenerate timestamps can point past it)
        hi = time_offset + window_duration
        start = min(max(start, time_offset), hi)
        end = min(max(end, start), hi)
        text_tokens = [int(t) for t in seg_tokens if t < vocab.token_eot]
        segments.append(
            Segment(
                id=base_id + len(segments),
                seek=seek,
                t0=float(start),
                t1=float(end),
                text=vocab.decode(text_tokens),
                tokens=[int(t) for t in seg_tokens],
                avg_logprob=result.avg_logprob,
                no_speech_prob=result.no_speech_prob,
                temperature=result.temperature,
                compression_ratio=result.compression_ratio,
            )
        )

    if len(tokens) == 0:
        return segments
    ts_mask = tokens >= vocab.token_beg
    consecutive = np.where(ts_mask[:-1] & ts_mask[1:])[0] + 1
    if len(consecutive) > 0:
        last = 0
        for cur in consecutive.tolist():
            sliced = tokens[last:cur]
            mk(
                time_offset + (sliced[0].item() - vocab.token_beg) * 0.02,
                time_offset + (sliced[-1].item() - vocab.token_beg) * 0.02,
                sliced.tolist(),
            )
            last = cur
        tail = tokens[last:]
        if len(tail) > 1:
            t0_tail = (time_offset + (tail[0].item() - vocab.token_beg) * 0.02
                       if tail[0] >= vocab.token_beg else time_offset)
            single_ts_ending = not ts_mask[-2] and ts_mask[-1]
            if single_ts_ending:
                # sequential grammar (finish_window): a trailing single
                # timestamp closes the last segment AT that timestamp
                # (slices.append(len(tokens)) -> t1 = sliced[-1])
                mk(t0_tail,
                   time_offset + (tail[-1].item() - vocab.token_beg) * 0.02,
                   tail.tolist())
            else:
                # unterminated tail: the sequential loop would rewind and
                # re-decode it in the next window; chunked windows are
                # independent, so emit it bounded by the window end
                mk(t0_tail, time_offset + window_duration, tail.tolist())
    else:
        duration = window_duration
        timestamps = tokens[ts_mask]
        if len(timestamps) > 0 and timestamps[-1].item() != vocab.token_beg:
            duration = (timestamps[-1].item() - vocab.token_beg) * 0.02
        mk(time_offset, time_offset + duration, tokens.tolist())
    return segments
