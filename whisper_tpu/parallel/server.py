"""Serving daemon: a live request queue over the continuous-batching engine.

``EngineServer`` drives a ``SlotEngine`` (or ``BeamSlotEngine``) from a
thread-safe queue on ONE dedicated worker thread — the only thread that
touches jax (the TPU runtime is not thread-safe for concurrent dispatch).
Requests admit into slots as they free up, long audio runs the whisper_full
sliding-window loop per stream (the same ``_advance_stream`` bookkeeping as
``transcribe_streams``), and each request resolves a
``concurrent.futures.Future`` — so N HTTP handler threads block cheaply while
the chip stays saturated across requests.

``TranscriptionHTTPServer`` is the dependency-free stdlib front end:

    POST /transcribe  (body: WAV bytes)      -> {text, segments, language, ...}
    GET  /healthz                            -> {ok}
    GET  /stats                              -> engine phase stats + queue depth

The parent whisper.cpp grew an ``examples/server`` for exactly this role; the
reference stops at a hardcoded ``main()`` (main.rs:2065-2075). ``cli serve``
wires this up.
"""

from __future__ import annotations

import json
import queue
import threading
from concurrent.futures import Future
from typing import Optional

import numpy as np


class EngineServer:
    """Queue-fed long-form transcription over an engine's slot pool.

    The worker loop is ``transcribe_streams``'s scheduler with a live queue
    as the stream source: admit (bucketed encode/prefill) -> dispatch one
    decode chunk (async) -> harvest the previous round's snapshot ->
    resolve finished streams. When idle it blocks on the queue.
    """

    def __init__(self, engine, options=None, poll_s: float = 0.05):
        from ..pipeline.transcribe import TranscribeOptions

        self.engine = engine
        self.topts = options or TranscribeOptions()
        engine._check_stream_options(self.topts)
        self._temps = engine._prepare_streams(self.topts)
        self._queue: queue.Queue = queue.Queue()
        self._poll_s = poll_s
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._idx = 0

    # -- client surface (any thread) --

    def submit(self, audio: np.ndarray) -> Future:
        """Enqueue one request; the Future resolves to the transcribe-style
        result dict ({text, segments, language, duration})."""
        if self._thread is None or not self._thread.is_alive():
            raise RuntimeError("EngineServer is not running; call start()")
        fut: Future = Future()
        self._queue.put((audio, fut))
        return fut

    def transcribe(self, audio: np.ndarray, timeout: Optional[float] = None):
        return self.submit(audio).result(timeout)

    def start(self) -> "EngineServer":
        self._stop.clear()
        self._thread = threading.Thread(target=self._run, name="engine-server",
                                        daemon=True)
        self._thread.start()
        return self

    def stop(self, drain: bool = True) -> None:
        """Stop the worker. ``drain=True`` finishes queued/in-flight requests
        first; otherwise pending futures are cancelled."""
        self._drain = drain
        self._stop.set()
        if self._thread is not None:
            self._thread.join()
            self._thread = None

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    @property
    def queue_depth(self) -> int:
        return self._queue.qsize()

    # -- the worker loop (owns all jax calls) --

    def _run(self) -> None:
        import time as _time

        eng, topts, temps = self.engine, self.topts, self._temps
        pending: list = []
        slot_stream = [None] * eng.n_slots
        slot_ticket = [0] * eng.n_slots
        next_ticket = 1
        eng.stats = {"admit_s": 0.0, "chunk_s": 0.0, "pull_s": 0.0,
                     "fallback_s": 0.0, "rounds": 0, "windows": 0,
                     "fallbacks": 0, "requests": 0}
        snap = None
        self._drain = True

        while True:
            busy = (pending or snap is not None
                    or any(s is not None for s in slot_stream))
            if self._stop.is_set() and not busy and (
                    not self._drain or self._queue.empty()):
                break
            # ingest requests; block only when fully idle
            try:
                while True:
                    audio, fut = self._queue.get(
                        block=not busy, timeout=self._poll_s)
                    if self._stop.is_set() and not self._drain:
                        fut.cancel()
                        continue
                    if not fut.set_running_or_notify_cancel():
                        continue
                    try:
                        st = eng._init_stream(self._idx, audio, topts)
                    except Exception as e:  # noqa: BLE001 — bad request only
                        fut.set_exception(e)
                        continue
                    self._idx += 1
                    st["future"] = fut
                    eng.stats["requests"] += 1
                    if st["done"]:  # shorter than one hop: no windows
                        fut.set_result(eng._stream_output(st))
                    else:
                        pending.append(st)
                    busy = True
            except queue.Empty:
                if not busy:
                    continue

            # admit into freed slots (bucketed encode/prefill)
            join = []
            for s in range(eng.n_slots):
                if slot_stream[s] is None and pending:
                    st = pending.pop(0)
                    slot_stream[s] = st
                    slot_ticket[s] = next_ticket
                    next_ticket += 1
                    join.append((s, st))
            if join:
                t0 = _time.perf_counter()
                eng._admit_stream_windows(join, topts)
                eng.stats["admit_s"] += _time.perf_counter() - t0
            # dispatch one decode chunk (async) + snapshot
            if any(s is not None for s in slot_stream):
                t0 = _time.perf_counter()
                new_snap = (list(slot_stream), list(slot_ticket),
                            eng._stream_chunk_snapshot(topts))
                eng.stats["chunk_s"] += _time.perf_counter() - t0
            else:
                new_snap = None
            # harvest the previous round's snapshot
            if snap is not None:
                import jax

                stream_map, tick_map, arrs = snap
                t0 = _time.perf_counter()
                pulled = jax.device_get(arrs)
                active = pulled[0]
                eng.stats["pull_s"] += _time.perf_counter() - t0
                for s in range(eng.n_slots):
                    st = stream_map[s]
                    if (st is None or active[s] or slot_stream[s] is not st
                            or slot_ticket[s] != tick_map[s]):
                        continue
                    try:
                        done = eng._advance_stream(s, st, pulled, topts, temps)
                    except Exception as e:  # noqa: BLE001
                        st["future"].set_exception(e)
                        slot_stream[s] = None
                        continue
                    slot_stream[s] = None
                    if done:
                        st["future"].set_result(eng._stream_output(st))
                    else:
                        pending.append(st)
            snap = new_snap
            eng.stats["rounds"] += 1


def make_http_server(server: EngineServer, host: str = "127.0.0.1",
                     port: int = 8080):
    """A ``ThreadingHTTPServer`` bound to ``host:port`` serving the
    EngineServer. Handler threads only parse WAVs and block on futures; all
    jax work stays on the engine worker thread."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from ..io.wav import load_wav_bytes

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload, ensure_ascii=False).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):  # stdlib default spams stderr
            pass

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"ok": True})
            elif self.path == "/stats":
                stats = dict(getattr(server.engine, "stats", {}) or {})
                stats["queue_depth"] = server.queue_depth
                self._reply(200, stats)
            else:
                self._reply(404, {"error": "not found"})

        def do_POST(self):
            if self.path.rstrip("/") not in ("/transcribe", "/v1/transcribe"):
                self._reply(404, {"error": "not found"})
                return
            n = int(self.headers.get("Content-Length", 0))
            if n <= 0:
                self._reply(400, {"error": "empty body; POST WAV bytes"})
                return
            data = self.rfile.read(n)
            try:
                audio = load_wav_bytes(data)
            except Exception as e:  # noqa: BLE001
                self._reply(400, {"error": str(e)})
                return
            try:
                result = server.transcribe(audio)
            except Exception as e:  # noqa: BLE001
                self._reply(500, {"error": str(e)})
                return
            self._reply(200, result)

    return ThreadingHTTPServer((host, port), Handler)
