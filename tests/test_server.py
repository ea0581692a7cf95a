"""Serving daemon (parallel/server.py): queue-fed engine + HTTP front end."""

import io
import threading

import numpy as np
import pytest

from fixtures import synthetic_audio, tiny_config, write_synthetic_ggml

SR = 16000


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    from whisper_tpu.model.load import load_model

    path = tmp_path_factory.mktemp("srv") / "ggml-tiny-synth.bin"
    write_synthetic_ggml(path, tiny_config(), seed=9)
    return load_model(str(path), use_native=False)


def test_engine_server_matches_transcribe_streams(model):
    """Concurrent submits through the queue-fed worker produce exactly the
    transcribe_streams results (same engine scheduler, live source)."""
    from whisper_tpu.parallel.engine import SlotEngine
    from whisper_tpu.parallel.server import EngineServer
    from whisper_tpu.pipeline.transcribe import TranscribeOptions

    audios = [synthetic_audio(SR * 35, seed=1),
              synthetic_audio(SR * 8, seed=3),
              synthetic_audio(SR * 12, seed=5)]
    topts = TranscribeOptions(temperature=0.0,
                              condition_on_previous_text=True)

    ref_engine = SlotEngine(model, n_slots=2, chunk_steps=8)
    ref = ref_engine.transcribe_streams(audios, topts)

    engine = SlotEngine(model, n_slots=2, chunk_steps=8)
    with EngineServer(engine, topts) as srv:
        futs = [srv.submit(a) for a in audios]
        got = [f.result(timeout=600) for f in futs]
    assert engine.stats["requests"] == 3

    for r, g in zip(ref, got):
        assert g["text"] == r["text"]
        assert g["duration"] == r["duration"]
        assert [s["tokens"] for s in g["segments"]] == [
            s["tokens"] for s in r["segments"]]


def test_engine_server_beam_groups(model):
    """The queue-fed worker drives a BeamSlotEngine (cli serve --beam):
    results match the beam engine's own transcribe_streams."""
    from whisper_tpu.decoding.task import DecodingOptions
    from whisper_tpu.parallel.beam_engine import BeamSlotEngine
    from whisper_tpu.parallel.server import EngineServer
    from whisper_tpu.pipeline.transcribe import TranscribeOptions

    audios = [synthetic_audio(SR * 35, seed=1),
              synthetic_audio(SR * 7, seed=4)]
    topts = TranscribeOptions(temperature=0.0, beam_size=2,
                              condition_on_previous_text=True,
                              use_device_loop=True)

    ref_engine = BeamSlotEngine(model, n_slots=2, chunk_steps=8,
                                options=DecodingOptions(beam_size=2))
    ref = ref_engine.transcribe_streams(audios, topts)

    engine = BeamSlotEngine(model, n_slots=2, chunk_steps=8,
                            options=DecodingOptions(beam_size=2))
    with EngineServer(engine, topts) as srv:
        futs = [srv.submit(a) for a in audios]
        got = [f.result(timeout=600) for f in futs]

    for r, g in zip(ref, got):
        assert g["text"] == r["text"]
        assert [s["tokens"] for s in g["segments"]] == [
            s["tokens"] for s in r["segments"]]


def test_parse_multipart():
    from whisper_tpu.parallel.server import parse_multipart

    boundary = "XbOuNdArYx"
    body = (
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="file"; filename="a.wav"\r\n'
        "Content-Type: audio/wav\r\n\r\n").encode() + b"RIFF\x00raw\r\nbytes" + (
        f"\r\n--{boundary}\r\n"
        'Content-Disposition: form-data; name="language"\r\n\r\n'
        "en\r\n"
        f"--{boundary}--\r\n").encode()
    fields = parse_multipart(
        body, f"multipart/form-data; boundary={boundary}")
    assert fields["file"] == b"RIFF\x00raw\r\nbytes"
    assert fields["language"] == b"en"
    with pytest.raises(ValueError):
        parse_multipart(body, "multipart/form-data")

    # binary payloads legitimately END in CR/LF bytes (int16 PCM hits this
    # ~1 in 128 uploads); only the single delimiter CRLF may be stripped
    payload = b"RIFFdata\x00\r\n"
    body2 = (f"--{boundary}\r\n"
             'Content-Disposition: form-data; name="file"\r\n\r\n').encode() \
        + payload + f"\r\n--{boundary}--\r\n".encode()
    got = parse_multipart(body2, f"multipart/form-data; boundary={boundary}")
    assert got["file"] == payload


def test_openai_response_formats():
    from whisper_tpu.parallel.server import openai_response

    result = {
        "text": "hello world", "language": "en", "duration": 3.0,
        "segments": [{
            "id": 0, "seek": 0, "t0": 0.0, "t1": 2.5, "text": " hello world",
            "tokens": [1, 2], "temperature": 0.0, "avg_logprob": -0.1,
            "compression_ratio": 0.9, "no_speech_prob": 0.01,
            "token_data": None, "words": None,
        }],
    }
    import json as _json

    payload, ctype = openai_response(result, "json")
    assert _json.loads(payload) == {"text": "hello world"}
    payload, _ = openai_response(result, "verbose_json")
    v = _json.loads(payload)
    assert v["segments"][0]["start"] == 0.0
    assert v["segments"][0]["end"] == 2.5
    assert v["duration"] == 3.0
    payload, ctype = openai_response(result, "text")
    assert payload == "hello world\n" and ctype.startswith("text/plain")
    payload, _ = openai_response(result, "srt")
    assert payload.startswith("1\n00:00:00,000 --> 00:00:02,500")
    payload, _ = openai_response(result, "vtt")
    assert payload.startswith("WEBVTT")
    with pytest.raises(ValueError):
        openai_response(result, "flac")


def test_engine_server_http_roundtrip(model):
    """HTTP layer: POST /transcribe with WAV bytes -> result JSON;
    /healthz and /stats respond; malformed bodies get 400."""
    import http.client
    import json

    from scipy.io import wavfile

    from whisper_tpu.parallel.engine import SlotEngine
    from whisper_tpu.parallel.server import EngineServer, make_http_server
    from whisper_tpu.pipeline.transcribe import TranscribeOptions

    audio = synthetic_audio(SR * 6, seed=2)
    buf = io.BytesIO()
    wavfile.write(buf, SR, (audio * 32767).astype(np.int16))
    wav_bytes = buf.getvalue()

    engine = SlotEngine(model, n_slots=2, chunk_steps=8)
    with EngineServer(engine, TranscribeOptions(temperature=0.0)) as srv:
        httpd = make_http_server(srv, "127.0.0.1", 0)  # ephemeral port
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
            conn.request("GET", "/healthz")
            assert json.loads(conn.getresponse().read())["ok"] is True

            conn.request("POST", "/transcribe", body=wav_bytes,
                         headers={"Content-Type": "audio/wav"})
            resp = conn.getresponse()
            assert resp.status == 200
            result = json.loads(resp.read())
            assert "text" in result and "segments" in result
            assert result["duration"] == pytest.approx(6.0, abs=0.01)

            conn.request("POST", "/transcribe", body=b"not a wav")
            assert conn.getresponse().status == 400

            conn.request("GET", "/stats")
            stats = json.loads(conn.getresponse().read())
            assert stats["requests"] >= 1
            lat = stats["latency"]
            assert lat["n"] >= 1
            assert 0 <= lat["queue_wait_mean_s"] <= lat["total_p99_s"]

            conn.request("GET", "/metrics")
            resp = conn.getresponse()
            assert resp.getheader("Content-Type").startswith("text/plain")
            body = resp.read().decode()
            assert "whisper_requests 1" in body
            assert 'whisper_request_latency_seconds{quantile="0.5"}' in body

            # NDJSON streaming: segments line-by-line, then a summary.
            conn.request("POST", "/transcribe?stream=1", body=wav_bytes)
            resp = conn.getresponse()
            assert resp.status == 200
            assert resp.getheader("Content-Type") == "application/x-ndjson"
            lines = [json.loads(ln) for ln in resp.read().splitlines()]
            assert lines[-1]["done"] is True
            segs = [ln["segment"] for ln in lines[:-1]]
            assert len(segs) >= 1 and all("t0" in s for s in segs)
            assert lines[-1]["duration"] == pytest.approx(6.0, abs=0.01)

            # long-form: a >30 s stream delivers segments INCREMENTALLY
            # (first segment line readable before the request completes)
            long_buf = io.BytesIO()
            wavfile.write(long_buf, SR,
                          (synthetic_audio(SR * 35, seed=7)
                           * 32767).astype(np.int16))
            conn.request("POST", "/transcribe?stream=1",
                         body=long_buf.getvalue())
            resp = conn.getresponse()
            first = json.loads(resp.readline())
            assert "segment" in first  # arrived before the summary line
            rest = [json.loads(ln) for ln in resp.read().splitlines()]
            assert rest[-1]["done"] is True
            assert rest[-1]["duration"] == pytest.approx(35.0, abs=0.01)
            assert 1 + sum("segment" in ln for ln in rest) >= 2
            conn.close()

            # OpenAI-compatible endpoint: multipart file + response_format.
            boundary = "XtEsTbOuNdX"
            def mp(fields):
                out = b""
                for name, (fn, val) in fields.items():
                    out += (f"--{boundary}\r\nContent-Disposition: form-data;"
                            f' name="{name}"').encode()
                    if fn:
                        out += f'; filename="{fn}"'.encode()
                    out += b"\r\n\r\n" + val + b"\r\n"
                return out + f"--{boundary}--\r\n".encode()

            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
            hdrs = {"Content-Type":
                    f"multipart/form-data; boundary={boundary}"}
            conn.request("POST", "/v1/audio/transcriptions",
                         body=mp({"file": ("a.wav", wav_bytes),
                                  "response_format": (None, b"verbose_json"),
                                  "language": (None, b"en")}),
                         headers=hdrs)
            resp = conn.getresponse()
            assert resp.status == 200
            v = json.loads(resp.read())
            assert v["language"] == "en" and "segments" in v
            assert v["segments"][0]["start"] >= 0.0

            conn.request("POST", "/v1/audio/transcriptions",
                         body=mp({"file": ("a.wav", wav_bytes),
                                  "response_format": (None, b"srt")}),
                         headers=hdrs)
            resp = conn.getresponse()
            assert resp.status == 200
            assert resp.read().decode().startswith("1\n00:00:00,")

            conn.request("POST", "/v1/audio/transcriptions",
                         body=mp({"response_format": (None, b"json")}),
                         headers=hdrs)
            assert conn.getresponse().status == 400  # no file field
            conn.close()
        finally:
            httpd.shutdown()
            httpd.server_close()


def test_engine_server_worker_death_fails_futures(model):
    """A fatal engine error must fail every outstanding future (not hang
    clients), poison later submits, and flip /healthz to 503."""
    import http.client

    from whisper_tpu.parallel.engine import SlotEngine
    from whisper_tpu.parallel.server import EngineServer, make_http_server
    from whisper_tpu.pipeline.transcribe import TranscribeOptions

    engine = SlotEngine(model, n_slots=2, chunk_steps=8)
    srv = EngineServer(engine, TranscribeOptions(temperature=0.0)).start()

    def boom(*a, **k):
        raise RuntimeError("chip fell over")

    engine._admit_stream_windows = boom
    httpd = make_http_server(srv, "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        fut = srv.submit(synthetic_audio(SR * 6, seed=2))
        with pytest.raises(RuntimeError, match="chip fell over"):
            fut.result(timeout=120)
        srv._thread.join(timeout=120)  # worker exits after the fatal error
        with pytest.raises(RuntimeError, match="not running"):
            srv.submit(synthetic_audio(SR * 6, seed=2))
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("GET", "/healthz")
        resp = conn.getresponse()
        assert resp.status == 503
        import json
        assert json.loads(resp.read())["ok"] is False
        conn.close()
    finally:
        httpd.shutdown()
        httpd.server_close()
        srv.stop()


def test_engine_server_busy_503(model):
    """max_queue backpressure: excess submits raise ServerBusy and the HTTP
    layer maps it to 503."""
    import http.client

    from whisper_tpu.parallel.engine import SlotEngine
    from whisper_tpu.parallel.server import (EngineServer, ServerBusy,
                                             make_http_server)
    from whisper_tpu.pipeline.transcribe import TranscribeOptions

    audio = synthetic_audio(SR * 6, seed=2)
    engine = SlotEngine(model, n_slots=2, chunk_steps=8)
    with EngineServer(engine, TranscribeOptions(temperature=0.0),
                      max_queue=0) as srv:
        with pytest.raises(ServerBusy):
            srv.submit(audio)
        httpd = make_http_server(srv, "127.0.0.1", 0)
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            buf = io.BytesIO()
            from scipy.io import wavfile
            wavfile.write(buf, SR, (audio * 32767).astype(np.int16))
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
            conn.request("POST", "/transcribe", body=buf.getvalue())
            resp = conn.getresponse()
            assert resp.status == 503
            assert resp.getheader("Retry-After") == "1"

            # oversized Content-Length is rejected before reading the body
            conn.request("POST", "/transcribe", body=b"",
                         headers={"Content-Length": str(10**12)})
            assert conn.getresponse().status == 413
            conn.close()
        finally:
            httpd.shutdown()
            httpd.server_close()


def test_translations_task_override():
    """Per-request task: submit(task='translate') matches a dedicated
    translate engine run, survives into later windows, and the OpenAI
    /v1/audio/translations endpoint serves it (verbose_json says so)."""
    import dataclasses as _dc
    import http.client
    import json

    from scipy.io import wavfile

    from whisper_tpu.model.load import load_model
    from whisper_tpu.parallel.engine import SlotEngine
    from whisper_tpu.parallel.server import EngineServer, make_http_server
    from whisper_tpu.pipeline.transcribe import TranscribeOptions

    import tempfile
    from fixtures import micro_config

    with tempfile.TemporaryDirectory() as td:
        path = td + "/ggml-micro-ml.bin"
        write_synthetic_ggml(path, micro_config(n_vocab=51865), seed=17)
        ml = load_model(path, use_native=False)
    assert ml.vocab.is_multilingual

    # micro model: n_audio_ctx=64 -> 1.28 s windows; 4 s audio = multi-window
    audio = synthetic_audio(SR * 4, seed=21)
    topts = TranscribeOptions(temperature=0.0,
                              condition_on_previous_text=True)

    ref_tr = SlotEngine(ml, n_slots=2, chunk_steps=8).transcribe_streams(
        [audio], topts)[0]
    ref_xl = SlotEngine(ml, n_slots=2, chunk_steps=8).transcribe_streams(
        [audio], _dc.replace(topts, task="translate"))[0]

    engine = SlotEngine(ml, n_slots=2, chunk_steps=8)
    with EngineServer(engine, topts) as srv:
        with pytest.raises(ValueError, match="unknown task"):
            srv.submit(audio, task="summarize")
        # both tasks live in the same engine at once
        fut_xl = srv.submit(audio, task="translate")
        fut_tr = srv.submit(audio)
        got_xl, got_tr = fut_xl.result(timeout=600), fut_tr.result(timeout=600)
        assert [s["tokens"] for s in got_xl["segments"]] == [
            s["tokens"] for s in ref_xl["segments"]]
        assert [s["tokens"] for s in got_tr["segments"]] == [
            s["tokens"] for s in ref_tr["segments"]]

        httpd = make_http_server(srv, "127.0.0.1", 0)
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            buf = io.BytesIO()
            wavfile.write(buf, SR, (audio * 32767).astype(np.int16))
            boundary = "XtRaNsLaTeX"
            body = (
                f"--{boundary}\r\nContent-Disposition: form-data;"
                f' name="file"; filename="a.wav"\r\n\r\n'.encode()
                + buf.getvalue()
                + f"\r\n--{boundary}\r\nContent-Disposition: form-data;"
                f' name="response_format"\r\n\r\nverbose_json'
                f"\r\n--{boundary}--\r\n".encode())
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
            conn.request("POST", "/v1/audio/translations", body=body,
                         headers={"Content-Type":
                                  f"multipart/form-data; boundary={boundary}"})
            resp = conn.getresponse()
            assert resp.status == 200
            v = json.loads(resp.read())
            assert v["task"] == "translate"
            assert v["text"] == ref_xl["text"]
            conn.close()
        finally:
            httpd.shutdown()
            httpd.server_close()


def test_multi_engine_server_dp(model):
    """Data-parallel serving: two engine replicas, each pinned to its own
    device by a (1,1) mesh, behind one MultiEngineServer. Results are
    identical to a single engine, requests spread across replicas, and
    health/stats aggregate."""
    import jax

    from whisper_tpu.parallel.engine import SlotEngine
    from whisper_tpu.parallel.mesh import make_mesh
    from whisper_tpu.parallel.server import EngineServer, MultiEngineServer
    from whisper_tpu.pipeline.transcribe import TranscribeOptions

    audios = [synthetic_audio(SR * (4 + 2 * i), seed=i) for i in range(4)]
    topts = TranscribeOptions(temperature=0.0)

    ref = SlotEngine(model, n_slots=2, chunk_steps=8).transcribe_streams(
        audios, topts)

    devs = jax.devices()
    assert len(devs) >= 2
    members = []
    for d in devs[:2]:
        mesh = make_mesh(1, tp=1, devices=[d])
        eng = SlotEngine(model, n_slots=2, chunk_steps=8, mesh=mesh)
        members.append(EngineServer(eng, topts))
    with MultiEngineServer(members) as srv:
        futs = [srv.submit(a) for a in audios]
        got = [f.result(timeout=600) for f in futs]
        health = srv.health()
        stats = srv.stats_dict()

    for r, g in zip(ref, got):
        assert g["text"] == r["text"]
        assert [s["tokens"] for s in g["segments"]] == [
            s["tokens"] for s in r["segments"]]

    # least-loaded routing spreads a burst across replicas
    reqs = [m.engine.stats["requests"] for m in members]
    assert sum(reqs) == 4 and all(r >= 1 for r in reqs)
    # replica params/pools actually live on distinct devices
    pools = [next(iter(
        jax.tree.leaves(m.engine.params))).devices() for m in members]
    assert pools[0] != pools[1]

    assert health["ok"] is True and health["replicas_ok"] == 2
    assert stats["requests"] == 4 and stats["replicas"] == 2
    assert stats["latency"]["n"] == 4
    assert len(stats["engines"]) == 2


def test_engine_server_cancel(model):
    """cancel(): an admitted long-form stream stops at its next window
    boundary (future -> CancelledError, slot freed for later work); a
    queued request is dropped before it starts; cancelling a finished
    future returns False."""
    import threading as _th
    from concurrent.futures import CancelledError

    from whisper_tpu.parallel.engine import SlotEngine
    from whisper_tpu.parallel.server import EngineServer
    from whisper_tpu.pipeline.transcribe import TranscribeOptions

    long_audio = synthetic_audio(SR * 95, seed=11)
    short_audio = synthetic_audio(SR * 6, seed=3)
    topts = TranscribeOptions(temperature=0.0)

    ref_short = SlotEngine(model, n_slots=1, chunk_steps=8)\
        .transcribe_streams([short_audio], topts)[0]

    engine = SlotEngine(model, n_slots=1, chunk_steps=8)
    with EngineServer(engine, topts) as srv:
        first_seg = _th.Event()
        fut_long = srv.submit(long_audio,
                              on_segment=lambda seg: first_seg.set())
        fut_q = srv.submit(short_audio)   # queued behind the only slot
        assert first_seg.wait(timeout=600)
        # cancel the admitted stream mid-flight and the queued one before
        # it starts
        assert srv.cancel(fut_q) is True
        assert srv.cancel(fut_long) is True
        with pytest.raises(CancelledError):
            fut_q.result(timeout=600)
        with pytest.raises(CancelledError):
            fut_long.result(timeout=600)
        # the slot is actually free again: a new request completes normally
        got = srv.submit(short_audio).result(timeout=600)
        assert [s["tokens"] for s in got["segments"]] == [
            s["tokens"] for s in ref_short["segments"]]
        done_fut = srv.submit(short_audio)
        done_fut.result(timeout=600)
        assert srv.cancel(done_fut) is False
    assert srv.inflight == 0


def test_multi_engine_server_http(model):
    """The HTTP front end over a MultiEngineServer: healthz shows replica
    state, /metrics exposes aggregated counters, POST /transcribe works."""
    import http.client
    import json

    import jax
    from scipy.io import wavfile

    from whisper_tpu.parallel.engine import SlotEngine
    from whisper_tpu.parallel.mesh import make_mesh
    from whisper_tpu.parallel.server import (EngineServer, MultiEngineServer,
                                             make_http_server)
    from whisper_tpu.pipeline.transcribe import TranscribeOptions

    audio = synthetic_audio(SR * 6, seed=2)
    buf = io.BytesIO()
    wavfile.write(buf, SR, (audio * 32767).astype(np.int16))

    members = [
        EngineServer(SlotEngine(model, n_slots=2, chunk_steps=8,
                                mesh=make_mesh(1, tp=1, devices=[d])),
                     TranscribeOptions(temperature=0.0))
        for d in jax.devices()[:2]
    ]
    with MultiEngineServer(members) as srv:
        httpd = make_http_server(srv, "127.0.0.1", 0)
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
            conn.request("GET", "/healthz")
            h = json.loads(conn.getresponse().read())
            assert h["ok"] is True and h["replicas_ok"] == 2

            conn.request("POST", "/transcribe", body=buf.getvalue())
            resp = conn.getresponse()
            assert resp.status == 200
            assert "text" in json.loads(resp.read())

            conn.request("GET", "/metrics")
            body = conn.getresponse().read().decode()
            assert "# TYPE whisper_replicas gauge" in body
            assert "whisper_requests 1" in body
            conn.close()
        finally:
            httpd.shutdown()
            httpd.server_close()


def test_engine_server_request_deadline(model):
    """Server-side deadlines: an expired queued request resolves
    TimeoutError without decoding; an in-flight long-form stream expires at
    a scheduling boundary and frees its slot; HTTP maps the expiry to 504
    via ?timeout=."""
    import http.client
    import json

    from scipy.io import wavfile

    from whisper_tpu.parallel.engine import SlotEngine
    from whisper_tpu.parallel.server import EngineServer, make_http_server
    from whisper_tpu.pipeline.transcribe import TranscribeOptions

    short = synthetic_audio(SR * 6, seed=3)
    long_audio = synthetic_audio(SR * 95, seed=11)
    topts = TranscribeOptions(temperature=0.0)

    engine = SlotEngine(model, n_slots=1, chunk_steps=8)
    with EngineServer(engine, topts) as srv:
        # expired before it could start
        fut = srv.submit(short, timeout_s=1e-6)
        with pytest.raises(TimeoutError):
            fut.result(timeout=600)
        # a long stream with a tight deadline expires at a scheduling
        # boundary (queued or window end, whichever it hits first)...
        fut_long = srv.submit(long_audio, timeout_s=2.0)
        with pytest.raises(TimeoutError):
            fut_long.result(timeout=600)
        # ...and the slot is free again for normal work
        got = srv.submit(short).result(timeout=600)
        assert got["duration"] == pytest.approx(6.0, abs=0.01)

        httpd = make_http_server(srv, "127.0.0.1", 0)
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            buf = io.BytesIO()
            wavfile.write(buf, SR, (short * 32767).astype(np.int16))
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
            conn.request("POST", "/transcribe?timeout=0.000001",
                         body=buf.getvalue())
            resp = conn.getresponse()
            assert resp.status == 504
            assert "deadline" in json.loads(resp.read())["error"]
            conn.request("POST", "/transcribe?timeout=notanumber",
                         body=buf.getvalue())
            assert conn.getresponse().status == 400
            conn.close()
        finally:
            httpd.shutdown()
            httpd.server_close()


def test_engine_server_queued_deadline_not_starved(model):
    """A queued request's deadline (or cancel) must resolve promptly even
    while long streams hold every slot — the worker sweeps waiting requests
    each round, not only at slot-admission time. The OpenAI endpoints honor
    ?timeout= and map expiry to 504."""
    import http.client
    import json
    import time as _time

    from scipy.io import wavfile

    from whisper_tpu.parallel.engine import SlotEngine
    from whisper_tpu.parallel.server import EngineServer, make_http_server
    from whisper_tpu.pipeline.transcribe import TranscribeOptions

    long_audio = synthetic_audio(SR * 95, seed=11)
    short = synthetic_audio(SR * 6, seed=3)

    engine = SlotEngine(model, n_slots=1, chunk_steps=8)
    with EngineServer(engine, TranscribeOptions(temperature=0.0)) as srv:
        fut_long = srv.submit(long_audio)         # occupies the only slot
        _time.sleep(0.5)                          # let it admit
        t0 = _time.monotonic()
        fut_q = srv.submit(short, timeout_s=1.0)  # stuck behind it
        with pytest.raises(TimeoutError):
            fut_q.result(timeout=600)
        waited = _time.monotonic() - t0
        assert not fut_long.done()  # expired while the long stream still ran
        # resolves within a few scheduler rounds of the deadline, not after
        # the long stream finishes (CPU decode of 95 s audio takes far
        # longer than this bound)
        assert waited < 30.0, waited
        srv.cancel(fut_long)

        httpd = make_http_server(srv, "127.0.0.1", 0)
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            buf = io.BytesIO()
            wavfile.write(buf, SR, (short * 32767).astype(np.int16))
            boundary = "XtImEoUtX"
            body = (
                f"--{boundary}\r\nContent-Disposition: form-data;"
                f' name="file"; filename="a.wav"\r\n\r\n'.encode()
                + buf.getvalue() + f"\r\n--{boundary}--\r\n".encode())
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
            conn.request(
                "POST", "/v1/audio/transcriptions?timeout=0.000001",
                body=body,
                headers={"Content-Type":
                         f"multipart/form-data; boundary={boundary}"})
            resp = conn.getresponse()
            assert resp.status == 504
            assert "deadline" in json.loads(resp.read())["error"]
            conn.close()
        finally:
            httpd.shutdown()
            httpd.server_close()


def test_parse_multipart_filename_before_name():
    """RFC 7578 does not mandate Content-Disposition parameter order: a
    part listing filename BEFORE name must not mis-key the field as the
    filename (the name= regex must not match inside filename=)."""
    from whisper_tpu.parallel.server import parse_multipart

    boundary = "XbOuNdArYx"
    body = (
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; filename="a.wav"; name="file"\r\n'
        "Content-Type: audio/wav\r\n\r\n").encode() + b"RIFFdata" + (
        f"\r\n--{boundary}--\r\n").encode()
    fields = parse_multipart(
        body, f"multipart/form-data; boundary={boundary}")
    assert fields == {"file": b"RIFFdata"}


def test_engine_server_stop_nodrain_fast(model):
    """stop(drain=False) is a FAST shutdown: it returns without finishing
    in-flight long-form streams (no window re-admission for the remaining
    audio) and resolves their futures with CancelledError."""
    import threading as _th
    import time as _time
    from concurrent.futures import CancelledError

    from whisper_tpu.parallel.engine import SlotEngine
    from whisper_tpu.parallel.server import EngineServer
    from whisper_tpu.pipeline.transcribe import TranscribeOptions

    # several minutes of audio on 1 slot: a drain-stop would take many
    # windows; the fast path must not wait for them
    long_audio = synthetic_audio(SR * 300, seed=11)
    engine = SlotEngine(model, n_slots=1, chunk_steps=8)
    srv = EngineServer(engine, TranscribeOptions(temperature=0.0)).start()
    first_seg = _th.Event()
    fut_long = srv.submit(long_audio,
                          on_segment=lambda seg: first_seg.set())
    fut_queued = srv.submit(long_audio)  # waits behind the only slot
    assert first_seg.wait(timeout=600)  # stream is admitted and mid-flight
    t0 = _time.monotonic()
    srv.stop(drain=False)
    # bounded by at most ~a window's chunks, not the whole 5 min stream;
    # generous bound for slow CI — a full drain takes many times longer
    assert _time.monotonic() - t0 < 120
    with pytest.raises(CancelledError):
        fut_long.result(timeout=5)
    with pytest.raises(CancelledError):
        fut_queued.result(timeout=5)
