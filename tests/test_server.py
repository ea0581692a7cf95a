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
            conn.close()
        finally:
            httpd.shutdown()
            httpd.server_close()
