"""Command-line interface.

The reference's driver is a hardcoded main() (paths + thread count baked in,
/root/reference/src/main.rs:2065-2075). This is the real CLI the SURVEY
(§2.1 #16) specifies:

    python -m whisper_tpu.cli transcribe MODEL.bin AUDIO.wav [options]
    python -m whisper_tpu.cli info MODEL.bin
    python -m whisper_tpu.cli bench MODEL.bin [--seconds N]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from .errors import WhisperError


def _add_transcribe_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("model", help="GGML checkpoint path")
    p.add_argument("audio", nargs="+", help="WAV file(s)")
    p.add_argument("--task", choices=["transcribe", "translate"], default="transcribe")
    p.add_argument("--language", default=None, help="force language (default: detect)")
    p.add_argument("--beam", type=int, default=None, help="beam size (default greedy)")
    p.add_argument("--best-of", type=int, default=None)
    p.add_argument("--temperature", type=float, default=None,
                   help="single temperature (default: 0 with fallback ladder)")
    p.add_argument("--no-timestamps", action="store_true")
    p.add_argument("--token-timestamps", action="store_true",
                   help="compute per-token timestamps")
    p.add_argument("--word-timestamps", action="store_true",
                   help="word-level timestamps via cross-attention DTW")
    p.add_argument("--no-condition-on-previous-text", action="store_true")
    p.add_argument("--initial-prompt", default=None)
    p.add_argument("--mel-mode", choices=["openai", "reference"], default="openai")
    p.add_argument("--chunked", action="store_true",
                   help="chunk-parallel long-form mode (batched windows, "
                        "no prompt conditioning; fastest for long audio)")
    p.add_argument(
        "--audio-ctx", default=None,
        type=lambda s: "auto" if s == "auto" else int(s),
        help="encoder context override for short audio (speed); 'auto' "
             "derives it per window from the remaining content")
    p.add_argument("--offset-ms", type=int, default=0,
                   help="start transcription at this time "
                        "(whisper.cpp offset_ms; timestamps stay absolute)")
    p.add_argument("--duration-ms", type=int, default=None,
                   help="transcribe only this span past the offset "
                        "(whisper.cpp duration_ms)")
    p.add_argument("--dtype", choices=["float32", "bfloat16"], default="float32")
    p.add_argument("--quantize-weights", action="store_true",
                   help="int8 decoder weights (serving mode; slight accuracy cost)")
    p.add_argument("--gelu", choices=["erf", "tanh"], default="erf")
    p.add_argument("--draft", default=None, metavar="DRAFT.bin",
                   help="draft GGML checkpoint for speculative greedy "
                        "decoding (same vocab; exact output)")
    p.add_argument("--flash", action="store_true", help="use Pallas flash attention")
    p.add_argument("--tp", type=int, default=None,
                   help="tensor-parallel over this many chips (latency mode)")
    p.add_argument("--output-json", default=None, help="write result JSON here")
    p.add_argument("--output-format", "-f", default=None,
                   choices=["txt", "srt", "vtt", "tsv", "json", "all"],
                   help="write transcripts as <audio>.<ext> into "
                        "--output-dir (openai-whisper writer formats)")
    p.add_argument("--output-dir", "-o", default=".",
                   help="directory for --output-format files")
    p.add_argument("--highlight-words", action="store_true",
                   help="srt/vtt: one cue per word with the spoken word "
                        "underlined (needs --word-timestamps)")
    p.add_argument("--verbose", action="store_true")


def cmd_transcribe(args) -> int:
    import jax.numpy as jnp

    from .model.load import load_model
    from .pipeline.transcribe import TranscribeOptions, transcribe

    dtype = jnp.float32 if args.dtype == "float32" else jnp.bfloat16
    model = load_model(args.model, dtype=dtype, gelu_impl=args.gelu)
    if args.quantize_weights:
        import jax

        from .model.quant import quantize_decoder_weights

        model.params = jax.jit(quantize_decoder_weights)(model.params)
    if args.draft:
        # speculative greedy decoding: exact output, draft buys speed
        model.draft = load_model(args.draft, dtype=dtype, gelu_impl=args.gelu)
    mesh_ctx = None
    if args.tp and args.tp > 1:
        # tensor-parallel single-stream transcription (latency mode):
        # params Megatron-sharded, the whole pipeline traced under the mesh
        # (decode_step pins the KV/cross layouts).
        from .parallel.mesh import make_mesh
        from .parallel.sharding import shard_params

        mesh_ctx = make_mesh(args.tp, tp=args.tp)
        model.params = shard_params(model.params, mesh_ctx)
        if model.draft is not None:
            model.draft.params = shard_params(model.draft.params, mesh_ctx)
    opts = TranscribeOptions(
        task=args.task,
        language=args.language,
        beam_size=args.beam,
        best_of=args.best_of,
        without_timestamps=args.no_timestamps,
        token_timestamps=args.token_timestamps,
        word_timestamps=args.word_timestamps,
        condition_on_previous_text=not args.no_condition_on_previous_text,
        initial_prompt=args.initial_prompt,
        mel_mode=args.mel_mode,
        use_flash=args.flash,
        audio_ctx=args.audio_ctx,
        offset_ms=args.offset_ms,
        duration_ms=args.duration_ms,
        verbose=args.verbose,
    )
    if args.temperature is not None:
        opts.temperature = args.temperature

    if args.chunked:
        from .pipeline.chunked import transcribe_chunked as _transcribe_fn
    else:
        _transcribe_fn = transcribe

    import contextlib

    import jax as _jax

    all_results = {}
    for path in args.audio:
        t0 = time.perf_counter()
        with (_jax.set_mesh(mesh_ctx) if mesh_ctx is not None
              else contextlib.nullcontext()):
            result = _transcribe_fn(model, path, opts)
        wall = time.perf_counter() - t0
        rtf = result["duration"] / wall if wall > 0 else float("inf")
        all_results[path] = result
        print(f"== {path} (lang={result['language']}, {result['duration']:.1f}s "
              f"audio in {wall:.1f}s, {rtf:.1f}x realtime)")
        for seg in result["segments"]:
            print(f"[{_fmt_ts(seg['t0'])} --> {_fmt_ts(seg['t1'])}] {seg['text']}")
        print(model.timers.report())
    if args.output_json:
        with open(args.output_json, "w") as f:
            json.dump(all_results, f, indent=2, ensure_ascii=False)
    if args.output_format:
        from .utils.writers import WRITERS, write_transcripts

        formats = (list(WRITERS) + ["json"] if args.output_format == "all"
                   else [args.output_format])
        for p in write_transcripts(all_results, args.output_dir, formats,
                                   highlight_words=args.highlight_words):
            print(f"wrote {p}")
    return 0


def _fmt_ts(t: float) -> str:
    from .utils.writers import _timestamp

    return _timestamp(t, always_include_hours=True, decimal_marker=".")


def cmd_info(args) -> int:
    from .io.ggml import load_ggml

    ckpt = load_ggml(args.model)
    c = ckpt.config
    print(f"model type     : {c.model_type}")
    print(f"multilingual   : {c.is_multilingual}")
    print(f"tensors        : {len(ckpt.tensors)}")
    print(f"filters        : {ckpt.filters.shape}")
    print(f"vocab (file)   : {len(ckpt.vocab.id_to_token)}")
    print(f"hbm estimate   : {c.hbm_bytes_estimate() / 2**20:.1f} MB")
    return 0


def cmd_convert(args) -> int:
    """Re-export a GGML checkpoint (f32 <-> f16) — the whisper.cpp `quantize`
    tool's role for this format."""
    import dataclasses

    import numpy as np

    from .io.ggml import load_ggml, write_ggml

    ckpt = load_ggml(args.model)
    new_cfg = dataclasses.replace(ckpt.config, f16=1 if args.f16 else 0)
    tokens = [ckpt.vocab.id_to_token[i] for i in range(max(ckpt.vocab.id_to_token) + 1)]
    tensors = {k: np.asarray(v, dtype=np.float32) for k, v in ckpt.tensors.items()}
    write_ggml(args.out, new_cfg, ckpt.filters, tokens, tensors)
    print(f"wrote {args.out} (f16={new_cfg.f16})")
    return 0


def cmd_eval(args) -> int:
    """WER evaluation over a dataset directory.

    Layout: either LibriSpeech-style (*.trans.txt listing `utt_id text` with
    utt_id.flac/.wav next to it) or a flat dir of `name.wav` + `name.txt`.
    """
    import jax.numpy as jnp

    from .model.load import load_model
    from .pipeline.transcribe import TranscribeOptions
    from .utils.wer import evaluate_dataset

    dtype = jnp.float32 if args.dtype == "float32" else jnp.bfloat16
    model = load_model(args.model, dtype=dtype)

    def dataset():
        import glob
        import os

        n = 0
        trans = glob.glob(os.path.join(args.data, "**", "*.trans.txt"), recursive=True)
        if trans:
            for tf in sorted(trans):
                root = os.path.dirname(tf)
                with open(tf) as f:
                    for line in f:
                        utt, _, text = line.strip().partition(" ")
                        for ext in (".wav", ".flac"):
                            p = os.path.join(root, utt + ext)
                            if os.path.exists(p):
                                yield p, text
                                n += 1
                                break
                        if args.limit and n >= args.limit:
                            return
        else:
            for wav in sorted(glob.glob(os.path.join(args.data, "*.wav"))):
                txt = wav[:-4] + ".txt"
                if os.path.exists(txt):
                    yield wav, open(txt).read().strip()
                    n += 1
                    if args.limit and n >= args.limit:
                        return

    opts = TranscribeOptions(
        language=args.language, beam_size=args.beam,
        condition_on_previous_text=not args.no_condition_on_previous_text,
        without_timestamps=args.without_timestamps,
    )
    result = evaluate_dataset(model, dataset(), options=opts)
    print(json.dumps(result, indent=2))
    return 0


def cmd_batch(args) -> int:
    """Continuous-batching transcription of many WAVs: the native threaded
    loader prefetches/decodes while the SlotEngine refills finished slots
    from the queue mid-decode."""
    if args.draft and args.beam:
        raise WhisperError("--draft (speculative) is greedy-only; "
                           "drop --beam")
    import jax.numpy as jnp

    from .decoding.task import DecodingOptions
    from .model.load import load_model
    from .parallel.engine import SlotEngine
    from .runtime.native import NativeAudioLoader

    model = load_model(args.model, dtype=jnp.bfloat16)
    if args.quantize:
        import jax

        from .model.quant import quantize_decoder_weights

        model.params = jax.jit(quantize_decoder_weights)(model.params)
    if args.enc_int8:
        import jax

        from .model.quant import quantize_encoder_weights

        model.params = jax.jit(quantize_encoder_weights)(model.params)
    mesh = None
    if args.tp and args.tp > 1:
        from .parallel.mesh import make_mesh

        mesh = make_mesh(args.tp, tp=args.tp)
    loader = NativeAudioLoader(args.audio, n_threads=args.io_threads)
    audios = []
    for _, rate, audio in loader:
        if rate != 16000:
            from .io.wav import resample_poly

            audio = resample_poly(audio, 16000, rate)
        audios.append(audio)
    loader.close()
    total = sum(len(a) for a in audios) / 16000.0
    if args.long_form:
        # whisper_full semantics through the engine: window continuation,
        # prompt carry, no-speech gate, fallback escalation per stream.
        # --beam N decodes every window with beam search (beam groups).
        from .pipeline.transcribe import TranscribeOptions

        if args.beam:
            from .parallel.beam_engine import BeamSlotEngine

            engine = BeamSlotEngine(
                model, n_slots=args.slots,
                options=DecodingOptions(language=args.language,
                                        beam_size=args.beam),
                quantize=args.quantize, mesh=mesh,
                audio_ctx=args.audio_ctx,
            )
        elif args.draft:
            from .parallel.spec_engine import SpecSlotEngine

            engine = SpecSlotEngine(
                model, args.draft, n_slots=args.slots,
                options=DecodingOptions(language=args.language),
                quantize=args.quantize, gamma=args.gamma,
                audio_ctx=args.audio_ctx,
            )
        else:
            engine = SlotEngine(
                model, n_slots=args.slots,
                options=DecodingOptions(language=args.language),
                quantize=args.quantize, mesh=mesh,
                audio_ctx=args.audio_ctx,
            )
        t0 = time.perf_counter()
        results = engine.transcribe_streams(
            audios, TranscribeOptions(language=args.language,
                                      beam_size=args.beam or None,
                                      word_timestamps=args.word_timestamps))
        wall = time.perf_counter() - t0
        for path, res in zip(args.audio, results):
            print(f"== {path}: {res['text']}")
    else:
        if args.beam:
            from .parallel.beam_engine import BeamSlotEngine

            engine = BeamSlotEngine(
                model, n_slots=args.slots,
                options=DecodingOptions(language=args.language,
                                        beam_size=args.beam,
                                        without_timestamps=True),
                quantize=args.quantize, mesh=mesh,
                audio_ctx=args.audio_ctx,
            )
        elif args.draft:
            from .parallel.spec_engine import SpecSlotEngine

            engine = SpecSlotEngine(
                model, args.draft, n_slots=args.slots,
                options=DecodingOptions(language=args.language,
                                        without_timestamps=True),
                quantize=args.quantize, gamma=args.gamma,
                audio_ctx=args.audio_ctx,
            )
        else:
            engine = SlotEngine(
                model, n_slots=args.slots,
                options=DecodingOptions(language=args.language,
                                        without_timestamps=True),
                quantize=args.quantize, mesh=mesh,
                audio_ctx=args.audio_ctx,
            )
        t0 = time.perf_counter()
        results = engine.transcribe_many(audios)
        wall = time.perf_counter() - t0
        for path, res in zip(args.audio, results):
            print(f"== {path}: {res.text}")
    print(f"{total:.1f}s audio in {wall:.2f}s "
          f"({total / max(wall, 1e-9):.1f}x realtime, {args.slots} slots)")
    return 0


def cmd_serve(args) -> int:
    """HTTP transcription daemon: POST /transcribe (WAV body) -> result
    JSON; GET /healthz, /stats. Requests from concurrent clients share the
    chip through the continuous-batching engine (whisper_full long-form per
    request; --beam N serves beam groups)."""
    if args.draft and args.beam:
        raise WhisperError("--draft (speculative) is greedy-only; "
                           "drop --beam")
    import jax.numpy as jnp

    from .decoding.task import DecodingOptions
    from .model.load import load_model
    from .parallel.server import EngineServer, make_http_server
    from .pipeline.transcribe import TranscribeOptions

    model = load_model(args.model, dtype=jnp.bfloat16)
    if args.quantize:
        import jax

        from .model.quant import quantize_decoder_weights

        model.params = jax.jit(quantize_decoder_weights)(model.params)
    if args.enc_int8:
        import jax

        from .model.quant import quantize_encoder_weights

        model.params = jax.jit(quantize_encoder_weights)(model.params)
    dp = max(1, args.dp or 1)
    tp = args.tp or 1

    def build_engine(mesh):
        if args.beam:
            from .parallel.beam_engine import BeamSlotEngine

            return BeamSlotEngine(
                model, n_slots=args.slots,
                options=DecodingOptions(language=args.language,
                                        task=args.task,
                                        beam_size=args.beam),
                quantize=args.quantize, mesh=mesh,
                audio_ctx=args.audio_ctx)
        if args.draft:
            from .parallel.spec_engine import SpecSlotEngine

            return SpecSlotEngine(
                model, args.draft, n_slots=args.slots,
                options=DecodingOptions(language=args.language,
                                        task=args.task),
                quantize=args.quantize, gamma=args.gamma,
                audio_ctx=args.audio_ctx)
        from .parallel.engine import SlotEngine

        return SlotEngine(
            model, n_slots=args.slots,
            options=DecodingOptions(language=args.language, task=args.task),
            quantize=args.quantize, mesh=mesh, audio_ctx=args.audio_ctx)

    topts = TranscribeOptions(language=args.language,
                              task=args.task,
                              beam_size=args.beam or None,
                              word_timestamps=args.word_timestamps)
    if dp > 1:
        # dp serving: one engine replica per tp group of chips, requests
        # routed to the least-loaded replica (parallel/server.py). Each
        # replica gets a (1, tp) mesh over its own device slice so its
        # params/pools/programs live on its chips only.
        import jax

        from .parallel.mesh import make_mesh
        from .parallel.server import MultiEngineServer

        devs = jax.devices()
        if len(devs) < dp * tp:
            raise SystemExit(
                f"--dp {dp} --tp {tp} needs {dp * tp} devices; backend has "
                f"{len(devs)}")
        servers = []
        for i in range(dp):
            mesh = make_mesh(tp, tp=tp, devices=devs[i * tp:(i + 1) * tp])
            servers.append(EngineServer(
                build_engine(mesh), topts, max_queue=args.max_queue,
                request_timeout_s=args.request_timeout))
        srv_cm = MultiEngineServer(servers)
    else:
        mesh = None
        if tp > 1:
            from .parallel.mesh import make_mesh

            mesh = make_mesh(tp, tp=tp)  # dp=1: slots stay local
        srv_cm = EngineServer(build_engine(mesh), topts,
                              max_queue=args.max_queue,
                              request_timeout_s=args.request_timeout)
    if args.profiler_port:
        # on-demand device profiling: connect TensorBoard (or
        # jax.profiler.trace) to this port to capture live serving traces
        import jax

        jax.profiler.start_server(args.profiler_port)
        print(f"jax profiler listening on :{args.profiler_port}")
    if args.warmup:
        import time as _time

        engines = ([s.engine for s in srv_cm.servers]
                   if dp > 1 else [srv_cm.engine])
        for i, eng in enumerate(engines):
            t0 = _time.perf_counter()
            eng.warmup(topts)
            print(f"warmup: replica {i} programs compiled in "
                  f"{_time.perf_counter() - t0:.1f}s")
    with srv_cm as srv:
        httpd = make_http_server(srv, args.host, args.port)
        print(f"serving on http://{args.host}:{args.port} "
              f"(slots={args.slots}, beam={args.beam or 'greedy'}, "
              f"quantize={args.quantize}) — POST /transcribe with WAV bytes")

        # Graceful SIGTERM (systemd/k8s stop): break out of serve_forever
        # on the main thread, then the context manager drains in-flight
        # requests before the process exits.
        import signal

        def _term(signum, frame):
            raise KeyboardInterrupt

        prev = signal.signal(signal.SIGTERM, _term)
        try:
            httpd.serve_forever()
        except KeyboardInterrupt:
            print("shutting down: draining in-flight requests")
        finally:
            signal.signal(signal.SIGTERM, prev)
            httpd.server_close()
    return 0


def cmd_detect_language(args) -> int:
    """Language identification only (whisper.cpp --detect-language /
    openai whisper.detect_language): one encoder pass + one SOT-position
    decoder forward per file; prints the top languages with probabilities."""
    import jax.numpy as jnp
    import numpy as np

    from .config import N_SAMPLES_PER_CHUNK
    from .decoding.task import detect_language
    from .frontend.mel import frame_count, log_mel_spectrogram, mel_window
    from .io.wav import load_wav
    from .model.encoder import encode
    from .model.load import load_model

    model = load_model(args.model, dtype=jnp.bfloat16)
    if not model.config.is_multilingual:
        print("model is English-only (.en); language is always en")
        return 0
    for path in args.audio:
        # Pad the AUDIO by 30 s like pipeline.transcribe: the pad region
        # must be the log-mel silence floor (~-1.05 after normalization),
        # not mel_window's 0.0 fill — zero-filled windows skew the language
        # distribution on short clips (measured: different argmax).
        audio = np.pad(load_wav(path), (0, N_SAMPLES_PER_CHUNK))
        mel = log_mel_spectrogram(jnp.asarray(audio), model.filters,
                                  frame_count(len(audio)))
        win = mel_window(mel, 0, 2 * model.config.n_audio_ctx)[None]
        enc = encode(model.params, win, model.config)
        langs, probs = detect_language(model.params, model.config,
                                       model.vocab, enc.cross_k, enc.cross_v)
        top = sorted(probs[0].items(), key=lambda kv: -kv[1])[: args.top]
        ranked = ", ".join(f"{k}={v:.3f}" for k, v in top)
        print(f"== {path}: {langs[0]} ({ranked})")
    return 0


def cmd_stream(args) -> int:
    """Simulated real-time transcription: feed a WAV in chunks, print
    committed text as it stabilizes; final output == offline transcribe."""
    import numpy as np

    from .io.wav import load_wav
    from .model.load import load_model
    from .pipeline.streaming import StreamingTranscriber
    from .pipeline.transcribe import TranscribeOptions

    model = load_model(args.model)
    audio = load_wav(args.audio)
    st = StreamingTranscriber(
        model, TranscribeOptions(language=args.language or "en"),
        draft=not args.no_draft)
    step = int(args.chunk_seconds * 16000)
    for start in range(0, len(audio), step):
        out = st.feed(np.asarray(audio[start : start + step]))
        for seg in out["committed"]:
            print(f"[{_fmt_ts(seg['t0'])} --> {_fmt_ts(seg['t1'])}] {seg['text']}")
        if out["draft"] and args.verbose:
            tail = "".join(s["text"] for s in out["draft"])
            print(f"  (draft: {tail.strip()})")
    final = st.finalize()
    print("== final ==")
    print(final["text"])
    return 0


def cmd_bench(args) -> int:
    from .utils.benchmark import run_benchmark

    result = run_benchmark(model_path=args.model, seconds=args.seconds,
                           batch=args.batch, dtype=args.dtype)
    print(json.dumps(result))
    return 0


def cmd_export(args) -> int:
    """Serialize an AOT-lowered greedy decode program (jax.export) for one
    serving shape — the shippable cold-start artifact (utils/aot.py); a
    serving image loads it with aot.load() and skips tracing entirely."""
    import jax.numpy as jnp

    from .model.load import load_model
    from .utils import aot

    model = load_model(args.model, dtype=jnp.bfloat16
                       if args.dtype == "bfloat16" else jnp.float32)
    if args.full_step:
        # full serving step (mel -> encoder -> fused decode) — the same
        # program the bench runs; consumed via BENCH_AOT / run_benchmark
        if args.quantize:
            import jax

            from .model.quant import quantize_decoder_weights

            model.params = jax.jit(quantize_decoder_weights)(model.params)
        if args.enc_int8:
            import jax

            from .model.quant import quantize_encoder_weights

            model.params = jax.jit(quantize_encoder_weights)(model.params)
        kv = "int8" if args.quantize else "bfloat16"
        data = aot.export_serving_step(
            model, batch=args.batch, decode_tokens=args.sample_len,
            kv_dtype=kv, use_flash=args.flash)
        meta = {
            "kind": "serving_step", "model": model.config.model_type,
            "batch": args.batch, "decode_tokens": args.sample_len,
            "kv_dtype": kv, "weight_dtype": kv,
            "enc_dtype": "int8" if args.enc_int8 else "bfloat16",
            "use_flash": bool(args.flash), "beam_size": None,
        }
    else:
        data = aot.export_decode_segment(
            model.params, model.config, model.vocab,
            batch=args.batch, sample_len=args.sample_len, prefill=args.prefill,
            dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
        )
        meta = {
            "kind": "decode_segment", "model": model.config.model_type,
            "batch": args.batch, "sample_len": args.sample_len,
            "prefill": args.prefill, "dtype": args.dtype,
        }
    aot.write_artifact(args.out, data, meta)
    print(f"wrote {args.out}: {len(data) / 1e6:.1f} MB "
          f"(batch={args.batch}, prefill={args.prefill}, "
          f"sample_len={args.sample_len}, platform-tagged)")
    return 0


def main(argv=None) -> int:
    import os

    from . import enable_compile_cache

    # Honor JAX_PLATFORMS before any backend initializes: some out-of-tree
    # TPU plugins (the tunneled 'axon' runtime in this image) ignore the env
    # var and would block retrying an unreachable remote chip even when the
    # user asked for cpu. jax.config is always respected.
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    try:
        enable_compile_cache()
    except Exception:  # noqa: BLE001 — cache is an optimization only
        pass
    parser = argparse.ArgumentParser(prog="whisper_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("transcribe", help="transcribe WAV file(s)")
    _add_transcribe_args(p)
    p.set_defaults(fn=cmd_transcribe)

    p = sub.add_parser("info", help="inspect a GGML checkpoint")
    p.add_argument("model")
    p.set_defaults(fn=cmd_info)

    p = sub.add_parser("convert", help="re-export a GGML checkpoint (f32/f16)")
    p.add_argument("model")
    p.add_argument("out")
    p.add_argument("--f16", action="store_true", help="store weights as f16")
    p.set_defaults(fn=cmd_convert)

    p = sub.add_parser("eval", help="WER evaluation over a dataset directory")
    p.add_argument("model")
    p.add_argument("data", help="LibriSpeech-style dir or flat wav+txt dir")
    p.add_argument("--language", default=None)
    p.add_argument("--beam", type=int, default=None)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--dtype", choices=["float32", "bfloat16"], default="bfloat16")
    p.add_argument("--no-condition-on-previous-text", action="store_true")
    p.add_argument("--without-timestamps", action="store_true")
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("batch", help="continuous-batching engine over many WAVs")
    p.add_argument("model")
    p.add_argument("audio", nargs="+")
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--language", default=None)
    p.add_argument("--quantize", action="store_true", help="int8 serving mode")
    p.add_argument("--enc-int8", action="store_true",
                   help="W8A8 encoder matmuls (speeds admission encodes; "
                        "token agreement gated in tests/test_quant.py)")
    p.add_argument("--io-threads", type=int, default=4)
    p.add_argument("--beam", type=int, default=None,
                   help="beam size: continuous-batching beam groups")
    p.add_argument("--long-form", action="store_true",
                   help="whisper_full windows through the engine (>30 s "
                        "streams, prompt carry, fallback)")
    p.add_argument("--word-timestamps", action="store_true",
                   help="word-level timestamps (long-form mode; DTW over "
                        "the slot's resident cross-attention rows)")
    p.add_argument("--tp", type=int, default=None,
                   help="tensor-parallel over this many chips")
    p.add_argument("--audio-ctx", type=int, default=None,
                   help="static encoder-context override for known-short "
                        "streams (exp_n_audio_ctx; shrinks the cross pools "
                        "and decode's cross reads engine-wide)")
    p.add_argument("--draft", default=None, metavar="DRAFT.npz",
                   help="speculative continuous batching: distilled "
                        "shared-encoder draft (training.distill.save_draft; "
                        "greedy engines only, exact output)")
    p.add_argument("--gamma", type=int, default=4,
                   help="speculative verify width (with --draft)")
    p.set_defaults(fn=cmd_batch)

    p = sub.add_parser("detect-language",
                       help="language identification only (first window)")
    p.add_argument("model")
    p.add_argument("audio", nargs="+")
    p.add_argument("--top", type=int, default=5,
                   help="print this many candidate languages")
    p.set_defaults(fn=cmd_detect_language)

    p = sub.add_parser("stream", help="simulated real-time transcription")
    p.add_argument("model")
    p.add_argument("audio")
    p.add_argument("--chunk-seconds", type=float, default=5.0)
    p.add_argument("--language", default=None)
    p.add_argument("--no-draft", action="store_true")
    p.add_argument("--verbose", action="store_true")
    p.set_defaults(fn=cmd_stream)

    p = sub.add_parser("serve", help="HTTP transcription server "
                                     "(continuous-batching engine)")
    p.add_argument("model")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--language", default=None)
    p.add_argument("--task", default="transcribe",
                   choices=["transcribe", "translate"],
                   help="default decode task (per-request override via "
                        "/v1/audio/translations)")
    p.add_argument("--quantize", action="store_true", help="int8 serving mode")
    p.add_argument("--enc-int8", action="store_true",
                   help="W8A8 encoder matmuls (speeds admission encodes)")
    p.add_argument("--beam", type=int, default=None,
                   help="beam size per stream (beam-group slots)")
    p.add_argument("--word-timestamps", action="store_true")
    p.add_argument("--max-queue", type=int, default=None,
                   help="503 new requests past this many in flight")
    p.add_argument("--audio-ctx", type=int, default=None,
                   help="static encoder-context override for known-short "
                        "streams (exp_n_audio_ctx; shrinks the cross pools "
                        "and decode's cross reads engine-wide)")
    p.add_argument("--draft", default=None, metavar="DRAFT.npz",
                   help="speculative continuous batching: distilled "
                        "shared-encoder draft (greedy serving only)")
    p.add_argument("--gamma", type=int, default=4,
                   help="speculative verify width (with --draft)")
    p.add_argument("--tp", type=int, default=None,
                   help="tensor-parallel serving over this many chips "
                        "(heads/MLP/vocab sharded; slots stay local)")
    p.add_argument("--dp", type=int, default=None,
                   help="data-parallel serving: this many independent "
                        "engine replicas (each over its own tp group of "
                        "chips), requests routed to the least-loaded")
    p.add_argument("--warmup", action="store_true",
                   help="compile all serving programs before binding the "
                        "port (first request pays queueing, not tracing)")
    p.add_argument("--request-timeout", type=float, default=None,
                   help="server-side deadline in seconds per request "
                        "(overridable per request via ?timeout=; expired "
                        "requests get 504)")
    p.add_argument("--profiler-port", type=int, default=None,
                   help="start a jax profiler server on this port "
                        "(TensorBoard-connectable live device traces)")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser(
        "export", help="serialize an AOT-lowered decode program (jax.export)")
    p.add_argument("model", help="GGML checkpoint path")
    p.add_argument("out", help="output artifact path")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--prefill", type=int, default=32)
    p.add_argument("--sample-len", type=int, default=64)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--full-step", action="store_true",
                   help="export the full serving step (mel+encode+decode) "
                        "instead of the decode loop alone")
    p.add_argument("--quantize", action="store_true",
                   help="int8 serving mode for --full-step")
    p.add_argument("--enc-int8", action="store_true",
                   help="W8A8 encoder for --full-step (the bench default "
                        "serving program)")
    p.add_argument("--flash", action="store_true",
                   help="flash-attention encoder for --full-step (TPU)")
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser("bench", help="throughput benchmark")
    p.add_argument("model", nargs="?", default=None,
                   help="GGML checkpoint (default: random large-v3 weights)")
    p.add_argument("--seconds", type=int, default=120)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--dtype", default="bfloat16")
    p.set_defaults(fn=cmd_bench)

    args = parser.parse_args(argv)
    try:
        return args.fn(args)
    except WhisperError as e:
        # Typed configuration/load errors (bad checkpoint, oversized serving
        # config per config.check_serving_hbm, ...) are user errors — print
        # the message, not a traceback (the reference's main() error path).
        print(f"error: {e}", file=sys.stderr)
        return 2


if __name__ == "__main__":
    sys.exit(main())
