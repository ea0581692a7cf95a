#!/usr/bin/env python
"""Non-trivial speculative acceptance (VERDICT r4 item 3).

The r4 spec win (1.5-1.8x) used the bench's random-weight large-v3 target,
which transcribes EVERY noise window as one fixed sequence — acceptance 1.0
is trivially attainable there, so those numbers are the machinery's ceiling,
not an acceptance claim. This script produces the first acceptance number in
(0, 1) on an INPUT-DEPENDENT target, entirely in-sandbox:

  1. train a tone-word transcription model from scratch
     (utils/synth.py corpus — transcripts depend on the audio),
  2. distill a 2-layer shared-encoder draft from the target's OWN greedy
     transcripts on fresh tone audio (the distil-whisper pseudo-label
     recipe, training/distill.py),
  3. A/B the fused speculative loop against plain greedy on held-out tone
     windows (batch of DISTINCT utterances — per-row acceptance is real),
     interleaved in one process, across a gamma sweep.

Prints one JSON line per gamma: acceptance/round (in (0,1) for an imperfect
student), accepted-token fraction, and the wall-clock ratio vs greedy.

Run (TPU, serialized):  python scripts/spec_acceptance.py
Env: SPEC_PLATFORM (axon|cpu), SPEC_TRAIN_STEPS (800), SPEC_DISTILL_STEPS
(600), SPEC_GAMMAS (2,4,8), SPEC_REPS (20), SPEC_BATCH (8),
SPEC_TEXT_LAYERS (12).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if __name__ == "__main__":
    jax.config.update("jax_platforms", os.environ.get("SPEC_PLATFORM", "axon"))
    _cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from whisper_tpu.config import WhisperConfig
from whisper_tpu.decoding.device_loop import build_masks, decode_segment_device
from whisper_tpu.decoding.device_speculative import (
    decode_segment_speculative_device)
from whisper_tpu.frontend.mel import frame_count, log_mel_spectrogram
from whisper_tpu.io.vocab import make_vocab
from whisper_tpu.model.decoder import init_cache
from whisper_tpu.model.encoder import cross_kv_from_hidden, encode
from whisper_tpu.model.load import random_model
from whisper_tpu.training.distill import distill
from whisper_tpu.training.finetune import finetune
from whisper_tpu.utils.synth import SR, make_pair, word_tokens

N_VOCAB = 51864


def make_model(n_text_layer: int):
    cfg = WhisperConfig(
        n_vocab=N_VOCAB, n_audio_ctx=256, n_audio_state=256, n_audio_head=4,
        n_audio_layer=4, n_text_ctx=128, n_text_state=256, n_text_head=4,
        n_text_layer=n_text_layer, n_mels=80, f16=0)
    model = random_model(cfg, seed=0)
    model.vocab = make_vocab(N_VOCAB, word_tokens(N_VOCAB), N_VOCAB)
    return model


def pad_window(audio: np.ndarray, n_samples: int) -> np.ndarray:
    out = np.zeros(n_samples, np.float32)
    out[: min(len(audio), n_samples)] = audio[:n_samples]
    return out


def transcribe_batch(model, params, wins, sample_len):
    """Greedy device transcripts for a (B, n_mels, frames) window batch."""
    cfg, vocab = model.config, model.vocab
    sup, blank = build_masks(vocab)
    init = [vocab.token_sot]
    init_tokens = jnp.asarray(
        np.tile(np.array(init, np.int32), (wins.shape[0], 1)))
    enc = encode(params, wins, cfg)
    toks, lengths, _, _ = decode_segment_device(
        params, init_tokens, len(init), 0,
        init_cache(cfg, wins.shape[0], ctx=len(init) + sample_len + 8),
        enc.cross_k, enc.cross_v, sup, blank, cfg,
        sample_len=sample_len, use_timestamps=False)
    toks, lengths = np.asarray(toks), np.asarray(lengths)
    return [model.vocab.decode([int(t) for t in toks[i, : lengths[i]]])
            for i in range(wins.shape[0])]


def main():
    t_start = time.time()
    train_steps = int(os.environ.get("SPEC_TRAIN_STEPS", "800"))
    distill_steps = int(os.environ.get("SPEC_DISTILL_STEPS", "600"))
    gammas = [int(g) for g in
              os.environ.get("SPEC_GAMMAS", "2,4,8").split(",")]
    reps = int(os.environ.get("SPEC_REPS", "20"))
    batch = int(os.environ.get("SPEC_BATCH", "8"))
    n_layers = int(os.environ.get("SPEC_TEXT_LAYERS", "12"))
    # SPEC_REPEAT=2: structured corpus (each word spoken twice) — the
    # repeat=1 corpus is i.i.d. random words, whose NEXT word is
    # information-theoretically unpredictable from the token prefix, so
    # draft acceptance is capped near chance no matter the draft size
    # (measured: 0.18-0.26/row/round for 2L/600-step AND 4L/2400-step
    # drafts alike). Structure gives acceptance legitimate headroom,
    # the way real speech does.
    rep = int(os.environ.get("SPEC_REPEAT", "1"))
    wrange = (2, 12 // rep)
    sample_len = 32

    print("devices:", jax.devices(), flush=True)
    model = make_model(n_layers)
    cfg, vocab = model.config, model.vocab
    n_frames = 2 * cfg.n_audio_ctx          # 512 mel frames = 5.12 s
    n_samples = n_frames * 160

    # -- 1. train the input-dependent target on tone-words --
    rng = np.random.default_rng(0)
    train_pairs = [make_pair(rng, n_words=wrange, repeat=rep)
                   for _ in range(256)]
    t0 = time.time()
    state = finetune(model, train_pairs, steps=train_steps, batch_size=16,
                     lr=1e-3, warmup=30, log_every=200, seed=0)
    model.params = state.params
    print(f"trained {train_steps} steps in {time.time()-t0:.0f}s", flush=True)

    # -- 2. pseudo-label distillation: the target labels fresh audio --
    rng_pl = np.random.default_rng(1)
    n_pl = int(os.environ.get("SPEC_PL_WINDOWS", "128"))
    pl_audio = [make_pair(rng_pl, n_words=wrange, repeat=rep)[0]
                for _ in range(n_pl)]
    wins_list = []
    for i in range(0, len(pl_audio), batch):
        group = pl_audio[i : i + batch]
        group += [group[-1]] * (batch - len(group))
        wins_list.append(jnp.stack([
            log_mel_spectrogram(
                jnp.asarray(pad_window(a, n_samples)), model.filters,
                frame_count(n_samples))[:, :n_frames]
            for a in group]))
    pseudo = []
    for i, wins in enumerate(wins_list):
        texts = transcribe_batch(model, model.params, wins, sample_len)
        for j, t in enumerate(texts):
            k = i * batch + j
            if k < len(pl_audio) and t.strip():
                pseudo.append((pl_audio[k], t.strip()))
    print(f"pseudo-labels: {len(pseudo)} non-empty "
          f"(e.g. {pseudo[0][1]!r})", flush=True)

    t0 = time.time()
    draft_layers = int(os.environ.get("SPEC_DRAFT_LAYERS", "2"))
    res = distill(model, pseudo, n_text_layer=draft_layers, steps=distill_steps,
                  batch_size=16, lr=1e-3, seed=0, log_every=200)
    dparams, dcfg = res.params, res.config
    print(f"distilled 2L draft in {time.time()-t0:.0f}s "
          f"(final loss {res.losses[-1]:.3f})", flush=True)

    # -- 3. A/B on held-out DISTINCT windows, interleaved --
    rng_ho = np.random.default_rng(2)
    held = [make_pair(rng_ho, n_words=wrange, repeat=rep)[0]
            for _ in range(batch)]
    wins = jnp.stack([
        log_mel_spectrogram(
            jnp.asarray(pad_window(a, n_samples)), model.filters,
            frame_count(n_samples))[:, :n_frames]
        for a in held])
    sup, blank = build_masks(vocab)
    init = [vocab.token_sot]
    init_tokens = jnp.asarray(np.tile(np.array(init, np.int32), (batch, 1)))

    @jax.jit
    def greedy_step(params, wins):
        enc = encode(params, wins, cfg)
        return decode_segment_device(
            params, init_tokens, len(init), 0,
            init_cache(cfg, batch, ctx=len(init) + sample_len + 8),
            enc.cross_k, enc.cross_v, sup, blank, cfg,
            sample_len=sample_len, use_timestamps=False)[:2]

    import functools

    @functools.partial(jax.jit, static_argnames=("gamma",))
    def spec_step(params_t, params_d, wins, gamma):
        enc = encode(params_t, wins, cfg)
        ck_d, cv_d = cross_kv_from_hidden(params_d, enc.hidden, dcfg)
        ctx = len(init) + sample_len + gamma + 8
        return decode_segment_speculative_device(
            params_t, params_d, init_tokens, len(init), 0,
            init_cache(cfg, batch, ctx=ctx), init_cache(dcfg, batch, ctx=ctx),
            enc.cross_k, enc.cross_v, ck_d, cv_d, sup, blank, cfg, dcfg,
            sample_len=sample_len, gamma=gamma, use_timestamps=False)

    def pull(x):
        return np.asarray(x.ravel()[:4])

    g_toks, g_lens = greedy_step(model.params, wins)
    pull(g_toks)
    results = {}
    for gamma in gammas:
        s = spec_step(model.params, dparams, wins, gamma)
        pull(s[0])
        # token identity vs greedy (exact arithmetic caveat: bf16/f32 HW)
        same = bool(np.array_equal(np.asarray(s[0]), np.asarray(g_toks)))
        walls = {"greedy": 0.0, "spec": 0.0}
        for _ in range(reps):
            t = time.perf_counter()
            g = greedy_step(model.params, wins); pull(g[0])
            walls["greedy"] += time.perf_counter() - t
            t = time.perf_counter()
            s = spec_step(model.params, dparams, wins, gamma); pull(s[0])
            walls["spec"] += time.perf_counter() - t
        rounds, accepted = int(s[4]), int(s[5])
        acc_per_row_round = accepted / max(rounds * batch, 1)
        results[gamma] = {
            "gamma": gamma,
            "acceptance_per_row_round": round(acc_per_row_round, 3),
            "acceptance_fraction": round(
                acc_per_row_round / (gamma - 1), 3),
            "rounds": rounds, "accepted": accepted,
            "wall_ratio_vs_greedy": round(
                walls["greedy"] / walls["spec"], 3),
            "tokens_match_greedy": same,
            "reps": reps,
        }
        print(json.dumps(results[gamma]), flush=True)

    # -- 4. ENGINE composition on the same trained target: SpecSlotEngine
    #       vs greedy SlotEngine (the r4-verdict item-2 on-chip number; the
    #       random-weight large-v3 target cannot provide it — its argmax
    #       flips between the T=1 greedy and T=gamma verify forwards, so
    #       engine acceptance collapses to ~0 there, scripts/
    #       diag_spec_engine.py). Trained logits have real margins. --
    from whisper_tpu.decoding.task import DecodingOptions
    from whisper_tpu.parallel.engine import SlotEngine
    from whisper_tpu.parallel.spec_engine import SpecSlotEngine

    n_streams = int(os.environ.get("SPEC_ENGINE_STREAMS", "64"))
    eng_streams = [make_pair(rng_ho, n_words=wrange, repeat=rep)[0]
                   for _ in range(n_streams)]
    eng_audio_s = sum(len(a) for a in eng_streams) / SR
    slots = int(os.environ.get("SPEC_ENGINE_SLOTS", "16"))
    eng_reps = int(os.environ.get("SPEC_ENGINE_REPS", str(max(3, reps // 4))))
    eng_kw = dict(n_slots=slots, chunk_steps=8, max_new_tokens=sample_len,
                  options=DecodingOptions(without_timestamps=True),
                  quantize=False, schedule="overlapped")
    geng = SlotEngine(model, **eng_kw)
    geng.transcribe_many(eng_streams)  # warm/compile (ALL wave shapes:
    # a slots+8 warm leaves the full-queue trailing buckets uncompiled
    # and contaminated the first timed rep, measured rtf 43 vs 119)
    engine_results = {}
    for gamma in gammas:
        seng = SpecSlotEngine(model, (dparams, dcfg), gamma=gamma, **eng_kw)
        seng.transcribe_many(eng_streams)  # warm/compile
        base = seng.spec_stats()
        walls = {"greedy": 0.0, "spec": 0.0}
        rg = rs = None
        for _ in range(eng_reps):
            t = time.perf_counter()
            rg = geng.transcribe_many(eng_streams)
            walls["greedy"] += time.perf_counter() - t
            t = time.perf_counter()
            rs = seng.transcribe_many(eng_streams)
            walls["spec"] += time.perf_counter() - t
        st = seng.spec_stats()
        rounds = st["rounds"] - base["rounds"]
        acc = st["accepted"] - base["accepted"]
        agree = sum(a.tokens == b.tokens for a, b in zip(rg, rs))
        engine_results[gamma] = {
            "engine_gamma": gamma,
            "accepted_per_round": round(acc / max(rounds, 1), 3),
            "wall_ratio_vs_greedy_engine": round(
                walls["greedy"] / walls["spec"], 3),
            "rtf_greedy": round(eng_audio_s * eng_reps / walls["greedy"], 1),
            "rtf_spec": round(eng_audio_s * eng_reps / walls["spec"], 1),
            "transcript_identity": f"{agree}/{n_streams}",
            "reps": eng_reps,
        }
        print(json.dumps(engine_results[gamma]), flush=True)
        del seng

    emitted = int(np.asarray(g_lens).sum())
    print(json.dumps({
        "summary": "spec_acceptance", "target_layers": n_layers,
        "draft_layers": draft_layers, "batch": batch, "sample_len": sample_len,
        "tokens_emitted_greedy": emitted,
        "train_steps": train_steps, "distill_steps": distill_steps,
        "word_repeat": rep,
        "total_s": round(time.time() - t_start, 0),
        "per_gamma": results,
        "engine": engine_results,
    }), flush=True)


if __name__ == "__main__":
    main()
