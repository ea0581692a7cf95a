#!/usr/bin/env python
"""Distill a 2-layer speculative DRAFT from the bench target (r3 item 3).

Speculative decoding has machinery but no measured win: every synthetic
draft lost (self 0.795x, prefix2 0.742x, distil2-at-zero-acceptance 0.729x,
docs/ROADMAP.md). The missing piece is a draft with REAL acceptance. This
script mints one in-sandbox with the distil-whisper pseudo-label recipe
(training/distill.py): the target is the bench's own random-weight large-v3
(seed 0), pseudo-labels are the TARGET'S OWN greedy transcripts on noise
windows drawn from the bench audio distribution (never the bench seed), and
the student is the 2-layer shared-encoder draft the fused speculative loop
wants (cross memory projected from the target's frozen hidden state — no
second encoder forward).

Outputs draft decoder params as .npz for `BENCH_MODE=spec
BENCH_DRAFT=<path>` (utils/benchmark.run_speculative_benchmark).

Run (TPU, serialized):  python scripts/distill_draft.py [out.npz]
Env: DISTILL_STEPS (default 1200), DISTILL_WINDOWS (256), DISTILL_LR (3e-4)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if __name__ == "__main__":
    jax.config.update("jax_platforms", os.environ.get("DISTILL_PLATFORM", "axon"))
    _cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from whisper_tpu.config import PRESETS
from whisper_tpu.decoding.device_loop import build_masks, decode_segment_device
from whisper_tpu.frontend.mel import frame_count, log_mel_spectrogram, mel_window
from whisper_tpu.model.decoder import init_cache
from whisper_tpu.model.encoder import encode
from whisper_tpu.model.load import random_model
from whisper_tpu.training.distill import init_student_params, student_config
from whisper_tpu.training.train import decoder_forward_train, make_optimizer

BATCH = 8
SAMPLE_LEN = 64


def main():
    out_path = (sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-")
                else "draft_large-v3_2l.npz")
    steps = int(os.environ.get("DISTILL_STEPS", "1200"))
    n_windows = int(os.environ.get("DISTILL_WINDOWS", "256"))
    lr = float(os.environ.get("DISTILL_LR", "3e-4"))
    model_name = os.environ.get("DISTILL_MODEL", "large-v3")

    print("devices:", jax.devices(), flush=True)
    cfg = PRESETS[model_name]
    model = random_model(cfg, seed=0, dtype=jnp.bfloat16)
    vocab = model.vocab
    use_flash = jax.default_backend() == "tpu"
    sup, blank = build_masks(vocab)
    init = [vocab.token_sot]
    if cfg.is_multilingual:
        init += [vocab.language_token("en"), vocab.token_transcribe]
    n_frames = 2 * cfg.n_audio_ctx
    eot = vocab.token_eot

    # Pseudo-label with the SERVING-MODE target: the engines decode the
    # int8-quantized decoder (quantize=True is the serving default), and one
    # early argmax flip vs bf16 shifts every later token — a bf16-labeled
    # draft measured 0.55 accepted/round of 4 in the int8 engine despite
    # held-out acceptance 1.000 on bf16 labels. DISTILL_QUANT=0 opts out.
    label_params = model.params
    if os.environ.get("DISTILL_QUANT", "1") == "1":
        from whisper_tpu.model.quant import quantize_decoder_weights

        label_params = jax.jit(quantize_decoder_weights)(model.params)
    # DISTILL_ENGINE=1 (default): label with the serving ENGINE itself —
    # int8 decoder + int8 KV/cross pools + the engine's emission math, so
    # the labels are bit-exactly what SpecSlotEngine's verify compares the
    # draft against. The lockstep bf16-cache labeler stays for A/Bs.
    use_engine_labels = os.environ.get("DISTILL_ENGINE", "1") == "1"
    _label_engine = None
    if use_engine_labels:
        from whisper_tpu.decoding.task import DecodingOptions
        from whisper_tpu.parallel.engine import SlotEngine

        _orig = model.params
        model.params = label_params
        _label_engine = SlotEngine(
            model, n_slots=BATCH, chunk_steps=16,
            options=DecodingOptions(without_timestamps=False),
            max_new_tokens=SAMPLE_LEN, quantize=True)
        model.params = _orig

    # ---- pseudo-labels: the target's own greedy transcripts ----
    @jax.jit
    def label_batch(params, audio_b):
        mel = jax.vmap(lambda a: log_mel_spectrogram(
            a, model.filters, frame_count(16000 * 30)))(audio_b)
        wins = mel[:, :, :n_frames]
        enc = encode(params, wins, cfg, use_flash=use_flash)
        init_tokens = jnp.tile(jnp.asarray(init, jnp.int32)[None], (BATCH, 1))
        toks, lengths, _, _ = decode_segment_device(
            params, init_tokens, len(init), 0,
            init_cache(cfg, BATCH, dtype=jnp.bfloat16,
                       ctx=len(init) + SAMPLE_LEN + 8),
            enc.cross_k, enc.cross_v, sup, blank, cfg,
            sample_len=SAMPLE_LEN)
        return wins, toks, lengths

    # bench uses rng seed 0 scale 0.1; train on seeds >= 1000 (held out from
    # the bench input), eval acceptance on seeds >= 5000
    def noise(seed):
        """Engine-domain noise: the serving-engine bench mixes 24/27/30 s
        streams shipped as int16 PCM (ab_engine_slots.py), so short windows
        carry a SILENT zero tail after padding — and the random-weight
        target's transcript DEPENDS on that tail (a 30 s-only draft measured
        0.55 accepted/round of 4 in the engine vs 1.000 teacher-forced on
        30 s windows). Distill on the same mixture, int16-quantized like the
        engine's /32768 dequant path."""
        r = np.random.default_rng(seed)
        full = r.standard_normal((BATCH, 16000 * 30)).astype(np.float32) * 0.1
        i16 = np.clip(full * 32768, -32768, 32767).astype(np.int16)
        out = i16.astype(np.float32) / 32768.0
        secs = [24.0, 27.0, 30.0]
        for b in range(BATCH):
            n = int(16000 * secs[(seed + b) % 3])
            out[b, n:] = 0.0
        return out

    T = len(init) + SAMPLE_LEN + 1
    T = -(-T // 32) * 32

    def make_rows(toks, lengths):
        toks, lengths = np.asarray(toks), np.asarray(lengths)
        rows = np.full((BATCH, T), eot, np.int32)
        mask = np.zeros((BATCH, T), np.int32)
        for b in range(BATCH):
            seq = list(init) + [int(t) for t in toks[b, : lengths[b]]] + [eot]
            rows[b, : len(seq)] = seq
            mask[b, : len(seq)] = 1
        return rows, mask

    # the encoder is FROZEN: precompute hidden states once per batch and
    # train against them (both cross memories are cheap projections of
    # hidden; re-encoding every step would dominate the step cost)
    @jax.jit
    def hidden_of(params, wins):
        return encode(params, wins, cfg, use_flash=use_flash).hidden

    @jax.jit
    def wins_of(audio_b):
        mel = jax.vmap(lambda a: log_mel_spectrogram(
            a, model.filters, frame_count(16000 * 30)))(audio_b)
        return mel[:, :, :n_frames]

    def rows_from_lists(tok_lists):
        rows = np.full((BATCH, T), eot, np.int32)
        mask = np.zeros((BATCH, T), np.int32)
        for b, toks in enumerate(tok_lists):
            seq = list(init) + [int(t) for t in toks[: SAMPLE_LEN]] + [eot]
            rows[b, : len(seq)] = seq
            mask[b, : len(seq)] = 1
        return rows, mask

    def batch_of(seed):
        audio = noise(seed)
        if _label_engine is not None:
            # noise() is an exact int16/32768 round-trip, so *32768 recovers
            # the PCM the engine ships raw to the device
            pcm = [np.asarray(np.round(a * 32768.0), np.int16) for a in audio]
            res = _label_engine.transcribe_many(pcm)
            rows, mask = rows_from_lists([r.tokens for r in res])
            wins = wins_of(jnp.asarray(audio))
        else:
            wins, toks, lengths = label_batch(label_params, jnp.asarray(audio))
            rows, mask = make_rows(toks, lengths)
        return (hidden_of(model.params, wins), jnp.asarray(rows),
                jnp.asarray(mask))

    t0 = time.perf_counter()
    data = [batch_of(1000 + w) for w in range(n_windows // BATCH)]
    # token variety diagnostic: how input-dependent is the random target?
    all_rows = np.concatenate([np.asarray(r) for _, r, _ in data])
    uniq = len({tuple(r) for r in all_rows})
    print(f"pseudo-labels: {len(data)*BATCH} windows in "
          f"{time.perf_counter()-t0:.1f}s; {uniq} unique transcripts",
          flush=True)
    print(f"label row 0 head: {all_rows[0][:16].tolist()}", flush=True)

    held = [batch_of(5000 + w) for w in range(4)]
    if _label_engine is not None:
        # free the labeler's pools + int8 params before training allocates
        _label_engine = None
        del label_params

    # ---- student ----
    import optax

    from whisper_tpu.training.distill import cross_memory

    s_cfg = student_config(cfg, 2)
    student_dec = init_student_params(model.params, cfg, 2)["decoder"]
    teacher_dec = model.params["decoder"]
    optimizer = make_optimizer(lr)
    opt_state = optimizer.init(student_dec)
    kl_weight, ce_weight, temperature = 1.0, 0.8, 2.0

    # NB: the teacher decoder is a jit ARGUMENT everywhere below — closure-
    # capturing multi-GB constants breaks the axon remote-compile transport
    # (HTTP 413 / broken pipe, CLAUDE.md).
    def loss_fn(student_dec, teacher_dec, hidden, rows, mask):
        """distill.distill_loss on a PRECOMPUTED frozen hidden state."""
        s_ck, s_cv = cross_memory(hidden, student_dec["blocks"], s_cfg)
        t_ck, t_cv = jax.lax.stop_gradient(
            cross_memory(hidden, teacher_dec["blocks"], cfg))
        inp, targets = rows[:, :-1], rows[:, 1:]
        m = mask[:, 1:].astype(jnp.float32)
        s_log = decoder_forward_train({"decoder": student_dec}, inp,
                                      s_ck, s_cv, s_cfg)
        t_log = jax.lax.stop_gradient(decoder_forward_train(
            {"decoder": teacher_dec}, inp, t_ck, t_cv, cfg))
        ce = optax.softmax_cross_entropy_with_integer_labels(s_log, targets)
        t_prob = jax.nn.softmax(t_log / temperature, -1)
        kl = (t_prob * (jax.nn.log_softmax(t_log / temperature, -1)
                        - jax.nn.log_softmax(s_log / temperature, -1))
              ).sum(-1) * temperature ** 2
        denom = jnp.maximum(m.sum(), 1.0)
        return (ce_weight * (ce * m).sum() / denom
                + kl_weight * (kl * m).sum() / denom)

    @jax.jit
    def step_fn(student_dec, teacher_dec, opt_state, hidden, rows, mask):
        loss, grads = jax.value_and_grad(loss_fn)(
            student_dec, teacher_dec, hidden, rows, mask)
        updates, opt_state = optimizer.update(grads, opt_state, student_dec)
        return optax.apply_updates(student_dec, updates), opt_state, loss

    @jax.jit
    def acceptance(student_dec, teacher_dec, hidden, rows, mask):
        """Teacher-forced RULE-FILTERED argmax agreement with the labels:
        the spec loop (decoding/device_speculative.py) argmaxes BOTH models
        through _apply_rules_device, and the labels ARE the teacher's
        rule-filtered decode — so the per-position acceptance probability is
        P(student filtered argmax == next label token). A raw-argmax
        comparison is wrong here: on random weights the teacher's raw
        argmax is a SUPPRESSED token at every position (measured: agreement
        stays 0.000 while the student fits the labels perfectly)."""
        del teacher_dec
        ck, cv = cross_memory(hidden, student_dec["blocks"], s_cfg)
        s_log = decoder_forward_train({"decoder": student_dec}, rows[:, :-1],
                                      ck, cv, s_cfg)
        filt = jnp.where(sup[None, None], -jnp.inf, s_log)
        m = mask[:, 1:].astype(jnp.float32)
        m = m.at[:, : len(init) - 1].set(0)
        agree = (jnp.argmax(filt, -1) == rows[:, 1:]).astype(jnp.float32)
        return (agree * m).sum() / jnp.maximum(m.sum(), 1.0)

    def held_acc():
        return float(np.mean([float(acceptance(student_dec, teacher_dec, *h))
                              for h in held]))

    print(f"acceptance before training: {held_acc():.3f}", flush=True)
    t0 = time.perf_counter()
    for it in range(steps):
        hidden, rows, mask = data[it % len(data)]
        student_dec, opt_state, loss = step_fn(
            student_dec, teacher_dec, opt_state, hidden, rows, mask)
        if (it + 1) % 100 == 0:
            print(f"step {it+1}/{steps} loss {float(loss):.4f} "
                  f"held-acc {held_acc():.3f} "
                  f"({time.perf_counter()-t0:.0f}s)", flush=True)

    acc = held_acc()
    print(f"final held-out teacher-forced acceptance: {acc:.3f}", flush=True)
    from whisper_tpu.training.distill import save_draft

    save_draft(out_path, {"decoder": jax.tree.map(np.asarray, student_dec)},
               s_cfg)
    print(f"saved draft decoder -> {out_path} "
          f"({os.path.getsize(out_path)/1e6:.0f} MB)", flush=True)


if __name__ == "__main__":
    main()
