#!/usr/bin/env python
"""End-to-end WER round-trip on synthetic data (VERDICT r3 item 6).

No real checkpoints or audio exist in this sandbox, so this composes the
training and evaluation subsystems into a closed loop that proves them
against each other: train a micro model FROM SCRATCH on synthetic
(tone-sequence audio, transcript) pairs where each word has a distinct pure
tone, export the trained weights as a GGML checkpoint (io/ggml.write_ggml),
write a held-out flat wav+txt dataset, and run the real `cli eval` WER
harness over it. Success = WER << 100% on held-out audio through the full
production path (GGML load -> mel -> encoder -> decoder -> sliding-window
transcribe -> normalizer -> WER).

Run on CPU:  JAX_PLATFORMS=cpu python scripts/wer_roundtrip.py
"""

import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if not os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from whisper_tpu.utils.synth import SR, make_pair, word_tokens

N_VOCAB = 51864  # English layout (no language tokens in the target)


def main():
    from whisper_tpu.config import WhisperConfig
    from whisper_tpu.io.vocab import make_vocab
    from whisper_tpu.model.load import WhisperModel, random_model
    from whisper_tpu.training.finetune import evaluate, finetune

    cfg = WhisperConfig(
        n_vocab=N_VOCAB, n_audio_ctx=64, n_audio_state=64, n_audio_head=2,
        n_audio_layer=2, n_text_ctx=96, n_text_state=64, n_text_head=2,
        n_text_layer=2, n_mels=80, f16=0)
    model = random_model(cfg, seed=0, on_device=False)
    tokens = word_tokens(N_VOCAB)
    model.vocab = make_vocab(N_VOCAB, tokens, N_VOCAB)

    rng = np.random.default_rng(0)
    train_pairs = [make_pair(rng) for _ in range(96)]
    held_out = [make_pair(rng) for _ in range(16)]

    # sanity: the tokenizer round-trips the transcripts
    for _, text in train_pairs[:4]:
        ids = model.vocab.encode(" " + text)
        assert model.vocab.decode(ids).strip() == text, (text, ids)

    steps = int(os.environ.get("WER_STEPS", "400"))
    before = evaluate(model, model.params, held_out, batch_size=8,
                      language="en")
    state = finetune(model, train_pairs, steps=steps, batch_size=16,
                     lr=1e-3, warmup=20, log_every=50, seed=0)
    after = evaluate(model, state.params, held_out, batch_size=8,
                     language="en")
    print(f"held-out teacher-forced loss: {before:.3f} -> {after:.3f}")

    # in-process quick check before the full CLI round-trip
    import jax.numpy as jnp

    from whisper_tpu.utils.wer import evaluate_dataset

    trained = WhisperModel(
        config=cfg,
        params=jax.tree.map(lambda a: jnp.asarray(a), state.params),
        filters=model.filters, vocab=model.vocab)
    res = evaluate_dataset(
        trained, [(a, t) for a, t in held_out],
        options=None, without_timestamps=True, language="en")
    print("in-process held-out WER:", {k: res[k] for k in
                                       ("wer", "words", "utterances")})

    # ---- the full CLI round-trip: GGML export + wav dataset + cli eval ----
    from whisper_tpu.io.ggml import write_ggml
    from whisper_tpu.io.wav import write_wav
    from whisper_tpu.model.params import params_to_ggml

    tmp = tempfile.mkdtemp(prefix="wer_roundtrip_")
    ggml_path = os.path.join(tmp, "model.bin")
    tensors = params_to_ggml(
        jax.tree.map(np.asarray, state.params), cfg)
    write_ggml(ggml_path, cfg, np.asarray(model.filters), tokens, tensors)
    data_dir = os.path.join(tmp, "data")
    os.makedirs(data_dir)
    for i, (audio, text) in enumerate(held_out):
        write_wav(os.path.join(data_dir, f"utt{i:03d}.wav"), audio, SR)
        with open(os.path.join(data_dir, f"utt{i:03d}.txt"), "w") as f:
            f.write(text)
    cmd = [sys.executable, "-m", "whisper_tpu.cli", "eval", ggml_path,
           data_dir, "--dtype", "float32", "--without-timestamps"]
    print("+", " ".join(cmd))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))))
    print(out.stdout)
    if out.returncode != 0:
        print(out.stderr[-3000:])
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
