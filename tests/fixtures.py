"""Shared test fixtures: synthetic GGML checkpoints + HF torch twin models.

No real Whisper checkpoints or audio exist in this sandbox (zero egress), so
parity is established against:
  * round-trips through our own GGML writer (format contract), and
  * a random-weight ``transformers`` Whisper model built from the SAME
    numpy weights (numerics contract, fp32 CPU torch as oracle).
"""

from __future__ import annotations

import numpy as np

from whisper_tpu.config import WhisperConfig
from whisper_tpu.frontend.mel import mel_filter_bank
from whisper_tpu.io.ggml import tensor_schema, write_ggml


def tiny_config(n_vocab: int = 51864, n_mels: int = 80) -> WhisperConfig:
    """Small-but-real config: enough heads/layers to exercise everything."""
    return WhisperConfig(
        n_vocab=n_vocab,
        n_audio_ctx=1500,
        n_audio_state=64,
        n_audio_head=2,
        n_audio_layer=2,
        n_text_ctx=448,
        n_text_state=64,
        n_text_head=2,
        n_text_layer=2,
        n_mels=n_mels,
        f16=0,
    )


def micro_config(n_vocab: int = 51864) -> WhisperConfig:
    """Short audio ctx for fast decoder tests."""
    return WhisperConfig(
        n_vocab=n_vocab, n_audio_ctx=64, n_audio_state=64, n_audio_head=2,
        n_audio_layer=2, n_text_ctx=96, n_text_state=64, n_text_head=2,
        n_text_layer=2, n_mels=80, f16=0,
    )


def random_tensors(config: WhisperConfig, seed: int = 0, scale: float = 0.08):
    rng = np.random.default_rng(seed)
    tensors = {}
    for name, (shape, _kind) in tensor_schema(config).items():
        if "ln" in name and name.endswith("weight"):
            arr = 1.0 + 0.1 * rng.standard_normal(shape).astype(np.float32)
        else:
            arr = rng.standard_normal(shape).astype(np.float32) * scale
        tensors[name] = arr
    return tensors


def synthetic_tokens(n_vocab: int):
    """Byte-distinct token strings; include a space token for blank suppression."""
    toks = [f"<t{i}>".encode() for i in range(n_vocab)]
    toks[220] = b" "  # GPT-2 space token id
    return toks


def write_synthetic_ggml(path, config: WhisperConfig, seed: int = 0):
    tensors = random_tensors(config, seed)
    filters = mel_filter_bank(config.n_mels)
    tokens = synthetic_tokens(min(config.n_vocab, 51864))
    write_ggml(str(path), config, filters, tokens, tensors)
    return tensors, filters, tokens


def hf_model_from_tensors(config: WhisperConfig, tensors):
    """Build a transformers WhisperModel carrying exactly these weights (fp32)."""
    import torch
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    hf_cfg = HFConfig(
        vocab_size=config.n_vocab,
        num_mel_bins=config.n_mels,
        d_model=config.n_audio_state,
        encoder_layers=config.n_audio_layer,
        encoder_attention_heads=config.n_audio_head,
        decoder_layers=config.n_text_layer,
        decoder_attention_heads=config.n_text_head,
        encoder_ffn_dim=4 * config.n_audio_state,
        decoder_ffn_dim=4 * config.n_text_state,
        max_source_positions=config.n_audio_ctx,
        max_target_positions=config.n_text_ctx,
        activation_function="gelu",
        pad_token_id=0,
        bos_token_id=0,
        eos_token_id=min(config.n_vocab - 1, 50256),
        decoder_start_token_id=min(config.n_vocab - 1, 50257),
    )
    model = WhisperForConditionalGeneration(hf_cfg)
    sd = {}
    t = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in tensors.items()}
    sd["model.encoder.conv1.weight"] = t["encoder.conv1.weight"]
    sd["model.encoder.conv1.bias"] = t["encoder.conv1.bias"].reshape(-1)
    sd["model.encoder.conv2.weight"] = t["encoder.conv2.weight"]
    sd["model.encoder.conv2.bias"] = t["encoder.conv2.bias"].reshape(-1)
    sd["model.encoder.embed_positions.weight"] = t["encoder.positional_embedding"]
    sd["model.encoder.layer_norm.weight"] = t["encoder.ln_post.weight"]
    sd["model.encoder.layer_norm.bias"] = t["encoder.ln_post.bias"]
    for i in range(config.n_audio_layer):
        src = f"encoder.blocks.{i}."
        dst = f"model.encoder.layers.{i}."
        sd[dst + "self_attn.q_proj.weight"] = t[src + "attn.query.weight"]
        sd[dst + "self_attn.q_proj.bias"] = t[src + "attn.query.bias"]
        sd[dst + "self_attn.k_proj.weight"] = t[src + "attn.key.weight"]
        sd[dst + "self_attn.v_proj.weight"] = t[src + "attn.value.weight"]
        sd[dst + "self_attn.v_proj.bias"] = t[src + "attn.value.bias"]
        sd[dst + "self_attn.out_proj.weight"] = t[src + "attn.out.weight"]
        sd[dst + "self_attn.out_proj.bias"] = t[src + "attn.out.bias"]
        sd[dst + "self_attn_layer_norm.weight"] = t[src + "attn_ln.weight"]
        sd[dst + "self_attn_layer_norm.bias"] = t[src + "attn_ln.bias"]
        sd[dst + "fc1.weight"] = t[src + "mlp.0.weight"]
        sd[dst + "fc1.bias"] = t[src + "mlp.0.bias"]
        sd[dst + "fc2.weight"] = t[src + "mlp.2.weight"]
        sd[dst + "fc2.bias"] = t[src + "mlp.2.bias"]
        sd[dst + "final_layer_norm.weight"] = t[src + "mlp_ln.weight"]
        sd[dst + "final_layer_norm.bias"] = t[src + "mlp_ln.bias"]
    sd["model.decoder.embed_tokens.weight"] = t["decoder.token_embedding.weight"]
    sd["model.decoder.embed_positions.weight"] = t["decoder.positional_embedding"]
    sd["model.decoder.layer_norm.weight"] = t["decoder.ln.weight"]
    sd["model.decoder.layer_norm.bias"] = t["decoder.ln.bias"]
    for i in range(config.n_text_layer):
        src = f"decoder.blocks.{i}."
        dst = f"model.decoder.layers.{i}."
        sd[dst + "self_attn.q_proj.weight"] = t[src + "attn.query.weight"]
        sd[dst + "self_attn.q_proj.bias"] = t[src + "attn.query.bias"]
        sd[dst + "self_attn.k_proj.weight"] = t[src + "attn.key.weight"]
        sd[dst + "self_attn.v_proj.weight"] = t[src + "attn.value.weight"]
        sd[dst + "self_attn.v_proj.bias"] = t[src + "attn.value.bias"]
        sd[dst + "self_attn.out_proj.weight"] = t[src + "attn.out.weight"]
        sd[dst + "self_attn.out_proj.bias"] = t[src + "attn.out.bias"]
        sd[dst + "self_attn_layer_norm.weight"] = t[src + "attn_ln.weight"]
        sd[dst + "self_attn_layer_norm.bias"] = t[src + "attn_ln.bias"]
        sd[dst + "encoder_attn.q_proj.weight"] = t[src + "cross_attn.query.weight"]
        sd[dst + "encoder_attn.q_proj.bias"] = t[src + "cross_attn.query.bias"]
        sd[dst + "encoder_attn.k_proj.weight"] = t[src + "cross_attn.key.weight"]
        sd[dst + "encoder_attn.v_proj.weight"] = t[src + "cross_attn.value.weight"]
        sd[dst + "encoder_attn.v_proj.bias"] = t[src + "cross_attn.value.bias"]
        sd[dst + "encoder_attn.out_proj.weight"] = t[src + "cross_attn.out.weight"]
        sd[dst + "encoder_attn.out_proj.bias"] = t[src + "cross_attn.out.bias"]
        sd[dst + "encoder_attn_layer_norm.weight"] = t[src + "cross_attn_ln.weight"]
        sd[dst + "encoder_attn_layer_norm.bias"] = t[src + "cross_attn_ln.bias"]
        sd[dst + "fc1.weight"] = t[src + "mlp.0.weight"]
        sd[dst + "fc1.bias"] = t[src + "mlp.0.bias"]
        sd[dst + "fc2.weight"] = t[src + "mlp.2.weight"]
        sd[dst + "fc2.bias"] = t[src + "mlp.2.bias"]
        sd[dst + "final_layer_norm.weight"] = t[src + "mlp_ln.weight"]
        sd[dst + "final_layer_norm.bias"] = t[src + "mlp_ln.bias"]
    sd["proj_out.weight"] = t["decoder.token_embedding.weight"]
    missing, unexpected = model.load_state_dict(sd, strict=False)
    # embed_positions buffers etc. may be reported; nothing load-bearing may be missing
    real_missing = [m for m in missing if "proj_out" not in m]
    assert not real_missing, f"missing HF weights: {real_missing}"
    model.eval()
    return model


def synthetic_audio(n_samples: int, seed: int = 1) -> np.ndarray:
    """Deterministic band-limited pseudo-speech: sum of drifting harmonics."""
    rng = np.random.default_rng(seed)
    t = np.arange(n_samples) / 16000.0
    audio = np.zeros(n_samples, dtype=np.float64)
    for f0 in (110.0, 220.0, 330.0, 550.0, 1200.0):
        phase = rng.uniform(0, 2 * np.pi)
        drift = 1.0 + 0.02 * np.sin(2 * np.pi * 0.5 * t + phase)
        audio += rng.uniform(0.05, 0.3) * np.sin(2 * np.pi * f0 * drift * t + phase)
    envelope = 0.5 * (1 + np.sin(2 * np.pi * 2.3 * t))
    audio = (audio * envelope * 0.3).astype(np.float32)
    return audio
