"""GGML loader round-trip and validation tests (SURVEY.md §7 step 1)."""

import numpy as np
import pytest

from whisper_tpu.config import WhisperConfig
from whisper_tpu.errors import BadMagicError, UnknownTensorError
from whisper_tpu.io.ggml import load_ggml, tensor_schema, write_ggml
from whisper_tpu.model.params import params_from_ggml, params_to_ggml

from fixtures import random_tensors, synthetic_tokens, tiny_config, write_synthetic_ggml


def test_roundtrip_f32(tmp_path):
    cfg = tiny_config()
    path = tmp_path / "model.bin"
    tensors, filters, tokens = write_synthetic_ggml(path, cfg)
    ckpt = load_ggml(str(path), verbose=False)
    assert ckpt.config == cfg
    assert ckpt.config.model_type == "unknown"  # 2 audio layers isn't a family
    np.testing.assert_array_equal(ckpt.filters, filters)
    assert ckpt.vocab.id_to_token[0] == tokens[0]
    assert len(ckpt.tensors) == len(tensor_schema(cfg))
    for name, arr in tensors.items():
        np.testing.assert_array_equal(ckpt.tensors[name], arr)


def test_roundtrip_f16(tmp_path):
    import dataclasses

    cfg = dataclasses.replace(tiny_config(), f16=1)
    path = tmp_path / "model_f16.bin"
    tensors = random_tensors(cfg)
    from whisper_tpu.frontend.mel import mel_filter_bank

    write_ggml(str(path), cfg, mel_filter_bank(80), synthetic_tokens(cfg.n_vocab), tensors)
    ckpt = load_ggml(str(path), verbose=False)
    # weights stored f16; biases/ln/pe stay f32
    assert ckpt.tensors["encoder.blocks.0.attn.query.weight"].dtype == np.float16
    assert ckpt.tensors["encoder.blocks.0.attn.query.bias"].dtype == np.float32
    assert ckpt.tensors["encoder.positional_embedding"].dtype == np.float32
    np.testing.assert_allclose(
        ckpt.tensors["encoder.blocks.0.attn.query.weight"].astype(np.float32),
        tensors["encoder.blocks.0.attn.query.weight"],
        atol=1e-3,
    )


def test_bad_magic(tmp_path):
    p = tmp_path / "bad.bin"
    p.write_bytes(b"\x00" * 64)
    with pytest.raises(BadMagicError):
        load_ggml(str(p), verbose=False)


def test_unknown_tensor(tmp_path):
    import struct

    cfg = tiny_config()
    path = tmp_path / "model.bin"
    write_synthetic_ggml(path, cfg)
    # Append a bogus record.
    with open(path, "ab") as f:
        name = b"encoder.not_a_tensor"
        f.write(struct.pack("<3i", 1, len(name), 0))
        f.write(struct.pack("<1i", 4))
        f.write(name)
        f.write(np.zeros(4, np.float32).tobytes())
    with pytest.raises(UnknownTensorError):
        load_ggml(str(path), verbose=False)


def test_params_pytree_roundtrip(tmp_path):
    cfg = tiny_config()
    tensors = random_tensors(cfg)
    params = params_from_ggml(tensors, cfg)
    assert params["encoder"]["blocks"]["q_w"].shape == (
        cfg.n_audio_layer, cfg.n_audio_state, cfg.n_audio_state)
    assert params["decoder"]["blocks"]["cross_k_w"].shape == (
        cfg.n_text_layer, cfg.n_text_state, cfg.n_text_state)
    assert params["encoder"]["conv1_b"].shape == (cfg.n_audio_state,)
    back = params_to_ggml(params, cfg)
    for name, arr in tensors.items():
        got = back[name]
        if name.endswith("conv1.bias") or name.endswith("conv2.bias"):
            arr = arr.reshape(got.shape)
        np.testing.assert_array_equal(got, arr)


def test_unsupported_ftype(tmp_path):
    """ggml quantized tensor types (ftype 2+) are a later container
    generation: they must raise a clear error, not misparse as f16."""
    import struct

    from whisper_tpu.errors import UnsupportedFtypeError

    cfg = tiny_config()
    path = tmp_path / "model.bin"
    write_synthetic_ggml(path, cfg)
    with open(path, "ab") as f:
        name = b"decoder.token_embedding.weight"
        f.write(struct.pack("<3i", 1, len(name), 2))  # ftype 2 = q4_0
        f.write(struct.pack("<1i", 4))
        f.write(name)
        f.write(np.zeros(4, np.float32).tobytes())
    with pytest.raises(UnsupportedFtypeError):
        load_ggml(str(path), verbose=False)


def test_truncated_header_and_vocab_raise_typed_errors(tmp_path):
    """Truncation anywhere in the prelude raises the module's typed
    TruncatedFileError, not a raw struct.error/ValueError."""
    from whisper_tpu.errors import TruncatedFileError

    cfg = tiny_config()
    full = tmp_path / "full.bin"
    write_synthetic_ggml(full, cfg)
    data = full.read_bytes()
    # cut points: inside hparams (20), inside filters (60), mid-vocab
    # (header + filters + a bit)
    filt_end = 4 + 44 + 8 + 4 * cfg.n_mels * 201
    for cut in (2, 20, 60, filt_end + 37):
        p = tmp_path / f"cut{cut}.bin"
        p.write_bytes(data[:cut])
        with pytest.raises(TruncatedFileError):
            load_ggml(str(p), verbose=False)
