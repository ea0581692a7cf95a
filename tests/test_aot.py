"""AOT export/reload of serving programs (utils/aot.py)."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fixtures import micro_config, random_tensors, synthetic_tokens
from whisper_tpu.decoding.device_loop import build_masks, decode_segment_device
from whisper_tpu.io.vocab import make_vocab
from whisper_tpu.model.decoder import init_cache
from whisper_tpu.model.encoder import encode
from whisper_tpu.model.params import params_from_ggml
from whisper_tpu.utils import aot


def test_export_roundtrip_token_identity(tmp_path):
    cfg = micro_config(n_vocab=51864)
    params = jax.tree.map(
        jnp.asarray, params_from_ggml(random_tensors(cfg, seed=31), cfg))
    vocab = make_vocab(cfg.n_vocab, synthetic_tokens(cfg.n_vocab), cfg.n_vocab)
    mel = np.random.default_rng(5).standard_normal(
        (2, cfg.n_mels, 2 * cfg.n_audio_ctx)).astype(np.float32)
    enc = encode(params, jnp.asarray(mel), cfg)
    sup, blank = build_masks(vocab)
    it = jnp.asarray(np.tile(np.array([vocab.token_sot], np.int32), (2, 1)))
    cache = init_cache(cfg, 2, ctx=1 + 12 + 4)
    fn = functools.partial(decode_segment_device, cfg=cfg, sample_len=12)
    args = (params, it, 1, 0, cache, enc.cross_k, enc.cross_v, sup, blank)

    path = str(tmp_path / "decode.jaxexport")
    aot.save(path, fn, *args)
    reloaded = aot.load(path)

    ref = fn(*args)
    got = reloaded(*args)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))


def test_export_decode_segment_helper(tmp_path):
    """The artifact's calling convention matches what serving produces:
    bf16 cache/cross by default (an f32-pinned artifact would force
    upcasting multi-GB cross arrays — jax.export rejects dtype mismatch)."""
    cfg = micro_config(n_vocab=51864)
    params = jax.tree.map(
        jnp.asarray, params_from_ggml(random_tensors(cfg, seed=8), cfg))
    vocab = make_vocab(cfg.n_vocab, synthetic_tokens(cfg.n_vocab), cfg.n_vocab)
    data = aot.export_decode_segment(params, cfg, vocab, batch=2,
                                     sample_len=8, prefill=32)
    assert len(data) > 1000
    fn = aot.load_fn(data)
    # drive it with the dtypes the serving encoder actually emits
    sup, blank = build_masks(vocab)
    tokens = jnp.zeros((2, 32), jnp.int32).at[:, 0].set(vocab.token_sot)
    cache = init_cache(cfg, 2, dtype=jnp.bfloat16, ctx=32 + 8 + 8)
    L, H, D = cfg.n_text_layer, cfg.n_text_head, cfg.d_head_text
    cross = jnp.zeros((L, 2, H, D, cfg.n_audio_ctx), jnp.bfloat16)
    toks, lengths, _, _ = fn(params, tokens, 1, 0, cache, cross, cross,
                             sup, blank)
    assert np.asarray(toks).shape[0] == 2


def test_artifact_meta_roundtrip(tmp_path):
    """save(meta=...) embeds the flag tuple; load/load_meta recover it;
    raw legacy payloads read back with meta None (the stale-artifact guard
    in run_benchmark relies on this contract)."""
    cfg = micro_config(n_vocab=51864)
    params = jax.tree.map(
        jnp.asarray, params_from_ggml(random_tensors(cfg, seed=9), cfg))
    vocab = make_vocab(cfg.n_vocab, synthetic_tokens(cfg.n_vocab), cfg.n_vocab)
    data = aot.export_decode_segment(params, cfg, vocab, batch=1,
                                     sample_len=4, prefill=8)
    meta = {"kind": "decode_segment", "batch": 1, "sample_len": 4}
    p = tmp_path / "a.aot"
    aot.write_artifact(str(p), data, meta)
    assert aot.load_meta(str(p)) == meta
    assert callable(aot.load(str(p)))
    # legacy raw payload: no magic header
    p2 = tmp_path / "b.aot"
    p2.write_bytes(data)
    assert aot.load_meta(str(p2)) is None
    assert callable(aot.load(str(p2)))


def test_cli_export_roundtrip(tmp_path):
    """`cli export` writes a deserializable jax.export artifact."""
    import sys

    from fixtures import tiny_config, write_synthetic_ggml
    from whisper_tpu import cli
    from whisper_tpu.utils import aot

    ckpt = tmp_path / "m.bin"
    write_synthetic_ggml(str(ckpt), tiny_config(), seed=3)
    out = tmp_path / "decode.aot"
    rc = cli.main(["export", str(ckpt), str(out),
                   "--batch", "2", "--prefill", "8", "--sample-len", "8"])
    assert rc == 0 and out.exists() and out.stat().st_size > 0
    fn = aot.load(str(out))
    assert callable(fn)


def test_export_serving_step_roundtrip(tmp_path):
    """The full serving step (mel->encode->decode) exports, reloads, and
    reproduces the jitted path's tokens exactly — the bench's BENCH_AOT
    cold-start artifact (utils/benchmark.run_benchmark aot_path)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from fixtures import micro_config, random_tensors, synthetic_tokens
    from whisper_tpu.io.vocab import make_vocab
    from whisper_tpu.model.params import params_from_ggml
    from whisper_tpu.utils import aot
    from whisper_tpu.utils.benchmark import make_serving_step

    class _M:
        pass

    m = _M()
    m.config = micro_config(n_vocab=51864)
    m.params = jax.tree.map(
        jnp.asarray, params_from_ggml(random_tensors(m.config, seed=7), m.config))
    m.vocab = make_vocab(m.config.n_vocab, synthetic_tokens(m.config.n_vocab),
                         m.config.n_vocab)
    m.filters = jnp.asarray(
        np.random.default_rng(0).random((m.config.n_mels, 201), np.float32) * 0.02)

    audio = jnp.asarray(
        np.random.default_rng(1).standard_normal(16000 * 30).astype(np.float32) * 0.1)
    step = make_serving_step(m, batch=2, decode_tokens=8, kv_dtype="bfloat16",
                             use_flash=False)
    ref_toks, ref_len = jax.jit(step)(m.params, audio)

    path = tmp_path / "step.bin"
    data = aot.export_serving_step(m, batch=2, decode_tokens=8,
                                   kv_dtype="bfloat16", use_flash=False)
    path.write_bytes(data)
    loaded = aot.load(str(path))
    got_toks, got_len = loaded(m.params, audio)
    np.testing.assert_array_equal(np.asarray(got_toks), np.asarray(ref_toks))
    np.testing.assert_array_equal(np.asarray(got_len), np.asarray(ref_len))
