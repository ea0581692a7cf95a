"""Encoder/decoder numerics vs transformers Whisper (fp32 torch oracle).

SURVEY.md §7 steps 3-4: layer-wise parity at fp32 on random weights.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax

from whisper_tpu.model.decoder import decode_step, init_cache
from whisper_tpu.model.encoder import encode
from whisper_tpu.model.params import params_from_ggml

from fixtures import hf_model_from_tensors, random_tensors, tiny_config


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config(n_vocab=1000)  # small vocab: decoder logit test is cheap
    tensors = random_tensors(cfg, seed=3)
    params = jax.tree.map(jnp.asarray, params_from_ggml(tensors, cfg))
    hf = hf_model_from_tensors(cfg, tensors)
    return cfg, tensors, params, hf


def _hf_encode(hf, mel):
    import torch

    with torch.no_grad():
        return hf.model.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()


def test_encoder_parity(setup):
    cfg, tensors, params, hf = setup
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, cfg.n_mels, 2 * cfg.n_audio_ctx)).astype(np.float32)
    out = encode(params, jnp.asarray(mel), cfg)
    ref = _hf_encode(hf, mel)
    assert out.hidden.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out.hidden), ref, atol=2e-4)


def test_cross_kv_scaling(setup):
    """cross_k must equal (x @ k_w.T) * d^-0.25 per layer (main.rs:1992-1996)."""
    cfg, tensors, params, hf = setup
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((1, cfg.n_mels, 2 * cfg.n_audio_ctx)).astype(np.float32)
    out = encode(params, jnp.asarray(mel), cfg)
    hid = np.asarray(out.hidden)[0]
    kw = tensors["decoder.blocks.1.cross_attn.key.weight"]
    expect = (hid @ kw.T) * (cfg.d_head_text ** -0.25)
    got = np.asarray(out.cross_k)[1, 0]  # kv-major (H, D, Ta)
    got = np.moveaxis(got, -1, 0).reshape(cfg.n_audio_ctx, cfg.n_text_state)
    np.testing.assert_allclose(got, expect, atol=2e-4)


def test_decoder_parity_full_context(setup):
    """Prefill T tokens at once vs HF decoder forward."""
    import torch

    cfg, tensors, params, hf = setup
    rng = np.random.default_rng(2)
    B, T = 2, 7
    mel = rng.standard_normal((B, cfg.n_mels, 2 * cfg.n_audio_ctx)).astype(np.float32)
    tokens = rng.integers(0, cfg.n_vocab, size=(B, T)).astype(np.int32)

    out = encode(params, jnp.asarray(mel), cfg)
    cache = init_cache(cfg, B)
    logits, cache = decode_step(
        params, jnp.asarray(tokens), jnp.int32(0), cache, out.cross_k, out.cross_v, cfg
    )

    with torch.no_grad():
        enc = hf.model.encoder(torch.from_numpy(mel)).last_hidden_state
        ref = hf(decoder_input_ids=torch.from_numpy(tokens.astype(np.int64)),
                 encoder_outputs=(enc,)).logits.numpy()
    np.testing.assert_allclose(np.asarray(logits), ref, atol=3e-4)


def test_decoder_incremental_matches_prefill(setup):
    """Token-at-a-time with KV cache == one-shot prefill (cache correctness)."""
    cfg, tensors, params, hf = setup
    rng = np.random.default_rng(4)
    B, T = 2, 6
    mel = rng.standard_normal((B, cfg.n_mels, 2 * cfg.n_audio_ctx)).astype(np.float32)
    tokens = rng.integers(0, cfg.n_vocab, size=(B, T)).astype(np.int32)
    out = encode(params, jnp.asarray(mel), cfg)

    cache = init_cache(cfg, B)
    full_logits, _ = decode_step(
        params, jnp.asarray(tokens), jnp.int32(0), cache, out.cross_k, out.cross_v, cfg
    )

    cache = init_cache(cfg, B)
    step_logits = []
    for t in range(T):
        lg, cache = decode_step(
            params, jnp.asarray(tokens[:, t : t + 1]), jnp.int32(t), cache,
            out.cross_k, out.cross_v, cfg,
        )
        step_logits.append(np.asarray(lg)[:, 0])
    step_logits = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(step_logits, np.asarray(full_logits), atol=2e-4)


def test_decoder_padded_prefill(setup):
    """Right-padded prefill: logits at valid positions match, and the cache is
    not corrupted for subsequent steps."""
    cfg, tensors, params, hf = setup
    rng = np.random.default_rng(5)
    B, T, PAD = 1, 5, 9
    mel = rng.standard_normal((B, cfg.n_mels, 2 * cfg.n_audio_ctx)).astype(np.float32)
    tokens = rng.integers(0, cfg.n_vocab, size=(B, T)).astype(np.int32)
    padded = np.zeros((B, PAD), np.int32)
    padded[:, :T] = tokens
    out = encode(params, jnp.asarray(mel), cfg)

    cache = init_cache(cfg, B)
    lg_ref, cache_ref = decode_step(
        params, jnp.asarray(tokens), jnp.int32(0), cache, out.cross_k, out.cross_v, cfg
    )
    cache = init_cache(cfg, B)
    lg_pad, cache_pad = decode_step(
        params, jnp.asarray(padded), jnp.int32(0), cache, out.cross_k, out.cross_v, cfg
    )
    np.testing.assert_allclose(
        np.asarray(lg_pad)[:, :T], np.asarray(lg_ref), atol=2e-4
    )
    # Continue from n_past=T on both caches: next-token logits must agree.
    nxt = rng.integers(0, cfg.n_vocab, size=(B, 1)).astype(np.int32)
    lg1, _ = decode_step(params, jnp.asarray(nxt), jnp.int32(T), cache_ref,
                         out.cross_k, out.cross_v, cfg)
    lg2, _ = decode_step(params, jnp.asarray(nxt), jnp.int32(T), cache_pad,
                         out.cross_k, out.cross_v, cfg)
    np.testing.assert_allclose(np.asarray(lg2), np.asarray(lg1), atol=2e-4)


def test_decode_step_fused_permute_rows_matches_take():
    """decode_step(permute_rows=rows) == jnp.take the cache rows first, then
    decode (the fused beam-reorder path; kept as a CPU/test route and a
    documented negative result for TPU — see device_beam.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fixtures import micro_config
    from whisper_tpu.model.decoder import KVCache, decode_step, init_cache
    from whisper_tpu.model.encoder import encode
    from whisper_tpu.model.load import random_model

    cfg = micro_config()
    model = random_model(cfg, seed=11, on_device=False)
    B = 6
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((B, cfg.n_mels, 2 * cfg.n_audio_ctx)),
                      jnp.float32)
    enc = encode(model.params, mel, cfg)
    cache = init_cache(cfg, B, ctx=12)
    # prefill two positions to give the permute real history to move
    toks = jnp.asarray(rng.integers(0, 1000, (B, 2)), jnp.int32)
    _, cache = decode_step(model.params, toks, jnp.int32(0), cache,
                           enc.cross_k, enc.cross_v, cfg)
    rows = jnp.asarray(np.array([3, 3, 0, 5, 1, 1], np.int32))
    nxt = jnp.asarray(rng.integers(0, 1000, (B, 1)), jnp.int32)

    lg_f, cache_f = decode_step(model.params, nxt, jnp.int32(2), cache,
                                enc.cross_k, enc.cross_v, cfg,
                                permute_rows=rows)
    taken = KVCache(jnp.take(cache.k, rows, axis=0),
                    jnp.take(cache.v, rows, axis=0))
    lg_r, cache_r = decode_step(model.params, nxt, jnp.int32(2), taken,
                                enc.cross_k, enc.cross_v, cfg)
    np.testing.assert_allclose(np.asarray(lg_f), np.asarray(lg_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cache_f.k), np.asarray(cache_r.k),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cache_f.v), np.asarray(cache_r.v),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("quant", [False, True])
@pytest.mark.parametrize("permute", [False, True])
def test_decode_step_defer_append_matches_direct(quant, permute):
    """decode_step(defer_append=True) — logit-space patching of the current
    token plus ONE post-scan scatter — must match the direct per-layer
    append path: identical logits (up to f32 sum-ordering of one softmax
    term) and an identical cache image at every valid column. Ragged rows
    (different n_past per row) and the fused permute_rows combination are
    exactly the serving-engine chunk configuration."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fixtures import micro_config
    from whisper_tpu.model.decoder import KVCache, decode_step, init_cache
    from whisper_tpu.model.encoder import encode
    from whisper_tpu.model.load import random_model
    from whisper_tpu.model.quant import init_quant_cache, quantize_decoder_weights

    cfg = micro_config()
    model = random_model(cfg, seed=7, on_device=False)
    params = jax.jit(quantize_decoder_weights)(model.params) if quant else model.params
    B, CTX = 5, 12
    rng = np.random.default_rng(3)
    mel = jnp.asarray(rng.standard_normal((B, cfg.n_mels, 2 * cfg.n_audio_ctx)),
                      jnp.float32)
    enc = encode(params, mel, cfg)

    if quant:
        cache = KVCache(*init_quant_cache(cfg, B, ctx=CTX))
    else:
        cache = init_cache(cfg, B, ctx=CTX)
    # ragged history: prefill 3 tokens everywhere, then pretend rows sit at
    # different depths (rows beyond a row's n_past are zeros, never read)
    toks = jnp.asarray(rng.integers(0, 1000, (B, 3)), jnp.int32)
    _, cache = decode_step(params, toks, jnp.int32(0), cache,
                           enc.cross_k, enc.cross_v, cfg)
    n_past = jnp.asarray(np.array([3, 1, 2, 3, 0], np.int32))
    nxt = jnp.asarray(rng.integers(0, 1000, (B, 1)), jnp.int32)
    rows = jnp.asarray(np.array([2, 2, 0, 4, 3], np.int32)) if permute else None

    lg_d, cache_d = decode_step(params, nxt, n_past, cache,
                                enc.cross_k, enc.cross_v, cfg,
                                permute_rows=rows, defer_append=True)
    lg_r, cache_r = decode_step(params, nxt, n_past, cache,
                                enc.cross_k, enc.cross_v, cfg,
                                permute_rows=rows)
    np.testing.assert_allclose(np.asarray(lg_d), np.asarray(lg_r),
                               rtol=1e-4, atol=1e-4)

    # cache parity at VALID columns only (col <= row's n_past after append)
    valid = (np.arange(CTX)[None, :] <= np.asarray(n_past)[:, None])
    def check(a, b, exact):
        a, b = np.asarray(a), np.asarray(b)
        m = valid.reshape(B, 1, 1, 1, CTX)
        a = np.where(m, a.astype(np.float32), 0)
        b = np.where(m, b.astype(np.float32), 0)
        if exact:
            np.testing.assert_array_equal(a, b)
        else:
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    if quant:
        check(cache_d.k.data, cache_r.k.data, exact=True)
        check(cache_d.v.data, cache_r.v.data, exact=True)
        mv = valid.reshape(B, 1, 1, CTX)
        np.testing.assert_array_equal(
            np.where(mv, np.asarray(cache_d.k.scale), 0),
            np.where(mv, np.asarray(cache_r.k.scale), 0))
    else:
        check(cache_d.k, cache_r.k, exact=False)
        check(cache_d.v, cache_r.v, exact=False)


@pytest.mark.parametrize("quant", [False, True])
def test_decode_step_chunk_matches_direct(quant):
    """Chunked-COW beam step (decode_step_chunk: read-only pool + tail +
    one-hot prefix indirection) must match the direct path (decode_step on
    an explicitly permuted cache) step for step, and the chunk-boundary
    materialization (pool permute + tail flush, as the beam engine does it)
    must reproduce the direct cache at every valid column."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fixtures import micro_config
    from whisper_tpu.model.decoder import (KVCache, decode_step,
                                           decode_step_chunk, init_cache,
                                           init_tail)
    from whisper_tpu.model.encoder import encode
    from whisper_tpu.model.load import random_model
    from whisper_tpu.model.quant import init_quant_cache, quantize_decoder_weights

    cfg = micro_config()
    model = random_model(cfg, seed=11, on_device=False)
    params = jax.jit(quantize_decoder_weights)(model.params) if quant else model.params
    S, k = 3, 2
    B, CP, CT = S * k, 12, 4
    rng = np.random.default_rng(5)
    mel = jnp.asarray(rng.standard_normal((B, cfg.n_mels, 2 * cfg.n_audio_ctx)),
                      jnp.float32)
    enc = encode(params, mel, cfg)

    # pool with 3 prefilled positions per row
    if quant:
        pool = KVCache(*init_quant_cache(cfg, B, ctx=CP))
    else:
        pool = init_cache(cfg, B, ctx=CP)
    toks = jnp.asarray(rng.integers(0, 1000, (B, 3)), jnp.int32)
    _, pool = decode_step(params, toks, jnp.int32(0), pool,
                          enc.cross_k, enc.cross_v, cfg)
    n_past0 = jnp.asarray([3, 3, 2, 2, 3, 3], jnp.int32)  # per-group ragged

    tail = init_tail(cfg, B, CT, quant, dtype=jnp.float32)
    prefix_src = jnp.arange(B, dtype=jnp.int32)
    cache_d = pool  # direct-path cache mirrors pool exactly at start

    # two chunk steps with in-group forks; direct path permutes explicitly
    copy_srcs = [jnp.asarray([0, 0, 3, 3, 4, 5], jnp.int32),
                 jnp.asarray([0, 1, 2, 3, 5, 5], jnp.int32)]
    for t, csrc in enumerate(copy_srcs):
        nxt = jnp.asarray(rng.integers(0, 1000, (B, 1)), jnp.int32)
        tl = jnp.full((B,), t, jnp.int32)
        prefix_src = jnp.take(prefix_src, csrc)
        tail = KVCache(
            jax.tree.map(lambda a: jnp.take(a, csrc, axis=0), tail.k),
            jax.tree.map(lambda a: jnp.take(a, csrc, axis=0), tail.v))
        lg_c, tail = decode_step_chunk(
            params, nxt, n_past0, tl, pool, tail, prefix_src,
            enc.cross_k, enc.cross_v, cfg, k)

        cache_d = KVCache(
            jax.tree.map(lambda a: jnp.take(a, csrc, axis=0), cache_d.k),
            jax.tree.map(lambda a: jnp.take(a, csrc, axis=0), cache_d.v))
        lg_d, cache_d = decode_step(params, nxt, n_past0 + t, cache_d,
                                    enc.cross_k, enc.cross_v, cfg)
        np.testing.assert_allclose(np.asarray(lg_c), np.asarray(lg_d),
                                   rtol=2e-4, atol=2e-4)

    # boundary materialization == direct cache at valid columns
    rows = jnp.arange(B)
    tlf = jnp.full((B,), len(copy_srcs), jnp.int32)
    t_idx = jnp.arange(CT)
    valid_f = t_idx[None, :] < tlf[:, None]
    r2 = jnp.where(valid_f, rows[:, None], B - 1)
    cols = jnp.where(valid_f, n_past0[:, None] + t_idx[None, :], t_idx[None, :])

    def flush_data(buf, tbuf):
        return buf.at[r2, :, :, :, cols].set(jnp.moveaxis(tbuf, -1, 1))

    def flush_scale(buf, tbuf):
        return buf.at[r2, :, :, cols].set(jnp.moveaxis(tbuf, -1, 1))

    pk = jax.tree.map(lambda a: jnp.take(a, prefix_src, axis=0), pool.k)
    pv = jax.tree.map(lambda a: jnp.take(a, prefix_src, axis=0), pool.v)
    from whisper_tpu.model.quant import QuantKV
    if quant:
        pk = QuantKV(flush_data(pk.data, tail.k.data),
                     flush_scale(pk.scale, tail.k.scale))
        pv = QuantKV(flush_data(pv.data, tail.v.data),
                     flush_scale(pv.scale, tail.v.scale))
    else:
        pk = flush_data(pk, tail.k)
        pv = flush_data(pv, tail.v)

    # valid columns: < n_past0 + steps taken, per row (trash row B-1 took
    # garbage flushes — exclude it like the engine's trash group)
    vcols = (np.arange(CP)[None, :] <
             (np.asarray(n_past0) + 2)[:, None])
    vcols[B - 1] = False

    def check(a, b, rank5):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        m = vcols.reshape(B, 1, 1, 1, CP) if rank5 else vcols.reshape(B, 1, 1, CP)
        np.testing.assert_allclose(np.where(m, a, 0), np.where(m, b, 0),
                                   rtol=1e-4, atol=5e-4)

    if quant:
        check(pk.data.astype(jnp.float32) * pk.scale[:, :, :, None, :],
              cache_d.k.data.astype(jnp.float32) * cache_d.k.scale[:, :, :, None, :],
              rank5=True)
        check(pv.data.astype(jnp.float32) * pv.scale[:, :, :, None, :],
              cache_d.v.data.astype(jnp.float32) * cache_d.v.scale[:, :, :, None, :],
              rank5=True)
    else:
        check(pk, cache_d.k, rank5=True)
        check(pv, cache_d.v, rank5=True)
