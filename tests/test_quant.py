"""int8 KV quantization: numerics and end-to-end decode quality."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_tpu.decoding.task import DecodingOptions, decode_full
from whisper_tpu.io.vocab import make_vocab
from whisper_tpu.model.encoder import encode
from whisper_tpu.model.params import params_from_ggml
from whisper_tpu.model.quant import pv_out, qk_logits, quantize_cross, quantize_kv

from fixtures import micro_config, random_tensors, synthetic_tokens


def test_quantize_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4, 64, 96)).astype(np.float32))
    q = quantize_kv(x)
    assert q.data.dtype == jnp.int8
    deq = q.data.astype(jnp.float32) * q.scale[..., None, :]
    rel = np.abs(np.asarray(deq) - np.asarray(x)).max() / np.abs(np.asarray(x)).max()
    assert rel < 0.01  # 127-level per-position quantization


def test_attention_products_match():
    rng = np.random.default_rng(1)
    B, H, T, D, C = 1, 2, 3, 64, 128
    q = jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, D, C)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, D, C)).astype(np.float32))
    kq, vq = quantize_kv(k), quantize_kv(v)
    ref_logits = np.einsum("bhtd,bhdc->bhtc", np.asarray(q), np.asarray(k))
    got = np.asarray(qk_logits(q, kq))
    assert np.abs(got - ref_logits).max() < 0.05 * np.abs(ref_logits).max() + 0.05
    probs = jax.nn.softmax(jnp.asarray(ref_logits), axis=-1)
    ref_out = np.einsum("bhtc,bhdc->bhtd", np.asarray(probs), np.asarray(v))
    got_out = np.asarray(pv_out(probs, vq, jnp.float32))
    assert np.abs(got_out - ref_out).max() < 0.05


def test_weight_quantization_numerics():
    from whisper_tpu.model.quant import quantize_weight

    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.standard_normal((3, 128, 96)).astype(np.float32) * 0.05)
    w8, s = quantize_weight(w)
    assert w8.dtype == jnp.int8 and s.shape == (3, 128)
    deq = w8.astype(jnp.float32) * s[..., None]
    rel = np.abs(np.asarray(deq - w)).max() / np.abs(np.asarray(w)).max()
    assert rel < 0.01
    x = jnp.asarray(rng.standard_normal((5, 96)).astype(np.float32))
    ref = np.asarray(x) @ np.asarray(w[0]).T
    got = (np.asarray(x) @ np.asarray(w8[0]).T.astype(np.float32)) * np.asarray(s[0])
    assert np.abs(got - ref).max() < 0.02 * np.abs(ref).max() + 1e-3


def test_greedy_decode_with_int8_weights():
    from whisper_tpu.model.quant import quantize_decoder_weights

    cfg = micro_config(n_vocab=51864)
    tensors = random_tensors(cfg, seed=19)
    params = jax.tree.map(jnp.asarray, params_from_ggml(tensors, cfg))
    vocab = make_vocab(cfg.n_vocab, synthetic_tokens(cfg.n_vocab), cfg.n_vocab)
    rng = np.random.default_rng(4)
    mel = rng.standard_normal((1, cfg.n_mels, 2 * cfg.n_audio_ctx)).astype(np.float32)
    enc = encode(params, jnp.asarray(mel), cfg)
    opts = DecodingOptions(sample_len=16, without_timestamps=True)
    ref = decode_full(params, cfg, vocab, enc.cross_k, enc.cross_v, opts,
                      use_device_loop=True)[0]
    qparams = quantize_decoder_weights(params)
    got = decode_full(qparams, cfg, vocab, enc.cross_k, enc.cross_v, opts,
                      use_device_loop=True)[0]
    min_len = min(len(ref.tokens), len(got.tokens))
    agree = sum(a == b for a, b in zip(ref.tokens, got.tokens)) / max(min_len, 1)
    assert agree > 0.6, (ref.tokens, got.tokens)
    assert np.isfinite(got.avg_logprob)


def test_int8_self_cache_decode():
    """decode with the quantized self-attention cache stays close to bf16."""
    from whisper_tpu.decoding.device_loop import build_masks, decode_segment_device
    from whisper_tpu.model.decoder import KVCache, init_cache
    from whisper_tpu.model.quant import init_quant_cache

    cfg = micro_config(n_vocab=51864)
    tensors = random_tensors(cfg, seed=23)
    params = jax.tree.map(jnp.asarray, params_from_ggml(tensors, cfg))
    vocab = make_vocab(cfg.n_vocab, synthetic_tokens(cfg.n_vocab), cfg.n_vocab)
    rng = np.random.default_rng(6)
    mel = rng.standard_normal((1, cfg.n_mels, 2 * cfg.n_audio_ctx)).astype(np.float32)
    enc = encode(params, jnp.asarray(mel), cfg)
    sup, blank = build_masks(vocab)
    init = jnp.asarray([[vocab.token_sot]], dtype=jnp.int32)

    def run(cache):
        toks, lengths, _, _ = decode_segment_device(
            params, init, 1, 0, cache, enc.cross_k, enc.cross_v, sup, blank,
            cfg, sample_len=16, use_timestamps=True,
        )
        return np.asarray(toks)[0, : int(np.asarray(lengths)[0])].tolist()

    ref = run(init_cache(cfg, 1))
    got = run(KVCache(*init_quant_cache(cfg, 1)))
    min_len = max(min(len(ref), len(got)), 1)
    agree = sum(a == b for a, b in zip(ref, got)) / min_len
    assert agree > 0.6, (ref, got)


def test_greedy_decode_with_int8_cross():
    cfg = micro_config(n_vocab=51864)
    tensors = random_tensors(cfg, seed=17)
    params = jax.tree.map(jnp.asarray, params_from_ggml(tensors, cfg))
    vocab = make_vocab(cfg.n_vocab, synthetic_tokens(cfg.n_vocab), cfg.n_vocab)
    rng = np.random.default_rng(2)
    mel = rng.standard_normal((1, cfg.n_mels, 2 * cfg.n_audio_ctx)).astype(np.float32)
    enc = encode(params, jnp.asarray(mel), cfg)
    opts = DecodingOptions(sample_len=16, without_timestamps=True)
    ref = decode_full(params, cfg, vocab, enc.cross_k, enc.cross_v, opts,
                      use_device_loop=True)[0]
    qk, qv = quantize_cross(enc.cross_k, enc.cross_v)
    got = decode_full(params, cfg, vocab, qk, qv, opts, use_device_loop=True)[0]
    # int8 perturbs logits slightly; sequences must still be overwhelmingly
    # similar on this random model (usually identical).
    min_len = min(len(ref.tokens), len(got.tokens))
    agree = sum(a == b for a, b in zip(ref.tokens, got.tokens)) / max(min_len, 1)
    assert agree > 0.7, (ref.tokens, got.tokens)
    assert np.isfinite(got.avg_logprob)


def test_beam_decode_int8_agreement():
    """On-device beam with int8 weights + int8 self-cache + int8 cross vs
    the f32 beam: token agreement on worst-case random weights (the serving
    bench's exact configuration, utils/benchmark.py beam path)."""
    from whisper_tpu.decoding.device_beam import beam_decode_device
    from whisper_tpu.decoding.device_loop import build_masks
    from whisper_tpu.model.decoder import KVCache, init_cache
    from whisper_tpu.model.quant import init_quant_cache, quantize_decoder_weights

    cfg = micro_config(n_vocab=51864)
    tensors = random_tensors(cfg, seed=29)
    params = jax.tree.map(jnp.asarray, params_from_ggml(tensors, cfg))
    vocab = make_vocab(cfg.n_vocab, synthetic_tokens(cfg.n_vocab), cfg.n_vocab)
    rng = np.random.default_rng(8)
    G, k, SL = 2, 3, 12
    mel = rng.standard_normal((G, cfg.n_mels, 2 * cfg.n_audio_ctx)).astype(np.float32)
    sup, blank = build_masks(vocab)
    init = jnp.asarray(np.tile([[vocab.token_sot]], (G * k, 1)), jnp.int32)
    seg = 1 + SL + 8

    def best_seqs(params_, enc, cache):
        out = beam_decode_device(
            params_, init, 1, 0, cache, enc.cross_k, enc.cross_v,
            sup, blank, cfg, beam_size=k, sample_len=SL)
        act_toks, act_lp = np.asarray(out[0]), np.asarray(out[1])
        seqs = []
        for g in range(G):
            b = int(np.argmax(act_lp[g]))
            seqs.append(act_toks[g, b].tolist())
        return seqs

    enc = encode(params, jnp.asarray(mel), cfg)
    ref = best_seqs(params, enc, init_cache(cfg, G * k, ctx=seg))

    qparams = quantize_decoder_weights(params)
    qenc = encode(params, jnp.asarray(mel), cfg, quantize_kv=True)
    qcache = KVCache(*init_quant_cache(cfg, G * k, ctx=seg, pad_ctx=True))
    got = best_seqs(qparams, qenc, qcache)

    for r, g in zip(ref, got):
        agree = sum(a == b for a, b in zip(r, g)) / max(len(r), 1)
        assert agree > 0.6, (r, g)


def test_engine_int8_agreement():
    """SlotEngine serving mode (int8 pools + int8 decoder weights) agrees
    with the bf16 engine on worst-case random weights."""
    from whisper_tpu.model.load import load_model
    from whisper_tpu.parallel.engine import SlotEngine
    from fixtures import write_synthetic_ggml
    import tempfile, os

    cfg = micro_config(n_vocab=51864)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "m.bin")
        write_synthetic_ggml(path, cfg, seed=31)
        model = load_model(path, use_native=False)
    rng = np.random.default_rng(11)
    audios = [
        (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
        for _ in range(3)
    ]
    opts = DecodingOptions(sample_len=12)

    def run(quantize, enc_int8=False):
        import copy

        m = copy.copy(model)
        if enc_int8:
            from whisper_tpu.model.quant import quantize_encoder_weights

            m.params = quantize_encoder_weights(model.params)
        eng = SlotEngine(m, n_slots=2, options=opts, chunk_steps=4,
                         quantize=quantize)
        return [r.tokens for r in eng.transcribe_many(audios)]

    ref = run(False)
    got = run(True)
    # full serving stack: W8A8 admission encodes on top (cli --enc-int8 /
    # BENCH_MODE=engine default)
    got_enc = run(True, enc_int8=True)
    for r, g, ge in zip(ref, got, got_enc):
        n = max(min(len(r), len(g)), 1)
        agree = sum(a == b for a, b in zip(r, g)) / n
        assert agree > 0.6, (r, g)
        ne = max(min(len(r), len(ge)), 1)
        agree_e = sum(a == b for a, b in zip(r, ge)) / ne
        assert agree_e > 0.6, (r, ge)


def test_encode_applies_decoder_weight_scales():
    """Serving flow quantizes decoder weights BEFORE encoding; the cross
    K/V projections must apply the per-channel scales (regression: plain
    linear() on int8 weights silently dropped them -> garbage memory)."""
    from whisper_tpu.model.quant import quantize_decoder_weights

    cfg = micro_config(n_vocab=51864)
    params = jax.tree.map(jnp.asarray,
                          params_from_ggml(random_tensors(cfg, seed=37), cfg))
    rng = np.random.default_rng(2)
    mel = rng.standard_normal((1, cfg.n_mels, 2 * cfg.n_audio_ctx)).astype(np.float32)
    ref = encode(params, jnp.asarray(mel), cfg)
    qparams = quantize_decoder_weights(params)
    got = encode(qparams, jnp.asarray(mel), cfg)
    for r, g in ((ref.cross_k, got.cross_k), (ref.cross_v, got.cross_v)):
        r, g = np.asarray(r, np.float32), np.asarray(g, np.float32)
        denom = np.abs(r).max()
        assert np.abs(r - g).max() < 0.02 * denom, np.abs(r - g).max() / denom


def test_w8a8_encoder_parity_and_end_to_end():
    """W8A8 encoder (int8 weights + dynamic per-token int8 activations):
    hidden states stay close to bf16, and the FULL serving quant stack
    (W8A8 encoder + int8 decoder weights + int8 cross/KV) keeps greedy
    token agreement on worst-case random weights."""
    from whisper_tpu.decoding.device_loop import build_masks, decode_segment_device
    from whisper_tpu.model.decoder import KVCache
    from whisper_tpu.model.quant import (
        init_quant_cache, quantize_decoder_weights, quantize_encoder_weights)

    cfg = micro_config(n_vocab=51864)
    params = jax.tree.map(jnp.asarray,
                          params_from_ggml(random_tensors(cfg, seed=41), cfg))
    vocab = make_vocab(cfg.n_vocab, synthetic_tokens(cfg.n_vocab), cfg.n_vocab)
    rng = np.random.default_rng(3)
    mel = jnp.asarray(
        rng.standard_normal((1, cfg.n_mels, 2 * cfg.n_audio_ctx)).astype(np.float32))

    ref_enc = encode(params, mel, cfg)
    qe = quantize_encoder_weights(params)
    got_enc = encode(qe, mel, cfg)
    r = np.asarray(ref_enc.hidden, np.float32)
    g = np.asarray(got_enc.hidden, np.float32)
    rel = np.abs(r - g).max() / max(np.abs(r).max(), 1e-6)
    assert rel < 0.1, rel  # quantization noise, not wreckage

    # end-to-end: full serving quant stack vs full-precision
    sup, blank = build_masks(vocab)
    init = jnp.asarray([[vocab.token_sot]], jnp.int32)

    def run(params_, enc, cache):
        toks, lengths, _, _ = decode_segment_device(
            params_, init, 1, 0, cache, enc.cross_k, enc.cross_v, sup, blank,
            cfg, sample_len=16, use_timestamps=True)
        return np.asarray(toks)[0, : int(np.asarray(lengths)[0])].tolist()

    from whisper_tpu.model.decoder import init_cache
    ref_toks = run(params, ref_enc, init_cache(cfg, 1, ctx=25))
    qfull = quantize_decoder_weights(quantize_encoder_weights(params))
    q_enc = encode(qfull, mel, cfg, quantize_kv=True)
    got_toks = run(qfull, q_enc, KVCache(*init_quant_cache(cfg, 1, ctx=25)))
    n = max(min(len(ref_toks), len(got_toks)), 1)
    agree = sum(a == b for a, b in zip(ref_toks, got_toks)) / n
    assert agree > 0.6, (ref_toks, got_toks)


def test_fused_quant_kernels_match_xla_chains():
    """kernels/fused_quant.{act,ln,gelu}_quant (Pallas, interpret on CPU)
    match the unfused XLA chains they replace: same per-token scale and int8
    codes up to one quantization level (reduction-order float drift in
    mean/var/amax can flip a code by +-1)."""
    from whisper_tpu.kernels.fused_quant import act_quant, gelu_quant, ln_quant
    from whisper_tpu.kernels.ops import gelu, layer_norm
    from whisper_tpu.model.quant import quantize_act

    rng = np.random.default_rng(7)
    # odd row count exercises the row padding path
    x = jnp.asarray(rng.standard_normal((3, 37, 256)).astype(np.float32) * 2.0
                    ).astype(jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal(256).astype(np.float32)).astype(jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal(256).astype(np.float32)).astype(jnp.bfloat16)

    def check(got, ref, name):
        g8, gs = got
        r8, rs = ref
        assert g8.dtype == jnp.int8 and gs.shape == r8.shape[:-1] + (1,)
        np.testing.assert_allclose(np.asarray(gs), np.asarray(rs),
                                   rtol=2e-2, err_msg=name)
        diff = np.abs(np.asarray(g8, np.int32) - np.asarray(r8, np.int32))
        assert diff.max() <= 2, (name, diff.max())
        assert (diff > 0).mean() < 0.05, (name, (diff > 0).mean())

    check(act_quant(x), quantize_act(x), "act")
    check(ln_quant(x, w, b), quantize_act(layer_norm(x, w, b)), "ln")
    for impl in ("erf", "tanh"):
        check(gelu_quant(x, impl), quantize_act(gelu(x, impl)), f"gelu-{impl}")


def test_beam_decode_w8a8_full_stack_agreement():
    """Beam search under the FULL serving quant stack (W8A8 encoder + int8
    decoder weights + int8 cross/KV) vs the full-precision beam: token
    agreement on worst-case random weights — gates the BENCH_BEAM +
    BENCH_ENC=int8 bench composition (utils/benchmark.py)."""
    from whisper_tpu.decoding.device_beam import beam_decode_device
    from whisper_tpu.decoding.device_loop import build_masks
    from whisper_tpu.model.decoder import KVCache, init_cache
    from whisper_tpu.model.quant import (
        init_quant_cache, quantize_decoder_weights, quantize_encoder_weights)

    cfg = micro_config(n_vocab=51864)
    params = jax.tree.map(jnp.asarray,
                          params_from_ggml(random_tensors(cfg, seed=53), cfg))
    vocab = make_vocab(cfg.n_vocab, synthetic_tokens(cfg.n_vocab), cfg.n_vocab)
    rng = np.random.default_rng(11)
    G, k, SL = 2, 3, 12
    mel = rng.standard_normal((G, cfg.n_mels, 2 * cfg.n_audio_ctx)).astype(np.float32)
    sup, blank = build_masks(vocab)
    init = jnp.asarray(np.tile([[vocab.token_sot]], (G * k, 1)), jnp.int32)
    seg = 1 + SL + 8

    def best_seqs(params_, enc, cache):
        out = beam_decode_device(
            params_, init, 1, 0, cache, enc.cross_k, enc.cross_v,
            sup, blank, cfg, beam_size=k, sample_len=SL)
        act_toks, act_lp = np.asarray(out[0]), np.asarray(out[1])
        return [act_toks[g, int(np.argmax(act_lp[g]))].tolist()
                for g in range(G)]

    enc = encode(params, jnp.asarray(mel), cfg)
    ref = best_seqs(params, enc, init_cache(cfg, G * k, ctx=seg))

    qfull = quantize_decoder_weights(quantize_encoder_weights(params))
    qenc = encode(qfull, jnp.asarray(mel), cfg, quantize_kv=True)
    qcache = KVCache(*init_quant_cache(cfg, G * k, ctx=seg))
    got = best_seqs(qfull, qenc, qcache)

    for r, g in zip(ref, got):
        agree = sum(a == b for a, b in zip(r, g)) / max(len(r), 1)
        assert agree > 0.6, (r, g)


def test_fuse_decoder_qkv_bit_identical():
    """fuse_decoder_qkv merges Q/K/V into one matmul with bit-identical
    logits and cache on both float and int8-quantized trees (the serving
    engines fuse unconditionally when unsharded)."""
    from whisper_tpu.model.decoder import decode_step, init_cache
    from whisper_tpu.model.quant import (fuse_decoder_qkv,
                                         quantize_decoder_weights)

    cfg = micro_config()
    params = jax.tree.map(jnp.asarray,
                          params_from_ggml(random_tensors(cfg, seed=3), cfg))
    rng = np.random.default_rng(0)
    B, T, C = 3, 4, 16
    toks = jnp.asarray(rng.integers(0, cfg.n_vocab, (B, T)), jnp.int32)
    cache = init_cache(cfg, B, ctx=C)
    shape = (cfg.n_text_layer, B, cfg.n_text_head, cfg.d_head_text, 8)
    ck = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    cv = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    for tree in (params, quantize_decoder_weights(params)):
        fused = fuse_decoder_qkv(tree)
        blocks = fused["decoder"]["blocks"]
        assert "qkv_w" in blocks and "q_w" not in blocks
        lg0, c0 = decode_step(tree, toks, jnp.int32(0), cache, ck, cv, cfg)
        lg1, c1 = decode_step(fused, toks, jnp.int32(0), cache, ck, cv, cfg)
        np.testing.assert_array_equal(np.asarray(lg0), np.asarray(lg1))
        np.testing.assert_array_equal(np.asarray(c0.k), np.asarray(c1.k))
        np.testing.assert_array_equal(np.asarray(c0.v), np.asarray(c1.v))
