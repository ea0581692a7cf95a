"""Pallas kernel tests (interpreter mode on the CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_tpu.kernels.flash_attention import flash_attention
from whisper_tpu.kernels.ops import sdpa


@pytest.mark.parametrize("tq,tk,causal", [(256, 256, False), (1500, 1500, False),
                                          (448, 448, True), (100, 300, False)])
def test_flash_attention_matches_sdpa(tq, tk, causal):
    rng = np.random.default_rng(0)
    B, H, D = 1, 2, 64
    q = jnp.asarray(rng.standard_normal((B, H, tq, D)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, tk, D)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, tk, D)), dtype=jnp.float32)
    out = flash_attention(q, k, v, causal=causal, interpret=True)
    if causal:
        cm = jnp.tril(jnp.ones((tq, tk), dtype=bool))
        ref = sdpa(q, k, v, mask=cm)
    else:
        ref = sdpa(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_flash_attention_qk_int8_close_to_exact():
    """The qk_int8 score path (a MEASURED-NEGATIVE serving experiment kept
    as a tested kernel option — see flash_attention._attn_kernel) must stay
    numerically sane: per-row int8 quantization of Q/K bounds score noise
    at ~1% of each row's amax, so outputs track the exact kernel within a
    loose tolerance."""
    rng = np.random.default_rng(1)
    B, H, T, D = 1, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((B, H, T, D)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, T, D)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, T, D)), dtype=jnp.float32)
    out = flash_attention(q, k, v, qk_int8=True, interpret=True)
    ref = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-2)


def test_flash_in_encoder_matches_xla():
    from whisper_tpu.model.encoder import encode
    from whisper_tpu.model.params import params_from_ggml
    from fixtures import micro_config, random_tensors

    cfg = micro_config()
    tensors = random_tensors(cfg, seed=2)
    params = jax.tree.map(jnp.asarray, params_from_ggml(tensors, cfg))
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, cfg.n_mels, 2 * cfg.n_audio_ctx)),
        dtype=jnp.float32,
    )
    ref = encode(params, mel, cfg, use_flash=False)
    out = encode(params, mel, cfg, use_flash=True)
    np.testing.assert_allclose(
        np.asarray(out.hidden), np.asarray(ref.hidden), atol=5e-4
    )


def test_cross_attention_int8_kernel_matches_xla():
    """Pallas int8 cross-attention (interpret mode) vs the XLA reference path
    (quant.qk_logits/pv_out) — same math, on-chip temporaries only."""
    import numpy as np
    import jax.numpy as jnp

    from whisper_tpu.kernels.cross_attention_int8 import cross_attention_int8
    from whisper_tpu.model.quant import QuantKV, _quantize_one, qk_logits, pv_out

    rng = np.random.default_rng(3)
    B, H, T, D, C = 2, 3, 1, 64, 300
    q = jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, D, C)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, D, C)).astype(np.float32))
    kq, vq = _quantize_one(k), _quantize_one(v)

    logits = qk_logits(q, kq)
    probs = jax.nn.softmax(logits, axis=-1)
    ref = pv_out(probs, vq, jnp.float32)

    out = cross_attention_int8(q, kq.data, kq.scale, vq.data, vq.scale,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-2)


def test_cross_attention_int8_kernel_multi_query():
    """T>1 (prefill / beam fold) with non-128-multiple C padding."""
    import numpy as np
    import jax.numpy as jnp

    from whisper_tpu.kernels.cross_attention_int8 import cross_attention_int8
    from whisper_tpu.model.quant import _quantize_one, qk_logits, pv_out

    rng = np.random.default_rng(4)
    B, H, T, D, C = 1, 2, 20, 64, 130
    q = jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, D, C)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, D, C)).astype(np.float32))
    kq, vq = _quantize_one(k), _quantize_one(v)
    ref = pv_out(jax.nn.softmax(qk_logits(q, kq), axis=-1), vq, jnp.float32)
    out = cross_attention_int8(q, kq.data, kq.scale, vq.data, vq.scale,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-2)


def test_ggml_lut_gelu_parity():
    """SURVEY hard part (b): measure ggml's fp16 LUT GELU (a 65536-entry
    table of tanh-approx GELU, inputs and outputs rounded to fp16 — the
    galois_gelu contract, main.rs:1775-1779) against our analytic tanh GELU
    (gelu_impl='tanh'). The LUT's only error source is fp16 rounding, so the
    bound is the fp16 ulp at each magnitude."""
    import numpy as np
    import jax.numpy as jnp

    from whisper_tpu.kernels.ops import gelu

    # build the LUT exactly as ggml does: for every fp16 bit pattern,
    # gelu_f32(tanh approx) of the fp16 value, stored as fp16
    bits = np.arange(65536, dtype=np.uint16)
    xs = bits.view(np.float16).astype(np.float32)
    finite = np.isfinite(xs) & (np.abs(xs) < 20)
    x = xs[finite]
    lut = (
        0.5 * x * (1.0 + np.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x**3)))
    ).astype(np.float16)

    # our tanh-mode GELU at f32 on the same (fp16-representable) inputs
    ours = np.asarray(gelu(jnp.asarray(x, jnp.float32), "tanh"))

    err = np.abs(ours - lut.astype(np.float32))
    # Measured bounds: max ABSOLUTE error 1.01e-3 at x=2.79 — exactly half
    # the fp16 ulp there, i.e. the LUT's own output rounding. (In the
    # 1+tanh cancellation tail, XLA's few-ulp tanh error inflates RELATIVE
    # error on ~1e-2-magnitude outputs to ~0.3%, still absolutely tiny.)
    assert err.max() < 2e-3, float(err.max())
    big = np.abs(lut.astype(np.float32)) > 0.05
    rel = err[big] / np.abs(lut.astype(np.float32))[big]
    assert rel.max() < 1.2e-3, float(rel.max())


def test_flash_sdpa_gradients_match_xla():
    """flash_sdpa (Pallas forward + custom exact backward) must match XLA
    autodiff of plain attention, causal and non-causal — this is the
    training-path contract for the kernel."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from whisper_tpu.kernels.flash_attention import flash_sdpa
    from whisper_tpu.kernels.ops import sdpa

    rng = np.random.default_rng(11)
    B, H, T, D = 2, 2, 24, 64
    q = jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32))
    causal_mask = jnp.tril(jnp.ones((T, T), dtype=bool))

    for causal in (False, True):
        def loss_flash(q, k, v):
            return (flash_sdpa(q, k, v, causal) ** 2).sum()

        def loss_ref(q, k, v):
            mask = causal_mask if causal else None
            return (sdpa(q, k, v, mask=mask) ** 2).sum()

        val_f, grads_f = jax.value_and_grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        val_r, grads_r = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        np.testing.assert_allclose(float(val_f), float(val_r), rtol=1e-4)
        for gf, gr in zip(grads_f, grads_r):
            np.testing.assert_allclose(
                np.asarray(gf), np.asarray(gr), atol=2e-4, rtol=1e-3)


def test_beam_gather_permute_rows_matches_take():
    """Pallas layout-preserving row permute == jnp.take(axis=0) on the
    batch-leading (B, L, ...) cache, for the int8 cache, the f32 scales,
    and bf16 buffers."""
    import numpy as np
    import jax.numpy as jnp

    from whisper_tpu.kernels.beam_gather import permute_rows

    rng = np.random.default_rng(5)
    rows = jnp.asarray(rng.permutation(10).astype(np.int32))
    for shape, dtype in (
        ((10, 4, 6, 64, 75), jnp.int8),
        ((10, 4, 6, 75), jnp.float32),
        ((10, 2, 6, 64, 80), jnp.bfloat16),
    ):
        x = jnp.asarray(
            rng.integers(-100, 100, shape).astype(np.float32), dtype=dtype)
        got = permute_rows(x, rows, interpret=True)
        ref = jnp.take(x, rows, axis=0)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    # duplicate rows (beam forks) must also work
    dup = jnp.asarray(np.array([0, 0, 3, 3, 9, 1, 1, 2, 2, 5], np.int32))
    x = jnp.asarray(rng.integers(-100, 100, (10, 4, 6, 64, 75)), dtype=jnp.int8)
    got = permute_rows(x, dup, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(jnp.take(x, dup, axis=0)))

def test_beam_gather_permute_rows_multi_fused():
    """One fused pallas_call permutes every cache leaf (mixed dtypes/ranks)
    identically to per-leaf jnp.take, including duplicate rows and the
    QuantKV pytree entry point used by the beam loop."""
    import numpy as np
    import jax.numpy as jnp

    from whisper_tpu.kernels.beam_gather import (
        permute_cache_rows, permute_rows_multi)
    from whisper_tpu.model.quant import QuantKV

    rng = np.random.default_rng(7)
    rows = jnp.asarray(np.array([3, 3, 0, 7, 7, 1, 4, 2], np.int32))
    kd = jnp.asarray(rng.integers(-127, 127, (8, 4, 6, 64, 75)), dtype=jnp.int8)
    ks = jnp.asarray(rng.random((8, 4, 6, 75)).astype(np.float32))
    vd = jnp.asarray(rng.integers(-127, 127, (8, 4, 6, 64, 75)), dtype=jnp.int8)
    vs = jnp.asarray(rng.random((8, 4, 6, 75)).astype(np.float32))

    outs = permute_rows_multi([kd, ks, vd, vs], rows, interpret=True)
    for got, src in zip(outs, (kd, ks, vd, vs)):
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(jnp.take(src, rows, axis=0)))

    got_k, got_v = permute_cache_rows(
        (QuantKV(kd, ks), QuantKV(vd, vs)), rows)
    np.testing.assert_array_equal(
        np.asarray(got_k.data), np.asarray(jnp.take(kd, rows, axis=0)))
    np.testing.assert_array_equal(
        np.asarray(got_v.scale), np.asarray(jnp.take(vs, rows, axis=0)))

    # bf16 (parity-mode) plain-array cache pytree
    kb = jnp.asarray(rng.standard_normal((8, 2, 6, 64, 80)), dtype=jnp.bfloat16)
    vb = jnp.asarray(rng.standard_normal((8, 2, 6, 64, 80)), dtype=jnp.bfloat16)
    gk, gv = permute_cache_rows((kb, vb), rows)
    np.testing.assert_array_equal(np.asarray(gk), np.asarray(jnp.take(kb, rows, axis=0)))
    np.testing.assert_array_equal(np.asarray(gv), np.asarray(jnp.take(vb, rows, axis=0)))


def test_lane_dot_permute_matches_take():
    """The production beam fork-copy (one-hot dot on the transposed,
    layout-matching view) is EXACT vs jnp.take(axis=0) for every cache leaf
    kind: int8 codes (int32 accumulation), f32 scales, bf16 parity-mode
    buffers — including non-bijective src (beam forks) and identity."""
    import numpy as np
    import jax.numpy as jnp

    from whisper_tpu.kernels.beam_gather import lane_dot_permute
    from whisper_tpu.model.quant import QuantKV

    rng = np.random.default_rng(11)
    for src in (
        jnp.asarray(rng.permutation(10).astype(np.int32)),            # bijection
        jnp.asarray(np.array([0, 0, 3, 3, 9, 1, 1, 2, 2, 5], np.int32)),  # forks
        jnp.arange(10, dtype=jnp.int32),                               # identity
    ):
        kd = jnp.asarray(rng.integers(-127, 128, (10, 4, 6, 64, 75)), dtype=jnp.int8)
        ks = jnp.asarray(rng.random((10, 4, 6, 75)).astype(np.float32))
        vd = jnp.asarray(rng.integers(-127, 128, (10, 4, 6, 64, 75)), dtype=jnp.int8)
        vs = jnp.asarray(rng.random((10, 4, 6, 75)).astype(np.float32))
        gk, gv = lane_dot_permute((QuantKV(kd, ks), QuantKV(vd, vs)), src)
        for got, ref in ((gk.data, kd), (gk.scale, ks),
                         (gv.data, vd), (gv.scale, vs)):
            np.testing.assert_array_equal(
                np.asarray(got), np.asarray(jnp.take(ref, src, axis=0)))

        kb = jnp.asarray(rng.standard_normal((10, 2, 6, 64, 80)), dtype=jnp.bfloat16)
        (gb,) = lane_dot_permute((kb,), src)
        np.testing.assert_array_equal(
            np.asarray(gb), np.asarray(jnp.take(kb, src, axis=0)))
