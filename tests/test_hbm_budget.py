"""HBM-budget guard: oversized serving configs must raise a typed error
BEFORE any pool allocation or compile (the reference's MEM_REQ sizing intent,
main.rs:119-189), and the estimator must reproduce the measured v5e
fit/crash boundary (BASELINE.md)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fixtures import micro_config, random_tensors, synthetic_tokens
from whisper_tpu.config import (DEFAULT_HBM_BYTES, HBM_UTILIZATION, PRESETS,
                                check_serving_hbm)
from whisper_tpu.errors import HbmBudgetError, WhisperError
from whisper_tpu.io.vocab import make_vocab
from whisper_tpu.model.params import params_from_ggml

V5E_BUDGET = int(DEFAULT_HBM_BYTES * HBM_UTILIZATION)

# The measured fit/crash boundary on the 15.75 GB v5e (BASELINE.md): every
# row is a configuration that was actually run; the guard must pass the
# fits and refuse the crashes. ctx 75 = lockstep seg_ctx (3+64+8);
# ctx 104 = engine pool_ctx (32+64+8).
MEASURED = [
    # (what, kwargs, fits)
    ("lockstep greedy b64", dict(batch=64, ctx=75, kv_dtype_bytes=1), True),
    ("lockstep beam b48", dict(batch=48, beam=5, ctx=75, kv_dtype_bytes=1),
     True),
    ("lockstep beam b56", dict(batch=56, beam=5, ctx=75, kv_dtype_bytes=1),
     False),
    ("engine s64 bucket16", dict(batch=65, ctx=104, kv_dtype_bytes=1,
                                 enc_batch=16, engine=True), True),
    ("engine s48 bucket32", dict(batch=49, ctx=104, kv_dtype_bytes=1,
                                 enc_batch=32, engine=True), True),
    ("beam engine 32 groups", dict(batch=33, beam=5, ctx=104,
                                   kv_dtype_bytes=1, enc_batch=16,
                                   engine=True), True),
    ("beam engine 48 groups", dict(batch=49, beam=5, ctx=104,
                                   kv_dtype_bytes=1, enc_batch=16,
                                   engine=True), False),
]


@pytest.mark.parametrize("what,kwargs,fits",
                         MEASURED, ids=[m[0] for m in MEASURED])
def test_calibration_boundary(what, kwargs, fits):
    cfg = PRESETS["large-v3"]
    if fits:
        est = check_serving_hbm(cfg, budget_bytes=V5E_BUDGET, what=what,
                                **kwargs)
        assert est["total"] <= V5E_BUDGET
    else:
        with pytest.raises(HbmBudgetError) as ei:
            check_serving_hbm(cfg, budget_bytes=V5E_BUDGET, what=what,
                              **kwargs)
        assert ei.value.estimate["total"] > V5E_BUDGET
        assert isinstance(ei.value, WhisperError)  # cli catches the base


def test_bf16_cross_needs_smaller_batch():
    """The docstring example: 48 bf16 groups of large-v3 cross alone bust a
    16 GB chip; int8 pools bring the same batch under budget."""
    cfg = PRESETS["large-v3"]
    bf16 = cfg.serving_hbm_estimate(batch=48, ctx=75, kv_dtype_bytes=2)
    assert bf16["cross"] > 10.9 * 2**30  # the docstring's "11.8 GB" is 10^9
    with pytest.raises(HbmBudgetError):
        check_serving_hbm(cfg, 48, ctx=75, kv_dtype_bytes=2,
                          budget_bytes=V5E_BUDGET)
    check_serving_hbm(cfg, 48, ctx=75, kv_dtype_bytes=1,
                      budget_bytes=V5E_BUDGET)


class _Model:
    def __init__(self, cfg, params, vocab, filters):
        self.config = cfg
        self.params = params
        self.vocab = vocab
        self.filters = filters


@pytest.fixture(scope="module")
def model():
    cfg = micro_config(n_vocab=51864)
    tensors = random_tensors(cfg, seed=3)
    params = jax.tree.map(jnp.asarray, params_from_ggml(tensors, cfg))
    vocab = make_vocab(cfg.n_vocab, synthetic_tokens(cfg.n_vocab), cfg.n_vocab)
    filters = jnp.asarray(
        np.random.default_rng(0).random((cfg.n_mels, 201), np.float32) * 0.02)
    return _Model(cfg, params, vocab, filters)


def test_slot_engine_refuses_oversized(model, monkeypatch):
    """SlotEngine/BeamSlotEngine construction must raise pre-compile when
    the pool estimate exceeds the chip budget (wired via
    SlotEngine._check_hbm_budget)."""
    from whisper_tpu.decoding.task import DecodingOptions
    from whisper_tpu.parallel.beam_engine import BeamSlotEngine
    from whisper_tpu.parallel.engine import SlotEngine

    monkeypatch.setenv("WHISPER_TPU_HBM_BYTES", str(64 * 1024))  # 64 KiB chip
    with pytest.raises(HbmBudgetError):
        SlotEngine(model, n_slots=2, chunk_steps=2)
    with pytest.raises(HbmBudgetError):
        BeamSlotEngine(model, n_slots=2, chunk_steps=2,
                       options=DecodingOptions(beam_size=2))
    monkeypatch.delenv("WHISPER_TPU_HBM_BYTES")
    SlotEngine(model, n_slots=2, chunk_steps=2)  # fits: no raise


def test_run_benchmark_refuses_oversized():
    """The lockstep bench path refuses the measured crash config (beam b56)
    with a typed error instead of hanging the worker."""
    from whisper_tpu.utils.benchmark import run_benchmark

    with pytest.raises(HbmBudgetError):
        run_benchmark(model_name="large-v3", batch=56, beam_size=5,
                      seconds=1, aot_path=None)
