"""Multi-chip tests on the virtual 8-device CPU mesh (SURVEY §4 item 4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from whisper_tpu.model.encoder import encode
from whisper_tpu.model.params import params_from_ggml
from whisper_tpu.parallel.mesh import make_mesh
from whisper_tpu.parallel.sharding import batch_pspec, param_pspecs, shard_params
from whisper_tpu.training.train import (
    init_train_state,
    loss_fn,
    make_optimizer,
    make_train_step,
)

from fixtures import micro_config, random_tensors


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) == 8, "tests require the 8-device virtual CPU mesh"
    cfg = micro_config(n_vocab=51864)
    # heads divisible by tp=4
    import dataclasses

    cfg = dataclasses.replace(cfg, n_audio_head=4, n_text_head=4)
    tensors = random_tensors(cfg, seed=5)
    params = jax.tree.map(jnp.asarray, params_from_ggml(tensors, cfg))
    return cfg, params


def test_mesh_shapes():
    mesh = make_mesh(8)
    assert dict(mesh.shape) == {"dp": 2, "tp": 4}
    mesh = make_mesh(8, tp=2)
    assert dict(mesh.shape) == {"dp": 4, "tp": 2}
    mesh = make_mesh(1)
    assert dict(mesh.shape) == {"dp": 1, "tp": 1}


def test_shard_params_layout(setup):
    cfg, params = setup
    mesh = make_mesh(8)
    sharded = shard_params(params, mesh)
    qw = sharded["encoder"]["blocks"]["q_w"]
    # (L, out, in) with out sharded over tp=4
    assert qw.sharding.spec == P(None, "tp", None)
    te = sharded["decoder"]["te"]
    assert te.sharding.spec == P("tp", None)


def test_tp_encode_matches_single_device(setup):
    """Tensor-parallel encoder == single-device encoder (collectives correct)."""
    cfg, params = setup
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((4, cfg.n_mels, 2 * cfg.n_audio_ctx)).astype(np.float32)

    ref = np.asarray(encode(params, jnp.asarray(mel), cfg).hidden)

    mesh = make_mesh(8)
    sharded = shard_params(params, mesh)
    mel_sharded = jax.device_put(jnp.asarray(mel), NamedSharding(mesh, batch_pspec()))
    out = np.asarray(encode(sharded, mel_sharded, cfg).hidden)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_sharded_train_step(setup):
    cfg, params = setup
    mesh = make_mesh(8)
    sharded = shard_params(params, mesh)
    optimizer = make_optimizer()
    state = init_train_state(sharded, optimizer)
    step = make_train_step(cfg, optimizer)
    rng = np.random.default_rng(0)
    B, T = 4, 24
    mel = jax.device_put(
        rng.standard_normal((B, cfg.n_mels, 2 * cfg.n_audio_ctx)).astype(np.float32),
        NamedSharding(mesh, batch_pspec()),
    )
    tokens = jax.device_put(
        rng.integers(0, cfg.n_vocab, (B, T)).astype(np.int32),
        NamedSharding(mesh, batch_pspec()),
    )
    mask = jax.device_put(np.ones((B, T), np.int32), NamedSharding(mesh, batch_pspec()))
    state2, loss = step(state, mel, tokens, mask)
    assert np.isfinite(float(loss))
    assert int(state2.step) == 1
    # loss decreased after an update on the same batch (sanity, big lr step)
    loss2 = loss_fn(state2.params, mel, tokens, mask, cfg)
    assert float(loss2) < float(loss)


def test_graft_entry_dryrun():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out[1].shape[-1] == 51864


def test_tp_decode_matches_single_device(setup):
    """Device greedy decode under a (dp, tp) mesh — with the KV/cross layout
    constraints active in decode_step — is token-identical to unsharded."""
    import dataclasses

    from whisper_tpu.decoding.device_loop import build_masks, decode_segment_device
    from whisper_tpu.io.vocab import make_vocab
    from whisper_tpu.model.decoder import init_cache
    from whisper_tpu.parallel.sharding import cache_pspec, cross_pspec

    from fixtures import synthetic_tokens

    cfg, params = setup
    vocab = make_vocab(cfg.n_vocab, synthetic_tokens(cfg.n_vocab), cfg.n_vocab)
    rng = np.random.default_rng(7)
    B = 4
    mel = rng.standard_normal((B, cfg.n_mels, 2 * cfg.n_audio_ctx)).astype(np.float32)
    sup, blank = build_masks(vocab)
    init_tokens = jnp.asarray(
        np.tile(np.array([vocab.token_sot], np.int32), (B, 1)))
    SL = 12

    def run(p, mesh=None):
        enc = encode(p, jnp.asarray(mel), cfg)
        ck, cv = enc.cross_k, enc.cross_v
        cache = init_cache(cfg, B, ctx=1 + SL + 4)
        if mesh is not None:
            ck = jax.device_put(ck, NamedSharding(mesh, cross_pspec()))
            cv = jax.device_put(cv, NamedSharding(mesh, cross_pspec()))
            cache = jax.tree.map(
                lambda a: jax.device_put(a, NamedSharding(mesh, cache_pspec())),
                cache)
        toks, lengths, sum_lp, _ = decode_segment_device(
            p, init_tokens, 1, 0, cache, ck, cv, sup, blank, cfg,
            sample_len=SL)
        return np.asarray(toks), np.asarray(lengths)

    ref_toks, ref_len = run(params)

    mesh = make_mesh(8, tp=2)
    sharded = shard_params(params, mesh)
    with jax.set_mesh(mesh):
        got_toks, got_len = run(sharded, mesh=mesh)

    np.testing.assert_array_equal(got_toks, ref_toks)
    np.testing.assert_array_equal(got_len, ref_len)


def test_multiprocess_distributed_dryrun():
    """SURVEY §2.2/§5 distributed-backend row, multi-HOST half: a 2-process
    x 4-virtual-CPU-device local cluster (jax.distributed over loopback
    gRPC — the stand-in for DCN) joins one 8-device global mesh and runs
    the full sharded train step; each process materializes only its
    addressable shards (parallel/distributed.put_global + shard_params'
    callback path)."""
    import socket
    import subprocess
    import sys
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    worker = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "from whisper_tpu.parallel.distributed import initialize; "
        f"initialize('127.0.0.1:{port}', num_processes=2, process_id=PID); "
        "assert jax.process_count() == 2, jax.process_count(); "
        "assert jax.device_count() == 8, jax.device_count(); "
        "assert jax.local_device_count() == 4; "
        "from __graft_entry__ import _dryrun_body; _dryrun_body(8)"
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", worker.replace("PID", str(pid))],
            cwd=repo, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
    assert "processes=2" in outs[0][0]


@pytest.mark.parametrize("quantize", [False, True])
def test_tp_slot_engine_matches_single_device(setup, quantize):
    """Tensor-parallel SERVING: a SlotEngine over a (dp=1, tp=2) mesh —
    params, KV pool, and cross pool head-sharded (int8 QuantKV scales
    included); every engine program traced under the mesh — is
    token-identical to the unsharded engine."""
    from whisper_tpu.decoding.task import DecodingOptions
    from whisper_tpu.io.vocab import make_vocab
    from whisper_tpu.parallel.engine import SlotEngine

    from fixtures import synthetic_tokens

    cfg, params = setup

    class _Model:
        def __init__(self):
            self.config = cfg
            self.params = params
            self.vocab = make_vocab(
                cfg.n_vocab, synthetic_tokens(cfg.n_vocab), cfg.n_vocab)
            self.filters = jnp.asarray(
                np.random.default_rng(0).random(
                    (cfg.n_mels, 201), np.float32) * 0.02)

    model = _Model()
    rng = np.random.default_rng(3)
    audios = [rng.standard_normal(16000 + 5000 * i).astype(np.float32) * 0.3
              for i in range(4)]
    opts = DecodingOptions(sample_len=16)

    ref = SlotEngine(model, n_slots=2, options=opts, chunk_steps=4,
                     quantize=quantize).transcribe_many(audios)

    mesh = make_mesh(2, tp=2)  # dp=1: slots stay local
    engine = SlotEngine(model, n_slots=2, options=opts, chunk_steps=4,
                        quantize=quantize, mesh=mesh)
    got = engine.transcribe_many(audios)

    # pools actually born sharded over tp (QuantKV leaves included)
    for leaf in jax.tree.leaves((engine._state.cache_k,
                                 engine._cross_pool_k)):
        assert "tp" in leaf.sharding.spec

    for r, g in zip(ref, got):
        assert g.tokens == r.tokens
        assert g.avg_logprob == pytest.approx(r.avg_logprob, rel=1e-4,
                                              abs=1e-5)

    with pytest.raises(ValueError):
        SlotEngine(model, n_slots=2, mesh=make_mesh(4, tp=2))  # dp=2


def test_tp_beam_engine_matches_single_device(setup):
    """Beam groups under tensor parallel: the COW fork (lane-dot permute on
    the sharded KV pool) and group top-k run under the mesh; results match
    the unsharded beam engine token for token."""
    from whisper_tpu.decoding.task import DecodingOptions
    from whisper_tpu.io.vocab import make_vocab
    from whisper_tpu.parallel.beam_engine import BeamSlotEngine

    from fixtures import synthetic_tokens

    cfg, params = setup

    class _Model:
        def __init__(self):
            self.config = cfg
            self.params = params
            self.vocab = make_vocab(
                cfg.n_vocab, synthetic_tokens(cfg.n_vocab), cfg.n_vocab)
            self.filters = jnp.asarray(
                np.random.default_rng(0).random(
                    (cfg.n_mels, 201), np.float32) * 0.02)

    model = _Model()
    rng = np.random.default_rng(9)
    audios = [rng.standard_normal(16000 + 7000 * i).astype(np.float32) * 0.3
              for i in range(3)]
    opts = DecodingOptions(beam_size=2, sample_len=12)

    ref = BeamSlotEngine(model, n_slots=2, options=opts,
                         chunk_steps=4).transcribe_many(audios)
    engine = BeamSlotEngine(model, n_slots=2, options=opts, chunk_steps=4,
                            mesh=make_mesh(2, tp=2))
    got = engine.transcribe_many(audios)

    for r, g in zip(ref, got):
        assert g.tokens == r.tokens


def test_auto_engine_head_divisible_mesh():
    """auto_engine passes the model config to make_mesh so the auto tp
    divides the head counts (2-head micro model on 8 devices -> tp=2, not
    an invalid 4), and rounds batch_size up to a dp multiple."""
    from whisper_tpu.io.vocab import make_vocab
    from whisper_tpu.parallel.serving import auto_engine

    from fixtures import synthetic_tokens

    cfg = micro_config(n_vocab=51864)  # 2 heads
    tensors = random_tensors(cfg, seed=5)
    params = jax.tree.map(jnp.asarray, params_from_ggml(tensors, cfg))

    class _M:
        config = cfg
        vocab = make_vocab(cfg.n_vocab, synthetic_tokens(cfg.n_vocab),
                           cfg.n_vocab)
        filters = jnp.zeros((cfg.n_mels, 201), jnp.float32)

    _M.params = params
    eng = auto_engine(_M, batch_size=6)
    assert dict(eng.mesh.shape) == {"dp": 4, "tp": 2}
    assert eng.batch_size == 8  # rounded up to a dp=4 multiple


def test_shard_params_quantized_tree(setup):
    """shard_params accepts int8-quantized param trees: the *_scale leaves
    get the base weight's spec minus the contraction axis (the `cli serve
    --tp --quantize` / engine enc-int8 path)."""
    from whisper_tpu.model.quant import (
        quantize_decoder_weights, quantize_encoder_weights)

    cfg, params = setup
    qparams = quantize_decoder_weights(quantize_encoder_weights(params))
    mesh = make_mesh(8)
    sharded = shard_params(qparams, mesh)
    eb = sharded["encoder"]["blocks"]
    assert eb["q_w"].dtype == jnp.int8
    assert eb["q_w"].sharding.spec == P(None, "tp", None)
    assert eb["q_w_scale"].sharding.spec == P(None, "tp")
    db = sharded["decoder"]["blocks"]
    assert db["out_w_scale"].sharding.spec == P(None, None)
    assert sharded["decoder"]["te_scale"].sharding.spec == P("tp",)

    # sharded W8A8 encode stays close to the unsharded quantized encode
    rng = np.random.default_rng(2)
    mel = rng.standard_normal((4, cfg.n_mels, 2 * cfg.n_audio_ctx)).astype(np.float32)
    ref = np.asarray(encode(qparams, jnp.asarray(mel), cfg).hidden, np.float32)
    mel_sharded = jax.device_put(jnp.asarray(mel), NamedSharding(mesh, batch_pspec()))
    with mesh:
        got = np.asarray(encode(sharded, mel_sharded, cfg).hidden, np.float32)
    rel = np.abs(ref - got).max() / max(np.abs(ref).max(), 1e-6)
    assert rel < 5e-2, rel
