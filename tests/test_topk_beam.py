"""Device-side rules+topk beam path must match the host beam exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_tpu.decoding.task import DecodingOptions, decode_full
from whisper_tpu.io.vocab import make_vocab
from whisper_tpu.model.encoder import encode
from whisper_tpu.model.params import params_from_ggml

from fixtures import micro_config, random_tensors, synthetic_tokens


@pytest.fixture(scope="module")
def setup():
    cfg = micro_config(n_vocab=51864)
    tensors = random_tensors(cfg, seed=31)
    params = jax.tree.map(jnp.asarray, params_from_ggml(tensors, cfg))
    vocab = make_vocab(cfg.n_vocab, synthetic_tokens(cfg.n_vocab), cfg.n_vocab)
    rng = np.random.default_rng(5)
    mel = rng.standard_normal((1, cfg.n_mels, 2 * cfg.n_audio_ctx)).astype(np.float32)
    enc = encode(params, jnp.asarray(mel), cfg)
    return cfg, params, vocab, enc


@pytest.mark.parametrize("without_timestamps", [True, False])
def test_beam_topk_matches_host(setup, without_timestamps):
    """Host beam vs device rules+topk steps (patience forces the topk path)."""
    cfg, params, vocab, enc = setup
    opts = DecodingOptions(
        beam_size=3, sample_len=14, without_timestamps=without_timestamps,
        patience=1.0,  # patience != None keeps the host bookkeeping path
    )
    host = decode_full(params, cfg, vocab, enc.cross_k, enc.cross_v,
                       DecodingOptions(beam_size=3, sample_len=14,
                                       without_timestamps=without_timestamps),
                       use_device_loop=False)[0]
    dev = decode_full(params, cfg, vocab, enc.cross_k, enc.cross_v, opts,
                      use_device_loop=True)[0]
    assert dev.tokens == host.tokens
    assert abs(dev.avg_logprob - host.avg_logprob) < 1e-3


def test_device_beam_with_prompt_matches_host(setup):
    """Prompt conditioning (sot_index > 0, bucketed prefill) on the device beam."""
    cfg, params, vocab, enc = setup
    opts = DecodingOptions(beam_size=3, sample_len=10, prompt=list(range(300, 340)))
    host = decode_full(params, cfg, vocab, enc.cross_k, enc.cross_v, opts,
                       use_device_loop=False)[0]
    dev = decode_full(params, cfg, vocab, enc.cross_k, enc.cross_v, opts,
                      use_device_loop=True)[0]
    assert dev.tokens == host.tokens


@pytest.mark.parametrize("without_timestamps", [True, False])
def test_device_beam_matches_host(setup, without_timestamps):
    """Fully on-device beam loop vs the host beam — token exact."""
    cfg, params, vocab, enc = setup
    opts = DecodingOptions(
        beam_size=3, sample_len=14, without_timestamps=without_timestamps
    )
    host = decode_full(params, cfg, vocab, enc.cross_k, enc.cross_v, opts,
                       use_device_loop=False)[0]
    dev = decode_full(params, cfg, vocab, enc.cross_k, enc.cross_v, opts,
                      use_device_loop=True)[0]
    assert dev.tokens == host.tokens
    assert abs(dev.avg_logprob - host.avg_logprob) < 1e-3
    assert abs(dev.no_speech_prob - host.no_speech_prob) < 1e-4


def test_beam_update_matches_host_fuzz():
    """Direct fuzz of device beam_update vs host update_from_topk, forcing EOT
    candidates at every rank — including BELOW the k-th non-EOT candidate,
    which openai's update loop never considers (break after k saved). The
    end-to-end tests above rarely hit that branch; this drives it explicitly.
    """
    from whisper_tpu.decoding.device_beam import beam_update
    from whisper_tpu.decoding.sequence import BeamSearchDecoder

    EOT = 999
    k, G, SL, steps = 3, 2, 12, 8
    rejected_eot_events = 0

    for seed in range(6):
        rng = np.random.default_rng(seed)
        GK = G * k
        decoder = BeamSearchDecoder(k, EOT)
        decoder.reset()
        decoder.finished_sequences = None

        # distinct step-0 tokens per beam (as after a real first beam step)
        first = np.arange(1, GK + 1, dtype=np.int32).reshape(G, k) * 7
        host_tokens = first.reshape(GK, 1).copy()
        host_sum_lp = rng.standard_normal(GK).astype(np.float32).astype(np.float64)

        dev_tokens = np.full((G, k, SL), EOT, np.int32)
        dev_tokens[:, :, 0] = first
        dev_sum_lp = jnp.asarray(host_sum_lp.reshape(G, k).astype(np.float32))
        fin_tokens = jnp.full((G, k, SL), EOT, jnp.int32)
        fin_scores = jnp.full((G, k), -1e30, jnp.float32)
        fin_len = jnp.zeros((G, k), jnp.int32)
        fin_count = jnp.zeros((G,), jnp.int32)
        dev_tokens = jnp.asarray(dev_tokens)

        for step in range(1, steps):
            top_lp = rng.standard_normal((GK, k + 1)).astype(np.float32) * 2.0
            # distinct non-EOT ids per row; then force EOT at random ranks
            top_ids = np.stack(
                [rng.choice(np.arange(1, 900), size=k + 1, replace=False)
                 for _ in range(GK)]
            ).astype(np.int32)
            for row in range(GK):
                if rng.random() < 0.5:
                    top_ids[row, rng.integers(0, k + 1)] = EOT

            # count EOT candidates that openai would never consider (ranked
            # below the k-th non-EOT) so we know the branch is exercised
            cand = (host_sum_lp.reshape(G, k, 1).astype(np.float32)
                    + top_lp.reshape(G, k, k + 1)).reshape(G, -1)
            ctok = top_ids.reshape(G, -1)
            for g in range(G):
                order = np.argsort(-cand[g], kind="stable")
                noneot_seen = 0
                for idx in order:
                    if ctok[g, idx] == EOT:
                        if noneot_seen >= k:
                            rejected_eot_events += 1
                    else:
                        noneot_seen += 1

            host_tokens, host_completed, host_src = decoder.update_from_topk(
                host_tokens, top_lp, top_ids, host_sum_lp
            )
            (dev_sum_lp, new_tok, new_src, dev_tokens,
             fin_tokens, fin_scores, fin_len, fin_count) = beam_update(
                jnp.asarray(top_lp), jnp.asarray(top_ids), dev_sum_lp,
                dev_tokens, fin_tokens, fin_scores, fin_len, fin_count,
                step, k, EOT,
            )

            # active beams: tokens, scores, kv-source rows
            np.testing.assert_array_equal(
                np.asarray(new_tok).reshape(GK), host_tokens[:, -1]
            )
            np.testing.assert_array_equal(np.asarray(new_src).reshape(GK) % k,
                                          host_src % k)
            np.testing.assert_allclose(
                np.asarray(dev_sum_lp).reshape(GK), host_sum_lp, rtol=0, atol=1e-4
            )
            np.testing.assert_array_equal(
                np.asarray(dev_tokens)[:, :, 1:step + 1].reshape(GK, step),
                host_tokens[:, 1:],
            )

            # finished sets: same sequences, same scores, same order
            fc = np.asarray(fin_count)
            ft = np.asarray(fin_tokens)
            fs = np.asarray(fin_scores)
            fl = np.asarray(fin_len)
            for g in range(G):
                host_fin = list(decoder.finished_sequences[g].items())
                assert fc[g] == len(host_fin)
                for i, (seq, score) in enumerate(host_fin):
                    assert seq[-1] == EOT
                    np.testing.assert_array_equal(
                        ft[g, i, : fl[g, i]], np.asarray(seq[:-1])
                    )
                    assert abs(fs[g, i] - score) < 1e-4
            assert bool(np.all(fc >= k)) == host_completed
            if host_completed:
                break

    assert rejected_eot_events > 0, "fuzz never exercised the rejected-EOT branch"


def test_cow_assign_invariants_and_history_fuzz():
    """Copy-on-write row assignment: over many random mixing steps,
    (a) new_phys is a bijection per group, (b) copy_src sources are never
    destinations (the in-place kernel's safety invariant), (c) a pure
    permutation of distinct parents moves no data, and (d) replaying the
    COW moves on a materialized cache reproduces exactly the histories a
    material beam reorder would produce."""
    from whisper_tpu.decoding.device_beam import cow_assign

    rng = np.random.default_rng(0)
    G, k, steps = 3, 5, 40
    GK = G * k
    base = (np.arange(G) * k)[:, None]

    phys = np.tile(np.arange(k), (G, 1)).astype(np.int32)
    # material reference: cache row per beam is just its token history
    hist = [[[] for _ in range(k)] for _ in range(G)]       # beam-order
    rows = [[[] for _ in range(k)] for _ in range(G)]       # physical rows
    pure_perm_checked = False
    for t in range(steps):
        if t % 7 == 3:
            # force a pure permutation of distinct parents sometimes
            src = np.stack([rng.permutation(k) for _ in range(G)]).astype(np.int32)
        else:
            src = rng.integers(0, k, size=(G, k)).astype(np.int32)
        tok = rng.integers(0, 1000, size=(G, k))
        new_phys, copy_src = jax.device_get(
            cow_assign(jnp.asarray(phys), jnp.asarray(src), k))
        for g in range(G):
            # (a) bijection
            assert sorted(new_phys[g]) == list(range(k))
            dsts = {r for r in range(k) if copy_src[g][r] != r}
            srcs = {int(copy_src[g][r]) for r in dsts}
            # (b) sources never destinations
            assert not (dsts & srcs)
            if len(set(src[g])) == k:
                # (c) permutation of distinct parents: no copies
                assert not dsts
                pure_perm_checked = True
            # (d) replay: copy rows, then append tokens at assigned rows
            old_rows = [list(r) for r in rows[g]]
            for r in range(k):
                rows[g][r] = list(old_rows[copy_src[g][r]])
            new_hist = [list(hist[g][src[g][j]]) + [int(tok[g, j])]
                        for j in range(k)]
            for j in range(k):
                rows[g][new_phys[g][j]].append(int(tok[g, j]))
            hist[g] = new_hist
            for j in range(k):
                assert rows[g][new_phys[g][j]] == hist[g][j], (t, g, j)
        phys = new_phys
    assert pure_perm_checked


def test_cow_copy_rows_fallback_matches_take():
    """cow_copy_rows (CPU fallback) == jnp.take for a COW-valid src map."""
    from whisper_tpu.kernels.beam_gather import cow_copy_rows

    rng = np.random.default_rng(1)
    B = 10
    a = rng.standard_normal((B, 2, 3, 4)).astype(np.float32)
    b = rng.integers(-128, 127, size=(B, 2, 5)).astype(np.int8)
    src = np.arange(B)
    src[3] = 0  # fork: row 3 <- row 0
    src[7] = 4
    out_a, out_b = cow_copy_rows((jnp.asarray(a), jnp.asarray(b)),
                                 jnp.asarray(src, np.int32))
    np.testing.assert_array_equal(np.asarray(out_a), a[src])
    np.testing.assert_array_equal(np.asarray(out_b), b[src])


def test_vocab_topk_matches_lax_top_k_exactly():
    """Blocked two-stage top-k == lax.top_k (values AND tie-order ids)."""
    from whisper_tpu.decoding.topk_step import vocab_topk

    rng = np.random.default_rng(7)
    cases = []
    # dense float logprobs, vocab not a multiple of the block
    cases.append(rng.standard_normal((9, 51866)).astype(np.float32))
    # heavy ties: quantized values force cross-block and in-block ties
    cases.append(rng.integers(0, 5, (6, 1000)).astype(np.float32))
    # suppressed-vocab shape: most entries at a single NEG constant
    m = np.full((4, 51866), -1e30, np.float32)
    m[:, ::1717] = rng.standard_normal((4, m[:, ::1717].shape[1]))
    cases.append(m)
    # -inf columns (masked) mixed with finite
    f = rng.standard_normal((3, 300)).astype(np.float32)
    f[:, 50:250] = -np.inf
    cases.append(f)
    for x in cases:
        xj = jnp.asarray(x)
        for k in (1, 5, 6):
            ev, ei = jax.lax.top_k(xj, k)
            gv, gi = vocab_topk(xj, k)
            np.testing.assert_array_equal(np.asarray(ev), np.asarray(gv))
            np.testing.assert_array_equal(np.asarray(ei), np.asarray(gi))
