"""Decoding tests: greedy parity vs HF generate, logit rules, beam mechanics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_tpu.decoding.rules import (
    ApplyTimestampRules,
    SuppressBlank,
    SuppressTokens,
    build_suppress_list,
)
from whisper_tpu.decoding.sequence import BeamSearchDecoder, GreedyDecoder
from whisper_tpu.decoding.task import DecodingOptions, decode_full
from whisper_tpu.io.vocab import make_vocab
from whisper_tpu.model.encoder import encode
from whisper_tpu.model.params import params_from_ggml

from fixtures import (
    hf_model_from_tensors,
    micro_config,
    random_tensors,
    synthetic_tokens,
)


@pytest.fixture(scope="module")
def setup():
    cfg = micro_config(n_vocab=51864)
    tensors = random_tensors(cfg, seed=11)
    params = jax.tree.map(jnp.asarray, params_from_ggml(tensors, cfg))
    vocab = make_vocab(cfg.n_vocab, synthetic_tokens(cfg.n_vocab), cfg.n_vocab)
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, cfg.n_mels, 2 * cfg.n_audio_ctx)).astype(np.float32)
    enc = encode(params, jnp.asarray(mel), cfg)
    return cfg, tensors, params, vocab, mel, enc


def test_greedy_token_parity_vs_hf(setup):
    """Token-identical greedy decode vs transformers generate (random weights)."""
    import torch

    cfg, tensors, params, vocab, mel, enc = setup
    opts = DecodingOptions(
        without_timestamps=True, suppress_tokens=None, suppress_blank=False,
        sample_len=20,
    )
    result = decode_full(params, cfg, vocab, enc.cross_k, enc.cross_v, opts)[0]

    hf = hf_model_from_tensors(cfg, tensors)
    # Manual torch greedy loop with KV cache (HF generate injects its own
    # begin-suppression defaults, so drive the oracle explicitly).
    with torch.no_grad():
        enc_out = hf.model.encoder(torch.from_numpy(mel)).last_hidden_state
        ids = torch.tensor([[vocab.token_sot, vocab.token_not]])
        past = None
        hf_tokens = []
        for _ in range(20):
            out = hf(
                decoder_input_ids=ids,
                encoder_outputs=(enc_out,),
                past_key_values=past,
                use_cache=True,
            )
            past = out.past_key_values
            nxt = int(out.logits[0, -1].argmax())
            if nxt == vocab.token_eot:
                break
            hf_tokens.append(nxt)
            ids = torch.tensor([[nxt]])
    assert result.tokens == hf_tokens


def test_suppress_rules(setup):
    cfg, tensors, params, vocab, mel, enc = setup
    sup = build_suppress_list(vocab)
    assert vocab.token_sot in sup and vocab.token_translate in sup
    logits = np.zeros((1, cfg.n_vocab), np.float32)
    tokens = np.array([[vocab.token_sot]])
    SuppressTokens(sup)(logits, tokens)
    assert np.isneginf(logits[0, vocab.token_sot])
    # blank suppression fires only at sample_begin
    logits = np.zeros((1, cfg.n_vocab), np.float32)
    sb = SuppressBlank(vocab, sample_begin=1)
    sb(logits, tokens)
    assert np.isneginf(logits[0, vocab.token_eot])
    logits = np.zeros((1, cfg.n_vocab), np.float32)
    sb(logits, np.array([[vocab.token_sot, 5]]))
    assert logits[0, vocab.token_eot] == 0


def test_timestamp_rules(setup):
    cfg, tensors, params, vocab, mel, enc = setup
    beg, eot = vocab.token_beg, vocab.token_eot
    rules = ApplyTimestampRules(vocab, sample_begin=1, max_initial_timestamp_index=50)

    # First sample: only timestamps within max_initial allowed.
    logits = np.zeros((1, cfg.n_vocab), np.float32)
    rules(logits, np.array([[vocab.token_sot]]))
    assert np.isneginf(logits[0, : beg]).all()
    assert not np.isneginf(logits[0, beg])
    assert np.isneginf(logits[0, beg + 51])

    # After the initial (segment-start) timestamp: next must be text — the
    # pair is considered closed when only one sampled token exists.
    logits = np.zeros((1, cfg.n_vocab), np.float32)
    logits[0, 42] = 15.0  # text wins the probability-mass rule
    rules(logits, np.array([[vocab.token_sot, beg + 3]]))
    assert np.isneginf(logits[0, beg:]).all()
    assert not np.isneginf(logits[0, 42])

    # [ts, text, ts]: lone trailing timestamp must pair (text masked, EOT ok).
    logits = np.zeros((1, cfg.n_vocab), np.float32)
    logits[0, eot] = 15.0
    rules(logits, np.array([[vocab.token_sot, beg + 3, 42, beg + 5]]))
    assert np.isneginf(logits[0, :eot]).all()
    assert not np.isneginf(logits[0, eot])
    assert not np.isneginf(logits[0, beg + 5])   # same timestamp again: allowed
    assert np.isneginf(logits[0, beg + 4])       # below last: masked


def test_greedy_decoder_mechanics():
    g = GreedyDecoder(0.0, eot=9)
    tokens = np.array([[1], [2]])
    logits = np.zeros((2, 10), np.float32)
    logits[0, 3] = 5.0
    logits[1, 9] = 5.0
    slp = np.zeros(2)
    tokens, done = g.update(tokens, logits, slp)
    assert tokens[0, -1] == 3 and tokens[1, -1] == 9
    assert not done
    # Finished sequence keeps emitting EOT and stops accumulating logprob.
    logits2 = np.zeros((2, 10), np.float32)
    logits2[:, 4] = 8.0
    prev = slp.copy()
    tokens, done = g.update(tokens, logits2, slp)
    assert tokens[1, -1] == 9
    assert slp[1] == prev[1]
    assert tokens[0, -1] == 4


def test_beam_search_mechanics():
    b = BeamSearchDecoder(beam_size=2, eot=9)
    tokens = np.array([[1], [1]])
    slp = np.zeros(2)
    logits = np.zeros((2, 10), np.float32)
    logits[:, 3] = 2.0
    logits[:, 4] = 1.0
    tokens, completed, src = b.update(tokens, logits, slp)
    # both beams had identical prefixes: dedup keeps {..3}, {..4}
    assert sorted(t[-1] for t in tokens) == [3, 4]
    assert not completed
    logits = np.zeros((2, 10), np.float32)
    logits[:, 9] = 10.0  # both want EOT
    tokens2, completed, src = b.update(tokens, logits, slp)
    assert len(b.finished_sequences[0]) == 2
    assert completed


def test_beam_decode_runs(setup):
    cfg, tensors, params, vocab, mel, enc = setup
    opts = DecodingOptions(beam_size=3, sample_len=10, without_timestamps=True)
    result = decode_full(params, cfg, vocab, enc.cross_k, enc.cross_v, opts)[0]
    assert isinstance(result.tokens, list)
    assert result.avg_logprob <= 0


def test_temperature_sampling_reproducible(setup):
    cfg, tensors, params, vocab, mel, enc = setup
    opts = DecodingOptions(temperature=0.8, sample_len=8, seed=7, without_timestamps=True)
    r1 = decode_full(params, cfg, vocab, enc.cross_k, enc.cross_v, opts)[0]
    r2 = decode_full(params, cfg, vocab, enc.cross_k, enc.cross_v, opts)[0]
    assert r1.tokens == r2.tokens
    assert r1.temperature == 0.8


def test_option_contract_and_prefix_truncation():
    """openai's _verify_options contract (incompatible combos raise) and its
    exact prefix-truncation arithmetic (sample_len > n_ctx//2 yields an
    EMPTY prefix, never the untruncated one)."""
    from whisper_tpu.decoding.task import DecodingTask

    cfg = micro_config()
    vocab = make_vocab(cfg.n_vocab, synthetic_tokens(cfg.n_vocab), cfg.n_vocab)

    with pytest.raises(ValueError, match="can't be given together"):
        DecodingTask(cfg, vocab, DecodingOptions(beam_size=5, best_of=8))
    with pytest.raises(ValueError, match="temperature 0"):
        DecodingTask(cfg, vocab,
                     DecodingOptions(beam_size=5, temperature=0.5))
    with pytest.raises(ValueError, match="greedy sampling"):
        DecodingTask(cfg, vocab, DecodingOptions(best_of=5, temperature=0.0))
    with pytest.raises(ValueError, match="patience requires"):
        DecodingTask(cfg, vocab, DecodingOptions(patience=2.0))

    prefix = list(range(100, 110))
    # sample_len small: keep the last (n_ctx//2 - sample_len) prefix tokens
    keep = cfg.n_text_ctx // 2 - 8
    t = DecodingTask(cfg, vocab,
                     DecodingOptions(sample_len=8, prefix=prefix))
    got = t.initial_tokens[len(t.sot_sequence):]
    assert got == prefix[-keep:]
    # sample_len past n_ctx//2: openai's prefix[-neg:] slice DROPS the
    # first (overshoot) tokens...
    t = DecodingTask(cfg, vocab, DecodingOptions(
        sample_len=cfg.n_text_ctx // 2 + 4, prefix=prefix))
    assert t.initial_tokens[len(t.sot_sequence):] == prefix[4:]
    # ...down to an EMPTY prefix once the overshoot covers it (the old
    # 'or prefix' fallback wrongly restored all 10 tokens here)
    t = DecodingTask(cfg, vocab, DecodingOptions(
        sample_len=cfg.n_text_ctx // 2 + len(prefix), prefix=prefix))
    assert t.initial_tokens == t.sot_sequence
