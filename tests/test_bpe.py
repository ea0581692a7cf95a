"""Exact BPE reconstruction from a vocab id table (io/bpe.py).

Trains a real byte-level BPE in-test (the ground truth), lays the vocab out
in merge-creation order exactly like GPT-2 does, and checks that (a) ByteBPE
recovers the merge table exactly from the id table alone, and (b) encoding
matches a reference rank-based BPE using the true merges.
"""

import numpy as np
import pytest

from whisper_tpu.io.bpe import ByteBPE, _PAT


CORPUS = (
    "the quick brown fox jumps over the lazy dog "
    "hello world hello there the theory of the thing "
    "testing tokenization with some longer words internationalization "
    "don't can't won't it's we're they'll i'd you've "
    "numbers 123 4567 89 mixed123text "
    "unicode café naïve über straße 日本語 "
) * 4


def train_bpe(corpus: str, n_merges: int):
    """Reference byte-level BPE trainer: returns (id_to_token, merges) with
    GPT-2's vocab layout (256 byte tokens, then one token per merge)."""
    words = [w.encode("utf-8") for w in _PAT.findall(corpus)]
    id_to_token = {i: bytes([i]) for i in range(256)}
    # each word as a list of token ids
    seqs = [[b for b in w] for w in words]
    merges = []
    for step in range(n_merges):
        counts = {}
        for seq in seqs:
            for a, b in zip(seq, seq[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        if not counts:
            break
        # deterministic: max count, tie-break on smallest pair ids
        pair = max(counts, key=lambda p: (counts[p], (-p[0], -p[1])))
        if counts[pair] < 2:
            break
        new_id = 256 + len(merges)
        merges.append(pair)
        id_to_token[new_id] = id_to_token[pair[0]] + id_to_token[pair[1]]
        out = []
        for seq in seqs:
            merged, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and (seq[i], seq[i + 1]) == pair:
                    merged.append(new_id)
                    i += 2
                else:
                    merged.append(seq[i])
                    i += 1
            out.append(merged)
        seqs = out
    return id_to_token, merges


def reference_encode(text: str, id_to_token, merges):
    """Standard BPE encode using the TRUE merge table (rank order)."""
    rank = {pair: i for i, pair in enumerate(merges)}
    merged_id = {pair: 256 + i for i, pair in enumerate(merges)}
    out = []
    for w in _PAT.findall(text):
        parts = list(w.encode("utf-8"))
        while len(parts) > 1:
            best = min(
                ((rank.get((a, b), 1 << 30), i)
                 for i, (a, b) in enumerate(zip(parts, parts[1:]))),
            )
            if best[0] == 1 << 30:
                break
            i = best[1]
            parts[i : i + 2] = [merged_id[(parts[i], parts[i + 1])]]
        out.extend(parts)
    return out


@pytest.fixture(scope="module")
def trained():
    return train_bpe(CORPUS, 300)


def test_reconstruction_recovers_exact_merges(trained):
    id_to_token, merges = trained
    assert len(merges) > 100
    bpe = ByteBPE(id_to_token, n_text=len(id_to_token))
    assert bpe.valid
    assert bpe.n_merges == len(merges)
    for i, pair in enumerate(merges):
        assert bpe._ranks.get(pair) == 256 + i, f"merge {i} mismatched"


@pytest.mark.parametrize(
    "text",
    [
        "the quick brown fox",
        " hello there, the internationalization of the thing",
        "don't we're they'll I'd you've 123 4567",
        "never-seen words zyxw qqq unicode café straße 日本",
        "  leading and   multiple   spaces\nnewlines\ttabs",
        "punctuation!?.,;: (parens) [brackets] {braces} \"quotes\"",
    ],
)
def test_encode_matches_reference(trained, text):
    id_to_token, merges = trained
    bpe = ByteBPE(id_to_token, n_text=len(id_to_token))
    assert bpe.encode(text) == reference_encode(text, id_to_token, merges)


def test_encode_roundtrips_bytes(trained):
    id_to_token, _ = trained
    bpe = ByteBPE(id_to_token, n_text=len(id_to_token))
    text = "arbitrary text round-trips losslessly, café 123"
    ids = bpe.encode(text)
    assert b"".join(id_to_token[t] for t in ids).decode("utf-8") == text


def test_pretokenizer_gpt2_pattern():
    """The GPT-2 regex splits exactly like tiktoken's gpt2 pattern."""
    assert _PAT.findall("Hello world") == ["Hello", " world"]
    assert _PAT.findall("don't stop") == ["don", "'t", " stop"]
    assert _PAT.findall("I'd've") == ["I", "'d", "'ve"]
    assert _PAT.findall("abc123def") == ["abc", "123", "def"]
    assert _PAT.findall("x  y") == ["x", " ", " y"]
    # \s+(?!\S) backtracks to keep the last whitespace with the next word,
    # and \n is not the optional-leading-space of a word run:
    assert _PAT.findall("a\n\nb") == ["a", "\n", "\n", "b"]
    assert _PAT.findall("price: $5.99!") == [
        "price", ":", " $", "5", ".", "99", "!"
    ]


def test_synthetic_vocab_marked_invalid():
    """Non-BPE vocabs (our synthetic fixtures) must be detected and rejected
    so callers use the greedy fallback."""
    from fixtures import micro_config, synthetic_tokens
    from whisper_tpu.io.vocab import make_vocab

    cfg = micro_config(n_vocab=51864)
    vocab = make_vocab(cfg.n_vocab, synthetic_tokens(cfg.n_vocab), cfg.n_vocab)
    # encode() must still work (greedy fallback), never raise
    ids = vocab.encode(" hello")
    assert isinstance(ids, list)


def test_vocab_encode_uses_bpe_when_valid(trained):
    """WhisperVocab.encode routes through exact BPE for real BPE tables."""
    id_to_token, merges = trained
    from whisper_tpu.io.vocab import WhisperVocab

    n_text = len(id_to_token)
    vocab = WhisperVocab(
        n_vocab=n_text + 10,
        id_to_token=dict(id_to_token),
        token_to_id={b: i for i, b in id_to_token.items()},
        token_eot=n_text, token_sot=n_text + 1, token_translate=n_text + 2,
        token_transcribe=n_text + 3, token_solm=n_text + 4,
        token_prev=n_text + 5, token_nosp=n_text + 6, token_not=n_text + 7,
        token_beg=n_text + 8, languages=("en",),
    )
    assert vocab.bpe.valid
    text = " the quick brown fox"
    assert vocab.encode(text) == reference_encode(text, id_to_token, merges)
