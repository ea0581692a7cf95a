"""Vocab/special-token tests vs the reference's id tables (main.rs:433-467, 538-597)."""

from whisper_tpu.io.vocab import build_special_ids, make_vocab


def test_english_ids():
    ids = build_special_ids(51864)
    # Reference defaults (main.rs:557-575).
    assert ids["token_eot"] == 50256
    assert ids["token_sot"] == 50257
    assert ids["token_prev"] == 50360
    assert ids["token_not"] == 50362
    assert ids["token_beg"] == 50363
    assert ids["num_languages"] == 99


def test_multilingual_ids():
    ids = build_special_ids(51865)
    # Reference's +1 shift (main.rs:433-440).
    assert ids["token_eot"] == 50257
    assert ids["token_sot"] == 50258
    assert ids["token_prev"] == 50361
    assert ids["token_not"] == 50363
    assert ids["token_beg"] == 50364
    # Correct positional task ids (main.rs hardcodes these for multilingual).
    assert ids["token_translate"] == 50358
    assert ids["token_transcribe"] == 50359


def test_large_v3_ids():
    ids = build_special_ids(51866)
    assert ids["num_languages"] == 100
    assert ids["token_sot"] == 50258
    assert ids["token_translate"] == 50359
    assert ids["token_transcribe"] == 50360
    assert ids["token_beg"] == 50365


def test_synthesized_tokens():
    # File stores fewer tokens than hparams.n_vocab -> synthesized names
    # (main.rs:442-467).
    tokens = [f"w{i}".encode() for i in range(50257)]
    vocab = make_vocab(51864, tokens, len(tokens))
    assert vocab.id_to_token[50257] == b"[_SOT_]"
    assert vocab.id_to_token[50363] == b"[_BEG_]"
    assert vocab.id_to_token[50364] == b"[_TT_1]"
    assert vocab.id_to_token[51863] == b"[_TT_1500]"
    assert vocab.id_to_token[50360] == b"[_PREV_]"
    assert vocab.id_to_token[50362] == b"[_NOT_]"
    assert vocab.id_to_token[50300] == b"[_extra_token_50300]"


def test_decode_and_language_tokens():
    tokens = [f"w{i} ".encode() for i in range(100)]
    vocab = make_vocab(51865, tokens, len(tokens))
    assert vocab.decode([1, 2]) == "w1 w2 "
    assert vocab.language_token("en") == 50259
    assert vocab.language_token("zh") == 50260
    assert vocab.language_of_token(50259) == "en"
    assert vocab.is_timestamp(vocab.token_beg)
    assert abs(vocab.timestamp_to_seconds(vocab.token_beg + 100) - 2.0) < 1e-9
