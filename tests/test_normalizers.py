"""EnglishTextNormalizer behavior on known openai-normalizer pairs."""

import pytest

from whisper_tpu.utils.normalizers import (
    BasicTextNormalizer,
    EnglishNumberNormalizer,
    EnglishSpellingNormalizer,
    EnglishTextNormalizer,
)


norm = EnglishTextNormalizer()
numnorm = EnglishNumberNormalizer()


@pytest.mark.parametrize(
    "inp,expect",
    [
        # contractions
        ("I won't do it", "i will not do it"),
        ("she can't swim", "she can not swim"),
        ("Let's go, we're late", "let us go we are late"),
        ("it's been a while", "it has been a while"),
        ("he's got a plan and he'd gone home", "he has got a plan and he had gone home"),
        ("they'll say it's fine, I'm sure", "they will say it is fine i am sure"),
        ("doesn't, isn't, wasn't", "does not is not was not"),
        # titles
        ("Mr. Smith met Dr. Jones", "mister smith met doctor jones"),
        ("Mrs. Brown and Capt. Kirk", "missus brown and captain kirk"),
        # fillers and brackets
        ("um, I think [noise] it's (laughs) fine", "i think it is fine"),
        # punctuation / symbols / diacritics
        ("Café—crème, naïve!", "cafe creme naive"),
        ("semi-colon; colon: dash-dash", "semi colon colon dash dash"),
    ],
)
def test_english_normalizer_pairs(inp, expect):
    assert norm(inp) == expect


@pytest.mark.parametrize(
    "inp,expect",
    [
        ("one two three", "1 2 3"),
        ("twenty one", "21"),
        ("twenty-one", "21"),
        ("one hundred and twenty three", "123"),
        ("four thousand and seven", "4007"),
        ("two hundred thousand", "200000"),
        ("three million five hundred thousand", "3500000"),
        ("one trillion", "1000000000000"),
        ("zero", "0"),
        ("three point one four", "3.14"),
        ("twenty first", "21st"),
        ("second", "2nd"),
        ("third", "3rd"),
        ("twelfth", "12th"),
        ("hundredth", "100th"),
        ("fifty percent", "50%"),
        ("five dollars", "$5"),
        ("one dollar and fifty cents", "$1.50"),
        ("ten pounds", "£10"),
        ("millions of people", "millions of people"),  # plural multiplier kept
        ("a word like hundred alone", "a word like hundred alone"),
    ],
)
def test_number_normalizer(inp, expect):
    assert numnorm(inp) == expect


def test_number_inside_sentence():
    assert (
        norm("He paid one hundred and twenty three dollars.")
        == "he paid $123"
    )
    assert norm("Chapter Twenty-First") == "chapter 21st"
    assert norm("It is 1,234,567 already") == "it is 1234567 already"
    assert norm("99.5% of the time") == "99.5% of the time"


@pytest.mark.parametrize(
    "inp,expect",
    [
        ("colour", "color"),
        ("favourite", "favorite"),
        ("organised behaviour", "organized behavior"),
        ("the theatre centre", "the theater center"),
        ("defence programme", "defense program"),
        ("travelled grey tyres", "traveled gray tires"),
        ("unchanged american words", "unchanged american words"),
    ],
)
def test_spelling_normalizer(inp, expect):
    assert EnglishSpellingNormalizer()(inp) == expect


def test_basic_normalizer():
    basic = BasicTextNormalizer()
    assert basic("Hello, World! [applause]") == "hello world"
    assert basic("Ünïcödé stays (mostly)") == "ünïcödé stays"
    basic_d = BasicTextNormalizer(remove_diacritics=True)
    assert basic_d("Ünïcödé") == "unicode"


def test_wer_uses_full_normalizer():
    from whisper_tpu.utils.wer import wer

    out = wer(["Mr. Smith paid five dollars"], ["mister smith paid $5"])
    assert out["wer"] == 0.0


def test_spelling_table_generated_coverage():
    """The generated British->American table: family coverage, inflections,
    and no false positives on -ise words that keep -ise in American."""
    from whisper_tpu.utils.normalizers import _SPELLINGS, EnglishSpellingNormalizer

    assert len(_SPELLINGS) > 1200  # english.json scale
    for b, a in [
        ("colour", "color"), ("colourful", "colorful"),
        ("behaviours", "behaviors"), ("favourites", "favorites"),
        ("organisation", "organization"), ("recognised", "recognized"),
        ("utilise", "utilize"), ("energised", "energized"),
        ("analysing", "analyzing"), ("catalysed", "catalyzed"),
        ("centimetres", "centimeters"), ("theatres", "theaters"),
        ("dialogue", "dialog"), ("defences", "defenses"),
        ("travelled", "traveled"), ("channelling", "channeling"),
        ("anaesthetic", "anesthetic"), ("manoeuvring", "maneuvering"),
        ("grey", "gray"), ("aluminium", "aluminum"),
        ("practise", "practice"), ("fulfilment", "fulfillment"),
    ]:
        assert _SPELLINGS.get(b) == a, (b, _SPELLINGS.get(b))
    # words that must NOT be rewritten (valid in American English as-is)
    for w in ["advertise", "surprise", "supervise", "exercise", "compromise",
              "televise", "glamour" if False else "franchise", "disguise",
              "precise", "concise", "demise", "despise", "devise", "revise",
              "advise", "arise", "rise", "wise", "promise"]:
        assert w not in _SPELLINGS, w
    # identity entries are dropped at build time
    assert all(k != v for k, v in _SPELLINGS.items())
    n = EnglishSpellingNormalizer()
    assert n("the colour of the theatre") == "the color of the theater"
