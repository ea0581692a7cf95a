"""Text normalizers for WER evaluation.

Implements the openai-whisper normalizer stack (BasicTextNormalizer and
EnglishTextNormalizer: bracket stripping, contraction standardization,
spelled-number -> digit conversion, British -> American spellings, symbol and
diacritic removal) so WER comparisons use the same text canonicalization the
upstream evaluation harness does. The reference has no evaluation tooling at
all (SURVEY §5); BASELINE.json's metric is WER parity on LibriSpeech.

Provenance: step order and rule semantics follow openai-whisper's
``whisper/normalizers`` (MIT), re-implemented from the documented behavior.
The number grammar covers cardinals to trillions, hyphenated tens, ordinals,
decimals ("point five"), currency ("one dollar and fifty cents" -> "$1.50"),
and percent; the British->American spelling table is generated from curated
per-rule stem lists plus an irregular table (~1.8k word forms — openai's
english.json scale; the json itself is not redistributable from this
zero-egress sandbox).
"""

from __future__ import annotations

import re
import unicodedata
from typing import Iterator, List

_ADDITIONAL_DIACRITICS = {
    "œ": "oe", "Œ": "OE", "ø": "o", "Ø": "O", "æ": "ae", "Æ": "AE",
    "ß": "ss", "ẞ": "SS", "đ": "d", "Đ": "D", "ð": "d", "Ð": "D",
    "þ": "th", "Þ": "th", "ł": "l", "Ł": "L",
}


def remove_symbols_and_diacritics(s: str, keep: str = "") -> str:
    """Replace markers/symbols/punctuation with a space, drop diacritics."""
    out = []
    for c in unicodedata.normalize("NFKD", s):
        if c in keep:
            out.append(c)
        elif c in _ADDITIONAL_DIACRITICS:
            out.append(_ADDITIONAL_DIACRITICS[c])
        elif unicodedata.category(c) == "Mn":
            continue
        elif unicodedata.category(c)[0] in "MSP":
            out.append(" ")
        else:
            out.append(c)
    return "".join(out)


def remove_symbols(s: str) -> str:
    """Replace markers/symbols/punctuation with a space, keep diacritics."""
    return "".join(
        " " if unicodedata.category(c)[0] in "MSP" else c
        for c in unicodedata.normalize("NFKC", s)
    )


class BasicTextNormalizer:
    def __init__(self, remove_diacritics: bool = False, split_letters: bool = False):
        self.clean = (
            remove_symbols_and_diacritics if remove_diacritics else remove_symbols
        )
        self.split_letters = split_letters

    def __call__(self, s: str) -> str:
        s = s.lower()
        s = re.sub(r"[<\[][^>\]]*[>\]]", "", s)  # words between brackets
        s = re.sub(r"\(([^)]+?)\)", "", s)       # words between parenthesis
        s = self.clean(s).lower()
        if self.split_letters:
            s = " ".join(re.findall(r"\X", s, re.UNICODE))
        s = re.sub(r"\s+", " ", s)
        return s.strip()


# ---------------------------------------------------------------------------
# Number normalization
# ---------------------------------------------------------------------------

_ONES = {
    "one": 1, "two": 2, "three": 3, "four": 4, "five": 5, "six": 6,
    "seven": 7, "eight": 8, "nine": 9,
    "ten": 10, "eleven": 11, "twelve": 12, "thirteen": 13, "fourteen": 14,
    "fifteen": 15, "sixteen": 16, "seventeen": 17, "eighteen": 18,
    "nineteen": 19,
}
_TENS = {
    "twenty": 20, "thirty": 30, "forty": 40, "fifty": 50,
    "sixty": 60, "seventy": 70, "eighty": 80, "ninety": 90,
}
_MULTIPLIERS = {
    "hundred": 100,
    "thousand": 1_000,
    "million": 1_000_000,
    "billion": 1_000_000_000,
    "trillion": 1_000_000_000_000,
    "quadrillion": 10 ** 15,
}
_ORDINAL_ONES = {
    "first": 1, "second": 2, "third": 3, "fourth": 4, "fifth": 5,
    "sixth": 6, "seventh": 7, "eighth": 8, "ninth": 9, "tenth": 10,
    "eleventh": 11, "twelfth": 12, "thirteenth": 13, "fourteenth": 14,
    "fifteenth": 15, "sixteenth": 16, "seventeenth": 17, "eighteenth": 18,
    "nineteenth": 19,
}
_ORDINAL_TENS = {
    "twentieth": 20, "thirtieth": 30, "fortieth": 40, "fiftieth": 50,
    "sixtieth": 60, "seventieth": 70, "eightieth": 80, "ninetieth": 90,
}
_ORDINAL_MULT = {k + "th": v for k, v in _MULTIPLIERS.items()}
_DIGIT_WORDS = {
    "zero": 0, "oh": 0, "one": 1, "two": 2, "three": 3, "four": 4,
    "five": 5, "six": 6, "seven": 7, "eight": 8, "nine": 9,
}


def _ordinal_suffix(value: int) -> str:
    if 10 <= value % 100 <= 20:
        return "th"
    return {1: "st", 2: "nd", 3: "rd"}.get(value % 10, "th")


class EnglishNumberNormalizer:
    """Spelled-out numbers -> digits: cardinals, ordinals, decimals, currency.

    Grammar follows openai's EnglishNumberNormalizer behavior on the common
    constructs: "one hundred and twenty three" -> "123",
    "twenty-first" -> "21st", "three point one four" -> "3.14",
    "one dollar and fifty cents" -> "$1.50", "fifty percent" -> "50%".
    Plural multiplier words with no quantity ("millions of people") are kept.
    """

    def __call__(self, s: str) -> str:
        s = re.sub(r"(\w)-(\w)", r"\1 \2", s)  # split hyphenated numbers
        words = s.split()
        out: List[str] = []
        i = 0
        n = len(words)
        while i < n:
            value, length, suffix = self._parse_number(words, i)
            if length > 0:
                out.append(f"{value}{suffix}")
                i += length
            else:
                out.append(words[i])
                i += 1
        s = " ".join(out)
        s = self._postprocess_currency(s)
        s = re.sub(r"(\d+) percent\b", r"\1%", s)
        return s

    def _parse_number(self, words: List[str], i: int):
        """Greedy parse from position i. Returns (value, n_words, suffix)."""
        total = 0
        current = 0
        length = 0
        suffix = ""
        started = False
        j = i
        n = len(words)
        while j < n:
            w = words[j]
            if w == "and" and started and j + 1 < n and (
                words[j + 1] in _ONES or words[j + 1] in _TENS
                or words[j + 1] in _ORDINAL_ONES or words[j + 1] in _ORDINAL_TENS
            ):
                j += 1
                length += 1
                continue
            if w in _ONES:
                if current % 100 != 0 and current % 100 < 20 and w in _ONES:
                    break  # "five six" are separate numbers
                current += _ONES[w]
                started = True
            elif w in _TENS:
                if current % 100 != 0:
                    break
                current += _TENS[w]
                started = True
            elif w in _MULTIPLIERS:
                if not started:
                    break  # bare/plural "hundred", "millions of ..."
                if w == "hundred":
                    current = (current or 1) * 100
                else:
                    total += (current or 1) * _MULTIPLIERS[w]
                    current = 0
                started = True
            elif w in _ORDINAL_ONES:
                total += current + _ORDINAL_ONES[w]
                return total, length + 1, _ordinal_suffix(total)
            elif w in _ORDINAL_TENS:
                if current % 100 != 0:
                    break
                total += current + _ORDINAL_TENS[w]
                return total, length + 1, _ordinal_suffix(total)
            elif w in _ORDINAL_MULT:
                # bare ordinal multipliers are unambiguous ("hundredth" ->
                # "100th"), unlike bare plural cardinals ("hundreds of")
                if w == "hundredth":
                    total += (current or 1) * 100
                else:
                    total += (current or 1) * _ORDINAL_MULT[w]
                return total, length + 1, "th"
            elif w == "zero" and not started:
                total = 0
                j += 1
                length += 1
                started = True
                break
            elif w == "point" and started:
                digits, used = self._parse_decimal(words, j + 1)
                if digits:
                    total += current
                    return (f"{total}.{digits}", length + 1 + used, "")
                break
            else:
                break
            j += 1
            length += 1
        if not started:
            return 0, 0, ""
        total += current
        # trailing "point five"
        if not suffix and length and i + length < n and words[i + length] == "point":
            digits, used = self._parse_decimal(words, i + length + 1)
            if digits:
                return (f"{total}.{digits}", length + 1 + used, "")
        return total, length, suffix

    @staticmethod
    def _parse_decimal(words: List[str], i: int):
        digits = []
        j = i
        while j < len(words) and words[j] in _DIGIT_WORDS:
            digits.append(str(_DIGIT_WORDS[words[j]]))
            j += 1
        return "".join(digits), j - i

    @staticmethod
    def _postprocess_currency(s: str) -> str:
        s = re.sub(r"\b(\d+(?:\.\d+)?) dollars?\b", r"$\1", s)
        s = re.sub(r"\b(\d+(?:\.\d+)?) pounds?\b", r"£\1", s)
        s = re.sub(r"\b(\d+(?:\.\d+)?) euros?\b", r"€\1", s)
        s = re.sub(r"\b(\d+(?:\.\d+)?) cents?\b", r"¢\1", s)
        # "$1 and ¢50" -> "$1.50"; "¢50" alone stays.
        def combine(m):
            cents = int(m.group(3))
            return f"{m.group(1)}{m.group(2)}.{cents:02d}"

        s = re.sub(r"([$£€])(\d+) and ¢(\d{1,2})\b", combine, s)
        return s


# ---------------------------------------------------------------------------
# Spelling normalization (British -> American)
# ---------------------------------------------------------------------------
#
# openai's harness uses a ~1.7k-entry english.json; that file is not
# redistributable from this zero-egress sandbox, so the table is GENERATED:
# curated stem lists per morphological rule family, expanded across the
# regular inflections, plus an irregular table. Stems are curated (not
# pattern-matched over arbitrary words) because each family has lexical
# exceptions — e.g. "advertise"/"surprise" never take -ize, "glamour" keeps
# -our in American English — and a false rewrite corrupts WER on correct
# hypotheses. Coverage: ~1.2k word forms.

# verbs whose British -ise/-isation forms take -ize/-ization in American
_ISE_STEMS = (
    "organ recogn real apolog critic emphas minim maxim optim summar special"
    " author capital central character civil colon custom econom energ equal"
    " familiar fantas fertil final formal fossil general harmon hospital"
    " human hypnot ideal immobil immortal immun individual industrial internal"
    " international item jeopard legal legitim liberal local magnet margin"
    " material mechan memor mesmer militar mineral miniatur mobil modern"
    " monopol moral national natural neutral normal ostrac oxid patron penal"
    " personal philosoph plagiar polar popular pressur priorit privat"
    " profession pulver rational revolution romantic sanit satir scandal"
    " scrutin sensational sensit serial social stabil standard steril stigmat"
    " subsid symbol sympath synchron synthes systemat tantal terror theor"
    " traumat trivial tyrann urban util vandal verbal victim visual vocal"
    " vulgar western"
).split()

# British -yse verbs -> American -yze
_YSE_STEMS = "anal paral catal electrol breathal dial hydrol".split()

# -our -> -or nouns (and their derived forms); "glamour" deliberately absent
_OUR_STEMS = (
    "arm behavi cand clam col dol endeav fav ferv flav harb hon hum"
    " lab neighb od parl ranc rig rum savi sav splend succ tum val vap vig"
).split()

# -re -> -er
_RE_STEMS = (
    "cent fib calib lit lust meag met mit nit och sab saltpet scept"
    " sepulch somb spect theat"
).split()

# -ogue -> -og
_OGUE_STEMS = "anal catal dial monol epil prol travel".split()

# -ence -> -ense
_ENCE_STEMS = ("def", "off", "pret", "lic")


def _build_spellings() -> dict:
    m = {}

    def put(k, v):
        if k != v:
            m[k] = v

    for s in _ISE_STEMS:
        for suf_b, suf_a in (
            ("ise", "ize"), ("ises", "izes"), ("ised", "ized"),
            ("ising", "izing"), ("iser", "izer"), ("isers", "izers"),
            ("isation", "ization"), ("isations", "izations"),
            ("isable", "izable"),
        ):
            put(s + suf_b, s + suf_a)
    for s in _YSE_STEMS:
        for suf_b, suf_a in (
            ("yse", "yze"), ("yses", "yzes"), ("ysed", "yzed"),
            ("ysing", "yzing"), ("yser", "yzer"), ("ysers", "yzers"),
        ):
            put(s + suf_b, s + suf_a)
    for s in _OUR_STEMS:
        for suf_b, suf_a in (
            ("our", "or"), ("ours", "ors"), ("oured", "ored"),
            ("ouring", "oring"), ("ourite", "orite"), ("ourites", "orites"),
            ("ourful", "orful"), ("ourless", "orless"), ("ourable", "orable"),
            ("ourably", "orably"), ("ourful", "orful"),
        ):
            put(s + suf_b, s + suf_a)
    for s in _RE_STEMS:
        for suf_b, suf_a in (("re", "er"), ("res", "ers")):
            put(s + suf_b, s + suf_a)
    for s in _OGUE_STEMS:
        for suf_b, suf_a in (("ogue", "og"), ("ogues", "ogs")):
            put(s + suf_b, s + suf_a)
    for s in _ENCE_STEMS:
        for suf_b, suf_a in (("ence", "ense"), ("ences", "enses")):
            put(s + suf_b, s + suf_a)

    # single-l British inflections of -el/-al verbs -> American single l is
    # the reverse; British doubles the l: travelled -> traveled
    for stem in (
        "travel cancel label model level signal equal marvel marshal quarrel"
        " counsel fuel duel grovel shovel shrivel snivel swivel revel rival"
        " tunnel funnel channel panel pedal dial spiral total towel unravel"
        " carol chisel cudgel"
    ).split():
        put(stem + "led", stem + "ed")
        put(stem + "ling", stem + "ing")
        put(stem + "ler", stem + "er")
        put(stem + "lers", stem + "ers")
    # -ae-/-oe- -> -e-
    for b, a in (
        ("anaemia", "anemia"), ("anaemic", "anemic"),
        ("anaesthesia", "anesthesia"), ("anaesthetic", "anesthetic"),
        ("anaesthetist", "anesthetist"), ("encyclopaedia", "encyclopedia"),
        ("encyclopaedias", "encyclopedias"), ("leukaemia", "leukemia"),
        ("mediaeval", "medieval"), ("oesophagus", "esophagus"),
        ("oestrogen", "estrogen"), ("diarrhoea", "diarrhea"),
        ("foetus", "fetus"), ("foetal", "fetal"),
        ("paediatric", "pediatric"), ("paediatrician", "pediatrician"),
        ("orthopaedic", "orthopedic"), ("archaeology", "archeology"),
        ("archaeologist", "archeologist"), ("gynaecology", "gynecology"),
        ("haemorrhage", "hemorrhage"), ("haemoglobin", "hemoglobin"),
        ("manoeuvre", "maneuver"), ("manoeuvres", "maneuvers"),
        ("manoeuvring", "maneuvering"), ("amoeba", "ameba"),
    ):
        put(b, a)
    # irregulars / one-offs
    for b, a in (
        ("grey", "gray"), ("greyer", "grayer"), ("greyest", "grayest"),
        ("greyish", "grayish"), ("tyre", "tire"), ("tyres", "tires"),
        ("kerb", "curb"), ("kerbs", "curbs"), ("plough", "plow"),
        ("ploughs", "plows"), ("ploughed", "plowed"),
        ("ploughing", "plowing"), ("cheque", "check"), ("cheques", "checks"),
        ("chequered", "checkered"), ("draught", "draft"),
        ("draughts", "drafts"), ("draughty", "drafty"),
        ("programme", "program"), ("programmes", "programs"),
        ("ageing", "aging"), ("storey", "story"), ("storeys", "stories"),
        ("aluminium", "aluminum"), ("moustache", "mustache"),
        ("moustaches", "mustaches"), ("pyjamas", "pajamas"),
        ("sceptic", "skeptic"), ("sceptics", "skeptics"),
        ("sceptical", "skeptical"), ("scepticism", "skepticism"),
        ("whisky", "whiskey"), ("gaol", "jail"), ("aeroplane", "airplane"),
        ("aeroplanes", "airplanes"), ("gramme", "gram"),
        ("grammes", "grams"), ("kilogramme", "kilogram"),
        ("kilogrammes", "kilograms"), ("practise", "practice"),
        ("practised", "practiced"), ("practising", "practicing"),
        ("enrol", "enroll"), ("enrols", "enrolls"),
        ("enrolment", "enrollment"), ("enrolments", "enrollments"),
        ("fulfil", "fulfill"), ("fulfils", "fulfills"),
        ("fulfilment", "fulfillment"), ("instalment", "installment"),
        ("instalments", "installments"), ("skilful", "skillful"),
        ("skilfully", "skillfully"), ("wilful", "willful"),
        ("wilfully", "willfully"), ("smoulder", "smolder"),
        ("smouldering", "smoldering"), ("mould", "mold"),
        ("moulds", "molds"), ("moulded", "molded"), ("mouldy", "moldy"),
        ("moult", "molt"), ("artefact", "artifact"),
        ("artefacts", "artifacts"), ("marvellous", "marvelous"),
        ("marvellously", "marvelously"), ("jewellery", "jewelry"),
        ("jeweller", "jeweler"), ("jewellers", "jewelers"),
        ("counsellor", "counselor"), ("counsellors", "counselors"),
        ("woollen", "woolen"), ("woolly", "wooly"),
        ("sulphur", "sulfur"), ("sulphuric", "sulfuric"),
        ("omelette", "omelet"), ("omelettes", "omelets"),
        ("doughnut", "donut"), ("doughnuts", "donuts"),
        ("furore", "furor"), ("cosy", "cozy"), ("cosier", "cozier"),
        ("cosiest", "coziest"), ("snowplough", "snowplow"),
        ("tranquillity", "tranquility"), ("tranquilliser", "tranquilizer"),
        ("distil", "distill"), ("distils", "distills"),
        ("instil", "instill"), ("instils", "instills"),
        ("appal", "appall"), ("appals", "appalls"),
        ("carburettor", "carburetor"), ("connexion", "connection"),
        ("grille", "grill"), ("plimsoll", "plimsol"),
        ("speciality", "specialty"), ("specialities", "specialties"),
        ("aeon", "eon"), ("aeons", "eons"), ("annexe", "annex"),
        ("apologise", "apologize"), ("arbour", "arbor"),
        ("ardour", "ardor"), ("armoury", "armory"),
        ("behaviourism", "behaviorism"), ("belabour", "belabor"),
        ("calliper", "caliper"), ("ceruse", "ceruse"),
        ("clangour", "clangor"), ("demeanour", "demeanor"),
        ("enamoured", "enamored"), ("enamour", "enamor"),
        ("endeavoured", "endeavored"), ("favourably", "favorably"),
        ("favourable", "favorable"), ("unfavourable", "unfavorable"),
        ("honourable", "honorable"), ("honourably", "honorably"),
        ("humoured", "humored"), ("laboured", "labored"),
        ("labourer", "laborer"), ("labourers", "laborers"),
        ("neighbourhood", "neighborhood"),
        ("neighbourhoods", "neighborhoods"),
        ("neighbouring", "neighboring"), ("odours", "odors"),
        ("rigour", "rigor"), ("rigours", "rigors"),
        ("saviours", "saviors"), ("savoury", "savory"),
        ("unsavoury", "unsavory"), ("vapours", "vapors"),
        ("harboured", "harbored"), ("harbours", "harbors"),
        ("watercolour", "watercolor"), ("watercolours", "watercolors"),
        ("dishonour", "dishonor"), ("dishonoured", "dishonored"),
        ("dishonourable", "dishonorable"),
        ("discolour", "discolor"), ("discoloured", "discolored"),
        ("discolouration", "discoloration"),
        ("humourless", "humorless"), ("colourful", "colorful"),
        ("colourfully", "colorfully"), ("colourless", "colorless"),
        ("colouring", "coloring"), ("colourings", "colorings"),
        ("multicoloured", "multicolored"),
        ("centred", "centered"), ("centring", "centering"),
        ("centrepiece", "centerpiece"), ("centrepieces", "centerpieces"),
        ("centimetre", "centimeter"), ("centimetres", "centimeters"),
        ("kilometre", "kilometer"), ("kilometres", "kilometers"),
        ("millimetre", "millimeter"), ("millimetres", "millimeters"),
        ("micrometre", "micrometer"), ("micrometres", "micrometers"),
        ("decilitre", "deciliter"), ("decilitres", "deciliters"),
        ("millilitre", "milliliter"), ("millilitres", "milliliters"),
        ("theatregoer", "theatergoer"), ("amphitheatre", "amphitheater"),
        ("amphitheatres", "amphitheaters"),
        ("defenceless", "defenseless"), ("offensive", "offensive"),
        ("licenced", "licensed"), ("pretences", "pretenses"),
        ("practises", "practices"), ("analogue", "analog"),
        ("analogues", "analogs"), ("homologue", "homolog"),
        ("catalogued", "cataloged"), ("cataloguing", "cataloging"),
        ("dialled", "dialed"), ("dialling", "dialing"),
        ("initialled", "initialed"), ("initialling", "initialing"),
        ("focussed", "focused"), ("focusses", "focuses"),
        ("focussing", "focusing"), ("biassed", "biased"),
        ("worshipped", "worshiped"), ("worshipping", "worshiping"),
        ("kidnapped", "kidnaped"), ("programmed", "programed"),
    ):
        put(b, a)
    return m


_SPELLINGS = _build_spellings()


class EnglishSpellingNormalizer:
    def __init__(self):
        self.mapping = _SPELLINGS

    def __call__(self, s: str) -> str:
        return " ".join(self.mapping.get(w, w) for w in s.split())


class EnglishTextNormalizer:
    """openai's English normalization stack (step order preserved)."""

    def __init__(self):
        self.ignore_patterns = r"\b(hmm|mm|mhm|mmm|uh|um)\b"
        self.replacers = {
            # common contractions
            r"\bwon't\b": "will not",
            r"\bcan't\b": "can not",
            r"\blet's\b": "let us",
            r"\bain't\b": "aint",
            r"\by'all\b": "you all",
            r"\bwanna\b": "want to",
            r"\bgotta\b": "got to",
            r"\bgonna\b": "going to",
            r"\bi'ma\b": "i am going to",
            r"\bimma\b": "i am going to",
            r"\bwoulda\b": "would have",
            r"\bcoulda\b": "could have",
            r"\bshoulda\b": "should have",
            r"\bma'am\b": "madam",
            # contracted titles
            r"\bmr\b": "mister ",
            r"\bmrs\b": "missus ",
            r"\bst\b": "saint ",
            r"\bdr\b": "doctor ",
            r"\bprof\b": "professor ",
            r"\bcapt\b": "captain ",
            r"\bgov\b": "governor ",
            r"\bald\b": "alderman ",
            r"\bgen\b": "general ",
            r"\bsen\b": "senator ",
            r"\brep\b": "representative ",
            r"\bpres\b": "president ",
            r"\brev\b": "reverend ",
            r"\bhon\b": "honorable ",
            r"\basst\b": "assistant ",
            r"\bassoc\b": "associate ",
            r"\blt\b": "lieutenant ",
            r"\bcol\b": "colonel ",
            r"\bjr\b": "junior ",
            r"\bsr\b": "senior ",
            r"\besq\b": "esquire ",
            # perfect tenses
            r"'d been\b": " had been",
            r"'s been\b": " has been",
            r"'d gone\b": " had gone",
            r"'s gone\b": " has gone",
            r"'d done\b": " had done",
            r"'s got\b": " has got",
            # general contractions
            r"n't\b": " not",
            r"'re\b": " are",
            r"'s\b": " is",
            r"'d\b": " would",
            r"'ll\b": " will",
            r"'t\b": " not",
            r"'ve\b": " have",
            r"'m\b": " am",
        }
        self.standardize_numbers = EnglishNumberNormalizer()
        self.standardize_spellings = EnglishSpellingNormalizer()

    def __call__(self, s: str) -> str:
        s = s.lower()
        s = re.sub(r"[<\[][^>\]]*[>\]]", "", s)
        s = re.sub(r"\(([^)]+?)\)", "", s)
        s = re.sub(self.ignore_patterns, "", s)
        s = re.sub(r"\s+'", "'", s)  # space before an apostrophe
        for pattern, replacement in self.replacers.items():
            s = re.sub(pattern, replacement, s)
        s = re.sub(r"(\d),(\d)", r"\1\2", s)      # commas between digits
        s = re.sub(r"\.([^0-9]|$)", r" \1", s)    # periods not before digits
        s = remove_symbols_and_diacritics(s, keep=".%$¢€£'")
        s = self.standardize_numbers(s)
        s = self.standardize_spellings(s)
        s = re.sub(r"'", "", s)  # drop remaining apostrophes
        # symbols kept for numeric context only
        s = re.sub(r"[.$¢€£]([^0-9])", r" \1", s)
        s = re.sub(r"([^0-9])%", r"\1 ", s)
        s = re.sub(r"\s+", " ", s)
        return s.strip()
