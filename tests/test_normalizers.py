"""Normalizer parity vs HF's EnglishTextNormalizer / BasicTextNormalizer."""

import pytest

from distil_whisper_tpu.tokenizer.normalizers import (
    BasicTextNormalizer, EnglishTextNormalizer, EnglishNumberNormalizer,
)

BATTERY = [
    "The quick brown fox!",
    "I won't go, he can't either… it's £5.50 and 20%",
    "one hundred and fifty three people",
    "twenty one dollars and seven cents",
    "he was born in nineteen eighty four",
    "it's the fifth time, triple seven, double o seven",
    "three point one four one five nine",
    "Mr. Brown met Mrs. O'Neill at St. Mary's",
    "café naïve façade œuvre",
    "[inaudible] hello (noise) world",
    "2.5 million dollars",
    "one and a half hours",
    "minus five degrees, plus three",
    "a hundred thousand",
    "seventy five per cent of voters",
    "CHAPTER TWENTY ONE",
    "it costs $1,234.56",
    "the 1st, 2nd, 3rd and 4th",
    "umm uh hello mm hmm",
    "they're we've i'm you'll she'd",
    "one two three four five six seven eight nine ten",
    "fifty seven thousand and twelve",
    "two million three hundred thousand",
    "the nineteen sixties and seventies",
    "a dollar and fifty cents",
    "number 0 and zero and oh",
    "let's go y'all gonna wanna gotta",
    "he'd been there, she's gone, it's got worse",
    "I paid €20 yesterday",
    "five percent",
    "half past two",
    "ONE HUNDRED AND ONE DALMATIANS",
    "forty-two",
    "7 11 store on 5th avenue",
]


@pytest.fixture(scope="module")
def hf_english():
    from transformers.models.whisper.english_normalizer import EnglishTextNormalizer
    return EnglishTextNormalizer({})


@pytest.fixture(scope="module")
def hf_basic():
    from transformers.models.whisper.english_normalizer import BasicTextNormalizer
    return BasicTextNormalizer()


def test_english_normalizer_parity(hf_english):
    ours = EnglishTextNormalizer({})
    for text in BATTERY:
        assert ours(text) == hf_english(text), f"mismatch on {text!r}"


def test_basic_normalizer_parity(hf_basic):
    ours = BasicTextNormalizer()
    for text in BATTERY:
        assert ours(text) == hf_basic(text), f"mismatch on {text!r}"


def test_basic_normalizer_diacritics():
    from transformers.models.whisper.english_normalizer import BasicTextNormalizer as HF
    ours = BasicTextNormalizer(remove_diacritics=True)
    theirs = HF(remove_diacritics=True)
    for text in ["café naïve łódź øre ß straße", "ĉu vi paròlas"]:
        assert ours(text) == theirs(text)


def test_spelling_mapping():
    ours = EnglishTextNormalizer({"colour": "color", "realise": "realize"})
    assert ours("the colour we realise") == "the color we realize"


def test_number_fsm_fuzz():
    """Random number-word soup: our FSM must agree with HF's everywhere."""
    import random
    from transformers.models.whisper.english_normalizer import EnglishNumberNormalizer as HF
    ours = EnglishNumberNormalizer()
    theirs = HF()
    words = ("one two three nine ten eleven nineteen twenty ninety hundred "
             "thousand million point and a half double triple o oh zero "
             "dollars cents pounds percent per cent minus plus first seventh "
             "twentieth hundredth fifth cat 3 2.5 40 the").split()
    rng = random.Random(0)
    for _ in range(300):
        text = " ".join(rng.choices(words, k=rng.randint(1, 12)))
        assert ours(text) == theirs(text), f"mismatch on {text!r}"


def test_full_normalizer_fuzz(hf_english, hf_basic):
    """Random mixed-text soup through the FULL English + Basic normalizers
    (contractions, currency, punctuation, fillers, abbreviations, numbers)
    — must agree with HF everywhere, not just on the number FSM."""
    import random
    ours_en = EnglishTextNormalizer({})
    ours_basic = BasicTextNormalizer()
    words = ("I won't can't it's they're we've you'll she'd y'all gonna "
             "Mr. Mrs. Dr. St. o'clock $5 £3.50 €20 1,234.56 20% per cent "
             "umm uh hmm mm [noise] (laughs) twenty one hundred and seven "
             "point five first 3rd o seven double cat dog JUMPED Over… "
             "café-naïve; didn't CHAPTER: \"quote\" it'd who's won't-go "
             "a half million o'five 'tis ain't shan't ma'am").split()
    rng = random.Random(42)
    for _ in range(400):
        text = " ".join(rng.choices(words, k=rng.randint(1, 16)))
        assert ours_en(text) == hf_english(text), f"EN mismatch on {text!r}"
        assert ours_basic(text) == hf_basic(text), f"basic mismatch {text!r}"


def test_number_normalizer_direct(hf_english):
    """Number FSM edge cases straight through EnglishNumberNormalizer."""
    from transformers.models.whisper.english_normalizer import EnglishNumberNormalizer as HF
    ours = EnglishNumberNormalizer()
    theirs = HF()
    cases = [
        "one",
        "ones and twos",
        "one thousand",
        "twenty twenty two",
        "nine eleven",
        "double twenty",
        "one point five billion",
        "thirty first",
        "hundredth time",
        "a million and one",
        "zero zero seven",
        "sixty six",
        "ten oh four",
        "one two point five",
        "three dollars",
        "dollars",
        "point five",
        "1.5 million",
        "50s 60s 70s",
        "first second third",
    ]
    for text in cases:
        assert ours(text) == theirs(text), f"mismatch on {text!r}"
