"""English cleaner pipeline tests (reference text/cleaners.py:94-101 +
en_numbers.py behavior, implemented without inflect/unidecode)."""

from text2speech_tpu.text.cleaners import english_cleaners
from text2speech_tpu.text.english import (
    normalize_numbers,
    number_to_ordinal_words,
    number_to_words,
    to_ascii,
)


def test_number_to_words():
    assert number_to_words(0) == "zero"
    assert number_to_words(13) == "thirteen"
    assert number_to_words(42, andword="") == "forty-two"
    assert number_to_words(105) == "one hundred and five"
    assert number_to_words(105, andword="") == "one hundred five"
    assert number_to_words(1234, andword="") == (
        "one thousand two hundred thirty-four"
    )
    assert number_to_words(1000000, andword="") == "one million"


def test_ordinals():
    assert number_to_ordinal_words(1) == "first"
    assert number_to_ordinal_words(2) == "second"
    assert number_to_ordinal_words(3) == "third"
    assert number_to_ordinal_words(12) == "twelfth"
    assert number_to_ordinal_words(21) == "twenty-first"
    assert number_to_ordinal_words(30) == "thirtieth"
    assert number_to_ordinal_words(100) == "one hundred th".replace(" th", "th")


def test_normalize_numbers_pipeline():
    # comma removal; 1001-2999 reads year-style (reference en_numbers.py:47-59)
    assert normalize_numbers("1,234 things") == "twelve thirty-four things"
    assert normalize_numbers("4,234 things") == (
        "four thousand two hundred thirty-four things"
    )
    # dollars (digit text from _expand_dollars is expanded by the final
    # number pass, like the reference pipeline)
    assert normalize_numbers("$1.50") == "one dollar, fifty cents"
    assert normalize_numbers("$2") == "two dollars"
    # pounds
    assert normalize_numbers("£5") == "five pounds"
    # decimal
    assert normalize_numbers("pi is 3.14") == "pi is three point fourteen"  # ref reads decimals as cardinals
    # ordinal suffix
    assert normalize_numbers("the 3rd time") == "the third time"
    # year-style reading
    assert normalize_numbers("in 1999") == "in nineteen ninety-nine"
    assert normalize_numbers("in 2000") == "in two thousand"
    assert normalize_numbers("in 2005") == "in two thousand five"
    assert normalize_numbers("in 1905") == "in nineteen oh five"


def test_english_cleaners_pipeline():
    out = english_cleaners("Dr. Smith bought 2 apples for $1.50!")
    assert out == "doctor smith bought two apples for one dollar, fifty cents!"


def test_to_ascii():
    assert to_ascii("café") == "cafe"
    assert to_ascii("naïve") == "naive"
