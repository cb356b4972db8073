# coding: utf-8
"""Text-frontend golden tests.

Golden values in ``golden/text_golden.json`` were produced by executing the
reference implementation (/root/reference/text) on CPU; they pin normalizer,
tokenizer, and symbol-ID behavior (SURVEY.md §4 item 1).
"""

import json

import numpy as np
import pytest

from tests.conftest import GOLDEN_DIR
from text2speech_tpu.text import (
    EOS_ID,
    N_SYMBOLS,
    PAD_ID,
    encode_batch,
    sequence_to_text,
    symbols,
    text_to_sequence,
)
from text2speech_tpu.text import korean
from text2speech_tpu.text.hangul import (
    compose_syllable,
    decompose_syllable,
    h2j,
    jamo_to_hangul_text,
)


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN_DIR / "text_golden.json", encoding="utf-8") as f:
        return json.load(f)


def test_symbol_table_layout():
    # 80 symbols; documented ID map (reference text/symbols.py:19-28).
    assert N_SYMBOLS == 80
    assert symbols[0] == "_" and symbols[1] == "~"
    assert symbols[2] == "ᄀ"       # ᄀ
    assert symbols[21] == "ᅡ"      # ᅡ
    assert symbols[42] == "ᆨ"      # ᆨ
    assert symbols[69] == "!"
    assert symbols[79] == " "
    assert PAD_ID == 0 and EOS_ID == 1


def test_hangul_roundtrip():
    for ch in "안녕하세요가힣깎":
        jamos = decompose_syllable(ch)
        assert compose_syllable(*jamos) == ch
    assert h2j("존경") == "존경"
    assert jamo_to_hangul_text(h2j("존경하는 사람.")) == "존경하는 사람."


def test_normalize_golden(golden):
    for src, expected in golden["normalize"].items():
        assert korean.normalize(src) == expected, src


def test_tokenize_ids_golden(golden):
    for src, expected in golden["tokenize_ids"].items():
        assert korean.tokenize(src, as_id=True) == expected, src


def test_text_to_sequence_golden(golden):
    for src, expected in golden["text_to_sequence"].items():
        got = text_to_sequence(src)
        assert got.dtype == np.int32
        assert got.tolist() == expected, src


def test_sequence_to_text_golden(golden):
    for src, seq in golden["text_to_sequence"].items():
        expected = golden["sequence_to_text"][src]
        assert sequence_to_text(seq, combine_jamo=True) == expected


def test_number_to_korean_signed_positive():
    # Reference crash-bug (korean.py:288-289 chokes on '+'): fixed here —
    # positive-signed numbers must expand, not raise (SURVEY.md §7.1).
    assert korean.number_to_korean("+5") == "플러스 오"
    assert korean.normalize("+5%") == "플러스 오퍼센트"


def test_eos_appended_and_oov_dropped():
    seq = text_to_sequence("안녕하세요")
    assert seq[-1] == EOS_ID
    # OOV latin chars are dropped, not crashed on.
    seq2 = text_to_sequence("안녕 zz하세요")
    assert EOS_ID == seq2[-1]
    assert all(0 <= s < N_SYMBOLS for s in seq2)


def test_encode_batch_padding():
    ids, lengths = encode_batch(["안녕하세요", "존경하는 사람과 함께 갑니다"])
    assert ids.shape[0] == 2
    assert ids.shape[1] % 32 == 0
    assert (ids[0, lengths[0]:] == PAD_ID).all()
    assert ids[0, lengths[0] - 1] == EOS_ID
    # fixed pad_to
    ids2, _ = encode_batch(["안녕"], pad_to=64)
    assert ids2.shape == (1, 64)


def test_arpabet_passthrough():
    seq = text_to_sequence("{HH AW}")
    # '@HH'/'@AW' are OOV for the Korean table -> dropped, EOS remains.
    assert seq.tolist()[-1] == EOS_ID


def test_split_sentences_quoted_spans_and_abbreviations():
    """Golden behavior for the punkt-replacement splitter
    (reference korean.py:211-216): multi-sentence quoted spans split,
    capitalized abbreviations suppress a split, ordinary lowercase
    sentence-final words ('...said no.') do NOT (ADVICE r2: the splitter
    must be case-sensitive over No/St/Vol)."""
    from text2speech_tpu.text import split_sentences

    # plain multi-sentence
    assert split_sentences("안녕하세요. 반갑습니다! 잘 지내시죠?") == [
        "안녕하세요.", "반갑습니다!", "잘 지내시죠?",
    ]
    # closing quote stays with its sentence; the quoted span splits
    assert split_sentences('그는 "간다. 지금 간다." 라고 말했다.') == [
        '그는 "간다.', '지금 간다."', "라고 말했다.",
    ]
    # capitalized abbreviation + single-letter initial: no split
    assert split_sentences("Dr. Kim came. He left.") == [
        "Dr. Kim came.", "He left.",
    ]
    assert split_sentences("J. Smith arrived. Then left.") == [
        "J. Smith arrived.", "Then left.",
    ]
    # lowercase 'no.' is a word, not an abbreviation -> split happens
    assert split_sentences("She said no. He agreed.") == [
        "She said no.", "He agreed.",
    ]
    # but capitalized 'No. 5' is the abbreviation form -> no split
    assert split_sentences("See No. 5 below. Done.") == [
        "See No. 5 below.", "Done.",
    ]
