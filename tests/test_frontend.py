"""Frontend text tests: number normalization (reference semantics,
conditioning.py:70-136), symbol table, tokenizer left-padding, phonemize
tiers."""

from zonos_vibes_tpu.frontend.phonemize import backend_name, phonemize
from zonos_vibes_tpu.frontend.text import (
    BOS_ID,
    EOS_ID,
    PAD_ID,
    SYMBOLS,
    UNK_ID,
    VOCAB_SIZE,
    get_symbol_ids,
    normalize_numbers,
    number_to_words,
    ordinal_words,
    tokenize_phonemes,
)


def test_symbol_table_matches_reference():
    # 4 specials + punctuation(25) + letters(52) + IPA letters
    assert VOCAB_SIZE == 4 + len(SYMBOLS)
    ids = get_symbol_ids("abz")
    assert all(i >= 4 for i in ids)
    assert get_symbol_ids("☃") == [UNK_ID]  # snowman -> UNK
    # IPA chars resolve
    assert get_symbol_ids("ɑ")[0] >= 4


def test_tokenize_left_pad():
    ids, lengths = tokenize_phonemes(["abc", "a"])
    assert lengths == [5, 3]
    assert ids[0][0] == BOS_ID and ids[0][-1] == EOS_ID
    assert ids[1][:2] == [PAD_ID, PAD_ID]  # LEFT pad
    assert ids[1][2] == BOS_ID and ids[1][-1] == EOS_ID


def test_number_to_words():
    assert number_to_words(0) == "zero"
    assert number_to_words(15) == "fifteen"
    assert number_to_words(42) == "forty-two"
    assert number_to_words(100, andword="") == "one hundred"
    assert number_to_words(123, andword="") == "one hundred twenty-three"
    assert number_to_words(123) == "one hundred and twenty-three"
    assert (
        number_to_words(1234567, andword="")
        == "one million, two hundred thirty-four thousand, five hundred sixty-seven"
    )


def test_ordinals():
    assert ordinal_words(1) == "first"
    assert ordinal_words(2) == "second"
    assert ordinal_words(3) == "third"
    assert ordinal_words(12) == "twelfth"
    assert ordinal_words(21) == "twenty-first"
    assert ordinal_words(30) == "thirtieth"
    assert ordinal_words(100) == "one hundredth"


def test_normalize_numbers_pipeline():
    assert normalize_numbers("I have 3 cats") == "I have three cats"
    # 1234 lands in the 1000<n<3000 year branch (reference
    # conditioning.py:115-125): grouped-pair expansion.
    assert normalize_numbers("1,234 items") == "twelve thirty-four items"
    assert normalize_numbers("5,000 items") == "five thousand items"
    assert normalize_numbers("$5") == "five dollars"
    assert normalize_numbers("$1.50") == "one dollar, fifty cents"


def test_normalize_pounds_decimal_ordinal():
    assert normalize_numbers("£20") == "twenty pounds"
    # Reference expands "3 point 14" numbers wholesale -> "fourteen"
    # (conditioning.py:85-87 then 114-126).
    assert normalize_numbers("3.14") == "three point fourteen"
    assert normalize_numbers("the 2nd time") == "the second time"


def test_year_expansion():
    assert normalize_numbers("in 2000") == "in two thousand"
    assert normalize_numbers("in 2005") == "in two thousand five"
    assert normalize_numbers("in 1999") == "in nineteen ninety-nine"
    assert normalize_numbers("in 1900") == "in nineteen hundred"
    assert normalize_numbers("in 1904") == "in nineteen oh four"


def test_jp_normalization_routing():
    """clean() routes ja -> JP normalizer (reference conditioning.py:178-186);
    without the optional SudachiPy/kanjize stack the gated fallback still
    applies NFKC (full-width forms fold to ASCII)."""
    from zonos_vibes_tpu.frontend.text import clean

    out = clean(["１２３ＡＢＣ", "123 pounds"], ["ja", "en-us"])
    assert "123" in out[0] or "百二十三" in out[0]  # NFKC fallback or kanji
    assert "ＡＢＣ" not in out[0]  # full-width folded either way
    assert "one hundred" in out[1] or "hundred" in out[1]


def test_phonemize_deterministic():
    tier = backend_name()
    assert tier in ("phonemizer", "espeak-ng", "fallback")
    out1 = phonemize(["Hello world"], ["en-us"])
    out2 = phonemize(["Hello world"], ["en-us"])
    assert out1 == out2
    assert len(out1) == 1 and len(out1[0]) > 0
    # Output tokenizes into the symbol table with mostly known ids.
    ids = get_symbol_ids(out1[0])
    known = sum(1 for i in ids if i != UNK_ID)
    assert known / len(ids) > 0.9


def test_number_to_kanji_native():
    """Native digits->kanji fallback (kanjize semantics, reference
    conditioning.py:171-175) used when the optional JP stack is absent."""
    from zonos_vibes_tpu.frontend.text import number_to_kanji, normalize_jp_text

    cases = {
        0: "〇", 1: "一", 10: "十", 11: "十一", 21: "二十一",
        100: "百", 111: "百十一", 1000: "千", 2024: "二千二十四",
        10000: "一万", 12345: "一万二千三百四十五",
        100000000: "一億", 1000000000000: "一兆",
        20300405: "二千三十万四百五",
    }
    for n, k in cases.items():
        assert number_to_kanji(n) == k, (n, number_to_kanji(n), k)
    # Full-width digits normalize via NFKC first, then convert.
    assert "二千二十四" in normalize_jp_text("２０２４年です")
