from self_attention_tacotron_tpu.text import (
    basic_cleaners, english_cleaners, text_to_sequence, sequence_to_text,
    transliteration_cleaners,
)
from self_attention_tacotron_tpu.text.numbers_norm import (
    normalize_numbers, number_to_words, ordinal_to_words,
)
from self_attention_tacotron_tpu.text.phoneset import Phoneset, BUILTIN_PHONESETS
from self_attention_tacotron_tpu.text.flite import clean_phone_string


def test_symbol_ids_reserve_zero_for_silence():
    seq, clean = text_to_sequence("ABa", basic_cleaners)
    # basic cleaner lowercases: 'aba' -> a=27, b=28 (1-based after 26 uppercase)
    assert 0 not in seq
    assert clean == "aba"
    assert sequence_to_text(seq) == "aba"


def test_number_to_words_engine():
    assert number_to_words(0) == "zero"
    assert number_to_words(7) == "seven"
    assert number_to_words(15) == "fifteen"
    assert number_to_words(42) == "forty-two"
    assert number_to_words(100) == "one hundred"
    assert number_to_words(101) == "one hundred and one"
    assert number_to_words(101, andword="") == "one hundred one"
    assert number_to_words(1234567) == "one million, two hundred thirty-four thousand, five hundred and sixty-seven"


def test_ordinals():
    assert ordinal_to_words(1) == "first"
    assert ordinal_to_words(2) == "second"
    assert ordinal_to_words(3) == "third"
    assert ordinal_to_words(4) == "fourth"
    assert ordinal_to_words(12) == "twelfth"
    assert ordinal_to_words(20) == "twentieth"
    assert ordinal_to_words(21) == "twenty-first"
    assert ordinal_to_words(100) == "one hundredth"


def test_normalize_numbers_reference_cases():
    # reference: preprocess/numbers.py behavior
    assert normalize_numbers("1,000") == "one thousand"
    assert normalize_numbers("$2.50") == "two dollars, fifty cents"
    assert normalize_numbers("$1") == "one dollar"
    assert normalize_numbers("3.14") == "three point fourteen"
    assert normalize_numbers("21st") == "twenty-first"
    assert normalize_numbers("£5") == "five pounds"
    assert normalize_numbers("in 1984") == "in nineteen eighty-four"
    assert normalize_numbers("in 2000") == "in two thousand"
    assert normalize_numbers("in 2005") == "in two thousand five"
    assert normalize_numbers("in 1900") == "in nineteen hundred"


def test_english_cleaners_pipeline():
    out = english_cleaners("Dr. Smith bought 2 apples for $3.")
    assert out == "doctor smith bought two apples for three dollars."


def test_transliteration():
    assert transliteration_cleaners("Café  Zürich") == "cafe zurich"
    assert transliteration_cleaners("Æsir") == "aesir"


def test_phonesets_match_reference_inventories():
    # reference: extensions/phoneset/*.json
    assert len(BUILTIN_PHONESETS["us"]) == 50
    assert len(BUILTIN_PHONESETS["cmu"]) == 116
    assert len(BUILTIN_PHONESETS["uscmu"]) == 166
    ps = Phoneset("us")
    assert ps.phone_to_id("aa") == 0
    assert ps.phone_to_id("brth") == 49
    assert ps.id_to_phone(0) == "aa"
    # duplicate phones map to their LAST id (reference dict-comprehension semantics)
    uscmu = Phoneset("uscmu")
    assert uscmu.phone_to_id("pau") > 100


def test_clean_phone_string():
    # reference: utils/tfrecord.py write_phones semantics
    assert clean_phone_string("pau hh ax l ow pau \n") == "hh ax l ow"
