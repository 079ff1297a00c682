"""Text normalizer + tokenizer tests (rule semantics per reference magpie.cpp:153-495)."""

from magpie_tts_tpu.text.normalize import (normalize_text, number_to_words,
                                           ordinal_to_words, year_to_words)
from magpie_tts_tpu.text.tokenizer import MagpieTokenizer


def test_number_to_words():
    assert number_to_words(0) == "zero"
    assert number_to_words(7) == "seven"
    assert number_to_words(13) == "thirteen"
    assert number_to_words(42) == "forty two"
    assert number_to_words(70) == "seventy"
    assert number_to_words(101) == "one hundred and one"
    assert number_to_words(999) == "nine hundred and ninety nine"
    assert number_to_words(1000) == "one thousand"
    assert number_to_words(5231) == "five thousand two hundred and thirty one"
    assert number_to_words(1000000) == "one million"
    assert number_to_words(2500000) == "two million five hundred thousand"
    assert number_to_words(3000000000) == "three billion"
    assert number_to_words(-5) == "minus five"


def test_year_to_words():
    assert year_to_words(2024) == "twenty twenty four"
    assert year_to_words(1900) == "nineteen hundred"
    assert year_to_words(2001) == "two thousand one"
    assert year_to_words(1984) == "nineteen eighty four"


def test_ordinal_to_words():
    assert ordinal_to_words(1) == "first"
    assert ordinal_to_words(2) == "second"
    assert ordinal_to_words(3) == "third"
    assert ordinal_to_words(12) == "twelfth"
    assert ordinal_to_words(13) == "thirteenth"
    assert ordinal_to_words(20) == "twentieth"
    assert ordinal_to_words(21) == "twenty first"
    assert ordinal_to_words(23) == "twenty third"
    assert ordinal_to_words(30) == "thirtieth"
    assert ordinal_to_words(44) == "forty fourth"
    assert ordinal_to_words(100) == "one hundredth"


def test_normalize_text():
    assert normalize_text("I have 3 cats") == "I have three cats"
    assert normalize_text("$50 bill") == "fifty dollars bill"
    assert normalize_text("$1") == "one dollar"
    assert normalize_text("50% off") == "fifty percent off"
    assert normalize_text("-10 degrees") == "minus ten degrees"
    assert normalize_text("the 23rd of May") == "the twenty third of May"
    assert normalize_text("in 2024") == "in twenty twenty four"
    assert normalize_text("born in 1984.") == "born in nineteen eighty four."
    assert normalize_text("101 dalmatians") == "one hundred and one dalmatians"
    assert normalize_text("no digits here") == "no digits here"
    assert normalize_text("room 4511") == "room four thousand five hundred and eleven"


def _make_tokenizer():
    # Vocab mimicking the real structure: IPA tokens, uppercase char fallbacks,
    # punctuation, specials at the same relative slots.
    vocab = (
        ["h", "ə", "l", "oʊ", "w", "ɚ", "d", "ˈ", "ˌ"] +       # 0..8 IPA-ish
        [",", ".", "!", "?", ":", ";"] +                        # 9..14 punctuation
        [chr(c) for c in range(ord("A"), ord("Z") + 1)] +       # 15..40 char fallback
        [f"tok{i}" for i in range(41, 93)] +                    # filler
        [" ", "<pad>", "<oov>"]                                 # 93, 94, 95
    )
    dictionary = {"hello": "həˈloʊ", "world": "ˈwɚld"}
    return MagpieTokenizer(vocab, dictionary, bos_id=2378, eos_id=2379)


def test_tokenize_dict_words():
    tok = _make_tokenizer()
    ids = tok.encode("hello world")
    # BOS + h ə ˈ l oʊ + space + ˈ w ɚ l d + EOS
    expect = [2378, 0, 1, 7, 2, 3, 93, 7, 4, 5, 2, 6, 2379]
    assert ids == expect


def test_tokenize_punctuation_and_case():
    tok = _make_tokenizer()
    ids = tok.encode("Hello, world!")
    expect = [2378, 0, 1, 7, 2, 3, 93, 9, 93, 7, 4, 5, 2, 6, 93, 11, 2379]
    assert ids == expect


def test_tokenize_oov_uses_char_fallback():
    tok = _make_tokenizer()
    ids = tok.encode("zyx")
    # 'z','y','x' -> uppercase char tokens Z=40, Y=39, X=38
    assert ids == [2378, 40, 39, 38, 2379]


def test_tokenize_numbers_go_through_normalizer():
    tok = _make_tokenizer()
    ids = tok.encode("2")
    # "two" is OOV -> T W O char tokens
    t, w, o = 15 + ord("T") - ord("A"), 15 + ord("W") - ord("A"), 15 + ord("O") - ord("A")
    assert ids == [2378, t, w, o, 2379]


def test_tokenizer_from_gguf_metadata():
    vocab = "a\nb\n \nx"
    kv = {
        "magpie.tokenizer.vocab": vocab,
        "magpie.tokenizer.dict": "ab\tab\ncd\tba",
        "magpie.tokenizer.space": 2,
    }
    tok = MagpieTokenizer.from_gguf_metadata(kv)
    assert tok.space_id == 2
    assert tok.encode("ab") == [2378, 0, 1, 2379]
    assert tok.encode("cd") == [2378, 1, 0, 2379]
