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


def _cpp_tokenize_oracle(tok, text):
    """Transliteration of magpie_tokenize (reference src/magpie.cpp:404-495),
    operating on UTF-8 bytes exactly as the C++ operates on std::string bytes.
    Kept independent of the production tokenizer so fuzzing compares two
    implementations of the same byte-level contract.
    """
    from magpie_tts_tpu.text.tokenizer import _ascii_lower

    byte_vocab = {t.encode("utf-8"): i for i, t in enumerate(tok.vocab)}
    byte_dict = {w.encode("utf-8"): p.encode("utf-8") for w, p in tok.dict.items()}

    tokens = [tok.bos_id]
    normalized = _ascii_lower(normalize_text(text)).encode("utf-8")
    processed = bytearray()
    for b in normalized:
        if b in b",.!?:;":
            processed += b" %c " % b
        else:
            processed.append(b)
    for word in bytes(processed).split(b" "):
        if not word:
            continue
        emitted = False
        if len(word) == 1:  # word.size() == 1: BYTES, not chars
            tid = byte_vocab.get(word)
            if tid is not None:
                tokens.append(tid)
                emitted = True
        if not emitted:
            pron = byte_dict.get(word)
            if pron is not None:
                i = 0
                while i < len(pron):
                    found = False
                    for ln in range(min(len(pron) - i, 4), 0, -1):
                        tid = byte_vocab.get(pron[i:i + ln])
                        if tid is not None:
                            tokens.append(tid)
                            i += ln
                            found = True
                            break
                    if not found:
                        i += 1
            else:
                for b in word:  # `for (char c : word)`: BYTES
                    upper = b - 0x61 + 0x41 if 0x61 <= b <= 0x7A else b
                    tid = byte_vocab.get(bytes([upper]))
                    if tid is not None:
                        tokens.append(tid)
        if tok.space_id >= 0:
            tokens.append(tok.space_id)
    if tokens and tokens[-1] == tok.space_id:
        tokens.pop()
    tokens.append(tok.eos_id)
    return tokens


def test_tokenize_single_multibyte_char_is_not_a_vocab_hit():
    # Reference checks word.size()==1 on BYTES (magpie.cpp:437): a multi-byte
    # IPA char typed directly in the input must NOT hit its vocab token; its
    # bytes fall through the OOV path and are dropped.
    tok = _make_tokenizer()
    assert "ɚ" in tok.token_to_id
    assert tok.encode("ɚ") == [2378, 2379]
    # ... and mixed into a word: only the ASCII bytes survive via OOV fallback.
    a, b_ = 15, 16  # 'A', 'B' char-fallback ids
    assert tok.encode("aɚb") == [2378, a, b_, 2379]


def test_tokenize_fuzz_matches_cpp_byte_oracle():
    tok = _make_tokenizer()
    corpus = [
        "Hello, world!",
        "hello world hello world",
        "ɚ", "oʊ", "ˈˌ", "həˈloʊ",          # raw IPA typed directly
        "aɚb zyx ˈwɚld",
        "The 23rd of May, 2024: $50 off (50%)!",
        "naïve café jalapeño",               # latin-1 accents (multi-byte)
        "日本語テキスト",                      # CJK
        "emoji 🎤 test",
        "MiXeD CaSe WoRdS",
        "punct...!!??;;::,,",
        "  leading and   trailing   spaces  ",
        "word-with-hyphens and_underscores",
        "1234567890 -42 $1 100% 1984 2099",
        "\t tabs\tand\nnewlines \n",
        "ß ÿ Ø æ",                            # chars whose bytes overlap ASCII-ish ranges
        "a", "z", ".", "",
        "x" * 300,
    ]
    for text in corpus:
        assert tok.encode(text) == _cpp_tokenize_oracle(tok, text), repr(text)


def test_tokenize_fuzz_random_byte_soup():
    # Random printable + multi-byte soup; oracle equality on every sample.
    import random

    rnd = random.Random(0xC0FFEE)
    alphabet = (
        [chr(c) for c in range(0x20, 0x7F)]
        + ["ə", "ɚ", "oʊ", "ˈ", "ˌ", "é", "日", "🎤", "ß"]
    )
    tok = _make_tokenizer()
    for _ in range(200):
        text = "".join(rnd.choice(alphabet) for _ in range(rnd.randrange(0, 40)))
        assert tok.encode(text) == _cpp_tokenize_oracle(tok, text), repr(text)


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
