"""Tokenizer parity goldens, ported from
/root/reference/tests/test_normalizer.cpp (stemmer-ON CI config; latin1 fix
not applicable to the code corpus)."""

from searchenginepp_spark.functions.normalizer import (
    remove_punctuation,
    term_frequencies,
    tokenize,
)
from searchenginepp_spark.functions.stop_words import stop_words

TWINKLE = (
    "Twinkle, twinkle, little bat! "
    "How I wonder what you're at! "
    "Up above the world you fly, "
    "Like a tea-tray in the sky."
)


def test_punctuation_golden_bytes():
    # tests/test_normalizer.cpp:6-16 — same-byte-width spaces
    original = (
        "Ei fu. Siccome immobile,, dato il mortal sospiro ¶ paragrafo "
        "⸻ inciso lungo ⸻ fine."
    )
    expected = (
        "Ei fu  Siccome immobile   dato il mortal sospiro    paragrafo "
        "    inciso lungo     fine "
    )
    got = remove_punctuation(original, utf8_width_spaces=True)
    assert len(got.encode("utf-8")) == len(original.encode("utf-8"))
    assert got == expected


def test_twinkle_golden_stemmed():
    # tests/test_normalizer.cpp:19-50, SEARCHENGINECPP_STEMMER_ENABLE branch
    assert tokenize(TWINKLE) == [
        "twinkl", "twinkl", "littl", "bat", "wonder",
        "world", "like", "tea", "tray", "sky",
    ]


def test_twinkle_golden_unstemmed():
    # tests/test_normalizer.cpp:29-33 branch — but stop-word filtering in the
    # reference only runs when the stemmer is compiled in; our stem=False
    # keeps the filter (we never ship a filterless config), so compare the
    # filtered subset.
    toks = tokenize(TWINKLE, stem=False)
    assert toks == [
        "twinkle", "twinkle", "little", "bat", "wonder",
        "world", "like", "tea", "tray", "sky",
    ]


def test_stop_words_exact_list():
    sw = stop_words()
    assert len(sw) == 1155
    assert "fly" in sw  # stop_words.cpp:95 deliberate addition
    assert "the" in sw and "you're" in sw and "a's" in sw
    for keep in ("twinkle", "little", "wonder", "world"):
        assert keep not in sw  # commented out in the reference


def test_token_length_cap():
    long_tok = "x" * 241
    ok_tok = "y" * 240
    assert tokenize(f"{long_tok} {ok_tok}", stem=False) == [ok_tok]


def test_term_frequencies():
    tf = term_frequencies(TWINKLE)
    assert tf["twinkl"] == 2
    assert tf["sky"] == 1
    assert sum(tf.values()) == 10


def test_apostrophe_split():
    # "'" is punctuation → "you're" → you + re, both stop words
    assert tokenize("you're", stem=False) == []
    # don / t are both stop words; "don't" vanishes entirely
    assert tokenize("don't twinkle", stem=False) == ["twinkle"]


# ---------------------------------------------------------------- latin1
# Reference goldens: /root/reference/tests/test_normalizer.cpp:52-83.

def test_latin1_fix_golden():
    from searchenginepp_spark.functions.normalizer import (
        detect_utf8_encoded_latin1, fix_utf8_encoded_latin1,
    )

    original = "AntonÃ\xadn DvorÃ¡k (1841â\x80\x931904) Antonin Dvorak was a son of butcher,"
    expected = "Antonín Dvorák (1841–1904) Antonin Dvorak was a son of butcher,"
    assert detect_utf8_encoded_latin1(original)
    assert fix_utf8_encoded_latin1(original) == expected
    assert not detect_utf8_encoded_latin1(expected.split("(")[0])


def test_latin1_lowercase_goldens():
    from searchenginepp_spark.functions.normalizer import latin1_lowercase

    assert latin1_lowercase("ÈÉÊËÌÍÎÏÐÑÒÓÔÕÖØÙÚÛÜÝÀÇÙÆ") == \
        "èéêëìíîïðñòóôõöøùúûüýàçùæ"
    assert latin1_lowercase("ABCDEFGHIJKLMNOPQRSTUVWXYZ1234567890") == \
        "abcdefghijklmnopqrstuvwxyz1234567890"


def test_term_frequencies_fast_parity():
    """CLAUDE.md invariant: term_frequencies_fast must stay output-identical
    to term_frequencies — adversarial inputs over the translate-table /
    worker-cache hot path, both stem modes (ADVICE round 1)."""
    from searchenginepp_spark.functions.normalizer import (
        term_frequencies, term_frequencies_fast,
    )

    cases = [
        "",
        "   \t\n\x0b\x0c\r   ",
        "The THE the tHe",                          # case-folded stopword dups
        "Twinkle, twinkle, little bat! don't a->b",
        "x" * 241 + " " + "x" * 240,                # exactly at/over len cap
        "naïve ¶café⸻ «déjà» don't",                # multi-byte punctuation
        "int return if else sym1 sym1 SYM1 fn_2;",
        "queries querying queried query",           # stem merges
        "word" + "—" + "joined",               # 3-byte punct splits
        "mixed    spacing\tand\nnewlines\x0cfeed",
        # exotic whitespace: str.split() would split on these, the
        # reference's istream set does NOT — they must stay inside tokens
        # (the fast path's sentinel check routes these docs to the exact
        # regex splitter)
        "glued\x85together stays\xa0one tok en",
        "file\x1csep \x1d\x1e\x1f group",
        "ideographic　space and thin",
        "literalsentinel in doc",             # PUA char in input text
        "   \x85",                       # sentinel + exotic only
    ]
    for text in cases:
        for stem in (True, False):
            assert term_frequencies_fast(text, stem) == \
                term_frequencies(text, stem=stem), (text, stem)


def test_term_frequencies_fast_parity_random():
    import random

    from searchenginepp_spark.functions.normalizer import (
        PUNCT_ALL, term_frequencies, term_frequencies_fast,
    )

    rng = random.Random(7)
    alphabet = "abcXYZ012 \t\n" + PUNCT_ALL + "éß漢"
    for _ in range(50):
        text = "".join(rng.choice(alphabet)
                       for _ in range(rng.randint(0, 400)))
        for stem in (True, False):
            assert term_frequencies_fast(text, stem) == \
                term_frequencies(text, stem=stem)
