"""Tokenizer / normalizer kernel — byte-identical token semantics to the
reference pipeline (punctuation → whitespace, lowercase, stop-word + length
filter, Snowball-english stem), vectorized for Arrow batches.

Reference semantics:
  punctuation tables   /root/reference/src/normalizer/PunctuationRemover.cpp:17-33
  whitespace split     /root/reference/src/normalizer/WordNormalizer.cpp:52
                       (istream >>: space \\t \\n \\v \\f \\r)
  ascii lowercase      /root/reference/src/normalizer/WordNormalizer.cpp:58
  stop/len filter      /root/reference/src/normalizer/WordNormalizer.cpp:62-65
                       (pre-stem, lowercased; len cap 240)
  stem AFTER filter    /root/reference/src/normalizer/WordNormalizer.cpp:68-73

The latin1 fix (FIX_MSMARCO_LATIN1) is OFF for the code corpus — it is OFF
by default in the reference build too (/root/reference/CMakeLists.txt:30).
"""

from __future__ import annotations

import re
from collections import Counter
from collections.abc import Iterable

from searchenginepp_spark.config import MAX_TOKEN_LEN
from searchenginepp_spark.functions.porter2 import MemoStemmer
from searchenginepp_spark.functions.stop_words import stop_words

# The three reference punctuation tables (1-, 2-, 3-byte UTF-8), as one
# codepoint class. PunctuationRemover.cpp:17-33.
PUNCT_1B = ",.:;-_\"!\n\t#%&*/?@\\()[]{}|=^$'"
PUNCT_2B = "«»՚՛՜՝՞՟։؉؊¿·¶§¡£"
PUNCT_3B = (
    "‐‑‒–—―⸗⸺⸻⹀〜‟〰゠︱︲﹘﹣－‘’‛“”⸚‹›„‚⁅⁆〈〉⌈⌉⌊⌋＿"
)
PUNCT_ALL = PUNCT_1B + PUNCT_2B + PUNCT_3B

_PUNCT_RE = re.compile("[" + re.escape(PUNCT_ALL) + "]")
# istream>> whitespace set (C locale): space \t \n \v \f \r
_WS_SPLIT_RE = re.compile(r"[ \t\n\x0b\x0c\r]+")

# Same class escaped for Spark's JVM regexp_replace / DuckDB regexp_replace.
SQL_PUNCT_CLASS = "[" + re.sub(r"([\\\]\[^$.|?*+(){}-])", r"\\\1", PUNCT_ALL) + "]"


def remove_punctuation(text: str, utf8_width_spaces: bool = False) -> str:
    """Replace every punctuation codepoint with space(s).

    The reference replaces each codepoint with as many spaces as its UTF-8
    byte width (PunctuationRemover.cpp:152), preserving byte length; for
    tokenization (whitespace split) single spaces are equivalent.  Pass
    ``utf8_width_spaces=True`` for the byte-length-preserving variant used by
    the golden test (tests/test_normalizer.cpp:6-16).
    """
    if utf8_width_spaces:
        return _PUNCT_RE.sub(lambda m: " " * len(m.group(0).encode("utf-8")), text)
    return _PUNCT_RE.sub(" ", text)


# ------------------------------------------------------- latin1 utilities
#
# The reference's MS-MARCO mojibake repair (compile-gated FIX_MSMARCO_LATIN1,
# OFF by default and OFF for the code corpus) and its latin1-aware lowercase
# (TEXT_FULL_LATIN1_CASE).  Byte-for-byte ports of the reference algorithms
# (/root/reference/src/normalizer/utf8_utils.cpp:6-58) so the goldens from
# tests/test_normalizer.cpp:52-83 hold exactly.

def detect_utf8_encoded_latin1(s: str) -> bool:
    """MS-MARCO heuristic (utf8_utils.cpp:31-38): a 0xC2 byte followed by a
    C1-control / soft-hyphen byte marks double-encoded latin1."""
    b = s.encode("utf-8")
    for i in range(len(b) - 1):
        if b[i] == 0xC2 and (0x80 <= b[i + 1] <= 0xA0 or b[i + 1] == 0xAD):
            return True
    return False


def fix_utf8_encoded_latin1(s: str) -> str:
    """Collapse each 2-byte UTF-8 sequence to its codepoint byte — undoing a
    double UTF-8 encode of latin1 text (utf8_utils.cpp:6-28)."""
    b = bytearray(s.encode("utf-8"))
    i = 0
    while i < len(b):
        if len(b) - i >= 2 and ((b[i] & 0xE0) == 0xC0
                                or (b[i + 1] & 0xC0) == 0x80):
            b[i] = ((b[i] & 0x1F) << 6) | (b[i + 1] & 0x3F)
            del b[i + 1]
        i += 1
    return b.decode("utf-8", errors="replace")


def latin1_lowercase(s: str) -> str:
    """Latin1-aware UTF-8 lowercase (utf8_utils.cpp:40-58): ASCII A-Z plus
    the latin-1 supplement À-Þ (second byte of a 0xC3 sequence)."""
    b = bytearray(s.encode("utf-8"))
    ext = 0
    for i in range(len(b)):
        p = b[i]
        if (((ext and 0x80 <= p <= 0xBF) or (not ext and p <= 0x7F))
                and 0x40 <= (p & 0x7F) + ext <= 0x5F):
            b[i] = p + 0x20
        if ext:
            ext = 0
        elif p == 0xC3:
            ext = 0x40
    return b.decode("utf-8")


def tokenize(text: str, stemmer: MemoStemmer | None = None,
             stem: bool = True) -> list[str]:
    """Full reference pipeline for one document → list of index terms."""
    sw = stop_words()
    st = stemmer if stemmer is not None else MemoStemmer()
    out: list[str] = []
    for tok in _WS_SPLIT_RE.split(remove_punctuation(text)):
        if not tok:
            continue
        tok = tok.lower()
        if len(tok) > MAX_TOKEN_LEN or tok in sw:
            continue
        out.append(st(tok) if stem else tok)
    return out


def term_frequencies(text: str, stemmer: MemoStemmer | None = None,
                     stem: bool = True) -> Counter[str]:
    """Per-document term→tf map (reference builder.cpp:56-66)."""
    return Counter(tokenize(text, stemmer, stem))


def tokenize_batch(texts: Iterable[str], stem: bool = True) -> list[list[str]]:
    """Vectorized entry point for pandas/Arrow UDFs — one shared memo
    stemmer per batch."""
    st = MemoStemmer()
    return [tokenize(t if t is not None else "", st, stem) for t in texts]


# ---------------------------------------------------------------- fast path
#
# Hot-loop variant for the build UDF.  Three C-speed tricks:
#   * str.translate (not regex) maps every punctuation codepoint to ' ';
#   * a module-level raw-token → final-term dict persists across Arrow
#     batches for the lifetime of the Python worker (Spark reuses workers),
#     and `map(cache.get, tokens)` resolves hits without entering Python;
#   * Counter(list) counts at C speed.
# Corpus vocabularies (especially code) are tiny relative to token counts,
# so the steady state is one dict probe per token.  The cache is capped to
# bound worker memory on adversarial vocabularies; a clear() just re-warms.

_PUNCT_TRANSLATE = {ord(c): " " for c in PUNCT_ALL}
_FILTERED = object()             # cache value for "token drops out"
_CACHE_CAP = 1_000_000
_caches: dict[bool, dict] = {True: {}, False: {}}
_shared_stemmer = MemoStemmer()

# str.split() (no separator) is ~4x faster than the _WS_SPLIT_RE regex, but
# it splits on EVERY Unicode whitespace codepoint while the reference splits
# only on the C-locale istream set [ \t\n\v\f\r].  Bridge: the fast translate
# table additionally maps every "exotic" whitespace codepoint (isspace() but
# not in the reference set) to one private-use sentinel; documents whose
# translated text contains the sentinel (or contain U+E000 themselves) —
# vanishingly rare in practice — take the exact regex path.  Sentinel-free
# documents split identically under both (str.split also drops the empty
# tokens the regex path emits at boundaries).
_WS_SENTINEL = "\ue000"
_EXOTIC_WS = [
    chr(cp) for cp in range(0x110000)
    if chr(cp).isspace() and chr(cp) not in " \t\n\x0b\x0c\r"
]
_PUNCT_WS_TRANSLATE = _PUNCT_TRANSLATE | {
    ord(c): _WS_SENTINEL for c in _EXOTIC_WS
}


def _resolve_token(tok: str, stem: bool) -> str:
    cache = _caches[stem]
    low = tok.lower()
    if len(low) > MAX_TOKEN_LEN or low in stop_words():
        res = _FILTERED
    else:
        res = _shared_stemmer(low) if stem else low
    if len(cache) >= _CACHE_CAP:
        cache.clear()
    cache[tok] = res
    return res


def term_frequencies_fast(text: str, stem: bool = True) -> Counter[str]:
    """Cached-vocabulary term_frequencies — identical output to
    term_frequencies, built for the Arrow UDF hot loop."""
    tr = text.translate(_PUNCT_WS_TRANSLATE)
    if _WS_SENTINEL in tr:       # exotic whitespace / literal U+E000: exact path
        toks = _WS_SPLIT_RE.split(text.translate(_PUNCT_TRANSLATE))
    else:
        toks = tr.split()
    cache = _caches[stem]
    got = list(map(cache.get, toks))            # C loop; None = miss
    if None in got:
        for i, g in enumerate(got):
            if g is None and toks[i]:
                got[i] = _resolve_token(toks[i], stem)
    counts = Counter(got)                       # C loop
    counts.pop(_FILTERED, None)
    counts.pop(None, None)                      # empty split artifacts
    counts.pop("", None)
    return counts
