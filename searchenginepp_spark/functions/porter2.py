"""Snowball "english" (Porter2) stemmer, pure Python.

Implemented from the published algorithm description at
snowballstem.org/algorithms/english/stemmer.html — the same algorithm the
reference links via libstemmer (`sb_stemmer_new("english", ...)`,
/root/reference/src/normalizer/WordNormalizer.cpp:12-18).  The reference
stems AFTER the stop-word check, on the lowercased token; callers here must
pass lowercase input.

Parity gate: the reference's canonical tokenizer golden
(/root/reference/tests/test_normalizer.cpp:19-50) —
"Twinkle, twinkle, little bat ..." → "twinkl twinkl littl bat wonder world
like tea tray sky".
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = frozenset("cdeghkmnrt")

_EXCEPTIONS = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}

_EXCEPTIONS_1A = frozenset(
    ("inning", "outing", "canning", "herring", "earring",
     "proceed", "exceed", "succeed")
)

_STEP2 = [  # (suffix, replacement or callable), longest-first
    ("ization", "ize"), ("ational", "ate"), ("ousness", "ous"),
    ("iveness", "ive"), ("fulness", "ful"), ("biliti", "ble"),
    ("lessli", "less"), ("tional", "tion"), ("ation", "ate"),
    ("alism", "al"), ("aliti", "al"), ("ousli", "ous"), ("iviti", "ive"),
    ("fulli", "ful"), ("entli", "ent"), ("enci", "ence"), ("anci", "ance"),
    ("abli", "able"), ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
    ("bli", "ble"), ("ogi", None), ("li", None),
]

_STEP3 = [
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ative", ""), ("ical", "ic"),
    ("ness", ""), ("ful", ""),
]

_STEP4 = [
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
    "ion", "al", "er", "ic",
]


def _contains_vowel(s: str) -> bool:
    return any(c in "aeiouy" for c in s)  # y only appears here as true vowel (cons. y is 'Y')


def _r1_r2(word: str) -> tuple[int, int]:
    # R1: after the first non-vowel following a vowel; special prefixes.
    n = len(word)
    r1 = n
    for pre in ("gener", "commun", "arsen"):
        if word.startswith(pre):
            r1 = len(pre)
            break
    else:
        for i in range(1, n):
            if word[i] not in "aeiouy" and word[i - 1] in "aeiouy":
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if word[i] not in "aeiouy" and word[i - 1] in "aeiouy":
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(word: str) -> bool:
    n = len(word)
    if n == 2:
        return word[0] in "aeiouy" and word[1] not in "aeiouy"
    if n >= 3:
        a, b, c = word[-3], word[-2], word[-1]
        return (
            b in "aeiouy"
            and c not in "aeiouy" and c not in "wxY"
            and a not in "aeiouy"
        )
    return False


def stem(word: str) -> str:
    """Stem one lowercase word."""
    if len(word) <= 2:
        return word
    if word[0] == "'":
        word = word[1:]
        if len(word) <= 2:
            return word
    exc = _EXCEPTIONS.get(word)
    if exc is not None:
        return exc

    # Mark consonant-y as 'Y'
    chars = list(word)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in "aeiouy":
            chars[i] = "Y"
    word = "".join(chars)

    r1, r2 = _r1_r2(word)

    # Step 0: longest of 's | 's' | '
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # Step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith(("ied", "ies")):
        word = word[:-3] + ("i" if len(word) > 4 else "ie")
    elif word.endswith(("us", "ss")):
        pass
    elif word.endswith("s"):
        if any(c in "aeiouy" for c in word[:-2]):
            word = word[:-1]

    if word in _EXCEPTIONS_1A:
        return word

    # Step 1b
    if word.endswith(("eed", "eedly")):
        suf = "eedly" if word.endswith("eedly") else "eed"
        if len(word) - len(suf) >= r1:
            word = word[: -len(suf)] + "ee"
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stemp = word[: -len(suf)]
                if _contains_vowel(stemp):
                    word = stemp
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(_DOUBLES):
                        word = word[:-1]
                    elif r1 >= len(word) and _ends_short_syllable(word):
                        word += "e"
                break

    # Step 1c: y/Y → i if preceded by non-vowel which is not the first letter
    if (
        len(word) > 2
        and word[-1] in "yY"
        and word[-2] not in "aeiouy"
    ):
        word = word[:-1] + "i"

    # Step 2 (longest suffix, act when suffix start is in R1)
    for suf, rep in _STEP2:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ogi":
                    if word.endswith("logi"):
                        word = word[:-1]
                elif suf == "li":
                    if len(word) >= 3 and word[-3] in _LI_ENDING:
                        word = word[:-2]
                else:
                    word = word[: -len(suf)] + rep
            break

    # Step 3
    for suf, rep in _STEP3:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ative":
                    if len(word) - 5 >= r2:
                        word = word[:-5]
                else:
                    word = word[: -len(suf)] + rep
            break

    # Step 4 (delete when suffix start is in R2)
    for suf in _STEP4:
        if word.endswith(suf):
            if len(word) - len(suf) >= r2:
                if suf == "ion":
                    if len(word) >= 4 and word[-4] in "st":
                        word = word[:-3]
                else:
                    word = word[: -len(suf)]
            break

    # Step 5
    if word.endswith("e"):
        if len(word) - 1 >= r2 or (
            len(word) - 1 >= r1 and not _ends_short_syllable(word[:-1])
        ):
            word = word[:-1]
    elif word.endswith("ll") and len(word) - 1 >= r2:
        word = word[:-1]

    return word.replace("Y", "y")


class MemoStemmer:
    """Per-executor memoizing wrapper — the tokenizer hot loop calls this."""

    __slots__ = ("_memo",)

    def __init__(self) -> None:
        self._memo: dict[str, str] = {}

    def __call__(self, word: str) -> str:
        m = self._memo
        s = m.get(word)
        if s is None:
            s = stem(word)
            if len(m) < 2_000_000:  # bound executor memory
                m[word] = s
        return s
