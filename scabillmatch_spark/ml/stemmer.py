"""Porter stemmer (M3) — replaces the reference's external spark-stemming
jar (feature/Utils.scala:200-204, Snowball English; the jar is a missing
blob in the reference repo). This is the classic Porter (1980) algorithm,
implemented from the published description — deterministic, dependency-free,
property-tested against the canonical vocabulary pairs in
tests/test_properties.py.

Spark integration: ``stem_tokens`` is an Arrow-batched pandas UDF over
``array<string>`` token columns (the pipeline's only Python stage, applied
AFTER stopword removal like the reference's Stemmer stage). An LRU cache
keyed on the token keeps per-batch work ~#distinct-tokens, not #tokens.
"""

from __future__ import annotations

from functools import lru_cache

# module-level: with `from __future__ import annotations` the pandas-UDF
# type hints are strings evaluated against THIS module's globals, so `pd`
# must be importable here, not inside stem_tokens_expr
import pandas as pd

_VOWELS = set("aeiou")


def _cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in [C](VC)^m[V] — number of vowel->consonant transitions."""
    m = 0
    prev_c = True  # treat leading consonants as not starting a VC
    seen_vowel = False
    for i in range(len(stem)):
        c = _cons(stem, i)
        if not c:
            seen_vowel = True
        elif seen_vowel and not prev_c:
            m += 1
        prev_c = c
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _cons(stem, i) for i in range(len(stem)))


def _double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _cons(word, len(word) - 1)
    )


def _cvc(word: str) -> bool:
    """ends consonant-vowel-consonant, final consonant not w/x/y."""
    if len(word) < 3:
        return False
    return (
        _cons(word, len(word) - 3)
        and not _cons(word, len(word) - 2)
        and _cons(word, len(word) - 1)
        and word[-1] not in "wxy"
    )


def _longest_rule(word: str, rules: list[tuple[str, str]]):
    """Porter applies only the LONGEST matching suffix per step; if its
    condition fails no other rule in the step fires."""
    best = None
    for suf, rep in rules:
        if word.endswith(suf) and (best is None or len(suf) > len(best[0])):
            best = (suf, rep)
    return best


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]

_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]

_STEP4 = [
    ("al", ""), ("ance", ""), ("ence", ""), ("er", ""), ("ic", ""),
    ("able", ""), ("ible", ""), ("ant", ""), ("ement", ""), ("ment", ""),
    ("ent", ""), ("ion", ""), ("ou", ""), ("ism", ""), ("ate", ""),
    ("iti", ""), ("ous", ""), ("ive", ""), ("ize", ""),
]


@lru_cache(maxsize=1 << 18)
def porter_stem(word: str) -> str:
    if len(word) <= 2:
        return word
    w = word

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b
    flag1b = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _has_vowel(w[:-2]):
        w = w[:-2]
        flag1b = True
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        w = w[:-3]
        flag1b = True
    if flag1b:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _cvc(w):
            w += "e"

    # Step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2
    hit = _longest_rule(w, _STEP2)
    if hit and _measure(w[: -len(hit[0])]) > 0:
        w = w[: -len(hit[0])] + hit[1]

    # Step 3
    hit = _longest_rule(w, _STEP3)
    if hit and _measure(w[: -len(hit[0])]) > 0:
        w = w[: -len(hit[0])] + hit[1]

    # Step 4
    hit = _longest_rule(w, _STEP4)
    if hit:
        stem = w[: -len(hit[0])]
        ok = _measure(stem) > 1
        if hit[0] == "ion":
            ok = ok and stem.endswith(("s", "t"))
        if ok:
            w = stem

    # Step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem

    # Step 5b
    if _measure(w) > 1 and _double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w


def stem_tokens_expr():
    """Arrow-batched pandas UDF: array<string> tokens -> stemmed tokens."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    @pandas_udf(ArrayType(StringType()))
    def _stem(tokens: pd.Series) -> pd.Series:
        return tokens.apply(
            lambda toks: None if toks is None else [porter_stem(t) for t in toks]
        )

    return _stem
