"""Text-analysis operators (LLM-data-pipeline extension): token counting,
quality scoring, language ID, document fingerprinting.

All pure Column expressions — narrow, no shuffle, codegen'd, and formulated
identically in ANSI SQL for oracle checking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scabillmatch_spark.functions import text as TX

# Tiny per-language stopword lists for the n-gram/stopword-hit language-ID
# heuristic. Deliberately short + deterministic.
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for"],
    "es": ["el", "la", "de", "que", "los", "en", "por", "una"],
    "fr": ["le", "la", "les", "des", "une", "dans", "pour", "est"],
    "de": ["der", "die", "und", "das", "ein", "mit", "von", "ist"],
}


def token_count(text_col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(TX.tokens(text_col))


BPE_ISH_PATTERN = r"[a-z]{1,6}|[0-9]|[^a-z0-9\s]"


def bpe_ish_token_count(text_col: Column | str) -> Column:
    """BPE-ish proxy: count regex pieces — letter runs chunked at 6 chars,
    single digits, single punctuation. A deterministic stand-in for a real
    tokenizer's piece count (oracle: len(regexp_extract_all(...)))."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_count(F.lower(c), F.lit(BPE_ISH_PATTERN))


def distinct_token_count(text_col: Column | str) -> Column:
    return F.size(TX.token_set(text_col))


def punct_ratio(text_col: Column | str) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    total = F.length(c)
    punct = total - F.length(F.regexp_replace(c, r"[,:;?!.]", ""))
    return F.when(total > 0, punct.cast("double") / total).otherwise(F.lit(0.0))


def digit_ratio(text_col: Column | str) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    total = F.length(c)
    digits = total - F.length(F.regexp_replace(c, r"[0-9]", ""))
    return F.when(total > 0, digits.cast("double") / total).otherwise(F.lit(0.0))


def stopword_hits(text_col: Column | str, words: list[str]) -> Column:
    """How many tokens are in the given stopword list."""
    toks = TX.tokens(text_col)
    wl = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(wl, t)))


def quality_score(text_col: Column | str, stopwords: list[str] | None = None) -> Column:
    """Deterministic [0,1] quality heuristic: rewards stopword presence and
    moderate length, penalizes punctuation/digit density."""
    words = stopwords or LANG_STOPWORDS["en"]
    toks = token_count(text_col)
    sw_ratio = F.when(
        toks > 0, stopword_hits(text_col, words).cast("double") / toks
    ).otherwise(F.lit(0.0))
    length_term = F.least(toks.cast("double") / 100.0, F.lit(1.0))
    return F.round(
        0.4 * length_term
        + 0.4 * F.least(sw_ratio * 5.0, F.lit(1.0))
        + 0.2 * (1.0 - F.least((punct_ratio(text_col) + digit_ratio(text_col)) * 5.0, F.lit(1.0))),
        6,
    )


def predict_lang(text_col: Column | str) -> Column:
    """Argmax of per-language stopword hit counts; 'und' when all zero.

    Deterministic tie-break: language name ascending (via struct max on
    (hits, reversed-name) would be unstable — we use explicit cascading
    comparisons so the SQL oracle can mirror it exactly).
    """
    hits = {lang: stopword_hits(text_col, words) for lang, words in LANG_STOPWORDS.items()}
    best = None
    best_hits = None
    for lang in sorted(LANG_STOPWORDS):  # ascending => earlier name wins ties
        h = hits[lang]
        if best is None:
            best, best_hits = F.lit(lang), h
        else:
            best = F.when(h > best_hits, F.lit(lang)).otherwise(best)
            best_hits = F.when(h > best_hits, h).otherwise(best_hits)
    return F.when(best_hits > 0, best).otherwise(F.lit("und"))


def bottom_k_fingerprint(text_col: Column | str, shingle_n: int = 3, k: int = 4) -> Column:
    """Bottom-k sketch: the k lexicographically-smallest md5 digests of the
    doc's shingles, joined — a compact near-dup fingerprint (rolling-hash
    winnowing analog, deterministic and oracle-expressible)."""
    shingles = TX.ngram_set(text_col, shingle_n)
    hashed = F.array_sort(F.transform(shingles, lambda s: F.md5(s)))
    return F.array_join(F.slice(hashed, 1, k), "|")
