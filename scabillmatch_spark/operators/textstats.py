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


def gopher_rules(
    text_col: Column | str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    min_distinct_stopwords: int = 2,
) -> list[Column]:
    """Gopher-style rule-based quality gate (Rae et al. 2021, Appendix A —
    the published MassiveWeb filter, reimplemented as Column expressions):

    - word count within [min_words, max_words]
    - mean word length within [3, 10] chars
    - symbol-to-word ratio ('#' or '...' occurrences per word) <= 0.1
    - >= 80% of words contain at least one alphabetic character
    - >= 2 distinct English stop words present

    Words are raw whitespace tokens of the UNcleaned text (the published
    rules predate any normalization). Returns the measured columns plus a
    ``gopher_pass`` boolean; thresholds are keyword-tunable. Pure Column
    exprs — narrow, codegen'd, oracle-expressible.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    words = F.filter(F.split(c, r"\s+"), lambda w: w != "")
    n_words = F.size(words)
    sum_len = F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w))
    mean_len = F.when(
        n_words > 0, sum_len.cast("double") / n_words
    ).otherwise(F.lit(0.0))
    n_symbols = F.regexp_count(c, F.lit(r"#|\.\.\.")) 
    symbol_ratio = F.when(
        n_words > 0, n_symbols.cast("double") / n_words
    ).otherwise(F.lit(0.0))
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    alpha_frac = F.when(
        n_words > 0, n_alpha.cast("double") / n_words
    ).otherwise(F.lit(0.0))
    sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    lowered = F.transform(words, lambda w: F.lower(w))
    n_stop = F.size(
        F.filter(sw, lambda s: F.array_contains(lowered, s))
    )
    gopher_pass = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_len >= min_mean_word_len)
        & (mean_len <= max_mean_word_len)
        & (symbol_ratio <= max_symbol_ratio)
        & (alpha_frac >= min_alpha_word_frac)
        & (n_stop >= min_distinct_stopwords)
    )
    return [
        n_words.alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        n_stop.alias("n_stop_distinct"),
        gopher_pass.alias("gopher_pass"),
    ]


def cms_heavy_hitters(
    docs: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 256,
    top_k: int = 15,
) -> DataFrame:
    """Count-Min Sketch frequency estimation (Cormode & Muthukrishnan
    2005) over the corpus token stream, audited against exact counts ->
    (term, cnt_exact, cnt_est, overestimate) for the ``top_k`` most
    frequent terms: the FREQUENCY sketch completing the approximate-
    profiling family (HLL counts distincts, GK sketches quantiles, CMS
    answers "how often does item x occur" in depth×width counters
    regardless of vocabulary size).

    Unlike the HLL/GK row (bound-checked — Spark's sketches aren't
    reproducible in DuckDB), this CMS is built from the house
    md5->int60 hash, so BOTH engines materialize the IDENTICAL counter
    table and identical estimates — the row is fully value-oracled, and
    the sketch's one-sided guarantee (cnt_est >= cnt_exact, ALWAYS —
    collisions only ever add) ships as an exact integer column, not a
    tolerance. overestimate = cnt_est - cnt_exact is >= 0 by theorem;
    a single negative cell means the sketch is broken.

    Plan: one token explode -> posexplode of the depth hash ids ->
    ONE (row, bucket) count whose post-combine size is depth×width
    FOREVER (the sketch's point); exact top-k term counts are one
    map-side-combinable term count + TakeOrderedAndProject; estimates
    attach by joining the top-k frame to the broadcast counter table
    once per sketch row (depth bounded joins of a top_k-row frame
    against depth×width counters). Exchanges carry (term/int, long)."""
    toks = docs.select(F.explode(TX.tokens(F.col(text_col))).alias("term"))

    def bucket(j: int, col) -> Column:
        h = F.conv(
            F.substring(F.md5(F.concat(F.lit(f"cms{j}:"), col)), 1, 15), 16, 10
        ).cast("long")
        return (h % F.lit(width)).cast("long")

    rows = toks.select(
        F.posexplode(
            F.array(*[bucket(j, F.col("term")) for j in range(depth)])
        ).alias("j", "bucket")
    )
    counters = rows.groupBy("j", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    top = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt_exact"))
        .orderBy(F.desc("cnt_exact"), F.asc("term"))
        .limit(top_k)
    )
    est = top
    for j in range(depth):
        cj = counters.filter(F.col("j") == j).select(
            F.col("bucket").alias(f"__b{j}"), F.col("c").alias(f"__c{j}")
        )
        est = est.join(
            F.broadcast(cj), bucket(j, F.col("term")) == F.col(f"__b{j}")
        )
    cnt_est = F.least(*[F.col(f"__c{j}") for j in range(depth)])
    return est.select(
        "term",
        "cnt_exact",
        cnt_est.alias("cnt_est"),
        (cnt_est - F.col("cnt_exact")).alias("overestimate"),
    )
