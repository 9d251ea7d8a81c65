"""Corpus-slice distribution divergence — Jensen-Shannon divergence
between the unigram token distributions of corpus slices (languages,
sources, time buckets). The standard curation diagnostic for domain
shift and mixture drift: JS is symmetric, bounded by ln 2, and — unlike
KL — defined without smoothing when supports differ (0·ln 0 = 0), which
keeps the computation exactly reproducible across engines (no smoothing
hyperparameter, no global-vocab closed-form remainder).

Identity used: with m = (p+q)/2,

    JS(p,q) = 1/2 Σ_x [ p ln(2p/(p+q)) + q ln(2q/(p+q)) ]   over x in p∩q
            + (ln 2 / 2) · [ (1 - Σ_∩ p) + (1 - Σ_∩ q) ]

because a token present in only one slice contributes p ln(p/(p/2)) =
p ln 2 to its side's KL(·||m) and nothing to the other's. So the pair
relation only ever needs the INTERSECTION vocabulary plus two marginal
sums — tokens unique to a slice never join, and tokens in neither slice
contribute zero by definition.

Scale shape: one combine-heavy (slice, token) count shuffle (the counts
collapse map-side), a |slices|-row totals broadcast, one token-keyed
equi-join between slice count streams (work ∝ shared vocabulary — never
vocab², never corpus²), one bounded pair aggregation. Exchanges carry
(slice, token-string, long) — token strings are single words, never
documents. Float discipline: counts are exact integers; p = c/n is one
double division; the JS sum is rounded to 6 (the zipf_fit precedent for
vocab-wide irrational sums — sum-order ulp is ~1e-12 relative at 10^5
terms, absorbed by round(6)).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scabillmatch_spark.functions.text import tokens


def slice_js_divergence(
    docs: DataFrame,
    slice_col: str,
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """Pairwise JS divergence between slice token distributions ->
    (slice_a, slice_b, n_tokens_a, n_tokens_b, vocab_a, vocab_b,
    n_shared_vocab, js), slice_a < slice_b, one row per slice pair that
    shares at least one token (disjoint-vocabulary pairs — where
    js = ln 2 exactly — do not appear; at corpus scale such a pair
    means the tokenizer is broken, and the join producing it would be
    a cross join by construction)."""
    cnt = docs.select(
        F.col(slice_col).alias("__s"),
        F.explode(tokens(F.col(text_col))).alias("__t"),
    ).groupBy("__s", "__t").agg(F.count(F.lit(1)).cast("long").alias("__c"))
    tot = cnt.groupBy("__s").agg(
        F.sum("__c").cast("long").alias("__n"),
        F.count(F.lit(1)).cast("long").alias("__v"),
    )
    # |slices|-row frame: always broadcastable
    e = cnt.join(F.broadcast(tot), "__s")
    a = e.select(
        F.col("__s").alias("slice_a"),
        F.col("__t").alias("__t"),
        F.col("__c").alias("__ca"),
        F.col("__n").alias("__na"),
        F.col("__v").alias("__va"),
    )
    b = e.select(
        F.col("__s").alias("slice_b"),
        F.col("__t").alias("__t"),
        F.col("__c").alias("__cb"),
        F.col("__n").alias("__nb"),
        F.col("__v").alias("__vb"),
    )
    j = a.join(b, "__t").filter(F.col("slice_a") < F.col("slice_b"))
    pa = F.col("__ca").cast("double") / F.col("__na").cast("double")
    pb = F.col("__cb").cast("double") / F.col("__nb").cast("double")
    # term order pinned to the oracle SQL expression-for-expression
    term = pa * F.log(F.lit(2.0) * pa / (pa + pb)) + pb * F.log(
        F.lit(2.0) * pb / (pa + pb)
    )
    return (
        j.groupBy("slice_a", "slice_b")
        .agg(
            F.max("__na").alias("n_tokens_a"),
            F.max("__nb").alias("n_tokens_b"),
            F.max("__va").alias("vocab_a"),
            F.max("__vb").alias("vocab_b"),
            F.count(F.lit(1)).cast("long").alias("n_shared_vocab"),
            # ln(2.0) COMPUTED (not a pasted literal) so both engines use
            # the identical libm double — the BM25 "1.2 + 1.0 computed"
            # convention
            F.round(
                F.lit(0.5) * F.sum(term)
                + F.lit(0.5)
                * F.log(F.lit(2.0))
                * (F.lit(2.0) - F.sum(pa) - F.sum(pb)),
                round_digits,
            ).alias("js"),
        )
    )


def g2_keyness(
    docs: DataFrame,
    slice_col: str,
    slice_value: str,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 50,
    round_digits: int = 6,
) -> DataFrame:
    """Dunning log-likelihood keyness (Dunning 1993, the corpus-linguistics
    standard for "which terms characterize this slice") -> the ``top_k``
    most distinctive terms between the ``slice_col == slice_value`` target
    slice and everything else: (term, n_target, n_rest, g2, key_slice).

    Signed 2-cell log-likelihood over term OCCURRENCE counts: with
    N1/N2 the slice token totals and E_i = (a+b)·N_i/N the expected
    counts, g2 = 2·(a·ln(a/E1) + b·ln(b/E2)), a zero-count cell
    contributing 0 (the 0·ln 0 convention shared with the JS row).
    key_slice marks the over-represented side by EXACT integer
    cross-multiplication (a·N2 > b·N1 — no rate division, no float
    compare). The complement cells of the full 4-cell G2 are omitted on
    purpose: the 2-cell form is the monotone screen and keeps the SQL
    mirror to two ln terms.

    Float discipline: counts/products integer-exact (a ≤ corpus tokens,
    products < 2^63 by many orders); E_i is ONE double division of exact
    integers, each ln term is the zipf/BM25 class (ln to 1 ulp,
    round(6) absorbs); rounded g2 + 0.0 folds any tiny-negative -0.0
    (the 2-cell form CAN go negative), and g2 is the ORDER KEY only
    after rounding, ties by term — round-before-rank.

    Scale shape: one combine-heavy (term, slice-bit) count shuffle, two
    driver scalars (the weighted-pagerank count precedent), one bounded
    vocab-frame projection + TakeOrderedAndProject. Exchanges carry
    (term-string, two longs) — never documents."""
    # F.when(...).otherwise(0), not a bare boolean cast: a NULL slice
    # value must count as 0 (rest) like the oracle's CASE expression —
    # (NULL == x).cast() is NULL and would null-poison the term's
    # n_target/n_rest sums, silently dropping it at the min_count gate.
    toks = docs.select(
        F.explode(tokens(F.col(text_col))).alias("term"),
        F.when(F.col(slice_col) == slice_value, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("in_t"),
    )
    cnt = toks.groupBy("term").agg(
        F.sum("in_t").cast("long").alias("n_target"),
        (F.count(F.lit(1)) - F.sum("in_t")).cast("long").alias("n_rest"),
    )
    trow = toks.agg(
        F.sum("in_t").cast("long"), F.count(F.lit(1)).cast("long")
    ).first()
    n1, n = int(trow[0] or 0), int(trow[1] or 0)
    n2 = n - n1
    if n1 == 0 or n2 == 0:
        # one slice empty: every term is trivially "key"; no contrast to
        # measure (the pareto empty-guard precedent)
        return docs.sparkSession.createDataFrame(
            [], "term string, n_target long, n_rest long, g2 double, key_slice string"
        )
    ab = F.col("n_target") + F.col("n_rest")
    e1 = ab * F.lit(n1) / F.lit(n)
    e2 = ab * F.lit(n2) / F.lit(n)
    t1 = F.when(
        F.col("n_target") > 0,
        F.col("n_target").cast("double")
        * F.log(F.col("n_target").cast("double") / e1),
    ).otherwise(F.lit(0.0))
    t2 = F.when(
        F.col("n_rest") > 0,
        F.col("n_rest").cast("double") * F.log(F.col("n_rest").cast("double") / e2),
    ).otherwise(F.lit(0.0))
    g2 = F.round(F.lit(2.0) * (t1 + t2), round_digits) + F.lit(0.0)
    return (
        cnt.filter(ab >= min_count)
        .select(
            "term",
            "n_target",
            "n_rest",
            g2.alias("g2"),
            F.when(
                F.col("n_target") * F.lit(n2) > F.col("n_rest") * F.lit(n1),
                F.lit("target"),
            )
            .otherwise(F.lit("rest"))
            .alias("key_slice"),
        )
        .orderBy(F.desc("g2"), F.asc("term"))
        .limit(top_k)
    )
