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
