"""Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD
2003 — the MOSS algorithm): select a guaranteed-coverage subset of each
document's n-gram hashes by taking, in every window of ``w`` consecutive
n-gram positions, the minimum hash (ties broken by RIGHTMOST position —
the paper's PLAIN winnowing tie rule, a deterministic local choice, so
identical passages in different documents select identical fingerprints;
NOT the paper's "robust winnowing" variant, which instead re-selects the
previous window's fingerprint on ties to thin runs of equal hashes). Any shared substring of at least ``w + n - 1`` tokens is
then guaranteed to contribute at least one IDENTICAL (fingerprint,
in-passage position) in both documents, at an expected density of
2/(w+1) selected hashes per position — the property that lets a 100 TB
corpus be screened for local plagiarism/boilerplate with ~(w+1)/2 x
fewer comparable units than the full positional census of
operators/substring.py (which this module complements: winnowing is the
cheap screen, the positional census the exact confirm).

Completes the fingerprinting family: doc-level MinHash (set similarity),
SimHash (weighted-feature hamming), rolling-hash doc fingerprint
(identity), paragraph hashes (C4 units), positional n-gram census (exact
substrings) — and now sampled positional fingerprints (local similarity
at tunable density).

Scale shape: the gram stream is (doc_id, pos, gram) — three longs per
token, hashed ONCE per row inside the scan projection (the md5+fold
expression must never sit inside a higher-order lambda: a per-window
reference re-evaluates the whole token pipeline per element, O(L^2) md5
calls per document — measured as a hang at prototype time and the reason
the selection runs over the EXPLODED stream instead of array
expressions). Selection = one doc-key exchange + sort, then a frames
window min over struct(gram, -pos) (min hash, rightmost tie — struct
order is lexicographic) and a distinct; the census is one combine-heavy
shuffle keyed on the gram hash; the report one doc-key aggregation.
No exchange ever carries text. The gram hash space is ~31-bit, not
60-bit: positional_ngram_ids folds mod HASH_PRIME = 2038074743 ≈ 2^31,
so at large corpus scale cross-document collisions saturate and inflate
n_shared_fp (the screen stays sound as a RECALL filter — collisions add
false candidates for the exact census to reject, never lose true ones;
widen the fold modulus if the screen's precision matters upstream). Reference provenance: the reference's
MinHash tier (utils/CustomizedMinHashLSH usage) samples GLOBALLY per
document; winnowing is the positional-sampling complement, not present
there — an extension, same as SimHash.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from scabillmatch_spark.functions.text import ordered_token_ids
from scabillmatch_spark.operators.substring import positional_ngram_ids

# Per-row checksum modulus (same constant as the entry file's _CHK_MOD):
# keeps each term < 2^30 so a SUM over billions of fingerprints stays far
# from int64 overflow on either engine.
CHK_MOD = 1_000_000_007


def winnow_fingerprints(
    docs: DataFrame,
    n: int = 4,
    w: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> DataFrame:
    """(id_col, n_grams, g, p): the winnowing fingerprint set per
    document (plain rule, rightmost tie) — DISTINCT (hash g, 0-based
    n-gram position p) pairs where
    (g, p) is, for some window start s in [0, n_grams - w], the minimum
    hash over positions [s, s+w) with ties to the rightmost position.
    A hash that stays minimal across consecutive windows is recorded
    once, per the paper. Documents shorter than n + w - 1 tokens select
    nothing and do not appear.

    ``num_partitions``: spread the tokenize+hash projection over this
    many tasks BEFORE the explode (local single-file inputs run it in
    one task otherwise — the substring-census lesson); at real corpus
    scale input splits provide the parallelism and this stays None."""
    if num_partitions:
        docs = docs.repartition(num_partitions, id_col)
    grams = docs.select(
        F.col(id_col),
        F.posexplode(
            positional_ngram_ids(ordered_token_ids(F.col(text_col)), n)
        ).alias("pos", "gram"),
    )
    wdoc = W.partitionBy(id_col)
    wsel = wdoc.orderBy("pos").rowsBetween(0, w - 1)
    sel = grams.select(
        id_col,
        "pos",
        F.count(F.lit(1)).over(wdoc).alias("n_grams"),
        F.min(
            F.struct(F.col("gram").alias("g"), (-F.col("pos")).alias("np"))
        )
        .over(wsel)
        .alias("m"),
    )
    return (
        sel.filter(F.col("pos") <= F.col("n_grams") - w)
        .select(
            id_col,
            "n_grams",
            F.col("m.g").alias("g"),
            (-F.col("m.np")).alias("p"),
        )
        .distinct()
    )


def winnow_fingerprint_report(
    docs: DataFrame,
    n: int = 4,
    w: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-document winnowing report -> (id_col, n_grams, n_fingerprints,
    n_shared_fp, fp_checksum), one row per document with at least one
    full window (>= n + w - 1 tokens).

    - ``n_grams``: positional n-gram count (token count - n + 1).
    - ``n_fingerprints``: distinct selected (hash, position) pairs;
      expected ~ 2/(w+1) * n_grams (the paper's density bound).
    - ``n_shared_fp``: of those, how many have a hash that some OTHER
      document also selected — the cross-document screen a dedup pass
      would escalate to the exact positional census.
    - ``fp_checksum``: sum(hash % CHK_MOD) over selected fingerprints —
      order-free arithmetic witness of the exact selected set (a wrong
      min or tie-break anywhere shifts it).
    """
    fpx = winnow_fingerprints(
        docs,
        n=n,
        w=w,
        id_col=id_col,
        text_col=text_col,
        num_partitions=num_partitions,
    )
    # Persisted: BOTH consumers below (census, flagged join) read it —
    # without this the tokenize+md5+window pipeline runs twice (exchange
    # reuse is not guaranteed across the differently-pruned branches).
    # Left persisted because the returned plan references it (the entry
    # file's pq_topk precedent); it holds four longs per fingerprint,
    # ~2/(w+1) of the gram count.
    fpx = fpx.persist()
    # Census: fingerprint hashes selected by >= 2 DISTINCT documents.
    # Combine-heavy: the distinct collapses map-side per (hash, doc).
    census = (
        fpx.select(id_col, "g")
        .distinct()
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("g")
    )
    # Plain equi-join on the hash (NOT a forced broadcast: the shared
    # census is bounded by distinct cross-document fingerprints, which a
    # boilerplate-heavy 100 TB corpus can make arbitrarily large — AQE
    # still broadcasts it when it measures small). Both exchanges carry
    # longs only.
    flagged = fpx.join(census.withColumn("__shared", F.lit(1)), "g", "left")
    return (
        flagged.groupBy(id_col, "n_grams")
        .agg(
            F.count(F.lit(1)).alias("n_fingerprints"),
            F.coalesce(F.sum("__shared"), F.lit(0)).cast("long").alias("n_shared_fp"),
            F.sum(F.col("g") % F.lit(CHK_MOD)).alias("fp_checksum"),
        )
        .select(
            id_col,
            F.col("n_grams").cast("long").alias("n_grams"),
            "n_fingerprints",
            "n_shared_fp",
            "fp_checksum",
        )
    )
