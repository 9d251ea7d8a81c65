#!/usr/bin/env python
"""Scaling check: run the flagship LSH near-dup pipeline on 1x/2x/4x copies
of the sf0.1 documents corpus (each copy's vocabulary disjoint, so corpus
size scales while the near-dup structure per copy is constant) and report
wall time per scale. Near-linear growth = the blocked plan holds; quadratic
growth would indicate an un-blocked join sneaking in.

Usage: python scale_check.py  ->  one JSON line {"copies": {1: s, 2: s, 4: s}}
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

from scabillmatch_spark.functions import text as TX
from scabillmatch_spark.session import get_spark


def corpus(spark, sf_dir: str, copies: int):
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    parts = []
    for i in range(copies):
        # disjoint vocab per copy: prefix every word with a LETTER copy tag
        # (the tokenizer strips digits, so a "c0"/"c1" tag would collapse all
        # copies onto one vocabulary and make cross-copy pairs quadratic —
        # the check would then measure its own bug, not the engine)
        tag = "q" + chr(97 + i)
        parts.append(
            base.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                F.regexp_replace("text", r"(\w+)", f"{tag}$1").alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def dedup_time(spark, docs) -> float:
    """minhash_lsh_dedup pipeline (shingle MinHash-LSH banded candidates +
    exact verify) — the heaviest non-flagship dedup pipeline; linearity here
    guards the band-join's work ∝ true-collisions property.

    The shingle-set projection is materialized OUTSIDE the timed region
    (mirroring flagship_time's treatment of tokenization): the scan is
    trivially linear, and timing it would mostly measure whether Spark's
    plan-matched cache from a previous identical-plan run was still warm —
    the first version of this check reported 1.97s/19.8s/17.7s for exactly
    that reason (cache hit at 1x, misses at 2x/4x)."""
    from scabillmatch_spark.operators import dedup

    sets = docs.select(
        "doc_id", TX.ngram_id_set("text", 3).alias("shingles")
    ).persist()
    sets.count()
    t0 = time.perf_counter()
    dedup.minhash_dedup_pairs(
        docs, "doc_id", "text", shingle_n=3, num_hashes=32, num_bands=8,
        jaccard_threshold=70.0, sets=sets,
    ).count()
    dt = time.perf_counter() - t0
    sets.unpersist()
    return round(dt, 2)


def corpus_token_sets(docs):
    """Tokenized (primary_key, tokens) projection, persisted + materialized.
    Kept OUTSIDE every timed region — persist() is lazy, so without the
    count() the first timed action would charge tokenization of the whole
    (possibly multi-copy) corpus to the match plan. The bench's 2x slope
    point read 62 s instead of ~9 s for exactly that reason."""
    sets = docs.select(
        F.col("doc_id").cast("string").alias("primary_key"),
        TX.token_id_set("text").alias("tokens"),
    ).persist()
    sets.count()
    return sets


def match_time(spark, sets) -> float:
    """Times the flagship MATCH plan (collapse -> band join -> verify ->
    expand -> top-N) over pre-materialized token sets — the SAME
    plans/bill_match.match_token_sets plan document_match runs, so this
    number is directly slope-comparable with the bench's 1x point (the
    pre-r7 variant skipped the collapse stage and the two points measured
    different plans)."""
    from scabillmatch_spark.plans.bill_match import match_token_sets

    t0 = time.perf_counter()
    match_token_sets(sets, num_hashes=32, num_bands=4, threshold=90.0,
                     top=1000).count()
    return round(time.perf_counter() - t0, 2)


def flagship_time(spark, docs) -> float:
    """corpus_token_sets + match_time in one call (scale_check's per-copy
    harness; the sets persist only for the duration of the call)."""
    sets = corpus_token_sets(docs)
    dt = match_time(spark, sets)
    sets.unpersist()
    return dt


_COPY_OFFSET = 10_000_000


def graph_times(spark, sf_dir: str) -> tuple[dict, dict]:
    """BFS + weighted shortest paths on 1x/2x/4x disjoint copies of the
    similarity graph (one landmark per copy, so multi-source BFS work scales
    with the graph). Guards the iterative-loop cost model: near-linear
    growth = per-round checkpoint/lineage behavior holds; super-linear
    would flag a recurrence of the round-2 lazy-frontier re-execution bug."""
    import __spark_entry__ as entrymod
    from scabillmatch_spark.operators import graph

    base = entrymod._doc_edges(spark, sf_dir).select("src", "dst").persist()
    lm0 = base.agg(F.min("src")).first()[0]
    # warm the edge materialization + BFS/CC codegen so copies=1 isn't
    # charged for one-time costs the larger copies don't pay
    graph.shortest_paths(base, [lm0], max_depth=2).count()
    graph.connected_components(base, max_iter=3).count()
    bfs_res, w_res, cc_res = {}, {}, {}

    def best_of(fn, n=2):
        # min over n runs: per-round times within a run are flat (verified by
        # instrumentation), but isolated multi-second GC/cleanup pauses in the
        # shared 48g JVM land randomly and dominate these ~10s totals — the
        # r4 "super-linear 4x point" was exactly such an outlier, not plan
        # growth. min-of-2 rejects the pause, not real work.
        best = None
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 2)

    for copies in (1, 2, 4):
        parts = [
            base.select(
                (F.col("src") + F.lit(i * _COPY_OFFSET)).alias("src"),
                (F.col("dst") + F.lit(i * _COPY_OFFSET)).alias("dst"),
            )
            for i in range(copies)
        ]
        e = parts[0]
        for p in parts[1:]:
            e = e.union(p)
        # normalize partitioning: union-of-copies inherits copies*32
        # partitions for the same per-partition row count — a harness
        # artifact (a real 4x corpus read from parquet gets partition COUNT
        # from maxPartitionBytes, i.e. fuller partitions, similar count).
        # Without this the iterative loops pay per-task overhead x rounds x
        # copies and the check measures its own construction, not the engine
        # (measured: CC 4x total 24.6s inherited vs 11.9s normalized).
        e = e.repartition(32).persist()
        n_edges = e.count()
        lms = [lm0 + i * _COPY_OFFSET for i in range(copies)]
        bfs_res[copies] = best_of(
            lambda: graph.shortest_paths(e, lms, max_depth=6).count()
        )
        we = e.withColumn(
            "weight", ((F.col("src") + F.col("dst")) % 7 + 1).cast("double")
        )
        w_res[copies] = best_of(
            lambda: graph.weighted_shortest_paths(we, lm0, max_iter=6).count()
        )
        # dedup-clustering closer (doc_dup_clusters): CC over the scaled
        # graph — disjoint copies keep per-component diameter constant, so
        # rounds stay flat and wall time should track edge count
        cc_res[copies] = best_of(
            lambda: graph.connected_components(e, max_iter=30).count()
        )
        e.unpersist()
        print(
            f"# graph copies={copies} edges={n_edges} bfs={bfs_res[copies]}s"
            f" weighted={w_res[copies]}s cc={cc_res[copies]}s",
            file=sys.stderr,
        )
    return bfs_res, w_res, cc_res


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark("scale_check")
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()  # warmup
    # throwaway full-pipeline runs: the 1x points must be steady-state, not
    # charged for JIT/codegen/broadcast warmup the 2x/4x points don't pay
    warm = corpus(spark, sf_dir, 1)
    flagship_time(spark, warm)
    dedup_time(spark, warm)
    results, dedup_results = {}, {}
    for copies in (1, 2, 4):
        # keep scale points cache-independent: minhash_dedup_pairs persists
        # internal projections it cannot unpersist before its action, and
        # Spark's plan-matched cache would otherwise gift the 1x rerun the
        # warmup's data while 2x/4x pay full price
        spark.catalog.clearCache()
        docs = corpus(spark, sf_dir, copies)
        n = docs.count()
        # min-of-2, same rationale as graph_times.best_of: isolated GC/steal
        # pauses in the shared JVM land randomly on single timed passes (the
        # r6 first run read 2x=14.1s against 4x=8.4s — impossible as a plan
        # property, gone under min-of-2)
        results[copies] = min(flagship_time(spark, docs) for _ in range(2))
        dedup_results[copies] = min(dedup_time(spark, docs) for _ in range(2))
        print(
            f"# copies={copies} docs={n} flagship={results[copies]}s"
            f" dedup={dedup_results[copies]}s",
            file=sys.stderr,
        )
    bfs_res, w_res, cc_res = graph_times(spark, sf_dir)
    print(
        json.dumps(
            {
                "metric": "flagship_scaling",
                "unit": "sec",
                "copies": results,
                "dedup": dedup_results,
                "graph_bfs": bfs_res,
                "graph_weighted": w_res,
                "graph_cc": cc_res,
            }
        )
    )


if __name__ == "__main__":
    main()
