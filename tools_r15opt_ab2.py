#!/usr/bin/env python
"""r15 optimization round, continuation session: interleaved A/Bs for

  1. graph_pagerank tail cut — old shape (lazy 3-round tree, session-32
     shuffles at action time) vs new shape (num_shuffle_partitions=8 +
     loop-end localCheckpoint, rounds execute at 8).
  2. minhash_delta_dedup corpus-side persist — old shape (c persisted even
     when corpus_banded is supplied: duplicate in-memory copy of every
     corpus shingle set + the materialization pass) vs new shape
     (conditional persist — banded path leaves c as a rename over the
     session corpus cache).

Identical output values asserted per pair before timing; noop sink
(guide 1.4); min-of-N, arms interleaved per trial (guide 1.2 discipline).

Usage: python tools_r15opt_ab2.py [n_trials] [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from scabillmatch_spark.session import get_spark

    spark = get_spark("r15opt_ab2", shuffle_partitions=32)
    sc = spark.sparkContext
    import __spark_entry__ as E
    from scabillmatch_spark.operators import blocking, corpus, dedup, graph
    from scabillmatch_spark.functions import text as TX
    from scabillmatch_spark.functions import similarity as SIM

    # warm shared inputs both pairs read
    E._doc_edges(spark, sf_dir).count()
    E._shingle_bands(spark, sf_dir).count()
    corpus.doc_token_sets(spark, sf_dir).count()

    # ---------------- pair 1: pagerank tail cut ----------------
    edges = E._doc_edges(spark, sf_dir)

    def pr_old() -> None:
        sc.setJobDescription("ab2: pagerank OLD lazy@32")
        noop(
            graph.pagerank(edges, reset_prob=0.15, max_iter=3)
            .select("id", F.round("pagerank", 6).alias("pagerank"))
        )

    def pr_new() -> None:
        sc.setJobDescription("ab2: pagerank NEW cut@8")
        noop(
            graph.pagerank(
                edges, reset_prob=0.15, max_iter=3, num_shuffle_partitions=8
            ).select("id", F.round("pagerank", 6).alias("pagerank"))
        )

    a = graph.pagerank(edges, reset_prob=0.15, max_iter=3).select(
        "id", F.round("pagerank", 6).alias("r")
    )
    b = graph.pagerank(
        edges, reset_prob=0.15, max_iter=3, num_shuffle_partitions=8
    ).select("id", F.round("pagerank", 6).alias("r"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    print("pagerank identical-values: OK")

    # ---------------- pair 2: delta-dedup corpus persist ----------------
    sets = corpus.doc_token_sets(spark, sf_dir).select(
        F.col("doc").alias("doc_id"),
        TX.ngram_ids_from_token_ids(F.col("tok_ids"), 3).alias("shingles"),
    )
    delta = sets.filter(F.col("doc_id") % 10 == 7)
    base = sets.filter(F.col("doc_id") % 10 != 7)
    banded = E._shingle_bands(spark, sf_dir).filter(F.col("__id_r") % 10 != 7)

    def dd_old():
        # the pre-r15 shape: unconditional persist of the corpus side
        d = delta.select(
            F.col("doc_id").alias("__id"), F.col("shingles").alias("__set")
        ).persist()
        c = base.select(
            F.col("doc_id").alias("__id"), F.col("shingles").alias("__set")
        ).persist()
        cands = blocking.lsh_candidate_pairs_two_sided(
            d, c, "__id", "__set",
            num_hashes=E.SHINGLE_LSH_HASHES, num_bands=E.SHINGLE_LSH_BANDS,
            min_jaccard=70.0, right_banded=banded,
        )
        s1 = d.select(F.col("__id").alias("pk1"), F.col("__set").alias("__s1"))
        s2 = c.select(F.col("__id").alias("pk2"), F.col("__set").alias("__s2"))
        out = (
            cands.join(s1, "pk1").join(s2, "pk2")
            .withColumn("similarity", SIM.jaccard(F.col("__s1"), F.col("__s2")))
            .filter(F.col("similarity") >= 70.0)
            .select("pk1", "pk2", F.round("similarity", 6).alias("similarity"))
        )
        return out, [d, c]

    def dd_new():
        out = dedup.minhash_dedup_delta(
            base, delta, "doc_id", "shingles",
            num_hashes=E.SHINGLE_LSH_HASHES, num_bands=E.SHINGLE_LSH_BANDS,
            jaccard_threshold=70.0, corpus_banded=banded,
        ).select("pk1", "pk2", F.round("similarity", 6).alias("similarity"))
        return out, []

    oa, ca_ = dd_old()
    ob, cb_ = dd_new()
    assert oa.exceptAll(ob).count() == 0 and ob.exceptAll(oa).count() == 0
    for f in ca_:
        f.unpersist()
    print("delta_dedup identical-values: OK")

    def dd_old_run() -> None:
        sc.setJobDescription("ab2: delta_dedup OLD persist-c")
        out, caches = dd_old()
        noop(out)
        for f in caches:
            f.unpersist()

    def dd_new_run() -> None:
        sc.setJobDescription("ab2: delta_dedup NEW conditional")
        out, _ = dd_new()
        noop(out)

    # warmups then interleaved trials
    pr_old(); pr_new(); dd_old_run(); dd_new_run()
    res: dict[str, list[float]] = {
        "pagerank_old": [], "pagerank_new": [],
        "delta_old": [], "delta_new": [],
    }
    for _ in range(trials):
        for name, fn in (
            ("pagerank_old", pr_old), ("pagerank_new", pr_new),
            ("delta_old", dd_old_run), ("delta_new", dd_new_run),
        ):
            t0 = time.perf_counter()
            fn()
            res[name].append(time.perf_counter() - t0)
    for k, v in res.items():
        print(f"{k}: trials={[round(x, 2) for x in v]} min={min(v):.2f}")


if __name__ == "__main__":
    main()
