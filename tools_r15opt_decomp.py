#!/usr/bin/env python
"""r15 optimization round: stage decomposition for the two queries that
entered the registry this round and have never had an optimization pass
(emb_semantic_dedup, doc_substring_dup), plus shares for their parents.

Each stage is timed with the noop sink (guide 1.4) and labelled with
setJobDescription (guide 1.5). min-of-N per stage, interleaved order so a
host phase shift doesn't land on one arm.

Usage: python tools_r15opt_decomp.py [n_trials] [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F


def noop(fn) -> float:
    """Time BUILD + noop-sink execution: iterative queries run eagerly at
    build (localCheckpoint per round), so timing only the sink would miss
    most of their cost."""
    t0 = time.perf_counter()
    df = fn()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from scabillmatch_spark.session import get_spark

    spark = get_spark("r15opt_decomp", shuffle_partitions=32)
    import __spark_entry__ as E
    from scabillmatch_spark.functions.text import ordered_token_ids
    from scabillmatch_spark.operators.substring import (
        duplicate_ngram_spans,
        positional_ngram_ids,
    )

    docs = E._t(spark, sf_dir, "documents").select("doc_id", "text")
    nparts = spark.sparkContext.defaultParallelism

    def docs_rep():
        return docs.repartition(nparts, "doc_id")

    def toks():
        return docs_rep().select(
            "doc_id", ordered_token_ids(F.col("text")).alias("tids")
        )

    def grams():
        return docs_rep().select(
            F.col("doc_id"),
            F.posexplode(
                positional_ngram_ids(ordered_token_ids(F.col("text")), 20)
            ).alias("pos", "gram"),
        )

    def census():
        g = grams()
        return (
            g.groupBy("gram")
            .agg(F.count_distinct("doc_id").alias("nd"))
            .filter(F.col("nd") >= 2)
            .select("gram")
        )

    def substring_full():
        """The registered query, post-change: corpus-cache token ids +
        shared census exchange."""
        return E.q_doc_substring_dup(spark, sf_dir)

    def substring_old_shape():
        """The pre-r15opt shape: gram stream referenced lazily by both the
        census and the witness semi-join (projection computed twice)."""
        from scabillmatch_spark.operators.substring import _merge_spans

        g = docs_rep().select(
            F.col("doc_id"),
            F.posexplode(
                positional_ngram_ids(ordered_token_ids(F.col("text")), 20)
            ).alias("pos", "gram"),
        )
        dup = (
            g.groupBy("gram")
            .agg(F.count_distinct("doc_id").alias("nd"))
            .filter(F.col("nd") >= 2)
            .select("gram")
        )
        hits = g.join(dup, "gram", "left_semi")
        spans = F.col("__spans")
        return (
            hits.groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_dup_windows"),
                F.array_sort(
                    F.collect_list(F.col("pos").cast("long"))
                ).alias("__pos"),
            )
            .withColumn("__spans", _merge_spans(F.col("__pos"), 20))
            .select(
                "doc_id",
                "n_dup_windows",
                F.size(spans).cast("long").alias("n_spans"),
                F.aggregate(
                    spans, F.lit(0).cast("long"),
                    lambda acc, sp: acc + sp["e"] - sp["s"],
                ).alias("dup_tokens"),
                F.array_join(
                    F.transform(
                        spans,
                        lambda sp: F.concat_ws(
                            "-", sp["s"].cast("string"), sp["e"].cast("string")
                        ),
                    ),
                    ";",
                ).alias("spans"),
            )
        )

    def emb_pairs():
        return E._emb_near_dup_pairs(spark, sf_dir, max(8, nparts // 4))

    def emb_semantic_full():
        return E.q_emb_semantic_dedup(spark, sf_dir)

    STAGES = [
        ("substr_toks_md5", toks),
        ("substr_grams_fold", grams),
        ("substr_census", census),
        ("substr_full_NEW", substring_full),
        ("substr_full_OLD", substring_old_shape),
        ("emb_pairs_cascade", emb_pairs),
        ("emb_semantic_full", emb_semantic_full),
    ]

    # warmup pass (codegen + python worker pool)
    spark.range(256, numPartitions=nparts).mapInPandas(
        lambda it: it, "id long"
    ).count()
    for name, fn in STAGES:
        spark.sparkContext.setJobDescription(f"warm:{name}")
        noop(fn)

    results: dict[str, list[float]] = {n: [] for n, _ in STAGES}
    for t in range(trials):
        for name, fn in STAGES:
            spark.sparkContext.setJobDescription(f"t{t}:{name}")
            results[name].append(round(noop(fn), 3))
    for name, ts in results.items():
        print(f"{name}: min={min(ts):.3f} all={ts}")


if __name__ == "__main__":
    main()
