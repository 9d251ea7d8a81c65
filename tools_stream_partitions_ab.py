"""Interleaved A/B: per-micro-batch shuffle-partition sizing for the two
foreachBatch streaming rows (r12 session 3).

The events_stream rows already size their state stores via
run_available_now(shuffle_partitions=...); the two foreachBatch rows
(stream_ingest_dedup 4.65 s, stream_merge_upsert ~3.5 s in r11's bench)
still run every micro-batch exchange at the session default of 32 while
each batch is a few-hundred-row delta slice. This measures default-32 vs
8 in the same session, interleaved, min-of-N per arm.

Usage: python tools_stream_partitions_ab.py [n_trials] [sf_dir]
"""
from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F


def main() -> None:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from scabillmatch_spark.session import get_spark

    spark = get_spark("stream_part_ab", shuffle_partitions=32)

    import __spark_entry__ as E
    from scabillmatch_spark.functions import text as TX
    from scabillmatch_spark.operators import corpus
    from scabillmatch_spark.streaming.ingest import (
        stream_delta_dedup,
        stream_merge_apply,
    )

    sets = corpus.doc_token_sets(spark, sf_dir).select(
        F.col("doc").alias("doc_id"),
        TX.ngram_ids_from_token_ids(F.col("tok_ids"), 3).alias("shingles"),
    ).cache()
    sets.count()
    corpus_side = sets.filter(F.col("doc_id") % 10 != 7)
    delta_side = sets.filter(F.col("doc_id") % 10 == 7)
    orders, cdc_delta = E._orders_cdc_delta(spark, sf_dir)
    orders = orders.cache(); cdc_delta = cdc_delta.cache()
    orders.count(); cdc_delta.count()

    def run_ingest(parts) -> float:
        work = E._tmp_workdir("ingest_ab", sf_dir)
        t0 = time.monotonic()
        out = stream_delta_dedup(
            spark, corpus_side, delta_side, work,
            num_hashes=E.SHINGLE_LSH_HASHES, num_bands=E.SHINGLE_LSH_BANDS,
            jaccard_threshold=70.0, shuffle_partitions=parts,
        )
        E._materialize_and_clean(spark, out, work)
        return time.monotonic() - t0

    def run_merge(parts) -> float:
        work = E._tmp_workdir("cdc_ab", sf_dir)
        t0 = time.monotonic()
        out = stream_merge_apply(
            spark, orders, cdc_delta, work, ["o_orderkey"],
            delete_col="is_delete", shuffle_partitions=parts,
        )
        E._materialize_and_clean(spark, out, work)
        return time.monotonic() - t0

    from scabillmatch_spark.streaming import events as SE

    def run_tumbling(parts) -> float:
        t0 = time.monotonic()
        stream = SE.read_events_stream(spark, sf_dir)
        SE.run_available_now(
            SE.tumbling_counts(stream), shuffle_partitions=parts
        ).count()
        return time.monotonic() - t0

    def run_dedup(parts) -> float:
        t0 = time.monotonic()
        stream = SE.read_events_stream(spark, sf_dir)
        deduped = (
            stream.withWatermark("ts", "1 hour")
            .dropDuplicates(["user_id", "event_type"])
            .select("user_id", "event_type")
        )
        SE.run_available_now(deduped, "append", shuffle_partitions=parts).count()
        return time.monotonic() - t0

    arms: dict[str, list[float]] = {
        "ingest_default": [], "ingest_8": [],
        "merge_default": [], "merge_8": [],
        "tumbling_default": [], "tumbling_16": [],
        "dedup_default": [], "dedup_16": [],
    }
    run_ingest(None); run_merge(None)  # warmup, not recorded
    run_tumbling(None); run_dedup(None)
    for t in range(trials):
        arms["ingest_default"].append(run_ingest(None))
        arms["ingest_8"].append(run_ingest(8))
        arms["merge_default"].append(run_merge(None))
        arms["merge_8"].append(run_merge(8))
        arms["tumbling_default"].append(run_tumbling(None))
        arms["tumbling_16"].append(run_tumbling(16))
        arms["dedup_default"].append(run_dedup(None))
        arms["dedup_16"].append(run_dedup(16))
        print(
            f"trial {t + 1}: "
            + " ".join(f"{k}={arms[k][-1]:.2f}s" for k in arms),
            file=sys.stderr,
        )
    mins = {k: min(v) for k, v in arms.items()}
    print(json.dumps({"mins": mins, "all": arms, "sf_dir": sf_dir}))
    spark.stop()


if __name__ == "__main__":
    main()
