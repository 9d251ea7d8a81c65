"""Interleaved A/B for stream_merge_upsert (r11 verdict ask #4).

The cross-round bench read 3.77 s (r10) -> 4.83 s (r11) in untouched code.
This pins whether that is host-phase noise or a real cost, and records how
the fixed Trigger.AvailableNow overhead amortizes over batch count, so the
streaming rows' sf0.1 numbers stop reading as regressions.

Arms, interleaved per trial (same session, same corpus):
  A  stream_merge_apply n_batches=3  (the registered query's exact shape)
  B  stream_merge_apply n_batches=1  (isolates per-batch overhead)
  C  one-shot merge_into             (no streaming machinery at all)

Usage: python tools_stream_ab.py [n_trials] [sf_dir]
"""
from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession


def main() -> None:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from scabillmatch_spark.session import get_spark

    spark = get_spark("stream_ab", shuffle_partitions=32)

    import __spark_entry__ as E
    from scabillmatch_spark.operators.merge import merge_into
    from scabillmatch_spark.streaming.ingest import stream_merge_apply

    orders, delta = E._orders_cdc_delta(spark, sf_dir)
    orders = orders.cache()
    delta = delta.cache()
    orders.count(), delta.count()

    def run_stream(n_batches: int) -> float:
        work = E._tmp_workdir("cdc_ab", sf_dir)
        t0 = time.monotonic()
        out = stream_merge_apply(
            spark, orders, delta, work, ["o_orderkey"],
            delete_col="is_delete", n_batches=n_batches,
        )
        E._materialize_and_clean(spark, out, work)
        return time.monotonic() - t0

    def run_oneshot() -> float:
        t0 = time.monotonic()
        merge_into(
            orders, delta, ["o_orderkey"],
            delete_col="is_delete", broadcast_source=True,
        ).count()
        return time.monotonic() - t0

    arms: dict[str, list[float]] = {"stream3": [], "stream1": [], "oneshot": []}
    # warmup pass (codegen + stream machinery spin-up) — not recorded
    run_stream(3)
    for t in range(trials):
        arms["stream3"].append(run_stream(3))
        arms["stream1"].append(run_stream(1))
        arms["oneshot"].append(run_oneshot())
        print(
            f"trial {t}: "
            + " ".join(f"{k}={arms[k][-1]:.2f}s" for k in arms),
            file=sys.stderr,
        )

    mins = {k: min(v) for k, v in arms.items()}
    # fixed stream overhead beyond the merge itself, and its per-batch slope
    summary = {
        "sf_dir": sf_dir,
        "trials": trials,
        "min": mins,
        "all": arms,
        "stream_fixed_overhead_s": round(mins["stream1"] - mins["oneshot"], 3),
        "per_extra_batch_s": round((mins["stream3"] - mins["stream1"]) / 2, 3),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
