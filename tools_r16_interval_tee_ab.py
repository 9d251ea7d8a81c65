#!/usr/bin/env python
"""r16 optimization round: A/B for teeing events_stream_interval_join's
micro-batch source (VERDICT r15 Next-round #3).

Both join sides derive from ONE read_events_stream source, but the
micro-batch physical plan scans the batch's parquet once per side
(purchase filter / click filter) and shuffles each side for the
stream-stream join's state distribution. Arms, interleaved per trial
(fresh memory-sink query per run — streaming queries can't be re-run on
a warm plan, so each trial pays the full micro-batch machinery; that
constant is identical across arms):

  A  current shape — per-side filters straight on the source; the join
     inserts one Exchange per side.
  B  teed shape — ONE narrow projection + event_type-pair filter +
     repartition(user_id) BEFORE the split; the two sides are then
     filters over an IDENTICAL exchange subtree, so the planner can
     (i) satisfy the join's state distribution with the explicit
     repartition and (ii) reuse the exchange (ReusedExchange) — one file
     scan + one shuffle instead of two of each.

Identical output values are asserted between the arms before timing.
The DATA micro-batch's executed plan of each arm is dumped so the
scan/exchange claim is checkable (plans/r16/...).

RESULT (r16, recorded NEGATIVE — the tee was REJECTED): the micro-batch
planner defeats both halves of the idea. (1) Catalyst pushes each side's
event_type filter BELOW the REPARTITION_BY_COL exchange (the same
push-below-repartition behavior that defeated r15's substring
shared-exchange pin), so the two subtrees are never identical and
ReusedExchange cannot fire. (2) The stream-stream join inserts its own
REQUIRED_BY_STATEFUL_OPERATOR exchanges unconditionally — a child's
pre-partitioning is deliberately not trusted for state-store placement —
so the explicit repartition cannot replace them. Net: shape B plans 4
exchanges vs A's 2, same two file scans (each already pushes its
event_type equality to the parquet scan), and walls match A 5.613 s vs
B 5.878 s (min-of-3 interleaved, deep-degraded phase, values identical,
81 rows). The current per-side-filter shape ships unchanged; removing
the second scan would require leaving the stream-stream join operator
class (a foreachBatch batch join — a semantics/feature change, out of
optimization scope). Plans: plans/r16/events_stream_interval_join_
microbatch_current.txt / ..._teed_rejected.txt.
"""
from __future__ import annotations

import io
import os
import sys
import time
import uuid
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F


def run_stream(joined, shuffle_partitions=8, explain_to=None):
    spark = joined.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        name = f"mem_{uuid.uuid4().hex[:12]}"
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if explain_to is not None:
            # q.explain() exposes only the LAST epoch's executed plan, and
            # AvailableNow ends on an empty no-new-data epoch — poll while
            # the query runs and keep the capture of the DATA batch (the
            # one whose scan node reads the parquet, not LocalTableScan)
            while q.isActive:
                buf = io.StringIO()
                try:
                    with redirect_stdout(buf):
                        q.explain(extended=False)
                except Exception:
                    pass
                txt = buf.getvalue()
                if "FileScan" in txt or "Scan parquet" in txt:
                    explain_to.append(txt)
                time.sleep(0.05)
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


def shape_a(spark, sf_dir):
    from scabillmatch_spark.streaming import events as SE

    stream = SE.read_events_stream(spark, sf_dir)
    return SE.interval_join(
        stream.filter(F.col("event_type") == "purchase"),
        stream.filter(F.col("event_type") == "click"),
        lag_minutes=15,
    )


def shape_b(spark, sf_dir):
    from scabillmatch_spark.streaming import events as SE

    stream = SE.read_events_stream(spark, sf_dir)
    base = (
        stream.select("user_id", "event_id", "ts", "event_type")
        .filter(F.col("event_type").isin("purchase", "click"))
        .repartition("user_id")
    )
    return SE.interval_join(
        base.filter(F.col("event_type") == "purchase"),
        base.filter(F.col("event_type") == "click"),
        lag_minutes=15,
    )


def main() -> None:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from scabillmatch_spark.session import get_spark

    spark = get_spark("interval_tee_ab", shuffle_partitions=32)

    # identical values first
    rows_a = sorted(map(tuple, run_stream(shape_a(spark, sf_dir)).collect()))
    rows_b = sorted(map(tuple, run_stream(shape_b(spark, sf_dir)).collect()))
    assert rows_a == rows_b, (
        f"value mismatch: {len(rows_a)} vs {len(rows_b)} rows; "
        f"first diff {next((x for x in zip(rows_a, rows_b) if x[0] != x[1]), None)}"
    )
    print(f"# values identical: {len(rows_a)} rows", file=sys.stderr)

    # plan capture (one run each)
    plans_a, plans_b = [], []
    run_stream(shape_a(spark, sf_dir), explain_to=plans_a).count()
    run_stream(shape_b(spark, sf_dir), explain_to=plans_b).count()
    assert plans_a and plans_b, (len(plans_a), len(plans_b))
    os.makedirs("plans/r16", exist_ok=True)
    with open("plans/r16/events_stream_interval_join_microbatch_current.txt", "w") as f:
        f.write(plans_a[-1])
    with open("plans/r16/events_stream_interval_join_microbatch_teed_rejected.txt", "w") as f:
        f.write(plans_b[-1])
    for tag, txt in (("A", plans_a[-1]), ("B", plans_b[-1])):
        n_scan = txt.count("FileScan parquet") + txt.count("Scan parquet")
        n_ex = txt.count("Exchange")
        n_reuse = txt.count("ReusedExchange")
        print(f"# shape {tag}: file_scans~{n_scan} exchanges={n_ex} "
              f"reused={n_reuse}", file=sys.stderr)

    # interleaved min-of-N wall (count() on the drained memory table —
    # the registered query's own action shape)
    ta, tb = [], []
    for _ in range(trials):
        t0 = time.perf_counter()
        run_stream(shape_a(spark, sf_dir)).count()
        ta.append(round(time.perf_counter() - t0, 3))
        t0 = time.perf_counter()
        run_stream(shape_b(spark, sf_dir)).count()
        tb.append(round(time.perf_counter() - t0, 3))
    print(f"A(current) trials={ta} min={min(ta)}")
    print(f"B(teed)    trials={tb} min={min(tb)}")


if __name__ == "__main__":
    main()
