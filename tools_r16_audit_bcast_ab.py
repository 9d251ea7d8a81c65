#!/usr/bin/env python
"""r16 optimization round: A/B for graph_cluster_audit's comp-lpa join
(VERDICT r15 Next-round #4).

Both inputs are tiny session-persisted frames (per-vertex rows), yet the
audit's id equi-join planned SortMergeJoin at the session default — two
Exchanges + two Sorts before the groupBy. Arms, interleaved per trial
(same session, warm shared caches, noop sink, guide §1.4/§3.1):

  A  old shape — comp.join(lpa, "id")             (SortMergeJoin)
  B  new shape — comp.join(broadcast(lpa), "id")  (BroadcastHashJoin)

Identical output values are asserted between the arms before timing.

Usage: python tools_r16_audit_bcast_ab.py [n_trials] [sf_dir]
"""
from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def plan_text(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from scabillmatch_spark.session import get_spark

    spark = get_spark("audit_bcast_ab", shuffle_partitions=32)
    import __spark_entry__ as E

    # warm the shared inputs exactly as the bench does
    E._doc_edges(spark, sf_dir).count()
    E._doc_dup_components(spark, sf_dir).count()
    E._lpa_labels(spark, sf_dir).count()

    def audit(broadcast: bool):
        comp = E._doc_dup_components(spark, sf_dir)
        lpa = E._lpa_labels(spark, sf_dir)
        right = F.broadcast(lpa) if broadcast else lpa
        return (
            comp.join(right, "id")
            .groupBy("component")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_vertices"),
                F.count_distinct("label").alias("n_communities"),
                (F.count_distinct("label") > 1).alias("is_bridged"),
            )
        )

    a_rows = sorted(map(tuple, audit(False).collect()))
    b_rows = sorted(map(tuple, audit(True).collect()))
    assert a_rows == b_rows, f"value mismatch: {len(a_rows)} vs {len(b_rows)}"
    print(f"# values identical: {len(a_rows)} rows", file=sys.stderr)

    for tag, bc in (("A", False), ("B", True)):
        txt = plan_text(audit(bc))
        n_ex = len(re.findall(r"\bExchange\b", txt))
        joins = ",".join(
            sorted(set(re.findall(r"\b(\w*Join\w*)\b", txt)))
        ) or "-"
        print(f"# shape {tag}: exchanges={n_ex} joins={joins}", file=sys.stderr)

    ta, tb = [], []
    for _ in range(trials):
        t0 = time.perf_counter()
        noop(audit(False))
        ta.append(round(time.perf_counter() - t0, 3))
        t0 = time.perf_counter()
        noop(audit(True))
        tb.append(round(time.perf_counter() - t0, 3))
    print(f"A(smj)   trials={ta} min={min(ta)}")
    print(f"B(bcast) trials={tb} min={min(tb)}")


if __name__ == "__main__":
    main()
