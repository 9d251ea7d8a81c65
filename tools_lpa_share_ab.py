#!/usr/bin/env python
"""r15 optimization round: A/B for the session-shared LPA label relation.

graph_cluster_audit and doc_label_propagation both consume the identical
4-round LPA loop; before this round each call re-ran it. Arms, interleaved
per trial (same session, noop sink, guide 1.4):

  A  old cluster_audit shape — fresh label_propagation per call
  B  new cluster_audit shape — _lpa_labels session-shared persist (warm)

The one-time build cost of the shared relation is timed separately first
(it is the same cost arm A pays on EVERY call). Identical output values
are asserted between the arms before timing.

Usage: python tools_lpa_share_ab.py [n_trials] [sf_dir]
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

    spark = get_spark("lpa_share_ab", shuffle_partitions=32)
    import __spark_entry__ as E
    from scabillmatch_spark.operators import graph

    sc = spark.sparkContext

    # shared inputs warm (the registered queries read them pre-warmed in
    # the bench; both arms see the same warm state)
    E._doc_edges(spark, sf_dir).count()
    E._doc_dup_components(spark, sf_dir).count()

    def audit_of(lpa):
        comp = E._doc_dup_components(spark, sf_dir)
        return (
            comp.join(lpa, "id")
            .groupBy("component")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_vertices"),
                F.count_distinct("label").alias("n_communities"),
                (F.count_distinct("label") > 1).alias("is_bridged"),
            )
        )

    def arm_old() -> None:
        sc.setJobDescription("lpa_ab: OLD fresh label_propagation")
        noop(
            audit_of(
                graph.label_propagation(
                    E._doc_edges(spark, sf_dir),
                    max_iter=4,
                    num_shuffle_partitions=8,
                )
            )
        )

    def arm_new() -> None:
        sc.setJobDescription("lpa_ab: NEW shared _lpa_labels")
        noop(audit_of(E._lpa_labels(spark, sf_dir)))

    # one-time shared build, timed visibly
    t0 = time.perf_counter()
    E._lpa_labels(spark, sf_dir).count()
    print(f"shared _lpa_labels build: {time.perf_counter()-t0:.2f}s")

    # identical-values assertion
    a = audit_of(
        graph.label_propagation(
            E._doc_edges(spark, sf_dir), max_iter=4, num_shuffle_partitions=8
        )
    )
    b = audit_of(E._lpa_labels(spark, sf_dir))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, (
        "arms disagree"
    )
    print("identical-values: OK")

    # warmup pass each, then interleaved timing
    arm_old(); arm_new()
    res = {"old": [], "new": []}
    for _ in range(trials):
        t0 = time.perf_counter(); arm_old(); res["old"].append(time.perf_counter() - t0)
        t0 = time.perf_counter(); arm_new(); res["new"].append(time.perf_counter() - t0)
    for k, v in res.items():
        print(f"{k}: trials={[round(x,2) for x in v]} min={min(v):.2f}")


if __name__ == "__main__":
    main()
