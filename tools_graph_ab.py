#!/usr/bin/env python
"""Same-session A/B of the graph trio at bench position (round-5 verdict
item #4): reproduce the bench harness's warmup (tables, worker pool,
scored/edge caches), then run graph_triangle_count / graph_shortest_paths /
graph_weighted_paths in 3 alternating trials each at sf0.1. If min-of-3 is
back at r4 levels (~2.0/2.4/2.6 s), the r5 regression (6.46/4.54/8.26 s) was
host noise on single timed passes; if all trials stay high, it's real and
the lever is per-round shuffle partitioning for the tiny iterative frames."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from scabillmatch_spark.io.sources import TESTDATA_TABLES, read_table
from scabillmatch_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("graph_ab")
    for t in TESTDATA_TABLES:
        read_table(spark, sf_dir, t).count()
    spark.range(256, numPartitions=32).mapInPandas(lambda it: it, "id long").count()
    t0 = time.perf_counter()
    entrymod._scored_doc_pairs(spark, sf_dir).count()
    entrymod._doc_edges(spark, sf_dir).count()
    print(f"# cache warm: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    names = ["graph_triangle_count", "graph_shortest_paths", "graph_weighted_paths"]
    qs = entrymod.queries()
    results: dict[str, list[float]] = {n: [] for n in names}
    # one untimed pass each (codegen), then 3 alternating timed trials
    for n in names:
        qs[n](spark, sf_dir).count()
    for trial in range(3):
        for n in names:
            t0 = time.perf_counter()
            qs[n](spark, sf_dir).count()
            dt = round(time.perf_counter() - t0, 2)
            results[n].append(dt)
            print(f"# trial {trial} {n}: {dt}s", file=sys.stderr)
    print(json.dumps({n: {"trials": v, "min": min(v)} for n, v in results.items()}))


if __name__ == "__main__":
    main()
