"""Chaos determinism check for the correctness gate: run a set of
queries-vs-oracle comparisons N times IN ONE session with a different
random query order each pass, to flush any order dependence the fixed
registry order hides (shared caches, session conf mutated by one query
and read by the next, temp-dir reuse). A query that is green in
registry order but red in some shuffled order is exactly the class of
defect that could produce a driver-red/judge-green split like r7's.

Usage:
    python tools_chaos_oracle.py                  # r8-touched set, 5 passes
    python tools_chaos_oracle.py --passes 3 --queries io_csv_roundtrip,...
"""

from __future__ import annotations

import argparse
import random
import sys
import time

from tools_compare import normalize as _normalize
from tools_compare import oracle_type_sig, spark_type_sig

T2_SF = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)

# every entry whose Spark plan, oracle SQL, or shared machinery changed
# in round 12: the two NEW registered rows (graph_bfs_paths — which also
# exercises the bfs validate-before-cache reorder — and
# graph_cluster_audit, composing CC x LPA), every query over a loop
# operator the _RoundCuts rework touched (pregel/LPA/CC/k-core call
# sites restructured even though the local path is behaviorally
# unchanged — exactly the shared-cache/lineage class chaos exists to
# flush), and the forensic-append rotation-skip rework's two consumers
DEFAULT_SET = [
    "graph_bfs_paths",
    "graph_cluster_audit",
    "doc_label_propagation",
    "doc_dup_clusters",
    "doc_dedup_rewrite",
    "graph_pregel_walks",
    "graph_weighted_pagerank",
    "graph_pagerank",
    "graph_kcore",
    "graph_shortest_paths",
    "graph_weighted_paths",
    "io_csv_roundtrip",
    # r12 session 3 touched surface: per-micro-batch shuffle sizing (4
    # streaming rows), the _half_up_round stateful kernels, and the
    # shared shingle band-index cache (3 dedup rows slice one persisted
    # projection — exactly the cross-query shared-cache class this tool
    # exists to flush)
    "events_stream_tumbling",
    "events_stream_dedup",
    "events_stream_stateful",
    "stream_merge_upsert",
    "stream_ingest_dedup",
    "minhash_lsh_dedup",
    "minhash_delta_dedup",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=5)
    ap.add_argument("--queries", type=str, default="")
    ap.add_argument("--seed", type=int, default=8)
    args = ap.parse_args()
    names = (
        [q for q in args.queries.split(",") if q]
        if args.queries
        else DEFAULT_SET
    )

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(entrymod.queries())
    osql = dict(entrymod.oracle_sql())
    # banked pre-validated rows (not yet in the registry) resolve by the
    # house naming convention q_<name> / _<name>_oracle — chaos can flush
    # shared-state defects in them BEFORE their window lands
    for n in names:
        if n not in qs:
            qfn = getattr(entrymod, f"q_{n}", None)
            ofn = getattr(entrymod, f"_{n}_oracle", None)
            if qfn is not None and ofn is not None:
                qs[n] = qfn
                osql[n] = ofn()
    unknown = [n for n in names if n not in qs]
    assert not unknown, f"unknown queries: {unknown}"

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{T2_SF}/{t}.parquet')"
        )
    # oracle side is deterministic and session-free: compute once.
    # r10: also pin the canonical Arrow TYPE signature — the layer the
    # r7-r9 value-only mirror missed (DuckDB HUGEINT vs Spark int64).
    expected = {}
    for n in names:
        orel = con.sql(osql[n])
        expected[n] = (
            sorted(d[0] for d in orel.description),
            _normalize([d[0] for d in orel.description], orel.fetchall()),
            oracle_type_sig(con, osql[n]),
        )

    rng = random.Random(args.seed)
    n_red = 0
    for p in range(args.passes):
        order = names[:]
        rng.shuffle(order)
        t0 = time.time()
        reds = []
        for n in order:
            sdf = qs[n](spark, T2_SF)
            srows = [tuple(r) for r in sdf.collect()]
            ok = (
                sorted(sdf.columns) == expected[n][0]
                and _normalize(sdf.columns, srows) == expected[n][1]
                and spark_type_sig(sdf) == expected[n][2]
            )
            if not ok:
                reds.append(n)
        n_red += len(reds)
        print(
            f"pass {p + 1}/{args.passes} order={order} "
            f"red={reds or 'none'} ({time.time() - t0:.1f}s)",
            flush=True,
        )
    print(f"TOTAL red rows over {args.passes} shuffled passes: {n_red}")
    return 1 if n_red else 0


if __name__ == "__main__":
    sys.exit(main())
