"""Driver-protocol rehearsal: reproduce the correctness gate's own run
shape in one fresh process, so a red row that appears only under driver
conditions can be chased (r7 shipped two such rows — green in every
plain-session re-check, red in the official record).

Protocol mirrored (per the r7 judge's reconstruction of the gate):
  1. fresh process, plain SparkSession (the driver builds its own);
  2. SMOKE: execute the FIRST-50 window queries at sf0.001 in registry
     order (collect only — the driver's ">= 0 rows with stable schema");
  3. COMPARE: re-run the same 50 at sf0.01, each against its DuckDB
     oracle — row count, sorted column names, order-insensitive
     normalized value comparison (the t2 gate).

Environment forensics are printed up front (DuckDB/PySpark versions, pid,
temp-root state) because the r7 red rows' candidate explanations were all
environmental: oracle-side DuckDB skew, /tmp state, or harness
concurrency. Run it 3+ times via --repeat (each repeat is a fresh
subprocess, matching "fresh process" per run).

Usage:
    python tools_driver_rehearsal.py               # one full pass
    python tools_driver_rehearsal.py --repeat 3    # 3 fresh-process passes
    python tools_driver_rehearsal.py --window 10   # first N instead of 50
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

SMOKE_SF = "/root/testdata/sf0.001"
T2_SF = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def run_once(window_n: int) -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    print(
        f"# rehearsal pid={os.getpid()} duckdb={duckdb.__version__} "
        f"python={sys.version.split()[0]}",
        flush=True,
    )
    tmp = "/tmp"
    stale = [n for n in os.listdir(tmp) if n.startswith("scabillmatch_")]
    print(f"# temp-root scabillmatch_* entries at start: {stale}", flush=True)

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import pyspark

    print(f"# pyspark={pyspark.__version__}", flush=True)

    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    window = list(qs)[:window_n]

    t0 = time.time()
    for name in window:
        df = qs[name](spark, SMOKE_SF)
        n = len(df.collect())
        assert n >= 0
    print(f"# smoke {len(window)}q @sf0.001: {time.time() - t0:.1f}s", flush=True)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{T2_SF}/{t}.parquet')"
        )

    from tools_compare import compare_typed

    t0 = time.time()
    results = {}
    n_red = 0
    for name in window:
        sdf = qs[name](spark, T2_SF)
        srows = [tuple(r) for r in sdf.collect()]
        # r10: compare_typed adds the Arrow-typed layer (canonical type
        # signatures) the r7-r9 value-only mirror was blind to — a DuckDB
        # HUGEINT column now reds here exactly as it did in the gate.
        results[name] = compare_typed(sdf, srows, con, osql[name])
        if not all(
            results[name][k]
            for k in ("rows_match", "schema_match", "hash_match", "type_match")
        ):
            n_red += 1
            print(f"RED {name}: {results[name]}", flush=True)
    print(f"# t2 compare {len(window)}q @sf0.01: {time.time() - t0:.1f}s", flush=True)
    print(json.dumps({"green": len(window) - n_red, "red": n_red}))
    return n_red


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument("--_child", action="store_true", help=argparse.SUPPRESS)
    args = ap.parse_args()
    if args.repeat <= 1 or args._child:
        return run_once(args.window)
    rc = 0
    for i in range(args.repeat):
        print(f"==== rehearsal pass {i + 1}/{args.repeat} (fresh process) ====")
        r = subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--_child",
                "--window",
                str(args.window),
            ],
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        rc |= r.returncode
    return rc


if __name__ == "__main__":
    sys.exit(main())
