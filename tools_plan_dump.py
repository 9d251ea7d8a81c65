#!/usr/bin/env python
"""Dump .explain("formatted") for registered queries to plans/<tag>/.

Usage:
    python tools_plan_dump.py --tag r15 --suffix _before [name ...]

With no names, dumps every registered query. Building a query's DataFrame
can itself run jobs (model fits, io-roundtrip writes); each query is
wrapped so one failure doesn't kill the sweep. Also prints a one-line
plan-shape summary per query (exchanges / joins / python-eval nodes) so
plan regressions are greppable.
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from scabillmatch_spark.session import get_spark


def plan_text(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def summarize(txt: str) -> str:
    n_ex = len(re.findall(r"\bExchange\b", txt))
    joins = re.findall(
        r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)\b",
        txt,
    )
    n_py = len(re.findall(r"\b(BatchEvalPython|ArrowEvalPython|MapInArrow|"
                          r"FlatMapGroupsInArrow|MapInPandas|"
                          r"FlatMapGroupsInPandas)\b", txt))
    from collections import Counter

    jc = Counter(joins)
    jtxt = ",".join(f"{k}x{v}" for k, v in sorted(jc.items())) or "-"
    return f"exchanges={n_ex} joins={jtxt} pyeval={n_py}"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r15")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--warm", action="store_true",
                    help="pre-warm the shared caches the bench pre-warms, "
                         "so plans show the benched InMemoryTableScan shape")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan_dump")
    if args.warm:
        entrymod._scored_doc_pairs(spark, args.sf_dir).count()
        entrymod._doc_edges(spark, args.sf_dir).count()
        entrymod._doc_dup_components(spark, args.sf_dir).count()
        entrymod._shingle_bands(spark, args.sf_dir).count()
    qmap = entrymod.queries()
    names = args.names or list(qmap)
    unknown = [n for n in names if n not in qmap]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    for name in names:
        t0 = time.perf_counter()
        try:
            df = qmap[name](spark, args.sf_dir)
            txt = plan_text(df)
        except Exception as e:  # noqa: BLE001 — sweep must finish
            print(f"# {name}: FAILED {type(e).__name__}: {e}")
            continue
        path = os.path.join(out_dir, f"{name}{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"# {name}: {summarize(txt)} "
              f"({time.perf_counter()-t0:.1f}s) -> {path}")


if __name__ == "__main__":
    main()
