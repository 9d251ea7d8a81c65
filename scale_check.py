#!/usr/bin/env python
"""Scaling check: run the flagship LSH near-dup pipeline on 1x/2x/4x copies
of the sf0.1 documents corpus (each copy's vocabulary disjoint, so corpus
size scales while the near-dup structure per copy is constant) and report
wall time per scale. Near-linear growth = the blocked plan holds; quadratic
growth would indicate an un-blocked join sneaking in.

Usage: python scale_check.py  ->  one JSON line {"copies": {1: s, 2: s, 4: s}}
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

from scabillmatch_spark.functions import similarity as SIM
from scabillmatch_spark.functions import text as TX
from scabillmatch_spark.operators import blocking, pairs
from scabillmatch_spark.session import get_spark


def corpus(spark, sf_dir: str, copies: int):
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    parts = []
    for i in range(copies):
        # disjoint vocab per copy: prefix every word with the copy tag
        parts.append(
            base.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                F.regexp_replace("text", r"(\w+)", f"c{i}$1").alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def flagship_time(spark, docs) -> float:
    sets = docs.select(
        F.col("doc_id").cast("string").alias("primary_key"),
        TX.token_id_set("text").alias("tokens"),
    ).persist()
    t0 = time.perf_counter()
    cands = blocking.lsh_candidate_pairs(
        sets, "primary_key", "tokens", num_hashes=32, num_bands=4
    )
    scored = pairs.score_pairs(cands, sets, SIM.jaccard, "primary_key", "tokens")
    pairs.top_n(scored.filter(F.col("similarity") >= 90.0), 1000).collect()
    dt = time.perf_counter() - t0
    sets.unpersist()
    return round(dt, 2)


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark("scale_check")
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()  # warmup
    results = {}
    for copies in (1, 2, 4):
        docs = corpus(spark, sf_dir, copies)
        n = docs.count()
        results[copies] = flagship_time(spark, docs)
        print(f"# copies={copies} docs={n} time={results[copies]}s", file=sys.stderr)
    print(json.dumps({"metric": "flagship_scaling", "unit": "sec", "copies": results}))


if __name__ == "__main__":
    main()
