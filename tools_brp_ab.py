#!/usr/bin/env python
"""Same-session interleaved A/B harness for emb_brp_euclidean_join.

r13 mode (--near-dup, value-identical sizing arms) measured the
in-plan repartition lever: 2.86 s -> 1.34 s min-of-3.

r14 default mode is a DESIGN A/B: arm A is the r13 design (fixed
bucket length 0.25, OR-of-3 single-projection tables) WITH the r13
plan sizing applied (repartition(join_parts, bkt) before the persist +
repartition before dropDuplicates — sizing-matched so the comparison
isolates the bucket-key redesign, not the r13 sizing win), arm B the
REGISTERED density-scaled AND-composed query. The two arms produce
INTENTIONALLY DIFFERENT outputs (different candidate sets, same exact
verify), so the default mode reports output sizes instead of asserting
value identity; --near-dup keeps the strict identity assert for its
sizing-only arms.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from entry_oracles import _BRP_DIST_THRESHOLD, _hyperplanes

# the r13 design this A/B regresses against: fixed bucket length,
# OR-of-3 single-projection tables (measured superlinear in scale_check)
_OLD_BUCKET_LEN = 0.25
_OLD_TABLES = 3
from pyspark.sql import functions as F
from scabillmatch_spark.functions import similarity as SIM
from scabillmatch_spark.io.sources import TESTDATA_TABLES, read_table
from scabillmatch_spark.operators import blocking
from scabillmatch_spark.session import get_spark


def q_brp_old(spark, sf_dir):
    # the r13-SIZED old design: fixed L, OR-of-3, WITH the in-plan
    # repartition lever — the honest baseline for the r14 redesign
    planes = _hyperplanes(_OLD_TABLES, 64, salt="brp:")
    join_parts = max(8, spark.sparkContext.defaultParallelism // 4)
    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    emb = blocking.ensure_parallelism(emb)
    buckets = []
    for j, plane in enumerate(planes):
        p = F.array(*[F.lit(x) for x in plane])
        dot = F.aggregate(
            F.zip_with(F.col("v"), p, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        buckets.append(
            F.concat_ws(
                "|", F.lit(str(j)), F.floor(dot / _OLD_BUCKET_LEN).cast("string")
            )
        )
    hashed = (
        emb.select("vec_id", F.explode(F.array(*buckets)).alias("bkt"))
        .repartition(join_parts, "bkt")
        .persist()
    )
    a, b = hashed.alias("a"), hashed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.bkt") == F.col("b.bkt"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("pk1"),
            F.col("b.vec_id").alias("pk2"),
        )
        .repartition(join_parts, "pk1", "pk2")
        .dropDuplicates(["pk1", "pk2"])
    )
    v1 = emb.select(F.col("vec_id").alias("pk1"), F.col("v").alias("v1"))
    v2 = emb.select(F.col("vec_id").alias("pk2"), F.col("v").alias("v2"))
    dist = SIM.euclidean_distance(F.col("v1"), F.col("v2"))
    return (
        cand.join(v1, "pk1")
        .join(v2, "pk2")
        .withColumn("dist", dist)
        .filter(F.col("dist") <= _BRP_DIST_THRESHOLD)
        .select("pk1", "pk2", F.round("dist", 6).alias("dist"))
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("brp_ab")
    for t in TESTDATA_TABLES:
        read_table(spark, sf_dir, t).count()
    spark.range(256, numPartitions=32).mapInPandas(lambda it: it, "id long").count()

    if "--near-dup" in sys.argv:
        # same lever on the sibling banded-LSH cascade (_emb_near_dup_pairs)
        parts = max(8, spark.sparkContext.defaultParallelism // 4)
        arms = {
            "A_confwidth": lambda: entrymod._emb_near_dup_pairs(spark, sf_dir),
            "B_sized": lambda: entrymod._emb_near_dup_pairs(spark, sf_dir, parts),
        }
    else:
        arms = {
            "A_old": lambda: q_brp_old(spark, sf_dir),
            "B_registered": lambda: entrymod.queries()["emb_brp_euclidean_join"](spark, sf_dir),
        }
    # value-identity check first (also serves as the codegen warmup)
    rows = {}
    for name, build in arms.items():
        spark.catalog.clearCache()
        rows[name] = sorted(map(tuple, build().collect()))
    va, vb = rows.values()
    if "--near-dup" in sys.argv:
        # sizing-only arms must be value-identical
        assert va == vb, "arms disagree on values"
        print(f"# arms value-identical: {len(va)} pairs", file=sys.stderr)
    else:
        # r14: arm A is the OLD DESIGN (fixed L, OR-of-3) and arm B the
        # density-scaled AND-composed registered query — outputs
        # intentionally differ; report sizes instead of asserting identity
        print(f"# arm outputs: A={len(va)} B={len(vb)} pairs", file=sys.stderr)

    results: dict[str, list[float]] = {n: [] for n in arms}
    for trial in range(3):
        for name, build in arms.items():
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            build().count()
            dt = round(time.perf_counter() - t0, 2)
            results[name].append(dt)
            print(f"# trial {trial} {name}: {dt}s", file=sys.stderr)
    print(json.dumps({n: {"trials": v, "min": min(v)} for n, v in results.items()}))


if __name__ == "__main__":
    main()
