"""As-of and range joins — operators Spark lacks natively, expressed as
compositions of built-ins (SURVEY-north-star "custom operators" tier (a)).

- asof_join: for each probe row, the latest build row with
  build.ts <= probe.ts for the same key. Implemented with the union +
  sorted-window carry-forward trick: one shuffle on (key), no per-key
  driver logic, no UDF. Equivalent to DuckDB/kdb ASOF JOIN semantics.

- range_self_join: pairs of rows for the same key within a time window.
  Implemented as a time-bucket equi-join probing each bucket and its
  predecessor — turns an inequality theta-join into a keyed join whose
  fan-out is bounded by bucket occupancy (the scale path; a naive
  |t1-t2|<w theta join is quadratic per key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    time_col: str = "ts",
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: probe rows + the build row with the greatest
    ``time_col`` <= probe's time for the same ``key`` (NULLs when none).

    Plan: tag both sides, union, window sorted by (time, tag) per key,
    carry the last build time forward with last_value(ignorenulls). Build
    columns other than key/time are re-attached by (key, time) equi-join.
    """
    b = build.select(
        F.col(key), F.col(time_col).alias("__bt"), F.lit(0).alias("__tag")
    )
    p = probe.withColumn("__tag", F.lit(1)).withColumn("__bt", F.lit(None).cast(b.schema["__bt"].dataType))
    merged = p.select(key, F.col(time_col).alias("__pt"), "__tag", "__bt").unionByName(
        b.select(key, F.col("__bt").alias("__pt"), "__tag", "__bt")
    )
    w = (
        W.partitionBy(key)
        .orderBy(F.asc("__pt"), F.asc("__tag"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = merged.withColumn(
        "__last_bt", F.last("__bt", ignorenulls=True).over(w)
    ).filter(F.col("__tag") == 1)
    out = probe.join(
        carried.select(
            F.col(key).alias("__k"), F.col("__pt"), F.col("__last_bt")
        ),
        (F.col(key) == F.col("__k")) & (F.col(time_col) == F.col("__pt")),
    ).drop("__k", "__pt")
    return out.withColumnRenamed("__last_bt", f"{time_col}{suffix}")


def range_self_join(
    df: DataFrame,
    key: str,
    time_col: str,
    id_col: str,
    window_us: int,
) -> DataFrame:
    """Pairs (id1, id2) of same-key rows with 0 < t2 - t1 <= window_us
    (micros). Bucketed formulation: equi-join on (key, bucket) for the same
    and the next bucket — linear in true pair count, AQE-splittable."""
    us = F.unix_micros(F.col(time_col))
    base = df.select(
        F.col(key), F.col(id_col), us.alias("__us"), (us / window_us).cast("long").alias("__b")
    )
    probe = base.select(
        F.col(key), F.col(id_col).alias("id2"), F.col("__us").alias("__us2"), "__b"
    )
    # each row probes its own bucket and the previous one
    left = base.select(
        key, F.col(id_col).alias("id1"), F.col("__us").alias("__us1"),
        F.explode(F.array(F.col("__b"), F.col("__b") + 1)).alias("__b"),
    )
    return (
        left.join(probe, [key, "__b"])
        .filter(
            (F.col("__us2") > F.col("__us1"))
            & (F.col("__us2") - F.col("__us1") <= window_us)
        )
        .select(key, "id1", "id2", (F.col("__us2") - F.col("__us1")).alias("gap_us"))
        .dropDuplicates([key, "id1", "id2"])
    )
