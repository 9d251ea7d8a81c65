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
    """Left as-of join: each probe row + the build row with the greatest
    ``time_col`` <= probe's time for the same ``key`` (NULL build columns
    when none). Matches DuckDB ``ASOF LEFT JOIN`` semantics, including:

    - exactly ONE output row per probe row — duplicate (key, time) probe
      rows each keep their identity (no re-attach join to fan out on);
    - probe rows with NULL time are kept and get NULL build columns
      (they sort nulls-first, before any build row);
    - NULL-key build rows never match anything (SQL equality rejects
      NULLs) — they are filtered out of the build side, so a NULL-key
      probe row gets NULL build columns rather than pairing with a
      NULL-key build row via the window partition;
    - build payload columns (all but key/time) are attached as
      ``<col><suffix>`` next to ``<time_col><suffix>``.

    Plan: tag both sides, union by name (probe payload rides along; build
    payload packed into one struct), per-key window sorted by (time, tag)
    carries the last build struct forward with last(ignorenulls) — ties at
    equal time see the build row (build sorts first). One shuffle on key,
    no UDF, no join back. If several build rows share (key, time) the
    carried one is the last in window order (unspecified among ties, as in
    DuckDB).
    """
    bpayload = [c for c in build.columns if c not in (key, time_col)]
    bstruct = F.struct(
        F.col(time_col).alias("__bt"), *[F.col(c) for c in bpayload]
    )
    # a NULL build time can never satisfy build.t <= probe.t, and a NULL
    # build key can never equal any probe key (Window.partitionBy would
    # otherwise group NULL-key rows together, diverging from join equality)
    b = build.filter(
        F.col(time_col).isNotNull() & F.col(key).isNotNull()
    ).select(
        F.col(key),
        F.col(time_col).alias("__t"),
        bstruct.alias("__b"),
        F.lit(0).alias("__tag"),
    )
    probe_cols = probe.columns
    p = probe.select(
        *probe_cols,
        F.col(time_col).alias("__t"),
        F.lit(None).cast(b.schema["__b"].dataType).alias("__b"),
        F.lit(1).alias("__tag"),
    )
    merged = p.unionByName(b, allowMissingColumns=True)
    w = (
        W.partitionBy(key)
        .orderBy(F.asc_nulls_first("__t"), F.asc("__tag"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = merged.withColumn(
        "__last", F.last("__b", ignorenulls=True).over(w)
    ).filter(F.col("__tag") == 1)
    return carried.select(
        *probe_cols,
        F.col("__last.__bt").alias(f"{time_col}{suffix}"),
        *[F.col(f"__last.{c}").alias(f"{c}{suffix}") for c in bpayload],
    )


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
