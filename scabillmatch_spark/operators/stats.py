"""Descriptive statistics over scored-pair relations (reference stats/
AnalysisUtils + Plot.scala + docs/correlations.md).

Thin, explicit wrappers so every SURVEY §2.4 aggregate maps to a named
engine function. All single-shuffle groupBy/agg plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def describe(df: DataFrame, col: str, by: str | None = None) -> DataFrame:
    """count/mean/stddev/min/max (reference data.describe(), README.md:106-116)."""
    aggs = [
        F.count(F.lit(1)).alias("count"),
        F.avg(col).alias("mean"),
        F.stddev_samp(col).alias("stddev"),
        F.min(col).alias("min"),
        F.max(col).alias("max"),
    ]
    return df.groupBy(by).agg(*aggs) if by else df.agg(*aggs)


def pearson_corr(df: DataFrame, col1: str, col2: str) -> float:
    """Statistics.corr analog (docs/correlations.md: corr(jaccard, cosine)
    = 0.328 on the 10-state run)."""
    return float(df.agg(F.corr(col1, col2)).first()[0])


def histogram(df: DataFrame, col: str, width: float, lo: float = 0.0) -> DataFrame:
    """Fixed-width histogram (Histogrammar Bin analog, utils/Plot.scala:31)."""
    bucket = F.floor((F.col(col) - lo) / width).cast("long")
    return df.groupBy(bucket.alias("bucket")).agg(F.count(F.lit(1)).alias("n")).orderBy("bucket")


def cross_measure_join(scored_a: DataFrame, scored_b: DataFrame, suffixes=("_a", "_b")) -> DataFrame:
    """Join two scored-pair relations on (pk1, pk2) for correlation studies
    (reference README.md:93, J7)."""
    a = scored_a.withColumnRenamed("similarity", f"similarity{suffixes[0]}")
    b = scored_b.withColumnRenamed("similarity", f"similarity{suffixes[1]}")
    return a.join(b, ["pk1", "pk2"])


def pair_space_accounting(df: DataFrame, group_col: str) -> DataFrame:
    """n*(n-1)/2 candidate pairs per block (docs/tuning_kmeans.md's
    npermutations audit, F12) + the blocked total."""
    per = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n")).withColumn(
        "npermutations", F.col("n") * (F.col("n") - 1) / 2
    )
    return per


def sequential_funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Strict sequential funnel: per user, the first timestamp of step i
    that occurs strictly AFTER the user's step-(i-1) timestamp — the
    conversion-analysis shape (view -> click -> purchase). Returns one row
    per user with a ``t_<step>`` timestamp column per step (NULL = never
    reached).

    Plan shape: one shuffle on the user key; each step is an unordered
    window MIN over the same partitioning (Catalyst reuses the exchange
    across the chained window selects), so adding funnel steps adds
    projections, not shuffles. At 100 TB pre-filter ``events`` to the
    funnel's event types so the shuffle carries only funnel rows.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(user_col)
    df = events.select(user_col, ts_col, type_col)
    prev: Column | None = None
    for step in steps:
        cond = F.col(type_col) == step
        if prev is not None:
            # ts > NULL is NULL, so users who never reached the previous
            # step correctly get NULL for this one too
            cond = cond & (F.col(ts_col) > F.col(prev))
        col_name = f"t_{step}"
        df = df.withColumn(col_name, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = col_name
    return df.select(
        user_col, *[f"t_{s}" for s in steps]
    ).dropDuplicates([user_col])
