"""Pair scoring and post-processing.

Replaces the reference's two-process handoff (ExtractCandidates ->
objectFile -> BillAnalyzer, then AnalysisUtils/Postprocessor) with single
DataFrame plans:

- score_pairs: attach feature/set columns to both sides (J2, two equi-joins,
  feature/Utils.scala:251-260) and evaluate a similarity measure.
- top_n / sample_n: skim outputs (AnalysisUtils.scala:39-113).
- enrich_pairs: pull content for both keys (J4, AnalysisUtils.scala:60-61).
- make_light / make_skim: output shapes from docs/README.md Postprocessing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scabillmatch_spark.functions import similarity as SIM


def score_pairs(
    pairs: DataFrame,
    features: DataFrame,
    measure: Callable[[Column, Column], Column],
    id_col: str = "primary_key",
    feature_col: str = "features",
) -> DataFrame:
    """pairs(pk1,pk2) ⋈ features twice -> (pk1, pk2, similarity).

    Two shuffle joins on the id key (broadcast if the feature table is small
    — Catalyst/AQE decides). The measure is a Column expression evaluated
    inline; no Python in the loop.
    """
    f1 = features.select(
        F.col(id_col).alias("pk1"), F.col(feature_col).alias("__f1")
    )
    f2 = features.select(
        F.col(id_col).alias("pk2"), F.col(feature_col).alias("__f2")
    )
    return (
        pairs.join(f1, "pk1")
        .join(f2, "pk2")
        .withColumn("similarity", measure(F.col("__f1"), F.col("__f2")))
        .drop("__f1", "__f2")
    )


def top_n(scored: DataFrame, n: int, ascending: bool = False) -> DataFrame:
    """Global top-N skim with deterministic tie-break
    (AnalysisUtils.scala:49-51,67-69). Spark plans sort+limit as TakeOrdered
    (per-partition top-N then merge — no global shuffle)."""
    order = [
        F.col("similarity").asc() if ascending else F.col("similarity").desc(),
        F.col("pk1").asc(),
        F.col("pk2").asc(),
    ]
    return scored.orderBy(*order).limit(n)


def sample_n(scored: DataFrame, approx_rows: int, threshold: float | None = None, seed: int = 42) -> DataFrame:
    """Bernoulli sample ~approx_rows after optional threshold filter
    (AnalysisUtils.scala:98-104)."""
    df = scored if threshold is None else scored.filter(F.col("similarity") > threshold)
    total = df.count()
    frac = min(1.0, approx_rows / max(total, 1))
    return df.sample(False, frac, seed)


def enrich_pairs(
    scored: DataFrame,
    docs: DataFrame,
    id_col: str = "primary_key",
    content_col: str = "content",
) -> DataFrame:
    """Attach both documents' content (J4, AnalysisUtils.scala:60-61,92-93)."""
    d1 = docs.select(F.col(id_col).alias("pk1"), F.col(content_col).alias("content1"))
    d2 = docs.select(F.col(id_col).alias("pk2"), F.col(content_col).alias("content2"))
    return scored.join(d1, "pk1").join(d2, "pk2")


def make_light(scored: DataFrame) -> DataFrame:
    """(pk1_smaller, pk2_larger, similarity) with canonical key order
    (AnalysisUtils.scala:164; ordering UDFs :126-156 -> least/greatest)."""
    return scored.select(
        F.least("pk1", "pk2").alias("pk1_smaller"),
        F.greatest("pk1", "pk2").alias("pk2_larger"),
        "similarity",
    )


def make_skim(enriched: DataFrame) -> DataFrame:
    """(content1_smaller, content2_larger, pk1_smaller, pk2_larger, similarity)
    (AnalysisUtils.scala:162)."""
    first_smaller = F.col("pk1") <= F.col("pk2")
    return enriched.select(
        F.when(first_smaller, F.col("content1")).otherwise(F.col("content2")).alias("content1_smaller"),
        F.when(first_smaller, F.col("content2")).otherwise(F.col("content1")).alias("content2_larger"),
        F.least("pk1", "pk2").alias("pk1_smaller"),
        F.greatest("pk1", "pk2").alias("pk2_larger"),
        "similarity",
    )


def similarity_histogram(scored: DataFrame, width: float = 10.0, lo: float = 0.0, hi: float = 100.0) -> DataFrame:
    """Fixed-width histogram of the similarity column — the reference used
    Histogrammar Bin(10,0,100) (utils/Plot.scala:31); here a groupBy on the
    bucket index (map-side partial agg, one small shuffle)."""
    nbins = int((hi - lo) / width)
    bucket = F.floor((F.col("similarity") - lo) / width).cast("long")
    bucket = F.when(bucket < 0, -1).when(bucket >= nbins, nbins).otherwise(bucket)
    return (
        scored.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket")
    )
