"""Primary-key parsing + canonical pair ordering as Column expressions.

The reference's pk is semantic: "{STATE}_{year}_{docid}_{docversion}". Its
postprocessing parses it with split("_")(1) and swaps pair columns so the
lexically-smaller key comes first (AnalysisUtils.scala:126-167, four UDFs) —
all of which collapse to least/greatest/when expressions here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pk_part(pk: Column | str, idx: int) -> Column:
    """idx-th '_'-separated component of the primary key (0-based)."""
    c = F.col(pk) if isinstance(pk, str) else pk
    return F.split(c, "_")[idx]


def pk_state(pk: Column | str) -> Column:
    return pk_part(pk, 0)


def pk_year(pk: Column | str) -> Column:
    return pk_part(pk, 1).cast("long")


def make_pk(state: Column, year: Column, docid: Column, docversion: Column) -> Column:
    """'{STATE}_{year}_{docid}_{docversion}' (dataformat/Preprocess.py)."""
    return F.concat_ws("_", state, year.cast("string"), docid, docversion)


def canonical_pair(df: DataFrame, k1: str = "pk1", k2: str = "pk2") -> DataFrame:
    """Reorder pair columns so the smaller key is first
    (imposeTemporalOrder, AnalysisUtils.scala:159-167 — no UDF, no shuffle)."""
    lo, hi = F.least(F.col(k1), F.col(k2)), F.greatest(F.col(k1), F.col(k2))
    return df.withColumn("__lo", lo).withColumn("__hi", hi).drop(k1, k2).withColumnRenamed(
        "__lo", k1
    ).withColumnRenamed("__hi", k2)
