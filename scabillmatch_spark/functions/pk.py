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


def in_list(col: Column | str, ids: list[str], negate: bool = False) -> Column:
    """P5 dynamic IN-list / NOT-IN predicate. The reference built SQL strings
    from a bill-id file and re-parsed them (feature/Utils.scala:284-305);
    a Column isin handles any list size and stays in codegen."""
    c = F.col(col) if isinstance(col, str) else col
    pred = c.isin(ids)
    return ~pred if negate else pred


def flatten_struct(df: DataFrame, struct_col: str, prefix: str = "") -> DataFrame:
    """P9 nested-struct flatten (the reference's children/child helpers after
    joinWith, LatestVersionExtracter.scala:61-72): expand struct fields to
    top-level columns."""
    fields = [f.name for f in df.schema[struct_col].dataType.fields]
    cols = [c for c in df.columns if c != struct_col] + [
        F.col(f"{struct_col}.{f}").alias(f"{prefix}{f}") for f in fields
    ]
    return df.select(*cols)


def canonical_pair(df: DataFrame, k1: str = "pk1", k2: str = "pk2") -> DataFrame:
    """Reorder pair columns so the smaller key is first
    (imposeTemporalOrder, AnalysisUtils.scala:159-167 — no UDF, no shuffle)."""
    lo, hi = F.least(F.col(k1), F.col(k2)), F.greatest(F.col(k1), F.col(k2))
    return df.withColumn("__lo", lo).withColumn("__hi", hi).drop(k1, k2).withColumnRenamed(
        "__lo", k1
    ).withColumnRenamed("__hi", k2)
