"""Document sectioning (reference dataformat/secformat_for_df.py: bills split
on 'SECTION \\d' into per-section records with pk = "{j}_{pk}").

Generalized: split on any regex, explode with the section index, derive the
compound section pk. Narrow operation (posexplode) — output rows scale with
section count, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_sections(
    df: DataFrame,
    id_col: str,
    text_col: str,
    pattern: str = r"SECTION \d+",
    min_chars: int = 1,
) -> DataFrame:
    """One row per (document, section): (section_pk, section_idx, <id>, section_text).

    section_pk = "{idx}_{id}" mirroring the reference's compound key."""
    parts = F.split(F.col(text_col), pattern)
    exploded = df.select(
        F.col(id_col), F.posexplode(parts).alias("section_idx", "section_text")
    )
    return (
        exploded.filter(F.length(F.trim("section_text")) >= min_chars)
        .withColumn(
            "section_pk",
            F.concat_ws("_", F.col("section_idx").cast("string"), F.col(id_col).cast("string")),
        )
        .select("section_pk", "section_idx", id_col, "section_text")
    )
