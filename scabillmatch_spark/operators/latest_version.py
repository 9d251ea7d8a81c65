"""Latest-version extraction (the reference's LatestVersionExtracter app).

The reference parses "January 5, 2005"-style dates with a 35-line UDF
cluster (LatestVersionExtracter.scala:10-44), groups by bill family with
``groupByKey`` + ``mapGroups`` sorting versions by timestamp and a version-
priority list (:50-59,88), then joins back to the raw bills and dedups.

Spark-first: the date UDFs collapse into one ``to_timestamp(col,
'MMMM d, yyyy')``; the group-reduce becomes a window ``row_number() = 1``;
priority ranking is ``array_position`` on a literal priority array.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

# Priority order the reference encodes in getLatest (LatestVersionExtracter.scala:50-59)
VERSION_PRIORITY = [
    "Enacted",
    "Enrolled",
    "Adopted",
    "Substituted",
    "Amended",
    "Reintroduced",
    "Introduced",
]

FALLBACK_DATE = "12-31-1900"  # malformed-date fallback (:36-42)


def parse_version_date(col):
    """'January 5, 2005' -> timestamp; malformed -> 1900-12-31 (reference
    fallback)."""
    ts = F.try_to_timestamp(F.trim(col), F.lit("MMMM d, yyyy"))
    fallback = F.to_timestamp(F.lit(FALLBACK_DATE), "MM-dd-yyyy")
    return F.coalesce(ts, fallback)


def family_key(file_path_col):
    """Bill-family key from the metadata filePath: drop the version suffix
    (reference customPK: split, slice, rejoin — LatestVersionExtracter.scala:45-47)."""
    parts = F.split(F.regexp_extract(file_path_col, r"([^/]+)\.[a-z]+$", 1), "_")
    return F.array_join(F.slice(parts, 1, F.size(parts) - 1), "_")


def latest_versions(metadata: DataFrame) -> DataFrame:
    """metadata(filePath, versionDate, version) -> one row per bill family:
    the latest version by (parsed date desc, priority asc).

    One window shuffle on the family key — no groupByKey/mapGroups."""
    prio = F.array(*[F.lit(v) for v in VERSION_PRIORITY])
    enriched = metadata.withColumn("__ts", parse_version_date(F.col("versionDate"))).withColumn(
        "__family", family_key(F.col("filePath"))
    ).withColumn(
        # unknown versions rank last (array_position = 0 -> push to end)
        "__prio",
        F.when(F.array_position(prio, F.col("version")) > 0,
               F.array_position(prio, F.col("version"))).otherwise(F.lit(len(VERSION_PRIORITY) + 1)),
    )
    w = W.partitionBy("__family").orderBy(
        F.desc("__ts"), F.asc("__prio"), F.asc("filePath")
    )
    return (
        enriched.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("__family").alias("family"),
            "filePath",
            "version",
            F.col("__ts").alias("versionTs"),
        )
    )


def attach_latest(bills: DataFrame, metadata: DataFrame, pk_col: str = "primary_key") -> DataFrame:
    """Join raw bills to their family's latest version and keep only latest
    rows (reference :93-99: joinWith + dropDuplicates)."""
    latest = latest_versions(metadata)
    combined = F.concat_ws("_", F.col("family"), F.col("version"))
    latest_keys = latest.select(combined.alias(pk_col)).distinct()
    return bills.join(latest_keys, pk_col, "left_semi")
