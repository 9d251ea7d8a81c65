"""Sources and sinks with explicit schemas.

The reference reads JSON-lines with schema inference (ExtractCandidates.scala:98)
and its docs recommend passing an explicit schema so only needed columns are
parsed (docs/3state_test.md step 0). We make explicit schemas the default:
for JSON that's the only way to get column pruning; for parquet Catalyst
prunes automatically.

Dropped on purpose: the reference's Java-serialized objectFile pair handoff
(ExtractCandidates.scala:171) — pairs are a plain parquet (pk1, pk2) table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Canonical bill record (reference README.md:13-25, dataformat/bills.avsc:1-10).
BILL_SCHEMA = T.StructType(
    [
        T.StructField("primary_key", T.StringType(), False),
        T.StructField("content", T.StringType(), True),
        T.StructField("year", T.LongType(), True),
        T.StructField("state", T.LongType(), True),
        T.StructField("docid", T.StringType(), True),
        T.StructField("docversion", T.StringType(), True),
        T.StructField("length", T.LongType(), True),
    ]
)

# Pair relation (reference CartesianPair, ExtractCandidates.scala:177).
PAIR_SCHEMA = T.StructType(
    [
        T.StructField("pk1", T.StringType(), False),
        T.StructField("pk2", T.StringType(), False),
    ]
)

# Scored pair relation (reference ComparedPair, stats/AnalysisUtils.scala:170).
SCORED_PAIR_SCHEMA = T.StructType(
    [
        T.StructField("pk1", T.StringType(), False),
        T.StructField("pk2", T.StringType(), False),
        T.StructField("similarity", T.DoubleType(), True),
    ]
)

# Version metadata (reference Metadata, LatestVersionExtracter.scala:105).
METADATA_SCHEMA = T.StructType(
    [
        T.StructField("filePath", T.StringType(), False),
        T.StructField("versionDate", T.StringType(), True),
        T.StructField("version", T.StringType(), True),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_bills_json(spark: SparkSession, path: str, schema: T.StructType = BILL_SCHEMA) -> DataFrame:
    """JSON-lines bill scan with explicit schema (no inference pass).

    Glob paths supported (reference reads ``bills_combined_50_p*.json``)."""
    return spark.read.schema(schema).json(path)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-generated parquet table from a scale-factor dir.

    Timestamp normalization: generator output has varied by round —
    TIMESTAMP(NANOS) (Spark reads only as a raw long via nanosAsLong) and
    naive TIMESTAMP(MICROS) (Spark 4 infers TIMESTAMP_NTZ). Both are
    normalized to an instant-typed TIMESTAMP interpreted as UTC, with the
    session TZ pinned to UTC, so time arithmetic (unix_micros, hour
    bucketing, windows) matches the naive-UTC DuckDB oracle regardless of
    host TZ or generator vintage.
    """
    if name == "events":
        # dynamic SQLConfs — work even on a session we didn't build.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if ntz:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})
    return df


def register_tables(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for t in TESTDATA_TABLES:
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)


def read_whole_text(spark: SparkSession, path: str) -> DataFrame:
    """S6 wholeTextFiles analog: one row per file (value = full content,
    file = source path). Replaces the reference's collect+PrintWriter
    anti-pattern (utils/MetadataConverter.scala:37-41)."""
    from pyspark.sql import functions as F

    return (
        spark.read.text(path, wholetext=True)
        .withColumn("file", F.input_file_name())
        .select("file", "value")
    )


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str,
    num_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Bucketed external table: co-locates rows by hash(bucket_col) at write
    time so later equi-joins/aggs on that key skip the shuffle entirely —
    the storage-layout lever for repeated 100 TB joins (pairs ⋈ features on
    the doc key). Read back with ``spark.table(table)``."""
    (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table)
    )


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-clustered parquet sink: repartitionByRange on ``sort_cols``
    (disjoint value ranges per file) + sortWithinPartitions (monotone
    row-group min/max inside each file). This is what makes later range
    and point predicates prune at the ROW-GROUP level instead of scanning
    every file — the single biggest scan lever for an append-mostly 100 TB
    fact table queried by time/key ranges. Without it, row-group min/max
    stats of a hash-shuffled write all span the full domain and prune
    nothing (asserted from the parquet footers in test_io_maintenance).
    """
    parts = df.repartitionByRange(*sort_cols) if num_files is None else (
        df.repartitionByRange(num_files, *sort_cols)
    )
    parts.sortWithinPartitions(*sort_cols).write.mode(mode).parquet(path)


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ceil(total_bytes / target_file_bytes) files, optionally range-clustered
    by ``sort_cols`` (see write_sorted). Streaming sinks and fine-grained
    partitionBy writes accumulate kilobyte files whose per-file open/footer
    cost dominates scans at scale; compaction is the standing maintenance
    job that keeps file count proportional to data size. Returns the
    target file count. Uses the JVM Hadoop FS API for sizing — no local-FS
    assumption, works against any supported filesystem."""
    import math

    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(src)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    total = fs.getContentSummary(hpath).getLength()
    n = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src)
    if sort_cols:
        write_sorted(df, dst, sort_cols, num_files=n)
    elif n <= df.rdd.getNumPartitions():
        # merging small files: coalesce, not repartition — no shuffle, each
        # output task reads a contiguous run of inputs
        df.coalesce(n).write.mode("overwrite").parquet(dst)
    else:
        # splitting oversized files needs MORE partitions than the scan
        # provides; coalesce cannot increase the count, so this path pays
        # one round-robin shuffle
        df.repartition(n).write.mode("overwrite").parquet(dst)
    return n


def write_json(df: DataFrame, path: str, mode: str = "overwrite", single_file: bool = False) -> None:
    """JSON sink; ``single_file`` mirrors the reference's repartition(1) skim
    output (Postprocessor.scala:31) — only for small post-processed results."""
    (df.coalesce(1) if single_file else df).write.mode(mode).json(path)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
) -> None:
    """RFC-4180 CSV sink: quotes escape by DOUBLING (escape='\"'), not
    Spark's default backslash, so the output parses in every standard CSV
    reader (DuckDB, pandas, Excel). Embedded delimiters, quotes and
    newlines in fields all survive the round trip — but a quoted embedded
    newline makes the file unsplittable on read (see read_csv's multiLine
    note); corpora written for scale should scrub hard newlines first or
    stay on parquet for the hot path, keeping CSV as the interchange
    boundary it is.

    Leading/trailing whitespace is preserved (Spark's writer STRIPS it by
    default — silent data loss for free text). Known, documented loss:
    empty string and NULL both serialize to an empty field and read back
    as NULL — the one distinction RFC-4180 cannot carry."""
    (
        df.write.mode(mode)
        .option("header", header)
        .option("escape", '"')
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
        .csv(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    multi_line: bool = False,
) -> DataFrame:
    """CSV source with an EXPLICIT schema — inferSchema costs one extra
    full pass over the data before the real one, never acceptable at
    scale. escape='\"' matches write_csv's RFC-4180 doubling.

    ``multi_line=True`` is required to parse quoted embedded newlines, and
    it makes each file single-task (non-splittable): parallelism becomes
    the FILE count, not maxPartitionBytes — acceptable for many medium
    files, a scan bottleneck for one huge file. Default False keeps scans
    splittable for newline-free data."""
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("escape", '"')
        .option("multiLine", multi_line)
        .csv(path)
    )


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (native Spark writer, zlib default): the columnar
    interchange format for Hive/Trino-side consumers. Same predicate-
    pushdown/column-pruning story as parquet — PushedFilters reach the ORC
    reader and min/max stripe stats prune."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source (native, vectorized reader)."""
    return spark.read.orc(path)


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "overwrite",
) -> None:
    """XML sink (Spark 4 built-in writer; the reference's data-format
    breadth — Avro/JSON ingest per README.md:11-31 — extended to the one
    interchange format enterprise feeds still mandate). Entity escaping
    (&lt; &amp; &quot; ...) is the writer's job, so free text with markup
    characters and embedded newlines survives the round trip; NULL fields
    are omitted elements (Spark's XML convention) and read back as NULL.
    One XML part file per partition under ``path``, same layout contract
    as the CSV/JSON sinks."""
    (
        df.write.mode(mode)
        .format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .save(path)
    )


def read_xml(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    row_tag: str = "row",
) -> DataFrame:
    """XML source with an EXPLICIT schema (inference costs an extra full
    pass, and XML inference can widen types — never acceptable at scale).
    XML files are element-structured, so like multiLine CSV each file is
    effectively one task's parse unit: write many medium part files (the
    sink's partition-per-file layout already does) rather than one huge
    document.

    ignoreSurroundingSpaces=False because the reader's default TRIMS
    leading/trailing whitespace from every text element — silent data
    loss for free text (caught by test_xml_roundtrip_nasty_strings; same
    reasoning as write_csv's ignore*WhiteSpace=False)."""
    return (
        spark.read.schema(schema)
        .format("xml")
        .option("rowTag", row_tag)
        .option("ignoreSurroundingSpaces", False)
        .load(path)
    )


def zorder_value(cols: list, bits: int = 8) -> "F.Column":
    """Morton (Z-order) code: interleave the low ``bits`` bits of each
    already-bucketed non-negative int column — bit (i*d + j) of the result
    is bit i of column j. Pure Column bit arithmetic, codegen'd."""
    d = len(cols)
    out = None
    for j, c in enumerate(cols):
        x = (F.col(c) if isinstance(c, str) else c).cast("long")
        for i in range(bits):
            term = F.shiftleft(
                F.shiftright(x, i).bitwiseAND(F.lit(1)), i * d + j
            )
            out = term if out is None else out.bitwiseOR(term)
    return out


def write_zorder(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    num_files: int | None = None,
    mode: str = "overwrite",
    quantile_buckets: bool = False,
) -> None:
    """Z-order-clustered parquet sink: bucket each cluster column into
    2^bits bins — even-width from one min/max agg by default, or
    equal-frequency via approxQuantile when ``quantile_buckets`` is set
    (the right choice for heavily skewed columns, where even-width bins
    would pile most rows into a few buckets and collapse the interleave's
    locality) — interleave the bucket bits into a Morton code, then
    range-partition + sort by it.

    Where ``write_sorted`` gives row-group pruning on ONE leading column,
    Z-ordering bounds every file/row-group in EVERY cluster dimension
    jointly — the layout for a 100 TB fact table queried by arbitrary
    conjunctions of range predicates (user AND time, key AND value).
    Locality degrades gracefully with dimension count; 2-3 columns is the
    sweet spot. The min/max agg is one extra scan at write time — the
    standing-maintenance-job trade, paid once per rewrite.
    """
    nb = 1 << bits
    buckets = []
    if quantile_buckets:
        # equal-frequency bins: nb-1 interior approxQuantile boundaries per
        # column (sample-based, same machinery repartitionByRange uses);
        # bucket = count of boundaries <= value, a codegen'd array scan
        probs = [i / nb for i in range(1, nb)]
        for c in cols:
            bounds = df.stat.approxQuantile(c, probs, 0.001)
            uniq = sorted(set(bounds))
            if not uniq:  # all-null column: single bucket
                buckets.append(F.lit(0))
                continue
            arr = F.array(*[F.lit(float(x)) for x in uniq])
            b = F.size(
                F.filter(arr, lambda x: x <= F.col(c).cast("double"))
            ).cast("long")
            buckets.append(F.least(b, F.lit(nb - 1)))
    else:
        mm = df.agg(
            *[F.min(c).alias(f"__lo_{c}") for c in cols],
            *[F.max(c).alias(f"__hi_{c}") for c in cols],
        ).first()
        for c in cols:
            lo, hi = mm[f"__lo_{c}"], mm[f"__hi_{c}"]
            span = (hi - lo) if hi is not None and lo is not None else None
            if not span:  # constant or all-null column: single bucket
                buckets.append(F.lit(0))
                continue
            b = F.floor(
                (F.col(c).cast("double") - F.lit(float(lo))) * nb / F.lit(float(span))
            ).cast("long")
            buckets.append(F.least(F.greatest(b, F.lit(0)), F.lit(nb - 1)))
    z = df.withColumn("__z", zorder_value(buckets, bits))
    parts = (
        z.repartitionByRange("__z")
        if num_files is None
        else z.repartitionByRange(num_files, "__z")
    )
    parts.sortWithinPartitions("__z").drop("__z").write.mode(mode).parquet(path)
