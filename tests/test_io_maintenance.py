"""Storage-maintenance operators: sorted (range-clustered) writes must
produce row-group stats that actually enable pruning, and compaction must
shrink file counts without changing data."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from scabillmatch_spark.io.sources import compact_parquet, write_sorted


def _files(path):
    return sorted(glob.glob(os.path.join(path, "*.parquet")))


def test_write_sorted_rowgroups_are_disjoint(spark, tmp_path):
    df = spark.range(0, 100_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    out = str(tmp_path / "sorted")
    write_sorted(df, out, ["k"], num_files=8)
    files = _files(out)
    assert len(files) >= 2
    # per-file [min,max] ranges over k must be pairwise disjoint (range
    # partitioning) and row groups monotone inside each file (sorted) —
    # the two properties parquet row-group pruning feeds on
    spans = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        col = md.schema.to_arrow_schema().get_field_index("k")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col).statistics
            mins.append(st.min)
            maxs.append(st.max)
        assert mins == sorted(mins) and maxs == sorted(maxs)
        spans.append((mins[0], maxs[-1]))
    spans.sort()
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2
    # and the data survives intact
    assert spark.read.parquet(out).count() == 100_000


def test_write_sorted_enables_rowgroup_pruning(spark, tmp_path):
    """DSv2 scan metrics: a narrow range predicate over the sorted layout
    must skip most row groups entirely (numRowGroups pruned via min/max)."""
    df = spark.range(0, 200_000).select(F.col("id").alias("k"))
    out = str(tmp_path / "clustered")
    write_sorted(df, out, ["k"], num_files=8)
    narrow = spark.read.parquet(out).filter((F.col("k") >= 1000) & (F.col("k") < 2000))
    assert narrow.count() == 1000
    plan = narrow._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(k), GreaterThanOrEqual(k,1000)" in plan


def test_compact_parquet_shrinks_file_count(spark, tmp_path):
    src = str(tmp_path / "many")
    dst = str(tmp_path / "few")
    spark.range(0, 50_000).repartition(40).write.parquet(src)
    assert len(_files(src)) == 40
    n = compact_parquet(spark, src, dst, target_file_bytes=64 * 1024 * 1024)
    assert n == 1
    assert len(_files(dst)) == 1
    a = sorted(r["id"] for r in spark.read.parquet(src).collect())
    b = sorted(r["id"] for r in spark.read.parquet(dst).collect())
    assert a == b


def test_compact_parquet_sorted_variant(spark, tmp_path):
    src = str(tmp_path / "many2")
    dst = str(tmp_path / "fewsorted")
    spark.range(0, 50_000).repartition(16).write.parquet(src)
    compact_parquet(spark, src, dst, target_file_bytes=10_000, sort_cols=["id"])
    files = _files(dst)
    assert len(files) >= 2
    assert spark.read.parquet(dst).count() == 50_000


def test_partitionby_write_prunes_partitions(spark, tmp_path):
    """Hive-style partitionBy layout must show PartitionFilters in the scan
    (directory-level pruning — the coarse-grained complement of
    write_sorted's row-group pruning)."""
    from scabillmatch_spark.io.sources import write_parquet

    df = spark.range(0, 9_000).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("part")
    )
    out = str(tmp_path / "parted")
    write_parquet(df, out, partition_by=["part"])
    narrow = spark.read.parquet(out).filter(F.col("part") == "1")
    assert narrow.count() == 3_000
    plan = narrow._jdf.queryExecution().executedPlan().toString()
    # the predicate lands in PartitionFilters (directory pruning), not as a
    # post-scan Filter over all partitions
    assert "PartitionFilters: [isnotnull(part" in plan
    assert "(part#" in plan.split("PartitionFilters:")[1].split("]")[0]


def test_write_zorder_bounds_both_dimensions(spark, tmp_path):
    """Z-ordering must bound every FILE's span in BOTH cluster columns —
    the joint-locality property neither a hash shuffle (all files span the
    full domain) nor a 1-D sort (second column unbounded) provides."""
    from scabillmatch_spark.io.sources import write_zorder

    n = 200_000
    df = spark.range(0, n).select(
        F.col("id").alias("x"),
        # decorrelated second dim: bit-reversed-ish (id * prime mod n)
        ((F.col("id") * 48271) % n).alias("y"),
    )
    out = str(tmp_path / "zorder")
    write_zorder(df, out, ["x", "y"], bits=8, num_files=16)
    files = _files(out)
    assert len(files) >= 8
    schema = pq.ParquetFile(files[0]).metadata.schema.to_arrow_schema()
    ix, iy = schema.get_field_index("x"), schema.get_field_index("y")

    def file_span(f, col_idx):
        md = pq.ParquetFile(f).metadata
        mins = [md.row_group(r).column(col_idx).statistics.min
                for r in range(md.num_row_groups)]
        maxs = [md.row_group(r).column(col_idx).statistics.max
                for r in range(md.num_row_groups)]
        return max(maxs) - min(mins)

    x_spans = [file_span(f, ix) for f in files]
    y_spans = [file_span(f, iy) for f in files]
    # every file bounded in x AND y to a fraction of the domain; a hash
    # write has every span ~= n
    assert sum(x_spans) / len(x_spans) < 0.45 * n, x_spans
    assert sum(y_spans) / len(y_spans) < 0.45 * n, y_spans
    # data intact
    assert spark.read.parquet(out).count() == n
    # and a 2-D range predicate still pushes down for row-group pruning
    narrow = spark.read.parquet(out).filter(
        (F.col("x") >= 1000) & (F.col("x") < 3000)
        & (F.col("y") >= 1000) & (F.col("y") < 3000)
    )
    plan = narrow._jdf.queryExecution().executedPlan().toString()
    # (plan string truncates long filter lists — match the prefix)
    assert "GreaterThanOrEqual(x,1000)" in plan
    assert "GreaterThanOrEqual(y,1" in plan


def test_write_zorder_quantile_buckets_handle_skew(spark, tmp_path):
    """Even-width bins collapse on a skewed column (most rows in one
    bucket); equal-frequency bins must keep per-file x-spans bounded over
    the DENSE region where the rows actually live."""
    from scabillmatch_spark.io.sources import write_zorder

    n = 100_000
    # 99% of rows in [0, 1000), 1% outliers up to 10^9
    df = spark.range(0, n).select(
        F.when(F.col("id") % 100 != 0, F.col("id") % 1000)
        .otherwise(F.col("id") * 10_000)
        .alias("x"),
        (F.col("id") % 500).alias("y"),
    )
    out = str(tmp_path / "zq")
    write_zorder(df, out, ["x", "y"], bits=8, num_files=12,
                 quantile_buckets=True)
    files = _files(out)
    assert len(files) >= 6
    schema = pq.ParquetFile(files[0]).metadata.schema.to_arrow_schema()
    iy = schema.get_field_index("y")
    # the non-skewed dimension must stay bounded per file — under
    # even-width bucketing of x the outliers force nearly all rows into
    # x-bucket 0 and the interleave degenerates to a y-only sort, which
    # still bounds y; the real check is that quantile bucketing keeps BOTH
    # dims interleaved: y spans should be a fraction of the domain, not
    # the full 500
    def span(f, i):
        md = pq.ParquetFile(f).metadata
        mins = [md.row_group(r).column(i).statistics.min for r in range(md.num_row_groups)]
        maxs = [md.row_group(r).column(i).statistics.max for r in range(md.num_row_groups)]
        return max(maxs) - min(mins)

    y_spans = [span(f, iy) for f in files]
    assert sum(y_spans) / len(y_spans) < 0.6 * 500, y_spans
    assert spark.read.parquet(out).count() == n


def test_csv_roundtrip_preserves_hostile_text(spark, tmp_path):
    from scabillmatch_spark.io.sources import read_csv, write_csv

    rows = [
        (1, "plain"),
        (2, 'has "quotes" inside'),
        (3, "comma, semicolon; pipe|"),
        (4, "embedded\nnewline\r\nboth kinds"),
        (5, " leading and trailing "),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    out = str(tmp_path / "csv")
    write_csv(df, out)
    back = read_csv(spark, out, df.schema, multi_line=True)
    got = {r.id: r.s for r in back.collect()}
    assert got == dict(rows)


def test_csv_empty_string_reads_as_null_documented_loss(spark, tmp_path):
    # the one RFC-4180 lossy case, pinned so a behavior change is noticed
    from scabillmatch_spark.io.sources import read_csv, write_csv

    df = spark.createDataFrame([(1, "")], "id long, s string")
    out = str(tmp_path / "csv_empty")
    write_csv(df, out)
    back = read_csv(spark, out, df.schema)
    assert back.collect()[0].s is None


def test_csv_splittable_fast_path_equivalence(spark, tmp_path):
    # multi_line=False is the scan-splittable mode read_csv recommends at
    # scale for newline-scrubbed corpora: quoted commas/quotes still round
    # trip; only embedded newlines need the per-file multiLine mode. Both
    # documented modes must agree on newline-free data.
    from pyspark.sql import functions as F

    from scabillmatch_spark.io.sources import read_csv, write_csv

    rows = [
        (1, "plain"),
        (2, 'has "quotes" inside'),
        (3, "comma, semicolon; pipe|"),
        (4, " leading and trailing "),
        (5, "unicode: café — π"),
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    assert df.filter(F.col("s").contains("\n")).count() == 0
    out = str(tmp_path / "csv_split")
    write_csv(df.repartition(3), out)
    fast = read_csv(spark, out, df.schema, multi_line=False)
    slow = read_csv(spark, out, df.schema, multi_line=True)
    assert {tuple(r) for r in fast.collect()} == set(rows)
    assert {tuple(r) for r in fast.collect()} == {
        tuple(r) for r in slow.collect()
    }


def test_csv_output_parses_in_duckdb(spark, tmp_path):
    # RFC-4180 doubled-quote escaping: a standard reader must agree
    import glob

    import duckdb

    from scabillmatch_spark.io.sources import write_csv

    rows = [(1, 'a "b", c'), (2, "x\ny")]
    df = spark.createDataFrame(rows, "id long, s string")
    out = str(tmp_path / "csv_duck")
    write_csv(df.coalesce(1), out)
    f = glob.glob(out + "/*.csv")[0]
    got = dict(
        duckdb.sql(
            f"SELECT id, s FROM read_csv('{f}', header=true)"
        ).fetchall()
    )
    assert got == dict(rows)


def test_orc_roundtrip_types_and_pushdown(spark, tmp_path):
    import datetime

    from scabillmatch_spark.io.sources import read_orc, write_orc

    rows = [
        (1, "a", 1.5, datetime.datetime(2024, 1, 1, 12, 0, 0)),
        (2, "b", -2.25, datetime.datetime(2024, 6, 15, 23, 59, 59, 123456)),
        (3, "a", 0.0, datetime.datetime(1999, 12, 31, 0, 0, 1)),
    ]
    df = spark.createDataFrame(rows, "id long, k string, v double, ts timestamp")
    out = str(tmp_path / "orc")
    write_orc(df, out)
    back = read_orc(spark, out)
    assert sorted(map(tuple, back.collect())) == sorted(rows)
    # filter reaches the ORC scan as a pushed filter
    plan = (
        back.filter("k = 'a'")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(k), EqualTo(k,a)]" in plan
