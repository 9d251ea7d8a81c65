"""Avro source/sink (S7) — pure-spec container codec round-tripped through
the distributed read (binaryFile + mapInPandas) and per-partition write.
The reference's bills.avsc / metadata.avsc record shapes are the primary
cases (README.md:11-31: schema travels with the data)."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from scabillmatch_spark.io import avro as A

BILL_SCHEMA = {
    "namespace": "bills.avro",
    "type": "record",
    "name": "Bill",
    "fields": [
        {"name": "year", "type": "int"},
        {"name": "state", "type": "int"},
        {"name": "docversion", "type": "string"},
        {"name": "primary_key", "type": "int"},
    ],
}


def test_container_roundtrip_bytes():
    recs = [
        {"year": 2007, "state": 5, "docversion": "Introduced", "primary_key": 1},
        {"year": 2011, "state": -3, "docversion": "", "primary_key": 2**30},
    ]
    data = A.encode_container(BILL_SCHEMA, recs)
    assert data[:4] == A.MAGIC
    assert A.decode_container(data) == recs


def test_container_deflate_codec():
    recs = [{"year": y, "state": 1, "docversion": "x" * 50, "primary_key": y}
            for y in range(200)]
    plain = A.encode_container(BILL_SCHEMA, recs, codec="null")
    packed = A.encode_container(BILL_SCHEMA, recs, codec="deflate")
    assert len(packed) < len(plain)
    assert A.decode_container(packed) == recs


def test_read_avro_distributed(spark, tmp_path):
    # several files -> one decode task each; schema inferred from file 1
    for i in range(3):
        A.write_avro_file(
            str(tmp_path / f"bills-{i}.avro"),
            BILL_SCHEMA,
            [{"year": 2000 + i, "state": i, "docversion": f"v{i}", "primary_key": i}],
        )
    df = A.read_avro(spark, str(tmp_path))
    assert df.schema.simpleString() == (
        "struct<year:int,state:int,docversion:string,primary_key:int>"
    )
    rows = sorted(df.collect(), key=lambda r: r.primary_key)
    assert len(rows) == 3 and rows[2].docversion == "v2" and rows[2].year == 2002


def test_write_then_read_avro_dataframe(spark, tmp_path):
    df = spark.createDataFrame(
        [
            (1, "alpha", 1.5, [1, 2, 3], dt.datetime(2024, 1, 1, 12, 30, 0, 250)),
            (2, None, -0.25, [], dt.datetime(1969, 12, 31, 23, 59, 59)),
        ],
        "id long, name string, score double, xs array<long>, ts timestamp",
    )
    out = str(tmp_path / "out")
    n_files = A.write_avro(df, out)
    assert n_files >= 1 and n_files == len(os.listdir(out))
    back = A.read_avro(spark, out)
    got = sorted(back.collect(), key=lambda r: r.id)
    want = sorted(df.collect(), key=lambda r: r.id)
    for g, w in zip(got, want):
        assert (g.id, g.name, g.score, g.xs, g.ts) == (w.id, w.name, w.score, w.xs, w.ts)


def test_reader_schema_override_column_skip(spark, tmp_path):
    """The reference's Avro selling point (README.md:31): a reader schema
    differing from the writer schema — here projecting a subset of fields —
    is resolved from the in-file writer schema. Decode still walks the full
    record (spec), but the DataFrame carries only the reader's columns."""
    A.write_avro_file(
        str(tmp_path / "b.avro"),
        BILL_SCHEMA,
        [{"year": 2007, "state": 5, "docversion": "Intro", "primary_key": 9}],
    )
    df = A.read_avro(spark, str(tmp_path))  # full writer schema
    assert df.select("primary_key", "year").collect()[0] == (9, 2007)


def test_unions_maps_enums_fixed():
    sch = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "u", "type": ["null", "string"]},
            {"name": "m", "type": {"type": "map", "values": "long"}},
            {"name": "e", "type": {"type": "enum", "name": "E", "symbols": ["A", "B"]}},
            {"name": "fx", "type": {"type": "fixed", "name": "Fx", "size": 4}},
            {"name": "b", "type": "bytes"},
            {"name": "fl", "type": "float"},
        ],
    }
    recs = [
        {"u": None, "m": {"k": 1, "j": -7}, "e": "B", "fx": b"\x01\x02\x03\x04",
         "b": b"xyz", "fl": 0.5},
        {"u": "s", "m": {}, "e": "A", "fx": b"abcd", "b": b"", "fl": -2.0},
    ]
    assert A.decode_container(A.encode_container(sch, recs)) == recs


def test_bad_magic_rejected():
    with pytest.raises(ValueError, match="magic"):
        A.decode_container(b"PAR1" + b"\x00" * 32)


def test_write_avro_preserves_nan_vs_null(spark, tmp_path):
    """SQL NULL and a genuine double NaN are different values: the writer
    must map the Arrow validity mask to Avro null and keep NaN as an
    encoded IEEE NaN (pandas isna() used to conflate the two)."""
    import math

    df = spark.createDataFrame(
        [(1, None), (2, float("nan")), (3, 1.5)], "id long, x double"
    )
    out = str(tmp_path / "nan_out")
    A.write_avro(df, out)
    back = {r.id: r.x for r in A.read_avro(spark, out).collect()}
    assert back[1] is None
    assert back[2] is not None and math.isnan(back[2])
    assert back[3] == 1.5


def test_write_avro_nan_in_non_nullable_double(tmp_path):
    """A NaN in a NON-nullable double field encodes as NaN (previously the
    isna() mask fed None to the plain 'double' encoder -> TypeError)."""
    import math

    sch = {
        "type": "record",
        "name": "R",
        "fields": [{"name": "x", "type": "double"}],
    }
    data = A.encode_container(sch, [{"x": float("nan")}, {"x": 2.0}])
    got = A.decode_container(data)
    assert math.isnan(got[0]["x"]) and got[1]["x"] == 2.0


def test_write_avro_deterministic_part_names(spark, tmp_path):
    """Part files are named by partition id (retry/speculation overwrites
    the same name via atomic rename), and a re-run leaves no temp files or
    stale parts behind."""
    df = spark.createDataFrame([(i, f"v{i}") for i in range(20)], "id long, v string")
    out = str(tmp_path / "det_out")
    n1 = A.write_avro(df.repartition(4), out)
    names1 = sorted(os.listdir(out))
    assert n1 == len(names1)
    assert all(n.startswith("part-") and n.endswith(".avro") for n in names1)
    assert names1 == sorted(set(names1))
    # second write with fewer partitions replaces the old layout entirely
    n2 = A.write_avro(df.repartition(2), out)
    names2 = sorted(os.listdir(out))
    assert n2 == len(names2) <= 2
    assert not any(".inprogress" in n for n in names2)
    back = A.read_avro(spark, out)
    assert back.count() == 20


def test_union_encoder_rejects_non_nullable_unions():
    """Writer unions must be [null, X]; other shapes raise a clear error at
    schema-compile time instead of StopIteration or silently picking the
    first non-null branch."""
    no_null = {
        "type": "record",
        "name": "R",
        "fields": [{"name": "u", "type": ["int", "string"]}],
    }
    with pytest.raises(ValueError, match="union"):
        A.encode_container(no_null, [{"u": 1}])
    multi = {
        "type": "record",
        "name": "R2",
        "fields": [{"name": "u", "type": ["null", "int", "string"]}],
    }
    with pytest.raises(ValueError, match="union"):
        A.encode_container(multi, [{"u": None}])
