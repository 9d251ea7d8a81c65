"""Avro source/sink without the spark-avro connector (S7, README.md:11-31).

The reference stores bills/metadata as Avro container files
(dataformat/bills.avsc, dataformat/metadata.avsc) and relies on the
schema-in-file property for reader/writer schema evolution. This
environment ships neither the spark-avro jar nor a Python avro package, so
this module implements the public Apache Avro 1.x specification directly:

- binary encoding: zigzag-varint ints/longs, length-prefixed bytes/strings,
  IEEE little-endian float/double, fields-in-order records, block-encoded
  arrays/maps, index-prefixed unions;
- object container files: ``Obj\\x01`` magic, file-metadata map carrying the
  writer schema JSON + codec, 16-byte sync-marker-delimited blocks; codecs
  ``null`` and ``deflate`` (stdlib zlib).

Spark-first shape: ``read_avro`` lists the files with the built-in
``binaryFile`` source (one row per file, lazily materialized content) and
decodes **on the executors** via ``mapInPandas`` — per-file task
parallelism, Arrow-batched rows out, schema inferred once on the driver
from the first file header (exactly what spark-avro does). The decode loop
is per-record Python — the honest cost of a boundary format; downstream
operators run on the resulting DataFrame JVM-side.

Scale notes: parallelism = number of files (the reference's layout is
many per-state files). Splitting one huge container file on its sync
markers is not implemented — documented limitation. ``write_avro`` writes
one container file per partition from the executors (works wherever
executors can open the target path — local/NFS; object stores would need a
Hadoop OutputFormat).
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAGIC = b"Obj\x01"
_SYNC_SIZE = 16

# ---------------------------------------------------------------------------
# Schema handling
# ---------------------------------------------------------------------------

_PRIMITIVES = {
    "null": T.NullType(),
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "bytes": T.BinaryType(),
    "string": T.StringType(),
}


def parse_schema(schema: str | dict) -> dict | str | list:
    """Normalize an Avro schema (JSON string or parsed) to its parsed form."""
    return json.loads(schema) if isinstance(schema, str) else schema


def _type_name(sch) -> str:
    if isinstance(sch, str):
        return sch
    if isinstance(sch, list):
        return "union"
    return sch["type"]


def avro_to_spark_type(sch) -> T.DataType:
    """Avro schema node -> Spark DataType (logical types mapped where Spark
    has a natural target; unions must be [null, X] nullable-style)."""
    if isinstance(sch, str):
        return _PRIMITIVES[sch]
    if isinstance(sch, list):
        non_null = [s for s in sch if _type_name(s) != "null"]
        if len(non_null) != 1:
            raise ValueError(f"only [null, X] unions supported, got {sch}")
        return avro_to_spark_type(non_null[0])
    t = sch["type"]
    logical = sch.get("logicalType")
    if logical in ("timestamp-micros", "timestamp-millis"):
        return T.TimestampType()
    if logical == "date":
        return T.DateType()
    if t in _PRIMITIVES:
        return _PRIMITIVES[t]
    if t == "record":
        return T.StructType(
            [
                T.StructField(f["name"], avro_to_spark_type(f["type"]), _nullable(f["type"]))
                for f in sch["fields"]
            ]
        )
    if t == "array":
        return T.ArrayType(avro_to_spark_type(sch["items"]), _nullable(sch["items"]))
    if t == "map":
        return T.MapType(T.StringType(), avro_to_spark_type(sch["values"]), _nullable(sch["values"]))
    if t == "enum":
        return T.StringType()
    if t == "fixed":
        return T.BinaryType()
    raise ValueError(f"unsupported avro type: {t}")


def _nullable(sch) -> bool:
    return isinstance(sch, list) and any(_type_name(s) == "null" for s in sch)


# ---------------------------------------------------------------------------
# Binary decoder (spec: zigzag varints, length-prefixed, blocks)
# ---------------------------------------------------------------------------


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, data: bytes):
        self.buf = data
        self.pos = 0

    def read(self, n: int) -> bytes:
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out

    def read_long(self) -> int:
        shift, acc = 0, 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)  # zigzag

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())


def _decode(r: _Reader, sch):
    t = _type_name(sch)
    if t == "null":
        return None
    if t == "boolean":
        return r.read(1) == b"\x01"
    if t in ("int", "long"):
        v = r.read_long()
        if not isinstance(sch, str):
            lt = sch.get("logicalType")
            if lt == "timestamp-micros":
                return pd.Timestamp(v, unit="us").to_pydatetime()
            if lt == "timestamp-millis":
                return pd.Timestamp(v, unit="ms").to_pydatetime()
            if lt == "date":
                return pd.Timestamp(v, unit="D").date()
        return v
    if t == "float":
        return struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return struct.unpack("<d", r.read(8))[0]
    if t == "bytes":
        return r.read_bytes()
    if t == "string":
        return r.read_bytes().decode("utf-8")
    if t == "union":
        return _decode(r, sch[r.read_long()])
    if t == "record":
        return {f["name"]: _decode(r, f["type"]) for f in sch["fields"]}
    if t == "array":
        out = []
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:  # block with byte-size prefix
                n = -n
                r.read_long()
            out.extend(_decode(r, sch["items"]) for _ in range(n))
        return out
    if t == "map":
        out = {}
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:
                n = -n
                r.read_long()
            for _ in range(n):
                # NB: key must be read before the value (Python evaluates the
                # RHS of a subscript assignment first — explicit temp needed)
                k = r.read_bytes().decode("utf-8")
                out[k] = _decode(r, sch["values"])
        return out
    if t == "enum":
        return sch["symbols"][r.read_long()]
    if t == "fixed":
        return r.read(sch["size"])
    raise ValueError(f"unsupported avro type: {t}")


def _read_container_header(r: _Reader) -> tuple[dict, bytes]:
    if r.read(4) != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta = {}
    while True:
        n = r.read_long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.read_long()
        for _ in range(n):
            k = r.read_bytes().decode("utf-8")
            meta[k] = r.read_bytes()
    return meta, r.read(_SYNC_SIZE)


def decode_container(data: bytes, schema=None) -> list[dict]:
    """All records of one Avro object container file as dicts (the writer
    schema travels in the file; ``schema`` overrides for projection-free
    reader-schema use)."""
    r = _Reader(data)
    meta, sync = _read_container_header(r)
    sch = parse_schema(schema) if schema is not None else parse_schema(
        meta["avro.schema"].decode("utf-8")
    )
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec: {codec} (null/deflate only)")
    out = []
    while r.pos < len(r.buf):
        count = r.read_long()
        payload = r.read_bytes()
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)  # raw deflate per spec
        br = _Reader(payload)
        out.extend(_decode(br, sch) for _ in range(count))
        if r.read(_SYNC_SIZE) != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
    return out


def read_schema_from_file(path: str):
    """Writer schema of an Avro container file (header-only read)."""
    with open(path, "rb") as f:
        # header = magic + metadata map + sync; metadata carries the schema.
        # 64 KiB covers any sane schema; retry whole-file if it didn't.
        head = f.read(65536)
    try:
        meta, _ = _read_container_header(_Reader(head))
    except (IndexError, ValueError):
        with open(path, "rb") as f:
            meta, _ = _read_container_header(_Reader(f.read()))
    return parse_schema(meta["avro.schema"].decode("utf-8"))


# ---------------------------------------------------------------------------
# Binary encoder + container writer
# ---------------------------------------------------------------------------


class _Writer:
    __slots__ = ("out",)

    def __init__(self):
        self.out = io.BytesIO()

    def write(self, b: bytes):
        self.out.write(b)

    def write_long(self, v: int):
        v = (v << 1) ^ (v >> 63)  # zigzag (arbitrary-precision-safe in Python)
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                self.out.write(bytes([b | 0x80]))
            else:
                self.out.write(bytes([b]))
                break

    def write_bytes(self, b: bytes):
        self.write_long(len(b))
        self.out.write(b)


def _encode(w: _Writer, sch, v):
    t = _type_name(sch)
    if t == "null":
        return
    if t == "boolean":
        w.write(b"\x01" if v else b"\x00")
    elif t in ("int", "long"):
        w.write_long(int(v))
    elif t == "float":
        w.write(struct.pack("<f", float(v)))
    elif t == "double":
        w.write(struct.pack("<d", float(v)))
    elif t == "bytes":
        w.write_bytes(bytes(v))
    elif t == "string":
        w.write_bytes(str(v).encode("utf-8"))
    elif t == "union":
        idx = next(
            i for i, s in enumerate(sch)
            if (v is None) == (_type_name(s) == "null")
        )
        w.write_long(idx)
        _encode(w, sch[idx], v)
    elif t == "record":
        for f in sch["fields"]:
            fv = v[f["name"]] if isinstance(v, dict) else getattr(v, f["name"])
            _encode(w, f["type"], fv)
    elif t == "array":
        if v:
            w.write_long(len(v))
            for item in v:
                _encode(w, sch["items"], item)
        w.write_long(0)
    elif t == "map":
        if v:
            w.write_long(len(v))
            for k, item in v.items():
                w.write_bytes(str(k).encode("utf-8"))
                _encode(w, sch["values"], item)
        w.write_long(0)
    elif t == "enum":
        w.write_long(sch["symbols"].index(v))
    elif t == "fixed":
        w.write(bytes(v))
    else:
        raise ValueError(f"unsupported avro type: {t}")


def encode_container(schema, records, codec: str = "null", sync: bytes = b"\x07" * 16) -> bytes:
    """Records -> one Avro object container file as bytes."""
    sch = parse_schema(schema)
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec: {codec}")
    head = _Writer()
    head.write(MAGIC)
    meta = {"avro.schema": json.dumps(sch).encode("utf-8"), "avro.codec": codec.encode()}
    head.write_long(len(meta))
    for k, v in meta.items():
        head.write_bytes(k.encode("utf-8"))
        head.write_bytes(v)
    head.write_long(0)
    head.write(sync)
    body = _Writer()
    n = 0
    for rec in records:
        _encode(body, sch, rec)
        n += 1
    payload = body.out.getvalue()
    if codec == "deflate":
        payload = zlib.compress(payload)[2:-4]  # raw deflate per spec
    blk = _Writer()
    if n:
        blk.write_long(n)
        blk.write_bytes(payload)
        blk.write(sync)
    return head.out.getvalue() + blk.out.getvalue()


def write_avro_file(path: str, schema, records, codec: str = "null") -> None:
    with open(path, "wb") as f:
        f.write(encode_container(schema, records, codec=codec))


# ---------------------------------------------------------------------------
# DataFrame source / sink
# ---------------------------------------------------------------------------


def read_avro(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """Avro container files -> DataFrame.

    ``binaryFile`` source lists+loads the files (one task per file), the
    container decode runs executor-side in ``mapInPandas`` (Arrow-batched
    output rows). ``schema``: Avro schema (JSON str/dict) to use as the
    reader schema; default = writer schema from the first file's header
    (driver header-only read — spark-avro's own inference strategy).
    """
    import glob as _glob

    if schema is None:
        matches = sorted(
            _glob.glob(os.path.join(path, "*.avro")) if os.path.isdir(path) else _glob.glob(path)
        )
        if not matches:
            raise FileNotFoundError(f"no avro files at {path}")
        schema = read_schema_from_file(matches[0])
    sch = parse_schema(schema)
    spark_schema = avro_to_spark_type(sch)
    if not isinstance(spark_schema, T.StructType):
        raise ValueError("top-level avro schema must be a record")
    sch_json = json.dumps(sch)
    cols = [f.name for f in spark_schema.fields]

    def decode_files(batches):
        reader_sch = json.loads(sch_json)
        for pdf in batches:
            for content in pdf["content"]:
                recs = decode_container(bytes(content), schema=reader_sch)
                yield pd.DataFrame(
                    {c: [r.get(c) for r in recs] for c in cols}, columns=cols
                )

    src = path if not os.path.isdir(path) else os.path.join(path, "*.avro")
    files = spark.read.format("binaryFile").load(src).select("content")
    return files.mapInPandas(decode_files, schema=spark_schema)


def spark_to_avro_schema(schema: T.StructType, name: str = "Row") -> dict:
    """Spark StructType -> Avro record schema (nullable -> [null, X])."""

    def conv(dt: T.DataType):
        if isinstance(dt, T.BooleanType):
            return "boolean"
        if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType)):
            return "int"
        if isinstance(dt, T.LongType):
            return "long"
        if isinstance(dt, T.FloatType):
            return "float"
        if isinstance(dt, T.DoubleType):
            return "double"
        if isinstance(dt, T.StringType):
            return "string"
        if isinstance(dt, T.BinaryType):
            return "bytes"
        if isinstance(dt, T.TimestampType):
            return {"type": "long", "logicalType": "timestamp-micros"}
        if isinstance(dt, T.DateType):
            return {"type": "int", "logicalType": "date"}
        if isinstance(dt, T.ArrayType):
            items = conv(dt.elementType)
            return {"type": "array", "items": ["null", items] if dt.containsNull else items}
        if isinstance(dt, T.MapType):
            vals = conv(dt.valueType)
            return {"type": "map", "values": ["null", vals] if dt.valueContainsNull else vals}
        if isinstance(dt, T.StructType):
            return spark_to_avro_schema(dt, name=f"{name}_nested")
        raise ValueError(f"unsupported spark type for avro: {dt}")

    return {
        "type": "record",
        "name": name,
        "fields": [
            {
                "name": f.name,
                "type": ["null", conv(f.dataType)] if f.nullable else conv(f.dataType),
            }
            for f in schema.fields
        ],
    }


def write_avro(df: DataFrame, dir_path: str, codec: str = "null") -> int:
    """DataFrame -> one Avro container file per partition, written from the
    executors (works wherever executor processes can open ``dir_path`` —
    local/NFS; an object store would need a Hadoop OutputFormat). Returns
    the number of files written."""
    os.makedirs(dir_path, exist_ok=True)
    avro_sch = spark_to_avro_schema(df.schema)
    sch_json = json.dumps(avro_sch)
    ts_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, T.TimestampType)]

    def write_part(idx, it):
        sch = json.loads(sch_json)
        rows = []
        for row in it:
            d = row.asDict(recursive=True)
            for c in ts_cols:
                if d[c] is not None:
                    d[c] = int(pd.Timestamp(d[c]).value // 1000)  # micros
            rows.append(d)
        if rows:
            write_avro_file(
                os.path.join(dir_path, f"part-{idx:05d}.avro"), sch, rows, codec=codec
            )
            yield 1

    return df.rdd.mapPartitionsWithIndex(write_part).sum()
