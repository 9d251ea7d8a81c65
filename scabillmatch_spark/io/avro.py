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
decodes **on the executors** via ``mapInArrow`` — per-file task
parallelism, Arrow-batched rows out (built straight from pylists, so SQL
NULL vs double NaN survives the exchange), schema inferred once on the
driver from the first file header (exactly what spark-avro does). The
decode loop is per-record Python — the honest cost of a boundary format;
downstream operators run on the resulting DataFrame JVM-side.

Scale notes: parallelism = number of files (the reference's layout is
many per-state files). Splitting one huge container file on its sync
markers is not implemented — documented limitation. ``write_avro`` writes
one container file per partition from the executors (works wherever
executors can open the target path — local/NFS; object stores would need a
Hadoop OutputFormat).
"""

from __future__ import annotations

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


def _compile_decoder(sch):
    """Schema node -> ``fn(reader) -> value`` closure. Compiling once per
    schema removes the per-value type-dispatch that dominated the naive
    recursive decoder (the decode loop runs per record on the executors)."""
    t = _type_name(sch)
    if t == "null":
        return lambda r: None
    if t == "boolean":
        return lambda r: r.read(1) == b"\x01"
    if t in ("int", "long"):
        if not isinstance(sch, str):
            lt = sch.get("logicalType")
            if lt == "timestamp-micros":
                return lambda r: pd.Timestamp(r.read_long(), unit="us").to_pydatetime()
            if lt == "timestamp-millis":
                return lambda r: pd.Timestamp(r.read_long(), unit="ms").to_pydatetime()
            if lt == "date":
                return lambda r: pd.Timestamp(r.read_long(), unit="D").date()
        return _Reader.read_long
    if t == "float":
        unpack_f = struct.Struct("<f").unpack
        return lambda r: unpack_f(r.read(4))[0]
    if t == "double":
        unpack_d = struct.Struct("<d").unpack
        return lambda r: unpack_d(r.read(8))[0]
    if t == "bytes":
        return _Reader.read_bytes
    if t == "string":
        return lambda r: r.read_bytes().decode("utf-8")
    if t == "union":
        subs = [_compile_decoder(s) for s in sch]
        return lambda r: subs[r.read_long()](r)
    if t == "record":
        fields = [(f["name"], _compile_decoder(f["type"])) for f in sch["fields"]]
        return lambda r: {name: dec(r) for name, dec in fields}
    if t == "array":
        item = _compile_decoder(sch["items"])

        def dec_array(r):
            out = []
            while True:
                n = r.read_long()
                if n == 0:
                    break
                if n < 0:  # block with byte-size prefix
                    n = -n
                    r.read_long()
                out.extend(item(r) for _ in range(n))
            return out

        return dec_array
    if t == "map":
        val = _compile_decoder(sch["values"])

        def dec_map(r):
            out = {}
            while True:
                n = r.read_long()
                if n == 0:
                    break
                if n < 0:
                    n = -n
                    r.read_long()
                for _ in range(n):
                    # key must be read before the value
                    k = r.read_bytes().decode("utf-8")
                    out[k] = val(r)
            return out

        return dec_map
    if t == "enum":
        symbols = sch["symbols"]
        return lambda r: symbols[r.read_long()]
    if t == "fixed":
        size = sch["size"]
        return lambda r: r.read(size)
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


def _open_container(data: bytes, schema=None):
    """Parse header -> (parsed schema, iterator of (block_reader, count))."""
    r = _Reader(data)
    meta, sync = _read_container_header(r)
    sch = parse_schema(schema) if schema is not None else parse_schema(
        meta["avro.schema"].decode("utf-8")
    )
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec: {codec} (null/deflate only)")

    def blocks():
        while r.pos < len(r.buf):
            count = r.read_long()
            payload = r.read_bytes()
            if codec == "deflate":
                payload = zlib.decompress(payload, -15)  # raw deflate per spec
            yield _Reader(payload), count
            if r.read(_SYNC_SIZE) != sync:
                raise ValueError("sync marker mismatch (corrupt block)")

    return sch, blocks()


def decode_container(data: bytes, schema=None) -> list[dict]:
    """All records of one Avro object container file as dicts (the writer
    schema travels in the file; ``schema`` overrides for projection-free
    reader-schema use)."""
    sch, blocks = _open_container(data, schema)
    dec = _compile_decoder(sch)
    out = []
    for br, count in blocks:
        out.extend(dec(br) for _ in range(count))
    return out


def decode_container_columns(data: bytes, schema=None) -> dict[str, list]:
    """Top-level-record container -> {field: values} columns, skipping the
    per-record dict (the read_avro hot path: columns feed pandas/Arrow
    directly)."""
    sch, blocks = _open_container(data, schema)
    field_decs = [(f["name"], _compile_decoder(f["type"])) for f in sch["fields"]]
    cols: dict[str, list] = {name: [] for name, _ in field_decs}
    appends = [(cols[name].append, dec) for name, dec in field_decs]
    for br, count in blocks:
        for _ in range(count):
            for append, dec in appends:
                append(dec(br))
    return cols


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
    """bytearray-backed encoder sink (append/extend beat BytesIO's per-call
    overhead ~3x in the per-record encode loop)."""

    __slots__ = ("out",)

    def __init__(self):
        self.out = bytearray()

    def write(self, b: bytes):
        self.out.extend(b)

    def write_long(self, v: int):
        v = (v << 1) ^ (v >> 63)  # zigzag (arbitrary-precision-safe in Python)
        out = self.out
        while v > 0x7F:
            out.append((v & 0x7F) | 0x80)
            v >>= 7
        out.append(v)

    def write_bytes(self, b: bytes):
        self.write_long(len(b))
        self.out.extend(b)

    def getvalue(self) -> bytes:
        return bytes(self.out)


def _compile_encoder(sch):
    """Schema node -> ``fn(writer, value)`` closure (same rationale as
    ``_compile_decoder``: resolve the schema walk once, not per value)."""
    t = _type_name(sch)
    if t == "null":
        return lambda w, v: None
    if t == "boolean":
        return lambda w, v: w.write(b"\x01" if v else b"\x00")
    if t in ("int", "long"):
        return lambda w, v: w.write_long(int(v))
    if t == "float":
        pack_f = struct.Struct("<f").pack
        return lambda w, v: w.write(pack_f(float(v)))
    if t == "double":
        pack_d = struct.Struct("<d").pack
        return lambda w, v: w.write(pack_d(float(v)))
    if t == "bytes":
        return lambda w, v: w.write_bytes(bytes(v))
    if t == "string":
        return lambda w, v: w.write_bytes(
            v.encode("utf-8") if isinstance(v, str) else str(v).encode("utf-8")
        )
    if t == "union":
        names = [_type_name(s) for s in sch]
        null_idxs = [i for i, n in enumerate(names) if n == "null"]
        other_idxs = [i for i, n in enumerate(names) if n != "null"]
        if len(null_idxs) != 1 or len(other_idxs) != 1:
            # The writer only ever produces nullable-style unions
            # (spark_to_avro_schema emits ["null", X]); any other shape has
            # no unambiguous branch for a bare Python value — fail loudly at
            # schema-compile time instead of StopIteration (no null branch)
            # or silently encoding with the first non-null branch.
            raise ValueError(
                f"avro writer supports only [null, X] unions, got {names}"
            )
        null_idx, other_idx = null_idxs[0], other_idxs[0]
        enc_other = _compile_encoder(sch[other_idx])

        def enc_union(w, v):
            if v is None:
                w.write_long(null_idx)
            else:
                w.write_long(other_idx)
                enc_other(w, v)

        return enc_union
    if t == "record":
        fields = [(f["name"], _compile_encoder(f["type"])) for f in sch["fields"]]

        def enc_record(w, v):
            if isinstance(v, dict):
                for name, enc in fields:
                    enc(w, v[name])
            else:
                for name, enc in fields:
                    enc(w, getattr(v, name))

        return enc_record
    if t == "array":
        item = _compile_encoder(sch["items"])

        def enc_array(w, v):
            if len(v):
                w.write_long(len(v))
                for x in v:
                    item(w, x)
            w.write_long(0)

        return enc_array
    if t == "map":
        val = _compile_encoder(sch["values"])

        def enc_map(w, v):
            if v:
                w.write_long(len(v))
                for k, x in v.items():
                    w.write_bytes(str(k).encode("utf-8"))
                    val(w, x)
            w.write_long(0)

        return enc_map
    if t == "enum":
        index = {s: i for i, s in enumerate(sch["symbols"])}
        return lambda w, v: w.write_long(index[v])
    if t == "fixed":
        return lambda w, v: w.write(bytes(v))
    raise ValueError(f"unsupported avro type: {t}")


def _container_header(sch, codec: str, sync: bytes) -> bytes:
    head = _Writer()
    head.write(MAGIC)
    meta = {"avro.schema": json.dumps(sch).encode("utf-8"), "avro.codec": codec.encode()}
    head.write_long(len(meta))
    for k, v in meta.items():
        head.write_bytes(k.encode("utf-8"))
        head.write_bytes(v)
    head.write_long(0)
    head.write(sync)
    return head.getvalue()


def _container_block(n: int, payload: bytes, codec: str, sync: bytes) -> bytes:
    if not n:
        return b""
    if codec == "deflate":
        payload = zlib.compress(payload)[2:-4]  # raw deflate per spec
    blk = _Writer()
    blk.write_long(n)
    blk.write_bytes(payload)
    blk.write(sync)
    return blk.getvalue()


def encode_container(schema, records, codec: str = "null", sync: bytes = b"\x07" * 16) -> bytes:
    """Records -> one Avro object container file as bytes."""
    sch = parse_schema(schema)
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec: {codec}")
    enc = _compile_encoder(sch)
    body = _Writer()
    n = 0
    for rec in records:
        enc(body, rec)
        n += 1
    return _container_header(sch, codec, sync) + _container_block(
        n, body.getvalue(), codec, sync
    )


def write_avro_file(path: str, schema, records, codec: str = "null") -> None:
    with open(path, "wb") as f:
        f.write(encode_container(schema, records, codec=codec))


# ---------------------------------------------------------------------------
# DataFrame source / sink
# ---------------------------------------------------------------------------


def _spark_to_arrow_type(dt: T.DataType):
    """Spark DataType -> pyarrow type for the types an Avro-derived schema
    can contain (kept local: no dependency on pyspark's internal
    pandas.types converters, whose signatures move between releases).
    TimestampType maps to UTC-instant micros, matching Spark's Arrow
    exchange convention."""
    import pyarrow as pa

    if isinstance(dt, T.BooleanType):
        return pa.bool_()
    if isinstance(dt, T.ByteType):
        return pa.int8()
    if isinstance(dt, T.ShortType):
        return pa.int16()
    if isinstance(dt, T.IntegerType):
        return pa.int32()
    if isinstance(dt, T.LongType):
        return pa.int64()
    if isinstance(dt, T.FloatType):
        return pa.float32()
    if isinstance(dt, T.DoubleType):
        return pa.float64()
    if isinstance(dt, T.StringType):
        return pa.string()
    if isinstance(dt, T.BinaryType):
        return pa.binary()
    if isinstance(dt, T.TimestampType):
        return pa.timestamp("us", tz="UTC")
    if isinstance(dt, T.DateType):
        return pa.date32()
    if isinstance(dt, T.ArrayType):
        return pa.list_(_spark_to_arrow_type(dt.elementType))
    if isinstance(dt, T.MapType):
        return pa.map_(
            _spark_to_arrow_type(dt.keyType), _spark_to_arrow_type(dt.valueType)
        )
    if isinstance(dt, T.StructType):
        return pa.struct(
            [pa.field(f.name, _spark_to_arrow_type(f.dataType)) for f in dt.fields]
        )
    raise ValueError(f"unsupported spark type for arrow exchange: {dt}")


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

    def decode_files(batches):
        import pyarrow as pa

        reader_sch = json.loads(sch_json)
        arrow_sch = pa.schema(
            [pa.field(f.name, _spark_to_arrow_type(f.dataType)) for f in spark_schema.fields]
        )
        for batch in batches:
            for content in batch.column(0).to_pylist():
                data = decode_container_columns(bytes(content), schema=reader_sch)
                arrays = []
                for field in arrow_sch:
                    vals = data[field.name]
                    if pa.types.is_timestamp(field.type):
                        # decoder yields naive UTC datetimes; the naive ->
                        # tz-aware cast treats them as UTC instants
                        arrays.append(
                            pa.array(vals, pa.timestamp("us")).cast(field.type)
                        )
                    else:
                        # pa.array keeps None -> null and NaN -> NaN double
                        # (a pandas hop here conflated the two)
                        arrays.append(pa.array(vals, field.type))
                yield pa.RecordBatch.from_arrays(arrays, schema=arrow_sch)

    src = path if not os.path.isdir(path) else os.path.join(path, "*.avro")
    files = spark.read.format("binaryFile").load(src).select("content")
    return files.mapInArrow(decode_files, schema=spark_schema)


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
    the number of files written.

    Hot path is ``mapInArrow`` (Arrow column transfer — no JVM->Python row
    pickling, and no pandas materialization) with one container BLOCK per
    Arrow batch streamed into the partition's file, so executor memory is
    bounded by the batch size, not the partition. Null handling comes from
    the Arrow validity mask via ``Array.to_pylist`` (true SQL NULL -> None),
    which — unlike ``Series.isna`` — leaves a genuine double NaN encoded as
    NaN instead of rewriting it to Avro null.

    Task-retry/speculation safety: each task writes
    ``.part-<partitionId>.avro.inprogress-<taskAttemptId>`` and atomically
    ``os.replace``s it to the deterministic ``part-<partitionId>.avro`` on
    commit — a retried or speculative attempt overwrites the same final
    name instead of adding a duplicate uuid file, and a failed attempt
    leaves only a dot-prefixed temp that the next driver-side cleanup (or
    the read glob, which matches ``*.avro`` only) ignores."""
    import pyarrow as pa

    os.makedirs(dir_path, exist_ok=True)
    # overwrite semantics: clear previous outputs (the new write may have
    # fewer partitions than the old, so deterministic names alone don't
    # cover every stale file) and any orphaned in-progress temps
    for old in os.listdir(dir_path):
        if old.endswith(".avro") or ".avro.inprogress-" in old:
            os.remove(os.path.join(dir_path, old))
    avro_sch = spark_to_avro_schema(df.schema)
    sch_json = json.dumps(avro_sch)
    cols = [f.name for f in df.schema.fields]
    ts_cols = {f.name for f in df.schema.fields if isinstance(f.dataType, T.TimestampType)}
    date_cols = {f.name for f in df.schema.fields if isinstance(f.dataType, T.DateType)}
    map_cols = {f.name for f in df.schema.fields if isinstance(f.dataType, T.MapType)}

    def write_part(batches):
        from pyspark import TaskContext

        sch = json.loads(sch_json)
        field_encs = [_compile_encoder(f["type"]) for f in sch["fields"]]
        sync = b"\x07" * _SYNC_SIZE
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        attempt = ctx.taskAttemptId() if ctx is not None else 0
        final = os.path.join(dir_path, f"part-{pid:05d}.avro")
        tmp = os.path.join(dir_path, f".part-{pid:05d}.avro.inprogress-{attempt}")
        fh = None
        n_files = 0
        try:
            for batch in batches:
                col_lists = []
                for i, c in enumerate(cols):
                    arr = batch.column(i)
                    if c in ts_cols:
                        # timestamp(us[, tz]) -> micros since epoch; the
                        # underlying int64 is already the UTC instant
                        if pa.types.is_timestamp(arr.type) and arr.type.unit != "us":
                            arr = arr.cast(pa.timestamp("us", tz=arr.type.tz))
                        vals = arr.cast(pa.int64()).to_pylist()
                    elif c in date_cols:
                        # date32 -> days since epoch (avro logical date)
                        vals = arr.cast(pa.int32()).to_pylist()
                    elif c in map_cols:
                        # arrow map scalars materialize as (k, v) tuples
                        vals = [None if v is None else dict(v) for v in arr.to_pylist()]
                    else:
                        # validity mask -> None; double NaN stays NaN
                        vals = arr.to_pylist()
                    col_lists.append(vals)
                body = _Writer()
                n = batch.num_rows
                for rec in zip(*col_lists):
                    for enc, v in zip(field_encs, rec):
                        enc(body, v)
                if n:
                    if fh is None:
                        fh = open(tmp, "wb")
                        fh.write(_container_header(sch, codec, sync))
                    fh.write(_container_block(n, body.getvalue(), codec, sync))
        except BaseException:
            if fh is not None:
                fh.close()
                try:
                    os.remove(tmp)
                except OSError:
                    pass
            raise
        if fh is not None:
            fh.close()
            os.replace(tmp, final)  # atomic commit of this attempt's output
            n_files = 1
        yield pa.RecordBatch.from_pylist([{"n": n_files}])

    counts = df.mapInArrow(write_part, schema="n long")
    total = counts.agg({"n": "sum"}).first()[0]
    return int(total or 0)
