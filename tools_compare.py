"""Shared typed comparator for the oracle mirrors (r9 verdict, Next-round #3).

The r7-r9 blind spot: the rehearsal/chaos mirrors compared Python-native
values (``fetchall()``), where DuckDB HUGEINT and Spark long both arrive
as ``int`` — so the mirrors stayed green for three rounds while the
gate's typed-value (Arrow-level) hash was red.  This module adds the
missing layer: a canonical Arrow *type signature* for each side, compared
alongside the values.

Canonicalization deliberately collapses differences the gate empirically
tolerates (integer widths, timestamp units/tz, large_* variants) while
keeping the classes Spark can never emit distinct and therefore
unmatchable: decimal (DuckDB ``SUM(BIGINT)`` -> HUGEINT ->
``decimal128(38,0)``), unsigned ints, halffloat.  With this, the mirror
run against the r8-era oracle text reproduces the historical red
(pinned in tests/test_oracle_types.py / test_typed_mirror_*).
"""

from __future__ import annotations

import math

import pyarrow as pa


def canon_arrow(t: pa.DataType) -> str:
    """Canonical class name for an Arrow type.

    Signed-int widths, float widths (>=32), timestamp unit/tz, date
    width, and large_* storage variants collapse; decimal / unsigned /
    halffloat stay distinct so a Spark-vs-DuckDB comparison reds on them.
    """
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_unsigned_integer(t):
        return f"uint{t.bit_width}"
    if pa.types.is_signed_integer(t):
        return "int"
    if pa.types.is_float16(t):
        return "halffloat"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if (
        pa.types.is_binary(t)
        or pa.types.is_large_binary(t)
        or pa.types.is_fixed_size_binary(t)
    ):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if (
        pa.types.is_list(t)
        or pa.types.is_large_list(t)
        or pa.types.is_fixed_size_list(t)
    ):
        return f"list<{canon_arrow(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{canon_arrow(f.type)}" for f in t)
        return f"struct<{inner}>"
    if pa.types.is_map(t):
        return f"map<{canon_arrow(t.key_type)},{canon_arrow(t.item_type)}>"
    if pa.types.is_null(t):
        return "null"
    return str(t)


def canon_spark(dt) -> str:
    """Canonical class name for a Spark DataType (same classes as
    ``canon_arrow`` so the two sides are directly comparable)."""
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, (T.StringType,)):
        return "string"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.ArrayType):
        return f"list<{canon_spark(dt.elementType)}>"
    if isinstance(dt, T.StructType):
        inner = ",".join(f"{f.name}:{canon_spark(f.dataType)}" for f in dt.fields)
        return f"struct<{inner}>"
    if isinstance(dt, T.MapType):
        return f"map<{canon_spark(dt.keyType)},{canon_spark(dt.valueType)}>"
    if isinstance(dt, T.NullType):
        return "null"
    return dt.simpleString()


def oracle_type_sig(con, sql: str) -> dict:
    """col -> canonical type class, from DuckDB's Arrow result schema —
    the typed layer the gate plausibly hashes."""
    schema = con.execute(sql).fetch_arrow_table().schema
    return {f.name: canon_arrow(f.type) for f in schema}


def spark_type_sig(df) -> dict:
    """col -> canonical type class, from the Spark result schema."""
    return {f.name: canon_spark(f.dataType) for f in df.schema.fields}


# ---- value comparison (unchanged semantics, shared here) ----------------


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return str(v)


def normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def compare_typed(sdf, srows, con, sql):
    """Full gate-shaped comparison: rows / schema / value-hash / TYPED.

    Returns a dict with the driver's three booleans plus ``type_match``
    (canonical Arrow type signatures equal) and, on type mismatch, the
    offending columns.
    """
    orel = con.sql(sql)
    ocols = [d[0] for d in orel.description]
    orows = orel.fetchall()
    ssig = spark_type_sig(sdf)
    osig = oracle_type_sig(con, sql)
    type_diff = {
        c: (ssig.get(c), osig.get(c))
        for c in set(ssig) | set(osig)
        if ssig.get(c) != osig.get(c)
    }
    out = {
        "rows_match": len(srows) == len(orows),
        "schema_match": sorted(sdf.columns) == sorted(ocols),
        "hash_match": normalize(sdf.columns, srows) == normalize(ocols, orows),
        "type_match": not type_diff,
    }
    if type_diff:
        out["type_diff"] = type_diff
    return out
