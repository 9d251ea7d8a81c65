"""Type-lint over the oracle suite (r9 verdict, Next-round #2).

Root cause of the three-round red rows (io_csv_roundtrip,
doc_dedup_rewrite): DuckDB types ``SUM(BIGINT)`` as HUGEINT, which
arrives in Arrow as ``decimal128(38,0)`` while Spark emits int64.  A
comparator that hashes typed values sees int64 != decimal128 even when
every value is equal, producing the exact observed signature
``rows_match=true, schema_match=true, hash_match=false``.  House
convention: every integer aggregate in oracle SQL is wrapped in
``CAST(... AS BIGINT)``.

This test makes the bug class impossible to reintroduce: it executes
every ``oracle_sql()`` statement against sf0.001 via
``fetch_arrow_table()`` and asserts no output column has a type Spark
cannot emit — no decimal/hugeint, no unsigned, no halffloat.  A
deliberately un-cast ``SUM(BIGINT)`` fails this test (pinned below).
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)

# Arrow types Spark's collect()/toPandas() surface can emit.  Anything
# outside this set means the oracle SQL needs a CAST.
_FORBIDDEN_SUBSTRINGS = ("decimal", "uint", "halffloat")


def _type_ok(t: pa.DataType) -> bool:
    s = str(t)
    return not any(bad in s for bad in _FORBIDDEN_SUBSTRINGS)


@pytest.fixture(scope="module")
def duck_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


ORACLES = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLES)
def test_oracle_emits_only_spark_compatible_types(duck_con, name):
    sql = entrymod.oracle_sql()[name]
    tbl = duck_con.execute(sql).fetch_arrow_table()
    bad = {f.name: str(f.type) for f in tbl.schema if not _type_ok(f.type)}
    assert not bad, (
        f"{name}: oracle emits Spark-incompatible Arrow types {bad}; "
        f"wrap the offending expression in CAST(... AS BIGINT/DOUBLE). "
        f"DuckDB SUM(BIGINT) -> HUGEINT -> decimal128 was the r7-r9 "
        f"three-round hash-red root cause."
    )


def test_typed_mirror_reproduces_historical_red(spark, duck_con):
    """r9 verdict Next-round #3 'Done =' condition: the upgraded mirror,
    run against the r8-era oracle text (un-cast SUM), reproduces the
    historical red — values equal, value-hash green, TYPE red — proving
    the three-round blind spot is closed."""
    import pyspark.sql.functions as F

    from tools_compare import compare_typed

    sdf = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .groupBy("lang")
        .agg(F.sum("n_chars").alias("s"))
    )
    srows = [tuple(r) for r in sdf.collect()]
    r8_era_oracle = "SELECT lang, sum(n_chars) AS s FROM documents GROUP BY lang"
    res = compare_typed(sdf, srows, duck_con, r8_era_oracle)
    # exact historical gate signature: rows/schema/values match ...
    assert res["rows_match"] and res["schema_match"] and res["hash_match"]
    # ... but the typed layer reds on HUGEINT -> decimal128(38,0)
    assert not res["type_match"], res
    assert res["type_diff"] == {"s": ("int", "decimal(38,0)")}, res

    fixed_oracle = (
        "SELECT lang, CAST(sum(n_chars) AS BIGINT) AS s "
        "FROM documents GROUP BY lang"
    )
    res2 = compare_typed(sdf, srows, duck_con, fixed_oracle)
    assert all(
        res2[k] for k in ("rows_match", "schema_match", "hash_match", "type_match")
    ), res2


def test_lint_catches_uncast_sum(duck_con):
    """Regression pin: the exact r7-r9 defect shape trips the lint."""
    tbl = duck_con.execute(
        "SELECT lang, sum(n_chars) AS s FROM documents GROUP BY lang"
    ).fetch_arrow_table()
    assert any(not _type_ok(f.type) for f in tbl.schema), (
        "lint must flag un-cast SUM(BIGINT); if DuckDB changed its SUM "
        "typing, revisit _FORBIDDEN_SUBSTRINGS"
    )
