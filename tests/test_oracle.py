"""Mimics the driver's t2 correctness gate: run every ``queries()`` entry on
Spark and its ``oracle_sql()`` on DuckDB over the same sf0.01 parquet, then
compare row count + column names + order-insensitive values."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    return str(v)


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


# Tiered mirror (r16; VERDICT r15 #1): by default the driver's 50-row
# window + rows touched since the last round; SPARK_GRAFT_FULL_ORACLE=1
# restores the full registry sweep. Tier membership and the shared
# DataFrame cache live in conftest so the plan gate builds the same DFs.
from conftest import oracle_tier_names

QUERIES = sorted(oracle_tier_names())


@pytest.fixture(scope="module")
def duck_con():
    con = _duck()
    yield con
    con.close()


@pytest.mark.parametrize("name", QUERIES)
def test_query_matches_oracle(spark, duck_con, name):
    from conftest import get_query_df

    oracle = entrymod.oracle_sql().get(name)
    sdf = get_query_df(spark, name)
    srows = sdf.collect()
    scols = sdf.columns
    if oracle is None:
        assert len(srows) >= 0  # rows-only check, mirrors driver's weak gate
        return
    orel = duck_con.sql(oracle)
    ocols = [d[0] for d in orel.description]
    orows = orel.fetchall()
    assert len(srows) == len(orows), f"{name}: rowcount {len(srows)} != {len(orows)}"
    assert sorted(scols) == sorted(ocols), f"{name}: cols {scols} vs {ocols}"
    # r10: typed layer — the gate hashes TYPED values (the r7-r9 red rows
    # were a HUGEINT-vs-int64 type mismatch with equal values, invisible
    # to the value comparison below); canonical Arrow type classes must
    # match, same comparator as the rehearsal/chaos mirrors
    from tools_compare import oracle_type_sig, spark_type_sig

    ssig = spark_type_sig(sdf)
    osig = oracle_type_sig(duck_con, oracle)
    assert ssig == osig, f"{name}: type signatures differ: {ssig} vs {osig}"
    ncols, nspark = _normalize(scols, [tuple(r) for r in srows])
    _, noracle = _normalize(ocols, orows)
    mism = [i for i, (a, b) in enumerate(zip(nspark, noracle)) if a != b]
    assert not mism, (
        f"{name}: {len(mism)} mismatched rows; first: "
        f"spark={nspark[mism[0]]} oracle={noracle[mism[0]]} cols={ncols}"
    )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0


def test_registry_contract():
    """Registry invariants the driver relies on: every query has an oracle
    (full-strength correctness rows, never the weak rows-only fallback),
    no duplicate names, and enough entries to fill the driver's 50-row
    correctness window."""
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    assert set(qs) <= set(osql), sorted(set(qs) - set(osql))
    assert len(qs) >= 50
    # every oracle is non-empty SQL text
    assert all(isinstance(v, str) and v.strip() for v in osql.values())


def test_registry_source_has_no_duplicate_keys():
    """The hand-maintained rotation's failure mode a runtime check can't
    see: a duplicate dict key in queries() would SILENTLY drop the earlier
    entry (later key wins) and shift every row behind it across the 50-row
    window boundary. Lint the source instead — every registered name must
    appear exactly once, and the parsed count must equal the dict's length
    (a mismatch means an entry the dict swallowed). Parses the file with
    ast (a self-consistent snapshot of the whole file): the previous
    inspect.getsource form sliced the on-disk text by the IMPORTED
    module's line offsets, so an edit landing mid-suite made it read the
    wrong region and fail spuriously. Also lints oracle_sql()'s dict in
    entry_oracles.py — a duplicate key there would silently override an
    oracle the same way."""
    import ast

    import entry_oracles as oraclemod

    def returned_dict_keys(path: str, func_name: str) -> list[str]:
        tree = ast.parse(open(path).read())
        fn = next(
            n
            for n in tree.body
            if isinstance(n, ast.FunctionDef) and n.name == func_name
        )
        keys: list[str] = []
        for node in ast.walk(fn):
            if isinstance(node, ast.Return) and isinstance(node.value, ast.Dict):
                for k in node.value.keys:
                    assert isinstance(k, ast.Constant) and isinstance(
                        k.value, str
                    ), f"non-literal key in {func_name}: {ast.dump(k)}"
                    keys.append(k.value)
        return keys

    names = returned_dict_keys(entrymod.__file__, "queries")
    dupes = sorted({n for n in names if names.count(n) > 1})
    assert not dupes, f"duplicate registry keys in source: {dupes}"
    qs = entrymod.queries()
    assert len(names) == len(qs), (len(names), len(qs))
    assert names == list(qs), "source order must equal dict order"

    onames = returned_dict_keys(oraclemod.__file__, "oracle_sql")
    odupes = sorted({n for n in onames if onames.count(n) > 1})
    assert not odupes, f"duplicate oracle keys in source: {odupes}"
    osql = entrymod.oracle_sql()
    assert len(onames) == len(osql), (len(onames), len(osql))
