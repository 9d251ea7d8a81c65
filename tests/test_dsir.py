"""DSIR importance resampling (r14 window candidate): exact pure-Python
recompute pins on a handmade corpus, selection-shape behavior, and the
gate-shaped pre-validation of the unregistered driver row against its
DuckDB oracle."""
from __future__ import annotations

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from scabillmatch_spark.operators.dsir import (
    bucket_totals,
    dsir_log_ratios,
    dsir_resample,
    dsir_scores,
    hashed_ngram_counts,
)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def _py_tokens(text: str) -> list[str]:
    return [w for w in re.sub(r"[0-9,:;?!.]", "", text.lower()).split(" ") if w]


def _py_grams(text: str) -> list[str]:
    t = _py_tokens(text)
    return t + [" ".join(p) for p in zip(t, t[1:])]


def _py_bucket(gram: str, b: int) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16) % b


def _py_ratios(target, raw, b, k=0.5):
    from collections import Counter

    tc = Counter(_py_bucket(g, b) for _, tx in target for g in _py_grams(tx))
    rc = Counter(_py_bucket(g, b) for _, tx in raw for g in _py_grams(tx))
    tt, rt = sum(tc.values()), sum(rc.values())
    return {
        i: math.log((tc[i] + k) / (tt + k * b))
        - math.log((rc[i] + k) / (rt + k * b))
        for i in range(b)
    }


B = 64

ROWS = [
    (1, "fast scan fast scan fast"),
    (2, "fast scan the table"),
    (3, "slow merge slow merge"),
    (4, "slow merge slow row"),
    (5, "the table the row"),
]
TARGET_IDS = {1, 2}  # the "fast scan" register is the target style


def _docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_hashed_counts_match_python(spark):
    feats = hashed_ngram_counts(_docs(spark), n_buckets=B).collect()
    from collections import Counter

    exp: dict = {}
    for d, tx in ROWS:
        c = Counter(_py_bucket(g, B) for g in _py_grams(tx))
        exp[d] = dict(c)
    got: dict = {}
    for r in feats:
        got.setdefault(r.doc_id, {})[r.bucket] = r.cnt
    assert got == exp


def test_scores_match_python_exactly(spark):
    docs = _docs(spark)
    target = docs.filter(F.col("doc_id").isin(list(TARGET_IDS)))
    ratios = dsir_log_ratios(target, docs, n_buckets=B)
    exp_r = _py_ratios(
        [r for r in ROWS if r[0] in TARGET_IDS], ROWS, B
    )
    got_r = {r.bucket: r.log_ratio for r in ratios.collect()}
    assert set(got_r) == set(range(B))  # full spine, no dropped features
    for i in range(B):
        assert got_r[i] == pytest.approx(exp_r[i], abs=1e-12)

    scored = {r.doc_id: r for r in dsir_scores(docs, ratios, B).collect()}
    for d, tx in ROWS:
        grams = _py_grams(tx)
        exp_w = sum(exp_r[_py_bucket(g, B)] for g in grams)
        assert scored[d].n_grams == len(grams)
        assert scored[d].log_w == pytest.approx(exp_w, abs=1e-9)
        assert scored[d].avg_log_w == pytest.approx(exp_w / len(grams), abs=1e-9)


def test_target_register_scores_higher(spark):
    docs = _docs(spark)
    target = docs.filter(F.col("doc_id").isin(list(TARGET_IDS)))
    scored = {
        r.doc_id: r.avg_log_w
        for r in dsir_scores(
            docs, dsir_log_ratios(target, docs, n_buckets=B), B
        ).collect()
    }
    # every target doc outranks every off-register doc per-gram
    assert min(scored[d] for d in TARGET_IDS) > max(
        scored[d] for d in (3, 4)
    )


def test_resample_deterministic_and_bounded(spark):
    docs = _docs(spark)
    target = docs.filter(F.col("doc_id").isin(list(TARGET_IDS)))
    a = [tuple(r) for r in dsir_resample(docs, target, n=3, n_buckets=B).collect()]
    b = [tuple(r) for r in dsir_resample(docs, target, n=3, n_buckets=B).collect()]
    assert a == b and len(a) == 3  # md5 noise: replayable, no rand()
    keys = [r[2] for r in a]
    assert keys == sorted(keys, reverse=True)


def test_cond_path_equals_two_frame_path(spark):
    """dsir_log_ratios_cond (one gram pass, conditional counts, window
    totals) must produce the EXACT model of the two-frame form for the
    same membership — same counts, same python-vs-JVM double arithmetic
    on exact integers."""
    from scabillmatch_spark.operators.dsir import dsir_log_ratios_cond

    docs = _docs(spark).withColumn(
        "is_t", F.col("doc_id").isin(list(TARGET_IDS))
    )
    target = docs.filter(F.col("is_t"))
    two = {
        r.bucket: r.log_ratio
        for r in dsir_log_ratios(target, docs, n_buckets=B).collect()
    }
    cond = {
        r.bucket: r.log_ratio
        for r in dsir_log_ratios_cond(docs, F.col("is_t"), n_buckets=B).collect()
    }
    assert cond == two  # bit-identical, not approx


def test_cond_path_empty_target_fails_loudly(spark):
    from scabillmatch_spark.operators.dsir import dsir_log_ratios_cond

    docs = _docs(spark)
    with pytest.raises(Exception, match="empty target|ASSERT"):
        dsir_log_ratios_cond(docs, F.lit(False), n_buckets=B).collect()


def test_empty_target_raises(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="empty target"):
        dsir_log_ratios(docs.filter(F.lit(False)), docs, n_buckets=B)


def test_dsir_query_matches_oracle(spark):
    """r14 pre-validation: the unregistered q_doc_dsir_select matches its
    DuckDB oracle typed-exact at sf0.001 (sf0.01 out-of-band, PLANS.md
    round 12)."""
    import duckdb

    import __spark_entry__ as entrymod
    from tools_compare import compare_typed

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    df = entrymod.q_doc_dsir_select(spark, sf)
    rows = [tuple(r) for r in df.collect()]
    assert rows
    res = compare_typed(df, rows, con, entrymod._doc_dsir_select_oracle())
    assert all(
        res[k] for k in ("rows_match", "schema_match", "hash_match", "type_match")
    ), res
