from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from scabillmatch_spark.operators.asof import asof_join, range_self_join


def _ts(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


def test_asof_join_semantics(spark):
    probe = spark.createDataFrame(
        [(1, 1, _ts(10)), (2, 1, _ts(30)), (3, 2, _ts(5)), (4, 3, _ts(10))],
        ["event_id", "user_id", "ts"],
    )
    build = spark.createDataFrame(
        [(1, _ts(10)), (1, _ts(20)), (2, _ts(7))], ["user_id", "ts"]
    )
    out = {r.event_id: r.ts_asof for r in asof_join(probe, build, "user_id").collect()}
    assert out[1] == _ts(10)   # tie: build at same ts matches (<=)
    assert out[2] == _ts(20)   # latest earlier build row
    assert out[3] is None      # build only after probe -> no match
    assert out[4] is None      # key with no build rows


def test_asof_join_tied_and_null_probe_rows(spark):
    # two probe rows share (user_id, ts) -> must yield exactly 2 output rows
    # (the round-1 re-attach join cross-producted them to 4); NULL-ts probe
    # rows are kept with NULL build columns
    probe = spark.createDataFrame(
        [(1, 1, _ts(10)), (2, 1, _ts(10)), (3, 1, None)],
        ["event_id", "user_id", "ts"],
    )
    build = spark.createDataFrame(
        [(1, _ts(5), "a"), (1, _ts(8), "b")], ["user_id", "ts", "label"]
    )
    rows = asof_join(probe, build, "user_id").collect()
    assert len(rows) == 3
    by_id = {r.event_id: r for r in rows}
    assert by_id[1].ts_asof == _ts(8) and by_id[1].label_asof == "b"
    assert by_id[2].ts_asof == _ts(8) and by_id[2].label_asof == "b"
    assert by_id[3].ts_asof is None and by_id[3].label_asof is None


def test_asof_join_null_key_build_rows_never_match(spark):
    # SQL equality rejects NULLs: a NULL-key probe row must get NULL build
    # columns, not pair with a NULL-key build row via the window partition
    probe = spark.createDataFrame(
        [(1, None, _ts(10)), (2, 1, _ts(10))],
        "event_id long, user_id long, ts timestamp",
    )
    build = spark.createDataFrame(
        [(None, _ts(5), "nullkey"), (1, _ts(5), "real")],
        "user_id long, ts timestamp, label string",
    )
    by_id = {r.event_id: r for r in asof_join(probe, build, "user_id").collect()}
    assert by_id[1].ts_asof is None and by_id[1].label_asof is None
    assert by_id[2].ts_asof == _ts(5) and by_id[2].label_asof == "real"


def test_asof_join_attaches_build_payload(spark):
    probe = spark.createDataFrame([(1, 1, _ts(30))], ["event_id", "user_id", "ts"])
    build = spark.createDataFrame(
        [(1, _ts(10), "early", 5.0), (1, _ts(20), "late", 7.5)],
        ["user_id", "ts", "label", "score"],
    )
    r = asof_join(probe, build, "user_id").collect()[0]
    assert r.ts_asof == _ts(20) and r.label_asof == "late" and r.score_asof == 7.5


def test_range_self_join_window(spark):
    df = spark.createDataFrame(
        [(1, 1, _ts(0)), (2, 1, _ts(1)), (3, 1, _ts(3)), (4, 2, _ts(0))],
        ["event_id", "user_id", "ts"],
    )
    pairs = {
        (r.id1, r.id2): r.gap_us
        for r in range_self_join(df, "user_id", "ts", "event_id", 2 * 60_000_000).collect()
    }
    # within 2 min: (1,2) 1min, (2,3) 2min; NOT (1,3) 3min; never cross-user
    assert set(pairs) == {(1, 2), (2, 3)}
    assert pairs[(1, 2)] == 60_000_000