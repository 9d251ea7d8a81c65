"""merge_into / scd2_history unit tests: ANSI MERGE edge cases (update /
delete / insert arbitration, NULL handling, insert=False, update subsets,
source columns missing from the target) and SCD2 change-collapse +
validity-range semantics, plus the plan shape (one join, no cartesian)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from scabillmatch_spark.operators.merge import merge_into, scd2_history


def _target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, s string, v double",
    )


def _source(spark):
    # 2: update; 3: delete; 4: insert; 5: delete-of-missing-key (no-op)
    return spark.createDataFrame(
        [
            (2, "B", 200.0, False),
            (3, "c", 30.0, True),
            (4, "d", 40.0, False),
            (5, "x", 0.0, True),
        ],
        "k long, s string, v double, del boolean",
    )


@pytest.mark.parametrize("bcast", [False, True])
def test_merge_update_delete_insert(spark, bcast):
    out = merge_into(
        _target(spark), _source(spark), ["k"],
        delete_col="del", broadcast_source=bcast,
    )
    rows = {r.k: (r.s, r.v) for r in out.collect()}
    assert rows == {1: ("a", 10.0), 2: ("B", 200.0), 4: ("d", 40.0)}
    assert out.columns == ["k", "s", "v"]  # target schema, target order


@pytest.mark.parametrize("bcast", [False, True])
def test_merge_no_insert(spark, bcast):
    out = merge_into(
        _target(spark), _source(spark), ["k"],
        delete_col="del", insert=False, broadcast_source=bcast,
    )
    assert {r.k for r in out.collect()} == {1, 2}


@pytest.mark.parametrize("bcast", [False, True])
def test_merge_update_subset_keeps_other_target_cols(spark, bcast):
    out = merge_into(
        _target(spark), _source(spark), ["k"],
        update_cols=["v"], delete_col="del", broadcast_source=bcast,
    )
    rows = {r.k: (r.s, r.v) for r in out.collect()}
    # s untouched on the matched row; still the source value on the insert
    assert rows[2] == ("b", 200.0)
    assert rows[4] == ("d", 40.0)


@pytest.mark.parametrize("bcast", [False, True])
def test_merge_target_col_missing_from_source_is_null_on_insert(spark, bcast):
    src = spark.createDataFrame([(4, "d")], "k long, s string")
    out = merge_into(_target(spark), src, ["k"], broadcast_source=bcast)
    rows = {r.k: (r.s, r.v) for r in out.collect()}
    assert rows[4] == ("d", None)
    assert rows[2] == ("b", 20.0)  # non-matched target rows untouched
    assert len(rows) == 4


@pytest.mark.parametrize("bcast", [False, True])
def test_merge_null_payload_update_overwrites(spark, bcast):
    # a NULL source value is an update to NULL, not "keep target"
    src = spark.createDataFrame([(1, None, 99.0)], "k long, s string, v double")
    out = merge_into(_target(spark), src, ["k"], broadcast_source=bcast)
    rows = {r.k: (r.s, r.v) for r in out.collect()}
    assert rows[1] == (None, 99.0)


def test_merge_broadcast_never_shuffles_target(spark):
    """The CDC-apply scale property: with broadcast_source, the target side
    must reach the update join un-exchanged (broadcast left join), and the
    insert anti-join must also be broadcast — no SortMergeJoin anywhere."""
    out = merge_into(
        _target(spark), _source(spark), ["k"],
        delete_col="del", broadcast_source=True,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan  # left + anti (+ semi)
    # the only hash exchange allowed is the source-side unique-key window
    exch = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert len(exch) <= 1, plan


def test_merge_rejects_bad_args(spark):
    with pytest.raises(ValueError, match="delete_col"):
        merge_into(_target(spark), _source(spark), ["k"], delete_col="nope")
    with pytest.raises(ValueError, match="update_cols"):
        merge_into(_target(spark), _source(spark), ["k"], update_cols=["zz"])


def test_merge_rejects_reserved_column_collisions(spark):
    # a user column named like an internal marker would silently corrupt
    # the arbitration exprs — must fail loudly instead
    tgt_bad = _target(spark).withColumn("__tgt_present", F.lit(True))
    with pytest.raises(ValueError, match="reserved"):
        merge_into(tgt_bad, _source(spark), ["k"])
    src_bad = _source(spark).withColumn("__src_v", F.lit(1.0))
    with pytest.raises(ValueError, match="reserved"):
        merge_into(_target(spark), src_bad, ["k"])


def test_merge_plan_single_join_no_cartesian(spark):
    import contextlib
    import io

    out = merge_into(_target(spark), _source(spark), ["k"], delete_col="del")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # exactly ONE join in the logical plan: MERGE must not re-join per clause
    logical = out._jdf.queryExecution().optimizedPlan().toString()
    join_lines = [l for l in logical.splitlines() if "Join " in l]
    assert len(join_lines) == 1 and "FullOuter" in join_lines[0], logical


def test_scd2_collapses_and_ranges(spark):
    log = spark.createDataFrame(
        [
            (1, 10, "bronze"),
            (1, 20, "bronze"),  # no change -> collapses
            (1, 30, "gold"),
            (2, 5, "silver"),
        ],
        "k long, t long, tier string",
    )
    out = scd2_history(log, "k", "t", ["tier"]).collect()
    rows = {(r.k, r.effective_from): (r.tier, r.effective_to, r.is_current) for r in out}
    assert rows == {
        (1, 10): ("bronze", 30, 0),
        (1, 30): ("gold", None, 1),
        (2, 5): ("silver", None, 1),
    }


def test_scd2_null_safe_tracking(spark):
    # NULL -> NULL is "no change"; NULL -> value and value -> NULL are changes
    log = spark.createDataFrame(
        [Row(k=1, t=1, a=None), Row(k=1, t=2, a=None), Row(k=1, t=3, a="x"),
         Row(k=1, t=4, a=None)],
    )
    out = scd2_history(log, "k", "t", ["a"]).orderBy("effective_from").collect()
    assert [(r.a, r.effective_from, r.effective_to) for r in out] == [
        (None, 1, 3), ("x", 3, 4), (None, 4, None),
    ]


def test_scd2_single_shuffle(spark):
    log = spark.range(100).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("t"),
        (F.col("id") % 3).alias("a"),
    )
    out = scd2_history(log, "k", "t", ["a"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # both windows ride ONE hash-partitioned exchange on the key
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_merge_composite_keys(spark):
    tgt = spark.createDataFrame(
        [(1, "x", 10.0), (1, "y", 11.0), (2, "x", 20.0)],
        "k1 long, k2 string, v double",
    )
    src = spark.createDataFrame(
        [(1, "y", 110.0), (3, "z", 30.0)], "k1 long, k2 string, v double"
    )
    out = merge_into(tgt, src, ["k1", "k2"])
    rows = {(r.k1, r.k2): r.v for r in out.collect()}
    assert rows == {(1, "x"): 10.0, (1, "y"): 110.0, (2, "x"): 20.0, (3, "z"): 30.0}


def test_scd2_multi_tracked_columns(spark):
    # a change in EITHER tracked column opens a new version
    log = spark.createDataFrame(
        [(1, 10, "a", 1), (1, 20, "a", 1), (1, 30, "a", 2), (1, 40, "b", 2)],
        "k long, t long, x string, y long",
    )
    out = scd2_history(log, "k", "t", ["x", "y"]).orderBy("effective_from").collect()
    assert [(r.x, r.y, r.effective_from, r.effective_to) for r in out] == [
        ("a", 1, 10, 30), ("a", 2, 30, 40), ("b", 2, 40, None),
    ]


def test_merge_duplicate_source_keys_fail_at_execution(spark):
    # Delta's "multiple source rows matched" precondition, enforced in-plan
    dup_src = spark.createDataFrame(
        [(2, "B", 200.0, False), (2, "B2", 201.0, True)],
        "k long, s string, v double, del boolean",
    )
    out = merge_into(_target(spark), dup_src, ["k"], delete_col="del")
    with pytest.raises(Exception, match="multiple source rows matched"):
        out.collect()
    # opt-out path still runs (caller vouches for uniqueness upstream)
    ok = merge_into(
        _target(spark), dup_src, ["k"], delete_col="del",
        check_unique_source=False,
    )
    assert ok.count() >= 2


def test_merge_update_cols_not_in_target_raises(spark):
    src = spark.createDataFrame([(1, 9.0)], "k long, price_usd double")
    with pytest.raises(ValueError, match="update_cols not in target"):
        merge_into(_target(spark), src, ["k"], update_cols=["price_usd"])


def test_stream_merge_apply_equals_one_shot(spark, tmp_path):
    from scabillmatch_spark.streaming.ingest import stream_merge_apply

    tgt = spark.createDataFrame(
        [(i, f"s{i}", float(i)) for i in range(1, 21)],
        "k long, s string, v double",
    )
    # updates on 2..8 even, delete 5/15, insert 100..103
    delta = spark.createDataFrame(
        [(k, f"S{k}", k * 10.0, False) for k in (2, 4, 6, 8)]
        + [(5, "x", 0.0, True), (15, "x", 0.0, True)]
        + [(k, f"n{k}", 1.0, False) for k in (100, 101, 102, 103)],
        "k long, s string, v double, del boolean",
    )
    streamed = stream_merge_apply(
        spark, tgt, delta, str(tmp_path / "cdc"), ["k"], delete_col="del",
        n_batches=3,
    )
    one_shot = merge_into(tgt, delta, ["k"], delete_col="del")
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, one_shot.collect())
    )


def test_stream_merge_apply_sized_partitions_restores_conf(spark, tmp_path):
    """The r12-s3 shuffle_partitions knob's two contracts: (1) results are
    identical to the unsized path (partitioning must never change values),
    (2) the session conf is RESTORED after the query — a leaked override
    would silently resize every later query's exchanges (the cross-query
    state class the chaos tool hunts)."""
    from scabillmatch_spark.streaming.ingest import stream_merge_apply

    tgt = spark.createDataFrame(
        [(i, f"s{i}", float(i)) for i in range(1, 21)],
        "k long, s string, v double",
    )
    delta = spark.createDataFrame(
        [(k, f"S{k}", k * 10.0, False) for k in (2, 4, 6, 8)]
        + [(5, "x", 0.0, True)]
        + [(k, f"n{k}", 1.0, False) for k in (100, 101)],
        "k long, s string, v double, del boolean",
    )
    before = spark.conf.get("spark.sql.shuffle.partitions")
    sized = stream_merge_apply(
        spark, tgt, delta, str(tmp_path / "cdc_sized"), ["k"],
        delete_col="del", n_batches=2, shuffle_partitions=4,
    )
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    plain = stream_merge_apply(
        spark, tgt, delta, str(tmp_path / "cdc_plain"), ["k"],
        delete_col="del", n_batches=2,
    )
    assert sorted(map(tuple, sized.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_stream_delta_dedup_sized_partitions_restores_conf(spark, tmp_path):
    """Same two contracts for the ingest-dedup twin, plus the r12-s3
    caller-owned corpus_banded path: a provided band index must yield the
    same pairs as the internal build and must NOT be unpersisted by the
    callee."""
    from pyspark.sql import functions as F

    from scabillmatch_spark.operators.dedup import corpus_band_index
    from scabillmatch_spark.streaming.ingest import stream_delta_dedup

    rows = [(i, list(range(i % 5, i % 5 + 12))) for i in range(24)]
    sets = spark.createDataFrame(rows, "doc_id long, shingles array<long>")
    corp = sets.filter(F.col("doc_id") % 4 != 1)
    delt = sets.filter(F.col("doc_id") % 4 == 1)
    before = spark.conf.get("spark.sql.shuffle.partitions")
    own = stream_delta_dedup(
        spark, corp, delt, str(tmp_path / "ing_own"),
        num_hashes=16, num_bands=8, jaccard_threshold=50.0,
        n_batches=2, shuffle_partitions=4,
    )
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    idx = corpus_band_index(corp, num_hashes=16, num_bands=8).persist()
    idx.count()
    via_cache = stream_delta_dedup(
        spark, corp, delt, str(tmp_path / "ing_idx"),
        num_hashes=16, num_bands=8, jaccard_threshold=50.0,
        n_batches=2, corpus_banded=idx,
    )
    key = lambda df: sorted(
        (r.pk1, r.pk2, round(r.similarity, 6)) for r in df.collect()
    )
    assert key(own) == key(via_cache) and key(own)
    # callee must not have released the caller's index
    assert idx.storageLevel.useMemory or idx.storageLevel.useDisk
    idx.unpersist()


def test_snapshot_diff_ops(spark):
    from scabillmatch_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", None)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0), (2, "B", 2.0), (4, "d", 4.0), (5, None, None)],
        "k long, s string, v double",
    )
    d = {r.k: (r.s, r.v, r["__op"]) for r in snapshot_diff(old, new, ["k"]).collect()}
    assert d == {
        2: ("B", 2.0, "update"),
        3: ("c", None, "delete"),   # payload from OLD snapshot
        4: ("d", 4.0, "insert"),
        5: (None, None, "insert"),
    }  # key 1 unchanged -> absent; NULL-safe compare keeps 3's None v quiet


def test_snapshot_diff_merge_roundtrip(spark):
    # the round-trip law: merge_into(old, diff(old, new)) == new
    import random

    from scabillmatch_spark.operators.merge import merge_into, snapshot_diff

    rng = random.Random(7)
    old_rows = [(i, rng.choice("abc"), float(rng.randint(0, 5))) for i in range(40)]
    new_rows = [
        (i, rng.choice("abc"), float(rng.randint(0, 5)))
        for i in range(40) if rng.random() > 0.3
    ] + [(100 + i, "n", 1.0) for i in range(5)]
    old = spark.createDataFrame(old_rows, "k long, s string, v double")
    new = spark.createDataFrame(new_rows, "k long, s string, v double")
    diff = snapshot_diff(old, new, ["k"]).withColumn(
        "is_del", F.col("__op") == "delete"
    ).drop("__op")
    replayed = merge_into(old, diff, ["k"], delete_col="is_del")
    assert sorted(map(tuple, replayed.collect())) == sorted(
        map(tuple, new.collect())
    )


def test_snapshot_diff_single_join_plan(spark):
    from scabillmatch_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame([(1, "a")], "k long, s string")
    new = spark.createDataFrame([(1, "b")], "k long, s string")
    out = snapshot_diff(old, new, ["k"])
    logical = out._jdf.queryExecution().optimizedPlan().toString()
    join_lines = [l for l in logical.splitlines() if "Join " in l]
    assert len(join_lines) == 1 and "FullOuter" in join_lines[0], logical


def test_squash_cdc_log_last_writer_wins(spark):
    from scabillmatch_spark.operators.merge import merge_into, squash_cdc_log

    # key 2: update then delete -> delete wins; key 3: delete then
    # re-insert -> insert wins; key 4: two updates -> latest wins
    log = spark.createDataFrame(
        [
            (2, "first", 1.0, False, 1),
            (2, "gone", 0.0, True, 2),
            (3, "x", 0.0, True, 1),
            (3, "back", 33.0, False, 2),
            (4, "v1", 1.0, False, 1),
            (4, "v2", 2.0, False, 2),
        ],
        "k long, s string, v double, del boolean, seq long",
    )
    sq = squash_cdc_log(log, ["k"], "seq")
    assert {(r.k, r.s, r.del_ if hasattr(r, "del_") else r["del"]) for r in sq.collect()} == {
        (2, "gone", True), (3, "back", False), (4, "v2", False),
    }
    # and the squashed feed replays cleanly through MERGE
    tgt = spark.createDataFrame(
        [(2, "b", 20.0), (3, "c", 30.0)], "k long, s string, v double"
    )
    out = merge_into(tgt, sq.drop("seq"), ["k"], delete_col="del")
    rows = {r.k: (r.s, r.v) for r in out.collect()}
    assert rows == {3: ("back", 33.0), 4: ("v2", 2.0)}


def test_squash_cdc_log_duplicate_seq_surfaces_downstream(spark):
    # a duplicated sequence number within a key is a feed bug: rank() lets
    # BOTH tied rows survive the squash, so merge_into's unique-source
    # check fails the job instead of an arbitrary winner being applied
    # silently (the row_number() failure mode the r7 advisor flagged)
    import pytest

    from scabillmatch_spark.operators.merge import merge_into, squash_cdc_log

    log = spark.createDataFrame(
        [(1, "a", False, 5), (1, "b", False, 5), (2, "c", False, 1)],
        "k long, s string, del boolean, seq long",
    )
    sq = squash_cdc_log(log, ["k"], "seq")
    assert sq.filter("k = 1").count() == 2  # ties both survive
    tgt = spark.createDataFrame([(1, "t"), (2, "t")], "k long, s string")
    with pytest.raises(Exception, match="multiple source rows matched"):
        merge_into(tgt, sq.drop("seq"), ["k"], delete_col="del").collect()


def test_merge_into_rejects_reserved_prefix_columns(spark):
    # any __src_* input column is rejected — including __src_<x> for a
    # TARGET-only x, which an enumerated spayload-derived check would miss
    # while the arbitration branch would still misread it
    import pytest

    from scabillmatch_spark.operators.merge import merge_into

    tgt = spark.createDataFrame(
        [(1, "a", "z")], "k long, only_tgt string, __src_only_tgt string"
    )
    src = spark.createDataFrame([(1, "b")], "k long, s string")
    with pytest.raises(ValueError, match="reserved"):
        merge_into(tgt, src, ["k"])


def test_snapshot_diff_empty_compare_cols_raises(spark):
    import pytest

    from scabillmatch_spark.operators.merge import snapshot_diff

    # disjoint payloads: nothing comparable -> must refuse, not silently
    # drop matched-key divergence
    old = spark.createDataFrame([(1, "a")], "k long, p string")
    new = spark.createDataFrame([(1, 2.0)], "k long, q double")
    with pytest.raises(ValueError, match="no comparable payload"):
        snapshot_diff(old, new, ["k"])
    # explicit [] with shared payload: same refusal
    with pytest.raises(ValueError, match="no comparable payload"):
        snapshot_diff(old, old, ["k"], compare_cols=[])
    # genuinely key-only snapshots: membership diff is the complete diff
    o = spark.createDataFrame([(1,), (2,)], "k long")
    n = spark.createDataFrame([(2,), (3,)], "k long")
    got = {(r.k, r["__op"]) for r in snapshot_diff(o, n, ["k"]).collect()}
    assert got == {(1, "delete"), (3, "insert")}


def test_squash_cdc_log_plan_window_group_limit(spark):
    from scabillmatch_spark.operators.merge import squash_cdc_log

    log = spark.range(100).selectExpr(
        "id % 10 as k", "id as seq", "'p' as s"
    )
    plan = (
        squash_cdc_log(log, ["k"], "seq")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "WindowGroupLimit" in plan and "Partial" in plan, plan


def test_snapshot_diff_feeds_scd2_history(spark):
    """CDC generation composes with history build: three snapshot epochs,
    diffed pairwise into version-stamped change rows, must produce the
    SAME SCD2 history as logging the full snapshots — for keys that are
    never deleted, a diff feed (insert/update rows only) carries exactly
    the information the history needs."""
    from pyspark.sql import functions as F

    from scabillmatch_spark.operators.merge import scd2_history, snapshot_diff

    s0 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    s1 = spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, "c"), (4, "d")], "k long, v string"
    )  # 2 updated, 4 inserted
    s2 = spark.createDataFrame(
        [(1, "A"), (2, "B"), (3, "c"), (4, "D")], "k long, v string"
    )  # 1 and 4 updated

    def stamp(df, ts):
        return df.withColumn("ts", F.lit(ts))

    full_log = stamp(s0, 0).unionByName(stamp(s1, 1)).unionByName(stamp(s2, 2))
    hist_full = {
        (r.k, r.v, r.effective_from, r.effective_to, r.is_current)
        for r in scd2_history(full_log, "k", "ts", ["v"]).collect()
    }

    d01 = snapshot_diff(s0, s1, ["k"]).filter(F.col("__op") != "delete")
    d12 = snapshot_diff(s1, s2, ["k"]).filter(F.col("__op") != "delete")
    cdc_log = (
        stamp(s0, 0)
        .unionByName(stamp(d01.select("k", "v"), 1))
        .unionByName(stamp(d12.select("k", "v"), 2))
    )
    hist_cdc = {
        (r.k, r.v, r.effective_from, r.effective_to, r.is_current)
        for r in scd2_history(cdc_log, "k", "ts", ["v"]).collect()
    }
    assert hist_cdc == hist_full
    # spot-check the shape: key 1 has versions [0,2) then [2,open)
    k1 = sorted(t for t in hist_full if t[0] == 1)
    assert k1 == [(1, "A", 2, None, 1), (1, "a", 0, 2, 0)]


# ------------------------------------------ incremental agg maintenance


def test_incremental_agg_merge_golden(spark):
    from scabillmatch_spark.operators.merge import incremental_agg_merge

    state = spark.createDataFrame(
        [(1, 2, 10), (2, 1, 5)], "k long, n long, s long"
    )
    delta = spark.createDataFrame(
        [(2, 3, 7), (3, 1, 1)], "k long, n long, s long"
    )
    got = {
        r.k: (r.n, r.s)
        for r in incremental_agg_merge(state, delta, ["k"], ["n", "s"]).collect()
    }
    # untouched key carries over, shared key accumulates, new key inserts
    assert got == {1: (2, 10), 2: (4, 12), 3: (1, 1)}


def test_incremental_agg_merge_empty_sides(spark):
    from scabillmatch_spark.operators.merge import incremental_agg_merge

    state = spark.createDataFrame([(1, 2)], "k long, n long")
    empty = state.filter(F.lit(False))
    a = {r.k: r.n for r in incremental_agg_merge(state, empty, ["k"], ["n"]).collect()}
    b = {r.k: r.n for r in incremental_agg_merge(empty, state, ["k"], ["n"]).collect()}
    assert a == b == {1: 2}


@pytest.mark.parametrize("n_batches", [1, 2, 4])
def test_incremental_agg_maintenance_law(spark, n_batches):
    """Merging ANY batch split of the input equals aggregating it all at
    once — the law the materialized-view refresh pattern rests on.
    Decimal sums make it exact (no float-order exposure)."""
    from scabillmatch_spark.operators.merge import incremental_agg_merge

    rows = [(i % 7, i, float(i) / 3.0) for i in range(50)]
    df = spark.createDataFrame(rows, "k long, seq long, v double")

    def agg(d):
        return d.groupBy("k").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("v").cast("decimal(38,6)")).alias("s"),
        )

    state = None
    for b in range(n_batches):
        part = agg(df.filter(F.col("seq") % n_batches == b))
        state = part if state is None else incremental_agg_merge(
            state, part, ["k"], ["n", "s"]
        )
    got = {r.k: (r.n, r.s) for r in state.collect()}
    want = {r.k: (r.n, r.s) for r in agg(df).collect()}
    assert got == want


def test_incremental_agg_query_matches_oracle(spark):
    """Banked-row pre-validation: the unregistered
    q_orders_incremental_agg matches its DuckDB oracle (the DIRECT
    recompute) typed-exact at sf0.001 (sf0.01 out-of-band, PLANS.md
    round 12)."""
    import duckdb

    import __spark_entry__ as entrymod
    from tools_compare import compare_typed

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    df = entrymod.q_orders_incremental_agg(spark, sf)
    rows = [tuple(r) for r in df.collect()]
    assert rows
    res = compare_typed(
        df, rows, con, entrymod._orders_incremental_agg_oracle()
    )
    assert all(
        res[k] for k in ("rows_match", "schema_match", "hash_match", "type_match")
    ), res


def test_stream_agg_maintain_equals_one_shot(spark, tmp_path):
    """Keys deliberately span micro-batches (round-robin staging): the
    additive law makes batching invisible; conf restore pinned too."""
    from scabillmatch_spark.streaming.ingest import stream_agg_maintain

    rows = [(i % 3, float(i)) for i in range(30)]
    df = spark.createDataFrame(rows, "k long, v double")

    def agg_of(d):
        return d.groupBy("k").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("v").cast("decimal(38,6)")).alias("s"),
        )

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    got_df = stream_agg_maintain(
        spark, df, str(tmp_path), ["k"], agg_of, ["n", "s"],
        n_batches=3, shuffle_partitions=4,
    )
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
    got = {r.k: (r.n, r.s) for r in got_df.collect()}
    want = {r.k: (r.n, r.s) for r in agg_of(df).collect()}
    assert got == want


def test_stream_agg_maintain_query_matches_oracle(spark):
    """Banked-row pre-validation: the unregistered q_stream_agg_maintain
    matches its DuckDB oracle (the direct one-shot aggregate)
    typed-exact at sf0.001 (sf0.01 out-of-band, PLANS.md round 12)."""
    import duckdb

    import __spark_entry__ as entrymod
    from tools_compare import compare_typed

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    df = entrymod.q_stream_agg_maintain(spark, sf)
    rows = [tuple(r) for r in df.collect()]
    assert rows
    res = compare_typed(
        df, rows, con, entrymod._stream_agg_maintain_oracle()
    )
    assert all(
        res[k] for k in ("rows_match", "schema_match", "hash_match", "type_match")
    ), res
