from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scabillmatch_spark.operators import stats


@pytest.fixture(scope="module")
def scored(spark):
    rows = [("a", "b", 10.0), ("a", "c", 20.0), ("b", "c", 30.0), ("b", "d", 95.0)]
    return spark.createDataFrame(rows, ["pk1", "pk2", "similarity"])


def test_describe(scored):
    r = stats.describe(scored, "similarity").first()
    assert r["count"] == 4 and r["min"] == 10.0 and r["max"] == 95.0
    assert r["mean"] == pytest.approx(38.75)


def test_histogram(scored):
    buckets = {r.bucket: r.n for r in stats.histogram(scored, "similarity", 50.0).collect()}
    assert buckets == {0: 3, 1: 1}


def test_pearson_corr(spark):
    df = spark.createDataFrame([(float(i), 2.0 * i + 1) for i in range(50)], ["x", "y"])
    assert stats.pearson_corr(df, "x", "y") == pytest.approx(1.0)


def test_cross_measure_join(spark, scored):
    other = scored.withColumn("similarity", F.col("similarity") * 0.5)
    joined = stats.cross_measure_join(scored, other)
    assert joined.count() == 4
    r = joined.filter("pk1 = 'b' and pk2 = 'd'").first()
    assert (r.similarity_a, r.similarity_b) == (95.0, 47.5)


def test_pair_space_accounting(spark):
    df = spark.createDataFrame([(0,), (0,), (0,), (1,), (1,)], ["prediction"])
    per = {r.prediction: r.npermutations for r in stats.pair_space_accounting(df, "prediction").collect()}
    assert per == {0: 3.0, 1: 1.0}

def test_sequential_funnel_strict_after_semantics(spark):
    from datetime import datetime

    from scabillmatch_spark.operators.stats import sequential_funnel

    T = datetime
    rows = [
        # user 1: full ordered funnel
        (1, T(2024, 1, 1, 0), "view"), (1, T(2024, 1, 1, 1), "click"),
        (1, T(2024, 1, 1, 2), "purchase"),
        # user 2: purchase BEFORE click -> funnel stops at click
        (2, T(2024, 1, 1, 0), "view"), (2, T(2024, 1, 1, 2), "click"),
        (2, T(2024, 1, 1, 1), "purchase"),
        # user 3: click simultaneous with view -> strict > rejects it
        (3, T(2024, 1, 1, 0), "view"), (3, T(2024, 1, 1, 0), "click"),
        # user 4: never viewed -> no stage reached
        (4, T(2024, 1, 1, 0), "click"), (4, T(2024, 1, 1, 1), "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    out = {
        r["user_id"]: r
        for r in sequential_funnel(ev, ["view", "click", "purchase"]).collect()
    }
    assert out[1]["t_purchase"] is not None
    assert out[2]["t_click"] is not None and out[2]["t_purchase"] is None
    assert out[3]["t_view"] is not None and out[3]["t_click"] is None
    assert out[4]["t_view"] is None and out[4]["t_purchase"] is None


# --------------------------------------------------- MAD outlier census


def _py_mad(rows, k=3.0):
    import statistics

    from helpers import half_up_round

    def r6(x):
        # NOT round(): engines round half-up; round() banker-rounds and
        # diverges on .5 ties at digit 6 (see tests/helpers.py docstring)
        return half_up_round(x, 6)

    by = {}
    for key, v in rows:
        by.setdefault(key, []).append(float(v))
    out = {}
    for key, vs in by.items():
        med = r6(statistics.median(vs))  # interpolated == percentile(0.5)
        devs = [r6(abs(v - med)) for v in vs]
        mad = r6(statistics.median(devs))
        cut = r6(k * mad)
        out[key] = (
            len(vs), med, mad, cut,
            sum(1 for d in devs if d > cut), max(devs),
        )
    return out


def test_mad_outliers_matches_python(spark):
    rows = [
        ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 2.5), ("a", 100.0),
        ("b", 5.0), ("b", 5.0), ("b", 5.0),  # zero MAD: all-equal group
        ("c", 7.25),  # singleton
    ]
    df = spark.createDataFrame(rows, "k string, value double")
    got = {
        r.k: (r.n, r.median, r.mad, r.cutoff, r.n_outliers, r.max_dev)
        for r in stats.mad_outliers(df, "k", "value").collect()
    }
    assert got == _py_mad(rows)
    # the wild value is the a-group's single outlier; zero-MAD group
    # flags every deviation > 0
    assert got["a"][4] == 1 and got["b"][4] == 0 and got["c"][4] == 0


def test_mad_outliers_half_up_tie_golden(spark):
    """Pin the r12-session-3 hypothesis find: median = 0.9765625 exactly
    (a dyadic rational) is a .5 tie at digit 6 — Spark F.round and DuckDB
    ROUND go half-up to 0.976563 while Python's round() banker-rounds to
    0.976562. The mirror must match the ENGINES. Kept as a plain golden
    so the regression doesn't depend on hypothesis re-finding it."""
    rows = [("a", 0.0), ("a", 0.0), ("a", 2.0), ("a", 1.953125)]
    df = spark.createDataFrame(rows, "k string, value double")
    r = stats.mad_outliers(df, "k", "value").collect()[0]
    assert (r.median, r.mad, r.cutoff, r.max_dev) == (
        0.976563, 0.976563, 2.929689, 1.023437
    )
    got = {"a": (r.n, r.median, r.mad, r.cutoff, r.n_outliers, r.max_dev)}
    assert got == _py_mad(rows)


from hypothesis import given, settings, strategies as st  # noqa: E402

_vals = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(st.sampled_from("ab"), _vals), min_size=1, max_size=30))
def test_mad_outliers_property_matches_python(spark, rows):
    df = spark.createDataFrame(
        [(k, float(v)) for k, v in rows], "k string, value double"
    )
    got = {
        r.k: (r.n, r.median, r.mad, r.cutoff, r.n_outliers, r.max_dev)
        for r in stats.mad_outliers(df, "k", "value").collect()
    }
    assert got == _py_mad(rows)


# --------------------------------------------------------- Zipf OLS fit


def _py_zipf(freqs_by_group):
    import math

    out = {}
    for g, tf in freqs_by_group.items():
        ranked = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))
        xs = [math.log(float(i + 1)) for i in range(len(ranked))]
        ys = [math.log(float(f)) for _, f in ranked]
        n = float(len(xs))
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        sxy = sum(x * y for x, y in zip(xs, ys))
        syy = sum(y * y for y in ys)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        from helpers import half_up_round

        out[g] = (
            len(ranked), sum(tf.values()),
            half_up_round(slope, 6),
            half_up_round((sy - slope * sx) / n, 6),
            half_up_round(
                (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
                6,
            ),
        )
    return out


def test_zipf_fit_matches_python(spark):
    # exact power law freq = 840 / rank (840 divisible by 1..8) ->
    # slope exactly -1, r2 = 1
    freqs = {"s": {f"t{i:02d}": 840 // (i + 1) for i in range(8)}}
    rows = [(g, t, f) for g, tf in freqs.items() for t, f in tf.items()]
    df = spark.createDataFrame(rows, "source string, term string, freq long")
    got = {
        r.source: (r.vocab_size, r.total_tokens, r.slope, r.intercept, r.r2)
        for r in stats.zipf_fit(df, "source").collect()
    }
    assert got == _py_zipf(freqs)
    assert got["s"][2] == pytest.approx(-1.0) and got["s"][4] == pytest.approx(1.0)


def test_zipf_fit_tie_ranks_are_term_stable(spark):
    # equal frequencies: rank order must come from the term tiebreak,
    # identically in the Python mirror
    freqs = {"s": {"bb": 4, "aa": 4, "cc": 2, "dd": 2}}
    rows = [(g, t, f) for g, tf in freqs.items() for t, f in tf.items()]
    df = spark.createDataFrame(rows, "source string, term string, freq long")
    got = {
        r.source: (r.vocab_size, r.total_tokens, r.slope, r.intercept, r.r2)
        for r in stats.zipf_fit(df, "source").collect()
    }
    assert got == _py_zipf(freqs)


# ------------------------------------------- r17 oracle pre-validations

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def _gate_compare(spark, qfn, oracle_sql):
    import duckdb

    from tools_compare import compare_typed

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    df = qfn(spark, sf)
    rows = [tuple(r) for r in df.collect()]
    assert rows
    res = compare_typed(df, rows, con, oracle_sql)
    assert all(
        res[k] for k in ("rows_match", "schema_match", "hash_match", "type_match")
    ), res


def test_mad_outliers_query_matches_oracle(spark):
    """r17 pre-validation: the unregistered q_events_mad_outliers matches
    its DuckDB oracle typed-exact at sf0.001 (sf0.01 out-of-band,
    PLANS.md round 12)."""
    import __spark_entry__ as entrymod

    _gate_compare(
        spark, entrymod.q_events_mad_outliers, entrymod._events_mad_outliers_oracle()
    )


def test_zipf_query_matches_oracle(spark):
    """r17 pre-validation #2: the unregistered q_doc_zipf_fit matches
    its DuckDB oracle typed-exact at sf0.001 (sf0.01 out-of-band,
    PLANS.md round 12)."""
    import __spark_entry__ as entrymod

    _gate_compare(spark, entrymod.q_doc_zipf_fit, entrymod._doc_zipf_fit_oracle())


# ----------------------------------------------- time-RANGE window frame


def _py_trailing(rows, window_s=3600):
    """rows: (eid, user, value, seconds). Mirror of the trailing RANGE
    frame incl. the peer rule: the frame is bounded by the ORDER VALUE,
    so rows sharing a timestamp see each other regardless of order."""
    from decimal import Decimal

    by_user = {}
    for eid, u, v, s in rows:
        by_user.setdefault(u, []).append((s, eid, v))
    out = {}
    for u, evs in by_user.items():
        for s, eid, v in evs:
            frame = [
                (s2, e2, v2)
                for s2, e2, v2 in evs
                if s - window_s <= s2 <= s
            ]
            total = sum(
                (Decimal(str(v2)).quantize(Decimal("0.000001")) for _, _, v2 in frame),
                Decimal(0),
            )
            out[eid] = (len(frame), float(total))
    return out


def _trail_df(spark, rows):
    import datetime

    data = [
        (
            eid,
            u,
            v,
            datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s),
        )
        for eid, u, v, s in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, user_id long, value double, ts timestamp"
    )


def _run_trailing(spark, df):
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("user_id")
        .orderBy(F.asc("us"))
        .rangeBetween(-3600 * 1_000_000, 0)
    )
    return (
        df.select("user_id", "event_id", "value", F.unix_micros("ts").alias("us"))
        .select(
            "event_id",
            F.count(F.lit(1)).over(w).cast("long").alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)"))
            .over(w)
            .cast("double")
            .alias("s"),
        )
    )


def test_trailing_range_frame_boundary_and_peers(spark):
    rows = [
        (0, 1, 1.0, 0),
        (1, 1, 2.0, 3600),   # exactly -3600s from eid 0 -> INCLUDES it
        (2, 1, 4.0, 3601),   # eid 0 now out of range
        (3, 1, 8.0, 3601),   # PEER of eid 2: same order value, sees it
        (4, 2, 16.0, 0),     # other user: frames never cross users
    ]
    got = {r.event_id: (r.n, r.s) for r in _run_trailing(spark, _trail_df(spark, rows)).collect()}
    assert got == _py_trailing(rows)
    assert got[0] == (1, 1.0)
    assert got[1] == (2, 3.0)        # boundary inclusive
    assert got[2] == (3, 14.0)       # peers: eid 3 visible despite later pos
    assert got[3] == (3, 14.0)       # identical frame for the peer
    assert got[4] == (1, 16.0)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(1, 2),                       # user
            st.floats(0, 100, allow_nan=False).map(lambda x: round(x, 2)),
            st.integers(0, 7200),                    # seconds (dups allowed)
        ),
        min_size=1,
        max_size=20,
    )
)
def test_trailing_range_frame_property_matches_python(spark, evs):
    rows = [(i, u, v, s) for i, (u, v, s) in enumerate(evs)]
    got = {r.event_id: (r.n, r.s) for r in _run_trailing(spark, _trail_df(spark, rows)).collect()}
    assert got == _py_trailing(rows)


def test_trailing_window_query_matches_oracle(spark):
    """Banked-row pre-validation: the unregistered
    q_events_trailing_window matches its DuckDB oracle typed-exact at
    sf0.001 (sf0.01 out-of-band, PLANS.md round 12)."""
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
    df = entrymod.q_events_trailing_window(spark, sf)
    rows = [tuple(r) for r in df.collect()]
    assert rows
    res = compare_typed(
        df, rows, con, entrymod._events_trailing_window_oracle()
    )
    assert all(
        res[k] for k in ("rows_match", "schema_match", "hash_match", "type_match")
    ), res
