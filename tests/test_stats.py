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
