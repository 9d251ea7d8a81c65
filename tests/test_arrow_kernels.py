from __future__ import annotations

import math

import pytest

from scabillmatch_spark.operators.arrow_kernels import grouped_allpairs_scores

SCHEMA = "g int, vid long, v array<float>"


def test_grouped_allpairs_exact_scores(spark):
    # group 1: orthogonal + parallel pairs; group 2: singleton (no pairs)
    df = spark.createDataFrame(
        [
            (1, 10, [1.0, 0.0]),
            (1, 11, [0.0, 1.0]),
            (1, 12, [2.0, 0.0]),
            (2, 20, [1.0, 1.0]),
        ],
        SCHEMA,
    )
    rows = {
        (r.g, r.id1, r.id2): (r.dot, r.n1, r.n2)
        for r in grouped_allpairs_scores(df, "g", "vid", "v").collect()
    }
    s = 1 << 20  # floor-scale factor
    assert set(rows) == {(1, 10, 11), (1, 10, 12), (1, 11, 12)}
    assert rows[(1, 10, 11)] == (0, s * s, s * s)  # orthogonal
    assert rows[(1, 10, 12)] == (2 * s * s, s * s, 4 * s * s)  # parallel
    # exact cosine reconstruction from the integer cells
    dot, n1, n2 = rows[(1, 10, 12)]
    assert dot / (math.sqrt(n1) * math.sqrt(n2)) == pytest.approx(1.0)


def test_grouped_allpairs_id_canonicalization_and_threshold(spark):
    # ids deliberately out of order within the group; one near-parallel and
    # one anti-parallel pair — min_cosine keeps only the parallel one
    df = spark.createDataFrame(
        [
            (7, 99, [1.0, 0.0]),
            (7, 5, [1.0, 0.1]),
            (7, 50, [-1.0, 0.0]),
        ],
        SCHEMA,
    )
    out = grouped_allpairs_scores(
        df, "g", "vid", "v", min_cosine=0.9
    ).collect()
    assert [(r.id1, r.id2) for r in out] == [(5, 99)]
    r = out[0]
    assert r.id1 < r.id2 and r.dot > 0


def test_grouped_allpairs_rejects_oversized_group(spark):
    df = spark.createDataFrame(
        [(1, i, [1.0, 0.0]) for i in range(5)], SCHEMA
    )
    with pytest.raises(Exception, match="max_group_size|PythonException"):
        grouped_allpairs_scores(
            df, "g", "vid", "v", max_group_size=3
        ).collect()


def test_grouped_allpairs_rejects_ragged_vectors(spark):
    df = spark.createDataFrame(
        [(1, 1, [1.0, 0.0]), (1, 2, [1.0, 0.0, 5.0])], SCHEMA
    )
    with pytest.raises(Exception, match="ragged|PythonException"):
        grouped_allpairs_scores(df, "g", "vid", "v").collect()
