"""Similarity kernels vs independent numpy references (SURVEY §5 item 2),
including the edge cases the reference's formulas are sensitive to."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.ml.linalg import Vectors
from pyspark.sql import functions as F

from scabillmatch_spark.ml import kernels

DIM = 50


def _rand_sparse(rng, nnz):
    idx = np.sort(rng.choice(DIM, size=nnz, replace=False))
    vals = rng.uniform(0.1, 5.0, size=nnz)
    return Vectors.sparse(DIM, idx.tolist(), vals.tolist())


def _np_cosine(v1, v2):
    a, b = v1.toArray(), v2.toArray()
    n1, n2 = np.linalg.norm(a), np.linalg.norm(b)
    if n1 == 0 or n2 == 0:
        return 0.0
    return 100.0 * abs(float(a @ b)) / (n1 * n2)


def _np_manhattan(v1, v2):
    return 100.0 / (1.0 + float(np.abs(v1.toArray() - v2.toArray()).sum()))


def _np_jaccard(v1, v2):
    s1, s2 = set(v1.indices), set(v2.indices)
    u = len(s1 | s2)
    return 100.0 * len(s1 & s2) / u if u else 0.0


def _np_overlap(v1, v2):
    s1, s2 = set(v1.indices), set(v2.indices)
    m = min(len(s1), len(s2))
    return 100.0 * len(s1 & s2) / m if m else 0.0


def _np_densejaccard(v1, v2):
    a, b = v1.toArray(), v2.toArray()
    s = int(np.sum(a != b))
    return 100.0 * (len(a) - s) / len(a)


CASES = [
    ("cosine", _np_cosine),
    ("manhattan", _np_manhattan),
    ("jaccard", _np_jaccard),
    ("maxasymjaccard", _np_overlap),
    ("densejaccard", _np_densejaccard),
]


@pytest.fixture(scope="module")
def vector_pairs(spark):
    rng = np.random.default_rng(42)
    pairs = []
    for _ in range(30):
        pairs.append((_rand_sparse(rng, int(rng.integers(1, 20))),
                      _rand_sparse(rng, int(rng.integers(1, 20)))))
    # edge cases: identical, disjoint, lopsided sizes (weighted_jaccard skew
    # branch, SimilarityMeasure.scala:125)
    v = _rand_sparse(rng, 10)
    pairs.append((v, v))
    pairs.append((Vectors.sparse(DIM, [0, 1], [1.0, 1.0]), Vectors.sparse(DIM, [40, 41], [1.0, 1.0])))
    pairs.append((Vectors.sparse(DIM, [0], [1.0]), _rand_sparse(rng, 40)))
    df = spark.createDataFrame([(a, b) for a, b in pairs], ["v1", "v2"])
    return pairs, df


@pytest.mark.parametrize("name,ref", CASES, ids=[c[0] for c in CASES])
def test_kernel_matches_numpy(vector_pairs, name, ref):
    pairs, df = vector_pairs
    got = df.select(kernels.vector_similarity(name)(F.col("v1"), F.col("v2")).alias("s")).collect()
    want = [ref(a, b) for a, b in pairs]
    for g, w in zip(got, want):
        assert g.s == pytest.approx(w, rel=1e-9), name


def test_weighted_jaccard_branches(vector_pairs):
    pairs, df = vector_pairs
    got = df.select(
        kernels.vector_similarity("weighted_jaccard")(F.col("v1"), F.col("v2")).alias("s")
    ).collect()
    for (a, b), g in zip(pairs, got):
        s1, s2 = set(a.indices), set(b.indices)
        ratio = max(len(s1), len(s2)) / min(len(s1), len(s2))
        if ratio <= 5.0:
            assert g.s == pytest.approx(_np_jaccard(a, b), rel=1e-9)
        else:
            assert 0.0 <= g.s <= 100.0
            assert g.s >= _np_jaccard(a, b)  # regularization boosts the skewed case


def test_weighted_jaccard_column_expr_matches_kernel(vector_pairs, spark):
    """Column-expr tier (functions/similarity.weighted_jaccard over index
    sets as array<long>) agrees with the kernel tier on both branches,
    including the skew-regularized one."""
    from scabillmatch_spark.functions.similarity import weighted_jaccard

    pairs, df = vector_pairs
    want = df.select(
        kernels.vector_similarity("weighted_jaccard")(F.col("v1"), F.col("v2")).alias("s")
    ).collect()
    rows = [(sorted(map(int, a.indices)), sorted(map(int, b.indices)))
            for a, b in pairs]
    sdf = spark.createDataFrame(rows, "a array<long>, b array<long>")
    got = sdf.select(weighted_jaccard(F.col("a"), F.col("b")).alias("s")).collect()
    for g, w in zip(got, want):
        assert g.s == pytest.approx(w.s, rel=1e-9)


def test_dense_jaccard_column_expr(vector_pairs, spark):
    """Column-expr tier (functions/similarity.dense_jaccard100 over
    array<double>) agrees with the kernel tier and numpy."""
    from scabillmatch_spark.functions.similarity import dense_jaccard100

    pairs, _ = vector_pairs
    rows = [(list(map(float, a.toArray())), list(map(float, b.toArray())))
            for a, b in pairs]
    df = spark.createDataFrame(rows, "a array<double>, b array<double>")
    got = df.select(dense_jaccard100(F.col("a"), F.col("b")).alias("s")).collect()
    want = [_np_densejaccard(a, b) for a, b in pairs]
    for g, w in zip(got, want):
        assert g.s == pytest.approx(w, rel=1e-9)


def test_minhash_collision_probability(spark):
    """P(minhash collision) ≈ Jaccard — the LSH property the blocking relies on."""
    from scabillmatch_spark.functions import text as TX

    rng = np.random.default_rng(7)
    rows = []
    for _ in range(200):
        a = set(map(int, rng.choice(1000, size=30, replace=False)))
        overlap = int(rng.integers(0, 30))
        b = set(list(a)[:overlap]) | set(map(int, rng.choice(range(1000, 2000), size=30 - overlap, replace=False)))
        rows.append(([int(x) for x in sorted(a)], [int(x) for x in sorted(b)],
                     len(a & b) / len(a | b)))
    df = spark.createDataFrame(rows, ["a", "b", "jacc"])
    nh = 32
    sig = df.select(
        "jacc",
        TX.minhash_signature(F.col("a").cast("array<long>"), nh).alias("sa"),
        TX.minhash_signature(F.col("b").cast("array<long>"), nh).alias("sb"),
    )
    est = sig.select(
        "jacc",
        (F.size(F.filter(F.zip_with("sa", "sb", lambda x, y: x == y), lambda v: v)) / nh).alias("est"),
    ).collect()
    errs = [abs(r.jacc - r.est) for r in est]
    assert np.mean(errs) < 0.12  # 32 hashes -> stderr ~ sqrt(j(1-j)/32) <= 0.09