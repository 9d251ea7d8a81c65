from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scabillmatch_spark.operators import ann


@pytest.fixture(scope="module")
def emb(spark, sf_small):
    return spark.read.parquet(f"{sf_small}/embeddings.parquet").select(
        "vec_id", "embedding"
    ).cache()


def test_ivf_recall_vs_brute_force(spark, emb):
    queries = emb.filter(F.col("vec_id") < 10)
    brute = ann.brute_force_topk(emb, queries, "vec_id", "embedding", 5)
    ivf = ann.ivf_topk(emb, queries, "vec_id", "embedding", k=5, n_cells=8, nprobe=4)
    b = {(r.query_id, r.neighbor_id) for r in brute.collect()}
    v = {(r.query_id, r.neighbor_id) for r in ivf.collect()}
    recall = len(b & v) / len(b)
    # nprobe=4 of 8 cells: expect to recover most true neighbors
    assert recall >= 0.5, f"IVF recall {recall}"
    assert len(v) == 50  # k per query


def test_brp_lsh_join_finds_close_pairs(spark):
    """M7 BucketedRandomProjectionLSH wrapper (ml.lsh.brp_similarity_join):
    results must be a subset of the exact Euclidean-threshold pairs (the
    join verifies true distance) with recall >= 0.9 on clustered data
    (BucketedRandomProjectionLSHExample.scala:106-116 semantics)."""
    from pyspark.ml.linalg import Vectors

    from scabillmatch_spark.ml.lsh import brp_similarity_join

    # two tight clusters far apart: intra-cluster dists ~0.2, inter ~10
    rows = []
    for i in range(8):
        rows.append((i, Vectors.dense([0.0 + 0.1 * i, 0.0])))
    for i in range(8):
        rows.append((100 + i, Vectors.dense([10.0 + 0.1 * i, 10.0])))
    df = spark.createDataFrame(rows, ["pk", "features"])
    got = {
        (r.pk1, r.pk2)
        for r in brp_similarity_join(
            df, None, "pk", dist_threshold=0.5, bucket_length=2.0, num_hash_tables=6
        ).collect()
    }
    import itertools

    exact = set()
    for (i1, v1), (i2, v2) in itertools.combinations(rows, 2):
        d = float((v1 - v2).norm(2))
        # approxSimilarityJoin keeps dist < threshold (strict)
        if d < 0.5 and i1 < i2:
            exact.add((i1, i2))
    assert got <= exact  # exact-verified join -> no false positives
    assert len(got) / len(exact) >= 0.9, f"BRP recall {len(got)}/{len(exact)}"
    # never pairs across the two distant clusters
    assert not any(p1 < 100 <= p2 for p1, p2 in got)


def test_ivf_probes_fewer_candidates(spark, emb):
    queries = emb.filter(F.col("vec_id") < 3)
    assigned, _ = ann.ivf_index(emb, "vec_id", "embedding", n_cells=8)
    cells = assigned.groupBy("cell").count().collect()
    assert len(cells) == 8
    total = sum(c["count"] for c in cells)
    assert total == emb.count()

def test_brp_query_empty_and_null_guards(spark):
    """r14 self-review pins: the density-scaled BRP scalar path must not
    offset(-1) on an empty corpus (empty typed frame instead) and must
    FILTER NULL vectors in both engines (Spark window-sorts NULLs FIRST
    vs DuckDB LAST — an unfiltered NULL could shift the s90 order
    statistic differently per engine, or TypeError the s90 compare)."""
    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    empty = spark.createDataFrame([], "vec_id long, v array<double>")
    out = entrymod.q_emb_brp_euclidean_join(spark, sf, emb=empty)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["pk1", "pk2", "dist"]

    base = entrymod._t(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    with_null = base.union(
        spark.createDataFrame([(999_999, None)], "vec_id long, v array<double>")
    )
    got = sorted(
        map(tuple, entrymod.q_emb_brp_euclidean_join(spark, sf, emb=with_null).collect())
    )
    want = sorted(
        map(tuple, entrymod.q_emb_brp_euclidean_join(spark, sf, emb=base).collect())
    )
    assert got == want  # the NULL row must change nothing


def test_kmeans_fit_driver_deterministic_and_sane():
    """The r15 sample-cap lever's fit is pure numpy: bit-identical across
    calls for the same (sample, seed), correct centroid count, and
    k > n degrades to n distinct centroids instead of raising."""
    import numpy as np

    rng = np.random.default_rng(7)
    X = np.concatenate([rng.normal(0, 0.1, (50, 4)), rng.normal(5, 0.1, (50, 4))])
    a = ann._kmeans_fit_driver(X, 2, iters=10, seed=42)
    b = ann._kmeans_fit_driver(X, 2, iters=10, seed=42)
    assert a == b
    assert len(a) == 2
    # the two planted clusters are recovered (centroid near 0 and near 5)
    means = sorted(sum(c) / len(c) for c in a)
    assert abs(means[0]) < 1.0 and abs(means[1] - 5.0) < 1.0
    small = ann._kmeans_fit_driver(X[:3], 8, iters=5, seed=1)
    assert len(small) == 3


def test_md5_rank_sample_deterministic(spark, emb):
    """Sample selection is a pure function of ids — invariant to
    partitioning and row order (the property that makes the fit
    reproducible on any cluster layout)."""
    s1 = {r.vec_id for r in ann._md5_rank_sample(emb, "vec_id", 20).collect()}
    s2 = {
        r.vec_id
        for r in ann._md5_rank_sample(
            emb.repartition(7, "vec_id"), "vec_id", 20
        ).collect()
    }
    assert s1 == s2 and len(s1) == 20


def test_pq_sampled_fit_recall_and_k(spark, emb):
    """fit_sample (the default) must hold the registered invariants:
    k rows per query and recall@10 >= 0.6 vs brute force."""
    queries = emb.filter(F.col("vec_id") < 10)
    k = 10
    pq = ann.pq_topk(emb, queries, "vec_id", "embedding", k=k, shortlist=8)
    rows = pq.collect()
    per_q = {}
    for r in rows:
        per_q[r.query_id] = per_q.get(r.query_id, 0) + 1
    assert set(per_q.values()) == {k}
    truth = {
        (r.query_id, r.neighbor_id)
        for r in ann.brute_force_topk(emb, queries, "vec_id", "embedding", k).collect()
    }
    got = {(r.query_id, r.neighbor_id) for r in rows}
    assert len(got & truth) / len(truth) >= 0.6


def test_ivf_spark_fit_path_still_works(spark, emb):
    """fit_sample=None keeps the reference-style full-corpus Spark KMeans
    fit; both paths must produce full-coverage assignments."""
    assigned, cents = ann.ivf_index(emb, "vec_id", "embedding", n_cells=4, fit_sample=None)
    assert assigned.count() == emb.count()
    assert cents.count() == 4


def test_brp_wrapper_auto_and_guards(spark):
    """r14 ADVICE closes: the public wrapper defaults to the
    reference-parity bucket_length=2.0; 'auto' opts into density scaling;
    the auto path survives an empty df_a and NULL feature rows (both
    previously raised at the dim probe / shifted the s90 order
    statistic); approx_spread swaps the global sort for approxQuantile."""
    from pyspark.ml.linalg import Vectors

    from scabillmatch_spark.ml.lsh import brp_similarity_join

    import inspect

    assert inspect.signature(brp_similarity_join).parameters["bucket_length"].default == 2.0

    rows = [(i, Vectors.dense([float(i), float(i)])) for i in range(20)]
    df = spark.createDataFrame(rows, ["id", "features"])
    for kw in (
        {"bucket_length": "auto"},
        {"bucket_length": "auto", "approx_spread": True},
    ):
        out = brp_similarity_join(df, None, "id", dist_threshold=2.0, **kw)
        got = out.collect()
        assert len(got) > 0
        assert all(abs(r.pk1 - r.pk2) <= 1 for r in got)  # dist-verified join

    empty = spark.createDataFrame([], df.schema)
    assert (
        brp_similarity_join(empty, None, "id", bucket_length="auto").count() == 0
    )

    # a NULL feature row must change nothing: the wrapper drops NULL
    # features from both join sides (r15 — a NULL can never match, and
    # unfiltered it would shift the auto path's s90 spread statistic).
    # The NULL row is passed IN here, not pre-filtered — the wrapper owns
    # the guard.
    with_null = df.union(spark.createDataFrame([(999, None)], df.schema))
    a = {(r.pk1, r.pk2) for r in brp_similarity_join(df, None, "id", bucket_length="auto", dist_threshold=2.0).collect()}
    b = {(r.pk1, r.pk2) for r in brp_similarity_join(with_null, None, "id", bucket_length="auto", dist_threshold=2.0).collect()}
    assert a == b


def test_ivf_zero_vector_tolerated(spark):
    """A zero-norm vector must not crash the sampled fit (excluded from
    the fit sample — its unit vector is undefined and the division
    raises under ANSI) and must still receive a cell assignment."""
    rows = [(i, [float(i % 7 + 1), float(i % 3)]) for i in range(30)]
    rows.append((99, [0.0, 0.0]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assigned, cents = ann.ivf_index(df, "vec_id", "embedding", n_cells=4)
    got = {r["__id"]: r["cell"] for r in assigned.collect()}
    assert len(got) == 31
    assert got[99] == 0  # documented: |v| = 0 lands in cell 0


def test_kmeans_driver_distinct_empty_reseeds():
    """Simultaneously-empty clusters must reseed to DISTINCT points —
    a shared argmax would collapse them into duplicate centroids."""
    import numpy as np

    # 3 distinct points, k=3: any empty-cluster reseed path must still
    # end with 3 distinct centroids
    X = np.array([[0.0], [10.0], [20.0]] * 5)
    C = ann._kmeans_fit_driver(X, 3, iters=10, seed=5)
    assert len({tuple(c) for c in C}) == 3
