"""SURVEY §5 item 3: LSH-blocked results ⊆ brute-force results at the same
threshold, with recall above a bound; plus the applyInPandas group-local
pair operator agreeing with the join form."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scabillmatch_spark.functions import similarity as SIM
from scabillmatch_spark.functions import text as TX
from scabillmatch_spark.operators import blocking, dedup


@pytest.fixture(scope="module")
def doc_sets(spark, sf_small):
    return (
        spark.read.parquet(f"{sf_small}/documents.parquet")
        .select(
            F.col("doc_id").alias("id"),
            F.lit(1).alias("grp"),
            TX.ngram_id_set("text", 3).alias("s"),
        )
        .cache()
    )


@pytest.fixture(scope="module")
def brute_pairs(doc_sets):
    cands = blocking.candidate_pairs(
        doc_sets, id_col="id", group_col=None, block_col="grp", same_group=True
    )
    scored = cands.select(
        F.col("pk1"), F.col("pk2"), SIM.jaccard(F.col("s1"), F.col("s2")).alias("sim")
    ).filter(F.col("sim") >= 70.0)
    return {(r.pk1, r.pk2) for r in scored.collect()}


def test_lsh_subset_and_recall(spark, sf_small, brute_pairs):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    lsh_pairs = {
        (r.pk1, r.pk2)
        for r in dedup.minhash_dedup_pairs(
            docs, "doc_id", "text", shingle_n=3, num_hashes=16, num_bands=4
        ).collect()
    }
    assert lsh_pairs <= brute_pairs  # exact rescoring kills false positives
    recall = len(lsh_pairs) / max(len(brute_pairs), 1)
    # 4 bands x 4 rows: P(candidate | j=0.7) = 1-(1-0.7^4)^4 ~ 0.67; the
    # population skews to j~1.0 (planted dups) where recall -> 1
    assert recall >= 0.6, f"recall {recall} over {len(brute_pairs)} true pairs"


def test_apply_in_pandas_matches_join_form(doc_sets, brute_pairs):
    got = {
        (r.pk1, r.pk2)
        for r in blocking.within_group_pairs_pandas(
            doc_sets, "grp", "id", "s", threshold=70.0
        ).collect()
    }
    assert got == brute_pairs

def test_delta_dedup_matches_self_join_restriction(spark):
    """Delta-vs-corpus dedup must find exactly the self-join dedup's pairs
    that cross the delta/corpus boundary (same banding, same threshold)."""
    from pyspark.sql import functions as F

    from scabillmatch_spark.functions import text as TX
    from scabillmatch_spark.operators import dedup

    rows = []
    for i in range(30):
        base = f"w{i} x{i} y{i} z{i} common tail piece"
        rows.append((i, base))
        if i < 5:  # near-dup twins landing on both sides of the split
            rows.append((100 + i, base + " extra"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sets = df.select(
        "doc_id", TX.ngram_id_set("text", 2).alias("shingles")
    )
    delta = sets.filter(F.col("doc_id") >= 100)
    base_ = sets.filter(F.col("doc_id") < 100)
    inc = {
        (r["pk1"], r["pk2"])
        for r in dedup.minhash_dedup_delta(
            base_, delta, "doc_id", "shingles",
            num_hashes=16, num_bands=8, jaccard_threshold=50.0,
        ).collect()
    }
    full = dedup.minhash_dedup_pairs(
        df, "doc_id", "text", shingle_n=2, num_hashes=16, num_bands=8,
        jaccard_threshold=50.0,
    ).collect()
    crossing = {
        (max(r["pk1"], r["pk2"]), min(r["pk1"], r["pk2"]))
        for r in full
        if (r["pk1"] >= 100) != (r["pk2"] >= 100)
    }
    assert inc == crossing and len(inc) >= 3


def test_blocked_edit_distance_join_semantics(spark):
    from scabillmatch_spark.operators.blocking import blocked_edit_distance_join

    rows = [
        (1, "en", "the quick brown fox"),
        (2, "en", "the quick brown fax"),   # 1 edit from doc 1
        (3, "en", "the quick brown foxes jumped"),  # within 25 edits of 1
        (4, "en", "a completely different title"),  # different prefix block
        (5, "fr", "the quick brown fox"),   # same text, other lang block
        (6, "en", "the quick brown fox"),   # exact dup of 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, title string")
    out = blocked_edit_distance_join(
        df, "doc_id", "title", max_distance=9, block_cols=["lang"],
        prefix_len=8,
    )
    got = {(r.pk1, r.pk2): r.distance for r in out.collect()}
    # exact expectations, computed independently
    assert got[(1, 2)] == 1
    assert got[(1, 6)] == 0
    assert got[(2, 6)] == 1
    assert (1, 4) not in got          # prefix block separates
    assert all(p[0] != 5 and p[1] != 5 for p in got)  # lang block separates
    assert all(d <= 9 and d >= 0 for d in got.values())


def test_blocked_edit_distance_join_no_cartesian_single_shuffle(spark):
    from scabillmatch_spark.operators.blocking import blocked_edit_distance_join

    df = spark.range(200).selectExpr(
        "id as doc_id", "'en' as lang",
        "concat('title ', cast(id % 17 as string), ' tail') as title",
    )
    out = blocked_edit_distance_join(
        df, "doc_id", "title", max_distance=5, block_cols=["lang"],
        prefix_len=8,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    out.count()  # executes


def test_two_sided_precomputed_band_index_equals_fresh(spark):
    """r10 band-index-table fast path: passing a prebuilt
    lsh_banded_projection as right_banded must yield exactly the fresh
    result, and a malformed index fails loud."""
    import pytest
    from pyspark.sql import functions as F

    from scabillmatch_spark.operators import blocking
    from scabillmatch_spark.operators.dedup import corpus_band_index

    rows = [(i, list(range(i, i + 12))) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, shingles array<long>")
    left = df.filter(F.col("doc_id") % 3 == 0)
    right = df.filter(F.col("doc_id") % 3 != 0)
    kw = dict(num_hashes=16, num_bands=8, min_jaccard=50.0)
    fresh = blocking.lsh_candidate_pairs_two_sided(
        left, right, "doc_id", "shingles", **kw
    )
    idx = corpus_band_index(right, "doc_id", "shingles", num_hashes=16, num_bands=8)
    via_index = blocking.lsh_candidate_pairs_two_sided(
        left.selectExpr("doc_id AS __id", "shingles AS __set"),
        right.selectExpr("doc_id AS __id", "shingles AS __set"),
        "__id", "__set", num_hashes=16, num_bands=8, min_jaccard=50.0,
        right_banded=idx,
    )
    a = {(r.pk1, r.pk2) for r in fresh.collect()}
    b = {(r.pk1, r.pk2) for r in via_index.collect()}
    assert a == b and a  # equal and non-trivial
    with pytest.raises(ValueError, match="__sz_r"):
        blocking.lsh_candidate_pairs_two_sided(
            left, right, "doc_id", "shingles", **kw,
            right_banded=idx.drop("__sz_r"),
        )


def test_superset_band_slice_equals_subset_banding(spark):
    """The shared shingle-band cache's load-bearing identity (r12 s3):
    banding is a pure per-doc function of the set, so the FULL corpus's
    band projection filtered by an id predicate must be row-identical to
    banding the subset directly — and a self-join fed the sliced
    projection must produce exactly the pairs the fresh build produces.
    If lsh_banded_projection ever grows cross-row state (e.g. a
    corpus-derived hash seed), this fails at registration, not in the
    driver gate."""
    from pyspark.sql import functions as F

    from scabillmatch_spark.operators import blocking

    rows = [(i, list(range(i % 7, i % 7 + 10 + i % 3))) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, shingles array<long>")
    sub = df.filter(F.col("doc_id") % 10 != 7)
    kw = dict(num_hashes=16, num_bands=8, with_size=True, tag="r")
    full_sliced = blocking.lsh_banded_projection(
        df, "doc_id", "shingles", **kw
    ).filter(F.col("__id_r") % 10 != 7)
    direct = blocking.lsh_banded_projection(sub, "doc_id", "shingles", **kw)
    a = {tuple(r) for r in full_sliced.collect()}
    b = {tuple(r) for r in direct.collect()}
    assert a == b and a

    renamed = full_sliced.select(
        F.col("__id_r").alias("__id"),
        F.col("__sz_r").alias("__sz"),
        F.col("__band_r").alias("__band"),
    )
    via_cache = blocking.lsh_candidate_pairs(
        sub.selectExpr("doc_id AS __id", "shingles AS __set"),
        "__id", "__set", num_hashes=16, num_bands=8, min_jaccard=50.0,
        banded=renamed,
    )
    fresh = blocking.lsh_candidate_pairs(
        sub.selectExpr("doc_id AS __id", "shingles AS __set"),
        "__id", "__set", num_hashes=16, num_bands=8, min_jaccard=50.0,
    )
    pa = {(r.pk1, r.pk2) for r in via_cache.collect()}
    pb = {(r.pk1, r.pk2) for r in fresh.collect()}
    assert pa == pb and pa

    import pytest

    with pytest.raises(ValueError, match="__sz"):
        blocking.lsh_candidate_pairs(
            sub.selectExpr("doc_id AS __id", "shingles AS __set"),
            "__id", "__set", num_hashes=16, num_bands=8, min_jaccard=50.0,
            banded=renamed.drop("__sz"),
        )
