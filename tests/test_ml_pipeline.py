"""Featurize -> block -> score pipeline on the sf0.001 documents table —
the reference's workflow 1/2 semantics through the ml layer (SURVEY §3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scabillmatch_spark.ml import cluster, featurize, lsh


@pytest.fixture(scope="module")
def docs(spark, sf_small):
    return (
        spark.read.parquet(f"{sf_small}/documents.parquet")
        .select(F.col("doc_id").cast("string").alias("primary_key"),
                F.col("text").alias("content"), "source")
    )


@pytest.fixture(scope="module")
def featured(docs):
    cfg = featurize.FeatureConfig(num_features=2**12, use_idf=True)
    out, model = featurize.extract_features(docs, cfg)
    return out.cache()


def test_featurize_schema(featured):
    assert "features" in featured.columns
    row = featured.select("features").first()
    assert row.features.size == 2**12
    assert featured.count() == 500


def test_kmeans_blocking(featured):
    labeled, cost = cluster.kmeans_labels(featured, k=10, max_iter=5)
    assert cost > 0
    counts = labeled.groupBy("prediction").count().collect()
    assert len(counts) <= 10
    # blocking must cut the pair space (SURVEY §6: >=1 order of magnitude at
    # production k; with k=10 on 500 docs expect >=2x)
    n = labeled.count()
    blocked_pairs = sum(c["count"] * (c["count"] - 1) // 2 for c in counts)
    assert blocked_pairs < n * (n - 1) // 2 / 2


def test_bisecting_kmeans_blocking(featured):
    # M9: the reference's commented-out alternative quantizer
    # (feature/Utils.scala:138) — drop-in swap for kmeans_labels as the
    # blocking key producer
    labeled = cluster.bisecting_kmeans_labels(featured, k=10, max_iter=5)
    assert labeled.count() == featured.count()
    counts = labeled.groupBy("prediction").count().collect()
    assert 2 <= len(counts) <= 10
    n = labeled.count()
    blocked_pairs = sum(c["count"] * (c["count"] - 1) // 2 for c in counts)
    assert blocked_pairs < n * (n - 1) // 2 / 2


def test_minhash_join_finds_exact_dups(spark, featured):
    # exact duplicate texts must survive LSH with reference distance ~0
    pairs = lsh.minhash_similarity_join(
        featured, None, "primary_key", num_hash_tables=10, dist_threshold=0.5
    )
    got = pairs.filter(F.col("dist") <= 0.01).count()
    assert got > 0  # the synthetic corpus plants exact dups


def test_lda_topics(featured):
    cfg = featurize.FeatureConfig(
        input_col="content", use_count_vectorizer=True, use_idf=False, vocab_size=2**10
    )
    docs_df = featured.select("primary_key", "content")
    out, _ = featurize.extract_features(docs_df, cfg)
    docs_t, topics, stats = cluster.lda_topics(out, k=5, max_iter=5)
    assert topics.count() == 5
    assert {"topic", "termIndices", "termWeights"} <= set(topics.columns)
    assert "topicDistribution" in docs_t.columns
    assert stats["logPerplexity"] > 0


def test_lsa_alignment(featured):
    proj = cluster.lsa_project(featured, "primary_key", num_concepts=5)
    assert proj.count() == featured.count()
    row = proj.first()
    assert len(row.concept_features) == 5
    # ids preserved exactly (no zipWithIndex drift)
    ids_in = {r.primary_key for r in featured.select("primary_key").collect()}
    ids_out = {r.primary_key for r in proj.select("primary_key").collect()}
    assert ids_in == ids_out


def test_dimsum(spark):
    from pyspark.ml.linalg import Vectors

    df = spark.createDataFrame(
        [(Vectors.dense([1.0, 0.0, 1.0]),), (Vectors.dense([1.0, 1.0, 0.0]),)],
        ["features"],
    )
    sims = lsh.dimsum_column_similarities(df).collect()
    by_pair = {(r.i, r.j): r.similarity for r in sims}
    assert by_pair[(0, 2)] == pytest.approx(1.0 / (2**0.5) / 1.0, rel=1e-6)

def test_bill_stopwords_dropped(spark):
    """The packaged bill-domain list (state names/demonym fragments, statute
    codes, boilerplate — feature/Utils.scala:190-198) is appended to the
    english defaults by default: state-name tokens must not reach the TF
    stage, while ordinary policy vocabulary survives."""
    from pyspark.ml.feature import StopWordsRemover

    from scabillmatch_spark.ml.stopwords import BILL_STOPWORDS

    assert len(BILL_STOPWORDS) == 104  # byte-faithful to the reference list
    df = spark.createDataFrame(
        [("1", "California Nevada whereas budget appropriation firearm"),
         ("2", "new hampshire rcw education statute")],
        "primary_key string, content string",
    )
    cfg = featurize.FeatureConfig(num_features=64, use_idf=False)
    model_stages = featurize.build_pipeline(cfg).fit(
        df.withColumn("__clean", F.lower(F.col("content")))
    ).stages
    remover = next(s for s in model_stages if isinstance(s, StopWordsRemover))
    sw = set(remover.getStopWords())
    for tok in ("california", "nevada", "whereas", "hampshire", "rcw", "new"):
        assert tok in sw
    for tok in ("budget", "appropriation", "firearm", "education", "statute"):
        assert tok not in sw
    # end-to-end: featurized vectors for pure-stopword content are empty
    out, _ = featurize.extract_features(
        spark.createDataFrame(
            [("1", "california nevada whereas new hampshire")],
            "primary_key string, content string",
        ),
        cfg,
    )
    vec = out.select("features").first()[0]
    assert vec.numNonzeros() == 0
    # opt-out restores the plain english-defaults behavior
    cfg_off = featurize.FeatureConfig(
        num_features=64, use_idf=False, use_bill_stopwords=False
    )
    out_off, _ = featurize.extract_features(
        spark.createDataFrame(
            [("1", "california nevada budget")],
            "primary_key string, content string",
        ),
        cfg_off,
    )
    assert out_off.select("features").first()[0].numNonzeros() == 3
