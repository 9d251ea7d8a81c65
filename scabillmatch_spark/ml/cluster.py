"""Clustering operators: KMeans blocking labels, LDA topics, LSA/SVD.

- kmeans_labels: the reference's blocking strategy (feature/Utils.scala:129-149)
  — fit KMeans on the feature vectors, attach ``prediction`` as the candidate
  join key (optimizationLevel 1). WSSSE logged like the reference.
- lda_topics: LDAAnalyzer.scala:85-116 — topics + per-doc topicDistribution.
- lsa_project: truncated SVD (feature/Utils.scala:151-163). The reference
  split meta from vectors and re-joined by zipWithIndex order — a correctness
  landmine (SURVEY §7). Here the id column rides through an IndexedRowMatrix
  so alignment is explicit.
"""

from __future__ import annotations

from pyspark.ml.clustering import LDA, BisectingKMeans, KMeans
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kmeans_labels(
    df: DataFrame,
    features_col: str = "features",
    k: int = 40,
    max_iter: int = 40,
    seed: int = 12345,
    prediction_col: str = "prediction",
) -> tuple[DataFrame, float]:
    """Attach k-means cluster labels; returns (df+prediction, training cost).

    The label is the equi-join blocking key for candidate_pairs (J1 level 1);
    training cost is the WSSSE analog the reference logs for tuning
    (docs/tuning_kmeans.md)."""
    km = (
        KMeans()
        .setK(k)
        .setMaxIter(max_iter)
        .setSeed(seed)
        .setFeaturesCol(features_col)
        .setPredictionCol(prediction_col)
    )
    model = km.fit(df)
    return model.transform(df), float(model.summary.trainingCost)


def bisecting_kmeans_labels(
    df: DataFrame,
    features_col: str = "features",
    k: int = 40,
    max_iter: int = 20,
    seed: int = 12345,
    prediction_col: str = "prediction",
) -> DataFrame:
    """M9 BisectingKMeans — the reference's commented-out alternative blocking
    (feature/Utils.scala:138)."""
    bkm = (
        BisectingKMeans()
        .setK(k)
        .setMaxIter(max_iter)
        .setSeed(seed)
        .setFeaturesCol(features_col)
        .setPredictionCol(prediction_col)
    )
    return bkm.fit(df).transform(df)


def lda_topics(
    df: DataFrame,
    features_col: str = "features",
    k: int = 10,
    max_iter: int = 20,
    seed: int = 12345,
    describe_n: int = 10,
) -> tuple[DataFrame, DataFrame, dict[str, float]]:
    """LDA fit: returns (doc topicDistribution df, topics df, fit stats).

    Topics df: (topic, termIndices, termWeights) — LDAAnalyzer.scala:101,116;
    stats: logLikelihood/logPerplexity — LDAAnalyzer.scala:92-95."""
    lda = (
        LDA()
        .setK(k)
        .setMaxIter(max_iter)
        .setSeed(seed)
        .setFeaturesCol(features_col)
    )
    model = lda.fit(df)
    stats = {
        "logLikelihood": float(model.logLikelihood(df)),
        "logPerplexity": float(model.logPerplexity(df)),
    }
    docs = model.transform(df)
    topics = model.describeTopics(describe_n)
    return docs, topics, stats


def lsa_project(
    df: DataFrame,
    id_col: str,
    features_col: str = "features",
    num_concepts: int = 50,
) -> DataFrame:
    """Truncated-SVD projection -> (id, concept_features array<double>).

    Row alignment kept explicit via IndexedRowMatrix (vs the reference's
    zipWithIndex re-join, ExtractCandidates.scala:114-133)."""
    from pyspark.mllib.linalg import Vectors as OldVectors
    from pyspark.mllib.linalg.distributed import IndexedRow, IndexedRowMatrix

    # stable numeric index per row, carried through the matrix
    indexed = df.select(id_col, features_col).withColumn(
        "__idx", F.monotonically_increasing_id()
    )
    id_map = indexed.select("__idx", id_col)
    rows = indexed.rdd.map(
        lambda r: IndexedRow(r["__idx"], OldVectors.fromML(r[features_col]))
    )
    mat = IndexedRowMatrix(rows)
    svd = mat.computeSVD(num_concepts, computeU=True)
    # U * S = per-document concept coordinates
    s = svd.s.toArray()
    proj = svd.U.rows.map(
        lambda row: (row.index, [float(v * sv) for v, sv in zip(row.vector.toArray(), s)])
    ).toDF(["__idx", "concept_features"])
    return proj.join(id_map, "__idx").select(id_col, "concept_features")
