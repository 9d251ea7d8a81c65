"""Approximate-nearest-neighbor search over embedding columns.

Three tiers (north-star requirement):
- brute_force_topk: exact cosine top-k — the baseline (emb_cosine_topk query).
- hyperplane LSH buckets: __spark_entry__.q_emb_lsh_ann (oracled).
- ivf_topk (here): IVF — KMeans centroids as the coarse quantizer; queries
  probe the ``nprobe`` nearest centroid cells and score exactly within them.
  The 100 TB shape: candidate scoring is an equi-join on cell id (shuffle
  bounded by cell occupancy), centroids broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from scabillmatch_spark.functions import similarity as SIM


def _with_vec(df: DataFrame, vec_col: str) -> DataFrame:
    return df.withColumn("__v", F.col(vec_col).cast("array<double>"))


def brute_force_topk(
    emb: DataFrame, queries: DataFrame, id_col: str, vec_col: str, k: int
) -> DataFrame:
    """Exact cosine top-k per query (queries broadcast, one scan)."""
    e = _with_vec(emb, vec_col).select(F.col(id_col).alias("neighbor_id"), "__v")
    q = _with_vec(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("__v").alias("__q")
    )
    scored = e.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        SIM.cosine_similarity(F.col("__q"), F.col("__v")).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def ivf_index(
    emb: DataFrame, id_col: str, vec_col: str, n_cells: int = 16, seed: int = 12345
) -> tuple[DataFrame, DataFrame]:
    """Build the IVF coarse quantizer: returns (assignments(id, cell, vec),
    centroids(cell, centroid)). Centroids fit with ml KMeans on L2-normalized
    vectors (spherical quantizer): for cosine ANN, Euclidean distance on the
    unit sphere is monotone in cosine, so cell boundaries respect the metric
    queries are ranked by — materially better recall at the same nprobe."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    norm = SIM.l2_norm(F.col("__v"))
    unit = F.transform(F.col("__v"), lambda x: x / norm)
    base = _with_vec(emb, vec_col).select(
        F.col(id_col).alias("__id"), "__v", array_to_vector(unit).alias("__mlv")
    )
    km = KMeans(k=n_cells, maxIter=10, seed=seed, featuresCol="__mlv", predictionCol="cell")
    model = km.fit(base)
    assigned = model.transform(base).select("__id", "cell", "__v")
    centroids = base.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        ["cell", "centroid"],
    )
    return assigned, centroids


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF ANN: probe the ``nprobe`` closest cells per query, exact cosine
    within. Work ~ (nprobe / n_cells) of brute force; recall grows with
    nprobe."""
    assigned, centroids = ivf_index(emb, id_col, vec_col, n_cells)
    q = _with_vec(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("__v").alias("__q")
    )
    # rank cells per query by centroid similarity (centroids tiny -> broadcast)
    qc = q.crossJoin(F.broadcast(centroids)).select(
        "query_id",
        "__q",
        "cell",
        SIM.cosine_similarity(F.col("__q"), F.col("centroid")).alias("__cs"),
    )
    wc = W.partitionBy("query_id").orderBy(F.desc("__cs"), F.asc("cell"))
    probed = qc.withColumn("__cr", F.row_number().over(wc)).filter(
        F.col("__cr") <= nprobe
    ).select("query_id", "__q", "cell")
    # equi-join on cell: candidates limited to probed cells
    cands = probed.join(assigned, "cell").filter(F.col("__id") != F.col("query_id"))
    scored = cands.select(
        "query_id",
        F.col("__id").alias("neighbor_id"),
        SIM.cosine_similarity(F.col("__q"), F.col("__v")).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
