"""LSH similarity joins on ml feature vectors.

Wraps stock ``pyspark.ml.feature.MinHashLSH`` / ``BucketedRandomProjectionLSH``
for the hashing + bucket-join plan (the same posexplode -> equi-join ->
distinct shape as CustomizedLSH.scala:227-259), then **recomputes the
distance column ourselves**: the reference's fork replaced Jaccard distance
with min-one-sided Jaccard distance

    keyDistance(x, y) = min(1 - |x∩y|/|x|, 1 - |x∩y|/|y|)

(CustomizedMinHashLSH.scala:46-58) — stock Spark only gives plain Jaccard,
so the *distance*, not the join, is what's custom (SURVEY §7 step 8).
"""

from __future__ import annotations

from pyspark.ml.feature import BucketedRandomProjectionLSH, MinHashLSH
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

import pandas as pd


@pandas_udf(DoubleType())
def _min_one_sided_jaccard_dist(a: pd.Series, b: pd.Series) -> pd.Series:
    from scabillmatch_spark.ml.kernels import _records, _to_index_values

    out = []
    for v1, v2 in zip(_records(a), _records(b)):
        s1 = set(map(int, _to_index_values(v1)[0]))
        s2 = set(map(int, _to_index_values(v2)[0]))
        if not s1 or not s2:
            out.append(1.0)
            continue
        inter = len(s1 & s2)
        out.append(min(1.0 - inter / len(s1), 1.0 - inter / len(s2)))
    return pd.Series(out, dtype="float64")


def minhash_similarity_join(
    df_a: DataFrame,
    df_b: DataFrame | None,
    id_col: str,
    features_col: str = "features",
    num_hash_tables: int = 100,
    seed: int = 12345,
    dist_threshold: float = 0.99,
    use_reference_distance: bool = True,
) -> DataFrame:
    """Approximate similarity self/AB-join -> (pk1, pk2, distCol, similarity).

    numHashTables=100, seed=12345, threshold 0.99 are the reference's
    production settings (ExtractMinHashLSH.scala:108-111, workflow2.conf).
    similarity = 100 - 100*dist (the reference's scaler,
    ExtractMinHashLSH.scala:25).
    """
    mh = (
        MinHashLSH()
        .setInputCol(features_col)
        .setOutputCol("__hashes")
        .setNumHashTables(num_hash_tables)
        .setSeed(seed)
    )
    model = mh.fit(df_a)
    other = df_b if df_b is not None else df_a
    joined = model.approxSimilarityJoin(df_a, other, 1.0, distCol="__jaccard_dist")
    pairs = joined.select(
        F.col(f"datasetA.{id_col}").alias("pk1"),
        F.col(f"datasetB.{id_col}").alias("pk2"),
        F.col(f"datasetA.{features_col}").alias("__f1"),
        F.col(f"datasetB.{features_col}").alias("__f2"),
        "__jaccard_dist",
    ).filter(F.col("pk1") < F.col("pk2"))
    dist = (
        _min_one_sided_jaccard_dist(F.col("__f1"), F.col("__f2"))
        if use_reference_distance
        else F.col("__jaccard_dist")
    )
    return (
        pairs.withColumn("dist", dist)
        .filter(F.col("dist") < dist_threshold)
        .withColumn("similarity", 100.0 - 100.0 * F.col("dist"))
        .select("pk1", "pk2", "dist", "similarity")
    )


def brp_similarity_join(
    df_a: DataFrame,
    df_b: DataFrame | None,
    id_col: str,
    features_col: str = "features",
    bucket_length: float | str = 2.0,
    num_hash_tables: int = 3,
    dist_threshold: float = 15.0,
    seed: int = 12345,
    approx_spread: bool = False,
) -> DataFrame:
    """Euclidean LSH join (BucketedRandomProjectionLSHExample.scala:106-116:
    3 tables, threshold 15). One job — no per-state-pair driver loop.

    bucket_length=2.0 (the default) is reference-exact parity
    (BucketedRandomProjectionLSHExample.scala pins setBucketLength(2.0)).
    Pass bucket_length="auto" (or None) to DENSITY-SCALE the length from
    the data instead: with a fixed length on dense i.i.d. data,
    occupied-bucket count is data-spread-bound while occupancy grows
    ∝ n, so the candidate stage goes ~n²/#buckets — measured superlinear
    in scale_check r13. The scaled form projects the join input (the
    UNION of df_a and df_b when df_b is given — a df_a-only spread would
    let B-side occupancy regrow the superlinearity this targets) onto
    one deterministic ±1 plane, takes s90 = the ceil(0.9n)-th smallest
    |projection| (an order statistic — no interpolation) and sets
    L = 2·s90 / ceil(sqrt(n/80)), so #buckets grows ~sqrt(n) per table
    and expected occupancy stays bounded (~80 rows); at 100 TB pass
    approx_spread=True — it swaps the exact order statistic's global
    sort (O(n log n) shuffle for one scalar) for a single-pass
    approxQuantile (Greenwald-Khanna, relativeError 0.01). The exact
    sort stays the default because interpolation-free order statistics
    are what the cross-engine oracle gate needs. Same lever as
    the registered native twin (q_emb_brp_euclidean_join, which
    additionally AND-composes 2 projections per table — stock
    BucketedRandomProjectionLSH cannot compose, so this wrapper scales
    L only). NULL feature rows are DROPPED from both join sides (the
    registered twin's guard): a NULL vector can never satisfy a
    distance threshold, Spark ML's LSH.fit rejects it with an opaque
    error, and left in the auto path's spread probe it would shift the
    s90 order statistic (Spark sorts NULLs first)."""
    df_a = df_a.filter(F.col(features_col).isNotNull())
    if df_b is not None:
        df_b = df_b.filter(F.col(features_col).isNotNull())
    if bucket_length is None or bucket_length == "auto":
        import hashlib
        import math

        from pyspark.ml.functions import vector_to_array

        arr = vector_to_array(F.col(features_col))
        # spread over BOTH sides of the join — L derived from df_a alone
        # lets a larger/denser df_b regrow per-bucket occupancy
        base = df_a.select(F.col(features_col))
        if df_b is not None:
            base = base.unionByName(df_b.select(F.col(features_col)))
        base = base.filter(F.col(features_col).isNotNull())
        # persist the narrow projection column across the driver
        # scalars — without it each action recomputes the full input
        # lineage (the entry twin's dfd pattern). Count FIRST: an empty
        # input must short-circuit before the dim probe (first() -> None).
        dfd_src = base.persist()
        n = dfd_src.count()
        if n == 0:
            # short-circuit: Spark ML's LSH.fit itself dies on an empty
            # frame (getNumFeatures head-of-empty-array), so return the
            # join's empty typed result instead of a crash
            dfd_src.unpersist()
            from pyspark.sql.types import DoubleType, StructField, StructType

            idt = df_a.schema[id_col].dataType
            return df_a.sparkSession.createDataFrame(
                [],
                StructType(
                    [
                        StructField("pk1", idt),
                        StructField("pk2", idt),
                        StructField("dist", DoubleType()),
                    ]
                ),
            )
        else:
            dim = int(dfd_src.select(F.size(arr).alias("k")).first()["k"])
            plane = [
                1.0
                if hashlib.md5(f"brp-twin:{i}".encode()).digest()[0] % 2 == 0
                else -1.0
                for i in range(dim)
            ]
            dot = F.aggregate(
                F.zip_with(
                    arr, F.array(*[F.lit(x) for x in plane]), lambda a, b: a * b
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            dfd = dfd_src.select(F.abs(dot).alias("d"))
            if approx_spread:
                # single-pass GK sketch — no global sort; fine whenever
                # the caller is not chasing cross-engine bit-exactness
                s90 = dfd.approxQuantile("d", [0.9], 0.01)[0]
            else:
                k = (9 * n + 9) // 10
                s90 = dfd.orderBy("d").offset(k - 1).limit(1).first()[0]
            dfd_src.unpersist()
            bb = max(1, math.ceil(math.sqrt(n / 80.0)))
            bucket_length = 2.0 * s90 / bb if s90 and s90 > 0.0 else 2.0
    brp = (
        BucketedRandomProjectionLSH()
        .setInputCol(features_col)
        .setOutputCol("__hashes")
        .setBucketLength(bucket_length)
        .setNumHashTables(num_hash_tables)
        .setSeed(seed)
    )
    model = brp.fit(df_a)
    other = df_b if df_b is not None else df_a
    joined = model.approxSimilarityJoin(df_a, other, dist_threshold, distCol="dist")
    return joined.select(
        F.col(f"datasetA.{id_col}").alias("pk1"),
        F.col(f"datasetB.{id_col}").alias("pk2"),
        "dist",
    ).filter(F.col("pk1") < F.col("pk2"))


def approx_nearest_neighbors(
    df: DataFrame,
    key_vector,
    n: int,
    id_col: str,
    features_col: str = "features",
    num_hash_tables: int = 10,
    seed: int = 12345,
) -> DataFrame:
    """M14 k-NN probe (CustomizedLSH.scala:92-170's single-probe /
    hash-distance-sorted search) via stock MinHashLSH approxNearestNeighbors."""
    mh = (
        MinHashLSH()
        .setInputCol(features_col)
        .setOutputCol("__hashes")
        .setNumHashTables(num_hash_tables)
        .setSeed(seed)
    )
    model = mh.fit(df)
    return model.approxNearestNeighbors(df, key_vector, n).select(
        id_col, F.col("distCol").alias("dist")
    )


def dimsum_column_similarities(df: DataFrame, features_col: str = "features", threshold: float = 1.0) -> DataFrame:
    """DIMSUM sampled all-pairs column cosine similarity
    (feature/Utils.scala:123-127, DIMSUM.scala:102-108) ->
    (i, j, similarity)."""
    from pyspark.mllib.linalg import Vectors as OldVectors
    from pyspark.mllib.linalg.distributed import RowMatrix

    rows = df.select(features_col).rdd.map(lambda r: OldVectors.fromML(r[0]))
    mat = RowMatrix(rows)
    sims = mat.columnSimilarities(threshold)
    return sims.entries.map(lambda e: (int(e.i), int(e.j), float(e.value))).toDF(
        ["i", "j", "similarity"]
    )
