"""Approximate-nearest-neighbor search over embedding columns.

Tiers (north-star requirement):
- brute_force_topk: exact cosine top-k — the baseline (emb_cosine_topk query).
- hyperplane LSH buckets: __spark_entry__.q_emb_lsh_ann (oracled).
- ivf_topk (here): IVF — KMeans centroids as the coarse quantizer; queries
  probe the ``nprobe`` nearest centroid cells and score exactly within them.
  The 100 TB shape: candidate scoring is an equi-join on cell id (shuffle
  bounded by cell occupancy), centroids broadcast.
- pq_topk (here): product quantization — vectors compressed to m byte codes
  (16x smaller than float32 at m=8), queries scored against codes via an
  ADC lookup table (m adds per pair instead of a D-dim dot product), then
  an exact re-rank of the shortlist. The 100 TB shape: the code table fits
  where the raw vectors cannot, the LUT is built once per query and rides
  the broadcast, and the scan over codes is narrow integer work.
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


def _sq_dist(a, b):
    d = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
    return F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x)


def pq_index(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = 8,
    n_codes: int = 16,
    seed: int = 12345,
) -> tuple[DataFrame, list[list[list[float]]]]:
    """Product-quantization index: split D-dim vectors into ``m`` subvectors,
    fit an independent KMeans codebook of ``n_codes`` centroids per
    subspace, and encode every vector as m small integer codes.

    Returns (codes(id, __codes array<int>), codebooks[m][n_codes][D/m]).
    The m fits are tiny (subspace KMeans on D/m dims); ENCODING is a pure
    Column expression — per subspace, argmin over the n_codes centroid
    literals via array_min over (distance, code) structs — so the full-table
    encode is one codegen'd scan, no Python. At 100 TB the fits run on a
    sample and the codebooks ship as literals exactly as here."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # persisted across the m KMeans fits + the dim probe + the encode —
    # each fit is an action over base's full lineage, so without the
    # cache a caller frame with expensive upstream transforms is
    # recomputed m+2 times. Measured NEUTRAL at bench scale (17.2 vs
    # 17.5 s — the sequential per-fit orchestration dominates, PLANS.md
    # r14); kept as the lineage guard, not claimed as a perf win.
    base = (
        _with_vec(emb, vec_col)
        .select(F.col(id_col).alias("__id"), "__v")
        .persist()
    )
    dim = len(base.select("__v").first()["__v"])
    if dim % m:
        # trailing dim % m dimensions would silently drop out of the codes
        # and the ADC lookup table, weakening the recall knob with no signal
        # (re-rank stays exact, so results would still be valid — but the
        # caller asked for a different quantizer than they'd get)
        raise ValueError(f"embedding dim {dim} not divisible by m={m} subspaces")
    sub = dim // m
    codebooks: list[list[list[float]]] = []
    for s in range(m):
        sv = base.select(
            array_to_vector(F.slice("__v", s * sub + 1, sub)).alias("__mlv")
        )
        km = KMeans(k=n_codes, maxIter=10, seed=seed + s, featuresCol="__mlv")
        model = km.fit(sv)
        codebooks.append([[float(x) for x in c] for c in model.clusterCenters()])
    code_cols = []
    for s in range(m):
        subvec = F.slice("__v", s * sub + 1, sub)
        cands = F.array(
            *[
                F.struct(
                    _sq_dist(subvec, F.array(*[F.lit(x) for x in codebooks[s][j]])).alias("d"),
                    F.lit(j).alias("j"),
                )
                for j in range(n_codes)
            ]
        )
        code_cols.append(F.array_min(cands)["j"])
    codes = base.select("__id", F.array(*code_cols).alias("__codes"))
    return codes, codebooks


def pq_topk(
    emb: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    m: int = 8,
    n_codes: int = 16,
    shortlist: int = 4,
) -> DataFrame:
    """PQ ANN with asymmetric-distance (ADC) shortlisting + exact re-rank:

    1. per query, build the m x n_codes lookup table of squared distances
       from the query's subvectors to every codebook centroid — O(n_codes*D)
       ONCE per query, carried as an array column on the broadcast side;
    2. score every code row with m table lookups (integer adds — no D-dim
       math per pair) and keep the ``shortlist``*k closest;
    3. exact cosine re-rank of the shortlist -> top k.

    Recall is bounded by quantization distortion; the shortlist factor is
    the recall/cost knob (the invariant-oracle query asserts recall against
    the in-plan brute-force truth)."""
    codes, codebooks = pq_index(emb, id_col, vec_col, m, n_codes)
    base = _with_vec(emb, vec_col).select(F.col(id_col).alias("__id"), "__v")
    dim = len(codebooks[0][0]) * m
    sub = dim // m
    q = _with_vec(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("__v").alias("__q")
    )
    lut = F.array(
        *[
            F.array(
                *[
                    _sq_dist(
                        F.slice("__q", s * sub + 1, sub),
                        F.array(*[F.lit(x) for x in codebooks[s][j]]),
                    )
                    for j in range(n_codes)
                ]
            )
            for s in range(m)
        ]
    )
    q = q.select("query_id", "__q", lut.alias("__lut"))
    adist = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, s: acc
        + F.element_at(
            F.element_at("__lut", (s + 1).cast("int")),
            (F.element_at("__codes", (s + 1).cast("int")) + 1).cast("int"),
        ),
    )
    cand = (
        codes.join(F.broadcast(q), F.col("__id") != F.col("query_id"))
        .select("query_id", "__q", F.col("__id").alias("neighbor_id"), adist.alias("__ad"))
    )
    ws = W.partitionBy("query_id").orderBy(F.asc("__ad"), F.asc("neighbor_id"))
    short = (
        cand.withColumn("__sr", F.row_number().over(ws))
        .filter(F.col("__sr") <= shortlist * k)
        .select("query_id", "__q", "neighbor_id")
    )
    exact = short.join(
        base.select(F.col("__id").alias("neighbor_id"), "__v"), "neighbor_id"
    ).select(
        "query_id",
        "neighbor_id",
        SIM.cosine_similarity(F.col("__q"), F.col("__v")).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return exact.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


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
