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


def _md5_rank_sample(df: DataFrame, id_col: str, n: int) -> DataFrame:
    """Deterministic bounded sample: the ``n`` rows with the smallest
    md5(id) rank (the doc_hash_sample primitive, operators/curation.py).
    orderBy+limit plans as TakeOrdered — per-partition top-n then a
    driver merge, NOT a global sort shuffle — so the cost is one narrow
    scan at any corpus size and the selected set is independent of
    partitioning, row order, and scale-out."""
    key = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    return df.orderBy(key.asc(), F.col(id_col).asc()).limit(n)


def _kmeans_fit_driver(
    X, k: int, iters: int = 10, seed: int = 0, n_init: int = 4
) -> list[list[float]]:
    """Deterministic Lloyd's k-means on a driver-side numpy sample.

    Greedy k-means++ init from a seeded PCG64 generator (bit-reproducible
    across runs/platforms for a given sample), empty clusters reseeded to
    the point farthest from its assigned centroid. This replaces the
    per-query Spark KMeans fits that dominated the PQ/IVF constant
    (~17 s of sequential fit orchestration at sf0.1, r14 scale_check):
    codebooks/coarse quantizers are statistical summaries — a bounded
    deterministic sample gives the same recall while the fit drops to
    numpy microseconds, and the full-corpus encode/assignment stays an
    exact one-pass Column expression."""
    import numpy as np

    X = np.asarray(X, dtype=np.float64)
    n = X.shape[0]
    if n == 0:
        raise ValueError("k-means fit sample is empty")
    k = min(k, n)

    def one_fit(s: int):
        rng = np.random.default_rng(s)
        cents = [X[int(rng.integers(n))]]
        d2 = ((X - cents[0]) ** 2).sum(axis=1)
        for _ in range(1, k):
            tot = float(d2.sum())
            if tot > 0.0:
                i = int(rng.choice(n, p=d2 / tot))
            else:  # all remaining points coincide with a centroid
                i = int(rng.integers(n))
            cents.append(X[i])
            d2 = np.minimum(d2, ((X - cents[-1]) ** 2).sum(axis=1))
        C = np.stack(cents)
        for _ in range(iters):
            D = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=-1)
            assign = D.argmin(axis=1)
            newC = C.copy()
            # empty clusters reseed to DISTINCT farthest points — a shared
            # argmax would give simultaneously-empty clusters the same
            # centroid forever, silently shrinking effective k
            far_order = iter(np.argsort(-D[np.arange(n), assign]))
            for j in range(k):
                pts = X[assign == j]
                if len(pts):
                    newC[j] = pts.mean(axis=0)
                else:
                    newC[j] = X[int(next(far_order))]
            if np.array_equal(newC, C):
                break
            C = newC
        inertia = float(((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=-1).min(axis=1).sum())
        return inertia, C

    # n_init seeded restarts, keep the lowest inertia — closes most of
    # the quality gap to Spark's kmeans|| init at numpy-restart cost
    # (measured r15: IVF recall 0.51 -> parity with the Spark fit)
    best = min((one_fit(seed + 1000003 * r) for r in range(n_init)), key=lambda t: t[0])
    return [[float(x) for x in c] for c in best[1]]


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
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int = 16,
    seed: int = 12345,
    fit_sample: int | None = 4096,
) -> tuple[DataFrame, DataFrame]:
    """Build the IVF coarse quantizer: returns (assignments(id, cell, vec),
    centroids(cell, centroid)). Centroids fit on L2-normalized vectors
    (spherical quantizer): for cosine ANN, Euclidean distance on the unit
    sphere is monotone in cosine, so cell boundaries respect the metric
    queries are ranked by — materially better recall at the same nprobe.

    fit_sample (default 4096) fits the quantizer with deterministic
    driver-side Lloyd's on an md5-rank bounded sample and assigns cells
    with a pure Column argmin over the centroid literals — one codegen'd
    scan, zero Spark ML fits (the r14-measured ~17 s per-query fit
    constant). A coarse quantizer is a k-point summary of the density;
    past a few thousand i.i.d. rows more sample moves centroids by noise,
    so the sample cap loses no recall while making fit cost independent
    of corpus size. fit_sample=None keeps the full-corpus Spark KMeans
    fit (reference-style path)."""
    norm = SIM.l2_norm(F.col("__v"))
    unit = F.transform(F.col("__v"), lambda x: x / norm)
    if fit_sample is not None:
        base = _with_vec(emb, vec_col).select(
            F.col(id_col).alias("__id"), "__v", unit.alias("__u")
        )
        # zero-norm vectors are excluded from the FIT sample (their unit
        # vector is undefined and the __u division would raise under
        # Spark 4 ANSI); they still get assigned below — _argmin_cell_unit
        # never materializes a unit vector, so |v| = 0 rows land in cell 0
        sample = [
            r["__u"]
            for r in _md5_rank_sample(
                base.filter(F.col("__v").isNotNull() & (norm > 0)),
                "__id",
                fit_sample,
            ).select("__u").collect()
        ]
        cents = _kmeans_fit_driver(sample, n_cells, iters=10, seed=seed)
        # spherical assignment in dot-product form — see _argmin_cell_unit
        # for why neither the per-centroid struct expansion nor a
        # normalized __u column survives contact with Catalyst here
        assigned = base.select(
            "__id", _argmin_cell_unit(F.col("__v"), cents).alias("cell"), "__v"
        )
        centroids = emb.sparkSession.createDataFrame(
            [(i, c) for i, c in enumerate(cents)], ["cell", "centroid"]
        )
        return assigned, centroids
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

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


def _nested_lit(rows: list[list[float]]):
    """One literal array<array<double>> for a centroid/codebook table."""
    return F.array(*[F.array(*[F.lit(float(x)) for x in r]) for r in rows])


def _argmin_cell(vec, cents: list[list[float]]):
    """Index of the closest centroid to ``vec`` (squared Euclidean),
    ties to the lowest index. Structured as one transform over a single
    packed literal so the distance lambda occurs ONCE in the plan —
    n inlined per-centroid struct expressions blow the codegen budget
    (plan size O(n·D), janino compile seconds per query, measured r15)."""
    packed = F.array(
        *[
            F.struct(
                F.array(*[F.lit(float(x)) for x in c]).alias("c"),
                F.lit(j).alias("j"),
            )
            for j, c in enumerate(cents)
        ]
    )
    scored = F.transform(
        packed, lambda e: F.struct(_sq_dist(vec, e["c"]).alias("d"), e["j"].alias("j"))
    )
    return F.array_min(scored)["j"]


def _argmin_cell_unit(vec, cents: list[list[float]]):
    """Closest centroid to vec/|vec| (spherical quantizer) WITHOUT
    materializing the unit vector: argmin_j |v/|v| − c_j|² =
    argmin_j (|v|·|c_j|² − 2·v·c_j) after multiplying through by
    |v| > 0 and dropping the per-row constant |v/|v||² = 1. A
    normalized array column referenced inside the scoring lambda
    re-evaluates PER CENTROID ELEMENT (the O(D²)-inside-HOF house
    rule) — measured 14 s over 2000 rows; this form keeps the lambda
    at O(D) with the |c_j|² precomputed into the literal. |v| = 0
    rows land in cell 0 (the unit vector is undefined there anyway)."""
    packed = F.array(
        *[
            F.struct(
                F.lit(float(sum(x * x for x in c))).alias("sn"),
                F.array(*[F.lit(float(x)) for x in c]).alias("c"),
                F.lit(j).alias("j"),
            )
            for j, c in enumerate(cents)
        ]
    )
    nrm = SIM.l2_norm(vec)
    scored = F.transform(
        packed,
        lambda e: F.struct(
            (
                nrm * e["sn"]
                - 2.0
                * F.aggregate(
                    F.zip_with(vec, e["c"], lambda a, b: a * b),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ).alias("d"),
            e["j"].alias("j"),
        ),
    )
    return F.array_min(scored)["j"]


def pq_index(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = 8,
    n_codes: int = 16,
    seed: int = 12345,
    fit_sample: int | None = 4096,
) -> tuple[DataFrame, list[list[list[float]]]]:
    """Product-quantization index: split D-dim vectors into ``m`` subvectors,
    fit an independent KMeans codebook of ``n_codes`` centroids per
    subspace, and encode every vector as m small integer codes.

    Returns (codes(id, __codes array<int>), codebooks[m][n_codes][D/m]).
    ENCODING is a pure Column expression — per subspace, argmin over the
    n_codes centroid literals via array_min over (distance, code)
    structs — so the full-table encode is one codegen'd scan, no Python.

    fit_sample (default 4096) fits all m codebooks with deterministic
    driver-side Lloyd's on ONE md5-rank bounded sample (collected once,
    sliced per subspace in numpy) — this removes the m sequential Spark
    KMeans fits that were ~100% of the r14-measured 17 s PQ constant,
    and with it the base-frame persist those fits needed. Codebooks are
    density summaries: a bounded sample gives the same quantization
    quality at any corpus size (the 100 TB shape). fit_sample=None keeps
    the full-corpus Spark KMeans fits (reference-style path)."""
    base = _with_vec(emb, vec_col).select(F.col(id_col).alias("__id"), "__v")
    if fit_sample is not None:
        import numpy as np

        sample = np.asarray(
            [
                r["__v"]
                for r in _md5_rank_sample(
                    base.filter(F.col("__v").isNotNull()), "__id", fit_sample
                ).select("__v").collect()
            ],
            dtype=np.float64,
        )
        if sample.size == 0:
            raise ValueError("pq_index: no non-null vectors to fit on")
        dim = sample.shape[1]
        if dim % m:
            raise ValueError(
                f"embedding dim {dim} not divisible by m={m} subspaces"
            )
        sub = dim // m
        codebooks = [
            _kmeans_fit_driver(
                sample[:, s * sub : (s + 1) * sub], n_codes, iters=10, seed=seed + s
            )
            for s in range(m)
        ]
    else:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        # persisted across the m KMeans fits + the dim probe + the encode —
        # each fit is an action over base's full lineage, so without the
        # cache a caller frame with expensive upstream transforms is
        # recomputed m+2 times. Measured NEUTRAL at bench scale (17.2 vs
        # 17.5 s — the sequential per-fit orchestration dominates, PLANS.md
        # r14); kept as the lineage guard, not claimed as a perf win.
        base = base.persist()
        dim = len(base.select("__v").first()["__v"])
        if dim % m:
            # trailing dim % m dimensions would silently drop out of the
            # codes and the ADC lookup table, weakening the recall knob with
            # no signal (re-rank stays exact, so results would still be
            # valid — but the caller asked for a different quantizer)
            base.unpersist()
            raise ValueError(
                f"embedding dim {dim} not divisible by m={m} subspaces"
            )
        sub = dim // m
        codebooks = []
        for s in range(m):
            sv = base.select(
                array_to_vector(F.slice("__v", s * sub + 1, sub)).alias("__mlv")
            )
            km = KMeans(k=n_codes, maxIter=10, seed=seed + s, featuresCol="__mlv")
            model = km.fit(sv)
            codebooks.append([[float(x) for x in c] for c in model.clusterCenters()])
        # release the fit-time cache before returning: the caller's single
        # action over `codes` recomputes base's lineage once (exactly the
        # uncached cost), and repeated pq_topk calls no longer accumulate
        # cache entries for the session lifetime (r14 ADVICE)
        base.unpersist(blocking=False)
    # one zip_with lambda per subspace (see _argmin_cell) — the previous
    # m × n_codes inlined struct expressions made the encode plan O(m·n·D)
    code_cols = [
        _argmin_cell(F.slice("__v", s * sub + 1, sub), codebooks[s])
        for s in range(m)
    ]
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
    fit_sample: int | None = 4096,
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
    codes, codebooks = pq_index(emb, id_col, vec_col, m, n_codes, fit_sample=fit_sample)
    base = _with_vec(emb, vec_col).select(F.col(id_col).alias("__id"), "__v")
    dim = len(codebooks[0][0]) * m
    sub = dim // m
    q = _with_vec(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("__v").alias("__q")
    )
    # LUT via transform over one codebook literal per subspace — the
    # distance lambda occurs m times in the plan, not m × n_codes.
    # NB: the lambda must stay UNARY — a second Python parameter (even
    # defaulted, e.g. `lambda c, _s=s:`) makes PySpark pass the element
    # INDEX as that argument (binary-transform form), silently corrupting
    # a captured loop variable.
    def _sub_lut(s: int):
        return F.transform(
            _nested_lit(codebooks[s]),
            lambda c: _sq_dist(F.slice("__q", s * sub + 1, sub), c),
        )

    lut = F.array(*[_sub_lut(s) for s in range(m)])
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
    fit_sample: int | None = 4096,
) -> DataFrame:
    """IVF ANN: probe the ``nprobe`` closest cells per query, exact cosine
    within. Work ~ (nprobe / n_cells) of brute force; recall grows with
    nprobe."""
    assigned, centroids = ivf_index(emb, id_col, vec_col, n_cells, fit_sample=fit_sample)
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
