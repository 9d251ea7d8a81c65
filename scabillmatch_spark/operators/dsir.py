"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
public: arXiv:2302.03169). The standard pretraining-data targeting move:
score every raw document by how much more likely its hashed n-gram bag is
under a TARGET corpus distribution than under the RAW corpus distribution,
then resample proportionally to the importance weight.

    features(x) = counts over hash-bucketed uni+bigrams (B buckets)
    log w(x)    = sum_b c_x[b] * (ln p_hat[b] - ln q_hat[b])
    p_hat[b]    = (t_b + k) / (T + k B)      (target, add-k smoothed)
    q_hat[b]    = (r_b + k) / (R + k B)      (raw)
    select      = top-n by log w + Gumbel noise (importance resampling)

Everything is exact-integer until the final log-ratio table: gram
bucketing reuses the house md5->int60 primitive (DuckDB mirror
``('0x' || substr(md5(g),1,15))::UBIGINT::BIGINT % B``), bucket counts are
two hash aggregations (each bounded by B after the map-side combine), and
the B-row log-ratio table broadcasts onto each document's bucket counts —
one narrow join + one doc-key aggregation scores the whole corpus. The
Gumbel noise is md5-derived (the weighted_sample A-ES precedent: no
rand(), replayable, engine-exact uniforms), so the "sample" is a
deterministic, oracle-able set.

Scale shape at 100 TB: B is fixed (8-10k in the paper), so the model and
ratio tables are broadcast-sized FOREVER regardless of corpus size; the
per-doc work is a narrow explode bounded by document length, and the only
wide operations are the (id, bucket) count and the doc-key score — both
shuffle integers only.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scabillmatch_spark.functions.text import ngrams, tokens


def _bucket(col: Column, n_buckets: int) -> Column:
    """md5-derived stable bucket id in [0, n_buckets) — the house 60-bit
    md5 integer (engine-exact both sides) mod B."""
    h = F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
    return (h % F.lit(n_buckets)).alias("bucket")


def _doc_grams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, gram): unigrams + bigrams per document, duplicates kept
    (DSIR features are counts, not sets)."""
    toks = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("__t"))
    grams = F.concat(F.col("__t"), ngrams(F.col("__t"), 2))
    return toks.select(id_col, F.explode(grams).alias("gram"))


def hashed_ngram_counts(
    docs: DataFrame,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document hashed-n-gram features -> (id_col, bucket, cnt)."""
    return (
        _doc_grams(docs, id_col, text_col)
        .select(id_col, _bucket(F.col("gram"), n_buckets))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bucket_totals(
    docs: DataFrame,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level bucket counts -> (bucket, total); <= B rows."""
    return (
        _doc_grams(docs, id_col, text_col)
        .select(_bucket(F.col("gram"), n_buckets))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("total"))
    )


def _ratios_from_counts(
    spark,
    t: DataFrame,
    r: DataFrame,
    n_buckets: int,
    add_k: float,
) -> DataFrame:
    """(bucket, log_ratio) from per-bucket count frames t=(bucket, t_b)
    and r=(bucket, r_b). Buckets unseen in both corpora still get a row
    via a full bucket spine (their ratio is ln(k/(T+kB)) - ln(k/(R+kB)),
    which add-k makes finite) so the scoring join never drops a
    feature."""
    t_tot = t.agg(F.sum("t_b")).first()[0] or 0
    r_tot = r.agg(F.sum("r_b")).first()[0] or 0
    if not t_tot or not r_tot:
        raise ValueError("dsir_log_ratios: empty target or raw gram stream")
    spine = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    kb = float(add_k) * float(n_buckets)
    return (
        spine.join(t, "bucket", "left")
        .join(r, "bucket", "left")
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce("t_b", F.lit(0)).cast("double") + F.lit(float(add_k)))
                    / F.lit(float(t_tot) + kb)
                )
                - F.log(
                    (F.coalesce("r_b", F.lit(0)).cast("double") + F.lit(float(add_k)))
                    / F.lit(float(r_tot) + kb)
                )
            ).alias("log_ratio"),
        )
    )


def dsir_log_ratios(
    target: DataFrame,
    raw: DataFrame,
    n_buckets: int = 1024,
    add_k: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The B-row model: (bucket, log_ratio) with
    log_ratio = ln p_hat - ln q_hat over add-k smoothed bucket
    distributions, target and raw as SEPARATE frames (the general
    cross-corpus form). When the target is a predicate over the raw
    corpus itself, prefer :func:`dsir_log_ratios_cond` — it computes
    both distributions in one pass over the gram stream."""
    t = bucket_totals(target, n_buckets, id_col, text_col).withColumnRenamed(
        "total", "t_b"
    )
    r = bucket_totals(raw, n_buckets, id_col, text_col).withColumnRenamed(
        "total", "r_b"
    )
    return _ratios_from_counts(target.sparkSession, t, r, n_buckets, add_k)


def dsir_log_ratios_cond(
    raw: DataFrame,
    target_cond: Column,
    n_buckets: int = 1024,
    add_k: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Log-ratio model for the in-corpus-target case (target = the rows
    of ``raw`` satisfying ``target_cond``): the target flag is evaluated
    BEFORE the gram explode and rides it as a boolean, so ONE pass over
    the gram stream feeds one per-bucket aggregation producing BOTH
    distributions (count + conditional count). The grand totals come
    from an unpartitioned window over the <= B count rows — no second
    gram pass and no driver-side action, so the whole model is one job
    when consumed. Empty target/raw fail in-plan via assert_true (this
    path has no driver scalar to check eagerly)."""
    from pyspark.sql import Window as W

    toks = raw.select(
        target_cond.cast("boolean").alias("__is_t"),
        tokens(F.col(text_col)).alias("__t"),
    )
    grams = F.concat(F.col("__t"), ngrams(F.col("__t"), 2))
    counts = (
        toks.select("__is_t", F.explode(grams).alias("gram"))
        .select("__is_t", _bucket(F.col("gram"), n_buckets))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("r_b"),
            F.count_if(F.col("__is_t")).alias("t_b"),
        )
    )
    w = W.partitionBy()
    kb = float(add_k) * float(n_buckets)
    spine = raw.sparkSession.range(n_buckets).select(F.col("id").alias("bucket"))
    joined = spine.join(counts, "bucket", "left")
    # totals via the unpartitioned window AFTER the spine join (spine
    # rows carry NULL counts, which sum() skips); assert_true rides the
    # kept expression so column pruning can't drop it — it returns NULL
    # on success, so coalesce passes the real value through
    tt = F.sum("t_b").over(w).cast("double")
    rt = F.sum("r_b").over(w).cast("double")
    guard = F.assert_true(
        (tt > 0) & (rt > 0),
        F.lit("dsir_log_ratios_cond: empty target or raw gram stream"),
    )
    log_ratio = F.log(
        (F.coalesce("t_b", F.lit(0)).cast("double") + F.lit(float(add_k)))
        / (tt + F.lit(kb))
    ) - F.log(
        (F.coalesce("r_b", F.lit(0)).cast("double") + F.lit(float(add_k)))
        / (rt + F.lit(kb))
    )
    return joined.select(
        "bucket",
        F.coalesce(guard.cast("double"), log_ratio).alias("log_ratio"),
    )


def dsir_scores(
    docs: DataFrame,
    log_ratios: DataFrame,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document importance -> (id_col, n_grams, log_w, avg_log_w).
    Documents with zero grams are omitted (no features, weight
    undefined). ``avg_log_w`` (per-gram normalization) is the usual
    length-debiased ranking key."""
    feats = hashed_ngram_counts(docs, n_buckets, id_col, text_col)
    joined = feats.join(F.broadcast(log_ratios), "bucket").select(
        id_col,
        "cnt",
        (F.col("cnt").cast("double") * F.col("log_ratio")).alias("w"),
    )
    return joined.groupBy(id_col).agg(
        F.sum("cnt").cast("long").alias("n_grams"),
        F.sum("w").alias("log_w"),
        (F.sum("w") / F.sum("cnt").cast("double")).alias("avg_log_w"),
    )


def dsir_resample(
    docs: DataFrame,
    target: DataFrame | Column,
    n: int,
    n_buckets: int = 1024,
    add_k: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """The paper's selection step: top-n documents by
    log w(x) + Gumbel(0,1), Gumbel noise md5-derived (replayable,
    engine-exact uniforms; u = (md5int60(id) + 1) / 2^60 in (0, 1]).
    ``target`` is either a separate corpus frame or a Column predicate
    over ``docs`` (the in-corpus case — one gram pass cheaper, see
    :func:`dsir_log_ratios_cond`; both forms produce identical models
    for the same membership). Returns (id_col, n_grams, key) with the
    ranking key ROUNDED before the rank and ties broken by id — the
    house float-rank pattern."""
    if isinstance(target, Column):
        ratios = dsir_log_ratios_cond(
            docs, target, n_buckets, add_k, id_col, text_col
        )
    else:
        ratios = dsir_log_ratios(
            target, docs, n_buckets, add_k, id_col, text_col
        )
    scored = dsir_scores(docs, ratios, n_buckets, id_col, text_col)
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
        .cast("double") + F.lit(1.0)
    ) / F.lit(float(2 ** 60))
    gumbel = -F.log(-F.log(u))
    key = F.round(F.col("log_w") + gumbel, round_digits).alias("key")
    return (
        scored.select(id_col, "n_grams", key)
        .orderBy(F.desc("key"), F.asc(id_col))
        .limit(n)
    )
