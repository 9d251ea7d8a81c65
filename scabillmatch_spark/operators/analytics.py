"""Behavioral/market analytics over transactional tables: cohort
retention, market-basket lift, per-user behavioral entropy, and RFM
segmentation.

The reference's stats tier (stats/AnalysisUtils, utils/Plot.scala) stops
at descriptive statistics over scored pairs; an analytics engine serving
the same corpus at warehouse scale also gets asked the two classic
transactional questions — "of the users who arrived in month X, how many
were still active k months later?" (cohort retention) and "which items
co-occur more often than independence predicts?" (association lift, the
support/confidence/lift family from the frequent-itemset literature).
Both are pure integer-relational shapes until the final lift division,
so they slot into the typed-exact oracle gate without float ceremony.

Scale shapes:
- cohort_retention: one (user, period) projection, one per-user min agg,
  one natural-key join back (user-key shuffles only — nothing wider than
  two longs), one (cohort, offset) count agg. The output is bounded by
  period-span², independent of row count.
- basket_lift: the pair stream is a group-local self-join on the basket
  key — bounded by basket size (TPC-H order baskets are single-digit),
  the J1/A5 blocked-all-pairs family, NEVER corpus×corpus; item
  marginals are a vocabulary-bounded frame broadcast onto the co-count
  relation; the basket total is one driver scalar (the BM25 N/avgdl
  precedent).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cohort_retention(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    granularity: str = "month",
) -> DataFrame:
    """Cohort retention triangle -> (cohort, periods_since, n_users,
    n_events). ``cohort`` is the user's first active period (months
    since epoch for granularity='month', else the year); ``periods
    _since`` how many periods later the activity row falls. Entirely
    integer arithmetic — no float discipline needed.
    """
    if granularity == "month":
        period = (
            F.year(ts_col) * F.lit(12) + F.month(ts_col) - F.lit(1)
        ).cast("long")
    elif granularity == "year":
        period = F.year(ts_col).cast("long")
    else:
        raise ValueError(f"granularity must be month|year, got {granularity!r}")
    p = events.select(F.col(user_col).alias("__u"), period.alias("__p"))
    first = p.groupBy("__u").agg(F.min("__p").alias("cohort"))
    return (
        p.join(first, "__u")
        .groupBy("cohort", (F.col("__p") - F.col("cohort")).alias("periods_since"))
        .agg(
            F.count_distinct("__u").cast("long").alias("n_users"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
    )


def basket_lift(
    items: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    round_digits: int = 6,
) -> DataFrame:
    """Pairwise association lift -> (item_a, item_b, co_count, ct_a,
    ct_b, lift) for unordered item pairs co-occurring in >= min_support
    baskets. lift = P(ab) / (P(a)·P(b)) = co·N / (ct_a·ct_b); > 1 means
    the pair co-occurs more than independence predicts. Counts are
    basket-distinct (an item twice in one basket counts once). The lone
    float is the final division, rounded to ``round_digits`` with the
    operand order mirrored exactly in the oracle.
    """
    b = items.select(
        F.col(basket_col).alias("__bk"), F.col(item_col).alias("__it")
    ).distinct()
    n_baskets = b.select(F.count_distinct("__bk")).first()[0]
    if not n_baskets:
        raise ValueError("basket_lift: no baskets")
    marg = b.groupBy("__it").agg(F.count(F.lit(1)).cast("long").alias("ct"))
    pa = b.select("__bk", F.col("__it").alias("item_a"))
    pb = b.select("__bk", F.col("__it").alias("item_b"))
    co = (
        pa.join(pb, "__bk")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("co_count"))
        .filter(F.col("co_count") >= min_support)
    )
    ma = F.broadcast(marg.select(F.col("__it").alias("item_a"), F.col("ct").alias("ct_a")))
    mb = F.broadcast(marg.select(F.col("__it").alias("item_b"), F.col("ct").alias("ct_b")))
    return (
        co.join(ma, "item_a")
        .join(mb, "item_b")
        .select(
            "item_a",
            "item_b",
            "co_count",
            "ct_a",
            "ct_b",
            F.round(
                F.col("co_count").cast("double")
                * F.lit(float(n_baskets))
                / (F.col("ct_a").cast("double") * F.col("ct_b").cast("double")),
                round_digits,
            ).alias("lift"),
        )
    )


def user_entropy(
    events: DataFrame,
    user_col: str,
    type_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Per-user behavioral profile -> (user_col, n_events, n_types,
    entropy, top_type, top_share). ``entropy`` is the Shannon entropy
    (nats) of the user's event-type distribution — the
    label-concentration diagnostic (0 = single-type bot-like stream,
    ln(k) = uniform over k types); ``top_type`` the modal type with
    ties broken by type ascending (row_number, tie-stable on every
    engine); ``top_share`` its fraction.

    Exactness: counts are integers; each p = ct/n is one double
    division and the entropy sum is rounded to ``round_digits``
    (sum-order ulp absorption, type-count-bounded terms). Plan: one
    (user, type) count agg, one window over that bounded frame, one
    user-key agg — nothing wider than (user, type, long) shuffles.
    """
    from pyspark.sql import Window

    ct = events.groupBy(
        F.col(user_col).alias("__u"), F.col(type_col).alias("__t")
    ).agg(F.count(F.lit(1)).cast("long").alias("__ct"))
    wu = Window.partitionBy("__u")
    wr = Window.partitionBy("__u").orderBy(F.desc("__ct"), F.asc("__t"))
    enriched = ct.select(
        "__u",
        "__t",
        "__ct",
        F.sum("__ct").over(wu).alias("__n"),
        F.row_number().over(wr).alias("__rn"),
    )
    p = F.col("__ct").cast("double") / F.col("__n").cast("double")
    # the + 0.0 folds IEEE -0.0 (single-type users: -sum(1·ln 1)) to +0.0
    # so both engines print the same normalized zero
    return enriched.groupBy("__u").agg(
        F.max("__n").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.round(-F.sum(p * F.log(p)) + F.lit(0.0), round_digits).alias("entropy"),
        F.max(F.when(F.col("__rn") == 1, F.col("__t"))).alias("top_type"),
        F.round(
            F.max(F.when(F.col("__rn") == 1, p)), round_digits
        ).alias("top_share"),
    ).withColumnRenamed("__u", user_col)


def rfm_scores(
    orders: DataFrame,
    user_col: str,
    ts_col: str,
    amount_col: str,
    buckets: int = 4,
    round_digits: int = 6,
) -> DataFrame:
    """Classic RFM segmentation -> (user_col, recency_days, frequency,
    monetary, r_score, f_score, m_score, rfm). Scores are ntile
    buckets, 1 = best (most recent / most frequent / highest spend),
    with the user id as the deterministic tiebreak; ``rfm`` packs them
    as r·100 + f·10 + m.

    Exactness: recency/frequency are integers; monetary is rounded to
    ``round_digits`` BEFORE it becomes an ntile order key (sum-order
    ulp must not flip bucket boundaries), ties then broken by id —
    identical total order on every engine. Scale note: the three ntile
    windows are unpartitioned — exact global bucketing over the
    per-user frame (|users| rows, the dsir unpartitioned-window
    precedent). At 100 TB swap ntile for approx-quantile cut points
    and keep this as the bounded-scale audit.
    """
    from pyspark.sql import Window

    per = orders.groupBy(F.col(user_col).alias("__u")).agg(
        F.max(ts_col).alias("__last"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.round(F.sum(amount_col), round_digits).alias("monetary"),
    )
    ref = orders.agg(F.max(ts_col)).first()[0]
    if ref is None:
        raise ValueError("rfm_scores: no orders")
    per = per.select(
        "__u",
        F.datediff(F.lit(ref), F.col("__last")).cast("long").alias("recency_days"),
        "frequency",
        "monetary",
    )
    r_w = Window.orderBy(F.asc("recency_days"), F.asc("__u"))
    f_w = Window.orderBy(F.desc("frequency"), F.asc("__u"))
    m_w = Window.orderBy(F.desc("monetary"), F.asc("__u"))
    scored = per.select(
        "__u",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(buckets).over(r_w).cast("long").alias("r_score"),
        F.ntile(buckets).over(f_w).cast("long").alias("f_score"),
        F.ntile(buckets).over(m_w).cast("long").alias("m_score"),
    )
    return scored.select(
        F.col("__u").alias(user_col),
        "recency_days",
        "frequency",
        "monetary",
        "r_score",
        "f_score",
        "m_score",
        (
            F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")
        ).cast("long").alias("rfm"),
    )


def burstiness_profile(
    events: DataFrame,
    type_col: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    round_digits: int = 6,
) -> DataFrame:
    """Inter-arrival burstiness per event type (Goh & Barabási 2008's
    B = (sigma - mu)/(sigma + mu) over the gap distribution) ->
    (event_type, n_gaps, mean_gap_us, cv_gap, burstiness). Gaps are the
    microsecond intervals between CONSECUTIVE EVENTS OF THE SAME USER
    within the type (ordered by (ts, tiebreak) — cross-engine
    deterministic); B -> -1 for metronome-regular streams, 0 for
    Poisson, -> +1 for heavy-tailed bursty behavior — the temporal
    complement of the user_entropy label-concentration screen (bots are
    typically BOTH low-entropy and regular).

    Exactness: gaps are exact integer micros; Σg and Σg² ride exact
    DECIMAL sums with DECIMAL(19,0) OPERANDS — measured DuckDB binder
    facts: an 18-digit (int64-backed) operand OVERFLOWS on the square
    of a ~1.2e11-us gap, and 38x38 exceeds the width cap, while 19x19
    widens to DECIMAL(38,0) exactly on both engines (a long*long
    product would overflow int64 past ~53-minute gaps; the house
    order-free-sum rule),
    then ONE deterministic cast to DOUBLE per sum and pure mirrored
    double arithmetic: var = (n·Σg² - Σg·Σg)/(n·(n-1)) clamped by
    greatest(·, 0.0) (catastrophic cancellation on constant-gap groups
    can land at tiny-negative, and sqrt would NaN), sigma = IEEE-exact
    sqrt, round(6) on outputs with a +0.0 fold on B (negative range).
    Types with n_gaps < 2 have no variance and are dropped.

    Scale shape: ONE (type, user)-key exchange + sort for the lag, one
    combine-heavy per-type agg over (type, 3 numbers) — nothing wider
    than ids + longs shuffles; the output is |types| rows."""
    from pyspark.sql.window import Window as W

    w = W.partitionBy(type_col, user_col).orderBy(
        F.asc("__us"), F.asc(tiebreak_col)
    )
    gaps = (
        events.select(
            type_col, user_col, tiebreak_col, F.unix_micros(ts_col).alias("__us")
        )
        .withColumn("__g", F.col("__us") - F.lag("__us", 1).over(w))
        .filter(F.col("__g").isNotNull())
    )
    dec = F.col("__g").cast("decimal(19,0)")
    agg = gaps.groupBy(type_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum(dec).cast("double").alias("__s1"),
        F.sum(dec * dec).cast("double").alias("__s2"),
    )
    n_d = F.col("n_gaps").cast("double")
    mean = F.col("__s1") / n_d
    var = F.greatest(
        (n_d * F.col("__s2") - F.col("__s1") * F.col("__s1"))
        / (n_d * (n_d - F.lit(1.0))),
        F.lit(0.0),
    )
    sigma = F.sqrt(var)
    return agg.filter(F.col("n_gaps") >= 2).select(
        type_col,
        "n_gaps",
        F.round(mean, round_digits).alias("mean_gap_us"),
        F.round(sigma / mean, round_digits).alias("cv_gap"),
        (
            F.round((sigma - mean) / (sigma + mean), round_digits) + F.lit(0.0)
        ).alias("burstiness"),
    )
