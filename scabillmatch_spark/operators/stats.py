"""Descriptive statistics over scored-pair relations (reference stats/
AnalysisUtils + Plot.scala + docs/correlations.md).

Thin, explicit wrappers so every SURVEY §2.4 aggregate maps to a named
engine function. All single-shuffle groupBy/agg plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def describe(df: DataFrame, col: str, by: str | None = None) -> DataFrame:
    """count/mean/stddev/min/max (reference data.describe(), README.md:106-116)."""
    aggs = [
        F.count(F.lit(1)).alias("count"),
        F.avg(col).alias("mean"),
        # NaN -> NULL: SQL engines report NULL for a singleton sample
        # stddev; Spark reports NaN. Align to the SQL convention so the
        # degenerate group compares equal cross-engine.
        F.nanvl(F.stddev_samp(col), F.lit(None).cast("double")).alias("stddev"),
        F.min(col).alias("min"),
        F.max(col).alias("max"),
    ]
    return df.groupBy(by).agg(*aggs) if by else df.agg(*aggs)


def pearson_corr(df: DataFrame, col1: str, col2: str) -> float:
    """Statistics.corr analog (docs/correlations.md: corr(jaccard, cosine)
    = 0.328 on the 10-state run)."""
    return float(df.agg(F.corr(col1, col2)).first()[0])


def histogram(df: DataFrame, col: str, width: float, lo: float = 0.0) -> DataFrame:
    """Fixed-width histogram (Histogrammar Bin analog, utils/Plot.scala:31)."""
    bucket = F.floor((F.col(col) - lo) / width).cast("long")
    return df.groupBy(bucket.alias("bucket")).agg(F.count(F.lit(1)).alias("n")).orderBy("bucket")


def cross_measure_join(scored_a: DataFrame, scored_b: DataFrame, suffixes=("_a", "_b")) -> DataFrame:
    """Join two scored-pair relations on (pk1, pk2) for correlation studies
    (reference README.md:93, J7)."""
    a = scored_a.withColumnRenamed("similarity", f"similarity{suffixes[0]}")
    b = scored_b.withColumnRenamed("similarity", f"similarity{suffixes[1]}")
    return a.join(b, ["pk1", "pk2"])


def pair_space_accounting(df: DataFrame, group_col: str) -> DataFrame:
    """n*(n-1)/2 candidate pairs per block (docs/tuning_kmeans.md's
    npermutations audit, F12) + the blocked total."""
    per = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n")).withColumn(
        "npermutations", F.col("n") * (F.col("n") - 1) / 2
    )
    return per


def sequential_funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Strict sequential funnel: per user, the first timestamp of step i
    that occurs strictly AFTER the user's step-(i-1) timestamp — the
    conversion-analysis shape (view -> click -> purchase). Returns one row
    per user with a ``t_<step>`` timestamp column per step (NULL = never
    reached).

    Plan shape: one shuffle on the user key; each step is an unordered
    window MIN over the same partitioning (Catalyst reuses the exchange
    across the chained window selects), so adding funnel steps adds
    projections, not shuffles. At 100 TB pre-filter ``events`` to the
    funnel's event types so the shuffle carries only funnel rows.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(user_col)
    df = events.select(user_col, ts_col, type_col)
    prev: Column | None = None
    for step in steps:
        cond = F.col(type_col) == step
        if prev is not None:
            # ts > NULL is NULL, so users who never reached the previous
            # step correctly get NULL for this one too
            cond = cond & (F.col(ts_col) > F.col(prev))
        col_name = f"t_{step}"
        df = df.withColumn(col_name, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = col_name
    return df.select(
        user_col, *[f"t_{s}" for s in steps]
    ).dropDuplicates([user_col])


def mad_outliers(
    df: DataFrame,
    key_col: str,
    value_col: str,
    k: float = 3.0,
    round_digits: int = 6,
) -> DataFrame:
    """Robust per-group anomaly report via median absolute deviation ->
    (key_col, n, median, mad, cutoff, n_outliers, max_dev). The MAD gate
    is the standard robust alternative to mean±k·sigma (a single wild
    value drags a stddev gate but not a median one) — the data-quality
    screen a pretraining pipeline runs over per-source numeric feeds.

    Exactness discipline: medians use sort-based ``percentile`` (linear
    interpolation — identical definition to DuckDB's quantile_cont, the
    lineitem_exact_quantiles precedent), and every derived quantity is
    ROUNDED to ``round_digits`` BEFORE the outlier comparison (the
    round-before-rank house pattern), so the flag decision is the same
    double comparison on every engine. Plan: two grouped medians over
    the (key, value) projection + one equi-join of the tiny per-key
    frame back onto values (Catalyst broadcasts it) + one final agg —
    nothing wider than (key, value) ever shuffles. At 100 TB swap the
    exact medians for percentile_approx and keep this as the
    bounded-scale audit (the approx_sketch_stats pairing).
    """
    vals = df.select(key_col, F.col(value_col).cast("double").alias("__v"))
    med = vals.groupBy(key_col).agg(
        F.round(F.expr("percentile(__v, 0.5D)"), round_digits).alias("__med")
    )
    dev = vals.join(med, key_col).select(
        key_col,
        "__med",
        F.round(F.abs(F.col("__v") - F.col("__med")), round_digits).alias("__dev"),
    )
    mad = dev.groupBy(key_col).agg(
        F.round(F.expr("percentile(__dev, 0.5D)"), round_digits).alias("__mad")
    )
    cut = F.round(F.lit(k) * F.col("__mad"), round_digits)
    return (
        dev.join(mad, key_col)
        .select(key_col, "__med", "__mad", "__dev", cut.alias("__cut"))
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.first("__med").alias("median"),
            F.first("__mad").alias("mad"),
            F.first("__cut").alias("cutoff"),
            F.sum(
                F.when(F.col("__dev") > F.col("__cut"), 1).otherwise(0)
            ).cast("long").alias("n_outliers"),
            F.max("__dev").alias("max_dev"),
        )
    )


def zipf_fit(
    freqs: DataFrame,
    group_col: str,
    term_col: str = "term",
    freq_col: str = "freq",
    round_digits: int = 6,
) -> DataFrame:
    """Per-group Zipf power-law fit over a (group, term, freq) relation:
    OLS of ln(freq) on ln(rank) -> (group_col, vocab_size, total_tokens,
    slope, intercept, r2). Zipf's law says slope ~ -1 for natural text;
    a corpus whose slope collapses toward 0 (flat frequencies — symptom
    of templated/generated text) or dives steeply (tiny effective vocab)
    fails the screen, which is why this sits in the curation toolbox.

    Rank is ``row_number`` over (freq DESC, term ASC) — fully
    deterministic under ties. The regression is the closed-form
    5-sums OLS; sums run over vocab-bounded rows, slope/intercept/r2
    rounded to ``round_digits`` (sum-order ulp absorption). Plan: one
    window over the per-group vocab frame + one group agg — nothing
    corpus-sized past the caller's (group, term) count.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.desc(freq_col), F.asc(term_col)
    )
    xy = freqs.select(
        group_col,
        F.col(freq_col).cast("long").alias("__f"),
        F.log(F.row_number().over(w).cast("double")).alias("__x"),
        F.log(F.col(freq_col).cast("double")).alias("__y"),
    )
    n = F.count(F.lit(1)).cast("double")
    sx, sy = F.sum("__x"), F.sum("__y")
    sxx, sxy, syy = (
        F.sum(F.col("__x") * F.col("__x")),
        F.sum(F.col("__x") * F.col("__y")),
        F.sum(F.col("__y") * F.col("__y")),
    )
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    r2 = (
        (n * sxy - sx * sy)
        * (n * sxy - sx * sy)
        / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    )
    return xy.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
        F.sum("__f").cast("long").alias("total_tokens"),
        F.round(slope, round_digits).alias("slope"),
        F.round(intercept, round_digits).alias("intercept"),
        F.round(r2, round_digits).alias("r2"),
    )


def gini(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Per-group Gini concentration index -> (group_col, n, gini) via the
    sorted-rank closed form G = 2·Σ(i·x_i)/(n·Σx) - (n+1)/n with x
    ascending and i = 1..n — the inequality/concentration screen
    (revenue concentration per market, token-budget concentration per
    source). 0 = perfectly even, ->1 = one member holds everything.

    Exactness: rank = row_number over (value ASC, id ASC) — tie-stable;
    the three sums are doubles over group-bounded rows and the final
    ratio is rounded to ``round_digits`` (sum-order ulp absorption).
    Plan: one partitioned window + one group agg; exchanges carry
    (group, id, double).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.asc(value_col), F.asc(id_col)
    )
    ranked = df.select(
        group_col,
        F.col(value_col).cast("double").alias("__x"),
        F.row_number().over(w).cast("double").alias("__i"),
    )
    n = F.count(F.lit(1)).cast("double")
    sx = F.sum("__x")
    six = F.sum(F.col("__i") * F.col("__x"))
    return ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(
            F.lit(2.0) * six / (n * sx) - (n + F.lit(1.0)) / n, round_digits
        ).alias("gini"),
    )


def herfindahl_index(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Per-group Herfindahl-Hirschman concentration index ->
    (group_col, n, hhi, top_share): HHI = Σ share_i² over the group's
    members, the antitrust-standard market-concentration screen (1/n =
    perfectly fragmented, 1.0 = monopoly; regulators flag > 0.25) —
    the squared-share complement of the gini (rank-based) and theil
    (information-theoretic) rows, and the only one of the three that is
    a plain moment (no window, no log). top_share = the largest single
    share, the monopolist spotlight.

    Exactness: computed as Σx² / (Σx)² — shares never materialize, so
    there is no per-member division to mirror; both sums are
    group-bounded doubles (zipf round(6) precedent), the division and
    round(6) once at the end. Negative values are the caller's problem
    (shares lose meaning); zero-total groups are filtered (share
    undefined — the pareto guard precedent). Plan: ONE group agg —
    exchanges carry (group, two doubles); the cheapest row in the
    inequality family."""
    x = F.col(value_col).cast("double")
    agg = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).alias("__s"),
        F.sum(x * x).alias("__s2"),
        F.max(x).alias("__mx"),
    )
    return agg.filter(F.col("__s") > 0).select(
        group_col,
        "n",
        F.round(F.col("__s2") / (F.col("__s") * F.col("__s")), round_digits).alias(
            "hhi"
        ),
        F.round(F.col("__mx") / F.col("__s"), round_digits).alias("top_share"),
    )


def pareto_classes(
    df,
    key_col: str,
    value_col,
    boundaries: tuple = (0.80, 0.95),
    round_digits: int = 6,
) -> DataFrame:
    """Pareto / ABC concentration rollup -> (abc_class, n_parts,
    revenue_share): rank keys by a DECIMAL value descending (ties by key
    ascending — identical total order cross-engine), classify each by
    its cumulative share of the total (A <= boundaries[0],
    B <= boundaries[1], C the tail), and aggregate per class.

    ``value_col`` must already be an exact DECIMAL column expression —
    the cumulative window sum is then order-free exact; the only float
    ops are the two final divisions, rounded. The grand total is one
    driver scalar (the weighted-pagerank count precedent). Scale
    caveat: the rank+cumsum window is UNPARTITIONED over the |keys|-row
    aggregate frame — the bounded-scale audit form (the customer_rfm
    precedent); at 100 TB the class cuts come from approx quantiles
    over the revenue distribution instead, same downstream agg.

    An empty input (total is NULL) or an all-zero total has no shares
    to apportion and returns an EMPTY frame with the output schema —
    without the guard every key would silently classify as 'C' (share
    = NaN) on a zero total, and float(None) would raise on empty."""
    from pyspark.sql import Window

    rev = df.groupBy(key_col).agg(F.sum(value_col).alias("__rev"))
    total = rev.agg(F.sum("__rev")).first()[0]
    if total is None or float(total) == 0.0:
        return df.sparkSession.createDataFrame(
            [], "abc_class string, n_parts long, revenue_share double"
        )
    w = (
        Window.orderBy(F.desc("__rev"), F.asc(key_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    share = F.sum("__rev").over(w).cast("double") / F.lit(float(total))
    a, b = boundaries
    classed = rev.select(
        "__rev",
        F.when(share <= a, F.lit("A"))
        .when(share <= b, F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc_class"),
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.round(
            F.sum("__rev").cast("double") / F.lit(float(total)), round_digits
        ).alias("revenue_share"),
    )


def ks_two_sample(
    events,
    type_a: str,
    type_b: str,
    value_col: str = "value",
    type_col: str = "event_type",
    round_digits: int = 6,
    bins: int | None = None,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between the ``value_col``
    distributions of two event types -> ONE row (n_a, n_b, ks_d,
    at_value): D = max over pooled distinct values v of
    |F_a(v) - F_b(v)|, with at_value the smallest value attaining the
    ROUNDED maximum (round-before-rank: ks_d is rounded 6 first, ties
    by value ascending — identical total order cross-engine). The
    distribution-free drift gate between two slices — the numeric
    complement of the MAD row's per-group outlier screen.

    Exactness: per-value counts and cumulative counts are integers
    (grouping doubles by EQUALITY is bit-exact — parquet bits on both
    engines, the histogram-on-value precedent); each ECDF value is one
    double division of exact integers; abs-difference of identical
    doubles is identical, so round(6) needs no signed-zero fold
    (abs >= 0). NULL values are filtered out (in the oracle too):
    Spark window-sorts NULLs FIRST and DuckDB NULLs LAST, so an
    unfiltered NULL would form its own ECDF step at opposite ends of
    the cumulative order on the two engines. Returns an EMPTY typed
    frame when either sample is empty (the pareto guard precedent — D
    is undefined, and a silent 0/0 would NaN-poison the max).

    Scale path (``bins``): with bins=None (default — the exact,
    oracle-mirrored form) the cumulative window is UNPARTITIONED over
    the pooled distinct values, the bounded-scale audit form
    (rfm/pareto precedent). bins=N is the 100 TB form: the ECDF is
    evaluated only at N-1 approx-quantile cuts of the pooled sample
    (one approxQuantile pass + one combine-heavy (bin) count shuffle;
    the cumulative window then runs over <= N rows, never the distinct
    values). The binned D is a LOWER bound on the exact D that
    evaluates the sup on a sub-grid: D_binned <= D_exact, and since the
    pooled ECDF moves at most 1/min(na,nb) per sample between adjacent
    cuts of the pooled distribution, the gap shrinks as bins grow
    (property-tested binned-vs-exact in tests/test_analytics.py).
    at_value for the binned form is the CUT value attaining the rounded
    max (a real data boundary, same tie-break)."""
    from pyspark.sql import Window

    s, per, na, nb = _two_sample_value_counts(
        events, type_a, type_b, value_col, type_col
    )
    if na == 0 or nb == 0:
        return events.sparkSession.createDataFrame(
            [], "n_a long, n_b long, ks_d double, at_value double"
        )
    if bins is not None:
        if bins < 2:
            # bins=1 would leave only the +inf sentinel ECDF point and
            # silently report D=0 for ANY drift — a gate that always
            # passes; fail fast instead
            raise ValueError(f"ks_two_sample: bins must be >= 2, got {bins}")
        # approx-quantile cuts of the pooled sample; dedup (heavy ties
        # collapse cuts) and keep them sorted — Bucketizer-style split
        # points, but assignment stays a Column expression (count of
        # cuts <= v), so the hot path needs no ml stage
        probs = [i / bins for i in range(1, bins)]
        cuts = sorted(set(s.approxQuantile("v", probs, 0.001)))
        cut_arr = F.array(*[F.lit(float(c)) for c in cuts])
        # bin i = number of cuts < v  (v == cut lands in the bin the cut
        # CLOSES, so each bin's upper boundary is inclusive and the ECDF
        # evaluated at a cut counts every sample <= it)
        s = s.withColumn(
            "__bin",
            F.aggregate(
                cut_arr,
                F.lit(0),
                lambda acc, c: acc + F.when(F.col("v") > c, 1).otherwise(0),
            ),
        )
        per = s.groupBy("__bin").agg(
            F.sum("ia").cast("long").alias("ca"),
            (F.count(F.lit(1)) - F.sum("ia")).cast("long").alias("cb"),
        )
        # at_value = the bin's closing cut; the last (open-ended) bin
        # carries ECDF 1.0 on both sides (|diff| = 0), so its sentinel
        # never wins the max
        bin_val = F.when(
            F.col("__bin") < len(cuts),
            F.element_at(cut_arr, F.col("__bin") + 1),
        ).otherwise(F.lit(float("inf")))
        per = per.select(bin_val.alias("v"), "ca", "cb")
    w = Window.orderBy(F.asc("v")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ec = per.select(
        "v",
        F.sum("ca").over(w).alias("cca"),
        F.sum("cb").over(w).alias("ccb"),
    )
    d = F.round(
        F.abs(
            F.col("cca").cast("double") / F.lit(na)
            - F.col("ccb").cast("double") / F.lit(nb)
        ),
        round_digits,
    )
    return (
        ec.select(
            F.lit(na).cast("long").alias("n_a"),
            F.lit(nb).cast("long").alias("n_b"),
            d.alias("ks_d"),
            F.col("v").alias("at_value"),
        )
        .orderBy(F.desc("ks_d"), F.asc("at_value"))
        .limit(1)
    )


def _two_sample_value_counts(events, type_a, type_b, value_col, type_col):
    """Shared head of the two-sample family (KS, Mann-Whitney): the
    NULL-safe two-type filter, per-value integer (ca, cb) counts, and
    the (na, nb) driver scalars — factored so an exactness fix (like
    the r14 NULL filter, which had to be applied to both consumers
    separately) lands once. Returns (value_stream, per_value_counts,
    na, nb) — the raw (v, ia) stream is what KS's bins= path feeds to
    approxQuantile (sample quantiles, not distinct-value quantiles)."""
    s = events.filter(
        F.col(type_col).isin([type_a, type_b])
        & F.col(value_col).isNotNull()
    ).select(
        F.col(value_col).alias("v"),
        (F.col(type_col) == type_a).cast("long").alias("ia"),
    )
    trow = s.agg(F.sum("ia"), F.count(F.lit(1))).first()
    na = int(trow[0] or 0)
    nb = int(trow[1] or 0) - na
    per = s.groupBy("v").agg(
        F.sum("ia").cast("long").alias("ca"),
        (F.count(F.lit(1)) - F.sum("ia")).cast("long").alias("cb"),
    )
    return s, per, na, nb


def _pearson_parts(n_col, sx, sy, sxy, sxx, syy):
    """Shared Pearson tail (spearman_corr, analytics.hourly_acf1):
    (cov, vx, vy) Column expressions in the exact operand order both
    DuckDB mirrors state — n·Σxy - Σx·Σy and greatest-clamped
    variances. One definition so the mirrors cannot drift per copy."""
    n_d = F.col(n_col).cast("double")
    cov = n_d * F.col(sxy) - F.col(sx) * F.col(sy)
    vx = F.greatest(n_d * F.col(sxx) - F.col(sx) * F.col(sx), F.lit(0.0))
    vy = F.greatest(n_d * F.col(syy) - F.col(sy) * F.col(sy), F.lit(0.0))
    return cov, vx, vy


def spearman_corr(
    df,
    x_col: str,
    y_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Spearman rank correlation between two columns -> ONE row
    (n, rho): Pearson's r over AVERAGE ranks — the monotone-association
    complement of the raw Pearson row (A9), robust to outliers and to
    any monotone rescaling; average ranks (not row_number) are what
    makes tied values contribute correctly (the textbook tie treatment,
    NOT the rank-then-id shortcut used where ranks are mere tie-breaks).

    avg rank = rank() + (t - 1)/2 with rank() the min-rank and t the
    tie-group size — two window functions per variable, no join. Every
    rank is an exact dyadic half-integer <= n, so all five Pearson sums
    are exact dyadic doubles while their partial sums stay << 2^53 (the
    Mann-Whitney exactness class — no DECIMAL ceremony); the n·Σ
    products can exceed 2^53 but multiply IDENTICAL exact operands on
    both engines, so rounding is identical (cross-engine equality is
    what the gate needs, and rho gets round(6)+0.0 regardless).

    Guards: zero variance on either side (all values tied) -> empty
    typed frame — rho is undefined (the acf/pareto definedness
    convention). NULLs in either column are filtered (rank placement of
    NULL differs between engines). BOUNDED-SCALE form, two binding
    limits (r14 ADVICE): (1) the rank windows are UNPARTITIONED over
    the input rows — the gini/rfm audit-form constraint, binding first
    in practice; (2) the exactness claim itself expires near n ~ 3e5:
    Σ(rx·ry) grows ~n³/3 and leaves the exact-dyadic double envelope at
    2^53, after which Spark's partition-order-dependent partial-sum
    rounding can diverge from DuckDB's single-threaded sum and flake a
    cross-engine gate. DECIMAL operands only buy ~4x (n·Σ then
    overflows the 38-digit multiply width both engines cap at), so the
    honest contract is n <= ~1e5: plenty for the screen's audit use; at
    100 TB rank on approx-quantile bucket boundaries first, which
    re-bounds both limits at once."""
    from pyspark.sql import Window

    s = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(F.col(x_col).alias("__x"), F.col(y_col).alias("__y"))

    def avg_rank(col):
        wo = Window.orderBy(F.asc(col))
        wt = Window.partitionBy(col)
        return F.rank().over(wo).cast("double") + (
            F.count(F.lit(1)).over(wt).cast("double") - F.lit(1.0)
        ) / F.lit(2.0)

    ranked = s.select(
        avg_rank("__x").alias("rx"),
        avg_rank("__y").alias("ry"),
    )
    agg = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rx").alias("__sx"),
        F.sum("ry").alias("__sy"),
        F.sum(F.col("rx") * F.col("ry")).alias("__sxy"),
        F.sum(F.col("rx") * F.col("rx")).alias("__sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("__syy"),
    )
    cov, vx, vy = _pearson_parts("n", "__sx", "__sy", "__sxy", "__sxx", "__syy")
    return (
        agg.filter((F.col("n") >= 2) & (vx > 0) & (vy > 0))
        .select(
            "n",
            (
                F.round(cov / (F.sqrt(vx) * F.sqrt(vy)), round_digits)
                + F.lit(0.0)
            ).alias("rho"),
        )
    )


def cramer_von_mises(
    events,
    type_a: str,
    type_b: str,
    value_col: str = "value",
    type_col: str = "event_type",
    round_digits: int = 6,
) -> DataFrame:
    """Two-sample Cramér-von Mises statistic between the ``value_col``
    distributions of two event types -> ONE row (n_a, n_b, t_cvm):
    T = (n_a·n_b)/(n_a+n_b)² · Σ_x (F_a(x) − F_b(x))² summed over the
    POOLED sample points with multiplicity — the integral-distance
    complement of the KS row (KS is the sup of the ECDF gap, blind to
    how long the gap persists; CvM integrates it, so a broad modest
    drift that KS underweights scores high here). Same slice pair and
    per-value count machinery as KS/MWU (_two_sample_value_counts).

    Exactness: cumulative counts are integers; each ECDF value is one
    double division of exact integers, identical on both engines; the
    per-value term t_v·(F_a−F_b)² multiplies identical doubles; the
    distinct-value sum rides the zipf/chi2 round(6) precedent (term
    magnitudes <= n, ulp accumulation orders below 5e-7), and the
    (n_a·n_b)/(n_a+n_b)² prefactor is applied operand-for-operand
    before round(6)+0.0. Guards: either sample empty -> empty typed
    frame; NULL values filtered (KS convention). Scale: one (v) count
    shuffle + one cumulative window over pooled DISTINCT values
    (unpartitioned — the ks bounded-scale caveat; the ks bins=
    approx-cut precedent is the 100 TB lever here too)."""
    from pyspark.sql import Window

    _, per, na, nb = _two_sample_value_counts(
        events, type_a, type_b, value_col, type_col
    )
    if na == 0 or nb == 0:
        return events.sparkSession.createDataFrame(
            [], "n_a long, n_b long, t_cvm double"
        )
    w = Window.orderBy(F.asc("v")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ec = per.select(
        "v",
        (F.col("ca") + F.col("cb")).cast("double").alias("t"),
        (
            F.sum("ca").over(w).cast("double") / F.lit(float(na))
            - F.sum("cb").over(w).cast("double") / F.lit(float(nb))
        ).alias("d"),
    )
    pref = F.lit(float(na) * float(nb)) / (
        (F.lit(float(na)) + F.lit(float(nb)))
        * (F.lit(float(na)) + F.lit(float(nb)))
    )
    return ec.agg(
        F.lit(na).cast("long").alias("n_a"),
        F.lit(nb).cast("long").alias("n_b"),
        (
            F.round(pref * F.sum(F.col("t") * F.col("d") * F.col("d")), round_digits)
            + F.lit(0.0)
        ).alias("t_cvm"),
    )


def mann_whitney_u(
    events,
    type_a: str,
    type_b: str,
    value_col: str = "value",
    type_col: str = "event_type",
    round_digits: int = 6,
) -> DataFrame:
    """Two-sample Mann-Whitney U (Wilcoxon rank-sum) test between the
    ``value_col`` distributions of two event types -> ONE row (n_a, n_b,
    u_a, z): the location-shift complement of the KS row (KS is
    sensitive to ANY distribution difference; MWU targets stochastic
    dominance — P(A > B) = u_a/(n_a·n_b)).

    U is computed in the pair-counting form from per-value integer
    counts: U_a = Σ_v ca_v·(cum cb strictly below v) + ca_v·cb_v/2
    (ties count half). Every term is an exact dyadic rational (integer
    products plus integer halves) with partial sums far below 2^53, so
    the double sum is EXACT and order-free — u_a needs no rounding and
    no DECIMAL ceremony. The normal z uses the tie-corrected variance
    sigma² = n_a·n_b/12 · ((n+1) - Σ(t³-t)/(n(n-1))) over tie-group
    sizes t (same exact-integer class; t³ < 2^53 at any realistic tie
    mass, and Σ(t³-t) is an exact-integer double sum for n < ~2 000 000
    — the bounded-scale audit form), one sqrt, no continuity correction
    (documented; mirrors must agree on the convention, not on a
    textbook). round(6)+0.0 on z only.

    Guards: either sample empty -> empty typed frame (KS/pareto
    precedent); sigma == 0 (every value tied across both samples) ->
    empty frame too — z is undefined and U carries no information.
    NULL values filtered like the KS row (window NULL placement differs
    between engines). Scale shape: one (v) count shuffle, one
    cumulative window over the pooled DISTINCT values (unpartitioned —
    the bounded-scale ks/rfm caveat; bin on approx-quantile cuts at
    100 TB), one final agg."""
    from pyspark.sql import Window

    _, per, na, nb = _two_sample_value_counts(
        events, type_a, type_b, value_col, type_col
    )
    if na == 0 or nb == 0:
        return events.sparkSession.createDataFrame(
            [], "n_a long, n_b long, u_a double, z double"
        )
    w = Window.orderBy(F.asc("v")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ec = per.select(
        "v",
        "ca",
        "cb",
        (F.sum("cb").over(w) - F.col("cb")).alias("cb_below"),
        (F.col("ca") + F.col("cb")).alias("t"),
    )
    term = F.col("ca").cast("double") * F.col("cb_below").cast("double") + (
        F.col("ca").cast("double") * F.col("cb").cast("double") / F.lit(2.0)
    )
    ties = F.col("t").cast("double") * F.col("t").cast("double") * F.col(
        "t"
    ).cast("double") - F.col("t").cast("double")
    agg = ec.agg(
        F.sum(term).alias("__u"),
        F.sum(ties).alias("__tt"),
    )
    n = na + nb
    mu = F.lit(float(na) * float(nb) / 2.0)
    var = (
        F.lit(float(na) * float(nb) / 12.0)
        * (F.lit(float(n + 1)) - F.col("__tt") / F.lit(float(n) * float(n - 1)))
    )
    sigma = F.sqrt(F.greatest(var, F.lit(0.0)))
    return (
        agg.filter(sigma > 0)
        .select(
            F.lit(na).cast("long").alias("n_a"),
            F.lit(nb).cast("long").alias("n_b"),
            F.col("__u").alias("u_a"),
            (F.round((F.col("__u") - mu) / sigma, round_digits) + F.lit(0.0)).alias(
                "z"
            ),
        )
    )


def chi2_independence(
    df,
    col_a: str,
    col_b: str,
    round_digits: int = 6,
) -> DataFrame:
    """Pearson chi-squared independence test between two categorical
    columns -> ONE row (chi2, dof, cramers_v, n_rows, n_cells_occupied):
    the categorical-association screen (is language independent of
    source? is a label leaking a slice?) completing the association
    family — Pearson corr (numeric x numeric), PMI (set co-occurrence),
    G2 keyness (term vs slice), and now contingency-table association.

    Zero cells WITHOUT a grid join: a cell with o = 0 contributes
    (0-e)²/e = e, and Σ_all e = n exactly, so

        chi2 = Σ_occupied (o-e)²/e + (n - Σ_occupied e)

    — the closed-form remainder (the JS divergence one-sided-mass
    trick), which keeps the plan to counts + two tiny broadcast-joined
    marginals and avoids the r x c cross join a literal grid would need
    (and the BroadcastNestedLoopJoin the plan gate bans). dof counts
    the FULL (r-1)(c-1) grid regardless of occupancy.

    Exactness: observed counts and marginal products are exact integers
    (ta·tb <= n² < 2^63 far below overflow); e = ta·tb/n is one double
    division; the ~r·c-cell double sums ride the zipf round(6)
    precedent (order ulp ≪ 5e-7 at bounded cell counts); cramers_v =
    sqrt(chi2_raw / (n·min(r-1, c-1))) uses the UNROUNDED sum on both
    engines, rounded once at the end. Degenerate 1-level columns
    (dof = 0) return chi2 but NULL cramers_v (division by zero -> the
    SQL NULL convention, mirrored)."""
    o = df.groupBy(col_a, col_b).agg(F.count(F.lit(1)).cast("long").alias("__o"))
    ra = o.groupBy(col_a).agg(F.sum("__o").cast("long").alias("__ta"))
    rb = o.groupBy(col_b).agg(F.sum("__o").cast("long").alias("__tb"))
    dims = df.agg(
        F.count(F.lit(1)).cast("long"),
        F.countDistinct(col_a).cast("long"),
        F.countDistinct(col_b).cast("long"),
    ).first()
    n, r, c = int(dims[0]), int(dims[1]), int(dims[2])
    if n == 0:
        return df.sparkSession.createDataFrame(
            [],
            "chi2 double, dof long, cramers_v double, n_rows long,"
            " n_cells_occupied long",
        )
    e = (F.col("__ta") * F.col("__tb")) / F.lit(n)
    diff = F.col("__o").cast("double") - e
    cells = (
        o.join(F.broadcast(ra), col_a)
        .join(F.broadcast(rb), col_b)
        .select((diff * diff / e).alias("__contrib"), e.alias("__e"))
    )
    part = cells.agg(
        F.sum("__contrib").alias("__p"),
        F.sum("__e").alias("__es"),
        F.count(F.lit(1)).cast("long").alias("__nc"),
    )
    chi2_raw = F.col("__p") + (F.lit(float(n)) - F.col("__es"))
    dof = (r - 1) * (c - 1)
    cramers = (
        F.round(F.sqrt(chi2_raw / F.lit(float(n * min(r - 1, c - 1)))), round_digits)
        if dof > 0
        else F.lit(None).cast("double")
    )
    return part.select(
        F.round(chi2_raw, round_digits).alias("chi2"),
        F.lit(dof).cast("long").alias("dof"),
        cramers.alias("cramers_v"),
        F.lit(n).cast("long").alias("n_rows"),
        F.col("__nc").alias("n_cells_occupied"),
    )


def kruskal_wallis(
    events,
    value_col: str = "value",
    group_col: str = "event_type",
    round_digits: int = 6,
) -> DataFrame:
    """Kruskal-Wallis H test (one-way ANOVA on ranks) across the groups
    of ``group_col`` -> ONE row (k, n, h, h_tie_corrected): the
    k-sample generalization of the Mann-Whitney row — does at least one
    group's ``value_col`` distribution stochastically dominate? —
    H = 12/(n(n+1))·Σ_g R_g²/n_g − 3(n+1) over average-rank sums R_g,
    tie-corrected by C = 1 − Σ(t³−t)/(n³−n).

    Exactness (the spearman/MWU class): per-value integer counts; the
    average rank of a pooled distinct value v is cum_below(v) +
    (c_v+1)/2 — an exact dyadic half-integer; R_g = Σ c_{g,v}·r_v sums
    exact dyadic terms with partial sums << 2^53, so R_g is exact and
    order-free. R_g² multiplies IDENTICAL exact operands on both
    engines; Σ_g over k (handfuls of) groups rides the chi2 ~100-term
    round(6) precedent; h and h_tie_corrected get round(6)+0.0.
    Σ(t³−t) is the MWU exact-integer tie mass.

    Guards: NULL values/groups filtered (engine NULL-order divergence);
    k < 2 -> empty typed frame (H undefined); C == 0 (every pooled
    value identical — one tie group of size n) -> empty frame (the
    MWU zero-sigma convention). Scale shape: ONE (v, g) count shuffle
    (persisted across the two scalar actions, released before return),
    one (v) rollup, one cumulative window over pooled DISTINCT values
    (unpartitioned — the ks/MWU bounded-scale caveat), one broadcast
    (v)-join of per-value ranks onto per-(v,g) counts, one final agg."""
    from pyspark.sql import Window

    s = events.filter(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(F.col(value_col).alias("v"), F.col(group_col).alias("g"))
    # persisted across the tie-mass agg and the k/n/srr agg (two driver
    # actions): the (v, g, c) census is tiny next to the input scan +
    # count shuffle it saves repeating (house persist rule); released
    # before return — the result is a local 1-row frame, no leak
    pvg = (
        s.groupBy("v", "g")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .persist()
    )
    pv = pvg.groupBy("v").agg(F.sum("c").cast("long").alias("cv"))
    w = Window.orderBy(F.asc("v")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pv = pv.select(
        "v",
        "cv",
        (
            (F.sum("cv").over(w) - F.col("cv")).cast("double")
            + (F.col("cv").cast("double") + F.lit(1.0)) / F.lit(2.0)
        ).alias("rv"),
    )
    per_g = (
        pvg.join(F.broadcast(pv), "v")
        .groupBy("g")
        .agg(
            F.sum(F.col("c").cast("double") * F.col("rv")).alias("rg"),
            F.sum("c").cast("long").alias("ng"),
        )
    )
    ties = pv.agg(
        F.sum(
            F.col("cv").cast("double") * F.col("cv").cast("double")
            * F.col("cv").cast("double")
            - F.col("cv").cast("double")
        ).alias("tt")
    ).first()["tt"]
    rows = per_g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("ng").cast("long").alias("n"),
        F.sum(
            F.col("rg") * F.col("rg") / F.col("ng").cast("double")
        ).alias("srr"),
    ).first()
    pvg.unpersist()
    k, n = int(rows["k"] or 0), int(rows["n"] or 0)
    empty_schema = "k long, n long, h double, h_tie_corrected double"
    if k < 2 or n < 2:
        return events.sparkSession.createDataFrame([], empty_schema)
    # repeated multiplication, NOT **3: pow() may differ from n*n*n by an
    # ulp past 2^53, and this guard must agree bit-for-bit with the
    # oracle's n*n*n - n denominator on the all-tied (C == 0) edge
    c_corr = 1.0 - float(ties) / (float(n) * float(n) * float(n) - float(n))
    if c_corr == 0.0:
        return events.sparkSession.createDataFrame([], empty_schema)
    # h from the exact srr scalar — one python float expression chain,
    # mirrored term-for-term by the oracle's SQL arithmetic
    spark = events.sparkSession
    return spark.createDataFrame(
        [(k, n, float(rows["srr"]), float(ties))],
        "k long, n long, __srr double, __tt double",
    ).select(
        "k",
        "n",
        (
            F.round(
                F.lit(12.0) / (F.lit(float(n)) * (F.lit(float(n)) + F.lit(1.0)))
                * F.col("__srr")
                - F.lit(3.0) * (F.lit(float(n)) + F.lit(1.0)),
                round_digits,
            )
            + F.lit(0.0)
        ).alias("h"),
        (
            F.round(
                (
                    F.lit(12.0)
                    / (F.lit(float(n)) * (F.lit(float(n)) + F.lit(1.0)))
                    * F.col("__srr")
                    - F.lit(3.0) * (F.lit(float(n)) + F.lit(1.0))
                )
                / (
                    F.lit(1.0)
                    - F.col("__tt")
                    / (
                        F.lit(float(n)) * F.lit(float(n)) * F.lit(float(n))
                        - F.lit(float(n))
                    )
                ),
                round_digits,
            )
            + F.lit(0.0)
        ).alias("h_tie_corrected"),
    )


def atkinson_index(
    df,
    group_col: str,
    value_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Per-group Atkinson inequality index at ε=1 -> (group_col, n_pos,
    atkinson): A = 1 − geomean(x)/mean(x), the welfare-theoretic member
    completing the inequality quartet — gini (rank form), theil
    (information form), HHI (moment form), Atkinson (normative form
    with an explicit inequality-aversion parameter; ε=1 weights
    transfers at the bottom of the distribution most). POSITIVE-SUPPORT
    form: x <= 0 rows are EXCLUDED and counted in n_excluded (the
    textbook A=1-whenever-any-zero convention makes the index a
    constant on any corpus with one zero — useless as a screen;
    documented deviation, the mirrors share it).

    Exactness: mean from the UNCAST input sum cast to double once (the
    theil operand convention); Σ ln x is an order-free-enough double
    sum under the zipf vocab-wide-ln round(6) precedent, and
    exp((Σln x)/n) amplifies a sum ulp only multiplicatively (~1e-12
    relative) — round(6)+0.0 on the index. Plan: one group agg —
    exchanges carry (group, double) only."""
    vals = df.select(group_col, F.col(value_col).alias("__xr"))
    pos = vals.filter(F.col("__xr") > 0)
    agg = pos.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_pos"),
        F.sum("__xr").cast("double").alias("__sx"),
        F.sum(F.log(F.col("__xr").cast("double"))).alias("__sl"),
    )
    neg = vals.filter(~(F.col("__xr") > 0)).groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_excluded")
    )
    nn = F.col("n_pos").cast("double")
    return (
        agg.join(F.broadcast(neg), group_col, "left")
        .select(
            group_col,
            "n_pos",
            F.coalesce(F.col("n_excluded"), F.lit(0).cast("long")).alias(
                "n_excluded"
            ),
            (
                F.round(
                    F.lit(1.0)
                    - F.exp(F.col("__sl") / nn) / (F.col("__sx") / nn),
                    round_digits,
                )
                + F.lit(0.0)
            ).alias("atkinson"),
        )
    )


def theil_index(
    df,
    group_col: str,
    value_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Per-group Theil T inequality index -> (group_col, n, theil):
    T = Σ_i (x_i/X)·ln(x_i·n/X) with X the group total — the
    information-theoretic complement of the gini row (same 0 = even
    floor, but unbounded above and DECOMPOSABLE: total T = within-group
    + between-group, which is why inequality audits over hierarchical
    slices prefer it). Zero-valued members contribute 0 (the 0·ln 0
    convention shared with the JS/G2 rows).

    Exactness: the group total X sums the UNCAST input column (exact
    for decimal inputs — the burstiness DECIMAL-operand precedent) and
    casts to double ONCE, mirroring the oracle's exact-DECIMAL-sum-
    then-convert operand-for-operand; then one double division + one
    ln per member ((x / X) * ln(x * n / X)); the member-term double
    sum rides the zipf round(6) precedent; the rounded sum carries a
    +0.0 fold (cancellation on a perfectly-even group lands at tiny
    negative, and exact-even must print 0.0, not -0.0). Plan: one
    group agg for (X, n), broadcast back (the MAD-outliers shape), one
    final group agg — exchanges carry (group, double) only."""
    vals = df.select(group_col, F.col(value_col).alias("__xr"))
    tot = vals.groupBy(group_col).agg(
        F.sum("__xr").cast("double").alias("__sx"),
        F.count(F.lit(1)).cast("double").alias("__nn"),
    )
    vals = vals.select(group_col, F.col("__xr").cast("double").alias("__x"))
    term = F.when(
        F.col("__x") > 0,
        (F.col("__x") / F.col("__sx"))
        * F.log(F.col("__x") * F.col("__nn") / F.col("__sx")),
    ).otherwise(F.lit(0.0))
    return (
        vals.join(F.broadcast(tot), group_col)
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            (F.round(F.sum(term), round_digits) + F.lit(0.0)).alias("theil"),
        )
    )
