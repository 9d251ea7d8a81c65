"""Session-level co-occurrence statistics + PMI (pointwise mutual
information) — the count/PPMI pipeline that precedes classical
distributional embeddings (word2vec-style negative-sampling objectives
factorize a shifted PMI matrix, Levy & Goldberg NeurIPS 2014) and the
standard association measure for behavioral event analysis ("which event
types attract/repel within a session").

The reference's correlation tier (Spark_Graph/histogrammar use) stops at
Pearson over paired numeric measures; PMI over categorical co-occurrence
is the extension a training-data pipeline needs (e.g. building
co-occurrence features or auditing topic mixing at corpus scale).

Scale shape: one shuffle keyed on the group entity to sessionize (window
lag + cumulative sum — the same assignment as the registered
sessionization query), one map-side-collapsing DISTINCT over (session,
type), one BOUNDED self-join keyed on the session (sessions are small by
construction — the inactivity gap caps their length; this is the J1
bounded-group blocking shape, never corpus x corpus), and two tiny
aggregations. Exchanges carry (user, session, type) — never payloads.
The type-marginal attach joins a |vocab|-row frame, which AQE broadcasts
when small without forcing it (event vocabularies are usually tiny, but
nothing here breaks if one isn't).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def assign_sessions(
    events: DataFrame,
    gap_us: int = 1800 * 1_000_000,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """(user, tiebreak, type, us, session_id) under the house
    sessionization rule: a gap > ``gap_us`` microseconds of inactivity
    starts a new session (lag + cumulative flag sum, micro-exact via
    unix_micros, ordered by (ts, tiebreak) for cross-engine
    determinism). The single source of the gap rule — sessionized_types
    and session_transitions both build on this frame, so the rule can
    only ever change in one place."""
    ev = events.select(
        user_col, tiebreak_col, type_col, F.unix_micros(ts_col).alias("us")
    )
    w = W.partitionBy(user_col).orderBy(F.asc("us"), F.asc(tiebreak_col))
    gap = F.col("us") - F.lag("us", 1).over(w)
    flagged = ev.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > gap_us), F.lit(1)).otherwise(F.lit(0)),
    )
    return flagged.withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    ).drop("new_sess")


def sessionized_types(
    events: DataFrame,
    gap_us: int = 1800 * 1_000_000,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """DISTINCT (user, session_id, type) under the house sessionization
    rule (see assign_sessions)."""
    sess = assign_sessions(events, gap_us, user_col, type_col, ts_col, tiebreak_col)
    return sess.select(user_col, "session_id", type_col).distinct()


def session_pmi(
    events: DataFrame,
    gap_us: int = 1800 * 1_000_000,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per type-pair PMI -> (type_a, type_b, n_ab, n_a, n_b, n_sessions,
    pmi), type_a < type_b, one row per pair that co-occurs in at least
    one session.

    pmi = round(ln(n_ab * N / (n_a * n_b)), 6) where N is the total
    session count and n_x the count of sessions containing x — i.e.
    ln(p(a,b) / (p(a) p(b))) over the session event-SET distribution.
    The multiply-then-divide order is pinned to match the oracle SQL
    term-for-term; round(6) absorbs ln/ulp noise per the house float
    discipline. N is a driver scalar (the weighted-pagerank
    verts.count() precedent — one tiny count action, never a collect of
    data rows)."""
    st = sessionized_types(
        events,
        gap_us=gap_us,
        user_col=user_col,
        type_col=type_col,
        ts_col=ts_col,
        tiebreak_col=tiebreak_col,
    )
    # Persisted: the count action below materializes it once and the two
    # downstream consumers (marginals, bounded self-join) reuse the blocks
    # instead of re-running sessionization. Left persisted because the
    # RETURNED plan references it (the pq_topk precedent in the entry
    # file); it is a distinct (user, session, type) projection — the
    # smallest frame in the pipeline.
    st = st.persist()
    n_sessions = st.select(user_col, "session_id").distinct().count()
    marg = st.groupBy(type_col).agg(F.count(F.lit(1)).alias("c"))
    a = st.select(
        F.col(user_col).alias("u"),
        F.col("session_id").alias("s"),
        F.col(type_col).alias("type_a"),
    )
    b = st.select(
        F.col(user_col).alias("u"),
        F.col("session_id").alias("s"),
        F.col(type_col).alias("type_b"),
    )
    pairs = (
        a.join(b, ["u", "s"])
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    ma = marg.select(F.col(type_col).alias("type_a"), F.col("c").alias("n_a"))
    mb = marg.select(F.col(type_col).alias("type_b"), F.col("c").alias("n_b"))
    out = (
        pairs.join(ma, "type_a")
        .join(mb, "type_b")
        .select(
            "type_a",
            "type_b",
            "n_ab",
            "n_a",
            "n_b",
            F.lit(n_sessions).cast("long").alias("n_sessions"),
            F.round(
                F.log(
                    F.col("n_ab").cast("double")
                    * F.lit(float(n_sessions))
                    / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    # Materialization happens downstream; the persist above exists so
    # the count action and the two consumers (marginals, self-join)
    # share one sessionization pass instead of three.
    return out



def session_transitions(
    events: DataFrame,
    gap_us: int = 1800 * 1_000_000,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    round_digits: int = 6,
) -> DataFrame:
    """First-order Markov transition matrix over within-session event
    sequences -> (from_type, to_type, n, n_from, p), one row per
    observed consecutive pair. Sessions per the house 30-min-gap rule;
    transitions never cross a session boundary (a user going idle for
    an hour is a new chain, not a transition). p = round(n / n_from, 6)
    — n_from is the count of transitions LEAVING from_type, so each
    from-row of the matrix sums to ~1 (one double division per cell, no
    sum-order sensitivity anywhere).

    Scale shape: ONE user-key exchange + sort serves both windows (the
    session flag sum and the lead — same partitioning, same ordering),
    then one bounded (from, to) count agg and a |vocab|-row marginal
    attach that AQE broadcasts. Exchanges carry (user, tiebreak, type,
    us) — never payloads."""
    sess = assign_sessions(events, gap_us, user_col, type_col, ts_col, tiebreak_col)
    ws = W.partitionBy(user_col, "session_id").orderBy(
        F.asc("us"), F.asc(tiebreak_col)
    )
    pairs = (
        sess.withColumn("to_type", F.lead(type_col, 1).over(ws))
        .filter(F.col("to_type").isNotNull())
        .groupBy(F.col(type_col).alias("from_type"), "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    marg = pairs.groupBy("from_type").agg(F.sum("n").cast("long").alias("n_from"))
    return pairs.join(marg, "from_type").select(
        "from_type",
        "to_type",
        "n",
        "n_from",
        F.round(
            F.col("n").cast("double") / F.col("n_from").cast("double"),
            round_digits,
        ).alias("p"),
    )
