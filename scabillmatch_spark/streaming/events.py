"""Structured Streaming over the events table (north-star extension; the
reference is batch-only — SURVEY §2.12).

Design rule: every streaming aggregation is a plain function over a
DataFrame, applied identically to ``spark.read`` and ``spark.readStream``
inputs — batch and stream share operator code, and the batch form is the
DuckDB-oracle-checkable twin of the streaming form.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _half_up_round(x: float, digits: int) -> float:
    """Python-side twin of F.round / DuckDB ROUND on doubles (HALF_UP on
    the shortest decimal repr). The stateful pandas kernels round in
    Python, where the builtin round() banker-rounds and would diverge
    from the SQL oracle on an exact .5 tie at the target digit — the
    same class hypothesis flushed out of the test mirrors in r12 s3.
    Module-level so the UDF closures stay picklable."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-digits)
    # + 0.0 folds the signed zero: quantize(-1e-7) is Decimal('-0.0000')
    # -> float -0.0, but F.round's BigDecimal path has no signed zero
    return float(Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP)) + 0.0


def _normalize_ts(df: DataFrame) -> DataFrame:
    """Normalize the generator's ts vintages (nanos->long, naive-micros->NTZ)
    to an instant-typed TIMESTAMP interpreted as UTC — same rule as
    ``io.sources.read_table``."""
    t = dict(df.dtypes).get("ts")
    if t == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif t == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (explicit schema — file
    streams can't infer). The schema is taken from the parquet footer via a
    one-off batch read so the stream matches whatever ts vintage the
    generator produced; ``_normalize_ts`` then maps it to UTC TIMESTAMP."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    file_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the file source requires a directory: point at the sf dir and glob the
    # events file
    raw = (
        spark.readStream.schema(file_schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return _normalize_ts(raw)


# --- shared batch/stream transformations -----------------------------------


def tumbling_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling-window counts + value sums per event_type (F.window)."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n",
            F.round("sum_value", 4).alias("sum_value"),
        )
    )


def sliding_avg(events: DataFrame, window: str = "1 hour", slide: str = "30 minutes") -> DataFrame:
    """Sliding-window average value per event_type."""
    return (
        events.groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.round(F.avg("value"), 4).alias("avg_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "avg_value",
        )
    )


def session_windows(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user (F.session_window — the streaming-native
    form of the batch lag/cumsum sessionization in __spark_entry__).

    Boundary semantics: a session's window is [first_ts, last_ts + gap)
    with an EXCLUSIVE end, so an event arriving exactly ``gap`` after the
    previous one starts a NEW session — equivalently, consecutive events
    share a session iff their time difference is strictly less than
    ``gap``. The oracle's lag-based sessionization uses >= for its
    new-session test accordingly."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )


def stream_static_enrich(
    events: DataFrame,
    user_dim: DataFrame,
    window: str = "1 hour",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static join — the remaining §2.12 join class after
    stream-stream: each streaming event enriched against a static per-user
    dimension carrying a per-user reference value, then tumbling counts of
    events exceeding their user's reference, per event_type.

    The static side is a batch DataFrame; Spark re-plans it per micro-batch
    and broadcasts it when small — no streaming state at all for the join
    (unlike stream-stream, which must buffer both sides). At scale this is
    the canonical "enrich a TB/h stream against a slowly-changing dimension
    table" shape; the dimension refresh cadence is the restart cadence.
    Identical over batch input, so the batch twin is the DuckDB oracle.
    """
    dim = user_dim.select("user_id", "user_ref")
    # explicit hint: micro-batch plans don't get AQE's runtime join
    # re-planning, so a stats-less dimension source would sort-merge-join
    # EVERY micro-batch; broadcast_dim=False opts out for a huge dimension
    # (then pre-bucket both sides on user_id instead)
    if broadcast_dim:
        dim = F.broadcast(dim)
    return (
        events.join(dim, "user_id")
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("value") > F.col("user_ref"), 1).otherwise(0)
            ).alias("n_above_avg"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n",
            F.col("n_above_avg").cast("long").alias("n_above_avg"),
        )
    )


def dedup_events(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming dedup by event_id with watermarked state eviction."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def interval_join(
    left: DataFrame,
    right: DataFrame,
    lag_minutes: int = 15,
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream INNER interval join: pair each left event with the
    right events of the same user in the ``lag_minutes`` window ending at
    the left event's timestamp (the canonical attribution join — purchase
    joined to the clicks that preceded it).

    Both sides carry a watermark and the join condition includes the
    time-range bound, which is exactly what lets Structured Streaming evict
    join state (unbounded state otherwise — the #1 stream-stream join
    mistake). Applied to batch DataFrames, ``withWatermark`` is a no-op and
    the same code degenerates to a plain range join — the DuckDB-oracle
    twin, per this module's shared batch/stream design rule.

    Scale shape: state per key is bounded by watermark + lag; the join
    shuffles both sides on user_id once.
    """
    l = left.withWatermark("ts", watermark).select(
        "user_id",
        F.col("event_id").alias("left_id"),
        F.col("ts").alias("l_ts"),
    )
    r = right.withWatermark("ts", watermark).select(
        F.col("user_id").alias("r_user"),
        F.col("event_id").alias("right_id"),
        F.col("ts").alias("r_ts"),
    )
    return (
        l.join(
            r,
            (F.col("user_id") == F.col("r_user"))
            & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {int(lag_minutes)} MINUTES"))
            & (F.col("r_ts") <= F.col("l_ts")),
            "inner",
        )
        .select(
            "user_id",
            "left_id",
            "right_id",
            (F.unix_micros(F.col("l_ts")) - F.unix_micros(F.col("r_ts"))).alias(
                "us_before"
            ),
        )
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): per-user
    running (event count, value sum) maintained across micro-batches —
    the 'custom stateful operator' the north star calls for; there is no
    built-in running-total aggregation with user-managed state.

    State: (count long, total double) per user_id. Works identically over a
    batch DataFrame? No — this one is stream-only by construction; its batch
    twin is a plain groupBy (see test_streaming_multimodal)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("n", T.LongType()), T.StructField("total", T.DoubleType())]
    )

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [_half_up_round(total, 4)]}
        )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """The same per-user running totals on Spark 4's transformWithState API
    (StatefulProcessor + ValueState, RocksDB-backed) — the successor to
    applyInPandasWithState with explicitly-typed state and timer support.
    Both forms are kept: one operator, two stateful-API generations.

    Environment note: transformWithStateInPandas talks to the JVM over a
    protobuf channel, so it needs the ``google.protobuf`` package at
    runtime — PERMANENTLY absent in this container (re-verified round 6:
    no module, no network for pip download, no vendored wheel; recorded in
    COVERAGE.md "Permanent environment close-outs"). The implementation is
    complete and the test exercises it wherever protobuf exists
    (test_transform_with_state_running_totals skips otherwise);
    ``running_user_totals`` is the env-independent production path here."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("n", T.LongType()), T.StructField("total", T.DoubleType())]
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._totals.get() if self._totals.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [_half_up_round(total, 4)]}
            )

        def close(self) -> None:
            pass

    # transformWithState requires the RocksDB state store provider
    events.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


# --- runner -----------------------------------------------------------------


def stream_to_parquet(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    mode: str = "append",
) -> None:
    """Production sink pattern: foreachBatch -> parquet append with exactly-
    once batch ids tracked in the checkpoint. Runs over currently-available
    input (AvailableNow) and returns when drained."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode(mode if batch_id == 0 else "append").parquet(path)

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_available_now(
    stream_df: DataFrame,
    output_mode: str = "complete",
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Execute a streaming query over all currently-available input
    (Trigger.AvailableNow) into a memory sink; return the result as a batch
    DataFrame. Gives deterministic, oracle-checkable streaming results.

    ``shuffle_partitions`` sizes the STATE STORES for this query:
    Structured Streaming partitions stateful operators by
    ``spark.sql.shuffle.partitions`` as of the first query start (baked
    into the checkpoint thereafter), and per-micro-batch overhead scales
    with store count — a stream-stream join at the batch default of 32 ran
    3x slower than at 8 purely on store setup/commit (measured: 9.0s vs
    3.1s at sf0.1). Size it to expected state volume, not to batch
    parallelism. The session conf is set for the query's lifetime and
    restored afterwards."""
    spark = stream_df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        name = f"mem_{uuid.uuid4().hex[:12]}"
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if shuffle_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    result = spark.table(name)
    return result
