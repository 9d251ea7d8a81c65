"""Streaming ingest dedup: the incremental delta-vs-corpus near-dup join
(operators/dedup.minhash_dedup_delta) wired into Structured Streaming —
new-batch files arrive, each micro-batch is deduped against the static
corpus, survivors/pairs append to the output sink.

This is the executable form of the 100 TB daily-ingest story: the corpus
side is static (at scale: a materialized append-only band-index table),
the delta arrives as files, and per-micro-batch work is proportional to
the batch's band collisions — never corpus x corpus. foreachBatch gives
exactly-once appends per the checkpoint's batch-id bookkeeping
(re-executed batches overwrite-by-batch-id is the production refinement;
append is correct under AvailableNow's run-once semantics here).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession


def stream_delta_dedup(
    spark: SparkSession,
    corpus_sets: DataFrame,
    delta_sets: DataFrame,
    work_dir: str,
    id_col: str = "doc_id",
    set_col: str = "shingles",
    n_batches: int = 3,
    num_hashes: int = 32,
    num_bands: int = 8,
    jaccard_threshold: float = 70.0,
    shuffle_partitions: int | None = None,
    corpus_banded: DataFrame | None = None,
) -> DataFrame:
    """Run the delta-vs-corpus dedup as an AvailableNow streaming query:
    ``delta_sets`` is staged into ``n_batches`` parquet files, streamed one
    file per micro-batch, and each batch foreachBatch-joins against the
    (persisted) corpus side, appending matched pairs to the result sink.
    The union over micro-batches equals the one-shot batch
    ``minhash_dedup_delta`` exactly — each delta doc is processed once and
    its candidates depend only on the static corpus, never on batching.

    Scale note (r10): the corpus BAND INDEX is built and persisted ONCE
    per run and every micro-batch joins against it — the real
    deployment's materialize-once band-index-table shape. Before r10 each
    batch re-minhashed the whole corpus (narrow but CPU-heavy: num_hashes
    LCG passes over every shingle set, times n_batches); measured ~1.25x
    end-to-end on the sf0.1 corpus, where fixed streaming overhead
    dominates — the factor grows with corpus/batch ratio (PLANS.md
    round 10).

    ``shuffle_partitions`` sizes the PER-MICRO-BATCH shuffles (delta-band
    build, band-collision join, per-pair similarity agg): each batch is a
    delta slice — hundreds of rows locally — yet its exchanges inherit the
    session default, so task-scheduling overhead dominates batch wall
    (the same effect ``run_available_now`` measured for state stores and
    graph's ``_loop_partitions`` measured for loop rounds). Size to DELTA
    volume; the corpus band-index build deliberately stays OUTSIDE the
    override — it is corpus-scale work that wants the cluster default.
    None (the default) leaves the session value untouched.

    ``corpus_banded``: a pre-built, persisted band-index projection of
    ``corpus_sets`` (lsh_banded_projection tag "r", same banding config,
    with sizes) — e.g. the application-wide shared shingle-band cache.
    When provided the per-run index build is skipped entirely and its
    lifecycle belongs to the caller (NOT unpersisted here).
    """
    from scabillmatch_spark.operators.dedup import (
        corpus_band_index,
        minhash_dedup_delta,
    )

    tag = uuid.uuid4().hex[:12]
    in_dir = os.path.join(work_dir, f"delta_in_{tag}")
    out_dir = os.path.join(work_dir, f"pairs_out_{tag}")
    ckpt = os.path.join(work_dir, f"ckpt_{tag}")

    corpus_sets = corpus_sets.persist()
    corpus_sets.count()
    own_banded = corpus_banded is None
    if own_banded:
        corpus_banded = corpus_band_index(
            corpus_sets, id_col, set_col, num_hashes=num_hashes, num_bands=num_bands
        ).persist()
        corpus_banded.count()
    delta_sets.repartition(n_batches).write.mode("overwrite").parquet(in_dir)
    schema = spark.read.parquet(in_dir).schema

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        pairs = minhash_dedup_delta(
            corpus_sets, batch_df, id_col, set_col,
            num_hashes=num_hashes, num_bands=num_bands,
            jaccard_threshold=jaccard_threshold,
            corpus_banded=corpus_banded,
        )
        pairs.write.mode("append").parquet(out_dir)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        q = (
            stream.writeStream.foreachBatch(handle)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if shuffle_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    # result lives in parquet now — release the corpus cache (a
    # caller-provided band index is the caller's to release)
    corpus_sets.unpersist()
    if own_banded:
        corpus_banded.unpersist()
    return spark.read.parquet(out_dir)


def stream_merge_apply(
    spark: SparkSession,
    target: DataFrame,
    delta: DataFrame,
    work_dir: str,
    keys: list[str],
    delete_col: str | None = None,
    n_batches: int = 3,
    broadcast_source: bool = True,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Streaming CDC apply — the lakehouse ingestion pattern: a stream of
    change rows is MERGEd into a stored table one micro-batch at a time
    (foreachBatch + operators/merge.merge_into), each batch rewriting the
    table copy-on-write. The final state equals the one-shot
    ``merge_into(target, delta)`` exactly, because the delta is staged
    key-partitioned (``repartition(n_batches, *keys)``) so no key spans
    two batches, and MERGEs of key-disjoint change sets commute.

    ``broadcast_source=True`` is the scale default: per micro-batch the
    delta slice is small against the huge target, so arbitration is a
    broadcast LEFT join + broadcast anti-join for inserts — the target is
    scanned, never shuffled, and the rewrite stays partition-aligned
    (merge.py's CDC-apply path). The copy-on-write rewrite here swaps the
    whole directory; a table format (Delta/Iceberg) would swap only
    touched files — same plan, finer-grained commit.

    Exactly-once: AvailableNow runs each staged file once; re-executed
    batches under failure re-MERGE idempotently ONLY for upserts (a
    re-applied update/insert is a no-op, a re-applied delete deletes
    nothing) — true transactional retries need the table-format commit
    protocol, documented honestly here.

    ``shuffle_partitions``: per-micro-batch shuffle sizing (set before
    query start — the micro-batch session clone snapshots conf then). The
    broadcast-MERGE itself plans no exchange, but the merged-table
    rewrite and any non-broadcast arbitration inherit it; size to batch
    volume locally, leave None at cluster scale.
    """
    import shutil

    from scabillmatch_spark.operators.merge import merge_into

    tag = uuid.uuid4().hex[:12]
    in_dir = os.path.join(work_dir, f"cdc_in_{tag}")
    tgt_dir = os.path.join(work_dir, f"cdc_tgt_{tag}")
    ckpt = os.path.join(work_dir, f"cdc_ckpt_{tag}")

    target.write.mode("overwrite").parquet(tgt_dir)
    delta.repartition(n_batches, *keys).write.mode("overwrite").parquet(in_dir)
    schema = spark.read.parquet(in_dir).schema

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        cur = spark.read.parquet(tgt_dir)
        merged = merge_into(
            cur, batch_df, keys,
            delete_col=delete_col, broadcast_source=broadcast_source,
        )
        nxt = f"{tgt_dir}_next"
        merged.write.mode("overwrite").parquet(nxt)
        # atomic-enough local swap; a table format replaces this with a
        # metadata commit
        shutil.rmtree(tgt_dir)
        os.rename(nxt, tgt_dir)

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
            .writeStream.foreachBatch(handle)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if shuffle_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.read.parquet(tgt_dir)


def stream_agg_maintain(
    spark: SparkSession,
    delta: DataFrame,
    work_dir: str,
    keys: list[str],
    agg_of,
    add_cols: list[str],
    n_batches: int = 3,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Streaming aggregate maintenance — the ingest-side counter/rollup
    pattern: raw rows stream in, each micro-batch is PARTIALLY aggregated
    (``agg_of(batch) -> keys + add_cols``) and folded into a stored
    aggregate table via operators/merge.incremental_agg_merge, rewriting
    the (small) state copy-on-write. The final state equals
    ``agg_of(delta)`` exactly.

    Unlike stream_merge_apply, the staging needs NO key-disjointness:
    additive merges commute across ARBITRARY splits (the maintenance law
    — exact for counts and DECIMAL sums), so the delta is staged with a
    plain round-robin repartition and keys deliberately DO span
    micro-batches; the equality with the one-shot aggregate is itself
    the proof. At 100 TB scale this replaces a Structured-Streaming
    state store for additive rollups: the state is a plain table sized
    by |keys|, each refresh costs one batch aggregation + one join
    against it, and failure recovery re-reads the last committed state
    instead of replaying a store.

    Exactly-once caveat (same honesty as stream_merge_apply): a
    re-executed batch under failure would DOUBLE-ADD its partials —
    true transactional refresh needs a table-format commit carrying the
    batch id; AvailableNow over staged files runs each batch once here.

    ``shuffle_partitions``: per-micro-batch sizing, set before start
    (the micro-batch session clone snapshots conf then); None at
    cluster scale."""
    import shutil

    from scabillmatch_spark.operators.merge import incremental_agg_merge

    tag = uuid.uuid4().hex[:12]
    in_dir = os.path.join(work_dir, f"agg_in_{tag}")
    st_dir = os.path.join(work_dir, f"agg_st_{tag}")
    ckpt = os.path.join(work_dir, f"agg_ckpt_{tag}")

    agg_of(delta.limit(0)).write.mode("overwrite").parquet(st_dir)
    delta.repartition(n_batches).write.mode("overwrite").parquet(in_dir)
    schema = spark.read.parquet(in_dir).schema

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        cur = spark.read.parquet(st_dir)
        merged = incremental_agg_merge(cur, agg_of(batch_df), keys, add_cols)
        nxt = f"{st_dir}_next"
        merged.write.mode("overwrite").parquet(nxt)
        shutil.rmtree(st_dir)
        os.rename(nxt, st_dir)

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
            .writeStream.foreachBatch(handle)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if shuffle_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.read.parquet(st_dir)
