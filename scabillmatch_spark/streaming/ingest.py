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
) -> DataFrame:
    """Run the delta-vs-corpus dedup as an AvailableNow streaming query:
    ``delta_sets`` is staged into ``n_batches`` parquet files, streamed one
    file per micro-batch, and each batch foreachBatch-joins against the
    (persisted) corpus side, appending matched pairs to the result sink.
    The union over micro-batches equals the one-shot batch
    ``minhash_dedup_delta`` exactly — each delta doc is processed once and
    its candidates depend only on the static corpus, never on batching.

    Scale note: the corpus band projection is recomputed per micro-batch
    from the persisted set frame (narrow compute, no shuffle); a real
    deployment materializes it once as a band-index table and swaps it in.
    """
    from scabillmatch_spark.operators.dedup import minhash_dedup_delta

    tag = uuid.uuid4().hex[:12]
    in_dir = os.path.join(work_dir, f"delta_in_{tag}")
    out_dir = os.path.join(work_dir, f"pairs_out_{tag}")
    ckpt = os.path.join(work_dir, f"ckpt_{tag}")

    corpus_sets = corpus_sets.persist()
    corpus_sets.count()
    delta_sets.repartition(n_batches).write.mode("overwrite").parquet(in_dir)
    schema = spark.read.parquet(in_dir).schema

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        pairs = minhash_dedup_delta(
            corpus_sets, batch_df, id_col, set_col,
            num_hashes=num_hashes, num_bands=num_bands,
            jaccard_threshold=jaccard_threshold,
        )
        pairs.write.mode("append").parquet(out_dir)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # result lives in parquet now — release the corpus cache
    corpus_sets.unpersist()
    return spark.read.parquet(out_dir)
