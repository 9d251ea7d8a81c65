"""SparkSession factory.

Scale notes: AQE on (coalesce partitions + skew-join) replaces the
reference's hand-tuned ``repartition(4*count/1000)`` heuristics
(reference: ExtractCandidates.scala:102-103, feature/Utils.scala:110-121).
Shuffle partitions default to the local core count for tests; on a real
cluster leave them high and let AQE coalesce.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "scabillmatch_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-appropriate defaults.

    AQE is enabled so runtime statistics drive partition coalescing and
    skew-join splitting; on a 1000-executor cluster the same code runs
    unchanged with a higher initial ``spark.sql.shuffle.partitions``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # similarity scoring is CPU-dense per byte: prefer more, smaller
        # post-shuffle partitions over AQE's 64m default
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # testdata events.ts is parquet TIMESTAMP(NANOS); read as long, the
        # reader converts to a micros timestamp (matches DuckDB's truncation)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # local mode: the driver JVM is the whole cluster, so the driver
        # heap IS executor memory. 16g thrashed GC once the shared caches
        # (corpus token arrays, scored-pair relations, graph edges) of a
        # dense corpus accumulated across a long query sequence — measured
        # 3x inflation across the whole bench (296s -> 97s at 48g, same
        # code/data). On a real cluster this is spark.executor.memory
        # sizing, not driver sizing.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
