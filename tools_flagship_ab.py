"""Flagship 1x/2x interleaved A/B at HEAD (r13 verdict What's-wrong #1).

Replicates bench.py's flagship protocol EXACTLY (cold pass -> 2x corpus
build + plan warmup -> System.gc() -> 4 interleaved 1x,2x rounds ->
min over rounds 2-4) with calibration probes bracketing the run, so the
resulting bracket is directly comparable with BENCH_r13's official
flagship_doc_match_2x = 6.59 s reading and with every interleaved
flagship family in PLANS.md (wobble class 2.4-4.6 s at the 2x point).

Optional --unpersist-between: unpersists + rebuilds the 2x token sets
between rounds, isolating the verdict's memory-pressure hypothesis
(bench holds sets2 persisted across ALL rounds).
"""
import sys
import time

from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
from scabillmatch_spark.plans.bill_match import document_match  # noqa: E402
import scale_check as _sck  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def probe(spark, samples=3):
    ts = []
    for _ in range(samples):
        t0 = time.perf_counter()
        spark.range(20_000_000, numPartitions=32).selectExpr(
            "sum((id * 2654435761) % 1000003) AS s"
        ).collect()
        ts.append(time.perf_counter() - t0)
    return round(sorted(ts)[len(ts) // 2], 3)


def main():
    unpersist_between = "--unpersist-between" in sys.argv
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("flagship_ab")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    probe(spark, samples=1)  # codegen compile, untimed
    p_first = probe(spark)
    print(f"# probe_first: {p_first}", flush=True)

    t0 = time.perf_counter()
    document_match(spark, SF_DIR, top=1000).count()
    print(f"# cold_1x: {round(time.perf_counter() - t0, 3)}", flush=True)

    sets2 = _sck.corpus_token_sets(_sck.corpus(spark, SF_DIR, 2))
    _sck.match_time(spark, sets2)  # warm the 2x plan's codegen
    spark.sparkContext._jvm.System.gc()

    trials, trials2 = [], []
    for rnd in range(4):
        t0 = time.perf_counter()
        document_match(spark, SF_DIR, top=1000).count()
        trials.append(round(time.perf_counter() - t0, 3))
        if unpersist_between and rnd > 0:
            sets2.unpersist()
            sets2 = _sck.corpus_token_sets(_sck.corpus(spark, SF_DIR, 2))
        trials2.append(_sck.match_time(spark, sets2))
        print(f"# round {rnd}: 1x={trials[-1]} 2x={trials2[-1]}", flush=True)
    sets2.unpersist()

    p_last = probe(spark)
    print(f"# probe_last: {p_last} drift={round(p_last / p_first, 2)}",
          flush=True)
    print(
        f"RESULT 1x={min(trials[1:])} 2x={min(trials2[1:])} "
        f"trials1x={trials} trials2x={trials2} "
        f"probes=({p_first},{p_last}) "
        f"unpersist_between={unpersist_between}",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
