#!/usr/bin/env python
"""r16 optimization round: A/B for the corpus-cache feeds of
doc_lm_perplexity (single-pass id-keyed LM training) and
tfidf_cosine_pairs (id-keyed terms from the shared token projection).

Arms, interleaved per trial (same session, noop sink, guide §1.4):

  lm_old      raw-text two-aggregation training + string-keyed scoring
              (the pre-r16 shape, inlined below)
  lm_new      q_doc_lm_perplexity — single-pass sentinel-pair model over
              the session token cache, long keys

  tfidf_old   raw-text tokenize on every self-join replica (pre-r16
              shape, inlined below)
  tfidf_new   q_tfidf_cosine_pairs — cached tok_ids feed, long term keys

Identical output values are asserted per pair of arms before timing
(exceptAll both ways — the float columns are rounded INSIDE each query,
so the comparison is on the exact returned rows). The lm_new arm's
one-time model build (persisted count table) executes at DataFrame
CONSTRUCTION (the eager vocab count), exactly like the old shape's eager
uni.count(); both arms therefore rebuild their model inside the timed
region of every trial — the comparison is honest about the build.

Usage: python tools_r16_lm_tfidf_ab.py [n_trials] [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from scabillmatch_spark.session import get_spark

    spark = get_spark("lm_tfidf_ab", shuffle_partitions=32)
    import __spark_entry__ as E
    from scabillmatch_spark.functions import text as TX
    from scabillmatch_spark.operators import corpus
    from scabillmatch_spark.operators.lm import (
        _bigrams,
        score_perplexity,
    )

    sc = spark.sparkContext

    # the registered queries read the token cache pre-warmed in the bench;
    # both arms see the same warm state
    corpus.doc_token_sets(spark, sf_dir).count()

    # ---- OLD doc_lm_perplexity: raw text, two-aggregation training ----
    def lm_old_df():
        docs = E._t(spark, sf_dir, "documents").select("doc_id", "text")
        toks = docs.select(TX.tokens(F.col("text")).alias("__toks"))
        uni = (
            toks.select(F.explode("__toks").alias("w1"))
            .groupBy("w1")
            .agg(F.count(F.lit(1)).alias("c1"))
        )
        bi = (
            toks.select(F.explode(_bigrams(F.col("__toks"))).alias("bg"))
            .select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
            .groupBy("w1", "w2")
            .agg(F.count(F.lit(1)).alias("c2"))
        )
        v = uni.count()  # the old eager vocab pass
        scored = score_perplexity(docs, uni, bi, v, add_k=0.5)
        return scored.select(
            "doc_id", "n_bigrams", F.round("ppl", 4).alias("ppl_r")
        )

    # ---- OLD tfidf_cosine_pairs: raw tokenize per self-join replica ----
    def tfidf_old_df():
        docs = E._t(spark, sf_dir, "documents").select(
            "doc_id", "lang", "source", "n_chars", TX.tokens("text").alias("toks")
        )
        n_docs = docs.select(F.count(F.lit(1)).alias("n"))
        terms = (
            docs.select("doc_id", F.explode("toks").alias("term"))
            .groupBy("doc_id", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
        dfreq = (
            terms.groupBy("term")
            .agg(F.count(F.lit(1)).alias("dfq"))
            .crossJoin(F.broadcast(n_docs))
            .filter(10 * F.col("dfq") <= F.col("n"))
        )
        w = (
            terms.join(dfreq, "term")
            .withColumn(
                "weight",
                F.col("tf") * F.log((F.col("n") + 1.0) / (F.col("dfq") + 1.0)),
            )
            .select("doc_id", "term", "weight")
        )
        norms = w.groupBy("doc_id").agg(
            F.sqrt(F.sum(F.col("weight") * F.col("weight"))).alias("norm")
        )
        meta = docs.select("doc_id", "lang", "source", "n_chars")
        w1 = w.join(meta, "doc_id").join(norms, "doc_id")
        w2 = (
            w.select(
                F.col("doc_id").alias("doc_id2"),
                F.col("term").alias("term2"),
                F.col("weight").alias("weight2"),
            )
            .join(
                meta.select(
                    F.col("doc_id").alias("doc_id2"),
                    F.col("lang").alias("lang2"),
                    F.col("source").alias("source2"),
                    F.col("n_chars").alias("n_chars2"),
                ),
                "doc_id2",
            )
            .join(
                norms.select(
                    F.col("doc_id").alias("doc_id2"), F.col("norm").alias("norm2")
                ),
                "doc_id2",
            )
        )
        joined = w1.join(
            w2,
            (F.col("term") == F.col("term2"))
            & (F.col("doc_id") < F.col("doc_id2"))
            & (F.col("lang") == F.col("lang2"))
            & (F.col("source") != F.col("source2"))
            & (
                F.abs(F.col("n_chars") - F.col("n_chars2"))
                / F.sqrt(F.col("n_chars") * F.col("n_chars2"))
                < 0.26
            ),
        )
        dots = joined.groupBy("doc_id", "doc_id2", "norm", "norm2").agg(
            F.sum(F.col("weight") * F.col("weight2")).alias("dot")
        )
        cos = dots.withColumn(
            "cosine100", 100.0 * F.col("dot") / (F.col("norm") * F.col("norm2"))
        )
        return cos.filter(F.col("cosine100") >= 60.0).select(
            F.col("doc_id").alias("d1"),
            F.col("doc_id2").alias("d2"),
            F.round("cosine100", 6).alias("cosine100"),
        )

    pairs = [
        ("lm", lm_old_df, lambda: E.q_doc_lm_perplexity(spark, sf_dir)),
        ("tfidf", tfidf_old_df, lambda: E.q_tfidf_cosine_pairs(spark, sf_dir)),
    ]

    for name, old_fn, new_fn in pairs:
        a, b = old_fn(), new_fn()
        n_a = a.count()
        diff = a.exceptAll(b).count() + b.exceptAll(a).count()
        print(f"{name}: rows={n_a} exceptAll-diff={diff}")
        assert diff == 0, f"{name}: arms disagree"
    print("identical-values: OK (both pairs)")

    for name, old_fn, new_fn in pairs:
        # one untimed warm pass per arm, then interleaved timing
        noop(old_fn()); noop(new_fn())
        res = {"old": [], "new": []}
        for _ in range(trials):
            sc.setJobDescription(f"{name}_ab: OLD raw-text shape")
            t0 = time.perf_counter(); noop(old_fn()); res["old"].append(time.perf_counter() - t0)
            sc.setJobDescription(f"{name}_ab: NEW cache-fed shape")
            t0 = time.perf_counter(); noop(new_fn()); res["new"].append(time.perf_counter() - t0)
        for k, v in res.items():
            print(f"{name}_{k}: trials={[round(x, 2) for x in v]} min={min(v):.2f}")


if __name__ == "__main__":
    main()
