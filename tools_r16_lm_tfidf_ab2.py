#!/usr/bin/env python
"""r16 decomposition A/B #2: WHICH part of the lm/tfidf rewrites moves the
wall. Arms per family, interleaved min-of-N (same session, noop sink):

  lm_old      two-aggregation raw-text training (pre-r16)
  lm_mid      single-pass sentinel-pair model, raw-text STRING keys
              (isolates the §2.4 pass-merge from the cache feed)
  lm_new      the REGISTERED q_doc_lm_perplexity at current HEAD (at the
              rejected intermediate HEAD this was the id-keyed cache
              feed; at the shipped HEAD it is the single-pass raw-text
              shape — functionally lm_mid)

  tfidf_old     raw tokenize on every self-join replica (pre-r16)
  tfidf_pterms  old shape + per-call persisted flat `terms` table — one
                tokenize pass, replicas read a flat (long,string,long)
                cached frame (no array deserialization)
  tfidf_new     the REGISTERED q_tfidf_cosine_pairs at current HEAD (at
                the rejected intermediate HEAD: cached tok_ids feed; at
                the shipped HEAD: the persisted-terms shape)

Usage: python tools_r16_lm_tfidf_ab2.py [n_trials] [sf_dir]
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

    spark = get_spark("lm_tfidf_ab2", shuffle_partitions=32)
    import __spark_entry__ as E
    from scabillmatch_spark.functions import text as TX
    from scabillmatch_spark.operators import corpus
    from scabillmatch_spark.operators.lm import (
        _bigrams,
        score_perplexity,
        train_bigram_lm,
    )

    sc = spark.sparkContext
    corpus.doc_token_sets(spark, sf_dir).count()

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
        v = uni.count()
        scored = score_perplexity(docs, uni, bi, v, add_k=0.5)
        return scored.select(
            "doc_id", "n_bigrams", F.round("ppl", 4).alias("ppl_r")
        )

    def lm_mid_df():
        docs = E._t(spark, sf_dir, "documents").select("doc_id", "text")
        uni, bi, v = train_bigram_lm(docs)  # r16 single-pass, string keys
        scored = score_perplexity(docs, uni, bi, v, add_k=0.5)
        return scored.select(
            "doc_id", "n_bigrams", F.round("ppl", 4).alias("ppl_r")
        )

    def _tfidf_from(docs, persist_terms: bool):
        n_docs = docs.select(F.count(F.lit(1)).alias("n"))
        terms = (
            docs.select("doc_id", F.explode("toks").alias("term"))
            .groupBy("doc_id", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
        if persist_terms:
            terms = terms.persist()
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

    def tfidf_raw_docs():
        return E._t(spark, sf_dir, "documents").select(
            "doc_id", "lang", "source", "n_chars", TX.tokens("text").alias("toks")
        )

    arms = {
        "lm_old": lm_old_df,
        "lm_mid": lm_mid_df,
        "lm_new": lambda: E.q_doc_lm_perplexity(spark, sf_dir),
        "tfidf_old": lambda: _tfidf_from(tfidf_raw_docs(), False),
        "tfidf_pterms": lambda: _tfidf_from(tfidf_raw_docs(), True),
        "tfidf_new": lambda: E.q_tfidf_cosine_pairs(spark, sf_dir),
    }

    # value identity within each family
    for fam, names in (("lm", ["lm_old", "lm_mid", "lm_new"]),
                       ("tfidf", ["tfidf_old", "tfidf_pterms", "tfidf_new"])):
        ref = arms[names[0]]()
        for other in names[1:]:
            o = arms[other]()
            d = ref.exceptAll(o).count() + o.exceptAll(ref).count()
            print(f"{fam}: {names[0]} vs {other} exceptAll-diff={d}")
            assert d == 0
    print("identical-values: OK")

    for name, fn in arms.items():
        noop(fn())  # warm
    res: dict[str, list[float]] = {k: [] for k in arms}
    for _ in range(trials):
        for name, fn in arms.items():
            sc.setJobDescription(f"ab2: {name}")
            t0 = time.perf_counter()
            noop(fn())
            res[name].append(time.perf_counter() - t0)
    for k, v in res.items():
        print(f"{k}: trials={[round(x, 2) for x in v]} min={min(v):.2f}")


if __name__ == "__main__":
    main()
