"""Command-line entry points — the reference's app-per-conf workflow
(wrapper scripts rewriting HOCON and re-running sbt assembly per run,
wrapper_workflow1.py:16-18) replaced by one argparse CLI with runtime config.

    python -m scabillmatch_spark.cli featurize --input bills.json --output feats/
    python -m scabillmatch_spark.cli candidates --input feats/ --output pairs/ --strategy kmeans --k 150
    python -m scabillmatch_spark.cli score --pairs pairs/ --features feats/ --measure jaccard --output scored/
    python -m scabillmatch_spark.cli lsh-join --input bills.json --output scored/
    python -m scabillmatch_spark.cli postprocess --scored scored/ --docs bills.json --output out/ --top 100
    python -m scabillmatch_spark.cli wordcount --input bills.json --output counts/ --ngram 5
    python -m scabillmatch_spark.cli graph --scored scored/ --algo pagerank --output pr/

Each subcommand is one lazily-planned Spark job (workflow 1's two processes +
objectFile handoff collapse into `candidates`+`score`, or a single `lsh-join`).
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import functions as F


def _spark(args):
    from scabillmatch_spark.session import get_spark

    return get_spark(f"scabillmatch-{args.cmd}")


def _read_docs(spark, path: str):
    from scabillmatch_spark.io.sources import BILL_SCHEMA, read_bills_json

    if path.endswith((".json", ".jsonl")) or "*" in path:
        return read_bills_json(spark, path)
    return spark.read.parquet(path)


def cmd_featurize(args) -> None:
    from scabillmatch_spark.ml.cluster import kmeans_labels
    from scabillmatch_spark.ml.featurize import FeatureConfig, extract_features

    spark = _spark(args)
    docs = _read_docs(spark, args.input)
    if args.docversion:
        docs = docs.filter(F.col("docversion") == args.docversion)
    if args.min_length:
        docs = docs.filter(F.length("content") >= args.min_length)
    cfg = FeatureConfig(
        num_features=args.num_features,
        use_idf=not args.no_idf,
        ngram=args.ngram,
        stem=args.stem,
    )
    out, _ = extract_features(docs, cfg)
    if args.kmeans_k:
        out, cost = kmeans_labels(out, k=args.kmeans_k, max_iter=args.kmeans_iters)
        print(f"kmeans training cost (WSSSE analog): {cost}", file=sys.stderr)
    else:
        out = out.withColumn("prediction", F.lit(-1))
    out.write.mode("overwrite").parquet(args.output)


def cmd_candidates(args) -> None:
    from scabillmatch_spark.operators.blocking import candidate_pairs

    spark = _spark(args)
    feats = spark.read.parquet(args.input)
    pairs = candidate_pairs(
        feats.select("primary_key", "state", "prediction", "length"),
        id_col="primary_key",
        group_col=None if args.keep_in_state else "state",
        block_col="prediction" if args.strategy == "kmeans" else None,
        length_col="length" if args.length_ratio else None,
        allow_cartesian=args.strategy == "all-pairs",
    )
    pairs.select("pk1", "pk2").write.mode("overwrite").parquet(args.output)


def cmd_score(args) -> None:
    from scabillmatch_spark.ml.kernels import vector_similarity
    from scabillmatch_spark.operators.pairs import score_pairs

    spark = _spark(args)
    pairs = spark.read.parquet(args.pairs)
    feats = spark.read.parquet(args.features)
    measure = vector_similarity(args.measure)
    scored = score_pairs(pairs, feats, lambda a, b: measure(a, b))
    scored.write.mode("overwrite").parquet(args.output)


def cmd_lsh_join(args) -> None:
    from scabillmatch_spark.ml.featurize import FeatureConfig, extract_features
    from scabillmatch_spark.ml.lsh import minhash_similarity_join

    spark = _spark(args)
    docs = _read_docs(spark, args.input)
    cfg = FeatureConfig(num_features=args.num_features, use_idf=False, ngram=args.ngram)
    feats, _ = extract_features(docs, cfg)
    scored = minhash_similarity_join(
        feats, None, "primary_key",
        num_hash_tables=args.hash_tables, dist_threshold=args.threshold,
    )
    scored.write.mode("overwrite").parquet(args.output)


def cmd_dedup_delta(args) -> None:
    """Incremental ingest: near-dups between a NEW batch and the existing
    corpus via the asymmetric band join (never corpus x corpus)."""
    from scabillmatch_spark.functions import text as TX
    from scabillmatch_spark.operators.dedup import minhash_dedup_delta

    spark = _spark(args)

    def sets_of(path):
        d = _read_docs(spark, path)
        return d.select(
            F.col(args.id_col),
            TX.ngram_ids_from_token_ids(
                TX.ordered_token_ids(args.text_col), args.shingle_n
            ).alias("shingles"),
        )

    out = minhash_dedup_delta(
        sets_of(args.corpus), sets_of(args.delta),
        id_col=args.id_col, set_col="shingles",
        num_hashes=args.num_hashes, num_bands=args.bands,
        jaccard_threshold=args.threshold,
    )
    out.write.mode("overwrite").parquet(args.output)


def cmd_postprocess(args) -> None:
    from scabillmatch_spark.operators.pairs import enrich_pairs, make_light, make_skim, top_n

    spark = _spark(args)
    scored = spark.read.parquet(args.scored)
    skimmed = top_n(scored, args.top, ascending=args.ascending)
    make_light(skimmed).write.mode("overwrite").json(f"{args.output}/light")
    if args.docs:
        docs = _read_docs(spark, args.docs)
        make_skim(enrich_pairs(skimmed, docs)).coalesce(1).write.mode("overwrite").json(
            f"{args.output}/skim"
        )


def cmd_wordcount(args) -> None:
    from scabillmatch_spark.functions import text as TX

    spark = _spark(args)
    docs = _read_docs(spark, args.input)
    toks = TX.tokens("content")
    grams = F.explode(TX.ngrams(toks, args.ngram) if args.ngram > 1 else toks).alias("ngram")
    counts = (
        docs.select(grams)
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), F.asc("ngram"))
    )
    counts.write.mode("overwrite").parquet(args.output)


def cmd_graph(args) -> None:
    from scabillmatch_spark.operators import graph

    spark = _spark(args)
    scored = spark.read.parquet(args.scored)
    edges = scored.select(F.col("pk1").alias("src"), F.col("pk2").alias("dst"))
    if args.algo == "pagerank":
        out = graph.pagerank(
            edges,
            reset_prob=args.reset_prob,
            max_iter=10 if args.iters is None else args.iters,
            num_shuffle_partitions=args.loop_partitions,
        )
    elif args.algo == "triangles":
        if args.loop_partitions is not None:
            sys.exit("--loop-partitions: triangles is a one-shot join, not a loop")
        out = graph.triangle_count_per_vertex(edges)
    elif args.algo == "components":
        # components converge in graph-diameter rounds (early-stopped), so
        # the budget only needs to be an upper bound — 50 covers any
        # plausible near-dup graph; connected_components warns if exhausted
        out = graph.connected_components(
            edges,
            max_iter=50 if args.iters is None else args.iters,
            num_shuffle_partitions=args.loop_partitions,
        )
    elif args.algo == "lpa":
        out = graph.label_propagation(
            edges,
            max_iter=5 if args.iters is None else args.iters,
            num_shuffle_partitions=args.loop_partitions,
        )
    elif args.algo == "wpagerank":
        # similarity-weighted pagerank through the generic pregel surface
        w_edges = scored.select(
            F.col("pk1").alias("src"), F.col("pk2").alias("dst"),
            F.col("similarity").alias("w"),
        )
        e = w_edges.unionByName(
            w_edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
            )
        )
        wout = e.groupBy(F.col("src").alias("id")).agg(F.sum("w").alias("wout"))
        verts = graph.vertices_from_edges(e).cache()
        n = verts.count()
        out = graph.pregel(
            e,
            verts.join(wout, "id"),
            initial_state=F.lit(1.0 / n),
            send_to_dst=F.col("src.state") * F.col("edge.w") / F.col("src.wout"),
            agg_msgs=F.sum("msg"),
            update_state=F.lit(args.reset_prob / n)
            + F.lit(1.0 - args.reset_prob) * F.coalesce(F.col("msg"), F.lit(0.0)),
            max_iter=10 if args.iters is None else args.iters,
            num_shuffle_partitions=args.loop_partitions,
        ).select("id", F.col("state").alias("pagerank"))
        verts.unpersist()
    elif args.algo == "paths":
        # witnessing shortest PATHS between two vertex ids (GraphFrames
        # bfs form; --algo bfs returns hop distances only)
        if args.landmark is None or args.to is None:
            sys.exit("--algo paths needs --landmark <from-id> and --to <to-id>")
        out = graph.bfs(
            edges,
            F.col("id") == args.landmark,
            F.col("id") == args.to,
            max_path_length=10 if args.iters is None else args.iters,
            num_shuffle_partitions=args.loop_partitions,
        )
    else:
        out = graph.shortest_paths(
            edges,
            args.landmark,
            max_depth=10 if args.iters is None else args.iters,
            num_shuffle_partitions=args.loop_partitions,
        )
    out.write.mode("overwrite").parquet(args.output)


def cmd_curate(args) -> None:
    from scabillmatch_spark.functions import text as TX
    from scabillmatch_spark.operators import curation, textstats as TS

    spark = _spark(args)
    docs = _read_docs(spark, args.input)
    tc, idc = args.text_col, args.id_col
    if args.op == "decontaminate" and not args.eval_docs:
        sys.exit("curate --op decontaminate requires --eval-docs")
    if args.op == "ppl-filter":
        from scabillmatch_spark.operators.lm import perplexity_filter

        out = perplexity_filter(
            docs, max_ppl=args.max_ppl, min_count=args.min_count,
            id_col=idc, text_col=tc,
        )
        out.write.mode("overwrite").parquet(args.output)
        return
    if args.op == "dsir":
        from scabillmatch_spark.operators.dsir import dsir_resample

        if not args.target_where:
            sys.exit("curate --op dsir requires --target-where (SQL predicate)")
        out = dsir_resample(
            docs, F.expr(args.target_where), n=args.k,
            n_buckets=args.buckets, id_col=idc, text_col=tc,
        )
        out.write.mode("overwrite").parquet(args.output)
        return
    if args.op == "winnow":
        from scabillmatch_spark.operators.winnow import winnow_fingerprint_report

        out = winnow_fingerprint_report(
            docs.select(idc, tc), n=args.ngram, w=args.window,
            id_col=idc, text_col=tc,
            num_partitions=spark.sparkContext.defaultParallelism,
        )
        out.write.mode("overwrite").parquet(args.output)
        return
    if args.op == "decontaminate":
        grams = docs.select(
            F.col(idc),
            TX.ngram_ids_from_token_ids(
                TX.ordered_token_ids(tc), args.ngram
            ).alias("gram_ids"),
        )
        ev = _read_docs(spark, args.eval_docs).select(
            F.col(idc),
            TX.ngram_ids_from_token_ids(
                TX.ordered_token_ids(tc), args.ngram
            ).alias("gram_ids"),
        )
        out = curation.decontamination_hits(grams, ev, id_col=idc)
    elif args.op == "stratified-sample":
        out = curation.stratified_sample(
            docs, args.strata.split(","), args.k, id_col=idc
        )
    elif args.op == "pack":
        sized = docs.withColumn("n_tokens", TS.token_count(tc))
        out = curation.pack_sequences(
            sized, args.budget, args.strata.split(","), order_col=idc
        )
    elif args.op == "pii-scrub":
        out = docs.select(
            idc, *curation.pii_counts(tc), curation.redact_pii(tc).alias("redacted")
        )
    elif args.op == "paragraph-dedup":
        out = curation.dedup_paragraphs(
            docs.select(idc, tc), idc, tc, args.delimiter
        )
    elif args.op == "chunk":
        out = curation.chunk_documents(
            docs.select(idc, tc), idc, tc,
            chunk_tokens=args.chunk_tokens, stride=args.stride,
        )
    elif args.op == "weighted-sample":
        sized = docs.withColumn("n_tokens", TS.token_count(tc))
        out = curation.weighted_sample(
            sized, args.strata.split(","), args.k, "n_tokens", id_col=idc
        )
    elif args.op == "mixture-sample":
        if not args.mix:
            sys.exit("curate --op mixture-sample requires --mix k=frac,...")
        fractions = {}
        for item in args.mix.split(","):
            k, _, v = item.partition("=")
            if not _ or not k:
                sys.exit(f"bad --mix entry {item!r}; expected stratum=fraction")
            fractions[k] = float(v)
        out = curation.mixture_sample(
            docs, fractions, stratum_col=args.strata.split(",")[0], id_col=idc
        )
    else:  # repetition
        out = docs.select(idc, *curation.repetition_stats(tc, args.ngram))
    out.write.mode("overwrite").parquet(args.output)


def cmd_search(args) -> None:
    from scabillmatch_spark.operators.retrieval import bm25_topk, phrase_search

    spark = _spark(args)
    docs = _read_docs(spark, args.input)
    terms = [t for t in args.terms.split(",") if t]
    if args.phrase:
        out = phrase_search(
            docs, terms, id_col=args.id_col, text_col=args.text_col
        )
    else:
        out = bm25_topk(
            docs, terms, k=args.k, id_col=args.id_col, text_col=args.text_col
        )
    out.write.mode("overwrite").parquet(args.output)


def cmd_analyze(args) -> None:
    from scabillmatch_spark.operators import analytics, stats

    spark = _spark(args)
    df = spark.read.parquet(args.input)
    if args.op == "cohort":
        out = analytics.cohort_retention(
            df, args.id_col, args.ts_col, granularity=args.granularity
        )
    elif args.op == "rfm":
        out = analytics.rfm_scores(df, args.id_col, args.ts_col, args.value_col)
    elif args.op == "entropy":
        if not args.group_col:
            sys.exit("analyze --op entropy requires --group-col (the type column)")
        out = analytics.user_entropy(df, args.id_col, args.group_col)
    elif args.op == "lift":
        if not args.group_col:
            sys.exit("analyze --op lift requires --group-col (the item column)")
        out = analytics.basket_lift(
            df, args.id_col, args.group_col, min_support=args.min_support
        )
    elif args.op == "gini":
        if not args.group_col:
            sys.exit("analyze --op gini requires --group-col")
        out = stats.gini(df, args.group_col, args.value_col, args.id_col)
    elif args.op == "mad":
        if not args.group_col:
            sys.exit("analyze --op mad requires --group-col")
        out = stats.mad_outliers(df, args.group_col, args.value_col, k=args.k)
    elif args.op == "pmi":
        from scabillmatch_spark.operators.cooccur import session_pmi

        if not args.group_col:
            sys.exit("analyze --op pmi requires --group-col (the type column)")
        out = session_pmi(
            df, gap_us=args.gap_s * 1_000_000, user_col=args.id_col,
            type_col=args.group_col, ts_col=args.ts_col,
            tiebreak_col=args.tiebreak_col,
        )
    else:  # zipf: df must be a (group, term, freq) relation
        if not args.group_col:
            sys.exit("analyze --op zipf requires --group-col")
        out = stats.zipf_fit(df, args.group_col)
    out.write.mode("overwrite").parquet(args.output)


def cmd_merge(args) -> None:
    from scabillmatch_spark.operators.merge import merge_into

    spark = _spark(args)
    out = merge_into(
        spark.read.parquet(args.target),
        spark.read.parquet(args.source),
        args.keys.split(","),
        update_cols=args.update_cols.split(",") if args.update_cols else None,
        insert=not args.no_insert,
        delete_col=args.delete_col,
        broadcast_source=args.broadcast_source,
    )
    out.write.mode("overwrite").parquet(args.output)


def cmd_diff(args) -> None:
    from scabillmatch_spark.operators.merge import snapshot_diff

    spark = _spark(args)
    out = snapshot_diff(
        spark.read.parquet(args.old),
        spark.read.parquet(args.new),
        args.keys.split(","),
        compare_cols=args.compare_cols.split(",") if args.compare_cols else None,
    )
    out.write.mode("overwrite").parquet(args.output)


def cmd_fuzzy_join(args) -> None:
    from scabillmatch_spark.operators.blocking import blocked_edit_distance_join

    spark = _spark(args)
    docs = _read_docs(spark, args.input)
    out = blocked_edit_distance_join(
        docs, args.id_col, args.text_col,
        max_distance=args.max_distance,
        block_cols=args.block_cols.split(",") if args.block_cols else None,
        prefix_len=args.prefix_len,
    )
    out.write.mode("overwrite").parquet(args.output)


def cmd_compact(args) -> None:
    import math

    from scabillmatch_spark.io.sources import compact_parquet, write_zorder

    spark = _spark(args)
    if args.zorder_by:
        # Z-order rewrite: size the file count like compact_parquet, then
        # Morton-cluster on the given columns (multi-dim pruning layout)
        jvm = spark.sparkContext._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(args.input)
        fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
        total = fs.getContentSummary(hpath).getLength()
        n = max(1, math.ceil(total / args.target_bytes))
        write_zorder(
            spark.read.parquet(args.input), args.output,
            args.zorder_by.split(","), num_files=n,
            quantile_buckets=args.quantile_buckets,
        )
    else:
        n = compact_parquet(
            spark,
            args.input,
            args.output,
            target_file_bytes=args.target_bytes,
            sort_cols=args.sort_by.split(",") if args.sort_by else None,
        )
    print(f"compacted into {n} file(s)", file=sys.stderr)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="scabillmatch_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    f = sub.add_parser("featurize", help="clean/tokenize/TF-IDF [+kmeans labels]")
    f.add_argument("--input", required=True)
    f.add_argument("--output", required=True)
    f.add_argument("--docversion", default=None)
    f.add_argument("--min-length", type=int, default=0)
    f.add_argument("--num-features", type=int, default=2**14)
    f.add_argument("--no-idf", action="store_true")
    f.add_argument("--ngram", type=int, default=None)
    f.add_argument("--stem", action="store_true")
    f.add_argument("--kmeans-k", type=int, default=0)
    f.add_argument("--kmeans-iters", type=int, default=40)
    f.set_defaults(fn=cmd_featurize)

    c = sub.add_parser("candidates", help="blocked candidate pair generation")
    c.add_argument("--input", required=True)
    c.add_argument("--output", required=True)
    c.add_argument("--strategy", choices=["all-pairs", "kmeans"], default="kmeans")
    c.add_argument("--keep-in-state", action="store_true")
    c.add_argument("--length-ratio", action="store_true")
    c.set_defaults(fn=cmd_candidates)

    s = sub.add_parser("score", help="similarity-score candidate pairs")
    s.add_argument("--pairs", required=True)
    s.add_argument("--features", required=True)
    s.add_argument("--measure", default="jaccard")
    s.add_argument("--output", required=True)
    s.set_defaults(fn=cmd_score)

    l = sub.add_parser("lsh-join", help="single-plan MinHash LSH similarity join")
    l.add_argument("--input", required=True)
    l.add_argument("--output", required=True)
    l.add_argument("--num-features", type=int, default=2**14)
    l.add_argument("--ngram", type=int, default=5)
    l.add_argument("--hash-tables", type=int, default=100)
    l.add_argument("--threshold", type=float, default=0.99)
    l.set_defaults(fn=cmd_lsh_join)

    pp = sub.add_parser("postprocess", help="top-N skim/light outputs")
    pp.add_argument("--scored", required=True)
    pp.add_argument("--docs", default=None)
    pp.add_argument("--output", required=True)
    pp.add_argument("--top", type=int, default=100)
    pp.add_argument("--ascending", action="store_true")
    pp.set_defaults(fn=cmd_postprocess)

    w = sub.add_parser("wordcount", help="n-gram frequency table")
    w.add_argument("--input", required=True)
    w.add_argument("--output", required=True)
    w.add_argument("--ngram", type=int, default=5)
    w.set_defaults(fn=cmd_wordcount)

    g = sub.add_parser("graph", help="graph analytics over scored pairs")
    g.add_argument("--scored", required=True)
    g.add_argument("--output", required=True)
    g.add_argument(
        "--algo",
        choices=["pagerank", "triangles", "bfs", "components", "lpa",
                 "wpagerank", "paths"],
        default="pagerank",
    )
    g.add_argument("--reset-prob", type=float, default=0.15)
    g.add_argument("--to", default=None,
                   help="target vertex id for --algo paths (source via "
                        "--landmark)")
    # default None -> per-algo default in cmd_graph (components needs
    # graph-diameter rounds, far more than pagerank's damped fixpoint)
    g.add_argument("--iters", type=int, default=None)
    g.add_argument("--landmark", default=None)
    g.add_argument("--loop-partitions", type=int, default=None,
                   help="shuffle partitions for the iterative loop's "
                        "per-round frames (default: session/cluster value; "
                        "size to frame volume on small graphs)")
    g.set_defaults(fn=cmd_graph)

    cu = sub.add_parser("curate", help="training-data curation ops over a doc table")
    cu.add_argument("--input", required=True)
    cu.add_argument("--output", required=True)
    cu.add_argument(
        "--op",
        choices=[
            "decontaminate", "stratified-sample", "weighted-sample", "pack",
            "pii-scrub", "repetition", "paragraph-dedup", "mixture-sample",
            "chunk", "ppl-filter", "dsir", "winnow",
        ],
        required=True,
    )
    cu.add_argument("--text-col", default="content")
    cu.add_argument("--id-col", default="primary_key")
    cu.add_argument("--eval-docs", help="benchmark/eval corpus (decontaminate)")
    cu.add_argument("--ngram", type=int, default=4)
    cu.add_argument("--k", type=int, default=100, help="rows per stratum (sample)")
    cu.add_argument("--budget", type=int, default=2048, help="tokens per pack")
    cu.add_argument("--strata", default="state", help="comma-separated stratum/pack cols")
    cu.add_argument("--delimiter", default=". ", help="unit delimiter (paragraph-dedup)")
    cu.add_argument("--mix", help="stratum=fraction,... mixture weights (mixture-sample)")
    cu.add_argument("--chunk-tokens", type=int, default=256, help="window size (chunk)")
    cu.add_argument("--stride", type=int, default=192, help="window step (chunk)")
    cu.add_argument("--window", type=int, default=6,
                    help="winnowing window w in n-gram positions (winnow)")
    cu.add_argument("--max-ppl", type=float, default=1000.0,
                    help="keep docs with bigram-LM perplexity <= this (ppl-filter)")
    cu.add_argument("--min-count", type=int, default=1,
                    help="bigram count-table tail prune (ppl-filter)")
    cu.add_argument("--target-where", default=None,
                    help="SQL predicate defining the DSIR target slice (dsir)")
    cu.add_argument("--buckets", type=int, default=1024,
                    help="hashed n-gram buckets (dsir)")
    cu.set_defaults(fn=cmd_curate)

    bm = sub.add_parser("search", help="BM25 lexical top-k retrieval over a doc table")
    bm.add_argument("--input", required=True)
    bm.add_argument("--output", required=True)
    bm.add_argument("--terms", required=True, help="comma-separated query terms")
    bm.add_argument("--k", type=int, default=10)
    bm.add_argument("--text-col", default="content")
    bm.add_argument("--id-col", default="primary_key")
    bm.add_argument(
        "--phrase", action="store_true",
        help="treat --terms as an exact ordered phrase (positional match)",
    )
    bm.set_defaults(fn=cmd_search)

    dd = sub.add_parser(
        "dedup-delta", help="incremental near-dup: new batch vs existing corpus"
    )
    dd.add_argument("--corpus", required=True, help="existing corpus doc table")
    dd.add_argument("--delta", required=True, help="new-batch doc table")
    dd.add_argument("--output", required=True)
    dd.add_argument("--text-col", default="content")
    dd.add_argument("--id-col", default="primary_key")
    dd.add_argument("--shingle-n", type=int, default=3)
    dd.add_argument("--num-hashes", type=int, default=32)
    dd.add_argument("--bands", type=int, default=8)
    dd.add_argument("--threshold", type=float, default=70.0)
    dd.set_defaults(fn=cmd_dedup_delta)

    mg = sub.add_parser("merge", help="MERGE INTO / CDC upsert (update/delete/insert)")
    mg.add_argument("--target", required=True, help="target table (parquet)")
    mg.add_argument("--source", required=True, help="source/delta table (parquet)")
    mg.add_argument("--output", required=True)
    mg.add_argument("--keys", required=True, help="comma-separated join keys")
    mg.add_argument("--update-cols", default=None,
                    help="columns updated on match (default: all shared payload cols)")
    mg.add_argument("--delete-col", default=None,
                    help="boolean source column flagging deletes")
    mg.add_argument("--no-insert", action="store_true",
                    help="skip WHEN NOT MATCHED THEN INSERT")
    mg.add_argument("--broadcast-source", action="store_true",
                    help="small-delta scale path: broadcast the source; "
                         "the target is never shuffled")
    mg.set_defaults(fn=cmd_merge)

    df_ = sub.add_parser("diff", help="CDC generation: diff two snapshots into change rows")
    df_.add_argument("--old", required=True, help="old snapshot (parquet)")
    df_.add_argument("--new", required=True, help="new snapshot (parquet)")
    df_.add_argument("--output", required=True)
    df_.add_argument("--keys", required=True, help="comma-separated key columns")
    df_.add_argument("--compare-cols", default=None,
                     help="columns diffed for updates (default: shared payload)")
    df_.set_defaults(fn=cmd_diff)

    fz = sub.add_parser("fuzzy-join", help="prefix-blocked Levenshtein fuzzy self-join")
    fz.add_argument("--input", required=True)
    fz.add_argument("--output", required=True)
    fz.add_argument("--text-col", default="content")
    fz.add_argument("--id-col", default="primary_key")
    fz.add_argument("--max-distance", type=int, default=10)
    fz.add_argument("--block-cols", default=None, help="comma-separated block columns")
    fz.add_argument("--prefix-len", type=int, default=8)
    fz.set_defaults(fn=cmd_fuzzy_join)

    co = sub.add_parser("compact", help="small-file compaction / sorted rewrite")
    co.add_argument("--input", required=True)
    co.add_argument("--output", required=True)
    co.add_argument("--target-bytes", type=int, default=128 * 1024 * 1024)
    co.add_argument("--sort-by", default=None, help="comma-separated range-cluster cols")
    co.add_argument("--zorder-by", default=None,
                    help="comma-separated Z-order cluster cols (overrides --sort-by)")
    co.add_argument("--quantile-buckets", action="store_true",
                    help="equal-frequency Z-order bins (for skewed cols)")
    co.set_defaults(fn=cmd_compact)

    an = sub.add_parser(
        "analyze",
        help="behavioral/statistical analytics over a parquet table "
        "(cohort | rfm | entropy | lift | gini | mad | zipf)",
    )
    an.add_argument("--input", required=True)
    an.add_argument("--output", required=True)
    an.add_argument(
        "--op", required=True,
        choices=["cohort", "rfm", "entropy", "lift", "gini", "mad", "zipf", "pmi"],
    )
    an.add_argument("--id-col", default="primary_key",
                    help="user/customer/basket id column (op-dependent)")
    an.add_argument("--ts-col", default="ts")
    an.add_argument("--value-col", default="value",
                    help="amount/metric column (rfm, gini, mad)")
    an.add_argument("--group-col", default=None,
                    help="grouping column (entropy type, lift item, gini/mad/zipf group)")
    an.add_argument("--granularity", default="month", choices=["month", "year"])
    an.add_argument("--min-support", type=int, default=2)
    an.add_argument("--k", type=float, default=3.0, help="MAD multiplier")
    an.add_argument("--tiebreak-col", default="event_id",
                    help="within-instant order column (pmi sessionization)")
    an.add_argument("--gap-s", type=int, default=1800,
                    help="session inactivity gap in seconds (pmi)")
    an.set_defaults(fn=cmd_analyze)
    return p


def main(argv: list[str] | None = None) -> None:
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
