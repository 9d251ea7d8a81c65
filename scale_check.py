#!/usr/bin/env python
"""Scaling check: run the flagship LSH near-dup pipeline on 1x/2x/4x copies
of the sf0.1 documents corpus (each copy's vocabulary disjoint, so corpus
size scales while the near-dup structure per copy is constant) and report
wall time per scale. Near-linear growth = the blocked plan holds; quadratic
growth would indicate an un-blocked join sneaking in.

Usage: python scale_check.py  ->  one JSON line {"copies": {1: s, 2: s, 4: s}}
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

from scabillmatch_spark.functions import text as TX
from scabillmatch_spark.session import get_spark


def corpus(spark, sf_dir: str, copies: int):
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    parts = []
    for i in range(copies):
        # disjoint vocab per copy: prefix every word with a LETTER copy tag
        # (the tokenizer strips digits, so a "c0"/"c1" tag would collapse all
        # copies onto one vocabulary and make cross-copy pairs quadratic —
        # the check would then measure its own bug, not the engine)
        tag = "q" + chr(97 + i)
        parts.append(
            base.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                F.regexp_replace("text", r"(\w+)", f"{tag}$1").alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def dedup_time(spark, docs) -> float:
    """minhash_lsh_dedup pipeline (shingle MinHash-LSH banded candidates +
    exact verify) — the heaviest non-flagship dedup pipeline; linearity here
    guards the band-join's work ∝ true-collisions property.

    The shingle-set projection is materialized OUTSIDE the timed region
    (mirroring flagship_time's treatment of tokenization): the scan is
    trivially linear, and timing it would mostly measure whether Spark's
    plan-matched cache from a previous identical-plan run was still warm —
    the first version of this check reported 1.97s/19.8s/17.7s for exactly
    that reason (cache hit at 1x, misses at 2x/4x)."""
    from scabillmatch_spark.operators import dedup

    sets = (
        docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
        .select("doc_id", TX.ngram_id_set("text", 3).alias("shingles"))
        .persist()
    )
    sets.count()
    t0 = time.perf_counter()
    dedup.minhash_dedup_pairs(
        docs, "doc_id", "text", shingle_n=3, num_hashes=32, num_bands=8,
        jaccard_threshold=70.0, sets=sets,
    ).count()
    dt = time.perf_counter() - t0
    sets.unpersist()
    return round(dt, 2)


def corpus_token_sets(docs):
    """Tokenized (primary_key, tokens) projection, persisted + materialized.
    Kept OUTSIDE every timed region — persist() is lazy, so without the
    count() the first timed action would charge tokenization of the whole
    (possibly multi-copy) corpus to the match plan. The bench's 2x slope
    point read 62 s instead of ~9 s for exactly that reason.

    Repartitioned to default parallelism BEFORE tokenizing — the same
    single-partition-scan treatment operators/corpus.py gives the 1x
    corpus cache. Without it each scale point's pre-shuffle map stage runs
    on `copies` cores (the sf0.1 parquet arrives as ONE split), and the
    check measures parallelism ramp, not plan growth: the r7/r8 "2x reads
    above 4x" wobble was exactly this — 1x mapped on 1 core, 4x on 4."""
    spark = docs.sparkSession
    sets = (
        docs.repartition(spark.sparkContext.defaultParallelism)
        .select(
            F.col("doc_id").cast("string").alias("primary_key"),
            TX.token_id_set("text").alias("tokens"),
        )
        .persist()
    )
    sets.count()
    return sets


def match_time(spark, sets) -> float:
    """Times the flagship MATCH plan (collapse -> band join -> verify ->
    expand -> top-N) over pre-materialized token sets — the SAME
    plans/bill_match.match_token_sets plan document_match runs, so this
    number is directly slope-comparable with the bench's 1x point (the
    pre-r7 variant skipped the collapse stage and the two points measured
    different plans)."""
    from scabillmatch_spark.plans.bill_match import match_token_sets

    t0 = time.perf_counter()
    match_token_sets(sets, num_hashes=32, num_bands=4, threshold=90.0,
                     top=1000).count()
    return round(time.perf_counter() - t0, 2)


def flagship_time(spark, docs) -> float:
    """corpus_token_sets + match_time in one call (scale_check's per-copy
    harness; the sets persist only for the duration of the call)."""
    sets = corpus_token_sets(docs)
    dt = match_time(spark, sets)
    sets.unpersist()
    return dt


_COPY_OFFSET = 10_000_000


def graph_times(spark, sf_dir: str) -> tuple[dict, dict]:
    """BFS + weighted shortest paths on 1x/2x/4x disjoint copies of the
    similarity graph (one landmark per copy, so multi-source BFS work scales
    with the graph). Guards the iterative-loop cost model: near-linear
    growth = per-round checkpoint/lineage behavior holds; super-linear
    would flag a recurrence of the round-2 lazy-frontier re-execution bug."""
    import __spark_entry__ as entrymod
    from scabillmatch_spark.operators import graph

    base = entrymod._doc_edges(spark, sf_dir).select("src", "dst").persist()
    lm0 = base.agg(F.min("src")).first()[0]
    # warm the edge materialization + BFS/CC codegen so copies=1 isn't
    # charged for one-time costs the larger copies don't pay
    graph.shortest_paths(base, [lm0], max_depth=2).count()
    graph.connected_components(base, max_iter=3).count()

    # Build ALL scale points up front (they're tiny — edge ids only), then
    # INTERLEAVE trials 1x,2x,4x,1x,2x,... (r8 verdict #5): sequential
    # per-copy timing lets one host phase own one scale point — the r7/r8
    # records' recurring "2x reads above 4x" inversion was exactly that.
    # Interleaving distributes phase effects evenly across points; min per
    # point still rejects isolated GC/steal pauses.
    frames: dict[int, object] = {}
    n_edges: dict[int, int] = {}
    for copies in (1, 2, 4):
        parts = [
            base.select(
                (F.col("src") + F.lit(i * _COPY_OFFSET)).alias("src"),
                (F.col("dst") + F.lit(i * _COPY_OFFSET)).alias("dst"),
            )
            for i in range(copies)
        ]
        e = parts[0]
        for p in parts[1:]:
            e = e.union(p)
        # normalize partitioning: union-of-copies inherits copies*32
        # partitions for the same per-partition row count — a harness
        # artifact (a real 4x corpus read from parquet gets partition COUNT
        # from maxPartitionBytes, i.e. fuller partitions, similar count).
        # Without this the iterative loops pay per-task overhead x rounds x
        # copies and the check measures its own construction, not the engine
        # (measured: CC 4x total 24.6s inherited vs 11.9s normalized).
        frames[copies] = e.repartition(32).persist()
        n_edges[copies] = frames[copies].count()

    bfs_res: dict[int, float] = {}
    w_res: dict[int, float] = {}
    cc_res: dict[int, float] = {}

    def trial(fn) -> float:
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    for _round in range(2):  # min-of-2 per point, interleaved
        for copies in (1, 2, 4):
            e = frames[copies]
            lms = [lm0 + i * _COPY_OFFSET for i in range(copies)]
            dt = trial(lambda: graph.shortest_paths(e, lms, max_depth=6).count())
            bfs_res[copies] = min(bfs_res.get(copies, dt), dt)
            we = e.withColumn(
                "weight", ((F.col("src") + F.col("dst")) % 7 + 1).cast("double")
            )
            dt = trial(
                lambda: graph.weighted_shortest_paths(we, lm0, max_iter=6).count()
            )
            w_res[copies] = min(w_res.get(copies, dt), dt)
            # dedup-clustering closer (doc_dup_clusters): CC over the scaled
            # graph — disjoint copies keep per-component diameter constant,
            # so rounds stay flat and wall time should track edge count
            dt = trial(lambda: graph.connected_components(e, max_iter=30).count())
            cc_res[copies] = min(cc_res.get(copies, dt), dt)
    for copies in (1, 2, 4):
        frames[copies].unpersist()
        bfs_res[copies] = round(bfs_res[copies], 2)
        w_res[copies] = round(w_res[copies], 2)
        cc_res[copies] = round(cc_res[copies], 2)
        print(
            f"# graph copies={copies} edges={n_edges[copies]}"
            f" bfs={bfs_res[copies]}s weighted={w_res[copies]}s"
            f" cc={cc_res[copies]}s",
            file=sys.stderr,
        )
    return bfs_res, w_res, cc_res


def text_scoring_times(spark, docs: dict) -> tuple[dict, dict, dict]:
    """BM25 / DSIR / bigram-ppl on the 1x/2x/4x doc copies (r12 ops).
    Query terms are per-copy-prefixed (the corpus vocab is letter-tagged
    per copy), so BM25's matched-postings work scales WITH the corpus —
    an unprefixed query would match nothing past copy 1 and the check
    would measure a no-op. DSIR targets doc_id parity (half of every
    copy), ppl self-trains; all three should track gram volume
    near-linearly — super-linear growth flags an un-broadcast model
    table or an un-pruned explode."""
    from scabillmatch_spark.operators.dsir import dsir_resample
    from scabillmatch_spark.operators.lm import score_perplexity, train_bigram_lm
    from scabillmatch_spark.operators.retrieval import bm25_topk

    def bm25_run(c):
        terms = [
            "q" + chr(97 + i) + t
            for i in range(c)
            for t in ("hash", "join", "shuffle", "window")
        ]
        bm25_topk(docs[c], terms, k=10).count()

    def dsir_run(c):
        dsir_resample(
            docs[c], (F.col("doc_id") % 2 == 0), n=25, n_buckets=1024
        ).count()

    def ppl_run(c):
        uni, bi, v = train_bigram_lm(docs[c])
        score_perplexity(docs[c], uni, bi, v).count()

    runs = {"bm25": bm25_run, "dsir": dsir_run, "ppl": ppl_run}
    res: dict[str, dict] = {k: {} for k in runs}
    for c in (1, 2, 4):  # one untimed warm pass per point (codegen/AQE)
        for fn in runs.values():
            fn(c)
    for _round in range(2):  # interleaved min-of-2
        for c in (1, 2, 4):
            for name, fn in runs.items():
                t0 = time.perf_counter()
                fn(c)
                dt = time.perf_counter() - t0
                res[name][c] = min(res[name].get(c, dt), dt)
    for c in (1, 2, 4):
        print(
            "# text_scoring copies=%d bm25=%.2fs dsir=%.2fs ppl=%.2fs"
            % (c, res["bm25"][c], res["dsir"][c], res["ppl"][c]),
            file=sys.stderr,
        )
        for name in runs:
            res[name][c] = round(res[name][c], 2)
    return res["bm25"], res["dsir"], res["ppl"]


def curation2_times(spark, docs: dict) -> tuple[dict, dict, dict]:
    """Substring-rewrite / phrase-search / MinHash-audit on the 1x/2x/4x
    copies (r12 banked ops). Phrase: ONE search of the copy-a phrase per
    point (r15 fix) — the dominant cost is the tokenize+posexplode+
    filter scan, which is ∝ corpus regardless of how many copies still
    match, while the true-match set stays constant (copy-a docs exist at
    every level), so the slope isolates the operator. The previous form
    ran c searches at copy level c: c scans × c·n positions = a c²
    HOOK-SHAPED cost that r15's full record misread as operator
    superlinearity (1/2.13/4.64). Duplicate spans and banded audit
    collisions are per-copy-internal (disjoint vocab), so both should
    track the corpus near-linearly — super-linear audit growth flags
    the unigram-set collision bug class (the 3.2M-pair measurement that
    rejected it)."""
    from scabillmatch_spark.operators.dedup import minhash_estimate_audit
    from scabillmatch_spark.operators.retrieval import phrase_search
    from scabillmatch_spark.operators.substring import strip_duplicate_spans

    par = spark.sparkContext.defaultParallelism

    def strip_run(c):
        strip_duplicate_spans(docs[c], n=20, num_partitions=par).agg(
            F.sum("kept_checksum")
        ).collect()

    def phrase_run(c):
        phrase_search(docs[c], ["qatable", "qascan"]).count()

    def audit_run(c):
        sets = docs[c].select(
            "doc_id", TX.ngram_id_set("text", 3).alias("shingles")
        )
        minhash_estimate_audit(sets, "doc_id", "shingles").agg(
            F.sum("n_agree")
        ).collect()

    runs = {"substring": strip_run, "phrase": phrase_run, "audit": audit_run}
    res: dict[str, dict] = {k: {} for k in runs}
    for c in (1, 2, 4):  # one untimed warm pass per point
        for fn in runs.values():
            fn(c)
    for _round in range(2):  # interleaved min-of-2
        for c in (1, 2, 4):
            for name, fn in runs.items():
                t0 = time.perf_counter()
                fn(c)
                dt = time.perf_counter() - t0
                res[name][c] = min(res[name].get(c, dt), dt)
    for c in (1, 2, 4):
        print(
            "# curation2 copies=%d substring=%.2fs phrase=%.2fs audit=%.2fs"
            % (c, res["substring"][c], res["phrase"][c], res["audit"][c]),
            file=sys.stderr,
        )
        for name in runs:
            res[name][c] = round(res[name][c], 2)
    return res["substring"], res["phrase"], res["audit"]


def session4_times(
    spark, docs: dict, sf_dir: str
) -> tuple[dict, dict, dict, dict]:
    """Winnowing fingerprints / session PMI / JS divergence / Markov
    transitions on 1x/2x/4x (r12 session-4 banked ops) — returns the
    four per-copies timing dicts (winnow, pmi, jsdiv, markov).
    Winnow runs over the disjoint-vocab doc copies, so the
    shared-fingerprint census stays per-copy-internal and the whole
    report should track the corpus near-linearly — super-linear growth
    flags census blowup. PMI scales the EVENTS side: copies union with
    offset user_ids (sessions stay per-copy-internal, the type vocab is
    constant), so pair space is fixed while counts scale — the
    sessionize + distinct + bounded self-join chain should be linear."""
    from scabillmatch_spark.operators.cooccur import session_pmi
    from scabillmatch_spark.operators.winnow import winnow_fingerprint_report

    par = spark.sparkContext.defaultParallelism
    # read_table, not raw parquet: the generator's naive TIMESTAMP(MICROS)
    # reads as TIMESTAMP_NTZ under Spark 4, which unix_micros rejects
    from scabillmatch_spark.io.sources import read_table

    base_ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    events = {}
    for c in (1, 2, 4):
        parts = [
            base_ev.select(
                (F.col("event_id") + F.lit(i * 100_000_000)).alias("event_id"),
                (F.col("user_id") + F.lit(i * 10_000_000)).alias("user_id"),
                "event_type",
                "ts",
            )
            for i in range(c)
        ]
        ev = parts[0]
        for p in parts[1:]:
            ev = ev.union(p)
        events[c] = ev

    # Both operators persist an internal frame (fpx resp. the session-type
    # set) that a repeated identical plan would silently reuse — the timed
    # trials would then measure cache reads, not the pipeline. Clear the
    # cache per run so every trial pays the full per-invocation cost (the
    # other families' persisted projections are already released by the
    # time this family runs).
    def winnow_run(c):
        spark.catalog.clearCache()
        winnow_fingerprint_report(docs[c], n=4, w=6, num_partitions=par).agg(
            F.sum("fp_checksum")
        ).collect()

    def pmi_run(c):
        spark.catalog.clearCache()
        session_pmi(events[c]).count()

    # jsdiv over the disjoint-vocab doc copies: each copy carries its own
    # lang column, so pairs form within AND across copies but shared
    # vocabulary exists only within a copy — join work stays ∝ corpus.
    # markov over the offset-user event copies: chains are per-copy.
    from scabillmatch_spark.operators.cooccur import session_transitions
    from scabillmatch_spark.operators.divergence import slice_js_divergence

    def jsdiv_run(c):
        spark.catalog.clearCache()
        base = spark.read.parquet(f"{sf_dir}/documents.parquet")
        parts = []
        for i in range(c):
            tag = "q" + chr(97 + i)
            parts.append(
                base.select(
                    F.concat(F.lit(tag), F.col("lang")).alias("lang"),
                    F.regexp_replace("text", r"(\w+)", f"{tag}$1").alias(
                        "text"
                    ),
                )
            )
        d = parts[0]
        for p in parts[1:]:
            d = d.union(p)
        slice_js_divergence(
            d.repartition(par), "lang", "text"
        ).agg(F.sum("n_shared_vocab")).collect()

    def markov_run(c):
        spark.catalog.clearCache()
        session_transitions(events[c]).count()

    runs = {
        "winnow": winnow_run,
        "pmi": pmi_run,
        "jsdiv": jsdiv_run,
        "markov": markov_run,
    }
    res: dict[str, dict] = {k: {} for k in runs}
    for c in (1, 2, 4):  # one untimed warm pass per point
        for fn in runs.values():
            fn(c)
    for _round in range(2):  # interleaved min-of-2
        for c in (1, 2, 4):
            for name, fn in runs.items():
                t0 = time.perf_counter()
                fn(c)
                dt = time.perf_counter() - t0
                res[name][c] = min(res[name].get(c, dt), dt)
    for c in (1, 2, 4):
        print(
            "# session4 copies=%d winnow=%.2fs pmi=%.2fs jsdiv=%.2fs"
            " markov=%.2fs"
            % (
                c,
                res["winnow"][c],
                res["pmi"][c],
                res["jsdiv"][c],
                res["markov"][c],
            ),
            file=sys.stderr,
        )
        for name in runs:
            res[name][c] = round(res[name][c], 2)
    return res["winnow"], res["pmi"], res["jsdiv"], res["markov"]


def emb_copies(spark, sf_dir: str, copies: int):
    """1x/2x/4x embeddings corpus: copy i>0 flips a copy-distinct block of
    16 coordinates, so the same base vector lands at ~cos 0.5 across copies
    (16 of 64 flipped -> expected cosine (64-2*16)/64) and never crosses
    the 0.98 near-dup threshold — per-copy near-dup structure constant
    while corpus size scales, the disjoint-vocab trick's vector analog.
    A plain union would plant C(C,2) EXACT cross-copy duplicates per base
    vector and the check would measure its own quadratic output, not the
    engine."""

    def flipped(lo: int):
        return F.transform(
            "v", lambda x, j: F.when((j >= lo) & (j < lo + 16), -x).otherwise(x)
        )

    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    parts = []
    for i in range(copies):
        v = F.col("v") if i == 0 else flipped(16 * (i - 1))
        parts.append(
            base.select(
                (F.col("vec_id") + i * 10_000_000).alias("vec_id"), v.alias("v")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def ann_times(spark, sf_dir: str) -> tuple[dict, dict]:
    """Near-dup LSH cascade + BRP bucket join on 1x/2x/4x embedding copies
    (the two rows resized in r13 — the in-plan join widths under test at
    scale). Both operators persist internal frames, so clearCache()
    before EVERY pass or later trials measure cache reads; interleaved
    min-of-3 per the house protocol."""
    import __spark_entry__ as entrymod

    embs = {c: emb_copies(spark, sf_dir, c) for c in (1, 2, 4)}
    n = {c: embs[c].count() for c in (1, 2, 4)}
    parts = max(8, spark.sparkContext.defaultParallelism // 4)

    def nd_run(c):
        return entrymod._emb_near_dup_pairs(spark, sf_dir, parts, emb=embs[c]).count()

    def brp_run(c):
        return entrymod.q_emb_brp_euclidean_join(spark, sf_dir, emb=embs[c]).count()

    for c in (1, 2, 4):  # untimed codegen/broadcast warmup per point
        spark.catalog.clearCache()
        nd_run(c)
        spark.catalog.clearCache()
        brp_run(c)
    nd_trials: dict[int, list] = {c: [] for c in (1, 2, 4)}
    brp_trials: dict[int, list] = {c: [] for c in (1, 2, 4)}
    for _ in range(3):
        for c in (1, 2, 4):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            nd_run(c)
            nd_trials[c].append(round(time.perf_counter() - t0, 2))
        for c in (1, 2, 4):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            brp_run(c)
            brp_trials[c].append(round(time.perf_counter() - t0, 2))
    nd_res = {c: min(nd_trials[c]) for c in (1, 2, 4)}
    brp_res = {c: min(brp_trials[c]) for c in (1, 2, 4)}
    for c in (1, 2, 4):
        print(
            f"# ann copies={c} vecs={n[c]} near_dup={nd_res[c]}s {nd_trials[c]}"
            f" brp={brp_res[c]}s {brp_trials[c]}",
            file=sys.stderr,
        )
    return nd_res, brp_res


def ann_search_times(spark, sf_dir: str) -> tuple[dict, dict, dict]:
    """1x/2x/4x slopes for the three top-k SEARCH ANN tiers (r13 verdict
    Next-round #6 — the pair-join tiers are covered by ann_times; these
    measure IVF's nprobe-vs-n, PQ's shortlist-vs-n and the hyperplane
    cascade's bucket-occupancy-vs-n shapes). All three run 10 fixed probe
    queries over the flipped-copy corpus, so expected work is ~linear in
    n: IVF scans nprobe/n_cells of the corpus per query (plus the KMeans
    fit, itself ~linear per iteration), PQ scans n ADC codes + a fixed
    shortlist re-rank, the cascade joins each query against its
    ~n/2^8-occupancy bucket. IVF/PQ include their in-plan brute-force
    truth sides (linear: 10 broadcast queries x n). clearCache before
    every pass (internal persists), interleaved min-of-3."""
    import __spark_entry__ as entrymod

    embs = {c: emb_copies(spark, sf_dir, c) for c in (1, 2, 4)}
    wide = {
        c: embs[c].select("vec_id", F.col("v").alias("embedding"))
        for c in (1, 2, 4)
    }

    runs = {
        "lsh": lambda c: entrymod.q_emb_lsh_ann(
            spark, sf_dir, emb=embs[c]
        ).count(),
        "ivf": lambda c: entrymod.q_emb_ivf_ann(
            spark, sf_dir, emb=wide[c]
        ).count(),
        "pq": lambda c: entrymod.q_emb_pq_ann(
            spark, sf_dir, emb=wide[c]
        ).count(),
    }
    for c in (1, 2, 4):  # untimed codegen/fit warmup per point
        for fn in runs.values():
            spark.catalog.clearCache()
            fn(c)
    trials: dict[str, dict[int, list]] = {
        name: {c: [] for c in (1, 2, 4)} for name in runs
    }
    for _ in range(3):
        for name, fn in runs.items():
            for c in (1, 2, 4):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn(c)
                trials[name][c].append(round(time.perf_counter() - t0, 2))
    res = {
        name: {c: min(trials[name][c]) for c in (1, 2, 4)} for name in runs
    }
    for name in runs:
        print(
            f"# ann_search {name}: "
            + " ".join(f"{c}x={res[name][c]}s{trials[name][c]}" for c in (1, 2, 4)),
            file=sys.stderr,
        )
    return res["lsh"], res["ivf"], res["pq"]


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark("scale_check")
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()  # warmup
    # throwaway full-pipeline runs: the 1x points must be steady-state, not
    # charged for JIT/codegen/broadcast warmup the 2x/4x points don't pay
    warm = corpus(spark, sf_dir, 1)
    flagship_time(spark, warm)
    dedup_time(spark, warm)
    # drop the warmup's plan-matched cache so no scale point inherits it
    # (minhash_dedup_pairs persists internal projections it cannot unpersist
    # before its action; the 1x point would otherwise be gifted warm data
    # while 2x/4x pay full price)
    spark.catalog.clearCache()
    # Build all scale points up front and INTERLEAVE trials (r8 verdict #5):
    # min-of-2 SEQUENTIAL let one host phase own one point — the 2x point
    # read ABOVE the 4x point in both r7 runs and in r8 (2.47/5.35/3.33), an
    # offset-class impossibility. Interleaved 1x,2x,4x,1x,... min-of-3
    # distributes phase effects evenly and tolerates one bad window per
    # point (the same medicine that fixed the bench's 1x/2x flagship pair).
    docs = {c: corpus(spark, sf_dir, c) for c in (1, 2, 4)}
    n_docs = {c: docs[c].count() for c in (1, 2, 4)}
    sets = {c: corpus_token_sets(docs[c]) for c in (1, 2, 4)}
    # one untimed pass per point: each scale point's FIRST execution
    # uniquely pays broadcast/codegen/AQE-stat warmup (measured 7.47 s vs
    # 2.26-2.53 s steady on the 2x point) — min-of-3 would merely discard
    # it, but warming keeps all three recorded trials steady-state
    for c in (1, 2, 4):
        match_time(spark, sets[c])
        dedup_time(spark, docs[c])
    flag_trials: dict[int, list] = {c: [] for c in (1, 2, 4)}
    dedup_trials: dict[int, list] = {c: [] for c in (1, 2, 4)}
    for _round in range(3):
        for c in (1, 2, 4):
            flag_trials[c].append(match_time(spark, sets[c]))
        for c in (1, 2, 4):
            dedup_trials[c].append(dedup_time(spark, docs[c]))
    results, dedup_results = {}, {}
    for c in (1, 2, 4):
        sets[c].unpersist()
        results[c] = min(flag_trials[c])
        dedup_results[c] = min(dedup_trials[c])
        print(
            f"# copies={c} docs={n_docs[c]} flagship={results[c]}s"
            f" {flag_trials[c]} dedup={dedup_results[c]}s {dedup_trials[c]}",
            file=sys.stderr,
        )
    bm25_res, dsir_res, ppl_res = text_scoring_times(spark, docs)
    sub_res, phr_res, aud_res = curation2_times(spark, docs)
    win_res, pmi_res, jsd_res, mkv_res = session4_times(spark, docs, sf_dir)
    bfs_res, w_res, cc_res = graph_times(spark, sf_dir)
    nd_res, brp_res = ann_times(spark, sf_dir)
    lsh_res, ivf_res, pq_res = ann_search_times(spark, sf_dir)
    print(
        json.dumps(
            {
                "metric": "flagship_scaling",
                "unit": "sec",
                "copies": results,
                "dedup": dedup_results,
                "bm25": bm25_res,
                "dsir": dsir_res,
                "ppl": ppl_res,
                "substring": sub_res,
                "phrase": phr_res,
                "audit": aud_res,
                "winnow": win_res,
                "pmi": pmi_res,
                "jsdiv": jsd_res,
                "markov": mkv_res,
                "graph_bfs": bfs_res,
                "graph_weighted": w_res,
                "graph_cc": cc_res,
                "ann_near_dup": nd_res,
                "ann_brp": brp_res,
                "ann_lsh": lsh_res,
                "ann_ivf": ivf_res,
                "ann_pq": pq_res,
            }
        )
    )


if __name__ == "__main__":
    main()
