"""Unit tests for the training-data curation operators (decontamination,
stratified sampling, sequence packing, repetition profiling) — semantics on
hand-built inputs plus the plan shapes that make them scale."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from scabillmatch_spark.operators import curation


def _formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _grams(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, gram_ids array<long>")


def test_decontamination_hits_semantics(spark):
    train = _grams(
        spark,
        [
            (1, [10, 20, 30]),  # shares 10, 20
            (2, [40, 50]),      # shares nothing
            (3, [20, 99]),      # shares 20
        ],
    )
    eval_ = _grams(spark, [(100, [10, 20]), (101, [20, 60])])
    out = {
        r["doc_id"]: r["n_hits"]
        for r in curation.decontamination_hits(train, eval_).collect()
    }
    # doc 2 is clean and must be absent; hits count DISTINCT shared grams
    assert out == {1: 2, 3: 1}


def test_decontamination_eval_side_broadcasts(spark):
    train = _grams(spark, [(i, [i, i + 1]) for i in range(20)])
    eval_ = _grams(spark, [(100, [5, 6])])
    plan = _formatted(curation.decontamination_hits(train, eval_))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_stratified_sample_exact_k_and_deterministic(spark):
    df = spark.createDataFrame(
        [(i, "s%d" % (i % 3)) for i in range(30)], "doc_id long, src string"
    )
    a = curation.stratified_sample(df, ["src"], 4).collect()
    b = curation.stratified_sample(df, ["src"], 4).collect()
    assert sorted(r["doc_id"] for r in a) == sorted(r["doc_id"] for r in b)
    per = {}
    for r in a:
        per.setdefault(r["src"], []).append(r["__rk"])
    assert all(sorted(v) == [1, 2, 3, 4] for v in per.values())
    # stratum smaller than k: keeps all rows, ranks 1..n
    tiny = spark.createDataFrame([(1, "x"), (2, "x")], "doc_id long, src string")
    assert curation.stratified_sample(tiny, ["src"], 5).count() == 2


def test_pack_sequences_start_offset_semantics(spark):
    df = spark.createDataFrame(
        [(i, "en", 600) for i in range(10)], "doc_id long, lang string, n_tokens long"
    )
    out = curation.pack_sequences(df, 1000, ["lang"]).orderBy("doc_id").collect()
    # running-before counts: 0,600,1200,... -> floor(/1000)
    assert [r["pack_id"] for r in out] == [0, 0, 1, 1, 2, 3, 3, 4, 4, 5]
    # start-offset invariant: each doc's pack is its before-count's bucket,
    # so pack overflow is bounded by one document
    before = 0
    for r in out:
        assert r["pack_id"] == before // 1000
        before += 600


def test_repetition_stats_degenerate_and_clean(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),
            (2, "one two three four five six"),
            (3, "a b"),  # shorter than the gram window
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in df.select("doc_id", *curation.repetition_stats("text", 4)).collect()
    }
    assert out[1]["top_token_share"] == 1.0
    assert out[1]["dup_gram_ratio"] > 0.6  # 3 gram slots, 1 distinct
    assert out[2]["dup_gram_ratio"] == 0.0
    assert out[2]["n_grams"] == 3 and out[2]["n_distinct_grams"] == 3
    assert out[3]["n_grams"] == 0 and out[3]["dup_gram_ratio"] == 0.0


def test_pii_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [
            (1, "contact me at jo.doe+x@example.org or https://ex.com/a?b=1 now"),
            (2, "server 10.0.255.7 answered; call +1 609-555-0199 today"),
            (3, "no pii here at all"),
        ],
        "doc_id long, text string",
    )
    from scabillmatch_spark.operators.curation import pii_counts, redact_pii

    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", *pii_counts("text"), redact_pii("text").alias("red")
        ).collect()
    }
    assert out[1]["n_email"] == 1 and out[1]["n_url"] == 1
    assert out[2]["n_ipv4"] == 1 and out[2]["n_phone"] == 1
    assert out[3]["n_email"] == out[3]["n_url"] == out[3]["n_ipv4"] == out[3]["n_phone"] == 0
    assert "<EMAIL>" in out[1]["red"] and "<URL>" in out[1]["red"]
    assert "example.org" not in out[1]["red"]
    assert "<IPV4>" in out[2]["red"] and "<PHONE>" in out[2]["red"]
    assert out[3]["red"] == "no pii here at all"


def test_stream_static_join_has_no_stream_state(spark):
    """The stream-static join must not plan a streaming join state store —
    the static side is re-planned per micro-batch (batch twin checked via
    the oracle; here we check the batch plan broadcasts the dim)."""
    from scabillmatch_spark.streaming import events as SE

    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:10:00", 7, "click", 1.0, "{}")],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    dim = spark.createDataFrame([(7, 0.5)], "user_id long, user_ref double")
    plan = _formatted(SE.stream_static_enrich(ev, dim))
    assert "BroadcastHashJoin" in plan
    assert "StreamingSymmetricHashJoin" not in plan


def test_dedup_paragraphs_first_occurrence_and_reassembly(spark):
    from scabillmatch_spark.operators.curation import dedup_paragraphs

    df = spark.createDataFrame(
        [
            (1, "alpha|shared|beta"),
            (2, "shared|gamma"),      # 'shared' first occurred in doc 1
            (3, "shared|shared"),     # all units are dups -> empty doc
            (4, "|delta|"),           # empty fragments dropped
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dedup_paragraphs(df, "doc_id", "text", "|").collect()
    }
    assert out[1]["n_paras"] == 3 and out[1]["n_kept"] == 3
    assert out[1]["clean_text"] == "alpha|shared|beta"
    assert out[2]["n_paras"] == 2 and out[2]["n_kept"] == 1
    assert out[2]["clean_text"] == "gamma"
    # intra-doc duplicate also collapses; doc 3's 'shared' lost to doc 1
    assert out[3]["n_paras"] == 2 and out[3]["n_kept"] == 0
    assert out[3]["clean_text"] == "" and out[3]["clean_len"] == 0
    assert out[4]["n_paras"] == 1 and out[4]["clean_text"] == "delta"
    # regex metachar in delimiter must be treated literally
    df2 = spark.createDataFrame([(1, "a. b. a. c")], "doc_id long, text string")
    r2 = dedup_paragraphs(df2, "doc_id", "text", ". ").first()
    assert r2["n_paras"] == 4 and r2["n_kept"] == 3
    assert r2["clean_text"] == "a. b. c"


def test_mixture_sample_fractions_and_determinism(spark):
    from scabillmatch_spark.operators.curation import mixture_sample

    rows = [(i, "web" if i < 40 else ("wiki" if i < 60 else "books"))
            for i in range(70)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    frac = {"web": 0.25, "wiki": 1.0}  # books absent -> dropped
    out = mixture_sample(df, frac, "src", "doc_id")
    counts = {r["src"]: r["n"] for r in
              out.groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"web": 10, "wiki": 20}  # floor(0.25*40), 1.0*20
    # replayable: same membership on a second run
    ids1 = sorted(r["doc_id"] for r in out.collect())
    ids2 = sorted(r["doc_id"] for r in
                  mixture_sample(df, frac, "src", "doc_id").collect())
    assert ids1 == ids2


def test_chunk_documents_overlap_and_edges(spark):
    from scabillmatch_spark.operators.curation import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, "t0 t1 t2 t3 t4 t5 t6"),  # 7 tokens
            (2, "a b"),                   # shorter than one chunk
            (3, "   "),                   # whitespace-only -> no rows
            (4, ""),                      # empty -> no rows
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, "doc_id", "text", chunk_tokens=4, stride=3)
    rows = {(r.doc_id, r.chunk_idx): (r.n_chunk_tokens, r.chunk_text)
            for r in out.collect()}
    # doc 1: starts 0,3,6 -> [t0..t3], [t3..t6], [t6] (overlap of 1 token)
    assert rows[(1, 0)] == (4, "t0 t1 t2 t3")
    assert rows[(1, 1)] == (4, "t3 t4 t5 t6")
    assert rows[(1, 2)] == (1, "t6")
    assert rows[(2, 0)] == (2, "a b")
    assert {k[0] for k in rows} == {1, 2}  # docs 3/4 produce nothing


def test_chunk_documents_zero_shuffle_plan(spark):
    from scabillmatch_spark.operators.curation import chunk_documents

    docs = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit("x y z w v u t").alias("text")
    )
    out = chunk_documents(docs, "doc_id", "text", chunk_tokens=4, stride=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_chunk_documents_rejects_bad_args(spark):
    import pytest as _pytest

    from scabillmatch_spark.operators.curation import chunk_documents

    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        chunk_documents(docs, "doc_id", "text", chunk_tokens=0)
    with _pytest.raises(ValueError):
        chunk_documents(docs, "doc_id", "text", stride=-1)


def test_weighted_sample_exact_k_and_determinism(spark):
    from scabillmatch_spark.operators.curation import weighted_sample

    rows = [(i, "a" if i % 2 else "b", (i % 5) * 100 + 1) for i in range(1, 41)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, w long")
    out = weighted_sample(df, ["lang"], 5, "w").collect()
    # exact k per stratum, ranks 1..k
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r["__rk"])
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in by_lang.values())
    # replayable: identical draw on a second run
    out2 = weighted_sample(df, ["lang"], 5, "w").collect()
    assert sorted((r.lang, r.doc_id) for r in out) == sorted(
        (r.lang, r.doc_id) for r in out2
    )


def test_weighted_sample_zero_weight_excluded_and_bias(spark):
    from pyspark.sql import functions as F

    from scabillmatch_spark.operators.curation import weighted_sample

    # one heavy doc among many light ones: the heavy one must appear in
    # essentially every draw (weight ratio 1000:1); zero/negative weights
    # are never selected
    rows = [(i, "x", 1) for i in range(1, 200)] + [
        (999, "x", 100000), (1000, "x", 0), (1001, "x", -5),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, w long")
    out = weighted_sample(df, ["lang"], 10, "w")
    ids = {r.doc_id for r in out.collect()}
    assert 999 in ids and 1000 not in ids and 1001 not in ids


def test_weighted_sample_single_shuffle_plan(spark):
    from scabillmatch_spark.operators.curation import weighted_sample

    df = spark.range(100).selectExpr(
        "id as doc_id", "cast(id % 3 as string) as lang", "id % 7 + 1 as w"
    )
    plan = (
        weighted_sample(df, ["lang"], 3, "w")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    # skew safety: the rank filter must plan as a PARTIAL WindowGroupLimit
    # (map-side per-partition top-k BEFORE the exchange) — hot strata ship
    # k rows per upstream partition, not their full size
    assert "WindowGroupLimit" in plan and "Partial" in plan, plan


def test_stratified_sample_partial_window_group_limit(spark):
    from scabillmatch_spark.operators.curation import stratified_sample

    df = spark.range(1000).selectExpr(
        "id as doc_id", "cast(id % 3 as string) as lang"
    )
    plan = (
        stratified_sample(df, ["lang"], 5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan and "Partial" in plan, plan
