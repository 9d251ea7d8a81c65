"""BM25 retrieval + bigram-LM perplexity (r13/r14 window candidates):
unit pins against exact pure-Python recomputation on handmade corpora,
plus the full gate-shaped pre-validation of both unregistered driver
rows against their DuckDB oracles (the bfs/cluster_audit r11 pattern).
"""
from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from scabillmatch_spark.operators.lm import (
    perplexity_filter,
    score_perplexity,
    train_bigram_lm,
)
from scabillmatch_spark.operators.retrieval import bm25_scores, bm25_topk

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def _tiny_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------- BM25


def _bm25_expected(corpus: dict[int, list[str]], q: list[str], k1=1.2, b=0.75):
    n = len(corpus)
    avgdl = sum(len(t) for t in corpus.values()) / n
    df = {t: sum(1 for toks in corpus.values() if t in toks) for t in q}
    out = {}
    for d, toks in corpus.items():
        s, hits = 0.0, 0
        for t in q:
            tf = float(toks.count(t))
            if not tf:
                continue
            hits += 1
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * len(toks) / avgdl))
        if hits:
            out[d] = (hits, s)
    return out


def test_bm25_scores_match_textbook_formula(spark):
    rows = [
        (1, "hash join hash"),
        (2, "join scan scan"),
        (3, "window filter probe"),
        (4, "hash hash hash join window"),
    ]
    corpus = {i: t.split() for i, t in rows}
    q = ["hash", "join"]
    expected = _bm25_expected(corpus, q)
    got = {
        r.doc_id: (r.n_hits, r.score)
        for r in bm25_scores(_tiny_docs(spark, rows), q).collect()
    }
    assert set(got) == set(expected)
    for d in expected:
        assert got[d][0] == expected[d][0]
        assert got[d][1] == pytest.approx(expected[d][1], abs=1e-12)


def test_bm25_topk_orders_rounded_desc_then_id(spark):
    rows = [(i, "hash " * (i + 1)) for i in range(6)] + [(99, "scan only")]
    res = bm25_topk(_tiny_docs(spark, rows), ["hash"], k=3).collect()
    assert len(res) == 3
    scores = [r.score for r in res]
    assert scores == sorted(scores, reverse=True)
    # doc 99 has no query term -> never retrieved
    assert 99 not in {r.doc_id for r in res}


def test_bm25_rejects_empty_query(spark):
    with pytest.raises(ValueError, match="at least one query term"):
        bm25_scores(_tiny_docs(spark, [(1, "x y")]), [])


# ------------------------------------------------------ bigram LM / ppl


def _ppl_expected(corpus: dict[int, list[str]], add_k=0.5):
    from collections import Counter

    uni: Counter = Counter()
    bi: Counter = Counter()
    for toks in corpus.values():
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    v = len(uni)
    out = {}
    for d, toks in corpus.items():
        pairs = list(zip(toks, toks[1:]))
        if not pairs:
            continue
        lps = [
            math.log((bi[p] + add_k) / (uni[p[0]] + add_k * v)) for p in pairs
        ]
        nll = -sum(lps) / len(lps)
        out[d] = (len(pairs), nll, math.exp(nll))
    return out


def test_perplexity_matches_exact_recompute(spark):
    rows = [
        (1, "the fast table scans the fast row"),
        (2, "the fast fast table"),
        (3, "row scans row scans row"),
        (4, "lonely"),  # < 2 tokens -> omitted
    ]
    corpus = {i: t.split() for i, t in rows}
    docs = _tiny_docs(spark, rows)
    uni, bi, v = train_bigram_lm(docs)
    assert v == len({w for t in corpus.values() for w in t})
    got = {
        r.doc_id: (r.n_bigrams, r.avg_nll, r.ppl)
        for r in score_perplexity(docs, uni, bi, v).collect()
    }
    expected = _ppl_expected(corpus)
    assert set(got) == set(expected) and 4 not in got
    for d, (nb, nll, ppl) in expected.items():
        assert got[d][0] == nb
        assert got[d][1] == pytest.approx(nll, abs=1e-12)
        assert got[d][2] == pytest.approx(ppl, abs=1e-9)


def test_perplexity_min_count_prunes_tail_and_smoothing_covers(spark):
    rows = [(1, "a b a b a b"), (2, "a b z q")]
    docs = _tiny_docs(spark, rows)
    uni, bi, v = train_bigram_lm(docs, min_count=2)
    kept = {(r.w1, r.w2) for r in bi.collect()}
    assert kept == {("a", "b"), ("b", "a")}  # singletons pruned
    # pruned bigrams score through the add-k floor, not a crash/null
    scored = score_perplexity(docs, uni, bi, v).collect()
    assert {r.doc_id for r in scored} == {1, 2}
    assert all(r.ppl > 0 for r in scored)


def test_perplexity_filter_keeps_low_ppl_docs(spark):
    # doc 3 is statistical noise vs the repetitive register of 1-2
    rows = [
        (1, "the fast scan the fast scan the fast scan"),
        (2, "the fast scan the fast scan"),
        (3, "zq xw vk jm qp wz kx"),
    ]
    docs = _tiny_docs(spark, rows)
    uni, bi, v = train_bigram_lm(docs)
    ppl = {r.doc_id: r.ppl for r in score_perplexity(docs, uni, bi, v).collect()}
    assert ppl[3] > max(ppl[1], ppl[2])
    cut = (max(ppl[1], ppl[2]) + ppl[3]) / 2
    kept = perplexity_filter(docs, max_ppl=cut)
    assert {r.doc_id for r in kept.collect()} == {1, 2}
    assert set(kept.columns) == {"doc_id", "text", "ppl"}


# ------------------------------------------- driver-row pre-validation


def _gate_compare(spark, qfn, oracle_sql, sf="/root/testdata/sf0.001"):
    import duckdb

    from tools_compare import compare_typed

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    df = qfn(spark, sf)
    rows = [tuple(r) for r in df.collect()]
    assert rows
    res = compare_typed(df, rows, con, oracle_sql)
    assert all(
        res[k] for k in ("rows_match", "schema_match", "hash_match", "type_match")
    ), res


def test_bm25_query_matches_oracle(spark):
    """r13 pre-validation: the unregistered q_doc_bm25_search matches its
    DuckDB oracle typed-exact at sf0.001 (sf0.01 out-of-band, PLANS.md
    round 12)."""
    import __spark_entry__ as entrymod

    _gate_compare(
        spark, entrymod.q_doc_bm25_search, entrymod._doc_bm25_search_oracle()
    )


def test_perplexity_query_matches_oracle(spark):
    """r14 pre-validation: the unregistered q_doc_lm_perplexity matches
    its DuckDB oracle typed-exact at sf0.001 (sf0.01 out-of-band,
    PLANS.md round 12)."""
    import __spark_entry__ as entrymod

    _gate_compare(
        spark, entrymod.q_doc_lm_perplexity, entrymod._doc_lm_perplexity_oracle()
    )


# ------------------------------------------------- hypothesis properties

from hypothesis import given, settings, strategies as st  # noqa: E402

_words = st.sampled_from(
    ["scan", "hash", "join", "row", "fast", "slow", "merge", "table", "the"]
)
_texts = st.lists(_words, min_size=0, max_size=12).map(" ".join)
_corpora = st.lists(_texts, min_size=1, max_size=6)


@settings(max_examples=8, deadline=None)
@given(_corpora, st.lists(_words, min_size=1, max_size=3, unique=True))
def test_bm25_property_matches_python(spark, corpus_texts, query):
    """Random small corpora: Spark BM25 == the exact textbook recompute
    for every retrieved doc, and docs with no query term never appear.
    Empty documents stay in the corpus (they shape N and avgdl exactly
    as the engine sees them) — only the expected-hit map drops them."""
    rows = [(i, t) for i, t in enumerate(corpus_texts)]
    expected = _bm25_expected({i: t.split() for i, t in rows}, query)
    got = {
        r.doc_id: (r.n_hits, r.score)
        for r in bm25_scores(_tiny_docs(spark, rows), query).collect()
    }
    assert set(got) == set(expected)
    for d, (hits, s) in expected.items():
        assert got[d][0] == hits
        assert got[d][1] == pytest.approx(s, abs=1e-10)


def test_single_pass_training_equals_two_aggregation_form(spark):
    """r16 internals pin: train_bigram_lm's single-pass sentinel-pair
    model must produce EXACTLY the count tables and vocab size of the
    explicit two-aggregation form it replaced (uni = every token
    occurrence grouped by token; bi = adjacent pairs grouped by pair;
    V = distinct tokens) — including the single-token-doc edge (a
    unigram context with no bigram) and the empty-doc edge."""
    from pyspark.sql import functions as F

    from scabillmatch_spark.functions.text import tokens
    from scabillmatch_spark.operators.lm import _bigrams

    rows = [
        (1, "the fast table scans the fast row"),
        (2, "the fast fast table"),
        (3, "lonely"),  # 1 token: uni row, no bi row
        (4, ",,,"),  # cleans to 0 tokens: contributes nothing
    ]
    docs = _tiny_docs(spark, rows)
    uni, bi, v = train_bigram_lm(docs)

    toks = docs.select(tokens(F.col("text")).alias("__toks"))
    uni_ref = {
        (r.w1, r.c1)
        for r in toks.select(F.explode("__toks").alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
        .collect()
    }
    bi_ref = {
        (r.w1, r.w2, r.c2)
        for r in toks.select(F.explode(_bigrams(F.col("__toks"))).alias("bg"))
        .select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
        .collect()
    }
    assert {(r.w1, r.c1) for r in uni.collect()} == uni_ref
    assert {(r.w1, r.w2, r.c2) for r in bi.collect()} == bi_ref
    assert v == len(uni_ref)
    assert ("lonely", 1) in uni_ref  # the sentinel row carried it


@settings(max_examples=8, deadline=None)
@given(_corpora)
def test_perplexity_property_matches_python(spark, corpus_texts):
    """Random small corpora: per-doc n_bigrams/NLL/ppl == the exact
    pure-Python recompute; docs with < 2 tokens are always omitted."""
    rows = [(i, t) for i, t in enumerate(corpus_texts)]
    corpus = {i: t.split() for i, t in rows}
    docs = _tiny_docs(spark, rows)
    uni, bi, v = train_bigram_lm(docs)
    if v == 0:  # every document empty: no vocabulary, scoring must refuse
        with pytest.raises(ValueError, match="vocab_size"):
            score_perplexity(docs, uni, bi, v)
        return
    got = {
        r.doc_id: (r.n_bigrams, r.avg_nll, r.ppl)
        for r in score_perplexity(docs, uni, bi, v).collect()
    }
    expected = _ppl_expected(corpus)
    assert set(got) == set(expected)
    for d, (nb, nll, ppl) in expected.items():
        assert got[d][0] == nb
        assert got[d][1] == pytest.approx(nll, abs=1e-10)
        assert got[d][2] == pytest.approx(ppl, abs=1e-8)


# ---------------------------------------------------------- phrase search


def _phrase_expected(corpus: dict[int, list[str]], phrase: list[str]):
    m = len(phrase)
    out = {}
    for d, toks in corpus.items():
        anchors = [
            a for a in range(len(toks) - m + 1) if toks[a : a + m] == phrase
        ]
        if anchors:
            out[d] = (len(anchors), anchors[0])
    return out


def test_phrase_search_counts_overlapping_and_duplicate_terms(spark):
    from scabillmatch_spark.operators.retrieval import phrase_search

    rows = [
        (1, "batch batch batch scan"),  # "batch batch" at anchors 0 AND 1
        (2, "scan batch scan batch batch"),  # anchor 3 only
        (3, "batch scan batch"),  # no adjacent pair
        (4, ""),  # empty doc never appears
    ]
    got = {
        r.doc_id: (r.n_matches, r.first_pos)
        for r in phrase_search(_tiny_docs(spark, rows), ["batch", "batch"]).collect()
    }
    assert got == {1: (2, 0), 2: (1, 3)}


def test_phrase_search_single_term_and_rejects_empty(spark):
    from scabillmatch_spark.operators.retrieval import phrase_search

    rows = [(1, "scan the scan"), (2, "hash join")]
    got = {
        r.doc_id: (r.n_matches, r.first_pos)
        for r in phrase_search(_tiny_docs(spark, rows), ["scan"]).collect()
    }
    assert got == {1: (2, 0)}
    with pytest.raises(ValueError):
        phrase_search(_tiny_docs(spark, rows), [])


@settings(max_examples=8, deadline=None)
@given(_corpora, st.lists(_words, min_size=1, max_size=3))
def test_phrase_search_property_matches_python(spark, corpus_texts, phrase):
    """Random corpora incl. duplicate-term phrases: engine output equals
    the exact sliding-window recompute (overlaps each count)."""
    from scabillmatch_spark.operators.retrieval import phrase_search

    rows = [(i, t) for i, t in enumerate(corpus_texts)]
    expected = _phrase_expected({i: t.split() for i, t in rows}, phrase)
    got = {
        r.doc_id: (r.n_matches, r.first_pos)
        for r in phrase_search(_tiny_docs(spark, rows), phrase).collect()
    }
    assert got == expected


def test_phrase_search_query_matches_oracle(spark):
    """r16 pre-validation: the unregistered q_doc_phrase_search matches
    its DuckDB oracle typed-exact at sf0.001 (sf0.01 out-of-band,
    PLANS.md round 12)."""
    import __spark_entry__ as entrymod

    _gate_compare(
        spark, entrymod.q_doc_phrase_search, entrymod._doc_phrase_search_oracle()
    )
