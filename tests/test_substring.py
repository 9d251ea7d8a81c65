"""Exact-substring duplication (r15 window candidate): golden behavior
on handmade corpora, an exact pure-Python recompute property, and the
gate-shaped pre-validation of the unregistered driver row."""
from __future__ import annotations

import re

import pytest
from hypothesis import given, settings, strategies as st

from scabillmatch_spark.operators.substring import duplicate_ngram_spans

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_tokens(text: str) -> list[str]:
    return [w for w in re.sub(r"[0-9,:;?!.]", "", text.lower()).split(" ") if w]


def _py_spans(rows, n, min_docs=2):
    """Exact reference: window CONTENT tuples (collision-free — stricter
    than the engine's rolling hash, so agreement also certifies no
    collision fired on the test corpora)."""
    wins: dict[int, list[tuple]] = {}
    for d, tx in rows:
        t = _py_tokens(tx)
        wins[d] = [tuple(t[i : i + n]) for i in range(len(t) - n + 1)]
    from collections import defaultdict

    owners = defaultdict(set)
    for d, ws in wins.items():
        for w in ws:
            owners[w].add(d)
    out = {}
    for d, ws in wins.items():
        pos = [i for i, w in enumerate(ws) if len(owners[w]) >= min_docs]
        if not pos:
            continue
        spans = []
        for p in pos:
            if spans and p <= spans[-1][1]:
                spans[-1] = (spans[-1][0], max(spans[-1][1], p + n))
            else:
                spans.append((p, p + n))
        out[d] = (
            len(pos),
            len(spans),
            sum(e - s for s, e in spans),
            ";".join(f"{s}-{e}" for s, e in spans),
        )
    return out


def test_shared_license_block_is_found_and_merged(spark):
    lic = "this block is licensed under the common terms " * 2  # 16 tokens
    rows = [
        (1, lic + "alpha beta gamma delta unique one"),
        (2, "prefix words here " + lic + "totally different tail two"),
        (3, "no shared content at all in this document three"),
    ]
    got = {
        r.doc_id: (r.n_dup_windows, r.n_spans, r.dup_tokens, r.spans)
        for r in duplicate_ngram_spans(_docs(spark, rows), n=8).collect()
    }
    assert got == _py_spans(rows, 8)
    assert 3 not in got  # untouched doc never appears
    assert got[1][1] == 1  # the license block merges into ONE span


def test_num_partitions_honored_with_token_ids_col(spark):
    """r15 ADVICE: num_partitions used to be silently ignored when
    token_ids_col was passed. Both must now compose — the repartition
    lands in the plan AND values stay identical to the text path."""
    from pyspark.sql import functions as F

    from scabillmatch_spark.functions.text import ordered_token_ids
    from scabillmatch_spark.operators.substring import strip_duplicate_spans

    lic = "this block is licensed under the common terms " * 2
    rows = [
        (1, lic + "alpha beta gamma delta unique one"),
        (2, "prefix words here " + lic + "totally different tail two"),
    ]
    docs = _docs(spark, rows)
    toks = docs.select(
        "doc_id", ordered_token_ids(F.col("text")).alias("tids")
    )
    via_ids = duplicate_ngram_spans(
        toks, n=8, token_ids_col="tids", num_partitions=4
    )
    plan = via_ids._jdf.queryExecution().analyzed().toString()
    assert "RepartitionByExpression" in plan, plan
    via_text = duplicate_ngram_spans(_docs(spark, rows), n=8)
    assert sorted(map(tuple, via_ids.collect())) == sorted(
        map(tuple, via_text.collect())
    )
    # same contract on the apply twin
    strip_ids = strip_duplicate_spans(
        toks, n=8, token_ids_col="tids", num_partitions=4
    )
    assert "RepartitionByExpression" in (
        strip_ids._jdf.queryExecution().analyzed().toString()
    )
    strip_text = strip_duplicate_spans(_docs(spark, rows), n=8)
    assert sorted(map(tuple, strip_ids.collect())) == sorted(
        map(tuple, strip_text.collect())
    )


def test_within_doc_repetition_alone_does_not_count(spark):
    rows = [
        (1, "repeat me now " * 6),  # self-repetition only
        (2, "completely other words in play here today"),
    ]
    assert duplicate_ngram_spans(_docs(spark, rows), n=6).count() == 0


def test_three_way_duplicate_and_min_docs(spark):
    blk = "zero one two three four five six seven "
    rows = [(i, f"head{i} " + blk + f"tail{i}") for i in (1, 2, 3)]
    df2 = duplicate_ngram_spans(_docs(spark, rows), n=8, min_docs=2)
    df3 = duplicate_ngram_spans(_docs(spark, rows), n=8, min_docs=3)
    assert df2.count() == 3 == df3.count()  # shared by all three either way
    df4 = duplicate_ngram_spans(_docs(spark, rows), n=8, min_docs=4)
    assert df4.count() == 0


_words = st.sampled_from(["aa", "bb", "cc", "dd"])
_texts = st.lists(_words, min_size=0, max_size=24).map(" ".join)


@settings(max_examples=10, deadline=None)
@given(st.lists(_texts, min_size=2, max_size=5))
def test_substring_property_matches_python(spark, texts):
    """Tiny alphabet => dense accidental window sharing: engine output
    equals the collision-free content-tuple recompute exactly."""
    rows = [(i, t) for i, t in enumerate(texts)]
    got = {
        r.doc_id: (r.n_dup_windows, r.n_spans, r.dup_tokens, r.spans)
        for r in duplicate_ngram_spans(_docs(spark, rows), n=4).collect()
    }
    assert got == _py_spans(rows, 4)


def test_substring_query_matches_oracle(spark):
    """r15 pre-validation: the unregistered q_doc_substring_dup matches
    its DuckDB oracle typed-exact at sf0.001 (sf0.01 out-of-band,
    PLANS.md round 12)."""
    import duckdb

    import __spark_entry__ as entrymod
    from tools_compare import compare_typed

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    df = entrymod.q_doc_substring_dup(spark, sf)
    rows = [tuple(r) for r in df.collect()]
    assert rows
    res = compare_typed(df, rows, con, entrymod._doc_substring_dup_oracle())
    assert all(
        res[k] for k in ("rows_match", "schema_match", "hash_match", "type_match")
    ), res


def test_substring_rewrite_matches_oracle(spark):
    """r16 pre-validation: the unregistered q_doc_substring_rewrite
    (apply step — strip covered tokens, arithmetic keep-checksum)
    matches its DuckDB oracle typed-exact at sf0.001 (sf0.01
    out-of-band, PLANS.md round 12)."""
    import duckdb

    import __spark_entry__ as entrymod
    from tools_compare import compare_typed

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    df = entrymod.q_doc_substring_rewrite(spark, sf)
    rows = [tuple(r) for r in df.collect()]
    assert rows
    # the rewrite must cover EVERY document, touched or not
    assert len(rows) == con.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    res = compare_typed(df, rows, con, entrymod._doc_substring_rewrite_oracle())
    assert all(
        res[k] for k in ("rows_match", "schema_match", "hash_match", "type_match")
    ), res


def test_semantic_dedup_query_matches_oracle(spark):
    """r15 pre-validation #2: the unregistered q_emb_semantic_dedup
    (exact emb near-dup pairs -> CC clusters -> keeper rollups) matches
    its DuckDB oracle typed-exact at sf0.001 (sf0.01 out-of-band,
    PLANS.md round 12)."""
    import duckdb

    import __spark_entry__ as entrymod
    from tools_compare import compare_typed

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    df = entrymod.q_emb_semantic_dedup(spark, sf)
    rows = [tuple(r) for r in df.collect()]
    # planted variant copies guarantee clusters at every scale factor
    assert rows
    res = compare_typed(df, rows, con, entrymod._emb_semantic_dedup_oracle())
    assert all(
        res[k] for k in ("rows_match", "schema_match", "hash_match", "type_match")
    ), res


def _py_strip(rows, n, min_docs=2, mod=1_000_000_007):
    """Exact reference for strip_duplicate_spans: md5-derived token ids
    (the engine's token_id), content-tuple span logic."""
    import hashlib

    def tid(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:15], 16)

    spans_by_doc = {d: [] for d, _ in rows}
    for d, rep in _py_spans(rows, n, min_docs).items():
        spans_by_doc[d] = [
            tuple(map(int, se.split("-"))) for se in rep[3].split(";")
        ]
    out = {}
    for d, tx in rows:
        t = _py_tokens(tx)
        cov = set()
        for s, e in spans_by_doc[d]:
            cov.update(range(s, e))
        kept = [i for i in range(len(t)) if i not in cov]
        out[d] = (
            len(t),
            len(t) - len(kept),
            len(kept),
            sum(tid(t[i]) % mod for i in kept),
        )
    return out


def test_strip_duplicate_spans_matches_python(spark):
    from scabillmatch_spark.operators.substring import strip_duplicate_spans

    lic = "this block is licensed under the common terms " * 2
    rows = [
        (1, lic + "alpha beta gamma delta unique one"),
        (2, "prefix words here " + lic + "totally different tail two"),
        (3, "no shared content at all in this document three"),
        (4, ""),  # zero-token doc must survive with zeros
    ]
    got = {
        r.doc_id: (r.n_tokens, r.dropped_tokens, r.kept_tokens, r.kept_checksum)
        for r in strip_duplicate_spans(_docs(spark, rows), n=8).collect()
    }
    assert got == _py_strip(rows, 8)
    assert got[3][1] == 0 and got[3][0] == got[3][2]  # untouched, all kept
    assert got[4] == (0, 0, 0, 0)


@settings(max_examples=8, deadline=None)
@given(st.lists(_texts, min_size=2, max_size=5))
def test_strip_property_matches_python(spark, texts):
    from scabillmatch_spark.operators.substring import strip_duplicate_spans

    rows = [(i, t) for i, t in enumerate(texts)]
    got = {
        r.doc_id: (r.n_tokens, r.dropped_tokens, r.kept_tokens, r.kept_checksum)
        for r in strip_duplicate_spans(_docs(spark, rows), n=4).collect()
    }
    assert got == _py_strip(rows, 4)


# ------------------------------------------- winnowing fingerprints


def _py_winnow_report(rows, n=4, w=6, mod=1_000_000_007):
    """Exact reference for winnow_fingerprint_report: md5-derived token
    ids + the engine's rolling-hash fold, robust-winnowing selection
    (min hash per window, rightmost tie, distinct (hash, pos))."""
    import functools
    import hashlib

    from scabillmatch_spark.functions.text import HASH_PRIME, SHINGLE_B

    def tid(word):
        return int(hashlib.md5(word.encode()).hexdigest()[:15], 16)

    def grams(ids):
        if len(ids) < n:
            return []
        return [
            functools.reduce(
                lambda a, x: (a * SHINGLE_B + x % HASH_PRIME) % HASH_PRIME,
                ids[i : i + n],
                0,
            )
            for i in range(len(ids) - n + 1)
        ]

    fps = {}
    for d, tx in rows:
        gs = grams([tid(t) for t in _py_tokens(tx)])
        sel = []
        seen = set()
        for s in range(len(gs) - w + 1):
            win = gs[s : s + w]
            m = min(win)
            p = s + max(i for i, v in enumerate(win) if v == m)
            if (m, p) not in seen:
                seen.add((m, p))
                sel.append((m, p))
        if sel:
            fps[d] = (len(gs), sel)
    owners = {}
    for d, (_, sel) in fps.items():
        for g, _ in sel:
            owners.setdefault(g, set()).add(d)
    shared = {g for g, ds in owners.items() if len(ds) >= 2}
    return {
        d: (
            ng,
            len(sel),
            sum(1 for g, _ in sel if g in shared),
            sum(g % mod for g, _ in sel),
        )
        for d, (ng, sel) in fps.items()
    }


def _winnow_rows(spark, rows, n=4, w=6):
    from scabillmatch_spark.operators.winnow import winnow_fingerprint_report

    return {
        r.doc_id: (r.n_grams, r.n_fingerprints, r.n_shared_fp, r.fp_checksum)
        for r in winnow_fingerprint_report(_docs(spark, rows), n=n, w=w).collect()
    }


def test_winnow_shared_passage_is_screened(spark):
    lic = "this block is licensed under the common terms " * 2  # 16 tokens
    rows = [
        (1, lic + "alpha beta gamma delta unique one epsilon zeta"),
        (2, "prefix words here " + lic + "totally different tail two"),
        (3, "no shared content at all in this document three friend"),
    ]
    got = _winnow_rows(spark, rows)
    assert got == _py_winnow_report(rows)
    # the 16-token shared block exceeds the w + n - 1 = 9 guarantee
    # threshold: both owners MUST share at least one fingerprint hash
    assert got[1][2] >= 1 and got[2][2] >= 1
    assert got[3][2] == 0  # the unrelated doc shares nothing


def test_winnow_short_docs_select_nothing(spark):
    # < n + w - 1 = 9 tokens -> no full window -> no row; the n..n+w-2
    # token range exercises the 1 <= n_grams < w edge (a naive
    # sequence(0, n_grams - w) would be a DESCENDING Spark range)
    rows = [(k, " ".join(f"t{i}" for i in range(k))) for k in range(0, 9)]
    assert _winnow_rows(spark, rows) == {}
    rows9 = [(1, " ".join(f"t{i}" for i in range(9)))]
    got = _winnow_rows(spark, rows9)
    assert set(got) == {1} and got[1][0] == 6 and got[1][1] == 1


@settings(max_examples=10, deadline=None)
@given(st.lists(_texts, min_size=2, max_size=5))
def test_winnow_property_matches_python(spark, texts):
    """Tiny alphabet => dense hash repeats inside windows: the rightmost
    tie-break and the distinct-(hash,pos) rule are both load-bearing."""
    rows = [(i, t) for i, t in enumerate(texts)]
    assert _winnow_rows(spark, rows, n=2, w=3) == _py_winnow_report(
        rows, n=2, w=3
    )


def test_winnow_query_matches_oracle(spark):
    """Banked-row pre-validation: the unregistered
    q_doc_winnow_fingerprints matches its DuckDB oracle typed-exact at
    sf0.001 (sf0.01 out-of-band, PLANS.md round 12)."""
    import duckdb

    import __spark_entry__ as entrymod
    from tools_compare import compare_typed

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    df = entrymod.q_doc_winnow_fingerprints(spark, sf)
    rows = [tuple(r) for r in df.collect()]
    assert rows
    res = compare_typed(
        df, rows, con, entrymod._doc_winnow_fingerprints_oracle()
    )
    assert all(
        res[k] for k in ("rows_match", "schema_match", "hash_match", "type_match")
    ), res


# ------------------------------------------------ n-gram novelty curve


def _py_novelty(rows, n=4):
    """Content-tuple reference (collision-free, stricter than the
    engine's rolling hash): gram owned by its min doc; per-doc share of
    positions whose gram this doc owns."""
    from helpers import half_up_round

    wins = {
        d: [
            tuple(_py_tokens(tx)[i : i + n])
            for i in range(len(_py_tokens(tx)) - n + 1)
        ]
        for d, tx in rows
    }
    owner = {}
    for d in sorted(wins):
        for w in wins[d]:
            owner.setdefault(w, d)
    return {
        d: (
            len(ws),
            sum(1 for w in ws if owner[w] == d),
            half_up_round(sum(1 for w in ws if owner[w] == d) / len(ws), 6),
        )
        for d, ws in wins.items()
        if ws
    }


def test_novelty_first_owner_and_self_repeats(spark):
    import __spark_entry__ as entrymod  # noqa: F401  (query form tested below)
    from scabillmatch_spark.functions.text import ordered_token_ids
    from scabillmatch_spark.operators.substring import positional_ngram_ids
    from pyspark.sql import functions as F

    lic = "this block is licensed under the common terms "
    rows = [
        (1, lic + "alpha beta gamma delta"),
        (2, lic + "totally different tail here"),  # license seen -> not novel
        (3, "completely fresh words in every position here today"),
        (4, (lic * 2).strip()),  # self-repeat of an OLD gram: 0 novel
    ]

    def run(rows):
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        grams = docs.select(
            "doc_id",
            F.posexplode(
                positional_ngram_ids(ordered_token_ids(F.col("text")), 4)
            ).alias("pos", "gram"),
        )
        owner = grams.groupBy("gram").agg(F.min("doc_id").alias("f"))
        out = (
            grams.join(owner, "gram")
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).cast("long").alias("ng"),
                F.sum(F.when(F.col("f") == F.col("doc_id"), 1).otherwise(0))
                .cast("long")
                .alias("nv"),
            )
            .select(
                "doc_id", "ng", "nv",
                F.round(F.col("nv").cast("double") / F.col("ng").cast("double"), 6).alias("nov"),
            )
        )
        return {r.doc_id: (r.ng, r.nv, r.nov) for r in out.collect()}

    got = run(rows)
    assert got == _py_novelty(rows)
    assert got[1][2] == 1.0          # first doc owns everything
    assert got[3][2] == 1.0          # disjoint doc fully novel
    # doc 4 re-quotes doc 1's license twice: every within-copy gram is
    # old, only the n-1 = 3 grams SPANNING the concatenation seam are new
    assert got[4][1] == 3
    assert 0.0 < got[2][2] < 1.0     # mixed: license old, tail new


def test_novelty_query_matches_oracle(spark):
    """Banked-row pre-validation: the unregistered q_doc_ngram_novelty
    matches its DuckDB oracle typed-exact at sf0.001 (sf0.01
    out-of-band, PLANS.md round 12)."""
    import duckdb

    import __spark_entry__ as entrymod
    from tools_compare import compare_typed

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    df = entrymod.q_doc_ngram_novelty(spark, sf)
    rows = [tuple(r) for r in df.collect()]
    assert rows
    res = compare_typed(df, rows, con, entrymod._doc_ngram_novelty_oracle())
    assert all(
        res[k] for k in ("rows_match", "schema_match", "hash_match", "type_match")
    ), res
