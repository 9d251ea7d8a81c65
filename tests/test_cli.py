"""End-to-end CLI workflow: featurize -> candidates -> score -> postprocess
(the reference's workflow 1 shape) on a small JSONL corpus."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from scabillmatch_spark import cli


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    f = d / "bills.jsonl"
    rows = []
    base = "concerning the authorization of force in self defense situations "
    other = "an act relating to agricultural water rights and irrigation "
    for i, (state, text) in enumerate(
        [(9, base * 20), (22, base * 20 + "amended "), (30, other * 20), (44, other * 21)]
    ):
        content = text
        rows.append(
            {
                "primary_key": f"ST{state}_2005_B{i}_Introduced",
                "content": content,
                "year": 2005,
                "state": state,
                "docid": f"B{i}",
                "docversion": "Introduced",
                "length": len(content),
            }
        )
    f.write_text("\n".join(json.dumps(r) for r in rows))
    return str(f)


def test_cli_workflow1(spark, corpus, tmp_path):
    feats = str(tmp_path / "feats")
    pairs = str(tmp_path / "pairs")
    scored = str(tmp_path / "scored")
    out = str(tmp_path / "post")

    cli.main(["featurize", "--input", corpus, "--output", feats,
              "--docversion", "Introduced", "--kmeans-k", "2", "--kmeans-iters", "5"])
    cli.main(["candidates", "--input", feats, "--output", pairs, "--strategy", "kmeans"])
    cli.main(["score", "--pairs", pairs, "--features", feats,
              "--measure", "jaccard", "--output", scored])
    cli.main(["postprocess", "--scored", scored, "--docs", corpus,
              "--output", out, "--top", "10"])

    scored_df = spark.read.parquet(scored)
    rows = {(r.pk1, r.pk2): r.similarity for r in scored_df.collect()}
    assert rows, "no scored pairs"
    # the two within-topic pairs must outrank any cross-topic pair
    light = spark.read.json(f"{out}/light")
    ranked = light.orderBy(F.desc("similarity")).collect()
    top2 = {frozenset((r.pk1_smaller, r.pk2_larger)) for r in ranked[:2]}
    assert top2 == {
        frozenset(("ST9_2005_B0_Introduced", "ST22_2005_B1_Introduced")),
        frozenset(("ST30_2005_B2_Introduced", "ST44_2005_B3_Introduced")),
    }
    assert all(r.similarity < 50 for r in ranked[2:])
    skim = spark.read.json(f"{out}/skim")
    assert {"content1_smaller", "content2_larger", "pk1_smaller", "pk2_larger", "similarity"} <= set(skim.columns)


def test_cli_wordcount(spark, corpus, tmp_path):
    out = str(tmp_path / "wc")
    cli.main(["wordcount", "--input", corpus, "--output", out, "--ngram", "2"])
    counts = spark.read.parquet(out)
    top = counts.first()
    assert top["count"] >= 20  # repeated base phrases dominate

def test_cli_graph_components(spark, tmp_path):
    scored = str(tmp_path / "scored")
    spark.createDataFrame(
        [("a", "b", 97.0), ("b", "c", 96.0), ("x", "y", 99.0)],
        ["pk1", "pk2", "similarity"],
    ).write.parquet(scored)
    out = str(tmp_path / "cc")
    cli.main(["graph", "--scored", scored, "--output", out, "--algo", "components"])
    got = {(r.id, r.component) for r in spark.read.parquet(out).collect()}
    assert got == {("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x")}


def test_cli_curate_ops(spark, corpus, tmp_path):
    out = str(tmp_path / "cur")
    cli.main(["curate", "--input", corpus, "--output", out + "/pii",
              "--op", "pii-scrub"])
    pii = spark.read.parquet(out + "/pii")
    assert pii.count() == 4 and "n_email" in pii.columns
    cli.main(["curate", "--input", corpus, "--output", out + "/rep",
              "--op", "repetition", "--ngram", "3"])
    rep = spark.read.parquet(out + "/rep")
    # the corpus rows are sentence * 20 repeats -> dup ratio near 1
    assert rep.agg(F.max("dup_gram_ratio")).collect()[0][0] > 0.9
    cli.main(["curate", "--input", corpus, "--output", out + "/dec",
              "--op", "decontaminate", "--eval-docs", corpus, "--ngram", "3"])
    dec = spark.read.parquet(out + "/dec")
    assert dec.count() == 4  # self-decontamination: every doc overlaps itself
    cli.main(["curate", "--input", corpus, "--output", out + "/pack",
              "--op", "pack", "--budget", "50", "--strata", "state"])
    pack = spark.read.parquet(out + "/pack")
    assert "pack_id" in pack.columns and pack.count() == 4


def test_cli_compact(spark, tmp_path):
    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compacted")
    spark.range(0, 10_000).repartition(12).write.parquet(src)
    cli.main(["compact", "--input", src, "--output", dst,
              "--target-bytes", str(64 * 1024 * 1024)])
    import glob, os
    assert len(glob.glob(os.path.join(dst, "*.parquet"))) == 1
    assert spark.read.parquet(dst).count() == 10_000


def test_cli_curate_new_ops_and_dedup_delta(spark, corpus, tmp_path):
    out = str(tmp_path / "new")
    cli.main(["curate", "--input", corpus, "--output", out + "/pd",
              "--op", "paragraph-dedup", "--text-col", "content",
              "--id-col", "primary_key", "--delimiter", " "])
    pd_ = spark.read.parquet(out + "/pd")
    assert pd_.count() == 4 and "clean_md5" in pd_.columns
    cli.main(["curate", "--input", corpus, "--output", out + "/mix",
              "--op", "mixture-sample", "--strata", "state",
              "--mix", "9=1.0"])  # keep only state 9 whole; others dropped
    mix = spark.read.parquet(out + "/mix")
    assert mix.count() == 1 and mix.first()["state"] == 9
    cli.main(["curate", "--input", corpus, "--output", out + "/ws",
              "--op", "weighted-sample", "--strata", "state", "--k", "2",
              "--text-col", "content", "--id-col", "primary_key"])
    ws = spark.read.parquet(out + "/ws")
    assert ws.groupBy("state").count().agg(F.max("count")).first()[0] <= 2
    cli.main(["dedup-delta", "--corpus", corpus, "--delta", corpus,
              "--output", out + "/dd", "--shingle-n", "2",
              "--num-hashes", "16", "--bands", "8", "--threshold", "50"])
    dd = spark.read.parquet(out + "/dd")
    # self-vs-self: every doc collides with its duplicate-content peers but
    # never with itself (identical ids excluded)
    assert dd.filter(F.col("pk1") == F.col("pk2")).count() == 0


def test_cli_compact_zorder(spark, tmp_path):
    src = str(tmp_path / "zsrc")
    dst = str(tmp_path / "zdst")
    spark.range(0, 20_000).selectExpr("id AS x", "(id * 7) % 20000 AS y") \
        .repartition(8).write.parquet(src)
    cli.main(["compact", "--input", src, "--output", dst,
              "--target-bytes", "40000", "--zorder-by", "x,y"])
    back = spark.read.parquet(dst)
    assert back.count() == 20_000
    assert sorted(back.columns) == ["x", "y"]


def test_cli_chunk_and_merge(spark, corpus, tmp_path):
    out = str(tmp_path / "r6")
    cli.main(["curate", "--input", corpus, "--output", out + "/ch",
              "--op", "chunk", "--text-col", "content",
              "--id-col", "primary_key", "--chunk-tokens", "64",
              "--stride", "48"])
    ch = spark.read.parquet(out + "/ch")
    assert ch.count() > 4  # every doc yields multiple overlapping windows
    assert {"chunk_idx", "n_chunk_tokens", "chunk_text"} <= set(ch.columns)

    tgt = str(tmp_path / "tgt")
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, v string"
    ).write.parquet(tgt)
    spark.createDataFrame(
        [(2, "B", False), (3, "c", False), (1, "a", True)],
        "k long, v string, del boolean",
    ).write.parquet(src)
    cli.main(["merge", "--target", tgt, "--source", src,
              "--output", out + "/merged", "--keys", "k",
              "--delete-col", "del"])
    merged = {r.k: r.v for r in spark.read.parquet(out + "/merged").collect()}
    assert merged == {2: "B", 3: "c"}


def test_cli_diff_and_fuzzy_join(spark, corpus, tmp_path):
    out = str(tmp_path / "d")
    # snapshots are parquet tables: old = the corpus, new = one content tweak
    old = str(tmp_path / "old_snapshot")
    new = str(tmp_path / "new_snapshot")
    df = spark.read.json(corpus)
    df.write.parquet(old)
    df.withColumn(
        "content",
        F.when(F.col("primary_key") == df.first()["primary_key"],
               F.lit("changed body")).otherwise(F.col("content")),
    ).write.parquet(new)
    cli.main(["diff", "--old", old, "--new", new, "--output", out + "/cdc",
              "--keys", "primary_key"])
    cdc = spark.read.parquet(out + "/cdc")
    assert cdc.count() == 1 and cdc.first()["__op"] == "update"
    cli.main(["fuzzy-join", "--input", corpus, "--output", out + "/fz",
              "--text-col", "content", "--id-col", "primary_key",
              "--max-distance", "30", "--prefix-len", "4"])
    fz = spark.read.parquet(out + "/fz")
    assert set(fz.columns) == {"pk1", "pk2", "distance"}


def test_cli_graph_lpa_and_weighted_pagerank(spark, tmp_path):
    scored = str(tmp_path / "scored_g")
    # two triangles bridged by one edge, numeric-string ids
    spark.createDataFrame(
        [("1", "2", 96.0), ("2", "3", 97.0), ("1", "3", 98.0),
         ("10", "11", 96.0), ("11", "12", 97.0), ("10", "12", 98.0),
         ("3", "10", 95.0)],
        ["pk1", "pk2", "similarity"],
    ).write.parquet(scored)
    out = str(tmp_path / "lpa")
    cli.main(["graph", "--scored", scored, "--output", out, "--algo", "lpa",
              "--iters", "4"])
    got = {r.id: r.label for r in spark.read.parquet(out).collect()}
    assert len({got[v] for v in ("1", "2", "3")}) == 1
    assert {got[v] for v in ("1", "2", "3")} != {got[v] for v in ("10", "11", "12")}
    out2 = str(tmp_path / "wpr")
    cli.main(["graph", "--scored", scored, "--output", out2,
              "--algo", "wpagerank", "--iters", "3"])
    pr = {r.id: r.pagerank for r in spark.read.parquet(out2).collect()}
    assert len(pr) == 6 and abs(sum(pr.values()) - 1.0) < 1e-6


def test_cli_graph_paths(spark, tmp_path):
    scored = str(tmp_path / "scored_p")
    # square a-b-c-d-a: two shortest a->c paths (via b and via d)
    spark.createDataFrame(
        [("a", "b", 96.0), ("b", "c", 97.0), ("c", "d", 98.0),
         ("d", "a", 95.0)],
        ["pk1", "pk2", "similarity"],
    ).write.parquet(scored)
    out = str(tmp_path / "paths")
    cli.main(["graph", "--scored", scored, "--output", out, "--algo", "paths",
              "--landmark", "a", "--to", "c"])
    rows = spark.read.parquet(out).collect()
    assert {tuple(r.path) for r in rows} == {("a", "b", "c"), ("a", "d", "c")}
    assert all(r.length == 2 for r in rows)


def test_cli_search_ppl_filter_and_dsir(spark, corpus, tmp_path):
    out = str(tmp_path / "r12ops")
    # BM25 search: agricultural docs outrank the taxation ones for these terms
    cli.main(["search", "--input", corpus, "--output", out + "/bm25",
              "--terms", "agricultural,water", "--k", "2"])
    hits = spark.read.parquet(out + "/bm25").collect()
    assert len(hits) == 2
    assert all(r.primary_key.startswith(("ST30", "ST44")) for r in hits)
    # exact phrase: "agricultural water" occurs 20/21 times in the two
    # agricultural docs (repeat-concatenated base), first at token 4
    cli.main(["search", "--input", corpus, "--output", out + "/phrase",
              "--terms", "agricultural,water", "--phrase"])
    ph = {r.primary_key: (r.n_matches, r.first_pos)
          for r in spark.read.parquet(out + "/phrase").collect()}
    assert ph == {"ST30_2005_B2_Introduced": (20, 4),
                  "ST44_2005_B3_Introduced": (21, 4)}
    # perplexity filter: self-trained gate keeps everything at a loose cut
    cli.main(["curate", "--input", corpus, "--output", out + "/ppl",
              "--op", "ppl-filter", "--max-ppl", "100000"])
    kept = spark.read.parquet(out + "/ppl")
    assert kept.count() == 4 and "ppl" in kept.columns
    # DSIR: target the agricultural register, top-2 selection must be it
    cli.main(["curate", "--input", corpus, "--output", out + "/dsir",
              "--op", "dsir", "--target-where", "state >= 30", "--k", "2",
              "--buckets", "64"])
    sel = spark.read.parquet(out + "/dsir").collect()
    assert len(sel) == 2
    assert all(r.primary_key.startswith(("ST30", "ST44")) for r in sel)
    # missing --target-where fails loudly
    import pytest

    with pytest.raises(SystemExit):
        cli.main(["curate", "--input", corpus, "--output", out + "/x",
                  "--op", "dsir"])


def test_cli_analyze_ops(spark, tmp_path):
    import datetime

    out = str(tmp_path / "an")
    ev = str(tmp_path / "ev.parquet")
    spark.createDataFrame(
        [
            (1, datetime.datetime(2001, 1, 5), "a", 10.0),
            (1, datetime.datetime(2001, 2, 5), "a", 12.0),
            (1, datetime.datetime(2001, 2, 6), "b", 11.0),
            (2, datetime.datetime(2001, 2, 1), "b", 500.0),
        ],
        "uid long, ts timestamp, etype string, value double",
    ).write.parquet(ev)
    cli.main(["analyze", "--input", ev, "--output", out + "/cohort",
              "--op", "cohort", "--id-col", "uid"])
    cohort = {
        (r.cohort, r.periods_since): (r.n_users, r.n_events)
        for r in spark.read.parquet(out + "/cohort").collect()
    }
    jan, feb = 2001 * 12, 2001 * 12 + 1
    assert cohort == {(jan, 0): (1, 1), (jan, 1): (1, 2), (feb, 0): (1, 1)}
    cli.main(["analyze", "--input", ev, "--output", out + "/ent",
              "--op", "entropy", "--id-col", "uid", "--group-col", "etype"])
    ent = {r.uid: (r.n_events, r.top_type)
           for r in spark.read.parquet(out + "/ent").collect()}
    assert ent == {1: (3, "a"), 2: (1, "b")}
    cli.main(["analyze", "--input", ev, "--output", out + "/rfm",
              "--op", "rfm", "--id-col", "uid", "--ts-col", "ts",
              "--value-col", "value"])
    rfm = {r.uid: r.frequency for r in spark.read.parquet(out + "/rfm").collect()}
    assert rfm == {1: 3, 2: 1}
    cli.main(["analyze", "--input", ev, "--output", out + "/gini",
              "--op", "gini", "--id-col", "uid", "--group-col", "etype",
              "--value-col", "value"])
    assert spark.read.parquet(out + "/gini").count() == 2
    # basket lift over (basket=uid, item=etype): pair (a,b) co-occurs
    # only in user 1's basket -> min_support=1 keeps it
    cli.main(["analyze", "--input", ev, "--output", out + "/lift",
              "--op", "lift", "--id-col", "uid", "--group-col", "etype",
              "--min-support", "1"])
    lift = spark.read.parquet(out + "/lift").collect()
    assert len(lift) == 1 and (lift[0].item_a, lift[0].item_b) == ("a", "b")
    import pytest

    with pytest.raises(SystemExit):
        cli.main(["analyze", "--input", ev, "--output", out + "/x",
                  "--op", "entropy", "--id-col", "uid"])


def test_cli_winnow_and_pmi(spark, corpus, tmp_path):
    import datetime

    out = str(tmp_path / "s4")
    # winnow over the jsonl corpus: the two near-identical bills share
    # fingerprints, the agricultural pair shares its own
    cli.main(["curate", "--input", corpus, "--output", out + "/win",
              "--op", "winnow", "--ngram", "4", "--window", "6"])
    win = {
        r.primary_key: (r.n_fingerprints, r.n_shared_fp)
        for r in spark.read.parquet(out + "/win").collect()
    }
    assert len(win) == 4
    assert all(v[0] > 0 for v in win.values())
    assert all(v[1] > 0 for v in win.values())  # both pairs share passages
    # pmi over a handmade event stream
    ev = str(tmp_path / "ev.parquet")
    spark.createDataFrame(
        [
            (0, 1, datetime.datetime(2001, 1, 1, 0, 0), "a"),
            (1, 1, datetime.datetime(2001, 1, 1, 0, 1), "b"),
            (2, 2, datetime.datetime(2001, 1, 1, 0, 0), "a"),
            (3, 2, datetime.datetime(2001, 1, 1, 9, 0), "b"),  # new session
        ],
        "eid long, uid long, ts timestamp, etype string",
    ).write.parquet(ev)
    cli.main(["analyze", "--input", ev, "--output", out + "/pmi",
              "--op", "pmi", "--id-col", "uid", "--group-col", "etype",
              "--tiebreak-col", "eid"])
    pmi = {(r.type_a, r.type_b): (r.n_ab, r.n_sessions)
           for r in spark.read.parquet(out + "/pmi").collect()}
    # sessions: {a,b}, {a}, {b} -> one co-occurrence over 3 sessions
    assert pmi == {("a", "b"): (1, 3)}
