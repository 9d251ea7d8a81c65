"""Lexical retrieval over the document corpus: BM25 scoring + top-k.

The reference ships text-similarity *pair* scoring only (all-pairs /
LSH-candidate shapes, SimilarityMeasure.scala:78-95); a training-data
pipeline also needs the QUERY shape — "find the k corpus documents most
relevant to these terms" — for eval-set curation, targeted decontamination
sweeps (pull everything that even smells like an eval question before the
n-gram pass), and RAG-style retrieval audits. BM25 (Robertson/Sparck
Jones; the Lucene-default ranking function) is the standard lexical
scorer, published in the public IR literature and implemented here from
the textbook formula:

    score(d, Q) = sum_{t in Q} idf(t) * tf(t,d) * (k1 + 1)
                  / (tf(t,d) + k1 * (1 - b + b * |d| / avgdl))
    idf(t)      = ln(1 + (N - df(t) + 0.5) / (df(t) + 0.5))   [Lucene form]

Scale shape (the reason this is an operator and not a UDF): the only
per-corpus work is one narrow projection (tokenize = pure Column
expressions pipelined into the scan) and one explode FILTERED TO THE
QUERY TERMS before anything shuffles — the shuffled relation is the
postings of the query's terms only (work proportional to matching
postings, never corpus x vocabulary). Document frequencies for the <=
|Q| terms aggregate to a frame of |Q| rows, broadcast back; N and avgdl
are two driver scalars from one tiny agg (the weighted-pagerank
verts.count() precedent). Top-k is TakeOrderedAndProject — per-partition
heaps + a driver merge of k rows, no global sort shuffle.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scabillmatch_spark.functions.text import tokens


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document BM25 score for one query -> (id_col, n_hits, score).

    Only documents containing at least one query term appear (BM25 gives
    every other document score 0 — emitting the zeros would materialize
    the corpus for no information). ``n_hits`` = how many DISTINCT query
    terms the document contains, a cheap relevance diagnostic.
    """
    if not query_terms:
        raise ValueError("bm25_scores needs at least one query term")
    terms = sorted(set(query_terms))

    toks = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    ).select(id_col, "__toks", F.size("__toks").alias("__dl"))

    # two tiny driver scalars; the corpus-wide agg is one job over the
    # narrow (id, dl) projection
    n_docs, avgdl = toks.agg(
        F.count(F.lit(1)), F.avg("__dl").cast("double")
    ).first()
    if not n_docs:
        raise ValueError("bm25_scores: empty corpus")

    # postings of the query terms ONLY: the isin filter runs inside the
    # explode projection, so nothing else reaches the (id, term) shuffle
    tf = (
        toks.select(id_col, "__dl", F.explode("__toks").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy(id_col, "__dl", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )

    # df/idf per term: <= |Q| rows, broadcast back onto the postings
    idf = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).cast("double").alias("df"))
        .select(
            "term",
            F.log(
                F.lit(1.0)
                + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ).alias("idf"),
        )
    )

    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.lit(float(avgdl))
    )
    per_term = tf.join(F.broadcast(idf), "term").select(
        id_col,
        "term",
        (
            F.col("idf") * F.col("tf") * F.lit(k1 + 1.0) / (F.col("tf") + norm)
        ).alias("s"),
    )
    return per_term.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_hits"),
        F.sum("s").alias("score"),
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """Top-k BM25 hits -> (id_col, n_hits, score) with the score ROUNDED
    BEFORE ranking and ties broken by ascending id — the house pattern
    (q_emb_cosine_topk) that keeps float rankings identical across
    engines. Plan: TakeOrderedAndProject over :func:`bm25_scores`."""
    scored = bm25_scores(
        docs, query_terms, k1=k1, b=b, id_col=id_col, text_col=text_col
    ).select(
        id_col, "n_hits", F.round("score", round_digits).alias("score")
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def phrase_search(
    docs: DataFrame,
    phrase: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact multi-token phrase matching via positional postings ->
    (id_col, n_matches, first_pos), matching docs only. Overlapping
    occurrences each count ("batch batch batch" matches the phrase
    "batch batch" at anchors 0 AND 1); ``first_pos`` is the 0-based
    token position of the earliest occurrence. All-integer output — no
    float discipline needed.

    The distributed shape is the classic positional-index trick: a
    posting for phrase index i at token position p is normalized to
    ``anchor = p - i``; a phrase occurrence at anchor a is exactly the
    anchors holding ALL len(phrase) distinct indices. The posexplode is
    filtered to the phrase's terms BEFORE anything shuffles (postings
    of the phrase terms only — work proportional to matching postings,
    never corpus positions), the (term -> index) spec is a broadcast of
    len(phrase) rows (duplicate terms fan a posting to each index they
    occupy), and every exchange carries three longs.
    """
    if not phrase:
        raise ValueError("phrase_search needs at least one term")
    m = len(phrase)
    spec = docs.sparkSession.createDataFrame(
        [(t, i) for i, t in enumerate(phrase)], "term string, idx long"
    )
    postings = (
        docs.select(
            F.col(id_col),
            F.posexplode(tokens(F.col(text_col))).alias("pos", "term"),
        )
        .filter(F.col("term").isin(sorted(set(phrase))))
    )
    anchored = (
        postings.join(F.broadcast(spec), "term")
        .select(
            id_col,
            (F.col("pos").cast("long") - F.col("idx")).alias("anchor"),
            "idx",
        )
        .filter(F.col("anchor") >= 0)
    )
    occ = (
        anchored.groupBy(id_col, "anchor")
        .agg(F.count_distinct("idx").alias("__k"))
        .filter(F.col("__k") == m)
    )
    return occ.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_matches"),
        F.min("anchor").cast("long").alias("first_pos"),
    )
