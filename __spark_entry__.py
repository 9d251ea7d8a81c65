"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship near-duplicate document-match pipeline
(the reference's workflow 1+2 as one DataFrame plan). ``queries()`` /
``oracle_sql()`` expose each implemented operator from SURVEY.md §2 with a
DuckDB-equivalent oracle.

Oracle-parity conventions used throughout:
- Large double aggregates go through DECIMAL so both engines sum exactly,
  then one deterministic cast back to DOUBLE.
- O(1)-magnitude float math (cosine, ratios) is rounded to 6 decimals.
- Every LIMIT has a full deterministic ORDER BY tie-break.
- Deterministic hashing is md5 (identical in Spark and DuckDB); never
  engine-specific hash().
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from scabillmatch_spark.functions import similarity as SIM
from scabillmatch_spark.functions import text as TX
from scabillmatch_spark.io.sources import read_table as _t_impl
from scabillmatch_spark.operators import blocking, pairs
from scabillmatch_spark.plans.bill_match import document_match


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return _t_impl(spark, sf_dir, name)


def _dec_sum(col, alias: str):
    """Exact decimal sum cast back to double — bit-identical across engines."""
    return F.sum(F.col(col).cast("decimal(38,6)")).cast("double").alias(alias)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: LSH-blocked near-duplicate pairs on sf0.001 documents."""
    return document_match(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# Queries — each (spark, sf_dir) -> DataFrame, with a DuckDB oracle below.
# ---------------------------------------------------------------------------


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2+P1+P2+A1/A8: scan, filter pushdown, hash agg with exact sums."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = (
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))
    ).cast("decimal(38,8)")
    out = (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum("l_quantity", "sum_qty"),
            _dec_sum("l_extendedprice", "sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    return out


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-chain: customer ⋈ orders ⋈ lineitem, agg, top-10 skim."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1996-03-15")
    revenue = (
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))
    ).cast("decimal(38,8)")
    out = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"))
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )
    return out


def q_window_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 window: top-3 orders per customer by totalprice (row_number)."""
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


def q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-json: extract props.k, aggregate per event_type."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dec_sum("value", "sum_value"),
            F.sum(k).alias("sum_k"),
        )
    )


def q_doc_near_dup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's core semantics as one plan: tokenize -> blocked
    self-join (same lang, different source, pk1<pk2) -> token-set Jaccard
    (SimilarityMeasure.scala:78-95) -> threshold -> deterministic skim."""
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("primary_key"),
        F.col("lang"),
        F.col("source"),
        TX.token_set("text").alias("toks"),
    )
    cands = blocking.candidate_pairs(
        docs.withColumn("pk_num", F.col("primary_key").cast("long")),
        id_col="pk_num",
        group_col="source",
        block_col="lang",
    )
    scored = cands.select(
        F.col("pk1").alias("doc1"),
        F.col("pk2").alias("doc2"),
        SIM.jaccard(F.col("toks1"), F.col("toks2")).alias("similarity"),
    ).filter(F.col("similarity") >= 15.0)
    return scored.orderBy(F.desc("similarity"), F.asc("doc1"), F.asc("doc2")).limit(
        200
    ).select("doc1", "doc2", F.round("similarity", 6).alias("similarity"))


def q_doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by md5 of normalized text, keep min doc_id."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(F.lower(F.col("text"))).alias("fp"))
        .agg(F.min("doc_id").alias("keeper_id"), F.count(F.lit(1)).alias("dups"))
        .filter(F.col("dups") > 1)
    )


def q_emb_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search: brute-force cosine top-5 neighbors for each of the
    first 5 vectors. Query side broadcast; candidates scanned once."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    joined = emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(SIM.cosine_similarity(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 5)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "tpch_q1_pricing_summary": q_tpch_q1,
        "tpch_q3_shipping_priority": q_tpch_q3,
        "window_topn_orders_per_customer": q_window_topn,
        "events_json_agg": q_events_json,
        "doc_near_dup_jaccard": q_doc_near_dup_jaccard,
        "doc_exact_dedup": q_doc_exact_dedup,
        "emb_cosine_topk": q_emb_cosine_topk,
    }


# DuckDB-side tokenizer mirroring scabillmatch_spark.functions.text.token_set.
_DUCK_TOKSET = (
    "list_sort(list_distinct(list_filter("
    "string_split(regexp_replace(lower(text), '[0-9,:;?!.]', '', 'g'), ' '),"
    " x -> x <> '')))"
)


def oracle_sql() -> dict[str, str]:
    return {
        "tpch_q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
                   CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                        * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
                        AS DECIMAL(38,8))) AS DOUBLE) AS sum_disc_price,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "tpch_q3_shipping_priority": """
            SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
                   CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                        * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
                        AS DECIMAL(38,8))) AS DOUBLE) AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
              AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
            GROUP BY l_orderkey, o_orderdate
            ORDER BY revenue DESC, l_orderkey ASC
            LIMIT 10
        """,
        "window_topn_orders_per_customer": """
            SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       ROW_NUMBER() OVER (PARTITION BY o_custkey
                                          ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
                FROM orders
            ) WHERE rn <= 3
        """,
        "events_json_agg": """
            SELECT event_type,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
                   SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k
            FROM events
            GROUP BY event_type
        """,
        "doc_near_dup_jaccard": f"""
            WITH toks AS (
                SELECT doc_id, lang, source, {_DUCK_TOKSET} AS toks
                FROM documents
            ),
            pairs AS (
                SELECT a.doc_id AS d1, b.doc_id AS d2,
                       len(list_intersect(a.toks, b.toks)) AS inter,
                       len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) AS uni
                FROM toks a JOIN toks b
                  ON a.lang = b.lang AND a.doc_id < b.doc_id AND a.source <> b.source
            )
            SELECT CAST(d1 AS VARCHAR) AS doc1, CAST(d2 AS VARCHAR) AS doc2,
                   ROUND(100.0 * inter / uni, 6) AS similarity
            FROM pairs
            WHERE 100.0 * inter / uni >= 15.0
            ORDER BY 100.0 * inter / uni DESC, d1 ASC, d2 ASC
            LIMIT 200
        """,
        "doc_exact_dedup": """
            SELECT md5(lower(text)) AS fp, MIN(doc_id) AS keeper_id, COUNT(*) AS dups
            FROM documents
            GROUP BY md5(lower(text))
            HAVING COUNT(*) > 1
        """,
        "emb_cosine_topk": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
            scored AS (
                SELECT q.query_id, e.vec_id AS neighbor_id,
                       ROUND(list_dot_product(q.qv, e.v) /
                             (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))),
                             6) AS cos_sim
                FROM e JOIN q ON e.vec_id <> q.query_id
            )
            SELECT query_id, neighbor_id, cos_sim, rk FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                             ORDER BY cos_sim DESC, neighbor_id ASC) AS rk
                FROM scored
            ) WHERE rk <= 5
        """,
    }
