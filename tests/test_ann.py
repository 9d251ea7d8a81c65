from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scabillmatch_spark.operators import ann


@pytest.fixture(scope="module")
def emb(spark, sf_small):
    return spark.read.parquet(f"{sf_small}/embeddings.parquet").select(
        "vec_id", "embedding"
    ).cache()


def test_ivf_recall_vs_brute_force(spark, emb):
    queries = emb.filter(F.col("vec_id") < 10)
    brute = ann.brute_force_topk(emb, queries, "vec_id", "embedding", 5)
    ivf = ann.ivf_topk(emb, queries, "vec_id", "embedding", k=5, n_cells=8, nprobe=4)
    b = {(r.query_id, r.neighbor_id) for r in brute.collect()}
    v = {(r.query_id, r.neighbor_id) for r in ivf.collect()}
    recall = len(b & v) / len(b)
    # nprobe=4 of 8 cells: expect to recover most true neighbors
    assert recall >= 0.5, f"IVF recall {recall}"
    assert len(v) == 50  # k per query


def test_ivf_probes_fewer_candidates(spark, emb):
    queries = emb.filter(F.col("vec_id") < 3)
    assigned, _ = ann.ivf_index(emb, "vec_id", "embedding", n_cells=8)
    cells = assigned.groupBy("cell").count().collect()
    assert len(cells) == 8
    total = sum(c["count"] for c in cells)
    assert total == emb.count()