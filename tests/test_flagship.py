from __future__ import annotations

from scabillmatch_spark.plans.bill_match import document_match


def test_document_match_runs(spark, sf_small):
    out = document_match(spark, sf_small)
    rows = out.collect()
    assert set(out.columns) == {"pk1", "pk2", "similarity"}
    for r in rows:
        assert r.pk1 < r.pk2
        assert 0.0 <= r.similarity <= 100.0
    # similarity sorted descending
    sims = [r.similarity for r in rows]
    assert sims == sorted(sims, reverse=True)
