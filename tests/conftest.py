from __future__ import annotations

import os

import pytest

from scabillmatch_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s


# --- Tiered oracle mirror (r16; VERDICT r15 Next-round #1) -------------------
#
# The full 135-query sf0.01 DuckDB mirror grew the suite wall to 33:41 and
# the driver's verify window timed it out (VERIFY_r15 tests_ok:false — a
# tail of passing dots truncated at ~90%, no failure marker). Default tier:
# the driver's 50-row correctness window (exactly the first 50 registry
# entries — what the driver itself oracles) PLUS every query touched since
# the last round, oracled at sf0.01. Everything else keeps registry-wide
# plan-gate coverage (tests/test_plans.py) with the DataFrame built at
# sf0.001, where eager builders (model fits, streaming micro-batches,
# iterative loops) are cheap.
#
# SPARK_GRAFT_FULL_ORACLE=1 restores the full 135-query sf0.01 mirror —
# run it after any oracle/testdata/operator-internals change that could
# move values outside the touched set. The fresh-process driver rehearsal
# (tools_driver_rehearsal.py) remains the cheap full-window check.
FULL_ORACLE = os.environ.get("SPARK_GRAFT_FULL_ORACLE") == "1"

# Queries whose engine code paths changed since the last driver run —
# update this set every round alongside the changes themselves.
TOUCHED_SINCE_LAST_ROUND = {
    # r16 optimization round
    # (events_stream_interval_join: tee experiment REJECTED on plan
    # evidence — registered query unchanged, so not in the touched tier)
    "graph_cluster_audit",           # broadcast comp-lpa join
    "emb_cosine_near_dup",           # shared-cache wrapper (ADVICE r15)
    "emb_semantic_dedup",            # reads the wrapped shared cache
    "doc_label_propagation",         # shared-cache wrapper (ADVICE r15)
    "doc_substring_dup",             # substring num_partitions interaction
    # (doc_substring_rewrite is banked/unregistered — its substring.py
    # change is covered by tests/test_substring.py's oracle prevalidation)
    "graph_pagerank",                # plan-gate coverage re-added
    "doc_lm_perplexity",             # single-pass sentinel-pair LM training
    "tfidf_cosine_pairs",            # per-call persisted flat terms table
}


def oracle_tier_names() -> list[str]:
    """Registry names the sf0.01 oracle mirror covers this run, in
    registry order: the driver's window + touched rows, or everything
    under SPARK_GRAFT_FULL_ORACLE=1."""
    import __spark_entry__ as entrymod

    names = list(entrymod.queries())
    # a TOUCHED name outside the registry would silently add no coverage —
    # fail loudly instead (banked rows belong in their builder's own test)
    unknown = TOUCHED_SINCE_LAST_ROUND - set(names)
    assert not unknown, f"TOUCHED_SINCE_LAST_ROUND not in registry: {sorted(unknown)}"
    if FULL_ORACLE:
        return names
    window = names[:50]
    extra = [n for n in names[50:] if n in TOUCHED_SINCE_LAST_ROUND]
    return window + extra


# One build of each registry query DataFrame per session, shared by
# tests/test_oracle.py (values vs the DuckDB oracle) and
# tests/test_plans.py's registry-wide plan gate (no cartesian) — several
# query builders run internal actions (model fits, temp-dir writes), so
# building each twice would double the suite's wall time for no coverage.
# The build SF is decided HERE so both consumers share one DataFrame:
# sf0.01 for oracle-tier rows (the mirror collects their values), sf0.001
# for plan-gate-only rows (the gate only explains them, and no-cartesian /
# no-BNLJ verdicts are sf-independent — cartesians and nested loops come
# from the join CONDITION shape, not from input row counts).
_QUERY_DF_CACHE: dict = {}


def get_query_df(spark, name: str):
    if name not in _QUERY_DF_CACHE:
        import __spark_entry__ as entrymod

        sf = SF_MED if name in set(oracle_tier_names()) else SF_SMALL
        _QUERY_DF_CACHE[name] = entrymod.queries()[name](spark, sf)
    return _QUERY_DF_CACHE[name]


@pytest.fixture(scope="session")
def sf_small():
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_med():
    return SF_MED
