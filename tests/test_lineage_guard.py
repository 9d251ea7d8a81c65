"""Lineage-growth regression guard for the iterative DataFrame operators
(the r11 verdict ask, born from the r10 defect class).

The defect this exists to catch: a loop whose state frame is referenced
TWICE per round (pregel: aggregate_messages + the update join; directed
LPA: neighbor join + carry-over) and not lineage-cut EVERY round doubles
its logical plan per round — round 1's join tree re-executes up to 2^k
times. r10 shipped pregel/LPA cutting every CHECKPOINT_EVERY=5 rounds and
the first sf0.1 bench of doc_label_propagation cost 10.49 s (1.67 s once
cut per round); nothing in the r10 suite asserted lineage growth, so it
survived pytest, rehearsals, and a plan audit. This file is that missing
assertion.

Mechanism: every loop operator truncates lineage through
``DataFrame.localCheckpoint`` locally (directly or via
``graph._round_materialize(run_dir=None)``). The guard wraps
localCheckpoint with a spy that, at every cut, counts how many times the
EDGES PARQUET RELATION appears in the analyzed plan about to be cut (the
test reads its edges from a parquet file it wrote, so every reference is
a countable ``parquet`` relation node; no other parquet exists in these
plans). Each uncut round adds at least one edge-relation reference, so:

- a per-round-cut loop presents O(1) references at every cut (the state
  side is a checkpointed LogicalRDD; only the current round's edge join
  adds scans) -> PER_ROUND_REF_BOUND;
- the r10 doubling regression presents ~2^5 references by the round-5
  cut (>= 30 with undirect's two orientations) -> far past any bound;
- pagerank (state referenced ONCE per round — growth is linear, and the
  documented cadence is every CHECKPOINT_EVERY rounds) presents up to
  ~4 references per uncut round -> LINEAR_REF_BOUND, which a doubling
  regression still blows through (62 vs 30 by round 5).

A second independent trip wire: operators contracted to cut EVERY round
must produce at least one localCheckpoint per executed round — reverting
the cadence fails this count even on plans too small to trip the
reference bound.

Deliberately reverting label_propagation's per-round cut to the r10
cadence was verified (at authoring time) to fail both assertions.
"""
from __future__ import annotations

import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scabillmatch_spark.operators import graph as G

# Max edge-relation references allowed in any plan handed to a lineage
# cut (or returned as the final result) by an every-round-cut loop.
# Measured legit maxima are <= 6 (undirect binds two orientations and
# some loops join edges twice per round); the doubling defect shows >= 30
# by round 5.
PER_ROUND_REF_BOUND = 10
# pagerank cuts every CHECKPOINT_EVERY=5 rounds and references state once
# per round: the cached-but-analyzed-in-full e_w/verts subtrees carry ~8
# edge refs per uncut round, measured 44 at the cadence-5 cut — legit
# LINEAR growth. A double-reference regression compounds instead
# (refs(k) ~ 2*refs(k-1)+8: 10, 28, 64, 136, 280 ...), crossing this
# bound by round 3 and sitting at ~280 by the first cadence cut.
LINEAR_REF_BOUND = 50


@pytest.fixture(scope="module")
def edges_path(spark, tmp_path_factory):
    """A 16-vertex path graph 0-1-2-...-15 written to parquet, so every
    reference to the edge list is a countable parquet relation. A path
    maximizes round counts (BFS depth, peeling depth, pointer-doubling
    rounds) at minimal size."""
    p = str(tmp_path_factory.mktemp("lineage") / "edges.parquet")
    rows = [(i, i + 1, 1.0) for i in range(15)]
    spark.createDataFrame(rows, "src long, dst long, weight double").coalesce(
        1
    ).write.parquet(p)
    return p


def _refs(df: DataFrame) -> int:
    """Edge-parquet relation references in the ANALYZED plan (analysis
    resolves view/alias nesting but runs no optimizer rewrites — it shows
    the raw accumulated lineage, which is exactly what grows)."""
    return df._jdf.queryExecution().analyzed().toString().count("parquet")


class _CutSpy:
    def __init__(self):
        self.ref_counts: list[int] = []

    def install(self, monkeypatch):
        # pyspark 4: concrete sessions build classic.dataframe.DataFrame,
        # which overrides the pyspark.sql.DataFrame facade — patch the
        # class the instances actually resolve methods on
        from pyspark.sql.classic.dataframe import DataFrame as ClassicDF

        orig = ClassicDF.localCheckpoint

        def spy(df, eager=True):
            self.ref_counts.append(_refs(df))
            return orig(df, eager)

        monkeypatch.setattr(ClassicDF, "localCheckpoint", spy)


def _run(monkeypatch, fn):
    spy = _CutSpy()
    spy.install(monkeypatch)
    final = fn()
    final_refs = _refs(final)
    # consume the result so lazy tails execute under the spy too
    final.collect()
    return spy.ref_counts, final_refs


def _assert_bounded(cuts, final_refs, bound, min_cuts):
    assert cuts, "operator never cut lineage — the guard saw no checkpoint"
    assert len(cuts) >= min_cuts, (
        f"expected >= {min_cuts} lineage cuts (one per round), saw "
        f"{len(cuts)}: the per-round cadence contract is broken"
    )
    worst = max(cuts + [final_refs])
    assert worst <= bound, (
        f"a plan at a lineage cut (or the final plan) references the edge "
        f"relation {worst} times (bound {bound}): lineage is accumulating "
        f"across rounds — see the r10 pregel/LPA doubling defect"
    )


def test_label_propagation_lineage(spark, edges_path, monkeypatch):
    e = spark.read.parquet(edges_path)
    cuts, fin = _run(
        monkeypatch,
        lambda: G.label_propagation(e, max_iter=6, num_shuffle_partitions=2),
    )
    _assert_bounded(cuts, fin, PER_ROUND_REF_BOUND, min_cuts=6)


def test_label_propagation_directed_lineage(spark, edges_path, monkeypatch):
    # the directed path keeps the carry-over join = state referenced
    # twice per round — the exact doubling-prone shape
    e = spark.read.parquet(edges_path)
    cuts, fin = _run(
        monkeypatch,
        lambda: G.label_propagation(
            e, max_iter=6, undirected=False, num_shuffle_partitions=2
        ),
    )
    _assert_bounded(cuts, fin, PER_ROUND_REF_BOUND, min_cuts=6)


def test_pregel_lineage(spark, edges_path, monkeypatch):
    e = spark.read.parquet(edges_path)
    verts = G.vertices_from_edges(G.undirect(e))
    cuts, fin = _run(
        monkeypatch,
        lambda: G.pregel(
            G.undirect(e),
            verts,
            initial_state=F.col("id").cast("double"),
            agg_msgs=F.sum("msg"),
            update_state=F.coalesce(F.col("msg"), F.col("state")),
            send_to_dst=F.col("src.state"),
            max_iter=6,
            num_shuffle_partitions=2,
        ),
    )
    _assert_bounded(cuts, fin, PER_ROUND_REF_BOUND, min_cuts=6)


def test_connected_components_lineage(spark, edges_path, monkeypatch):
    e = spark.read.parquet(edges_path)
    cuts, fin = _run(
        monkeypatch,
        lambda: G.connected_components(e, num_shuffle_partitions=2),
    )
    # pointer doubling on a 16-path converges in ~4-5 rounds
    _assert_bounded(cuts, fin, PER_ROUND_REF_BOUND, min_cuts=3)


def test_k_core_lineage(spark, edges_path, monkeypatch):
    e = spark.read.parquet(edges_path)
    cuts, fin = _run(
        monkeypatch,
        lambda: G.k_core(e, k=2, num_shuffle_partitions=2),
    )
    # peeling a 16-path at k=2 strips both endpoints per round
    _assert_bounded(cuts, fin, PER_ROUND_REF_BOUND, min_cuts=5)


def test_weighted_shortest_paths_lineage(spark, edges_path, monkeypatch):
    e = spark.read.parquet(edges_path)
    cuts, fin = _run(
        monkeypatch,
        lambda: G.weighted_shortest_paths(
            e, landmark=0, max_iter=6, num_shuffle_partitions=2
        ),
    )
    _assert_bounded(cuts, fin, PER_ROUND_REF_BOUND, min_cuts=6)


def test_shortest_paths_lineage(spark, edges_path, monkeypatch):
    e = spark.read.parquet(edges_path)
    cuts, fin = _run(
        monkeypatch,
        lambda: G.shortest_paths(e, landmarks=0, max_depth=6, num_shuffle_partitions=2),
    )
    _assert_bounded(cuts, fin, PER_ROUND_REF_BOUND, min_cuts=6)


def test_bfs_lineage(spark, edges_path, monkeypatch):
    e = spark.read.parquet(edges_path)
    cuts, fin = _run(
        monkeypatch,
        lambda: G.bfs(
            e,
            F.col("id") == 0,
            F.col("id") == 5,
            max_path_length=6,
            num_shuffle_partitions=2,
        ),
    )
    # 5 depths to reach vertex 5 on the path, frontier cut per depth
    _assert_bounded(cuts, fin, PER_ROUND_REF_BOUND, min_cuts=5)


def test_pagerank_lineage(spark, edges_path, monkeypatch):
    # state referenced ONCE per round: growth between the cadence-5 cuts
    # is LINEAR (documented); the bound still catches a double-reference
    # regression, which exceeds it by the first cut.
    e = spark.read.parquet(edges_path)
    cuts, fin = _run(
        monkeypatch,
        lambda: G.pagerank(e, max_iter=12, num_shuffle_partitions=2),
    )
    # cuts at rounds 5 and 10
    _assert_bounded(cuts, fin, LINEAR_REF_BOUND, min_cuts=2)
