"""Graph analytics over the similarity-pair relation.

The reference builds a GraphFrame from scored pairs and runs PageRank,
shortest paths, and triangle count (graph/GraphUtils.scala:16-41). PySpark
has no GraphX binding and the GraphFrames jar isn't assumed present, so
these are bounded-iteration DataFrame algorithms — joins + aggregations that
Catalyst/AQE plan like any other query. ``localCheckpoint`` every few
iterations truncates lineage (the known hazard of iterative DataFrame plans).

Graph representation: plain DataFrames —
  vertices(id [, attrs...]), edges(src, dst [, weight])
mirroring GraphUtils.scala:19-20 (vertices = (primary_key, content),
edges = (pk1, pk2, similarity)).

Scale notes: each PageRank iteration is one shuffle on dst (plus a broadcast
of the small rank-sum); triangle count is two self-joins on canonical edges —
shuffle-heavy but linear in triangle count; BFS shuffles the frontier only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHECKPOINT_EVERY = 5


def undirect(edges: DataFrame) -> DataFrame:
    """Duplicate each edge in both directions (similarity pairs are
    symmetric)."""
    return edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def vertices_from_edges(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    reset_prob: float = 0.15,
    max_iter: int = 10,
    undirected: bool = True,
) -> DataFrame:
    """PageRank by power iteration -> (id, pagerank).

    rank_{t+1}(v) = reset_prob/N + (1-reset_prob) * Σ_{u->v} rank_t(u)/outdeg(u)

    (GraphFrames' resetProbability/maxIter semantics, GraphUtils.scala:24-31;
    dangling mass is dropped, matching the reference's usage on similarity
    graphs where every vertex has degree >= 1.)
    """
    e = undirect(edges) if undirected else edges.select("src", "dst")
    verts = vertices_from_edges(e).cache()
    n = verts.count()
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    e_w = e.join(outdeg, "src").cache()

    ranks = verts.select("id", F.lit(1.0 / n).alias("rank"))
    for i in range(max_iter):
        contribs = (
            e_w.join(ranks, e_w.src == ranks.id)
            .select("dst", (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("insum"))
        )
        ranks = verts.join(contribs, verts.id == contribs.dst, "left").select(
            "id",
            (
                F.lit(reset_prob / n)
                + F.lit(1.0 - reset_prob) * F.coalesce(F.col("insum"), F.lit(0.0))
            ).alias("rank"),
        )
        if (i + 1) % CHECKPOINT_EVERY == 0:
            ranks = ranks.localCheckpoint()
    return ranks.select("id", F.col("rank").alias("pagerank"))


def triangle_count(edges: DataFrame) -> DataFrame:
    """Total triangles via canonical-ordered two-hop join -> 1-row (n_triangles).

    Canonicalize a<b to count each triangle once (GraphUtils.scala:38-41
    returns per-vertex counts; global count is returned here, per-vertex via
    triangles())."""
    tri = triangles(edges)
    return tri.agg(F.count(F.lit(1)).alias("n_triangles"))


def triangles(edges: DataFrame) -> DataFrame:
    """All (a,b,c) triangles with a<b<c from an undirected edge list."""
    e = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .cache()
    )
    ab = e.select(F.col("a"), F.col("b"))
    bc = e.select(F.col("a").alias("b"), F.col("b").alias("c"))
    ac = e.select(F.col("a").alias("a2"), F.col("b").alias("c2"))
    return (
        ab.join(bc, "b")
        .join(ac, (F.col("a") == F.col("a2")) & (F.col("c") == F.col("c2")))
        .select("a", "b", "c")
    )


def triangle_count_per_vertex(edges: DataFrame) -> DataFrame:
    """Per-vertex triangle participation (GraphFrames triangleCount shape)."""
    tri = triangles(edges)
    verts = (
        tri.select(F.col("a").alias("id"))
        .union(tri.select(F.col("b").alias("id")))
        .union(tri.select(F.col("c").alias("id")))
    )
    return verts.groupBy("id").agg(F.count(F.lit(1)).alias("count"))


def weighted_shortest_paths(
    edges: DataFrame,
    landmark,
    weight_col: str = "weight",
    max_iter: int = 10,
    undirected: bool = True,
) -> DataFrame:
    """Min-cost path distances by bounded Bellman-Ford relaxation ->
    (id, distance). The reference README mentions Dijkstra min-cost paths
    (README.md:163) but never implements them; this is the DataFrame-native
    equivalent: each iteration relaxes all edges (one shuffle on dst).
    """
    e = edges.select("src", "dst", weight_col)
    if undirected:
        e = e.union(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), F.col(weight_col)
            )
        )
    e = e.cache()
    spark = edges.sparkSession
    dist = spark.createDataFrame([(landmark, 0.0)], ["id", "distance"])
    for i in range(max_iter):
        relaxed = (
            dist.join(e, dist.id == e.src)
            .select(F.col("dst").alias("id"), (F.col("distance") + F.col(weight_col)).alias("distance"))
        )
        new_dist = (
            dist.union(relaxed)
            .groupBy("id")
            .agg(F.min("distance").alias("distance"))
        )
        new_dist = new_dist.localCheckpoint()
        # converged when no distance improved
        if new_dist.join(
            dist.withColumnRenamed("distance", "old"), "id", "left"
        ).filter(F.col("old").isNull() | (F.col("distance") < F.col("old"))).isEmpty():
            dist = new_dist
            break
        dist = new_dist
    return dist


def shortest_paths(
    edges: DataFrame,
    landmark,
    max_depth: int = 6,
    undirected: bool = True,
) -> DataFrame:
    """BFS hop distance from one landmark -> (id, distance), bounded depth.

    (GraphUtils.scala:33-36 runs GraphFrames shortestPaths to landmark set;
    bounded-iteration frontier BFS is the DataFrame-native equivalent.)
    """
    e = (undirect(edges) if undirected else edges.select("src", "dst")).cache()
    dist = e.sparkSession.createDataFrame([(landmark, 0)], ["id", "distance"])
    frontier = dist
    for d in range(1, max_depth + 1):
        nxt = (
            frontier.join(e, frontier.id == e.src)
            .select(F.col("dst").alias("id"), F.lit(d).alias("distance"))
            .distinct()
            .join(dist.select(F.col("id").alias("seen")), F.col("id") == F.col("seen"), "left_anti")
            .distinct()
        )
        nxt = nxt.localCheckpoint()
        if nxt.isEmpty():
            break
        dist = dist.union(nxt)
        frontier = nxt
    return dist
