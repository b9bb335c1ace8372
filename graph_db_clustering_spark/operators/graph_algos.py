"""Iterative graph algorithms over the vertex/edge DataFrame graph
(operators/graph.Graph) — the "core graph analytics workflow" of the north
star, built Pregel-style: each iteration is one join + one aggregate
(aggregate_messages shape), with localCheckpoint() truncating lineage so a
50-iteration run doesn't build a 50-deep plan.

Scale posture: state per iteration is one row per vertex; messages shuffle
keyed by vertex id (AQE handles skewed hubs); nothing ever materializes on
the driver except the O(1) convergence scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_db_clustering_spark.operators.graph import EDGE_DST, EDGE_SRC, VERTEX_ID, Graph


def _undirected_edges(edges: DataFrame) -> DataFrame:
    """Both directions of every edge, deduplicated: (src, dst)."""
    fwd = edges.select(F.col(EDGE_SRC).alias("a"), F.col(EDGE_DST).alias("b"))
    return fwd.unionAll(fwd.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()


def connected_components(graph: Graph, max_iter: int = 50) -> DataFrame:
    """Undirected connected components by min-label propagation:
    every vertex starts labeled with its own id; each round it adopts the
    minimum label among itself and its neighbors; fixpoint = components.
    Converges in O(diameter) rounds on the propagation frontier.

    Returns (id, component) where component = min vertex id in the
    component (deterministic canonical label).
    """
    edges = _undirected_edges(graph.edges).cache()
    labels = graph.vertices.select(VERTEX_ID, F.col(VERTEX_ID).alias("component"))
    labels = labels.localCheckpoint()
    for _ in range(max_iter):
        # neighbor's current label, sent to each vertex
        msgs = (
            edges.join(labels, edges["b"] == labels[VERTEX_ID])
            .select(F.col("a").alias(VERTEX_ID), F.col("component").alias("nbr"))
            .groupBy(VERTEX_ID)
            .agg(F.min("nbr").alias("nbr_min"))
        )
        new_labels = (
            labels.join(msgs, VERTEX_ID, "left")
            .select(
                VERTEX_ID,
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), VERTEX_ID)
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels


def shortest_paths(graph: Graph, sources: DataFrame, max_iter: int = 50) -> DataFrame:
    """Unweighted shortest-path (BFS hop) distances from a set of source
    vertices, undirected. ``sources`` is a DataFrame with an ``id`` column.

    Min-propagation like connected_components, but the propagated label is
    hop count: sources start at 0, every round each vertex takes
    min(own dist, min(neighbor dist) + 1); fixpoint in O(eccentricity)
    rounds. Returns (id, dist) with dist NULL for unreachable vertices —
    the multi-source form also gives "distance to nearest seed"
    (label-propagation / BFS layering building block).
    """
    edges = _undirected_edges(graph.edges).cache()
    src = sources.select(VERTEX_ID).distinct().withColumn("dist", F.lit(0))
    state = (
        graph.vertices.select(VERTEX_ID).join(src, VERTEX_ID, "left").localCheckpoint()
    )
    for _ in range(max_iter):
        reached = state.filter(F.col("dist").isNotNull())
        msgs = (
            edges.join(reached, edges["b"] == reached[VERTEX_ID])
            .select(F.col("a").alias(VERTEX_ID), (F.col("dist") + 1).alias("nd"))
            .groupBy(VERTEX_ID)
            .agg(F.min("nd").alias("nd"))
        )
        new_state = (
            state.join(msgs, VERTEX_ID, "left")
            .select(
                VERTEX_ID,
                F.least(
                    F.coalesce("dist", "nd"), F.coalesce("nd", "dist")
                ).alias("dist"),
            )
            .localCheckpoint()
        )
        changed = (
            new_state.alias("n")
            .join(state.alias("o"), VERTEX_ID)
            .filter(~F.col("n.dist").eqNullSafe(F.col("o.dist")))
            .limit(1)
            .count()
        )
        state = new_state
        if changed == 0:
            break
    edges.unpersist()
    return state


def pagerank(
    graph: Graph,
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1e-6,
) -> DataFrame:
    """Standard PageRank with dangling-mass redistribution.

    Per iteration (all one distributed plan): contribution = rank/degree
    along each out-edge -> sum per destination; dangling vertices' rank is
    redistributed uniformly; stop when total L1 change < tol. Returns
    (id, rank) with sum(rank) == 1.
    """
    v = graph.vertices.select(VERTEX_ID)
    n = v.count()
    if n == 0:
        return v.select(VERTEX_ID, F.lit(0.0).alias("rank"))
    out_deg = graph.edges.groupBy(F.col(EDGE_SRC).alias(VERTEX_ID)).agg(
        F.count("*").alias("deg")
    )
    base = v.join(out_deg, VERTEX_ID, "left").select(
        VERTEX_ID, F.coalesce("deg", F.lit(0)).alias("deg")
    ).cache()
    edges = graph.edges.select(EDGE_SRC, EDGE_DST).cache()
    ranks = base.select(VERTEX_ID, F.lit(1.0 / n).alias("rank")).localCheckpoint()
    for _ in range(max_iter):
        with_deg = ranks.join(base, VERTEX_ID)
        # dangling mass: vertices with no out-edges leak their rank; collect
        # the scalar (O(1) driver traffic) and redistribute uniformly
        dangling = (
            with_deg.filter(F.col("deg") == 0).agg(F.sum("rank")).first()[0] or 0.0
        )
        contribs = (
            edges.join(with_deg, edges[EDGE_SRC] == with_deg[VERTEX_ID])
            .select(
                F.col(EDGE_DST).alias(VERTEX_ID),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
            .groupBy(VERTEX_ID)
            .agg(F.sum("c").alias("inflow"))
        )
        new_ranks = (
            base.join(contribs, VERTEX_ID, "left")
            .select(
                VERTEX_ID,
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("inflow"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
        delta = (
            new_ranks.alias("n")
            .join(ranks.alias("o"), VERTEX_ID)
            .agg(F.sum(F.abs(F.col("n.rank") - F.col("o.rank"))))
            .first()[0]
        )
        ranks = new_ranks
        if delta is not None and delta < tol:
            break
    base.unpersist()
    edges.unpersist()
    return ranks


def triangle_count(graph: Graph) -> DataFrame:
    """Per-vertex triangle participation count (undirected).

    Plan: canonical edges (a<b) self-joined on the shared endpoint to form
    wedges, then a semi-join-style match against the edge set closes them.
    Each triangle {x<y<z} is found exactly once as wedge (x-y, x-z) +
    closing edge (y, z); counts are then credited to all three corners.
    Joins are keyed equi-joins; the classic optimization (order wedges by
    degree) can be added for power-law graphs."""
    e = (
        _undirected_edges(graph.edges)
        .filter(F.col("a") < F.col("b"))
        .cache()
    )
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    wedges = e1.join(e2, "x").filter(F.col("y") < F.col("z"))
    closing = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    triangles = wedges.join(closing, ["y", "z"]).select("x", "y", "z")
    per_vertex = (
        triangles.select(F.explode(F.array("x", "y", "z")).alias(VERTEX_ID))
        .groupBy(VERTEX_ID)
        .agg(F.count("*").alias("triangles"))
    )
    out = graph.vertices.select(VERTEX_ID).join(per_vertex, VERTEX_ID, "left").select(
        VERTEX_ID, F.coalesce("triangles", F.lit(0)).alias("triangles")
    )
    e.unpersist()
    return out
