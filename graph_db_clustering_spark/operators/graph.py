"""Property-graph layer: vertex/edge DataFrames replacing the Neo4j tier.

The reference stores its graph in Neo4j and queries it with Cypher strings
over Bolt (reference: kmeans_clustering/database.py:32, and every query in
image_classification.py). GraphX has no Python API, so the idiomatic PySpark
representation is GraphFrames-style vertex/edge DataFrames:

    vertices: id (long) + arbitrary property columns (label, name, ...)
    edges:    src (long), dst (long), relationship (string) + properties

Every graph operation below is a plain DataFrame plan — joins and
aggregations Catalyst can optimize — so the graph scales with the cluster
instead of a single Neo4j server, and "queries" never leave the JVM.

Cypher -> DataFrame mapping implemented here (file:line = reference):
    MATCH (n:Label) RETURN n                 -> filter_vertices (image_classification.py:373-380)
    MATCH (a)-[r]->(b)                       -> triplets        (image_classification.py:465-468)
    MATCH (i)-[r]->(c) RETURN c, count(r)    -> in_degrees      (image_classification.py:513-522)
    CREATE (n {props})                       -> add_vertices    (image_classification.py:217-221)
    MATCH (a),(b) CREATE (a)-[r]->(b)        -> add_edges       (database.py:51-67)
    MATCH ()-[r]-() DELETE r                 -> remove_edges    (image_classification.py:353-362)
    MATCH (n) DETACH DELETE n                -> GraphStore.truncate (database.py:42-48)
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

VERTEX_ID = "id"
EDGE_SRC = "src"
EDGE_DST = "dst"


@dataclass(frozen=True)
class Graph:
    """Immutable property graph over two DataFrames.

    Mutations return new Graph values (Spark DataFrames are immutable);
    persistence is snapshot-based via GraphStore, mirroring the reference's
    truncate-and-rewrite usage pattern without per-row transactions.
    """

    vertices: DataFrame
    edges: DataFrame

    def __post_init__(self) -> None:
        if VERTEX_ID not in self.vertices.columns:
            raise ValueError(f"vertices must have an '{VERTEX_ID}' column")
        missing = {EDGE_SRC, EDGE_DST} - set(self.edges.columns)
        if missing:
            raise ValueError(f"edges missing columns: {missing}")

    # -- Cypher MATCH analogs ------------------------------------------------

    def filter_vertices(self, condition: Column | str) -> "Graph":
        """Keep vertices matching `condition`; drop dangling edges via
        left-semi joins (no data widening, Catalyst pushes the filters)."""
        v = self.vertices.filter(condition)
        ids = v.select(F.col(VERTEX_ID))
        e = (
            self.edges.join(ids.withColumnRenamed(VERTEX_ID, EDGE_SRC), EDGE_SRC, "left_semi")
            .join(ids.withColumnRenamed(VERTEX_ID, EDGE_DST), EDGE_DST, "left_semi")
        )
        return Graph(v, e)

    def filter_edges(self, condition: Column | str) -> "Graph":
        return Graph(self.vertices, self.edges.filter(condition))

    def triplets(self) -> DataFrame:
        """(src-vertex, edge, dst-vertex) join — the MATCH (a)-[r]->(b)
        pattern (image_classification.py:465-468). Vertex columns are
        prefixed src_/dst_. Two equi-joins; Catalyst broadcasts whichever
        vertex side is small (e.g. the k-row centroid set)."""
        src_v = self.vertices.select(
            [F.col(c).alias(f"src_{c}") for c in self.vertices.columns]
        )
        dst_v = self.vertices.select(
            [F.col(c).alias(f"dst_{c}") for c in self.vertices.columns]
        )
        return self.edges.join(
            src_v, self.edges[EDGE_SRC] == src_v[f"src_{VERTEX_ID}"]
        ).join(dst_v, self.edges[EDGE_DST] == dst_v[f"dst_{VERTEX_ID}"])

    # -- degrees (count_connections analog) ---------------------------------

    def in_degrees(self) -> DataFrame:
        """Edges-per-destination (image_classification.py:505-522 counts
        CLOSEST_TO edges per centroid). Map-side partial count, then a
        tiny shuffle keyed by dst."""
        return self.edges.groupBy(F.col(EDGE_DST).alias(VERTEX_ID)).agg(
            F.count("*").alias("in_degree")
        )

    def out_degrees(self) -> DataFrame:
        return self.edges.groupBy(F.col(EDGE_SRC).alias(VERTEX_ID)).agg(
            F.count("*").alias("out_degree")
        )

    def degrees(self) -> DataFrame:
        """Total degree via a single union+agg (not a join of in/out)."""
        ends = self.edges.select(F.col(EDGE_SRC).alias(VERTEX_ID)).unionAll(
            self.edges.select(F.col(EDGE_DST).alias(VERTEX_ID))
        )
        return ends.groupBy(VERTEX_ID).agg(F.count("*").alias("degree"))

    # -- mutation (immutable snapshots) -------------------------------------

    def add_vertices(self, new_vertices: DataFrame) -> "Graph":
        """Batch insert (the reference does one CREATE transaction per image,
        image_classification.py:217-221 — an N-round-trip anti-pattern; here
        it is one unionByName)."""
        return Graph(
            self.vertices.unionByName(new_vertices, allowMissingColumns=True), self.edges
        )

    def add_edges(self, new_edges: DataFrame) -> "Graph":
        """Generic relationship creation (database.py:51-67)."""
        return Graph(
            self.vertices, self.edges.unionByName(new_edges, allowMissingColumns=True)
        )

    def remove_edges(self, condition: Column | str | None = None) -> "Graph":
        """DELETE r; with no condition, drop all edges
        (image_classification.py:353-362)."""
        if condition is None:
            return Graph(self.vertices, self.edges.limit(0))
        return Graph(self.vertices, self.edges.filter(~F.expr(condition) if isinstance(condition, str) else ~condition))

    # -- message passing -----------------------------------------------------

    def aggregate_messages(
        self,
        msg_to_dst: Column | None = None,
        msg_to_src: Column | None = None,
        agg: Column | None = None,
    ) -> DataFrame:
        """GraphFrames-style aggregateMessages over triplets: evaluate the
        message expressions against triplets() columns, send to dst and/or
        src, aggregate per receiving vertex. One join pass + one hash agg —
        the building block for iterative graph algorithms (the k-means
        update step is exactly: msg_to_dst=src features, agg=avg)."""
        t = self.triplets()
        parts = []
        if msg_to_dst is not None:
            parts.append(
                t.select(F.col(EDGE_DST).alias(VERTEX_ID), msg_to_dst.alias("msg"))
            )
        if msg_to_src is not None:
            parts.append(
                t.select(F.col(EDGE_SRC).alias(VERTEX_ID), msg_to_src.alias("msg"))
            )
        if not parts:
            raise ValueError("provide msg_to_dst and/or msg_to_src")
        msgs = parts[0]
        for p in parts[1:]:
            msgs = msgs.unionAll(p)
        agg = agg if agg is not None else F.collect_list("msg").alias("msgs")
        return msgs.groupBy(VERTEX_ID).agg(agg)


class GraphStore:
    """Snapshot persistence for a Graph: one parquet dir per component,
    truncate-rewrite on mutation — the distributed analog of the
    reference's flush_database (database.py:42-48). Batched columnar
    writes; never per-row."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def _p(self, which: str) -> str:
        return os.path.join(self.path, which)

    def save(self, graph: Graph) -> None:
        graph.vertices.write.mode("overwrite").parquet(self._p("vertices"))
        graph.edges.write.mode("overwrite").parquet(self._p("edges"))

    def load(self) -> Graph:
        return Graph(
            self.spark.read.parquet(self._p("vertices")),
            self.spark.read.parquet(self._p("edges")),
        )

    def truncate(self) -> None:
        """MATCH (n) DETACH DELETE n — as an overwrite with empty frames.

        Empty frames are built from the schema (not limit(0) on the loaded
        frames, whose lineage would read the very path being overwritten)."""
        g = self.load()
        for which, schema in (("vertices", g.vertices.schema), ("edges", g.edges.schema)):
            self.spark.createDataFrame([], schema).write.mode("overwrite").parquet(
                self._p(which)
            )
