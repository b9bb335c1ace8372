"""Neo4j admin-import CSV loader: the migration on-ramp for the graph
surface.

`neo4j-admin database import` defines a public CSV header convention
(neo4j.com docs): node files carry `myId:ID`, optional `:LABEL`, and
typed property columns (`name:string`, `age:int`, `score:float`,
`flag:boolean`); relationship files carry `:START_ID`, `:END_ID`,
`:TYPE`, plus typed properties. A user leaving Neo4j has these exact
files (or can produce them with one command) — this loader turns them
into the engine's Graph (operators/graph), after which every Cypher
query and graph algorithm in the repo runs unchanged.

Plan: plain distributed CSV scans; header parsing renames/casts
columns (ID -> 'id', START_ID/END_ID -> 'src'/'dst', TYPE ->
'relationship') with Spark casts — no Python per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_db_clustering_spark.operators.graph import Graph

_TYPES = {
    "int": "long",
    "long": "long",
    "float": "double",
    "double": "double",
    "boolean": "boolean",
    "string": "string",
}


def _parse_header(cols: list[str], kind: str) -> list[tuple[str, str, str]]:
    """[(source_col, out_name, cast_type)] per the admin-import
    convention; kind in {'nodes', 'rels'}."""
    out = []
    for c in cols:
        name, _, suffix = c.partition(":")
        suffix = suffix.strip()
        lowered = suffix.upper()
        if lowered == "ID":
            out.append((c, "id", "long"))
        elif lowered == "START_ID":
            out.append((c, "src", "long"))
        elif lowered == "END_ID":
            out.append((c, "dst", "long"))
        elif lowered == "TYPE":
            out.append((c, "relationship", "string"))
        elif lowered == "LABEL":
            out.append((c, "label", "string"))
        elif suffix:
            if suffix.lower() not in _TYPES:
                raise ValueError(
                    f"neo4j_csv: unsupported property type {suffix!r} in {c!r}"
                )
            out.append((c, name, _TYPES[suffix.lower()]))
        else:
            out.append((c, name or c, "string"))
    names = [n for _, n, _ in out]
    required = {"nodes": ["id"], "rels": ["src", "dst"]}[kind]
    missing = [r for r in required if r not in names]
    if missing:
        raise ValueError(f"neo4j_csv: header missing {missing} columns: {cols}")
    return out


def read_neo4j_graph(
    spark: SparkSession, nodes_path: str, rels_path: str
) -> Graph:
    """Two admin-import CSV locations -> Graph(vertices, edges)."""
    nodes_raw = spark.read.option("header", True).csv(nodes_path)
    rels_raw = spark.read.option("header", True).csv(rels_path)
    nodes = nodes_raw.select(
        *[
            F.col(f"`{src}`").cast(t).alias(n)
            for src, n, t in _parse_header(nodes_raw.columns, "nodes")
        ]
    )
    rel_cols = _parse_header(rels_raw.columns, "rels")
    rels = rels_raw.select(
        *[F.col(f"`{src}`").cast(t).alias(n) for src, n, t in rel_cols]
    )
    if "relationship" not in rels.columns:
        rels = rels.withColumn("relationship", F.lit("RELATED"))
    return Graph(nodes, rels)


def write_neo4j_csv(graph: Graph, nodes_path: str, rels_path: str) -> None:
    """The inverse: export a Graph to admin-import CSVs (the files
    `neo4j-admin database import` consumes), typing property columns
    by their Spark types. Distributed CSV writes; the id/src/dst/
    relationship columns map back to :ID/:START_ID/:END_ID/:TYPE."""
    _SUFFIX = {
        "bigint": "int",
        "int": "int",
        "double": "float",
        "float": "float",
        "boolean": "boolean",
        "string": "string",
    }

    def out_name(field, special):
        if field.name in special:
            return special[field.name]
        t = _SUFFIX.get(field.dataType.simpleString())
        if t is None:
            raise ValueError(
                f"neo4j_csv: cannot export column {field.name!r} of type "
                f"{field.dataType.simpleString()}"
            )
        return f"{field.name}:{t}"

    v_special = {"id": "id:ID", "label": ":LABEL"}
    graph.vertices.select(
        *[
            F.col(f.name).alias(out_name(f, v_special))
            for f in graph.vertices.schema.fields
        ]
    ).write.mode("overwrite").option("header", True).csv(nodes_path)
    e_special = {"src": ":START_ID", "dst": ":END_ID", "relationship": ":TYPE"}
    graph.edges.select(
        *[
            F.col(f.name).alias(out_name(f, e_special))
            for f in graph.edges.schema.fields
        ]
    ).write.mode("overwrite").option("header", True).csv(rels_path)
