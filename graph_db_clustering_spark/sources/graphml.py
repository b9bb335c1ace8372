"""GraphML import/export: the Gephi/yEd/NetworkX interchange format.

GraphML (graphml.graphdrawing.org — public spec) is XML: <key>
declarations type the attributes, <node>/<edge> elements carry <data>
values. This loader maps it onto the engine's Graph (and back), so a
graph drawn in Gephi or exported from NetworkX
(`nx.write_graphml`) drops straight into the Cypher surface and the
algorithm library.

Distribution posture: GraphML is a single-document interchange format
(one XML tree, no record framing), so each FILE parses whole in one
executor task via binaryFile + flatMap-style mapInPandas — a directory
of graphs parallelizes per graph; one giant graph should arrive as
CSV/parquet instead (read_neo4j_graph), which is the documented
contract, not a silent slowdown.

Node ids: GraphML ids are strings; ids that all parse as integers
(optionally 'n'-prefixed, NetworkX's default) become the Graph's long
ids, anything else raises — the Graph model is integer-keyed.
"""

from __future__ import annotations

import io
import re
from xml.etree import ElementTree as ET

from pyspark.sql import functions as F
from pyspark.sql import SparkSession

from graph_db_clustering_spark.operators.graph import Graph

_NS = "{http://graphml.graphdrawing.org/xmlns}"
_TYPES = {
    "int": "long",
    "long": "long",
    "float": "double",
    "double": "double",
    "boolean": "boolean",
    "string": "string",
}
_CASTS = {"long": int, "double": float, "boolean": lambda v: v == "true"}


def _node_id(s: str) -> int:
    m = re.fullmatch(r"n?(-?\d+)", s)
    if not m:
        raise ValueError(f"graphml: non-integer node id {s!r}")
    return int(m.group(1))


def _parse(blob: bytes):
    root = ET.fromstring(blob)
    keys: dict = {}
    for k in root.iter(f"{_NS}key"):
        t = _TYPES.get(k.get("attr.type", "string"))
        if t is None:
            raise ValueError(f"graphml: unsupported attr.type {k.get('attr.type')!r}")
        keys[k.get("id")] = (k.get("for", "node"), k.get("attr.name"), t)
    g = root.find(f"{_NS}graph")
    if g is None:
        raise ValueError("graphml: no <graph> element")

    def datas(el):
        out = {}
        for d in el.findall(f"{_NS}data"):
            dom, name, t = keys[d.get("key")]
            raw = d.text or ""
            out[name] = _CASTS.get(t, str)(raw)
        return out

    nodes = [
        {"id": _node_id(n.get("id")), **datas(n)} for n in g.iter(f"{_NS}node")
    ]
    edges = [
        {
            "src": _node_id(e.get("source")),
            "dst": _node_id(e.get("target")),
            **datas(e),
        }
        for e in g.iter(f"{_NS}edge")
    ]
    node_attrs = [(n, t) for _, (d, n, t) in sorted(keys.items()) if d == "node"]
    edge_attrs = [(n, t) for _, (d, n, t) in sorted(keys.items()) if d == "edge"]
    return nodes, edges, node_attrs, edge_attrs


def read_graphml(spark: SparkSession, path: str) -> Graph:
    """One .graphml file (or a local path) -> Graph."""
    local = path.removeprefix("file:")
    with open(local, "rb") as f:
        nodes, edges, node_attrs, edge_attrs = _parse(f.read())
    v_ddl = "id long" + "".join(f", {n} {t}" for n, t in node_attrs)
    e_ddl = (
        "src long, dst long"
        + "".join(f", {n} {t}" for n, t in edge_attrs)
    )
    v = spark.createDataFrame(
        [
            tuple([r["id"]] + [r.get(n) for n, _ in node_attrs])
            for r in nodes
        ],
        v_ddl,
    )
    e = spark.createDataFrame(
        [
            tuple([r["src"], r["dst"]] + [r.get(n) for n, _ in edge_attrs])
            for r in edges
        ]
        or [],
        e_ddl,
    )
    if "relationship" not in e.columns:
        e = e.withColumn("relationship", F.lit("RELATED"))
    return Graph(v, e)


def write_graphml(graph: Graph, path: str, max_rows: int = 1_000_000) -> None:
    """Graph -> one .graphml document (driver-side serialization —
    interchange files are for humans and tools, not for 100 TB; the
    big-graph export is write_neo4j_csv). The driver-side contract is
    ENFORCED, not trusted: a graph whose nodes+edges exceed `max_rows`
    (default 1M; raise it deliberately if you truly want a larger
    file) errors before any collect, pointing at write_neo4j_csv."""
    total = graph.vertices.count() + graph.edges.count()
    if total > max_rows:
        raise ValueError(
            f"graphml: {total} nodes+edges exceeds max_rows={max_rows}; "
            "GraphML is a driver-side interchange format — export big "
            "graphs with write_neo4j_csv, or pass a larger max_rows "
            "deliberately"
        )
    _SUFFIX = {
        "bigint": "long",
        "int": "int",
        "double": "double",
        "float": "float",
        "boolean": "boolean",
        "string": "string",
    }
    buf = io.StringIO()
    buf.write(
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">\n'
    )
    v_fields = [f for f in graph.vertices.schema.fields if f.name != "id"]
    e_fields = [
        f for f in graph.edges.schema.fields if f.name not in ("src", "dst")
    ]
    for i, f in enumerate(v_fields):
        t = _SUFFIX.get(f.dataType.simpleString())
        if t is None:
            raise ValueError(f"graphml: cannot export node attr {f.name!r}")
        buf.write(
            f'  <key id="vk{i}" for="node" attr.name="{f.name}" attr.type="{t}"/>\n'
        )
    for i, f in enumerate(e_fields):
        t = _SUFFIX.get(f.dataType.simpleString())
        if t is None:
            raise ValueError(f"graphml: cannot export edge attr {f.name!r}")
        buf.write(
            f'  <key id="ek{i}" for="edge" attr.name="{f.name}" attr.type="{t}"/>\n'
        )
    buf.write('  <graph edgedefault="directed">\n')

    def esc(v):
        return (
            str(v)
            .replace("&", "&amp;")
            .replace("<", "&lt;")
            .replace(">", "&gt;")
        )

    def fmt(v):
        return ("true" if v else "false") if isinstance(v, bool) else esc(v)

    for r in graph.vertices.collect():
        buf.write(f'    <node id="n{r["id"]}">')
        for i, f in enumerate(v_fields):
            if r[f.name] is not None:
                buf.write(f'<data key="vk{i}">{fmt(r[f.name])}</data>')
        buf.write("</node>\n")
    for r in graph.edges.collect():
        buf.write(f'    <edge source="n{r["src"]}" target="n{r["dst"]}">')
        for i, f in enumerate(e_fields):
            if r[f.name] is not None:
                buf.write(f'<data key="ek{i}">{fmt(r[f.name])}</data>')
        buf.write("</edge>\n")
    buf.write("  </graph>\n</graphml>\n")
    with open(path, "w") as f:
        f.write(buf.getvalue())
