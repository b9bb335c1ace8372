import pytest
from pyspark.sql import functions as F

from graph_db_clustering_spark.catalog import load_table
from graph_db_clustering_spark.operators.graph import Graph, GraphStore


@pytest.fixture(scope="module")
def graph(spark, sf_dir):
    """FIXTURES.md derived graph: Image vertices from embeddings, centroid
    vertices 1 and 2, CLOSEST_TO edges by deterministic parity (just for
    structure tests)."""
    emb = load_table(spark, sf_dir, "embeddings")
    vertices = emb.select(
        F.col("vec_id").alias("id"),
        F.lit("Image").alias("label"),
        F.when(F.col("label") >= 5, "dog").otherwise("cat").alias("name"),
    )
    edges = emb.select(
        F.col("vec_id").alias("src"),
        (F.col("vec_id") % 2 + 1).alias("dst"),
        F.lit("CLOSEST_TO").alias("relationship"),
    )
    return Graph(vertices, edges)


def test_schema_validation(spark):
    bad = spark.range(3)
    with pytest.raises(ValueError):
        Graph(bad, bad)


def test_degrees(graph):
    n = graph.vertices.count()
    indeg = {r.id: r.in_degree for r in graph.in_degrees().collect()}
    assert set(indeg) == {1, 2}
    assert sum(indeg.values()) == n
    outdeg = graph.out_degrees()
    assert outdeg.count() == n
    assert outdeg.agg(F.max("out_degree")).first()[0] == 1
    # degree = in + out summed over union
    total = graph.degrees().agg(F.sum("degree")).first()[0]
    assert total == 2 * n


def test_triplets(graph):
    t = graph.triplets()
    assert t.count() == graph.edges.count()
    row = t.filter(F.col("src") == 10).first()
    assert row.src_id == 10 and row.dst_id == 10 % 2 + 1
    assert row.relationship == "CLOSEST_TO"


def test_filter_vertices_drops_dangling_edges(graph):
    g2 = graph.filter_vertices(F.col("id") >= 2)  # drops vertex 1 -> half the edges dangle
    assert g2.vertices.count() == graph.vertices.count() - 2
    assert g2.edges.filter(F.col("dst") == 1).count() == 0
    assert g2.edges.count() > 0


def test_add_and_remove(graph, spark):
    new_v = spark.createDataFrame(
        [(10_000, "Centroid", None)], "id long, label string, name string"
    )
    g2 = graph.add_vertices(new_v)
    assert g2.vertices.filter(F.col("label") == "Centroid").count() == 1
    new_e = spark.createDataFrame([(0, 10_000, "CLOSEST_TO")], ["src", "dst", "relationship"])
    g3 = g2.add_edges(new_e)
    assert g3.edges.count() == graph.edges.count() + 1
    g4 = g3.remove_edges()
    assert g4.edges.count() == 0
    assert g4.vertices.count() == g3.vertices.count()


def test_aggregate_messages_indegree_equivalence(graph):
    am = graph.aggregate_messages(msg_to_dst=F.lit(1), agg=F.sum("msg").alias("in_degree"))
    a = {r.id: r.in_degree for r in am.collect()}
    b = {r.id: r.in_degree for r in graph.in_degrees().collect()}
    assert a == b


def test_store_roundtrip_and_truncate(graph, spark, tmp_path):
    store = GraphStore(spark, str(tmp_path / "g"))
    store.save(graph)
    g2 = store.load()
    assert g2.vertices.count() == graph.vertices.count()
    assert g2.edges.count() == graph.edges.count()
    store.truncate()
    g3 = store.load()
    assert g3.vertices.count() == 0 and g3.edges.count() == 0
    assert g3.vertices.schema == g2.vertices.schema


def test_write_graphml_size_guard(spark, tmp_path):
    """VERDICT r9: the GraphML writer's driver-side contract is
    enforced — past max_rows it errors BEFORE collecting, naming
    write_neo4j_csv; an explicit larger max_rows still writes."""
    import pytest as _pytest

    from graph_db_clustering_spark.operators.graph import Graph
    from graph_db_clustering_spark.sources.graphml import write_graphml

    v = spark.range(0, 50).toDF("id")
    e = (
        spark.range(0, 49)
        .toDF("src")
        .withColumn("dst", F.col("src") + 1)
    )
    g = Graph(v, e)
    with _pytest.raises(ValueError, match="write_neo4j_csv"):
        write_graphml(g, str(tmp_path / "g.graphml"), max_rows=10)
    write_graphml(g, str(tmp_path / "g.graphml"), max_rows=1000)
    assert (tmp_path / "g.graphml").exists()
