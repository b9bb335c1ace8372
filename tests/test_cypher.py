"""Cypher front-end tests: every query shape the reference sends to Neo4j
(image_classification.py / database.py) runs against CypherSession and
produces the hand-computable answer."""

import pytest
from pyspark.sql import functions as F

from graph_db_clustering_spark.cypher import CypherSession
from graph_db_clustering_spark.operators.graph import Graph

pytestmark = pytest.mark.slow  # heavy tier (r15): run with -m slow


def _image_graph(spark):
    """Images with 1-D 'mean' feature; two flagged as centroids (the
    reference's heuristic() models centroids as Image{centroid:true})."""
    v = spark.createDataFrame(
        [
            (0, "Image", "img0", 1.0, False),
            (1, "Image", "img1", 2.0, False),
            (2, "Image", "img2", 10.0, False),
            (3, "Image", "cent_a", 0.0, True),
            (4, "Image", "cent_b", 11.0, True),
        ],
        "id long, label string, name string, mean double, centroid boolean",
    )
    e = spark.createDataFrame([], "src long, dst long, relationship string")
    return Graph(v, e)


def test_create_node_with_params_and_match_return(spark):
    g = Graph(
        spark.createDataFrame([], "id long, label string, name string, mean double"),
        spark.createDataFrame([], "src long, dst long, relationship string"),
    )
    s = CypherSession(g)
    # image_classification.py:220
    s.run(
        "CREATE (:Image {name: $name, mean: $mean})", name="img0", mean=3.5
    )
    s.run(
        "CREATE (:Image {name: $name, mean: $mean})", name="img1", mean=4.5
    )
    out = s.run("MATCH (i:Image) RETURN i")
    rows = sorted((r["i"]["name"], r["i"]["mean"]) for r in out.collect())
    assert rows == [("img0", 3.5), ("img1", 4.5)]
    # ids are unique longs
    ids = {r["i"]["id"] for r in out.collect()}
    assert len(ids) == 2


def test_init_centroids_sample_and_create(spark):
    s = CypherSession(_image_graph(spark), seed=7)
    # image_classification.py:233-237
    s.run(
        """MATCH (n)
           WITH n, rand() as r
           ORDER BY r
           LIMIT 2
           CREATE (:Centroid {mean: n.mean})"""
    )
    cents = s.run("MATCH (c:Centroid) RETURN c").collect()
    assert len(cents) == 2
    source_means = {1.0, 2.0, 10.0, 0.0, 11.0}
    assert {r["c"]["mean"] for r in cents} <= source_means
    # deterministic under the session seed
    s2 = CypherSession(_image_graph(spark), seed=7)
    s2.run(
        """MATCH (n) WITH n, rand() as r ORDER BY r LIMIT 2
           CREATE (:Centroid {mean: n.mean})"""
    )
    again = {r["c"]["mean"] for r in s2.run("MATCH (c:Centroid) RETURN c").collect()}
    assert again == {r["c"]["mean"] for r in cents}


def test_heuristic_argmin_assignment(spark):
    s = CypherSession(_image_graph(spark))
    # image_classification.py:341-348 verbatim shape
    s.run(
        """MATCH (n:Image {centroid: false}), (c:Image {centroid: true})
           WITH n, c, abs(n.mean - c.mean) AS difference
           ORDER BY difference ASC
           WITH n, collect({centroid: c, difference: difference})[0] AS closest
           WITH closest.centroid AS cent, closest.difference as diff, n AS n
           CREATE (n)-[:CLOSEST_TO {difference: diff}]->(cent)"""
    )
    out = s.run(
        "MATCH (i:Image)-[r:CLOSEST_TO]->(c:Image) RETURN i.name, c.name, r.difference"
    )
    got = {r["i.name"]: (r["c.name"], r["r.difference"]) for r in out.collect()}
    # img0(1.0)->cent_a(0.0); img1(2.0)->cent_a; img2(10.0)->cent_b(11.0)
    assert got == {
        "img0": ("cent_a", 1.0),
        "img1": ("cent_a", 2.0),
        "img2": ("cent_b", 1.0),
    }


def test_remove_connections_deletes_all_edges(spark):
    g = _image_graph(spark)
    g = Graph(
        g.vertices,
        g.vertices.sparkSession.createDataFrame(
            [(0, 3, "CLOSEST_TO"), (1, 3, "CLOSEST_TO")],
            "src long, dst long, relationship string",
        ),
    )
    s = CypherSession(g)
    # image_classification.py:357-359
    s.run("MATCH ()-[r]-() DELETE r")
    assert s.graph.edges.count() == 0
    assert s.graph.vertices.count() == 5  # vertices untouched


def test_edge_create_by_id_with_set(spark):
    s = CypherSession(_image_graph(spark))
    # image_classification.py:438-442
    s.run(
        """MATCH (i:Image) WHERE ID(i)=$image_id
           MATCH (c:Image) WHERE ID(c)=$centroid_id
           CREATE (i)-[r:CLOSEST_TO]->(c)
           SET r.cosine_similarity = $similarity""",
        image_id=0,
        centroid_id=4,
        similarity=0.93,
    )
    e = s.graph.edges.collect()
    assert len(e) == 1
    assert (e[0]["src"], e[0]["dst"], e[0]["cosine_similarity"]) == (0, 4, 0.93)


def test_one_hop_filtered_by_centroid_id(spark):
    s = CypherSession(_image_graph(spark))
    s.run(
        """MATCH (n:Image {centroid: false}), (c:Image {centroid: true})
           WITH n, c, abs(n.mean - c.mean) AS difference
           ORDER BY difference ASC
           WITH n, collect({centroid: c, difference: difference})[0] AS closest
           WITH closest.centroid AS cent, closest.difference as diff, n AS n
           CREATE (n)-[:CLOSEST_TO {difference: diff}]->(cent)"""
    )
    # image_classification.py:465-467
    members = s.run(
        "MATCH (i:Image)-[:CLOSEST_TO]->(c:Image) WHERE ID(c)=$centroid_id RETURN i",
        centroid_id=3,
    )
    assert {r["i"]["name"] for r in members.collect()} == {"img0", "img1"}


def test_set_vertex_properties_by_id(spark):
    s = CypherSession(_image_graph(spark))
    # image_classification.py:499-501
    s.run(
        "MATCH (c:Image) WHERE ID(c)=$centroid_id SET c.mean = $mean, c.name = $name",
        centroid_id=3,
        mean=0.5,
        name="cent_a2",
    )
    row = {r["id"]: r for r in s.graph.vertices.collect()}
    assert (row[3]["mean"], row[3]["name"]) == (0.5, "cent_a2")
    assert row[0]["mean"] == 1.0  # others untouched


def test_return_count_aggregate(spark):
    s = CypherSession(_image_graph(spark))
    s.run(
        """MATCH (n:Image {centroid: false}), (c:Image {centroid: true})
           WITH n, c, abs(n.mean - c.mean) AS difference
           ORDER BY difference ASC
           WITH n, collect({centroid: c, difference: difference})[0] AS closest
           WITH closest.centroid AS cent, n AS n
           CREATE (n)-[:CLOSEST_TO]->(cent)"""
    )
    # image_classification.py:513-515
    out = s.run(
        "MATCH (i:Image)-[r:CLOSEST_TO]->(c:Image) RETURN c, count(r)"
    ).collect()
    counts = {r["c"]["name"]: r["count(r)"] for r in out}
    assert counts == {"cent_a": 2, "cent_b": 1}
    # image_classification.py:533-535 — projection with ID()
    pairs = s.run(
        "MATCH (i:Image)-[r:CLOSEST_TO]->(c:Image) RETURN ID(c), i.name"
    ).collect()
    assert {(r["ID(c)"], r["i.name"]) for r in pairs} == {
        (3, "img0"),
        (3, "img1"),
        (4, "img2"),
    }


def test_detach_delete_all(spark):
    g = _image_graph(spark)
    g = Graph(
        g.vertices,
        g.vertices.sparkSession.createDataFrame(
            [(0, 3, "CLOSEST_TO")], "src long, dst long, relationship string"
        ),
    )
    s = CypherSession(g)
    # database.py:46
    s.run("MATCH (n) DETACH DELETE n")
    assert s.graph.vertices.count() == 0
    assert s.graph.edges.count() == 0


def test_create_relationship_by_name(spark):
    s = CypherSession(_image_graph(spark))
    # database.py:51-67 shape
    s.run(
        "MATCH (a),(b) WHERE a.name=$x AND b.name=$y CREATE (a)-[r:SIMILAR]->(b)",
        x="img0",
        y="img2",
    )
    e = s.graph.edges.collect()
    assert [(r["src"], r["dst"], r["relationship"]) for r in e] == [(0, 2, "SIMILAR")]


def test_where_filters_and_order_desc(spark):
    s = CypherSession(_image_graph(spark))
    out = s.run(
        """MATCH (i:Image) WHERE i.mean >= $lo AND NOT i.centroid
           RETURN i.name, i.mean ORDER BY i.mean DESC LIMIT 2""",
        lo=1.5,
    ).collect()
    assert [(r["i.name"], r["i.mean"]) for r in out] == [
        ("img2", 10.0),
        ("img1", 2.0),
    ]


def test_missing_param_raises(spark):
    s = CypherSession(_image_graph(spark))
    with pytest.raises(KeyError):
        s.run("MATCH (i:Image) WHERE ID(i)=$nope RETURN i")


def _linked_graph(spark):
    """Images 0-2, centroid 3; only image 0 has a CLOSEST_TO edge."""
    v = spark.createDataFrame(
        [
            (0, "Image", "img0", 1.0),
            (1, "Image", "img1", 2.0),
            (2, "Image", "img2", 3.0),
            (3, "Centroid", "cent", 0.0),
        ],
        "id long, label string, name string, mean double",
    )
    e = spark.createDataFrame(
        [(0, 3, "CLOSEST_TO", 1)], "src long, dst long, relationship string, eid long"
    )
    return Graph(v, e)


def test_optional_match_unmatched_rows_are_null(spark):
    s = CypherSession(_linked_graph(spark))
    out = s.run(
        """MATCH (i:Image) OPTIONAL MATCH (i)-[r:CLOSEST_TO]->(c:Centroid)
           RETURN i.name, c.name ORDER BY i.name"""
    ).collect()
    assert [(r["i.name"], r["c.name"]) for r in out] == [
        ("img0", "cent"),
        ("img1", None),
        ("img2", None),
    ]


def test_optional_match_where_applies_to_pattern_not_rows(spark):
    # WHERE inside OPTIONAL MATCH must null out non-qualifying matches,
    # never drop the left row (openCypher semantics)
    s = CypherSession(_linked_graph(spark))
    out = s.run(
        """MATCH (i:Image) OPTIONAL MATCH (i)-[r:CLOSEST_TO]->(c:Centroid)
           WHERE c.name = $never
           RETURN i.name, c.name ORDER BY i.name""",
        never="no_such",
    ).collect()
    assert [(r["i.name"], r["c.name"]) for r in out] == [
        ("img0", None),
        ("img1", None),
        ("img2", None),
    ]


def test_optional_match_as_first_clause_yields_null_row(spark):
    s = CypherSession(_linked_graph(spark))
    out = s.run("OPTIONAL MATCH (x:Nope) RETURN x").collect()
    assert len(out) == 1 and out[0]["x"] is None


def test_merge_node_creates_once(spark):
    s = CypherSession(_linked_graph(spark))
    n0 = s.graph.vertices.count()
    s.run("MERGE (t:Tag {name: $n})", n="fresh")
    assert s.graph.vertices.count() == n0 + 1
    s.run("MERGE (t:Tag {name: $n})", n="fresh")  # second merge: match, no create
    assert s.graph.vertices.count() == n0 + 1
    row = s.graph.vertices.filter(F.col("label") == "Tag").collect()
    assert len(row) == 1 and row[0]["name"] == "fresh"
    # distinct id was assigned
    assert row[0]["id"] not in {0, 1, 2, 3}


def test_merge_edge_upsert_reference_shape(spark):
    """Reference shape (image_classification.py:438-442) as an idempotent
    upsert: MERGE instead of CREATE, SET applying to matched AND created."""
    s = CypherSession(_linked_graph(spark))
    q = """MATCH (i:Image) WHERE ID(i)=$iid MATCH (c:Centroid) WHERE ID(c)=$cid
           MERGE (i)-[r:CLOSEST_TO]->(c) SET r.cosine_similarity = $sim"""
    # img0 -> cent exists (eid 1): merge must UPDATE it, not duplicate
    s.run(q, iid=0, cid=3, sim=0.9)
    e = s.graph.edges.collect()
    assert len(e) == 1
    assert e[0]["cosine_similarity"] == 0.9 and e[0]["eid"] == 1
    # img1 -> cent absent: merge creates with the SET prop in place
    s.run(q, iid=1, cid=3, sim=0.5)
    e = {(r["src"], r["dst"]): r for r in s.graph.edges.collect()}
    assert set(e) == {(0, 3), (1, 3)}
    assert e[(1, 3)]["cosine_similarity"] == 0.5
    assert e[(1, 3)]["eid"] != e[(0, 3)]["eid"]
    # re-running the absent case is now a no-op update
    s.run(q, iid=1, cid=3, sim=0.7)
    e2 = {(r["src"], r["dst"]): r["cosine_similarity"] for r in s.graph.edges.collect()}
    assert e2 == {(0, 3): 0.9, (1, 3): 0.7}
    assert s.graph.edges.count() == 2


def _chain_graph(spark):
    """0 -NEXT-> 1 -NEXT-> 2 -NEXT-> 3, plus diamond 0->4->3 / 0->5->3."""
    v = spark.createDataFrame(
        [(i, "N", f"n{i}") for i in range(6)], "id long, label string, name string"
    )
    e = spark.createDataFrame(
        [
            (0, 1, "NEXT", 1),
            (1, 2, "NEXT", 2),
            (2, 3, "NEXT", 3),
            (0, 4, "HOP", 4),
            (4, 3, "HOP", 5),
            (0, 5, "HOP", 6),
            (5, 3, "HOP", 7),
        ],
        "src long, dst long, relationship string, eid long",
    )
    return Graph(v, e)


def test_varlength_bounded_range(spark):
    s = CypherSession(_chain_graph(spark))
    out = s.run(
        "MATCH (a)-[:NEXT*1..2]->(b) WHERE ID(a)=$a RETURN ID(b) ORDER BY ID(b)", a=0
    ).collect()
    assert [r["ID(b)"] for r in out] == [1, 2]


def test_varlength_exact_and_unbounded(spark):
    s = CypherSession(_chain_graph(spark))
    exact2 = s.run(
        "MATCH (a)-[:NEXT*2]->(b) WHERE ID(a)=$a RETURN ID(b)", a=0
    ).collect()
    assert [r["ID(b)"] for r in exact2] == [2]
    unbounded = s.run(
        "MATCH (a)-[:NEXT*]->(b) WHERE ID(a)=$a RETURN ID(b) ORDER BY ID(b)", a=0
    ).collect()
    assert [r["ID(b)"] for r in unbounded] == [1, 2, 3]


def test_varlength_distinct_pairs_on_diamond(spark):
    # two 2-hop HOP paths 0->3 collapse to ONE row (documented
    # distinct-pairs reachability, not per-path multiplicity)
    s = CypherSession(_chain_graph(spark))
    out = s.run(
        "MATCH (a)-[:HOP*2]->(b) WHERE ID(a)=$a RETURN ID(b)", a=0
    ).collect()
    assert [r["ID(b)"] for r in out] == [3]


def test_varlength_undirected_and_far_node_filter(spark):
    s = CypherSession(_chain_graph(spark))
    out = s.run(
        """MATCH (a:N)-[:NEXT*1..3]-(b:N) WHERE b.name = $nm
           RETURN ID(a) ORDER BY ID(a)""",
        nm="n3",
    ).collect()
    assert [r["ID(a)"] for r in out] == [0, 1, 2]


def test_varlength_explicit_out_of_range_rejected(spark):
    # an explicit user bound beyond the hop cap errors (both lo and hi);
    # only the unbounded `*` form is silently capped
    s = CypherSession(_chain_graph(spark))
    with pytest.raises(ValueError, match=r"\*1\.\.20 exceeds max hops"):
        s.run("MATCH (a)-[:NEXT*1..20]->(b) RETURN ID(a)")
    with pytest.raises(ValueError, match=r"\*17\.\.20 exceeds max hops"):
        s.run("MATCH (a)-[:NEXT*17..20]->(b) RETURN ID(a)")


def test_varlength_var_binding_rejected(spark):
    s = CypherSession(_chain_graph(spark))
    with pytest.raises(ValueError, match="variable-length"):
        s.run("MATCH (a)-[r:NEXT*1..2]->(b) RETURN ID(a)")


# -- UNWIND / SKIP / WITH...WHERE / gates (round-5 surface audit) -----------


def test_unwind_literal_list_as_first_clause(spark):
    s = CypherSession(_chain_graph(spark))
    out = s.run("UNWIND [3, 1, 2] AS x RETURN x ORDER BY x").collect()
    assert [r["x"] for r in out] == [1, 2, 3]


def test_unwind_param_list_then_match_join(spark):
    # UNWIND seeding a lookup: one output row per (list element, match)
    s = CypherSession(_chain_graph(spark))
    out = s.run(
        """UNWIND $ids AS want
           MATCH (n) WHERE ID(n) = want
           RETURN want, n.name AS name ORDER BY want""",
        ids=[0, 2, 5],
    ).collect()
    assert [(r["want"], r["name"]) for r in out] == [
        (0, "n0"), (2, "n2"), (5, "n5"),
    ]


def test_unwind_mid_pipeline_and_empty_list(spark):
    s = CypherSession(_chain_graph(spark))
    out = s.run(
        """MATCH (n) WHERE ID(n) <= 1
           UNWIND [10, 20] AS bump
           RETURN ID(n) AS i, bump ORDER BY i, bump"""
    ).collect()
    assert [(r["i"], r["bump"]) for r in out] == [
        (0, 10), (0, 20), (1, 10), (1, 20),
    ]
    # openCypher: empty list produces zero rows
    assert s.run("UNWIND [] AS x RETURN x").count() == 0


def test_unwind_rebind_rejected(spark):
    s = CypherSession(_chain_graph(spark))
    with pytest.raises(ValueError, match="rebinds"):
        s.run("MATCH (n) UNWIND [1] AS n RETURN n")


def test_with_skip_and_where(spark):
    s = CypherSession(_chain_graph(spark))
    # SKIP after ORDER BY slices; WHERE filters the projected rows
    out = s.run(
        """MATCH (n)
           WITH ID(n) AS i ORDER BY i SKIP 2 LIMIT 3
           RETURN i ORDER BY i"""
    ).collect()
    assert [r["i"] for r in out] == [2, 3, 4]
    out = s.run(
        """MATCH (n)
           WITH ID(n) AS i WHERE i >= 4
           RETURN i ORDER BY i"""
    ).collect()
    assert [r["i"] for r in out] == [4, 5]
    # RETURN ... SKIP also works (same clause machinery)
    out = s.run("MATCH (n) RETURN ID(n) AS i ORDER BY i DESC SKIP 4").collect()
    assert [r["i"] for r in out] == [1, 0]


def test_unsupported_clauses_gate_with_clear_errors(spark):
    s = CypherSession(_chain_graph(spark))
    with pytest.raises(ValueError, match="is not supported — available"):
        s.run("CALL apoc.meta.stats()")
    with pytest.raises(ValueError, match="FOREACH body allows only"):
        s.run("FOREACH (x IN [1] | RETURN x)")


def test_foreach_creates_per_element(spark):
    s = CypherSession(_chain_graph(spark))
    s.run("FOREACH (v IN [10, 20, 30] | CREATE (:Mark {name: 'm', val: v}))")
    rows = sorted(
        r["val"] for r in s.graph.vertices.filter("label = 'Mark'").collect()
    )
    assert rows == [10, 20, 30]


def test_foreach_set_over_matched_rows(spark):
    # body SET references outer bindings AND the element variable;
    # one batch op covers every (row, element) combination
    s = CypherSession(_chain_graph(spark))
    s.run("MATCH (n) WHERE n.id < 2 FOREACH (v IN [7] | SET n.name = 'x7')")
    names = {r["id"]: r["name"] for r in s.graph.vertices.collect()}
    assert names[0] == "x7" and names[1] == "x7" and names[2] == "n2"
    # outer binding table unchanged: a following RETURN has no v column
    out = s.run(
        "MATCH (n) FOREACH (v IN [1] | SET n.name = n.name) RETURN n.id ORDER BY n.id"
    )
    assert "v" not in out.columns and out.count() == 6


def test_remove_property_sets_typed_null(spark):
    s = CypherSession(_chain_graph(spark))
    s.run("MATCH (n) WHERE n.id < 2 REMOVE n.name")
    rows = {r["id"]: r["name"] for r in s.graph.vertices.collect()}
    assert rows[0] is None and rows[1] is None
    assert rows[2] == "n2" and rows[5] == "n5"  # untouched rows keep values
    # schema unchanged: name stays a string column (typed NULL, not dropped)
    assert dict(s.graph.vertices.dtypes)["name"] == "string"
    # removing an already-null / re-removing is a no-op, like Neo4j
    s.run("MATCH (n) WHERE n.id < 3 REMOVE n.name")
    rows = {r["id"]: r["name"] for r in s.graph.vertices.collect()}
    assert rows[2] is None and rows[3] == "n3"


def test_remove_gates(spark):
    s = CypherSession(_chain_graph(spark))
    with pytest.raises(ValueError, match="unbound variable"):
        s.run("MATCH (n) REMOVE m.name")
    with pytest.raises(ValueError, match="created in the same query"):
        s.run("CREATE (x:N {name: 'q'}) REMOVE x.name")


def test_skip_limit_operand_gate(spark):
    # Round-5 ADVICE: non-literal SKIP/LIMIT operands get a descriptive
    # unsupported-surface ValueError, not a generic parse error.
    s = CypherSession(_chain_graph(spark))
    for q in [
        "MATCH (n) RETURN ID(n) AS i SKIP $n",
        "MATCH (n) RETURN ID(n) AS i SKIP -1",
        "MATCH (n) RETURN ID(n) AS i LIMIT 1.5",
        "MATCH (n) RETURN ID(n) AS i LIMIT 1 + 1",
    ]:
        with pytest.raises(ValueError, match="non-negative integer literal"):
            s.run(q)


def test_union_distinct_and_all(spark):
    s = CypherSession(_chain_graph(spark))
    # overlapping halves: NEXT sources {0,1,2}, HOP sources {0,4,5}
    q = """MATCH (a)-[:NEXT]->() RETURN a.name AS name
           UNION MATCH (a)-[:HOP]->() RETURN a.name AS name"""
    out = sorted(r["name"] for r in s.run(q).collect())
    assert out == ["n0", "n1", "n2", "n4", "n5"]  # distinct: n0 once
    all_out = sorted(r["name"] for r in s.run(q.replace("UNION", "UNION ALL")).collect())
    # UNION ALL keeps duplicates: n0 sources NEXT once + HOP twice
    assert all_out == ["n0", "n0", "n0", "n1", "n2", "n4", "n5"]


def test_union_column_order_insensitive(spark):
    # same column NAMES in different order — unionByName aligns them
    s = CypherSession(_chain_graph(spark))
    out = s.run(
        """MATCH (n) WHERE n.id = 0 RETURN n.id AS i, n.name AS nm
           UNION MATCH (n) WHERE n.id = 3 RETURN n.name AS nm, n.id AS i"""
    ).collect()
    got = sorted((r["i"], r["nm"]) for r in out)
    assert got == [(0, "n0"), (3, "n3")]


def test_union_gates(spark):
    s = CypherSession(_chain_graph(spark))
    with pytest.raises(ValueError, match="cannot mix UNION and UNION ALL"):
        s.run(
            """MATCH (n) RETURN n.id UNION MATCH (n) RETURN n.id
               UNION ALL MATCH (n) RETURN n.id"""
        )
    with pytest.raises(ValueError, match="same columns"):
        s.run("MATCH (n) RETURN n.id AS a UNION MATCH (n) RETURN n.id AS b")
    with pytest.raises(ValueError, match="must RETURN"):
        s.run("MATCH (n) RETURN n.id AS a UNION MATCH (n)")
    with pytest.raises(ValueError, match="mutating"):
        s.run("MATCH (n) RETURN n.id AS a UNION CREATE (:N {name: 'x'})")


def test_foreach_set_last_element_wins(spark):
    # openCypher: per-element execution order — the LAST list element's
    # SET lands (round-6 review finding: dropDuplicates picked arbitrary)
    s = CypherSession(_image_graph(spark))
    s.run("MATCH (n) WHERE ID(n) = 0 FOREACH (v IN [1.5, 2.5, 3.5] | SET n.mean = v)")
    row = {r["id"]: r["mean"] for r in s.graph.vertices.collect()}
    assert row[0] == 3.5
    # nested FOREACH: lexicographic (outer, inner) order, last pair wins
    s.run(
        """MATCH (n) WHERE ID(n) = 1
           FOREACH (a IN [10.0, 20.0] | FOREACH (b IN [1.0, 2.0] | SET n.mean = a + b))"""
    )
    row = {r["id"]: r["mean"] for r in s.graph.vertices.collect()}
    assert row[1] == 22.0


def test_union_mismatched_types_gate(spark):
    # ANSI-mode Spark would coerce string->bigint and fail LAZILY with a
    # runtime cast error on 'n1'; the front-end gates it eagerly instead
    s = CypherSession(_chain_graph(spark))
    with pytest.raises(ValueError, match="incompatible column types for 'x'"):
        s.run(
            """MATCH (n) WHERE n.id = 0 RETURN n.id AS x
               UNION MATCH (n) WHERE n.id = 1 RETURN n.name AS x"""
        )


def test_call_subquery_joins_result_to_every_row(spark):
    s = CypherSession(_chain_graph(spark))
    out = s.run(
        """MATCH (n) CALL { MATCH (m) RETURN max(m.id) AS mx }
           RETURN n.id AS i, mx ORDER BY i"""
    ).collect()
    assert [(r["i"], r["mx"]) for r in out] == [(i, 5) for i in range(6)]
    # as the first clause it seeds the binding table
    out = s.run(
        """CALL { MATCH (m) RETURN count(m) AS k } MATCH (n)
           RETURN n.id AS i, k ORDER BY i LIMIT 2"""
    ).collect()
    assert [(r["i"], r["k"]) for r in out] == [(0, 6), (1, 6)]


def test_call_subquery_gates(spark):
    s = CypherSession(_chain_graph(spark))
    with pytest.raises(ValueError, match="must end with RETURN"):
        s.run("CALL { MATCH (m) } RETURN 1")
    # round 14: mutating CALL { } bodies are supported (unit subqueries);
    # the gate is now Neo4j 5's — an updating body must not RETURN
    with pytest.raises(ValueError, match="cannot RETURN"):
        s.run("CALL { CREATE (:N {name: 'x'}) RETURN 1 AS one } RETURN one")
    with pytest.raises(ValueError, match="plain variable list"):
        s.run("MATCH (n) CALL { WITH n.id AS j RETURN j + 1 AS k } RETURN k")
    with pytest.raises(ValueError, match="plain variable list"):
        s.run("MATCH (n) CALL { WITH DISTINCT n RETURN n.id AS j } RETURN j")
    with pytest.raises(ValueError, match="imports unbound"):
        s.run("MATCH (n) CALL { WITH z RETURN z.id AS j } RETURN j")
    with pytest.raises(ValueError, match="needs bindings"):
        s.run("CALL { WITH n RETURN n.id AS j } RETURN j")
    with pytest.raises(ValueError, match="rebinds variables"):
        s.run("MATCH (n) CALL { MATCH (n) RETURN count(n) AS n } RETURN n")


def test_list_comprehension_filter_and_map(spark):
    s = CypherSession(_chain_graph(spark))
    out = s.run(
        """RETURN [x IN range(1, 10) WHERE x % 2 = 0 | x * x] AS sq,
                  [x IN [1, 2, 3] | x + 10] AS add,
                  [x IN [1, 2, 3, 4] WHERE x > 2] AS flt"""
    ).collect()[0]
    assert list(out["sq"]) == [4, 16, 36, 64, 100]
    assert list(out["add"]) == [11, 12, 13]
    assert list(out["flt"]) == [3, 4]


def test_list_comprehension_over_bound_vars_and_nested(spark):
    s = CypherSession(_chain_graph(spark))
    # comprehension referencing an outer binding, plus nesting with
    # variable shadowing ([x ... [x ...]] — inner x wins inside)
    out = s.run(
        """MATCH (n) WHERE n.id < 3
           RETURN n.id AS i,
                  [x IN range(0, 2) | x + n.id] AS offs,
                  [x IN [1] | [x IN [5, 6] | x]] AS nested
           ORDER BY i"""
    ).collect()
    assert [list(r["offs"]) for r in out] == [[0, 1, 2], [1, 2, 3], [2, 3, 4]]
    assert [[list(inner) for inner in r["nested"]] for r in out] == [[[5, 6]]] * 3


def test_round6_review_fixes(spark):
    s = CypherSession(_chain_graph(spark))
    # range: start > end (or wrong-sign step) is EMPTY like Neo4j, never
    # an auto-descending list or a runtime error
    row = s.run(
        """RETURN range(5, 1) AS down, range(0, -1) AS neg,
                  range(5, 1, -1) AS expl, range(1, 5, -1) AS wrong"""
    ).collect()[0]
    assert list(row["down"]) == [] and list(row["neg"]) == []
    assert list(row["expl"]) == [5, 4, 3, 2, 1] and list(row["wrong"]) == []
    # expression-only RETURN must NOT silently bind `id` to range(1)'s col
    with pytest.raises(Exception, match="id|resolve|UNRESOLVED"):
        s.run("RETURN id AS x").collect()
    # collect-into-comprehension (the canonical Neo4j idiom)
    out = s.run(
        "MATCH (n) RETURN [x IN collect(n.id) WHERE x < 3 | x * 10] AS xs"
    ).collect()[0]
    assert sorted(out["xs"]) == [0, 10, 20]
    # a query cannot conclude with CALL (result would be dropped)
    with pytest.raises(ValueError, match="conclude with CALL"):
        s.run("CALL { MATCH (m) RETURN count(m) AS k }")
    # UNION inside CALL gates clearly, not with a brace parse error
    with pytest.raises(ValueError, match="UNION inside a CALL"):
        s.run("CALL { RETURN 1 AS x UNION RETURN 2 AS x } RETURN x")


def test_pattern_comprehension(spark):
    s = CypherSession(_chain_graph(spark))
    out = s.run(
        """MATCH (a)
           RETURN a.id AS i,
                  [(a)-[:NEXT]->(b) | b.id] AS nxt,
                  [(a)-[:HOP]->(c) WHERE c.id > 4 | c.name] AS hi,
                  size([(a)-[]->(x) | x.id]) AS deg
           ORDER BY i"""
    ).collect()
    got = [(r.i, list(r.nxt), list(r.hi), r.deg) for r in out]
    assert got == [
        (0, [1], ["n5"], 3),  # 0 -> 1 (NEXT), 0 -> 4,5 (HOP)
        (1, [2], [], 1),
        (2, [3], [], 1),
        (3, [], [], 0),
        (4, [], [], 1),  # 4 -> 3 (HOP)
        (5, [], [], 1),
    ]
    # undirected and incoming forms
    out = s.run(
        "MATCH (a) WHERE a.id = 3 RETURN [(a)<-[:HOP]-(p) | p.id] AS parents"
    ).collect()[0]
    assert sorted(out.parents) == [4, 5]
    # list literal starting with a parenthesized expression still parses
    assert list(s.run("RETURN [(1+2), 3] AS l").collect()[0].l) == [3, 3]


def test_pattern_comprehension_gates(spark):
    s = CypherSession(_chain_graph(spark))
    with pytest.raises(ValueError, match="must be a variable bound"):
        s.run("MATCH (a) RETURN [(z)-[:NEXT]->(b) | b.id] AS xs")
    with pytest.raises(ValueError, match="rebinds variables"):
        s.run("MATCH (a), (b) RETURN [(a)-[:NEXT]->(b) | b.id] AS xs")
    with pytest.raises(ValueError, match="bound subject"):
        s.run("RETURN [(a)-[:NEXT]->(b) | b.id] AS xs")


def test_exists_pattern_predicate(spark):
    s = CypherSession(_chain_graph(spark))
    # existential: sources of NEXT edges
    out = s.run(
        "MATCH (a) WHERE exists((a)-[:NEXT]->()) RETURN a.id AS i ORDER BY i"
    )
    assert [r.i for r in out.collect()] == [0, 1, 2]
    # NOT / OR compose (flag column, not a bare semi join)
    out = s.run(
        "MATCH (a) WHERE not(exists((a)-[:NEXT]->())) RETURN a.id AS i ORDER BY i"
    )
    assert [r.i for r in out.collect()] == [3, 4, 5]
    out = s.run(
        """MATCH (a) WHERE exists((a)-[:NEXT]->()) OR a.id = 5
           RETURN a.id AS i ORDER BY i"""
    )
    assert [r.i for r in out.collect()] == [0, 1, 2, 5]
    # both endpoints bound: specific-edge existence
    out = s.run(
        """MATCH (a), (b) WHERE exists((a)-[:HOP]->(b))
           RETURN a.id AS x, b.id AS y ORDER BY x, y"""
    )
    assert [(r.x, r.y) for r in out.collect()] == [(0, 4), (0, 5), (4, 3), (5, 3)]
    # legacy property form == IS NOT NULL
    s2 = CypherSession(_image_graph(spark))
    s2.run("MATCH (c) WHERE ID(c) = 0 REMOVE c.name")
    out = s2.run("MATCH (c) WHERE exists(c.name) RETURN ID(c) AS i ORDER BY i")
    assert [r.i for r in out.collect()] == [1, 2, 3, 4]
    # unbound pattern gates clearly
    with pytest.raises(ValueError, match="at least one variable bound"):
        s.run("MATCH (a) WHERE exists((z)-[:NEXT]->()) RETURN a.id")


def _null_image_graph(spark):
    """Image graph where one node is missing its mean (null property)."""
    v = spark.createDataFrame(
        [
            (0, "Image", "img0", 1.0, False),
            (1, "Image", "img1", 2.0, False),
            (2, "Image", "img2", 10.0, False),
            (3, "Image", "cent_a", 0.0, True),
            (4, "Image", "cent_b", None, True),
        ],
        "id long, label string, name string, mean double, centroid boolean",
    )
    e = spark.createDataFrame(
        [(0, 3, "CLOSEST_TO")], "src long, dst long, relationship string"
    )
    return Graph(v, e)


def test_case_searched_and_simple(spark):
    s = CypherSession(_null_image_graph(spark))
    out = s.run(
        """MATCH (n:Image)
           RETURN n.name AS nm,
                  CASE WHEN n.mean > 5 THEN 'big'
                       WHEN n.mean > 1 THEN 'mid'
                       ELSE 'small' END AS bucket
           ORDER BY nm"""
    )
    assert [(r.nm, r.bucket) for r in out.collect()] == [
        ("cent_a", "small"),
        ("cent_b", "small"),  # null mean falls through to ELSE
        ("img0", "small"),
        ("img1", "mid"),
        ("img2", "big"),
    ]
    # simple (value-match) form; missing ELSE yields null
    out = s.run(
        """MATCH (n:Image)
           RETURN n.name AS nm, CASE n.centroid WHEN true THEN 'c' END AS tag
           ORDER BY nm"""
    )
    assert [(r.nm, r.tag) for r in out.collect()] == [
        ("cent_a", "c"),
        ("cent_b", "c"),
        ("img0", None),
        ("img1", None),
        ("img2", None),
    ]
    # CASE nests inside aggregates with implicit grouping
    out = s.run(
        """MATCH (n:Image)
           RETURN n.centroid AS c,
                  sum(CASE WHEN n.mean IS NULL THEN 0 ELSE 1 END) AS nonnull
           ORDER BY c"""
    )
    assert [(r.c, r.nonnull) for r in out.collect()] == [(False, 3), (True, 1)]
    with pytest.raises(SyntaxError, match="at least one WHEN"):
        s.run("MATCH (n) RETURN CASE ELSE 1 END AS x")


def test_null_predicates_and_membership(spark):
    s = CypherSession(_null_image_graph(spark))
    out = s.run("MATCH (n:Image) WHERE n.mean IS NULL RETURN n.name AS nm")
    assert [r.nm for r in out.collect()] == ["cent_b"]
    out = s.run(
        """MATCH (n:Image) WHERE n.mean IS NOT NULL AND n.centroid
           RETURN n.name AS nm"""
    )
    assert [r.nm for r in out.collect()] == ["cent_a"]
    out = s.run(
        """MATCH (n:Image) WHERE n.name IN ['img0', 'cent_b']
           RETURN n.name AS nm ORDER BY nm"""
    )
    assert [r.nm for r in out.collect()] == ["cent_b", "img0"]
    # IN over a parameterized list
    out = s.run(
        "MATCH (n:Image) WHERE n.name IN $names RETURN n.name AS nm",
        names=["img2"],
    )
    assert [r.nm for r in out.collect()] == ["img2"]


def test_string_predicates(spark):
    s = CypherSession(_null_image_graph(spark))
    run_names = lambda q: [
        r.nm for r in s.run(q + " RETURN n.name AS nm ORDER BY nm").collect()
    ]
    assert run_names("MATCH (n:Image) WHERE n.name STARTS WITH 'cent'") == [
        "cent_a",
        "cent_b",
    ]
    assert run_names("MATCH (n:Image) WHERE n.name ENDS WITH '2'") == ["img2"]
    assert run_names("MATCH (n:Image) WHERE n.name CONTAINS 'mg'") == [
        "img0",
        "img1",
        "img2",
    ]
    # =~ is a WHOLE-string match (Java matches()), not a find()
    assert run_names(r"MATCH (n:Image) WHERE n.name =~ 'img\d'") == [
        "img0",
        "img1",
        "img2",
    ]
    assert run_names("MATCH (n:Image) WHERE n.name =~ 'img'") == []


def test_scalar_function_surface(spark):
    s = CypherSession(_null_image_graph(spark))
    row = s.run(
        """RETURN toString(1.5) AS s, toInteger('4.7') AS i,
                  toInteger('nope') AS ibad, toFloat('2.5') AS f,
                  toBoolean('TRUE') AS b, toBoolean('nah') AS b2"""
    ).collect()[0]
    assert (row.s, row.i, row.ibad, row.f, row.b, row.b2) == (
        "1.5", 4, None, 2.5, True, None,
    )
    row = s.run(
        """RETURN substring('hello world', 6) AS a, substring('hello', 1, 3) AS b,
                  left('hello', 2) AS l, right('hello', 3) AS r,
                  right('hi', 5) AS r2, trim('  x ') AS t,
                  replace('a-b-c', '-', '+') AS rep,
                  split('a,b,,c', ',') AS sp, reverse('abc') AS rv"""
    ).collect()[0]
    assert (row.a, row.b, row.l, row.r, row.r2) == ("world", "ell", "he", "llo", "hi")
    assert (row.t, row.rep, row.sp, row.rv) == ("x", "a+b+c", ["a", "b", "", "c"], "cba")
    row = s.run(
        """RETURN head([1,2,3]) AS h, last([1,2,3]) AS l, tail([1,2,3]) AS t,
                  head([]) AS he, last([]) AS le, tail([1]) AS te"""
    ).collect()[0]
    assert (row.h, row.l, row.t, row.he, row.le, row.te) == (1, 3, [2, 3], None, None, [])
    row = s.run(
        """RETURN round(2.5) AS r1, round(2.448, 2) AS r2, floor(2.7) AS fl,
                  ceil(2.1) AS ce, sqrt(9.0) AS sq, sign(-3.2) AS sg,
                  log(1.0) AS lg, log10(100.0) AS lt, pi() AS p"""
    ).collect()[0]
    assert (row.r1, row.r2, row.fl, row.ce, row.sq, row.sg, row.lg, row.lt) == (
        3.0, 2.45, 2, 3, 3.0, -1, 0.0, 2.0,
    )
    assert abs(row.p - 3.14159265) < 1e-8
    # size() is polymorphic: string chars vs list elements
    row = s.run(
        "MATCH (n:Image) WHERE n.name = 'img0' "
        "RETURN size(n.name) AS sz, size([1,2]) AS sza"
    ).collect()[0]
    assert (row.sz, row.sza) == (4, 2)


def test_entity_introspection_functions(spark):
    s = CypherSession(_null_image_graph(spark))
    row = s.run(
        "MATCH (n:Image) WHERE n.name = 'img0' RETURN labels(n) AS lb"
    ).collect()[0]
    assert row.lb == ["Image"]
    row = s.run("MATCH (a)-[r]->(b) RETURN type(r) AS t").collect()[0]
    assert row.t == "CLOSEST_TO"
    # keys() lists only properties PRESENT (non-null) on the entity
    out = s.run(
        """MATCH (n:Image) WHERE n.name IN ['cent_b', 'img0']
           RETURN n.name AS nm, keys(n) AS ks ORDER BY nm"""
    )
    assert [(r.nm, r.ks) for r in out.collect()] == [
        ("cent_b", ["name", "centroid"]),
        ("img0", ["name", "mean", "centroid"]),
    ]
    row = s.run(
        "MATCH (n:Image) WHERE n.name = 'img0' RETURN properties(n) AS ps"
    ).collect()[0]
    assert row.ps.asDict() == {"name": "img0", "mean": 1.0, "centroid": False}
    with pytest.raises(ValueError, match="bound node/edge variable"):
        s.run("RETURN keys([1,2]) AS x")


def _orders_graph(spark):
    """Four customers, four orders; two customers have no orders."""
    v = spark.createDataFrame(
        [
            (0, "Customer", "alice", 1),
            (1, "Customer", "bob", 2),
            (2, "Customer", "carol", 1),
            (3, "Customer", "dave", 3),
            (10, "Order", "o10", None),
            (11, "Order", "o11", None),
            (12, "Order", "o12", None),
            (13, "Order", "o13", None),
        ],
        "id long, label string, name string, grp int",
    )
    e = spark.createDataFrame(
        [
            (0, 10, "PLACED"),
            (0, 11, "PLACED"),
            (0, 12, "PLACED"),
            (1, 13, "PLACED"),
        ],
        "src long, dst long, relationship string",
    )
    return Graph(v, e)


def test_correlated_call_aggregates_with_empty_defaults(spark):
    """count/collect/sum aggregate PER input row; inputs with no matches
    survive with Cypher's empty-group defaults (0 / [] / 0)."""
    s = CypherSession(_orders_graph(spark))
    out = s.run(
        """MATCH (c:Customer)
           CALL { WITH c MATCH (c)-[:PLACED]->(o:Order)
                  RETURN count(o) AS n, collect(o.name) AS os,
                         sum(ID(o)) AS tot }
           RETURN c.name AS nm, n, os, tot ORDER BY nm"""
    )
    rows = [(r.nm, r.n, sorted(r.os), r.tot) for r in out.collect()]
    assert rows == [
        ("alice", 3, ["o10", "o11", "o12"], 33),
        ("bob", 1, ["o13"], 13),
        ("carol", 0, [], 0),
        ("dave", 0, [], 0),
    ]


def test_correlated_call_row_returns_drop_empty_inputs(spark):
    """A non-aggregate RETURN keeps Neo4j's cardinality rule: an input
    row with zero subquery output rows is eliminated."""
    s = CypherSession(_orders_graph(spark))
    out = s.run(
        """MATCH (c:Customer)
           CALL { WITH c MATCH (c)-[:PLACED]->(o:Order) RETURN o.name AS onm }
           RETURN c.name AS nm, onm ORDER BY nm, onm"""
    )
    assert [(r.nm, r.onm) for r in out.collect()] == [
        ("alice", "o10"),
        ("alice", "o11"),
        ("alice", "o12"),
        ("bob", "o13"),
    ]


def test_correlated_call_per_row_order_by_limit(spark):
    """ORDER BY + LIMIT inside the subquery is a PER-input-row top-k
    (window), not a global limit."""
    s = CypherSession(_orders_graph(spark))
    out = s.run(
        """MATCH (c:Customer)
           CALL { WITH c MATCH (c)-[:PLACED]->(o:Order)
                  RETURN o.name AS onm ORDER BY onm DESC LIMIT 1 }
           RETURN c.name AS nm, onm ORDER BY nm"""
    )
    assert [(r.nm, r.onm) for r in out.collect()] == [
        ("alice", "o12"),
        ("bob", "o13"),
    ]


def test_correlated_call_intermediate_with_and_duplicate_imports(spark):
    """An intermediate WITH ... WHERE inside the body filters per group,
    and duplicate import combos (two customers share grp 1) each get the
    subquery result — the distinct-combo compile must fan back out."""
    s = CypherSession(_orders_graph(spark))
    out = s.run(
        """MATCH (c:Customer)
           CALL { WITH c MATCH (c)-[:PLACED]->(o:Order)
                  WITH c, o WHERE o.name <> 'o11'
                  RETURN sum(ID(o)) AS tot }
           RETURN c.name AS nm, tot ORDER BY nm"""
    )
    assert [(r.nm, r.tot) for r in out.collect()] == [
        ("alice", 22),
        ("bob", 13),
        ("carol", 0),
        ("dave", 0),
    ]
    out = s.run(
        """MATCH (c:Customer)
           WITH c.grp AS g
           CALL { WITH g MATCH (x:Customer) WHERE x.grp = g
                  RETURN count(x) AS peers }
           RETURN g, peers ORDER BY g"""
    )
    assert sorted((r.g, r.peers) for r in out.collect()) == [
        (1, 2),
        (1, 2),
        (2, 1),
        (3, 1),
    ]


def test_shortest_path(spark):
    """shortestPath((a)-[:T*..k]->(b)): one row per endpoint pair at its
    minimal hop count; a shortcut edge must win over the longer chain."""
    v = spark.createDataFrame(
        [(i, "N", f"n{i}") for i in range(5)], "id long, label string, name string"
    )
    # chain 0->1->2->3 plus shortcut 0->2; 4 isolated
    e = spark.createDataFrame(
        [(0, 1, "NEXT"), (1, 2, "NEXT"), (2, 3, "NEXT"), (0, 2, "NEXT")],
        "src long, dst long, relationship string",
    )
    s = CypherSession(Graph(v, e))
    out = s.run(
        """MATCH p = shortestPath((a:N)-[:NEXT*..5]->(b:N))
           RETURN a.name AS an, b.name AS bn, length(p) AS d ORDER BY an, bn"""
    )
    assert [(r.an, r.bn, r.d) for r in out.collect()] == [
        ("n0", "n1", 1),
        ("n0", "n2", 1),  # shortcut beats 0->1->2
        ("n0", "n3", 2),  # 0->2->3 beats 0->1->2->3
        ("n1", "n2", 1),
        ("n1", "n3", 2),
        ("n2", "n3", 1),
    ]
    # undirected, with WHERE on both endpoints
    out = s.run(
        """MATCH p = shortestPath((a)-[:NEXT*..5]-(b))
           WHERE a.name = 'n3' AND b.name = 'n0' RETURN length(p) AS d"""
    )
    assert [r.d for r in out.collect()] == [2]
    # form without a path variable: plain minimal-pair reachability
    out = s.run(
        """MATCH shortestPath((a)-[:NEXT*..2]->(b)) WHERE a.name = 'n0'
           RETURN b.name AS bn ORDER BY bn"""
    )
    assert [r.bn for r in out.collect()] == ["n1", "n2", "n3"]


def test_shortest_path_gates(spark):
    s = CypherSession(_chain_graph(spark))
    with pytest.raises(ValueError, match="single variable-length"):
        s.run("MATCH p = shortestPath((a)-[:NEXT]->(b)) RETURN 1")
    with pytest.raises(ValueError, match="single variable-length"):
        s.run("MATCH p = allShortestPaths((a)-[:NEXT]->(b)) RETURN 1")
    # round 10: general FIXED-LENGTH path variables bind; round 11:
    # single-relationship VARLENGTH path variables bind too — only a
    # varlength edge mixed with further pattern edges stays gated
    with pytest.raises(ValueError, match="exactly one relationship"):
        s.run("MATCH p = (a)-[:NEXT*1..2]->(b)-[:NEXT]->(c) RETURN 1")
    with pytest.raises(ValueError, match="anonymous"):
        s.run("MATCH p = (a)-[:NEXT]->() RETURN 1")
    with pytest.raises(ValueError, match="lower bound of 1"):
        s.run("MATCH p = shortestPath((a)-[:NEXT*2..3]->(b)) RETURN 1")
    with pytest.raises(ValueError, match="path variables"):
        s.run("MATCH (a) RETURN length(a.name)")


def test_remove_label(spark):
    """REMOVE n:Label nulls the single label column, but ONLY on nodes
    currently carrying that label; other labels are untouched (Neo4j's
    no-op for a label the node doesn't have)."""
    v = spark.createDataFrame(
        [(0, "Image", "a"), (1, "Image", "b"), (2, "Centroid", "c")],
        "id long, label string, name string",
    )
    e = spark.createDataFrame([], "src long, dst long, relationship string")
    s = CypherSession(Graph(v, e))
    s.run("MATCH (n) WHERE n.name <> 'b' REMOVE n:Image")
    rows = {r["id"]: r["label"] for r in s.graph.vertices.collect()}
    assert rows == {0: None, 1: "Image", 2: "Centroid"}
    # properties untouched
    names = {r["id"]: r["name"] for r in s.graph.vertices.collect()}
    assert names == {0: "a", 1: "b", 2: "c"}
    # mixed REMOVE list: label + property in one clause
    s2 = CypherSession(
        Graph(
            spark.createDataFrame(
                [(0, "Image", "a")], "id long, label string, name string"
            ),
            e,
        )
    )
    s2.run("MATCH (n) REMOVE n:Image, n.name")
    row = s2.graph.vertices.collect()[0]
    assert (row["label"], row["name"]) == (None, None)
    # relationships have no labels
    with pytest.raises(ValueError, match="nodes, not"):
        s.run("MATCH ()-[r]->() REMOVE r:CLOSEST_TO")


def test_anonymous_patterns_independent_across_clauses(spark):
    """Two MATCH clauses with anonymous relationships must stay
    independent (cross product), not silently equi-join on colliding
    hidden column names (round-6 review finding: the fresh-name counter
    was per-clause)."""
    v = spark.createDataFrame(
        [(0, "N", "n0"), (1, "N", "n1"), (2, "N", "n2")],
        "id long, label string, name string",
    )
    e = spark.createDataFrame(
        [(0, 2, "T"), (1, 2, "T")], "src long, dst long, relationship string"
    )
    s = CypherSession(Graph(v, e))
    out = s.run(
        """MATCH (a)-[:T]->() MATCH (b)-[:T]->()
           RETURN ID(a) AS x, ID(b) AS y ORDER BY x, y"""
    )
    assert [(r.x, r.y) for r in out.collect()] == [
        (0, 0),
        (0, 1),
        (1, 0),
        (1, 1),
    ]


def test_case_composes_with_pattern_predicates(spark):
    """exists() pattern predicates nested inside CASE arms are rewritten
    like any other predicate position (round-6 review finding)."""
    v = spark.createDataFrame(
        [(0, "N", "n0"), (1, "N", "n1"), (2, "N", "n2")],
        "id long, label string, name string",
    )
    e = spark.createDataFrame(
        [(0, 2, "T")], "src long, dst long, relationship string"
    )
    s = CypherSession(Graph(v, e))
    out = s.run(
        """MATCH (a:N)
           WHERE CASE WHEN exists((a)-[:T]->()) THEN true ELSE false END
           RETURN a.name AS nm"""
    )
    assert [r.nm for r in out.collect()] == ["n0"]


def test_tointeger_exact_above_double_precision(spark):
    """toInteger must not route exact integers through double: 2^53 + 1
    survives both as a string parse and a long column (round-6 review)."""
    s = CypherSession(_null_image_graph(spark))
    row = s.run(
        "RETURN toInteger('9007199254740993') AS a, "
        "toInteger(9007199254740993) AS b, toInteger('4.7') AS c"
    ).collect()[0]
    assert (row.a, row.b, row.c) == (9007199254740993, 9007199254740993, 4)


def test_list_quantifiers_and_reduce(spark):
    s = CypherSession(_null_image_graph(spark))
    row = s.run(
        """RETURN all(x IN [2, 4, 6] WHERE x % 2 = 0) AS a1,
                  all(x IN [2, 3] WHERE x % 2 = 0) AS a2,
                  any(x IN [1, 3, 4] WHERE x % 2 = 0) AS n1,
                  any(x IN [1, 3] WHERE x % 2 = 0) AS n2,
                  none(x IN [1, 3] WHERE x % 2 = 0) AS o1,
                  none(x IN [1, 2] WHERE x % 2 = 0) AS o2,
                  single(x IN [1, 2, 3] WHERE x % 2 = 0) AS s1,
                  single(x IN [2, 4] WHERE x % 2 = 0) AS s2"""
    ).collect()[0]
    assert (row.a1, row.a2) == (True, False)
    assert (row.n1, row.n2) == (True, False)
    assert (row.o1, row.o2) == (True, False)
    assert (row.s1, row.s2) == (True, False)
    row = s.run(
        """RETURN reduce(acc = 0, x IN [1, 2, 3, 4] | acc + x) AS tot,
                  reduce(acc = 1, x IN [1, 2, 3, 4] | acc * x) AS prod,
                  reduce(acc = 0, x IN [] | acc + x) AS empty"""
    ).collect()[0]
    assert (row.tot, row.prod, row.empty) == (10, 24, 0)
    # outer bindings visible inside; nested reduce shadows its own acc
    row = s.run(
        """MATCH (n:Image) WHERE n.name = 'img2'
           RETURN reduce(acc = 0.0, x IN [1, 2] | acc + x * n.mean) AS w,
                  reduce(acc = 0, x IN [1, 2] |
                         acc + reduce(acc = 0, y IN [10, 20] | acc + y) + x)
                      AS z"""
    ).collect()[0]
    assert (row.w, row.z) == (30.0, 63)
    # quantifier over a comprehension source
    row = s.run(
        """RETURN any(x IN [x IN range(1, 10) WHERE x > 8] WHERE x = 9) AS q"""
    ).collect()[0]
    assert row.q is True


def test_order_by_pre_projection_expression(spark):
    """Neo4j allows a non-DISTINCT, non-aggregating RETURN/WITH to ORDER
    BY expressions over the pre-projection bindings; the hidden sort
    columns must not leak into the output."""
    v = spark.createDataFrame(
        [(0, "N", "b", 3.0), (1, "N", "a", 1.0), (2, "N", "c", 2.0)],
        "id long, label string, name string, price double",
    )
    e = spark.createDataFrame([], "src long, dst long, relationship string")
    s = CypherSession(Graph(v, e))
    out = s.run("MATCH (n:N) RETURN n.name AS nm ORDER BY n.price")
    assert out.columns == ["nm"]
    assert [r.nm for r in out.collect()] == ["a", "c", "b"]
    out = s.run("MATCH (n:N) RETURN n.name AS nm ORDER BY n.price DESC LIMIT 2")
    assert [r.nm for r in out.collect()] == ["b", "c"]
    # projected alias still takes precedence
    out = s.run("MATCH (n:N) RETURN n.name AS nm ORDER BY nm")
    assert [r.nm for r in out.collect()] == ["a", "b", "c"]
    # WITH form: ordering by a column the projection drops
    out = s.run("MATCH (n:N) WITH n.name AS nm ORDER BY n.price RETURN nm")
    assert [r.nm for r in out.collect()] == ["a", "c", "b"]


def test_distinct_aggregates(spark):
    """count/sum/avg/collect with DISTINCT; min/max unaffected."""
    v = spark.createDataFrame(
        [(0, "N", 1, 10.0), (1, "N", 1, 10.0), (2, "N", 2, 20.0), (3, "N", 2, 30.0)],
        "id long, label string, g int, x double",
    )
    e = spark.createDataFrame([], "src long, dst long, relationship string")
    s = CypherSession(Graph(v, e))
    row = s.run(
        """MATCH (n:N)
           RETURN count(DISTINCT n.x) AS cd, count(n.x) AS c,
                  sum(DISTINCT n.x) AS sd, sum(n.x) AS su,
                  avg(DISTINCT n.x) AS ad,
                  collect(DISTINCT n.g) AS gs,
                  min(DISTINCT n.x) AS mn"""
    ).collect()[0]
    assert (row.cd, row.c) == (3, 4)
    assert (row.sd, row.su) == (60.0, 70.0)
    assert row.ad == 20.0
    assert row.gs == [1, 2]
    assert row.mn == 10.0
    # per-group DISTINCT via implicit grouping
    out = s.run(
        "MATCH (n:N) RETURN n.g AS g, count(DISTINCT n.x) AS k ORDER BY g"
    )
    assert [(r.g, r.k) for r in out.collect()] == [(1, 1), (2, 2)]
    with pytest.raises(ValueError, match="only aggregate functions"):
        s.run("MATCH (n:N) RETURN abs(DISTINCT n.x) AS a")
    with pytest.raises(ValueError, match="not legal"):
        s.run("MATCH (n:N) RETURN count(DISTINCT *) AS a")


def test_introspection_procedures(spark):
    """CALL db.labels() / db.relationshipTypes() / db.propertyKeys():
    the read-only introspection set, standalone (no RETURN needed), with
    YIELD...AS, and composing with bound rows like an uncorrelated CALL."""
    v = spark.createDataFrame(
        [(0, "Customer", "a", 1.0), (1, "Order", "b", None)],
        "id long, label string, name string, amount double",
    )
    e = spark.createDataFrame(
        [(0, 1, "PLACED", 0.5)],
        "src long, dst long, relationship string, weight double",
    )
    s = CypherSession(Graph(v, e))
    assert [r.label for r in s.run("CALL db.labels()").collect()] == [
        "Customer",
        "Order",
    ]
    assert [
        r.l
        for r in s.run(
            "CALL db.labels() YIELD label AS l RETURN l ORDER BY l"
        ).collect()
    ] == ["Customer", "Order"]
    assert [
        r.relationshipType for r in s.run("CALL db.relationshipTypes()").collect()
    ] == ["PLACED"]
    # propertyKeys: vertex + edge schema keys, internals excluded
    assert [r.propertyKey for r in s.run("CALL db.propertyKeys()").collect()] == [
        "amount",
        "name",
        "weight",
    ]
    # composes with bound rows (cross join, like uncorrelated CALL)
    out = s.run(
        """MATCH (n:Customer) CALL db.labels() YIELD label
           RETURN n.name AS nm, label ORDER BY nm, label"""
    )
    assert [(r.nm, r.label) for r in out.collect()] == [
        ("a", "Customer"),
        ("a", "Order"),
    ]
    with pytest.raises(ValueError, match="takes no arguments"):
        s.run("CALL db.labels(1)")
    with pytest.raises(ValueError, match="yields"):
        s.run("CALL db.labels() YIELD wat")


def test_schema_procedures(spark):
    """db.schema.nodeTypeProperties / relTypeProperties /
    visualization / dbms.components (round 7): per-(type, property)
    rows with the Neo4j type vocabulary, data-grounded `mandatory`,
    all-null properties omitted, and the flattened edge-schema
    triples."""
    v = spark.createDataFrame(
        [
            (0, "Customer", "a", 1.0, None),
            (1, "Customer", "b", None, None),
            (2, "Order", None, None, 7),
        ],
        "id long, label string, name string, amount double, qty long",
    )
    e = spark.createDataFrame(
        [(0, 2, "PLACED", 0.5), (1, 2, "PLACED", None)],
        "src long, dst long, relationship string, weight double",
    )
    s = CypherSession(Graph(v, e))
    rows = [
        (r.nodeType, r.propertyName, r.propertyTypes, r.mandatory)
        for r in s.run("CALL db.schema.nodeTypeProperties()").collect()
    ]
    assert rows == [
        # amount: present on one Customer only -> mandatory False;
        # name: on every Customer -> True; qty absent from Customer
        (":`Customer`", "amount", "Double", False),
        (":`Customer`", "name", "String", True),
        # Order: name/amount all-null -> omitted entirely
        (":`Order`", "qty", "Long", True),
    ]
    rel = [
        (r.relType, r.propertyName, r.propertyTypes, r.mandatory)
        for r in s.run("CALL db.schema.relTypeProperties()").collect()
    ]
    assert rel == [(":`PLACED`", "weight", "Double", False)]
    viz = [
        (r.srcLabel, r.relationship, r.dstLabel)
        for r in s.run("CALL db.schema.visualization()").collect()
    ]
    assert viz == [(":`Customer`", "PLACED", ":`Order`")]
    comp = s.run("CALL dbms.components()").first()
    assert comp.name and comp.edition == "community"
    # YIELD projection + composing clauses still work
    out = s.run(
        """CALL db.schema.nodeTypeProperties() YIELD nodeType AS t,
           propertyName AS p
           RETURN t, p ORDER BY t, p"""
    )
    assert out.columns == ["t", "p"] and out.count() == 3
    with pytest.raises(ValueError, match="not supported"):
        s.run("CALL apoc.meta.graph()")


# ---------------------------------------------------------------------------
# parser robustness: arbitrary input must fail CONTROLLED
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_CYPHER_WORDS = st.sampled_from(
    "MATCH WHERE RETURN WITH UNWIND SKIP LIMIT ORDER BY DISTINCT CREATE "
    "SET DELETE DETACH MERGE AS AND OR NOT IN CASE WHEN THEN ELSE END "
    "UNION ALL CALL YIELD EXISTS ( ) [ ] { } , . : = < > + - * / % .. "
    "n m r p a b 'lit' 42 3.5 $param count sum collect shortestPath".split()
)


@settings(max_examples=150, deadline=None)
@given(st.lists(_CYPHER_WORDS, min_size=1, max_size=12))
def test_parser_never_crashes_uncontrolled(tokens):
    """Any keyword salad either parses or raises the module's CONTROLLED
    exceptions (SyntaxError for malformed queries, ValueError for
    unsupported-surface gates, NotImplementedError for scoped gates).
    IndexError/KeyError/AttributeError escaping the parser would mean a
    malformed query crashes a service instead of returning a clear
    error."""
    from graph_db_clustering_spark.cypher import parse

    q = " ".join(tokens)
    try:
        parse(q)
    except (SyntaxError, ValueError, NotImplementedError):
        pass  # controlled surface


def test_explain_compiles_without_executing(spark):
    """EXPLAIN prefix and session.explain() return the Spark plan; a
    mutating query raises BEFORE applying its writes (round 7)."""
    session = CypherSession(_image_graph(spark))
    out = session.run("EXPLAIN MATCH (n) RETURN ID(n) AS id ORDER BY id")
    assert out.columns == ["line", "plan"]
    txt = "\n".join(r.plan for r in out.collect())
    assert "Physical Plan" in txt
    n_before = session.graph.vertices.count()
    with pytest.raises(ValueError, match="read-only"):
        session.explain("CREATE (x:Ghost {id: 999999})")
    assert session.graph.vertices.count() == n_before  # nothing mutated
    # any whitespace after the keyword compiles-only too — the old
    # first-8-chars check let EXPLAIN\t fall through and execute
    for sep in ("\t", "\r\n", "  "):
        out = session.run(f"EXPLAIN{sep}MATCH (n) RETURN ID(n) AS id")
        assert out.columns == ["line", "plan"]
        assert "Physical Plan" in "\n".join(r.plan for r in out.collect())


def test_void_schema_procedures_are_noops(spark):
    """Round 9: db.createLabel / db.createProperty /
    db.createRelationshipType / db.awaitIndex(es) / db.resampleIndex
    parse, validate arity, and do NOTHING — migrating scripts that
    pre-create tokens or await indexes run unchanged. Bindings pass
    through; a standalone void CALL returns Neo4j's no-records shape."""
    v = spark.createDataFrame(
        [(0, "Customer", "a"), (1, "Order", "b")],
        "id long, label string, name string",
    )
    e = spark.createDataFrame(
        [(0, 1, "PLACED")], "src long, dst long, relationship string"
    )
    s = CypherSession(Graph(v, e))
    # standalone: zero rows, zero columns (Neo4j: "no changes, no records")
    out = s.run("CALL db.createLabel('Thing')")
    assert out.count() == 0 and out.columns == []
    assert s.run("CALL db.awaitIndexes()").count() == 0
    # mid-query: the binding table passes through unchanged
    out = s.run(
        "MATCH (n:Customer) CALL db.createProperty('x') "
        "CALL db.resampleOutdatedIndexes() RETURN n.name AS name"
    )
    assert [r.name for r in out.collect()] == ["a"]
    # arity validated
    with pytest.raises(ValueError, match="takes 1 argument"):
        s.run("CALL db.createLabel()")
    # void procedures have nothing to YIELD
    with pytest.raises(ValueError, match="void"):
        s.run("CALL db.createLabel('X') YIELD label RETURN label")
    # unknown procedures still list the full supported set
    with pytest.raises(ValueError, match="db.createLabel"):
        s.run("CALL apoc.load.json('x')")


def test_all_shortest_paths(spark):
    """allShortestPaths (round 10): one row PER minimal path — the
    diamond 0->{1,2}->3 has TWO 2-hop paths, so (n0,n3) appears twice
    while shortestPath keeps one; counts multiply along layers
    (0..4 via the double diamond = 4 paths)."""
    v = spark.createDataFrame(
        [(i, "N", f"n{i}") for i in range(7)],
        "id long, label string, name string",
    )
    # diamond 0->1->3, 0->2->3; second diamond 3->4->6, 3->5->6
    e = spark.createDataFrame(
        [(0, 1, "NEXT"), (0, 2, "NEXT"), (1, 3, "NEXT"), (2, 3, "NEXT"),
         (3, 4, "NEXT"), (3, 5, "NEXT"), (4, 6, "NEXT"), (5, 6, "NEXT")],
        "src long, dst long, relationship string",
    )
    s = CypherSession(Graph(v, e))
    out = s.run(
        """MATCH p = allShortestPaths((a:N)-[:NEXT*..6]->(b:N))
           WHERE a.name = 'n0' AND b.name IN ['n3', 'n6']
           RETURN b.name AS bn, length(p) AS d ORDER BY bn"""
    )
    rows = [(r.bn, r.d) for r in out.collect()]
    assert rows == [("n3", 2), ("n3", 2), ("n6", 4), ("n6", 4),
                    ("n6", 4), ("n6", 4)]
    # shortestPath on the same pattern: one row per pair
    one = s.run(
        """MATCH p = shortestPath((a:N)-[:NEXT*..6]->(b:N))
           WHERE a.name = 'n0' AND b.name IN ['n3', 'n6']
           RETURN b.name AS bn, length(p) AS d ORDER BY bn"""
    )
    assert [(r.bn, r.d) for r in one.collect()] == [("n3", 2), ("n6", 4)]
    # aggregating the multiplicity is the natural consumption
    cnt = s.run(
        """MATCH p = allShortestPaths((a:N)-[:NEXT*..6]->(b:N))
           WHERE a.name = 'n0'
           RETURN b.name AS bn, count(*) AS npaths ORDER BY bn"""
    )
    assert [(r.bn, r.npaths) for r in cnt.collect()] == [
        ("n1", 1), ("n2", 1), ("n3", 2), ("n4", 2), ("n5", 2), ("n6", 4),
    ]
    # a shortcut edge kills the longer alternatives entirely
    e2 = e.unionByName(spark.createDataFrame(
        [(0, 3, "NEXT")], "src long, dst long, relationship string"))
    s2 = CypherSession(Graph(v, e2))
    cnt2 = s2.run(
        """MATCH p = allShortestPaths((a:N)-[:NEXT*..6]->(b:N))
           WHERE a.name = 'n0' AND b.name = 'n3'
           RETURN count(*) AS npaths, max(length(p)) AS d"""
    )
    assert [(r.npaths, r.d) for r in cnt2.collect()] == [(1, 1)]


def test_general_path_variables(spark):
    """Round 10: p = (a)-[r:NEXT]->(b)-[:NEXT]->(c) binds a REAL path —
    length(p) is the edge count, nodes(p)/relationships(p) are arrays
    of the bound structs (anonymous-but-constrained hops included)."""
    v = spark.createDataFrame(
        [(i, "N", f"n{i}") for i in range(4)],
        "id long, label string, name string",
    )
    e = spark.createDataFrame(
        [(0, 1, "NEXT"), (1, 2, "NEXT"), (2, 3, "NEXT")],
        "src long, dst long, relationship string",
    )
    s = CypherSession(Graph(v, e))
    out = s.run(
        """MATCH p = (a:N)-[:NEXT]->(:N)-[:NEXT]->(c:N)
           RETURN a.name AS an, c.name AS cn, length(p) AS d,
                  size(nodes(p)) AS nn, size(relationships(p)) AS nr
           ORDER BY an"""
    )
    assert [(r.an, r.cn, r.d, r.nn, r.nr) for r in out.collect()] == [
        ("n0", "n2", 2, 3, 2),
        ("n1", "n3", 2, 3, 2),
    ]
    # element access: the middle node's name via nodes(p)[1]
    out2 = s.run(
        """MATCH p = (a:N)-[:NEXT]->(b:N)
           WHERE a.name = 'n0'
           RETURN nodes(p)[1].name AS mid, length(p) AS d"""
    )
    assert [(r.mid, r.d) for r in out2.collect()] == [("n1", 1)]
    # single-node path: length 0
    out3 = s.run(
        "MATCH p = (a:N) WHERE a.name = 'n2' RETURN length(p) AS d"
    )
    assert [r.d for r in out3.collect()] == [0]
