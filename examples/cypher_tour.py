"""A runnable tour of the full openCypher surface this engine compiles.

examples/cypher_train.py shows the reference's own queries; this tour is
for the user who writes NEW Cypher against the engine — one short query
per supported clause/expression family, over a small order graph, each
printed with its answer. Every form here compiles to a DataFrame plan
(binding-table model; see cypher.py's module docstring for the surface
table and plan shapes). CALL procedures are the single unsupported
clause.

Run:  python examples/cypher_tour.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_db_clustering_spark.cypher import CypherSession  # noqa: E402
from graph_db_clustering_spark.operators.graph import Graph  # noqa: E402
from graph_db_clustering_spark.session import get_spark  # noqa: E402


def build_graph(spark) -> Graph:
    v = spark.createDataFrame(
        [
            (0, "Customer", "alice", "BUILDING", 120.0),
            (1, "Customer", "bob", "AUTOMOBILE", -5.0),
            (2, "Customer", "carol", "BUILDING", 80.0),
            (10, "Order", "o10", None, 300.0),
            (11, "Order", "o11", None, 150.0),
            (12, "Order", "o12", None, 40.0),
        ],
        "id long, label string, name string, segment string, amount double",
    )
    e = spark.createDataFrame(
        [(0, 10, "PLACED"), (0, 11, "PLACED"), (1, 12, "PLACED")],
        "src long, dst long, relationship string",
    )
    return Graph(v, e)


TOUR: list[tuple[str, str]] = [
    ("pattern match + WHERE", """
        MATCH (c:Customer)-[:PLACED]->(o:Order)
        WHERE o.amount > 100 RETURN c.name AS who, o.amount AS amt
        ORDER BY who, amt"""),
    ("OPTIONAL MATCH (left outer)", """
        MATCH (c:Customer) OPTIONAL MATCH (c)-[:PLACED]->(o:Order)
        RETURN c.name AS who, o.amount AS amt ORDER BY who, amt"""),
    ("implicit-grouping aggregates + DISTINCT", """
        MATCH (c:Customer)
        RETURN c.segment AS seg, count(c) AS n,
               count(DISTINCT c.segment) AS segs ORDER BY seg"""),
    ("CASE + string predicates", """
        MATCH (c:Customer)
        RETURN c.name AS who,
               CASE WHEN c.amount < 0 THEN 'debt'
                    WHEN c.name STARTS WITH 'a' THEN 'a-lister'
                    ELSE 'ok' END AS tag ORDER BY who"""),
    ("scalar functions", """
        RETURN toUpper(left('cypher', 3)) AS a, round(2.455, 2) AS b,
               toInteger('42') AS c, split('a,b', ',') AS d"""),
    ("UNWIND + WITH ... WHERE (HAVING)", """
        UNWIND [1, 2, 3, 4, 5] AS x
        WITH x % 2 AS par, count(x) AS n WHERE n > 2
        RETURN par, n"""),
    ("list comprehension / quantifier / reduce", """
        RETURN [x IN range(1, 6) WHERE x % 2 = 0 | x * 10] AS evens,
               any(x IN [1, 2, 3] WHERE x > 2) AS has_big,
               reduce(acc = 0, x IN [1, 2, 3, 4] | acc + x) AS tot"""),
    ("pattern comprehension + exists()", """
        MATCH (c:Customer)
        WHERE exists((c)-[:PLACED]->())
        RETURN c.name AS who,
               [(c)-[:PLACED]->(o) | o.amount] AS amounts ORDER BY who"""),
    ("correlated CALL subquery", """
        MATCH (c:Customer)
        CALL { WITH c MATCH (c)-[:PLACED]->(o:Order)
               RETURN count(o) AS n_orders, sum(o.amount) AS spent }
        RETURN c.name AS who, n_orders, spent ORDER BY who"""),
    ("UNION", """
        MATCH (c:Customer) WHERE c.amount < 0 RETURN c.name AS who
        UNION
        MATCH (c:Customer) WHERE c.segment = 'BUILDING' RETURN c.name AS who"""),
    ("shortestPath + length()", """
        MATCH p = shortestPath((a:Customer)-[:PLACED*..3]->(b:Order))
        RETURN a.name AS who, ID(b) AS order_id, length(p) AS hops
        ORDER BY who, order_id"""),
]

MUTATIONS: list[tuple[str, str]] = [
    ("CREATE", "CREATE (:Customer {name: 'dave', segment: 'MACHINERY', amount: 0.0})"),
    ("MERGE (idempotent upsert)", "MERGE (:Customer {name: 'dave'})"),
    ("SET", "MATCH (c:Customer) WHERE c.name = 'dave' SET c.amount = 9.5"),
    ("REMOVE property + label", "MATCH (c) WHERE c.name = 'dave' REMOVE c.segment"),
    ("FOREACH", "FOREACH (nm IN ['x1', 'x2'] | CREATE (:Tag {name: nm}))"),
    ("DETACH DELETE", "MATCH (t:Tag) DETACH DELETE t"),
]


def main() -> None:
    spark = get_spark("cypher-tour")
    s = CypherSession(build_graph(spark))
    for title, q in TOUR:
        print(f"\n== {title} ==")
        print("  " + " ".join(q.split()))
        for row in s.run(q).collect():
            print("   ->", tuple(row))
    print("\n== mutations (batched, copy-on-write) ==")
    for title, q in MUTATIONS:
        s.run(q)
        print(f"  {title}: vertices={s.graph.vertices.count()}")

    # LOAD CSV (round 13): Neo4j's bulk-ingest clause over Spark's
    # distributed CSV scan — fields are strings, coerce explicitly
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="cypher_tour_csv_")
    p = os.path.join(d, "more.csv")
    with open(p, "w") as f:
        f.write("name,score\nnova,91\norion,87\n")
    print("\n== LOAD CSV ingest ==")
    s.run(
        f"LOAD CSV WITH HEADERS FROM 'file://{p}' AS row "
        "CREATE (:Recruit {name: row.name, "
        "score: toInteger(row.score)})"
    )
    for row in s.run(
        "MATCH (r:Recruit) RETURN r.name AS name, r.score AS score "
        "ORDER BY score DESC"
    ).collect():
        print("   ->", tuple(row))
    spark.stop()


if __name__ == "__main__":
    main()
