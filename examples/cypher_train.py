"""The reference's k-means workflow driven by its OWN Cypher strings.

examples/train.py shows the idiomatic-Spark rewrite of the reference
driver; this example is the other migration path: keep the reference's
code shape — the literal Cypher queries image_classification.py sends to
Neo4j — and point them at CypherSession instead of a Bolt driver. Every
query string below is the reference's (file:line cited), with only the
bugfix Neo4j itself would require (carrying `n` through the WITH chain in
heuristic(), image_classification.py:345-347 drops `n` then uses it).

Workflow (reference train.py:7-15):
  1. flush            MATCH (n) DETACH DELETE n          database.py:46
  2. insert images    CREATE (:Image {...})              image_classification.py:217-221
  3. init centroids   MATCH (n) WITH n, rand() ... LIMIT k CREATE (:Centroid ...)
                                                         image_classification.py:233-237
  4. loop:
     a. drop edges    MATCH ()-[r]-() DELETE r           image_classification.py:357-359
     b. assign        the heuristic() argmin query       image_classification.py:341-348
     c. counts        MATCH (i)-[r:CLOSEST_TO]->(c) RETURN c, count(r)
                                                         image_classification.py:513-515
     stop when the per-centroid counts repeat (image_classification.py:589-595).

Run:  python examples/cypher_train.py [k] [max_iters]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from graph_db_clustering_spark.cypher import CypherSession  # noqa: E402
from graph_db_clustering_spark.operators.graph import Graph  # noqa: E402
from graph_db_clustering_spark.session import get_spark  # noqa: E402


def main(k: int = 2, max_iters: int = 10) -> None:
    spark = get_spark("cypher-train", master="local[4]", shuffle_partitions=4)

    empty_v = spark.createDataFrame(
        [], "id long, label string, name string, mean double, centroid boolean"
    )
    empty_e = spark.createDataFrame([], "src long, dst long, relationship string")
    s = CypherSession(Graph(empty_v, empty_e), seed=11)

    # 1. flush (database.py:46)
    s.run("MATCH (n) DETACH DELETE n")

    # 2. insert "images" — a deterministic 1-D feature stand-in for the
    #    contour features (the decode path needs OpenCV; see
    #    operators/multimodal for the real Arrow-batched extractor).
    #    Reference: one CREATE per image, image_classification.py:217-221.
    for i in range(20):
        s.run(
            "CREATE (:Image {name: $name, mean: $mean, centroid: $c})",
            name=f"img{i}",
            mean=float(i % 10) + (10.0 if i >= 10 else 0.0),
            c=False,
        )

    # 3. init centroids (image_classification.py:233-237, verbatim)
    s.run(
        f"""MATCH (n)
            WITH n, rand() as r
            ORDER BY r
            LIMIT {k}
            CREATE (:Image {{mean: n.mean, centroid: true, name: 'cent'}})"""
    )

    prev_counts: dict = {}
    for it in range(max_iters):
        # 4a. remove connections (image_classification.py:357-359)
        s.run("MATCH ()-[r]-()\nDELETE r")

        # 4b. heuristic assignment (image_classification.py:341-348; `n`
        #     carried through the WITH chain — the reference's query drops
        #     it, which Neo4j rejects)
        s.run(
            """MATCH (n:Image {centroid: false}), (c:Image {centroid: true})
               WITH n, c, abs(n.mean - c.mean) AS difference
               ORDER BY difference ASC
               WITH n, collect({centroid: c, difference: difference})[0] AS closest
               WITH n AS n, closest.centroid AS cent, closest.difference as diff
               CREATE (n)-[:CLOSEST_TO {difference: diff}]->(cent)"""
        )

        # 4c. per-centroid counts (image_classification.py:513-515)
        rows = s.run(
            "MATCH (i:Image)-[r:CLOSEST_TO]->(c:Image) RETURN ID(c), count(r)"
        ).collect()
        counts = {r["ID(c)"]: r["count(r)"] for r in rows}
        print(f"iter {it}: cluster sizes {sorted(counts.values())}")
        if counts == prev_counts:  # image_classification.py:589-595
            print("counts stable — converged")
            break
        prev_counts = counts

        # centroid update (the reference recomputes features per cluster,
        # image_classification.py:470-509): mean of members via Cypher agg,
        # then one SET per centroid (k rows on the driver, like the
        # reference's per-centroid loop).
        upd = s.run(
            """MATCH (i:Image {centroid: false})-[:CLOSEST_TO]->(c:Image)
               RETURN ID(c), avg(i.mean)"""
        ).collect()
        for r in upd:
            s.run(
                "MATCH (c:Image) WHERE ID(c)=$cid SET c.mean = $m",
                cid=r["ID(c)"],
                m=r["avg(i.mean)"],
            )

    final = s.run(
        """MATCH (i:Image {centroid: false})-[r:CLOSEST_TO]->(c:Image)
           RETURN ID(c), count(r), avg(i.mean) ORDER BY ID(c)"""
    )
    final.show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 2,
        int(sys.argv[2]) if len(sys.argv) > 2 else 10,
    )
