"""graph_db_clustering_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference repo
``brianreicher/graph-db-clustering`` (a Neo4j/Cypher + RDD k-means image
pipeline, see SURVEY.md) as an idiomatic Spark DataFrame/SQL engine:

- relational surface (scan/filter/project/join/agg/window/set ops) — Catalyst
  does the planning; we declare logical plans with the DataFrame API;
- property-graph layer (vertex/edge DataFrames, GraphFrames column
  convention) replacing the reference's Neo4j tier;
- distributed Lloyd's k-means replacing the reference's driver-side loop
  (reference: kmeans_clustering/image_classification.py:557-598);
- LLM-data-pipeline operators: dedup (exact/MinHash/SimHash), similarity
  search over embeddings, text analysis, multimodal binary columns;
- Structured Streaming over the `events` surface.

Everything is built from public PySpark APIs only.
"""

from graph_db_clustering_spark.session import get_spark
from graph_db_clustering_spark.catalog import load_table, register_views, TABLES

__all__ = ["get_spark", "load_table", "register_views", "TABLES"]
__version__ = "0.1.0"
