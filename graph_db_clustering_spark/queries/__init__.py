from graph_db_clustering_spark.queries.corpus import ORACLE, QUERIES

__all__ = ["QUERIES", "ORACLE"]
