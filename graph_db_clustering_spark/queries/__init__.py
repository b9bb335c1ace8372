from graph_db_clustering_spark.queries.corpus import ORACLE, QUERIES

# modules whose import registers additional declared queries
from graph_db_clustering_spark.queries import clustering, graph, llmdata, multimodal, traindata  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLE"]
