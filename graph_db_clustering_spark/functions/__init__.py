from graph_db_clustering_spark.functions.vectors import cosine_similarity, dot, l2_norm, vec_sum

__all__ = ["cosine_similarity", "dot", "l2_norm", "vec_sum"]
