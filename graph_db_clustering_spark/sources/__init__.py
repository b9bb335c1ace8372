from graph_db_clustering_spark.sources.files import (
    read_binary_dir,
    read_csv,
    read_json,
    write_bucketed_table,
    write_partitioned_parquet,
)

__all__ = [
    "read_binary_dir",
    "read_csv",
    "read_json",
    "write_bucketed_table",
    "write_partitioned_parquet",
]
