"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``    — flagship query smoke check at sf0.001.
- ``queries()``       — every implemented operator from SURVEY.md §2 as a
                        (spark, sf_dir) -> DataFrame callable.
- ``oracle_sql()``    — per-query DuckDB-dialect ANSI SQL oracle. Queries
                        without an oracle entry are non-SQL-expressible and
                        get the driver's rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from graph_db_clustering_spark.queries.corpus import ORACLE, QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the corrected k-means assignment step (SURVEY §7.2) —
    cosine top-1 of points against broadcast centroids, as one distributed
    plan (crossJoin(broadcast) + HOF cosine + window top-1)."""
    return QUERIES["q16"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
