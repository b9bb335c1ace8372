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

from graph_db_clustering_spark.queries import ORACLE, QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the SURVEY §7.2 end-to-end k-means slice — deterministic
    init, Lloyd iterations (crossJoin(broadcast) + HOF cosine + window
    top-1 assignment; distributed vector-mean update), per-cluster sizes +
    purity. The entire reference workload (train.py:7-15) as distributed
    plans."""
    return QUERIES["kmeans_slice"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
