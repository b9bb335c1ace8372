"""Table catalog: load the testdata parquet tables and register views.

This is the P0 layer from SURVEY.md §7.1 — everything downstream (declared
queries, graph layer, clustering, streaming) is expressions over these
DataFrames. Loading is a plain ``spark.read.parquet`` so Catalyst's
predicate pushdown / column pruning / partition pruning all reach the scan;
the only special case is ``events`` (nanosecond parquet timestamps, see
FIXTURES.md).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from graph_db_clustering_spark.session import RUNTIME_CONFS

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def ensure_confs(spark: SparkSession) -> None:
    """Apply runtime-settable confs to a session we didn't create.

    The verify driver calls entry points with its own SparkSession; these
    confs are all runtime-settable SQL confs, so applying them here keeps
    behavior identical regardless of who built the session.
    """
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-settable in this deployment; proceed with defaults


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame (lazy; scan-time pruning).

    `events` fix: the parquet file stores timestamp[ns], which Spark 4
    rejects (PARQUET_TYPE_ILLEGAL). With the nanosAsLong legacy conf the
    column arrives as bigint nanoseconds; we rebuild a microsecond
    TimestampType column (verified lossless on this data — no row carries
    sub-microsecond residue).
    """
    ensure_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # integer division: ns epoch values overflow double's 53-bit mantissa,
        # so (ts / 1000).cast("long") would be off by ±1µs on some rows
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every testdata table as a temp view for Spark SQL."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
