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

    `events` fix: generated files have stored `ts` as timestamp[ns] (which
    Spark 4 rejects without the nanosAsLong legacy conf, arriving as bigint
    nanoseconds) and as tz-less timestamp[us] (which Spark 4 reads as
    TIMESTAMP_NTZ unless inferTimestampNTZ is off). Both are normalized to
    a plain TimestampType column under the UTC session zone — the type the
    whole query corpus (and its DuckDB oracles) were built against. The
    inferTimestampNTZ conf handles the µs case at scan time; the LongType
    branch rebuilds the ns case losslessly (integer division: ns epoch
    values overflow double's 53-bit mantissa, so `(ts / 1000)` via double
    would be off by ±1µs on some rows). The NTZ cast is a defensive last
    resort for sessions where the conf could not be applied.
    """
    ensure_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, T.TimestampNTZType):
            # same wall clock under the UTC session zone set by ensure_confs
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every testdata table as a temp view for Spark SQL."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
