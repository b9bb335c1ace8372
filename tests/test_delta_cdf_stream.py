"""streaming/delta_cdf_source: the Delta CDF Structured Streaming
source (Spark 4 Python DataSource API) — incremental offsets, arrow
executor reads, partition-value injection, and the loud gates."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from graph_db_clustering_spark.catalog import load_table
from graph_db_clustering_spark.sources.delta import (
    delta_add_deletion_vectors,
    delta_append,
    delta_merge,
)
from graph_db_clustering_spark.streaming.delta_cdf_source import (
    DeltaCdfDataSource,
)

SF = "/root/testdata/sf0.001"


def _orders(spark):
    return load_table(spark, SF, "orders").select(
        "o_orderkey", "o_totalprice"
    )


def test_cdf_stream_incremental_batches(spark, tmp_path):
    spark.dataSource.register(DeltaCdfDataSource)
    t = str(tmp_path / "t")
    o = _orders(spark).filter(F.col("o_orderkey") % 10 < 3)
    delta_append(spark, o, t)
    upd = o.filter(F.col("o_orderkey") % 30 == 0).withColumn(
        "o_totalprice", F.lit(1.0)
    )
    delta_merge(spark, t, upd, "o_orderkey")

    stream = spark.readStream.format("delta_cdf").option("path", t).load()
    q = (
        stream.groupBy("_commit_version", "_change_type")
        .count()
        .writeStream.format("memory")
        .queryName("cdfq")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = {
            (r["_commit_version"], r["_change_type"]): r["count"]
            for r in spark.table("cdfq").collect()
        }
        assert rows == {
            (0, "insert"): o.count(),
            (1, "update_preimage"): upd.count(),
            (1, "update_postimage"): upd.count(),
        }
        # a commit landing WHILE the stream runs arrives incrementally
        more = _orders(spark).filter(F.col("o_orderkey") % 10 == 7)
        delta_append(spark, more, t)
        q.processAllAvailable()
        rows = {
            (r["_commit_version"], r["_change_type"]): r["count"]
            for r in spark.table("cdfq").collect()
        }
        assert rows[(2, "insert")] == more.count()
    finally:
        q.stop()


def test_cdf_stream_partitioned_inserts_typed(spark, tmp_path):
    spark.dataSource.register(DeltaCdfDataSource)
    t = str(tmp_path / "p")
    o = _orders(spark).filter(F.col("o_orderkey") % 10 < 2).withColumn(
        "bucket", (F.col("o_orderkey") % 2)
    )
    delta_append(spark, o, t, partition_by=["bucket"])
    stream = spark.readStream.format("delta_cdf").option("path", t).load()
    q = (
        stream.writeStream.format("memory")
        .queryName("cdfp")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.table("cdfp")
        # injected partition column comes back TYPED (bigint, not str)
        assert dict(got.dtypes)["bucket"] == "bigint"
        assert got.count() == o.count()
        assert (
            got.groupBy("bucket").count().orderBy("bucket").collect()
            == o.groupBy("bucket").count().orderBy("bucket").collect()
        )
    finally:
        q.stop()


def test_cdf_stream_dv_swap_reconstructs(spark, tmp_path):
    """Round 12 (the ex-gate): a DV commit written with cdf=False
    streams its row-level deletes by diffing old/new bitmaps against
    the immutable file, executor-side — and a SECOND DV commit emits
    only the newly marked rows, matching the batch reader."""
    from graph_db_clustering_spark.sources.delta import (
        delta_table_changes,
    )

    spark.dataSource.register(DeltaCdfDataSource)
    t = str(tmp_path / "g")
    o = _orders(spark).filter(F.col("o_orderkey") % 10 == 0)
    delta_append(spark, o, t)
    scan = spark.read.parquet(
        *[
            os.path.join(t, p)
            for p in os.listdir(t)
            if p.endswith(".parquet")
        ]
    ).select(
        F.col("_metadata.file_path").alias("file_path"),
        F.col("_metadata.row_index").alias("pos"),
    )
    ordered = scan.orderBy("file_path", "pos")
    delta_add_deletion_vectors(spark, t, ordered.limit(3))  # cdf=False
    delta_add_deletion_vectors(spark, t, ordered.limit(5))
    stream = spark.readStream.format("delta_cdf").option("path", t).load()
    q = (
        stream.writeStream.format("memory")
        .queryName("cdfg")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.table("cdfg")
        by_v = {
            (r["_commit_version"], r["_change_type"]): r["count"]
            for r in got.groupBy(
                "_commit_version", "_change_type"
            ).count().collect()
        }
        assert by_v == {
            (0, "insert"): o.count(),
            (1, "delete"): 3,
            (2, "delete"): 2,
        }, by_v
        # whole-range stream == batch reader
        batch = delta_table_changes(spark, t, 1, 2)
        skeys = sorted(
            (r["o_orderkey"], r["_commit_version"])
            for r in got.filter(
                F.col("_change_type") == "delete"
            ).collect()
        )
        bkeys = sorted(
            (r["o_orderkey"], r["_commit_version"])
            for r in batch.collect()
        )
        assert skeys == bkeys
    finally:
        q.stop()
