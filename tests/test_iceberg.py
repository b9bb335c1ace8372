"""sources/iceberg: metadata + Avro-manifest replay — snapshots, time
travel, deleted entries, and loud gates; manifests written with the
repo's own Avro encoder."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from graph_db_clustering_spark.catalog import load_table
from graph_db_clustering_spark.sources.avro import encode_container
from graph_db_clustering_spark.sources.iceberg import (
    IcebergError,
    iceberg_live_files,
    read_iceberg,
)

SF = "/root/testdata/sf0.001"

MANIFEST_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "data_file",
                "fields": [
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                ],
            },
        },
    ],
}

LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
    ],
}


def _write_avro(path, schema, rows):
    with open(path, "wb") as f:
        f.write(encode_container(schema, rows, codec="null"))


def _make_table(spark, tmp_path):
    """Snapshot 1: files a+b. Snapshot 2: a kept, b DELETED, c added."""
    root = str(tmp_path / "iceberg_t")
    os.makedirs(os.path.join(root, "metadata"), exist_ok=True)
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    files = {}
    for name, df in (
        ("a", li.filter(F.col("l_quantity") < 10)),
        ("b", li.filter((F.col("l_quantity") >= 10) & (F.col("l_quantity") < 25))),
        ("c", li.filter(F.col("l_quantity") >= 25)),
    ):
        stage = str(tmp_path / f"stage_{name}")
        df.coalesce(1).write.parquet(stage)
        part = [p for p in os.listdir(stage) if p.endswith(".parquet")][0]
        dest = os.path.join(root, "data", f"{name}.parquet")
        os.rename(os.path.join(stage, part), dest)
        files[name] = dest

    def entry(status, name):
        return {
            "status": status,
            "data_file": {
                "file_path": files[name],
                "file_format": "PARQUET",
                "record_count": 1,
            },
        }

    m1 = os.path.join(root, "metadata", "m1.avro")
    _write_avro(m1, MANIFEST_SCHEMA, [entry(1, "a"), entry(1, "b")])
    ml1 = os.path.join(root, "metadata", "snap-1.avro")
    _write_avro(ml1, LIST_SCHEMA, [{"manifest_path": m1, "manifest_length": 1}])

    m2 = os.path.join(root, "metadata", "m2.avro")
    _write_avro(m2, MANIFEST_SCHEMA, [entry(0, "a"), entry(2, "b"), entry(1, "c")])
    ml2 = os.path.join(root, "metadata", "snap-2.avro")
    _write_avro(ml2, LIST_SCHEMA, [{"manifest_path": m2, "manifest_length": 1}])

    meta = {
        "format-version": 1,
        "current-snapshot-id": 2,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "snapshots": [
            {"snapshot-id": 1, "manifest-list": ml1},
            {"snapshot-id": 2, "manifest-list": ml2},
        ],
    }
    with open(os.path.join(root, "metadata", "v2.metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(root, "metadata", "version-hint.text"), "w") as f:
        f.write("2")
    return root, li


def test_iceberg_snapshots_and_time_travel(spark, tmp_path):
    root, li = _make_table(spark, tmp_path)
    latest = read_iceberg(spark, root)
    want_latest = li.filter((F.col("l_quantity") < 10) | (F.col("l_quantity") >= 25))
    assert latest.exceptAll(want_latest).count() == 0
    assert want_latest.exceptAll(latest).count() == 0
    snap1 = read_iceberg(spark, root, snapshot_id=1)
    assert snap1.count() == li.filter(F.col("l_quantity") < 25).count()
    assert len(iceberg_live_files(root)) == 2


def test_iceberg_gates(spark, tmp_path):
    root, _ = _make_table(spark, tmp_path)
    with pytest.raises(IcebergError, match="snapshot 9"):
        iceberg_live_files(root, snapshot_id=9)
    meta_path = os.path.join(root, "metadata", "v2.metadata.json")
    meta = json.load(open(meta_path))
    meta["partition-specs"] = [
        {"spec-id": 0, "fields": [{"name": "day", "transform": "day"}]}
    ]
    json.dump(meta, open(meta_path, "w"))
    with pytest.raises(NotImplementedError, match="partitioned"):
        iceberg_live_files(root)
    with pytest.raises(IcebergError, match="no metadata directory"):
        iceberg_live_files(str(tmp_path / "nope"))
