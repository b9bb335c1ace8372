"""sources/delta: minimal Delta-protocol log replay — add/remove
semantics, time travel, checkpoint path, and the loud gates."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from graph_db_clustering_spark.catalog import load_table
from graph_db_clustering_spark.sources.delta import (
    DeltaError,
    delta_live_files,
    read_delta,
)

SF = "/root/testdata/sf0.001"


def _write_commit(table, version, actions):
    log = os.path.join(table, "_delta_log")
    os.makedirs(log, exist_ok=True)
    with open(os.path.join(log, f"{version:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


def _add(p):
    return {"add": {"path": p, "partitionValues": {}, "dataChange": True}}


def _make_table(spark, tmp_path):
    """v0: files a+b; v1: add c, remove b."""
    table = str(tmp_path / "dt")
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    parts = {
        "a.parquet": li.filter(F.col("l_quantity") < 10),
        "b.parquet": li.filter((F.col("l_quantity") >= 10) & (F.col("l_quantity") < 25)),
        "c.parquet": li.filter(F.col("l_quantity") >= 25),
    }
    for name, df in parts.items():
        df.coalesce(1).write.parquet(str(tmp_path / "stage" / name))
        # move the single part file to the delta table under the exact name
        stage = str(tmp_path / "stage" / name)
        part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
        os.makedirs(table, exist_ok=True)
        os.rename(os.path.join(stage, part), os.path.join(table, name))
    _write_commit(table, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "t", "format": {"provider": "parquet"}}},
        _add("a.parquet"), _add("b.parquet"),
    ])
    _write_commit(table, 1, [
        _add("c.parquet"), {"remove": {"path": "b.parquet", "dataChange": True}},
    ])
    return table, parts


def test_delta_log_replay_and_time_travel(spark, tmp_path):
    table, parts = _make_table(spark, tmp_path)
    assert delta_live_files(table, 0) == ["a.parquet", "b.parquet"]
    assert delta_live_files(table) == ["a.parquet", "c.parquet"]
    v0 = read_delta(spark, table, 0)
    latest = read_delta(spark, table)
    want_v0 = parts["a.parquet"].count() + parts["b.parquet"].count()
    want_latest = parts["a.parquet"].count() + parts["c.parquet"].count()
    assert v0.count() == want_v0
    assert latest.count() == want_latest
    # content, not just counts: latest = quantity < 10 or >= 25
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    want = li.filter((F.col("l_quantity") < 10) | (F.col("l_quantity") >= 25))
    assert latest.exceptAll(want).count() == 0
    assert want.exceptAll(latest).count() == 0


def test_delta_checkpoint_path(spark, tmp_path):
    """A classic single-part checkpoint replaces commits <= cp version;
    later JSON commits still apply."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table, parts = _make_table(spark, tmp_path)
    cp = [
        {"add": {"path": "a.parquet"}, "remove": None},
        {"add": {"path": "c.parquet"}, "remove": None},
    ]
    pq.write_table(
        pa.Table.from_pylist(cp),
        os.path.join(table, "_delta_log", f"{1:020d}.checkpoint.parquet"),
    )
    with open(os.path.join(table, "_delta_log", "_last_checkpoint"), "w") as f:
        json.dump({"version": 1, "size": 2}, f)
    _write_commit(table, 2, [{"remove": {"path": "a.parquet", "dataChange": True}}])
    assert delta_live_files(table) == ["c.parquet"]
    assert read_delta(spark, table).count() == parts["c.parquet"].count()


def test_delta_gates_and_errors(spark, tmp_path):
    table = str(tmp_path / "bad")
    _write_commit(table, 0, [
        {"add": {"path": "x.parquet", "partitionValues": {"day": "2024-01-01"}}},
    ])
    with pytest.raises(NotImplementedError, match="partitioned"):
        delta_live_files(table)
    table2 = str(tmp_path / "bad2")
    _write_commit(table2, 0, [{"protocol": {"minReaderVersion": 3}}])
    with pytest.raises(NotImplementedError, match="protocol"):
        delta_live_files(table2)
    with pytest.raises(DeltaError, match="no _delta_log"):
        delta_live_files(str(tmp_path / "empty"))
    table3 = str(tmp_path / "bad3")
    _write_commit(table3, 0, [_add("a.parquet")])
    with pytest.raises(DeltaError, match="version 5"):
        delta_live_files(table3, 5)


def test_delta_append_roundtrip_and_file_skipping(spark, tmp_path):
    """Writer -> reader roundtrip across two commits; stats-based file
    skipping prunes non-intersecting files and NEVER drops stats-less
    ones."""
    from graph_db_clustering_spark.sources.delta import (
        delta_append,
        delta_file_stats,
        read_delta_pruned,
    )

    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    table = str(tmp_path / "wt")
    v0 = delta_append(
        spark,
        li.filter(F.col("l_quantity") < 10).repartition(1),
        table,
        stats_cols=["l_quantity"],
    )
    v1 = delta_append(
        spark,
        li.filter(F.col("l_quantity") >= 40).repartition(1),
        table,
        stats_cols=["l_quantity"],
    )
    assert (v0, v1) == (0, 1)
    whole = read_delta(spark, table)
    want = li.filter((F.col("l_quantity") < 10) | (F.col("l_quantity") >= 40))
    assert whole.exceptAll(want).count() == 0 and want.exceptAll(whole).count() == 0
    # time travel back to v0
    assert read_delta(spark, table, 0).count() == li.filter(F.col("l_quantity") < 10).count()

    stats = delta_file_stats(table)
    assert len(stats) == 2 and all(s["minValues"] for s in stats)
    # a query for quantity in [1, 5] must skip the >= 40 file
    df, read, skipped = read_delta_pruned(spark, table, "l_quantity", 1, 5)
    assert read == 1 and skipped == 1
    assert df.filter(F.col("l_quantity") > 10).count() == 0
    # stats-less commit: its file must never be skipped
    delta_append(spark, li.filter((F.col("l_quantity") >= 10) & (F.col("l_quantity") < 40)).repartition(1), table)
    df2, read2, skipped2 = read_delta_pruned(spark, table, "l_quantity", 1, 5)
    assert read2 == 2 and skipped2 == 1  # stats-less file kept
