"""Delta Change Data Feed + protocol MERGE (round 11, VERDICT r10
#3/#4): change-file writes, add/remove fallback, the DV-vs-rewrite
strategy switch, and the loud gates."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from graph_db_clustering_spark.catalog import load_table
from graph_db_clustering_spark.sources.delta import (
    DeltaError,
    delta_add_deletion_vectors,
    delta_append,
    delta_live_files,
    delta_merge,
    delta_table_changes,
    read_delta,
)

SF = "/root/testdata/sf0.001"


def _orders(spark):
    return load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


def test_merge_dv_strategy_and_cdf_lifecycle(spark, tmp_path):
    t = str(tmp_path / "t")
    o = _orders(spark).filter(F.col("o_orderkey") % 10 < 5)
    assert delta_append(spark, o, t) == 0
    v0_files = set(delta_live_files(t))

    upd = o.filter(F.col("o_orderkey") % 20 == 0).withColumn(
        "o_totalprice", F.lit(1.0)
    )
    new = _orders(spark).filter(F.col("o_orderkey") % 10 == 7)
    res = delta_merge(spark, t, upd.unionByName(new), "o_orderkey")
    assert res["version"] == 1
    # small touched fraction -> merge-on-read: DVs, NO rewrite — every
    # original file is still live (carrying a DV), plus one merge file
    assert res["strategy"] == "dv"
    live = set(delta_live_files(t))
    assert v0_files <= live
    assert len(live - v0_files) == 1

    # merged state == the closed-form upsert
    want = (
        o.filter(~((F.col("o_orderkey") % 20 == 0)))
        .unionByName(upd)
        .unionByName(new)
    )
    got = read_delta(spark, t)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0

    # CDF replay: v0 inserts via add-fallback, v1 via change files
    ch = delta_table_changes(spark, t, 0, 1)
    counts = {
        (r["_commit_version"], r["_change_type"]): r["n"]
        for r in ch.groupBy("_commit_version", "_change_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    n0 = o.count()
    n_upd = upd.count()
    assert counts == {
        (0, "insert"): n0,
        (1, "update_preimage"): n_upd,
        (1, "update_postimage"): n_upd,
        (1, "insert"): new.count(),
    }
    # postimage rows carry the NEW values
    post = ch.filter(
        (F.col("_change_type") == "update_postimage")
    )
    assert post.agg(F.min("o_totalprice"), F.max("o_totalprice")).first() == (
        1.0, 1.0,
    )
    # preimage rows carry the OLD values
    pre = ch.filter(F.col("_change_type") == "update_preimage").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    old = o.filter(F.col("o_orderkey") % 20 == 0)
    assert pre.exceptAll(old).count() == 0

    # a DV delete with cdf=True: its deleted rows replay as 'delete'
    files = delta_live_files(t)
    scan = spark.read.parquet(
        *[os.path.join(t, p) for p in files]
    ).select(
        F.col("_metadata.file_path").alias("file_path"),
        F.col("_metadata.row_index").alias("pos"),
        "o_orderkey",
    )
    dels = scan.filter(F.col("o_orderkey") % 10 == 7).select(
        "file_path", "pos"
    )
    v2 = delta_add_deletion_vectors(spark, t, dels, cdf=True)
    ch2 = delta_table_changes(spark, t, v2, v2)
    assert ch2.filter(F.col("_change_type") == "delete").count() == (
        new.count()
    )
    assert read_delta(spark, t).count() == want.count() - new.count()


def test_merge_rewrite_strategy_when_touch_fraction_large(spark, tmp_path):
    t = str(tmp_path / "rw")
    o = _orders(spark).filter(F.col("o_orderkey") % 10 < 5)
    delta_append(spark, o, t)
    v0_files = set(delta_live_files(t))
    # touch ~80% of rows -> rewrite path
    feed = o.filter(F.col("o_orderkey") % 5 < 4).withColumn(
        "o_totalprice", F.lit(2.0)
    )
    res = delta_merge(spark, t, feed, "o_orderkey", dv_threshold=0.5)
    assert res["strategy"] == "rewrite"
    assert not (set(delta_live_files(t)) & v0_files)  # originals gone
    got = read_delta(spark, t)
    want = o.filter(F.col("o_orderkey") % 5 >= 4).unionByName(feed)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    # CDF still replays the rewrite as pre/postimage, not file churn
    ch = delta_table_changes(spark, t, res["version"], res["version"])
    assert (
        ch.filter(F.col("_change_type") == "update_postimage").count()
        == feed.count()
    )


def test_cdf_gates(spark, tmp_path):
    t = str(tmp_path / "g")
    o = _orders(spark).filter(F.col("o_orderkey") % 10 == 0)
    delta_append(spark, o, t)
    # duplicate source keys rejected
    dup = o.limit(5).unionByName(o.limit(5))
    with pytest.raises(DeltaError, match="duplicate"):
        delta_merge(spark, t, dup, "o_orderkey")
    # round 12: a DV commit WITHOUT change files is reconstructed by
    # diffing old/new bitmaps — the 3 marked rows replay as deletes
    files = delta_live_files(t)
    scan = spark.read.parquet(
        *[os.path.join(t, p) for p in files]
    ).select(
        F.col("_metadata.file_path").alias("file_path"),
        F.col("_metadata.row_index").alias("pos"),
    )
    first3 = scan.orderBy("file_path", "pos").limit(3)
    v = delta_add_deletion_vectors(spark, t, first3)  # cdf=False
    ch = delta_table_changes(spark, t, v, v)
    assert ch.count() == 3
    assert {r["_change_type"] for r in ch.collect()} == {"delete"}
    # a SECOND DV commit diffs against the first's bitmap: only the 2
    # NEWLY marked rows appear, not the 5 now in the merged vector
    v2 = delta_add_deletion_vectors(
        spark, t, scan.orderBy("file_path", "pos").limit(5)
    )
    ch2 = delta_table_changes(spark, t, v2, v2)
    assert ch2.count() == 2
    assert {r["_change_type"] for r in ch2.collect()} == {"delete"}
    total = delta_table_changes(spark, t, v, v2)
    assert total.filter(
        F.col("_change_type") == "delete"
    ).count() == 5
    # empty range
    with pytest.raises(DeltaError, match="no commits"):
        delta_table_changes(spark, t, v + 5)
    # round 13 (VERDICT r12 Next #7): merging ON a partition column
    # works — matched rows' partition value equals the source's by key
    # equality, so nothing re-routes; every matched row is replaced by
    # the single source row for its key
    t2 = str(tmp_path / "p")
    base = _orders(spark).withColumn(
        "b", (F.col("o_orderkey") % 2).cast("long")
    )
    delta_append(spark, base, t2, partition_by=["b"])
    srcrow = base.filter(F.col("b") == 0).limit(1).withColumn(
        "o_totalprice", F.lit(42.0)
    )
    res = delta_merge(spark, t2, srcrow, "b")
    got = read_delta(spark, t2)
    n_b1 = base.filter(F.col("b") == 1).count()
    assert got.filter(F.col("b") == 1).count() == n_b1
    b0 = got.filter(F.col("b") == 0).collect()
    assert len(b0) == 1 and b0[0]["o_totalprice"] == 42.0
    assert res["n_updated"] == base.filter(F.col("b") == 0).count()
    assert res["n_inserted"] == 0


@pytest.mark.slow  # >=10 s (r15 tiering)
def test_merge_partitioned_target(spark, tmp_path):
    """Round 11: MERGE into a hive-partitioned Delta table — partition
    columns restored per file for matching and CDF, merge/survivor
    files land partitioned (partitionValues in the adds, so pruned
    reads keep working)."""
    from graph_db_clustering_spark.sources.delta import read_delta_pruned

    t = str(tmp_path / "pm")
    o = _orders(spark).filter(F.col("o_orderkey") % 10 < 5).withColumn(
        "bucket", (F.col("o_orderkey") % 2).cast("string")
    )
    delta_append(spark, o, t, partition_by=["bucket"])

    upd = o.filter(F.col("o_orderkey") % 20 == 0).withColumn(
        "o_totalprice", F.lit(7.0)
    )
    new = _orders(spark).filter(F.col("o_orderkey") % 10 == 7).withColumn(
        "bucket", (F.col("o_orderkey") % 2).cast("string")
    )
    res = delta_merge(spark, t, upd.unionByName(new), "o_orderkey")
    assert res["strategy"] == "dv"
    want = (
        o.filter(~(F.col("o_orderkey") % 20 == 0))
        .unionByName(upd)
        .unionByName(new)
    )
    got = read_delta(spark, t)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    # partition pruning still works after the merge: bucket='1' scan
    df, nread, nskip = read_delta_pruned(spark, t, "bucket", "1", "1")
    assert nskip > 0
    assert df.count() == want.filter(F.col("bucket") == "1").count()
    # CDF preimage/postimage rows carry the partition column
    ch = delta_table_changes(spark, t, res["version"], res["version"])
    assert "bucket" in ch.columns
    assert (
        ch.filter(F.col("_change_type") == "update_postimage")
        .filter(F.col("bucket").isNull())
        .count()
        == 0
    )
    # rewrite strategy on a partitioned table
    feed = (
        read_delta(spark, t)
        .filter(F.col("o_orderkey") % 5 < 4)
        .withColumn("o_totalprice", F.lit(9.0))
    )
    res2 = delta_merge(spark, t, feed, "o_orderkey", dv_threshold=0.3)
    assert res2["strategy"] == "rewrite"
    got2 = read_delta(spark, t)
    want2 = (
        got.filter(F.col("o_orderkey") % 5 >= 4).unionByName(feed)
    )
    assert got2.count() == want2.count()
    assert got2.exceptAll(want2).count() == 0


def test_merge_column_mapped_partitioned_target(spark, tmp_path):
    """Round 13 (VERDICT r12 Next #7): MERGE into a column-mapped,
    hive-partitioned target — the scan renames physical->logical,
    partitionValues resolve by PHYSICAL name, and survivor/merge/
    change files land under physical names so a mapped reader (and
    pruned reads on the LOGICAL column) keep working."""
    import json

    from graph_db_clustering_spark.sources.delta import (
        _write_commit,
        read_delta_pruned,
    )

    li = load_table(spark, SF, "lineitem").select(
        F.col("l_orderkey").alias("col-aaa111"),
        F.col("l_quantity").alias("col-bbb222"),
        F.col("l_returnflag").alias("col-ccc333"),
    ).dropDuplicates(["col-aaa111"])
    t = str(tmp_path / "cmm")
    os.makedirs(t)
    flags = sorted(
        r[0] for r in li.select("col-ccc333").distinct().collect()
    )
    adds = []
    for flag in flags:
        stage = str(tmp_path / f"cmm_stage_{flag}")
        li.filter(F.col("col-ccc333") == flag).drop("col-ccc333") \
          .coalesce(1).write.parquet(stage)
        part = [p for p in os.listdir(stage) if p.endswith(".parquet")][0]
        rel = f"col-ccc333={flag}/{part}"
        os.makedirs(os.path.join(t, f"col-ccc333={flag}"))
        os.replace(
            os.path.join(stage, part), os.path.join(t, *rel.split("/"))
        )
        adds.append({"add": {
            "path": rel, "dataChange": True,
            "partitionValues": {"col-ccc333": flag},
        }})
    schema = {
        "type": "struct",
        "fields": [
            {"name": "l_orderkey", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "col-aaa111"}},
            {"name": "l_quantity", "type": "double", "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": "col-bbb222"}},
            {"name": "l_returnflag", "type": "string", "nullable": True,
             "metadata": {"delta.columnMapping.id": 3,
                          "delta.columnMapping.physicalName": "col-ccc333"}},
        ],
    }
    _write_commit(t, 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {
            "id": "cmm", "schemaString": json.dumps(schema),
            "partitionColumns": ["l_returnflag"],
            "configuration": {"delta.columnMapping.mode": "name",
                              "delta.columnMapping.maxColumnId": "3"},
        }},
    ] + adds)
    want = read_delta(spark, t)
    n0 = want.count()
    # source in LOGICAL names: update every 10th key, insert 3 new
    upd = want.filter(F.col("l_orderkey") % 10 == 0).withColumn(
        "l_quantity", F.lit(777.0)
    )
    new = spark.createDataFrame(
        [(10**9 + i, 1.0, "R") for i in range(3)],
        "l_orderkey long, l_quantity double, l_returnflag string",
    )
    res = delta_merge(spark, t, upd.unionByName(new), "l_orderkey")
    assert res["n_inserted"] == 3
    got = read_delta(spark, t)
    assert got.columns == ["l_orderkey", "l_quantity", "l_returnflag"]
    assert got.count() == n0 + 3
    assert got.filter(
        (F.col("l_orderkey") % 10 == 0)
        & (F.col("l_orderkey") < 10**9)
        & (F.col("l_quantity") != 777.0)
    ).count() == 0
    # pruning on the LOGICAL partition column still works
    df, nread, nskip = read_delta_pruned(spark, t, "l_returnflag", "R", "R")
    assert nskip > 0
    assert df.count() == got.filter(F.col("l_returnflag") == "R").count()
    # staged files landed under PHYSICAL dir names; CDF reads LOGICAL
    assert any(
        d.startswith("col-ccc333=") for d in os.listdir(t)
    )
    ch = delta_table_changes(spark, t, res["version"], res["version"])
    assert "l_orderkey" in ch.columns and "col-aaa111" not in ch.columns
    assert ch.filter(F.col("_change_type") == "insert").count() == 3
