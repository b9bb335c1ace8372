"""sources/delta round-9 maintenance: checkpoint writer + OPTIMIZE
compaction — the log/file hygiene a long-lived table needs."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from graph_db_clustering_spark.catalog import load_table
from graph_db_clustering_spark.sources.delta import (
    delta_append,
    delta_checkpoint,
    delta_compact,
    delta_file_stats,
    delta_live_files,
    read_delta,
    read_delta_pruned,
)

SF = "/root/testdata/sf0.001"


def test_checkpoint_writer_roundtrips_and_survives_retention(spark, tmp_path):
    """delta_checkpoint writes a classic single-part checkpoint the
    repo's own reader replays: live files, STATS, and partitionValues
    all survive deleting every JSON commit it covers."""
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    t = str(tmp_path / "cpw")
    delta_append(spark, li.filter(F.col("l_quantity") < 10).repartition(1),
                 t, stats_cols=["l_quantity"])
    delta_append(spark, li.filter((F.col("l_quantity") >= 10) & (F.col("l_quantity") < 25)).repartition(1),
                 t, stats_cols=["l_quantity"])
    before_files = delta_live_files(t)
    before_stats = delta_file_stats(t)
    v = delta_checkpoint(t)
    assert v == 1
    log = os.path.join(t, "_delta_log")
    assert os.path.exists(os.path.join(log, f"{1:020d}.checkpoint.parquet"))
    lc = json.load(open(os.path.join(log, "_last_checkpoint")))
    assert lc["version"] == 1
    # retention: expire the covered JSON commits
    os.remove(os.path.join(log, f"{0:020d}.json"))
    os.remove(os.path.join(log, f"{1:020d}.json"))
    assert delta_live_files(t) == before_files
    after_stats = delta_file_stats(t)
    assert after_stats == before_stats  # stats survived via the checkpoint
    want = li.filter(F.col("l_quantity") < 25)
    got = read_delta(spark, t)
    assert got.count() == want.count()
    # file skipping still prunes from checkpoint-only stats
    _, nread, nskip = read_delta_pruned(spark, t, "l_quantity", 1, 5)
    assert (nread, nskip) == (1, 1)
    # appends continue the version sequence from the checkpoint
    v2 = delta_append(spark, li.filter(F.col("l_quantity") >= 40).repartition(1), t)
    assert v2 == 2


def test_checkpoint_preserves_partition_values(spark, tmp_path):
    o = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    t = str(tmp_path / "cpp")
    delta_append(spark, o.repartition(2), t, partition_by=["o_orderpriority"])
    before = read_delta(spark, t)
    n, want = before.count(), o.count()
    assert n == want
    delta_checkpoint(t)
    log = os.path.join(t, "_delta_log")
    os.remove(os.path.join(log, f"{0:020d}.json"))
    back = read_delta(spark, t)
    assert back.count() == want
    assert back.schema["o_orderpriority"].dataType.simpleString() == "string"
    assert back.exceptAll(o).count() == 0 and o.exceptAll(back).count() == 0


def test_compact_merges_small_files_content_identical(spark, tmp_path):
    """OPTIMIZE: four small commits collapse to one file per partition;
    rows identical before/after; recomputed stats keep skipping alive;
    time travel to pre-compaction versions still works."""
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    t = str(tmp_path / "opt")
    for lo, hi in ((0, 10), (10, 25), (25, 40), (40, 100)):
        delta_append(
            spark,
            li.filter((F.col("l_quantity") >= lo) & (F.col("l_quantity") < hi)).repartition(1),
            t, stats_cols=["l_quantity"],
        )
    assert len(delta_live_files(t)) == 4
    before = read_delta(spark, t)
    n = before.count()
    v = delta_compact(spark, t, stats_cols=["l_quantity"])
    assert v == 4
    live = delta_live_files(t)
    assert len(live) == 1
    after = read_delta(spark, t)
    assert after.count() == n == li.count()
    assert after.exceptAll(li).count() == 0
    # stats recomputed on the compacted file: full-range pruned read
    # keeps it; a disjoint range below min skips it (loud empty error)
    stats = delta_file_stats(t)
    assert stats[0]["minValues"]["l_quantity"] is not None
    _, nread, nskip = read_delta_pruned(spark, t, "l_quantity", 0, 1e9)
    assert (nread, nskip) == (1, 0)
    # time travel: version 1 still shows the first two commits only
    assert read_delta(spark, t, 1).count() == li.filter(F.col("l_quantity") < 25).count()
    # idempotent: nothing left to compact -> no new commit
    assert delta_compact(spark, t) == 4


def test_compact_partitioned_one_file_per_partition(spark, tmp_path):
    o = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    t = str(tmp_path / "optp")
    delta_append(spark, o.repartition(3), t, partition_by=["o_orderpriority"])
    delta_append(spark, o.limit(0), t, partition_by=["o_orderpriority"])  # no-op commit
    n_parts = o.select("o_orderpriority").distinct().count()
    assert len(delta_live_files(t)) == 3 * n_parts
    delta_compact(spark, t)
    live = delta_live_files(t)
    assert len(live) == n_parts  # exactly one file per partition dir
    back = read_delta(spark, t)
    assert back.count() == o.count()
    assert back.exceptAll(o).count() == 0 and o.exceptAll(back).count() == 0


def test_vacuum_deletes_only_unreferenced_files(spark, tmp_path):
    """The full maintenance lifecycle: append -> compact -> vacuum is a
    NO-OP while history still references the old files -> checkpoint +
    retention-expire the log -> vacuum now removes exactly the
    compacted-away files; the table reads identically throughout."""
    from graph_db_clustering_spark.sources.delta import delta_vacuum

    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    t = str(tmp_path / "vac")
    for lo, hi in ((0, 10), (10, 25), (25, 100)):
        delta_append(
            spark,
            li.filter((F.col("l_quantity") >= lo) & (F.col("l_quantity") < hi)).repartition(1),
            t, stats_cols=["l_quantity"],
        )
    n = read_delta(spark, t).count()
    old_files = set(delta_live_files(t))
    delta_compact(spark, t, stats_cols=["l_quantity"])
    # history (the JSON commits) still references the pre-compaction
    # files via their adds/removes: vacuum must not touch them
    assert delta_vacuum(t, dry_run=True) == []
    # checkpoint subsumes history; expire the covered commits
    cp = delta_checkpoint(t)
    log = os.path.join(t, "_delta_log")
    for v in range(cp + 1):
        p = os.path.join(log, f"{v:020d}.json")
        if os.path.exists(p):
            os.remove(p)
    planned = delta_vacuum(t, dry_run=True)
    assert set(planned) == old_files  # exactly the compacted-away files
    removed = delta_vacuum(t)
    assert removed == planned
    for rel in removed:
        assert not os.path.exists(os.path.join(t, rel))
    assert read_delta(spark, t).count() == n
    # idempotent
    assert delta_vacuum(t) == []
