"""Apache Hudi copy-on-write reader/writer (sources/hudi.py).

Covers the visibility rules the format's correctness hangs on: only
completed-instant base files are readable, latest slice per file group
wins, replacecommit retires groups, carried-over rows keep their
commit time (incremental exactness), pending/orphan writes are
invisible, and MERGE_ON_READ artifacts gate loudly.
"""

from __future__ import annotations

import json
import os
import re

import pytest
from pyspark.sql import functions as F

from graph_db_clustering_spark.sources.hudi import (
    HudiError,
    _BASE_RE,
    hudi_cluster,
    hudi_create,
    hudi_delete,
    hudi_live_files,
    hudi_properties,
    hudi_timeline,
    hudi_upsert,
    read_hudi,
    read_hudi_incremental,
    read_hudi_pruned,
)

META = [
    "_hoodie_commit_time",
    "_hoodie_commit_seqno",
    "_hoodie_record_key",
    "_hoodie_partition_path",
    "_hoodie_file_name",
]


def _df(spark, rows=20):
    return spark.createDataFrame(
        [(i, f"n{i}", float(i), i % 3) for i in range(rows)],
        "id long, name string, price double, region int",
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = str(tmp_path / "t")
    instant = hudi_create(
        spark, _df(spark), t, "id",
        partition_field="region", precombine="price", n_file_groups=2,
    )
    return t, instant


def test_create_snapshot_roundtrip(spark, table):
    t, _ = table
    snap = read_hudi(spark, t)
    assert snap.columns[:5] == META  # meta-first like a real base file
    assert snap.count() == 20
    got = {r["id"]: (r["name"], r["price"]) for r in snap.collect()}
    assert got == {i: (f"n{i}", float(i)) for i in range(20)}
    user = read_hudi(spark, t, drop_meta=True)
    assert user.columns == ["id", "name", "price", "region"]


def test_meta_columns_values(spark, table):
    t, instant = table
    r = read_hudi(spark, t).filter(F.col("id") == 7).collect()[0]
    assert r["_hoodie_commit_time"] == instant
    assert r["_hoodie_record_key"] == "7"
    assert r["_hoodie_partition_path"] == "region=1"
    m = _BASE_RE.match(r["_hoodie_file_name"])
    assert m and m.group(3) == instant
    # the recorded file name is the actual on-disk file
    assert os.path.exists(os.path.join(t, "region=1", r["_hoodie_file_name"]))


def test_layout(spark, table):
    t, instant = table
    hd = os.path.join(t, ".hoodie")
    names = set(os.listdir(hd))
    assert {f"{instant}.commit", f"{instant}.commit.requested",
            f"{instant}.inflight", "hoodie.properties"} <= names
    props = hudi_properties(t)
    assert props["hoodie.table.type"] == "COPY_ON_WRITE"
    assert props["hoodie.table.recordkey.fields"] == "id"
    assert props["hoodie.table.partition.fields"] == "region"
    for pp in ("region=0", "region=1", "region=2"):
        pm = os.path.join(t, pp, ".hoodie_partition_metadata")
        assert os.path.exists(pm)
        body = open(pm).read()
        assert f"commitTime={instant}" in body
        assert "partitionDepth=1" in body
    with open(os.path.join(hd, f"{instant}.commit")) as f:
        meta = json.load(f)
    assert meta["operationType"] == "BULK_INSERT"
    stats = [s for ws in meta["partitionToWriteStats"].values() for s in ws]
    assert sum(s["numWrites"] for s in stats) == 20
    assert all(s["prevCommit"] == "null" for s in stats)
    # 3 partitions x 2 file groups
    assert len(hudi_live_files(t)) == 6


def test_upsert_update_insert_precombine(spark, table):
    t, i1 = table
    up = spark.createDataFrame(
        # duplicate key 3: precombine picks price DESC -> 50.0 wins
        [(3, "dupA", 50.0, 0), (3, "dupB", 9.0, 0),
         (5, "upd5", 99.0, 2), (100, "new", 1.0, 1)],
        "id long, name string, price double, region int",
    )
    i2 = hudi_upsert(spark, t, up)
    snap = read_hudi(spark, t)
    assert snap.count() == 21
    got = {r["id"]: r for r in snap.collect()}
    assert got[3]["name"] == "dupA" and got[3]["price"] == 50.0
    assert got[5]["price"] == 99.0
    assert got[100]["price"] == 1.0
    # survivors keep their ORIGINAL commit time; touched rows advance
    assert got[7]["_hoodie_commit_time"] == i1
    assert got[3]["_hoodie_commit_time"] == i2
    assert got[100]["_hoodie_commit_time"] == i2
    # update stays in its original file group (same fileId, new slice)
    old_fid = _BASE_RE.match(got[7]["_hoodie_file_name"]).group(1)
    upd_fid = _BASE_RE.match(got[5]["_hoodie_file_name"]).group(1)
    all_fids_i1 = {
        _BASE_RE.match(f).group(1)
        for f in os.listdir(os.path.join(t, "region=2"))
        if f.endswith(".parquet") and _BASE_RE.match(f)
    }
    assert upd_fid in all_fids_i1
    assert old_fid  # sanity


def test_upsert_duplicate_keys_without_precombine(spark, tmp_path):
    t = str(tmp_path / "t")
    hudi_create(spark, _df(spark), t, "id")  # no precombine
    up = spark.createDataFrame(
        [(1, "a", 1.0, 0), (1, "b", 2.0, 0)],
        "id long, name string, price double, region int",
    )
    with pytest.raises(HudiError, match="duplicate record keys"):
        hudi_upsert(spark, t, up)


def test_upsert_missing_column_raises(spark, table):
    t, _ = table
    with pytest.raises(HudiError, match="lacks columns"):
        hudi_upsert(spark, t, spark.createDataFrame([(1,)], "id long"))


def test_delete_and_empty_group(spark, table):
    t, i1 = table
    # wipe partition region=2 entirely (both groups) + one key elsewhere
    keys = spark.createDataFrame(
        [(i,) for i in range(20) if i % 3 == 2] + [(0,)], "id long"
    )
    hudi_delete(spark, t, keys)
    snap = read_hudi(spark, t)
    left = sorted(r["id"] for r in snap.collect())
    assert left == sorted(
        i for i in range(20) if i % 3 != 2 and i != 0
    )
    assert snap.filter("region = 2").count() == 0
    # time travel still sees the pre-delete state
    assert read_hudi(spark, t, as_of=i1).count() == 20


def test_delete_nonexistent_keys_is_noop(spark, table):
    t, _ = table
    hudi_delete(spark, t, spark.createDataFrame([(999,)], "id long"))
    assert read_hudi(spark, t).count() == 20
    assert len(hudi_timeline(t)) == 2  # the no-op commit still lands


def test_incremental_exact(spark, table):
    t, i1 = table
    up = spark.createDataFrame(
        [(4, "u", 4.5, 1), (200, "n", 2.0, 2)],
        "id long, name string, price double, region int",
    )
    i2 = hudi_upsert(spark, t, up)
    up2 = spark.createDataFrame(
        [(4, "v", 5.5, 1)], "id long, name string, price double, region int"
    )
    i3 = hudi_upsert(spark, t, up2)
    # (i1, i3]: latest state of every changed record, NOT carried rows
    inc = read_hudi_incremental(spark, t, i1)
    got = {r["id"]: (r["name"], r["_hoodie_commit_time"])
           for r in inc.collect()}
    assert got == {4: ("v", i3), 200: ("n", i2)}
    # (i1, i2]: only what commit 2 wrote
    inc2 = read_hudi_incremental(spark, t, i1, i2)
    assert {r["id"] for r in inc2.collect()} == {4, 200}
    assert inc2.filter("id = 4").collect()[0]["name"] == "u"
    with pytest.raises(HudiError, match="no completed commits"):
        read_hudi_incremental(spark, t, i3)


def test_incremental_spanning_cluster_no_duplicates(spark, table):
    # ADVICE r11 (high): a range spanning an upsert and a later
    # clustering replacecommit must not return the updated rows twice
    # (old group's slice + replacement slice with preserved commit
    # time). The replaced groups must be skipped in slice selection.
    t, i1 = table
    up = spark.createDataFrame(
        [(4, "u", 4.5, 1)], "id long, name string, price double, region int"
    )
    i2 = hudi_upsert(spark, t, up)
    hudi_cluster(spark, t)
    inc = read_hudi_incremental(spark, t, i1)
    rows = inc.collect()
    assert [r["id"] for r in rows] == [4]
    assert rows[0]["name"] == "u"
    assert rows[0]["_hoodie_commit_time"] == i2
    # a range covering ONLY the replacecommit changes no data
    assert read_hudi_incremental(spark, t, i2).count() == 0


def test_cluster_replacecommit(spark, table):
    t, i1 = table
    hudi_delete(
        spark, t,
        spark.createDataFrame([(i,) for i in range(0, 20, 4)], "id long"),
    )
    before = len(hudi_live_files(t))
    i3 = hudi_cluster(spark, t)
    after = len(hudi_live_files(t))
    assert after == 3 < before  # one group per partition
    tl = hudi_timeline(t)
    assert tl[-1] == {"instant": i3, "action": "replacecommit"}
    snap = read_hudi(spark, t)
    assert sorted(r["id"] for r in snap.collect()) == sorted(
        i for i in range(20) if i % 4 != 0
    )
    # rows keep their original commit time through clustering
    assert {r["_hoodie_commit_time"] for r in snap.collect()} == {i1}
    # time travel before the replacecommit sees the OLD layout
    assert read_hudi(spark, t, as_of=i1).count() == 20
    with open(os.path.join(t, ".hoodie", f"{i3}.replacecommit")) as f:
        meta = json.load(f)
    assert sum(len(v) for v in meta["partitionToReplaceFileIds"].values()) \
        == before


def test_cluster_then_upsert(spark, table):
    t, _ = table
    hudi_cluster(spark, t)
    up = spark.createDataFrame(
        [(1, "x", 0.5, 1), (300, "y", 3.0, 0)],
        "id long, name string, price double, region int",
    )
    hudi_upsert(spark, t, up)
    snap = read_hudi(spark, t)
    assert snap.count() == 21
    got = {r["id"]: r["name"] for r in snap.collect()}
    assert got[1] == "x" and got[300] == "y"


def test_orphan_and_pending_files_invisible(spark, table):
    t, instant = table
    import pyarrow.parquet as pq

    live = hudi_live_files(t)
    # orphan base file whose instant never completed (failed write)
    fake = str(int(instant) + 500)
    src = live[0]
    dest = os.path.join(
        os.path.dirname(src), f"deadbeef-0000-0000-0000-000000000000"
        f"_0-0-0_{fake}.parquet"
    )
    pq.write_table(pq.read_table(src), dest)
    # plus its pending markers — still not completed
    open(os.path.join(t, ".hoodie", f"{fake}.commit.requested"), "w").close()
    open(os.path.join(t, ".hoodie", f"{fake}.inflight"), "w").close()
    assert dest not in hudi_live_files(t)
    assert read_hudi(spark, t).count() == 20


def test_clean_rollback_savepoint_ignored(spark, table):
    t, _ = table
    for a in ("clean", "rollback", "savepoint"):
        open(os.path.join(t, ".hoodie", f"20991231000000000.{a}"),
             "w").close()
    assert read_hudi(spark, t).count() == 20
    actions = {e["action"] for e in hudi_timeline(t)}
    assert {"clean", "rollback", "savepoint"} <= actions


def test_table_version6_completed_name(spark, table):
    t, _ = table
    up = spark.createDataFrame(
        [(0, "z", 9.0, 0)], "id long, name string, price double, region int"
    )
    i2 = hudi_upsert(spark, t, up)
    # rename the completed file to the 1.0-style <start>_<completion>
    hd = os.path.join(t, ".hoodie")
    os.replace(
        os.path.join(hd, f"{i2}.commit"),
        os.path.join(hd, f"{i2}_{int(i2) + 7}.commit"),
    )
    snap = read_hudi(spark, t)
    assert snap.filter("id = 0").collect()[0]["name"] == "z"


def test_mor_gates(spark, table):
    t, _ = table
    # a stray deltacommit marker on a CoW table is visibility-neutral
    # (round 12: deltacommits are first-class, handled by hudi_mor)
    marker = os.path.join(t, ".hoodie", "20991231000000001.deltacommit")
    open(marker, "w").close()
    assert read_hudi(spark, t).count() == 20
    os.remove(marker)
    logf = os.path.join(
        t, "region=0",
        ".f1-0_20240101.log.1_0-0-0",
    )
    open(logf, "w").close()
    with pytest.raises(NotImplementedError, match="MERGE_ON_READ"):
        read_hudi(spark, t)


def test_pruned_partition_and_footer(spark, table):
    t, _ = table
    df, kept, skipped = read_hudi_pruned(spark, t, "region", 1, 1)
    assert skipped >= 4  # region=0 / region=2 dirs dropped by name
    assert df.filter("region <> 1").count() == 0
    # non-partition column prunes on parquet footer min/max
    df2, k2, s2 = read_hudi_pruned(spark, t, "id", 18, 19)
    assert s2 >= 1
    assert sorted(
        r["id"] for r in df2.filter("id between 18 and 19").collect()
    ) == [18, 19]
    with pytest.raises(HudiError, match="every file pruned"):
        read_hudi_pruned(spark, t, "id", 10**9, 10**9 + 1)


def test_unpartitioned_table(spark, tmp_path):
    t = str(tmp_path / "t")
    hudi_create(spark, _df(spark, 10), t, "id", n_file_groups=2)
    snap = read_hudi(spark, t)
    assert snap.count() == 10
    assert {r["_hoodie_partition_path"] for r in snap.collect()} == {""}
    base = [f for f in os.listdir(t) if f.endswith(".parquet")]
    assert len(base) == 2 and all(_BASE_RE.match(f) for f in base)
    hudi_upsert(
        spark, t,
        spark.createDataFrame(
            [(0, "u", 9.0, 0)],
            "id long, name string, price double, region int",
        ),
    )
    assert read_hudi(spark, t).filter("id=0").collect()[0]["name"] == "u"


def test_create_errors(spark, tmp_path, table):
    t, _ = table
    with pytest.raises(HudiError, match="already exists"):
        hudi_create(spark, _df(spark), t, "id")
    with pytest.raises(HudiError, match="record key"):
        hudi_create(spark, _df(spark), str(tmp_path / "x"), "nope")
    with pytest.raises(HudiError, match="not a hudi table"):
        read_hudi(spark, str(tmp_path / "missing"))


@pytest.mark.slow  # >=15 s (r15 tiering)
def test_random_sequence_matches_dict_replay(spark, tmp_path):
    """Seeded upsert/delete sequence vs a plain-dict oracle."""
    import random

    rnd = random.Random(11)
    t = str(tmp_path / "t")
    state = {i: float(i) for i in range(15)}
    hudi_create(
        spark,
        spark.createDataFrame(
            [(k, v, k % 2) for k, v in state.items()],
            "id long, price double, region int",
        ),
        t, "id", partition_field="region", n_file_groups=2,
    )
    for step in range(4):
        ids = rnd.sample(range(40), 6)
        if step % 2 == 0:
            rows = [(i, float(100 * step + i), i % 2) for i in ids]
            hudi_upsert(
                spark, t,
                spark.createDataFrame(
                    rows, "id long, price double, region int"
                ),
            )
            for i, p, _r in rows:
                state[i] = p
        else:
            hudi_delete(
                spark, t,
                spark.createDataFrame([(i,) for i in ids], "id long"),
            )
            for i in ids:
                state.pop(i, None)
    got = {
        r["id"]: r["price"]
        for r in read_hudi(spark, t, drop_meta=True).collect()
    }
    assert got == state


# ---- streaming source (streaming/hudi_source.py) ----------------------


def _drain(spark, t, starting, qname):
    from graph_db_clustering_spark.streaming.hudi_source import (
        HudiIncrementalDataSource,
    )

    spark.dataSource.register(HudiIncrementalDataSource)
    reader = spark.readStream.format("hudi_incremental").option("path", t)
    if starting is not None:
        reader = reader.option("startingInstant", starting)
    q = (
        reader.load()
        .writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(qname)


def test_stream_emits_upsert_batch(spark, table):
    t, i1 = table
    hudi_upsert(
        spark, t,
        spark.createDataFrame(
            [(0, "u", 99.0, 0), (100, "n", 1.0, 1)],
            "id long, name string, price double, region int",
        ),
    )
    got = sorted(
        (r["id"], r["price"])
        for r in _drain(spark, t, i1, "hudi_b1").select(
            "id", "price"
        ).collect()
    )
    assert got == [(0, 99.0), (100, 1.0)], got


def test_stream_delete_emits_nothing(spark, table):
    t, _ = table
    i2 = hudi_upsert(
        spark, t,
        spark.createDataFrame(
            [(0, "u", 99.0, 0)],
            "id long, name string, price double, region int",
        ),
    )
    hudi_delete(spark, t, spark.createDataFrame([(0,), (7,)], "id long"))
    assert _drain(spark, t, i2, "hudi_b2").count() == 0


def test_stream_noop_commit_emits_empty_batch(spark, table):
    """ADVICE r12 (medium): a delete that matches NOTHING still lands
    a commit with empty write stats; a micro-batch covering only that
    commit must emit an empty batch, not kill the query with
    HudiError('in-range commits wrote no base files'). The batch API
    keeps the loud error."""
    import pytest

    from graph_db_clustering_spark.sources.hudi import (
        HudiError,
        hudi_timeline,
        read_hudi_incremental,
    )

    t, _ = table
    i2 = hudi_upsert(
        spark, t,
        spark.createDataFrame(
            [(0, "u", 99.0, 0)],
            "id long, name string, price double, region int",
        ),
    )
    hudi_delete(spark, t, spark.createDataFrame([(555,)], "id long"))
    i3 = hudi_timeline(t)[-1]["instant"]
    assert i3 > i2  # the no-op delete DID land a commit
    assert _drain(spark, t, i2, "hudi_noop").count() == 0
    with pytest.raises(HudiError, match="wrote no base files"):
        read_hudi_incremental(spark, t, i2, i3).collect()


def test_stream_whole_range_matches_batch_incremental(spark, table):
    """A single micro-batch over (i1, latest] must equal
    read_hudi_incremental(i1): insert-then-deleted rows drop, carried
    survivors are excluded by their preserved commit time."""
    t, i1 = table
    hudi_upsert(
        spark, t,
        spark.createDataFrame(
            [(0, "u", 99.0, 0), (100, "n", 1.0, 1)],
            "id long, name string, price double, region int",
        ),
    )
    hudi_delete(spark, t, spark.createDataFrame([(100,)], "id long"))
    stream = sorted(
        (r["id"], r["price"])
        for r in _drain(spark, t, i1, "hudi_b3").select(
            "id", "price"
        ).collect()
    )
    batch = sorted(
        (r["id"], r["price"])
        for r in read_hudi_incremental(spark, t, i1).select(
            "id", "price"
        ).collect()
    )
    assert stream == batch == [(0, 99.0)], (stream, batch)


def test_stream_batch_spanning_cluster_no_duplicates(spark, table):
    # ADVICE r11 (medium): the streaming twin of the incremental
    # double-count — one micro-batch spanning upsert + replacecommit
    # must emit the updated row once.
    t, i1 = table
    hudi_upsert(
        spark, t,
        spark.createDataFrame(
            [(4, "u", 4.5, 1)],
            "id long, name string, price double, region int",
        ),
    )
    hudi_cluster(spark, t)
    got = [(r["id"], r["name"])
           for r in _drain(spark, t, i1, "hudi_b5").collect()]
    assert got == [(4, "u")], got


def test_stream_from_table_start_covers_bulk_insert(spark, table):
    t, _ = table
    assert _drain(spark, t, None, "hudi_b4").count() == 20


def test_partition_value_guards(spark, tmp_path):
    t = str(tmp_path / "t")
    bad = spark.createDataFrame(
        [(1, "a/b"), (2, "ok")], "id long, part string"
    )
    with pytest.raises(HudiError, match="hive-style"):
        hudi_create(spark, bad, t, "id", partition_field="part")
    nulls = spark.createDataFrame(
        [(1, None), (2, "ok")], "id long, part string"
    )
    with pytest.raises(HudiError, match="hive-style"):
        hudi_create(spark, nulls, t, "id", partition_field="part")


def test_restore_and_logcompaction_actions(spark, table):
    t, _ = table
    # restore is visibility-neutral (files are physically gone)
    open(os.path.join(t, ".hoodie", "20991231000000002.restore"),
         "w").close()
    assert read_hudi(spark, t).count() == 20
    # round 13: a completed LOG compaction instant is accepted (its
    # merged log files order at max(COMPACTED_BLOCK_TIMES) on MoR);
    # on a CoW table with no log files it is visibility-neutral
    lc = os.path.join(t, ".hoodie", "20991231000000003.logcompaction")
    open(lc, "w").close()
    assert read_hudi(spark, t).count() == 20
    os.remove(lc)
    # a completed '.compaction' file is NOT a real Hudi artifact
    # (full compaction completes as a plain 'commit') — still loud
    comp = os.path.join(t, ".hoodie", "20991231000000004.compaction")
    open(comp, "w").close()
    with pytest.raises(NotImplementedError, match="compaction"):
        read_hudi(spark, t)


# ---- maintenance: clean / rollback -------------------------------------


def test_clean_retains_latest_slices(spark, table):
    from graph_db_clustering_spark.sources.hudi import (
        hudi_clean,
        hudi_rollback,
    )

    t, i1 = table
    i2 = hudi_upsert(
        spark, t,
        spark.createDataFrame(
            [(0, "u", 9.0, 0)],
            "id long, name string, price double, region int",
        ),
    )
    before = len(hudi_live_files(t))
    deleted = hudi_clean(t, retain_slices=1)
    # the touched group's i1 slice is superseded -> exactly 1 deletion
    assert len(deleted) == 1 and f"_{i1}.parquet" in deleted[0]
    assert len(hudi_live_files(t)) == before
    snap = read_hudi(spark, t)
    assert snap.count() == 20
    assert snap.filter("id = 0").collect()[0]["name"] == "u"
    # incremental over the retained window still works
    assert read_hudi_incremental(spark, t, i1).count() == 1
    assert any(e["action"] == "clean" for e in hudi_timeline(t))
    # rollback of i2 restores... but its old slice was CLEANED: the
    # rollback path itself must still be exercised on a fresh commit
    i3 = hudi_upsert(
        spark, t,
        spark.createDataFrame(
            [(1, "z", 8.0, 1)],
            "id long, name string, price double, region int",
        ),
    )
    rolled = hudi_rollback(t)
    assert rolled == i3
    snap2 = read_hudi(spark, t)
    assert snap2.filter("id = 1").collect()[0]["name"] == "n1"
    assert snap2.count() == 20


def test_rollback_guards(spark, table):
    from graph_db_clustering_spark.sources.hudi import (
        hudi_clean,
        hudi_rollback,
    )

    t, _ = table
    with pytest.raises(HudiError, match="only commit"):
        hudi_rollback(t)
    hudi_cluster(spark, t)
    with pytest.raises(NotImplementedError, match="replacecommit"):
        hudi_rollback(t)
    with pytest.raises(HudiError, match="retain at least one"):
        hudi_clean(t, retain_slices=0)


def test_incremental_raises_when_range_cleaned(spark, table):
    """A cleaned slice with no later in-range successor must RAISE,
    not silently drop changes (Hudi's incremental-beyond-retained
    contract)."""
    from graph_db_clustering_spark.sources.hudi import hudi_clean

    t, i1 = table
    i2 = hudi_upsert(
        spark, t,
        spark.createDataFrame(
            [(0, "u", 9.0, 0)],
            "id long, name string, price double, region int",
        ),
    )
    i3 = hudi_upsert(
        spark, t,
        spark.createDataFrame(
            [(0, "v", 10.0, 0)],
            "id long, name string, price double, region int",
        ),
    )
    hudi_clean(t, retain_slices=1)  # i2's slice of the group is gone
    # full range: i3's slice covers i2's rows -> fine
    assert read_hudi_incremental(spark, t, i1).count() == 1
    # but (i1, i2] needs the cleaned slice -> loud error
    with pytest.raises(HudiError, match="cleaned"):
        read_hudi_incremental(spark, t, i1, i2)


def test_rollback_raises_after_clean(spark, table):
    """Rolling back a commit whose predecessor slices were cleaned
    would leave the group with no slice — gate loudly."""
    from graph_db_clustering_spark.sources.hudi import (
        hudi_clean,
        hudi_rollback,
    )

    t, _ = table
    hudi_upsert(
        spark, t,
        spark.createDataFrame(
            [(0, "u", 9.0, 0)],
            "id long, name string, price double, region int",
        ),
    )
    hudi_clean(t, retain_slices=1)
    with pytest.raises(HudiError, match="no older slice"):
        hudi_rollback(t)


def test_savepoint_protects_clean_and_restore(spark, table):
    from graph_db_clustering_spark.sources.hudi import (
        hudi_clean,
        hudi_restore,
        hudi_savepoint,
    )

    t, i1 = table
    hudi_savepoint(t, i1)
    i2 = hudi_upsert(
        spark, t,
        spark.createDataFrame(
            [(0, "u", 9.0, 0), (100, "n", 1.0, 1)],
            "id long, name string, price double, region int",
        ),
    )
    i3 = hudi_delete(spark, t, spark.createDataFrame([(4,)], "id long"))
    deleted = hudi_clean(t, retain_slices=1)
    # the savepointed i1 slices survive even where superseded twice
    assert read_hudi(spark, t, as_of=i1).count() == 20
    assert all(f"_{i1}." not in d for d in deleted)
    # restore: i2/i3 files + timeline gone, snapshot == savepoint state
    removed = hudi_restore(t)
    assert removed
    snap = read_hudi(spark, t)
    assert snap.count() == 20
    assert snap.filter("id = 0").collect()[0]["name"] == "n0"
    assert {e["instant"] for e in hudi_timeline(t)
            if e["action"] == "commit"} == {i1}
    assert any(e["action"] == "restore" for e in hudi_timeline(t))
    # and the table keeps working after restore
    hudi_upsert(
        spark, t,
        spark.createDataFrame(
            [(7, "x", 1.0, 1)],
            "id long, name string, price double, region int",
        ),
    )
    assert read_hudi(spark, t).filter("id = 7").collect()[0]["name"] == "x"


def test_savepoint_and_restore_guards(spark, table):
    from graph_db_clustering_spark.sources.hudi import (
        hudi_restore,
        hudi_savepoint,
    )

    t, _ = table
    with pytest.raises(HudiError, match="not a completed commit"):
        hudi_savepoint(t, "29990101000000000")
    with pytest.raises(HudiError, match="needs a savepoint"):
        hudi_restore(t)
