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
    # multi-part checkpoint with a MISSING part raises loudly —
    # a partial read would silently drop live files
    table4 = str(tmp_path / "bad4")
    _write_commit(table4, 0, [_add("a.parquet")])
    with open(os.path.join(table4, "_delta_log", "_last_checkpoint"), "w") as f:
        json.dump({"version": 0, "size": 2, "parts": 2}, f)
    with pytest.raises(DeltaError, match="part 1/2 missing"):
        delta_live_files(table4)


def test_delta_version_beyond_latest_raises_with_checkpoint(spark, tmp_path):
    """ADVICE r8 (medium): with a checkpoint present, asking for a
    version beyond the latest must raise, not silently return the
    latest state."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table, _parts = _make_table(spark, tmp_path)
    pq.write_table(
        pa.Table.from_pylist([{"add": {"path": "a.parquet"}, "remove": None}]),
        os.path.join(table, "_delta_log", f"{1:020d}.checkpoint.parquet"),
    )
    with open(os.path.join(table, "_delta_log", "_last_checkpoint"), "w") as f:
        json.dump({"version": 1, "size": 1}, f)
    with pytest.raises(DeltaError, match="version 7 beyond latest 1"):
        delta_live_files(table, 7)


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


def test_delta_partitioned_write_read_and_prune(spark, tmp_path):
    """Round 9: partitioned tables. The writer lays files out
    hive-style with partitionValues in the add actions and the
    partition column REMOVED from the data files (per the spec); the
    reader injects it back as a typed literal, and read_delta_pruned
    prunes on the partition value itself."""
    from graph_db_clustering_spark.sources.delta import (
        delta_append,
        delta_file_stats,
        read_delta_pruned,
    )

    o = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    table = str(tmp_path / "pt")
    delta_append(
        spark,
        o.repartition(2),
        table,
        stats_cols=["o_totalprice"],
        partition_by=["o_orderpriority"],
    )
    # data files must NOT contain the partition column
    stats = delta_file_stats(table)
    assert all(s["partitionValues"].get("o_orderpriority") for s in stats)
    back = read_delta(spark, table)
    assert back.schema["o_orderpriority"].dataType.simpleString() == "string"
    assert back.count() == o.count()
    assert back.exceptAll(o).count() == 0 and o.exceptAll(back).count() == 0
    # partition-value pruning: only the 1-URGENT files are read
    df, nread, nskip = read_delta_pruned(
        spark, table, "o_orderpriority", "1-URGENT", "1-URGENT"
    )
    n_parts = o.select("o_orderpriority").distinct().count()
    assert nread < nread + nskip and nread + nskip == len(stats)
    assert df.select("o_orderpriority").distinct().count() == 1
    want = o.filter(F.col("o_orderpriority") == "1-URGENT")
    assert df.count() == want.count()
    # stats pruning still composes within partitions (wide range keeps all)
    df2, nread2, _ = read_delta_pruned(spark, table, "o_totalprice", 0.0, 1e12)
    assert nread2 == len(stats) and df2.count() == o.count()
    # a range below every file's min prunes everything -> loud error
    with pytest.raises(DeltaError, match="no live files"):
        read_delta_pruned(spark, table, "o_totalprice", 0.0, 1.0)
    assert n_parts >= 2


def test_delta_checkpoint_carries_stats_and_append_version(spark, tmp_path):
    """ADVICE r8 (high + medium): after log retention cleans the JSON
    commits behind a checkpoint, (1) delta_file_stats must still see
    the checkpoint-only files' stats so read_delta_pruned keeps ALL
    live rows, and (2) delta_append must continue the version sequence
    from the checkpoint, never restart at 0."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from graph_db_clustering_spark.sources.delta import (
        delta_append,
        delta_file_stats,
        read_delta,
        read_delta_pruned,
    )

    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    table = str(tmp_path / "cp")
    delta_append(spark, li.filter(F.col("l_quantity") < 10).repartition(1),
                 table, stats_cols=["l_quantity"])
    delta_append(spark, li.filter((F.col("l_quantity") >= 10) & (F.col("l_quantity") < 25)).repartition(1),
                 table, stats_cols=["l_quantity"])
    # build a checkpoint at version 1 from the add actions themselves
    rows = []
    log = os.path.join(table, "_delta_log")
    for v in (0, 1):
        with open(os.path.join(log, f"{v:020d}.json")) as f:
            for line in f:
                act = json.loads(line)
                if "add" in act:
                    # pyarrow can't write an empty struct; a real
                    # checkpoint stores partitionValues as a map —
                    # dropping the empty dict is equivalent here
                    add = {k: v for k, v in act["add"].items()
                           if k != "partitionValues"}
                    rows.append({"add": add, "remove": None})
    pq.write_table(pa.Table.from_pylist(rows),
                   os.path.join(log, f"{1:020d}.checkpoint.parquet"))
    with open(os.path.join(log, "_last_checkpoint"), "w") as f:
        json.dump({"version": 1, "size": len(rows)}, f)
    # retention: expire the JSON commits covered by the checkpoint
    os.remove(os.path.join(log, f"{0:020d}.json"))
    os.remove(os.path.join(log, f"{1:020d}.json"))
    # one live JSON commit after the checkpoint
    v2 = delta_append(spark, li.filter(F.col("l_quantity") >= 40).repartition(1),
                      table, stats_cols=["l_quantity"])
    assert v2 == 2  # NOT 0: version continues from the checkpoint
    want = li.filter((F.col("l_quantity") < 25) | (F.col("l_quantity") >= 40))
    got = read_delta(spark, table)
    assert got.count() == want.count()
    # stats rows exist for the checkpoint-only files too
    stats = delta_file_stats(table)
    assert len(stats) == 3 and all(s["minValues"] for s in stats)
    # pruned read over [1, 5] keeps the <10 file, skips the other two,
    # and crucially does NOT silently drop the checkpoint-only files
    df, nread, nskip = read_delta_pruned(spark, table, "l_quantity", 1, 5)
    assert (nread, nskip) == (1, 2)
    assert df.count() == li.filter(F.col("l_quantity") < 10).count()
    # a pruned read whose range spans everything reads all three
    _, nread_all, nskip_all = read_delta_pruned(spark, table, "l_quantity", 0, 100)
    assert (nread_all, nskip_all) == (3, 0)


def test_delta_pruned_typed_partition_values(spark, tmp_path):
    """ADVICE r9: log partitionValues are strings; pruning must compare
    them TYPED. The trap: value '10' vs range 3..11 is lexicographically
    disjoint ('10' < '3') — an untyped compare silently DROPS the
    partition's rows; a numeric-bound compare on raw strings never
    prunes at all (TypeError keep-path)."""
    from graph_db_clustering_spark.sources.delta import (
        delta_append,
        delta_file_stats,
        read_delta_pruned,
    )

    # integer partition column with values whose string forms sort
    # differently than their numeric forms would need: include 10
    src = (
        load_table(spark, SF, "lineitem")
        .select("l_orderkey", "l_quantity", "l_linenumber")
        .withColumn(
            "bucket",
            F.when(F.col("l_linenumber") <= 2, F.col("l_linenumber") * 2)
            .otherwise(F.lit(10)),
        )
    )
    table = str(tmp_path / "ipt")
    delta_append(spark, src, table, partition_by=["bucket"])
    stats = delta_file_stats(table)
    pv = {s["partitionValues"]["bucket"] for s in stats}
    assert "10" in pv and "2" in pv  # string-typed in the log, per spec
    # numeric range [3, 11]: partition 10 MUST be kept (lexicographic
    # '10' < '3' would drop it), partition 2 skipped
    df, nread, nskip = read_delta_pruned(spark, table, "bucket", 3, 11)
    assert nskip > 0  # typed compare actually fires on numeric bounds
    want = src.filter(F.col("bucket").between(3, 11))
    assert df.filter(F.col("bucket").between(3, 11)).count() == want.count()
    assert want.filter(F.col("bucket") == 10).count() > 0
    # exact numeric point read on the trap value
    df10, nread10, nskip10 = read_delta_pruned(spark, table, "bucket", 10, 10)
    assert nskip10 >= 2
    assert df10.count() == src.filter(F.col("bucket") == 10).count()


def test_delta_partitioned_column_order_matches_schema(spark, tmp_path):
    """ADVICE r9: injected partition columns must come back in the
    metaData schemaString position (here: the MIDDLE column), not
    appended last — positional consumers see one schema regardless of
    partitioning."""
    from graph_db_clustering_spark.sources.delta import delta_append

    o = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    table = str(tmp_path / "ord")
    delta_append(spark, o, table, partition_by=["o_orderpriority"])
    back = read_delta(spark, table)
    assert back.columns == ["o_orderkey", "o_orderpriority", "o_totalprice"]
    assert back.exceptAll(o).count() == 0 and o.exceptAll(back).count() == 0


def test_roaring_codec_roundtrip_and_run_containers():
    """functions/roaring: portable RoaringBitmapArray round-trips
    across container types and 32-bit bucket boundaries; the decoder
    also accepts the run-container form real engines emit (hand-built
    cookie-12347 stream); the DV file wrapper checksums."""
    import random
    import struct

    from graph_db_clustering_spark.functions.roaring import (
        RoaringError,
        decode_rbm_array,
        encode_rbm_array,
        pack_dv_file,
        unpack_dv_blob,
    )

    random.seed(7)
    cases = [
        [], [0], [1, 2, 3], list(range(5000)),      # array->bitmap edge
        list(range(0, 200000, 3)),                   # multi-container
        [2**32, 2**32 + 1, 2**33 + 77, 5],           # multi-bucket
        sorted(random.sample(range(2**20), 10000)),
        [2**40 + i for i in range(100)],
    ]
    for vals in cases:
        assert decode_rbm_array(encode_rbm_array(vals)) == sorted(set(vals))
    blobs = [encode_rbm_array([1, 5, 9]), encode_rbm_array(range(10000))]
    data, offs = pack_dv_file(blobs)
    for b, o in zip(blobs, offs):
        assert unpack_dv_blob(data, o, len(b)) == b
    # corrupt one payload byte -> checksum failure, loud
    bad = bytearray(data)
    bad[offs[0] + 4] ^= 0xFF
    with pytest.raises(RoaringError, match="checksum"):
        unpack_dv_blob(bytes(bad), offs[0], len(blobs[0]))
    # run-container decode (cookie 12347, 2 runs)
    rb = struct.pack("<i", (0 << 16) | 12347) + b"\x01"
    rb += struct.pack("<HH", 0, 9)
    rb += struct.pack("<H", 2)
    rb += struct.pack("<HH", 3, 4) + struct.pack("<HH", 100, 4)
    arr = struct.pack("<iqi", 1681511377, 1, 0) + rb
    assert decode_rbm_array(arr) == [3, 4, 5, 6, 7, 100, 101, 102, 103, 104]


@pytest.mark.slow  # >=10 s (r15 tiering)
def test_delta_deletion_vectors_lifecycle(spark, tmp_path):
    """Round 10: DVs end to end — write, merged re-delete, time travel,
    checkpoint survival after JSON retention, pruned reads, and
    OPTIMIZE folding the DV into the compacted file."""
    import glob as g

    from graph_db_clustering_spark.sources.delta import (
        delta_add_deletion_vectors,
        delta_checkpoint,
        delta_compact,
        delta_live_files,
        read_delta_pruned,
    )

    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    t = str(tmp_path / "dvt")
    from graph_db_clustering_spark.sources.delta import delta_append

    delta_append(
        spark, li, t, stats_cols=["l_quantity"],
        partition_by=["l_returnflag"],
    )

    def _positions(pred):
        files = delta_live_files(t)
        return (
            spark.read.parquet(*[os.path.join(t, p) for p in files])
            .select(
                F.col("_metadata.file_path").alias("file_path"),
                F.col("_metadata.row_index").alias("pos"),
                "l_quantity",
            )
            .filter(pred)
            .select("file_path", "pos")
        )

    v = delta_add_deletion_vectors(
        spark, t, _positions(F.col("l_quantity") >= 45)
    )
    assert v == 1
    want45 = li.filter(F.col("l_quantity") < 45)
    assert read_delta(spark, t).count() == want45.count()
    assert read_delta(spark, t).exceptAll(want45).count() == 0
    # version 0 still time-travels to the undeleted table
    assert read_delta(spark, t, version=0).count() == li.count()
    # second DV commit MERGES with the existing bitmaps (idempotent)
    delta_add_deletion_vectors(
        spark, t, _positions(F.col("l_quantity") >= 40)
    )
    want40 = li.filter(F.col("l_quantity") < 40)
    got = read_delta(spark, t)
    assert got.count() == want40.count()
    assert got.exceptAll(want40).count() == 0
    # checkpoint carries the descriptors; expire the JSON commits
    delta_checkpoint(t)
    for j in sorted(g.glob(os.path.join(t, "_delta_log", "*.json"))):
        os.remove(j)
    assert read_delta(spark, t).count() == want40.count()
    # partition-pruned read still applies DVs
    df, _nr, ns = read_delta_pruned(spark, t, "l_returnflag", "R", "R")
    assert ns > 0
    assert df.count() == want40.filter(F.col("l_returnflag") == "R").count()
    # OPTIMIZE folds DVs into the rewrite instead of resurrecting rows
    delta_compact(spark, t, stats_cols=["l_quantity"])
    after = read_delta(spark, t)
    assert after.count() == want40.count()
    assert after.exceptAll(want40).count() == 0


def test_z85_codec_spec_vectors():
    """Round 11 (ADVICE r10): Delta descriptors use the Z85 alphabet
    (ZeroMQ spec 32 / delta-io Base85Codec), NOT RFC 1924 b85. Pin the
    two public spec test vectors — they are independent of this repo's
    implementation — plus the Delta-style unaligned pad/truncate path
    and the divergence from base64.b85encode."""
    import base64

    from graph_db_clustering_spark.functions.z85 import (
        z85_decode,
        z85_encode,
    )

    # ZeroMQ RFC 32 "HelloWorld" vector
    hw = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert z85_encode(hw) == "HelloWorld"
    assert z85_decode("HelloWorld") == hw
    # ZeroMQ RFC 32 CURVE key vector (exercises the symbol tail)
    key = bytes([
        0x8E, 0x0B, 0xDD, 0x69, 0x76, 0x28, 0xB9, 0x1D,
        0x8F, 0x24, 0x55, 0x87, 0xEE, 0x95, 0xC5, 0xB0,
        0x4D, 0x48, 0x96, 0x3F, 0x79, 0x25, 0x98, 0x77,
        0xB4, 0x9C, 0xD9, 0x06, 0x3A, 0xEA, 0xD3, 0xB7,
    ])
    assert z85_encode(key) == "JTKVSB%%)wK0E.X)V>+}o?pNmC{O&4W4b!Ni{Lh6"
    assert z85_decode(z85_encode(key), 32) == key
    # same input, different alphabet: a b85-decoded Z85 string is wrong
    assert base64.b85encode(hw).decode() != "HelloWorld"
    # Delta Base85Codec pads unaligned input with zeros and truncates
    # on decode via the declared output length
    raw = b"\x01\x02\x03\x04\x05"
    enc = z85_encode(raw)
    assert len(enc) == 10  # padded to 8 bytes -> 2 frames
    assert z85_decode(enc, 5) == raw
    import uuid

    u = uuid.UUID("00000000-0000-0000-0000-000000000000")
    assert z85_encode(u.bytes) == "0" * 20  # all-zero frames
    with pytest.raises(ValueError):
        z85_decode("abc")  # not a multiple of 5
    with pytest.raises(ValueError):
        z85_decode("#####")  # frame > 2^32-1
    with pytest.raises(ValueError):
        z85_decode("ab~de")  # '~' not in the Z85 alphabet


def test_delta_dv_inline_and_protocol_gates(spark, tmp_path):
    """Inline ('i') DV descriptors decode from Z85; v3 protocols
    with unknown reader features, or v3 missing the feature list,
    still gate loudly."""
    from graph_db_clustering_spark.functions.roaring import (
        encode_rbm_array,
    )
    from graph_db_clustering_spark.functions.z85 import z85_encode

    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity"
    ).limit(50)
    rows = li.collect()
    t = str(tmp_path / "inl")
    stage = str(tmp_path / "inl_stage")
    li.coalesce(1).write.parquet(stage)
    part = [p for p in os.listdir(stage) if p.endswith(".parquet")][0]
    os.makedirs(t)
    os.replace(os.path.join(stage, part), os.path.join(t, "a.parquet"))
    blob = encode_rbm_array([0, 1, 2])  # delete the first 3 rows
    _write_commit(t, 0, [
        {"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": ["deletionVectors"],
        }},
        {"metaData": {"id": "x", "partitionColumns": []}},
        {"add": {
            "path": "a.parquet", "dataChange": True,
            "partitionValues": {},
            "deletionVector": {
                "storageType": "i",
                "pathOrInlineDv": z85_encode(blob),
                "sizeInBytes": len(blob), "cardinality": 3,
            },
        }},
    ])
    got = read_delta(spark, t)
    assert got.count() == len(rows) - 3
    # unknown v3 feature -> loud gate (columnMapping/DVs/timestampNtz/
    # v2Checkpoint are implemented; typeWidening is not)
    t2 = str(tmp_path / "feat")
    _write_commit(t2, 0, [{"protocol": {
        "minReaderVersion": 3, "readerFeatures": ["typeWidening"],
    }}])
    with pytest.raises(NotImplementedError, match="typeWidening"):
        delta_live_files(t2)


def test_delta_multipart_checkpoint_reads(spark, tmp_path):
    """Round 10: a multi-part checkpoint (NNN.checkpoint.<i>.<n>.parquet)
    concatenates into the same replay — adds split across parts, stats
    intact, later JSON commits still apply; a missing middle part
    raises."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from graph_db_clustering_spark.sources.delta import (
        delta_append,
        delta_checkpoint,
        delta_file_stats,
        read_delta_pruned,
    )

    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    table = str(tmp_path / "mp")
    delta_append(spark, li.filter(F.col("l_quantity") < 20).repartition(1),
                 table, stats_cols=["l_quantity"])
    delta_append(spark, li.filter(F.col("l_quantity") >= 20).repartition(1),
                 table, stats_cols=["l_quantity"])
    # build a single-part checkpoint, then SPLIT its rows into 2 parts
    v = delta_checkpoint(table)
    log = os.path.join(table, "_delta_log")
    single = os.path.join(log, f"{v:020d}.checkpoint.parquet")
    t = pq.read_table(single)
    os.remove(single)
    half = max(1, t.num_rows // 2)
    pq.write_table(t.slice(0, half),
                   os.path.join(log, f"{v:020d}.checkpoint.{1:010d}.{2:010d}.parquet"))
    pq.write_table(t.slice(half),
                   os.path.join(log, f"{v:020d}.checkpoint.{2:010d}.{2:010d}.parquet"))
    with open(os.path.join(log, "_last_checkpoint"), "w") as f:
        json.dump({"version": v, "size": t.num_rows, "parts": 2}, f)
    # expire the JSON commits: the multi-part checkpoint is the state
    for j in [n for n in os.listdir(log) if n.endswith(".json") and n[0].isdigit()]:
        os.remove(os.path.join(log, j))
    back = read_delta(spark, table)
    assert back.count() == li.count()
    assert back.exceptAll(li).count() == 0
    # stats survived the split: skipping still fires
    stats = delta_file_stats(table)
    assert len(stats) == 2 and all(s["minValues"] for s in stats)
    _df, nread, nskip = read_delta_pruned(spark, table, "l_quantity", 1, 5)
    assert (nread, nskip) == (1, 1)
    # a LATER JSON commit still applies on top of the checkpoint
    delta_append(spark, li.limit(7), table)
    assert read_delta(spark, table).count() == li.count() + 7
    # missing middle part: loud
    os.remove(os.path.join(log, f"{v:020d}.checkpoint.{2:010d}.{2:010d}.parquet"))
    with pytest.raises(DeltaError, match="part 2/2 missing"):
        read_delta(spark, table)


def test_delta_column_mapping(spark, tmp_path):
    """Round 10: column mapping (reader protocol 2) — data files store
    PHYSICAL names (col-<uuid>), partitionValues and stats key by them,
    and the reader renames back to the schemaString's logical names,
    injects partition columns logically, prunes on logical bounds, and
    keeps the mapping alive through a checkpoint after JSON retention."""
    import glob as g

    from graph_db_clustering_spark.sources.delta import (
        delta_checkpoint,
        read_delta_pruned,
    )

    li = load_table(spark, SF, "lineitem").select(
        F.col("l_orderkey").alias("col-aaa111"),
        F.col("l_quantity").alias("col-bbb222"),
        F.col("l_returnflag").alias("col-ccc333"),
    )
    t = str(tmp_path / "cm")
    os.makedirs(t)
    # hive-style physical layout, partitioned by the flag column
    flags = [r[0] for r in li.select("col-ccc333").distinct().collect()]
    adds = []
    for flag in sorted(flags):
        stage = str(tmp_path / f"cm_stage_{flag}")
        li.filter(F.col("col-ccc333") == flag).drop("col-ccc333") \
          .coalesce(1).write.parquet(stage)
        part = [p for p in os.listdir(stage) if p.endswith(".parquet")][0]
        rel = f"f={flag}/{part}"
        os.makedirs(os.path.join(t, f"f={flag}"))
        os.replace(os.path.join(stage, part), os.path.join(t, *rel.split("/")))
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
            "id": "cm", "schemaString": json.dumps(schema),
            "partitionColumns": ["l_returnflag"],
            "configuration": {"delta.columnMapping.mode": "name",
                              "delta.columnMapping.maxColumnId": "3"},
        }},
    ] + adds)
    back = read_delta(spark, t)
    assert back.columns == ["l_orderkey", "l_quantity", "l_returnflag"]
    want = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    assert back.count() == want.count()
    assert back.exceptAll(want).count() == 0
    # pruning on the LOGICAL partition column
    df, nread, nskip = read_delta_pruned(spark, t, "l_returnflag", "R", "R")
    assert nskip > 0
    assert df.count() == want.filter(F.col("l_returnflag") == "R").count()
    # mapping survives checkpoint + JSON retention (configuration row)
    delta_checkpoint(t)
    for j in sorted(g.glob(os.path.join(t, "_delta_log", "*.json"))):
        os.remove(j)
    back2 = read_delta(spark, t)
    assert back2.columns == ["l_orderkey", "l_quantity", "l_returnflag"]
    assert back2.count() == want.count()


def test_delta_v2_checkpoint_with_sidecars(spark, tmp_path):
    """Round 10: V2 checkpoints — a UUID-named top-level file whose
    add/remove actions live in _delta_log/_sidecars/ parquet files
    (`sidecar` actions point at them), protocol v3 + v2Checkpoint.
    Reads must resolve the sidecars after JSON retention; a missing
    sidecar raises. A JSON-format top-level file works too."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from graph_db_clustering_spark.sources.delta import delta_append

    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    table = str(tmp_path / "v2cp")
    delta_append(spark, li.filter(F.col("l_quantity") < 20).repartition(1),
                 table, stats_cols=["l_quantity"])
    delta_append(spark, li.filter(F.col("l_quantity") >= 20).repartition(1),
                 table, stats_cols=["l_quantity"])
    log = os.path.join(table, "_delta_log")

    # harvest the adds from the JSON commits, split them into 2 sidecars
    adds = []
    meta_act = proto_act = None
    for vf in sorted(p for p in os.listdir(log) if p.endswith(".json")):
        with open(os.path.join(log, vf)) as f:
            for line in f:
                act = json.loads(line)
                if act.get("add"):
                    adds.append(act["add"])
                if act.get("metaData"):
                    meta_act = act["metaData"]
                if act.get("protocol"):
                    proto_act = act["protocol"]
    assert len(adds) == 2 and meta_act is not None
    os.makedirs(os.path.join(log, "_sidecars"))
    add_t = pa.struct([
        ("path", pa.string()), ("size", pa.int64()),
        ("dataChange", pa.bool_()), ("stats", pa.string()),
    ])
    for i, a in enumerate(adds):
        pq.write_table(
            pa.table({"add": pa.array([{
                "path": a["path"], "size": a.get("size"),
                "dataChange": False, "stats": a.get("stats"),
            }], type=add_t)}),
            os.path.join(log, "_sidecars", f"sc-{i}.parquet"),
        )
    top_t = {
        "checkpointMetadata": pa.array(
            [{"version": 1}, None, None, None],
            type=pa.struct([("version", pa.int64())])),
        "protocol": pa.array(
            [None, {"minReaderVersion": 3, "minWriterVersion": 7,
                    "readerFeatures": ["v2Checkpoint"],
                    "writerFeatures": ["v2Checkpoint"]}, None, None],
            type=pa.struct([
                ("minReaderVersion", pa.int32()),
                ("minWriterVersion", pa.int32()),
                ("readerFeatures", pa.list_(pa.string())),
                ("writerFeatures", pa.list_(pa.string())),
            ])),
        "metaData": pa.array(
            [None, None, {
                "id": meta_act.get("id"),
                "schemaString": meta_act.get("schemaString"),
                "partitionColumns": [],
            }, None],
            type=pa.struct([
                ("id", pa.string()), ("schemaString", pa.string()),
                ("partitionColumns", pa.list_(pa.string())),
            ])),
        "sidecar": pa.array(
            [None, None, None, {"path": "sc-0.parquet",
                                "sizeInBytes": 1}],
            type=pa.struct([
                ("path", pa.string()), ("sizeInBytes", pa.int64()),
            ])),
    }
    # second sidecar row via a second record
    top = pa.table(top_t)
    extra = pa.table({
        "checkpointMetadata": pa.array([None], top_t["checkpointMetadata"].type),
        "protocol": pa.array([None], top_t["protocol"].type),
        "metaData": pa.array([None], top_t["metaData"].type),
        "sidecar": pa.array([{"path": "sc-1.parquet", "sizeInBytes": 1}],
                            top_t["sidecar"].type),
    })
    top = pa.concat_tables([top, extra])
    pq.write_table(top, os.path.join(
        log, f"{1:020d}.checkpoint.80a083e8-7026-4e79-81be-64bd76c43a11.parquet"
    ))
    with open(os.path.join(log, "_last_checkpoint"), "w") as f:
        json.dump({"version": 1, "size": top.num_rows}, f)
    for vf in [p for p in os.listdir(log) if p.endswith(".json") and p[0].isdigit()]:
        os.remove(os.path.join(log, vf))

    back = read_delta(spark, table)
    assert back.count() == li.count()
    assert back.exceptAll(li).count() == 0
    # stats survived through the sidecars
    from graph_db_clustering_spark.sources.delta import read_delta_pruned

    _df, nread, nskip = read_delta_pruned(spark, table, "l_quantity", 1, 5)
    assert (nread, nskip) == (1, 1)
    # a LATER JSON commit still applies
    delta_append(spark, li.limit(5), table)
    assert read_delta(spark, table).count() == li.count() + 5
    # missing sidecar: loud
    os.remove(os.path.join(log, "_sidecars", "sc-1.parquet"))
    with pytest.raises(DeltaError, match="sidecar missing"):
        read_delta(spark, table)


def test_delta_v2_checkpoint_json_toplevel(spark, tmp_path):
    """V2 checkpoints may write the TOP-LEVEL file as ndjson; the adds
    ride inline (no sidecars) in this variant."""
    from graph_db_clustering_spark.sources.delta import delta_append

    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    table = str(tmp_path / "v2j")
    delta_append(spark, li.repartition(1), table)
    log = os.path.join(table, "_delta_log")
    acts = []
    for vf in sorted(p for p in os.listdir(log) if p.endswith(".json")):
        with open(os.path.join(log, vf)) as f:
            acts.extend(json.loads(ln) for ln in f if ln.strip())
    with open(os.path.join(
        log, f"{0:020d}.checkpoint.11111111-2222-3333-4444-555555555555.json"
    ), "w") as f:
        f.write(json.dumps({"checkpointMetadata": {"version": 0}}) + "\n")
        for a in acts:
            f.write(json.dumps(a) + "\n")
    with open(os.path.join(log, "_last_checkpoint"), "w") as f:
        json.dump({"version": 0, "size": len(acts) + 1}, f)
    os.remove(os.path.join(log, f"{0:020d}.json"))
    back = read_delta(spark, table)
    assert back.count() == li.count()


def test_delta_checkpoint_preserves_declared_protocol(spark, tmp_path):
    """Round 11 (ADVICE r10): delta_checkpoint writes through the
    table's REPLAYED protocol action instead of recomputing one from
    DV/CM presence — a 3/7 + timestampNtz declaration must survive
    JSON-commit expiry, and a DV table's checkpoint must keep extra
    declared features alongside deletionVectors."""
    import glob as g

    from graph_db_clustering_spark.sources.delta import (
        _checkpoint_rows,
        _last_checkpoint,
        delta_append,
        delta_checkpoint,
    )

    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity").limit(30)
    t = str(tmp_path / "proto_t")
    delta_append(spark, li, t)
    # writer-declared protocol: 3/7 with timestampNtz (accepted by
    # _READER_FEATURES, but NOT derivable from DV/CM presence)
    decl = {
        "minReaderVersion": 3, "minWriterVersion": 7,
        "readerFeatures": ["timestampNtz"],
        "writerFeatures": ["timestampNtz"],
    }
    _write_commit(t, 1, [{"protocol": decl}])
    v = delta_checkpoint(t)
    for j in sorted(g.glob(os.path.join(t, "_delta_log", "*.json"))):
        if not j.endswith("_last_checkpoint"):
            os.remove(j)
    got = [
        r["protocol"] for r in _checkpoint_rows(t, _last_checkpoint(t))
        if r.get("protocol") and r["protocol"].get("minReaderVersion")
    ]
    assert got == [decl]
    assert read_delta(spark, t).count() == 30
    # and a feature-bearing protocol still checkpoint-replays: second
    # checkpoint built ON TOP of the first keeps the declaration
    v2 = delta_checkpoint(t)
    assert v2 == v
    got2 = [
        r["protocol"] for r in _checkpoint_rows(t, _last_checkpoint(t))
        if r.get("protocol") and r["protocol"].get("minReaderVersion")
    ]
    assert got2 == [decl]


def test_timestamp_time_travel(spark, tmp_path):
    """TIMESTAMP AS OF: log-file mtime rule with inCommitTimestamp
    precedence (sources/delta.delta_version_at_timestamp)."""
    import os

    from graph_db_clustering_spark.sources.delta import (
        DeltaError,
        delta_append,
        delta_version_at_timestamp,
        read_delta_at_timestamp,
    )

    t = str(tmp_path / "t")
    for k in range(3):
        delta_append(
            spark,
            spark.createDataFrame([(k, k * 10)], "v int, x int"),
            t,
        )
    log = os.path.join(t, "_delta_log")
    for v, ts in ((0, 1000.0), (1, 2000.0), (2, 3000.0)):
        os.utime(os.path.join(log, f"{v:020d}.json"), (ts, ts))
    assert delta_version_at_timestamp(t, 1000.0) == 0
    assert delta_version_at_timestamp(t, 2999.0) == 1
    assert delta_version_at_timestamp(t, 10_000.0) == 2
    assert read_delta_at_timestamp(spark, t, 2500.0).count() == 2
    with pytest.raises(DeltaError, match="predates"):
        delta_version_at_timestamp(t, 10.0)
    # inCommitTimestamp beats the file mtime when present
    # commitInfo appended LAST: position is conventional, not mandated
    f = os.path.join(log, f"{1:020d}.json")
    body = open(f).read()
    with open(f, "w") as fh:
        fh.write(
            body.rstrip("\n")
            + '\n{"commitInfo": {"inCommitTimestamp": 9000000}}\n'
        )
    os.utime(f, (2000.0, 2000.0))
    assert delta_version_at_timestamp(t, 2999.0) == 0  # v1 now at 9000s
    assert delta_version_at_timestamp(t, 9001.0) == 2


def test_delta_checkpoint_v2_writer_roundtrip(spark, tmp_path):
    """Round 14: the WRITE side of V2 checkpoints — delta_checkpoint_v2
    emits a UUID-named top-level file (checkpointMetadata + protocol
    upgraded to 3/7 with v2Checkpoint + metaData + sidecar actions)
    and splits the adds across _delta_log/_sidecars/ parts; the table
    reads back identically through the checkpoint alone after every
    covered JSON commit expires, DV deletes intact."""
    import glob
    import re as _re

    from graph_db_clustering_spark.sources.delta import (
        delta_add_deletion_vectors,
        delta_append,
        delta_checkpoint_v2,
        read_delta,
    )

    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    table = str(tmp_path / "v2w")
    delta_append(spark, li.filter(F.col("l_quantity") < 20).repartition(2),
                 table, stats_cols=["l_quantity"])
    delta_append(spark, li.filter(F.col("l_quantity") >= 20).repartition(2),
                 table, stats_cols=["l_quantity"])
    # DV-delete every l_quantity >= 45 row so a descriptor must
    # survive the checkpoint through a sidecar
    dels = (
        spark.read.parquet(os.path.join(table, "*.parquet"))
        .select(
            F.col("_metadata.file_path").alias("file_path"),
            F.col("_metadata.row_index").alias("pos"),
            "l_quantity",
        )
        .filter(F.col("l_quantity") >= 45)
        .select("file_path", "pos")
    )
    delta_add_deletion_vectors(spark, table, dels)
    want = li.filter(F.col("l_quantity") < 45).count()

    v = delta_checkpoint_v2(table, sidecar_parts=3)
    log = os.path.join(table, "_delta_log")
    tops = [
        p for p in glob.glob(os.path.join(log, f"{v:020d}.checkpoint.*.parquet"))
        if not _re.fullmatch(
            r"\d{20}\.checkpoint\.\d{10}\.\d{10}\.parquet",
            os.path.basename(p),
        )
    ]
    assert len(tops) == 1, tops
    sidecars = os.listdir(os.path.join(log, "_sidecars"))
    assert len(sidecars) == 3, sidecars
    # retention: expire every covered JSON commit
    for vv in range(v + 1):
        p = os.path.join(log, f"{vv:020d}.json")
        if os.path.exists(p):
            os.remove(p)
    back = read_delta(spark, table)
    assert back.count() == want
    assert back.agg(F.max("l_quantity")).first()[0] < 45


def test_delta_checkpoint_v2_empty_table_single_sidecar(spark, tmp_path):
    from graph_db_clustering_spark.sources.delta import (
        delta_append,
        delta_checkpoint_v2,
        read_delta,
    )

    li = load_table(spark, SF, "lineitem").select("l_orderkey").limit(3)
    table = str(tmp_path / "v2s")
    delta_append(spark, li.repartition(1), table)
    v = delta_checkpoint_v2(table, sidecar_parts=8)  # 1 file -> 1 part
    log = os.path.join(table, "_delta_log")
    assert len(os.listdir(os.path.join(log, "_sidecars"))) == 1
    os.remove(os.path.join(log, f"{0:020d}.json"))
    assert read_delta(spark, table).count() == 3
