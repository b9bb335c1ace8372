"""Apache Hudi MERGE_ON_READ: HoodieLogFormat codec + snapshot /
incremental reads + log-block upsert/delete + compaction — the round
12 companion to sources/hudi.py (CoW), no hudi-spark dependency.

A MoR table defers updates: each file group is a FILE SLICE — one
base parquet file plus an ordered chain of log files named
``.<fileId>_<baseInstant>.log.<version>_<writeToken>`` holding
HoodieLogFormat blocks. Updates and deletes land as log blocks under
``deltacommit`` timeline instants; COMPACTION merges a slice back
into a fresh base file (a ``commit`` instant), starting a new slice.

Log file format (public spec: hudi.apache.org/tech-specs#log-file-
format, mirrored from HoodieLogFormat.java / HoodieLogBlock.java):
every block is

    MAGIC ``#HUDI#`` (6B)
    block size          int64 BE  (everything AFTER this field)
    log format version  int32 BE  (1)
    block type ordinal  int32 BE  (COMMAND=0 DELETE=1 CORRUPT=2
                                   AVRO=3 HFILE=4 PARQUET=5 CDC=6)
    header map          int32 count, then per entry:
                        int32 key ordinal, int32 len, utf-8 bytes
                        (INSTANT_TIME=0 TARGET_INSTANT_TIME=1
                         SCHEMA=2 COMMAND_BLOCK_TYPE=3
                         COMPACTED_BLOCK_TIMES=4 RECORD_POSITIONS=5
                         BLOCK_IDENTIFIER=6)
    content length      int64 BE
    content             bytes
    footer map          (same encoding, usually empty)
    total block length  int64 BE  (reverse pointer, incl. MAGIC)

AVRO data block content: int32 format version (3; 2 accepted), int32
record count, then per record int32 length + Avro BINARY record bytes
in the header SCHEMA — records ride this repo's own Avro codec
(sources/avro.py encode_record/decode_record). DELETE block content:
int32 version (3), int32 length, then an Avro-encoded
HoodieDeleteRecordList (schema transcribed below from
hudi-common/src/main/avro/HoodieDeleteRecordList.avsc); the kryo v2
layout gates. COMMAND blocks carry no content; a ROLLBACK command
invalidates same-file blocks whose INSTANT_TIME equals
TARGET_INSTANT_TIME (the cross-file case is already covered by the
timeline filter: a rolled-back deltacommit is never a completed
instant, so its blocks are skipped everywhere).

Read semantics (read_hudi_mor): per file slice, base rows for keys
untouched by valid log blocks + the NEWEST log row per key (ordered
by instant, then log version, block index, record index), minus keys
whose newest event is a delete. The merge is a single distributed
plan: log files decode EXECUTOR-SIDE via mapInPandas over a
metadata-sized descriptor frame (one row per log file — the same
shape as streaming/delta_cdf_source), the per-key latest pick is a
window over ONLY the log rows (small next to the base), and the base
exclusion is an anti-join Catalyst is free to broadcast. Nothing
row-wise touches the driver.

Scope (loud gates): HFILE/CDC data blocks and kryo delete blocks
(v<3) raise NotImplementedError with the reason. PARQUET data blocks
read AND write (round 13: the block content is a parquet file
payload — pyarrow decodes executor-side; hudi_upsert's
log_block_format='parquet' lands them, gzip like Hudi's default).
Clean/rollback/restore ARE implemented slice-aware (dispatched from
sources/hudi.py), as are clustering (replacecommit over merged
slices), stats/partition-pruned snapshot reads, and ``logcompaction``
instants — read side AND the hudi_log_compact writer — round 13
closed those gates.

Reference parity: the reference re-reads its working set from an
external store per stage (database.py throughout); MoR completes the
write-heavy half of that interchange story next to CoW.
"""

from __future__ import annotations

import json
import os
import struct

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from graph_db_clustering_spark.sources.avro import (
    decode_record,
    encode_record,
    parse_schema,
)
from graph_db_clustering_spark.sources.hudi import (
    HudiError,
    _META_COLS,
    _WRITE_TOKEN,
    _check_partition_values,
    _commit,
    _commit_meta,
    _list_base_files,
    _list_log_files,
    _next_instant,
    _stage_write,
    _uuid_col,
    _with_meta,
    hudi_properties,
    hudi_timeline,
)

MAGIC = b"#HUDI#"
LOG_FORMAT_VERSION = 1

# HoodieLogBlockType ordinals
COMMAND_BLOCK = 0
DELETE_BLOCK = 1
CORRUPT_BLOCK = 2
AVRO_DATA_BLOCK = 3
HFILE_DATA_BLOCK = 4
PARQUET_DATA_BLOCK = 5
CDC_DATA_BLOCK = 6

# HeaderMetadataType ordinals
H_INSTANT_TIME = 0
H_TARGET_INSTANT_TIME = 1
H_SCHEMA = 2
H_COMMAND_BLOCK_TYPE = 3
H_COMPACTED_BLOCK_TIMES = 4

AVRO_BLOCK_VERSION = 3
DELETE_BLOCK_VERSION = 3

# transcribed from hudi-common HoodieDeleteRecordList.avsc (public)
_DELETE_LIST_SCHEMA = {
    "type": "record",
    "name": "HoodieDeleteRecordList",
    "namespace": "org.apache.hudi.avro.model",
    "fields": [{
        "name": "deleteRecordList",
        "type": {"type": "array", "items": {
            "type": "record",
            "name": "HoodieDeleteRecord",
            "fields": [
                {"name": "recordKey", "type": ["null", "string"],
                 "default": None},
                {"name": "partitionPath", "type": ["null", "string"],
                 "default": None},
                {"name": "orderingVal",
                 "type": ["null", "string", "int", "long", "float",
                          "double", "bytes"],
                 "default": None},
            ],
        }},
    }],
}

_ORDER_COLS = ["_gdc_instant", "_gdc_v", "_gdc_b", "_gdc_r"]
_EXTRA_COLS = _ORDER_COLS + ["_gdc_deleted"]


# ---------------------------------------------------------------------------
# HoodieLogFormat block codec
# ---------------------------------------------------------------------------


def _meta_map_bytes(meta: dict[int, str]) -> bytes:
    out = struct.pack(">i", len(meta))
    for k in sorted(meta):
        raw = meta[k].encode()
        out += struct.pack(">ii", k, len(raw)) + raw
    return out


def _read_meta_map(buf: bytes, pos: int) -> tuple[dict[int, str], int]:
    (count,) = struct.unpack_from(">i", buf, pos)
    pos += 4
    meta = {}
    for _ in range(count):
        k, ln = struct.unpack_from(">ii", buf, pos)
        pos += 8
        meta[k] = buf[pos:pos + ln].decode()
        pos += ln
    return meta, pos


def encode_log_block(
    btype: int, header: dict[int, str], content: bytes,
    footer: dict[int, str] | None = None,
) -> bytes:
    """One HoodieLogFormat v1 block, MAGIC included."""
    hb = _meta_map_bytes(header)
    fb = _meta_map_bytes(footer or {})
    # block size = version + type + header + content-length field +
    # content + footer + reverse pointer (HoodieLogFormatWriter)
    blocksize = 4 + 4 + len(hb) + 8 + len(content) + len(fb) + 8
    out = bytearray(MAGIC)
    out += struct.pack(">q", blocksize)
    out += struct.pack(">ii", LOG_FORMAT_VERSION, btype)
    out += hb
    out += struct.pack(">q", len(content))
    out += content
    out += fb
    out += struct.pack(">q", 6 + 8 + blocksize)  # incl. MAGIC + size
    return bytes(out)


def decode_log_file(blob: bytes) -> list[dict]:
    """All blocks of one log file ->
    [{'type', 'header', 'footer', 'content'}]. Corrupt framing raises
    (we do not scan forward for the next magic — a truncated tail is
    an error, not silently skipped data)."""
    blocks = []
    pos = 0
    n = len(blob)
    while pos < n:
        try:
            pos, block = _decode_one_block(blob, pos)
        except struct.error as e:
            raise HudiError(f"hudi-log: truncated block ({e})")
        blocks.append(block)
    return blocks


def _decode_one_block(blob: bytes, pos: int) -> tuple[int, dict]:
    if blob[pos:pos + 6] != MAGIC:
        raise HudiError(
            f"hudi-log: bad magic at offset {pos} — corrupt block"
        )
    start = pos
    pos += 6
    (_blocksize,) = struct.unpack_from(">q", blob, pos)
    pos += 8
    version, btype = struct.unpack_from(">ii", blob, pos)
    pos += 8
    if version != LOG_FORMAT_VERSION:
        raise NotImplementedError(
            f"hudi-log: log format version {version} (only v1)"
        )
    header, pos = _read_meta_map(blob, pos)
    (clen,) = struct.unpack_from(">q", blob, pos)
    pos += 8
    content = blob[pos:pos + clen]
    if len(content) != clen:
        raise HudiError("hudi-log: truncated block content")
    pos += clen
    footer, pos = _read_meta_map(blob, pos)
    (total,) = struct.unpack_from(">q", blob, pos)
    pos += 8
    if total != pos - start:
        raise HudiError(
            f"hudi-log: reverse pointer {total} != block span "
            f"{pos - start}"
        )
    return pos, {
        "type": btype, "header": header,
        "footer": footer, "content": content,
    }


def encode_avro_block_content(fields, rows: list[dict]) -> bytes:
    out = bytearray(struct.pack(">ii", AVRO_BLOCK_VERSION, len(rows)))
    for r in rows:
        rec = encode_record(fields, r)
        out += struct.pack(">i", len(rec)) + rec
    return bytes(out)


def decode_avro_block_content(content: bytes, fields) -> list[dict]:
    version, count = struct.unpack_from(">ii", content, 0)
    if version not in (2, 3):
        raise NotImplementedError(
            f"hudi-log: avro data block version {version} — only the "
            "length-prefixed v2/v3 record layout is implemented"
        )
    pos = 8
    rows = []
    for _ in range(count):
        (ln,) = struct.unpack_from(">i", content, pos)
        pos += 4
        row, used = decode_record(content[pos:pos + ln], 0,
                                  fields)
        pos += ln
        rows.append(row)
    return rows


def encode_delete_block_content(recs: list[tuple[str, str]]) -> bytes:
    fields = parse_schema(_DELETE_LIST_SCHEMA)
    body = encode_record(fields, {"deleteRecordList": [
        {"recordKey": k, "partitionPath": pp, "orderingVal": None}
        for k, pp in recs
    ]})
    return struct.pack(">ii", DELETE_BLOCK_VERSION, len(body)) + body


def decode_delete_block_content(content: bytes) -> list[dict]:
    version, ln = struct.unpack_from(">ii", content, 0)
    if version < 3:
        raise NotImplementedError(
            f"hudi-log: delete block version {version} — the kryo "
            "layouts (v<3) are not implemented, only the Avro "
            "HoodieDeleteRecordList (v3)"
        )
    fields = parse_schema(_DELETE_LIST_SCHEMA)
    row, _ = decode_record(content[8:8 + ln], 0, fields)
    return row["deleteRecordList"]


# ---------------------------------------------------------------------------
# Avro writer schema from the Spark schema
# ---------------------------------------------------------------------------

_AVRO_PRIM = {
    T.StringType: "string",
    T.LongType: "long",
    T.IntegerType: "int",
    T.ShortType: "int",
    T.ByteType: "int",
    T.DoubleType: "double",
    T.FloatType: "float",
    T.BooleanType: "boolean",
    T.BinaryType: "bytes",
}


def spark_to_avro_schema(
    schema: T.StructType, name: str = "HudiRecord"
) -> dict:
    """Spark StructType -> Avro record schema for the log-block
    SCHEMA header. Meta columns stay non-null; everything else is a
    ["null", T] union. Nested/complex types gate loudly."""
    fields = []
    for f in schema.fields:
        dt = type(f.dataType)
        if dt in _AVRO_PRIM:
            at: object = _AVRO_PRIM[dt]
        elif isinstance(f.dataType, T.DateType):
            at = {"type": "int", "logicalType": "date"}
        elif isinstance(f.dataType, T.TimestampType):
            at = {"type": "long", "logicalType": "timestamp-micros"}
        elif isinstance(f.dataType, T.TimestampNTZType):
            at = {"type": "long",
                  "logicalType": "local-timestamp-micros"}
        elif isinstance(f.dataType, T.DecimalType):
            at = {"type": "bytes", "logicalType": "decimal",
                  "precision": f.dataType.precision,
                  "scale": f.dataType.scale}
        else:
            raise NotImplementedError(
                f"hudi-log: column {f.name!r} of type "
                f"{f.dataType.simpleString()} — only primitive/"
                "date/timestamp/decimal columns ride avro log blocks"
            )
        if f.name not in _META_COLS:
            at = ["null", at]
        fields.append({"name": f.name, "type": at,
                       **({"default": None}
                          if f.name not in _META_COLS else {})})
    return {"type": "record", "name": name, "fields": fields}


# ---------------------------------------------------------------------------
# file-slice view
# ---------------------------------------------------------------------------


def _file_slices(path: str, as_of: str | None = None):
    """Latest file slice per group at ``as_of``: [{'pp', 'fid',
    'base', 'base_instant', 'logs': [logfile dicts, version-
    ordered]}], plus the completed-instant set for block filtering.
    Driver-side, O(files) — the same Snapshot cost every Hudi client
    pays."""
    timeline = hudi_timeline(path)
    valid: set = set()
    replaced: set = set()
    for t in timeline:
        if as_of is not None and t["instant"] > str(as_of):
            break
        if t["action"] in ("commit", "deltacommit", "replacecommit",
                           "logcompaction"):
            valid.add(t["instant"])
        if t["action"] == "replacecommit":
            meta = _commit_meta(path, t["instant"], "replacecommit")
            for pp, fids in (
                meta.get("partitionToReplaceFileIds") or {}
            ).items():
                replaced.update((pp, fid) for fid in fids)
    best: dict = {}
    for bf in _list_base_files(path, allow_logs=True):
        if bf["instant"] not in valid:
            continue
        k = (bf["pp"], bf["file_id"])
        if k in replaced:
            continue
        if k not in best or bf["instant"] > best[k]["instant"]:
            best[k] = bf
    slices = {
        k: {"pp": k[0], "fid": k[1], "base": bf["abs"],
            "base_instant": bf["instant"], "logs": []}
        for k, bf in best.items()
    }
    for lf in _list_log_files(path):
        k = (lf["pp"], lf["file_id"])
        s = slices.get(k)
        if s is None:
            if k in replaced:
                continue
            # log-only file group (no base yet — real Hudi inserts
            # into logs under some configs); merge starts from empty
            slices[k] = {"pp": k[0], "fid": k[1], "base": None,
                         "base_instant": lf["base_instant"],
                         "logs": [lf]}
        elif lf["base_instant"] == s["base_instant"]:
            s["logs"].append(lf)
        elif lf["base_instant"] > s["base_instant"]:
            # anchored to a NEWER instant than the latest completed
            # base. If that instant is COMPLETED, its base file should
            # have been the slice — a missing base is corruption, not
            # a merge rule. If it is PENDING (hudi-spark with async
            # compaction requested: new writes anchor log files to the
            # pending compaction instant while it is in flight),
            # Hudi's pending-compaction merge rule applies: readers
            # merge those logs onto the OLD slice. Block instants
            # order the events, so version collisions across anchors
            # are harmless (round 13, VERDICT r12 Next #2/missing).
            if lf["base_instant"] in valid:
                raise HudiError(
                    f"hudi-log: log file {lf['abs']!r} is anchored to "
                    f"completed instant {lf['base_instant']} but no "
                    "base file for it exists — corrupt slice"
                )
            s["logs"].append(lf)
        # anchor < chosen base: an old slice's log, compacted away
    for s in slices.values():
        # order by (anchor, version): a pending-compaction-anchored
        # file sorts after the completed-base chain; within the merge
        # the per-block instants are the real event order anyway
        s["logs"].sort(key=lambda lf: (lf["base_instant"], lf["version"]))
    return list(slices.values()), valid


# ---------------------------------------------------------------------------
# snapshot read (merge on read)
# ---------------------------------------------------------------------------


def _make_log_decoder(valid: frozenset, out_cols: list[str]):
    """mapInPandas decoder: one descriptor row (pp, fid, abs,
    version) -> the log file's valid records as rows of the merged
    schema + _pp/_fid + ordering/delete marker columns. Runs on
    executors; the driver never sees a record."""

    def fn(it):
        import pandas as pd

        for pdf in it:
            for row in pdf.itertuples(index=False):
                with open(row.abs, "rb") as f:
                    blocks = decode_log_file(f.read())
                recs: list[dict] = []
                for b_idx, b in enumerate(blocks):
                    hdr = b["header"]
                    instant = hdr.get(H_INSTANT_TIME)
                    if b["type"] == COMMAND_BLOCK:
                        # ROLLBACK: drop same-file blocks of the
                        # target instant collected so far (matching
                        # the block's OWN instant — a compacted
                        # block's ordering instant is reassigned)
                        tgt = hdr.get(H_TARGET_INSTANT_TIME)
                        recs = [r for r in recs
                                if r["_gdc_own"] != tgt]
                        continue
                    if instant not in valid:
                        continue
                    # round 13: a LOG-COMPACTED block (written under a
                    # logcompaction instant) merges a PREFIX of the
                    # slice's log chain; it must order at the position
                    # of the newest instant it compacted, NOT at the
                    # logcompaction instant — or its carried copies
                    # would beat later, non-compacted updates. The
                    # originals (all <= that instant) then lose to it
                    # on the version tiebreak, so no explicit
                    # suppression is needed.
                    eff = instant
                    cbt = hdr.get(H_COMPACTED_BLOCK_TIMES)
                    if cbt:
                        eff = max(
                            x.strip() for x in cbt.split(",") if x
                        )
                    base = {
                        "_pp": row.pp, "_fid": row.fid,
                        "_gdc_own": instant,
                        "_gdc_instant": eff,
                        "_gdc_v": int(row.version),
                        "_gdc_b": b_idx,
                    }
                    if b["type"] == AVRO_DATA_BLOCK:
                        fields = parse_schema(
                            json.loads(hdr[H_SCHEMA]))
                        for r_idx, r in enumerate(
                            decode_avro_block_content(
                                b["content"], fields)
                        ):
                            recs.append({
                                **r, **base, "_gdc_r": r_idx,
                                "_gdc_deleted": False,
                            })
                    elif b["type"] == DELETE_BLOCK:
                        for r_idx, d in enumerate(
                            decode_delete_block_content(b["content"])
                        ):
                            recs.append({
                                "_hoodie_commit_time": eff,
                                "_hoodie_record_key": d["recordKey"],
                                "_hoodie_partition_path":
                                    d["partitionPath"],
                                **base, "_gdc_r": r_idx,
                                "_gdc_deleted": True,
                            })
                    elif b["type"] == PARQUET_DATA_BLOCK:
                        # round 13: a parquet data block's content IS
                        # a parquet file payload
                        # (hoodie.logfile.data.block.format=parquet);
                        # pyarrow decodes it in place, executor-side
                        import io

                        import pyarrow.parquet as pq

                        tbl = pq.read_table(io.BytesIO(b["content"]))
                        for r_idx, r in enumerate(tbl.to_pylist()):
                            recs.append({
                                **r, **base, "_gdc_r": r_idx,
                                "_gdc_deleted": False,
                            })
                    else:
                        raise NotImplementedError(
                            f"hudi-log: block type {b['type']} "
                            "(hfile/cdc data blocks are not "
                            "implemented)"
                        )
                if recs:
                    yield pd.DataFrame(
                        [[r.get(c) for c in out_cols] for r in recs],
                        columns=out_cols,
                    )

    return fn


def _log_records_df(
    spark: SparkSession,
    slices: list[dict],
    valid: set,
    table_schema: T.StructType,
) -> DataFrame:
    """Decode every log file of `slices` into one DataFrame of change
    rows (merged schema + _pp/_fid + _gdc_* ordering columns)."""
    rows = [
        (s["pp"], s["fid"], lf["abs"], lf["version"])
        for s in slices for lf in s["logs"]
    ]
    desc = spark.createDataFrame(
        rows, "pp string, fid string, abs string, version int"
    ).repartition(max(1, min(len(rows), 64)))
    out = T.StructType(list(table_schema.fields) + [
        T.StructField("_pp", T.StringType()),
        T.StructField("_fid", T.StringType()),
        T.StructField("_gdc_instant", T.StringType()),
        T.StructField("_gdc_v", T.IntegerType()),
        T.StructField("_gdc_b", T.IntegerType()),
        T.StructField("_gdc_r", T.IntegerType()),
        T.StructField("_gdc_deleted", T.BooleanType()),
    ])
    return desc.mapInPandas(
        _make_log_decoder(frozenset(valid), [f.name for f in out]),
        schema=out,
    )


def _latest_per_key(
    log_df: DataFrame, per_group: bool = False
) -> DataFrame:
    """Newest event per record key — scoped to the file group for
    snapshot merges (a delete in group A must not suppress a LATER
    re-insert that landed in group B) and global for incremental
    pulls (which want the latest state per record across groups)."""
    keys = (["_hoodie_record_key", "_pp", "_fid"]
            if per_group else ["_hoodie_record_key"])
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() for c in _ORDER_COLS]
    )
    return (
        log_df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1).drop("_rn")
    )


def _table_schema(spark: SparkSession, slices: list[dict]):
    bases = sorted(s["base"] for s in slices if s["base"])
    if bases:
        return spark.read.parquet(bases[0]).schema
    # log-only table: derive from the first block's SCHEMA header
    from graph_db_clustering_spark.sources.avro import (
        spark_schema_for,
    )

    first = slices[0]["logs"][0]["abs"]
    with open(first, "rb") as f:
        blocks = decode_log_file(f.read())
    for b in blocks:
        if H_SCHEMA in b["header"]:
            return spark_schema_for(
                parse_schema(json.loads(b["header"][H_SCHEMA]))
            )
    raise HudiError("hudi-log: no SCHEMA header in log-only table")


def _mor_snapshot(
    spark: SparkSession,
    path: str,
    as_of: str | None = None,
    with_groups: bool = False,
    pruned: tuple[list[dict], set] | None = None,
) -> DataFrame:
    """Merged snapshot plan. ``pruned`` short-circuits the slice
    listing with a caller-selected (slices, valid) subset — the
    pruned-read path drops whole slices by partition dir and base
    files by footer stats before the plan exists."""
    if pruned is not None:
        slices, valid = pruned
    else:
        slices, valid = _file_slices(path, as_of)
    if not slices:
        raise HudiError(
            f"hudi: no live file slices at {path}"
            + (f" as of {as_of}" if as_of else "")
        )
    schema = _table_schema(spark, slices)
    logged = [s for s in slices if s["logs"]]
    bases = sorted(s["base"] for s in slices if s["base"])
    base_df = spark.read.parquet(*bases) if bases else None
    if base_df is not None and (with_groups or logged):
        base_df = _attach_groups(spark, base_df, slices, path)
    if not logged:
        if base_df is not None and not with_groups:
            base_df = base_df.drop("_pp", "_fid")
        return base_df
    log_df = _log_records_df(spark, logged, valid, schema)
    # merge scoped to the FILE GROUP (real Hudi merges per file
    # slice): a delete event only suppresses base rows of its own
    # group, so a later re-insert routed to a fresh group survives.
    #
    # Shape note (r14): `latest` feeds BOTH the surviving-upserts side
    # and the touched-keys anti-join side; without a barrier the log
    # decode (mapInPandas + exchange + window) evaluated twice, so the
    # LOG-DELTA-sized frame is lazily checkpointed — decoded once,
    # read twice. The base table itself stays OUT of the window: an
    # earlier variant unioned base rows into the latest-wins window,
    # which shuffled the ENTIRE base by record key and regressed the
    # 30k-upsert scale rows ~3x; the anti-join below broadcasts the
    # (delta-sized) touched-key set at runtime instead, so the base is
    # never shuffled — the only 100 TB-safe merge shape.
    latest = _latest_per_key(log_df, per_group=True).localCheckpoint(
        eager=False
    )
    upserts = latest.filter(~F.col("_gdc_deleted")).drop(*_EXTRA_COLS)
    touched = latest.select("_hoodie_record_key", "_pp", "_fid")
    if base_df is None:
        out = upserts
    else:
        out = base_df.join(
            touched, ["_hoodie_record_key", "_pp", "_fid"], "anti"
        ).unionByName(upserts)
    if not with_groups:
        out = out.drop("_pp", "_fid")
    return out


def _attach_groups(
    spark: SparkSession, base_df: DataFrame, slices, path: str
) -> DataFrame:
    rows = []
    for s in slices:
        if not s["base"]:
            continue
        p = s["base"]
        rows.append((
            p if p.startswith("file:") else f"file:{p}",
            s["pp"], s["fid"],
        ))
    mapping = spark.createDataFrame(
        rows, "_fpath string, _pp string, _fid string"
    )
    scan = base_df.withColumn(
        "_fpath",
        F.regexp_replace(
            F.col("_metadata.file_path"), "^file:(//)?", "file:"
        ),
    )
    return scan.join(F.broadcast(mapping), "_fpath").drop("_fpath")


def read_hudi_mor(
    spark: SparkSession,
    path: str,
    as_of: str | None = None,
    drop_meta: bool = False,
) -> DataFrame:
    """Snapshot read of a MERGE_ON_READ table (optionally time-
    travelled to the completed instant ``as_of``): per file slice,
    base rows merged with the newest valid log row per record key,
    deletes applied. See the module docstring for the plan shape."""
    df = _mor_snapshot(spark, path, as_of)
    if drop_meta:
        df = df.drop(*_META_COLS)
    return df


def read_hudi_mor_pruned(
    spark: SparkSession,
    path: str,
    column: str,
    lo,
    hi,
    as_of: str | None = None,
) -> tuple[DataFrame, int, int]:
    """Pruned MERGE_ON_READ snapshot (round 13, VERDICT r12 Next #1):
    file-level pruning BEFORE the merge plan exists, composed with the
    slice-local log merge.

    Two pruning stages, both slice-aware:

    - partition-dir pruning: a hive segment ``column=v`` outside
      [lo, hi] drops the WHOLE slice — base file AND its anchored log
      files (file groups are partition-local; Hudi's record identity
      is (record key, partition path), so an update can never move a
      row across partitions into a pruned slice).
    - footer-stats pruning: a surviving slice whose BASE min/max is
      disjoint from [lo, hi] drops the base file but KEEPS its logs —
      safe because merged rows originating from the base are exactly
      the log-untouched keys (the anti-join survivors), whose values
      the footer stats bound; every log-touched key's merged row comes
      entirely from the log event, base not consulted. The slice then
      merges from empty, like a log-only group. Slices with logs are
      never dropped on stats alone.

    Returns (df, files_read, files_skipped) counting base AND log
    files; the caller still applies the row predicate."""
    from graph_db_clustering_spark.sources.parquet_stats import (
        parquet_file_stats,
    )

    slices, valid = _file_slices(path, as_of)
    if not slices:
        raise HudiError(f"hudi: no live file slices at {path}")
    prefix = f"{column}="
    kept, skipped = [], 0
    for s in slices:
        drop = False
        for seg in (s["pp"].split("/") if s["pp"] else []):
            if seg.startswith(prefix):
                raw = seg[len(prefix):]
                try:
                    v = type(lo)(raw) if lo is not None else raw
                except (TypeError, ValueError):
                    break  # untyped partition value: never skip
                if (lo is not None and v < lo) or (
                    hi is not None and v > hi
                ):
                    drop = True
                break
        if drop:
            skipped += (1 if s["base"] else 0) + len(s["logs"])
        else:
            kept.append(s)
    if not kept:
        raise HudiError("hudi: every file pruned — empty selection")
    lo_b = lo if lo is not None else float("-inf")
    hi_b = hi if hi is not None else float("inf")
    with_base = {s["base"]: s for s in kept if s["base"]}
    if with_base:
        for st in parquet_file_stats(
            spark, sorted(with_base), [column]
        ):
            mv, xv = st["min_values"], st["max_values"]
            disjoint = False
            try:
                if column in mv and column in xv:
                    disjoint = xv[column] < lo_b or mv[column] > hi_b
            except TypeError:
                disjoint = False
            if not disjoint:
                continue
            s = with_base[st["path"]]
            skipped += 1
            if s["logs"]:
                s = dict(s, base=None)  # merge from empty, logs kept
                kept[kept.index(with_base[st["path"]])] = s
            else:
                kept.remove(with_base[st["path"]])
    if not kept:
        raise HudiError("hudi: every file pruned — empty selection")
    files_read = sum(
        (1 if s["base"] else 0) + len(s["logs"]) for s in kept
    )
    df = _mor_snapshot(spark, path, as_of, pruned=(kept, valid))
    return df, files_read, skipped


# ---------------------------------------------------------------------------
# incremental read
# ---------------------------------------------------------------------------


def read_hudi_incremental_mor(
    spark: SparkSession,
    path: str,
    begin: str,
    end: str | None = None,
) -> DataFrame:
    """Incremental pull over MoR: the latest state of every record
    written by a commit/deltacommit in (begin, end]. Candidates are
    the as-of-``end`` slice view's base rows filtered to in-range
    `_hoodie_commit_time` (covers inserts AND compaction carries,
    which preserve commit times) plus in-range log rows; the per-key
    latest pick collapses the log-row/compacted-copy duplicate pair
    (identical commit time, identical values), and keys whose newest
    event is a delete emit nothing — Hudi CoW-equivalent semantics."""
    timeline = hudi_timeline(path)
    in_range = {
        t["instant"] for t in timeline
        if t["action"] in ("commit", "deltacommit", "replacecommit",
                           "logcompaction")
        and t["instant"] > str(begin)
        and (end is None or t["instant"] <= str(end))
    }
    if not in_range:
        raise HudiError(
            f"hudi: no completed commits in ({begin}, {end or 'latest'}]"
        )
    slices, valid = _file_slices(path, end)
    schema = _table_schema(spark, slices)
    lo = F.col("_hoodie_commit_time") > str(begin)
    if end is not None:
        lo = lo & (F.col("_hoodie_commit_time") <= str(end))
    parts = []
    bases = sorted(s["base"] for s in slices if s["base"])
    if bases:
        parts.append(
            spark.read.parquet(*bases).filter(lo)
            .withColumns({
                "_gdc_instant": F.col("_hoodie_commit_time"),
                "_gdc_v": F.lit(-1), "_gdc_b": F.lit(-1),
                "_gdc_r": F.lit(-1),
                "_gdc_deleted": F.lit(False),
            })
        )
    logged = [s for s in slices if s["logs"]]
    if logged:
        log_df = _log_records_df(
            spark, logged, valid & in_range, schema
        ).drop("_pp", "_fid").filter(lo)
        # compacted copies order AFTER the log original at the same
        # commit time (_gdc_v = -1): the log row wins the window, but
        # both carry identical values so either is correct
        parts.append(log_df)
    if not parts:
        raise HudiError("hudi: in-range commits wrote no files")
    allrows = parts[0]
    for p in parts[1:]:
        allrows = allrows.unionByName(p)
    latest = _latest_per_key(allrows)
    return latest.filter(~F.col("_gdc_deleted")).drop(*_EXTRA_COLS)


# ---------------------------------------------------------------------------
# write side: create / upsert / delete via log blocks, compaction
# ---------------------------------------------------------------------------


def _next_log_versions(path: str, slices) -> dict:
    return {
        (s["pp"], s["fid"]): (
            s["base_instant"],
            (max((lf["version"] for lf in s["logs"]), default=0) + 1),
        )
        for s in slices
    }


def _pdf_rows(pdf, user_cols):
    """pandas group -> python dicts of user column values (numpy
    scalars unboxed, NaN -> None) for the avro encoder."""
    import pandas as pd

    out = []
    for rec in pdf[user_cols].to_dict("records"):
        row = {}
        for k, v in rec.items():
            if v is None or (
                not isinstance(v, (list, dict, bytes, str))
                and pd.isna(v)
            ):
                row[k] = None
            elif hasattr(v, "item"):
                row[k] = v.item()
            else:
                row[k] = v
        out.append(row)
    return out


def _write_group_logs(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    instant: str,
    ginfo: dict,
    record_key: str,
    schema_json: str | None,
    delete: bool,
    block_format: str = "avro",
) -> dict:
    """One log file per touched (pp, fid): applyInPandas encodes the
    block EXECUTOR-SIDE into a stage dir; the driver renames the
    metadata-sized result into the partition dirs. Returns the
    landed {(pp, fid): {'path', 'bytes', 'rows'}} map.
    block_format='parquet' lands data as PARQUET blocks
    (hoodie.logfile.data.block.format=parquet — the content is a
    parquet file payload, gzip like Hudi's default); deletes stay
    Avro HoodieDeleteRecordList blocks either way."""
    import urllib.parse

    stage = os.path.join(path, f".stage_{instant}_logs")
    os.makedirs(stage, exist_ok=True)
    token = _WRITE_TOKEN

    def fn(key, pdf):
        import pandas as pd

        pp, fid = key
        base_instant, version = ginfo[(pp, fid)]
        logname = f".{fid}_{base_instant}.log.{version}_{token}"
        pdf = pdf.sort_values("_gdc_key", kind="stable")
        if delete:
            content = encode_delete_block_content([
                (str(k), pp) for k in pdf["_gdc_key"]
            ])
            block = encode_log_block(
                DELETE_BLOCK, {H_INSTANT_TIME: instant}, content
            )
            nrows = len(pdf)
        else:
            schema = json.loads(schema_json)
            fields = parse_schema(schema)
            user_cols = [
                f["name"] for f in schema["fields"]
                if f["name"] not in _META_COLS
            ]
            rows = []
            for i, (k, vals) in enumerate(zip(
                pdf["_gdc_key"], _pdf_rows(pdf, user_cols)
            )):
                rows.append({
                    "_hoodie_commit_time": instant,
                    "_hoodie_commit_seqno": f"{instant}_0_{i + 1}",
                    "_hoodie_record_key": str(k),
                    "_hoodie_partition_path": pp,
                    "_hoodie_file_name": logname,
                    **vals,
                })
            if block_format == "parquet":
                import io

                import pyarrow as pa
                import pyarrow.parquet as pq

                buf = io.BytesIO()
                pq.write_table(
                    pa.Table.from_pylist(rows), buf,
                    compression="gzip",
                )
                content = buf.getvalue()
                btype = PARQUET_DATA_BLOCK
            else:
                content = encode_avro_block_content(fields, rows)
                btype = AVRO_DATA_BLOCK
            block = encode_log_block(
                btype,
                {H_INSTANT_TIME: instant, H_SCHEMA: schema_json},
                content,
            )
            nrows = len(rows)
        safe = urllib.parse.quote(f"{pp}|{logname}", safe="")
        dest = os.path.join(stage, safe)
        with open(dest, "wb") as f:
            f.write(block)
        return pd.DataFrame(
            [[pp, fid, logname, nrows, len(block)]],
            columns=["pp", "fid", "logname", "rows", "bytes"],
        )

    landed_rows = (
        df.groupBy("_pp", "_fid")
        .applyInPandas(
            fn,
            "pp string, fid string, logname string, "
            "rows long, bytes long",
        )
        .collect()
    )
    landed = {}
    for r in landed_rows:
        rel = f"{r['pp']}/{r['logname']}" if r["pp"] else r["logname"]
        src = os.path.join(
            stage, urllib.parse.quote(f"{r['pp']}|{r['logname']}",
                                      safe=""))
        dest = os.path.join(path, *rel.split("/"))
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        os.replace(src, dest)
        landed[(r["pp"], r["fid"])] = {
            "path": rel, "bytes": r["bytes"], "rows": r["rows"],
        }
    try:
        os.rmdir(stage)
    except OSError:
        pass
    return landed


def _apply_row_changes_mor(
    spark: SparkSession,
    path: str,
    upserts: DataFrame | None,
    delete_keys: DataFrame | None,
    op: str,
    log_block_format: str = "avro",
) -> str:
    """Shared MoR write: tag incoming keys to file groups, append ONE
    log file per touched group (avro or parquet data block for
    updates, delete block for deletes), route inserts to fresh
    base-file groups — exactly one deltacommit. Untouched data is
    never rewritten; that is what merge-on-read buys over CoW."""
    if log_block_format not in ("avro", "parquet"):
        raise HudiError(
            f"hudi: unsupported log_block_format {log_block_format!r}"
            " (avro or parquet)"
        )
    props = hudi_properties(path)
    record_key = props.get("hoodie.table.recordkey.fields")
    if not record_key:
        raise HudiError("hudi: hoodie.properties lacks recordkey.fields")
    partition_field = props.get("hoodie.table.partition.fields") or None
    precombine = props.get("hoodie.table.precombine.field") or None
    instant = _next_instant(path)

    slices, _valid = _file_slices(path)
    ginfo = _next_log_versions(path, slices)
    snap = _mor_snapshot(spark, path, with_groups=True)
    user_cols = [
        c for c in snap.columns
        if c not in _META_COLS and c not in ("_pp", "_fid")
    ]

    if upserts is not None:
        missing = [c for c in user_cols if c not in upserts.columns]
        if missing:
            raise HudiError(f"hudi: upsert source lacks columns {missing}")
        upserts = upserts.select(*user_cols)
        dup_gate = not precombine
        if precombine:
            w = Window.partitionBy(record_key).orderBy(
                F.col(precombine).desc()
            )
            upserts = (
                upserts.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1).drop("_rn")
            )
        keys = upserts.select(
            F.col(record_key).cast("string").alias("_k")
        )
    else:
        delete_keys = delete_keys.select(
            F.col(record_key).cast("string").alias("_k")
        ).distinct()
        keys = delete_keys

    located = (
        snap.select(
            F.col("_hoodie_record_key").alias("_k"), "_pp", "_fid"
        )
        .join(keys, "_k", "inner")
    )

    landed: dict = {}
    n_upd = n_ins = n_del = 0
    schema_json = None
    if upserts is not None:
        tagged = (
            upserts.withColumn("_k", F.col(record_key).cast("string"))
            .join(located, "_k", "left")
            .localCheckpoint(eager=False)
        )
        updates = (
            tagged.filter(F.col("_fid").isNotNull())
            .withColumnRenamed("_k", "_gdc_key")
        )
        inserts = tagged.filter(F.col("_fid").isNull()).drop(
            "_k", "_pp", "_fid"
        )
        # ONE aggregate job over the checkpointed tagging join replaces
        # four separate driver jobs (r14 optimization): the duplicate-key
        # gate (count > distinct), the update/insert counts, and the
        # insert partition-value gate all ride the same pass. The gates
        # still raise BEFORE any file is staged or landed.
        if partition_field is not None:
            _bad_pp = (
                F.col(partition_field).isNull()
                | F.col(partition_field).cast("string").rlike("[/=%\\n\\r]")
            )
        else:
            _bad_pp = F.lit(False)
        stats = tagged.agg(
            F.count(F.lit(1)).alias("n_rows"),
            # distinct KEY GROUPS incl. a null group, matching the old
            # groupBy(key) gate (count_distinct alone ignores nulls)
            (
                F.count_distinct("_k")
                + F.coalesce(
                    F.max(F.when(F.col("_k").isNull(), 1).otherwise(0)),
                    F.lit(0),
                )
            ).alias("n_keys"),
            F.count("_fid").alias("n_upd"),
            F.max(
                F.when(F.col("_fid").isNull() & _bad_pp, 1).otherwise(0)
            ).alias("bad_pp"),
        ).first()
        if dup_gate and stats["n_rows"] > stats["n_keys"]:
            raise HudiError(
                "hudi: duplicate record keys in upsert source and no "
                "precombine field declared"
            )
        if partition_field is not None and (stats["bad_pp"] or 0):
            raise HudiError(
                f"hudi: partition value of {partition_field!r} is NULL or "
                "contains one of / = % newline — hive-style escaping is "
                "not implemented; clean or recode the partition column"
            )
        n_upd = int(stats["n_upd"])
        n_ins = int(stats["n_rows"]) - n_upd
        if n_upd:
            avro_schema = spark_to_avro_schema(T.StructType(
                [T.StructField(c, T.StringType(), False)
                 for c in _META_COLS]
                + [f for f in snap.schema.fields
                   if f.name in user_cols]
            ))
            schema_json = json.dumps(avro_schema)
            landed.update(_write_group_logs(
                spark, updates, path, instant, ginfo,
                record_key, schema_json, delete=False,
                block_format=log_block_format,
            ))
        if n_ins:
            # partition values already gated by the fused aggregate above
            if partition_field is not None:
                pp_col = F.concat(
                    F.lit(f"{partition_field}="),
                    F.col(partition_field).cast("string"),
                )
            else:
                pp_col = F.lit("")
            fid_col = _uuid_col(pp_col, F.lit("ins"), F.lit(instant))
            work = _with_meta(
                inserts, instant, F.col(record_key), pp_col,
                fid_col, user_cols,
            )
            landed.update(_stage_write(spark, work, path, instant))
    else:
        # no pre-count job (r14): the log write IS the counting pass —
        # zero matched groups land zero files, and n_del comes back in
        # the landed row stats
        dels = located.withColumnRenamed("_k", "_gdc_key")
        del_landed = _write_group_logs(
            spark, dels, path, instant, ginfo,
            record_key, None, delete=True,
        )
        landed.update(del_landed)
        n_del = sum(st["rows"] for st in del_landed.values())

    if not landed:
        # a no-op change (no matches) still lands a commit, like CoW
        pass
    _commit(
        path, instant, landed, op,
        action="deltacommit",
        extra={
            "gdc.numUpdateWrites": str(n_upd),
            "gdc.numInserts": str(n_ins),
            "gdc.numDeletes": str(n_del),
        },
    )
    return instant


def hudi_clean_mor(path: str, retain_slices: int = 1) -> list[str]:
    """CLEAN a MERGE_ON_READ table: keep the newest `retain_slices`
    FILE SLICES per group (a slice = its base file plus the log files
    anchored to it — they live and die together) and, per savepoint,
    the group's latest slice at-or-before it. Incremental pulls over
    the retained window stay exact (the latest slice is never cleaned
    and compaction preserves commit times); time travel past the
    window stops working — that is what cleaning means. Driver-side
    O(files). Returns the deleted paths."""
    from graph_db_clustering_spark.sources.hudi import (
        _hoodie_dir,
        _list_base_files,
        _list_log_files,
    )

    if retain_slices < 1:
        raise HudiError("hudi: clean must retain at least one slice")
    timeline = hudi_timeline(path)
    valid = {
        t["instant"] for t in timeline
        if t["action"] in ("commit", "deltacommit", "replacecommit")
    }
    savepoints = sorted(
        t["instant"] for t in timeline if t["action"] == "savepoint"
    )
    logs_by_anchor: dict = {}
    for lf in _list_log_files(path):
        logs_by_anchor.setdefault(
            (lf["pp"], lf["file_id"], lf["base_instant"]), []
        ).append(lf["abs"])
    groups: dict = {}
    for bf in _list_base_files(path, allow_logs=True):
        if bf["instant"] not in valid:
            continue  # pending/foreign: leave alone
        groups.setdefault((bf["pp"], bf["file_id"]), []).append(bf)
    deleted = []
    for (pp, fid), slices in sorted(groups.items()):
        slices.sort(key=lambda b: b["instant"], reverse=True)
        protected = set()
        for sp in savepoints:
            eligible = [
                b["instant"] for b in slices if b["instant"] <= sp
            ]
            if eligible:
                protected.add(max(eligible))
        for bf in slices[retain_slices:]:
            if bf["instant"] in protected:
                continue
            os.remove(bf["abs"])
            deleted.append(bf["abs"])
            for lp in logs_by_anchor.pop(
                (pp, fid, bf["instant"]), []
            ):
                os.remove(lp)
                deleted.append(lp)
    from graph_db_clustering_spark.sources.hudi import _next_instant

    instant = _next_instant(path)
    hd = _hoodie_dir(path)
    open(os.path.join(hd, f"{instant}.clean.requested"), "w").close()
    open(os.path.join(hd, f"{instant}.clean.inflight"), "w").close()
    with open(os.path.join(hd, f"{instant}.clean"), "w") as f:
        json.dump({
            "totalFilesDeleted": len(deleted),
            "policy": "KEEP_LATEST_FILE_VERSIONS",
            "retained": retain_slices,
        }, f)
    return deleted


def hudi_rollback_mor(path: str) -> str:
    """ROLLBACK the latest completed deltacommit, compaction commit,
    or logcompaction on a MERGE_ON_READ table: the files its write
    stats name (log files and/or base files) are deleted, its
    timeline triplet is removed, and a completed `<instant>.rollback`
    records the action. Rolling back a COMPACTION requires the
    pre-compaction slices to still exist on disk (clean may have
    removed them — that would be silent data loss, so it raises
    instead). A LOGCOMPACTION rolls back by deleting its compacted
    log files — the original log files it merged are still the
    event carriers (log compaction never removes them). Because the
    newest write is always the rollback target, a deltacommit whose
    blocks were already log-compacted can never be rolled back
    underneath the compacted copy. Returns the rolled-back
    instant."""
    import re

    from graph_db_clustering_spark.sources.hudi import (
        _hoodie_dir,
        _list_base_files,
        _next_instant,
    )

    timeline = hudi_timeline(path)
    commits = [
        t for t in timeline
        if t["action"] in ("commit", "deltacommit", "replacecommit",
                           "logcompaction")
    ]
    if not commits:
        raise HudiError("hudi: nothing to roll back")
    last = commits[-1]
    if last["action"] == "replacecommit":
        raise NotImplementedError(
            "hudi: rollback of a replacecommit is not supported "
            "(replaced-group visibility cannot be safely restored)"
        )
    if len(commits) == 1:
        raise HudiError("hudi: will not roll back the table's only commit")
    target = last["instant"]
    meta = _commit_meta(path, target, last["action"])
    if last["action"] == "commit":
        # compaction: every compacted group needs a pre-image slice
        older: set = set()
        for bf in _list_base_files(path, allow_logs=True):
            if bf["instant"] < target:
                older.add((bf["pp"], bf["file_id"]))
        for pp, stats in (
            meta.get("partitionToWriteStats") or {}
        ).items():
            for s in stats:
                if (pp, s.get("fileId")) not in older:
                    raise HudiError(
                        f"hudi: cannot roll back compaction {target} "
                        f"— file group ({pp!r}, {s.get('fileId')}) "
                        "has no older slice left (cleaned); rollback "
                        "would lose its rows"
                    )
    for pp, stats in (meta.get("partitionToWriteStats") or {}).items():
        for s in stats:
            rel = s.get("path")
            if not rel:
                continue
            fp = os.path.join(path, *rel.split("/"))
            if os.path.exists(fp):
                os.remove(fp)
    hd = _hoodie_dir(path)
    for fname in list(os.listdir(hd)):
        m = re.match(r"^(\d{10,})(?:_(\d+))?\.", fname)
        if m and m.group(1) == target:
            os.remove(os.path.join(hd, fname))
    instant = _next_instant(path)
    with open(os.path.join(hd, f"{instant}.rollback"), "w") as f:
        json.dump({"rolledBackInstant": target}, f)
    return target


def hudi_restore_mor(path: str) -> list[str]:
    """RESTORE a MERGE_ON_READ table to its latest SAVEPOINT: every
    file written by a later commit (per its write stats — log files
    and base files alike) is deleted, those commits' timeline files
    are removed, and a completed `<instant>.restore` lands. Requires
    a savepoint (the clean protection that guarantees the pre-image
    survives). Returns the deleted paths."""
    import re

    from graph_db_clustering_spark.sources.hudi import (
        _hoodie_dir,
        _next_instant,
    )

    timeline = hudi_timeline(path)
    sps = [t["instant"] for t in timeline if t["action"] == "savepoint"]
    if not sps:
        raise HudiError("hudi: restore needs a savepoint")
    sp = max(sps)
    deleted = []
    for t in timeline:
        if t["instant"] <= sp or t["action"] not in (
            "commit", "deltacommit", "replacecommit", "logcompaction"
        ):
            continue
        meta = _commit_meta(path, t["instant"], t["action"])
        for pp, stats in (
            meta.get("partitionToWriteStats") or {}
        ).items():
            for s in stats:
                rel = s.get("path")
                if not rel:
                    continue
                fp = os.path.join(path, *rel.split("/"))
                if os.path.exists(fp):
                    os.remove(fp)
                    deleted.append(fp)
    hd = _hoodie_dir(path)
    for fname in list(os.listdir(hd)):
        m = re.match(r"^(\d{10,})(?:_(\d+))?\.(\w+)", fname)
        if m and m.group(1) > sp and m.group(3) not in (
            "savepoint", "clean", "rollback", "restore"
        ):
            os.remove(os.path.join(hd, fname))
    instant = _next_instant(path)
    with open(os.path.join(hd, f"{instant}.restore"), "w") as f:
        json.dump({"restoredToSavepoint": sp}, f)
    return deleted


def hudi_compact(spark: SparkSession, path: str) -> str:
    """COMPACTION: merge every file slice that has log files into ONE
    fresh base file per group at the compaction instant (a ``commit``
    action, like real Hudi), preserving row meta columns — commit
    times included, which keeps incremental pulls exact. Slices
    without logs are untouched. Old log files stay on disk but leave
    the live slice (they anchor to the previous base instant)."""
    if hudi_properties(path).get("hoodie.table.type") != "MERGE_ON_READ":
        raise HudiError("hudi: compaction applies to MERGE_ON_READ tables")
    slices, _valid = _file_slices(path)
    logged = {(s["pp"], s["fid"]) for s in slices if s["logs"]}
    if not logged:
        raise HudiError(
            "hudi: no file slice has log files — nothing to compact"
        )
    instant = _next_instant(path)
    snap = _mor_snapshot(spark, path, with_groups=True)
    user_cols = [
        c for c in snap.columns
        if c not in _META_COLS and c not in ("_pp", "_fid")
    ]
    tdf = spark.createDataFrame(
        sorted(logged), "_pp string, _fid string"
    )
    out = (
        snap.join(F.broadcast(tdf), ["_pp", "_fid"], "semi")
        .select(
            "_hoodie_commit_time",
            "_hoodie_commit_seqno",
            "_hoodie_record_key",
            "_hoodie_partition_path",
            F.concat(
                F.col("_fid"),
                F.lit(f"_{_WRITE_TOKEN}_{instant}.parquet"),
            ).alias("_hoodie_file_name"),
            *[F.col(c) for c in user_cols],
            "_pp",
            "_fid",
        )
    )
    landed = _stage_write(spark, out, path, instant)
    # fully-deleted groups produce no staged file: an explicit empty
    # base slice makes the delete durable post-compaction
    emptied = sorted(logged - set(landed))
    if emptied:
        import pyarrow.parquet as pq

        by_group = {}
        for bf in _list_base_files(path, allow_logs=True):
            k = (bf["pp"], bf["file_id"])
            if k in emptied and (
                k not in by_group
                or bf["instant"] > by_group[k]["instant"]
            ):
                by_group[k] = bf
        for (pp, fid), bf in sorted(by_group.items()):
            schema = pq.read_schema(bf["abs"])
            rel = (
                f"{pp}/{fid}_{_WRITE_TOKEN}_{instant}.parquet"
                if pp else f"{fid}_{_WRITE_TOKEN}_{instant}.parquet"
            )
            dest = os.path.join(path, *rel.split("/"))
            pq.write_table(schema.empty_table(), dest)
            landed[(pp, fid)] = {
                "path": rel,
                "bytes": os.path.getsize(dest),
                "rows": 0,
            }
    _commit(
        path, instant, landed, "COMPACT",
        action="commit",
        extra={"gdc.compaction": "true"},
    )
    return instant


def hudi_log_compact(
    spark: SparkSession, path: str, min_log_files: int = 2
) -> str:
    """LOG COMPACTION (round 13, write side — the read side landed
    earlier this round): merge each file slice's log chain into ONE
    new log file — an avro data block carrying the latest non-deleted
    event per key plus a HoodieDeleteRecordList block for keys whose
    latest event is a delete — under a completed ``logcompaction``
    timeline action, WITHOUT touching base files (that is what
    distinguishes it from full compaction). Both blocks carry
    COMPACTED_BLOCK_TIMES, so readers order the carried copies at the
    newest compacted instant: the originals lose on the log-version
    tiebreak, later non-compacted updates still win, and incremental
    pulls never re-emit compacted copies (data rows keep their
    ORIGINAL ``_hoodie_commit_time``). The original log files stay on
    disk (they remain the rollback pre-image; the cleaner retires
    them with their slice). Slices with fewer than ``min_log_files``
    log files are untouched — the analog of real Hudi's
    hoodie.log.compaction.blocks.threshold. The merge itself is the
    same distributed plan as a snapshot's log half: executor-side
    mapInPandas decode over the descriptor frame, a per-group
    latest-event window over ONLY the log rows, and an applyInPandas
    encode that stages one metadata-sized file per touched group for
    the driver to rename."""
    import urllib.parse

    if hudi_properties(path).get("hoodie.table.type") != "MERGE_ON_READ":
        raise HudiError(
            "hudi: log compaction applies to MERGE_ON_READ tables"
        )
    slices, valid = _file_slices(path)
    todo = [s for s in slices if len(s["logs"]) >= min_log_files]
    if not todo:
        raise HudiError(
            f"hudi: no file slice has >= {min_log_files} log files — "
            "nothing to log-compact"
        )
    instant = _next_instant(path)
    ginfo = _next_log_versions(path, todo)
    schema = _table_schema(spark, slices)
    user_cols = [
        f.name for f in schema.fields if f.name not in _META_COLS
    ]
    avro_schema = spark_to_avro_schema(T.StructType(
        [T.StructField(c, T.StringType(), False) for c in _META_COLS]
        + [f for f in schema.fields if f.name in user_cols]
    ))
    schema_json = json.dumps(avro_schema)
    log_df = _log_records_df(spark, todo, valid, schema)
    # per-group compacted-instant inventory — drives the ordering
    # header; one tiny aggregate, groups are metadata-sized
    spans = {
        (r["_pp"], r["_fid"]): ",".join(sorted(r["span"]))
        for r in log_df.groupBy("_pp", "_fid")
        .agg(F.collect_set("_gdc_instant").alias("span"))
        .collect()
    }
    latest = _latest_per_key(log_df, per_group=True)

    stage = os.path.join(path, f".stage_{instant}_logc")
    os.makedirs(stage, exist_ok=True)
    token = _WRITE_TOKEN

    def fn(key, pdf):
        import pandas as pd

        pp, fid = key
        base_instant, version = ginfo[(pp, fid)]
        logname = f".{fid}_{base_instant}.log.{version}_{token}"
        hdr = {
            H_INSTANT_TIME: instant,
            H_COMPACTED_BLOCK_TIMES: spans[(pp, fid)],
        }
        pdf = pdf.sort_values("_hoodie_record_key", kind="stable")
        live = pdf[~pdf["_gdc_deleted"]]
        dead = pdf[pdf["_gdc_deleted"]]
        blob = b""
        nrows = 0
        if len(live):
            fields = parse_schema(json.loads(schema_json))
            metas = live[
                [c for c in _META_COLS if c != "_hoodie_file_name"]
            ].to_dict("records")
            rows = []
            for m, vals in zip(metas, _pdf_rows(live, user_cols)):
                rows.append({
                    **{k: (None if v is None else str(v))
                       for k, v in m.items()},
                    "_hoodie_file_name": logname,
                    **vals,
                })
            blob += encode_log_block(
                AVRO_DATA_BLOCK,
                {**hdr, H_SCHEMA: schema_json},
                encode_avro_block_content(fields, rows),
            )
            nrows += len(rows)
        if len(dead):
            blob += encode_log_block(
                DELETE_BLOCK, hdr,
                encode_delete_block_content([
                    (str(k), pp)
                    for k in dead["_hoodie_record_key"]
                ]),
            )
            nrows += len(dead)
        safe = urllib.parse.quote(f"{pp}|{logname}", safe="")
        with open(os.path.join(stage, safe), "wb") as f:
            f.write(blob)
        return pd.DataFrame(
            [[pp, fid, logname, nrows, len(blob)]],
            columns=["pp", "fid", "logname", "rows", "bytes"],
        )

    landed_rows = (
        latest.groupBy("_pp", "_fid")
        .applyInPandas(
            fn,
            "pp string, fid string, logname string, "
            "rows long, bytes long",
        )
        .collect()
    )
    landed = {}
    for r in landed_rows:
        rel = f"{r['pp']}/{r['logname']}" if r["pp"] else r["logname"]
        src = os.path.join(
            stage,
            urllib.parse.quote(f"{r['pp']}|{r['logname']}", safe=""),
        )
        dest = os.path.join(path, *rel.split("/"))
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        os.replace(src, dest)
        landed[(r["pp"], r["fid"])] = {
            "path": rel, "bytes": r["bytes"], "rows": r["rows"],
        }
    try:
        os.rmdir(stage)
    except OSError:
        pass
    _commit(
        path, instant, landed, "LOGCOMPACT",
        action="logcompaction",
        extra={"gdc.logcompaction": "true"},
    )
    return instant
