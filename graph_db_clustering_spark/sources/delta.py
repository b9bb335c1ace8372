"""Minimal Delta Lake table READER: transaction-log replay, no
delta-spark dependency.

The Delta protocol (delta.io, PROTOCOL.md — public spec) stores a table
as parquet data files plus an ordered `_delta_log/` of JSON commits;
each commit is newline-delimited actions, and the live file set at
version N is (all `add` paths) minus (all `remove` paths) across
commits 0..N. Optional parquet checkpoints compact the log; the
`_last_checkpoint` pointer names the newest one.

Scope (loud gates, not silent wrong answers):
- unpartitioned tables (an `add` carrying non-empty partitionValues
  raises NotImplementedError — partition-column injection needs
  per-file column synthesis)
- reader protocol 1 (deletion vectors / column mapping raise)
- checkpoint files ARE supported (single-part classic checkpoints)

This is the interop path for "my corpus is a Delta table": list the
live files from the log, then hand the parquet paths to Spark's native
reader — the scan itself stays fully distributed and pruned; only the
log replay (KBs of JSON per commit) happens on the driver, exactly as
delta-spark's own Snapshot computation does.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


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


def _checkpoint_version(path: str) -> int | None:
    try:
        with open(os.path.join(_log_dir(path), "_last_checkpoint")) as f:
            return int(json.load(f)["version"])
    except FileNotFoundError:
        return None


def _apply_action(act: dict, files: dict) -> None:
    if "add" in act and act["add"] is not None:
        a = act["add"]
        if a.get("partitionValues"):
            raise NotImplementedError(
                "delta: partitioned tables not supported (partitionValues "
                f"present on {a['path']!r})"
            )
        if a.get("deletionVector"):
            raise NotImplementedError("delta: deletion vectors not supported")
        files[a["path"]] = True
    if "remove" in act and act["remove"] is not None:
        files.pop(act["remove"]["path"], None)
    if "protocol" in act and act["protocol"] is not None:
        if act["protocol"].get("minReaderVersion", 1) > 1:
            raise NotImplementedError(
                "delta: reader protocol "
                f"{act['protocol']['minReaderVersion']} not supported"
            )


def delta_live_files(path: str, version: int | None = None) -> list[str]:
    """Replay the log (checkpoint + JSON commits) up to `version`
    (default: latest) and return the live data-file paths, table-
    relative, sorted."""
    versions = _commit_versions(path)
    if not versions:
        raise DeltaError(f"no _delta_log commits under {path}")
    target = versions[-1] if version is None else version
    if version is not None and version not in versions:
        cp = _checkpoint_version(path)
        if cp is None or version < cp:
            raise DeltaError(f"delta: version {version} not in log {versions}")
    files: dict = {}
    start = 0
    cp = _checkpoint_version(path)
    if cp is not None and cp <= target:
        import pyarrow.parquet as pq

        cp_file = os.path.join(_log_dir(path), f"{cp:020d}.checkpoint.parquet")
        tbl = pq.read_table(cp_file).to_pylist()
        for row in tbl:
            _apply_action({k: v for k, v in row.items() if v is not None}, files)
        start = cp + 1
    for v in versions:
        if v < start or v > target:
            continue
        with open(os.path.join(_log_dir(path), f"{v:020d}.json")) as f:
            for line in f:
                line = line.strip()
                if line:
                    _apply_action(json.loads(line), files)
    return sorted(files)


def read_delta(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a Delta table at `version` (time travel; default latest) by
    handing the log's live file list to the native parquet reader —
    the scan stays distributed/pruned; only the log replays on the
    driver."""
    rel = delta_live_files(path, version)
    if not rel:
        raise DeltaError(f"delta: version has no live files at {path}")
    return spark.read.parquet(*[os.path.join(path, p) for p in rel])


def delta_append(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    stats_cols: list | None = None,
) -> int:
    """Append `df` to a Delta table as one commit (single-writer
    contract, like maintenance.snapshot_write): the data lands as
    parquet part files under the table root, then one JSON commit
    records an `add` per file — with per-file min/max/nullCount STATS
    for `stats_cols`, the metadata that makes file skipping work.
    Creates the table (protocol + metaData actions) on first commit.
    Returns the committed version."""
    os.makedirs(_log_dir(path), exist_ok=True)
    try:
        versions = _commit_versions(path)
    except DeltaError:
        versions = []
    version = (versions[-1] + 1) if versions else 0
    import uuid

    stage = os.path.join(path, f".stage_{uuid.uuid4().hex[:8]}")
    df.write.mode("overwrite").parquet(stage)
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
                    "partitionColumns": [],
                }
            }
        )
    import pyarrow.parquet as pq

    for fname in sorted(os.listdir(stage)):
        if not fname.endswith(".parquet"):
            continue
        final = f"part-{version:05d}-{fname}"
        src = os.path.join(stage, fname)
        add = {
            "path": final,
            "partitionValues": {},
            "size": os.path.getsize(src),
            "dataChange": True,
        }
        if stats_cols:
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
            add["stats"] = json.dumps(
                {
                    "numRecords": md.num_rows,
                    "minValues": mins,
                    "maxValues": maxs,
                    "nullCount": nulls,
                }
            )
        actions.append({"add": add})
        os.replace(src, os.path.join(path, final))
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
    """Per-live-file stats from the log: [{'path', 'numRecords',
    'minValues', 'maxValues', 'nullCount'}] (stats-less files carry
    None). This is the file-skipping substrate."""
    live = set(delta_live_files(path, version))
    out: dict = {}
    versions = _commit_versions(path)
    target = versions[-1] if version is None else version
    for v in versions:
        if v > target:
            continue
        with open(os.path.join(_log_dir(path), f"{v:020d}.json")) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                act = json.loads(line)
                a = act.get("add")
                if a and a["path"] in live:
                    st = json.loads(a["stats"]) if a.get("stats") else None
                    out[a["path"]] = {"path": a["path"], **(st or {
                        "numRecords": None, "minValues": None,
                        "maxValues": None, "nullCount": None})}
    return [out[p] for p in sorted(out)]


def read_delta_pruned(
    spark: SparkSession,
    path: str,
    column: str,
    lo,
    hi,
    version: int | None = None,
) -> tuple[DataFrame, int, int]:
    """File skipping: read only the live files whose [min, max] range
    for `column` intersects [lo, hi] (files without stats are kept —
    skipping must never drop unknown data). Returns (df, files_read,
    files_skipped); the caller still applies the row-level filter —
    this prunes I/O, it does not replace the predicate. The 100 TB
    win: a range query on a clustered column opens a handful of files
    instead of the table."""
    stats = delta_file_stats(path, version)
    keep, skipped = [], 0
    for s in stats:
        mv, xv = s.get("minValues") or {}, s.get("maxValues") or {}
        try:
            disjoint = (
                column in mv and column in xv
                and (xv[column] < lo or mv[column] > hi)
            )
        except TypeError:
            disjoint = False  # incomparable stat types: never skip
        if disjoint:
            skipped += 1
            continue
        keep.append(s["path"])
    if not keep:
        raise DeltaError("delta: every file pruned — empty selection")
    df = spark.read.parquet(*[os.path.join(path, p) for p in keep])
    return df, len(keep), skipped
