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
