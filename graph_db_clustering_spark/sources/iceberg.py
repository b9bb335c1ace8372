"""Minimal Apache Iceberg table READER: metadata + Avro-manifest
replay, no iceberg-spark runtime.

The Iceberg spec (iceberg.apache.org/spec — public) stores a table as
parquet data files plus a metadata tree: `metadata/vN.metadata.json`
(current snapshot pointer) -> a manifest LIST (Avro) -> manifest FILES
(Avro) -> data-file entries. The live file set of a snapshot is every
manifest entry with status ADDED(1)/EXISTING(0); DELETED(2) entries
drop out. All the Avro plumbing is the repo's own pure-Python
object-container codec (sources/avro) — the same machinery that makes
the Avro source work makes Iceberg's metadata readable.

Scope (loud gates): unpartitioned specs only, data files only
(position/equality DELETE files -> NotImplementedError — correct
merge-on-read needs the delete application the spec defines),
parquet file format only.

Like sources/delta: only the KB-scale metadata replays on the driver;
the data scan is handed to the native parquet reader, fully
distributed.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession

from graph_db_clustering_spark.sources.avro import decode_container


class IcebergError(ValueError):
    pass


def _strip_scheme(p: str) -> str:
    return re.sub(r"^file:/{0,2}", "/", p) if p.startswith("file:") else p


def _metadata_file(path: str) -> str:
    mdir = os.path.join(path, "metadata")
    hint = os.path.join(mdir, "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as f:
            v = f.read().strip()
        return os.path.join(mdir, f"v{v}.metadata.json")
    try:
        cands = [
            n for n in os.listdir(mdir) if re.fullmatch(r"v\d+\.metadata\.json", n)
        ]
    except FileNotFoundError:
        raise IcebergError(f"no metadata directory under {path}") from None
    if not cands:
        raise IcebergError(f"no vN.metadata.json under {mdir}")
    return os.path.join(mdir, max(cands, key=lambda n: int(n[1:].split(".")[0])))


def _avro_rows(path: str) -> list[dict]:
    with open(_strip_scheme(path), "rb") as f:
        _fields, rows = decode_container(f.read())
    return rows


def iceberg_live_files(path: str, snapshot_id: int | None = None) -> list[str]:
    """Replay metadata -> manifest list -> manifests into the live
    data-file paths (absolute, scheme-stripped) for the current or a
    pinned snapshot (time travel)."""
    with open(_metadata_file(path)) as f:
        meta = json.load(f)
    for spec in meta.get("partition-specs", []) or []:
        if spec.get("fields"):
            raise NotImplementedError("iceberg: partitioned tables not supported")
    snaps = meta.get("snapshots", []) or []
    if not snaps:
        raise IcebergError(f"iceberg: no snapshots in {path}")
    target = (
        snapshot_id
        if snapshot_id is not None
        else meta.get("current-snapshot-id")
    )
    snap = next((s for s in snaps if s["snapshot-id"] == target), None)
    if snap is None:
        raise IcebergError(f"iceberg: snapshot {target} not found")
    out = []
    for m in _avro_rows(snap["manifest-list"]):
        if m.get("content", 0) not in (0, None):
            raise NotImplementedError(
                "iceberg: delete manifests not supported (merge-on-read)"
            )
        for entry in _avro_rows(m["manifest_path"]):
            if entry.get("status") == 2:  # DELETED
                continue
            df = entry["data_file"]
            if df.get("content", 0) not in (0, None):
                raise NotImplementedError(
                    "iceberg: delete files not supported (merge-on-read)"
                )
            fmt = (df.get("file_format") or "").upper()
            if fmt != "PARQUET":
                raise NotImplementedError(f"iceberg: file format {fmt!r}")
            out.append(_strip_scheme(df["file_path"]))
    return sorted(set(out))


def read_iceberg(
    spark: SparkSession, path: str, snapshot_id: int | None = None
) -> DataFrame:
    """Read an Iceberg table at the current (or pinned) snapshot via
    native parquet scans over the manifest-resolved live files."""
    files = iceberg_live_files(path, snapshot_id)
    if not files:
        raise IcebergError(f"iceberg: snapshot has no data files at {path}")
    return spark.read.parquet(*files)
