"""Snapshot maintenance: keyed upsert (MERGE emulation) over parquet.

The reference mutates node properties in place with per-row Cypher SET
statements (image_classification.py:499-503). Parquet snapshots are
immutable, so the engine's property update is copy-on-write MERGE:
new snapshot = (current ANTI-JOIN updated keys) UNION updates, written to
a fresh directory and atomically swapped in. Batched and columnar — never
per-row — and the anti-join/union is one distributed plan. (On a lakehouse
deployment the same call maps onto Delta/Iceberg MERGE INTO, which adds
file-level pruning; the semantics here are identical.)
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def upsert_parquet(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
) -> None:
    """MERGE: rows in `updates` replace current rows with the same key;
    unmatched keys are inserted. Swap is write-to-sibling + rename, so a
    failure mid-write leaves the current snapshot untouched (readers of
    the old path are unaffected; this is snapshot isolation at directory
    granularity, the same contract GraphStore gives)."""
    current = spark.read.parquet(path)
    missing = set(key_cols) - set(current.columns)
    if missing:
        raise ValueError(f"key columns not in snapshot: {sorted(missing)}")
    kept = current.join(updates.select(*key_cols), key_cols, "left_anti")
    merged = kept.unionByName(updates, allowMissingColumns=False)

    tmp = f"{path}.__merge_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    old = f"{path}.__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)


def delete_where(
    spark: SparkSession, path: str, condition
) -> None:
    """Keyed/predicate delete with the same copy-on-write swap
    (DETACH DELETE analog at row granularity, database.py:42-48)."""
    current = spark.read.parquet(path)
    remaining = current.filter(~condition)
    tmp = f"{path}.__del_{uuid.uuid4().hex[:8]}"
    remaining.write.mode("overwrite").parquet(tmp)
    old = f"{path}.__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite a parquet dataset into
    ceil(total_bytes / target_bytes) evenly sized files with the same
    copy-on-write swap as upsert_parquet. Returns the new file count.

    The operational story at scale: streaming/foreachBatch sinks and
    fine-grained upserts accumulate small files, and every downstream
    scan then pays per-file open/footer costs plus tiny tasks.
    Compaction is the standard lakehouse OPTIMIZE pass; target_bytes
    ~= one HDFS/object-store block keeps scans block-aligned."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, -(-total // target_bytes))
    current = spark.read.parquet(path)
    tmp = f"{path}.__compact_{uuid.uuid4().hex[:8]}"
    current.repartition(n_files).write.mode("overwrite").parquet(tmp)
    old = f"{path}.__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n_files
