"""Streaming CDC materialization: a change-data-capture stream applied
to a versioned snapshot store (round 7).

The lakehouse-standard shape (Delta/Iceberg MERGE-per-micro-batch,
Debezium at the front): each micro-batch of I/U/D change rows is
collapsed latest-wins and applied to the CURRENT snapshot via the
batch maintenance.cdc_apply — stream and batch share ONE merge
implementation, the ann_serve_stream / cross-dedup discipline — and
the result commits as snapshot version N+1 through
maintenance.snapshot_write, so every micro-batch is a time-travelable
version and a crashed write never corrupts the committed pointer.

Exactly-once: snapshot_write flips the _LATEST pointer only after the
full version directory lands, and an _APPLIED_BATCH marker skips
batches a previous attempt committed. The one uncovered window — a
crash between the snapshot commit and the marker write — is still
safe because re-applying the SAME latest-wins change set to the
already-merged snapshot is a semantic no-op (upserts replace rows
with identical rows, deletes hit absent keys); the retry just burns
one redundant version. Sequential by contract (single-writer
snapshots).

Scale shape: per batch, one hash aggregate over the batch's changes
(latest-wins, map-side partials) + one key-keyed anti-join against
the snapshot — cost scales with batch + snapshot size, exactly the
MERGE cost on a real table format; state lives in the snapshot store,
not the stream checkpoint.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from graph_db_clustering_spark.operators import maintenance


def cdc_stream(
    changes_stream: DataFrame,
    snapshot_path: str,
    initial_snapshot: DataFrame,
    key_col: str,
    seq_col: str,
    checkpoint_dir: str,
    op_col: str = "op",
):
    """Attach a CDC change stream to a versioned snapshot store.

    ``snapshot_path`` is a maintenance.snapshot_* directory; if it has
    no committed version yet, ``initial_snapshot`` is written as v=1
    before the stream starts. Returns the started StreamingQuery
    (caller awaits); read the result with maintenance.snapshot_read
    (any version = the table as of that micro-batch)."""
    spark = initial_snapshot.sparkSession
    if maintenance.latest_version(snapshot_path) == 0:
        maintenance.snapshot_write(initial_snapshot, snapshot_path)

    applied_marker = os.path.join(snapshot_path, "_APPLIED_BATCH")

    def last_applied() -> int:
        try:
            with open(applied_marker) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return -1

    def step(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        if int(batch_id) <= last_applied():
            return  # committed by a previous attempt — idempotent retry
        current = maintenance.snapshot_read(spark, snapshot_path)
        merged = maintenance.cdc_apply(
            current, batch_df, key_col, seq_col, op_col
        )
        maintenance.snapshot_write(merged, snapshot_path)
        tmp = applied_marker + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(int(batch_id)))
        os.replace(tmp, applied_marker)

    return (
        changes_stream.writeStream.foreachBatch(step)
        .outputMode("update")
        .option(
            "checkpointLocation", os.path.join(checkpoint_dir, "cdc_stream")
        )
        .trigger(availableNow=True)
        .start()
    )
