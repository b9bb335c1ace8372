"""File-source replay harness for the `events` table (SURVEY §2.10, §5.2.5).

The reference claims Kafka streaming but contains zero streaming code
(README.md:2; verified by full reads of all five source files). Here the
`events` testdata becomes a Structured Streaming source by staging it as a
sequence of time-ordered parquet chunks; `maxFilesPerTrigger=1` then replays
arrival in timestamp order, one chunk per micro-batch — which is what makes
watermark/late-data semantics testable deterministically.

On a real deployment the same transformations run unchanged over
``spark.readStream.format("kafka")``; the file source is the replay/test
skin, not a different engine path (Structured Streaming treats both as
incremental sources of the same unbounded table).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession

from graph_db_clustering_spark.catalog import load_table


def stage_table_replay(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    order_col: str,
    out_dir: str,
    num_chunks: int = 8,
) -> str:
    """Write any catalog table as ``num_chunks`` range-ordered parquet
    files under ``out_dir`` for file-source replay. repartitionByRange
    (order_col) gives contiguous ordered slices; with lexicographic file
    listing + one file per trigger the stream sees (approximately)
    arrival order — for a time column that makes watermarks advance
    monotonically (deterministic replay, SURVEY §5.2.5); for an id
    column (e.g. a `documents` ingest replay) it just pins batch
    composition."""
    df = load_table(spark, sf_dir, table)
    (
        df.repartitionByRange(num_chunks, order_col)
        .sortWithinPartitions(order_col)
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    # The file source replays in modification-time order, and one write
    # gives every part file the same mtime — which would make chunk order
    # (and therefore watermark advancement) nondeterministic. Part names
    # are range-ordered (partition i = i-th ts slice), so stamping strictly
    # increasing mtimes in name order pins arrival order = time order.
    parts = sorted(
        f for f in os.listdir(out_dir) if f.startswith("part-") and f.endswith(".parquet")
    )
    base = int(time.time()) - len(parts)
    for i, name in enumerate(parts):
        os.utime(os.path.join(out_dir, name), (base + i, base + i))
    return out_dir


def stage_replay_dir(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    num_chunks: int = 8,
) -> str:
    """The `events` replay (original entry point): time-range chunks with
    a proper microsecond TimestampType `ts` (the catalog's nanosecond
    normalization happens at staging, once), so the streaming reader
    needs no legacy confs."""
    return stage_table_replay(spark, sf_dir, "events", "ts", out_dir, num_chunks)


def read_table_stream(
    spark: SparkSession, replay_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Open any staged replay directory as a streaming DataFrame (schema
    from a batch peek at the same files, as file sources require an
    explicit schema)."""
    schema = spark.read.parquet(replay_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(replay_dir)
    )


# Back-compat name: the events replay predates the generic form.
read_events_stream = read_table_stream


def run_available_now(
    stream_df: DataFrame,
    output_mode: str,
    query_name: str,
    checkpoint_dir: str,
) -> DataFrame:
    """Run a streaming DataFrame to completion (Trigger.AvailableNow) into
    an in-memory sink and return the final result as a batch DataFrame.

    AvailableNow processes all currently-available files in
    maxFilesPerTrigger-sized micro-batches and then stops — replay-to-end
    with real incremental state semantics (watermarks advance between
    batches exactly as they would live). The memory sink is the test skin;
    production sinks go through ``writeStream.foreachBatch`` /
    ``toParquetSink`` below.
    """
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", os.path.join(checkpoint_dir, query_name))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)


def to_parquet_sink(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    output_mode: str = "append",
):
    """foreachBatch parquet sink (SURVEY §2.10): every micro-batch reuses
    the exact batch write path, so batch and streaming outputs share one
    format/layout. Returns the started StreamingQuery (caller awaits)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(path)

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def exactly_once_batch_writer(path: str):
    """The per-batch writer behind ``to_exactly_once_parquet_sink``,
    exposed so crash-replay tests can drive it directly. Returns a
    ``(batch_df, batch_id) -> None`` callable implementing the
    idempotent commit protocol described there."""
    import glob
    import json
    import shutil

    txn = os.path.join(path, "_txn")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(txn, f"{batch_id:010d}.json")
        if os.path.exists(marker):
            return  # replayed batch id: already committed, skip
        os.makedirs(path, exist_ok=True)
        os.makedirs(txn, exist_ok=True)
        stage = os.path.join(path, f".stage_{batch_id:010d}")
        batch_df.write.mode("overwrite").parquet(stage)
        names = []
        for i, src in enumerate(sorted(
            glob.glob(os.path.join(stage, "*.parquet"))
        )):
            # deterministic batch-scoped names: a retry after a crash
            # between renames and the marker OVERWRITES the same
            # destinations instead of adding duplicates
            name = f"b{batch_id:010d}-{i:05d}.parquet"
            os.replace(src, os.path.join(path, name))
            names.append(name)
        shutil.rmtree(stage, ignore_errors=True)
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"batch_id": batch_id, "files": names}, f)
        os.replace(tmp, marker)  # the atomic commit point

    return write_batch


def to_exactly_once_parquet_sink(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    output_mode: str = "append",
):
    """EXACTLY-ONCE foreachBatch parquet sink (round 14, VERDICT r13
    #9 — the production streaming-sink contract). Structured
    Streaming's foreachBatch is only AT-LEAST-ONCE: after a crash
    between the user write and the checkpoint commit, the next run
    REPLAYS the same batch_id. This sink makes the write idempotent
    with a per-batch transaction log under ``<path>/_txn``:

      1. a marker file ``_txn/<batch_id>.json`` is the commit point —
         a replayed batch id whose marker exists is skipped entirely;
      2. data lands via stage-then-rename with DETERMINISTIC
         batch-scoped file names, so a retry that died between
         renames and the marker overwrites the same destinations
         rather than appending duplicates;
      3. the marker (written atomically via rename) lists the batch's
         files — ``read_exactly_once`` scans only marker-listed
         files, so readers never see a torn uncommitted batch.

    This is the same commit discipline every transactional lakehouse
    sink uses (Delta's txn action keyed by appId/batchId); at scale
    the txn dir stays metadata-sized (one tiny JSON per micro-batch)
    and the data write remains fully distributed. Returns the started
    StreamingQuery (caller awaits)."""
    return (
        stream_df.writeStream.foreachBatch(exactly_once_batch_writer(path))
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_exactly_once(spark: SparkSession, path: str) -> DataFrame:
    """Read the COMMITTED contents of an exactly-once sink directory:
    only files listed by `_txn` markers are scanned, so a crashed
    half-renamed batch is invisible until its marker lands."""
    import json

    txn = os.path.join(path, "_txn")
    files: list[str] = []
    if os.path.isdir(txn):
        for m in sorted(os.listdir(txn)):
            if not m.endswith(".json"):
                continue
            with open(os.path.join(txn, m)) as f:
                files += [
                    os.path.join(path, n) for n in json.load(f)["files"]
                ]
    if not files:
        raise ValueError(
            f"exactly-once sink at {path} has no committed batches"
        )
    return spark.read.parquet(*files)
