"""Streaming variants of the training-data pipeline ops (SURVEY §2.10 ×
operators/traindata): incoming documents scrubbed, quality-filtered, and
checked against a static eval set as they arrive.

Two execution skins, chosen by what the op needs:

- **In-plan** (pii_scrub, clean/quality filters, text stats): these are
  pure codegen projections/filters, so the *same* batch functions apply
  unchanged to a streaming DataFrame — Structured Streaming's
  unbounded-table model. No wrapper code exists for them on purpose;
  ``scrub_stream`` below is the composition used by the pipeline test.
- **foreachBatch** (decontaminate): per-document contamination counts are
  a join + per-doc aggregate. Each document arrives as exactly ONE row,
  so the computation needs zero cross-batch state — running the batch
  ``decontaminate`` inside ``foreachBatch`` is exact (union of per-batch
  outputs == the batch output on the full corpus) and reuses the batch
  plan verbatim, broadcast-size guard included. This is the standard
  production pattern for stream steps with batch-only semantics and is
  how the pipeline stays one code path for both modes.

At 100 TB/day ingest the foreachBatch step inherits the batch operator's
scale posture: the train side (one micro-batch) is scanned once and never
shuffled; only the matching grams shuffle for the per-doc count.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from pyspark.sql import functions as F

from graph_db_clustering_spark.operators.traindata import (
    decontaminate_against,
    eval_gram_set,
    pii_scrub,
)


def scrub_stream(
    doc_stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_chars: int = 1,
) -> DataFrame:
    """PII-scrub + trivial-length filter applied IN the streaming plan
    (stateless projection — append mode, no watermark, no state store).
    Returns (id_col, scrubbed, n_<label>...) exactly like the batch op."""
    return pii_scrub(
        doc_stream.filter(f"length({text_col}) >= {min_chars}"), id_col, text_col
    )


def decontaminate_stream(
    doc_stream: DataFrame,
    eval_df: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    max_broadcast_grams: int = 5_000_000,
):
    """Run eval-set decontamination over a document stream: every
    micro-batch goes through the batch decontamination core (broadcast
    eval grams, guard-protected) and contaminated (id, n_shared) rows
    land in a parquet sink partitioned by micro-batch id. Exact, not
    approximate: a document is wholly contained in one row, so per-doc
    counts need no cross-batch state.

    Exactly-once output despite foreachBatch's at-least-once contract:
    each batch writes mode('overwrite') with dynamic partition overwrite
    into its own ``__batch_id=<id>`` partition, so a retried/recovered
    micro-batch *replaces* its partition instead of appending duplicate
    rows. Readers ``spark.read.parquet(out_path)`` as usual (the
    partition column is internal; drop it on read if undesired).

    The eval side is prepared ONCE for the stream's lifetime: the gram
    set is persisted and size-checked here, not inside foreachBatch —
    otherwise every micro-batch would re-run the eval explode+distinct
    scan just to re-answer the same broadcast-vs-shuffle question. The
    pin is registered in the shared bounded-accretion registry (r15):
    a repeat call releases the predecessor (previously it accreted one
    pin per call, forever), and the between-queries sweep drops the last
    one after the availableNow stream has drained.

    Returns the started StreamingQuery (caller awaits). AvailableNow
    trigger: drains everything staged, then stops — same harness contract
    as replay.to_parquet_sink."""
    from graph_db_clustering_spark.operators import pins

    eval_grams = eval_gram_set(eval_df, text_col, n).persist()
    pins.adopt("stream_decontam", eval_grams)
    broadcast_ok = eval_grams.count() <= max_broadcast_grams

    def check_batch(batch_df: DataFrame, batch_id: int) -> None:
        flagged = decontaminate_against(
            batch_df, eval_grams, broadcast_ok, id_col, text_col, n
        )
        (
            flagged.withColumn("__batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch_id")
            .parquet(out_path)
        )

    return (
        doc_stream.writeStream.foreachBatch(check_batch)
        .outputMode("update")
        .option("checkpointLocation", os.path.join(checkpoint_dir, "decontam"))
        .trigger(availableNow=True)
        .start()
    )


def near_dup_stream(
    doc_stream: DataFrame,
    corpus_df: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
):
    """Near-dup-check a document stream against a STATIC indexed corpus
    (the "dedup the new crawl against history" step): every micro-batch
    runs the batch cross-corpus core (operators/dedup.near_dups_against)
    against a band index built ONCE for the stream's lifetime, and
    (new_id, corpus_id, jaccard) hits land per-batch in a parquet sink.

    Exact, not approximate, for the same reason as decontaminate_stream:
    a document is wholly contained in one row, so per-batch outputs union
    to exactly the batch answer on the full stream side — no cross-batch
    state. Exactly-once via per-__batch_id dynamic partition overwrite.

    The index (buckets + shingles) is persisted here, not rebuilt per
    micro-batch — the corpus side is scanned once ever, mirroring
    ivfpq_save/ivfpq_load's build-once/serve-many contract. Registered
    in the shared bounded-accretion registry (r15): a repeat call
    releases the predecessor's index pins."""
    from graph_db_clustering_spark.operators import pins
    from graph_db_clustering_spark.operators.dedup import (
        build_band_index,
        near_dups_against,
    )

    buckets, shingles = build_band_index(
        corpus_df, id_col, text_col, n, num_hashes, bands, seed
    )
    buckets = buckets.persist()
    shingles = shingles.persist()
    pins.adopt("stream_neardup", buckets, shingles)
    buckets.count(), shingles.count()  # materialize before the stream starts

    def check_batch(batch_df: DataFrame, batch_id: int) -> None:
        # cache=False: a persist here would never be released and one
        # pinned signatures DataFrame would accrete per micro-batch
        hits = near_dups_against(
            batch_df, buckets, shingles, id_col, text_col,
            threshold, n, num_hashes, bands, seed, cache=False,
        )
        (
            hits.withColumn("__batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch_id")
            .parquet(out_path)
        )

    return (
        doc_stream.writeStream.foreachBatch(check_batch)
        .outputMode("update")
        .option("checkpointLocation", os.path.join(checkpoint_dir, "neardup"))
        .trigger(availableNow=True)
        .start()
    )
