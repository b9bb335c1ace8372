"""Streaming vector search: query batches served against a persisted
IVF-PQ index (SURVEY §2.10 + operators/similarity).

The serving shape a vector-search deployment runs: the index is built
and saved once (ivfpq_build -> ivfpq_save), loaded once per stream, and
every arriving micro-batch of query vectors is searched via foreachBatch
calling the batch ivfpq_search — so stream and batch share ONE search
implementation, and the "queries must be broadcastable" contract holds
per micro-batch (exactly the unit it was designed for). Results land in
a parquet sink partitioned by micro-batch id with dynamic partition
overwrite, so a retried batch replaces its own output (the
decontaminate_stream exactly-once pattern).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ann_serve_stream(
    query_stream: DataFrame,
    model,
    codes: DataFrame,
    corpus: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 4,
    refine: int = 4,
):
    """Serve a stream of query vectors against a loaded index. Returns
    the started StreamingQuery (caller awaits). No training or encoding
    ever runs in-stream — the index is frozen (the ivfpq_search
    contract, poison-pinned in tests)."""
    from graph_db_clustering_spark.operators import similarity

    def search_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        hits = similarity.ivfpq_search(
            batch_df,
            model,
            codes,
            corpus,
            id_col=id_col,
            vec_col=vec_col,
            k=k,
            nprobe=nprobe,
            refine=refine,
            exclude_self=False,
        )
        (
            hits.withColumn("__batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch_id")
            .parquet(out_path)
        )

    return (
        query_stream.writeStream.foreachBatch(search_batch)
        .outputMode("update")
        .option("checkpointLocation", os.path.join(checkpoint_dir, "ann_serve"))
        .trigger(availableNow=True)
        .start()
    )


def image_dedup_stream(
    image_stream: DataFrame,
    index_hashes: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    max_hamming: int = 3,
    bands: int = 4,
):
    """Streaming perceptual image dedup: each arriving micro-batch of
    images hashes (multimodal.dhash) and joins against a STATIC indexed
    hash set via the pigeonhole-banded Hamming join — the cross_dedup
    "new crawl vs history" shape for images. Flagged (new_id, index_id,
    hamming) rows land exactly-once per micro-batch (dynamic partition
    overwrite, the decontaminate_stream pattern). The index side is
    prepared once for the stream's lifetime; no training, no all-pairs."""
    from graph_db_clustering_spark.operators import multimodal

    if max_hamming > bands - 1:
        raise ValueError(
            f"max_hamming={max_hamming} needs bands >= {max_hamming + 1}"
        )
    from graph_db_clustering_spark.operators import pins

    idx = index_hashes.persist()
    pins.adopt("stream_imgdedup", idx)
    idx.count()

    def check_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        new_hashes = multimodal.dhash(batch_df)
        flagged = multimodal.image_near_dups_against(
            new_hashes, idx, max_hamming=max_hamming, bands=bands
        )
        (
            flagged.withColumn("__batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch_id")
            .parquet(out_path)
        )

    return (
        image_stream.writeStream.foreachBatch(check_batch)
        .outputMode("update")
        .option("checkpointLocation", os.path.join(checkpoint_dir, "img_dedup"))
        .trigger(availableNow=True)
        .start()
    )
