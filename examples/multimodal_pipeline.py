"""End-to-end multimodal curation: mixed media to a deduplicated,
feature-extracted image corpus.

Composes the engine's multimodal operators the way a vision-data
pipeline chains them, all on synthetic fixtures:

  1. PROBE      container + dimensions from HEADERS only
                (multimodal.image_probe — corrupt files classify,
                never crash)
  2. FILTER     keep decodable containers in a size band
  3. DEDUP      perceptual dHash -> pigeonhole-banded Hamming join ->
                connected duplicate clusters, one survivor each
                (multimodal.dhash/image_near_dups + dedup.cluster_pairs)
  4. FEATURES   decode -> grayscale -> resize -> 7-stat vectors for the
                survivors (multimodal.image_features)
  5. VIDEO      every-Nth-frame sampling over GIF/AVI containers
                (multimodal.frame_sample)

Run:  python examples/multimodal_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from graph_db_clustering_spark.catalog import load_table  # noqa: E402
from graph_db_clustering_spark.operators import multimodal  # noqa: E402
from graph_db_clustering_spark.operators.dedup import cluster_pairs  # noqa: E402
from graph_db_clustering_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("multimodal-pipeline")
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)

    # duplicates planted: every pair of consecutive ids shares an image
    leaders = docs.select(
        F.col("doc_id").alias("leader_id"), F.col("text").alias("ltext")
    )
    grouped = docs.select(
        "doc_id", (F.floor(F.col("doc_id") / 2) * 2).alias("leader_id")
    ).join(leaders, "leader_id")
    imgs = multimodal.synthetic_images_from_documents(
        grouped.select("doc_id", F.col("ltext").alias("text")), "doc_id", "text"
    ).cache()

    # 1-2. header-only probe (raw fixtures probe as unknown containers;
    # a real corpus filters on ('jpeg','png',...) + size bands here)
    probed = multimodal.image_probe(imgs)
    print("containers:", dict(probed.groupBy("container").count().collect()))

    # 3. perceptual dedup -> duplicate clusters -> survivors
    hashes = multimodal.dhash(imgs)
    pairs = multimodal.image_near_dups(hashes, max_hamming=0)
    clusters = cluster_pairs(imgs.select(F.col("image_id")), "image_id", pairs)
    survivors = clusters.filter(F.col("keep")).select("image_id")
    n_imgs, n_keep = imgs.count(), survivors.count()
    print(f"images: {n_imgs}, after perceptual dedup: {n_keep}")

    # 4. feature extraction over survivors only
    feats = multimodal.image_features(
        imgs.join(survivors, "image_id", "leftsemi")
    )
    stats = feats.agg(
        F.round(F.avg("mean"), 2).alias("avg_mean"),
        F.round(F.avg("std"), 2).alias("avg_std"),
    ).first()
    print(f"survivor features: avg_mean={stats.avg_mean} avg_std={stats.avg_std}")

    # 5. the video path over the same corpus rendered as animated GIFs
    vids = multimodal.synthetic_gifs_from_documents(
        docs.filter(F.col("doc_id") % 40 == 0), "doc_id", "text"
    )
    sampled = multimodal.frame_sample(vids, every_n=2)
    print(f"sampled frames: {sampled.count()}")
    spark.stop()


if __name__ == "__main__":
    main()
