"""Build-once / serve-many ANN over an embedding column: the deployment
shape for similarity search at 100 TB scale.

    ivfpq_build   two corpus scans total: a fixed-size training sample
                  (driver k-means for coarse cells + PQ codebooks, the
                  FAISS convention) and ONE fused assign+encode
                  mapInPandas pass -> m bytes per vector
    ivfpq_save    codes parquet PARTITIONED BY cell + one tiny model row
    ivfpq_load    model row to the driver (it is what gets broadcast);
                  codes stay a lazy partitioned scan
    ivfpq_search  per query batch: probed-cell partition pruning, ADC
                  scan over codes only (LUTs computed executor-side from
                  the broadcast model), exact re-rank of refine*k rows

Query latency against the saved index is benchmarked as the
`ann_ivfpq_serve` headline in bench.py; identity with the one-shot
ivfpq_topk and the no-retraining guarantee are pinned in
tests/test_llmdata.py.

Run:  python examples/ann_serving.py [sf_dir] [index_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graph_db_clustering_spark.catalog import load_table
from graph_db_clustering_spark.operators import similarity
from graph_db_clustering_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    index = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(tempfile.gettempdir(), "ann_serving_example", "index")
    )
    spark = get_spark("ann-serving-example")
    emb = load_table(spark, sf_dir, "embeddings")

    # ---- offline: build + persist (pay once per corpus) -------------------
    model, encoded = similarity.ivfpq_build(emb, cells=16, m=8)
    similarity.ivfpq_save(model, encoded, index)
    print(f"index written to {index} ({encoded.count()} vectors, m=8 bytes each)")

    # ---- online: load + serve query batches (pay per batch) ---------------
    served_model, codes = similarity.ivfpq_load(spark, index)
    queries = emb.filter(F.col("vec_id") < 5)
    hits = similarity.ivfpq_search(
        queries, served_model, codes, emb, k=3, nprobe=4, refine=4
    ).orderBy("qid", "rk")
    hits.show(15, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
