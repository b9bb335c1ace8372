"""End-to-end crawl ingestion: WARC shards to a deduplicated text corpus.

The Common Crawl-shaped front half of a pretraining data pipeline,
composed from this engine's operators, all on the synthetic testdata:

  1. SHARDS    documents become gzip member-per-record .warc.gz blobs
               (sources/warc.synthetic_warc_from_documents — stands in
               for a crawl's shard directory; with real files this step
               is sources/warc.read_warc over binaryFile)
  2. PARSE     record framing + HTTP head split, response records only
               (sources/warc.parse_warc_records — mapInPandas, the
               shard is the unit of parallelism)
  3. URL DEDUP canonicalize target URIs and keep one row per canonical
               URL (operators/web.url_dedup — the pre-content pass)
  4. EXTRACT   HTML -> visible text (text.html_text_expr, codegen)
  5. CLEAN     quality / language / C4-rule gate (text.clean_corpus)
  6. NEAR-DUP  MinHash+LSH near-duplicate clusters, survivors only
               (dedup.near_dup_clusters)
  7. TOKENS    trained-BPE token counts for budget accounting
               (text.bpe_train / bpe_encode)

Run:  python examples/crawl_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from graph_db_clustering_spark.catalog import load_table  # noqa: E402
from graph_db_clustering_spark.operators import dedup, text, web  # noqa: E402
from graph_db_clustering_spark.session import get_spark  # noqa: E402
from graph_db_clustering_spark.sources import warc  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("crawl-pipeline")
    docs = load_table(spark, sf_dir, "documents")

    # 1-2. shard + parse (real deployments: warc.read_warc(spark, dir))
    shards = warc.synthetic_warc_from_documents(docs, "doc_id", "text")
    recs = warc.parse_warc_records(shards, record_types=("response",))
    print(f"records parsed: {recs.count()}")

    # 3. URL-keyed dedup before touching any content. row_id must be
    # DETERMINISTIC (the dedup semi-join evaluates the plan twice;
    # monotonically_increasing_id would hand the same row different ids
    # per evaluation) — the WARC record id is stable and unique
    pages = recs.select(
        F.xxhash64("record_id").alias("row_id"),
        "target_uri",
        F.col("payload").cast("string").alias("html"),
    )
    canon = web.canonicalize_urls(pages, "target_uri")
    kept_urls = canon.join(
        web.url_dedup(canon, "row_id", "target_uri")
        .select(F.col("keep_id").alias("row_id")),
        "row_id",
        "leftsemi",
    )

    # 4. extract visible text (codegen regexp chain)
    extracted = kept_urls.select(
        F.regexp_extract("target_uri", r"/doc/(\d+)$", 1)
        .cast("long")
        .alias("doc_id"),
        text.html_text_expr(F.col("html")).alias("text"),
    )

    # 5. quality / language gate (clean_corpus returns per-doc metrics;
    # semi-join its surviving ids back to the extracted text)
    gate = text.clean_corpus(
        extracted, "doc_id", "text", min_quality=0.5, lang="en"
    )
    cleaned = extracted.join(gate.select("doc_id"), "doc_id", "leftsemi")
    print(f"after clean_corpus: {cleaned.count()}")

    # 6. near-duplicate clusters -> survivors
    survivors = dedup.near_dup_clusters(
        cleaned, "doc_id", "text", threshold=0.7
    )
    keep = cleaned.join(
        survivors.filter(F.col("keep")).select("doc_id"),
        "doc_id",
        "leftsemi",
    )

    # 7. token accounting with a corpus-trained BPE
    merges = text.bpe_train(keep, "text", n_merges=100)
    enc = text.bpe_encode(keep, "doc_id", "text", merges)
    total = enc.agg(F.sum("n_tokens").alias("t")).first()["t"]
    print(f"surviving docs: {keep.count()}, BPE tokens: {total}")
    enc.select("id", "n_tokens").orderBy(F.desc("n_tokens")).show(5)
    spark.stop()


if __name__ == "__main__":
    main()
