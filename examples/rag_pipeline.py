"""End-to-end RAG data preparation and hybrid retrieval.

Composes this engine's LLM-data operators into the pipeline a retrieval
stack actually runs, all on the synthetic testdata:

  1. CLEAN     exact dedup -> quality -> language (text.clean_corpus)
  2. CHUNK     greedy sentence packing to a token budget
               (text.chunk_by_sentences — one codegen fold per doc)
  3. SCORE     corpus-trained unigram-LM log-prob filter
               (text.unigram_logprob_scores, the CCNet-style cut)
  4. INDEX     lexical: BM25 postings are computed on the fly per query
               (text.bm25_scores); vector: IVF-PQ build + save
               (similarity.ivfpq_build/save — m bytes per vector)
  5. RETRIEVE  BM25 top-k and ANN top-k for a query, fused with
               reciprocal ranks (similarity.rrf_fuse)

Run:  python examples/rag_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from graph_db_clustering_spark.catalog import load_table  # noqa: E402
from graph_db_clustering_spark.operators import similarity, text  # noqa: E402
from graph_db_clustering_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("rag-pipeline")
    docs = load_table(spark, sf_dir, "documents")

    # 1. clean: dedup + quality/language gate
    kept = text.clean_corpus(docs, "doc_id", "text", min_quality=0.5, lang="en")
    keep_ids = kept.select("doc_id")
    corpus = docs.join(keep_ids, "doc_id", "left_semi")
    print(f"clean: {docs.count()} docs -> {corpus.count()} kept")

    # 2. chunk: derive sentence terminators (synthetic corpus has none),
    #    then greedy-pack sentences into 48-token chunks
    with_sents = corpus.withColumn(
        "text", F.regexp_replace("text", r"(\w+) (\w+) (\w+) ", "$1 $2 $3. ")
    )
    chunks = text.chunk_by_sentences(with_sents, "doc_id", "text", max_tokens=48)
    print(f"chunk: {chunks.count()} chunks, budget 48 tokens")

    # 3. score: unigram-LM log-prob; drop the most surprising 10%
    scored = text.unigram_logprob_scores(corpus, "doc_id", "text")
    cut = scored.approxQuantile("avg_logprob", [0.1], 0.01)[0]
    survivors = scored.filter(F.col("avg_logprob") >= cut)
    print(f"score: LM cut at {cut:.3f} keeps {survivors.count()} docs")

    # 4. vector index: IVF-PQ over the embeddings table
    emb = load_table(spark, sf_dir, "embeddings")
    model, encoded = similarity.ivfpq_build(emb, cells=16, m=8)
    print(
        f"index: IVF-PQ at {model.bytes_per_vector} bytes/vector over "
        f"{encoded.count()} vectors"
    )

    # 5. retrieve: BM25 + ANN, fused by reciprocal rank
    query_text = "spark shuffle window"
    bm25 = (
        text.bm25_scores(docs, "doc_id", "text", query_text)
        .withColumn("qid", F.lit(0))
        .select("qid", F.col("doc_id").alias("nid"), "score")
        .orderBy(F.desc("score"))
        .limit(10)
    )
    qvec = emb.filter(F.col("vec_id") == 0)
    ann = similarity.ivfpq_search(qvec, model, encoded, emb, k=10, nprobe=4).select(
        "qid", "nid", F.col("cosine").alias("score")
    )
    fused = similarity.rrf_fuse([bm25, ann], k=60)
    print(f"retrieve: fused top-5 for {query_text!r} + vector query 0:")
    for r in fused.orderBy(F.desc("rrf_score")).limit(5).collect():
        print(f"   doc/vec {r.nid}: rrf={r.rrf_score:.4f}")
    spark.stop()


if __name__ == "__main__":
    main()
