"""End-to-end pretraining-data pipeline over the documents table: every
stage is one of the engine's operators, composed the way a 100 TB corpus
run would chain them — each stage a distributed plan, nothing but stage
counts ever reaching the driver.

    raw documents
      -> clean_corpus       dedup + quality >= 0.5 + language filter
                            (one scan, one shuffle; operators/text)
      -> repetition filter  Gopher duplicated-3-gram rule (codegen only)
      -> gopher_rule_flags  the full Rae et al. A1.1 rule set (codegen)
      -> decontaminate      drop docs sharing 5-grams with the held-out
                            eval split — Bloom pre-filter (fixed 1 MiB
                            bitmap, zero joins) then the exact broadcast
                            check on the flagged survivors only
      -> domain_mix         downsample to a TEMPERATURE-scaled source
                            mixture (p^alpha; deterministic id-hash)
      -> take_token_budget  reproducible "train on N tokens" cut
                            (deterministic-shuffle order prefix sum)
      -> pack_sequences     concat-and-chunk into fixed token budgets
                            (two-pass distributed prefix sum)
      -> deterministic_shuffle  byte-reproducible shard layout
      -> partitioned parquet sink

Run:  python examples/pretrain_data.py [sf_dir] [token_budget]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from graph_db_clustering_spark.operators import traindata  # noqa: E402
from graph_db_clustering_spark.operators.text import (  # noqa: E402
    clean_corpus,
    gopher_rule_flags,
    repetition_stats,
)
from graph_db_clustering_spark.operators.traindata import FIB_HASH  # noqa: E402
from graph_db_clustering_spark.session import get_spark  # noqa: E402
from graph_db_clustering_spark.sources.files import (  # noqa: E402
    write_partitioned_parquet,
)


def main(sf_dir: str, budget: int = 512) -> None:
    spark = get_spark("pretrain-data", master="local[8]", shuffle_partitions=8)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1. clean: dedup + quality + language (the synthetic corpus is
    #    word-salad, so a permissive quality floor keeps the demo peopled)
    kept = clean_corpus(docs, "doc_id", "text", min_quality=0.5, lang="en")
    cleaned = docs.join(kept.select("doc_id", "bpe_tokens"), "doc_id")
    n1 = cleaned.count()

    # 2. repetition rule: drop if >60% of 3-grams are repeats
    reps = repetition_stats(cleaned, "doc_id", "text", n=3)
    cleaned = cleaned.join(
        reps.filter(F.col("dup_ngram_ratio") <= 0.6).select("doc_id"), "doc_id"
    )
    # 2b. the full Gopher rule set (word-salad corpus: keep docs failing
    #     at most the stopword rule, demonstrating per-rule composition)
    g = gopher_rule_flags(cleaned, "doc_id", "text")
    ok = g.filter(
        ~(F.col("g_wc") | F.col("g_mwl") | F.col("g_symbol") | F.col("g_alpha")
          | F.col("g_bullet") | F.col("g_ellipsis"))
    ).select("doc_id")
    cleaned = cleaned.join(ok, "doc_id", "leftsemi")
    n2 = cleaned.count()

    # 3. decontaminate against the deterministic 20% eval split: the
    #    Bloom bitmap flags candidates with zero joins, then the exact
    #    broadcast check runs over the (tiny) flagged subset only
    h = (F.col("doc_id") * FIB_HASH) % 100
    train, ev = cleaned.filter(h < 80), cleaned.filter(h >= 80)
    bloom, m_bits, k = traindata.build_bloom(ev, "text", n=5)
    flagged = traindata.bloom_decontaminate(
        train, bloom, m_bits, k, "doc_id", "text", n=5
    )
    suspects = train.join(flagged.select("doc_id"), "doc_id", "leftsemi")
    dirty = traindata.decontaminate(suspects, ev, "doc_id", "text", n=5)
    train = train.join(dirty.select("doc_id"), "doc_id", "left_anti")
    n3 = train.count()

    # 4. re-weight sources: temperature-flattened natural proportions
    weights = traindata.temperature_weights(
        traindata.domain_counts(train, "source"), alpha=0.6
    )
    mixed = traindata.domain_mix(train, "doc_id", "source", weights)
    n4 = mixed.count()

    # 5. cut to a total token budget, reproducibly (round 6): docs taken
    #    in deterministic-shuffle order until ~80% of the mixed corpus
    total_toks = mixed.agg(F.sum("bpe_tokens")).first()[0] or 0
    capped = traindata.take_token_budget(
        mixed, "doc_id", "bpe_tokens", budget=int(total_toks * 0.8)
    )
    n5 = capped.count()

    # 6. pack into fixed token-budget sequences, deterministically shard,
    #    and sink — shard layout is a pure function of chunk ids, so a
    #    re-run reproduces byte-identical training files
    packed = traindata.pack_sequences(capped, "doc_id", "bpe_tokens", budget)
    # chunk_id repeats across a chunk's (chunk, doc) rows — doc_id is the
    # tiebreak that makes within-shard order fully deterministic
    sharded = traindata.deterministic_shuffle(
        packed, "chunk_id", shards=4, tiebreak_cols=["doc_id"]
    )
    out = os.path.join(tempfile.mkdtemp(prefix="pretrain_"), "chunks")
    write_partitioned_parquet(sharded, out, ["shard"])
    n6 = spark.read.parquet(out).count()
    n_chunks = packed.select("chunk_id").distinct().count()

    print(
        f"raw={n0} cleaned={n1} derepeated={n2} decontaminated={n3} "
        f"mixed={n4} budget_capped={n5} packed_rows={n6} chunks={n_chunks} "
        f"budget={budget}"
    )
    print(f"sink: {out}")
    spark.stop()


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001",
        int(sys.argv[2]) if len(sys.argv) > 2 else 512,
    )
