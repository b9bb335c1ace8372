"""Scale-tier benchmark: the heavy paths at ~10x sf0.1 (VERDICT r6 Next #1).

Correctness is proven at sf0.001/sf0.01 and result-invariance at 10x
(tests/test_scale.py); this tier adds the missing evidence class —
WALL-CLOCK growth of the heavy paths on a corpus ~10x the sf0.1 tables.
A super-linear blowup (quadratic candidate generation, a driver-side
loop that suddenly matters, a broadcast that stops fitting) shows up
here as >>10x the sf0.1 row; ~linear growth validates the scale story.

The corpus is synthesized ONCE into a versioned cache dir (default
/tmp/gdc_scale10_<version>): each sf0.1 document/embedding is cloned
``factor`` times; clone r != 0 prefixes every text token with "x<r>"
(disjoint shingles — replicas are NOT near-dups of each other, so the
dedup workload scales ~linearly like a real corpus instead of
quadratically like a copy-paste corpus) and perturbs every embedding
coordinate (distinct vectors, same geometry). Replica 0 is byte-
identical to sf0.1.

Prints ONE JSON line:
  {"metric": "scale_tier_heavy_wall", "value": N, "unit": "sec",
   "queries": {...}, "spread": {...}, "factor": 10, ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

from graph_db_clustering_spark.catalog import load_table
from graph_db_clustering_spark.session import get_spark

# the six heavy paths named by the round-6 verdict (+ the serve split)
HEAVY = [
    "dedup_minhash",
    "cross_dedup",
    "ann_ivfpq",
    "ann_ivfpq_serve",
    "bpe_tokens",
    "warc_ingest",
    "pipeline_corpus",
    "nb_language",
    "dsir_weights",
    "pca_embed",
    "gmm_embed",
    "fuzzy_names_5k",
]


def fuzzy_names_5k(spark, sf_dir):
    """The record-linkage scale row (VERDICT r9 Next #8): blocked
    Jaro-Winkler over a FIXED 5k-per-replica part slice — the same
    fuzzy_name_pairs plan as the oracle entry (brand blocks, common-
    char prefilter, Arrow-batched scorer), bounded so the 10x run
    stays a minutes-scale artifact. Replica brands are disjoint by
    construction, so 10x data = 10x blocks of constant size; growth
    near 1x-per-data-x means the quadratic term stayed inside the
    block. Unlike the other HEAVY rows its sf0.1 baseline is measured
    IN this run (it is not in the bench.py set)."""
    from graph_db_clustering_spark.operators.text import fuzzy_name_pairs

    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_partkey") % 1_000_000) < 5000
    ).select("p_partkey", "p_name", "p_brand")
    return fuzzy_name_pairs(part, "p_partkey", "p_name", ["p_brand"])

_VERSION = "v2"  # bump to invalidate cached corpora


def build_scale_corpus(spark, src_dir: str, out_dir: str, factor: int) -> None:
    """Materialize documents.parquet + embeddings.parquet at factor x
    src_dir into out_dir (an sf_dir-shaped directory, so the SAME
    queries() entries run on it unchanged)."""
    reps = spark.range(factor).select(F.col("id").alias("__rep"))

    docs = load_table(spark, src_dir, "documents")
    # token-prefix mutation: every whitespace token of clone r gains an
    # "x<r>" prefix -> all 3-gram shingles differ across replicas
    mutated = F.regexp_replace(
        F.col("text"),
        r"(\S+)",
        F.concat(F.lit("x"), F.col("__rep").cast("string"), F.lit("$1")),
    )
    big_docs = docs.crossJoin(reps).select(
        (F.col("__rep") * 1_000_000 + F.col("doc_id")).alias("doc_id"),
        F.when(F.col("__rep") == 0, F.col("text")).otherwise(mutated).alias("text"),
        "lang",
        "source",
    )
    big_docs = big_docs.withColumn("n_chars", F.length("text"))
    big_docs.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )

    emb = load_table(spark, src_dir, "embeddings")
    perturbed = F.transform(
        "embedding",
        lambda x: (
            x * (1.0 + F.col("__rep") * 0.003) + F.col("__rep") * 0.0011
        ).cast("float"),
    )
    big_emb = emb.crossJoin(reps).select(
        (F.col("__rep") * 1_000_000 + F.col("vec_id")).alias("vec_id"),
        perturbed.alias("embedding"),
        "label",
    )
    big_emb.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )

    # round 10: the record-linkage tier (fuzzy_names) blocks on
    # p_brand. Clones get per-replica BRAND prefixes: more data means
    # more distinct blocks (like a real corpus growing new entities),
    # not 10x-bigger blocks — the same design choice as the token-
    # prefixed documents. Within-block pair cost therefore scales
    # linearly with rows; an accidental cross-replica block merge
    # would show up as quadratic growth in this row.
    part = load_table(spark, src_dir, "part").select(
        "p_partkey", "p_name", "p_brand"
    )
    big_part = part.crossJoin(reps).select(
        (F.col("__rep") * 1_000_000 + F.col("p_partkey")).alias("p_partkey"),
        F.when(F.col("__rep") == 0, F.col("p_name")).otherwise(
            F.concat(F.lit("x"), F.col("__rep").cast("string"),
                     F.lit(" "), F.col("p_name"))
        ).alias("p_name"),
        F.when(F.col("__rep") == 0, F.col("p_brand")).otherwise(
            F.concat(F.lit("x"), F.col("__rep").cast("string"),
                     F.col("p_brand"))
        ).alias("p_brand"),
    )
    big_part.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "part.parquet")
    )


def ensure_scale_corpus(spark, src_dir: str, factor: int) -> str:
    out_dir = os.environ.get(
        "SPARK_GRAFT_SCALE_DIR", f"/tmp/gdc_scale{factor}_{_VERSION}"
    )
    marker = os.path.join(out_dir, "_BUILT")
    if not os.path.exists(marker):
        build_scale_corpus(spark, src_dir, out_dir, factor)
        with open(marker, "w") as f:
            f.write(f"factor={factor} src={src_dir}\n")
    return out_dir


def main() -> None:
    from bench import (
        ivfpq_serve_query,
        ivfpq_serve_setup,
        materialize,
        warm_python_workers,
    )
    from graph_db_clustering_spark.queries.corpus import QUERIES

    src_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    factor = int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "10"))

    max_load = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_LOAD", "4.0"))
    retried_due_to_load = False
    if os.getloadavg()[0] > max_load:
        retried_due_to_load = True
        time.sleep(float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_WAIT", "60")))
    load_before = os.getloadavg()

    spark = get_spark("gdc-spark-bench-scale")
    sf_dir = ensure_scale_corpus(spark, src_dir, factor)
    for t in ("documents", "embeddings", "part"):
        load_table(spark, sf_dir, t).count()
    warm_python_workers(spark)

    # min-of-2 (not 3): each heavy run is ~10x the sf0.1 cost and the
    # quantity judged here is the GROWTH RATIO, where a 20% noise floor
    # cannot hide a super-linear blowup
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    serve_index = ivfpq_serve_setup(spark, sf_dir)
    queries = dict(QUERIES)
    queries["ann_ivfpq_serve"] = ivfpq_serve_query(serve_index)
    queries["fuzzy_names_5k"] = fuzzy_names_5k
    # in-run sf0.1 baseline for the linkage row (not in bench.py's set)
    base_samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        materialize(fuzzy_names_5k(spark, src_dir))
        base_samples.append(time.perf_counter() - t0)
    fuzzy_base = round(min(base_samples), 3)
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for name in HEAVY:
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            materialize(queries[name](spark, sf_dir))
            samples.append(time.perf_counter() - t0)
        timings[name] = round(min(samples), 3)
        spreads[name] = round(max(samples) / min(samples), 2)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "scale_tier_heavy_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spread": spreads,
                "factor": factor,
                "base_sf_dir": src_dir,
                "scale_dir": sf_dir,
                "method": f"min_of_{runs}_runs",
                "fuzzy_names_5k_base_sf01": fuzzy_base,
                "loadavg_before": [round(x, 2) for x in load_before],
                "loadavg_after": [round(x, 2) for x in os.getloadavg()],
                "cpus": os.cpu_count(),
                "retried_due_to_load": retried_due_to_load,
                "hot_host": load_before[0] > max_load,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
