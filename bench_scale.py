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
    # round 11 (VERDICT r10 #8): the three heaviest round-8/9 families
    # without a measured growth bound — the point-mass collapse, the
    # banded hamming join, and the contraction loop
    "semantic_dedup_5k",
    "image_near_dups_3k",
    "graph_louvain_3k",
    # round 12 (VERDICT r11 #8): the lakehouse WRITE paths — both have
    # metadata-sized driver planning worth proving stays flat
    "hudi_upsert_30k",
    "delta_merge_30k",
    # round 13 (VERDICT r12 #2): the MoR log-block landing + snapshot
    # merge — the one round-12 heavy surface with no measured bound
    "hudi_mor_upsert_30k",
    # round 13 second pass: the log-compaction writer's growth bound
    "hudi_mor_logcompact_30k",
    # round 14 (VERDICT r13 #2/#10): the Iceberg CoW MERGE write path
    "iceberg_merge_30k",
    # round 14 (VERDICT r13 #6): the ExactSubstr gram-run pipeline
    "substring_dedup_10k",
    # round 15 (VERDICT r14 #8): scale anchors for the §10 graph-loop
    # fusion (inline convergence probes, lazy checkpoints) and the §12
    # GLM input pin — previously evidenced only by builder-side job
    # counts at sf0.01
    "graph_pagerank_3k",
    "graph_components_3k",
    "doc_logreg_full",
]


def semantic_dedup_5k(spark, sf_dir):
    """SemDeDup scale row (VERDICT r10 #8): per-replica slice of 500
    vectors (5k at 10x). Replica embeddings carry per-replica SIGN
    patterns (see build_scale_corpus), so cross-replica cosines land
    near 0 and the dup structure stays within-replica — growth
    measures the PLAN (cluster join, point-mass collapse, CC loop),
    not an artificial dup explosion. k scales with N (constant ~64
    expected cluster size, the SemDeDup paper's trade), exactly how
    the operator is meant to be driven at 100 TB."""
    from graph_db_clustering_spark.operators import dedup

    emb = load_table(spark, sf_dir, "embeddings").filter(
        (F.col("vec_id") % 1_000_000) < 500
    )
    n = emb.count()
    return dedup.semantic_dedup(
        emb, k=max(8, n // 64), threshold=0.95, max_iter=10
    )


def image_near_dups_3k(spark, sf_dir):
    """Perceptual-dedup scale row: the image_near_dups entry's planted
    within-replica dup groups over 300 docs PER replica (3k at 10x) —
    dhash, banding, and the hamming candidate join. Replica texts are
    token-prefixed, so images (a pure function of text) never collide
    across replicas: candidate growth must stay ~linear."""
    from graph_db_clustering_spark.operators import multimodal

    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 1_000_000) < 300
    )
    leaders = docs.select(
        F.col("doc_id").alias("leader_id"),
        F.col("text").alias("leader_text"),
    )
    grouped = docs.select(
        "doc_id",
        (
            F.floor((F.col("doc_id") % 1_000_000) / 3) * 3
            + (F.col("doc_id") - F.col("doc_id") % 1_000_000)
        ).alias("leader_id"),
    ).join(leaders, "leader_id")
    imgs = multimodal.synthetic_images_from_documents(
        grouped.select("doc_id", F.col("leader_text").alias("text")),
        "doc_id",
        "text",
        side=16,
    )
    hashes = multimodal.dhash(imgs)
    return multimodal.image_near_dups(hashes, max_hamming=0)


def graph_louvain_3k(spark, sf_dir):
    """Louvain scale row: same-nation cliques over 300 customers PER
    replica (3k vertices / 10x cliques at 10x — replica nations are
    offset, so cliques stay disjoint). Growth watches the modularity
    sweep + contraction loop, the shape most likely to hide a
    super-linear term."""
    from graph_db_clustering_spark.operators.graph import Graph
    from graph_db_clustering_spark.operators.graph_algos import louvain

    c = (
        load_table(spark, sf_dir, "customer")
        .filter((F.col("c_custkey") % 1_000_000) < 300)
        .select(
            F.col("c_custkey").alias("id"),
            F.col("c_nationkey").alias("nation"),
        )
    )
    a = c.select(F.col("id").alias("src"), F.col("nation"))
    b = c.select(F.col("id").alias("dst"), F.col("nation"))
    edges = (
        a.join(b, "nation")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst", F.lit("same_nation").alias("relationship"))
    )
    return louvain(Graph(c, edges))


def graph_pagerank_3k(spark, sf_dir):
    """PageRank scale row (round 15, VERDICT r14 #8): the same
    same-nation clique graph as graph_louvain_3k (300 customers per
    replica, per-replica nation offsets keep cliques disjoint), fixed
    15 power-iteration rounds. The quantity watched is per-round cost
    growth — the §10 fusion turned each round into ONE lazily
    checkpointed job with the dangling-mass term riding the delta
    aggregate, so growth near 1x-per-data-x validates that shape."""
    from graph_db_clustering_spark.operators.graph import Graph
    from graph_db_clustering_spark.operators.graph_algos import pagerank

    c = (
        load_table(spark, sf_dir, "customer")
        .filter((F.col("c_custkey") % 1_000_000) < 300)
        .select(
            F.col("c_custkey").alias("id"),
            F.col("c_nationkey").alias("nation"),
        )
    )
    a = c.select(F.col("id").alias("src"), F.col("nation"))
    b = c.select(F.col("id").alias("dst"), F.col("nation"))
    edges = (
        a.join(b, "nation")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst", F.lit("same_nation").alias("relationship"))
    )
    return pagerank(Graph(c.select("id", "nation"), edges), max_iter=15).select(
        "id", F.round("rank", 8).alias("rank")
    )


def graph_components_3k(spark, sf_dir):
    """Connected-components scale row (round 15, VERDICT r14 #8): per-
    nation CHAIN graphs (consecutive custkeys linked within a nation) so
    the min-label loop genuinely iterates ~chain-length rounds — the
    clique graph of the oracle entry converges in 2 rounds and would not
    exercise the per-round fusion. Replica nation offsets keep chains
    disjoint: 10x data = 10x chains of constant length, so the round
    count is flat and growth must track per-round work linearly."""
    from pyspark.sql import Window

    from graph_db_clustering_spark.operators.graph import Graph
    from graph_db_clustering_spark.operators.graph_algos import (
        connected_components,
    )

    c = (
        load_table(spark, sf_dir, "customer")
        .filter((F.col("c_custkey") % 1_000_000) < 300)
        .select(
            F.col("c_custkey").alias("id"),
            F.col("c_nationkey").alias("nation"),
        )
    )
    w = Window.partitionBy("nation").orderBy("id")
    edges = (
        c.withColumn("nxt", F.lead("id").over(w))
        .filter(F.col("nxt").isNotNull())
        .select(
            F.col("id").alias("src"),
            F.col("nxt").alias("dst"),
            F.lit("chain").alias("relationship"),
        )
    )
    return connected_components(Graph(c.select("id"), edges))


def doc_logreg_full(spark, sf_dir):
    """GLM scale row (round 15, VERDICT r14 #8): the doc_logreg entry
    verbatim — IRLS over the FULL documents table (no cap), so at 10x
    every Newton pass reads 10x rows through the §12 (features, y)
    input pin. Growth near 1x-per-data-x proves the pin keeps each
    pass one scan of the narrow projection instead of re-evaluating
    the caller's lineage."""
    from graph_db_clustering_spark.queries.corpus import QUERIES

    return QUERIES["doc_logreg"](spark, sf_dir)


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

_SEQ = [0]  # fresh table dir per timed write-path run


def _scratch(tag: str) -> str:
    import atexit
    import shutil
    import tempfile

    _SEQ[0] += 1
    d = os.path.join(
        tempfile.gettempdir(),
        f"gdc_scalewr_{os.getpid()}_{tag}_{_SEQ[0]}",
    )
    shutil.rmtree(d, ignore_errors=True)
    # pid-suffixed names never collide across runs, so without this
    # each run would leave its full write-path tables behind
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


def hudi_upsert_30k(spark, sf_dir):
    """Hudi CoW WRITE-path scale row (VERDICT r11 #8): create a
    partitioned table from the 3k-per-replica orders slice (30k rows
    at 10x), then ONE upsert updating every 5th key and inserting a
    disjoint new-key batch. The tag join and the touched-group
    rewrite are distributed; the driver collects only the distinct
    touched (partition, fileId) list — growth near 1x-per-data-x
    proves that planning stays metadata-sized. Timed end to end
    (create + upsert + snapshot count materialization)."""
    from graph_db_clustering_spark.sources.hudi import (
        hudi_create,
        hudi_upsert,
        read_hudi,
    )

    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderkey") % 1_000_000) < 3000
    ).select(
        "o_orderkey", "o_totalprice",
        (F.col("o_orderkey") % 4).cast("int").alias("pb"),
    )
    t = os.path.join(_scratch("hudi"), "t")
    hudi_create(
        spark, o, t, "o_orderkey", partition_field="pb",
        n_file_groups=4,
    )
    upd = o.filter(F.col("o_orderkey") % 5 == 0).withColumn(
        "o_totalprice", F.lit(1.0)
    )
    new = o.select(
        (-F.col("o_orderkey") - 1).alias("o_orderkey"),
        "o_totalprice", "pb",
    ).limit(500)
    hudi_upsert(spark, t, upd.unionByName(new))
    return read_hudi(spark, t, drop_meta=True)


def hudi_mor_upsert_30k(spark, sf_dir):
    """Hudi MERGE_ON_READ write+read scale row (VERDICT r12 #2): the
    same shape as hudi_upsert_30k but the update/insert history lands
    as HoodieLogFormat blocks (applyInPandas encode, driver renames
    staged files only) and the timed read is the SNAPSHOT MERGE —
    executor-side mapInPandas block decode, per-group latest-event
    window over only the log rows, anti-join base exclusion. Growth
    near 1x-per-data-x proves both the log landing and the merge plan
    scale with data, with driver work bounded by touched groups."""
    from graph_db_clustering_spark.sources.hudi import (
        hudi_create,
        hudi_delete,
        hudi_upsert,
        read_hudi,
    )

    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderkey") % 1_000_000) < 3000
    ).select(
        "o_orderkey", "o_totalprice",
        (F.col("o_orderkey") % 4).cast("int").alias("pb"),
    )
    t = os.path.join(_scratch("hudi_mor"), "t")
    hudi_create(
        spark, o, t, "o_orderkey", partition_field="pb",
        n_file_groups=4, table_type="MERGE_ON_READ",
    )
    upd = o.filter(F.col("o_orderkey") % 5 == 0).withColumn(
        "o_totalprice", F.lit(1.0)
    )
    new = o.select(
        (-F.col("o_orderkey") - 1).alias("o_orderkey"),
        "o_totalprice", "pb",
    ).limit(500)
    hudi_upsert(spark, t, upd.unionByName(new))
    hudi_delete(
        spark, t,
        o.filter(F.col("o_orderkey") % 50 == 3).select("o_orderkey"),
    )
    return read_hudi(spark, t, drop_meta=True)


def hudi_mor_logcompact_30k(spark, sf_dir):
    """Log-compaction scale row (round 13, the write side's growth
    bound): the hudi_mor_upsert_30k history (upsert + delete log
    blocks) followed by hudi_log_compact over every logged slice
    (min_log_files=1) and the post-compaction snapshot merge. The
    compaction is the same distributed shape as the snapshot's log
    half — mapInPandas decode, per-group latest window, applyInPandas
    encode, driver renames metadata-sized staged files — so growth
    near 1x-per-data-x proves the merge-and-rewrite plan scales with
    log data while driver work stays bounded by touched groups."""
    from graph_db_clustering_spark.sources.hudi import (
        hudi_create,
        hudi_delete,
        hudi_upsert,
        read_hudi,
    )
    from graph_db_clustering_spark.sources.hudi_mor import (
        hudi_log_compact,
    )

    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderkey") % 1_000_000) < 3000
    ).select(
        "o_orderkey", "o_totalprice",
        (F.col("o_orderkey") % 4).cast("int").alias("pb"),
    )
    t = os.path.join(_scratch("hudi_morlc"), "t")
    hudi_create(
        spark, o, t, "o_orderkey", partition_field="pb",
        n_file_groups=4, table_type="MERGE_ON_READ",
    )
    upd = o.filter(F.col("o_orderkey") % 5 == 0).withColumn(
        "o_totalprice", F.lit(1.0)
    )
    hudi_upsert(spark, t, upd)
    hudi_delete(
        spark, t,
        o.filter(F.col("o_orderkey") % 50 == 3).select("o_orderkey"),
    )
    hudi_log_compact(spark, t, min_log_files=1)
    return read_hudi(spark, t, drop_meta=True)


def substring_dedup_10k(spark, sf_dir):
    """ExactSubstr scale row (round 14, VERDICT r13 #6): duplicated
    12-gram runs over the documents corpus plus planted 30-token
    prefix clones (clone ids offset by 1e8 to clear the replica id
    space). Replica texts are token-prefixed — grams never collide
    across replicas — so shared runs stay clone-vs-original and the
    gram explode, the min!=max shared-gram aggregate, and the
    gaps-and-islands window all grow ~linearly with data; a
    super-linear blowup here means the shared-gram join went hot."""
    from graph_db_clustering_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.trim(F.col("text")).alias("text")
    )
    clones = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100_000_000).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(F.split(F.col("text"), r"\s+"), 1, 30)
        ).alias("text"),
    )
    return dedup.duplicated_ngram_spans(
        docs.unionByName(clones), "doc_id", "text", n=12, min_run=3
    )


def iceberg_merge_30k(spark, sf_dir):
    """Iceberg MERGE write-path scale row (round 14, VERDICT r13 #2):
    write the 3k-per-replica orders slice as a pb-partitioned Iceberg
    v2 table, then ONE copy-on-write MERGE (update every 5th key +
    insert a disjoint batch). The match probe is one column-pruned
    scan joined against the broadcast source keys; matched files
    rewrite distributed, untouched entries relist driver-side
    (metadata-sized). Growth near 1x-per-data-x proves the probe and
    rewrite scale with data while commit assembly stays flat. Timed
    end to end (create + merge + snapshot count)."""
    from graph_db_clustering_spark.sources.iceberg import (
        iceberg_merge,
        read_iceberg,
        write_iceberg,
    )

    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderkey") % 1_000_000) < 3000
    ).select(
        "o_orderkey", "o_totalprice",
        (F.col("o_orderkey") % 4).cast("int").alias("pb"),
    )
    t = os.path.join(_scratch("iceberg"), "t")
    write_iceberg(
        spark, o, t, partition_by=[("pb", "identity", "pb")]
    )
    upd = o.filter(F.col("o_orderkey") % 5 == 0).withColumn(
        "o_totalprice", F.lit(1.0)
    )
    new = o.select(
        (-F.col("o_orderkey") - 1).alias("o_orderkey"),
        "o_totalprice", "pb",
    ).limit(500)
    iceberg_merge(spark, t, upd.unionByName(new), "o_orderkey")
    return read_iceberg(spark, t)


def delta_merge_30k(spark, sf_dir):
    """Delta MERGE write-path scale row (VERDICT r11 #8): append the
    same 3k-per-replica orders slice, then ONE protocol MERGE (update
    every 5th key + insert a disjoint batch) — the DV-vs-rewrite
    strategy switch, bitmap assembly, and the CDF change-file write.
    Growth near 1x-per-data-x proves the per-file driver work scales
    with touched files, not rows."""
    from graph_db_clustering_spark.sources.delta import (
        delta_append,
        delta_merge,
        read_delta,
    )

    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderkey") % 1_000_000) < 3000
    ).select("o_orderkey", "o_totalprice")
    t = os.path.join(_scratch("delta"), "t")
    delta_append(spark, o.repartition(8), t)
    upd = o.filter(F.col("o_orderkey") % 5 == 0).withColumn(
        "o_totalprice", F.lit(1.0)
    )
    new = o.select(
        (-F.col("o_orderkey") - 1).alias("o_orderkey"), "o_totalprice"
    ).limit(500)
    delta_merge(spark, t, upd.unionByName(new), "o_orderkey")
    return read_delta(spark, t)


_VERSION = "v4"  # bump to invalidate cached corpora (v4: + orders)


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
    # round 11 (v3): per-replica deterministic SIGN patterns replace the
    # old scale-and-shift perturbation. Within a replica every cosine is
    # unchanged (coordinates flip together); ACROSS replicas the sign
    # patterns differ per coordinate, scrambling cosines toward 0 — so
    # semantic-dedup structure stays within-replica (the old scheme's
    # near-colinear clones would have made every clone a 0.95-cosine
    # dup of its source, an artificial quadratic dup mass). Replica 0
    # stays byte-identical.
    perturbed = F.transform(
        "embedding",
        lambda x, i: F.when(F.col("__rep") == 0, x).otherwise(
            x
            * (
                1
                - 2 * ((i * 7 + F.col("__rep") * 13) % 2)
            ).cast("float")
            * (1.0 + F.col("__rep") * 0.003).cast("float")
        ),
    )
    big_emb = emb.crossJoin(reps).select(
        (F.col("__rep") * 1_000_000 + F.col("vec_id")).alias("vec_id"),
        perturbed.alias("embedding"),
        "label",
    )
    big_emb.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )

    # round 11: customer feeds the graph_louvain_3k row; per-replica
    # NATION offsets keep the same-nation cliques disjoint across
    # replicas (10x data = 10x cliques of constant size)
    cust = load_table(spark, src_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    big_cust = cust.crossJoin(reps).select(
        (F.col("__rep") * 1_000_000 + F.col("c_custkey")).alias(
            "c_custkey"
        ),
        (F.col("__rep") * 100 + F.col("c_nationkey")).alias("c_nationkey"),
    )
    big_cust.repartition(8).write.mode("overwrite").parquet(
        os.path.join(out_dir, "customer.parquet")
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

    # round 12: orders feeds the lakehouse write-path rows — replica
    # key offsets keep the per-replica slices (% 1_000_000 < N)
    # identical in shape to the sf0.1 base slice
    orders = load_table(spark, src_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    big_orders = orders.crossJoin(reps).select(
        (F.col("__rep") * 1_000_000 + F.col("o_orderkey")).alias(
            "o_orderkey"
        ),
        "o_totalprice",
    )
    big_orders.repartition(16).write.mode("overwrite").parquet(
        os.path.join(out_dir, "orders.parquet")
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
    for t in ("documents", "embeddings", "part", "customer", "orders"):
        load_table(spark, sf_dir, t).count()
    warm_python_workers(spark)

    # min-of-2 (not 3): each heavy run is ~10x the sf0.1 cost and the
    # quantity judged here is the GROWTH RATIO, where a 20% noise floor
    # cannot hide a super-linear blowup
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    serve_index = ivfpq_serve_setup(spark, sf_dir)
    queries = dict(QUERIES)
    queries["ann_ivfpq_serve"] = ivfpq_serve_query(serve_index)
    extra = {
        "fuzzy_names_5k": fuzzy_names_5k,
        "semantic_dedup_5k": semantic_dedup_5k,
        "image_near_dups_3k": image_near_dups_3k,
        "graph_louvain_3k": graph_louvain_3k,
        "hudi_upsert_30k": hudi_upsert_30k,
        "delta_merge_30k": delta_merge_30k,
        "hudi_mor_upsert_30k": hudi_mor_upsert_30k,
        "hudi_mor_logcompact_30k": hudi_mor_logcompact_30k,
        "iceberg_merge_30k": iceberg_merge_30k,
        "substring_dedup_10k": substring_dedup_10k,
        "graph_pagerank_3k": graph_pagerank_3k,
        "graph_components_3k": graph_components_3k,
        "doc_logreg_full": doc_logreg_full,
    }
    queries.update(extra)

    def time_query(name: str, fn, where: str, n: int) -> tuple:
        samples = []
        for _ in range(n):
            t0 = time.perf_counter()
            materialize(fn(spark, where))
            samples.append(time.perf_counter() - t0)
        return round(min(samples), 3), round(max(samples) / min(samples), 2)

    # CONTROL row (round 14, VERDICT r13 #4 — ported from bench.py):
    # the pinned q01 scan at the sf0.1 BASE dir (same code+data as the
    # committed 0.212 s anchor in BASELINE.md), timed before and after
    # the heavy set. Scale-row adjudication now lives in the JSON:
    # divide each growth ratio by the control ratio instead of arguing
    # host drift in a hand-written MD.
    control_first, control_first_spread = time_query(
        "q01", queries["q01"], src_dir, runs
    )
    # in-run sf0.1 baselines for rows not in bench.py's set
    extra_base: dict[str, float] = {}
    for name, fn in extra.items():
        extra_base[name], _ = time_query(name, fn, src_dir, runs)
    fuzzy_base = extra_base["fuzzy_names_5k"]
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for name in HEAVY:
        timings[name], spreads[name] = time_query(
            name, queries[name], sf_dir, runs
        )
    control_last, control_last_spread = time_query(
        "q01", queries["q01"], src_dir, runs
    )

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "scale_tier_heavy_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spread": spreads,
                "control": {
                    "query": "q01",
                    "where": "base_sf_dir",
                    "first": control_first,
                    "first_spread": control_first_spread,
                    "last": control_last,
                    "last_spread": control_last_spread,
                },
                "factor": factor,
                "base_sf_dir": src_dir,
                "scale_dir": sf_dir,
                "method": f"min_of_{runs}_runs",
                "fuzzy_names_5k_base_sf01": fuzzy_base,
                "extra_base_sf01": extra_base,
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
