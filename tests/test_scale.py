"""10x-scale invariance tests for the heavy LLM-data paths (VERDICT r3
item 4): dedup_minhash, dup_clusters, and ann_ivfpq on synthesized inputs
~10x the sf0.1 tables, with adversarial skew — a power-law duplicate-
cluster mix whose mega-cluster makes ONE LSH band bucket hot, and an ANN
corpus where ~30% of vectors collapse into one coarse cell.

The claims pinned here are the 100 TB ones: results are byte-identical
under hostile repartitionings (nothing depends on partition boundaries or
task order), the banded LSH join's per-key input is bounded by the
largest true duplicate cluster (never all-pairs), and the skewed-cell ANN
search still returns the exact same (deterministic, seeded) answer.
These are the strongest available substitute for sf1 data, the treatment
test_pack_sequences_invariant_at_10x_scale established.
"""

import pytest
from pyspark.sql import functions as F

from graph_db_clustering_spark.operators import dedup, similarity

pytestmark = pytest.mark.slow  # heavy tier (r15): run with -m slow

N_DOCS = 50_000  # ~10x the sf0.1 documents table (5,000 rows)
MEGA = 200  # one mega-cluster: identical text -> identical signature
# -> the same bucket in EVERY band (the hot-band case)
TENS, PAIRS = 30, 300  # power-law tail: 30 clusters of 10, 300 of 2


def _group_expr():
    """Deterministic power-law cluster assignment over doc ids."""
    i = F.col("doc_id")
    return (
        F.when(i < MEGA, F.lit(0))
        .when(i < MEGA + 10 * TENS, 1 + ((i - MEGA) / 10).cast("long"))
        .when(
            i < MEGA + 10 * TENS + 2 * PAIRS,
            1 + TENS + ((i - MEGA - 10 * TENS) / 2).cast("long"),
        )
        .otherwise(i)  # singleton: unique text
    )


@pytest.fixture(scope="module")
def skewed_docs(spark):
    """50k docs, text a pure function of the cluster id (12 tokens from a
    ~1e5 token space): docs in a cluster are identical (Jaccard 1.0),
    docs across clusters share at most stray shingles (<< threshold)."""
    g = _group_expr()
    text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(11)),
            lambda j: F.concat(F.lit("w"), ((g * 37 + j * 11) % 99991).cast("string")),
        ),
    )
    return (
        spark.range(N_DOCS)
        .select(F.col("id").alias("doc_id"))
        .withColumn("text", text)
    )


EXPECT_PAIRS = MEGA * (MEGA - 1) // 2 + TENS * (10 * 9 // 2) + PAIRS  # 21_550


def test_minhash_dedup_invariant_at_10x_scale(spark, skewed_docs):
    """Byte-identical verified pairs under hostile partitionings, and
    exactly the true duplicate pairs — the hot band (mega-cluster bucket
    in all 16 bands) adds candidates but the exact-Jaccard verify must
    strip every false positive regardless of how tasks split the skew."""
    outs = []
    for parts, key in ((4, None), (96, "text")):
        d = (
            skewed_docs.repartition(parts, key)
            if key
            else skewed_docs.repartition(parts)
        )
        pairs = dedup.minhash_dedup(d, "doc_id", "text", threshold=0.9)
        outs.append(sorted((r.id1, r.id2, r.jaccard) for r in pairs.collect()))
        spark.catalog.clearCache()
    assert outs[0] == outs[1]
    assert len(outs[0]) == EXPECT_PAIRS
    # every emitted pair is a true clone pair (Jaccard exactly 1.0 here)
    assert all(j == 1.0 for _, _, j in outs[0])


def test_lsh_hot_band_bucket_bounded_by_cluster_size(spark, skewed_docs):
    """The banded join's per-key input (bucket size) is bounded by the
    largest TRUE duplicate cluster — the all-pairs blowup never appears
    as one task's input. The mega-cluster's identical signatures land in
    one bucket per band (16 hot buckets of exactly MEGA ids); no bucket
    exceeds that, so AQE's skew split has bounded work to split."""
    sh = dedup.with_hashed_shingles(skewed_docs.select("doc_id", "text"), "text", 3)
    sig = dedup.with_minhash_signature(sh, "hshingles", 64)
    band_hashes = F.transform(
        F.sequence(F.lit(0), F.lit(15)),
        lambda i: F.hash(F.slice(F.col("signature"), i * 4 + 1, 4)),
    )
    buckets = sig.select(
        F.col("doc_id").alias("id"), F.posexplode(band_hashes).alias("band", "bhash")
    )
    sizes = buckets.groupBy("band", "bhash").agg(F.count("*").alias("n"))
    top = sizes.agg(
        F.max("n").alias("max_n"),
        F.sum(F.when(F.col("n") >= MEGA, 1).otherwise(0)).alias("n_mega"),
    ).first()
    # bounded by the largest true cluster plus stray band-hash collisions
    # (observed +3 at 50k ids x 16 bands) — NOT by anything O(N)
    assert MEGA <= top.max_n <= MEGA + 10, top.max_n
    assert top.n_mega >= 16  # the mega cluster is hot in every band


def test_dup_clusters_structure_at_10x_scale(spark, skewed_docs):
    """pairs -> connected components -> survivor at 10x: the component
    step must reconstruct the exact planted power-law structure (one
    200-cluster, 30 ten-clusters, 300 pairs, singletons for the rest),
    canonical = min doc id, exactly one keeper per cluster."""
    out = dedup.near_dup_clusters(skewed_docs, "doc_id", "text", threshold=0.9)
    rows = out.collect()
    assert len(rows) == N_DOCS
    by_size = {}
    for r in rows:
        by_size.setdefault(r.cluster_size, set()).add(r.canonical_id)
    assert len(by_size[MEGA]) == 1 and by_size[MEGA] == {0}
    assert len(by_size[10]) == TENS
    assert len(by_size[2]) == PAIRS
    n_clustered = MEGA + 10 * TENS + 2 * PAIRS
    assert len(by_size[1]) == N_DOCS - n_clustered
    keepers = [r for r in rows if r.keep]
    assert len(keepers) == 1 + TENS + PAIRS + (N_DOCS - n_clustered)
    assert all(r.doc_id == r.canonical_id for r in keepers)
    # canonical is the min id of its cluster
    mins = {}
    for r in rows:
        mins[r.canonical_id] = min(mins.get(r.canonical_id, r.doc_id), r.doc_id)
    assert all(c == m for c, m in mins.items())


N_VECS = 50_000  # ~10x the sf0.1 embeddings table
DIM = 64


@pytest.fixture(scope="module")
def skewed_vecs(spark):
    """50k vectors, deterministic hash noise; 30% are an exact point mass
    (one repeated vector) so ONE coarse cell holds >= 15k rows — the ADC
    scan's worst skew case. The point mass also plants duplicate initial
    centroids (the init sample hits the repeated vector several times),
    so assignment tie-breaking and empty-cell handling are exercised on
    the same adversarial input a real hot-dup corpus would produce."""
    i = F.col("vec_id")
    noise = lambda j: (F.sin(i * 12.9898 + j * 78.233) * 43758.5453) % 1.0  # noqa: E731
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda j: F.when(i % 10 < 3, F.when(j == 0, 30.0).otherwise(0.5)).otherwise(
            noise(j)
        ).cast("double"),
    )
    return (
        spark.range(N_VECS)
        .select(F.col("id").alias("vec_id"))
        .withColumn("embedding", vec)
    )


def test_ann_ivfpq_invariant_and_recalls_under_cell_skew(spark, skewed_vecs):
    """ivfpq at 10x with a hot coarse cell: (a) the planted skew really
    lands ~30% of the corpus in one cell, (b) the search output is
    byte-identical under hostile repartitionings (driver-trained
    codebooks are deterministic-sample-based, the ADC scan is a pure map,
    the shortlist/re-rank are order-insensitive with tie-breaks), and
    (c) recall vs exact brute force stays useful despite the skew."""
    q = skewed_vecs.filter(F.col("vec_id") < 10)
    params = dict(k=5, cells=16, nprobe=6, m=8, refine=8)

    model, encoded = similarity.ivfpq_build(skewed_vecs, cells=16, m=8)
    cell_counts = sorted(
        r.n for r in encoded.groupBy("cell").agg(F.count("*").alias("n")).collect()
    )
    assert cell_counts[-1] >= int(0.25 * N_VECS), cell_counts  # the hot cell

    outs = []
    for parts in (4, 96):
        got = similarity.ivfpq_topk(
            q, skewed_vecs.repartition(parts), "vec_id", "embedding", **params
        )
        outs.append(sorted((r.qid, r.nid, r.rk, r.cosine) for r in got.collect()))
        spark.catalog.clearCache()
    assert outs[0] == outs[1]
    assert len(outs[0]) == 10 * params["k"]

    exact = {
        (r.qid, r.nid)
        for r in similarity.brute_force_topk(q, skewed_vecs, k=params["k"]).collect()
    }
    approx = {(qid, nid) for qid, nid, _, _ in outs[0]}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, recall


# ---------------------------------------------------------------------------
# Iterative graph algorithms at 10x with a power-law hub (VERDICT r5 Next #4)
# ---------------------------------------------------------------------------

from graph_db_clustering_spark.operators import graph_algos  # noqa: E402
from graph_db_clustering_spark.operators.graph import Graph  # noqa: E402

GN_V = 50_000  # ~10x the sf0.1-scale graphs the queries build
HUB_SPOKES = 10_000  # one 10k-degree hub: the hot key in every message agg
CHAIN_START, CHAIN_LEN, N_CHAINS = 20_000, 16, 100  # diameter stressors
PAIR_START, N_PAIRS2 = 30_000, 5_000  # 5k two-cliques


@pytest.fixture(scope="module")
def hub_graph(spark):
    """Power-law 10x graph: hub 0 -> 10k spokes (one hot aggregation key),
    100 chains of 16 (multi-iteration label propagation), 5k pairs,
    ~33k singletons. Component structure is known in closed form."""
    v = spark.range(GN_V).select(F.col("id"))
    hub = spark.range(1, HUB_SPOKES + 1).select(
        F.lit(0).cast("long").alias("src"), F.col("id").alias("dst")
    )
    chain = (
        spark.range(CHAIN_START, CHAIN_START + N_CHAINS * CHAIN_LEN)
        .filter((F.col("id") - CHAIN_START) % CHAIN_LEN != CHAIN_LEN - 1)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    )
    pairs = (
        spark.range(PAIR_START, PAIR_START + 2 * N_PAIRS2)
        .filter((F.col("id") - PAIR_START) % 2 == 0)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    )
    e = hub.unionAll(chain).unionAll(pairs).withColumn(
        "relationship", F.lit("E")
    )
    return v, e


def test_connected_components_invariant_at_10x_hub_scale(spark, hub_graph):
    """Min-label CC on the hub graph: byte-identical labels under hostile
    repartitionings (integer fixpoint — no FP order sensitivity), and the
    exact planted structure: one 10001-component labeled 0, 100 chains of
    16, 5k pairs, singletons for the rest. The hub makes one groupBy key
    carry 10k messages every iteration — AQE's skew case."""
    v, e = hub_graph
    outs = []
    for vparts, eparts in ((4, 96), (96, 4)):
        g = Graph(v.repartition(vparts), e.repartition(eparts))
        cc = graph_algos.connected_components(g)
        outs.append(sorted((r.id, r.component) for r in cc.collect()))
        spark.catalog.clearCache()
    assert outs[0] == outs[1]
    sizes = {}
    for _, comp in outs[0]:
        sizes[comp] = sizes.get(comp, 0) + 1
    by_size = {}
    for comp, n in sizes.items():
        by_size.setdefault(n, []).append(comp)
    assert by_size[HUB_SPOKES + 1] == [0]
    assert len(by_size[CHAIN_LEN]) == N_CHAINS
    assert sorted(by_size[CHAIN_LEN]) == [
        CHAIN_START + k * CHAIN_LEN for k in range(N_CHAINS)
    ]  # canonical = min id of each chain
    assert len(by_size[2]) == N_PAIRS2
    n_clustered = (HUB_SPOKES + 1) + N_CHAINS * CHAIN_LEN + 2 * N_PAIRS2
    assert len(by_size[1]) == GN_V - n_clustered


def test_pagerank_invariant_at_10x_hub_scale(spark, hub_graph):
    """PageRank on the hub graph: rank mass conserved (sum == 1 every
    iteration), all 10k spokes byte-identical within a run (symmetry),
    and partitioning changes perturb ranks only at FP-summation noise
    (< 1e-9), never structurally."""
    v, e = hub_graph
    runs = []
    for vparts, eparts in ((4, 96), (96, 4)):
        g = Graph(v.repartition(vparts), e.repartition(eparts))
        pr = graph_algos.pagerank(g, max_iter=8)
        runs.append({r.id: r.rank for r in pr.collect()})
        spark.catalog.clearCache()
    assert abs(sum(runs[0].values()) - 1.0) < 1e-9
    spoke_ranks = {runs[0][i] for i in range(1, HUB_SPOKES + 1)}
    assert len(spoke_ranks) == 1  # exact symmetry within one run
    worst = max(abs(runs[0][i] - runs[1][i]) for i in runs[0])
    assert worst < 1e-9, worst
    # spokes (fed by the hub) outrank the un-pointed-at hub
    assert runs[0][1] > runs[0][0]


def test_cypher_varlen_lattice_no_path_blowup(spark):
    """Variable-length frontier on a 5-layer complete-bipartite lattice
    (width 100): the number of PATHS from layer 0 to layer 4 is 100^3 =
    1e6 per endpoint pair (~1e10 total) — a per-path engine dies here.
    The distinct-pairs fixpoint must return exactly the reachable pairs
    (100 sources x 400 reachable each) and be partition-invariant."""
    from graph_db_clustering_spark.cypher import CypherSession

    W, L = 100, 5
    v = spark.range(W * L).select("id").withColumn("label", F.lit("N"))
    layers = spark.range(W).select(F.col("id").alias("j"))
    lyr = spark.range(L - 1).select(F.col("id").alias("l"))
    e = (
        lyr.crossJoin(layers.select(F.col("j").alias("a")))
        .crossJoin(layers.select(F.col("j").alias("b")))
        .select(
            (F.col("l") * W + F.col("a")).alias("src"),
            ((F.col("l") + 1) * W + F.col("b")).alias("dst"),
            F.lit("E").alias("relationship"),
        )
        .withColumn("eid", F.col("src") * 10_000 + F.col("dst"))
    )
    outs = []
    for parts in (4, 96):
        s = CypherSession(Graph(v.repartition(parts), e.repartition(parts)))
        out = s.run(
            """MATCH (a)-[:E*1..4]->(b) WHERE a.id < 100
               RETURN a.id AS s, b.id AS t"""
        )
        outs.append(sorted((r.s, r.t) for r in out.collect()))
        spark.catalog.clearCache()
    assert outs[0] == outs[1]
    assert len(outs[0]) == W * (L - 1) * W  # 100 sources x 400 reachable
    # every target is in a strictly later layer
    assert all(t >= W for _, t in outs[0])


def test_triangle_count_invariant_at_10x_hub_scale(spark, hub_graph):
    """Degree-ordered triangle counting on the hub graph plus a spoke
    ring: triangles (hub, spoke_i, spoke_i+1) for the first 101 spokes.
    The 10k-degree hub is the wedge-explosion case the orientation must
    neutralize (hub-centered wedges would be deg^2 = 1e8 rows); expected
    counts are closed-form and must be partition-invariant."""
    v, e = hub_graph
    ring = (
        spark.range(1, 101)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
        .withColumn("relationship", F.lit("E"))
    )
    e = e.unionByName(ring)
    outs = []
    for parts in (4, 96):
        g = Graph(v.repartition(parts), e.repartition(parts))
        tc = graph_algos.triangle_count(g)
        outs.append(
            sorted((r.id, r.triangles) for r in tc.filter(F.col("triangles") > 0).collect())
        )
        spark.catalog.clearCache()
    assert outs[0] == outs[1]
    got = dict(outs[0])
    # 100 triangles (0, i, i+1) for i in 1..100: the hub corners all 100;
    # spoke 1 and 101 corner one each; spokes 2..100 corner two each
    assert got[0] == 100
    assert got[1] == 1 and got[101] == 1
    assert all(got[i] == 2 for i in range(2, 101))
    assert len(got) == 101 + 1


def test_cross_dedup_invariant_at_10x_scale(spark, skewed_docs):
    """Cross-corpus near-dup at 10x with the power-law mega-cluster split
    across corpus (even ids) and batch (odd ids): byte-identical under
    hostile repartitionings, exactly the cross-parity clone pairs (the
    mega-cluster's hot band bucket hits every batch doc of the cluster),
    and all verified pairs are true clones (Jaccard 1.0)."""
    corpus = skewed_docs.filter(F.col("doc_id") % 2 == 0)
    outs = []
    for parts in (4, 96):
        batch = skewed_docs.filter(F.col("doc_id") % 2 == 1).repartition(parts)
        buckets, shingles = dedup.build_band_index(
            corpus.repartition(parts), "doc_id", "text"
        )
        got = dedup.near_dups_against(
            batch, buckets, shingles, "doc_id", "text", threshold=0.9
        )
        outs.append(sorted((r.new_id, r.corpus_id, r.jaccard) for r in got.collect()))
        spark.catalog.clearCache()
    assert outs[0] == outs[1]
    # expected: every (odd, even) pair within a planted cluster
    n_cross = (
        (MEGA // 2) * (MEGA - MEGA // 2)  # mega: 100 odd x 100 even
        + TENS * (5 * 5)  # each 10-cluster: 5 odd x 5 even
        + PAIRS  # each pair: one odd-even cross pair (consecutive ids)
    )
    assert len(outs[0]) == n_cross
    assert all(j == 1.0 for _, _, j in outs[0])
    assert all(n % 2 == 1 and c % 2 == 0 for n, c, _ in outs[0])


def test_correlated_call_invariant_at_10x_skewed_imports(spark):
    """Correlated CALL's distinct-import-combo compile at ~10x scale with
    hostile import skew: 100k outer rows collapse onto 1,001 distinct
    import values (one value covering half the rows — the hot combo), so
    the subquery body must run over 1,001 combos, not 100k rows, and the
    null-safe join-back must fan results back out to every outer row —
    byte-identically under hostile repartitionings, including the rows
    whose import value is NULL (eqNullSafe: NULL imports are ONE combo,
    not dropped)."""
    from graph_db_clustering_spark.cypher import CypherSession
    from graph_db_clustering_spark.operators.graph import Graph

    n = 100_000
    # grp: half the rows -> 0 (hot), the rest spread over 1..999, plus a
    # NULL stripe every 1000th row
    grp = (
        F.when(F.col("id") % 1000 == 7, F.lit(None))
        .when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.col("id") % 1000)
    )
    v = (
        spark.range(n)
        .select(
            F.col("id"),
            F.lit("Row").alias("label"),
            grp.cast("long").alias("grp"),
        )
    )
    e = spark.createDataFrame([], "src long, dst long, relationship string")

    def run(vdf):
        s = CypherSession(Graph(vdf, e))
        # import the SCALAR g, not the node r: a node struct embeds the
        # unique id, which would make every import combo distinct and
        # defeat the dedup (the per-row cost Neo4j pays; the whole point
        # of the set-based compile is to exploit repeated imports)
        return s.run(
            """MATCH (r:Row)
               WITH ID(r) AS id, r.grp AS g
               CALL { WITH g MATCH (x:Row) WHERE x.grp = g
                      RETURN count(x) AS peers, sum(ID(x)) AS tot }
               RETURN id, peers, tot ORDER BY id"""
        )

    base = run(v).collect()
    assert len(base) == n
    by_id = {r.id: (r.peers, r.tot) for r in base}
    # the hot combo: every even-id non-null-stripe row sees all of them
    n_hot = sum(1 for i in range(n) if i % 1000 != 7 and i % 2 == 0)
    assert by_id[0][0] == n_hot
    assert by_id[2][0] == n_hot
    # a tail combo: odd ids with grp g = {i : i % 2 == 1, i % 1000 == g}
    g = 3
    members = [i for i in range(n) if i % 1000 == g and i % 2 == 1]
    assert by_id[members[0]] == (len(members), sum(members))
    # NULL-import rows: x.grp = NULL matches nothing -> aggregate
    # defaults, but the rows themselves must SURVIVE (left join-back)
    assert by_id[7] == (0, 0)
    # partition-hostility: skewed single-partition and 97-way layouts
    for hostile in (v.repartition(1), v.repartition(97, "grp")):
        again = run(hostile).collect()
        assert again == base


def test_shortest_path_invariant_at_10x_hub_scale(spark, hub_graph):
    """shortestPath's layered BFS on the hub graph: pair distances are
    byte-identical under hostile repartitionings, and the planted
    structure gives closed-form answers — hub->spoke = 1 (10k pairs from
    ONE bfs source, the hot frontier key), chain distances = index
    difference up to the 15-hop cap, pair edges = 1. The anti-join
    against the known set must keep every pair at its FIRST (minimal)
    layer."""
    from graph_db_clustering_spark.cypher import CypherSession
    from graph_db_clustering_spark.operators.graph import Graph as G

    v, e = hub_graph
    vdf = v.select(F.col("id"), F.lit("N").alias("label"))

    def run(vparts, eparts):
        s = CypherSession(G(vdf.repartition(vparts), e.repartition(eparts)))
        out = s.run(
            """MATCH p = shortestPath((a:N)-[:E*..15]->(b:N))
               RETURN ID(a) AS a, ID(b) AS b, length(p) AS d"""
        )
        return sorted((r.a, r.b, r.d) for r in out.collect())

    base = run(4, 96)
    assert base == run(96, 4)
    dist = {(a, b): d for a, b, d in base}
    # hub: 10k spokes at distance exactly 1, nothing else from the hub
    hub_out = [(a, b) for a, b, _ in base if a == 0]
    assert len(hub_out) == HUB_SPOKES
    assert all(dist[(0, b)] == 1 for _, b in hub_out)
    # chains: d(start+i, start+j) == j - i for j-i <= 15 within a chain
    c0 = CHAIN_START
    assert dist[(c0, c0 + 15)] == 15
    assert dist[(c0, c0 + 1)] == 1
    assert dist[(c0 + 3, c0 + 9)] == 6
    assert (c0, c0 + 16) not in dist  # next chain: unreachable
    # chain pair count: per chain, ordered pairs within 15 hops = C(16,2)
    chain_pairs = [(a, b) for a, b, _ in base if CHAIN_START <= a < PAIR_START]
    assert len(chain_pairs) == N_CHAINS * (CHAIN_LEN * (CHAIN_LEN - 1) // 2)
    # two-cliques: exactly one forward pair each at distance 1
    pair_pairs = [(a, b, d) for a, b, d in base if a >= PAIR_START]
    assert len(pair_pairs) == N_PAIRS2
    assert all(d == 1 and b == a + 1 for a, b, d in pair_pairs)


def test_semantic_dedup_survives_10x_point_mass(spark, skewed_vecs):
    """semantic_dedup under the hot point mass (30% of 50k vectors are
    ONE exact vector): without the exact-collapse step the
    within-cluster join would materialize ~15k^2/2 = 112M pairs for that
    cluster; with it, the mass contributes one representative plus a
    15k-edge star. The mass must form ONE cluster with canonical = its
    min id and everyone else stay singleton (the hash-noise tail is
    near-orthogonal)."""
    from graph_db_clustering_spark.operators.dedup import semantic_dedup

    # k ~ sqrt(N): the paper's guidance — more clusters keep the
    # within-cluster pair count (sum of cluster_size^2) small; k=8 on
    # 35k distinct vectors measured ~10 min of pair cosines, k=64 ~1 min
    out = semantic_dedup(
        skewed_vecs,
        id_col="vec_id",
        vec_col="embedding",
        k=64,
        threshold=0.999,
        max_iter=5,
    )
    rows = out.collect()
    assert len(rows) == N_VECS
    mass = [r for r in rows if r.vec_id % 10 < 3]
    rest = [r for r in rows if r.vec_id % 10 >= 3]
    n_mass = len(mass)
    assert all(r.cluster_size == n_mass for r in mass)
    min_id = min(r.vec_id for r in mass)
    assert all(r.canonical_id == min_id for r in mass)
    assert sum(r.keep for r in mass) == 1
    assert all(r.cluster_size == 1 and r.keep for r in rest)


def test_k_core_invariant_at_10x_hub_scale(spark, hub_graph):
    """Iterative peeling on the hub graph + a planted K12 clique
    (vertices GN_V..GN_V+11): the first peel round aggregates the
    10k-degree hub (the hot key), strips every spoke/chain/pair within
    two rounds, and only the clique survives to k=11 with core degree
    exactly 11. Byte-identical under hostile repartitionings (integer
    fixpoint), and the closed forms hold:
      k=2  -> exactly the 12 clique vertices (everything else is trees)
      k=11 -> same 12 vertices, core_degree 11
      k=12 -> empty."""
    v, e = hub_graph
    k12 = spark.range(GN_V, GN_V + 12)
    cl = (
        k12.select(F.col("id").alias("src"))
        .crossJoin(k12.select(F.col("id").alias("dst")))
        .filter(F.col("src") < F.col("dst"))
        .withColumn("relationship", F.lit("E"))
    )
    v2 = v.unionAll(k12)
    e2 = e.unionAll(cl)
    outs = []
    for vparts, eparts in ((4, 96), (96, 4)):
        g = Graph(v2.repartition(vparts), e2.repartition(eparts))
        core2 = sorted(
            (r.id, r.core_degree) for r in graph_algos.k_core(g, k=2).collect()
        )
        core11 = sorted(
            (r.id, r.core_degree) for r in graph_algos.k_core(g, k=11).collect()
        )
        assert graph_algos.k_core(g, k=12).count() == 0
        outs.append((core2, core11))
        spark.catalog.clearCache()
    assert outs[0] == outs[1]
    core2, core11 = outs[0]
    assert core2 == [(GN_V + i, 11) for i in range(12)]
    assert core11 == core2


def test_label_propagation_invariant_at_10x_hub_scale(spark, hub_graph):
    """Deterministic LPA on the hub graph: identical communities under
    hostile repartitionings, plus the closed-form pieces — the 10k-spoke
    star converges to community 0 (spokes tie {hub,self} and take the
    smaller; the hub's majority is its spokes' adopted label), each
    2-clique takes its min id, singletons keep their own id."""
    v, e = hub_graph
    outs = []
    for vparts, eparts in ((4, 96), (96, 4)):
        g = Graph(v.repartition(vparts), e.repartition(eparts))
        lp = graph_algos.label_propagation(g, max_iter=8)
        outs.append(sorted((r.id, r.community) for r in lp.collect()))
        spark.catalog.clearCache()
    assert outs[0] == outs[1]
    got = dict(outs[0])
    assert all(got[i] == 0 for i in range(HUB_SPOKES + 1))  # the star
    for p in range(PAIR_START, PAIR_START + 2 * N_PAIRS2, 2):
        assert got[p] == p and got[p + 1] == p  # each 2-clique -> min id
    n_clustered = (HUB_SPOKES + 1) + N_CHAINS * CHAIN_LEN + 2 * N_PAIRS2
    singles = (
        list(range(HUB_SPOKES + 1, CHAIN_START))
        + list(range(CHAIN_START + N_CHAINS * CHAIN_LEN, PAIR_START))
        + list(range(PAIR_START + 2 * N_PAIRS2, GN_V))
    )
    assert len(singles) == GN_V - n_clustered
    assert all(got[i] == i for i in singles)


def test_coreness_invariant_at_10x_hub_scale(spark, hub_graph):
    """h-index coreness on the hub graph + planted K12: the hub's round
    aggregates a 10k-value neighbor array (bounded by max degree — the
    documented memory shape), trees collapse to coreness 1 in one
    round, the clique holds 11. Byte-identical under hostile
    repartitionings; closed forms: star/chain/pair vertices 1, clique
    members 11, singletons 0."""
    k12 = spark.range(GN_V, GN_V + 12)
    v, e = hub_graph
    cl = (
        k12.select(F.col("id").alias("src"))
        .crossJoin(k12.select(F.col("id").alias("dst")))
        .filter(F.col("src") < F.col("dst"))
        .withColumn("relationship", F.lit("E"))
    )
    v2, e2 = v.unionAll(k12), e.unionAll(cl)
    outs = []
    for vparts, eparts in ((4, 96), (96, 4)):
        g = Graph(v2.repartition(vparts), e2.repartition(eparts))
        cn = graph_algos.coreness(g)
        outs.append(sorted((r.id, r.coreness) for r in cn.collect()))
        spark.catalog.clearCache()
    assert outs[0] == outs[1]
    got = dict(outs[0])
    assert all(got[i] == 1 for i in range(HUB_SPOKES + 1))
    assert all(got[GN_V + i] == 11 for i in range(12))
    assert all(
        got[i] == 1
        for i in range(CHAIN_START, CHAIN_START + N_CHAINS * CHAIN_LEN)
    )
    assert all(got[i] == 0 for i in range(HUB_SPOKES + 1, CHAIN_START))


def test_interval_overlap_invariant_with_giant_spanning_interval(spark):
    """interval_overlap_join's banded path under its worst fan-out key
    (VERDICT r6 Next #7): one giant interval spanning EVERY bucket of a
    50k-interval domain explodes into ~1001 (bin, row) candidates — the
    hot key. The banded result must equal the theta-join ground truth
    byte-for-byte and be invariant under hostile repartitionings, and
    the giant must match every left interval."""
    from graph_db_clustering_spark.operators import joins

    n_left = 50_000
    domain = 1_000_000.0
    # left: width-8 intervals tiling the domain with gaps
    left = (
        spark.range(n_left)
        .select(
            F.col("id").alias("lid"),
            (F.col("id") * (domain / n_left)).alias("ls"),
            (F.col("id") * (domain / n_left) + 8.0).alias("le"),
        )
    )
    # right: 99 width-10 intervals + the giant spanning the whole domain
    right = (
        spark.range(100)
        .select(
            F.col("id").alias("rid"),
            F.when(F.col("id") == 0, F.lit(0.0))
            .otherwise(F.col("id") * 9973.0).alias("rs"),
            F.when(F.col("id") == 0, F.lit(domain))
            .otherwise(F.col("id") * 9973.0 + 10.0).alias("re"),
        )
    )
    want = sorted(
        (r.lid, r.rid)
        for r in joins.interval_overlap_join(
            left, right, "ls", "le", "rs", "re", bucket=None
        ).select("lid", "rid").collect()
    )
    assert sum(1 for _, rid in want if rid == 0) == n_left  # giant hits all
    outs = []
    for lparts, rparts in ((4, 16), (96, 1)):
        got = joins.interval_overlap_join(
            left.repartition(lparts),
            right.repartition(rparts),
            "ls", "le", "rs", "re",
            bucket=1000.0,  # giant spans ~1001 bins — the fan-out hot key
        ).select("lid", "rid")
        outs.append(sorted((r.lid, r.rid) for r in got.collect()))
        spark.catalog.clearCache()
    assert outs[0] == outs[1] == want


def test_bipartite_project_invariant_at_10x_hub_scale(spark):
    """bipartite_project at ~10x the sf0.1 co-projection size with a
    hostile hub (VERDICT r6 Next #7): 250k chain items of degree 2 plus
    one 10k-degree hub item whose unguarded projection alone would be
    ~50M pairs. With the hub guard the result must be the exact chain
    closed form — pair (j, j+1) with common=1 — byte-identical under
    hostile repartitionings, hub contribution absent."""
    from graph_db_clustering_spark.operators import graph_algos

    n_items = 250_000
    hub_deg = 10_000
    chain = spark.range(n_items).select(
        F.explode(F.array(F.col("id"), F.col("id") + 1)).alias("l"),
        F.col("id").alias("r"),
    )
    hub = spark.range(hub_deg).select(
        (F.col("id") * 25).alias("l"), F.lit(10_000_000).alias("r")
    )
    edges = chain.unionAll(hub)
    outs = []
    for parts, key in ((4, None), (96, "l")):
        e = edges.repartition(parts, key) if key else edges.repartition(parts)
        proj = graph_algos.bipartite_project(
            e, "l", "r", max_right_degree=100
        )
        outs.append(
            proj.agg(
                F.count("*").alias("n_pairs"),
                F.sum("common").alias("sum_common"),
                F.max("common").alias("max_common"),
                F.sum(F.col("src") + F.col("dst")).alias("key_sum"),
            ).first()
        )
        spark.catalog.clearCache()
    assert outs[0] == outs[1]
    got = outs[0]
    # closed form: items j=0..n-1 each produce exactly pair (j, j+1)
    assert got.n_pairs == n_items
    assert got.sum_common == n_items and got.max_common == 1
    assert got.key_sum == sum(2 * j + 1 for j in range(n_items))


def test_basket_lift_hot_basket_bounded_by_vocab(spark):
    """basket_lift's pair join is keyed by (user, day): a single hot
    basket containing EVERY event type contributes |vocab|^2 pairs,
    not events^2 — 10x more raw events in the hot basket must not
    change the result at all (the distinct collapse runs first)."""
    import datetime

    from graph_db_clustering_spark.queries.corpus import QUERIES

    t0 = datetime.datetime(2024, 3, 1)
    types = [f"t{i}" for i in range(8)]

    def events(rep):
        rows = []
        eid = 0
        # hot user 1: every type, `rep` duplicate events per type
        for t in types:
            for _ in range(rep):
                rows.append((eid, t0, 1, t, 1.0, "{}")); eid += 1
        # background users with two types each
        for u in range(2, 30):
            rows.append((eid, t0, u, types[u % 4], 1.0, "{}")); eid += 1
            rows.append((eid, t0, u, types[4 + u % 4], 1.0, "{}")); eid += 1
        return spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )

    import tempfile

    outs = []
    for rep in (1, 10):
        with tempfile.TemporaryDirectory() as d:
            events(rep).write.parquet(d + "/events.parquet")
            outs.append(
                sorted(
                    (r.x, r.y, r.n_both, r.lift)
                    for r in QUERIES["basket_lift"](spark, d).collect()
                )
            )
    assert outs[0] == outs[1] and len(outs[0]) > 0


def test_attribution_hot_user_invariant_under_repartition(spark):
    """attribution's per-purchase argmax must be deterministic for a
    hot user with many equal-timestamp clicks (max_by struct tie-break
    on the larger click id), regardless of partitioning."""
    import datetime
    import tempfile

    from graph_db_clustering_spark.queries.corpus import QUERIES

    t0 = datetime.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for _ in range(200):  # 200 clicks at the SAME instant
        rows.append((eid, t0, 7, "click", 1.0, "{}")); eid += 1
    rows.append((eid, t0 + datetime.timedelta(hours=1), 7, "purchase", 1.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = []
    for parts in (1, 13):
        with tempfile.TemporaryDirectory() as d:
            df.repartition(parts).write.parquet(d + "/events.parquet")
            got.append([tuple(r) for r in QUERIES["attribution"](spark, d).collect()])
    assert got[0] == got[1]
    assert got[0][0][2] == 199  # the largest click id wins the tie
