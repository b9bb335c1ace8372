"""Property tests for clustering (SURVEY §5.2.4): SSE non-increasing,
unique assignment, convergence fixpoint, purity in [0,1], empty-cluster
safety, MLlib parity."""

import pytest
from pyspark.sql import functions as F

from graph_db_clustering_spark.catalog import load_table
from graph_db_clustering_spark.operators import kmeans


@pytest.fixture(scope="module")
def points(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


def test_init_deterministic(points):
    c1 = kmeans.init_centroids(points, "vec_id", "embedding", 3).collect()
    c2 = kmeans.init_centroids(points, "vec_id", "embedding", 3).collect()
    assert [r.cid for r in c1] == [0, 1, 2]
    assert c1 == c2


def test_every_point_assigned_exactly_once(points):
    cents = kmeans.init_centroids(points, "vec_id", "embedding", 4)
    a = kmeans.assign(points, cents)
    n = points.count()
    assert a.count() == n
    assert a.select("id").distinct().count() == n


def test_sse_non_increasing_euclidean(points):
    cents = kmeans.init_centroids(points, "vec_id", "embedding", 4)
    sses = []
    for _ in range(4):
        a = kmeans.assign(points, cents, metric="euclidean")
        sses.append(a.agg(F.sum("score")).first()[0])
        cents = kmeans.update(points, a, cents)
    for prev, nxt in zip(sses, sses[1:]):
        assert nxt <= prev + 1e-6, sses


def test_fit_converges_and_is_fixpoint(points):
    res = kmeans.fit(points, k=2, max_iter=30)
    assert res.converged
    # converged assignment is a fixpoint: one more assign yields same counts
    again = kmeans.assign(points, res.centroids)
    c1 = {r.cid: r.n for r in res.assignments.groupBy("cid").agg(F.count("*").alias("n")).collect()}
    c2 = {r.cid: r.n for r in again.groupBy("cid").agg(F.count("*").alias("n")).collect()}
    assert c1 == c2


def test_purity_in_unit_interval(points):
    res = kmeans.fit(points, k=2, max_iter=10)
    scores = kmeans.purity_scores(res.assignments, points, "vec_id", "label").collect()
    assert len(scores) >= 1
    for r in scores:
        assert 0.0 <= r.purity <= 1.0
        assert r.hi + r.lo > 0


def test_empty_cluster_keeps_previous_centroid(points, spark):
    cents = kmeans.init_centroids(points, "vec_id", "embedding", 2)
    a = kmeans.assign(points, cents)
    # force cluster 1 empty by reassigning everything to cluster 0
    forced = a.withColumn("cid", F.lit(0))
    updated = kmeans.update(points, forced, cents)
    assert updated.count() == 2  # the reference would ZeroDivisionError here
    prev = {r.cid: r.centroid for r in cents.collect()}
    new = {r.cid: r.centroid for r in updated.collect()}
    assert new[1] == prev[1]  # empty cluster kept its centroid
    assert new[0] != prev[0]


def test_reference_bug_parity_flips_assignment(points):
    cents = kmeans.init_centroids(points, "vec_id", "embedding", 2)
    good = kmeans.assign(points, cents, parity="corrected")
    bug = kmeans.assign(points, cents, parity="reference-bug")
    merged = good.select("id", F.col("cid").alias("g")).join(
        bug.select("id", F.col("cid").alias("b")), "id"
    )
    # with k=2 the least-similar centroid is always the other one
    assert merged.filter(F.col("g") == F.col("b")).count() == 0


def test_mllib_parity_euclidean(points):
    """Pure-DataFrame Lloyd's and MLlib KMeans reach solutions of equal
    quality (same k, euclidean): converged SSE within 15% in BOTH
    directions. SSE parity is permutation- and basin-invariant, unlike
    the pairwise co-assignment vote this replaces — k=2 on this data has
    near-tied local optima, and which one a run lands in can flip with
    float summation order (partition scheduling), which made the old
    agree>disagree vote hover at 50/50 and flake under a loaded suite."""
    res = kmeans.fit(points, k=2, metric="euclidean", max_iter=30)
    model, preds = kmeans.mllib_fit(
        points, k=2, vec_col="embedding", seed=42, max_iter=30
    )
    # fit()'s euclidean score column IS the squared distance, so its sum
    # over the converged assignments is the same quantity as trainingCost
    ours = res.assignments.agg(F.sum("score")).first()[0]
    theirs = model.summary.trainingCost
    assert preds.count() == res.assignments.count()
    assert ours <= theirs * 1.15, (ours, theirs)
    assert theirs <= ours * 1.15, (ours, theirs)


def test_kmeans_parallel_init_deterministic_and_invariant(points):
    from graph_db_clustering_spark.operators.kmeans import init_centroids_parallel

    a = sorted(
        (r.cid, tuple(r.centroid))
        for r in init_centroids_parallel(points.repartition(1), "vec_id", "embedding", 4).collect()
    )
    b = sorted(
        (r.cid, tuple(r.centroid))
        for r in init_centroids_parallel(
            points.repartition(7, "vec_id"), "vec_id", "embedding", 4
        ).collect()
    )
    assert a == b
    assert len(a) == 4
    assert len({c for _, c in a}) == 4  # distinct centers


def test_kmeans_parallel_init_covers_planted_blobs(spark):
    """Five well-separated blobs with 90% of mass in blob 0: plain
    k-point sampling would land ~all centers in the heavy blob; the
    d^2-weighted k-means|| rounds must cover EVERY blob."""
    from graph_db_clustering_spark.operators.kmeans import init_centroids_parallel

    i = F.col("id")
    blob = F.when(i % 10 < 6, 0).otherwise((i % 10) - 5)  # 0,0,0,0,0,0,1,2,3,4
    noise = lambda j: (F.sin(i * 12.9898 + j * 78.233) * 43758.5453) % 1.0 * 0.1  # noqa: E731
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(7)),
        lambda j: (F.when(j == blob, 100.0).otherwise(0.0) + noise(j)).cast("double"),
    )
    pts = spark.range(2000).select("id", vec.alias("embedding"))
    cents = init_centroids_parallel(pts, "id", "embedding", k=5, rounds=4)
    got = [list(r.centroid) for r in cents.collect()]
    assert len(got) == 5
    covered = set()
    for c in got:
        axis = max(range(8), key=lambda j: c[j])
        if c[axis] > 50:
            covered.add(axis)
    assert covered == {0, 1, 2, 3, 4}, covered


def test_kmeans_parallel_init_feeds_fit(points):
    """The (cid, centroid) contract plugs straight into the Lloyd loop:
    one assign+update round runs and SSE is finite."""
    from graph_db_clustering_spark.operators import kmeans as km

    cents = km.init_centroids_parallel(points, "vec_id", "embedding", 3)
    a = km.assign(points, cents, metric="euclidean")
    sse = a.agg(F.sum("score")).first()[0]
    assert sse is not None and sse >= 0
    assert a.select("cid").distinct().count() <= 3


def test_ari_nmi_closed_forms(spark):
    from graph_db_clustering_spark.operators import kmeans as km

    ids = spark.range(100).select(F.col("id"))
    # identical partitions -> both metrics exactly 1
    a = ids.select("id", (F.col("id") % 4).alias("cid"))
    labels = ids.select("id", (F.col("id") % 4).alias("lab"))
    assert km.adjusted_rand_index(a, labels, "id", "lab") == pytest.approx(1.0)
    assert km.normalized_mutual_info(a, labels, "id", "lab") == pytest.approx(1.0)
    # a pure relabeling is still a perfect match
    b = ids.select("id", ((F.col("id") % 4) * 7 + 1).alias("cid"))
    assert km.adjusted_rand_index(b, labels, "id", "lab") == pytest.approx(1.0)
    # independent partitions -> ARI ~ 0 (chance level)
    c = ids.select("id", (F.col("id") / 25).cast("int").alias("cid"))
    ari = km.adjusted_rand_index(c, labels, "id", "lab")
    assert abs(ari) < 0.05, ari
    # one-cluster side: NMI defined as 0-denominator -> 1.0 only if both
    # degenerate; single cluster vs real labels gives MI 0
    d = ids.select("id", F.lit(0).alias("cid"))
    assert km.normalized_mutual_info(d, labels, "id", "lab") == pytest.approx(0.0)


def test_ari_against_sklearn_formula_small(spark):
    """Hand-computed 6-point example: clusters {0,1,2|3,4,5}, labels
    {0,1|2,3,4,5}. Contingency [[2,1],[0,3]] -> ARI = 0.2424... (the
    textbook value, computed by hand from the Hubert-Arabie formula)."""
    from graph_db_clustering_spark.operators import kmeans as km

    rows = [(i, 0 if i < 3 else 1) for i in range(6)]
    a = spark.createDataFrame(rows, "id long, cid int")
    lab = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1), (4, 1), (5, 1)], "id long, lab int"
    )
    # sum_comb=C(2,2)+C(1,2)+C(3,2)=1+0+3=4; sum_a=2*C(3,2)=6; sum_b=C(2,2)+C(4,2)=1+6=7
    # total=C(6,2)=15; expected=6*7/15=2.8; max=(6+7)/2=6.5; ARI=(4-2.8)/(6.5-2.8)
    want = (4 - 2.8) / (6.5 - 2.8)
    assert km.adjusted_rand_index(a, lab, "id", "lab") == pytest.approx(want)
