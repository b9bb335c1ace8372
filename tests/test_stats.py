"""operators/stats: PCA moment aggregation and the two-sample KS
statistic — numpy/closed-form parity, determinism, partitioning
invariance."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from graph_db_clustering_spark.catalog import load_table
from graph_db_clustering_spark.operators.stats import (
    ks_statistic,
    pca_fit,
    pca_transform,
)

SF = "/root/testdata/sf0.001"


def _np_pca(x, k):
    mean = x.mean(axis=0)
    cov = np.cov(x, rowvar=False, ddof=1)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order]
    flips = np.sign(comps[np.abs(comps).argmax(axis=0), np.arange(k)])
    flips[flips == 0] = 1.0
    return mean, comps * flips, w[order]


def test_pca_matches_numpy_exactly(spark):
    emb = load_table(spark, SF, "embeddings")
    x = np.asarray([list(r.embedding) for r in emb.select("embedding").collect()], dtype=np.float64)
    model = pca_fit(emb, "embedding", k=4)
    mean, comps, var = _np_pca(x, 4)
    assert np.allclose(model.mean, mean, atol=1e-10)
    assert np.allclose(model.components, comps, atol=1e-8)
    assert np.allclose(model.explained_var, var, rtol=1e-10)
    # explained variance is sorted descending and components orthonormal
    assert np.all(np.diff(model.explained_var) <= 1e-12)
    assert np.allclose(model.components.T @ model.components, np.eye(4), atol=1e-10)


def test_pca_transform_projects_and_preserves_columns(spark):
    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    model = pca_fit(emb, "embedding", k=2)
    out = pca_transform(emb, "embedding", model)
    assert out.columns == ["vec_id", "pc"]
    got = {r.vec_id: np.asarray(r.pc) for r in out.collect()}
    x = {r.vec_id: np.asarray(list(r.embedding), dtype=np.float64) for r in emb.collect()}
    for vid, v in list(x.items())[:20]:
        want = (v - model.mean) @ model.components
        assert np.allclose(got[vid], want, atol=1e-10)


def test_pca_partitioning_invariant(spark):
    emb = load_table(spark, SF, "embeddings")
    m1 = pca_fit(emb, "embedding", k=3)
    m2 = pca_fit(emb.repartition(13), "embedding", k=3)
    assert np.allclose(m1.components, m2.components, atol=1e-8)
    assert np.allclose(m1.explained_var, m2.explained_var, rtol=1e-9)


def test_pca_empty_and_tiny_inputs_raise(spark):
    emb = load_table(spark, SF, "embeddings")
    with pytest.raises(ValueError, match="empty"):
        pca_fit(emb.filter(F.lit(False)), "embedding", k=2)
    with pytest.raises(ValueError, match="at least 2"):
        pca_fit(emb.limit(1), "embedding", k=2)


def test_ks_statistic_known_and_ties(spark):
    """Hand-computed: g0 = {1, 2, 3}, g1 = {2, 3, 4, 4}. Distinct values
    1,2,3,4 -> F0 = 1/3, 2/3, 1, 1; F1 = 0, 1/4, 2/4, 1. Sup diff is
    at v=3: |1 - 1/2| = 1/2. The tie at 4 must collapse BEFORE the
    cumulative pass (a row-window would see an intermediate 3/4)."""
    rows = [(1.0, 0), (2.0, 0), (3.0, 0), (2.0, 1), (3.0, 1), (4.0, 1), (4.0, 1)]
    df = spark.createDataFrame(rows, "value double, grp int")
    r = ks_statistic(df, "value", "grp").first()
    assert r.n0 == 3 and r.n1 == 4
    assert abs(r.ks_d - 0.5) < 1e-12


def test_ks_statistic_identical_and_disjoint(spark):
    same = spark.createDataFrame(
        [(float(v), g) for v in range(10) for g in (0, 1)], "value double, grp int"
    )
    assert ks_statistic(same, "value", "grp").first().ks_d == 0.0
    apart = spark.createDataFrame(
        [(float(v), 0) for v in range(5)] + [(float(v + 100), 1) for v in range(5)],
        "value double, grp int",
    )
    assert ks_statistic(apart, "value", "grp").first().ks_d == 1.0


def test_contingency_stats_known_table(spark):
    """Hand-computed 2x2: a=x rows (10, 20), a=y rows (30, 40).
    n=100; row sums 30, 70; col sums 40, 60. E = [[12,18],[28,42]];
    chi2 = 4/12 + 4/18 + 4/28 + 4/42 = 0.7936...; dof 1;
    V = sqrt(chi2/n); MI = sum p ln(p/(pa pb))."""
    import math

    from graph_db_clustering_spark.operators.stats import contingency_stats

    rows = (
        [("x", "u")] * 10 + [("x", "v")] * 20 + [("y", "u")] * 30 + [("y", "v")] * 40
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = contingency_stats(df, "a", "b").first()
    chi2 = 4 / 12 + 4 / 18 + 4 / 28 + 4 / 42
    mi = sum(
        p * math.log(p / (pa * pb))
        for p, pa, pb in [
            (0.1, 0.3, 0.4),
            (0.2, 0.3, 0.6),
            (0.3, 0.7, 0.4),
            (0.4, 0.7, 0.6),
        ]
    )
    assert r.n == 100 and r.dof == 1
    assert abs(r.chi2 - chi2) < 1e-9
    assert abs(r.cramers_v - math.sqrt(chi2 / 100)) < 1e-9
    assert abs(r.mi - mi) < 1e-12


def test_contingency_stats_independent_is_zero(spark):
    """A perfectly independent (product-form) table has chi2 = 0 and
    MI = 0 exactly."""
    from graph_db_clustering_spark.operators.stats import contingency_stats

    rows = []
    for a, na in (("x", 2), ("y", 3)):
        for b, nb in (("u", 4), ("v", 6)):
            rows += [(a, b)] * (na * nb)
    df = spark.createDataFrame(rows, "a string, b string")
    r = contingency_stats(df, "a", "b").first()
    assert abs(r.chi2) < 1e-9 and abs(r.mi) < 1e-12 and abs(r.cramers_v) < 1e-9


def test_simplified_silhouette_blobs_and_validation(spark):
    """Well-separated blobs labeled correctly -> silhouette near 1;
    the same blobs labeled RANDOMLY -> near 0 or below; <2 clusters
    raises."""
    import numpy as np

    from graph_db_clustering_spark.operators.stats import simplified_silhouette

    rng = np.random.default_rng(7)
    a = rng.normal(0.0, 0.05, size=(40, 3))
    b = rng.normal(3.0, 0.05, size=(40, 3))
    rows = [(i, v.tolist(), int(i >= 40)) for i, v in enumerate(np.vstack([a, b]))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, cluster int")
    good = simplified_silhouette(df, "vec_id", "embedding", "cluster")
    assert good.agg(F.avg("silhouette")).first()[0] > 0.95
    shuffled = df.withColumn("cluster", (F.col("vec_id") % 2).cast("int"))
    bad = simplified_silhouette(shuffled, "vec_id", "embedding", "cluster")
    assert bad.agg(F.avg("silhouette")).first()[0] < 0.2
    with pytest.raises(ValueError, match="at least 2"):
        simplified_silhouette(
            df.withColumn("cluster", F.lit(0)), "vec_id", "embedding", "cluster"
        )


def test_ks_scale_path_equals_reference_form(spark):
    """ks_statistic_scale (range-partitioned prefix sums, no global
    window) must equal ks_statistic exactly — on real events data and
    on a tie-heavy synthetic set, across partition counts."""
    import numpy as np

    from graph_db_clustering_spark.operators.stats import ks_statistic_scale

    ev = load_table(spark, SF, "events").select(
        "value", (F.col("user_id") % 2).cast("int").alias("grp")
    )
    want = ks_statistic(ev, "value", "grp").first()
    for p in (2, 7, 32):
        got = ks_statistic_scale(ev, "value", "grp", partitions=p).first()
        assert (got.n0, got.n1) == (want.n0, want.n1)
        assert abs(got.ks_d - want.ks_d) < 1e-12, p
    rng = np.random.default_rng(3)
    rows = [(float(v), int(g)) for v, g in zip(rng.integers(0, 20, 500), rng.integers(0, 2, 500))]
    df = spark.createDataFrame(rows, "value double, grp int")
    w2 = ks_statistic(df, "value", "grp").first()
    g2 = ks_statistic_scale(df, "value", "grp", partitions=5).first()
    assert abs(g2.ks_d - w2.ks_d) < 1e-12


def test_cluster_medoids_known_and_tiebreak(spark):
    """1-D clusters: cluster 0 = {0, 10, 11} -> medoid 10 (total
    |10-0|+|10-11| = 11 beats 0's 21 and 11's 13); cluster 1 = two
    equidistant points -> tie broken to the smaller id."""
    from graph_db_clustering_spark.operators.stats import cluster_medoids

    rows = [
        (1, [0.0], 0),
        (2, [10.0], 0),
        (3, [11.0], 0),
        (7, [5.0], 1),
        (8, [9.0], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, cluster int")
    got = {r.cluster: r for r in cluster_medoids(df, "vec_id", "embedding", "cluster").collect()}
    assert got[0].medoid_id == 2 and abs(got[0].avg_dist - 11 / 2) < 1e-12
    assert got[1].medoid_id == 7 and abs(got[1].avg_dist - 4.0) < 1e-12


def test_ols_matches_numpy_lstsq_multifeature(spark):
    """3-feature OLS on lineitem vs numpy.linalg.lstsq on the collected
    design — coefficients, intercept, and R^2."""
    from graph_db_clustering_spark.operators.stats import ols_fit

    li = load_table(spark, SF, "lineitem").select(
        "l_quantity", "l_discount", "l_tax", "l_extendedprice"
    )
    feats = ["l_quantity", "l_discount", "l_tax"]
    m = ols_fit(li, feats, "l_extendedprice")
    pdf = li.toPandas()
    a = np.hstack([pdf[feats].to_numpy(), np.ones((len(pdf), 1))])
    y = pdf["l_extendedprice"].to_numpy()
    beta, *_ = np.linalg.lstsq(a, y, rcond=None)
    assert np.allclose(m["coef"], beta[:3], rtol=1e-8)
    assert abs(m["intercept"] - beta[3]) < 1e-6 * max(1, abs(beta[3]))
    pred = a @ beta
    r2 = 1 - ((y - pred) ** 2).sum() / ((y - y.mean()) ** 2).sum()
    assert abs(m["r2"] - r2) < 1e-9
    assert m["n"] == len(pdf)
    with pytest.raises(ValueError, match="need more than"):
        ols_fit(li.limit(3), feats, "l_extendedprice")


def test_ks_random_vs_numpy_ecdf(spark):
    """Randomized cross-check: D from the distributed form equals the
    numpy two-sided ECDF sup over the pooled support, including heavy
    ties."""
    rng = np.random.default_rng(17)
    for trial in range(4):
        v0 = rng.integers(0, 15, size=rng.integers(5, 60)).astype(float)
        v1 = rng.integers(0, 15, size=rng.integers(5, 60)).astype(float)
        rows = [(float(x), 0) for x in v0] + [(float(x), 1) for x in v1]
        df = spark.createDataFrame(rows, "value double, grp int")
        got = ks_statistic(df, "value", "grp").first()
        support = np.unique(np.concatenate([v0, v1]))
        f0 = (v0[:, None] <= support[None, :]).mean(axis=0)
        f1 = (v1[:, None] <= support[None, :]).mean(axis=0)
        want = np.abs(f0 - f1).max()
        assert abs(got.ks_d - want) < 1e-12, trial


def test_contingency_random_vs_numpy(spark):
    """Randomized cross-check of chi2 / MI / Cramer's V against direct
    numpy formulas on random contingency tables."""
    import math

    from graph_db_clustering_spark.operators.stats import contingency_stats

    rng = np.random.default_rng(23)
    for trial in range(3):
        ka, kb = rng.integers(2, 5), rng.integers(2, 5)
        table = rng.integers(1, 30, size=(ka, kb))
        rows = [
            (f"a{i}", f"b{j}")
            for i in range(ka)
            for j in range(kb)
            for _ in range(table[i, j])
        ]
        df = spark.createDataFrame(rows, "a string, b string").repartition(5)
        r = contingency_stats(df, "a", "b").first()
        n = table.sum()
        ra = table.sum(axis=1, keepdims=True)
        cb = table.sum(axis=0, keepdims=True)
        e = ra * cb / n
        chi2 = ((table - e) ** 2 / e).sum()
        p = table / n
        mi = (p * np.log(table * n / (ra * cb))).sum()
        assert r.n == n and r.dof == (ka - 1) * (kb - 1)
        assert abs(r.chi2 - chi2) < 1e-9
        assert abs(r.mi - mi) < 1e-9
        assert abs(r.cramers_v - math.sqrt(chi2 / (n * (min(ka, kb) - 1)))) < 1e-9


def test_cms_one_sided_and_mergeable(spark):
    """CMS guarantees: estimate >= exact for EVERY key; a sketch built
    on the whole equals the cell-wise sum of sketches built on splits
    (mergeability); a narrow sketch still never undercounts."""
    from graph_db_clustering_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    rows = [(f"k{i % 7}",) for i in range(200)] + [("hot",)] * 100
    df = spark.createDataFrame(rows, "k string")
    exact = {r.k: r.c for r in df.groupBy("k").agg(F.count("*").alias("c")).collect()}
    for width in (64, 4):  # 4 forces collisions
        cms = cms_build(df, "k", depth=4, width=width)
        est = {
            r.k: r.cms_est
            for r in cms_estimate(
                df.select("k").distinct(), cms, "k", depth=4, width=width
            ).collect()
        }
        assert set(est) == set(exact)
        for k in exact:
            assert est[k] >= exact[k], (width, k)
    a = spark.createDataFrame(rows[:150], "k string")
    b = spark.createDataFrame(rows[150:], "k string")
    merged = (
        cms_build(a, "k").unionAll(cms_build(b, "k"))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_build(df, "k")
    got = {(r.row, r.bucket): r.cnt for r in merged.collect()}
    want = {(r.row, r.bucket): r.cnt for r in whole.collect()}
    assert got == want


def test_auc_known_values(spark):
    """Perfect separation -> 1.0; reversed -> 0.0; all ties -> 0.5;
    a hand-computed mixed case with a tie."""
    from graph_db_clustering_spark.operators.stats import auc_score

    perfect = spark.createDataFrame(
        [(1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1)], "s double, y int"
    )
    assert auc_score(perfect, "s", "y").first().auc == 1.0
    reverse = spark.createDataFrame(
        [(1.0, 1), (2.0, 1), (3.0, 0), (4.0, 0)], "s double, y int"
    )
    assert auc_score(reverse, "s", "y").first().auc == 0.0
    ties = spark.createDataFrame(
        [(5.0, 1), (5.0, 0), (5.0, 1), (5.0, 0)], "s double, y int"
    )
    assert auc_score(ties, "s", "y").first().auc == 0.5
    # pos scores {2, 3}, neg {1, 3}: pairs (2>1)=1, (2 vs 3)=0,
    # (3>1)=1, (3==3)=0.5 -> U=2.5, AUC=2.5/4
    mixed = spark.createDataFrame(
        [(2.0, 1), (3.0, 1), (1.0, 0), (3.0, 0)], "s double, y int"
    )
    r = mixed_r = auc_score(mixed, "s", "y").first()
    assert r.n_pos == 2 and r.n_neg == 2
    assert abs(mixed_r.auc - 0.625) < 1e-12


def test_auc_matches_pairwise_reference(spark):
    """Randomized cross-check vs the O(P*N) pairwise definition."""
    rng = np.random.default_rng(31)
    for trial in range(3):
        from graph_db_clustering_spark.operators.stats import auc_score

        s = rng.integers(0, 12, 80).astype(float)
        y = rng.integers(0, 2, 80)
        df = spark.createDataFrame(
            [(float(a), int(b)) for a, b in zip(s, y)], "s double, y int"
        )
        pos, neg = s[y == 1], s[y == 0]
        want = (
            (pos[:, None] > neg[None, :]).sum()
            + 0.5 * (pos[:, None] == neg[None, :]).sum()
        ) / (len(pos) * len(neg))
        got = auc_score(df, "s", "y").first().auc
        assert abs(got - want) < 1e-12, trial


def test_psi_identical_and_shifted(spark):
    """Same distribution both sides -> PSI ~ 0 (smoothing keeps it
    tiny, not exactly 0); a hard mean shift -> large PSI."""
    from graph_db_clustering_spark.operators.stats import psi_drift

    rng = np.random.default_rng(5)
    base = rng.normal(50, 10, 2000)
    same = spark.createDataFrame(
        [(float(v), i < 1000) for i, v in enumerate(base)], "v double, ref boolean"
    )
    r = psi_drift(same, "v", F.col("ref")).first()
    assert r.n_ref == 1000 and r.n_cur == 1000
    assert abs(r.psi) < 0.05
    shifted = spark.createDataFrame(
        [(float(v), True) for v in base[:1000]]
        + [(float(v + 30), False) for v in base[1000:]],
        "v double, ref boolean",
    )
    assert psi_drift(shifted, "v", F.col("ref")).first().psi > 0.5


def test_cluster_medoids_clara_sampling(spark):
    """sample_per_cluster >= cluster size coincides with exact; a
    small sample is deterministic under hostile repartitioning and
    still a cluster member near the center for a tight blob."""
    from graph_db_clustering_spark.operators.stats import cluster_medoids

    rng = np.random.default_rng(11)
    rows = [
        (int(i), (rng.normal(c * 10, 0.5, 3)).tolist(), int(c))
        for c in (0, 1)
        for i in range(c * 100, c * 100 + 40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, cluster int")
    exact = {r.cluster: r.medoid_id for r in cluster_medoids(df, "vec_id", "embedding", "cluster").collect()}
    full = {r.cluster: r.medoid_id for r in cluster_medoids(df, "vec_id", "embedding", "cluster", sample_per_cluster=1000).collect()}
    assert exact == full
    s1 = {r.cluster: r.medoid_id for r in cluster_medoids(df, "vec_id", "embedding", "cluster", sample_per_cluster=10).collect()}
    s2 = {r.cluster: r.medoid_id for r in cluster_medoids(df.repartition(13), "vec_id", "embedding", "cluster", sample_per_cluster=10).collect()}
    assert s1 == s2
    assert 0 <= s1[0] < 40 and 100 <= s1[1] < 140  # a member of its cluster


@pytest.mark.slow  # >=10 s (r15 tiering)
def test_dbscan_blobs_border_and_noise(spark):
    """Two tight blobs + one isolated point: blobs become two clusters
    labeled by their min core id, the straggler is noise (-1); a
    border point within eps of cores from ONE blob joins that blob
    without being core itself."""
    from graph_db_clustering_spark.operators.stats import dbscan_2d

    rng = np.random.default_rng(13)
    blob_a = rng.uniform(0, 0.01, size=(10, 2))
    blob_b = rng.uniform(0, 0.01, size=(10, 2)) + 5.0
    rows = (
        [(i, float(x), float(y)) for i, (x, y) in enumerate(blob_a)]
        + [(100 + i, float(x), float(y)) for i, (x, y) in enumerate(blob_b)]
        + [(500, 2.5, 2.5)]                 # noise
        + [(501, float(blob_a[0][0] + 0.018), float(blob_a[0][1]))]  # border-ish
    )
    df = spark.createDataFrame(rows, "id long, x double, y double")
    got = {r.id: (r.label, r.is_core) for r in dbscan_2d(df, "id", "x", "y", 0.02, 5).collect()}
    assert got[500] == (-1, False)
    labels_a = {got[i][0] for i in range(10)}
    labels_b = {got[100 + i][0] for i in range(10)}
    assert labels_a == {0} and labels_b == {100}
    assert all(got[i][1] for i in range(10))
    assert got[501][0] == 0  # joins blob A via a core neighbor
    # invariance under hostile repartition
    got2 = {
        r.id: (r.label, r.is_core)
        for r in dbscan_2d(df.repartition(7), "id", "x", "y", 0.02, 5).collect()
    }
    assert got2 == got


def test_ridge_shrinks_and_matches_closed_form(spark):
    """Ridge with l2=0 equals OLS; a large l2 shrinks coefficients
    toward 0 but never the intercept; closed form parity vs numpy."""
    from graph_db_clustering_spark.operators.stats import ols_fit

    li = load_table(spark, SF, "lineitem").select(
        "l_quantity", "l_discount", "l_extendedprice"
    )
    feats = ["l_quantity", "l_discount"]
    plain = ols_fit(li, feats, "l_extendedprice")
    ridge = ols_fit(li, feats, "l_extendedprice", l2=1e6)
    assert np.all(np.abs(ridge["coef"]) < np.abs(plain["coef"]))
    pdf = li.toPandas()
    a = np.hstack([pdf[feats].to_numpy(), np.ones((len(pdf), 1))])
    y = pdf["l_extendedprice"].to_numpy()
    g = a.T @ a + 1e6 * np.diag([1.0, 1.0, 0.0])
    want = np.linalg.solve(g, a.T @ y)
    assert np.allclose(ridge["coef"], want[:2], rtol=1e-8)
    assert abs(ridge["intercept"] - want[2]) < 1e-6 * max(1, abs(want[2]))


def test_logreg_matches_driver_newton_and_separation(spark):
    """Distributed IRLS equals a driver-side Newton fit on the same
    data; prediction probabilities match the sigmoid; l2 keeps a
    perfectly separable problem finite."""
    from graph_db_clustering_spark.operators.stats import (
        logreg_fit,
        logreg_predict,
    )

    rng = np.random.default_rng(19)
    n = 400
    x1 = rng.normal(0, 1, n)
    x2 = rng.normal(0, 1, n)
    z = 0.8 * x1 - 1.3 * x2 + 0.4
    y = (rng.uniform(size=n) < 1 / (1 + np.exp(-z))).astype(int)
    df = spark.createDataFrame(
        [(float(a), float(b), int(c)) for a, b, c in zip(x1, x2, y)],
        "x1 double, x2 double, y int",
    )
    m = logreg_fit(df, ["x1", "x2"], "y")
    assert m["converged"] and m["n"] == n

    a = np.column_stack([x1, x2, np.ones(n)])
    beta = np.zeros(3)
    for _ in range(50):
        mu = 1 / (1 + np.exp(-np.clip(a @ beta, -35, 35)))
        w = mu * (1 - mu)
        step = np.linalg.solve((a * w[:, None]).T @ a, a.T @ (y - mu))
        beta += step
        if np.abs(step).max() < 1e-12:
            break
    assert np.allclose(m["coef"], beta[:2], rtol=1e-6, atol=1e-8)
    assert abs(m["intercept"] - beta[2]) < 1e-6

    scored = logreg_predict(df, ["x1", "x2"], m)
    r0 = scored.first()
    want_p = 1 / (1 + np.exp(-(m["coef"][0] * r0.x1 + m["coef"][1] * r0.x2 + m["intercept"])))
    assert abs(r0.prob - want_p) < 1e-12
    # plan: scoring is pure codegen
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan

    sep = spark.createDataFrame(
        [(float(i), int(i > 0)) for i in range(-50, 51) if i != 0],
        "x double, y int",
    )
    ms = logreg_fit(sep, ["x"], "y", l2=1.0)
    assert np.isfinite(ms["coef"][0]) and ms["converged"]


@pytest.mark.slow  # >=10 s (r15 tiering)
def test_pic_separates_blobs_like_dbscan(spark):
    """Two well-separated 2-D blobs: PIC's pseudo-eigenvector k-means
    recovers the same two groups DBSCAN finds, deterministically."""
    from graph_db_clustering_spark.operators.stats import pic_cluster

    rng = np.random.default_rng(21)
    # asymmetric blobs: PIC separates via per-cluster consensus VALUES,
    # which coincide for perfectly identical twins (size/density is the
    # signal, exactly as in the paper's volume argument)
    a = rng.uniform(0, 0.05, size=(20, 2))
    b = rng.uniform(0, 0.12, size=(45, 2)) + 2.0
    rows = [
        (i, float(x), float(y)) for i, (x, y) in enumerate(np.vstack([a, b]))
    ]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    got = {r.id: r.cid for r in pic_cluster(df, "id", "x", "y", eps=0.12, k=2).collect()}
    ca = {got[i] for i in range(20)}
    cb = {got[i] for i in range(20, 65)}
    assert len(ca) == 1 and len(cb) == 1 and ca != cb
    got2 = {
        r.id: r.cid
        for r in pic_cluster(df.repartition(7), "id", "x", "y", eps=0.12, k=2).collect()
    }
    assert got2 == got


def test_poisson_matches_driver_newton(spark):
    """Distributed Poisson IRLS equals a driver-side Newton fit and
    recovers the generating rates."""
    from graph_db_clustering_spark.operators.stats import poisson_fit

    rng = np.random.default_rng(29)
    n = 600
    x = rng.normal(0, 0.5, n)
    lam = np.exp(0.7 * x + 1.2)
    y = rng.poisson(lam)
    df = spark.createDataFrame(
        [(float(a), int(b)) for a, b in zip(x, y)], "x double, y int"
    )
    m = poisson_fit(df, ["x"], "y")
    assert m["converged"]
    a = np.column_stack([x, np.ones(n)])
    beta = np.zeros(2)
    for _ in range(60):
        mu = np.exp(np.clip(a @ beta, -30, 30))
        step = np.linalg.solve((a * mu[:, None]).T @ a, a.T @ (y - mu))
        beta += step
        if np.abs(step).max() < 1e-13:
            break
    assert np.allclose(m["coef"], beta[:1], rtol=1e-8)
    assert abs(m["intercept"] - beta[1]) < 1e-8
    assert abs(m["coef"][0] - 0.7) < 0.1 and abs(m["intercept"] - 1.2) < 0.1


def test_ridge_r2_uses_unpenalized_sse(spark):
    """ADVICE r8 (low): ridge SSE must be evaluated against the
    UNPENALIZED Gram — the r2 reported for l2 > 0 equals
    1 - sum((y - X@beta)^2)/SST computed directly in numpy."""
    from graph_db_clustering_spark.operators.stats import ols_fit

    li = load_table(spark, SF, "lineitem").select(
        "l_quantity", "l_discount", "l_extendedprice"
    )
    feats = ["l_quantity", "l_discount"]
    ridge = ols_fit(li, feats, "l_extendedprice", l2=1e4)
    pdf = li.toPandas()
    a = np.hstack([pdf[feats].to_numpy(), np.ones((len(pdf), 1))])
    y = pdf["l_extendedprice"].to_numpy()
    beta = np.linalg.solve(
        a.T @ a + 1e4 * np.diag([1.0, 1.0, 0.0]), a.T @ y
    )
    resid = y - a @ beta
    sst = float(np.sum((y - y.mean()) ** 2))
    want_r2 = 1.0 - float(resid @ resid) / sst
    assert abs(ridge["r2"] - want_r2) < 1e-9
    # and the ridge r2 never exceeds the OLS optimum
    plain = ols_fit(li, feats, "l_extendedprice")
    assert ridge["r2"] <= plain["r2"] + 1e-12


@pytest.mark.slow  # >=10 s (r15 tiering)
def test_moment_reduce_is_partition_count_invariant(spark):
    """Round 9 (VERDICT Next #6): the fits' moment partials merge in
    the shuffle tree, so the driver-facing result is identical (to
    float tolerance) across wildly different partition counts, and the
    reduce plan carries a partial aggregate (map-side combine) rather
    than a raw collect of per-partition rows."""
    from graph_db_clustering_spark.operators.stats import (
        logreg_fit,
        ols_fit,
        pca_fit,
    )

    emb = load_table(spark, SF, "embeddings").select("embedding").limit(400)
    m1 = pca_fit(emb.repartition(2), "embedding", 3)
    m2 = pca_fit(emb.repartition(97), "embedding", 3)
    assert np.allclose(m1.mean, m2.mean, atol=1e-9)
    assert np.allclose(m1.components, m2.components, atol=1e-7)

    li = load_table(spark, SF, "lineitem").select(
        "l_quantity", "l_discount", "l_extendedprice", "l_returnflag"
    )
    f1 = ols_fit(li.repartition(3), ["l_quantity"], "l_extendedprice")
    f2 = ols_fit(li.repartition(64), ["l_quantity"], "l_extendedprice")
    assert np.allclose(f1["coef"], f2["coef"], rtol=1e-9)
    assert abs(f1["r2"] - f2["r2"]) < 1e-9

    lab = li.withColumn("y", (F.col("l_returnflag") == "R").cast("int"))
    g1 = logreg_fit(lab.repartition(3), ["l_quantity"], "y", max_iter=4)
    g2 = logreg_fit(lab.repartition(64), ["l_quantity"], "y", max_iter=4)
    assert np.allclose(g1["coef"], g2["coef"], rtol=1e-7)

    # the reduce path is an aggregation (partial_sum visible), not a
    # driver-side merge of per-partition rows
    from graph_db_clustering_spark.operators.stats import _reduce_moments
    import pandas as _pd

    def one(batches):
        for pdf in batches:
            if len(pdf):
                yield _pd.DataFrame({"m": [[float(len(pdf)), 1.0]]})

    probe = (
        emb.repartition(8)
        .mapInPandas(one, "m array<double>")
        .select(F.posexplode("m").alias("pos", "val"))
        .groupBy("pos")
        .agg(F.sum("val").alias("s"))
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in plan
