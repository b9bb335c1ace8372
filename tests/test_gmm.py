"""operators/gmm: distributed diagonal-GMM EM — numpy parity, monotone
log-likelihood, determinism, posterior sanity."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from graph_db_clustering_spark.catalog import load_table
from graph_db_clustering_spark.operators.gmm import gmm_fit, gmm_predict

SF = "/root/testdata/sf0.001"


def _np_em(x, means, variances, weights, iters):
    """Reference EM (dense numpy, same init, same var floor)."""
    n, d = x.shape
    k = len(weights)
    lls = []
    for _ in range(iters):
        lp = np.stack(
            [
                np.log(weights[j])
                - 0.5
                * (
                    ((x - means[j]) ** 2 / variances[j]).sum(axis=1)
                    + np.log(variances[j]).sum()
                    + d * math.log(2 * math.pi)
                )
                for j in range(k)
            ],
            axis=1,
        )
        m = lp.max(axis=1, keepdims=True)
        lse = m[:, 0] + np.log(np.exp(lp - m).sum(axis=1))
        lls.append(lse.sum())
        r = np.exp(lp - lse[:, None])
        nk = r.sum(axis=0)
        means = (r.T @ x) / nk[:, None]
        variances = np.maximum(
            (r.T @ (x * x)) / nk[:, None] - means**2, 1e-6
        )
        weights = nk / n
    return means, variances, weights, lls


@pytest.mark.slow  # >=15 s (r15 tiering)
def test_gmm_matches_numpy_em(spark):
    emb = load_table(spark, SF, "embeddings")
    x = np.asarray(
        [list(r.embedding) for r in emb.orderBy("vec_id").select("embedding").collect()],
        dtype=np.float64,
    )
    model = gmm_fit(emb, "embedding", k=3, max_iter=5, tol=0.0)
    # replicate the init exactly
    from graph_db_clustering_spark.operators.kmeans import deterministic_sample

    init = deterministic_sample(emb.select("vec_id", "embedding"), "vec_id", 3).collect()
    means0 = np.asarray([[float(v) for v in r.embedding] for r in init])
    var0 = np.tile(np.maximum(x.var(axis=0, ddof=1), 1e-6), (3, 1))
    w0 = np.full(3, 1 / 3)
    m, v, w, lls = _np_em(x, means0.copy(), var0.copy(), w0.copy(), 5)
    assert np.allclose(model.weights, w, rtol=1e-8)
    assert np.allclose(model.means, m, rtol=1e-6, atol=1e-9)
    assert np.allclose(model.variances, v, rtol=1e-6, atol=1e-9)
    # history carries the ll of the PRE-update params each iteration
    assert np.allclose([h["ll"] for h in model.history], lls, rtol=1e-9)


@pytest.mark.slow  # >=15 s (r15 tiering)
def test_gmm_loglik_monotone(spark):
    """EM's defining property: the log-likelihood never decreases
    (up to the var floor's clamping, which this data never hits)."""
    emb = load_table(spark, SF, "embeddings")
    model = gmm_fit(emb, "embedding", k=2, max_iter=15, tol=1e-7)
    lls = [h["ll"] for h in model.history]
    assert len(lls) == 15 and all(b >= a - 1e-6 for a, b in zip(lls, lls[1:]))


def test_gmm_predict_posteriors_and_separation(spark):
    """Two well-separated synthetic blobs: posteriors ~1, components
    recover the blob means, prediction is partitioning-invariant."""
    rng = np.random.default_rng(42)
    a = rng.normal(0.0, 0.1, size=(60, 4))
    b = rng.normal(5.0, 0.1, size=(60, 4))
    rows = [(i, v.tolist()) for i, v in enumerate(np.vstack([a, b]))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    model = gmm_fit(df, "embedding", k=2, max_iter=20)
    assert model.converged  # well-separated blobs converge in a few steps
    pred = gmm_predict(df, "embedding", model)
    got = {r.vec_id: (r.cid, r.prob) for r in pred.collect()}
    blob_a = {got[i][0] for i in range(60)}
    blob_b = {got[i][0] for i in range(60, 120)}
    assert len(blob_a) == 1 and len(blob_b) == 1 and blob_a != blob_b
    assert all(p > 0.999 for _, p in got.values())
    means_sorted = sorted(float(m.mean()) for m in model.means)
    assert abs(means_sorted[0] - 0.0) < 0.1 and abs(means_sorted[1] - 5.0) < 0.1
    pred2 = gmm_predict(df.repartition(13), "embedding", model)
    got2 = {r.vec_id: (r.cid, r.prob) for r in pred2.collect()}
    assert {k: c for k, (c, _) in got.items()} == {k: c for k, (c, _) in got2.items()}


def test_gmm_raises_on_too_few_rows(spark):
    emb = load_table(spark, SF, "embeddings")
    with pytest.raises(ValueError, match="at least"):
        gmm_fit(emb.limit(2), "embedding", k=3)
