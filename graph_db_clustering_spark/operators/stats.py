"""Distributed statistics over vector columns: PCA (moment aggregation),
correlation, and the two-sample Kolmogorov-Smirnov statistic.

PCA follows the classic tall-skinny design (the same shape MLlib's
RowMatrix.computePrincipalComponents uses): the executors reduce the data
to d-dimensional first and second moments — one pass, one d*d partial per
Arrow batch — and only the d x d Gram matrix ever reaches the driver,
where the eigendecomposition is O(d^3) on 64-ish dims. Nothing row-sized
is ever collected: at 100 TB the reduce tree moves a few KB per task.

Reference scope: the reference engine (brianreicher/graph-db-clustering)
stops at k-means over raw image vectors; PCA is the standard companion
(decorrelate/compress before clustering) and an explicit north-star
"embedding analytics" op.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class PcaModel:
    """Fitted PCA: mean (d,), components (d, k) column-orthonormal,
    explained_var (k,) descending sample variances along components."""

    def __init__(self, mean: np.ndarray, components: np.ndarray, explained_var: np.ndarray):
        self.mean = mean
        self.components = components
        self.explained_var = explained_var


def _reduce_moments(df: DataFrame, partials, length: int) -> np.ndarray | None:
    """Sum per-batch moment partials JVM-side before the driver sees
    them. The mapInPandas stage emits ONE flat array<double> per Arrow
    batch; posexplode -> groupBy(pos) partial-aggregates map-side, so
    the driver receives exactly `length` rows REGARDLESS of partition
    count (round-9 fix: the fits used to collect one (d+1)^2 partial
    per partition — O(partitions * d^2) driver traffic at cluster
    scale; now the shuffle tree does the merge and driver traffic is
    O(d^2) flat). Returns the summed vector, or None on empty input."""
    rows = (
        df.mapInPandas(partials, "m array<double>")
        .select(F.posexplode("m").alias("pos", "val"))
        .groupBy("pos")
        .agg(F.sum("val").alias("s"))
        .collect()
    )
    if not rows:
        return None
    out = np.zeros(length)
    for r in rows:
        out[r["pos"]] = r["s"]
    return out


def pca_fit(df: DataFrame, vec_col: str, k: int) -> PcaModel:
    """One distributed pass for (n, sum, X^T X), driver-side eigh.

    The mapInPandas stage emits ONE row per Arrow batch: (count, sum,
    flattened d*d cross-product). Spark's reduce is then a trivial
    aggregation over #batches rows — the only driver-side numerics is
    the d x d symmetric eigendecomposition. Deterministic across
    partitionings: float summation is reassociated, but the test pins
    tolerance against exact numpy, not bitwise equality; the SIGN of
    each component is canonicalized (largest-|loading| entry positive),
    so downstream projections are partitioning-stable."""
    first = df.select(F.size(vec_col).alias("d")).first()
    if first is None:
        raise ValueError("pca_fit: empty input")
    d = first["d"]

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            x = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            if len(x) == 0:
                continue
            flat = np.concatenate(
                [[float(len(x))], x.sum(axis=0), (x.T @ x).ravel()]
            )
            yield pd.DataFrame({"m": [flat.tolist()]})

    vec = _reduce_moments(
        df.select(F.col(vec_col).alias("v")), partials, 1 + d + d * d
    )
    n = 0 if vec is None else int(round(vec[0]))
    if n < 2:
        raise ValueError("pca_fit: need at least 2 rows")
    s = vec[1 : 1 + d]
    ss = vec[1 + d :].reshape(d, d)
    mean = s / n
    cov = (ss - np.outer(s, mean)) / (n - 1)  # sample covariance, ddof=1
    cov = (cov + cov.T) / 2.0
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order]
    # canonical sign: the largest-|loading| coordinate of each component
    # is positive (ties to the lowest index via argmax)
    flips = np.sign(comps[np.abs(comps).argmax(axis=0), np.arange(comps.shape[1])])
    flips[flips == 0] = 1.0
    comps = comps * flips
    return PcaModel(mean, comps, np.maximum(w[order], 0.0))


def pca_transform(df: DataFrame, vec_col: str, model: PcaModel, out_col: str = "pc") -> DataFrame:
    """Project each vector onto the fitted components: out = (x - mean) @ W.
    The (d x k) matrix rides a closure broadcast into an Arrow-batched
    pandas iterator — executor-side matmul per batch, never per row."""
    mean = model.mean.copy()
    comps = model.components.copy()
    passthrough = [c for c in df.columns if c != vec_col]
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name != vec_col
    )
    schema = (schema + ", " if schema else "") + f"{out_col} array<double>"

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            x = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["__v"]])
            out = pdf[passthrough].copy()
            if len(x):
                out[out_col] = list((x - mean) @ comps)
            else:
                out[out_col] = []
            yield out

    return df.withColumnRenamed(vec_col, "__v").mapInPandas(project, schema)


def ks_statistic(
    df: DataFrame, value_col: str, group_col: str
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov D = sup_x |F0(x) - F1(x)| between
    the rows where group_col = 0 and = 1. Returns one row
    (n0 long, n1 long, ks_d double).

    Plan: reduce to per-DISTINCT-value counts first (the heavy
    aggregation, fully parallel), then one ordered prefix-sum window
    over the distinct values. The window is a single-partition pass by
    construction — over the distinct-value frame, NOT the raw data; for
    a measurement column that's bounded by the value resolution. At
    100 TB with near-continuous doubles, use ks_statistic_scale below —
    the range-partitioned prefix-sum form of the same counts frame
    (identical result, equality test-pinned)."""
    from pyspark.sql import Window

    counts = (
        df.select(F.col(value_col).alias("v"), F.col(group_col).alias("g"))
        .groupBy("v")
        .agg(
            F.sum(F.when(F.col("g") == 0, 1).otherwise(0)).alias("c0"),
            F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).alias("c1"),
        )
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    tot = counts.agg(
        F.sum("c0").alias("n0"), F.sum("c1").alias("n1")
    )
    cum = counts.select(
        F.sum("c0").over(w).alias("a0"), F.sum("c1").over(w).alias("a1")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "n0",
            "n1",
            F.abs(
                F.col("a0") / F.col("n0") - F.col("a1") / F.col("n1")
            ).alias("diff"),
        )
        .groupBy("n0", "n1")
        .agg(F.max("diff").alias("ks_d"))
    )


def contingency_stats(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Independence statistics for two categorical columns in one
    aggregation tree: chi-squared, degrees of freedom, Cramer's V, and
    mutual information (nats). Returns one row
    (n long, chi2 double, dof long, cramers_v double, mi double).

    Plan: ONE groupBy(a, b) over the data (the only data-sized
    aggregate — map-side combined, shuffle keyed by the pair); the
    contingency table is then cells-sized (|A|*|B| rows), and the
    marginals/statistics are aggregates over cells. Nothing data-sized
    ever reaches the driver; at 100 TB the heavy stage is exactly one
    partial-aggregated shuffle."""
    joint = (
        df.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("o"))
    )
    wa = Window.partitionBy("a")
    wb = Window.partitionBy("b")
    wall = Window.partitionBy()
    cells = joint.select(
        "o",
        F.sum("o").over(wa).alias("ra"),
        F.sum("o").over(wb).alias("cb"),
        F.sum("o").over(wall).alias("n"),
    )
    e = F.col("ra").cast("double") * F.col("cb") / F.col("n")
    p = F.col("o") / F.col("n")
    stats = cells.agg(
        F.first("n").alias("n"),
        F.sum((F.col("o") - e) ** 2 / e).alias("chi2"),
        F.sum(p * F.log(F.col("o").cast("double") * F.col("n") / (F.col("ra") * F.col("cb")))).alias("mi"),
    )
    dims = joint.agg(
        F.countDistinct("a").alias("ka"), F.countDistinct("b").alias("kb")
    )
    return stats.crossJoin(F.broadcast(dims)).select(
        F.col("n").cast("long").alias("n"),
        "chi2",
        ((F.col("ka") - 1) * (F.col("kb") - 1)).cast("long").alias("dof"),
        F.sqrt(
            F.col("chi2")
            / (F.col("n") * F.least(F.col("ka") - 1, F.col("kb") - 1))
        ).alias("cramers_v"),
        "mi",
    )


def simplified_silhouette(
    df: DataFrame, id_col: str, vec_col: str, label_col: str
) -> DataFrame:
    """Simplified silhouette (centroid-based, the O(N*k) form MLlib's
    ClusteringEvaluator also uses instead of the O(N^2) classic): per
    row, a = euclidean distance to the OWN cluster centroid, b = min
    distance to any other centroid, s = (b - a) / max(a, b). Returns
    (id_col, label_col, a double, b double, silhouette double).

    Plan: centroids are one k*d-key partial aggregate collected to the
    driver (tiny), then inlined as array literals — the per-row
    distance block is pure whole-stage codegen over higher-order
    functions, no join against the centroid frame and no Python. At
    100 TB the data-sized work is exactly two scans: the centroid
    aggregate and the scoring pass."""
    cent_rows = (
        df.select(F.col(label_col).alias("l"), F.posexplode(vec_col).alias("pos", "x"))
        .groupBy("l", "pos")
        .agg(F.avg("x").alias("m"))
        .collect()
    )
    cents: dict = {}
    for r in cent_rows:
        cents.setdefault(r["l"], {})[r["pos"]] = r["m"]
    if len(cents) < 2:
        raise ValueError("simplified_silhouette: need at least 2 clusters")
    labels = sorted(cents)
    dist_structs = []
    for lbl in labels:
        vec = cents[lbl]
        arr = F.array(*[F.lit(float(vec[p])) for p in range(len(vec))])
        d2 = F.aggregate(
            F.zip_with(F.col(vec_col), arr, lambda x, m: (x - m) * (x - m)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        dist_structs.append(
            F.struct(F.lit(lbl).alias("lbl"), F.sqrt(d2).alias("dist"))
        )
    ds = F.array(*dist_structs)
    own = F.element_at(
        F.filter(ds, lambda s: s["lbl"] == F.col(label_col)), 1
    )["dist"]
    other = F.array_min(
        F.transform(
            F.filter(ds, lambda s: s["lbl"] != F.col(label_col)),
            lambda s: s["dist"],
        )
    )
    return df.select(
        id_col,
        label_col,
        own.alias("a"),
        other.alias("b"),
        ((other - own) / F.greatest(own, other)).alias("silhouette"),
    )


def ks_statistic_scale(
    df: DataFrame, value_col: str, group_col: str, partitions: int = 32
) -> DataFrame:
    """Exact two-sample KS without any single-partition pass — the
    100 TB form of ks_statistic (identical result; equality is
    test-pinned).

    The distinct-value counts frame is range-partitioned on the value,
    so each partition owns a contiguous value interval. Global prefix
    sums then decompose into (sum of whole partitions before mine) +
    (my within-partition prefix): the per-partition totals are a
    PARTITIONS-row aggregate whose cumulative offsets broadcast-join
    back, and the within-partition prefix is a window PARTITIONED BY
    the range bucket — parallel across buckets, never a global sort.
    Ties are safe: equal values land in one range bucket, and the
    counts frame is per-distinct-value to begin with."""
    counts = (
        df.select(F.col(value_col).alias("v"), F.col(group_col).alias("g"))
        .groupBy("v")
        .agg(
            F.sum(F.when(F.col("g") == 0, 1).otherwise(0)).alias("c0"),
            F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).alias("c1"),
        )
        .repartitionByRange(partitions, "v")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint()  # pin the bucket assignment across the two reads
    )
    per_part = (
        counts.groupBy("pid")
        .agg(F.sum("c0").alias("t0"), F.sum("c1").alias("t1"))
    )
    wo = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_part.select(
        "pid",
        F.coalesce(F.sum("t0").over(wo), F.lit(0)).alias("o0"),
        F.coalesce(F.sum("t1").over(wo), F.lit(0)).alias("o1"),
    )
    tot = counts.agg(F.sum("c0").alias("n0"), F.sum("c1").alias("n1"))
    wl = Window.partitionBy("pid").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = (
        counts.join(F.broadcast(offsets), "pid")
        .select(
            (F.col("o0") + F.sum("c0").over(wl)).alias("a0"),
            (F.col("o1") + F.sum("c1").over(wl)).alias("a1"),
        )
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "n0",
            "n1",
            F.abs(
                F.col("a0") / F.col("n0") - F.col("a1") / F.col("n1")
            ).alias("diff"),
        )
        .groupBy("n0", "n1")
        .agg(F.max("diff").alias("ks_d"))
    )


def cluster_medoids(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    sample_per_cluster: int | None = None,
) -> DataFrame:
    """Medoid per cluster: the member minimizing the SUM of euclidean
    distances to its cluster's other members — k-medoids' (PAM) update
    step, the robust-to-outliers alternative to the centroid. Returns
    (label_col, medoid_id, avg_dist) with ties on the smallest id.

    Plan: the pair join is keyed by the cluster label, so per-key work
    is quadratic in CLUSTER size, never corpus size — exactly PAM's
    stated cost. The distance is a zip_with/aggregate codegen
    expression; per-member sums partial-aggregate map-side and the
    final argmin is one min_by struct per cluster.

    ``sample_per_cluster``: the CLARA bound (Kaufman & Rousseeuw 1990)
    made real — each cluster is first cut to its m members with the
    smallest Knuth-hash key (deterministic, partitioning-invariant,
    the repo's k-sample idiom), and the medoid is chosen among and
    against the sample, capping pair work at k*m^2 regardless of
    cluster size. Exact (None) and any m >= cluster size coincide —
    test-pinned."""
    base = df
    if sample_per_cluster is not None:
        from graph_db_clustering_spark.operators.kmeans import KNUTH, MOD

        wsamp = Window.partitionBy(label_col).orderBy(
            (F.col(id_col) * F.lit(KNUTH)) % F.lit(MOD), F.col(id_col)
        )
        base = (
            df.withColumn("__rk", F.row_number().over(wsamp))
            .filter(F.col("__rk") <= sample_per_cluster)
            .drop("__rk")
        )
    a = base.select(
        F.col(label_col).alias("l"),
        F.col(id_col).alias("id1"),
        F.col(vec_col).alias("v1"),
    )
    b = base.select(
        F.col(label_col).alias("l"),
        F.col(id_col).alias("id2"),
        F.col(vec_col).alias("v2"),
    )
    d2 = F.aggregate(
        F.zip_with(F.col("v1"), F.col("v2"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sums = (
        a.join(b, "l")
        .filter(F.col("id1") != F.col("id2"))
        .select("l", "id1", F.sqrt(d2).alias("d"))
        .groupBy("l", "id1")
        .agg(F.sum("d").alias("total"), F.count("*").alias("m"))
    )
    return (
        sums.groupBy("l")
        .agg(
            F.min_by(
                F.struct(
                    F.col("id1").alias("medoid_id"),
                    (F.col("total") / F.col("m")).alias("avg_dist"),
                ),
                F.struct(F.col("total"), F.col("id1")),
            ).alias("best")
        )
        .select(
            F.col("l").alias(label_col),
            F.col("best.medoid_id").alias("medoid_id"),
            F.col("best.avg_dist").alias("avg_dist"),
        )
    )


def ols_fit(
    df: DataFrame, feature_cols: list, target_col: str, l2: float = 0.0
) -> dict:
    """Ordinary least squares by the normal equations, distributed the
    same way as pca_fit: one mapInPandas pass reduces the data to the
    (p+1)x(p+1) Gram matrix of the intercept-augmented design and the
    (p+1) moment vector X'y (a few hundred bytes per Arrow batch);
    the driver solves the tiny symmetric system. Returns
    {"coef": np.ndarray(p), "intercept": float, "r2": float, "n": int}.

    Exact (no iteration, no learning rate) and one data pass —
    the right tool for p in the hundreds; beyond that use iterative
    solvers. R^2 comes from the same pass's y-moments. ``l2`` adds
    ridge regularization (coefficients only, intercept unpenalized) —
    the same Gram matrix, one diagonal added."""
    p = len(feature_cols)

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = pdf[feature_cols].to_numpy(dtype=np.float64)
            y = pdf["__y"].to_numpy(dtype=np.float64)
            a = np.hstack([x, np.ones((len(x), 1))])
            flat = np.concatenate(
                [
                    [float(len(x)), float(y @ y), float(y.sum())],
                    (a.T @ a).ravel(),
                    a.T @ y,
                ]
            )
            yield pd.DataFrame({"m": [flat.tolist()]})

    q = p + 1
    vec = _reduce_moments(
        df.select(*feature_cols, F.col(target_col).cast("double").alias("__y")),
        partials,
        3 + q * q + q,
    )
    n = 0 if vec is None else int(round(vec[0]))
    if n <= p:
        raise ValueError(f"ols_fit: need more than {p} rows")
    yy = vec[1]
    ys = vec[2]
    g0 = vec[3 : 3 + q * q].reshape(q, q)
    xy = vec[3 + q * q :]
    g = g0
    if l2:
        # ridge: penalize coefficients, never the intercept (standard)
        g = g0 + l2 * np.diag([1.0] * p + [0.0])
    beta = np.linalg.solve(g, xy)
    # SSE = y'y - 2 b'X'y + b'G0 b ; SST = y'y - n*mean^2. The SSE uses
    # the UNPENALIZED Gram g0 — evaluating it with the ridge-penalized
    # matrix inflates SSE by l2*||coef||^2 and deflates r2 (ADVICE r8).
    sse = yy - 2.0 * beta @ xy + beta @ g0 @ beta
    sst = yy - ys * ys / n
    r2 = 1.0 - sse / sst if sst > 0 else float("nan")
    return {
        "coef": beta[:p],
        "intercept": float(beta[p]),
        "r2": float(r2),
        "n": int(n),
    }


def auc_score(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """ROC AUC via the Mann-Whitney U statistic with exact tie
    handling: AUC = [sum over distinct scores of pos_at * (negs_below
    + negs_at / 2)] / (P * N). Returns one row
    (n_pos long, n_neg long, auc double).

    Plan: the data-sized work is ONE groupBy(score) counting positives
    and negatives per distinct score; the cumulative pass runs over
    the distinct-score frame (value-resolution bounded, same posture
    as ks_statistic — swap in the range-partitioned prefix sum at
    100 TB). No per-pair work: the U statistic makes the O(P*N)
    pairwise definition a linear scan."""
    counts = (
        df.select(
            F.col(score_col).alias("s"),
            F.col(label_col).cast("int").alias("y"),
        )
        .groupBy("s")
        .agg(
            F.sum("y").alias("p"),
            F.sum(F.lit(1) - F.col("y")).alias("n"),
        )
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select(
        "p",
        "n",
        (F.sum("n").over(w) - F.col("n")).alias("n_below"),
    )
    return (
        cum.agg(
            F.sum("p").alias("n_pos"),
            F.sum("n").alias("n_neg"),
            F.sum(F.col("p") * (F.col("n_below") + F.col("n") / 2.0)).alias("u"),
        )
        .select(
            F.col("n_pos").cast("long").alias("n_pos"),
            F.col("n_neg").cast("long").alias("n_neg"),
            F.try_divide(F.col("u"), F.col("n_pos") * F.col("n_neg")).alias("auc"),
        )
    )


def psi_drift(
    df: DataFrame,
    value_col: str,
    split_predicate,
    n_bins: int = 10,
    smoothing: float = 0.5,
) -> DataFrame:
    """Population Stability Index between the reference population
    (rows where split_predicate is true) and the current one:
    PSI = sum over bins of (p_cur - p_ref) * ln(p_cur / p_ref), with
    bin edges the reference's exact quantiles and add-smoothing on the
    counts so empty bins stay finite. The standard drift gate
    (folklore thresholds: < 0.1 stable, > 0.25 drifted). Returns one
    row (n_ref long, n_cur long, psi double).

    Plan: one exact-percentile aggregate over the reference for the
    n_bins-1 edges (collected — it's an O(bins) scalar list), then one
    pass bucketing every row via a codegen CASE chain and one
    bins-sized aggregate."""
    tagged = df.select(
        F.col(value_col).alias("v"), split_predicate.alias("is_ref")
    )
    ref = tagged.filter("is_ref")
    qs = [i / n_bins for i in range(1, n_bins)]
    edges = ref.agg(
        F.percentile("v", F.array(*[F.lit(q) for q in qs])).alias("e")
    ).first()["e"]
    if edges is None:
        raise ValueError("psi_drift: reference population is empty")
    bin_expr = F.lit(0)
    for e in edges:
        bin_expr = bin_expr + F.when(F.col("v") > float(e), 1).otherwise(0)
    binned = tagged.select("is_ref", bin_expr.alias("b"))
    cells = binned.groupBy("b").agg(
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("r"),
        F.sum(F.when(~F.col("is_ref"), 1).otherwise(0)).alias("c"),
    )
    tot = cells.agg(F.sum("r").alias("nr"), F.sum("c").alias("nc")).first()
    nr, nc = tot["nr"], tot["nc"]
    k = float(smoothing)
    pr = (F.col("r") + k) / F.lit(nr + k * n_bins)
    pc = (F.col("c") + k) / F.lit(nc + k * n_bins)
    return cells.agg(
        F.lit(nr).cast("long").alias("n_ref"),
        F.lit(nc).cast("long").alias("n_cur"),
        F.sum((pc - pr) * F.log(pc / pr)).alias("psi"),
    )


def dbscan_2d(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    eps: float,
    min_pts: int,
) -> DataFrame:
    """Distributed DBSCAN over 2-D points (Ester et al. 1996), the
    deterministic DBSCAN* border variant: core points have >= min_pts
    neighbors within eps (the point itself counts); clusters are the
    connected components of the core-core eps-graph, labeled by their
    minimum core id; a border (non-core) point joins the MINIMUM-label
    cluster among its core neighbors (classic DBSCAN leaves border
    assignment scan-order-dependent — the min rule makes it a pure
    function of the data); everything else is noise (label -1).
    Returns (id_col, label long, is_core boolean).

    Composition of two scale-shaped primitives: the eps-neighbor pairs
    come from joins.grid_radius_join (cell-keyed equi-join, occupancy-
    bounded) and the clustering from graph_algos.connected_components
    (min-label propagation, O(cluster diameter) rounds). No new
    shuffle shapes — that's the point: DBSCAN at 100 TB is exactly a
    spatial join plus a components pass."""
    from graph_db_clustering_spark.operators.graph import Graph
    from graph_db_clustering_spark.operators.graph_algos import (
        connected_components,
    )
    from graph_db_clustering_spark.operators.joins import grid_radius_join

    pts = points.select(F.col(id_col).alias("id"), x_col, y_col)
    pairs = grid_radius_join(pts, "id", x_col, y_col, eps).select("id1", "id2")
    und = pairs.unionAll(
        pairs.select(F.col("id2").alias("id1"), F.col("id1").alias("id2"))
    )
    ncount = und.groupBy(F.col("id1").alias("id")).agg(
        (F.count("*") + 1).alias("n")
    )
    flagged = pts.select("id").join(ncount, "id", "left").select(
        "id", (F.coalesce("n", F.lit(1)) >= min_pts).alias("is_core")
    )
    cores = flagged.filter("is_core").select("id")
    core_edges = (
        und.join(cores.withColumnRenamed("id", "id1"), "id1", "left_semi")
        .join(cores.withColumnRenamed("id", "id2"), "id2", "left_semi")
        .select(F.col("id1").alias("src"), F.col("id2").alias("dst"))
        .withColumn("relationship", F.lit("eps"))
    )
    comp = connected_components(Graph(cores.select(F.col("id")), core_edges))
    border = (
        und.join(flagged.filter(~F.col("is_core")).select("id").withColumnRenamed("id", "id1"), "id1", "left_semi")
        .join(
            comp.select(F.col("id").alias("id2"), F.col("component")),
            "id2",
        )
        .groupBy(F.col("id1").alias("id"))
        .agg(F.min("component").alias("blabel"))
    )
    return (
        flagged.join(comp.select("id", "component"), "id", "left")
        .join(border, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("component", "blabel", F.lit(-1)).cast("long").alias("label"),
            "is_core",
        )
    )


def logreg_fit(
    df: DataFrame,
    feature_cols: list,
    label_col: str,
    max_iter: int = 25,
    tol: float = 1e-8,
    l2: float = 0.0,
) -> dict:
    """Binary logistic regression by distributed Newton / IRLS: each
    iteration is ONE mapInPandas pass reducing the data to the
    weighted Gram matrix X'WX and gradient X'(y - p) (a (p+1)^2 block
    per Arrow batch, exactly ols_fit's shape with per-row weights),
    and the driver solves the tiny system. Converges quadratically —
    a handful of passes where SGD takes epochs. Returns
    {"coef", "intercept", "n", "iterations", "converged",
    "log_likelihood"}.

    ``l2`` regularizes coefficients (not the intercept); besides the
    statistical role it guarantees a solvable system under perfect
    separation (where unpenalized ML diverges)."""
    p = len(feature_cols)
    beta = np.zeros(p + 1)

    def make_pass(b):
        bb = b.copy()

        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                x = pdf[feature_cols].to_numpy(dtype=np.float64)
                y = pdf["__y"].to_numpy(dtype=np.float64)
                a = np.hstack([x, np.ones((len(x), 1))])
                z = np.clip(a @ bb, -35, 35)
                mu = 1.0 / (1.0 + np.exp(-z))
                w = mu * (1.0 - mu)
                flat = np.concatenate(
                    [
                        [
                            float(len(x)),
                            float(np.sum(y * z - np.log1p(np.exp(z)))),
                        ],
                        ((a * w[:, None]).T @ a).ravel(),
                        a.T @ (y - mu),
                    ]
                )
                yield pd.DataFrame({"m": [flat.tolist()]})

        return partials

    # pin the narrow (features, y) projection for the whole fit (r14,
    # the gmm_fit shape): every Newton pass re-reads it with a new beta,
    # and without the pin each pass re-evaluates the caller's upstream
    # lineage. Spillable, released before returning so bench reruns
    # still compute from source.
    base = df.select(
        *feature_cols, F.col(label_col).cast("double").alias("__y")
    ).persist()
    try:
        return _logreg_fit_pinned(base, max_iter, tol, l2, p, beta, make_pass)
    finally:
        base.unpersist()


def _logreg_fit_pinned(base, max_iter, tol, l2, p, beta, make_pass):
    n = 0
    ll = -np.inf
    converged = False
    it = 0
    q = p + 1
    for it in range(1, max_iter + 1):
        vec = _reduce_moments(base, make_pass(beta), 2 + q * q + q)
        n = 0 if vec is None else int(round(vec[0]))
        if n == 0:
            raise ValueError("logreg_fit: empty input")
        new_ll = vec[1]
        g = vec[2 : 2 + q * q].reshape(q, q)
        grad = vec[2 + q * q :]
        if l2:
            pen = np.diag([l2] * p + [0.0])
            g = g + pen
            grad = grad - pen @ beta
            new_ll -= 0.5 * l2 * float(beta[:p] @ beta[:p])
        step = np.linalg.solve(g, grad)
        beta = beta + step
        if abs(new_ll - ll) < tol * max(1.0, abs(new_ll)):
            converged = True
            ll = new_ll
            break
        ll = new_ll
    return {
        "coef": beta[:p],
        "intercept": float(beta[p]),
        "n": int(n),
        "iterations": it,
        "converged": converged,
        "log_likelihood": float(ll),
    }


def logreg_predict(
    df: DataFrame, feature_cols: list, model: dict, out_col: str = "prob"
) -> DataFrame:
    """Score rows with a fitted model as a pure codegen expression:
    sigmoid(x . coef + intercept) — no Python on the scoring path."""
    z = F.lit(float(model["intercept"]))
    for c, b in zip(feature_cols, model["coef"]):
        z = z + F.col(c) * float(b)
    return df.withColumn(out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))


def pic_cluster(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    eps: float,
    k: int = 2,
    iters: int = 15,
) -> DataFrame:
    """Power Iteration Clustering (Lin & Cohen 2010) over the sparse
    eps-neighborhood affinity graph: iterate v <- W v on the
    row-normalized affinities (Gaussian weights exp(-d^2 / eps^2)),
    whose mixing dynamics collapse each well-separated cluster onto
    its own value of the pseudo-eigenvector, then 1-D k-means the
    final v. The spectral-clustering result without an
    eigendecomposition — every iteration is one edge-keyed join + one
    vertex aggregate (the pagerank shape), and the affinity graph
    comes from joins.grid_radius_join, so nothing is ever N^2.
    Returns (id_col, cid)."""
    from graph_db_clustering_spark.operators.joins import grid_radius_join

    pts = points.select(F.col(id_col).alias("id"), x_col, y_col)
    pairs = grid_radius_join(pts, "id", x_col, y_col, eps)
    w = pairs.select(
        "id1", "id2", F.exp(-(F.col("dist") ** 2) / (eps * eps)).alias("w")
    )
    # lazy (r14): the volume aggregate right below is the first action
    # and materializes the checkpoint — no separate eager-checkpoint job
    und = w.unionAll(
        w.select(F.col("id2").alias("id1"), F.col("id1").alias("id2"), "w")
    ).localCheckpoint(eager=False)
    # deg is read every power iteration (row-normalization) — checkpoint
    # it once, materialized by the volume probe (the louvain deg shape)
    deg = und.groupBy("id1").agg(F.sum("w").alias("d")).localCheckpoint(eager=False)
    total = deg.agg(F.sum("d")).first()[0] or 1.0
    # v0 = degree / volume (the paper's init), isolated points get 0
    v = (
        pts.select("id")
        .join(deg.withColumnRenamed("id1", "id"), "id", "left")
        .select("id", (F.coalesce("d", F.lit(0.0)) / total).alias("v"))
        .localCheckpoint(eager=False)
    )
    for _ in range(iters):
        msg = (
            und.join(v.withColumnRenamed("id", "id2"), "id2")
            .groupBy(F.col("id1").alias("id"))
            .agg(F.sum(F.col("w") * F.col("v")).alias("num"))
        )
        # checkpoint BEFORE the norm aggregate (r14): the old shape
        # evaluated the iteration's joins twice — once for the norm, once
        # for the eager checkpoint. Now the norm job materializes the
        # lazy checkpoint and the normalized v is a plain projection
        # over it: one job and one evaluation per power iteration.
        nxt = (
            v.select("id")
            .join(msg, "id", "left")
            .join(deg.withColumnRenamed("id1", "id"), "id", "left")
            .select(
                "id",
                F.coalesce(F.col("num") / F.col("d"), F.lit(0.0)).alias("v"),
            )
            .localCheckpoint(eager=False)
        )
        norm = nxt.agg(F.sum(F.abs("v"))).first()[0] or 1.0
        v = nxt.select("id", (F.col("v") / norm).alias("v"))
    # 1-D Lloyd with QUANTILE init (cosine is degenerate in 1-D and a
    # hash-sample init can draw two near-identical consensus values);
    # k scalars per iteration on the driver, assignment is codegen
    cents = [
        float(c)
        for c in v.agg(
            F.percentile(
                "v", F.array(*[F.lit((i + 0.5) / k) for i in range(k)])
            )
        ).first()[0]
    ]
    for _ in range(25):
        dists = [(F.col("v") - c) * (F.col("v") - c) for c in cents]
        best = F.least(*dists) if k > 1 else dists[0]
        cid = F.lit(k - 1)
        for j in range(k - 2, -1, -1):
            cid = F.when(dists[j] == best, j).otherwise(cid)
        stats_rows = (
            v.select(cid.alias("cid"), "v")
            .groupBy("cid")
            .agg(F.avg("v").alias("m"))
            .collect()
        )
        new = dict((r["cid"], r["m"]) for r in stats_rows)
        nxt = [new.get(j, cents[j]) for j in range(k)]
        if all(abs(a - b) < 1e-15 for a, b in zip(nxt, cents)):
            cents = nxt
            break
        cents = nxt
    dists = [(F.col("v") - c) * (F.col("v") - c) for c in cents]
    best = F.least(*dists) if k > 1 else dists[0]
    cid = F.lit(k - 1)
    for j in range(k - 2, -1, -1):
        cid = F.when(dists[j] == best, j).otherwise(cid)
    return v.select(F.col("id").alias(id_col), cid.cast("int").alias("cid"))


def poisson_fit(
    df: DataFrame,
    feature_cols: list,
    target_col: str,
    max_iter: int = 25,
    tol: float = 1e-8,
) -> dict:
    """Poisson regression (log link) by the same distributed Newton
    shape as logreg_fit: mu = exp(x.b), weights W = mu, gradient
    X'(y - mu) — counts regressed on covariates, the third member of
    the GLM triple (gaussian=ols_fit, binomial=logreg_fit). One
    weighted-moments mapInPandas pass per iteration."""
    p = len(feature_cols)
    beta = np.zeros(p + 1)

    def make_pass(b):
        bb = b.copy()

        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                x = pdf[feature_cols].to_numpy(dtype=np.float64)
                y = pdf["__y"].to_numpy(dtype=np.float64)
                a = np.hstack([x, np.ones((len(x), 1))])
                z = np.clip(a @ bb, -30, 30)
                mu = np.exp(z)
                flat = np.concatenate(
                    [
                        [float(len(x)), float(np.sum(y * z - mu))],
                        ((a * mu[:, None]).T @ a).ravel(),
                        a.T @ (y - mu),
                    ]
                )
                yield pd.DataFrame({"m": [flat.tolist()]})

        return partials

    # pinned across Newton passes like logreg_fit (r14)
    base = df.select(
        *feature_cols, F.col(target_col).cast("double").alias("__y")
    ).persist()
    try:
        return _poisson_fit_pinned(base, max_iter, tol, p, beta, make_pass)
    finally:
        base.unpersist()


def _poisson_fit_pinned(base, max_iter, tol, p, beta, make_pass):
    ll = -np.inf
    converged = False
    n = 0
    it = 0
    q = p + 1
    for it in range(1, max_iter + 1):
        vec = _reduce_moments(base, make_pass(beta), 2 + q * q + q)
        n = 0 if vec is None else int(round(vec[0]))
        if n == 0:
            raise ValueError("poisson_fit: empty input")
        new_ll = vec[1]
        g = vec[2 : 2 + q * q].reshape(q, q)
        grad = vec[2 + q * q :]
        beta = beta + np.linalg.solve(g, grad)
        if abs(new_ll - ll) < tol * max(1.0, abs(new_ll)):
            converged = True
            ll = new_ll
            break
        ll = new_ll
    return {
        "coef": beta[:p],
        "intercept": float(beta[p]),
        "n": int(n),
        "iterations": it,
        "converged": converged,
        "log_likelihood": float(ll),
    }
