"""Round-9 analytics additions: exponential smoothing, seasonal
decomposition, and the deterministic mergeable HLL sketch."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from graph_db_clustering_spark.catalog import load_table
from graph_db_clustering_spark.operators.sketches import hll_build, hll_estimate

SF = "/root/testdata/sf0.001"


def test_hll_registers_merge_by_cellwise_max(spark):
    """Sketch mergeability — the property approx_count_distinct hides:
    registers built on two disjoint halves, max-merged per cell, equal
    the registers built on the union."""
    e = load_table(spark, SF, "events").select("event_type", "user_id")
    lo = e.filter(F.col("event_id") % 2 == 0) if "event_id" in e.columns else None
    e = load_table(spark, SF, "events").select("event_id", "event_type", "user_id")
    lo = e.filter(F.col("event_id") % 2 == 0)
    hi = e.filter(F.col("event_id") % 2 == 1)
    whole = hll_build(e, "user_id", ["event_type"])
    merged = (
        hll_build(lo, "user_id", ["event_type"])
        .unionByName(hll_build(hi, "user_id", ["event_type"]))
        .groupBy("event_type", "b")
        .agg(F.max("rho").alias("rho"))
    )
    assert whole.exceptAll(merged).count() == 0
    assert merged.exceptAll(whole).count() == 0
    # and the merged estimate equals the whole-data estimate exactly
    a = {r.event_type: r.hll_est for r in hll_estimate(whole, ["event_type"]).collect()}
    b = {r.event_type: r.hll_est for r in hll_estimate(merged, ["event_type"]).collect()}
    assert a == b


def test_hll_estimate_tracks_exact_cardinality(spark):
    e = load_table(spark, SF, "events").select("event_type", "user_id")
    est = hll_estimate(hll_build(e, "user_id", ["event_type"]), ["event_type"])
    exact = e.groupBy("event_type").agg(F.countDistinct("user_id").alias("n"))
    joined = exact.join(est, "event_type").collect()
    assert joined
    for r in joined:
        rel = abs(r.hll_est - r.n) / max(r.n, 1)
        assert rel < 0.25, (r.event_type, r.n, r.hll_est)


def test_events_ets_matches_numpy_recurrence(spark):
    from graph_db_clustering_spark.queries.corpus import QUERIES

    got = {r.d: (r.n, r.smoothed) for r in QUERIES["events_ets"](spark, SF).collect()}
    days = sorted(got)
    ns = np.array([got[d][0] for d in days], dtype=float)
    s = ns[0]
    for i, d in enumerate(days):
        if i:
            s = 0.3 * ns[i] + 0.7 * s
        assert abs(got[d][1] - round(float(s), 6)) < 1e-9, d


def test_events_decompose_seasonal_centered(spark):
    from graph_db_clustering_spark.queries.corpus import QUERIES

    rows = QUERIES["events_decompose"](spark, SF).collect()
    assert {r.dow for r in rows} <= set(range(1, 8))
    assert abs(sum(r.seasonal for r in rows)) < 1e-4  # centered to ~0
    assert all(r.n_days >= 1 for r in rows)
