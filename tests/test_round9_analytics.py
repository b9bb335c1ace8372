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


def test_jaro_winkler_matches_duckdb_builtin(spark):
    """Two independent implementations of the metric agree to the last
    double: ours (operators/text.jaro_winkler, from the public
    definition) vs DuckDB's jaro_winkler_similarity, over every part
    name pair in a brand block plus adversarial short strings."""
    import duckdb

    from graph_db_clustering_spark.operators.text import jaro_winkler

    con = duckdb.connect()
    cases = [
        ("martha", "marhta"), ("dixon", "dicksonx"), ("", ""), ("", "x"),
        ("a", "a"), ("ab", "ba"), ("aaaa", "aaa"), ("crate", "trace"),
        ("jellyfish", "smellyfish"), ("prefixmatch", "prefixmxtch"),
    ]
    p = load_table(spark, SF, "part").select("p_name").limit(40).collect()
    names = [r.p_name for r in p]
    cases += [(names[i], names[j]) for i in range(10) for j in range(10)]
    for a, b in cases:
        want = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert abs(jaro_winkler(a, b) - want) < 1e-12, (a, b)


def test_fuzzy_name_pairs_blocked_and_symmetric(spark):
    from graph_db_clustering_spark.operators.text import fuzzy_name_pairs

    p = load_table(spark, SF, "part").select("p_partkey", "p_name", "p_brand")
    pairs = fuzzy_name_pairs(p, "p_partkey", "p_name", ["p_brand"], 0.88)
    rows = pairs.collect()
    assert rows and all(r.key_1 < r.key_2 for r in rows)
    assert all(r.sim >= 0.88 for r in rows)
    # blocking respected: every pair shares a brand
    brands = {r.p_partkey: r.p_brand for r in p.collect()}
    assert all(brands[r.key_1] == brands[r.key_2] for r in rows)
    # partitioning invariance (deterministic scoring)
    again = fuzzy_name_pairs(
        p.repartition(13), "p_partkey", "p_name", ["p_brand"], 0.88
    )
    assert sorted((r.key_1, r.key_2, r.sim) for r in again.collect()) == \
        sorted((r.key_1, r.key_2, r.sim) for r in rows)


def test_parquet_footer_pruning(spark, tmp_path):
    """Range-clustered files prune by footer stats; a shuffled layout
    (overlapping ranges) keeps everything; content is never lost."""
    from graph_db_clustering_spark.sources.parquet_stats import (
        ParquetStatsError,
        parquet_file_stats,
        read_parquet_pruned,
    )
    import pytest as _pytest

    o = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    d1 = str(tmp_path / "clustered")
    o.repartitionByRange(6, "o_totalprice").write.parquet(d1)
    stats = parquet_file_stats(spark, d1, ["o_totalprice"])
    assert len(stats) == 6 and all(s["min_values"] for s in stats)
    lo, hi = 1000.0, 20000.0
    df, nread, nskip = read_parquet_pruned(spark, d1, "o_totalprice", lo, hi)
    assert nskip > 0 and nread + nskip == 6
    want = o.filter(F.col("o_totalprice").between(lo, hi))
    got = df.filter(F.col("o_totalprice").between(lo, hi))
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    # shuffled layout: ranges overlap everywhere -> nothing skippable
    d2 = str(tmp_path / "shuffled")
    o.repartition(6).write.parquet(d2)
    _, nread2, nskip2 = read_parquet_pruned(spark, d2, "o_totalprice", lo, hi)
    assert (nread2, nskip2) == (6, 0)
    # fully disjoint range: loud error, not a silent empty frame
    with _pytest.raises(ParquetStatsError, match="every file pruned"):
        read_parquet_pruned(spark, d1, "o_totalprice", -100.0, -50.0)


def test_hard_negatives_planted_geometry(spark):
    """A vector nearly identical to an anchor but carrying a different
    label MUST be that anchor's hard negative; a same-label twin must
    not be (label mismatch is part of the contract)."""
    from graph_db_clustering_spark.queries.corpus import QUERIES as LQ

    rng = np.random.default_rng(3)
    base = rng.normal(size=64)
    rows = []
    # anchor 0 (label 0); 1 = near-twin with label 1 (the hard negative);
    # 2 = exact-twin with label 0 (same label: must be ignored);
    # 3..20 = far random vectors with label 1
    rows.append((0, [float(x) for x in base], 0))
    rows.append((1, [float(x) for x in base + 0.01 * rng.normal(size=64)], 1))
    rows.append((2, [float(x) for x in base], 0))
    for i in range(3, 21):
        rows.append((i, [float(x) for x in rng.normal(size=64)], 1))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")

    import os
    import tempfile

    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))
    # reuse the declared entry against the synthetic dir (catalog reads
    # <dir>/embeddings.parquet)
    out = {r.qid: (r.hard_neg, r.sim) for r in LQ["hard_negatives"](spark, d).collect()}
    assert out[0][0] == 1 and out[0][1] > 0.99
    assert out[2][0] == 1  # the exact same-label twin is skipped


def test_jaro_winkler_property_parity_with_duckdb():
    """Property test: on RANDOM strings (including repeats, empties,
    and shared prefixes) our scorer and DuckDB's builtin agree to the
    last double — the strongest external check available for a metric
    with fiddly window/transposition rules."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from graph_db_clustering_spark.operators.text import jaro_winkler

    con = duckdb.connect()
    alphabet = st.sampled_from("abcxy z")

    @settings(max_examples=300, deadline=None)
    @given(
        st.text(alphabet=alphabet, max_size=12),
        st.text(alphabet=alphabet, max_size=12),
    )
    def check(a, b):
        want = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert abs(jaro_winkler(a, b) - want) < 1e-12, (a, b)

    check()
