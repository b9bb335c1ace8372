"""Tests for the as-of/range joins, CIFAR converter, UDTF chunker,
sentence splitter, and grouped-map normalization (SURVEY §2.1/§2.3/§2.11
inventory lines)."""

from __future__ import annotations

import datetime
import pickle
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from graph_db_clustering_spark.catalog import load_table
from graph_db_clustering_spark.operators import joins, kmeans
from graph_db_clustering_spark.operators import text as text_ops
from graph_db_clustering_spark.sources.cifar import read_cifar_batches

SF = "/root/testdata/sf0.001"
T0 = datetime.datetime(2024, 5, 1, 12, 0, 0)


def _ts(minutes):
    return T0 + datetime.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def quotes(spark):
    rows = [(1, _ts(0), 10.0), (1, _ts(10), 11.0), (1, _ts(30), 12.0), (2, _ts(5), 99.0)]
    return spark.createDataFrame(rows, "sym int, qts timestamp, px double")


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        (1, _ts(-5), 100),  # before any quote -> NULL
        (1, _ts(10), 200),  # exactly simultaneous -> 11.0 (<= semantics)
        (1, _ts(29), 300),  # latest prior -> 11.0
        (1, _ts(60), 400),  # -> 12.0
        (2, _ts(6), 500),  # other key -> 99.0
        (3, _ts(6), 600),  # key with no quotes -> NULL
    ]
    return spark.createDataFrame(rows, "sym int, tts timestamp, qty int")


def test_asof_join_backward_semantics(quotes, trades):
    out = joins.asof_join(trades, quotes, "tts", "qts", by=["sym"], value_cols=["px"])
    got = {(r.sym, r.qty): r.px for r in out.collect()}
    assert got == {
        (1, 100): None,
        (1, 200): 11.0,
        (1, 300): 11.0,
        (1, 400): 12.0,
        (2, 500): 99.0,
        (3, 600): None,
    }
    assert out.count() == trades.count()  # exactly one row per left row


def test_asof_join_tolerance(quotes, trades):
    out = joins.asof_join(
        trades, quotes, "tts", "qts", by=["sym"], value_cols=["px"],
        tolerance_seconds=20 * 60,
    )
    got = {(r.sym, r.qty): r.px for r in out.collect()}
    # the 60-min trade's latest quote (30 min earlier) is outside tolerance;
    # the 29-min trade's (19 min earlier) is inside
    assert got[(1, 400)] is None
    assert got[(1, 300)] == 11.0


def test_asof_join_matches_q15_scalar_subquery(spark):
    """Engine as-of == the correlated-subquery formulation on real events
    (Q15's shape), per (user, cutoff)."""
    events = load_table(spark, SF, "events")
    users = events.select("user_id").distinct()
    cutoffs = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 8),), (datetime.datetime(2024, 1, 15),)],
        "cutoff timestamp",
    )
    left = users.crossJoin(cutoffs)
    right = events.select("user_id", "ts", F.col("event_id").alias("eid"))
    out = joins.asof_join(left, right, "cutoff", "ts", by=["user_id"], value_cols=[])
    got = {(r.user_id, r.cutoff): r.asof_ts for r in out.collect()}
    want = {
        (r.user_id, r.cutoff): r.last_ts
        for r in left.alias("l")
        .join(events.alias("e"), "user_id", "left")
        .filter(F.col("e.ts") <= F.col("l.cutoff"))
        .groupBy("user_id", "cutoff")
        .agg(F.max("ts").alias("last_ts"))
        .collect()
    }
    for k, v in want.items():
        assert got[k] == v


def test_range_join_bucketed_equals_theta(spark):
    s = load_table(spark, SF, "supplier").select("s_suppkey", "s_acctbal")
    c = load_table(spark, SF, "customer").select("c_custkey", "c_acctbal")
    theta = joins.range_join(s, c, "s_acctbal", "c_acctbal", -100.0, 100.0)
    bucketed = joins.range_join(s, c, "s_acctbal", "c_acctbal", -100.0, 100.0, bucket=200.0)
    key = lambda df: {(r.s_suppkey, r.c_custkey) for r in df.collect()}  # noqa: E731
    assert key(theta) == key(bucketed)
    assert theta.count() > 0


def test_cifar_converter(spark, tmp_path):
    """Synthetic CIFAR-format pickle batches -> one row per image with raw
    NHWC bytes and the right label (and no dict-collapse bug: N rows stay
    N rows even with repeated labels, SURVEY §7.4.3)."""
    rng = np.random.RandomState(7)
    for b in range(2):
        data = rng.randint(0, 256, size=(6, 3072), dtype=np.uint8)
        labels = [b % 2, 1, 1, 3, 3, 3]  # heavy label repetition on purpose
        with open(tmp_path / f"data_batch_{b}", "wb") as f:
            pickle.dump({b"data": data, b"labels": labels}, f)
    df = read_cifar_batches(spark, str(tmp_path))
    assert df.count() == 12  # all rows survive label repetition
    row = df.orderBy("image_id").first()
    assert len(bytes(row.content)) == 32 * 32 * 3
    assert row.meta.format == "raw" and row.meta.channels == 3
    assert df.select("image_id").distinct().count() == 12
    # byte-level spot check: planar -> NHWC transpose preserved
    batches = {r.batch for r in df.select("batch").distinct().collect()}
    assert batches == {"data_batch_0", "data_batch_1"}


def test_split_sentences(spark):
    df = spark.createDataFrame(
        [(1, "One two. Three four! Five?"), (2, "No terminator here")],
        "doc_id long, text string",
    )
    out = text_ops.split_sentences(df, "doc_id", "text").collect()
    got = {(r.doc_id, r.sentence_idx): r.sentence for r in out}
    assert got == {
        (1, 0): "One two.",
        (1, 1): "Three four!",
        (1, 2): "Five?",
        (2, 0): "No terminator here",
    }


def test_chunk_fingerprints_properties(spark):
    """CDC chunks: lengths sum to the byte length, hashes are crc32 of the
    byte slices, and a shared suffix yields shared chunk hashes even at a
    different offset (the content-defined property)."""
    # varied tokens (a repeated phrase would make the rolling hash periodic
    # and can starve the boundary condition in the shared region)
    shared = " ".join(f"w{(i * i) % 997}x{(i * 7) % 31}" for i in range(300))
    a, b = "PREFIX-A " + shared, "totally different and longer prefix " + shared
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    out = text_ops.chunk_fingerprints(df, "doc_id", "text").collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, txt in [(1, a), (2, b)]:
        rows = sorted(by_doc[doc_id], key=lambda r: r.chunk_idx)
        data = txt.encode()
        assert sum(r.chunk_len for r in rows) == len(data)
        off = 0
        for r in rows:
            assert r.chunk_hash == zlib.crc32(data[off : off + r.chunk_len])
            off += r.chunk_len
    h1 = {r.chunk_hash for r in by_doc[1]}
    h2 = {r.chunk_hash for r in by_doc[2]}
    assert h1 & h2  # shared content -> shared chunks despite offset shift


def test_normalize_per_cluster(spark):
    emb = load_table(spark, SF, "embeddings")
    res = kmeans.fit(emb, k=3, max_iter=3)
    z = kmeans.normalize_per_cluster(emb, res.assignments)
    assert z.count() == emb.count()
    # per-cluster mean ~ 0 for every dimension
    stats = (
        z.select("cid", F.explode("normalized").alias("v"))
        .groupBy("cid")
        .agg(F.avg("v").alias("m"))
        .collect()
    )
    for r in stats:
        assert abs(r.m) < 1e-9


def test_asof_join_matches_pandas_merge_asof(spark):
    """Property test: on randomized inputs the distributed as-of join
    agrees with pandas.merge_asof (direction='backward'), the de-facto
    reference implementation."""
    import pandas as pd

    rng = np.random.RandomState(11)
    for trial in range(3):
        n_l, n_r = 40, 25
        lpd = pd.DataFrame(
            {
                "k": rng.randint(0, 4, n_l),
                "ts": pd.to_datetime(T0) + pd.to_timedelta(rng.randint(0, 5000, n_l), "s"),
                "lid": np.arange(n_l),
            }
        ).sort_values("ts")
        rpd = pd.DataFrame(
            {
                "k": rng.randint(0, 4, n_r),
                "rts": pd.to_datetime(T0) + pd.to_timedelta(rng.randint(0, 5000, n_r), "s"),
                "val": rng.randint(0, 1000, n_r).astype("float64"),
            }
        ).sort_values("rts")
        want = pd.merge_asof(
            lpd, rpd, left_on="ts", right_on="rts", by="k", direction="backward"
        )
        got = joins.asof_join(
            spark.createDataFrame(lpd, "k int, ts timestamp, lid long"),
            spark.createDataFrame(rpd, "k int, rts timestamp, val double"),
            "ts",
            "rts",
            by=["k"],
            value_cols=["val"],
        ).toPandas()
        merged = want.merge(got[["lid", "val"]], on="lid", suffixes=("_pd", "_spark"))
        mismatch = merged[
            ~(
                (merged.val_pd.isna() & merged.val_spark.isna())
                | (merged.val_pd == merged.val_spark)
            )
        ]
        assert mismatch.empty, f"trial {trial}:\n{mismatch}"


def test_upsert_parquet_merge_semantics(spark, tmp_path):
    from graph_db_clustering_spark.operators.maintenance import delete_where, upsert_parquet

    path = str(tmp_path / "snap")
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id long, name string, v double"
    ).write.parquet(path)
    updates = spark.createDataFrame(
        [(2, "b2", 21.0), (4, "d", 40.0)], "id long, name string, v double"
    )
    upsert_parquet(spark, path, updates, ["id"])
    got = {r.id: (r.name, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {1: ("a", 10.0), 2: ("b2", 21.0), 3: ("c", 30.0), 4: ("d", 40.0)}
    delete_where(spark, path, F.col("id") == 1)
    assert {r.id for r in spark.read.parquet(path).collect()} == {2, 3, 4}


def test_salted_join_equals_plain_join(spark):
    events = load_table(spark, SF, "events").select("event_id", "user_id")
    # skew: map most events onto one key
    skewed = events.withColumn(
        "user_id", F.when(F.col("event_id") % 3 != 0, 1).otherwise(F.col("user_id"))
    )
    dim = load_table(spark, SF, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_name"
    )
    plain = skewed.join(dim, "user_id")
    salted = joins.salted_join(skewed, dim, ["user_id"], salt=4)
    key = lambda df: sorted((r.event_id, r.user_id, r.c_name) for r in df.collect())  # noqa: E731
    assert key(plain) == key(salted)


def test_nearest_1d_join_both_branches_agree(spark):
    """The guarded operator behind q08 (VERDICT r1 item 4): the
    sorted-search plan (dim collected to driver) and the crossJoin+argmin
    fallback (forced via max_dim_values=0) must produce identical
    assignments, both equal to the brute-force per-left argmin with the
    (diff, key) tie-break."""
    c = load_table(spark, SF, "customer").select("c_custkey", "c_acctbal")
    s = load_table(spark, SF, "supplier").select("s_suppkey", "s_acctbal")
    fast = joins.nearest_1d_join(c, s, "c_custkey", "c_acctbal", "s_suppkey", "s_acctbal")
    slow = joins.nearest_1d_join(
        c, s, "c_custkey", "c_acctbal", "s_suppkey", "s_acctbal", max_dim_values=0
    )
    fast_m = {r.c_custkey: r.s_suppkey for r in fast.collect()}
    slow_m = {r.c_custkey: r.s_suppkey for r in slow.collect()}
    assert fast_m == slow_m

    suppliers = [(r.s_suppkey, r.s_acctbal) for r in s.collect()]
    for row in c.limit(50).collect():
        want = min(suppliers, key=lambda t: (abs(row.c_acctbal - t[1]), t[0]))[0]
        assert fast_m[row.c_custkey] == want


def test_nearest_1d_join_nulls_and_empty(spark):
    """ADVICE r2: NULL value rows are dropped consistently in BOTH plans
    (a NULL has no nearest neighbor; previously the fast path threw in
    Bucketizer while the fallback silently dropped), and an empty dim side
    yields an empty result instead of a Bucketizer splits error."""
    left = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 7.0)], "lid int, lv double"
    )
    right = spark.createDataFrame(
        [(10, 4.0), (20, None), (30, 8.0)], "rid int, rv double"
    )
    for mx in (0, 1_000_000):
        out = joins.nearest_1d_join(
            left, right, "lid", "lv", "rid", "rv", max_dim_values=mx
        ).collect()
        assert sorted((r.lid, r.rid) for r in out) == [(1, 10), (3, 30)]
    empty = right.filter("rv IS NULL AND rv IS NOT NULL")
    for mx in (0, 1_000_000):
        out = joins.nearest_1d_join(
            left, empty, "lid", "lv", "rid", "rv", max_dim_values=mx
        ).collect()
        assert out == []


def test_nearest_1d_join_tie_break(spark):
    """Equidistant neighbors resolve to the smaller right key."""
    left = spark.createDataFrame([(1, 5.0)], "lid int, lv double")
    right = spark.createDataFrame(
        [(10, 4.0), (7, 6.0), (99, 6.0)], "rid int, rv double"
    )
    for mx in (0, 1_000_000):  # both branches
        out = joins.nearest_1d_join(
            left, right, "lid", "lv", "rid", "rv", max_dim_values=mx
        ).collect()
        assert [(r.lid, r.rid) for r in out] == [(1, 7)]


def test_train_example_end_to_end(spark, tmp_path):
    """The examples/train.py workflow (the reference's train.py:7-15 on
    this engine) runs to convergence and persists a graph snapshot with
    CLOSEST_TO edges."""
    import sys

    sys.path.insert(0, "/root/repo/examples")
    import train as train_example

    result, store_path = train_example.train(SF, k=2, store_path=str(tmp_path / "g"))
    assert result.converged or result.iterations == 100
    from graph_db_clustering_spark.operators.graph import GraphStore

    g = GraphStore(spark, store_path).load()
    assert g.edges.filter(F.col("relationship") == "CLOSEST_TO").count() == g.vertices.count()
    assert set(r.cid for r in result.centroids.select("cid").collect()) == {0, 1}


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    from graph_db_clustering_spark.sources import files as fsrc

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "event_type", "value"
    )
    path = str(tmp_path / "events_orc")
    fsrc.write_orc(ev, path, partition_by=["event_type"])
    back = fsrc.read_orc(spark, path)
    assert back.count() == ev.count()
    # same content modulo column order (partition column moves last)
    a = sorted(tuple(r) for r in ev.select("event_id", "user_id", "value").collect())
    b = sorted(tuple(r) for r in back.select("event_id", "user_id", "value").collect())
    assert a == b
    # partition pruning: filtering the partition column scans one dir
    one = back.filter(F.col("event_type") == "click")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_type" in plan


def test_rolling_pandas_ema_matches_driver_numpy(spark):
    """Windowed pandas UDAF (GROUPED_AGG over a bounded rows frame):
    cross-checked against a driver-side NumPy EMA on the same trailing
    windows; alpha-degenerate case (alpha=0 -> plain mean) also pinned
    against the built-in avg over the identical frame."""
    import numpy as np
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from graph_db_clustering_spark.operators.timeseries import rolling_pandas_ema

    rows = [(s, i, float((i * 7 + s * 13) % 23)) for s in range(3) for i in range(25)]
    df = spark.createDataFrame(rows, "series int, t int, v double")
    k, alpha = 5, 0.3
    got = {
        (r.series, r.t): r.ema
        for r in rolling_pandas_ema(df, "series", "t", "v", window_rows=k, alpha=alpha).collect()
    }
    by_series = {}
    for s, i, v in rows:
        by_series.setdefault(s, []).append(v)
    for (s, t), ema in got.items():
        vals = np.array(by_series[s][max(0, t - k + 1) : t + 1])
        w = (1 - alpha) ** np.arange(len(vals) - 1, -1, -1)
        want = float((vals * w).sum() / w.sum())
        assert ema == pytest.approx(want, abs=1e-12), (s, t)

    # alpha=0: every weight 1 -> must equal the built-in avg over the frame
    frame = Window.partitionBy("series").orderBy("t").rowsBetween(-(k - 1), 0)
    builtin = {
        (r.series, r.t): r.m
        for r in df.withColumn("m", F.avg("v").over(frame)).collect()
    }
    zero = {
        (r.series, r.t): r.ema
        for r in rolling_pandas_ema(df, "series", "t", "v", window_rows=k, alpha=0.0).collect()
    }
    for key, m in builtin.items():
        assert zero[key] == pytest.approx(m, abs=1e-12)


def test_chunk_by_sentences_greedy_budget(spark):
    """Greedy sentence packing: budget respected, order preserved, no
    sentence split across chunks, oversized sentence -> own chunk."""
    from graph_db_clustering_spark.operators.text import chunk_by_sentences

    docs = spark.createDataFrame(
        [
            # 4 sentences of 3 tokens each; budget 7 -> [s1 s2], [s3 s4]
            (1, "a b one. c d two. e f three. g h four."),
            # one oversized sentence (9 tokens) between small ones
            (2, "tiny one. w w w w w w w w oversized. tiny two."),
            (3, "solo."),
        ],
        "doc_id long, text string",
    )
    rows = chunk_by_sentences(docs, "doc_id", "text", max_tokens=7).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for parts in by_doc.values():
        parts.sort(key=lambda r: r.chunk_idx)
    d1 = by_doc[1]
    assert [r.chunk_text for r in d1] == [
        "a b one. c d two.",
        "e f three. g h four.",
    ]
    assert [r.n_tokens for r in d1] == [6, 6]
    d2 = by_doc[2]
    assert [r.chunk_text for r in d2] == [
        "tiny one.",
        "w w w w w w w w oversized.",
        "tiny two.",
    ]
    assert d2[1].n_tokens == 9  # oversized chunk allowed, alone
    assert [r.chunk_text for r in by_doc[3]] == ["solo."]
    # reconstruction: concatenating chunks re-yields every sentence in order
    joined = " ".join(r.chunk_text for r in d1)
    assert joined == "a b one. c d two. e f three. g h four."


def test_bm25_hand_computed(spark):
    """BM25 against a hand-computed tiny corpus: idf/tf-saturation/length
    normalization all pinned numerically."""
    import math

    from graph_db_clustering_spark.operators.text import bm25_scores

    docs = spark.createDataFrame(
        [
            (1, "spark spark shuffle"),   # dl 3
            (2, "spark window window window"),  # dl 4
            (3, "nothing relevant here"),  # dl 3
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.score for r in bm25_scores(docs, "doc_id", "text", "spark shuffle").collect()}
    n, avgdl, k1, b = 3, 10 / 3, 1.2, 0.75

    def w(tf, dl, df):
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert abs(out[1] - (w(2, 3, 2) + w(1, 3, 1))) < 1e-9  # spark tf=2, shuffle tf=1
    assert abs(out[2] - w(1, 4, 2)) < 1e-9  # spark only
    assert 3 not in out  # no query terms -> no row
    # higher tf scores higher, sublinearly (saturation)
    assert out[1] > out[2]


def test_unigram_logprob_hand_computed(spark):
    """Add-1 unigram LM on a 3-doc corpus, scores verified by hand; the
    rare-token document scores strictly lower."""
    import math

    from graph_db_clustering_spark.operators.text import unigram_logprob_scores

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a b"), (3, "z")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in unigram_logprob_scores(docs, "doc_id", "text").collect()}
    # freqs: a=3, b=2, z=1; total=6, vocab=3 -> p(t) = (f+1)/9
    p = lambda f: (f + 1) / 9.0
    want1 = (2 * math.log(p(3)) + math.log(p(2))) / 3
    want3 = math.log(p(1))
    assert abs(out[1].avg_logprob - want1) < 1e-9
    assert abs(out[3].avg_logprob - want3) < 1e-9
    assert out[3].avg_logprob < out[2].avg_logprob  # rare-token doc is low tail
    assert (out[1].n_tokens, out[3].n_tokens) == (3, 1)


def test_interval_overlap_join_matches_theta(spark):
    """Banded interval-overlap equals the plain theta join for bucket
    sizes below, at, and above the spans — random intervals."""
    import numpy as np

    from graph_db_clustering_spark.operators.joins import interval_overlap_join

    rng = np.random.RandomState(23)
    lrows = [
        (i, float(s), float(s + rng.randint(1, 15)))
        for i, s in enumerate(rng.randint(0, 200, 60))
    ]
    rrows = [
        (i, float(s), float(s + rng.randint(1, 15)))
        for i, s in enumerate(rng.randint(0, 200, 60))
    ]
    lt = spark.createDataFrame(lrows, "lid long, ls double, le double")
    rt = spark.createDataFrame(rrows, "rid long, rs double, re double")
    want = sorted(
        (r.lid, r.rid)
        for r in interval_overlap_join(lt, rt, "ls", "le", "rs", "re").collect()
    )
    assert want  # non-degenerate
    for bucket in (4.0, 15.0, 64.0):
        got = sorted(
            (r.lid, r.rid)
            for r in interval_overlap_join(
                lt, rt, "ls", "le", "rs", "re", bucket=bucket
            ).collect()
        )
        assert got == want, bucket


def test_interval_overlap_half_open_boundaries(spark):
    from graph_db_clustering_spark.operators.joins import interval_overlap_join

    lt = spark.createDataFrame([(1, 0.0, 10.0)], "lid long, ls double, le double")
    rt = spark.createDataFrame(
        [(1, 10.0, 20.0), (2, 9.9, 20.0)], "rid long, rs double, re double"
    )
    for bucket in (None, 10.0):
        got = {r.rid for r in interval_overlap_join(
            lt, rt, "ls", "le", "rs", "re", bucket=bucket
        ).collect()}
        # [0,10) does not meet [10,20) (half-open); does meet [9.9,20)
        assert got == {2}, bucket


def test_interval_overlap_float_boundary_regression(spark):
    """end = 0.1 + 0.2 (a float ulp above 0.3) with bucket 0.3: the
    banded path must still find the pair whose partner starts at
    exactly 0.3 — an epsilon-subtracted end bin silently missed it
    (review finding)."""
    from graph_db_clustering_spark.operators.joins import interval_overlap_join

    lt = spark.createDataFrame([(1, 0.0, 0.1 + 0.2)], "lid long, ls double, le double")
    rt = spark.createDataFrame([(1, 0.3, 0.5)], "rid long, rs double, re double")
    theta = interval_overlap_join(lt, rt, "ls", "le", "rs", "re").count()
    banded = interval_overlap_join(
        lt, rt, "ls", "le", "rs", "re", bucket=0.3
    ).count()
    assert theta == banded == 1


# --- funnel + cohort retention (round 7) -----------------------------------


def _ev(spark, rows):
    import datetime as dt

    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, d, h), t) for u, d, h, t in rows],
        "user_id long, ts timestamp, event_type string",
    )


def test_funnel_depth_order_matters(spark):
    from graph_db_clustering_spark.operators.timeseries import funnel_depth

    rows = [
        # user 1: full ordered funnel
        (1, 1, 0, "view"), (1, 1, 1, "click"), (1, 1, 2, "purchase"),
        # user 2: purchase BEFORE click -> depth 2 only
        (2, 1, 0, "view"), (2, 1, 1, "purchase"), (2, 1, 2, "click"),
        # user 3: click before any view -> depth 1 (later view anchors,
        # but no click after it)
        (3, 1, 0, "click"), (3, 1, 1, "view"),
        # user 4: no funnel event at all
        (4, 1, 0, "error"),
        # user 5: view only
        (5, 1, 3, "view"),
    ]
    got = {
        r.user_id: r.depth
        for r in funnel_depth(
            _ev(spark, rows), "user_id", "ts", "event_type",
            ["view", "click", "purchase"],
        ).collect()
    }
    assert got == {1: 3, 2: 2, 3: 1, 4: 0, 5: 1}


def test_funnel_first_touch_anchoring(spark):
    from graph_db_clustering_spark.operators.timeseries import funnel_depth

    # the FIRST view anchors: a click between view1 and view2 counts
    rows = [
        (1, 1, 0, "view"), (1, 1, 1, "click"), (1, 2, 0, "view"),
        (1, 1, 2, "purchase"),
    ]
    got = funnel_depth(
        _ev(spark, rows), "user_id", "ts", "event_type",
        ["view", "click", "purchase"],
    ).collect()
    assert got[0].depth == 3


def test_cohort_retention_known_matrix(spark):
    from graph_db_clustering_spark.operators.timeseries import (
        cohort_retention,
    )

    rows = [
        # cohort Jan 1: users 1, 2. user 1 returns day 1 and 3;
        # user 2 returns day 1 only (two events same day = one)
        (1, 1, 9, "view"), (1, 2, 9, "view"), (1, 4, 9, "view"),
        (2, 1, 9, "view"), (2, 2, 8, "view"), (2, 2, 10, "view"),
        # cohort Jan 5: user 3, never returns
        (3, 5, 9, "view"),
    ]
    got = {
        (r.cohort_date.isoformat(), r.day_offset): r.users
        for r in cohort_retention(_ev(spark, rows), "user_id", "ts").collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 2,
        ("2024-01-01", 3): 1,
        ("2024-01-05", 0): 1,
    }


def test_scd2_history_semantics(spark):
    from graph_db_clustering_spark.operators.maintenance import scd2_history

    rows = [
        # key 1: A -> A (no-op, dropped) -> B -> B (dropped) -> A
        (1, 10, "A"), (1, 20, "A"), (1, 30, "B"), (1, 40, "B"), (1, 50, "A"),
        # key 2: single state
        (2, 15, "X"),
    ]
    df = spark.createDataFrame(rows, "key long, ts long, status string")
    out = sorted(
        (r.key, r.valid_from, r.valid_to, r.status, r.is_current)
        for r in scd2_history(df, "key", "ts").collect()
    )
    assert out == [
        (1, 10, 30, "A", False),
        (1, 30, 50, "B", False),
        (1, 50, None, "A", True),
        (2, 15, None, "X", True),
    ]
    # dedup off: every change row becomes a version
    full = scd2_history(df, "key", "ts", dedup_consecutive=False).collect()
    assert len(full) == 6


def test_scd2_null_attribute_transitions(spark):
    from graph_db_clustering_spark.operators.maintenance import scd2_history

    # NULL -> NULL is a no-op (eqNullSafe); NULL -> value is a change
    rows = [(1, 1, None), (1, 2, None), (1, 3, "v"), (1, 4, None)]
    df = spark.createDataFrame(rows, "key long, ts long, status string")
    out = sorted(
        (r.valid_from, r.status) for r in scd2_history(df, "key", "ts").collect()
    )
    assert out == [(1, None), (3, "v"), (4, None)]


def test_cdc_apply_semantics(spark):
    from graph_db_clustering_spark.operators.maintenance import cdc_apply

    snap = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "key long, val string"
    )
    feed = spark.createDataFrame(
        [
            (1, 10, "U", "a2"), (1, 20, "U", "a3"),   # latest U wins
            (2, 5, "D", None),                        # delete
            (4, 7, "I", "new"),                       # insert unseen key
            (3, 1, "U", "c2"), (3, 2, "D", None), (3, 3, "I", "c3"),
            # delete then re-insert: latest (I) wins
        ],
        "key long, seq long, op string, val string",
    )
    out = {r.key: r.val for r in cdc_apply(snap, feed, "key", "seq").collect()}
    assert out == {1: "a3", 3: "c3", 4: "new"}  # 2 deleted


def test_cdc_apply_bad_op_raises(spark):
    import pytest as _pt
    from py4j.protocol import Py4JJavaError

    from graph_db_clustering_spark.operators.maintenance import cdc_apply

    snap = spark.createDataFrame([(1, "a")], "key long, val string")
    feed = spark.createDataFrame(
        [(1, 1, "X", "z")], "key long, seq long, op string, val string"
    )
    with _pt.raises(Exception, match="bad op value"):
        cdc_apply(snap, feed, "key", "seq").collect()
    with _pt.raises(ValueError, match="missing columns"):
        cdc_apply(snap, feed.drop("seq"), "key", "seq")


def test_funnel_plan_is_linear_in_steps(spark):
    """The depth assembly is one left join per step (review fix: the
    semi+anti union form doubled the plan per step — 2^steps scans)."""
    from graph_db_clustering_spark.operators.timeseries import funnel_depth

    rows = [(1, 1, 0, "s0")]
    df = _ev(spark, rows)
    steps = [f"s{i}" for i in range(8)]
    plan = (
        funnel_depth(df, "user_id", "ts", "event_type", steps)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # the union-doubling form carried ~2^8 scan leaves for 8 steps;
    # the flag-join form is quadratic (step k's anchor chain embeds the
    # k-1 prior stages: sum(k+1) = 37 leaves for 8) — fine for real
    # funnel lengths, and crucially there is no Union doubling
    n = len(steps)
    assert plan.count("LogicalRDD") <= (n * (n + 1)) // 2 + n + 2
    assert "Union" not in plan


def test_abtest_entry_matches_numpy_welch(spark):
    """The events_abtest entry's t statistic and Welch-Satterthwaite
    dof equal a direct NumPy computation on the same cohort split."""
    import numpy as np

    from graph_db_clustering_spark.queries.corpus import QUERIES

    sf = "/root/testdata/sf0.001"
    row = QUERIES["events_abtest"](spark, sf).collect()[0]
    e = spark.read.parquet(f"{sf}/events.parquet")
    vals = {
        g: np.array(
            [r.value for r in e.filter(
                (F.col("event_type") == "purchase")
                & (F.col("user_id") % 2 == g)
            ).collect()]
        )
        for g in (0, 1)
    }
    v0, v1 = vals[0].var(ddof=1), vals[1].var(ddof=1)
    n0, n1 = len(vals[0]), len(vals[1])
    se2 = v0 / n0 + v1 / n1
    t = (vals[0].mean() - vals[1].mean()) / np.sqrt(se2)
    dof = se2**2 / ((v0 / n0) ** 2 / (n0 - 1) + (v1 / n1) ** 2 / (n1 - 1))
    assert row.n0 == n0 and row.n1 == n1
    assert row.t_stat == pytest.approx(round(float(t), 4), abs=2e-4)
    assert row.dof == pytest.approx(round(float(dof), 4), abs=2e-4)


def test_bigram_logprob_hand_computed(spark):
    """Interpolated bigram LM on a 2-doc corpus, scores verified by
    hand; a short document (< 2 tokens) drops out entirely."""
    import math

    from graph_db_clustering_spark.operators.text import bigram_logprob_scores

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a a"), (3, "z")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in bigram_logprob_scores(docs, "doc_id", "text").collect()
    }
    assert 3 not in out  # one token, no bigram
    # bigrams: doc1 = (a,b),(b,a),(a,b); doc2 = (a,a)
    # c2: (a,b)=2, (b,a)=1, (a,a)=1; cctx: a=3, b=1
    # unigrams over ALL tokens: a=4, b=2, z=1; total=7, vocab=3
    pu = lambda f: (f + 1) / 10.0
    lp = lambda c2, cctx, fu: math.log(0.7 * c2 / cctx + 0.3 * pu(fu))
    want1 = (2 * lp(2, 3, 2) + lp(1, 1, 4)) / 3
    want2 = lp(1, 3, 4)
    assert out[1].n_bigrams == 3 and out[2].n_bigrams == 1
    assert abs(out[1].avg_logprob - want1) < 1e-9
    assert abs(out[2].avg_logprob - want2) < 1e-9


def test_bigram_logprob_flags_shuffled_text(spark):
    """The discriminative property the operator exists for: shuffling a
    repetitive corpus's word order tanks the bigram score while leaving
    every unigram count identical."""
    from graph_db_clustering_spark.operators.text import (
        bigram_logprob_scores,
        unigram_logprob_scores,
    )

    natural = "the cat sat on the mat " * 5
    shuffled = "the the cat on sat mat the cat mat on sat the " * 2 + "the cat sat on the mat"
    docs = spark.createDataFrame(
        [(1, natural.strip()), (2, shuffled.strip())],
        "doc_id long, text string",
    )
    bi = {r.doc_id: r.avg_logprob for r in bigram_logprob_scores(docs, "doc_id", "text").collect()}
    assert bi[2] < bi[1]  # impossible transitions sit in the low tail


def test_events_cusum_counts_the_implicit_zero_prefix(spark, tmp_path):
    """The CUSUM closed form is S_i = P_i - min(0, min_{j<=i} P_j): the
    running min must include the implicit P_0 = 0, or a user whose
    every prefix sum is positive gets S forced to 0 on their first row
    and alarms arrive late (round-7 advice). A first event of value 300
    (pref = 225 > 0) must alarm immediately with peak 225."""
    import datetime as _dt

    from __spark_entry__ import queries

    t0 = _dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "click", 300.0, "{}"),                            # pref 225
        (2, t0 + _dt.timedelta(minutes=1), 1, "click", 75.0, "{}"),  # pref 225
        (3, t0, 2, "click", 70.0, "{}"),                             # pref -5
        (4, t0 + _dt.timedelta(minutes=1), 2, "click", 80.0, "{}"),  # pref 0
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        r.user_id: r
        for r in queries()["events_cusum"](spark, str(tmp_path)).collect()
    }
    assert out[1].n_alarms == 2 and out[1].first_alarm == 1  # both prefs stay 225
    assert abs(out[1].peak_cusum - 225.0) < 1e-9
    assert out[2].n_alarms == 0 and abs(out[2].peak_cusum - 5.0) < 1e-9


@pytest.mark.slow  # >=10 s (r15 tiering)
def test_weighted_sample_bias_and_invariance(spark):
    """Efraimidis-Spirakis: 20-of-200 draw where half the items carry
    9x weight — across 40 seeds the heavy half must dominate the
    sample (~86% expected; assert > 70%), the same seed must return
    the IDENTICAL sample under hostile repartitioning, and zero-weight
    rows never appear."""
    from graph_db_clustering_spark.operators.traindata import weighted_sample

    rows = [(i, 9.0 if i < 100 else 1.0) for i in range(200)] + [(999, 0.0)]
    df = spark.createDataFrame(rows, "id long, w double")
    heavy = total = 0
    for seed in range(40):
        got = [r.id for r in weighted_sample(df, "id", "w", 20, seed=seed).collect()]
        assert len(got) == 20 and 999 not in got
        heavy += sum(1 for i in got if i < 100)
        total += 20
    assert heavy / total > 0.70, heavy / total
    a = [r.id for r in weighted_sample(df, "id", "w", 20, seed=5).collect()]
    b = [r.id for r in weighted_sample(df.repartition(17), "id", "w", 20, seed=5).collect()]
    assert a == b


def test_grid_radius_join_exact_and_boundary(spark):
    """Grid join == brute force on random points (every pair found
    once, none invented), including pairs straddling cell boundaries
    and the dist == radius edge."""
    rng = np.random.default_rng(9)
    pts = rng.uniform(0, 1, size=(120, 2))
    pts[5] = [0.0999999, 0.5]   # straddle: cells differ, dist < r
    pts[6] = [0.1000001, 0.5]
    pts[7] = [0.30, 0.5]        # exactly r from pts[8] -> included
    pts[8] = [0.35, 0.5]
    df = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)],
        "id long, x double, y double",
    )
    from graph_db_clustering_spark.operators.joins import grid_radius_join

    r = 0.05
    got = {
        (row.id1, row.id2) for row in grid_radius_join(df, "id", "x", "y", r).collect()
    }
    want = set()
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            if float(np.sqrt(((pts[i] - pts[j]) ** 2).sum())) <= r:
                want.add((i, j))
    assert got == want
    assert (5, 6) in got and (7, 8) in got


def test_mv_incremental_multi_delta_and_diff(spark, tmp_path):
    """Three insert deltas folded one at a time equal a from-scratch
    rebuild (including a delta introducing a NEW key); snapshot_diff
    classifies added/removed/changed rows between versions."""
    from graph_db_clustering_spark.operators.maintenance import (
        mv_apply_delta,
        mv_build,
        mv_read,
        snapshot_diff,
        snapshot_write,
    )

    measures = {
        "n": ("v", "count"),
        "s": ("v", "sum"),
        "lo": ("v", "min"),
        "hi": ("v", "max"),
    }
    batches = [
        [("a", 1.0), ("a", 2.0), ("b", 5.0)],
        [("b", -1.0), ("a", 0.5)],
        [("c", 9.0)],  # brand-new key arrives by delta
    ]
    dfs = [spark.createDataFrame(b, "k string, v double") for b in batches]
    path = str(tmp_path / "mv")
    mv_build(dfs[0], path, ["k"], measures)
    for d in dfs[1:]:
        mv_apply_delta(spark, path, d, ["k"], measures)
    got = {r.k: (r.n, r.s, r.lo, r.hi) for r in mv_read(spark, path).collect()}
    want_rows = [x for b in batches for x in b]
    import collections

    agg = collections.defaultdict(list)
    for k, v in want_rows:
        agg[k].append(v)
    want = {k: (len(vs), sum(vs), min(vs), max(vs)) for k, vs in agg.items()}
    assert got == want

    snap = str(tmp_path / "snap")
    v1 = snapshot_write(spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "id long, s string"), snap)
    v2 = snapshot_write(spark.createDataFrame(
        [(1, "x"), (2, "CHANGED"), (4, "new")], "id long, s string"), snap)
    diff = {
        (r.change, r.id)
        for r in snapshot_diff(spark, snap, v1, v2, ["id"]).collect()
    }
    assert diff == {("changed", 2), ("removed", 3), ("added", 4)}


def test_edit1_pairs_complete_vs_bruteforce(spark):
    """Deletion-neighborhood blocking finds EXACTLY the brute-force
    levenshtein==1 pairs on a vocabulary with substitutions,
    insertions, deletions, and decoys at distance 2."""
    words = [
        "spark", "spork", "sparks", "park", "stark", "sharc",
        "table", "cable", "tale", "tables", "maple", "apple",
    ]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {(r.t1, r.t2) for r in text_ops.edit1_pairs(df, "w").collect()}

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[-1]

    want = {
        tuple(sorted((x, y)))
        for i, x in enumerate(words)
        for y in words[i + 1:]
        if lev(x, y) == 1
    }
    assert got == want and ("spark", "spork") in got and ("spark", "stark") in got
    assert ("spark", "sparks") in got and ("park", "spark") in got
    assert ("apple", "maple") not in got  # distance 2


def test_compression_ratio_flags_repetition(spark):
    """Repeated boilerplate compresses far harder than varied prose;
    values match driver-side zlib exactly."""
    import zlib

    varied = " ".join(f"token{i*i % 9973}" for i in range(400))
    junk = "buy cheap now " * 100
    df = spark.createDataFrame(
        [(1, varied), (2, junk), (3, None)], "doc_id long, text string"
    )
    got = {
        r.doc_id: r
        for r in text_ops.compression_ratio(df, "doc_id", "text").collect()
    }
    assert got[2].ratio < got[1].ratio * 0.5
    for i, t in ((1, varied), (2, junk)):
        assert got[i].raw_len == len(t.encode())
        assert got[i].comp_len == len(zlib.compress(t.encode(), 6))
    assert got[3].ratio is None and got[3].raw_len == 0
