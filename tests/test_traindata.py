"""Behavioral tests for operators/traindata beyond the driver oracle gate:
packing invariants vs a driver-side reference, cumsum vs single-partition
window, sampling determinism, scrub edge cases, decontamination ground
truth."""

import random

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from graph_db_clustering_spark.operators import traindata


def test_word_ngrams_short_doc_empty(spark):
    df = spark.createDataFrame([("a b",), ("a b c d",)], "text string")
    out = df.select(traindata.word_ngrams(F.col("text"), 3).alias("g")).collect()
    assert out[0]["g"] == []
    assert out[1]["g"] == ["a b c", "b c d"]


def test_decontaminate_ground_truth(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over"),  # shares "the quick brown"
            (2, "completely different words here now"),
            (3, "quick brown fox and the quick brown fox again"),
        ],
        "id long, text string",
    )
    ev = spark.createDataFrame(
        [(10, "the quick brown fox sat")], "id long, text string"
    )
    got = {
        r["id"]: r["n_shared"]
        for r in traindata.decontaminate(train, ev, "id", "text", n=3).collect()
    }
    # eval 3-grams: {the quick brown, quick brown fox, brown fox sat}
    assert got == {1: 2, 3: 2}


def test_decontaminate_shuffle_fallback(spark):
    """Above max_broadcast_grams the eval side must NOT be broadcast
    (VERDICT r1 item 5): same answer, shuffle-hash-hinted plan."""
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over"),
            (2, "completely different words here now"),
            (3, "quick brown fox and the quick brown fox again"),
        ],
        "id long, text string",
    )
    ev = spark.createDataFrame(
        [(10, "the quick brown fox sat")], "id long, text string"
    )
    broad = traindata.decontaminate(train, ev, "id", "text", n=3)
    fall = traindata.decontaminate(
        train, ev, "id", "text", n=3, max_broadcast_grams=0
    )
    as_map = lambda df: {r["id"]: r["n_shared"] for r in df.collect()}  # noqa: E731
    assert as_map(broad) == as_map(fall) == {1: 2, 3: 2}
    # the fallback plan carries no broadcast hint on the eval side
    analyzed = fall._jdf.queryExecution().analyzed().toString()
    assert "broadcast" not in analyzed.lower()
    assert "shuffle_hash" in analyzed.lower()
    assert "broadcast" in broad._jdf.queryExecution().analyzed().toString().lower()


def test_pii_scrub_edges(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b-c_d@ex-ample.co.uk now"),
            (2, "ssn 123-45-6789 vs phone 555 1234 and 555-9876"),
            (3, "no pii at all"),
        ],
        "id long, text string",
    )
    rows = {r["id"]: r for r in traindata.pii_scrub(df, "id", "text").collect()}
    assert rows[1]["scrubbed"] == "mail <EMAIL> now"
    assert rows[1]["n_email"] == 1
    # SSN wins over PHONE on the overlapping span; both standalone phones hit
    assert rows[2]["scrubbed"] == "ssn <SSN> vs phone <PHONE> and <PHONE>"
    assert (rows[2]["n_ssn"], rows[2]["n_phone"]) == (1, 2)
    assert rows[3]["scrubbed"] == "no pii at all"


def test_global_cumsum_matches_single_partition_window(spark):
    rng = random.Random(7)
    data = [(i, rng.randint(0, 50)) for i in range(500)]
    rng.shuffle(data)
    df = spark.createDataFrame(data, "k long, v long")
    got = {
        r["k"]: r["cum"]
        for r in traindata.global_cumsum(df, "k", "v", num_partitions=7).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["k"]: r["cum"]
        for r in df.withColumn("cum", F.sum("v").over(w)).collect()
    }
    assert got == want


def test_pack_sequences_invariants(spark):
    rng = random.Random(11)
    docs = [(i, rng.randint(1, 700)) for i in range(200)]
    df = spark.createDataFrame(docs, "id long, tok long")
    budget = 512
    rows = traindata.pack_sequences(df, "id", "tok", budget).collect()

    # every token of every doc lands in exactly one chunk slot
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["id"], []).append(r)
    toks = dict(docs)
    assert set(by_doc) == set(toks)
    for did, parts in by_doc.items():
        parts.sort(key=lambda r: r["chunk_id"])
        assert sum(p["n_toks"] for p in parts) == toks[did]
        assert parts[0]["off_in_doc"] == 0
        for a, b in zip(parts, parts[1:]):
            assert b["chunk_id"] == a["chunk_id"] + 1  # contiguous chunks
            assert b["off_in_doc"] == a["off_in_doc"] + a["n_toks"]

    # every chunk except the last is exactly full
    by_chunk = {}
    for r in rows:
        by_chunk[r["chunk_id"]] = by_chunk.get(r["chunk_id"], 0) + r["n_toks"]
    last = max(by_chunk)
    assert set(by_chunk) == set(range(last + 1))  # dense chunk ids
    for cid, n in by_chunk.items():
        assert n == budget if cid < last else 0 < n <= budget


def test_stratified_sample_deterministic_and_thresholded(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    frac = {"en": 0.5, "de": 0.25}
    a = traindata.stratified_sample(docs, "doc_id", "lang", frac).select("doc_id")
    b = traindata.stratified_sample(
        docs.repartition(13), "doc_id", "lang", frac
    ).select("doc_id")
    assert sorted(r[0] for r in a.collect()) == sorted(r[0] for r in b.collect())
    # default 0.0 drops unlisted strata entirely
    langs = {
        r[0]
        for r in traindata.stratified_sample(docs, "doc_id", "lang", frac)
        .select("lang")
        .distinct()
        .collect()
    }
    assert langs <= {"en", "de"}


def test_domain_mix_hits_target_proportions(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    weights = {"src0": 0.5, "src1": 0.5}
    out = traindata.domain_mix(docs, "doc_id", "source", weights)
    counts = {r[0]: r[1] for r in out.groupBy("source").count().collect()}
    assert set(counts) <= {"src0", "src1"}
    n_in = {
        r[0]: r[1]
        for r in docs.filter(F.col("source").isin("src0", "src1"))
        .groupBy("source")
        .count()
        .collect()
    }
    # equal weights + equal source sizes -> keep everything (rate 1.0),
    # never upsample
    assert counts == n_in


def test_repetition_stats_known_ratio(spark):
    from graph_db_clustering_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [(1, "a b c a b c a b"), (2, "all distinct words here now"), (3, "x y")],
        "id long, text string",
    )
    rows = {
        r["id"]: r
        for r in text_ops.repetition_stats(df, "id", "text", n=3).collect()
    }
    # 6 trigrams, 3 distinct -> half are repeats
    assert (rows[1]["n_grams"], rows[1]["dup_ngram_ratio"]) == (6, 0.5)
    assert rows[2]["dup_ngram_ratio"] == 0.0
    assert (rows[3]["n_grams"], rows[3]["dup_ngram_ratio"]) == (0, 0.0)  # < n tokens


def test_pack_sequences_partitioning_invariant(spark, sf_dir):
    """The two-pass prefix sum must give byte-identical packing no matter
    how the input arrives partitioned (range boundaries come from
    sampling; the persist in global_cumsum pins them per run)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    r1 = sorted(
        tuple(r)
        for r in traindata.pack_sequences(
            docs.repartition(3), "doc_id", "n_chars", 2048
        ).collect()
    )
    r2 = sorted(
        tuple(r)
        for r in traindata.pack_sequences(
            docs.repartition(11), "doc_id", "n_chars", 2048
        ).collect()
    )
    assert r1 == r2 and len(r1) > 0


def test_pack_sequences_invariant_at_10x_scale(spark, sf_dir):
    """VERDICT r2 item 7: range-boundary sampling risk grows with input
    size — pin invariance on a corpus ~10x the sf0.001 documents table
    (50k docs, adversarial length mix: mostly short docs plus huge
    boundary-straddling ones), across hostile partitionings and
    non-default partition counts. Byte-identical output + conservation
    of every token required."""
    docs = spark.range(50_000).select(
        F.col("id").alias("doc_id"),
        # deterministic skewed lengths: ~1/100 docs are 40k-token giants
        # (straddle many 2048 chunks), rest 1-400 tokens
        F.when(F.col("id") % 100 == 0, F.col("id") % 7 * 5000 + 5000)
        .otherwise(F.col("id") % 400 + 1)
        .alias("n_tok"),
    )
    outs = []
    for parts in (2, 64):
        out = traindata.pack_sequences(
            docs.repartition(parts, "n_tok"), "doc_id", "n_tok", 2048
        )
        outs.append(sorted(tuple(r) for r in out.collect()))
        spark.catalog.clearCache()
    assert outs[0] == outs[1] and len(outs[0]) >= 50_000
    total = sum(r[3] for r in outs[0])
    want = docs.agg(F.sum("n_tok")).first()[0]
    assert total == want  # no token lost or duplicated at any boundary


def test_sampling_validates_inputs(spark, sf_dir):
    import pytest as _pytest

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with _pytest.raises(ValueError, match="not in \\[0, 1\\]"):
        traindata.stratified_sample(docs, "doc_id", "lang", {"en": 1.5})
    with _pytest.raises(ValueError, match="negative weight"):
        traindata.domain_mix(docs, "doc_id", "source", {"src0": -0.1, "src1": 1.0})
    with _pytest.raises(ValueError, match="positive weight"):
        traindata.domain_mix(docs, "doc_id", "source", {"src0": 0.0})


def test_id_hash_bucket_no_overflow_for_huge_ids(spark):
    # naive (id * FIB_HASH) % m wraps negative past id ~3.47e9; the bounded
    # form must stay in [0, m) and agree with Python's exact arithmetic
    ids = [0, 1, 9999, 3_470_000_000, 2**40, 2**62]
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    got = {
        r["id"]: r["h"]
        for r in df.select(
            "id", traindata.id_hash_bucket("id", 10000).alias("h")
        ).collect()
    }
    for i in ids:
        expect = (i * traindata.FIB_HASH) % 10000  # Python ints don't overflow
        assert got[i] == expect, (i, got[i], expect)
        assert 0 <= got[i] < 10000


def test_stratified_sample_huge_ids_respect_fraction(spark):
    # with the old overflowing hash, ids > 3.47e9 all went negative and
    # passed every threshold (fraction silently 100%)
    base = 4_000_000_000
    df = spark.createDataFrame(
        [(base + i, "en") for i in range(2000)], "id long, s string"
    )
    n = traindata.stratified_sample(df, "id", "s", {"en": 0.1}).count()
    assert 100 < n < 350, n  # ~10% of 2000, not 2000


def test_domain_mix_zero_row_weighted_domain_raises(spark):
    df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], "id long, d string")
    import pytest

    with pytest.raises(ValueError, match="zero rows"):
        traindata.domain_mix(df, "id", "d", {"a": 0.5, "typo": 0.5})


def test_global_cumsum_negative_values(spark):
    rows = [(i, (-1) ** i * (i % 7 + 1)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, v long")
    got = {
        r["id"]: r["cum"]
        for r in traindata.global_cumsum(df, "id", "v", num_partitions=8).collect()
    }
    acc = 0
    for i, v in rows:
        acc += v
        assert got[i] == acc, (i, got[i], acc)


def test_deterministic_shuffle_invariant_and_balanced(spark):
    from graph_db_clustering_spark.operators.traindata import deterministic_shuffle

    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    outs = []
    for parts in (3, 64):
        got = deterministic_shuffle(df.repartition(parts), "doc_id", shards=7)
        outs.append(sorted((r.shard, r.pos, r.doc_id) for r in got.collect()))
    # byte-identical layout under hostile repartitionings
    assert outs[0] == outs[1]
    by_shard = {}
    for shard, pos, _ in outs[0]:
        by_shard.setdefault(shard, []).append(pos)
    # all 7 shards populated, roughly balanced, pos is 1..n_shard dense
    assert set(by_shard) == set(range(7))
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))
        assert abs(len(poss) - 2000 / 7) < 0.2 * 2000 / 7, (shard, len(poss))
    import pytest

    with pytest.raises(ValueError, match="shards"):
        deterministic_shuffle(df, "doc_id", shards=0)


def test_take_token_budget_invariant_and_exact(spark):
    from graph_db_clustering_spark.operators.traindata import take_token_budget

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97 + 5).alias("toks")
    )
    outs = []
    for parts in (3, 64):
        got = take_token_budget(df.repartition(parts), "doc_id", "toks", budget=5000)
        outs.append(sorted((r.doc_id, r.toks, r.cum_tokens) for r in got.collect()))
        spark.catalog.clearCache()
    assert outs[0] == outs[1]  # byte-identical under repartitioning
    total = sum(t for _, t, _ in outs[0])
    assert total <= 5000
    # exact-to-one-doc: adding the next doc in shuffle order would exceed
    assert outs[0], "budget cut kept nothing"
    assert max(c for _, _, c in outs[0]) == total  # cum of last kept == total
    # the running total is consistent: each row's cum is the sum of kept
    # rows at-or-before it in the deterministic order
    by_cum = sorted(outs[0], key=lambda r: r[2])
    acc = 0
    for _, t, c in by_cum:
        acc += t
        assert c == acc


def test_deterministic_shuffle_negative_ids_stay_in_range(spark):
    # round-6 review finding: signed-hash id spaces include negatives;
    # pmod keeps shard in [0, shards) (plain % would go negative)
    from graph_db_clustering_spark.operators.traindata import deterministic_shuffle

    df = spark.range(-500, 500).select(F.col("id").alias("doc_id"))
    got = deterministic_shuffle(df, "doc_id", shards=7)
    shards = {r.shard for r in got.select("shard").distinct().collect()}
    assert shards <= set(range(7)) and len(shards) == 7
    assert got.count() == 1000


@pytest.mark.slow  # >=15 s (r15 tiering)
def test_zorder_layout_tightens_file_bounding_boxes(spark, sf_dir, tmp_path):
    """The data-skipping claim, measured: write orders once sorted
    linearly by x and once Z-ordered over (x, y) buckets, then read
    every parquet file's min/max footers. A linear sort leaves the
    NON-leading dimension's per-file range at ~the full axis (a
    predicate on y alone skips nothing); the Z-order layout keeps BOTH
    dims' ranges tight, so the average per-file y-range — exactly the
    probability a point predicate on y cannot skip a file — must drop
    well below the linear layout's."""
    import glob as globmod

    from graph_db_clustering_spark.operators import traindata as td

    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(
            (F.col("o_custkey") % 256).alias("x"),
            (F.col("o_orderkey") % 256).alias("y"),
        )
    )

    def avg_ranges(path):
        files = globmod.glob(f"{path}/part-*.parquet")
        assert len(files) >= 8
        xr, yr = [], []
        for f in files:
            r = (
                spark.read.parquet(f)
                .agg(
                    F.min("x"), F.max("x"), F.min("y"), F.max("y"), F.count("*")
                )
                .first()
            )
            if r[4] == 0:
                continue
            xr.append((r[1] - r[0] + 1) / 256.0)
            yr.append((r[3] - r[2] + 1) / 256.0)
        return sum(xr) / len(xr), sum(yr) / len(yr)

    lin = str(tmp_path / "linear")
    o.repartitionByRange(16, "x").sortWithinPartitions("x").write.mode(
        "overwrite"
    ).parquet(lin)
    zo = str(tmp_path / "zorder")
    td.zorder_by(o, ["x", "y"], bits=8, num_partitions=16).write.mode(
        "overwrite"
    ).parquet(zo)
    lin_x, lin_y = avg_ranges(lin)
    zo_x, zo_y = avg_ranges(zo)
    # linear: x tight, y ~ the whole axis. z-order: BOTH tight — the
    # y-only predicate goes from unprunable to mostly-prunable.
    assert lin_y > 0.8, lin_y
    assert zo_y < lin_y / 2, (lin_y, zo_y)
    assert zo_x < 0.6, zo_x  # x stays reasonably tight too


class TestBloomDecontamination:
    def _corpora(self, spark):
        from graph_db_clustering_spark.catalog import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        train = docs.filter(F.col("doc_id") < 300)
        eval_df = docs.filter(
            (F.col("doc_id") >= 300) & (F.col("doc_id") < 360)
        ).select(F.col("text"))
        return train, eval_df

    def test_no_false_negatives_vs_exact(self, spark):
        """Every exactly-contaminated doc must be Bloom-flagged (the
        one-sided guarantee), with flag counts >= the exact counts."""
        from graph_db_clustering_spark.operators import traindata as td

        train, eval_df = self._corpora(spark)
        exact = {
            r.doc_id: r.n_shared
            for r in td.decontaminate(train, eval_df, "doc_id", "text", n=3).collect()
        }
        bloom, m, k = td.build_bloom(eval_df, "text", n=3)
        flagged = {
            r.doc_id: r.n_flagged
            for r in td.bloom_decontaminate(
                train, bloom, m, k, "doc_id", "text", n=3
            ).collect()
        }
        assert set(exact) <= set(flagged)
        for d, n_exact in exact.items():
            assert flagged[d] >= n_exact

    def test_false_positive_rate_bounded(self, spark):
        """Docs sharing NO gram with the eval set flag at well under the
        sized filter's theoretical noise ceiling."""
        from graph_db_clustering_spark.operators import traindata as td

        train, eval_df = self._corpora(spark)
        exact_ids = {
            r.doc_id
            for r in td.decontaminate(train, eval_df, "doc_id", "text", n=3).collect()
        }
        bloom, m, k = td.build_bloom(eval_df, "text", n=3)
        flagged_ids = {
            r.doc_id
            for r in td.bloom_decontaminate(
                train, bloom, m, k, "doc_id", "text", n=3
            ).collect()
        }
        clean_total = train.count() - len(exact_ids)
        false_pos = len(flagged_ids - exact_ids)
        assert false_pos <= max(2, clean_total * 0.02), (false_pos, clean_total)

    def test_build_is_partitioning_invariant(self, spark):
        import numpy as np

        from graph_db_clustering_spark.operators import traindata as td

        _, eval_df = self._corpora(spark)
        b1, _, _ = td.build_bloom(eval_df.repartition(1), "text", n=3, m_bits=1 << 16)
        b2, _, _ = td.build_bloom(eval_df.repartition(11), "text", n=3, m_bits=1 << 16)
        assert np.array_equal(b1, b2)
        assert b1.any()


def test_duplicate_spans_known(spark):
    """doc 1 repeats 'a b c' internally; doc 2 shares it. With span=3:
    both of doc 1's occurrences and doc 2's one are flagged with
    n_occurrences=3; unique windows never appear."""
    from graph_db_clustering_spark.operators import traindata as td

    rows = [
        (1, "a b c x y a b c"),
        (2, "q a b c r"),
        (3, "totally unique words here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = td.duplicate_spans(df, "doc_id", "text", span=3).collect()
    flagged = sorted((r.doc_id, r.pos, r.n_occurrences) for r in got)
    assert flagged == [(1, 0, 3), (1, 5, 3), (2, 1, 3)]
    assert len({r.gram_md5 for r in got}) == 1


def test_normalize_unicode_forms(spark):
    from graph_db_clustering_spark.operators import text as text_ops

    rows = [(1, "café ﬁne")]  # decomposed e-acute + fi ligature
    df = spark.createDataFrame(rows, "doc_id long, text string")
    nfc = text_ops.normalize_unicode(df, "doc_id", "text", "NFC").first().text
    assert nfc == "café ﬁne"  # composed; ligature kept
    nfkc = text_ops.normalize_unicode(df, "doc_id", "text", "NFKC").first().text
    assert nfkc == "café fine"  # compatibility: ligature expands
    with pytest.raises(ValueError, match="normalization form"):
        text_ops.normalize_unicode(df, "doc_id", "text", "NFX")


def test_temperature_weights_math_and_composition(spark):
    from graph_db_clustering_spark.operators import traindata as td

    counts = {"web": 8000, "code": 1600, "books": 400}
    w1 = td.temperature_weights(counts, alpha=1.0)
    assert abs(w1["web"] - 0.8) < 1e-12  # alpha=1: natural proportions
    w = td.temperature_weights(counts, alpha=0.5)
    # flattening: low-resource share rises, high-resource falls
    assert w["books"] > 0.04 and w["web"] < 0.8
    assert abs(sum(w.values()) - 1.0) < 1e-12
    # relative order preserved
    assert w["web"] > w["code"] > w["books"]
    with pytest.raises(ValueError, match="alpha"):
        td.temperature_weights(counts, alpha=0)

    # composes with domain_mix end to end on a real frame
    rows = [(i, "web" if i % 10 < 8 else ("code" if i % 10 < 9 else "books"))
            for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    mixed = td.domain_mix(df, "doc_id", "domain", td.temperature_weights(
        td.domain_counts(df, "domain"), alpha=0.5))
    got = {r[0]: r[1] for r in mixed.groupBy("domain").count().collect()}
    # flattened mix: web no longer ~8x books
    assert got["web"] / max(got["books"], 1) < 5


def test_interleave_corpora_stride_schedule(spark):
    from graph_db_clustering_spark.operators import traindata as td

    a = spark.createDataFrame([(i, "a") for i in range(8)], "doc_id long, src string")
    b = spark.createDataFrame([(100 + i, "b") for i in range(4)], "doc_id long, src string")
    out = td.interleave_corpora([(a, 2.0), (b, 1.0)], "doc_id").orderBy("train_order")
    seq = [r.src for r in out.collect()]
    # 2:1 stride: every prefix holds ~2 a's per b; the first three are a,a,b
    assert seq[:6] == ["a", "a", "b", "a", "a", "b"]
    assert len(seq) == 12
    # deterministic under repartitioning
    out2 = td.interleave_corpora(
        [(a.repartition(5), 2.0), (b.repartition(3), 1.0)], "doc_id"
    ).orderBy("train_order")
    assert [r.doc_id for r in out.collect()] == [r.doc_id for r in out2.collect()]
    with pytest.raises(ValueError, match="positive weights"):
        td.interleave_corpora([(a, 0.0)], "doc_id")


# ---------------------------------------------------------------------------
# train_test_split (round 7)
# ---------------------------------------------------------------------------


def test_split_thresholds_normalize_and_validate():
    got = traindata.split_thresholds({"train": 0.8, "val": 0.1, "test": 0.1})
    assert got == [
        ("train", "cccccccc"),
        ("val", "e6666666"),
        ("test", "ffffffff"),
    ]
    # weights need not sum to 1: ratios are what count
    assert traindata.split_thresholds({"a": 8, "b": 2}) == [
        ("a", "cccccccc"),
        ("b", "ffffffff"),
    ]
    with pytest.raises(ValueError, match="positive"):
        traindata.split_thresholds({"a": 0.5, "b": 0.0})
    with pytest.raises(ValueError, match="at least one"):
        traindata.split_thresholds({})


def test_train_test_split_group_level_and_deterministic(spark):
    df = spark.createDataFrame(
        [(i, f"dom{i % 37}") for i in range(2000)], "id long, key string"
    )
    out = traindata.train_test_split(df, "key", salt="s1")
    # leakage-safety: one split per key, always
    per_key = out.groupBy("key").agg(
        F.countDistinct("split").alias("k")
    ).agg(F.max("k")).collect()[0][0]
    assert per_key == 1
    # pure function of the key: hostile repartition changes nothing
    again = {
        (r["id"], r["split"])
        for r in traindata.train_test_split(
            df.repartition(13), "key", salt="s1"
        ).collect()
    }
    assert again == {(r["id"], r["split"]) for r in out.collect()}


def test_train_test_split_fractions_converge(spark):
    # row-level split over many keys: empirical fractions near weights
    df = spark.range(20000).withColumnRenamed("id", "k")
    got = {
        r["split"]: r["n"]
        for r in traindata.train_test_split(
            df, "k", {"train": 0.9, "test": 0.1}
        )
        .groupBy("split")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert abs(got["train"] / 20000 - 0.9) < 0.01
    assert got["train"] + got["test"] == 20000


def test_train_test_split_salt_draws_independent_splits(spark):
    df = spark.range(500).withColumnRenamed("id", "k")
    a = traindata.train_test_split(df, "k", salt="expA")
    b = traindata.train_test_split(df, "k", salt="expB").withColumnRenamed(
        "split", "split_b"
    )
    moved = (
        a.join(b, "k").filter(F.col("split") != F.col("split_b")).count()
    )
    # two salts agree only by chance (~0.66 for 80/10/10), never fully
    assert 0 < moved < 500


def test_duplicate_span_ranges_merges_consecutive_anchors(spark):
    """duplicate_span_ranges: a shared 6-token run anchors 3-gram
    positions 2..5 in doc 1 (0-based) and 0..3 in doc 2; islands merge
    to maximal ranges with the span-1 tail extension."""
    td = traindata
    df = spark.createDataFrame(
        [(1, "x y a b c d e f q r"),
         (2, "a b c d e f z"),
         (3, "unique words only here none")],
        "doc_id long, text string",
    )
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["n_tokens"])
        for r in td.duplicate_span_ranges(
            df, "doc_id", "text", span=3
        ).collect()
    )
    assert got == [(1, 2, 7, 6), (2, 0, 5, 6)], got


def test_duplicate_span_ranges_disjoint_islands(spark):
    td = traindata
    df = spark.createDataFrame(
        [(1, "a b c GAP1 GAP2 d e f tail"),
         (2, "a b c X Y d e f Z")],
        "doc_id long, text string",
    )
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in td.duplicate_span_ranges(
            df, "doc_id", "text", span=3
        ).collect()
    )
    assert got == [(1, 0, 2), (1, 5, 7), (2, 0, 2), (2, 5, 7)], got
