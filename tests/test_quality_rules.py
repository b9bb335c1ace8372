"""Gopher rules, intra-doc line dedup, parquet compaction."""

import numpy as np  # noqa: F401
import pytest
from pyspark.sql import functions as F

from graph_db_clustering_spark.operators import maintenance
from graph_db_clustering_spark.operators import text as text_ops

GOOD = (
    "the quick brown fox jumps over the lazy dog and then it runs to have "
    "a rest with some more plain words of ordinary length that continue "
    "for a while so that the word count clears fifty tokens easily as "
    "required by the gopher rules which we are testing here today ok fine"
)


def _flags(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return text_ops.gopher_rule_flags(df, "doc_id", "text").collect()[0]


def test_gopher_good_doc_kept(spark):
    r = _flags(spark, GOOD)
    assert r.kept, r
    assert not any(
        [r.g_wc, r.g_mwl, r.g_symbol, r.g_alpha, r.g_bullet, r.g_ellipsis, r.g_stop]
    )


def test_gopher_short_doc_flagged(spark):
    r = _flags(spark, "too short to have fifty words")
    assert r.g_wc and not r.kept


@pytest.mark.slow  # >=10 s (r15 tiering)
def test_gopher_mean_word_length_bounds(spark):
    r = _flags(spark, " ".join(["a"] * 60))
    assert r.g_mwl
    r = _flags(spark, " ".join(["supercalifragilistic"] * 60))
    assert r.g_mwl


def test_gopher_symbol_ratio(spark):
    base = GOOD.split()
    r = _flags(spark, " ".join(base) + " " + "#" * 10)
    assert r.g_symbol


def test_gopher_alpha_words(spark):
    r = _flags(spark, " ".join(["123"] * 30 + ["word"] * 30))
    assert r.g_alpha  # 50% alphabetic < 80%


def test_gopher_bullet_and_ellipsis_lines(spark):
    r = _flags(spark, "\n".join(f"- item {i}" for i in range(10)))
    assert r.g_bullet
    r = _flags(spark, "\n".join(f"line {i}..." for i in range(10)))
    assert r.g_ellipsis


def test_gopher_stopword_floor(spark):
    r = _flags(spark, " ".join(["word%d" % i for i in range(60)]))
    assert r.g_stop


def test_dedup_lines_keeps_first_occurrence_order(spark):
    df = spark.createDataFrame([(1, "b\na\nb\nc\na")], "doc_id long, text string")
    row = text_ops.dedup_lines(df, "doc_id", "text").collect()[0]
    assert row.text == "b\na\nc"


def test_dedup_lines_no_dups_is_identity(spark):
    df = spark.createDataFrame([(1, "x\ny\nz")], "doc_id long, text string")
    assert text_ops.dedup_lines(df, "doc_id", "text").first().text == "x\ny\nz"


def test_compact_parquet_reduces_files(spark, tmp_path):
    path = str(tmp_path / "frag")
    df = spark.range(10_000).withColumn("v", F.col("id") * 2)
    df.repartition(40).write.parquet(path)
    import os

    n_before = sum(f.endswith(".parquet") for f in os.listdir(path))
    assert n_before == 40
    n = maintenance.compact_parquet(spark, path, target_bytes=1 << 30)
    assert n == 1
    n_after = sum(f.endswith(".parquet") for f in os.listdir(path))
    assert n_after == 1
    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.agg(F.sum("v")).first()[0] == 2 * sum(range(10_000))


def test_compact_parquet_respects_target(spark, tmp_path):
    path = str(tmp_path / "frag2")
    spark.range(50_000).withColumn(
        "payload", F.md5(F.col("id").cast("string"))
    ).repartition(30).write.parquet(path)
    import os

    total = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    target = total // 3
    n = maintenance.compact_parquet(spark, path, target_bytes=target)
    assert 3 <= n <= 5
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) == n
    assert spark.read.parquet(path).count() == 50_000


def test_tfidf_hand_computed(spark):
    """N=2 docs, vocab_size=2: df(a)=2, df(b)=df(c)=1, vocabulary keeps
    (a, b) by the df-desc/term-asc tie-break; idf(a)=ln(3/3)+1=1,
    idf(b)=ln(3/2)+1. 'c' is out of vocabulary and emits no row."""
    import math

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], "doc_id long, text string"
    )
    rows = {
        (r.doc_id, r.term): (r.tf, r.tfidf)
        for r in text_ops.tfidf_scores(df, "doc_id", "text", vocab_size=2).collect()
    }
    idf_b = round(math.log(3 / 2) + 1, 6)
    assert rows == {
        (1, "a"): (2, 2.0),
        (1, "b"): (1, idf_b),
        (2, "a"): (1, 1.0),
    }


def test_tfidf_partitioning_invariant(spark, sf_dir):
    from graph_db_clustering_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").limit(80)
    a = sorted(
        map(tuple, text_ops.tfidf_scores(docs.repartition(1), "doc_id", "text", 20).collect())
    )
    b = sorted(
        map(tuple, text_ops.tfidf_scores(docs.repartition(13), "doc_id", "text", 20).collect())
    )
    assert a == b and len(a) > 0


def test_snapshot_time_travel(spark, tmp_path):
    from pyspark.sql import functions as F2

    path = str(tmp_path / "snap")
    v1 = maintenance.snapshot_write(spark.range(10), path)
    v2 = maintenance.snapshot_write(
        spark.range(20).withColumn("x", F2.lit("b")), path
    )
    assert (v1, v2) == (1, 2)
    assert maintenance.snapshot_versions(path) == [1, 2]
    assert maintenance.snapshot_read(spark, path).count() == 20  # latest
    assert maintenance.snapshot_read(spark, path, version=1).count() == 10
    with pytest.raises(ValueError, match="no committed snapshot"):
        maintenance.snapshot_read(spark, path, version=3)


def test_snapshot_dangling_write_invisible(spark, tmp_path):
    """A crashed write (v-dir present, pointer not flipped) must be
    invisible to readers and cleaned by vacuum."""
    import os
    import shutil

    path = str(tmp_path / "snap2")
    maintenance.snapshot_write(spark.range(5), path)
    # simulate a crash: v=2 written but _LATEST never flipped
    shutil.copytree(os.path.join(path, "v=1"), os.path.join(path, "v=2"))
    assert maintenance.latest_version(path) == 1
    assert maintenance.snapshot_versions(path) == [1]
    assert maintenance.snapshot_read(spark, path).count() == 5
    removed_dirs = maintenance.snapshot_vacuum(path, keep_last=2)
    assert removed_dirs == []  # v=2 was dangling, not a committed version
    assert not os.path.exists(os.path.join(path, "v=2"))


def test_snapshot_vacuum_keeps_last_n(spark, tmp_path):
    import os

    path = str(tmp_path / "snap3")
    for _ in range(4):
        maintenance.snapshot_write(spark.range(3), path)
    removed = maintenance.snapshot_vacuum(path, keep_last=2)
    assert removed == [1, 2]
    assert maintenance.snapshot_versions(path) == [3, 4]
    assert maintenance.snapshot_read(spark, path, version=3).count() == 3
    assert not os.path.exists(os.path.join(path, "v=1"))


def test_decode_bytes_sniffs_encodings(spark):
    from graph_db_clustering_spark.operators import text as text_ops

    s = "héllo wörld"
    rows = [
        (1, bytearray(b"\xef\xbb\xbf" + s.encode("utf-8"))),
        (2, bytearray(b"\xff\xfe" + s.encode("utf-16-le"))),
        (3, bytearray(b"\xfe\xff" + s.encode("utf-16-be"))),
        (4, bytearray(s.encode("utf-8"))),
        (5, bytearray(s.encode("latin-1"))),  # invalid as UTF-8
        (6, bytearray(b"pure ascii")),  # valid UTF-8 (and ASCII)
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {
        r.doc_id: (r.encoding, r.text)
        for r in text_ops.decode_bytes(df, "doc_id", "content").collect()
    }
    assert got[1] == ("utf-8-sig", s)
    assert got[2] == ("utf-16-le", s)
    assert got[3] == ("utf-16-be", s)
    assert got[4] == ("utf-8", s)
    assert got[5] == ("latin-1", s)
    assert got[6] == ("utf-8", "pure ascii")


def test_column_stats_closed_form(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "c"), (4, "a")], "k long, s string"
    )
    got = {r.column: r for r in maintenance.column_stats(df, ["k", "s"]).collect()}
    assert (got["k"].n_rows, got["k"].n_null, got["k"].n_distinct) == (4, 0, 3)
    assert (got["k"].min_value, got["k"].max_value) == ("1", "4")
    assert (got["s"].n_null, got["s"].n_distinct) == (1, 2)


def test_check_constraints_all_kinds(spark):
    df = spark.createDataFrame(
        [(1, "x1", 5.0), (2, "x2", -1.0), (2, None, 150.0), (4, "y", 7.0)],
        "k long, s string, v double",
    )
    rules = [
        ("not_null", "s"),
        ("unique", "k"),
        ("in_range", "v", 0.0, 100.0),
        ("matches", "s", r"x\d"),
        ("non_negative", "v"),
    ]
    got = {r.rule: (r.violations, r.passed)
           for r in maintenance.check_constraints(df, rules).collect()}
    assert got["not_null(s)"] == (1, False)
    assert got["unique(k)"] == (1, False)      # k=2 twice
    assert got["in_range(v, 0.0, 100.0)"] == (2, False)  # -1 and 150
    assert got["matches(s, x\\d)"] == (1, False)  # 'y'
    assert got["non_negative(v)"] == (1, False)
    with pytest.raises(ValueError, match="unknown constraint"):
        maintenance.check_constraints(df, [("bogus", "k")]).collect()


def test_check_constraints_single_aggregate_pass(spark, monkeypatch):
    """Every rule folds into ONE .agg call over the input (no per-rule
    scan loop) — pinned at the API level because AQE splits one
    aggregate into a variable number of jobs, making job counting
    fragile."""
    df = spark.createDataFrame([(i, "a") for i in range(50)], "k long, s string")
    cls = type(df)  # Spark 4's CONCRETE class, not the pyspark.sql re-export
    calls = []
    orig = cls.agg

    def counting_agg(self, *a, **kw):
        calls.append(len(a))
        return orig(self, *a, **kw)

    monkeypatch.setattr(cls, "agg", counting_agg)
    out = maintenance.check_constraints(
        df, [("not_null", "k"), ("non_negative", "k"), ("unique", "k")]
    )
    assert all(r.passed for r in out.collect())
    assert len(calls) == 1 and calls[0] == 3  # one pass, all three rules


def test_check_constraints_matches_is_full_match(spark):
    """'matches' counts values not FULLY matching — a substring hit must
    still be a violation (review finding: rlike alone is find())."""
    df = spark.createDataFrame([("ax1b",), ("x1",)], "s string")
    out = {r.rule: r.violations
           for r in maintenance.check_constraints(df, [("matches", "s", r"x\d")]).collect()}
    assert out["matches(s, x\\d)"] == 1  # 'ax1b' violates, 'x1' passes


def test_column_stats_empty_frame(spark):
    df = spark.createDataFrame([], "k long, s string")
    got = {r.column: r for r in maintenance.column_stats(df, ["k", "s"]).collect()}
    assert got["k"].n_rows == 0 and got["k"].n_null == 0
    assert got["k"].n_distinct == 0 and got["k"].min_value is None


# ---------------------------------------------------------------------------
# robots.txt (RFC 9309)
# ---------------------------------------------------------------------------


def test_robots_rfc_semantics():
    """The RFC 9309 worked examples: longest-match, allow-on-tie,
    wildcard + $ anchoring, group selection (specific beats *), merged
    user-agent lines, empty Disallow, pre-group rules ignored."""
    from graph_db_clustering_spark.operators.web import (
        parse_robots_rules,
        robots_decision,
    )

    g = parse_robots_rules(
        "User-Agent: *\nAllow: /example/page/\nDisallow: /example/\n"
    )
    assert robots_decision(g, "FooBot", "/example/page/")
    assert not robots_decision(g, "FooBot", "/example/other")
    assert robots_decision(g, "FooBot", "/else")

    tie = parse_robots_rules("User-agent: *\nAllow: /page\nDisallow: /page")
    assert robots_decision(tie, "x", "/page")

    star = parse_robots_rules("User-agent: *\nDisallow: /*.gif$")
    assert not robots_decision(star, "x", "/a/pic.gif")
    assert robots_decision(star, "x", "/a/pic.gif?x=1")

    sel = parse_robots_rules(
        "User-agent: googlebot\nDisallow: /private/\nUser-agent: *\nDisallow: /\n"
    )
    assert robots_decision(sel, "Googlebot/2.1", "/public")
    assert not robots_decision(sel, "Googlebot/2.1", "/private/x")
    assert not robots_decision(sel, "OtherBot", "/public")

    merged = parse_robots_rules(
        "User-agent: a\nUser-agent: b\nDisallow: /x\nUser-agent: c\nDisallow: /y\n"
    )
    assert not robots_decision(merged, "a", "/x")
    assert not robots_decision(merged, "b", "/x")
    assert robots_decision(merged, "b", "/y")
    assert not robots_decision(merged, "c", "/y")
    assert robots_decision(merged, "c", "/x")

    loose = parse_robots_rules("Disallow: /ignored\nUser-agent: *\nDisallow:\n")
    assert robots_decision(loose, "x", "/anything")


def test_robots_filter_missing_robots_allows(spark):
    """A host with no robots.txt row allows everything (left join ->
    NULL body -> allowed)."""
    from graph_db_clustering_spark.operators.web import robots_filter

    urls = spark.createDataFrame(
        [("h1", "http://h1/x", "/x"), ("h2", "http://h2/x", "/x")],
        "host string, url string, path string",
    )
    robots = spark.createDataFrame(
        [("h1", "User-agent: *\nDisallow: /x")], "host string, robots_txt string"
    )
    got = {r.host: r.allowed for r in robots_filter(urls, robots, "bot").collect()}
    assert got == {"h1": False, "h2": True}
