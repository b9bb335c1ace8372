"""WARC source (sources/warc) + HTML text extraction (text.html_text_expr)."""

import gzip

import pytest
from pyspark.sql import functions as F

from graph_db_clustering_spark.operators import text as text_ops
from graph_db_clustering_spark.sources import warc

HTML = b"<html><body><p>Hello &amp; welcome</p></body></html>"


def _sample_records() -> list[bytes]:
    return [
        warc.build_record(
            "warcinfo",
            b"software: gdc-spark\r\n",
            content_type="application/warc-fields",
            record_id="<urn:uuid:info-1>",
        ),
        warc.build_record(
            "request",
            b"GET /a HTTP/1.1\r\nHost: x\r\n\r\n",
            target_uri="https://x.example/a",
            content_type="application/http; msgtype=request",
        ),
        warc.build_record(
            "response",
            warc.http_response(HTML),
            target_uri="https://x.example/a",
            record_id="<urn:uuid:resp-1>",
        ),
    ]


def test_record_framing_roundtrip():
    recs = list(warc._records_in(b"".join(_sample_records())))
    assert [h["warc-type"] for h, _ in recs] == ["warcinfo", "request", "response"]
    h, block = recs[2]
    assert h["warc-target-uri"] == "https://x.example/a"
    assert int(h["content-length"]) == len(block)
    status, ctype, body = warc._split_http(block)
    assert (status, ctype, body) == (200, "text/html", HTML)


def test_gzip_member_iteration():
    members = [warc.gzip_member(r) for r in _sample_records()]
    out = list(warc._gzip_members(b"".join(members)))
    assert out == _sample_records()


def test_gzip_truncated_member_raises():
    blob = warc.gzip_member(_sample_records()[0])[:-4]
    with pytest.raises(ValueError, match="truncated"):
        list(warc._gzip_members(blob))


def test_non_warc_bytes_raise():
    with pytest.raises(ValueError, match="expected record header"):
        list(warc._records_in(b"HTTP/1.1 200 OK\r\n\r\n"))


def test_read_warc_plain_and_gzip(spark, tmp_path):
    recs = _sample_records()
    (tmp_path / "a.warc").write_bytes(b"".join(recs))
    (tmp_path / "b.warc.gz").write_bytes(
        b"".join(warc.gzip_member(r) for r in recs)
    )
    df = warc.read_warc(spark, str(tmp_path)).orderBy("warc_file")
    rows = df.collect()
    # record_types=("response",) default: 1 response per file
    assert [r["warc_file"] for r in rows] == ["a.warc", "b.warc.gz"]
    for r in rows:
        assert r["warc_type"] == "response"
        assert r["http_status"] == 200
        assert r["http_content_type"] == "text/html"
        assert bytes(r["payload"]) == HTML
        assert r["target_uri"] == "https://x.example/a"
        assert r["record_id"] == "<urn:uuid:resp-1>"


def test_read_warc_all_types(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(b"".join(_sample_records()))
    df = warc.read_warc(spark, str(tmp_path), record_types=None)
    got = {r["warc_type"] for r in df.collect()}
    assert got == {"warcinfo", "request", "response"}
    # non-HTTP payloads keep null status and the raw block
    info = df.filter(F.col("warc_type") == "warcinfo").first()
    assert info["http_status"] is None
    assert bytes(info["payload"]) == b"software: gdc-spark\r\n"


def test_read_warc_accepts_stdlib_gzip(spark, tmp_path):
    # single-member whole-file gzip (not member-per-record) must also parse
    (tmp_path / "c.warc.gz").write_bytes(
        gzip.compress(b"".join(_sample_records()))
    )
    df = warc.read_warc(spark, str(tmp_path), record_types=None)
    assert df.count() == 3


def test_synthetic_warc_roundtrip_recovers_text(spark, sf_dir):
    from graph_db_clustering_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    shards = warc.synthetic_warc_from_documents(docs, "doc_id", "text")
    recs = warc.parse_warc_records(shards)
    back = recs.select(
        F.regexp_extract("target_uri", r"/doc/(\d+)$", 1)
        .cast("long")
        .alias("doc_id"),
        text_ops.html_text_expr(F.col("payload").cast("string")).alias("t"),
    )
    norm = F.trim(F.regexp_replace(F.col("text"), r"[ \t\n\r\f]+", " "))
    joined = docs.select("doc_id", norm.alias("want")).join(back, "doc_id")
    assert joined.count() == 40
    assert joined.filter(F.col("want") != F.col("t")).count() == 0


HTML_CASES = [
    ("<p>a</p><p>b</p>", "a\nb"),
    ("x<br>y", "x\ny"),
    ("<script>if (1<2) alert('&');</script>hi", "hi"),
    ("<style>p  {color: red}</style>ok", "ok"),
    ("<!-- <p>not text</p> -->z", "z"),
    ("<div class='a'>c</div>", "c"),
    ("&lt;tag&gt; &amp; &quot;q&quot; &#39;s&#39; &nbsp;", "<tag> & \"q\" 's'"),
    ("a   b\t\tc", "a b c"),
    ("<p>a</p>\n\n\n<p>b</p>", "a\nb"),
    ("plain text stays", "plain text stays"),
    # &amp;lt; must decode to the literal string "&lt;", not "<"
    ("&amp;lt;", "&lt;"),
]


@pytest.mark.parametrize("html,want", HTML_CASES)
def test_html_text_expr_cases(spark, html, want):
    got = (
        spark.createDataFrame([(html,)], "h string")
        .select(text_ops.html_text_expr(F.col("h")).alias("t"))
        .first()["t"]
    )
    assert got == want


def test_commented_out_script_does_not_eat_visible_text(spark):
    """Comments strip before the script pass: a commented-out <script>
    opener must not arm the script regex through the next real
    </script> (review finding)."""
    html = "<!-- <script> -->visible<script>x=1;</script>after"
    got = (
        spark.createDataFrame([(html,)], "h string")
        .select(text_ops.html_text_expr(F.col("h")).alias("t"))
        .first()["t"]
    )
    assert got == "visible after"
