"""WARC (Web ARChive, ISO 28500) source — the Common Crawl ingest path.

The reference has no web-scale ingestion at all (its only source is a
driver-side directory listing, image_classification.py:57-75); a training
-data pipeline at 100 TB starts from WARC shards, so this source is part
of the north-star scope rather than reference parity.

Scale posture: the WARC FILE is the unit of parallelism — exactly how
real Common Crawl jobs shard (one ~1 GB ``*.warc.gz`` per task, ~64k
files per crawl). ``binaryFile`` lists and reads the shards in tasks and
a ``mapInPandas`` parser emits one row per record where the bytes were
read; nothing transits the driver. Gzipped WARCs are *member-per-record*
(the Common Crawl layout), so parsing is a streaming
``zlib.decompressobj`` loop over members — no whole-file decompression
buffer. Record payloads are the distributed ``payload: binary`` column;
downstream HTML text extraction (operators/text.html_text_expr) runs as
codegen regexp chains on the executors.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from graph_db_clustering_spark.sources.files import read_binary_dir

_GZIP_MAGIC = b"\x1f\x8b"

WARC_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("http_content_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def _gzip_members(blob: bytes) -> Iterator[bytes]:
    """Iterate the decompressed payload of each gzip member in `blob`.

    Common Crawl WARCs are a *concatenation* of gzip members, one WARC
    record each, precisely so readers can split on member boundaries;
    ``zlib.decompressobj(wbits=31)`` stops at each member's end and hands
    back the remainder in ``unused_data``."""
    rest = blob
    while rest[:2] == _GZIP_MAGIC:
        d = zlib.decompressobj(wbits=31)
        out = d.decompress(rest)
        if not d.eof:
            raise ValueError("warc: truncated gzip member")
        yield out
        rest = d.unused_data
    if rest.strip(b"\r\n"):
        raise ValueError("warc: trailing non-gzip bytes after last member")


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
                "latin-1"
            )
    return headers


def _records_in(chunk: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """Yield (warc_headers, raw_block) for each record in a plain-WARC
    byte chunk (one record for a Common Crawl gzip member; many for an
    uncompressed ``.warc``). Record framing per ISO 28500: version line,
    CRLF header lines, CRLF CRLF, Content-Length payload bytes,
    CRLF CRLF separator."""
    pos = 0
    n = len(chunk)
    while pos < n:
        # tolerate inter-record padding
        while pos < n and chunk[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            return
        if not chunk[pos : pos + 5] == b"WARC/":
            raise ValueError(
                f"warc: expected record header at offset {pos}, "
                f"got {chunk[pos : pos + 16]!r}"
            )
        hdr_end = chunk.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError("warc: truncated record header")
        headers = _parse_headers(chunk[pos:hdr_end])
        if "content-length" not in headers:
            raise ValueError("warc: record missing Content-Length header")
        length = int(headers["content-length"])
        body_start = hdr_end + 4
        if body_start + length > n:
            # mirror the gzip path's truncated-member error: a cut-off
            # shard must fail loudly, not yield a silently short record
            raise ValueError(
                f"warc: truncated record body (Content-Length {length}, "
                f"only {n - body_start} bytes remain)"
            )
        yield headers, chunk[body_start : body_start + length]
        pos = body_start + length


def _split_http(block: bytes) -> tuple[int | None, str | None, bytes]:
    """HTTP response message -> (status, content-type, body). Returns
    (None, None, block) when the block is not an HTTP message."""
    if not block.startswith(b"HTTP/"):
        return None, None, block
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        return None, None, block
    head = block[:sep]
    status_line = head.split(b"\r\n", 1)[0].split()
    status = int(status_line[1]) if len(status_line) > 1 else None
    http_headers = _parse_headers(head)
    return status, http_headers.get("content-type"), block[sep + 4 :]


def parse_warc_records(
    binaries: DataFrame, record_types: tuple[str, ...] | None = ("response",)
) -> DataFrame:
    """DataFrame(path, content: binary) of WARC files -> one row per
    record. ``record_types`` filters inside the parser (warcinfo/request/
    metadata records are skipped before any row is materialized — the
    parser-side analog of predicate pushdown); None keeps every type.

    HTTP response payloads are split: ``http_status`` /
    ``http_content_type`` come from the HTTP head, ``payload`` is the
    entity body (the HTML a text pipeline wants)."""
    wanted = {t.lower() for t in record_types} if record_types else None

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {f.name: [] for f in WARC_SCHEMA.fields}
            for fpath, content in zip(pdf["path"], pdf["content"]):
                blob = bytes(content)
                chunks = (
                    _gzip_members(blob)
                    if blob[:2] == _GZIP_MAGIC
                    else iter((blob,))
                )
                for chunk in chunks:
                    for headers, block in _records_in(chunk):
                        wtype = headers.get("warc-type", "")
                        if wanted is not None and wtype.lower() not in wanted:
                            continue
                        status, http_ct, body = _split_http(block)
                        rows["warc_file"].append(fpath.rsplit("/", 1)[-1])
                        rows["record_id"].append(headers.get("warc-record-id"))
                        rows["warc_type"].append(wtype)
                        rows["target_uri"].append(
                            headers.get("warc-target-uri")
                        )
                        rows["warc_date"].append(headers.get("warc-date"))
                        rows["content_type"].append(headers.get("content-type"))
                        rows["http_status"].append(status)
                        rows["http_content_type"].append(http_ct)
                        rows["payload"].append(body)
            yield pd.DataFrame(rows)

    return binaries.mapInPandas(parse, WARC_SCHEMA)


def read_warc(
    spark: SparkSession,
    path: str,
    glob: str = "*.warc*",
    record_types: tuple[str, ...] | None = ("response",),
) -> DataFrame:
    """Directory of ``.warc`` / ``.warc.gz`` shards -> record DataFrame.

    One task per shard (binaryFile's natural split), parse where read."""
    return parse_warc_records(
        read_binary_dir(spark, path, glob=glob), record_types=record_types
    )


# ---------------------------------------------------------------------------
# WARC construction — the write side (fixtures, re-sharding, archival sinks)
# ---------------------------------------------------------------------------


def build_record(
    warc_type: str,
    payload: bytes,
    target_uri: str | None = None,
    record_id: str | None = None,
    date: str = "2026-01-01T00:00:00Z",
    content_type: str = "application/http; msgtype=response",
) -> bytes:
    """Serialize one ISO 28500 record (CRLF framing, Content-Length)."""
    headers = [
        ("WARC-Type", warc_type),
        ("WARC-Date", date),
        ("WARC-Record-ID", record_id or f"<urn:uuid:{warc_type}-0>"),
        ("Content-Length", str(len(payload))),
        ("Content-Type", content_type),
    ]
    if target_uri is not None:
        headers.insert(3, ("WARC-Target-URI", target_uri))
    head = b"WARC/1.0\r\n" + b"".join(
        f"{k}: {v}\r\n".encode() for k, v in headers
    )
    return head + b"\r\n" + payload + b"\r\n\r\n"


def http_response(body: bytes, content_type: str = "text/html") -> bytes:
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: "
        + content_type.encode()
        + b"\r\nContent-Length: "
        + str(len(body)).encode()
        + b"\r\n\r\n"
        + body
    )


def gzip_member(chunk: bytes) -> bytes:
    """One gzip member per record — the Common Crawl shard layout."""
    c = zlib.compressobj(6, zlib.DEFLATED, 31)
    return c.compress(chunk) + c.flush()


def synthetic_warc_from_documents(
    docs: DataFrame, id_col: str, text_col: str, n_shards: int = 50
) -> DataFrame:
    """Documents -> DataFrame(path, content) of in-memory ``.warc.gz``
    shards (one gzip member per response record, HTML-wrapped bodies,
    doc id in the target URI) — deterministic input for the WARC path
    without touching disk, the synthetic_gifs_from_documents pattern
    (operators/multimodal). Shard assignment is id-hash based so the
    output is partitioning-invariant. ``n_shards`` is the shard COUNT
    (pmod modulus) — size it so corpus_rows / n_shards stays a sane
    per-blob row count (each shard materializes as one Arrow row)."""
    out_schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    shards = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        (F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))).alias("shard"),
    ).repartition("shard")

    def build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        members = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            esc = (
                str(text)
                .replace("&", "&amp;")
                .replace("<", "&lt;")
                .replace(">", "&gt;")
            )
            html = (
                "<html><head><title>d</title><script>var x=1;</script>"
                "</head><body><!-- boiler --><p>" + esc + "</p></body></html>"
            ).encode()
            rec = build_record(
                "response",
                http_response(html),
                target_uri=f"https://corpus.example/doc/{int(doc_id)}",
                record_id=f"<urn:uuid:doc-{int(doc_id)}>",
            )
            members.append(gzip_member(rec))
        return pd.DataFrame(
            {
                "path": [f"shard-{int(key[0]):05d}.warc.gz"],
                "content": [b"".join(members)],
            }
        )

    return shards.groupBy("shard").applyInPandas(build, out_schema)
