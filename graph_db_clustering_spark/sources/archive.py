"""Archive sources: ZIP and TAR(.gz) members as distributed rows.

Crawl dumps, dataset releases, and scraped-site exports ship as
archives; both formats decode with the stdlib (zipfile/tarfile), so no
gate is needed. The ARCHIVE is the unit of parallelism (binaryFile +
mapInPandas — the WARC/Avro discipline): each task opens its own
archives from the bytes it already holds and emits one row per member
(archive, name, size, content). Member filtering happens inside the
parser (suffix match) so unwanted members never materialize as rows.

Encrypted ZIP members raise a clear ValueError; everything else in the
two formats is plain stdlib decoding.
"""

from __future__ import annotations

import gzip
import io
import tarfile
import zipfile
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (parity with sibling sources)
from pyspark.sql import types as T

from graph_db_clustering_spark.sources.files import read_binary_dir

MEMBER_SCHEMA = T.StructType(
    [
        T.StructField("archive", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("size", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def _zip_members(blob: bytes, suffix: str | None):
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        for info in zf.infolist():
            if info.is_dir():
                continue
            if suffix and not info.filename.endswith(suffix):
                continue
            if info.flag_bits & 0x1:
                raise ValueError(
                    f"zip member {info.filename!r} is encrypted; "
                    "extraction needs the password"
                )
            yield info.filename, zf.read(info)


def _tar_members(blob: bytes, suffix: str | None):
    # r:* sniffs plain/gz/bz2/xz — all stdlib
    with tarfile.open(fileobj=io.BytesIO(blob), mode="r:*") as tf:
        for m in tf:
            if not m.isfile():
                continue
            if suffix and not m.name.endswith(suffix):
                continue
            f = tf.extractfile(m)
            yield m.name, f.read() if f else b""


def parse_archives(binaries: DataFrame, member_suffix: str | None = None) -> DataFrame:
    """DataFrame(path, content) of archive files -> one row per member.
    ZIP sniffs on the PK magic; anything else goes through tarfile's
    format/compression sniffing."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {f.name: [] for f in MEMBER_SCHEMA.fields}
            for fpath, content in zip(pdf["path"], pdf["content"]):
                blob = bytes(content)
                arc = fpath.rsplit("/", 1)[-1]
                # real ZIP magics only: a plain tar whose first member
                # name starts with 'PK' must still route to tarfile
                is_zip = blob[:4] in (b"PK\x03\x04", b"PK\x05\x06", b"PK\x07\x08")
                members = (
                    _zip_members(blob, member_suffix)
                    if is_zip
                    else _tar_members(blob, member_suffix)
                )
                try:
                    for name, data in members:
                        rows["archive"].append(arc)
                        rows["name"].append(name)
                        rows["size"].append(len(data))
                        rows["content"].append(data)
                except (
                    zipfile.BadZipFile,
                    tarfile.TarError,
                    EOFError,
                    zlib.error,  # corrupt deflate bytes inside a member
                    gzip.BadGzipFile,  # corrupt gzip body in a .tar.gz
                ) as e:
                    raise ValueError(f"archive {arc!r} is corrupt: {e!r}")
            yield pd.DataFrame(rows)

    return binaries.mapInPandas(parse, MEMBER_SCHEMA)


def read_archive(
    spark: SparkSession,
    path: str,
    glob: str = "*.{zip,tar,tar.gz,tgz}",
    member_suffix: str | None = None,
) -> DataFrame:
    """Directory of archives -> member rows, one task per archive."""
    return parse_archives(
        read_binary_dir(spark, path, glob=glob), member_suffix=member_suffix
    )
