"""Archive sources (sources/archive): ZIP and TAR(.gz) members."""

import io
import tarfile
import zipfile

import pytest
from pyspark.sql import functions as F

from graph_db_clustering_spark.sources import archive


def _zip_bytes(members: dict) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in members.items():
            zf.writestr(name, data)
    return buf.getvalue()


def _tgz_bytes(members: dict) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tf:
        for name, data in members.items():
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


MEMBERS = {"a/doc1.txt": b"alpha", "a/doc2.txt": b"beta", "img.bin": b"\x00\xff"}


def test_zip_and_tgz_members(spark, tmp_path):
    (tmp_path / "x.zip").write_bytes(_zip_bytes(MEMBERS))
    (tmp_path / "y.tar.gz").write_bytes(_tgz_bytes(MEMBERS))
    df = archive.read_archive(spark, str(tmp_path), glob="*")
    got = {
        (r.archive, r.name): bytes(r.content) for r in df.collect()
    }
    assert len(got) == 6
    for arc in ("x.zip", "y.tar.gz"):
        for name, data in MEMBERS.items():
            assert got[(arc, name)] == data


def test_member_suffix_filter(spark, tmp_path):
    (tmp_path / "x.zip").write_bytes(_zip_bytes(MEMBERS))
    df = archive.read_archive(spark, str(tmp_path), glob="*", member_suffix=".txt")
    assert sorted(r.name for r in df.collect()) == ["a/doc1.txt", "a/doc2.txt"]


def test_encrypted_zip_member_raises(spark, tmp_path):
    data = bytearray(_zip_bytes({"s.txt": b"secret"}))
    # set the encryption flag bit in the local file header (offset 6)
    i = data.find(b"PK\x03\x04")
    data[i + 6] |= 0x1
    # and in the central directory entry (offset 8)
    j = data.find(b"PK\x01\x02")
    data[j + 8] |= 0x1
    (tmp_path / "enc.zip").write_bytes(bytes(data))
    with pytest.raises(Exception, match="encrypted"):
        archive.read_archive(spark, str(tmp_path), glob="*").collect()


def test_corrupt_archive_fails_controlled(spark, tmp_path):
    (tmp_path / "bad.zip").write_bytes(b"PK\x03\x04" + b"\x00" * 20)
    with pytest.raises(Exception, match="corrupt"):
        archive.read_archive(spark, str(tmp_path), glob="*").collect()
