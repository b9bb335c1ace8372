"""Pure-Python Avro object-container source (sources/avro)."""

import numpy as np  # noqa: F401
import pytest
from pyspark.sql import functions as F

from graph_db_clustering_spark.sources import avro

SCHEMA = {
    "type": "record",
    "name": "Doc",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "score", "type": "double"},
        {"name": "ratio", "type": "float"},
        {"name": "n", "type": "int"},
        {"name": "ok", "type": "boolean"},
        {"name": "name", "type": "string"},
        {"name": "blob", "type": "bytes"},
        {"name": "opt", "type": ["null", "string"]},
    ],
}

ROWS = [
    {"id": 1, "score": 1.5, "ratio": 0.25, "n": -7, "ok": True,
     "name": "alpha", "blob": b"\x00\xff", "opt": "x"},
    {"id": -12345678901, "score": -2.25, "ratio": 2.0, "n": 0, "ok": False,
     "name": "βeta", "blob": b"", "opt": None},
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip_all_primitives(codec):
    blob = avro.encode_container(SCHEMA, ROWS, codec=codec)
    fields, rows = avro.decode_container(blob)
    assert [f[0] for f in fields] == [f["name"] for f in SCHEMA["fields"]]
    assert len(rows) == 2
    for got, want in zip(rows, ROWS):
        for k, v in want.items():
            if isinstance(v, float):
                assert got[k] == pytest.approx(v)
            else:
                assert got[k] == v


def test_zigzag_varint_edge_values():
    for v in (0, 1, -1, 63, -64, 2**31 - 1, -(2**31), 2**62, -(2**62)):
        enc = avro._write_varint(v)
        dec, pos = avro._read_varint(enc, 0)
        assert (dec, pos) == (v, len(enc))


def test_gates():
    with pytest.raises(avro.AvroError, match="magic"):
        avro.decode_container(b"NOPE")
    with pytest.raises(NotImplementedError, match="snappy"):
        avro.decode_container(
            avro.encode_container(SCHEMA, [], codec="deflate").replace(
                b"deflate", b"snappy\x00"
            )
        )
    nested = {"type": "record", "name": "X",
              "fields": [{"name": "a", "type": {"type": "array", "items": "int"}}]}
    with pytest.raises(NotImplementedError, match="complex"):
        avro.parse_schema(nested)
    with pytest.raises(avro.AvroError, match="non-nullable"):
        avro.encode_container(SCHEMA, [{**ROWS[0], "id": None}])


def test_read_avro_distributed(spark, tmp_path):
    for i in range(3):
        rows = [{**ROWS[0], "id": i * 10 + j} for j in range(4)]
        (tmp_path / f"part-{i}.avro").write_bytes(
            avro.encode_container(SCHEMA, rows)
        )
    df = avro.read_avro(spark, str(tmp_path))
    assert df.count() == 12
    assert df.schema["id"].dataType.typeName() == "long"
    assert df.schema["ratio"].dataType.typeName() == "float"
    got = sorted(r.id for r in df.collect())
    assert got == sorted(i * 10 + j for i in range(3) for j in range(4))
    row = df.filter(F.col("id") == 1).first()
    assert row.name == "alpha" and bytes(row.blob) == b"\x00\xff"


def test_read_avro_schema_mismatch_fails_loudly(spark, tmp_path):
    (tmp_path / "a.avro").write_bytes(avro.encode_container(SCHEMA, ROWS[:1]))
    other = {"type": "record", "name": "Y",
             "fields": [{"name": "zzz", "type": "long"}]}
    (tmp_path / "b.avro").write_bytes(avro.encode_container(other, [{"zzz": 1}]))
    with pytest.raises(Exception, match="differ from the expected"):
        avro.read_avro(spark, str(tmp_path)).collect()


def test_empty_directory_raises(spark, tmp_path):
    (tmp_path / "x.txt").write_text("no avro here")
    with pytest.raises(avro.AvroError, match="no avro files"):
        avro.read_avro(spark, str(tmp_path))


def test_null_second_union_honors_branch_order():
    """[T, "null"] is legal Avro: index 0 is the VALUE branch. Both the
    encoder and decoder must honor the declared order (review finding:
    assuming index 0 = null silently corrupts such files)."""
    schema = {"type": "record", "name": "U",
              "fields": [{"name": "a", "type": ["string", "null"]},
                         {"name": "b", "type": "long"}]}
    rows = [{"a": "x", "b": 1}, {"a": None, "b": 2}]
    blob = avro.encode_container(schema, rows)
    fields, got = avro.decode_container(blob)
    assert fields[0] == ("a", "string", 1)  # null is branch 1
    assert got == rows
    # wire check: present value must carry union index 0 (varint 0x00)
    raw = avro.encode_container(schema, [{"a": "z", "b": 0}], codec="null")
    assert b"\x00\x02z" in raw  # idx 0, len 1, 'z'


def test_nullable_long_preserves_precision_past_2_53(spark, tmp_path):
    """A null beside a value > 2^53 in a nullable long column must not
    round-trip through float64 (review finding)."""
    schema = {"type": "record", "name": "B",
              "fields": [{"name": "v", "type": ["null", "long"]}]}
    big = 2**60 + 1
    (tmp_path / "x.avro").write_bytes(
        avro.encode_container(schema, [{"v": None}, {"v": big}])
    )
    got = sorted(
        [(r.v,) for r in avro.read_avro(spark, str(tmp_path)).collect()],
        key=lambda t: (t[0] is not None, t[0] or 0),
    )
    assert got == [(None,), (big,)]
