"""Pure-Python Snappy block codec (functions/snappy).

The hand-built bitstreams below come straight from the public format
description (varint preamble; 00/01/10/11 tags), NOT from our own
compressor — so they pin the decoder against the spec independently
of compress/decompress self-consistency.
"""

import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from graph_db_clustering_spark.functions import snappy


# --- hand-built bitstreams (spec-derived, compressor-independent) ----------


def test_literal_only_stream():
    # preamble 3, tag (3-1)<<2 = 0x08 (literal len 3), "abc"
    assert snappy.decompress(b"\x03\x08abc") == b"abc"


def test_long_literal_one_byte_length():
    # len 100 -> tag 60<<2 = 0xF0, then (100-1) as one byte
    payload = bytes(range(100))
    assert snappy.decompress(b"\x64\xf0\x63" + payload) == payload


def test_copy_1byte_offset_rle():
    # "a" then copy(offset=1, len=8): tag 01 | (8-4)<<2 | (0<<5) = 0x11,
    # offset byte 0x01 -> "a"*9 (overlapping copy == RLE)
    blob = b"\x09" + b"\x00a" + b"\x11\x01"
    assert snappy.decompress(blob) == b"a" * 9


def test_copy_2byte_offset():
    # "abcd" + copy(offset=4, len=4): tag 10 | (4-1)<<2 = 0x0e, offset LE
    blob = b"\x08" + b"\x0cabcd" + b"\x0e\x04\x00"
    assert snappy.decompress(blob) == b"abcdabcd"


def test_copy_4byte_offset():
    blob = b"\x08" + b"\x0cabcd" + b"\x0f\x04\x00\x00\x00"
    assert snappy.decompress(blob) == b"abcdabcd"


def test_overlapping_copy_period_three():
    # "abc" then copy(offset=3, len=7): tag 10 | (7-1)<<2 = 0x1a
    blob = b"\x0a" + b"\x08abc" + b"\x1a\x03\x00"
    assert snappy.decompress(blob) == b"abcabcabca"


def test_empty_input():
    assert snappy.decompress(b"\x00") == b""
    assert snappy.decompress(snappy.compress(b"")) == b""


# --- controlled failure on corrupt input -----------------------------------


def test_corrupt_inputs_raise():
    with pytest.raises(snappy.SnappyError, match="varint"):
        snappy.decompress(b"")
    with pytest.raises(snappy.SnappyError, match="offset 0"):
        snappy.decompress(b"\x04\x00a\x0e\x00\x00")
    with pytest.raises(snappy.SnappyError, match="before output start"):
        snappy.decompress(b"\x05\x00a\x0e\x09\x00")
    with pytest.raises(snappy.SnappyError, match="truncated literal body"):
        snappy.decompress(b"\x05\x10ab")  # claims len 5, two bytes present
    with pytest.raises(snappy.SnappyError, match="preamble said"):
        snappy.decompress(b"\x09\x08abc")  # stream ends 6 bytes short


# --- roundtrip properties ---------------------------------------------------


@given(st.binary(max_size=4096))
@settings(max_examples=200, deadline=None)
def test_roundtrip_random(data):
    assert snappy.decompress(snappy.compress(data)) == data


@given(
    st.binary(min_size=1, max_size=8),
    st.integers(min_value=1, max_value=2000),
)
@settings(max_examples=50, deadline=None)
def test_roundtrip_repetitive_compresses(unit, reps):
    data = unit * reps
    comp = snappy.compress(data)
    assert snappy.decompress(comp) == data
    if len(data) > 256:
        assert len(comp) < len(data)  # RLE path actually engages


def test_roundtrip_large_structured():
    # parquet-footer-ish: long runs + embedded distinct strings
    data = (b"x" * 100000 + b"HEADER" + bytes(range(256)) * 64) * 3
    comp = snappy.compress(data)
    assert snappy.decompress(comp) == data
    assert len(comp) < len(data) // 10


# --- the Avro integration ---------------------------------------------------


def test_avro_snappy_container_roundtrip():
    from graph_db_clustering_spark.sources import avro

    schema = {
        "type": "record",
        "name": "Doc",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "text", "type": "string"},
        ],
    }
    rows = [{"id": i, "text": "the quick brown fox " * 5} for i in range(50)]
    blob = avro.encode_container(schema, rows, codec="snappy")
    fields, got = avro.decode_container(blob)
    assert got == rows
    # the CRC32 trailer is verified: flip one body byte
    bad = bytearray(blob)
    bad[-30] ^= 0xFF
    with pytest.raises(avro.AvroError, match="snappy|CRC|corrupt"):
        avro.decode_container(bytes(bad))
