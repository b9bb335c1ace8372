"""PNG decoder tests (functions/png): every unfilter branch against the
spec-side encoder, hand-built filtered bytes for the sequential filters,
palette/alpha color types, gates, and the Spark-side decode path."""

import struct
import zlib

import numpy as np
import pytest

from graph_db_clustering_spark.functions import png


def _rng(seed=0):
    return np.random.default_rng(seed)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("shape", [(5, 7), (4, 6, 3), (3, 5, 4)])
def test_roundtrip_each_filter(ftype, shape):
    img = _rng(ftype).integers(0, 256, size=shape, dtype=np.uint8)
    data = png.encode(img, filters=ftype)
    out = png.decode(data)
    assert out.shape == img.shape
    assert np.array_equal(out, img)


def test_roundtrip_mixed_filters_per_row():
    img = _rng(9).integers(0, 256, size=(10, 8, 3), dtype=np.uint8)
    data = png.encode(img, filters=[0, 1, 2, 3, 4, 4, 3, 2, 1, 0])
    assert np.array_equal(png.decode(data), img)


def test_sub_filter_hand_computed():
    """Sub: recon[x] = filt[x] + recon[x-bpp] — 1 channel, one row.
    filtered [5, 10, 250, 10] -> recon [5, 15, 9, 19] (mod 256)."""
    raw = bytes([1, 5, 10, 250, 10])  # filter byte 1 + 4 data bytes
    body = zlib.compress(raw)
    ihdr = struct.pack(">IIBBBBB", 4, 1, 8, 0, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + png._chunk(b"IHDR", ihdr)
        + png._chunk(b"IDAT", body)
        + png._chunk(b"IEND", b"")
    )
    assert png.decode(data).tolist() == [[5, 15, 9, 19]]


def test_paeth_filter_hand_computed():
    """Paeth over two rows, 1 channel: row0 Up-from-zero, row1 Paeth.
    row0 recon = [10, 20]; row1 filtered [1, 2] with predictors
    p(0)=paeth(0,10,0)=10 -> 11; p(1)=paeth(11,20,10)=paeth: p=21,
    pa=10,pb=1,pc=11 -> b=20 -> 22."""
    raw = bytes([2, 10, 20, 4, 1, 2])
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + png._chunk(b"IHDR", ihdr)
        + png._chunk(b"IDAT", zlib.compress(raw))
        + png._chunk(b"IEND", b"")
    )
    assert png.decode(data).tolist() == [[10, 20], [11, 22]]


def test_palette_image():
    """Color type 3: indices map through PLTE to RGB."""
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # red, green, blue
    raw = bytes([0, 0, 1, 2, 0, 2, 1, 0])  # 2 rows x 3 px, filter None
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + png._chunk(b"IHDR", ihdr)
        + png._chunk(b"PLTE", plte)
        + png._chunk(b"IDAT", zlib.compress(raw))
        + png._chunk(b"IEND", b"")
    )
    out = png.decode(data)
    assert out.shape == (2, 3, 3)
    assert out[0].tolist() == [[255, 0, 0], [0, 255, 0], [0, 0, 255]]
    assert out[1].tolist() == [[0, 0, 255], [0, 255, 0], [255, 0, 0]]


def test_gray_alpha_roundtrip():
    img = _rng(3).integers(0, 256, size=(6, 5, 2), dtype=np.uint8)
    data = png.encode(img, color_type=4, filters=2)
    assert np.array_equal(png.decode(data), img)


def test_multiple_idat_chunks():
    """IDAT may be split arbitrarily; the zlib stream spans chunks."""
    img = _rng(4).integers(0, 256, size=(4, 4), dtype=np.uint8)
    data = png.encode(img, filters=1)
    # split the single IDAT into two chunks
    sig, rest = data[:8], data[8:]
    chunks = []
    pos = 0
    while pos < len(rest):
        (length,) = struct.unpack(">I", rest[pos : pos + 4])
        chunks.append((rest[pos + 4 : pos + 8], rest[pos + 8 : pos + 8 + length]))
        pos += 12 + length
    out = sig
    for ctype, body in chunks:
        if ctype == b"IDAT":
            mid = len(body) // 2
            out += png._chunk(b"IDAT", body[:mid]) + png._chunk(b"IDAT", body[mid:])
        else:
            out += png._chunk(ctype, body)
    assert np.array_equal(png.decode(out), img)


@pytest.mark.parametrize("shape", [(8, 8), (9, 7, 3), (3, 5), (1, 1), (2, 10, 4)])
@pytest.mark.parametrize("ftype", [0, 1, 4])
def test_adam7_interlaced_roundtrip(shape, ftype):
    """Adam7: seven independently-filtered reduced images scatter back
    to the original — including sizes where some passes are empty (any
    dimension < 5 skips passes entirely) and non-multiple-of-8 dims."""
    img = _rng(shape[0] * 31 + ftype).integers(0, 256, size=shape, dtype=np.uint8)
    data = png.encode(img, filters=ftype, interlace=True)
    out = png.decode(data)
    assert out.shape == img.shape
    assert np.array_equal(out, img)


def test_adam7_known_pixel_grid():
    """Pass 1 covers exactly the (8k, 8k) pixels: a 16x16 image whose
    pass-1 sub-image is all 255 and everything else 0 must decode with
    255 at (0,0), (0,8), (8,0), (8,8) only."""
    img = np.zeros((16, 16), dtype=np.uint8)
    img[::8, ::8] = 255
    out = png.decode(png.encode(img, interlace=True))
    assert np.array_equal(out, img)


@pytest.mark.parametrize("shape", [(4, 5), (3, 6, 3), (5, 4, 4)])
@pytest.mark.parametrize("ftype", [0, 1, 3, 4])
def test_16bit_roundtrip(shape, ftype):
    """Bit depth 16: filters run over the byte stream at bpp = 2*channels;
    samples reassemble big-endian into uint16."""
    img = _rng(101 + ftype).integers(0, 65536, size=shape, dtype=np.uint16)
    out = png.decode(png.encode(img, filters=ftype))
    assert out.dtype == np.uint16
    assert np.array_equal(out, img)


def test_16bit_interlaced_roundtrip():
    img = _rng(77).integers(0, 65536, size=(9, 7, 3), dtype=np.uint16)
    out = png.decode(png.encode(img, filters=4, interlace=True))
    assert np.array_equal(out, img)


def test_16bit_big_endian_sample_order():
    """A single 16-bit gray pixel 0x1234 must serialize high byte first."""
    img = np.array([[0x1234]], dtype=np.uint16)
    data = png.encode(img)
    idat = b"".join(body for ctype, body in png._chunks(data) if ctype == b"IDAT")
    assert zlib.decompress(idat) == bytes([0, 0x12, 0x34])  # filter 0, hi, lo
    assert png.decode(data)[0, 0] == 0x1234


def test_gates():
    img = np.zeros((2, 2), dtype=np.uint8)
    data = bytearray(png.encode(img))
    with pytest.raises(ValueError, match="bad signature"):
        png.decode(b"notapng" + bytes(data))
    ihdr3 = struct.pack(">IIBBBBB", 2, 2, 3, 0, 0, 0, 0)
    bad3 = (
        b"\x89PNG\r\n\x1a\n"
        + png._chunk(b"IHDR", ihdr3)
        + png._chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="bad bit depth"):
        png.decode(bad3)
    ihdr16p = struct.pack(">IIBBBBB", 2, 2, 16, 3, 0, 0, 0)
    badp = (
        b"\x89PNG\r\n\x1a\n"
        + png._chunk(b"IHDR", ihdr16p)
        + png._chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="16-bit palette"):
        png.decode(badp)


def test_spark_decode_path(spark):
    """PNG bytes flow through the multimodal image_features operator:
    decode happens executor-side inside mapInPandas."""
    from graph_db_clustering_spark.operators.multimodal import image_features

    img = _rng(7).integers(0, 256, size=(8, 8), dtype=np.uint8)
    rows = [(1, bytearray(png.encode(img, filters=4)), (8, 8, 1, "png"))]
    df = spark.createDataFrame(
        rows,
        "image_id long, content binary, "
        "meta struct<height:int,width:int,channels:int,format:string>",
    )
    out = image_features(df, resize_to=None).collect()[0]
    assert abs(out["mean"] - float(img.mean())) < 1e-9
    assert abs(out["std"] - float(img.std())) < 1e-9


@pytest.mark.parametrize("depth", [1, 2, 4])
@pytest.mark.parametrize("ftype", [0, 1, 2, 4])
def test_subbyte_gray_roundtrip(depth, ftype):
    """Bit depths 1/2/4: packed big-endian samples, filters over the
    packed bytes at bpp=1, raw 0..2^d-1 values out."""
    img = _rng(depth * 7 + ftype).integers(0, 1 << depth, size=(6, 11), dtype=np.uint8)
    out = png.decode(png.encode(img, bit_depth=depth, filters=ftype))
    assert out.dtype == np.uint8
    assert np.array_equal(out, img)


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_subbyte_interlaced_roundtrip(depth):
    img = _rng(depth).integers(0, 1 << depth, size=(10, 13), dtype=np.uint8)
    out = png.decode(png.encode(img, bit_depth=depth, interlace=True))
    assert np.array_equal(out, img)


def test_subbyte_palette_decode():
    """2-bit palette image, hand-built: indices 0,1,2,3,0 packed as
    00 01 10 11 | 00 (pad) map through a 4-entry PLTE."""
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
    row = bytes([0, 0b00011011, 0b00000000])
    ihdr = struct.pack(">IIBBBBB", 5, 1, 2, 3, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + png._chunk(b"IHDR", ihdr)
        + png._chunk(b"PLTE", plte)
        + png._chunk(b"IDAT", zlib.compress(row))
        + png._chunk(b"IEND", b"")
    )
    out = png.decode(data)
    assert out.shape == (1, 5, 3)
    assert out[0].tolist() == [
        [255, 0, 0],
        [0, 255, 0],
        [0, 0, 255],
        [9, 9, 9],
        [255, 0, 0],
    ]


def test_subbyte_illegal_color_types():
    ihdr = struct.pack(">IIBBBBB", 2, 2, 4, 2, 0, 0, 0)  # 4-bit RGB: illegal
    bad = (
        b"\x89PNG\r\n\x1a\n"
        + png._chunk(b"IHDR", ihdr)
        + png._chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="only legal for grayscale/palette"):
        png.decode(bad)
    with pytest.raises(ValueError, match="2-D grayscale"):
        png.encode(np.zeros((2, 2, 3), dtype=np.uint8), bit_depth=4)
    with pytest.raises(ValueError, match="exceed"):
        png.encode(np.full((2, 2), 9, dtype=np.uint8), bit_depth=2)
