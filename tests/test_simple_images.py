"""BMP + binary Netpbm decoders (functions/simple_images) and their
still-image dispatch."""

import struct

import numpy as np
import pytest

from graph_db_clustering_spark.functions import simple_images


def make_bmp(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    pix = rows.tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 0, 0, 0, 0)
    off = 14 + len(info)
    head = b"BM" + struct.pack("<IHHI", off + len(pix), 0, 0, off)
    return head + info + pix


def test_bmp_roundtrip_exact():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)  # stride padding
    assert np.array_equal(simple_images.decode_bmp(make_bmp(img)), img)


def test_bmp_gates():
    with pytest.raises(ValueError, match="BM"):
        simple_images.decode_bmp(b"XX")
    data = bytearray(make_bmp(np.zeros((2, 2, 3), np.uint8)))
    data[28:30] = struct.pack("<H", 8)  # bpp=8
    with pytest.raises(NotImplementedError, match="24-bit"):
        simple_images.decode_bmp(bytes(data))


def test_pgm_with_comments():
    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    data = b"P5\n# a comment\n4 3\n# another\n255\n" + img.tobytes()
    assert np.array_equal(simple_images.decode_pnm(data), img)


def test_ppm_color_and_16bit():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (4, 5, 3), dtype=np.uint8)
    data = b"P6 5 4 255\n" + img.tobytes()
    assert np.array_equal(simple_images.decode_pnm(data), img)
    img16 = rng.integers(0, 65536, (3, 2)).astype(np.uint16)
    data16 = b"P5 2 3 65535\n" + img16.astype(">u2").tobytes()
    got = simple_images.decode_pnm(data16)
    assert got.dtype == np.uint16
    assert np.array_equal(got, img16)


def test_dispatch_through_image_features(spark):
    from graph_db_clustering_spark.operators.multimodal import image_features

    rng = np.random.default_rng(3)
    bmp_img = rng.integers(0, 256, (6, 6, 3), dtype=np.uint8)
    pgm_img = rng.integers(0, 256, (6, 6), dtype=np.uint8)
    rows = [
        (1, bytearray(make_bmp(bmp_img)), (6, 6, 3, "bmp")),
        (2, bytearray(b"P5 6 6 255\n" + pgm_img.tobytes()), (6, 6, 1, "pgm")),
    ]
    df = spark.createDataFrame(
        rows,
        "image_id long, content binary, "
        "meta struct<height:int,width:int,channels:int,format:string>",
    )
    out = {r.id: r for r in image_features(df, resize_to=None).collect()}
    want_bmp = bmp_img.mean(axis=2).astype(np.uint8)
    assert abs(out[1]["mean"] - float(want_bmp.mean())) < 1e-9
    assert abs(out[2]["mean"] - float(pgm_img.mean())) < 1e-9
