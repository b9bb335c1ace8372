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


def test_image_probe_all_containers(spark):
    from graph_db_clustering_spark.functions import gif, png
    from graph_db_clustering_spark.operators import multimodal as M
    from tests.test_jpeg import make_gray_jpeg

    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    rng = np.random.default_rng(5)
    cases = {
        1: (bytearray(make_gray_jpeg([np.zeros((8, 8), np.int32)] * 2, w_blocks=2)),
            ("jpeg", 16, 8)),
        2: (bytearray(png.encode(rng.integers(0, 256, (3, 5, 3), dtype=np.uint8))),
            ("png", 5, 3)),
        3: (bytearray(gif.encode([np.zeros((4, 6), np.uint8)], pal)), ("gif", 6, 4)),
        4: (bytearray(make_bmp(rng.integers(0, 256, (2, 7, 3), dtype=np.uint8))),
            ("bmp", 7, 2)),
        5: (bytearray(b"P6 9 2 255\n" + bytes(9 * 2 * 3)), ("pnm", 9, 2)),
        6: (bytearray(b"\x00" * 20), ("unknown", None, None)),
    }
    df = spark.createDataFrame(
        [(k, v[0]) for k, v in cases.items()], "image_id long, content binary"
    )
    got = {r.id: (r.container, r.width, r.height) for r in M.image_probe(df).collect()}
    assert got == {k: v[1] for k, v in cases.items()}


class TestTiff:
    def test_gray_roundtrip(self):
        rng = np.random.default_rng(10)
        img = rng.integers(0, 256, (5, 7), dtype=np.uint8)
        assert np.array_equal(
            simple_images.decode_tiff(simple_images.encode_tiff(img)), img
        )

    def test_rgb_multi_strip_deflate_and_packbits(self):
        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, (9, 4, 3), dtype=np.uint8)
        for comp in (1, 8, 32773):
            data = simple_images.encode_tiff(img, compression=comp, rows_per_strip=2)
            got = simple_images.decode_tiff(data)
            assert np.array_equal(got, img), comp

    def test_16bit_and_big_endian_reject_lzw(self):
        rng = np.random.default_rng(12)
        img16 = rng.integers(0, 65536, (3, 6)).astype(np.uint16)
        got = simple_images.decode_tiff(simple_images.encode_tiff(img16))
        assert got.dtype == np.uint16
        assert np.array_equal(got, img16)
        data = bytearray(simple_images.encode_tiff(np.zeros((2, 2), np.uint8)))
        # flip compression tag (259) value to 7 (JPEG-in-TIFF, still gated)
        i = 8 + 2
        while True:
            tag = int.from_bytes(data[i : i + 2], "little")
            if tag == 259:
                data[i + 8 : i + 10] = (7).to_bytes(2, "little")
                break
            i += 12
        with pytest.raises(NotImplementedError, match="compression 7"):
            simple_images.decode_tiff(bytes(data))

    def test_white_is_zero_inverts(self):
        img = np.array([[0, 255]], dtype=np.uint8)
        data = bytearray(simple_images.encode_tiff(img))
        i = 8 + 2
        while True:
            tag = int.from_bytes(data[i : i + 2], "little")
            if tag == 262:
                data[i + 8 : i + 10] = (0).to_bytes(2, "little")  # WhiteIsZero
                break
            i += 12
        got = simple_images.decode_tiff(bytes(data))
        assert got.tolist() == [[255, 0]]

    def test_not_a_tiff(self):
        with pytest.raises(ValueError, match="magic"):
            simple_images.decode_tiff(b"nope")


def test_tiff_through_image_features(spark):
    from graph_db_clustering_spark.operators.multimodal import image_features

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (6, 6), dtype=np.uint8)
    rows = [(1, bytearray(simple_images.encode_tiff(img)), (6, 6, 1, "tiff"))]
    df = spark.createDataFrame(
        rows,
        "image_id long, content binary, "
        "meta struct<height:int,width:int,channels:int,format:string>",
    )
    out = image_features(df, resize_to=None).collect()[0]
    assert abs(out["mean"] - float(img.mean())) < 1e-9


def test_image_probe_tiff_headers_only(spark):
    from graph_db_clustering_spark.operators import multimodal as M

    data = bytearray(simple_images.encode_tiff(np.zeros((3, 9), np.uint8)))
    assert M._image_probe_one(bytes(data)) == ("tiff", 9, 3)
    # truncate the strip data: a headers-only probe must still answer
    assert M._image_probe_one(bytes(data[:-10])) == ("tiff", 9, 3)


def test_tiff_lzw_roundtrip_and_width_growth():
    """TIFF LZW (compression 5): random data forces the 9->12-bit width
    walk and the 4094-code clear reset; repetitive data exercises long
    matches and the prev+prev[:1] self-reference case."""
    rng = np.random.default_rng(21)
    for raw in (
        rng.integers(0, 256, 9000, dtype=np.uint8).tobytes(),
        b"abcabcabd" * 2000,
        rng.integers(0, 4, 30000, dtype=np.uint8).tobytes(),
        b"",
        b"\x00",
    ):
        assert simple_images._lzw_tiff_decode(
            simple_images._lzw_tiff_encode(raw)
        ) == raw
    img = rng.integers(0, 256, (40, 30, 3), dtype=np.uint8)
    data = simple_images.encode_tiff(img, compression=5, rows_per_strip=7)
    assert np.array_equal(simple_images.decode_tiff(data), img)
    # smaller than raw on repetitive images
    flat = np.zeros((64, 64), np.uint8)
    assert len(simple_images.encode_tiff(flat, compression=5)) < 64 * 64 // 4


def _hand_tiff(entries, payload, extra=b""):
    """Handcraft a little-endian TIFF: header + IFD + extra arrays +
    strip payload. entries: (tag, type, count, value_or_offset)."""
    out = bytearray(b"II*\x00" + struct.pack("<I", 8))
    out += struct.pack("<H", len(entries))
    for tag, typ, count, val in sorted(entries):
        out += struct.pack("<HHI", tag, typ, count)
        out += struct.pack("<I", val) if typ == 4 else struct.pack("<HH", val, 0)
    out += struct.pack("<I", 0)
    out += extra
    out += payload
    return bytes(out)


def test_tiff_horizontal_predictor():
    """Predictor 2 (horizontal differencing) must un-difference — LZW
    and deflate TIFFs set it routinely (review finding: it was silently
    ignored)."""
    img = np.array([[10, 15, 12], [200, 180, 250]], dtype=np.uint8)
    diffed = np.diff(
        np.concatenate([np.zeros((2, 1), np.int64), img.astype(np.int64)], axis=1),
        axis=1,
    ) % 256
    payload = diffed.astype(np.uint8).tobytes()
    hdr_len = 8 + 2 + 9 * 12 + 4
    entries = [
        (256, 4, 1, 3), (257, 4, 1, 2), (258, 3, 1, 8), (259, 3, 1, 1),
        (262, 3, 1, 1), (273, 4, 1, hdr_len), (277, 3, 1, 1),
        (279, 4, 1, len(payload)), (317, 3, 1, 2),
    ]
    got = simple_images.decode_tiff(_hand_tiff(entries, payload))
    assert np.array_equal(got, img)


def test_tiff_palette_photometric():
    """Photometric 3: indices map through the 16-bit ColorMap."""
    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    # 8-bit palette image: ColorMap = 3 * 256 SHORTs
    cmap = np.zeros((3, 256), dtype=np.uint16)
    cmap[:, 0] = (0xFF00, 0x0000, 0x0000)  # index 0 -> red
    cmap[:, 1] = (0x0000, 0xFF00, 0x0000)  # index 1 -> green
    cm_bytes = cmap.astype("<u2").tobytes()
    hdr_len = 8 + 2 + 9 * 12 + 4
    entries = [
        (256, 4, 1, 2), (257, 4, 1, 2), (258, 3, 1, 8), (259, 3, 1, 1),
        (262, 3, 1, 3), (273, 4, 1, hdr_len + len(cm_bytes)), (277, 3, 1, 1),
        (279, 4, 1, 4), (320, 3, 768, hdr_len),
    ]
    got = simple_images.decode_tiff(
        _hand_tiff(entries, idx.tobytes(), extra=cm_bytes)
    )
    want = np.zeros((2, 2, 3), np.uint8)
    want[idx == 0] = (255, 0, 0)
    want[idx == 1] = (0, 255, 0)
    assert np.array_equal(got, want)
