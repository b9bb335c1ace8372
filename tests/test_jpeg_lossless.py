"""Lossless JPEG (SOF3, T.81 Annex H): hand-built bitstreams decoded
bit-exactly — every predictor, multi-component, 12-bit precision, point
transform, and restart intervals."""

import struct

import numpy as np
import pytest

from graph_db_clustering_spark.functions import jpeg
from tests.test_jpeg import _BitWriter, _category, _codes, _dht, _emit_coef, _seg

# one canonical table covering every lossless category 0..16
L_BITS = [0, 0, 0, 0, 17] + [0] * 11
L_VALS = bytes(range(17))
L_CODES = _codes(L_BITS, L_VALS)


def _predict(plane, x, y, sel, default, restarted):
    if restarted:
        return default
    if y == 0:
        return int(plane[0, x - 1])
    if x == 0:
        return int(plane[y - 1, 0])
    ra, rb, rc = int(plane[y, x - 1]), int(plane[y - 1, x]), int(plane[y - 1, x - 1])
    return {
        1: ra,
        2: rb,
        3: rc,
        4: ra + rb - rc,
        5: ra + ((rb - rc) >> 1),
        6: rb + ((ra - rc) >> 1),
        7: (ra + rb) >> 1,
    }[sel]


def make_lossless_jpeg(
    img: np.ndarray, predictor: int = 1, precision: int = 8,
    restart: int = 0, pt: int = 0,
) -> bytes:
    """Encode img (HxW or HxWxC, ORIGINAL precision values whose low `pt`
    bits are zero) as a SOF3 stream the decoder must invert exactly."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nc = img.shape
    coded = (img.astype(np.int64) >> pt).transpose(2, 0, 1)
    default = 1 << (precision - pt - 1)

    out = bytearray(b"\xff\xd8")
    out += _dht(0, 0, L_BITS, L_VALS)
    sof = bytes([precision]) + struct.pack(">HH", h, w) + bytes([nc])
    for c in range(nc):
        sof += bytes([c + 1, 0x11, 0])
    out += _seg(0xC3, sof)
    if restart:
        out += _seg(0xDD, struct.pack(">H", restart))
    sos = bytes([nc])
    for c in range(nc):
        sos += bytes([c + 1, 0x00])
    sos += bytes([predictor, 0, pt])
    out += _seg(0xDA, sos)

    wtr = _BitWriter()
    restarted = True
    rst = 0
    sample_idx = 0
    for y in range(h):
        for x in range(w):
            if sample_idx and restart and sample_idx % restart == 0:
                out += wtr.tobytes() + bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                wtr = _BitWriter()
                restarted = True
            for c in range(nc):
                px = _predict(coded[c], x, y, predictor, default, restarted)
                d = (int(coded[c, y, x]) - px) & 0xFFFF
                signed = d - 65536 if d >= 32768 else d
                if signed == -32768:
                    code, ln = L_CODES[16]  # category 16: no extra bits
                    wtr.write(code, ln)
                else:
                    s = _category(signed)
                    code, ln = L_CODES[s]
                    wtr.write(code, ln)
                    if s:
                        _emit_coef(wtr, signed, s)
            restarted = False
            sample_idx += 1
    out += wtr.tobytes() + b"\xff\xd9"
    return bytes(out)


@pytest.mark.parametrize("predictor", [1, 2, 3, 4, 5, 6, 7])
def test_every_predictor_roundtrips_exactly(predictor):
    rng = np.random.default_rng(predictor)
    img = rng.integers(0, 256, (9, 7), dtype=np.uint8)
    got = jpeg.decode(make_lossless_jpeg(img, predictor=predictor))
    assert got.dtype == np.uint8
    assert np.array_equal(got, img)


def test_12bit_precision_decodes_to_uint16():
    rng = np.random.default_rng(42)
    img = rng.integers(0, 4096, (6, 5)).astype(np.uint16)
    got = jpeg.decode(make_lossless_jpeg(img, predictor=4, precision=12))
    assert got.dtype == np.uint16
    assert np.array_equal(got, img)


def test_three_component_color_roundtrips():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (5, 8, 3), dtype=np.uint8)
    got = jpeg.decode(make_lossless_jpeg(img, predictor=7))
    assert got.shape == (5, 8, 3)
    assert np.array_equal(got, img)


def test_restart_intervals_reset_prediction():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (6, 7), dtype=np.uint8)
    got = jpeg.decode(make_lossless_jpeg(img, predictor=5, restart=5))
    assert np.array_equal(got, img)


def test_point_transform_shifts_back():
    rng = np.random.default_rng(9)
    img = (rng.integers(0, 64, (4, 6)) << 2).astype(np.uint8)  # low 2 bits 0
    got = jpeg.decode(make_lossless_jpeg(img, predictor=1, pt=2))
    assert np.array_equal(got, img)


def test_category_16_diff():
    """A 16-bit image exercising the 32768 difference (category 16, no
    extra bits): value jumps of exactly +-32768 mod 2^16."""
    img = np.array([[0, 32768, 0, 32768]], dtype=np.uint16)
    got = jpeg.decode(make_lossless_jpeg(img, predictor=1, precision=16))
    assert np.array_equal(got, img)


def test_bad_predictor_rejected():
    img = np.zeros((2, 2), dtype=np.uint8)
    data = bytearray(make_lossless_jpeg(img, predictor=1))
    i = data.find(b"\xff\xda")
    data[i + 2 + 2 + 1 + 2] = 0  # Ss byte -> invalid predictor 0
    with pytest.raises(jpeg.JpegError, match="predictor"):
        jpeg.decode(bytes(data))
