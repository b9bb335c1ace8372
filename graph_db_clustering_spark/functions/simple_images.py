"""Minimal still-image containers decoded in pure NumPy: BMP (BI_RGB via
the same DIB row decoder the AVI path uses) and binary Netpbm (P5 PGM
grayscale / P6 PPM RGB) — formats CV datasets and scientific pipelines
ship constantly, each a header plus raw samples."""

from __future__ import annotations

import struct

import numpy as np


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP (BITMAPFILEHEADER + BITMAPINFOHEADER, uncompressed 24-bit
    BI_RGB) -> HxWx3 RGB uint8. Other bit depths / compressions raise."""
    from graph_db_clustering_spark.functions.avi import _decode_dib

    if data[:2] != b"BM":
        raise ValueError("not a BMP (missing 'BM' magic)")
    (pixel_off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise NotImplementedError("BMP core-header (OS/2) variant not supported")
    w, h = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    (comp,) = struct.unpack("<I", data[30:34])
    if comp != 0 or bpp != 24:
        raise NotImplementedError(
            f"BMP: only uncompressed 24-bit BI_RGB supported (got "
            f"compression={comp}, bpp={bpp})"
        )
    return _decode_dib(data[pixel_off:], w, h)


def pnm_header(data: bytes) -> tuple[int, int, int, int]:
    """Parse just the P5/P6 header -> (width, height, maxval, raster
    offset) — the metadata-probe path reads no raster bytes."""
    if data[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PGM/PPM (P5/P6 magic missing)")
    # header tokens: magic, width, height, maxval — whitespace separated,
    # '#' comments run to end of line
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            pos = data.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    w, h, maxval = fields
    if not 0 < maxval < 65536:
        raise ValueError(f"PNM maxval {maxval} out of range")
    return w, h, maxval, pos


def decode_pnm(data: bytes) -> np.ndarray:
    """Binary Netpbm: P5 (PGM, HxW uint8/uint16 gray) or P6 (PPM, HxWx3).
    Handles comment lines and maxval up to 65535 (big-endian 16-bit per
    the spec)."""
    channels = 1 if data[:2] == b"P5" else 3
    w, h, maxval, pos = pnm_header(data)
    dtype = np.dtype(">u2") if maxval > 255 else np.dtype(np.uint8)
    need = w * h * channels
    raster = np.frombuffer(data, dtype=dtype, count=need, offset=pos)
    arr = raster.astype(np.uint16 if maxval > 255 else np.uint8)
    return arr.reshape((h, w) if channels == 1 else (h, w, 3))
