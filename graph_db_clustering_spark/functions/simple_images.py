"""Minimal still-image containers decoded in pure NumPy: BMP (BI_RGB via
the same DIB row decoder the AVI path uses), binary Netpbm (P5 PGM
grayscale / P6 PPM RGB), and baseline TIFF (strips; none/deflate/
PackBits compression, both byte orders, 8/16-bit, WhiteIsZero) —
formats CV datasets and scientific pipelines ship constantly."""

from __future__ import annotations

import struct

import numpy as np


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP (BITMAPFILEHEADER + BITMAPINFOHEADER) -> HxWx3 RGB uint8.
    Round 7 widens the profile: 24-bit BI_RGB, 32-bit BGRA (alpha
    dropped), and 8-bit palette images both uncompressed and BI_RLE8
    (runs, absolute mode with word alignment, EOL/EOF/delta escapes,
    undefined skipped pixels zero-indexed per the spec). 1/4/16-bit
    and OS/2 core headers stay gated."""
    try:
        return _decode_bmp_inner(data)
    except (IndexError, struct.error) as e:
        raise ValueError(f"BMP: truncated or corrupt file ({e!r})")


def _unrle8(
    data: bytes, w: int, h: int, canvas: np.ndarray | None = None
) -> np.ndarray:
    """BI_RLE8 -> HxW palette-index raster (bottom-up source order).
    Escapes: 0,0 = end of line; 0,1 = end of bitmap; 0,2,dx,dy = delta;
    0,n>=3 = n absolute bytes (padded to 2-byte alignment); count,val =
    run of count copies. `canvas` (round 10) seeds the raster with the
    PREVIOUS frame for AVI MS-RLE interframes: skipped pixels (EOL,
    delta jumps) keep their prior values instead of zero."""
    out = (
        canvas.copy() if canvas is not None else np.zeros((h, w), np.uint8)
    )
    x = y = 0  # bottom-up: y counts from the bottom row
    i = 0
    n = len(data)
    while i + 1 < n:
        a, b = data[i], data[i + 1]
        i += 2
        if a > 0:  # run
            end = min(x + a, w)
            out[h - 1 - y, x:end] = b
            x = end
        elif b == 0:  # end of line
            x, y = 0, y + 1
            if y >= h:
                break
        elif b == 1:  # end of bitmap
            break
        elif b == 2:  # delta
            if i + 2 > n:
                raise ValueError("BMP RLE8: truncated delta")
            x = min(x + data[i], w)
            y += data[i + 1]
            i += 2
        else:  # absolute mode: b literal bytes, word-aligned
            if i + b > n:
                raise ValueError("BMP RLE8: truncated absolute run")
            end = min(x + b, w)
            out[h - 1 - y, x:end] = np.frombuffer(
                data[i : i + (end - x)], dtype=np.uint8
            )
            x = end
            i += b + (b & 1)
        if y >= h:
            break
    return out


def _unrle4(data: bytes, w: int, h: int) -> np.ndarray:
    """BI_RLE4 -> HxW palette-index raster (round 10): the nibble
    variant of _unrle8 — runs ALTERNATE the value byte's high/low
    nibbles, absolute mode packs two pixels per byte (word-aligned)."""
    out = np.zeros((h, w), dtype=np.uint8)
    x = y = 0
    i = 0
    n = len(data)
    while i + 1 < n:
        a, b = data[i], data[i + 1]
        i += 2
        if a > 0:  # run: alternate high/low nibble
            hi, lo = b >> 4, b & 0x0F
            for k in range(a):
                if x >= w:
                    break
                out[h - 1 - y, x] = hi if k % 2 == 0 else lo
                x += 1
        elif b == 0:  # end of line
            x, y = 0, y + 1
            if y >= h:
                break
        elif b == 1:  # end of bitmap
            break
        elif b == 2:  # delta
            if i + 2 > n:
                raise ValueError("BMP RLE4: truncated delta")
            x = min(x + data[i], w)
            y += data[i + 1]
            i += 2
        else:  # absolute: b nibbles, rounded up to bytes, word-aligned
            nbytes = (b + 1) // 2
            if i + nbytes > n:
                raise ValueError("BMP RLE4: truncated absolute run")
            for k in range(b):
                if x >= w:
                    break
                byte = data[i + k // 2]
                out[h - 1 - y, x] = (byte >> 4) if k % 2 == 0 else (
                    byte & 0x0F
                )
                x += 1
            i += nbytes + (nbytes & 1)
        if y >= h:
            break
    return out


def _decode_bmp_inner(data: bytes) -> np.ndarray:
    from graph_db_clustering_spark.functions.avi import _decode_dib

    if data[:2] != b"BM":
        raise ValueError("not a BMP (missing 'BM' magic)")
    (pixel_off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size == 12:  # OS/2 BITMAPCOREHEADER (round 10)
        w, h = struct.unpack("<HH", data[18:22])
        planes, bpp = struct.unpack("<HH", data[22:26])
        comp, clr_used = 0, 0  # core headers are always uncompressed
        if bpp in (1, 4, 8):
            # 3-byte BGR palette entries: rewrite into the modern BGRX
            # shape so the shared palette path below applies unchanged
            n_colors = 1 << bpp
            pal3 = np.frombuffer(
                data, np.uint8, n_colors * 3, 14 + 12
            ).reshape(n_colors, 3)
            pal = pal3[:, 2::-1]
            stride = ((w * bpp + 31) // 32) * 4
            rows = np.frombuffer(
                data, np.uint8, stride * h, pixel_off
            ).reshape(h, stride)
            if bpp == 8:
                idx = rows[:, :w]
            elif bpp == 4:
                nib = np.empty((h, stride * 2), dtype=np.uint8)
                nib[:, 0::2] = rows >> 4
                nib[:, 1::2] = rows & 0x0F
                idx = nib[:, :w]
            else:
                idx = np.unpackbits(rows, axis=1)[:, :w]
            return pal[idx[::-1]].copy()  # core bitmaps are bottom-up
        if bpp == 24:
            return _decode_dib(data[pixel_off:], w, h)
        raise NotImplementedError(f"BMP core header: bpp {bpp}")
    if hdr_size < 40:
        raise NotImplementedError(
            f"BMP: header size {hdr_size} not supported"
        )
    w, h = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    (comp,) = struct.unpack("<I", data[30:34])
    (clr_used,) = struct.unpack("<I", data[46:50])
    if bpp == 24 and comp == 0:
        return _decode_dib(data[pixel_off:], w, h)
    flip = h > 0
    ah = abs(h)
    if bpp == 32 and comp == 0:
        # BGRA rows (no padding needed: already 4-aligned); alpha dropped
        need = w * ah * 4
        if len(data) - pixel_off < need:
            raise ValueError("BMP: 32-bit raster shorter than w*h*4")
        px = np.frombuffer(data, np.uint8, need, pixel_off).reshape(ah, w, 4)
        img = px[:, :, 2::-1]  # BGRA -> RGB
        return (img[::-1] if flip else img).copy()
    if bpp in (1, 4, 8) and comp in (0, 1, 2):
        if comp == 2 and bpp != 4:
            raise ValueError("BMP: BI_RLE4 requires 4-bit pixels")
        if comp == 1 and bpp != 8:
            raise ValueError("BMP: BI_RLE8 requires 8-bit pixels")
        n_colors = clr_used or (1 << bpp)
        pal_off = 14 + hdr_size
        if len(data) < pal_off + n_colors * 4:
            raise ValueError("BMP: truncated palette")
        pal = np.frombuffer(
            data, np.uint8, n_colors * 4, pal_off
        ).reshape(n_colors, 4)[:, 2::-1]  # BGRX -> RGB
        if comp in (1, 2):  # BI_RLE8 / BI_RLE4 (bottom-up by definition)
            if h < 0:
                raise ValueError("BMP: RLE cannot be top-down")
            un = _unrle8 if comp == 1 else _unrle4
            idx = un(data[pixel_off:], w, ah)
        else:
            stride = ((w * bpp + 31) // 32) * 4  # rows pad to 4 bytes
            if len(data) - pixel_off < stride * ah:
                raise ValueError("BMP: raster shorter than stride*h")
            rows = np.frombuffer(
                data, np.uint8, stride * ah, pixel_off
            ).reshape(ah, stride)
            if bpp == 8:
                idx = rows[:, :w]
            elif bpp == 4:  # high nibble first
                nib = np.empty((ah, stride * 2), dtype=np.uint8)
                nib[:, 0::2] = rows >> 4
                nib[:, 1::2] = rows & 0x0F
                idx = nib[:, :w]
            else:  # 1-bit, MSB first
                idx = np.unpackbits(rows, axis=1)[:, :w]
            idx = idx[::-1] if flip else idx
        if int(idx.max(initial=0)) >= n_colors:
            raise ValueError("BMP: palette index out of range")
        return pal[idx].copy()
    raise NotImplementedError(
        f"BMP: unsupported variant (compression={comp}, bpp={bpp}; "
        "supported: 24/32-bit BI_RGB, 1/4/8-bit palette BI_RGB, "
        "8-bit BI_RLE8, 4-bit BI_RLE4, OS/2 core headers)"
    )


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
        if pos >= len(data):
            raise ValueError("PNM: truncated header")
        if data[pos : pos + 1] == b"#":
            nl = data.find(b"\n", pos)
            if nl < 0:
                raise ValueError("PNM: truncated header comment")
            pos = nl + 1
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


# --- TIFF (baseline: uncompressed / deflate / PackBits strips) -------------

_TIFF_TAGS = {
    256: "width", 257: "height", 258: "bits", 259: "compression",
    262: "photometric", 273: "strip_offsets", 277: "spp",
    278: "rows_per_strip", 279: "strip_counts", 284: "planar",
    317: "predictor", 320: "colormap",
    322: "tile_width", 323: "tile_length",
    324: "tile_offsets", 325: "tile_counts",
    347: "jpeg_tables",
}
_TYPE_SIZE = {1: 1, 3: 2, 4: 4, 7: 1}


def _unpackbits_rle(data: bytes) -> bytes:
    """TIFF PackBits (Apple RLE): n in [0,127] -> copy n+1 literal bytes;
    n in [-127,-1] -> repeat next byte 1-n times; -128 is a no-op."""
    out = bytearray()
    i = 0
    while i < len(data):
        n = data[i] - 256 if data[i] > 127 else data[i]
        i += 1
        if n >= 0:
            out += data[i : i + n + 1]
            i += n + 1
        elif n != -128:
            out += data[i : i + 1] * (1 - n)
            i += 1
    return bytes(out)


def _lzw_tiff_decode(data: bytes) -> bytes:
    """TIFF-variant LZW (compression 5): MSB-first bit packing, 9-bit
    initial codes, ClearCode=256 / EOI=257, and the spec's "early
    change" — the code width bumps one code EARLIER than GIF's variant
    (at table sizes 511/1023/2047)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    acc = nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                return bytes(out)  # missing EOI: tolerate, data complete
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if code == EOI:
            return bytes(out)
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"TIFF LZW: code {code} beyond table")
        out += entry
        prev = entry
        # early change, decoder side: the decoder's table lags the
        # encoder's by one entry (the pending prev+next[:1]), so it must
        # widen when len(table) + 2 would overflow — one code earlier
        # than the table-full point (the documented TIFF off-by-one)
        if len(table) + 2 >= (1 << width) and width < 12:
            width += 1
    return bytes(out)


def _lzw_tiff_encode(raw: bytes) -> bytes:
    """Fixture-side TIFF LZW encoder (mirror of _lzw_tiff_decode)."""
    CLEAR, EOI = 256, 257
    bits: list[tuple[int, int]] = []  # (code, width)
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    bits.append((CLEAR, width))
    w = b""
    for byte in raw:
        wb = w + bytes([byte])
        if wb in table:
            w = wb
            continue
        bits.append((table[w], width))
        table[wb] = next_code
        next_code += 1
        # early change: the width grows when the NEXT assignable code
        # would not fit, one step earlier than GIF
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code >= 4094:
            bits.append((CLEAR, width))
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([byte])
    if w:
        bits.append((table[w], width))
    bits.append((EOI, width))
    out = bytearray()
    acc = nb = 0
    for code, wd in bits:
        acc = (acc << wd) | code
        nb += wd
        while nb >= 8:
            out.append((acc >> (nb - 8)) & 0xFF)
            nb -= 8
    if nb:
        out.append((acc << (8 - nb)) & 0xFF)
    return bytes(out)


def tiff_size(data: bytes) -> tuple[int, int]:
    """(width, height) from the IFD tags only — no strip bytes touched
    (the image_probe contract)."""
    try:
        return _tiff_size_inner(data)
    except (IndexError, struct.error) as e:
        raise ValueError(f"TIFF: truncated or corrupt header ({e!r})")


def _tiff_size_inner(data: bytes) -> tuple[int, int]:
    if data[:4] == b"II*\x00":
        bo = "<"
    elif data[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF (II*/MM* magic missing)")
    u16 = lambda off: struct.unpack(bo + "H", data[off : off + 2])[0]  # noqa: E731
    u32 = lambda off: struct.unpack(bo + "I", data[off : off + 4])[0]  # noqa: E731
    ifd = u32(4)
    w = h = None
    for i in range(u16(ifd)):
        e = ifd + 2 + 12 * i
        tag, typ = u16(e), u16(e + 2)
        if tag in (256, 257):
            v = u16(e + 8) if typ == 3 else u32(e + 8)
            if tag == 256:
                w = v
            else:
                h = v
    if w is None or h is None:
        raise ValueError("TIFF missing width/height tags")
    return w, h


def _assemble_jpeg_tiff(
    data: bytes, tags: dict, offsets, counts, w: int, h: int, tiled: bool
) -> np.ndarray:
    """New-style JPEG-in-TIFF (compression 7, TIFF TechNote 2): every
    strip/tile is a self-contained JPEG interchange stream, optionally
    sharing quantization/Huffman tables via the JPEGTables tag (347) —
    an abbreviated stream SOI..tables..EOI whose table segments are
    spliced after each segment's SOI. Decodes through functions/jpeg
    (baseline/progressive/lossless all available) and assembles the
    per-segment arrays spatially."""
    from graph_db_clustering_spark.functions import jpeg as _jpeg

    tables = bytes(bytearray(tags.get("jpeg_tables", [])))
    if tables:
        if tables[:2] != b"\xff\xd8" or tables[-2:] != b"\xff\xd9":
            raise ValueError("TIFF JPEGTables is not an SOI..EOI stream")
        tables = tables[2:-2]

    def dec(seg: bytes) -> np.ndarray:
        if seg[:2] != b"\xff\xd8":
            raise ValueError("TIFF JPEG strip/tile missing SOI")
        if tables:
            seg = b"\xff\xd8" + tables + seg[2:]
        arr = _jpeg.decode(seg)
        return arr

    arrays = [
        dec(bytes(data[off : off + cnt])) for off, cnt in zip(offsets, counts)
    ]
    if not arrays:
        raise ValueError("TIFF JPEG image with no strips/tiles")
    if tiled:
        tw, th = tags["tile_width"][0], tags["tile_length"][0]
        across = (w + tw - 1) // tw
        down = (h + th - 1) // th
        if len(arrays) < across * down:
            raise ValueError("TIFF tile count shorter than the grid")
        first = arrays[0]
        shape = (down * th, across * tw) + first.shape[2:]
        img = np.zeros(shape, dtype=first.dtype)
        for i in range(down):
            for j in range(across):
                a = arrays[i * across + j]
                # JPEG pads to MCU multiples; crop to the tile geometry
                img[i * th : (i + 1) * th, j * tw : (j + 1) * tw] = a[
                    :th, :tw
                ]
        return img[:h, :w]
    # strips: each covers rows_per_strip full-width rows
    cropped = [a[:, :w] for a in arrays]
    return np.concatenate(cropped, axis=0)[:h]


def decode_tiff(data: bytes) -> np.ndarray:
    """TIFF -> HxW (gray) or HxWxC uint8/uint16. Both byte orders;
    strip AND tile layouts; chunky (planar=1) and planar (planar=2)
    configurations; compression 1 (none), 5 (LZW, the TIFF
    early-change variant), 7 (new-style JPEG via functions/jpeg,
    including a shared JPEGTables segment), 8/32946 (deflate via
    zlib), 32773 (PackBits). Remaining gates, loud and scoped:
    old-style JPEG (compression 6 — deprecated by TIFF TechNote 2,
    writers are extinct) and planar=2 combined with JPEG."""
    import zlib

    try:
        return _decode_tiff_inner(data)
    except (IndexError, struct.error, zlib.error) as e:
        raise ValueError(f"TIFF: truncated or corrupt file ({e!r})")


def _decode_tiff_inner(data: bytes) -> np.ndarray:
    import zlib

    if data[:4] == b"II*\x00":
        bo = "<"
    elif data[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF (II*/MM* magic missing)")
    u16 = lambda off: struct.unpack(bo + "H", data[off : off + 2])[0]  # noqa: E731
    u32 = lambda off: struct.unpack(bo + "I", data[off : off + 4])[0]  # noqa: E731

    ifd = u32(4)
    n_entries = u16(ifd)
    tags: dict[str, list[int]] = {}
    for i in range(n_entries):
        e = ifd + 2 + 12 * i
        tag, typ = u16(e), u16(e + 2)
        count = u32(e + 4)
        if tag not in _TIFF_TAGS or typ not in _TYPE_SIZE:
            continue
        size = _TYPE_SIZE[typ] * count
        off = e + 8 if size <= 4 else u32(e + 8)
        rd = u16 if typ == 3 else u32 if typ == 4 else (lambda o: data[o])
        step = _TYPE_SIZE[typ]
        tags[_TIFF_TAGS[tag]] = [rd(off + j * step) for j in range(count)]

    def one(name, default=None):
        v = tags.get(name)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF missing required tag {name}")
            return default
        return v[0]

    w, h = one("width"), one("height")
    comp = one("compression", 1)
    spp = one("spp", 1)
    bits_list = tags.get("bits", [8])
    if len(set(bits_list)) != 1 or bits_list[0] not in (1, 8, 16):
        raise NotImplementedError(f"TIFF bits-per-sample {bits_list} unsupported")
    bits = bits_list[0]
    planar = one("planar", 1)
    tiled = "tile_offsets" in tags
    if planar not in (1, 2):
        raise NotImplementedError(f"TIFF planar configuration {planar} unsupported")
    if comp == 6:
        raise NotImplementedError(
            "TIFF old-style JPEG (compression 6) not supported "
            "(deprecated by TIFF TechNote 2; compression 7 is)"
        )
    if comp not in (1, 5, 7, 8, 32946, 32773):
        raise NotImplementedError(
            f"TIFF compression {comp} unsupported "
            "(none/LZW/new-JPEG/deflate/PackBits only)"
        )
    if planar == 2 and comp == 7:
        raise NotImplementedError(
            "TIFF planar configuration 2 supported for byte codecs "
            "only (not JPEG)"
        )
    if tiled:
        offsets = tags.get("tile_offsets")
        counts = tags.get("tile_counts")
        if "tile_width" not in tags or "tile_length" not in tags:
            # guard BOTH tile paths (the JPEG assembler reads the tags
            # directly) so a corrupt file raises ValueError, never KeyError
            raise ValueError(
                "TIFF tiled image missing TileWidth/TileLength tags"
            )
    else:
        offsets = tags.get("strip_offsets")
        counts = tags.get("strip_counts")
    if not offsets or not counts:
        raise ValueError("TIFF missing strip/tile offsets or byte counts")
    predictor = one("predictor", 1)
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor} unsupported")
    if bits == 1 and (spp != 1 or tiled or planar == 2 or comp == 7
                      or predictor != 1):
        raise NotImplementedError(
            "TIFF 1-bit supported for chunky single-sample strip "
            "layouts with byte codecs only"
        )

    def undiff(seg: np.ndarray) -> np.ndarray:
        # horizontal differencing: samples store deltas to the left
        # neighbor — LZW/deflate TIFFs set this constantly; ignoring it
        # silently decodes garbage (review finding). Differencing
        # restarts at every segment's left edge, so tiles undiff BEFORE
        # assembly (a tile's first column is absolute, not a delta from
        # the neighboring tile).
        if predictor != 2:
            return seg
        return np.cumsum(seg.astype(np.int64), axis=1).astype(seg.dtype)

    if comp == 7:
        img = _assemble_jpeg_tiff(data, tags, offsets, counts, w, h, tiled)
    else:
        segs = []
        for off, cnt in zip(offsets, counts):
            seg = bytes(data[off : off + cnt])
            if comp in (8, 32946):
                seg = zlib.decompress(seg)
            elif comp == 5:
                seg = _lzw_tiff_decode(seg)
            elif comp == 32773:
                seg = _unpackbits_rle(seg)
            segs.append(seg)
        dt = np.dtype(bo + ("u2" if bits == 16 else "u1"))
        out_t = np.uint16 if bits == 16 else np.uint8
        if bits == 1:
            # bilevel: MSB-first packed rows, each row padded to a byte
            # boundary (scanned-document TIFFs; CCITT G3/G4 stay gated
            # — their code tables are spec lookup data)
            stride = (w + 7) // 8
            raw = b"".join(segs)
            if len(raw) < stride * h:
                raise ValueError("TIFF 1-bit raster shorter than stride*h")
            packed = np.frombuffer(raw, np.uint8, stride * h).reshape(
                h, stride
            )
            img = np.unpackbits(packed, axis=1)[:, :w]
        elif tiled:
            tw, th = one("tile_width"), one("tile_length")
            across = (w + tw - 1) // tw
            down = (h + th - 1) // th
            n_planes = spp if planar == 2 else 1
            tile_ch = 1 if planar == 2 else spp
            if len(segs) < across * down * n_planes:
                raise ValueError("TIFF tile count shorter than the grid")

            def tile_grid(plane_segs):
                canvas = np.zeros(
                    (down * th, across * tw)
                    + (() if tile_ch == 1 else (tile_ch,)),
                    dtype=out_t,
                )
                for i in range(down):
                    for j in range(across):
                        tile = np.frombuffer(
                            plane_segs[i * across + j],
                            dtype=dt,
                            count=th * tw * tile_ch,
                        ).astype(out_t)
                        tile = tile.reshape(
                            (th, tw) if tile_ch == 1 else (th, tw, tile_ch)
                        )
                        canvas[
                            i * th : (i + 1) * th, j * tw : (j + 1) * tw
                        ] = undiff(tile)
                return canvas[:h, :w]

            if planar == 2:
                # plane-major tile order (TIFF 6.0: all plane-0 tiles,
                # then plane 1, ...)
                per = across * down
                img = np.stack(
                    [
                        tile_grid(segs[p * per : (p + 1) * per])
                        for p in range(spp)
                    ],
                    axis=2,
                )
            else:
                img = tile_grid(segs)
        elif planar == 2:
            # all plane-0 strips, then plane-1, ... (TIFF 6.0 §PlanarConfig)
            per_plane = len(segs) // spp
            if per_plane * spp != len(segs):
                raise ValueError(
                    "TIFF planar=2 strip count not divisible by SamplesPerPixel"
                )
            planes = []
            for p in range(spp):
                raw = b"".join(segs[p * per_plane : (p + 1) * per_plane])
                plane = np.frombuffer(raw, dtype=dt, count=w * h).astype(
                    out_t
                ).reshape(h, w)
                planes.append(undiff(plane))
            img = planes[0] if spp == 1 else np.stack(planes, axis=2)
        else:
            raw = b"".join(segs)
            arr = np.frombuffer(raw, dtype=dt, count=w * h * spp).astype(out_t)
            img = undiff(arr.reshape((h, w) if spp == 1 else (h, w, spp)))
    photometric = one("photometric", 1)
    if photometric == 3:  # palette: indices -> ColorMap (16-bit per entry)
        cmap = tags.get("colormap")
        if not cmap or len(cmap) != 3 * (1 << bits):
            raise ValueError("TIFF palette image without a valid ColorMap")
        cm = (np.array(cmap, dtype=np.uint32).reshape(3, -1) >> 8).astype(
            np.uint8
        )
        if img.ndim != 2:
            raise ValueError("TIFF palette image must be single-sample")
        img = np.stack([cm[c][img] for c in range(3)], axis=2)
    elif photometric == 0:  # WhiteIsZero: invert
        img = ((1 << bits) - 1) - img
    if bits == 1 and img.ndim == 2:
        # bilevel grayscale scales to full range AFTER inversion /
        # unless a 2-color palette already mapped the indexes to RGB
        img = (img.astype(np.uint8) * 255)
    return img


def encode_tiff(
    img: np.ndarray,
    compression: int = 1,
    rows_per_strip: int | None = None,
    planar: int = 1,
    tile: tuple[int, int] | None = None,
    jpeg_segments: list[bytes] | None = None,
    jpeg_tables: bytes | None = None,
) -> bytes:
    """Minimal little-endian TIFF writer (fixtures/sinks): gray or RGB,
    8/16-bit, compression 1/5/8/32773, chunky or planar strips, tiled
    layout, and — with ``jpeg_segments`` (pre-encoded JPEG interchange
    streams, one per strip/tile, e.g. from the test mini-encoder) —
    new-style JPEG (compression 7) with an optional shared JPEGTables
    (347) segment."""
    import zlib

    img = np.asarray(img)
    h, w = img.shape[:2]
    spp = 1 if img.ndim == 2 else img.shape[2]
    bilevel = img.dtype == np.bool_
    bits = 1 if bilevel else 16 if img.dtype == np.uint16 else 8
    rows_per_strip = rows_per_strip or h

    def pack(raw: bytes) -> bytes:
        if compression == 8:
            return zlib.compress(raw)
        if compression == 5:
            return _lzw_tiff_encode(raw)
        if compression == 32773:
            # naive PackBits: literal runs of <=128 bytes
            out = bytearray()
            for i in range(0, len(raw), 128):
                chunk = raw[i : i + 128]
                out.append(len(chunk) - 1)
                out += chunk
            return bytes(out)
        if compression == 1:
            return raw
        raise ValueError(f"encode_tiff: unsupported compression {compression}")

    dt = "<u2" if bits == 16 else "u1"
    if jpeg_segments is not None:
        if compression != 7:
            raise ValueError("jpeg_segments requires compression=7")
        strips = [bytes(s) for s in jpeg_segments]
    elif tile is not None:
        tw, th = tile
        strips = []
        planes = (
            [img[:, :, p] for p in range(spp)]
            if planar == 2 and spp > 1
            else [img]
        )
        for plane in planes:
            ch = 1 if plane.ndim == 2 else plane.shape[2]
            for y0 in range(0, h, th):
                for x0 in range(0, w, tw):
                    block = np.zeros(
                        (th, tw) + (() if ch == 1 else (ch,)),
                        dtype=img.dtype,
                    )
                    part = plane[y0 : y0 + th, x0 : x0 + tw]
                    block[: part.shape[0], : part.shape[1]] = part
                    strips.append(pack(block.astype(dt).tobytes()))
    elif planar == 2:
        if spp == 1:
            raise ValueError("planar=2 needs multiple samples per pixel")
        strips = []
        for p in range(spp):
            for y0 in range(0, h, rows_per_strip):
                strips.append(
                    pack(img[y0 : y0 + rows_per_strip, :, p].astype(dt).tobytes())
                )
    elif bilevel:
        strips = [
            pack(
                np.packbits(
                    img[y0 : y0 + rows_per_strip].astype(np.uint8), axis=1
                ).tobytes()
            )
            for y0 in range(0, h, rows_per_strip)
        ]
    else:
        strips = [
            pack(img[y0 : y0 + rows_per_strip].astype(dt).tobytes())
            for y0 in range(0, h, rows_per_strip)
        ]

    n_strips = len(strips)
    header_size = 8
    # layout: header, IFD (count + entries + next), extra arrays, strip data
    def entry(tag, typ, values):
        if typ == 7:  # UNDEFINED: raw bytes
            return (tag, typ, len(values), bytes(values))
        fmt = {3: "H", 4: "I"}[typ]
        packed = b"".join(struct.pack("<" + fmt, v) for v in values)
        return (tag, typ, len(values), packed)

    bits_vals = [bits] * spp
    tag_list = [
        entry(256, 4, [w]), entry(257, 4, [h]),
        entry(258, 3, bits_vals), entry(259, 3, [compression]),
        entry(262, 3, [6 if compression == 7 and spp == 3 else
                       2 if spp == 3 else 1]),
        None,  # 273/324 segment offsets placeholder
        entry(277, 3, [spp]),
        entry(284, 3, [planar]),
    ]
    if tile is not None:
        tag_list += [
            entry(322, 4, [tile[0]]), entry(323, 4, [tile[1]]),
            entry(325, 4, [len(s) for s in strips]),
        ]
        offsets_tag = 324
    else:
        tag_list += [
            entry(278, 4, [rows_per_strip]),
            entry(279, 4, [len(s) for s in strips]),
        ]
        offsets_tag = 273
    if jpeg_tables is not None:
        tag_list.append(entry(347, 7, jpeg_tables))
    n_entries = len(tag_list)
    ifd_size = 2 + 12 * n_entries + 4
    data_start = header_size + ifd_size

    # first pass: place extra arrays (values that don't fit inline)
    placed = []
    cursor = data_start
    for t in tag_list:
        if t is None:
            placed.append(None)
            continue
        tag, typ, count, packed = t
        if len(packed) <= 4:
            placed.append((tag, typ, count, packed.ljust(4, b"\x00"), None))
        else:
            placed.append((tag, typ, count, struct.pack("<I", cursor), packed))
            cursor += len(packed)
    # strip offsets array
    so_packed = b""
    strip_positions = []
    so_size = 4 * n_strips
    so_off = cursor if so_size > 4 else None
    cursor += so_size if so_size > 4 else 0
    for s in strips:
        strip_positions.append(cursor)
        cursor += len(s)
    so_packed = b"".join(struct.pack("<I", p) for p in strip_positions)
    so_entry = (
        (offsets_tag, 4, n_strips, so_packed.ljust(4, b"\x00"), None)
        if so_size <= 4
        else (offsets_tag, 4, n_strips, struct.pack("<I", so_off), so_packed)
    )
    placed[tag_list.index(None)] = so_entry

    out = bytearray(b"II*\x00" + struct.pack("<I", header_size))
    out += struct.pack("<H", n_entries)
    for tag, typ, count, inline, _ in sorted(placed, key=lambda p: p[0]):
        out += struct.pack("<HHI", tag, typ, count) + inline
    out += struct.pack("<I", 0)  # next IFD
    # extras in the same order the placement cursor walked them: every
    # non-offset external array first, then the external offset array
    for tag, _, _, _, packed in placed:
        if packed is not None and tag != offsets_tag:
            out += packed
    if so_size > 4:
        out += so_packed
    for s in strips:
        out += s
    return bytes(out)
