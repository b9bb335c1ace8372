"""Minimal still-image containers decoded in pure NumPy: BMP (BI_RGB via
the same DIB row decoder the AVI path uses), binary Netpbm (P5 PGM
grayscale / P6 PPM RGB), and baseline TIFF (strips; none/deflate/
PackBits compression, both byte orders, 8/16-bit, WhiteIsZero) —
formats CV datasets and scientific pipelines ship constantly."""

from __future__ import annotations

import struct

import numpy as np


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP (BITMAPFILEHEADER + BITMAPINFOHEADER, uncompressed 24-bit
    BI_RGB) -> HxWx3 RGB uint8. Other bit depths / compressions raise."""
    try:
        return _decode_bmp_inner(data)
    except (IndexError, struct.error) as e:
        raise ValueError(f"BMP: truncated or corrupt file ({e!r})")


def _decode_bmp_inner(data: bytes) -> np.ndarray:
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
}
_TYPE_SIZE = {1: 1, 3: 2, 4: 4}


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


def decode_tiff(data: bytes) -> np.ndarray:
    """Baseline TIFF -> HxW (gray) or HxWxC uint8/uint16. Both byte
    orders; strip layout (chunky planar config); compression 1 (none),
    5 (LZW, the TIFF early-change variant), 8/32946 (deflate via zlib),
    32773 (PackBits). JPEG-in-TIFF, tiles, and planar=2 raise
    NotImplementedError."""
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
    if len(set(bits_list)) != 1 or bits_list[0] not in (8, 16):
        raise NotImplementedError(f"TIFF bits-per-sample {bits_list} unsupported")
    bits = bits_list[0]
    if one("planar", 1) != 1:
        raise NotImplementedError("TIFF planar configuration 2 not supported")
    if comp not in (1, 5, 8, 32946, 32773):
        raise NotImplementedError(
            f"TIFF compression {comp} unsupported "
            "(none/LZW/deflate/PackBits only)"
        )
    offsets = tags.get("strip_offsets")
    counts = tags.get("strip_counts")
    if not offsets or not counts:
        raise ValueError("TIFF missing strip offsets/byte counts")
    raw = bytearray()
    for off, cnt in zip(offsets, counts):
        strip = bytes(data[off : off + cnt])
        if comp in (8, 32946):
            strip = zlib.decompress(strip)
        elif comp == 5:
            strip = _lzw_tiff_decode(strip)
        elif comp == 32773:
            strip = _unpackbits_rle(strip)
        raw += strip
    dt = np.dtype(bo + ("u2" if bits == 16 else "u1"))
    need = w * h * spp
    arr = np.frombuffer(bytes(raw), dtype=dt, count=need).astype(
        np.uint16 if bits == 16 else np.uint8
    )
    img = arr.reshape((h, w) if spp == 1 else (h, w, spp))
    predictor = one("predictor", 1)
    if predictor == 2:
        # horizontal differencing: samples store deltas to the left
        # neighbor — LZW/deflate TIFFs set this constantly; ignoring it
        # silently decodes garbage (review finding)
        wide = img.astype(np.int64)
        img = np.cumsum(wide, axis=1).astype(img.dtype)  # mod 2^bits wrap
    elif predictor != 1:
        raise NotImplementedError(f"TIFF predictor {predictor} unsupported")
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
    return img


def encode_tiff(
    img: np.ndarray, compression: int = 1, rows_per_strip: int | None = None
) -> bytes:
    """Minimal little-endian TIFF writer (fixtures/sinks): gray or
    chunky RGB, 8/16-bit, compression 1/8/32773."""
    import zlib

    img = np.asarray(img)
    h, w = img.shape[:2]
    spp = 1 if img.ndim == 2 else img.shape[2]
    bits = 16 if img.dtype == np.uint16 else 8
    rows_per_strip = rows_per_strip or h
    strips = []
    for y0 in range(0, h, rows_per_strip):
        part = img[y0 : y0 + rows_per_strip]
        raw = part.astype("<u2" if bits == 16 else "u1").tobytes()
        if compression == 8:
            raw = zlib.compress(raw)
        elif compression == 5:
            raw = _lzw_tiff_encode(raw)
        elif compression == 32773:
            # naive PackBits: literal runs of <=128 bytes
            out = bytearray()
            for i in range(0, len(raw), 128):
                chunk = raw[i : i + 128]
                out.append(len(chunk) - 1)
                out += chunk
            raw = bytes(out)
        elif compression not in (1, 32773):
            raise ValueError(f"encode_tiff: unsupported compression {compression}")
        strips.append(raw)

    n_strips = len(strips)
    entries = []
    extra = bytearray()
    header_size = 8
    # layout: header, IFD (count + entries + next), extra arrays, strip data
    def entry(tag, typ, values):
        size = _TYPE_SIZE[typ] * len(values)
        fmt = {3: "H", 4: "I"}[typ]
        packed = b"".join(struct.pack("<" + fmt, v) for v in values)
        return (tag, typ, len(values), packed)

    bits_vals = [bits] * spp
    tag_list = [
        entry(256, 4, [w]), entry(257, 4, [h]),
        entry(258, 3, bits_vals), entry(259, 3, [compression]),
        entry(262, 3, [2 if spp == 3 else 1]),
        None,  # 273 strip offsets placeholder
        entry(277, 3, [spp]), entry(278, 4, [rows_per_strip]),
        entry(279, 4, [len(s) for s in strips]),
        entry(284, 3, [1]),
    ]
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
        (273, 4, n_strips, so_packed.ljust(4, b"\x00"), None)
        if so_size <= 4
        else (273, 4, n_strips, struct.pack("<I", so_off), so_packed)
    )
    placed[tag_list.index(None)] = so_entry

    out = bytearray(b"II*\x00" + struct.pack("<I", header_size))
    out += struct.pack("<H", n_entries)
    for tag, typ, count, inline, _ in sorted(placed, key=lambda p: p[0]):
        out += struct.pack("<HHI", tag, typ, count) + inline
    out += struct.pack("<I", 0)  # next IFD
    # extras in the same order the placement cursor walked them: every
    # non-273 external array first, then the external strip-offset array
    for tag, _, _, _, packed in placed:
        if packed is not None and tag != 273:
            out += packed
    if so_size > 4:
        out += so_packed
    for s in strips:
        out += s
    return bytes(out)
