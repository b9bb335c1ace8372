"""Pure-Python LZ4: block format + frame format + xxHash32.

Both specs are public (github.com/lz4/lz4: lz4_Block_format.md,
lz4_Frame_format.md; xxHash spec for the 32-bit checksum variant) and
everything here is CROSS-CHECKED against an independent
implementation: the test suite round-trips through pyarrow's bundled
liblz4 in BOTH directions (our encoder -> liblz4 decode, liblz4
encode -> our decoder) for blocks AND frames, and validates xxh32
against the header-checksum and content-checksum bytes liblz4 emits.

Block format: sequences of [token | literal-length extension |
literals | 2-byte LE match offset | match-length extension]; the last
sequence is literals-only. The encoder is the same greedy hash parse
functions/zstd.compress uses (min match 4), with the spec's
end-of-block constraints honored (last 5 bytes are literals; a match
must not start within the last 12 bytes).

Frame format: magic 0x184D2204, FLG/BD descriptor + xxh32 header
checksum byte, optional content size, 4-byte-size-prefixed blocks
(high bit = stored uncompressed), EndMark, optional block/content
checksums. The writer emits block-independent frames with content
size present — the shape the Puffin spec's `lz4` codec names.

Used by functions/puffin.py to read LZ4-compressed footer payloads
and `compression-codec: lz4` blobs.
"""

from __future__ import annotations

import struct


class Lz4Error(ValueError):
    pass


FRAME_MAGIC = 0x184D2204

_P1 = 2654435761
_P2 = 2246822519
_P3 = 3266489917
_P4 = 668265263
_P5 = 374761393
_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    """xxHash32 (public algorithm) — LZ4 frame checksums."""
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P1) & _M32
        while i <= n - 16:
            for k, v in enumerate((v1, v2, v3, v4)):
                (lane,) = struct.unpack_from("<I", data, i + 4 * k)
                v = (v + lane * _P2) & _M32
                v = (_rotl32(v, 13) * _P1) & _M32
                if k == 0:
                    v1 = v
                elif k == 1:
                    v2 = v
                elif k == 2:
                    v3 = v
                else:
                    v4 = v
            i += 16
        h = (
            _rotl32(v1, 1) + _rotl32(v2, 7)
            + _rotl32(v3, 12) + _rotl32(v4, 18)
        ) & _M32
    else:
        h = (seed + _P5) & _M32
    h = (h + n) & _M32
    while i <= n - 4:
        (lane,) = struct.unpack_from("<I", data, i)
        h = (h + lane * _P3) & _M32
        h = (_rotl32(h, 17) * _P4) & _M32
        i += 4
    while i < n:
        h = (h + data[i] * _P5) & _M32
        h = (_rotl32(h, 11) * _P1) & _M32
        i += 1
    h ^= h >> 15
    h = (h * _P2) & _M32
    h ^= h >> 13
    h = (h * _P3) & _M32
    h ^= h >> 16
    return h


# --- block format -------------------------------------------------------------


def _block_decompress_into(
    data: bytes, out: bytearray, window_start: int
) -> None:
    """Decode one block into `out`, allowing matches back to
    `window_start` — 0 of the current block for block-independent
    frames, the frame start for block-LINKED frames (liblz4's
    default), where matches legally reach into previous blocks."""
    pos = 0
    n = len(data)
    while pos < n:
        token = data[pos]
        pos += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = data[pos]
                pos += 1
                lit += b
                if b != 255:
                    break
        if pos + lit > n:
            raise Lz4Error("lz4: literal run overruns input")
        out += data[pos : pos + lit]
        pos += lit
        if pos == n:
            break  # last sequence: literals only
        if pos + 2 > n:
            raise Lz4Error("lz4: truncated match offset")
        (offset,) = struct.unpack_from("<H", data, pos)
        pos += 2
        if offset == 0 or offset > len(out) - window_start:
            raise Lz4Error(f"lz4: bad match offset {offset}")
        mlen = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                b = data[pos]
                pos += 1
                mlen += b
                if b != 255:
                    break
        start = len(out) - offset
        if offset >= mlen:
            out += out[start : start + mlen]
        else:
            for k in range(mlen):  # overlapping copy
                out.append(out[start + k])


def block_decompress(data: bytes) -> bytes:
    out = bytearray()
    _block_decompress_into(data, out, 0)
    return bytes(out)


def _emit_seq(out: bytearray, lits: bytes, mlen: int, offset: int) -> None:
    ll = len(lits)
    ml = mlen - 4 if mlen else 0
    token = (min(ll, 15) << 4) | (min(ml, 15) if mlen else 0)
    out.append(token)
    if ll >= 15:
        r = ll - 15
        while r >= 255:
            out.append(255)
            r -= 255
        out.append(r)
    out += lits
    if mlen:
        out += struct.pack("<H", offset)
        if ml >= 15:
            r = ml - 15
            while r >= 255:
                out.append(255)
                r -= 255
            out.append(r)


def block_compress(data: bytes) -> bytes:
    """Greedy hash-match LZ4 block encoder honoring the spec's
    end-of-block constraints: the last 5 bytes are always literals and
    no match extends into the last 5 bytes (matches must also leave
    room per the 12-byte rule liblz4 enforces for its fast decoder)."""
    n = len(data)
    out = bytearray()
    if n == 0:
        out.append(0)
        return bytes(out)
    table: dict = {}
    i = 0
    anchor = 0
    limit = n - 12  # conservative: satisfies both end constraints
    while i <= limit and i + 4 <= n:
        key = data[i : i + 4]
        j = table.get(key)
        table[key] = i
        if j is None or i - j > 0xFFFF:
            i += 1
            continue
        m = 4
        hard = n - 5  # matches may not cover the last 5 bytes
        while i + m < hard and data[j + m] == data[i + m]:
            m += 1
        _emit_seq(out, data[anchor:i], m, i - j)
        i += m
        anchor = i
    _emit_seq(out, data[anchor:], 0, 0)
    return bytes(out)


# --- frame format --------------------------------------------------------------

_BD_SIZES = {4: 1 << 16, 5: 1 << 18, 6: 1 << 20, 7: 1 << 22}


def frame_decompress(data: bytes) -> bytes:
    pos = 0
    (magic,) = struct.unpack_from("<I", data, pos)
    pos += 4
    if magic != FRAME_MAGIC:
        raise Lz4Error(f"lz4: bad frame magic {magic:#x}")
    flg = data[pos]
    bd = data[pos + 1]
    pos += 2
    if (flg >> 6) != 0b01:
        raise Lz4Error(f"lz4: unsupported frame version {flg >> 6}")
    b_indep = (flg >> 5) & 1
    b_checksum = (flg >> 4) & 1
    c_size = (flg >> 3) & 1
    c_checksum = (flg >> 2) & 1
    if flg & 1:
        raise NotImplementedError("lz4: dictionary frames unsupported")
    if (flg >> 1) & 1:
        raise Lz4Error("lz4: reserved FLG bit set")
    bcode = (bd >> 4) & 7
    if bcode not in _BD_SIZES or bd & 0x8F:
        raise Lz4Error(f"lz4: bad BD byte {bd:#x}")
    desc_start = pos - 2
    content_size = None
    if c_size:
        (content_size,) = struct.unpack_from("<Q", data, pos)
        pos += 8
    hc = data[pos]
    pos += 1
    want = (xxh32(data[desc_start : pos - 1]) >> 8) & 0xFF
    if hc != want:
        raise Lz4Error(f"lz4: header checksum {hc:#x} != {want:#x}")
    out = bytearray()
    while True:
        (bsize,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if bsize == 0:
            break  # EndMark
        stored = bsize >> 31
        bsize &= 0x7FFFFFFF
        if bsize > _BD_SIZES[bcode]:
            raise Lz4Error("lz4: block exceeds declared maximum")
        blk = data[pos : pos + bsize]
        if len(blk) != bsize:
            raise Lz4Error("lz4: truncated block")
        pos += bsize
        if b_checksum:
            (bx,) = struct.unpack_from("<I", data, pos)
            pos += 4
            if xxh32(blk) != bx:
                raise Lz4Error("lz4: block checksum mismatch")
        if stored:
            out += blk
        else:
            _block_decompress_into(
                blk, out, len(out) if b_indep else 0
            )
    if c_checksum:
        (cx,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if xxh32(bytes(out)) != cx:
            raise Lz4Error("lz4: content checksum mismatch")
    if content_size is not None and len(out) != content_size:
        raise Lz4Error(
            f"lz4: content size {content_size} != decoded {len(out)}"
        )
    return bytes(out)


def frame_compress(data: bytes, checksum: bool = True) -> bytes:
    """Block-independent frame with content size present (the Puffin
    `lz4` codec shape); per-block stored fallback when compression
    loses."""
    out = bytearray(struct.pack("<I", FRAME_MAGIC))
    flg = (0b01 << 6) | (1 << 5) | (1 << 3) | ((1 if checksum else 0) << 2)
    bd = 4 << 4  # 64 KiB max block size
    desc = bytes([flg, bd]) + struct.pack("<Q", len(data))
    out += desc
    out.append((xxh32(desc) >> 8) & 0xFF)
    bmax = _BD_SIZES[4]
    for off in range(0, len(data), bmax):
        chunk = data[off : off + bmax]
        enc = block_compress(chunk)
        if len(enc) < len(chunk):
            out += struct.pack("<I", len(enc))
            out += enc
        else:
            out += struct.pack("<I", len(chunk) | (1 << 31))
            out += chunk
    out += struct.pack("<I", 0)  # EndMark
    if checksum:
        out += struct.pack("<I", xxh32(data))
    return bytes(out)
