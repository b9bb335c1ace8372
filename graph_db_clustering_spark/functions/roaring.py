"""64-bit RoaringBitmapArray codec — the serialization Delta Lake's
deletion vectors use (delta-io PROTOCOL.md "Deletion Vector Format",
which defers to the public RoaringFormatSpec for the per-bucket
32-bit bitmaps). Pure Python, no external roaring library.

Layout (all little-endian):
- int32 magic 1681511377 ("portable" RoaringBitmapArray)
- int64 number of 32-bit buckets
- per bucket: int32 key (the value's high 32 bits) + a standard
  32-bit RoaringBitmap portable serialization (RoaringFormatSpec):
  - cookie int32 12346 (SERIAL_COOKIE_NO_RUNCONTAINER) + int32
    container count, OR uint16 cookie 12347 (SERIAL_COOKIE, run
    containers present) with (count - 1) in the upper 16 bits
    followed by the run-flag bitset;
  - descriptive headers: per container uint16 key(high 16 bits),
    uint16 cardinality-1;
  - offset headers (int32 each) when cookie == 12346 or count >= 4;
  - containers in order: ARRAY (sorted uint16s, card <= 4096),
    BITMAP (1024 uint64 words), RUN (uint16 n_runs then
    (start, length-1) uint16 pairs).

The encoder always writes cookie-12346 array/bitmap containers (valid
per the spec and readable by every conforming decoder); the decoder
accepts all three container types and both cookies, so DV files
written by real engines (which may emit run containers) decode too.
"""

from __future__ import annotations

import struct
import zlib

MAGIC_PORTABLE = 1681511377
_COOKIE_NO_RUN = 12346
_COOKIE_RUN = 12347
_NO_OFFSET_THRESHOLD = 4


class RoaringError(ValueError):
    pass


def _decode_rb32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """One 32-bit RoaringBitmap (portable) at buf[pos:] -> (sorted
    values, next position)."""
    (cookie32,) = struct.unpack_from("<i", buf, pos)
    has_runs = (cookie32 & 0xFFFF) == _COOKIE_RUN
    if has_runs:
        n = (cookie32 >> 16) + 1
        pos += 4
        nbytes = (n + 7) // 8
        run_flags = buf[pos : pos + nbytes]
        pos += nbytes
    elif cookie32 == _COOKIE_NO_RUN:
        pos += 4
        (n,) = struct.unpack_from("<i", buf, pos)
        pos += 4
        run_flags = b"\x00" * ((n + 7) // 8)
    else:
        raise RoaringError(f"roaring: bad cookie {cookie32}")
    keys, cards = [], []
    for i in range(n):
        k, c = struct.unpack_from("<HH", buf, pos)
        pos += 4
        keys.append(k)
        cards.append(c + 1)
    if not has_runs or n >= _NO_OFFSET_THRESHOLD:
        pos += 4 * n  # offset headers: redundant for sequential reads
    out: list[int] = []
    for i in range(n):
        base = keys[i] << 16
        card = cards[i]
        if run_flags[i // 8] & (1 << (i % 8)):
            (nruns,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(nruns):
                start, length = struct.unpack_from("<HH", buf, pos)
                pos += 4
                out.extend(base + v for v in range(start, start + length + 1))
        elif card <= 4096:
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            out.extend(base + v for v in vals)
        else:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    b = w & -w
                    out.append(base + (wi << 6) + b.bit_length() - 1)
                    w ^= b
    return out, pos


def decode_rbm_array(data: bytes) -> list[int]:
    """Portable RoaringBitmapArray bytes -> sorted 64-bit values."""
    if len(data) < 12:
        raise RoaringError("roaring: truncated array header")
    (magic,) = struct.unpack_from("<i", data, 0)
    if magic != MAGIC_PORTABLE:
        raise RoaringError(f"roaring: bad magic {magic}")
    (nbuckets,) = struct.unpack_from("<q", data, 4)
    pos, out = 12, []
    for _ in range(nbuckets):
        (key,) = struct.unpack_from("<i", data, pos)
        pos += 4
        vals, pos = _decode_rb32(data, pos)
        hi = key << 32
        out.extend(hi + v for v in vals)
    return out


def _encode_rb32(values: list[int]) -> bytes:
    """Sorted uint32 values -> one portable 32-bit bitmap (cookie
    12346; array containers up to 4096 values, else bitmap)."""
    conts: dict[int, list[int]] = {}
    for v in values:
        conts.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(conts)
    head = struct.pack("<ii", _COOKIE_NO_RUN, len(keys))
    desc = b"".join(
        struct.pack("<HH", k, len(conts[k]) - 1) for k in keys
    )
    bodies = []
    for k in keys:
        vals = conts[k]
        if len(vals) <= 4096:
            bodies.append(struct.pack(f"<{len(vals)}H", *vals))
        else:
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            bodies.append(struct.pack("<1024Q", *words))
    offsets, at = [], len(head) + len(desc) + 4 * len(keys)
    for b in bodies:
        offsets.append(at)
        at += len(b)
    off = struct.pack(f"<{len(keys)}i", *offsets)
    return head + desc + off + b"".join(bodies)


def encode_rbm_array(values) -> bytes:
    """Sorted-or-not 64-bit values -> portable RoaringBitmapArray."""
    buckets: dict[int, list[int]] = {}
    for v in values:
        if v < 0:
            raise RoaringError("roaring: negative value")
        buckets.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    out = [struct.pack("<iq", MAGIC_PORTABLE, len(buckets))]
    for key in sorted(buckets):
        out.append(struct.pack("<i", key))
        out.append(_encode_rb32(sorted(set(buckets[key]))))
    return b"".join(out)


def pack_dv_file(blobs: list[bytes]) -> tuple[bytes, list[int]]:
    """Wrap serialized bitmaps into an on-disk deletion-vector FILE per
    the Delta protocol: 1-byte format version, then per DV a 4-byte
    BIG-endian size, the blob, and a 4-byte big-endian CRC-32 of the
    blob. Returns (file bytes, per-blob offsets) — each offset points
    at the size field, which is what the descriptor's `offset` means."""
    parts, offsets, at = [b"\x01"], [], 1
    for blob in blobs:
        offsets.append(at)
        parts.append(struct.pack(">i", len(blob)))
        parts.append(blob)
        parts.append(struct.pack(">I", zlib.crc32(blob) & 0xFFFFFFFF))
        at += 8 + len(blob)
    return b"".join(parts), offsets


def unpack_dv_blob(data: bytes, offset: int, size: int) -> bytes:
    """Extract + checksum-verify one DV blob from file bytes."""
    if data[:1] != b"\x01":
        raise RoaringError(
            f"delta dv: file format version {data[:1]!r} (expect 1)"
        )
    (n,) = struct.unpack_from(">i", data, offset)
    if n != size:
        raise RoaringError(f"delta dv: size {n} != descriptor {size}")
    blob = data[offset + 4 : offset + 4 + n]
    (want,) = struct.unpack_from(">I", data, offset + 4 + n)
    got = zlib.crc32(blob) & 0xFFFFFFFF
    if got != want:
        raise RoaringError(f"delta dv: checksum {got:#x} != {want:#x}")
    return blob
