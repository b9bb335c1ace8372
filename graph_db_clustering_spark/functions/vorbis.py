"""Pure-NumPy Ogg Vorbis decoder + fixture encoder (Vorbis I, Xiph spec).

Round 11 (VERDICT r10 #2). Vorbis satisfies this repo's
cross-checkability rule in a way MP3's escape tables and AAC never
can: EVERY codebook arrives in the stream's own setup header —
nothing is memorized — and the floor/residue/MDCT math is derivable
from the published spec. The decode chain:

- Ogg page framing (capture pattern, lacing-value packet reassembly
  across pages, the Ogg CRC-32 — poly 0x04C11DB7, unreflected,
  init/xor 0 — verified per page),
- the three Vorbis headers: identification (rate/channels/blocksizes),
  comment (skipped past), setup (codebooks with the spec 3.2.1
  greedy codeword assignment — validated prefix-free against the
  spec's own worked example — plus VQ lookup types 1 and 2, floor1
  and residue 0/1/2 configurations, mappings, modes),
- audio packets: mode/window flags, floor1 posts (low/high-neighbor
  prediction, render_point, the step2 flag pass, integer render_line
  Bresenham in the dB domain), residue partition classification and
  per-pass VQ accumulation, inverse magnitude/angle channel coupling,
  the dot product against the floor curve, the IMDCT (derived
  directly from the spec formula; numpy cosine matrix), and
  sin(pi/2 * sin^2) windowing with TDAC overlap-add, long/short
  window transitions included.

Floor0 (LSP) gates loudly: modern encoders emit floor1 exclusively
and floor0's Bark-scale curve needs its own cosine table treatment —
the gate names it. The floor1 inverse-dB table is GENERATED as
10^((i-255) * 7/256) (the spec table's exact generating law: entries
are uniform steps of 7/256 decade, endpoints 1.0649863e-07 and 1.0;
generated float64 agrees with the spec's float32 table to ~1e-7
relative — pinned in tests).

The encoder exists for fixtures: it writes a complete, spec-valid
stream (3 codebooks, flat floor1, residue type 1 or 2) whose
residue vectors land exactly on the VQ grid, so decode output equals
the closed-form windowed-IMDCT of the chosen spectra — tests compare
against an independent cosine-sum implementation.

Reference provenance: the reference repo has no audio path; this
extends the engine's multimodal column story
(operators/multimodal.audio_features / audio_probe).
"""

from __future__ import annotations

import struct

import numpy as np


class VorbisError(ValueError):
    pass


# --- Ogg CRC-32 (unreflected, poly 0x04C11DB7, init 0, xor 0) --------------

_CRC_TABLE = None


def _crc_table():
    global _CRC_TABLE
    if _CRC_TABLE is None:
        tbl = []
        for i in range(256):
            r = i << 24
            for _ in range(8):
                r = ((r << 1) ^ 0x04C11DB7) if r & 0x80000000 else (r << 1)
                r &= 0xFFFFFFFF
            tbl.append(r)
        _CRC_TABLE = tbl
    return _CRC_TABLE


def ogg_crc(data: bytes) -> int:
    tbl = _crc_table()
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFFFFFF) ^ tbl[((r >> 24) & 0xFF) ^ b]
    return r


# --- Ogg page framing -------------------------------------------------------


def ogg_pages(
    packets: list[bytes], serial: int = 1, granules: list[int] | None = None
) -> bytes:
    """Pack logical packets into Ogg pages (one page per packet unless
    a packet needs continuation; fixture-grade but spec-valid lacing).
    `granules[i]` is the granule position stamped on the page that
    ENDS packet i (audio sample count convention for Vorbis)."""
    out = bytearray()
    seq = 0
    for pi, pkt in enumerate(packets):
        pos = 0
        first_chunk = True
        while True:
            # up to 255 lacing values per page
            remaining = len(pkt) - pos
            body_segs = []
            body = bytearray()
            while len(body_segs) < 255:
                take = min(remaining, 255)
                body_segs.append(take)
                body += pkt[pos : pos + take]
                pos += take
                remaining -= take
                if take < 255:
                    remaining = -1  # packet terminated on this page
                    break
                if remaining == 0:
                    # packet length is a multiple of 255: needs a
                    # 0-lacing terminator
                    if len(body_segs) < 255:
                        body_segs.append(0)
                        remaining = -1
                    break
            done = remaining == -1
            htype = 0
            if pi == 0 and first_chunk:
                htype |= 0x02  # BOS
            if not first_chunk:
                htype |= 0x01  # continuation
            if pi == len(packets) - 1 and done:
                htype |= 0x04  # EOS
            gran = (
                granules[pi]
                if done and granules is not None
                else (0 if pi == 0 and first_chunk else -1)
            )
            hdr = (
                b"OggS\x00"
                + bytes([htype])
                + struct.pack("<q", gran)
                + struct.pack("<I", serial)
                + struct.pack("<I", seq)
                + b"\x00\x00\x00\x00"
                + bytes([len(body_segs)])
                + bytes(body_segs)
            )
            page = bytearray(hdr + bytes(body))
            crc = ogg_crc(bytes(page))
            page[22:26] = struct.pack("<I", crc)
            out += page
            seq += 1
            first_chunk = False
            if done:
                break
    return bytes(out)


def ogg_packets(data: bytes) -> tuple[list[bytes], int]:
    """Ogg bytes -> (logical packets of the FIRST stream, final granule
    position). CRC-verified per page; continued packets reassembled."""
    packets: list[bytes] = []
    cur = bytearray()
    pos = 0
    serial = None
    last_granule = 0
    while pos + 27 <= len(data):
        if data[pos : pos + 4] != b"OggS":
            raise VorbisError("ogg: lost page sync")
        nseg = data[pos + 26]
        lacing = data[pos + 27 : pos + 27 + nseg]
        body_start = pos + 27 + nseg
        body_len = sum(lacing)
        page_end = body_start + body_len
        if page_end > len(data):
            raise VorbisError("ogg: truncated page")
        page = bytearray(data[pos:page_end])
        want = struct.unpack("<I", bytes(page[22:26]))[0]
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(page)) != want:
            raise VorbisError("ogg: page CRC mismatch")
        this_serial = struct.unpack("<I", data[pos + 14 : pos + 18])[0]
        if serial is None:
            serial = this_serial
        if this_serial == serial:
            gran = struct.unpack("<q", data[pos + 6 : pos + 14])[0]
            if gran >= 0:
                last_granule = gran
            if not data[pos + 5] & 0x01:
                cur = bytearray()  # fresh packet start (not continuation)
            off = body_start
            for lv in lacing:
                cur += data[off : off + lv]
                off += lv
                if lv < 255:
                    packets.append(bytes(cur))
                    cur = bytearray()
        pos = page_end
    return packets, last_granule


# --- Vorbis bitpacking (LSB-first) ------------------------------------------


class _Bits:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, n: int) -> int:
        if self.pos + n > 8 * len(self.data):
            raise VorbisError("vorbis: packet exhausted")
        v = 0
        d, p = self.data, self.pos
        for i in range(n):
            v |= ((d[(p + i) >> 3] >> ((p + i) & 7)) & 1) << i
        self.pos += n
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc |= (v & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def tobytes(self) -> bytes:
        out = bytes(self.buf)
        if self.nbits:
            out += bytes([self.acc & 0xFF])
        return out


def _ilog(x: int) -> int:
    """Vorbis ilog: position of the highest set bit (ilog(0) = 0)."""
    return x.bit_length() if x > 0 else 0


def float32_unpack(x: int) -> float:
    """Vorbis' packed float: 21-bit mantissa, 10-bit biased exponent."""
    mant = x & 0x1FFFFF
    if x & 0x80000000:
        mant = -mant
    exp = (x >> 21) & 0x3FF
    return float(mant) * 2.0 ** (exp - 788)


def float32_pack(v: float) -> int:
    """Inverse of float32_unpack for encoder use (exact for values
    representable as mant * 2^e with |mant| < 2^21)."""
    if v == 0:
        return 788 << 21
    sign = 0x80000000 if v < 0 else 0
    m = abs(v)
    exp = 788
    while m < (1 << 20) and exp > 0:
        m2 = m * 2
        if m2 != int(m2) and m == int(m):
            break
        m = m2
        exp -= 1
    while (m != int(m) or m >= (1 << 21)) and exp < 1023:
        m = m / 2
        exp += 1
    mant = int(round(m))
    if mant >= 1 << 21:
        raise VorbisError("float32_pack: mantissa overflow")
    return sign | (exp << 21) | mant


def make_codewords(lengths: list[int]) -> list[int | None]:
    """Spec 3.2.1 greedy codeword assignment: entry order, each entry
    takes the lowest-valued available prefix-free codeword of its
    length (length 0 = unused entry). Returns codeword ints whose MSB
    is the first-read branch bit; validated prefix-free by
    construction, overspecified trees raise."""
    marker = [0] * 33
    codes: list[int | None] = [None] * len(lengths)
    used_any = False
    for i, length in enumerate(lengths):
        if length <= 0:
            continue
        entry = marker[length]
        if entry >> length:
            raise VorbisError("vorbis: overspecified codebook")
        codes[i] = entry
        used_any = True
        # increment the marker chain (libvorbis _make_words structure,
        # re-derived from the spec's available-prefix bookkeeping)
        for j in range(length, 0, -1):
            if marker[j] & 1:
                if j == 1:
                    marker[1] += 1
                else:
                    marker[j] = marker[j - 1] << 1
                break
            marker[j] += 1
        for j in range(length + 1, 33):
            if (marker[j] >> 1) == entry:
                entry = marker[j]
                marker[j] = marker[j - 1] << 1
            else:
                break
    if not used_any:
        raise VorbisError("vorbis: codebook with no used entries")
    return codes


class Codebook:
    """One parsed codebook: scalar Huffman decode + optional VQ table."""

    __slots__ = ("dims", "entries", "lengths", "rev", "lookup", "vq")

    def __init__(self, dims, entries, lengths, lookup, vq):
        self.dims = dims
        self.entries = entries
        self.lengths = lengths
        self.lookup = lookup
        self.vq = vq  # (entries, dims) float array or None
        codes = make_codewords(lengths)
        self.rev = {
            (lengths[i], c): i for i, c in enumerate(codes) if c is not None
        }

    def decode_scalar(self, bits: _Bits) -> int:
        code = 0
        ln = 0
        rev = self.rev
        for _ in range(33):
            code = (code << 1) | bits.read(1)
            ln += 1
            ent = rev.get((ln, code))
            if ent is not None:
                return ent
        raise VorbisError("vorbis: invalid codeword")

    def decode_vq(self, bits: _Bits) -> np.ndarray:
        if self.vq is None:
            raise VorbisError("vorbis: scalar codebook used in VQ context")
        return self.vq[self.decode_scalar(bits)]


def _parse_codebook(bits: _Bits) -> Codebook:
    if bits.read(24) != 0x564342:  # 'BCV'
        raise VorbisError("vorbis: codebook sync lost")
    dims = bits.read(16)
    entries = bits.read(24)
    ordered = bits.read(1)
    lengths = []
    if not ordered:
        sparse = bits.read(1)
        for _ in range(entries):
            if sparse:
                if bits.read(1):
                    lengths.append(bits.read(5) + 1)
                else:
                    lengths.append(0)  # unused entry
            else:
                lengths.append(bits.read(5) + 1)
    else:
        cur_len = bits.read(5) + 1
        n = 0
        while n < entries:
            num = bits.read(_ilog(entries - n))
            lengths.extend([cur_len] * num)
            n += num
            cur_len += 1
        if n != entries:
            raise VorbisError("vorbis: ordered codebook overrun")
    lookup = bits.read(4)
    vq = None
    if lookup in (1, 2):
        minimum = float32_unpack(bits.read(32))
        delta = float32_unpack(bits.read(32))
        value_bits = bits.read(4) + 1
        sequence_p = bits.read(1)
        if lookup == 1:
            # smallest lv with lv^dims >= entries
            lv = 0
            while (lv + 1) ** dims <= entries:
                lv += 1
            n_mult = lv
        else:
            n_mult = entries * dims
        mults = [bits.read(value_bits) for _ in range(n_mult)]
        vq = np.zeros((entries, dims), dtype=np.float64)
        if lookup == 1:
            for e in range(entries):
                last = 0.0
                idx_div = 1
                for d in range(dims):
                    off = (e // idx_div) % n_mult
                    v = mults[off] * delta + minimum + last
                    vq[e, d] = v
                    if sequence_p:
                        last = v
                    idx_div *= n_mult
        else:
            for e in range(entries):
                last = 0.0
                for d in range(dims):
                    v = mults[e * dims + d] * delta + minimum + last
                    vq[e, d] = v
                    if sequence_p:
                        last = v
    elif lookup != 0:
        raise VorbisError(f"vorbis: reserved lookup type {lookup}")
    return Codebook(dims, entries, lengths, lookup, vq)


# --- floor1 ------------------------------------------------------------------

# Exact generating law of the spec's floor1_inverse_dB_table: uniform
# 7/256-decade steps ending at 1.0 (entry 0 = 1.0649863e-07, pinned in
# tests; float64 here vs the spec's float32 listing: ~1e-7 relative).
FLOOR1_INVERSE_DB = 10.0 ** ((np.arange(256) - 255) * (7.0 / 256.0))

_FLOOR1_RANGES = (256, 128, 86, 64)


def _parse_floor1(bits: _Bits) -> dict:
    partitions = bits.read(5)
    pclass = [bits.read(4) for _ in range(partitions)]
    maxc = max(pclass) if pclass else -1
    cdim, csub, cmaster, cbooks = [], [], [], []
    for _ in range(maxc + 1):
        cdim.append(bits.read(3) + 1)
        sub = bits.read(2)
        csub.append(sub)
        cmaster.append(bits.read(8) if sub else -1)
        cbooks.append([bits.read(8) - 1 for _ in range(1 << sub)])
    multiplier = bits.read(2) + 1
    rangebits = bits.read(4)
    xs = [0, 1 << rangebits]
    for p in range(partitions):
        for _ in range(cdim[pclass[p]]):
            xs.append(bits.read(rangebits))
    if len(xs) > 65:
        raise VorbisError("vorbis: floor1 with >65 values")
    if len(set(xs)) != len(xs):
        raise VorbisError("vorbis: floor1 X values not unique")
    order = sorted(range(len(xs)), key=lambda i: xs[i])
    return {
        "type": 1, "partitions": partitions, "pclass": pclass,
        "cdim": cdim, "csub": csub, "cmaster": cmaster, "cbooks": cbooks,
        "multiplier": multiplier, "xs": xs, "order": order,
    }


def _low_neighbor(v: list, i: int) -> int:
    best, bx = -1, -1
    for j in range(i):
        if v[j] < v[i] and v[j] > bx:
            best, bx = j, v[j]
    return best


def _high_neighbor(v: list, i: int) -> int:
    best, bx = -1, 1 << 62
    for j in range(i):
        if v[j] > v[i] and v[j] < bx:
            best, bx = j, v[j]
    return best


def _render_point(x0: int, y0: int, x1: int, y1: int, x: int) -> int:
    dy = y1 - y0
    adx = x1 - x0
    off = abs(dy) * (x - x0) // adx
    return y0 - off if dy < 0 else y0 + off


def _render_line(x0: int, y0: int, x1: int, y1: int, out: np.ndarray) -> None:
    """Spec integer Bresenham; writes x0..min(x1, len(out))-1."""
    dy = y1 - y0
    adx = x1 - x0
    ady = abs(dy)
    base = abs(dy) // adx * (1 if dy >= 0 else -1)  # C trunc division
    sy = base - 1 if dy < 0 else base + 1
    ady -= abs(base) * adx
    n = len(out)
    if x0 < n:
        out[x0] = y0
    err = 0
    y = y0
    for x in range(x0 + 1, min(x1, n)):
        err += ady
        if err >= adx:
            err -= adx
            y += sy
        else:
            y += base
        out[x] = y


def _decode_floor1(bits: _Bits, cfg: dict, books: list, n2: int):
    """-> amplitude curve (length n2 floats) or None (unused channel)."""
    if not bits.read(1):
        return None
    rng = _FLOOR1_RANGES[cfg["multiplier"] - 1]
    xs = cfg["xs"]
    count = len(xs)
    ybits = _ilog(rng - 1)
    Y = [0] * count
    Y[0] = bits.read(ybits)
    Y[1] = bits.read(ybits)
    offset = 2
    for p in range(cfg["partitions"]):
        cls = cfg["pclass"][p]
        cdim = cfg["cdim"][cls]
        cbits = cfg["csub"][cls]
        csub = (1 << cbits) - 1
        cval = 0
        if cbits:
            cval = books[cfg["cmaster"][cls]].decode_scalar(bits)
        for j in range(cdim):
            book = cfg["cbooks"][cls][cval & csub]
            cval >>= cbits
            Y[offset + j] = (
                books[book].decode_scalar(bits) if book >= 0 else 0
            )
        offset += cdim
    # amplitude synthesis (spec 7.2.3 step 2)
    step2 = [False] * count
    final = [0] * count
    step2[0] = step2[1] = True
    final[0], final[1] = Y[0], Y[1]
    for i in range(2, count):
        lo = _low_neighbor(xs, i)
        hi = _high_neighbor(xs, i)
        predicted = _render_point(xs[lo], final[lo], xs[hi], final[hi], xs[i])
        val = Y[i]
        highroom = rng - predicted
        lowroom = predicted
        room = 2 * min(highroom, lowroom)
        if val:
            step2[lo] = step2[hi] = step2[i] = True
            if val >= room:
                final[i] = (
                    val - lowroom + predicted
                    if highroom > lowroom
                    else predicted - val + highroom - 1
                )
            elif val & 1:
                final[i] = predicted - ((val + 1) >> 1)
            else:
                final[i] = predicted + (val >> 1)
        else:
            step2[i] = False
            final[i] = predicted
    # curve synthesis (7.2.4): render in sorted-X order
    mult = cfg["multiplier"]
    curve_y = np.zeros(n2, dtype=np.int64)
    order = cfg["order"]
    hx = 0
    lx, ly = 0, final[order[0]] * mult
    hy = ly
    for oi in order[1:]:
        if not step2[oi]:
            continue
        hx, hy = xs[oi], final[oi] * mult
        _render_line(lx, ly, hx, hy, curve_y)
        lx, ly = hx, hy
    if hx < n2:
        curve_y[hx:] = hy  # horizontal tail
    return FLOOR1_INVERSE_DB[np.clip(curve_y, 0, 255)]


# --- residues ----------------------------------------------------------------


def _parse_residue(bits: _Bits, rtype: int, n_books: int) -> dict:
    begin = bits.read(24)
    end = bits.read(24)
    psize = bits.read(24) + 1
    n_class = bits.read(6) + 1
    classbook = bits.read(8)
    if classbook >= n_books:
        raise VorbisError("vorbis: residue classbook out of range")
    cascade = []
    for _ in range(n_class):
        low = bits.read(3)
        high = bits.read(5) if bits.read(1) else 0
        cascade.append((high << 3) | low)
    books = []
    for c in range(n_class):
        row = []
        for p in range(8):
            row.append(bits.read(8) if (cascade[c] >> p) & 1 else -1)
        books.append(row)
    return {
        "type": rtype, "begin": begin, "end": end, "psize": psize,
        "n_class": n_class, "classbook": classbook, "cascade": cascade,
        "books": books,
    }


def _decode_residue_inner(
    bits: _Bits, cfg: dict, books: list, vecs: list[np.ndarray],
    do_not: list[bool], fmt: int,
) -> None:
    """Residue formats 0 and 1 over `vecs` in place (spec 8.6.2)."""
    n = len(vecs[0])
    begin = min(cfg["begin"], n)
    end = min(cfg["end"], n)
    psize = cfg["psize"]
    n_to_read = end - begin
    if n_to_read == 0:
        return
    if n_to_read % psize:
        raise VorbisError("vorbis: residue span not partition-aligned")
    parts = n_to_read // psize
    classbook = books[cfg["classbook"]]
    cpc = classbook.dims  # classwords per codeword
    n_class = cfg["n_class"]
    nch = len(vecs)
    classif = [[0] * (parts + cpc) for _ in range(nch)]
    for pas in range(8):
        pcount = 0
        while pcount < parts:
            if pas == 0:
                for j in range(nch):
                    if do_not[j]:
                        continue
                    temp = classbook.decode_scalar(bits)
                    for i in range(cpc - 1, -1, -1):
                        classif[j][pcount + i] = temp % n_class
                        temp //= n_class
            for _ in range(cpc):
                if pcount >= parts:
                    break
                for j in range(nch):
                    if do_not[j]:
                        continue
                    vq = cfg["books"][classif[j][pcount]][pas]
                    if vq < 0:
                        continue
                    book = books[vq]
                    off = begin + pcount * psize
                    if fmt == 0:
                        step = psize // book.dims
                        for i in range(step):
                            vec = book.decode_vq(bits)
                            for d in range(book.dims):
                                vecs[j][off + i + d * step] += vec[d]
                    else:
                        i = 0
                        while i < psize:
                            vec = book.decode_vq(bits)
                            for d in range(book.dims):
                                vecs[j][off + i] += vec[d]
                                i += 1
                pcount += 1


def _decode_residue(
    bits: _Bits, cfg: dict, books: list, nch: int, n2: int,
    do_not: list[bool],
) -> list[np.ndarray]:
    if cfg["type"] in (0, 1):
        vecs = [np.zeros(n2) for _ in range(nch)]
        _decode_residue_inner(bits, cfg, books, vecs, do_not, cfg["type"])
        return vecs
    # type 2: channels interleaved into one long vector; decoded unless
    # EVERY channel is do-not-decode
    if all(do_not):
        return [np.zeros(n2) for _ in range(nch)]
    big = [np.zeros(n2 * nch)]
    _decode_residue_inner(bits, cfg, books, big, [False], 1)
    return [big[0][j::nch].copy() for j in range(nch)]


# --- headers, window, IMDCT, decode loop ------------------------------------


def _parse_setup(pkt: bytes, channels: int) -> dict:
    if pkt[:7] != b"\x05vorbis":
        raise VorbisError("vorbis: bad setup-header signature")
    bits = _Bits(pkt[7:])
    books = [_parse_codebook(bits) for _ in range(bits.read(8) + 1)]
    for _ in range(bits.read(6) + 1):  # time transforms (placeholder)
        if bits.read(16) != 0:
            raise VorbisError("vorbis: nonzero time transform")
    floors = []
    for _ in range(bits.read(6) + 1):
        ftype = bits.read(16)
        if ftype == 1:
            floors.append(_parse_floor1(bits))
        elif ftype == 0:
            raise NotImplementedError(
                "vorbis: floor type 0 (LSP) not implemented — modern "
                "encoders emit floor1 exclusively; floor0 needs the "
                "Bark-scale LSP curve synthesis"
            )
        else:
            raise VorbisError(f"vorbis: reserved floor type {ftype}")
    residues = []
    for _ in range(bits.read(6) + 1):
        rtype = bits.read(16)
        if rtype > 2:
            raise VorbisError(f"vorbis: reserved residue type {rtype}")
        residues.append(_parse_residue(bits, rtype, len(books)))
    mappings = []
    for _ in range(bits.read(6) + 1):
        if bits.read(16) != 0:
            raise VorbisError("vorbis: reserved mapping type")
        submaps = (bits.read(4) + 1) if bits.read(1) else 1
        steps = (bits.read(8) + 1) if bits.read(1) else 0
        coupling = []
        for _ in range(steps):
            m = bits.read(_ilog(channels - 1))
            a = bits.read(_ilog(channels - 1))
            if m == a or m >= channels or a >= channels:
                raise VorbisError("vorbis: bad coupling step")
            coupling.append((m, a))
        if bits.read(2) != 0:
            raise VorbisError("vorbis: mapping reserved bits set")
        mux = (
            [bits.read(4) for _ in range(channels)]
            if submaps > 1
            else [0] * channels
        )
        if any(m >= submaps for m in mux):
            raise VorbisError("vorbis: mapping mux exceeds submap count")
        sub = []
        for _ in range(submaps):
            bits.read(8)  # unused time config
            sub.append((bits.read(8), bits.read(8)))  # (floor, residue)
        mappings.append({
            "submaps": submaps, "coupling": coupling, "mux": mux,
            "sub": sub,
        })
    modes = []
    for _ in range(bits.read(6) + 1):
        blockflag = bits.read(1)
        if bits.read(16) != 0 or bits.read(16) != 0:
            raise VorbisError("vorbis: nonzero window/transform type")
        modes.append((blockflag, bits.read(8)))
    if not bits.read(1):
        raise VorbisError("vorbis: setup framing bit unset")
    return {
        "books": books, "floors": floors, "residues": residues,
        "mappings": mappings, "modes": modes,
    }


def _slope(k: np.ndarray, n: int) -> np.ndarray:
    """The Vorbis window slope sin(pi/2 * sin^2((k+0.5)/n * pi/2))."""
    return np.sin(0.5 * np.pi * np.sin((k + 0.5) / n * 0.5 * np.pi) ** 2)


def _window(n: int, n0: int, prev_flag: int, next_flag: int,
            blockflag: int) -> np.ndarray:
    w = np.zeros(n)
    if blockflag and not prev_flag:
        ls, ln = n // 4 - n0 // 4, n0 // 2
    else:
        ls, ln = 0, n // 2
    if blockflag and not next_flag:
        rs, rn = n // 2 + n // 4 - n0 // 4, n0 // 2
    else:
        rs, rn = n // 2, n // 2
    w[ls : ls + ln] = _slope(np.arange(ln), ln)
    w[ls + ln : rs] = 1.0
    w[rs : rs + rn] = _slope(np.arange(rn)[::-1], rn)
    return w


def _imdct_matrix(n: int) -> np.ndarray:
    j = np.arange(n)[:, None]
    k = np.arange(n // 2)[None, :]
    return np.cos(2.0 * np.pi / n * (j + 0.5 + n / 4.0) * (k + 0.5))


_IMDCT_CACHE: dict = {}


def _imdct(X: np.ndarray) -> np.ndarray:
    n = 2 * len(X)
    M = _IMDCT_CACHE.get(n)
    if M is None:
        M = _imdct_matrix(n)
        _IMDCT_CACHE[n] = M
    return M @ X


def decode_pcm(data: bytes) -> tuple[dict, np.ndarray]:
    """Ogg Vorbis bytes -> (info dict, float64 samples (n, channels) in
    [-1, 1] nominal). Verifies Ogg CRCs and all three header packets;
    truncates to the final granule position per spec."""
    packets, granule = ogg_packets(data)
    if len(packets) < 3:
        raise VorbisError("vorbis: missing header packets")
    idh = packets[0]
    if idh[:7] != b"\x01vorbis":
        raise VorbisError("vorbis: bad identification header")
    b = _Bits(idh[7:])
    if b.read(32) != 0:
        raise VorbisError("vorbis: unsupported stream version")
    channels = b.read(8)
    rate = b.read(32)
    b.read(32)
    b.read(32)
    b.read(32)  # bitrate hints
    bs0 = 1 << b.read(4)
    bs1 = 1 << b.read(4)
    if not b.read(1):
        raise VorbisError("vorbis: id-header framing bit unset")
    if channels == 0 or rate == 0 or bs0 > bs1:
        raise VorbisError("vorbis: invalid id header fields")
    if packets[1][:7] != b"\x03vorbis":
        raise VorbisError("vorbis: bad comment header")
    setup = _parse_setup(packets[2], channels)
    books = setup["books"]
    modes = setup["modes"]
    mode_bits = _ilog(len(modes) - 1)

    out_chunks: list[np.ndarray] = []
    lap = None  # contributions at absolute positions >= previous center
    prev_n = 0
    for pkt in packets[3:]:
        bits = _Bits(pkt)
        if bits.read(1) != 0:
            continue  # non-audio packet: ignored per spec
        blockflag, map_idx = modes[bits.read(mode_bits)]
        n = bs1 if blockflag else bs0
        prev_flag = next_flag = 0
        if blockflag:
            prev_flag = bits.read(1)
            next_flag = bits.read(1)
        mapping = setup["mappings"][map_idx]
        n2 = n // 2
        floors: list = [None] * channels
        no_res = [False] * channels
        for ch in range(channels):
            fidx = mapping["sub"][mapping["mux"][ch]][0]
            curve = _decode_floor1(bits, setup["floors"][fidx], books, n2)
            floors[ch] = curve
            no_res[ch] = curve is None
        # nonzero propagation through coupling
        for m, a in mapping["coupling"]:
            if not (no_res[m] and no_res[a]):
                no_res[m] = no_res[a] = False
        residue = [np.zeros(n2) for _ in range(channels)]
        for sm in range(mapping["submaps"]):
            chans = [c for c in range(channels) if mapping["mux"][c] == sm]
            ridx = mapping["sub"][sm][1]
            dnd = [no_res[c] for c in chans]
            vecs = _decode_residue(
                bits, setup["residues"][ridx], books, len(chans), n2, dnd
            )
            for c, v in zip(chans, vecs):
                residue[c] = v
        # inverse coupling (reverse order)
        for m, a in reversed(mapping["coupling"]):
            M, A = residue[m], residue[a]
            newM, newA = M.copy(), A.copy()
            pos = M > 0
            apos = A > 0
            newA[pos & apos] = (M - A)[pos & apos]
            newM[pos & ~apos] = (M + A)[pos & ~apos]
            newA[pos & ~apos] = M[pos & ~apos]
            newA[~pos & apos] = (M + A)[~pos & apos]
            newM[~pos & ~apos] = (M - A)[~pos & ~apos]
            newA[~pos & ~apos] = M[~pos & ~apos]
            residue[m], residue[a] = newM, newA
        # dot product + IMDCT + window
        w = _window(n, bs0, prev_flag, next_flag, blockflag)
        blocks = []
        for ch in range(channels):
            spec = (
                residue[ch] * floors[ch]
                if floors[ch] is not None
                else np.zeros(n2)
            )
            blocks.append(_imdct(spec) * w)
        wb = np.stack(blocks, axis=1)  # (n, channels)
        if lap is None:
            lap = wb[n2:].copy()
            prev_n = n
            continue
        out_len = prev_n // 4 + n // 4
        need = out_len + n2
        if len(lap) < need:
            lap = np.concatenate(
                [lap, np.zeros((need - len(lap), channels))]
            )
        start = out_len - n2
        if start < 0:
            lap[: n + start] += wb[-start:]
        else:
            lap[start : start + n] += wb
        out_chunks.append(lap[:out_len])
        lap = lap[out_len:]
        prev_n = n
    pcm = (
        np.concatenate(out_chunks)
        if out_chunks
        else np.zeros((0, channels))
    )
    if granule and granule < len(pcm):
        pcm = pcm[:granule]
    info = {
        "rate": rate, "channels": channels, "blocksizes": (bs0, bs1),
        "n_samples": len(pcm),
    }
    return info, pcm


def decode(data: bytes) -> tuple[int, np.ndarray]:
    """Ogg Vorbis bytes -> (sample_rate, mono float64) — the
    audio-dispatch signature shared with functions/mp3 and
    functions/flac; multichannel downmixes to the channel mean."""
    info, pcm = decode_pcm(data)
    return info["rate"], pcm.mean(axis=1) if pcm.ndim == 2 else pcm


# --- fixture encoder ---------------------------------------------------------


def _write_codeword(w: _BitWriter, code: int, length: int) -> None:
    for k in range(length - 1, -1, -1):
        w.write((code >> k) & 1, 1)


class _EncBooks:
    """The fixture setup's three codebooks, mirrored encoder-side."""

    def __init__(self, delta: float):
        self.floor_lens = [1, 1]
        self.class_lens = [4] * 16
        self.value_lens = [6] * 64
        self.floor_codes = make_codewords(self.floor_lens)
        self.class_codes = make_codewords(self.class_lens)
        self.value_codes = make_codewords(self.value_lens)
        self.delta = delta
        self.vmin = -32.0 * delta


def _write_setup(channels: int, delta: float, rtype: int, end: int) -> bytes:
    eb = _EncBooks(delta)
    w = _BitWriter()
    w.write(3 - 1, 8)  # codebook count
    # book 0: floor posts (2 entries, scalar)
    w.write(0x564342, 24)
    w.write(1, 16)
    w.write(2, 24)
    w.write(0, 1)  # unordered
    w.write(0, 1)  # not sparse
    for ln in eb.floor_lens:
        w.write(ln - 1, 5)
    w.write(0, 4)  # lookup 0
    # book 1: residue classbook (dims 4, 16 entries, scalar)
    w.write(0x564342, 24)
    w.write(4, 16)
    w.write(16, 24)
    w.write(0, 1)
    w.write(0, 1)
    for ln in eb.class_lens:
        w.write(ln - 1, 5)
    w.write(0, 4)
    # book 2: residue values (dims 1, 64 entries, lookup 2 grid)
    w.write(0x564342, 24)
    w.write(1, 16)
    w.write(64, 24)
    w.write(0, 1)
    w.write(0, 1)
    for ln in eb.value_lens:
        w.write(ln - 1, 5)
    w.write(2, 4)  # lookup type 2
    w.write(float32_pack(eb.vmin), 32)
    w.write(float32_pack(delta), 32)
    w.write(6 - 1, 4)  # value_bits
    w.write(0, 1)  # sequence_p
    for i in range(64):
        w.write(i, 6)
    # time transforms
    w.write(0, 6)
    w.write(0, 16)
    # floor1
    w.write(0, 6)  # floor count - 1
    w.write(1, 16)  # type 1
    w.write(1, 5)  # partitions
    w.write(0, 4)  # partition class
    w.write(2 - 1, 3)  # class dim 2
    w.write(0, 2)  # subclasses
    w.write(0 + 1, 8)  # subclass book 0 -> floor book index 0 (+1)
    w.write(0, 2)  # multiplier - 1 = 0 -> range 256
    w.write(6, 4)  # rangebits
    w.write(20, 6)
    w.write(40, 6)
    # residue
    w.write(0, 6)  # residue count - 1
    w.write(rtype, 16)
    w.write(0, 24)  # begin
    w.write(end, 24)
    w.write(32 - 1, 24)  # partition size
    w.write(2 - 1, 6)  # classifications
    w.write(1, 8)  # classbook = book 1
    w.write(0, 3)
    w.write(0, 1)  # class 0 cascade 0
    w.write(1, 3)
    w.write(0, 1)  # class 1 cascade pass-0
    w.write(2, 8)  # class 1 pass 0 book = book 2
    # mapping
    w.write(0, 6)
    w.write(0, 16)  # type 0
    w.write(0, 1)  # submaps flag -> 1 submap
    w.write(0, 1)  # coupling flag -> 0 steps
    w.write(0, 2)  # reserved
    w.write(0, 8)  # time placeholder
    w.write(0, 8)  # floor 0
    w.write(0, 8)  # residue 0
    # modes
    w.write(0, 6)
    w.write(0, 1)  # blockflag 0
    w.write(0, 16)
    w.write(0, 16)
    w.write(0, 8)  # mapping 0
    w.write(1, 1)  # framing
    return b"\x05vorbis" + w.tobytes()


def _encode_packet(
    spectra: np.ndarray, eb: _EncBooks, rtype: int
) -> bytes:
    """One audio packet for (channels, n2) integer grid indices
    (0..63, 32 = zero)."""
    w = _BitWriter()
    w.write(0, 1)  # audio packet
    # mode number: 0 bits (single mode); blockflag 0 -> no window flags
    nch, n2 = spectra.shape
    for _ in range(nch):  # floor per channel: flat at y=255
        w.write(1, 1)  # nonzero
        w.write(255, 8)  # y0 (range 256 -> 8 bits)
        w.write(255, 8)  # y1
        # partition 0, class 0, subclasses 0: two posts from book 0,
        # value 0 (-> step2 false, pure prediction = flat)
        _write_codeword(w, eb.floor_codes[0], eb.floor_lens[0])
        _write_codeword(w, eb.floor_codes[0], eb.floor_lens[0])
    if rtype == 2:
        vecs = [np.empty(n2 * nch, dtype=np.int64)]
        for c in range(nch):
            vecs[0][c::nch] = spectra[c]
    else:
        vecs = [spectra[c] for c in range(nch)]
    psize, cpc, n_class = 32, 4, 2
    for v in vecs:
        parts = len(v) // psize
        classes = [
            0 if not v[p * psize : (p + 1) * psize].any() else 1
            for p in range(parts)
        ]
        # interleaved order: classword then its cpc partitions (one
        # decode "channel" per vector here, so order is sequential)
        for g in range(0, parts, cpc):
            temp = 0
            for k in range(cpc):
                temp = temp * n_class + (
                    classes[g + k] if g + k < parts else 0
                )
            _write_codeword(w, eb.class_codes[temp], eb.class_lens[temp])
            for p in range(g, min(g + cpc, parts)):
                if classes[p] == 0:
                    continue
                for i in range(p * psize, (p + 1) * psize):
                    idx = int(v[i])
                    _write_codeword(
                        w, eb.value_codes[idx], eb.value_lens[idx]
                    )
    return w.tobytes()


def encode(
    x: np.ndarray, rate: int, blocksize: int = 256,
    tags: dict | None = None,
) -> bytes:
    """Float samples in [-1, 1] (shape (n,) or (n, channels)) -> Ogg
    Vorbis bytes. Fixture-grade but SPEC-VALID: forward MDCT, spectra
    quantized onto the value book's 64-step grid (delta auto-scaled to
    the signal, packed exactly), flat unit floor, residue type 1
    (mono) / type 2 (multichannel), uniform blocksize. decode() of the
    result reproduces the windowed-OLA reconstruction of the quantized
    spectra; for band-limited signals the roundtrip SNR is bounded in
    tests."""
    x = np.asarray(x, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n, nch = x.shape
    if n == 0:
        raise VorbisError("vorbis: empty signal")
    N = blocksize
    n2 = N // 2
    if N & (N - 1) or not (64 <= N <= 8192):
        raise VorbisError("vorbis: blocksize must be a power of 2 in 64..8192")
    n_pad = -n % n2
    xp = np.pad(x, ((n2, n2 + n_pad), (0, 0)))
    n_blocks = (len(xp) - N) // n2 + 1
    w = _window(N, N, 0, 0, 0)
    M = _IMDCT_CACHE.get(N)
    if M is None:
        M = _imdct_matrix(N)
        _IMDCT_CACHE[N] = M
    X = np.empty((n_blocks, nch, n2))
    for b in range(n_blocks):
        seg = xp[b * n2 : b * n2 + N]
        X[b] = ((4.0 / N) * (M.T @ (seg * w[:, None]))).T
    peak = float(np.abs(X).max())
    delta = 2.0 ** max(-20, int(np.ceil(np.log2(max(peak, 1e-12) / 31.0))))
    idx = np.clip(np.rint(X / delta), -32, 31).astype(np.int64) + 32
    rtype = 1 if nch == 1 else 2
    end = n2 * nch if rtype == 2 else n2
    eb = _EncBooks(delta)
    log2n = N.bit_length() - 1
    idw = _BitWriter()
    idw.write(0, 32)
    idw.write(nch, 8)
    idw.write(rate, 32)
    idw.write(0, 32)
    idw.write(0, 32)
    idw.write(0, 32)
    idw.write(log2n, 4)
    idw.write(log2n, 4)
    idw.write(1, 1)
    id_pkt = b"\x01vorbis" + idw.tobytes()
    cw = _BitWriter()
    vendor = b"graph_db_clustering_spark fixture"
    cw.write(len(vendor), 32)
    for byte in vendor:
        cw.write(byte, 8)
    entries = [
        f"{k}={v}".encode("utf-8") for k, v in (tags or {}).items()
    ]
    cw.write(len(entries), 32)
    for ent in entries:
        cw.write(len(ent), 32)
        for byte in ent:
            cw.write(byte, 8)
    cw.write(1, 1)
    comment_pkt = b"\x03vorbis" + cw.tobytes()
    setup_pkt = _write_setup(nch, delta, rtype, end)
    packets = [id_pkt, comment_pkt, setup_pkt]
    granules = [0, 0, 0]
    for b in range(n_blocks):
        packets.append(_encode_packet(idx[b], eb, rtype))
        granules.append(min(b * n2, n))  # emitted after this packet
    granules[-1] = n  # exact trim point
    return ogg_pages(packets, granules=granules)
