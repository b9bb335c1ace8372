"""Pure-Python/NumPy FLAC codec (decode + fixture encoder).

FLAC is the lossless audio container a curated speech/music corpus
actually ships (LibriSpeech, MLS, FMA-lossless): linear prediction +
Rice-coded residuals, byte-exact reconstruction. Everything here is
derived from the public format description (xiph.org FLAC format spec):
no entropy tables, no lookup data — the CRCs are standard polynomial
divisions and both fixed and LPC predictors are closed-form arithmetic,
so the whole codec is a few hundred lines of derivable code.

Decoder scope: 8/16/24-bit, 1-2 channels, all four channel assignments
(independent, left/side, right/side, mid/side), CONSTANT / VERBATIM /
FIXED(0-4) / LPC(1-32) subframes, 4- and 5-bit Rice partitions with
escape codes, wasted bits, both fixed and variable blocking strategies.
STREAMINFO's MD5 is verified when present — the container's own
losslessness proof. Corrupt input raises FlacError (a ValueError),
never an IndexError.

Encoder scope (fixtures + the synthetic-corpus path): CONSTANT /
VERBATIM / FIXED(0-2) chosen per block by residual magnitude, Rice
partition order 0, independent or mid/side stereo, MD5-stamped
STREAMINFO.

Reference scope: the reference pipeline has no audio path at all
(kmeans_clustering/ is image-only); this extends the engine's
multimodal column family the same way functions/mp3 did in round 7.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np


class FlacError(ValueError):
    pass


# --- CRCs (frame header CRC-8 poly 0x07, frame CRC-16 poly 0x8005) ---------


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


# --- bit I/O ----------------------------------------------------------------


class _Bits:
    """MSB-first bit reader (same shape as functions/mp3._Bits)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, bitpos: int = 0):
        self.data = data
        self.pos = bitpos

    def read(self, n: int) -> int:
        v = 0
        d, p = self.data, self.pos
        if (p + n) > 8 * len(d):
            raise FlacError("flac: bitstream exhausted (truncated frame)")
        for _ in range(n):
            v = (v << 1) | ((d[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = p
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if n and v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        d, p = self.data, self.pos
        limit = 8 * len(d)
        q = 0
        while True:
            if p >= limit:
                raise FlacError("flac: bitstream exhausted (unary run)")
            if (d[p >> 3] >> (7 - (p & 7))) & 1:
                break
            q += 1
            p += 1
        self.pos = p + 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


# --- frame-number UTF-8-style coding ----------------------------------------


def _utf8_number(v: int) -> bytes:
    if v < 0x80:
        return bytes([v])
    out = []
    nbytes = 2
    # an nbytes-byte sequence carries 5*nbytes + 1 payload bits
    while v >= (1 << (5 * nbytes + 1)) and nbytes < 7:
        nbytes += 1
    for i in range(nbytes - 1):
        out.append(0x80 | (v & 0x3F))
        v >>= 6
    lead_mask = (0xFF00 >> nbytes) & 0xFF
    out.append(lead_mask | v)
    return bytes(reversed(out))


def _read_utf8_number(br: _Bits) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while b0 & (0x80 >> n):
        n += 1
    if n < 2 or n > 7:
        raise FlacError("flac: invalid UTF-8-coded frame number")
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        c = br.read(8)
        if (c & 0xC0) != 0x80:
            raise FlacError("flac: invalid UTF-8 continuation in frame number")
        v = (v << 6) | (c & 0x3F)
    return v


# --- fixed predictors --------------------------------------------------------

# order-k fixed predictor = k-th order difference; residual r[i] =
# sum_j (-1)^j C(k,j) x[i-j]. Reconstruction inverts the difference.
_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCK_SIZES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}

_SAMPLE_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}

_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24}


def _read_residual(br: _Bits, blocksize: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise FlacError(f"flac: reserved residual coding method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = br.read(4)
    nparts = 1 << po
    if blocksize % nparts:
        raise FlacError("flac: partition order does not divide block size")
    out: list[int] = []
    for p in range(nparts):
        n = (blocksize >> po) - (order if p == 0 else 0)
        if n < 0:
            raise FlacError("flac: predictor order exceeds first partition")
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            for _ in range(n):
                out.append(br.read_signed(raw) if raw else 0)
        else:
            for _ in range(n):
                q = br.unary()
                v = (q << param) | br.read(param)
                out.append((v >> 1) ^ -(v & 1))  # unzigzag
    return out


def _read_subframe(br: _Bits, blocksize: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise FlacError("flac: subframe padding bit set")
    t = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise FlacError("flac: wasted bits exceed sample size")
    if t == 0:  # CONSTANT
        x = np.full(blocksize, br.read_signed(eff), dtype=np.int64)
    elif t == 1:  # VERBATIM
        x = np.array([br.read_signed(eff) for _ in range(blocksize)], dtype=np.int64)
    elif 8 <= t <= 12:  # FIXED order 0-4
        order = t - 8
        warm = [br.read_signed(eff) for _ in range(order)]
        res = _read_residual(br, blocksize, order)
        coefs = _FIXED_COEFS[order]
        xs = list(warm)
        for r in res:
            pred = sum(c * xs[-1 - j] for j, c in enumerate(coefs))
            xs.append(pred + r)
        x = np.array(xs, dtype=np.int64)
    elif t >= 32:  # LPC, order = (t & 31) + 1
        order = (t & 0x1F) + 1
        warm = [br.read_signed(eff) for _ in range(order)]
        prec = br.read(4)
        if prec == 0xF:
            raise FlacError("flac: invalid LPC coefficient precision")
        prec += 1
        shift = br.read_signed(5)
        if shift < 0:
            raise FlacError("flac: negative LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _read_residual(br, blocksize, order)
        xs = list(warm)
        for r in res:
            acc = sum(c * xs[-1 - j] for j, c in enumerate(coefs))
            xs.append((acc >> shift) + r)
        x = np.array(xs, dtype=np.int64)
    else:
        raise FlacError(f"flac: reserved subframe type {t}")
    return x << wasted if wasted else x


def _parse_streaminfo(body: bytes) -> dict:
    if len(body) < 34:
        raise FlacError("flac: STREAMINFO shorter than 34 bytes")
    rate = (body[10] << 12) | (body[11] << 4) | (body[12] >> 4)
    channels = ((body[12] >> 1) & 0x07) + 1
    bps = (((body[12] & 1) << 4) | (body[13] >> 4)) + 1
    total = ((body[13] & 0x0F) << 32) | struct.unpack(">I", body[14:18])[0]
    return {
        "rate": rate,
        "channels": channels,
        "bps": bps,
        "total_samples": total,
        "md5": body[18:34],
    }


def decode_pcm(data: bytes) -> tuple[dict, np.ndarray]:
    """FLAC bytes -> (streaminfo dict, int32 samples shaped (n, channels)).

    Verifies every frame-header CRC-8, every frame CRC-16, and — when
    STREAMINFO carries a nonzero MD5 — the whole-stream MD5 of the
    decoded PCM, the format's own end-to-end losslessness check."""
    if data[:4] != b"fLaC":
        raise FlacError("flac: missing fLaC marker")
    pos, info = 4, None
    while True:
        if pos + 4 > len(data):
            raise FlacError("flac: truncated metadata block header")
        hdr = data[pos]
        blen = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + blen]
        if len(body) < blen:
            raise FlacError("flac: truncated metadata block")
        if hdr & 0x7F == 0:
            info = _parse_streaminfo(body)
        elif hdr & 0x7F == 127:
            raise FlacError("flac: invalid metadata block type 127")
        pos += 4 + blen
        if hdr & 0x80:
            break
    if info is None:
        raise FlacError("flac: missing STREAMINFO")
    nch, bps_s = info["channels"], info["bps"]
    chans: list[list[int]] = [[] for _ in range(nch)]
    n_done = 0
    total = info["total_samples"]
    while pos < len(data) and (total == 0 or n_done < total):
        frame_start = pos
        br = _Bits(data, pos * 8)
        sync = br.read(14)
        if sync != 0x3FFE:
            raise FlacError(f"flac: lost frame sync at byte {pos}")
        if br.read(1):
            raise FlacError("flac: reserved frame-header bit set")
        br.read(1)  # blocking strategy (frame- vs sample-numbered)
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        if br.read(1):
            raise FlacError("flac: reserved frame-header bit set")
        _read_utf8_number(br)
        if bs_code == 0:
            raise FlacError("flac: reserved block size code 0")
        elif bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        else:
            blocksize = _BLOCK_SIZES[bs_code]
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        elif sr_code == 15:
            raise FlacError("flac: invalid sample rate code 15")
        bps = _SAMPLE_SIZES.get(ss_code, info["bps"]) if ss_code else info["bps"]
        if ss_code in (3, 7):
            raise FlacError(f"flac: reserved sample size code {ss_code}")
        hdr_end = br.pos >> 3
        if _crc8(data[frame_start:hdr_end]) != br.read(8):
            raise FlacError("flac: frame header CRC-8 mismatch")
        if ch_code < 8:
            if ch_code + 1 != nch:
                raise FlacError("flac: frame channel count != STREAMINFO")
            subs = [_read_subframe(br, blocksize, bps) for _ in range(nch)]
        elif ch_code in (8, 9, 10):
            if nch != 2:
                raise FlacError("flac: stereo decorrelation in non-stereo stream")
            extra0 = 1 if ch_code == 9 else 0  # side channel carries bps+1
            extra1 = 1 if ch_code in (8, 10) else 0
            a = _read_subframe(br, blocksize, bps + extra0)
            b = _read_subframe(br, blocksize, bps + extra1)
            if ch_code == 8:  # left/side: right = left - side
                subs = [a, a - b]
            elif ch_code == 9:  # right/side: left = right + side
                subs = [b + a, b]
            else:  # mid/side
                mid2 = (a << 1) | (b & 1)
                subs = [(mid2 + b) >> 1, (mid2 - b) >> 1]
        else:
            raise FlacError(f"flac: reserved channel assignment {ch_code}")
        br.align()
        crc_end = br.pos >> 3
        if _crc16(data[frame_start:crc_end]) != br.read(16):
            raise FlacError("flac: frame CRC-16 mismatch")
        take = blocksize
        if info["total_samples"]:
            take = min(blocksize, info["total_samples"] - n_done)
        for c in range(nch):
            chans[c].extend(int(v) for v in subs[c][:take])
        n_done += take
        pos = br.pos >> 3
    out = np.array(chans, dtype=np.int64).T.copy() if nch else np.empty((0, 0))
    if info["total_samples"] and n_done < info["total_samples"]:
        raise FlacError(
            f"flac: stream ends early ({n_done}/{info['total_samples']} samples)"
        )
    if info["md5"] != b"\x00" * 16:
        width = (bps_s + 7) // 8
        h = hashlib.md5()
        inter = out.reshape(-1)
        # little-endian signed, channel-interleaved — the format's PCM layout
        h.update(
            b"".join(
                int(v).to_bytes(width, "little", signed=True) for v in inter
            )
        )
        if h.digest() != info["md5"]:
            raise FlacError("flac: decoded PCM fails the STREAMINFO MD5")
    return info, out.astype(np.int64)


def decode(data: bytes) -> tuple[int, np.ndarray]:
    """FLAC bytes -> (sample_rate, mono float64 in [-1, 1]) — the
    audio-dispatch signature shared with functions/mp3.decode; stereo
    downmixes to the channel mean."""
    info, pcm = decode_pcm(data)
    scale = float(1 << (info["bps"] - 1))
    x = pcm.astype(np.float64) / scale
    return info["rate"], x.mean(axis=1) if x.ndim == 2 and x.shape[1] > 1 else x.reshape(-1)


# --- encoder (fixtures + synthetic corpus) ----------------------------------


def _best_rice_param(res: np.ndarray, pbits: int = 4) -> int:
    if len(res) == 0:
        return 0
    mean = float(np.abs(res).mean())
    p = max(0, int(np.log2(mean + 1.0)) if mean > 0 else 0)
    return min(p, (1 << pbits) - 2)


def _write_residual(
    bw: _BitWriter,
    res: np.ndarray,
    order: int = 0,
    blocksize: int | None = None,
    po: int = 0,
    escape_bits: int | None = None,
) -> None:
    """Rice-code a residual. po > 0 splits into 2^po partitions (the
    first one short by `order`); escape_bits forces the raw-binary
    escape path — both are decoder-coverage knobs for fixtures."""
    bw.write(0, 2)  # 4-bit Rice
    bw.write(po, 4)
    if blocksize is None:
        blocksize = len(res) + order
    part_len = blocksize >> po
    start = 0
    for p in range(1 << po):
        n = part_len - (order if p == 0 else 0)
        part = res[start : start + n]
        start += n
        if escape_bits is not None:
            bw.write(0xF, 4)
            bw.write(escape_bits, 5)
            for v in part:
                bw.write(int(v), escape_bits)
            continue
        param = _best_rice_param(part)
        bw.write(param, 4)
        for v in part:
            v = int(v)
            z = (v << 1) if v >= 0 else ((-v) << 1) - 1  # zigzag
            bw.write_unary(z >> param)
            bw.write(z & ((1 << param) - 1), param)


def _encode_subframe(
    bw: _BitWriter,
    x: np.ndarray,
    bps: int,
    force: str | None = None,
    po: int = 0,
    escape_bits: int | None = None,
) -> None:
    x = x.astype(np.int64)
    if force == "verbatim":
        bw.write(0, 1)
        bw.write(1, 6)  # VERBATIM
        bw.write(0, 1)
        for v in x:
            bw.write(int(v), bps)
        return
    if force == "lpc":
        # order-2 LPC with coefficients [2, -1], shift 0 — numerically
        # identical to FIXED order 2, but exercises the general LPC
        # bitstream path (precision/shift/coefficient fields)
        order = 2
        bw.write(0, 1)
        bw.write(32 + order - 1, 6)
        bw.write(0, 1)
        for w in x[:order]:
            bw.write(int(w), bps)
        bw.write(3, 4)   # precision-1 -> 4-bit coefficients
        bw.write(0, 5)   # shift 0
        bw.write(2, 4)
        bw.write(-1, 4)
        res = np.diff(np.diff(x))
        _write_residual(bw, res, order, len(x), po, escape_bits)
        return
    if len(x) and np.all(x == x[0]):
        bw.write(0, 1)
        bw.write(0, 6)  # CONSTANT
        bw.write(0, 1)
        bw.write(int(x[0]), bps)
        return
    # pick the cheapest of fixed orders 0-2 by residual magnitude
    best_o, best_res, best_cost = 0, x, float(np.abs(x).sum())
    for o in (1, 2):
        if len(x) <= o:
            break
        res = x.copy()
        for _ in range(o):
            res = np.diff(res)
        cost = float(np.abs(res).sum())
        if cost < best_cost:
            best_o, best_res, best_cost = o, res, cost
    # verbatim beats a fixed predictor on incompressible input
    if best_cost > float(np.abs(x).sum()) and best_o:
        best_o, best_res = 0, x
    bw.write(0, 1)
    bw.write(8 + best_o, 6)  # FIXED order
    bw.write(0, 1)
    for w in x[:best_o]:
        bw.write(int(w), bps)
    _write_residual(bw, best_res if best_o else x, best_o, len(x), po, escape_bits)


def encode(
    pcm: np.ndarray,
    rate: int = 8000,
    bps: int = 16,
    block_size: int = 4096,
    stereo_mode: str = "independent",
    subframe: str | None = None,
    rice_po: int = 0,
    rice_escape_bits: int | None = None,
) -> bytes:
    """Int samples shaped (n,) or (n, channels) -> FLAC bytes.

    `stereo_mode`: 'independent', 'left_side', 'right_side', or
    'mid_side' — the decorrelation variants the decoder must invert.
    `subframe='verbatim'` forces raw subframes (decoder-coverage knob).
    MD5-stamps STREAMINFO so every decode self-verifies."""
    pcm = np.asarray(pcm, dtype=np.int64)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    n, nch = pcm.shape
    if nch > 2:
        raise FlacError("flac encoder: at most 2 channels")
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if pcm.min(initial=0) < lo or pcm.max(initial=0) > hi:
        raise FlacError(f"flac encoder: samples exceed {bps}-bit range")
    width = (bps + 7) // 8
    md5 = hashlib.md5(
        b"".join(int(v).to_bytes(width, "little", signed=True) for v in pcm.reshape(-1))
    ).digest()
    si = bytearray(34)
    si[0:2] = struct.pack(">H", min(block_size, n) or 16)
    si[2:4] = struct.pack(">H", block_size)
    si[10] = (rate >> 12) & 0xFF
    si[11] = (rate >> 4) & 0xFF
    si[12] = ((rate & 0x0F) << 4) | ((nch - 1) << 1) | ((bps - 1) >> 4)
    si[13] = (((bps - 1) & 0x0F) << 4) | ((n >> 32) & 0x0F)
    si[14:18] = struct.pack(">I", n & 0xFFFFFFFF)
    si[18:34] = md5
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(si).to_bytes(3, "big") + si
    frame_no = 0
    for start in range(0, n, block_size):
        blk = pcm[start : start + block_size]
        bs = len(blk)
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocking: frame number
        bw.write(7, 4)  # block size: 16-bit at end of header
        bw.write(0, 4)  # sample rate: from STREAMINFO
        if nch == 2 and stereo_mode != "independent":
            code = {"left_side": 8, "right_side": 9, "mid_side": 10}[stereo_mode]
        else:
            code = nch - 1
        bw.write(code, 4)
        bw.write(0, 3)  # sample size: from STREAMINFO
        bw.write(0, 1)
        for b in _utf8_number(frame_no):
            bw.write(b, 8)
        bw.write(bs - 1, 16)
        hdr = bytes(bw.buf)
        bw.write(_crc8(hdr), 8)
        kw = dict(po=rice_po if len(blk) % (1 << rice_po) == 0 else 0,
                  escape_bits=rice_escape_bits)
        if code < 8:
            for c in range(nch):
                _encode_subframe(bw, blk[:, c], bps, subframe, **kw)
        else:
            l, r = blk[:, 0], blk[:, 1]
            side = l - r
            if code == 8:
                _encode_subframe(bw, l, bps, subframe, **kw)
                _encode_subframe(bw, side, bps + 1, subframe, **kw)
            elif code == 9:
                _encode_subframe(bw, side, bps + 1, subframe, **kw)
                _encode_subframe(bw, r, bps, subframe, **kw)
            else:
                mid = (l + r) >> 1
                _encode_subframe(bw, mid, bps, subframe, **kw)
                _encode_subframe(bw, side, bps + 1, subframe, **kw)
        bw.align()
        body = bytes(bw.buf)
        bw.write(_crc16(body), 16)
        out += bw.bytes()
        frame_no += 1
    return bytes(out)
