"""Pure-Python/NumPy GIF decoder (and a minimal encoder for tests).

Completes the no-dependency codec set (functions/jpeg, functions/png):
GIF's only compression is LZW over palette indices — fully decodable
with stdlib-level code — and it is the one legacy format that carries
ANIMATION, which makes the multimodal `frame_sample` operator real for
at least one container instead of a pure stub: every GIF frame is a
composited logical-screen image, and sampling every Nth frame is exact.

Supported: GIF87a + GIF89a, global/local color tables, interlaced
images (the 4-pass row order), multi-frame animations with all four
disposal methods — 0/1 (leave in place), 2 (restore background), 3
(restore previous, via a one-deep pre-draw snapshot of the frame
region) — and transparency via the Graphic Control Extension. Other
extension blocks are skipped per spec. No format gates remain.

decode(data)  -> first frame as HxWx3 uint8 (the image-column dispatch)
frames(data)  -> list of HxWx3 uint8 composited frames
"""

from __future__ import annotations

import struct

import numpy as np

_SIG87, _SIG89 = b"GIF87a", b"GIF89a"


# ---------------------------------------------------------------------------
# LZW (GIF variant: variable code width, clear + EOI codes)
# ---------------------------------------------------------------------------


def _lzw_decode(min_code_size: int, data: bytes, expected: int) -> np.ndarray:
    """GIF LZW: codes grow from min_code_size+1 up to 12 bits; CLEAR
    resets the table, EOI ends the stream. Returns `expected` indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(expected, dtype=np.uint8)
    n_out = 0

    def reset():
        return {i: bytes([i]) for i in range(clear)}, clear + 2, min_code_size + 1

    table, next_code, width = reset()
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table, next_code, width = reset()
                prev = None
                continue
            if code == eoi:
                return out[:n_out]
            if prev is None:
                entry = table[code]
            elif code in table:
                entry = table[code]
                table[next_code] = prev + entry[:1]
                next_code += 1
            elif code == next_code:
                entry = prev + prev[:1]  # the KwKwK case
                table[next_code] = entry
                next_code += 1
            else:
                raise ValueError(f"GIF: bad LZW code {code}")
            take = min(len(entry), expected - n_out)
            out[n_out : n_out + take] = np.frombuffer(entry[:take], dtype=np.uint8)
            n_out += take
            if n_out >= expected:
                return out
            prev = entry
            if next_code == (1 << width) and width < 12:
                width += 1
    return out[:n_out]


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """GIF LZW encoder (for test fixtures): emits CLEAR, codes with
    growing width, EOI."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = clear + 2
    width = min_code_size + 1
    emit(clear, width)
    prev = b""
    for b in indices:
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        table[cur] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:  # table full: reset (keeps the encoder simple)
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = clear + 2
            width = min_code_size + 1
        prev = bytes([b])
    if prev:
        emit(table[prev], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# GIF interlace: rows appear in 4 passes (start, step)
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = np.concatenate(
        [np.arange(s, h, p) for s, p in _INTERLACE]
    )
    out = np.empty_like(rows)
    out[order] = rows
    return out


def frames(data: bytes) -> list[np.ndarray]:
    """GIF bytes -> list of composited HxWx3 uint8 frames."""
    try:
        return _frames_inner(data)
    except (IndexError, KeyError, struct.error) as e:
        # truncated/corrupt streams must fail CONTROLLED, not crash a task
        raise ValueError(f"GIF: truncated or corrupt stream ({e!r})")


def _frames_inner(data: bytes) -> list[np.ndarray]:
    if data[:6] not in (_SIG87, _SIG89):
        raise ValueError("GIF: bad signature")
    width, height, flags, bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
        pos += 3 * n
    canvas = np.zeros((height, width, 3), dtype=np.uint8)
    if gct is not None and bg < len(gct):
        canvas[:, :] = gct[bg]
    bg_canvas = canvas.copy()
    out: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = data[pos]
                packed = data[pos + 1]
                disposal = (packed >> 2) & 0x7
                transparent = data[pos + 4] if packed & 1 else None
                pos += 1 + size
            else:  # skip any other extension's sub-blocks
                while data[pos] != 0:
                    pos += 1 + data[pos]
            pos += 1  # block terminator
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unexpected block 0x{block:02x}")
        left, top, w, h, iflags = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        table = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            table = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("GIF: image without any color table")
        min_code = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos] != 0:
            size = data[pos]
            lzw.extend(data[pos + 1 : pos + 1 + size])
            pos += 1 + size
        pos += 1  # terminator
        idx = _lzw_decode(min_code, bytes(lzw), w * h)
        if idx.size != w * h:
            raise ValueError(f"GIF: LZW produced {idx.size} of {w * h} pixels")
        idx = idx.reshape(h, w)
        if iflags & 0x40:
            idx = _deinterlace(idx)
        # disposal 3 (restore previous): snapshot before drawing, revert
        # after this frame is emitted — the 89a spec's stack is one deep
        prev = canvas[top : top + h, left : left + w].copy() if disposal == 3 else None
        region = canvas[top : top + h, left : left + w]
        rgb = table[np.minimum(idx, len(table) - 1)]
        if transparent is not None:
            mask = (idx != transparent)[..., None]
            region[:] = np.where(mask, rgb, region)
        else:
            region[:] = rgb
        out.append(canvas.copy())
        if disposal == 2:  # restore background in the frame's region
            canvas[top : top + h, left : left + w] = bg_canvas[
                top : top + h, left : left + w
            ]
        elif disposal == 3:
            canvas[top : top + h, left : left + w] = prev
        # a Graphic Control Extension governs ONLY the next render block
        # (89a spec 23.c.xii) — a GCE-less follow-up frame must not
        # inherit stale disposal/transparency
        transparent = None
        disposal = 0
    return out


def decode(data: bytes) -> np.ndarray:
    """First frame as HxWx3 uint8 (the still-image dispatch path)."""
    fs = frames(data)
    if not fs:
        raise ValueError("GIF: no image data")
    return fs[0]


# ---------------------------------------------------------------------------
# minimal encoder — test fixture generator
# ---------------------------------------------------------------------------


def encode(
    frame_indices: list[np.ndarray],
    palette: np.ndarray,
    interlace: bool = False,
    transparent: int | None = None,
    disposal: int = 0,
) -> bytes:
    """Palette-index frames (each HxW uint8, full logical screen) + an
    (n,3) palette -> animated GIF89a bytes."""
    palette = np.asarray(palette, dtype=np.uint8)
    h, w = frame_indices[0].shape
    bits = max(1, int(np.ceil(np.log2(max(len(palette), 2)))))
    n = 1 << bits
    pal = np.zeros((n, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    out = bytearray(_SIG89)
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += pal.tobytes()
    min_code = max(2, bits)
    for fi in frame_indices:
        if transparent is not None or disposal:
            packed = (disposal & 0x7) << 2 | (1 if transparent is not None else 0)
            out += bytes([0x21, 0xF9, 4, packed, 0, 0, transparent or 0, 0])
        out += bytes([0x2C]) + struct.pack(
            "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
        )
        idx = fi
        if interlace:
            order = np.concatenate([np.arange(s, h, p) for s, p in _INTERLACE])
            idx = fi[order]
        out.append(min_code)
        lzw = _lzw_encode(min_code, idx.astype(np.uint8).tobytes())
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def frame_count_and_duration(data: bytes) -> tuple[int, float | None]:
    """Header-only frame count + total duration (sum of GCE delays,
    1/100 s units; None when no frame carries a delay): walks the block
    structure skipping LZW sub-blocks WITHOUT decoding — the
    video_probe path for animated GIFs."""
    if data[:6] not in (_SIG87, _SIG89):
        raise ValueError("GIF: bad signature")
    flags = data[10]
    pos = 13
    if flags & 0x80:
        pos += 3 * (2 << (flags & 0x07))
    n, total_cs, any_delay = 0, 0, False
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:
            label = data[pos]
            pos += 1
            if label == 0xF9:
                size = data[pos]
                delay = struct.unpack("<H", data[pos + 2 : pos + 4])[0]
                if delay:
                    any_delay = True
                total_cs += delay
                pos += 1 + size
            else:
                while data[pos] != 0:
                    pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unexpected block 0x{block:02x}")
        iflags = data[pos + 8]
        pos += 9
        if iflags & 0x80:
            pos += 3 * (2 << (iflags & 0x07))
        pos += 1  # LZW min code size
        while data[pos] != 0:
            pos += 1 + data[pos]
        pos += 1
        n += 1
    return n, (total_cs / 100.0) if any_delay else None
