"""Pure-Python AVI (RIFF) video container: MJPEG and uncompressed frames.

Second REAL video container for the frame-sampling path (after GIF,
functions/gif): Motion-JPEG AVIs carry one complete JPEG per ``00dc``
chunk, which the package's own baseline/progressive JPEG decoder
(functions/jpeg) already handles — so MJPEG decode needs only the RIFF
chunk walk here. Uncompressed ``BI_RGB`` DIB frames (bottom-up,
BGR, 4-byte-aligned rows) decode with a NumPy reshape. Interframe codecs
(H.264/VP9/...) keep the codec gate: they need entropy decoders far
beyond container parsing, and no codec library ships in this container.

The writer emits the same two flavors — enough to build deterministic
fixtures and to re-containerize sampled frames without any media library.

Reference note: the reference repo has no video path at all; this module
is north-star scope (multimodal columns for training-data pipelines),
not reference parity.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np

_BI_RGB = 0
_MJPG_FOURCCS = {b"MJPG", b"mjpg", b"AVI1", b"dmb1"}


class AviError(ValueError):
    pass


def _chunks(data: bytes, start: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """Walk RIFF chunks in data[start:end] -> (fourcc, body_start, size).
    Chunk bodies are word-aligned: odd sizes carry one pad byte."""
    pos = start
    while pos + 8 <= end:
        fourcc, size = data[pos : pos + 4], struct.unpack(
            "<I", data[pos + 4 : pos + 8]
        )[0]
        body = pos + 8
        if body + size > end:
            raise AviError(f"chunk {fourcc!r} overruns container")
        yield fourcc, body, size
        pos = body + size + (size & 1)


def _find_lists(data: bytes, start: int, end: int, list_type: bytes):
    for fourcc, body, size in _chunks(data, start, end):
        if fourcc == b"LIST" and data[body : body + 4] == list_type:
            yield body + 4, body + size


def _video_format(
    data: bytes, hdrl: tuple[int, int]
) -> tuple[int, int, int, bytes]:
    """First 'vids' stream's BITMAPINFOHEADER -> (stream_index, width,
    height, compression fourcc; b'\\x00'*4 for BI_RGB). The stream index
    is the strl list's POSITION — movi chunk ids are '{NN}dc', so an AVI
    whose audio stream is declared first carries video as '01dc'."""
    for idx, (s, e) in enumerate(_find_lists(data, hdrl[0], hdrl[1], b"strl")):
        strh = strf = None
        for fourcc, body, size in _chunks(data, s, e):
            if fourcc == b"strh":
                strh = (body, size)
            elif fourcc == b"strf":
                strf = (body, size)
        if strh is None or data[strh[0] : strh[0] + 4] != b"vids":
            continue
        if strf is None or strf[1] < 40:
            raise AviError("vids stream without BITMAPINFOHEADER")
        b = strf[0]
        w, h = struct.unpack("<ii", data[b + 4 : b + 12])
        comp = data[b + 16 : b + 20]
        # 8-bit palette (BGRX quads after the 40-byte header), if any
        bpp = struct.unpack("<H", data[b + 14 : b + 16])[0]
        n_colors = struct.unpack("<I", data[b + 32 : b + 36])[0]
        if bpp == 8 and not n_colors:
            n_colors = 256
        pal = None
        if bpp == 8 and strf[1] >= 40 + 4 * n_colors:
            import numpy as _np

            quads = _np.frombuffer(
                data[b + 40 : b + 40 + 4 * n_colors], dtype=_np.uint8
            ).reshape(-1, 4)
            pal = _np.zeros((256, 3), dtype=_np.uint8)
            pal[:n_colors] = quads[:, [2, 1, 0]]  # BGRX -> RGB
        return idx, w, h, comp, pal
    raise AviError("no video ('vids') stream in AVI")


def _decode_dib(body: bytes, w: int, h: int) -> np.ndarray:
    """BI_RGB DIB -> HxWx3 RGB uint8. Positive biHeight = bottom-up rows,
    BGR byte order, rows padded to 4-byte boundaries (the DIB spec)."""
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    if len(body) < stride * h:
        raise AviError("DIB frame shorter than stride*height")
    rows = np.frombuffer(body[: stride * h], dtype=np.uint8).reshape(h, stride)
    img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return (img[::-1] if flip else img).copy()


def frames(data: bytes) -> list[np.ndarray]:
    """AVI bytes -> list of HxWx3 uint8 RGB frames (MJPEG or BI_RGB)."""
    try:
        return _frames_inner(data)
    except (IndexError, KeyError, struct.error) as e:
        raise AviError(f"AVI: truncated or corrupt container ({e!r})")


def _frames_inner(data: bytes) -> list[np.ndarray]:
    from graph_db_clustering_spark.functions import jpeg

    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise AviError("not an AVI (RIFF/'AVI ' header missing)")
    top = (12, 8 + struct.unpack("<I", data[4:8])[0])
    hdrl = next(iter(_find_lists(data, *top, b"hdrl")), None)
    movi = next(iter(_find_lists(data, *top, b"movi")), None)
    if hdrl is None or movi is None:
        raise AviError("AVI missing hdrl/movi list")
    sidx, w, h, comp, pal = _video_format(data, hdrl)
    is_mjpg = comp in _MJPG_FOURCCS
    comp_val = struct.unpack("<I", comp)[0] if not is_mjpg else None
    is_rle8 = comp_val == 1 or comp in (b"mrle", b"MRLE", b"RLE8")
    if is_rle8 and pal is None:
        raise AviError("AVI MS-RLE8 stream without an 8-bit palette")
    if not is_mjpg and not is_rle8 and comp_val != _BI_RGB:
        raise NotImplementedError(
            f"AVI codec {comp!r}: MJPG, uncompressed BI_RGB and MS-RLE8 "
            "decode natively; other interframe codecs need a codec "
            "library (PyAV/ffmpeg)"
        )
    rle_canvas = [None]  # MS-RLE interframes update the prior raster
    vid_id = b"%02d" % sidx  # movi chunk prefix for the video stream
    out: list[np.ndarray] = []

    def walk(start: int, end: int) -> None:
        for fourcc, body, size in _chunks(data, start, end):
            # interleaved AVIs nest frame chunks inside 'LIST rec ' groups
            if fourcc == b"LIST" and data[body : body + 4] == b"rec ":
                walk(body + 4, body + size)
                continue
            if fourcc[:2] != vid_id or fourcc[2:] not in (b"dc", b"db"):
                continue
            payload = data[body : body + size]
            if not size:
                continue  # dropped-frame placeholder
            if is_mjpg:
                img = jpeg.decode(bytes(payload))
                if img.ndim == 2:
                    img = np.repeat(img[:, :, None], 3, axis=2)
                out.append(img)
            elif is_rle8:
                from graph_db_clustering_spark.functions.simple_images import (
                    _unrle8,
                )

                rle_canvas[0] = _unrle8(
                    bytes(payload), w, abs(h), canvas=rle_canvas[0]
                )
                out.append(pal[rle_canvas[0]])
            else:
                out.append(_decode_dib(payload, w, h))

    walk(*movi)
    return out


# ---------------------------------------------------------------------------
# Writer — deterministic fixtures / re-containerizing sampled frames
# ---------------------------------------------------------------------------


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    return fourcc + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode(
    frame_data: list[bytes] | list[np.ndarray],
    width: int | None = None,
    height: int | None = None,
    fps: int = 10,
    mjpg: bool | None = None,
) -> bytes:
    """Build an AVI. Two input flavors:
      - list of HxWx3 uint8 arrays -> uncompressed BI_RGB DIB frames;
      - list of JPEG byte strings (+ explicit width/height) -> MJPEG.
    """
    if mjpg is None:
        mjpg = bool(frame_data) and isinstance(frame_data[0], (bytes, bytearray))
    if mjpg:
        if width is None or height is None:
            raise AviError("MJPEG encode needs explicit width/height")
        payloads = [bytes(f) for f in frame_data]
        comp, fourcc, size_image = b"MJPG", b"00dc", max(map(len, payloads))
    else:
        arrs = [np.asarray(f, dtype=np.uint8) for f in frame_data]
        if not arrs:
            raise AviError("cannot encode an empty frame list")
        height, width = arrs[0].shape[:2]
        stride = (width * 3 + 3) & ~3
        payloads = []
        for a in arrs:
            if a.shape != (height, width, 3):
                raise AviError("all frames must share one HxWx3 shape")
            rows = np.zeros((height, stride), dtype=np.uint8)
            rows[:, : width * 3] = a[::-1, :, ::-1].reshape(height, width * 3)
            payloads.append(rows.tobytes())
        comp, fourcc, size_image = b"\x00" * 4, b"00db", stride * height

    avih = struct.pack(
        "<14I",
        1_000_000 // fps, 0, 0, 0x10, len(payloads), 0, 1, size_image,
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids"
        + (comp if mjpg else b"DIB ")
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(payloads),
                      size_image, 0, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, comp if mjpg else b"\x00" * 4,
        size_image, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(fourcc, p) for p in payloads))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
