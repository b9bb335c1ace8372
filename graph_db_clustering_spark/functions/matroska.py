"""Pure-Python Matroska / WebM header prober (EBML, RFC 8794 +
the public Matroska element registry).

Round 11: completes the crawled-video probe set (MP4 ✓ AVI ✓ GIF ✓ —
WebM is the remaining dominant container). HEADER-ONLY by design:
the filter-before-decode step walks EBML elements — vint IDs/sizes,
the EBML head, Segment > Info (TimecodeScale, Duration) and
Segment > Tracks (TrackType, CodecID, Video PixelWidth/Height,
Audio SamplingFrequency/Channels) — and SKIPS Clusters entirely, so
a probe reads a few hundred bytes no matter how many gigabytes of
VP9 follow. There is deliberately no frame decoder here: every codec
WebM carries (VP8/VP9/AV1/Opus/Vorbis-in-webm lacing) is interframe
or needs its own packet layer; `frame_sample` keeps naming the codec
in its gate.

The :func:`encode` muxer writes a minimal spec-valid WebM skeleton
(EBML head + Segment with Info/Tracks and an empty Cluster) for
fixtures — enough for the probe path and for container-dispatch
tests, carrying a declared codec ID without any media payload.

Reference provenance: the reference repo has no video path; this is
north-star multimodal-pipeline scope.
"""

from __future__ import annotations

import struct


class MatroskaError(ValueError):
    pass


EBML_HEAD = 0x1A45DFA3
SEGMENT = 0x18538067
INFO = 0x1549A966
TIMECODE_SCALE = 0x2AD7B1
DURATION = 0x4489
TRACKS = 0x1654AE6B
TRACK_ENTRY = 0xAE
TRACK_TYPE = 0x83
CODEC_ID = 0x86
VIDEO = 0xE0
PIXEL_WIDTH = 0xB0
PIXEL_HEIGHT = 0xBA
AUDIO = 0xE1
SAMPLING_FREQ = 0xB5
CHANNELS = 0x9F
CLUSTER = 0x1F43B673
DOCTYPE = 0x4282


def _read_vint(data: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    """EBML variable-length integer at pos -> (value, new_pos)."""
    if pos >= len(data):
        raise MatroskaError("ebml: truncated vint")
    first = data[pos]
    if first == 0:
        raise MatroskaError("ebml: invalid vint (leading byte 0)")
    length = 8 - first.bit_length() + 1
    if pos + length > len(data):
        raise MatroskaError("ebml: vint overruns buffer")
    v = first if keep_marker else first & ((1 << (8 - length)) - 1)
    for i in range(1, length):
        v = (v << 8) | data[pos + i]
    return v, pos + length


def _elements(data: bytes, pos: int, end: int):
    """Yield (element_id, body_start, body_end) for siblings in
    data[pos:end]; unknown-size elements extend to the parent end."""
    while pos < end:
        eid, pos = _read_vint(data, pos, keep_marker=True)
        size, pos = _read_vint(data, pos, keep_marker=False)
        body_end = pos + size
        if body_end > end:
            body_end = end  # tolerate unknown/overlong (streaming webm)
        yield eid, pos, body_end
        pos = body_end


def _uint(data: bytes, start: int, end: int) -> int:
    v = 0
    for b in data[start:end]:
        v = (v << 8) | b
    return v


def _float(data: bytes, start: int, end: int) -> float:
    n = end - start
    if n == 4:
        return struct.unpack(">f", data[start:end])[0]
    if n == 8:
        return struct.unpack(">d", data[start:end])[0]
    raise MatroskaError(f"ebml: float of width {n}")


def probe(data: bytes) -> dict:
    """Header-only metadata -> {container, doctype, duration_s,
    tracks: [{type ('video'|'audio'|other int), codec, width, height,
    sample_rate, channels}]}. Never parses Clusters."""
    if data[:4] != EBML_HEAD.to_bytes(4, "big"):
        raise MatroskaError("ebml: missing EBML head")
    doctype = None
    segment = None
    for eid, b, e in _elements(data, 0, len(data)):
        if eid == EBML_HEAD:
            for cid, cb, ce in _elements(data, b, e):
                if cid == DOCTYPE:
                    doctype = data[cb:ce].decode("latin-1").rstrip("\x00")
        elif eid == SEGMENT:
            segment = (b, e)
            break
    if segment is None:
        raise MatroskaError("ebml: no Segment element")
    timescale = 1_000_000  # ns per tick, Matroska default
    duration_ticks = None
    tracks = []
    for eid, b, e in _elements(data, *segment):
        if eid == CLUSTER:
            break  # media data begins; headers precede it
        if eid == INFO:
            for cid, cb, ce in _elements(data, b, e):
                if cid == TIMECODE_SCALE:
                    timescale = _uint(data, cb, ce)
                elif cid == DURATION:
                    duration_ticks = _float(data, cb, ce)
        elif eid == TRACKS:
            for cid, cb, ce in _elements(data, b, e):
                if cid != TRACK_ENTRY:
                    continue
                t: dict = {
                    "type": None, "codec": None, "width": None,
                    "height": None, "sample_rate": None,
                    "channels": None,
                }
                for tid, tb, te in _elements(data, cb, ce):
                    if tid == TRACK_TYPE:
                        tt = _uint(data, tb, te)
                        t["type"] = {1: "video", 2: "audio"}.get(tt, tt)
                    elif tid == CODEC_ID:
                        t["codec"] = (
                            data[tb:te].decode("latin-1").rstrip("\x00")
                        )
                    elif tid == VIDEO:
                        for vid, vb, ve in _elements(data, tb, te):
                            if vid == PIXEL_WIDTH:
                                t["width"] = _uint(data, vb, ve)
                            elif vid == PIXEL_HEIGHT:
                                t["height"] = _uint(data, vb, ve)
                    elif tid == AUDIO:
                        for aid, ab, ae in _elements(data, tb, te):
                            if aid == SAMPLING_FREQ:
                                t["sample_rate"] = _float(data, ab, ae)
                            elif aid == CHANNELS:
                                t["channels"] = _uint(data, ab, ae)
                tracks.append(t)
    duration_s = (
        duration_ticks * timescale / 1e9
        if duration_ticks is not None
        else None
    )
    return {
        "container": "webm" if doctype == "webm" else "matroska",
        "doctype": doctype,
        "duration_s": duration_s,
        "tracks": tracks,
    }


def _vint_size(v: int) -> bytes:
    """Encode a SIZE as a minimal EBML vint."""
    for length in range(1, 9):
        if v < (1 << (7 * length)) - 1:
            out = v | (1 << (7 * length))
            return out.to_bytes(length, "big")
    raise MatroskaError("ebml: size too large")


def _el(eid: int, body: bytes) -> bytes:
    nid = max((eid.bit_length() + 7) // 8, 1)
    return eid.to_bytes(nid, "big") + _vint_size(len(body)) + body


def _el_uint(eid: int, v: int) -> bytes:
    n = max((v.bit_length() + 7) // 8, 1)
    return _el(eid, v.to_bytes(n, "big"))


def encode(
    codec: str = "V_VP9",
    width: int = 640,
    height: int = 360,
    duration_s: float = 1.0,
    doctype: str = "webm",
) -> bytes:
    """Minimal spec-valid WebM/Matroska skeleton for fixtures: EBML
    head, Segment with Info (default timescale, Duration) and one
    video TrackEntry, plus one empty Cluster."""
    head = _el(EBML_HEAD, b"".join([
        _el_uint(0x4286, 1),          # EBMLVersion
        _el_uint(0x42F7, 1),          # EBMLReadVersion
        _el_uint(0x42F2, 4),          # EBMLMaxIDLength
        _el_uint(0x42F3, 8),          # EBMLMaxSizeLength
        _el(DOCTYPE, doctype.encode()),
        _el_uint(0x4287, 2),          # DocTypeVersion
        _el_uint(0x4285, 2),          # DocTypeReadVersion
    ]))
    info = _el(INFO, b"".join([
        _el_uint(TIMECODE_SCALE, 1_000_000),
        _el(DURATION, struct.pack(">d", duration_s * 1000.0)),
    ]))
    track = _el(TRACKS, _el(TRACK_ENTRY, b"".join([
        _el_uint(0xD7, 1),            # TrackNumber
        _el_uint(0x73C5, 1),          # TrackUID
        _el_uint(TRACK_TYPE, 1),
        _el(CODEC_ID, codec.encode()),
        _el(VIDEO, _el_uint(PIXEL_WIDTH, width)
            + _el_uint(PIXEL_HEIGHT, height)),
    ])))
    cluster = _el(CLUSTER, _el_uint(0xE7, 0))  # Timecode 0, no blocks
    return head + _el(SEGMENT, info + track + cluster)
