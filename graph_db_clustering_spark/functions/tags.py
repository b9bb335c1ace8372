"""Audio metadata tags, header-only: ID3v2 (MP3), Vorbis comments
(Ogg), and the MP4/M4A ilst atom — plus fixture writers.

Round 11: the metadata half of the audio-crawl story. A training
pipeline filters/derives on title/artist/album/year long before it
decodes a single sample; all three dominant tag formats are public
specs:

- ID3v2.3/2.4 (id3.org): 10-byte header with a synchsafe size, then
  frames `TIT2`/`TPE1`/`TALB`/`TDRC`|`TYER`... each a 10-byte frame
  header + an encoding byte (0 latin-1, 1 UTF-16 w/ BOM, 3 UTF-8) +
  text. The writer emits v2.4 UTF-8 frames.
- Vorbis comments (Xiph): the Ogg stream's SECOND packet —
  vendor string + N `KEY=value` UTF-8 entries. Reused for the tag
  surface of any Ogg stream (Vorbis, and the same structure inside
  Opus' OpusTags).
- MP4 ilst (iTunes-style, QuickTime metadata spec): moov > udta >
  meta > ilst > ©nam/©ART/©alb/©day atoms, each wrapping a `data`
  atom (type flag 1 = UTF-8 text).

All parsers are a few hundred bytes of header walk — no audio decode.
"""

from __future__ import annotations

import struct


class TagError(ValueError):
    pass


# --- ID3v2 -------------------------------------------------------------------

_ID3_TEXT_FRAMES = {
    "TIT2": "title", "TPE1": "artist", "TALB": "album",
    "TDRC": "year", "TYER": "year",
}


def _synchsafe(n: int) -> bytes:
    return bytes([
        (n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F,
    ])


def _unsynchsafe(b: bytes) -> int:
    return (
        ((b[0] & 0x7F) << 21) | ((b[1] & 0x7F) << 14)
        | ((b[2] & 0x7F) << 7) | (b[3] & 0x7F)
    )


def id3v2_tags(data: bytes) -> dict:
    """Parse an ID3v2.2/2.3/2.4 tag at the start of `data` ->
    {title, artist, album, year} (absent keys omitted)."""
    if data[:3] != b"ID3":
        return {}
    major = data[3]
    size = _unsynchsafe(data[6:10])
    pos, end = 10, min(10 + size, len(data))
    out: dict = {}
    while pos + 10 <= end:
        if major == 2:
            fid = data[pos : pos + 3].decode("latin-1")
            fsize = int.from_bytes(data[pos + 3 : pos + 6], "big")
            body_start = pos + 6
        else:
            fid = data[pos : pos + 4].decode("latin-1")
            raw = data[pos + 4 : pos + 8]
            fsize = (
                _unsynchsafe(raw) if major >= 4
                else int.from_bytes(raw, "big")
            )
            body_start = pos + 10
        if not fid.strip("\x00"):
            break  # padding
        body = data[body_start : body_start + fsize]
        key = _ID3_TEXT_FRAMES.get(
            fid if major != 2 else {"TT2": "TIT2", "TP1": "TPE1",
                                    "TAL": "TALB", "TYE": "TYER"
                                    }.get(fid, fid)
        )
        if key and body:
            enc = body[0]
            text = body[1:]
            try:
                if enc == 0:
                    val = text.decode("latin-1")
                elif enc == 1:
                    val = text.decode("utf-16")
                elif enc == 2:
                    val = text.decode("utf-16-be")
                else:
                    val = text.decode("utf-8")
            except UnicodeDecodeError:
                val = text.decode("latin-1", "replace")
            out.setdefault(key, val.rstrip("\x00"))
        pos = body_start + fsize
    return out


def write_id3v2(
    payload: bytes = b"", title: str | None = None,
    artist: str | None = None, album: str | None = None,
    year: str | None = None,
) -> bytes:
    """Prepend an ID3v2.4 tag (UTF-8 text frames) to `payload`."""
    frames = bytearray()
    for fid, val in (("TIT2", title), ("TPE1", artist),
                     ("TALB", album), ("TDRC", year)):
        if val is None:
            continue
        body = b"\x03" + val.encode("utf-8")
        frames += fid.encode() + _synchsafe(len(body)) + b"\x00\x00" + body
    hdr = b"ID3\x04\x00\x00" + _synchsafe(len(frames))
    return bytes(hdr + frames) + payload


# --- Vorbis comments ---------------------------------------------------------


def vorbis_comments(data: bytes) -> dict:
    """Ogg bytes -> lower-cased comment dict from the comment header
    (second packet; works for Vorbis '\\x03vorbis' and Opus
    'OpusTags'). Returns {} for non-Ogg input."""
    if data[:4] != b"OggS":
        return {}
    from graph_db_clustering_spark.functions.vorbis import ogg_packets

    packets, _gran = ogg_packets(data)
    if len(packets) < 2:
        return {}
    pkt = packets[1]
    if pkt[:7] == b"\x03vorbis":
        body = pkt[7:]
    elif pkt[:8] == b"OpusTags":
        body = pkt[8:]
    else:
        return {}
    pos = 0
    (vlen,) = struct.unpack("<I", body[pos : pos + 4])
    pos += 4 + vlen
    (n,) = struct.unpack("<I", body[pos : pos + 4])
    pos += 4
    out: dict = {}
    for _ in range(n):
        (ln,) = struct.unpack("<I", body[pos : pos + 4])
        pos += 4
        entry = body[pos : pos + ln].decode("utf-8", "replace")
        pos += ln
        k, _, v = entry.partition("=")
        if k:
            out.setdefault(k.lower(), v)
    return out


# --- MP4 / M4A ilst ----------------------------------------------------------

_ILST_ATOMS = {
    b"\xa9nam": "title", b"\xa9ART": "artist",
    b"\xa9alb": "album", b"\xa9day": "year",
}


def m4a_tags(data: bytes) -> dict:
    """MP4 bytes -> {title, artist, album, year} from
    moov > udta > meta > ilst (iTunes-style); {} when absent."""
    from graph_db_clustering_spark.functions import mp4

    moov = mp4._child(data, 0, len(data), b"moov")
    if moov is None:
        return {}
    udta = mp4._child(data, moov[0], moov[1], b"udta")
    if udta is None:
        return {}
    meta = mp4._child(data, udta[0], udta[1], b"meta")
    if meta is None:
        return {}
    # meta is a FULL box: 4 bytes version/flags before children
    ilst = mp4._child(data, meta[0] + 4, meta[1], b"ilst")
    if ilst is None:
        return {}
    out: dict = {}
    for atom, b, e in mp4._boxes(data, ilst[0], ilst[1]):
        key = _ILST_ATOMS.get(atom)
        if key is None:
            continue
        d = mp4._child(data, b, e, b"data")
        if d is None:
            continue
        # data atom: 4 bytes type flag (1 = UTF-8) + 4 bytes locale
        out.setdefault(
            key, data[d[0] + 8 : d[1]].decode("utf-8", "replace")
        )
    return out


def write_m4a_ilst(
    m4a: bytes, title: str | None = None, artist: str | None = None,
    album: str | None = None, year: str | None = None,
) -> bytes:
    """Append a udta>meta>ilst tag tree to an existing M4A's moov."""
    from graph_db_clustering_spark.functions import mp4

    atoms = bytearray()
    for atom, val in ((b"\xa9nam", title), (b"\xa9ART", artist),
                      (b"\xa9alb", album), (b"\xa9day", year)):
        if val is None:
            continue
        d = mp4._box(
            b"data",
            struct.pack(">I", 1) + b"\x00" * 4 + val.encode("utf-8"),
        )
        atoms += mp4._box(atom, d)
    ilst = mp4._box(b"ilst", bytes(atoms))
    hdlr = mp4._full(b"hdlr", 0, 0, struct.pack(">I", 0) + b"mdir"
                     + b"\x00" * 10)
    meta = mp4._full(b"meta", 0, 0, hdlr + ilst)
    udta = mp4._box(b"udta", meta)
    moov = mp4._child(m4a, 0, len(m4a), b"moov")
    if moov is None:
        raise TagError("m4a: no moov to attach tags to")
    # grow the moov box in place
    out = bytearray(m4a[: moov[1]] + udta + m4a[moov[1] :])
    moov_hdr = moov[0] - 8
    (sz,) = struct.unpack(">I", m4a[moov_hdr : moov_hdr + 4])
    out[moov_hdr : moov_hdr + 4] = struct.pack(">I", sz + len(udta))
    return bytes(out)


def audio_tags(data: bytes) -> dict:
    """Container dispatch -> normalized {title, artist, album, year}
    (missing keys absent; unknown containers -> {})."""
    if data[:3] == b"ID3":
        return id3v2_tags(data)
    if data[:4] == b"OggS":
        c = vorbis_comments(data)
        return {
            k: c[src]
            for k, src in (("title", "title"), ("artist", "artist"),
                           ("album", "album"), ("year", "date"))
            if src in c
        }
    if data[4:8] == b"ftyp":
        return m4a_tags(data)
    return {}
