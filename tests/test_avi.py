"""AVI container codec (functions/avi) + frame_sample over AVI columns."""

import struct

import numpy as np
import pytest

from graph_db_clustering_spark.functions import avi, png

from tests.test_jpeg import make_gray_jpeg


def _rand_frames(n, h, w, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n)]


def test_rawrgb_roundtrip_exact():
    want = _rand_frames(4, 8, 6)
    got = avi.frames(avi.encode(want))
    assert len(got) == 4
    for a, b in zip(got, want):
        assert np.array_equal(a, b)


def test_rawrgb_row_padding_and_bottom_up():
    # width 5 -> stride 16 != 15: exercises 4-byte row alignment; the
    # encoder writes bottom-up BGR, the decoder must undo both
    want = _rand_frames(2, 3, 5, seed=1)
    got = avi.frames(avi.encode(want))
    for a, b in zip(got, want):
        assert np.array_equal(a, b)


def test_mjpeg_frames_decode_via_jpeg():
    from graph_db_clustering_spark.functions import jpeg

    coef1 = np.zeros((8, 8), np.int32)
    coef2 = np.zeros((8, 8), np.int32)
    coef2[0, 0] = 16  # DC-only block, nonzero level
    jp1 = make_gray_jpeg([coef1], w_blocks=1)
    jp2 = make_gray_jpeg([coef2], w_blocks=1)
    data = avi.encode([jp1, jp2], width=8, height=8)
    got = avi.frames(data)
    assert len(got) == 2
    # the container path must equal per-frame JPEG decode, gray -> RGB
    for g, jp in zip(got, (jp1, jp2)):
        want = jpeg.decode(jp)
        assert g.shape == (8, 8, 3)
        assert np.array_equal(g, np.repeat(want[:, :, None], 3, axis=2))
    # and the two frames genuinely differ (DC level shifts the block)
    assert not np.array_equal(got[0], got[1])


def test_unknown_codec_raises_not_implemented():
    data = bytearray(avi.encode(_rand_frames(1, 4, 4)))
    i = data.find(b"strf")
    assert i > 0
    data[i + 8 + 16 : i + 8 + 20] = b"H264"  # biCompression field
    with pytest.raises(NotImplementedError, match="H264"):
        avi.frames(bytes(data))


def test_not_an_avi_raises():
    with pytest.raises(avi.AviError, match="not an AVI"):
        avi.frames(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(avi.AviError):
        avi.frames(b"\x89PNG....")


def test_dropped_frame_placeholder_skipped():
    data = bytearray(avi.encode(_rand_frames(2, 4, 4, seed=2)))
    # append an empty 00db chunk inside movi: a dropped-frame placeholder
    i = data.find(b"LIST") and data.find(b"movi")
    assert i > 0
    insert = b"00db" + struct.pack("<I", 0)
    # grow the movi LIST and RIFF sizes, then append the chunk at the end
    riff_size = struct.unpack("<I", data[4:8])[0]
    movi_list_at = data.find(b"movi") - 8
    movi_size = struct.unpack("<I", data[movi_list_at + 4 : movi_list_at + 8])[0]
    data[movi_list_at + 4 : movi_list_at + 8] = struct.pack(
        "<I", movi_size + len(insert)
    )
    data[4:8] = struct.pack("<I", riff_size + len(insert))
    data.extend(insert)
    assert len(avi.frames(bytes(data))) == 2


def test_mjpeg_needs_dimensions():
    with pytest.raises(avi.AviError, match="width/height"):
        avi.encode([b"\xff\xd8"], mjpg=True)


def test_frame_sample_over_avi_column(spark):
    from pyspark.sql import functions as F

    from graph_db_clustering_spark.operators import multimodal

    vids = []
    for vid_id in (1, 2):
        frames_ = _rand_frames(5, 6, 6, seed=vid_id)
        vids.append((vid_id, bytearray(avi.encode(frames_))))
    df = spark.createDataFrame(vids, "video_id long, content binary")
    out = multimodal.frame_sample(df, every_n=2).collect()
    # 5 frames, every 2nd -> indices 0, 2, 4 per video
    assert sorted((r.id, r.frame_index) for r in out) == [
        (1, 0), (1, 2), (1, 4), (2, 0), (2, 2), (2, 4),
    ]
    for r in out:
        want = _rand_frames(5, 6, 6, seed=r.id)[r.frame_index]
        assert np.array_equal(png.decode(bytes(r.frame)), want)


def test_frame_sample_mixed_gif_and_avi(spark):
    """One column, two containers: dispatch must pick the right codec."""
    from graph_db_clustering_spark.functions import gif
    from graph_db_clustering_spark.operators import multimodal

    frames_ = [np.zeros((4, 4, 3), np.uint8), np.full((4, 4, 3), 255, np.uint8)]
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    idx = [np.zeros((4, 4), np.uint8), np.ones((4, 4), np.uint8)]
    rows = [
        (1, bytearray(avi.encode(frames_))),
        (2, bytearray(gif.encode(idx, pal))),
    ]
    df = spark.createDataFrame(rows, "video_id long, content binary")
    out = multimodal.frame_sample(df, every_n=1).collect()
    assert sorted((r.id, r.frame_index) for r in out) == [
        (1, 0), (1, 1), (2, 0), (2, 1),
    ]
    for r in out:
        got = png.decode(bytes(r.frame))
        assert np.array_equal(got, frames_[r.frame_index])


def _with_audio_first(frames_list):
    """Hand-build an AVI whose FIRST stream is audio: video chunks are
    then '01db', not '00db' — the real-world layout the stream-index
    lookup must handle."""
    arrs = [np.asarray(f, dtype=np.uint8) for f in frames_list]
    h, w = arrs[0].shape[:2]
    stride = (w * 3 + 3) & ~3
    payloads = []
    for a in arrs:
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = a[::-1, :, ::-1].reshape(h, w * 3)
        payloads.append(rows.tobytes())
    avih = struct.pack("<14I", 100000, 0, 0, 0x10, len(payloads), 0, 2,
                       stride * h, w, h, 0, 0, 0, 0)
    auds_strh = (b"auds" + b"\x00" * 4
                 + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, 8000, 0, 0,
                               0, 0, 1)
                 + struct.pack("<4H", 0, 0, 0, 0))
    auds_strf = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)  # PCM fmt
    vids_strh = (b"vids" + b"DIB "
                 + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, 10, 0,
                               len(payloads), stride * h, 0, 0)
                 + struct.pack("<4H", 0, 0, w, h))
    vids_strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"\x00" * 4,
                            stride * h, 0, 0, 0, 0)
    hdrl = avi._list(
        b"hdrl",
        avi._chunk(b"avih", avih)
        + avi._list(b"strl", avi._chunk(b"strh", auds_strh)
                    + avi._chunk(b"strf", auds_strf))
        + avi._list(b"strl", avi._chunk(b"strh", vids_strh)
                    + avi._chunk(b"strf", vids_strf)),
    )
    # interleave: each frame inside a 'LIST rec ' group beside audio data
    movi_body = b"".join(
        avi._list(b"rec ", avi._chunk(b"00wb", b"\x80" * 8)
                  + avi._chunk(b"01db", p))
        for p in payloads
    )
    movi = avi._list(b"movi", movi_body)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_audio_first_stream_and_rec_lists():
    """Video as stream 1 ('01db') nested in 'LIST rec ' groups — the
    interleaved layout real muxers emit — must decode identically."""
    want = _rand_frames(3, 4, 6, seed=9)
    got = avi.frames(_with_audio_first(want))
    assert len(got) == 3
    for a, b in zip(got, want):
        assert np.array_equal(a, b)


def test_msrle8_keyframe_and_interframe():
    """Round 10: MS-RLE8 video (biCompression 1, 8-bit palette) — a
    full-coverage keyframe, then an INTERFRAME that repaints only one
    run and skips everything else (EOL/EOB escapes): untouched pixels
    must keep the prior frame's values."""
    from graph_db_clustering_spark.functions.avi import _chunk, _list

    w, h = 6, 4
    # palette: index i -> (i, 2i, 3i) RGB
    pal = bytearray()
    for i in range(256):
        pal += bytes([(3 * i) % 256, (2 * i) % 256, i % 256, 0])  # BGRX
    # keyframe: each row y filled with index (y+1), bottom-up rows
    key = bytearray()
    for y in range(h):  # y counts from BOTTOM row in RLE space
        key += bytes([w, y + 1])  # one full-row run
        key += b"\x00\x00"  # EOL
    key += b"\x00\x01"  # EOB
    # interframe: skip row 0, repaint 3 px of row 1 (bottom-up) at x=2
    # via delta jump, keep the rest
    inter = bytearray()
    inter += b"\x00\x00"              # EOL: skip bottom row entirely
    inter += b"\x00\x02\x02\x00"      # delta: move to x=2 (same row)
    inter += bytes([3, 9])            # run: 3 px of palette index 9
    inter += b"\x00\x01"              # EOB: rest untouched
    avih = struct.pack("<14I", 100_000, 0, 0, 0x10, 2, 0, 1, 64,
                       w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"mrle"
            + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, 10, 0, 2, 64, 0, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 8,
                       struct.pack("<I", 1), 64, 0, 0, 256, 0) + bytes(pal)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))
    movi = _list(b"movi", _chunk(b"00dc", bytes(key))
                 + _chunk(b"00dc", bytes(inter)))
    body = b"AVI " + hdrl + movi
    data = b"RIFF" + struct.pack("<I", len(body)) + body

    frames = avi.frames(data)
    assert len(frames) == 2
    # expected keyframe: top-down row r has palette index (h - r)
    idx0 = np.zeros((h, w), dtype=np.uint8)
    for y in range(h):
        idx0[h - 1 - y, :] = y + 1
    pal_rgb = np.zeros((256, 3), dtype=np.uint8)
    for i in range(256):
        pal_rgb[i] = (i % 256, (2 * i) % 256, (3 * i) % 256)
    assert np.array_equal(frames[0], pal_rgb[idx0])
    # expected interframe: same, but bottom-up row 1, x 2..5 -> index 9
    idx1 = idx0.copy()
    idx1[h - 1 - 1, 2:5] = 9
    assert np.array_equal(frames[1], pal_rgb[idx1])
