"""functions/mp4 (ISO-BMFF) + the round-11 JPEG encoder and
video_probe operator: box walk, sample-table resolution, MJPEG frame
extraction, codec gates, and the multi-container probe."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from graph_db_clustering_spark.functions import avi, gif, jpeg, mp4


def _gray_frames(n, h, w, seed=0):
    rng = np.random.default_rng(seed)
    # flat 8x8 tiles -> encode_gray roundtrips EXACTLY at quant=8
    return [
        np.repeat(
            np.repeat(
                rng.integers(0, 256, (h // 8, w // 8), dtype=np.uint8), 8, 0
            ),
            8,
            1,
        )
        for _ in range(n)
    ]


def test_encode_gray_flat_tiles_roundtrip_exact():
    for img in _gray_frames(3, 16, 24, seed=1):
        assert np.array_equal(jpeg.decode(jpeg.encode_gray(img)), img)


def test_encode_gray_arbitrary_content_bounded_error():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (24, 17), dtype=np.uint8)  # odd width: pad
    dec = jpeg.decode(jpeg.encode_gray(img))
    assert dec.shape == img.shape
    assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 16
    smooth = np.clip(
        np.add.outer(np.arange(64) * 2, np.arange(40)), 0, 255
    ).astype(np.uint8)
    dec2 = jpeg.decode(jpeg.encode_gray(smooth))
    assert int(np.abs(dec2.astype(int) - smooth.astype(int)).max()) <= 8


def test_encode_gray_rejects_bad_input():
    with pytest.raises(jpeg.JpegError, match="uint8"):
        jpeg.encode_gray(np.zeros((8, 8), dtype=np.float64))
    with pytest.raises(jpeg.JpegError, match="quant"):
        jpeg.encode_gray(np.zeros((8, 8), dtype=np.uint8), quant=0)


def _mux(n=4, h=16, w=24, fps=5, seed=3):
    frames = _gray_frames(n, h, w, seed=seed)
    jps = [jpeg.encode_gray(f) for f in frames]
    return mp4.encode(jps, width=w, height=h, fps=fps), frames


def test_mp4_probe_fields():
    data, _ = _mux(n=4, h=16, w=24, fps=5)
    p = mp4.probe(data)
    assert p["container"] == "mp4" and p["brand"] == "isom"
    assert p["n_tracks"] == 1
    t = p["tracks"][0]
    assert t["handler"] == "vide" and t["codec"] == "jpeg"
    assert (t["width"], t["height"]) == (24, 16)
    assert t["n_samples"] == 4
    assert p["duration_s"] == pytest.approx(0.8)
    assert t["duration_s"] == pytest.approx(0.8)


def test_mp4_frames_decode_exactly():
    data, frames = _mux(n=5, h=8, w=8, seed=4)
    got = mp4.frames(data)
    assert len(got) == 5
    for g, f in zip(got, frames):
        assert np.array_equal(g, np.repeat(f[:, :, None], 3, axis=2))


def test_mp4_multi_chunk_and_co64():
    """Hand-rebuild the sample table: two chunks (3+2 samples) via two
    stsc runs, then the same layout with a co64 offset table — the
    stsc x stco walk must resolve identical byte ranges."""
    frames = _gray_frames(5, 8, 8, seed=5)
    jps = [jpeg.encode_gray(f) for f in frames]
    data, _ = _mux(n=5, h=8, w=8, seed=5)
    # locate the original one-chunk tables
    base = mp4.encode(jps, width=8, height=8)
    first_off = base.find(b"mdat") + 4  # abs offset of sample 0
    sizes = [len(j) for j in jps]
    off2 = first_off + sum(sizes[:3])

    def full(btype, body):
        return struct.pack(">I", 12 + len(body)) + btype + b"\x00" * 4 + body

    stsc2 = full(b"stsc", struct.pack(">I", 2)
                 + struct.pack(">III", 1, 3, 1)
                 + struct.pack(">III", 2, 2, 1))
    stco2 = full(b"stco", struct.pack(">III", 2, first_off, off2))
    co64_2 = full(b"co64", struct.pack(">I", 2)
                  + struct.pack(">QQ", first_off, off2))
    old_stsc = full(b"stsc", struct.pack(">IIII", 1, 1, 5, 1))
    old_stco = full(b"stco", struct.pack(">II", 1, first_off))
    assert base.count(old_stsc) == 1 and base.count(old_stco) == 1
    # same total bytes: stsc grows 12, stco grows 4 -> adjust by rebuild
    for repl_stco in (stco2, co64_2):
        patched = base.replace(old_stsc, stsc2).replace(old_stco, repl_stco)
        # fix every enclosing box length (moov/trak/mdia/minf/stbl grew)
        grew = (len(stsc2) - len(old_stsc)) + (len(repl_stco) - len(old_stco))
        out = bytearray(patched)
        for btype in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
            i = out.find(btype)
            (sz,) = struct.unpack(">I", out[i - 4 : i])
            out[i - 4 : i] = struct.pack(">I", sz + grew)
        got = mp4.frames(bytes(out))
        assert len(got) == 5
        for g, f in zip(got, frames):
            assert np.array_equal(g, np.repeat(f[:, :, None], 3, axis=2))


def test_mp4_interframe_codec_gates_loudly():
    data, _ = _mux(n=2, h=8, w=8)
    patched = data.replace(b"jpeg", b"avc1", 1)  # stsd sample entry
    with pytest.raises(NotImplementedError, match="avc1"):
        mp4.frames(patched)
    # probe still classifies without decoding
    p = mp4.probe(patched)
    assert p["tracks"][0]["codec"] == "avc1"


def test_mp4_fragmented_roundtrip():
    """Round 12: moof/traf/trun movies probe (duration/samples
    stitched from fragments, mvhd zeros ignored) and decode — the
    fragment walk resolves the same frames the unfragmented mux
    carries in its stbl."""
    frames = _gray_frames(5, 8, 8, seed=11)
    jps = [jpeg.encode_gray(f) for f in frames]
    blob = mp4.encode_fragmented(
        jps, width=8, height=8, fps=5, frames_per_fragment=2
    )
    p = mp4.probe(blob)
    assert p["brand"] == "iso5"
    assert p["duration_s"] == 1.0  # 5 frames at 5 fps
    t = p["tracks"][0]
    assert (t["codec"], t["width"], t["height"], t["n_samples"]) == (
        "jpeg", 8, 8, 5)
    assert t["duration_s"] == 1.0
    got = mp4.frames(blob)
    assert len(got) == 5
    for g, f in zip(got, frames):
        assert np.array_equal(g[:, :, 0], f)
    # a trun missing its data-offset gates loudly
    i = blob.find(b"trun")
    patched = blob[:i + 7] + bytes([blob[i + 7] & ~0x01]) + blob[i + 8:]
    with pytest.raises(NotImplementedError, match="data-offset"):
        mp4.frames(patched)


def test_mp4_empty_moof_is_inert_and_corrupt_raises():
    data, _ = _mux(n=2, h=8, w=8)
    # round 12: a (vacuous) trailing moof no longer gates — the
    # fragment walk finds no trafs and the stbl samples still decode
    moof = struct.pack(">I", 8) + b"moof"
    assert len(mp4.frames(data + moof)) == 2
    with pytest.raises(ValueError):
        mp4.probe(b"\x00" * 8)
    # box overrun: declared size beyond the buffer
    bad = struct.pack(">I", 10_000) + b"moov" + b"\x00" * 16
    with pytest.raises(mp4.Mp4Error, match="overruns"):
        list(mp4._boxes(bad, 0, len(bad)))
    with pytest.raises(mp4.Mp4Error, match="no moov"):
        mp4.probe(struct.pack(">I", 16) + b"ftyp" + b"isom" + b"\x00" * 4)


def test_mp4_largesize_box():
    """A 64-bit largesize mdat resolves the same sample ranges."""
    frames = _gray_frames(2, 8, 8, seed=6)
    jps = [jpeg.encode_gray(f) for f in frames]
    data = mp4.encode(jps, width=8, height=8)
    i = data.find(b"mdat") - 4
    (sz,) = struct.unpack(">I", data[i : i + 4])
    big = (
        data[:i]
        + struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", sz + 8)
        + data[i + 8 : i + sz]
        + data[i + sz :]
    )
    # stco offsets shifted by the 8 extra largesize bytes: rebuild stco
    old = struct.pack(">II", 1, data.find(b"mdat") + 4)
    new = struct.pack(">II", 1, data.find(b"mdat") + 12)
    big = big.replace(old, new)
    got = mp4.frames(big)
    assert len(got) == 2
    assert np.array_equal(got[0][:, :, 0], frames[0])


def test_gif_frame_count_and_duration():
    idx = [np.zeros((4, 4), dtype=np.uint8) for _ in range(3)]
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    n, dur = gif.frame_count_and_duration(gif.encode(idx, pal))
    assert n == 3 and dur is None  # encoder writes no delays
    with pytest.raises(ValueError):
        gif.frame_count_and_duration(b"NOTAGIF")


def test_video_probe_operator_multi_container(spark):
    from graph_db_clustering_spark.operators import multimodal

    rng = np.random.default_rng(7)
    rgb = [rng.integers(0, 256, (8, 8, 3), dtype=np.uint8) for _ in range(5)]
    mp4_bytes, _ = _mux(n=4, h=8, w=8, fps=5)
    avi_bytes = avi.encode(rgb, fps=10)
    idx = [rng.integers(0, 4, (8, 8)).astype(np.uint8) for _ in range(3)]
    pal = rng.integers(0, 256, (4, 3)).astype(np.uint8)
    gif_bytes = gif.encode(idx, pal)
    df = spark.createDataFrame(
        [
            (1, bytearray(mp4_bytes)),
            (2, bytearray(avi_bytes)),
            (3, bytearray(gif_bytes)),
            (4, bytearray(b"\xff" * 40)),
        ],
        "video_id long, content binary",
    )
    rows = {
        r["id"]: r
        for r in multimodal.video_probe(df).collect()
    }
    assert rows[1]["container"] == "mp4" and rows[1]["codec"] == "jpeg"
    assert rows[1]["n_frames"] == 4
    assert rows[1]["duration_s"] == pytest.approx(0.8)
    assert rows[2]["container"] == "avi" and rows[2]["codec"] == "rawvideo"
    assert rows[2]["n_frames"] == 5
    assert rows[3]["container"] == "gif" and rows[3]["n_frames"] == 3
    assert rows[4]["container"] == "unknown"


def test_frame_sample_mp4_end_to_end(spark):
    from graph_db_clustering_spark.functions import png
    from graph_db_clustering_spark.operators import multimodal

    frames = _gray_frames(5, 8, 8, seed=8)
    jps = [jpeg.encode_gray(f) for f in frames]
    data = mp4.encode(jps, width=8, height=8)
    df = spark.createDataFrame(
        [(9, bytearray(data))], "video_id long, content binary"
    )
    got = multimodal.frame_sample(df, every_n=2).collect()
    assert [(r["id"], r["frame_index"]) for r in got] == [
        (9, 0), (9, 2), (9, 4)
    ]
    for r in got:
        arr = png.decode(bytes(r["frame"]))
        k = r["frame_index"]
        assert np.array_equal(
            arr, np.repeat(frames[k][:, :, None], 3, axis=2)
        )


def test_matroska_probe_and_video_probe_dispatch():
    """Round 11: WebM/Matroska header-only probe — EBML walk stops at
    the first Cluster, doctype distinguishes webm from mkv, and the
    operator-level dispatch classifies without decoding."""
    from graph_db_clustering_spark.functions import matroska as mk
    from graph_db_clustering_spark.operators.multimodal import (
        _video_probe_one,
    )

    data = mk.encode(codec="V_VP9", width=1280, height=720,
                     duration_s=2.5)
    p = mk.probe(data)
    assert p["container"] == "webm" and p["duration_s"] == 2.5
    t = p["tracks"][0]
    assert (t["type"], t["codec"], t["width"], t["height"]) == (
        "video", "V_VP9", 1280, 720,
    )
    assert _video_probe_one(data) == (
        "webm", "V_VP9", 1280, 720, None, 2.5,
    )
    mkv = mk.encode(codec="V_MPEG4/ISO/AVC", doctype="matroska",
                    width=320, height=240, duration_s=1.0)
    assert _video_probe_one(mkv)[0] == "matroska"
    # probe never needs cluster bytes: truncate AFTER Tracks and the
    # header fields still come back
    cut = data.find(b"\x1f\x43\xb6\x73")  # Cluster id
    assert cut > 0
    p2 = mk.probe(data[:cut])
    assert p2["tracks"][0]["codec"] == "V_VP9"
    with pytest.raises(ValueError):
        mk.probe(b"NOTEBML" + b"\x00" * 20)
    # corrupt EBML classifies as corrupt at the operator level
    assert _video_probe_one(b"\x1aE\xdf\xa3" + b"\xff" * 4)[0] in (
        "corrupt", "matroska",
    )


def test_m4a_and_opus_audio_probe():
    """Round 11: header-only audio probing for the other two dominant
    crawled-audio containers — M4A (mp4a sample entry: channels,
    16.16 sample rate, esds OTI naming AAC) and Ogg Opus (OpusHead:
    channels, input rate; duration from the 48 kHz granule)."""
    import struct as _struct

    from graph_db_clustering_spark.functions import vorbis
    from graph_db_clustering_spark.operators.multimodal import _probe_one

    m4a = mp4.encode_audio_stub(rate=22050, channels=1, duration_s=3.0)
    t = mp4.probe(m4a)["tracks"][0]
    assert t["codec"] == "mp4a/aac"
    assert _probe_one(m4a) == ("m4a", 22050, 1, 3.0)

    # minimal Ogg Opus: id-header packet + an EOS page with a granule
    opus_head = (
        b"OpusHead" + bytes([1, 2]) + _struct.pack("<H", 312)
        + _struct.pack("<I", 48000) + _struct.pack("<h", 0) + bytes([0])
    )
    data = vorbis.ogg_pages(
        [opus_head, b"OpusTags\x00\x00\x00\x00\x00\x00\x00\x00", b"\x00"],
        granules=[0, 0, 96000],
    )
    assert _probe_one(data) == ("ogg-opus", 48000, 2, 2.0)


def test_adts_aac_audio_probe():
    """Round 12 (VERDICT r11 Next #6): AAC-in-ADTS probes header-only
    — profile, sampling-frequency index, channel configuration, and
    an EXACT duration from walking every frame_length (1024 samples
    per raw data block). Decode stays gated (no entropy decoder)."""
    from graph_db_clustering_spark.operators.multimodal import _probe_one

    def adts_frame(payload: bytes, sr_idx=11, channels=1, profile=1,
                   blocks=1):
        flen = 7 + len(payload)
        hdr = bytes([
            0xFF, 0xF1,  # MPEG-4, layer 00, no CRC
            (profile << 6) | (sr_idx << 2) | ((channels >> 2) & 1),
            ((channels & 0x3) << 6) | ((flen >> 11) & 0x03),
            (flen >> 3) & 0xFF,
            ((flen & 0x07) << 5) | 0x1F,
            0xFC | (blocks - 1),
        ])
        return hdr + payload

    # 4 frames at 8000 Hz mono AAC-LC -> 4096 samples = 0.512 s
    blob = b"".join(adts_frame(b"\x00" * 13) for _ in range(4))
    assert _probe_one(blob) == ("aac-lc", 8000, 1, 0.512)
    # 2-block frames count double; Main profile at 44.1 kHz stereo
    blob2 = adts_frame(b"\x00" * 9, sr_idx=4, channels=2, profile=0,
                       blocks=2)
    c, r, ch, d = _probe_one(blob2)
    assert (c, r, ch) == ("aac-main", 44100, 2)
    assert abs(d - 2048 / 44100) < 1e-9
    # a reserved sampling index is not ADTS: falls through, unknown
    assert _probe_one(bytes([0xFF, 0xF1, 0x3C, 0, 0, 0, 0])
                      )[0] in ("unknown", "corrupt")  # sr_idx 15


def test_image_probe_avi_regression_and_webm_audio_probe():
    """Round 11: image_probe over AVI silently classified every file
    as 'corrupt' after _video_format grew a 5th element (4-tuple
    unpack) — pinned fixed; EBML containers probe dims too, and webm
    AUDIO tracks flow through audio_probe."""
    from graph_db_clustering_spark.functions import matroska as mk
    from graph_db_clustering_spark.operators.multimodal import (
        _image_probe_one,
        _probe_one,
    )

    fr = [np.zeros((8, 6, 3), dtype=np.uint8) for _ in range(2)]
    assert _image_probe_one(avi.encode(fr)) == ("avi", 6, 8)
    webm = mk.encode(codec="V_VP9", width=64, height=36, duration_s=1.0)
    assert _image_probe_one(webm) == ("webm", 64, 36)
    # audio-in-webm: hand-build a TrackEntry with an Audio element
    audio_track = mk._el(mk.TRACKS, mk._el(mk.TRACK_ENTRY, b"".join([
        mk._el_uint(0xD7, 1), mk._el_uint(0x73C5, 1),
        mk._el_uint(mk.TRACK_TYPE, 2),
        mk._el(mk.CODEC_ID, b"A_OPUS"),
        mk._el(mk.AUDIO,
               mk._el(mk.SAMPLING_FREQ, __import__("struct").pack(
                   ">f", 48000.0))
               + mk._el_uint(mk.CHANNELS, 2)),
    ])))
    import struct as _s

    info = mk._el(mk.INFO, mk._el_uint(mk.TIMECODE_SCALE, 1_000_000)
                  + mk._el(mk.DURATION, _s.pack(">d", 1500.0)))
    head = mk.encode()[:0]  # reuse nothing; build head fresh below
    data = mk.encode(doctype="webm")  # base head+segment (video)
    # simplest: fresh container with ONLY the audio track
    head = data[: data.find(mk.SEGMENT.to_bytes(4, "big"))]
    seg = mk._el(mk.SEGMENT, info + audio_track)
    blob = head + seg
    got = _probe_one(blob)
    assert got == ("webm", 48000, 2, 1.5)
