"""GIF decoder tests (functions/gif): LZW round trips through the test
encoder (including code-width growth and the 256-color max-width path),
interlacing, animation compositing with transparency and disposal, and
the now-REAL frame_sample Spark path."""

import numpy as np
import pytest

from graph_db_clustering_spark.functions import gif, png


def _rng(seed=0):
    return np.random.default_rng(seed)


@pytest.mark.parametrize("shape", [(1, 1), (13, 11), (40, 37)])
def test_single_frame_roundtrip(shape):
    pal = _rng(1).integers(0, 256, size=(8, 3), dtype=np.uint8)
    idx = _rng(shape[0]).integers(0, 8, size=shape, dtype=np.uint8)
    out = gif.frames(gif.encode([idx], pal))
    assert len(out) == 1
    assert np.array_equal(out[0], pal[idx])


def test_256_color_max_width_lzw():
    """A 256-entry palette starts LZW at 9-bit codes and a big random
    image pushes the table through every width up to the 4096 reset."""
    pal = _rng(2).integers(0, 256, size=(256, 3), dtype=np.uint8)
    idx = _rng(3).integers(0, 256, size=(80, 90), dtype=np.uint8)
    assert np.array_equal(gif.frames(gif.encode([idx], pal))[0], pal[idx])


def test_interlaced_roundtrip():
    pal = _rng(4).integers(0, 256, size=(8, 3), dtype=np.uint8)
    idx = _rng(5).integers(0, 8, size=(19, 7), dtype=np.uint8)
    out = gif.frames(gif.encode([idx], pal, interlace=True))
    assert np.array_equal(out[0], pal[idx])


def test_animation_and_transparency():
    pal = _rng(6).integers(0, 256, size=(8, 3), dtype=np.uint8)
    fs = [_rng(10 + i).integers(0, 7, size=(10, 12), dtype=np.uint8) for i in range(5)]
    out = gif.frames(gif.encode(fs, pal))
    assert len(out) == 5
    for f, fi in zip(out, fs):
        assert np.array_equal(f, pal[fi])
    # transparent pixels keep the PREVIOUS frame's colors
    f1 = np.zeros((4, 4), dtype=np.uint8)
    f2 = np.full((4, 4), 2, dtype=np.uint8)
    f2[0, 0] = 7
    out = gif.frames(gif.encode([f1, f2], pal, transparent=7))
    assert np.array_equal(out[1][0, 0], pal[0])
    assert np.array_equal(out[1][1, 1], pal[2])


def test_gates():
    with pytest.raises(ValueError, match="bad signature"):
        gif.decode(b"NOTAGIF" + b"\x00" * 16)
    # disposal 3 decodes since late round 6 — no format gates remain
    pal = np.zeros((4, 3), dtype=np.uint8)
    idx = np.zeros((2, 2), dtype=np.uint8)
    data = gif.encode([idx], pal, transparent=1, disposal=3)
    assert len(gif.frames(data)) == 1


def test_decode_dispatch_first_frame(spark):
    """GIF bytes flow through the still-image operators (first frame)."""
    from graph_db_clustering_spark.operators.multimodal import image_features

    pal = _rng(7).integers(0, 256, size=(8, 3), dtype=np.uint8)
    idx = _rng(8).integers(0, 8, size=(6, 6), dtype=np.uint8)
    data = gif.encode([idx], pal)
    rows = [(1, bytearray(data), (6, 6, 3, "gif"))]
    df = spark.createDataFrame(
        rows,
        "image_id long, content binary, "
        "meta struct<height:int,width:int,channels:int,format:string>",
    )
    out = image_features(df, resize_to=None).collect()[0]
    want = pal[idx].mean(axis=2).astype(np.uint8)  # grayscale path
    assert abs(out["mean"] - float(want.mean())) < 1e-9


def test_frame_sample_real_for_gif(spark):
    """frame_sample emits every Nth composited frame as lossless PNG
    bytes — decode the payloads back and compare against the source."""
    from graph_db_clustering_spark.operators.multimodal import frame_sample

    pal = _rng(9).integers(0, 256, size=(8, 3), dtype=np.uint8)
    fs = [_rng(20 + i).integers(0, 8, size=(5, 7), dtype=np.uint8) for i in range(7)]
    data = gif.encode(fs, pal)
    df = spark.createDataFrame(
        [(42, bytearray(data))], "video_id long, content binary"
    )
    rows = frame_sample(df, every_n=3).collect()
    assert [(r.id, r.frame_index) for r in rows] == [(42, 0), (42, 3), (42, 6)]
    for r in rows:
        frame = png.decode(bytes(r.frame))
        assert np.array_equal(frame, pal[fs[r.frame_index]])
    # non-GIF content still gates clearly
    raw = spark.createDataFrame(
        [(1, bytearray(b"\x00" * 32))], "video_id long, content binary"
    )
    with pytest.raises(Exception, match="codec"):
        frame_sample(raw).collect()


def test_disposal_3_restores_previous_region():
    """Disposal 3: the canvas reverts to its pre-draw content after the
    frame is emitted. Frame 1 paints the full 2x2 white with disposal 3,
    so frame 2's transparent pixels show frame 0's colors again, not
    frame 1's white."""
    pal = np.array([[0, 0, 0], [255, 255, 255], [200, 10, 10]], dtype=np.uint8)
    f0 = np.zeros((2, 2), np.uint8)          # all black
    f1 = np.ones((2, 2), np.uint8)           # all white, disposal 3
    f2 = np.full((2, 2), 3, np.uint8)        # all transparent (index 3)
    f2[0, 0] = 2                              # except one red pixel
    data = gif.encode([f0, f1, f2], pal, disposal=3, transparent=3)
    out = gif.frames(data)
    assert len(out) == 3
    assert np.array_equal(out[1], np.full((2, 2, 3), 255, np.uint8))
    # frame 2: transparent pixels reveal frame 0's black, NOT white
    want = np.zeros((2, 2, 3), np.uint8)
    want[0, 0] = pal[2]
    assert np.array_equal(out[2], want)


def test_gce_applies_only_to_next_frame():
    """A Graphic Control Extension governs ONE render block (89a spec):
    a GCE-less follow-up frame must not inherit stale disposal 3 /
    transparency. Build a stream where frame 0 carries disposal=3 and
    frame 1 carries no GCE: frame 1 must composite with disposal 0
    (leave in place), so frame 2's... — here, a 2-frame check: after
    frame 1 (white, no GCE) the canvas stays white for frame 2's
    transparent overlay."""
    pal = np.array([[0, 0, 0], [255, 255, 255], [200, 0, 0]], dtype=np.uint8)
    f0 = np.zeros((2, 2), np.uint8)
    f1 = np.ones((2, 2), np.uint8)
    f2 = np.full((2, 2), 3, np.uint8)  # transparent under frame 0's GCE
    data = bytearray(gif.encode([f0, f1, f2], pal, disposal=3, transparent=3))
    # strip the SECOND and THIRD GCE blocks (8 bytes: 21 F9 04 .. .. .. .. 00),
    # leaving only frame 0's — frames 1 and 2 then have no GCE at all
    first = data.find(b"\x21\xf9")
    while True:
        nxt = data.find(b"\x21\xf9", first + 2)
        if nxt < 0:
            break
        del data[nxt : nxt + 8]
    out = gif.frames(bytes(data))
    assert len(out) == 3
    # frame 1: plain white draw (disposal 3 NOT inherited -> canvas keeps it)
    assert np.array_equal(out[1], np.full((2, 2, 3), 255, np.uint8))
    # frame 2: index 3 has NO transparency without its GCE; palette is
    # padded with zeros, so the frame paints opaque black — it must NOT
    # show through to anything, and disposal-3 state must be long gone
    assert np.array_equal(out[2], np.zeros((2, 2, 3), np.uint8))
