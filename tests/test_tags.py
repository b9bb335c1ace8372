"""functions/tags: ID3v2 / Vorbis-comment / MP4-ilst metadata, the
fixture writers, and the audio_tags operator dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from graph_db_clustering_spark.functions import mp4, tags, vorbis


def test_id3v24_roundtrip_and_encodings():
    blob = tags.write_id3v2(
        b"\xff\xfb" + b"\x00" * 8,
        title="Söng", artist="A B", album="Alb", year="1999",
    )
    got = tags.id3v2_tags(blob)
    assert got == {
        "title": "Söng", "artist": "A B", "album": "Alb", "year": "1999"
    }
    # v2.3 with UTF-16 text (encoding byte 1, BOM)
    body = b"\x01" + "Tïtle".encode("utf-16")
    frame = b"TIT2" + len(body).to_bytes(4, "big") + b"\x00\x00" + body
    hdr = b"ID3\x03\x00\x00" + tags._synchsafe(len(frame))
    assert tags.id3v2_tags(hdr + frame)["title"] == "Tïtle"
    # latin-1 (encoding byte 0)
    body = b"\x00caf\xe9"
    frame = b"TALB" + len(body).to_bytes(4, "big") + b"\x00\x00" + body
    hdr = b"ID3\x04\x00\x00" + tags._synchsafe(len(frame))
    assert tags.id3v2_tags(hdr + frame)["album"] == "café"
    assert tags.id3v2_tags(b"NOPE") == {}


def test_vorbis_comments_and_opustags():
    x = 0.2 * np.sin(2 * np.pi * 220.0 * np.arange(400) / 8000.0)
    data = vorbis.encode(x, 8000, tags={
        "TITLE": "T", "ARTIST": "A", "DATE": "2001",
    })
    assert tags.vorbis_comments(data) == {
        "title": "T", "artist": "A", "date": "2001",
    }
    assert tags.audio_tags(data) == {
        "title": "T", "artist": "A", "year": "2001",
    }
    # decode is unaffected by comment entries
    info, _pcm = vorbis.decode_pcm(data)
    assert info["n_samples"] == 400
    # OpusTags uses the same structure
    import struct

    body = (
        struct.pack("<I", 3) + b"lib"
        + struct.pack("<I", 1)
        + struct.pack("<I", 7) + b"TITLE=O"
    )
    head = (
        b"OpusHead" + bytes([1, 1]) + struct.pack("<H", 0)
        + struct.pack("<I", 48000) + struct.pack("<h", 0) + bytes([0])
    )
    data = vorbis.ogg_pages([head, b"OpusTags" + body, b"\x00"],
                            granules=[0, 0, 480])
    assert tags.vorbis_comments(data) == {"title": "O"}


def test_m4a_ilst_roundtrip():
    m4a = mp4.encode_audio_stub(rate=44100, channels=2, duration_s=1.0)
    tagged = tags.write_m4a_ilst(
        m4a, title="MT", artist="MA", album="MB", year="2010"
    )
    assert tags.m4a_tags(tagged) == {
        "title": "MT", "artist": "MA", "album": "MB", "year": "2010",
    }
    # the probe surface is untouched by the appended udta
    assert mp4.probe(tagged)["tracks"][0]["codec"] == "mp4a/aac"
    assert tags.m4a_tags(m4a) == {}  # untagged -> empty
    with pytest.raises(tags.TagError, match="no moov"):
        tags.write_m4a_ilst(b"\x00" * 16, title="x")


def test_audio_tags_operator(spark):
    from graph_db_clustering_spark.operators import multimodal

    mp3_blob = tags.write_id3v2(b"\xff\xfb", title="t1", artist="a1")
    x = 0.1 * np.sin(2 * np.pi * 330.0 * np.arange(400) / 8000.0)
    ogg_blob = vorbis.encode(x, 8000, tags={"TITLE": "t2"})
    m4a_blob = tags.write_m4a_ilst(
        mp4.encode_audio_stub(), title="t3", year="2022"
    )
    df = spark.createDataFrame(
        [
            (1, bytearray(mp3_blob)),
            (2, bytearray(ogg_blob)),
            (3, bytearray(m4a_blob)),
            (4, bytearray(b"\x00" * 20)),
        ],
        "audio_id long, content binary",
    )
    rows = {r["id"]: r for r in multimodal.audio_tags(df).collect()}
    assert (rows[1]["container"], rows[1]["title"], rows[1]["artist"]) \
        == ("mp3", "t1", "a1")
    assert (rows[2]["container"], rows[2]["title"]) == ("ogg", "t2")
    assert (rows[3]["container"], rows[3]["title"], rows[3]["year"]) \
        == ("m4a", "t3", "2022")
    assert rows[4]["container"] == "unknown" and rows[4]["title"] is None
