"""Multimodal + file-source tests (SURVEY P4): binary columns with typed
metadata, pandas-UDF decode/feature pipeline pinned against driver-side
NumPy, and the binaryFile/CSV/JSON source round-trips."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from graph_db_clustering_spark.catalog import load_table
from graph_db_clustering_spark.operators import multimodal as M
from graph_db_clustering_spark.sources import (
    read_binary_dir,
    read_csv,
    read_json,
    write_partitioned_parquet,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def images(spark):
    docs = load_table(spark, SF, "documents").limit(50)
    return M.synthetic_images_from_documents(docs, "doc_id", "text", side=16).cache()


def test_fixture_is_deterministic_md5_bytes(spark, images):
    """The raw fixture's bytes are exactly the keyed md5 stream."""
    row = images.orderBy("image_id").first()
    doc = (
        load_table(spark, SF, "documents")
        .filter(F.col("doc_id") == row.image_id)
        .first()
    )
    want = b"".join(
        hashlib.md5(f"{doc.text}#{i}".encode()).digest() for i in range(17)
    )[:256]
    assert bytes(row.content) == want
    assert row.meta.height == 16 and row.meta.format == "raw"


def test_image_features_match_driver_numpy(spark, images):
    """Distributed 7-stat vectors == the same NumPy math run on the driver
    (image_classification.py:185 semantics, incl. corrcoef==1.0 and
    cov[0][0]==row-0 sample variance after resize)."""
    got = {r.id: list(r.features) for r in M.image_features(images, resize_to=(8, 8)).collect()}
    for r in images.orderBy("image_id").limit(10).collect():
        arr = np.frombuffer(bytes(r.content), dtype=np.uint8).reshape(16, 16)
        arr = arr[(np.arange(8) * 2)][:, (np.arange(8) * 2)].astype(np.float64)
        want = [
            arr.mean(),
            arr.std(),
            np.median(arr),
            arr.min(),
            arr.max(),
            1.0,
            np.var(arr[0], ddof=1),
        ]
        assert got[r.image_id] == pytest.approx(want)


def test_feature_columns_unpacked(spark, images):
    df = M.image_features(images, resize_to=(8, 8))
    assert set(M.FEATURE_NAMES) < set(df.columns)
    row = df.first()
    assert row.features[0] == row.mean and row.features[6] == row.covariance


def test_color_histogram_normalized(spark, images):
    h = M.color_histogram(images, bins=32)
    rows = h.limit(5).collect()
    for r in rows:
        assert len(r.histogram) == 32
        assert sum(r.histogram) == pytest.approx(1.0)


def test_grayscale_and_resize_helpers():
    rgb = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    g = M._grayscale(rgb)
    assert g.shape == (2, 3)
    assert g[0, 0] == np.uint8(rgb[0, 0].mean())
    big = np.arange(16, dtype=np.uint8).reshape(4, 4)
    small = M._resize_nn(big, 2, 2)
    assert small.tolist() == [[0, 2], [8, 10]]


def test_codec_decode_is_stubbed(spark, images):
    """A codec format without cv2/PIL raises the clearly-marked
    NotImplementedError through the UDF boundary."""
    jpeg = images.withColumn(
        "meta",
        F.struct(
            F.lit(16).alias("height"),
            F.lit(16).alias("width"),
            F.lit(1).alias("channels"),
            F.lit("jpeg").alias("format"),
        ),
    )
    with pytest.raises(Exception, match="NotImplementedError|cv2 or PIL"):
        M.image_features(jpeg).collect()


def test_frame_sample_contract_is_stubbed(spark, images):
    vids = images.select(F.col("image_id").alias("video_id"), "content")
    df = M.frame_sample(vids, every_n=5)
    assert [f.name for f in df.schema.fields] == ["id", "frame_index", "frame"]
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        df.collect()


def test_read_binary_dir_roundtrip(spark, tmp_path):
    payloads = {f"img_{i}.bin": bytes(range(i, i + 64)) for i in range(3)}
    for name, b in payloads.items():
        (tmp_path / name).write_bytes(b)
    (tmp_path / "skip.txt").write_text("not binary payload")
    df = read_binary_dir(spark, str(tmp_path), glob="*.bin")
    got = {r.path.rsplit("/", 1)[-1]: bytes(r.content) for r in df.collect()}
    assert got == payloads


def test_csv_json_sources_with_schema(spark, tmp_path):
    (tmp_path / "t.csv").write_text("a,b\n1,x\n2,y\n")
    (tmp_path / "t.json").write_text('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')
    want = [(1, "x"), (2, "y")]
    c = read_csv(spark, str(tmp_path / "t.csv"), "a int, b string")
    j = read_json(spark, str(tmp_path / "t.json"), "a int, b string")
    assert [tuple(r) for r in c.orderBy("a").collect()] == want
    assert [tuple(r) for r in j.orderBy("a").select("a", "b").collect()] == want


def test_partitioned_parquet_layout(spark, tmp_path):
    events = load_table(spark, SF, "events").withColumn(
        "day", F.date_trunc("DAY", "ts").cast("date")
    )
    out = str(tmp_path / "events_by_day")
    write_partitioned_parquet(events, out, partition_by=["day"])
    sub = [p.name for p in (tmp_path / "events_by_day").iterdir() if p.is_dir()]
    assert sub and all(s.startswith("day=") for s in sub)
    back = spark.read.parquet(out)
    assert back.count() == events.count()
    # partition pruning: a one-day filter reads one partition directory
    one_day = sorted(sub)[0].split("=", 1)[1]
    plan = back.filter(F.col("day") == one_day)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(day" in plan


def test_edge_map_matches_driver_numpy(spark, images):
    """Distributed edge stats == the same gradient math on the driver."""
    got = {
        r.id: (r.edge_density, r.mean_grad, r.max_grad)
        for r in M.edge_map(images, threshold=30.0).collect()
    }
    for row in images.collect():
        arr = np.frombuffer(bytes(row.content), dtype=np.uint8).reshape(16, 16)
        gy, gx = np.gradient(arr.astype(np.float64))
        mag = np.hypot(gx, gy)
        want = (float((mag > 30.0).mean()), float(mag.mean()), float(mag.max()))
        assert got[row.image_id] == pytest.approx(want, rel=1e-12)


def test_haralick_matches_driver_numpy(spark, images):
    """Distributed GLCM features == the same NumPy math on the driver."""
    levels = 32
    got = {
        r.id: (r.contrast, r.homogeneity, r.energy, r.correlation)
        for r in M.haralick_features(images, levels=levels).collect()
    }
    for row in images.collect():
        arr = np.frombuffer(bytes(row.content), dtype=np.uint8).reshape(16, 16)
        q = (arr.astype(np.int64) * levels) // 256
        a, b = q[:, :-1].ravel(), q[:, 1:].ravel()
        counts = np.bincount(a * levels + b, minlength=levels * levels).reshape(
            levels, levels
        )
        counts = counts + counts.T
        p = counts / counts.sum()
        idx = np.arange(levels, dtype=np.float64)
        ii, jj = np.meshgrid(idx, idx, indexing="ij")
        contrast = float((p * (ii - jj) ** 2).sum())
        homog = float((p / (1.0 + (ii - jj) ** 2)).sum())
        energy = float((p**2).sum())
        mi, mj = float((p * ii).sum()), float((p * jj).sum())
        vi = float((p * (ii - mi) ** 2).sum())
        vj = float((p * (jj - mj) ** 2).sum())
        corr = (
            1.0
            if vi <= 0 or vj <= 0
            else float((p * (ii - mi) * (jj - mj)).sum() / np.sqrt(vi * vj))
        )
        assert got[row.image_id] == pytest.approx(
            (contrast, homog, energy, corr), rel=1e-12
        )


def test_contours_match_driver_numpy(spark, images):
    """Distributed contour features == the same NumPy pipeline (threshold
    -> 8-connected components -> largest-component shape features) run on
    the driver."""
    got = {
        r.id: (
            r.n_components,
            r.perimeter,
            r.area,
            r.solidity,
            r.extent,
            r.equiv_diameter,
            r.orientation,
        )
        for r in M.contour_features(images, threshold=127.0).collect()
    }
    for row in images.collect():
        arr = np.frombuffer(bytes(row.content), dtype=np.uint8).reshape(16, 16)
        want = M._contour_features(arr.astype(np.float64), 127.0)
        assert got[row.image_id] == pytest.approx(want, rel=1e-12)


def _raw_image_df(spark, arr: np.ndarray, image_id: int = 1):
    h, w = arr.shape
    return spark.createDataFrame(
        [(image_id, arr.astype(np.uint8).tobytes(), (h, w, 1, "raw"))],
        "image_id long, content binary, meta struct<height:int,width:int,channels:int,format:string>",
    )


def test_contours_closed_form_shapes(spark):
    """Hand-built shapes with closed-form answers: a wide rectangle (all
    ratios exact, orientation 0), the tall transpose (orientation pi/2),
    a second small component (count rises, features stay the largest's),
    and an all-background image (all zeros)."""
    img = np.zeros((16, 16))
    img[5:9, 4:10] = 255  # 4 tall x 6 wide
    r = M.contour_features(_raw_image_df(spark, img)).first()
    assert r.n_components == 1
    assert r.area == 24.0 and r.perimeter == 2 * (4 + 6)
    assert r.solidity == pytest.approx(1.0) and r.extent == pytest.approx(1.0)
    assert r.equiv_diameter == pytest.approx(float(np.sqrt(4 * 24 / np.pi)))
    assert r.orientation == 0.0

    tall = M.contour_features(_raw_image_df(spark, img.T.copy())).first()
    assert tall.orientation == pytest.approx(np.pi / 2)

    img2 = img.copy()
    img2[0, 0] = 255  # disconnected single pixel
    r2 = M.contour_features(_raw_image_df(spark, img2)).first()
    assert r2.n_components == 2 and r2.area == 24.0 and r2.perimeter == 20.0

    blank = M.contour_features(_raw_image_df(spark, np.zeros((16, 16)))).first()
    assert blank.n_components == 0 and blank.area == 0.0 and blank.solidity == 0.0


def test_contours_diagonal_is_one_component_and_oriented(spark):
    """8-connectivity: a diagonal line of touching-corner pixels is ONE
    component; its moment orientation is pi/4 (x and y covary equally)."""
    img = np.zeros((16, 16))
    for i in range(8):
        img[i, i] = 255
    r = M.contour_features(_raw_image_df(spark, img)).first()
    assert r.n_components == 1 and r.area == 8.0
    assert r.orientation == pytest.approx(np.pi / 4)


def test_haralick_flat_image_correlation_is_one(spark):
    """Constant image: zero GLCM variance -> correlation defined as 1.0."""
    content = bytes([7] * 64)
    df = spark.createDataFrame(
        [(1, content, (8, 8, 1, "raw"))],
        "image_id long, content binary, meta struct<height:int,width:int,channels:int,format:string>",
    )
    r = M.haralick_features(df, levels=32).first()
    assert r.correlation == 1.0 and r.contrast == 0.0


def test_haralick_width_one_rejected():
    """ADVICE r2: a width-1 image has no horizontal pairs — explicit
    ValueError instead of a 0/0 NaN spray."""
    import numpy as np
    import pytest as _pytest

    with _pytest.raises(ValueError, match="width >= 2"):
        M._glcm_features(np.zeros((4, 1), dtype=np.uint8), 32)


# ---------------------------------------------------------------------------
# Audio: WAV decode + 7-stat features (VERDICT r3 item 1 — verify the code)
# ---------------------------------------------------------------------------


def _sine(rate=8000, freq=500.0, amp=0.5, n=2048):
    t = np.arange(n, dtype=np.float64) / rate
    return amp * np.sin(2 * np.pi * freq * t)


@pytest.mark.parametrize("bits,tol", [(16, 1e-4), (32, 1e-8), (8, 1e-2), (-32, 1e-7), (-64, 0.0)])
def test_wav_roundtrip_all_depths(bits, tol):
    """encode->decode is identity (to quantization) for 8/16/32-bit PCM
    and 32/64-bit IEEE float."""
    x = _sine()
    rate, y = M._decode_wav(M._encode_wav(8000, x, bits=bits))
    assert rate == 8000 and len(y) == len(x)
    assert np.abs(y - x).max() <= tol + 1.0 / 32768.0 * (0 if bits != 16 else 1)


def test_wav_stereo_downmixes_to_mean():
    """Stereo frames are interleaved L,R; decode averages channels."""
    import struct

    left = _sine(freq=300.0, n=512)
    right = _sine(freq=700.0, n=512)
    inter = np.empty(1024, dtype=np.float64)
    inter[0::2], inter[1::2] = left, right
    mono_bytes = M._encode_wav(8000, inter, bits=16)
    # patch the fmt chunk to a true 16-bit stereo header: channels=2
    # (bytes 22:24), byte-rate=rate*block_align (28:32), block-align=4
    # (32:34) — _decode_wav only reads the channel count, but keep the
    # fixture a valid stereo WAV regardless
    b = bytearray(mono_bytes)
    assert b[12:16] == b"fmt "
    b[22:24] = struct.pack("<H", 2)
    b[28:32] = struct.pack("<I", 8000 * 4)
    b[32:34] = struct.pack("<H", 4)
    rate, y = M._decode_wav(bytes(b))
    want = (left + right) / 2.0
    assert np.abs(y - want).max() < 1e-3


def test_wav_odd_chunk_padding_and_extra_chunks():
    """A LIST chunk with odd length before data must be skipped via the
    word-alignment rule."""
    import struct

    x = _sine(n=64)
    base = M._encode_wav(8000, x, bits=16)
    fmt_chunk = base[12 : 12 + 8 + 16]
    data_chunk = base[12 + 8 + 16 :]
    odd = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # 5 bytes + pad
    body = b"WAVE" + fmt_chunk + odd + data_chunk
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    rate, y = M._decode_wav(wav)
    assert rate == 8000 and len(y) == 64
    assert np.abs(y - x).max() < 1e-3


def test_wav_error_gates():
    # round 11: OGG now dispatches to functions/vorbis — a corrupt
    # Ogg stream is a ValueError (CRC/sync), no longer a gate
    with pytest.raises(ValueError):
        M._decode_wav(b"OggS" + b"\x00" * 64)
    with pytest.raises(NotImplementedError, match="AAC"):
        M._decode_wav(b"\xde\xad\xbe\xef" + b"\x00" * 64)
    with pytest.raises(ValueError, match="no frames"):
        # MP3 now dispatches to functions/mp3; an ID3 tag followed by
        # garbage is a corrupt MP3, not a gate
        M._decode_wav(b"ID3\x04\x00\x00\x00\x00\x00\x00" + b"\x00" * 64)
    with pytest.raises(ValueError, match="missing fmt or data"):
        M._decode_wav(b"RIFF\x04\x00\x00\x00WAVE")
    import struct

    fmt_body = struct.pack("<HHIIHH", 85, 1, 8000, 8000, 1, 16)  # tag 85 = MP3
    wav = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt_body) + 8)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt_body))
        + fmt_body
        + b"data"
        + struct.pack("<I", 0)
    )
    with pytest.raises(NotImplementedError, match="compressed format tag"):
        M._decode_wav(wav)


def test_audio_feature_row_sine_closed_form():
    """Pure sine closed forms: RMS=amp/sqrt(2), peak~=amp, ZCR~=2f/rate,
    spectral centroid~=f (the sine's energy is one FFT bin)."""
    rate, freq, amp = 8000, 500.0, 0.5
    x = _sine(rate, freq, amp, n=4096)  # n*freq/rate integral -> exact bin
    row = M._audio_feature_row(rate, x)
    names = dict(zip(M.AUDIO_FEATURE_NAMES, row))
    assert names["sample_rate"] == rate and names["n_samples"] == 4096
    assert names["duration_s"] == pytest.approx(4096 / rate)
    assert names["rms"] == pytest.approx(amp / np.sqrt(2), rel=1e-3)
    assert names["peak"] == pytest.approx(amp, rel=1e-3)
    assert names["zcr"] == pytest.approx(2 * freq / rate, rel=0.02)
    assert names["spectral_centroid_hz"] == pytest.approx(freq, rel=1e-3)


def test_audio_feature_row_empty_and_silence():
    assert M._audio_feature_row(8000, np.array([])) == [8000.0, 0, 0, 0, 0, 0, 0]
    row = M._audio_feature_row(8000, np.zeros(100))
    names = dict(zip(M.AUDIO_FEATURE_NAMES, row))
    assert names["rms"] == 0.0 and names["spectral_centroid_hz"] == 0.0


def test_audio_features_distributed_matches_driver_numpy(spark):
    """The mapInPandas pipeline over the synthetic fixture == the same
    decode+feature math run on the driver."""
    docs = load_table(spark, SF, "documents").limit(20)
    clips = M.synthetic_audio_from_documents(docs, "doc_id").cache()
    got = {r.id: r for r in M.audio_features(clips, id_col="audio_id").collect()}
    for r in clips.collect():
        rate, x = M._decode_wav(bytes(r.content))
        want = M._audio_feature_row(rate, x)
        have = [getattr(got[r.audio_id], n) for n in M.AUDIO_FEATURE_NAMES]
        assert have == pytest.approx(want)
        # fixture ground truth: sine params derived from the id
        rid = r.audio_id
        assert got[rid].rms == pytest.approx(
            (0.25 + 0.05 * (rid % 10)) / np.sqrt(2), rel=1e-2
        )
        assert got[rid].spectral_centroid_hz == pytest.approx(
            250.0 + 125.0 * (rid % 8), rel=0.05
        )
    clips.unpersist()


def test_ima_adpcm_hand_computed_block():
    """Bit-exact decode of a hand-worked IMA block: predictor 1000,
    index 0 (step 7), nibbles [0,4,8,15,0,0,0,0].
      hdr   -> 1000 (the predictor IS sample 0)
      nib 0 -> diff=7>>3=0          -> 1000, idx -1 -> 0 (step 7)
      nib 4 -> diff=0+7=7           -> 1007, idx +2 -> 2 (step 9)
      nib 8 -> diff=-(9>>3)=-1      -> 1006, idx -1 -> 1 (step 8)
      nib15 -> diff=-(1+2+4+8)=-15  ->  991, idx +8 -> 9 (step 17)
      nib 0 -> diff=17>>3=2         ->  993, idx -1 -> 8 (step 16)
      nib 0 -> diff=2               ->  995, idx -1 -> 7 (step 14)
      nib 0 -> diff=1               ->  996, idx -1 -> 6 (step 13)
      nib 0 -> diff=1               ->  997, idx -1 -> 5"""
    import struct

    from graph_db_clustering_spark.operators import multimodal as M

    head = struct.pack("<hBB", 1000, 0, 0)
    nibbles = [0, 4, 8, 15, 0, 0, 0, 0]
    body = bytes(
        (nibbles[i] & 0x0F) | (nibbles[i + 1] << 4) for i in range(0, 8, 2)
    )
    got = M._decode_ima_adpcm(head + body, channels=1, block_align=8)
    assert got.tolist() == [1000, 1000, 1007, 1006, 991, 993, 995, 996, 997]


def test_ima_adpcm_roundtrip_snr():
    """encode -> decode tracks the source within quantization error:
    SNR above 20 dB on a sine (typical IMA ADPCM measured SNR is much
    higher; 20 dB is a loose regression floor)."""
    from graph_db_clustering_spark.operators import multimodal as M

    x = _sine(rate=8000, freq=440.0, amp=0.5, n=4096)
    rate, y = M._decode_wav(M._encode_wav_ima_adpcm(8000, x))
    assert rate == 8000
    y = y[: len(x)]
    err = x - y
    snr_db = 10 * np.log10(np.mean(x * x) / max(np.mean(err * err), 1e-30))
    assert snr_db > 20.0, snr_db


def test_ima_adpcm_four_to_one_compression():
    from graph_db_clustering_spark.operators import multimodal as M

    x = _sine(n=8080)
    pcm = M._encode_wav(8000, x, bits=16)
    adpcm = M._encode_wav_ima_adpcm(8000, x)
    assert len(adpcm) < len(pcm) / 3.5  # ~4:1 minus headers


def test_ima_adpcm_stereo_interleave_and_downmix():
    """Stereo block: per-channel 4-byte headers then nibble groups
    interleaved per channel; all-zero nibbles at index 0 hold each
    channel constant at its predictor, so the downmixed mono is the
    predictor mean."""
    import struct

    from graph_db_clustering_spark.operators import multimodal as M

    block = (
        struct.pack("<hBB", 1000, 0, 0)
        + struct.pack("<hBB", -2000, 0, 0)
        + b"\x00" * 4  # ch0 group: 8 zero nibbles
        + b"\x00" * 4  # ch1 group
    )
    fmt_body = struct.pack("<HHIIHHHH", 17, 2, 8000, 8000, 16, 4, 2, 9)
    wav = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt_body) + 8 + len(block))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt_body))
        + fmt_body
        + b"data"
        + struct.pack("<I", len(block))
        + block
    )
    rate, y = M._decode_wav(wav)
    assert rate == 8000
    assert len(y) == 9
    np.testing.assert_allclose(y, (1000 - 2000) / 2 / 32768.0)


def test_ima_adpcm_bad_index_rejected():
    import struct

    from graph_db_clustering_spark.operators import multimodal as M

    head = struct.pack("<hBB", 0, 89, 0)  # step index out of range
    with pytest.raises(ValueError, match="step index"):
        M._decode_ima_adpcm(head + b"\x00" * 4, channels=1, block_align=8)


def test_audio_features_over_adpcm_wav(spark):
    """The distributed audio pipeline accepts ADPCM WAVs: the spectral
    centroid of an encoded sine survives the 4-bit quantization (a pure
    sine's centroid is its frequency; quantization noise shifts it only
    slightly)."""
    from graph_db_clustering_spark.operators import multimodal as M

    x = _sine(rate=8000, freq=500.0, amp=0.5, n=4096)
    wav = M._encode_wav_ima_adpcm(8000, x)
    df = spark.createDataFrame(
        [(1, bytearray(wav))], "audio_id long, content binary"
    )
    row = M.audio_features(df, id_col="audio_id").collect()[0]
    assert row["sample_rate"] == 8000.0
    assert abs(row["spectral_centroid_hz"] - 500.0) < 25.0
    assert abs(row["rms"] - 0.5 / np.sqrt(2)) < 0.01


def _mp3_frame(bitrate_idx=9, sr_idx=0, mono=False, n_bytes=4000):
    """A synthetic MPEG-1 Layer III header + filler (128kbps, 44100)."""
    b1 = 0xFB  # MPEG-1 (11), Layer III (01), no CRC
    b2 = (bitrate_idx << 4) | (sr_idx << 2)
    b3 = 0xC0 if mono else 0x00
    return bytes([0xFF, b1, b2, b3]) + b"\x00" * n_bytes


def test_audio_probe_wav_exact(spark):
    from graph_db_clustering_spark.operators import multimodal as M

    x = _sine(rate=8000, n=4000)
    df = spark.createDataFrame(
        [(1, bytearray(M._encode_wav(8000, x)))], "audio_id long, content binary"
    )
    r = M.audio_probe(df).collect()[0]
    assert (r.container, r.sample_rate, r.channels) == ("wav", 8000, 1)
    assert abs(r.duration_s - 0.5) < 1e-9


def test_audio_probe_stereo_wav_true_channels():
    """The probe reads the TRUE channel count from the fmt chunk (no
    decode, no downmix) and the duration from the data-chunk length."""
    import struct

    from graph_db_clustering_spark.operators import multimodal as M

    n_frames, rate = 1000, 8000
    data = b"\x00\x00" * 2 * n_frames  # 16-bit stereo silence
    fmt_body = struct.pack("<HHIIHH", 1, 2, rate, rate * 4, 4, 16)
    wav = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt_body) + 8 + len(data))
        + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
        + b"data" + struct.pack("<I", len(data)) + data
    )
    c, r, ch, dur = M._probe_one(wav)
    assert (c, r, ch) == ("wav", 8000, 2)
    assert abs(dur - n_frames / rate) < 1e-12


def test_audio_probe_mp3_header():
    from graph_db_clustering_spark.operators import multimodal as M

    c, rate, ch, dur = M._probe_one(_mp3_frame())
    assert (c, rate, ch) == ("mp3", 44100, 2)
    # 4004 bytes at 128 kbps ~= 0.25 s
    assert abs(dur - 4004 * 8 / 128000) < 1e-9
    c, rate, ch, _ = M._probe_one(_mp3_frame(sr_idx=1, mono=True))
    assert (c, rate, ch) == ("mp3", 48000, 1)
    # ID3v2 tag before the first frame (syncsafe size 100)
    tagged = b"ID3\x04\x00\x00\x00\x00\x00\x64" + b"\x00" * 100 + _mp3_frame()
    assert M._probe_one(tagged)[0] == "mp3"


def test_audio_probe_flac_streaminfo():
    import struct

    from graph_db_clustering_spark.operators import multimodal as M

    # STREAMINFO body per the FLAC spec: rate 20 bits, channels-1 3
    # bits, bps-1 5 bits (16-bit audio -> 15), total samples 36 bits
    body = bytearray(34)
    rate, channels, total, bps = 44100, 2, 44100 * 3, 16
    body[10] = (rate >> 12) & 0xFF
    body[11] = (rate >> 4) & 0xFF
    body[12] = ((rate & 0xF) << 4) | ((channels - 1) << 1) | ((bps - 1) >> 4)
    body[13] = (((bps - 1) & 0xF) << 4) | ((total >> 32) & 0xF)
    body[14:18] = struct.pack(">I", total & 0xFFFFFFFF)
    data = b"fLaC" + b"\x00\x00\x00\x22" + bytes(body)
    c, r, ch, dur = M._probe_one(data)
    assert (c, r, ch) == ("flac", 44100, 2)
    assert abs(dur - 3.0) < 1e-9


def test_audio_probe_ogg_and_unknown():
    import struct

    from graph_db_clustering_spark.operators import multimodal as M

    ogg = b"OggS" + b"\x00" * 24 + b"\x01vorbis" + b"\x00" * 4 + bytes([2]) \
        + struct.pack("<I", 22050) + b"\x00" * 16
    c, r, ch, dur = M._probe_one(ogg)
    assert (c, r, ch, dur) == ("ogg", 22050, 2, None)
    assert M._probe_one(b"\x00" * 64)[0] == "unknown"


def test_dhash_identical_and_perturbed_images(spark, images):
    """Byte-identical images hash identically; a lightly perturbed copy
    stays within a few bits; an unrelated image is far."""
    rows = images.limit(2).collect()
    base = np.frombuffer(bytes(rows[0].content), dtype=np.uint8).reshape(16, 16)
    near = base.copy()
    near[0, 0] = near[0, 0] ^ 1  # one-pixel wiggle
    other = np.frombuffer(bytes(rows[1].content), dtype=np.uint8).reshape(16, 16)
    df = spark.createDataFrame(
        [
            (1, bytearray(base.tobytes()), (16, 16, 1, "raw")),
            (2, bytearray(base.tobytes()), (16, 16, 1, "raw")),
            (3, bytearray(near.tobytes()), (16, 16, 1, "raw")),
            (4, bytearray(other.tobytes()), (16, 16, 1, "raw")),
        ],
        "image_id long, content binary, "
        "meta struct<height:int,width:int,channels:int,format:string>",
    )
    h = {r.id: r.phash for r in M.dhash(df).collect()}
    assert h[1] == h[2]
    pop = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")  # noqa: E731
    assert pop(h[1], h[3]) <= 3
    assert pop(h[1], h[4]) > 10


def test_image_near_dups_pigeonhole_and_verify(spark, images):
    from graph_db_clustering_spark.operators.multimodal import image_near_dups

    rows = images.limit(3).collect()
    imgs = [
        np.frombuffer(bytes(r.content), dtype=np.uint8).reshape(16, 16)
        for r in rows
    ]
    near = imgs[0].copy()
    near[3, 3] ^= 2
    data = [
        (1, imgs[0]), (2, imgs[0]), (3, near), (4, imgs[1]), (5, imgs[2]),
    ]
    df = spark.createDataFrame(
        [
            (i, bytearray(a.tobytes()), (16, 16, 1, "raw"))
            for i, a in data
        ],
        "image_id long, content binary, "
        "meta struct<height:int,width:int,channels:int,format:string>",
    )
    hashes = M.dhash(df)
    pairs = {
        (r.id1, r.id2): r.hamming
        for r in image_near_dups(hashes, max_hamming=3).collect()
    }
    assert pairs[(1, 2)] == 0  # byte-identical clones
    assert (1, 3) in pairs and (2, 3) in pairs  # perturbed copy found
    # NO pair may involve the unrelated images 4/5 at all — a hamming-0
    # collision there would be the worst dedup false positive
    assert all(
        p[0] not in (4, 5) and p[1] not in (4, 5) for p in pairs
    ), pairs
    with pytest.raises(ValueError, match="pigeonhole"):
        image_near_dups(hashes, max_hamming=4, bands=4)


def test_wav_g711_alaw_mulaw_decode():
    """Round 10: G.711 A-law/mu-law WAV (format tags 6/7). The decode
    tables are pinned BYTE-FOR-BYTE against the stdlib's independent
    audioop implementation, and a mu-law WAV built with audioop
    round-trips through the normal audio path."""
    import struct
    import warnings

    import numpy as np

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop

    from graph_db_clustering_spark.operators.multimodal import (
        _ALAW_TABLE,
        _MULAW_TABLE,
        _decode_wav,
    )

    codes = bytes(range(256))
    assert np.array_equal(
        _ALAW_TABLE, np.frombuffer(audioop.alaw2lin(codes, 2), dtype="<i2")
    )
    assert np.array_equal(
        _MULAW_TABLE, np.frombuffer(audioop.ulaw2lin(codes, 2), dtype="<i2")
    )

    def wav(fmt_tag, payload, rate=8000, channels=1, bits=8):
        fmt = struct.pack("<HHIIHH", fmt_tag, channels, rate,
                          rate * channels, channels, bits)
        body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(payload)) + payload)
        return b"RIFF" + struct.pack("<I", len(body)) + body

    t = np.arange(8000) / 8000.0
    x = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype("<i2")
    ulaw = audioop.lin2ulaw(x.tobytes(), 2)
    r, y = _decode_wav(wav(7, ulaw))
    assert r == 8000 and len(y) == 8000
    err = y - x.astype(np.float64) / 32768.0
    snr = 10 * np.log10(
        float(np.mean((x / 32768.0) ** 2)) / float(np.mean(err ** 2))
    )
    assert snr > 30.0, snr  # 8-bit companded
    alaw = audioop.lin2alaw(x.tobytes(), 2)
    r2, y2 = _decode_wav(wav(6, alaw))
    assert r2 == 8000 and len(y2) == 8000
