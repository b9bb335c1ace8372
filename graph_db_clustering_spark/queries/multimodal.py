"""Declared multimodal-pipeline queries (north-star scope): binary columns
with typed metadata, pandas-UDF feature extraction. Deterministic fixture
(md5-derived raw images from `documents`), so results are stable across
runs; rows-only driver check (per-image NumPy stats aren't portable ANSI
SQL — unit tests pin them against driver-side NumPy instead)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_db_clustering_spark.catalog import load_table
from graph_db_clustering_spark.operators import multimodal
from graph_db_clustering_spark.queries.corpus import declared


@declared("image_features")
def image_features(spark, sf_dir):
    """7-stat feature vectors (image_classification.py:185 semantics) over
    the deterministic raw-image fixture — decode/grayscale/resize/stats in
    one Arrow-batched mapInPandas pass."""
    docs = load_table(spark, sf_dir, "documents")
    imgs = multimodal.synthetic_images_from_documents(docs, "doc_id", "text", side=16)
    feats = multimodal.image_features(imgs, resize_to=(8, 8))
    # no ORDER BY: rows-only check; a global sort would re-run the pandas
    # UDF for range-boundary sampling (2x the Python work for nothing)
    return feats.select(
        "id", *[F.round(F.col(n), 4).alias(n) for n in multimodal.FEATURE_NAMES]
    )


@declared("image_edges")
def image_edges(spark, sf_dir):
    """Gradient-magnitude edge statistics per image (the cv2.Canny
    analog, image_classification.py:289-310, in pure NumPy) — scalar
    columns, rows-only check; pinned vs driver-side NumPy in tests."""
    docs = load_table(spark, sf_dir, "documents")
    imgs = multimodal.synthetic_images_from_documents(docs, "doc_id", "text", side=16)
    e = multimodal.edge_map(imgs, threshold=30.0)
    return e.select(
        "id",
        *[F.round(F.col(n), 6).alias(n) for n in ("edge_density", "mean_grad", "max_grad")],
    )


@declared("image_haralick")
def image_haralick(spark, sf_dir):
    """4-feature GLCM texture subset (the mahotas Haralick analog,
    image_classification.py:312-334, in pure NumPy) — scalar columns,
    rows-only check; pinned vs driver-side NumPy in tests."""
    docs = load_table(spark, sf_dir, "documents")
    imgs = multimodal.synthetic_images_from_documents(docs, "doc_id", "text", side=16)
    h = multimodal.haralick_features(imgs, levels=32)
    return h.select(
        "id",
        *[F.round(F.col(n), 6).alias(n) for n in multimodal.HARALICK_NAMES],
    )


@declared("image_contours")
def image_contours(spark, sf_dir):
    """Contour features of the largest thresholded component per image
    (the cv2.findContours analog, image_classification.py:243-287, in
    pure NumPy: connected components, crack perimeter, convex-hull
    solidity, extent, equivalent diameter, moment orientation) — scalar
    columns, rows-only check; pinned vs driver-side NumPy + closed-form
    shapes in tests. Closes the last SURVEY §2.8 row."""
    docs = load_table(spark, sf_dir, "documents")
    imgs = multimodal.synthetic_images_from_documents(docs, "doc_id", "text", side=16)
    c = multimodal.contour_features(imgs, threshold=127.0)
    return c.select(
        "id",
        "n_components",
        *[
            F.round(F.col(n), 6).alias(n)
            for n in multimodal.CONTOUR_NAMES
            if n != "n_components"
        ],
    )


@declared("audio_features")
def audio_features(spark, sf_dir):
    """7-stat audio signal vectors (duration/RMS/peak/ZCR/spectral
    centroid) over the deterministic sine-WAV fixture — WAV decode +
    feature extraction in one Arrow-batched mapInPandas pass, the audio
    analog of `image_features`. Rows-only check; `_decode_wav` and
    `_audio_feature_row` are pinned against hand-built WAVs and NumPy
    closed forms in tests/test_multimodal.py."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    clips = multimodal.synthetic_audio_from_documents(docs, "doc_id")
    feats = multimodal.audio_features(clips, id_col="audio_id")
    # no ORDER BY: rows-only check (global sort re-runs the pandas UDF
    # for range-boundary sampling)
    return feats.select(
        "id",
        *[F.round(F.col(n), 6).alias(n) for n in multimodal.AUDIO_FEATURE_NAMES],
    )


@declared(
    "audio_mp3",
    "SELECT doc_id, CAST(44100 AS BIGINT) AS sample_rate, "
    "CAST(1152 * (1 + doc_id % 3) AS BIGINT) AS n_samples, "
    "ROUND((1152 * (1 + doc_id % 3)) / 44100.0, 4) AS duration_s "
    "FROM documents WHERE doc_id % 7 = 0 ORDER BY doc_id",
)
def audio_mp3(spark, sf_dir):
    """MP3 audio columns end to end (functions/mp3 + the multimodal
    dispatch, round 7): every 7th document becomes a deterministic
    sine clip of 1-3 granule-pairs, encodes to MPEG-1 Layer III frames
    executor-side, and decodes back through audio_features' normal
    path. The oracle states the EXACT decode geometry in closed form —
    sample rate, the frame-quantized sample count (MP3 frames carry
    1152 samples, so decode length = ceil(n/1152)*1152 = n here), and
    duration — while the float signal stats stay pinned by
    tests/test_mp3.py (coarse fixture quantizer, documented SNR)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from graph_db_clustering_spark.functions import mp3 as mp3_codec

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 7 == 0
    )

    def build(batches):
        for b in batches:
            out = []
            for did in b["doc_id"]:
                n = 1152 * (1 + int(did) % 3)
                t = np.arange(n) / 44100.0
                pcm = 0.5 * np.sin(2 * np.pi * 1000.0 * t)
                # round 9/10: alternate the entropy/window paths so the
                # oracle-checked entry exercises table-coded big values
                # (incl. the round-10 dense 16x16 table 15 the encoder
                # now picks for this amplitude), count1 table A, and
                # short-block frames — the decode GEOMETRY (the oracle)
                # is identical across all of them
                out.append((int(did), bytearray(mp3_codec.encode(
                    pcm,
                    count1_a=bool(int(did) % 3 == 0),
                    block_type="short" if int(did) % 2 else "long",
                ))))
            yield pd.DataFrame(out, columns=["audio_id", "content"])

    clips = docs.select("doc_id").mapInPandas(
        build,
        T.StructType(
            [
                T.StructField("audio_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )
    feats = multimodal.audio_features(clips, id_col="audio_id")
    return feats.select(
        F.col("id").alias("doc_id"),
        F.col("sample_rate").cast("long").alias("sample_rate"),
        F.col("n_samples").cast("long").alias("n_samples"),
        F.round(F.col("duration_s"), 4).alias("duration_s"),
    ).orderBy("doc_id")


@declared("image_histograms")
def image_histograms(spark, sf_dir):
    """Normalized 32-bin intensity histograms over the same fixture
    (extract_color_histogram analog). Declared surface posexplodes to one
    (id, bin, frac) row per bucket so the external gate can canonicalize
    it (array columns break its pandas sort/hash)."""
    docs = load_table(spark, sf_dir, "documents")
    imgs = multimodal.synthetic_images_from_documents(docs, "doc_id", "text", side=16)
    h = multimodal.color_histogram(imgs, bins=32)
    return h.select("id", F.posexplode("histogram").alias("bin", "frac")).select(
        "id", "bin", F.round("frac", 6).alias("frac")
    )


@declared("frame_sample")
def frame_sample(spark, sf_dir):
    """Every-2nd-frame sampling over deterministic animated GIFs derived
    from documents (operators/multimodal.synthetic_gifs_from_documents ->
    frame_sample): the video-column path, REAL end to end — GIF LZW
    decode, frame compositing, and lossless PNG re-encode all happen
    executor-side in Arrow batches. Rows-only: frame payloads are binary
    (the declared surface returns their byte length)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)
    vids = multimodal.synthetic_gifs_from_documents(docs, "doc_id", "text")
    sampled = multimodal.frame_sample(vids, every_n=2)
    return sampled.select(
        "id", "frame_index", F.length("frame").alias("png_bytes")
    )


@declared("frame_sample_avi")
def frame_sample_avi(spark, sf_dir):
    """The same every-2nd-frame video path over the SECOND real
    container: uncompressed BI_RGB AVIs synthesized deterministically
    from documents (operators/multimodal.synthetic_avis_from_documents),
    RIFF-walked + DIB-decoded by functions/avi, PNG re-encoded — all
    executor-side. Rows-only like frame_sample (binary payloads); the
    declared surface returns frame byte lengths."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)
    vids = multimodal.synthetic_avis_from_documents(docs, "doc_id", "text")
    sampled = multimodal.frame_sample(vids, every_n=2)
    return sampled.select(
        "id", "frame_index", F.length("frame").alias("png_bytes")
    )


@declared("frame_sample_mp4")
def frame_sample_mp4(spark, sf_dir):
    """The same every-2nd-frame video path over the THIRD real
    container (round 11): MP4/ISO-BMFF movies with Motion-JPEG tracks,
    synthesized deterministically from documents
    (operators/multimodal.synthetic_mp4s_from_documents — real JPEG
    encode per frame, real ISO-BMFF mux), then stsc/stsz/stco-walked
    and JPEG-decoded by functions/mp4, PNG re-encoded — all
    executor-side. Rows-only like frame_sample (binary payloads); the
    declared surface returns frame byte lengths."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 20 == 0
    )
    vids = multimodal.synthetic_mp4s_from_documents(docs, "doc_id", "text")
    sampled = multimodal.frame_sample(vids, every_n=2)
    return sampled.select(
        "id", "frame_index", F.length("frame").alias("png_bytes")
    )


@declared("frame_sample_fmp4")
def frame_sample_fmp4(spark, sf_dir):
    """Every-2nd-frame sampling over FRAGMENTED MP4s (round 12,
    VERDICT r11 Next #2): the same deterministic MJPEG frames muxed as
    CMAF-shaped moof/mdat fragments (functions/mp4.encode_fragmented),
    then resolved by the stitched moof/traf/trun sample walk instead
    of the (empty) stbl and JPEG-decoded — all executor-side.
    Rows-only like frame_sample (binary payloads); the declared
    surface returns frame byte lengths, which must equal the
    unfragmented frame_sample_mp4's exactly (same frames, different
    container)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 20 == 0
    )
    vids = multimodal.synthetic_mp4s_from_documents(
        docs, "doc_id", "text", fragmented=True
    )
    sampled = multimodal.frame_sample(vids, every_n=2)
    return sampled.select(
        "id", "frame_index", F.length("frame").alias("png_bytes")
    )


@declared(
    "video_probe_fmp4",
    "SELECT doc_id AS video_id, 'mp4' AS container, 'jpeg' AS codec, "
    "CAST(8 AS INT) AS width, CAST(8 AS INT) AS height, "
    "CAST(4 AS INT) AS n_frames, CAST(0.8 AS DOUBLE) AS duration_s "
    "FROM documents WHERE doc_id % 20 = 0 ORDER BY video_id",
)
def video_probe_fmp4(spark, sf_dir):
    """video_probe over FRAGMENTED MP4s (round 12): moov's duration
    fields are zero in a fragmented movie, so duration and sample
    count must be stitched from every moof's trun entries
    (functions/mp4._fragment_runs — trun -> tfhd -> trex default
    resolution). Same closed form as the unfragmented video_probe
    (8x8, 4 frames at 5 fps -> 0.8 s): a walk that trusts mvhd
    reports 0.0 s and 0 samples and hash-mismatches."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 20 == 0
    )
    vids = multimodal.synthetic_mp4s_from_documents(
        docs, "doc_id", "text", fragmented=True
    )
    return (
        multimodal.video_probe(vids)
        .select(
            F.col("id").alias("video_id"),
            "container",
            "codec",
            "width",
            "height",
            "n_frames",
            F.round("duration_s", 6).alias("duration_s"),
        )
        .orderBy("video_id")
    )


@declared(
    "video_probe",
    "SELECT doc_id AS video_id, 'mp4' AS container, 'jpeg' AS codec, "
    "CAST(8 AS INT) AS width, CAST(8 AS INT) AS height, "
    "CAST(4 AS INT) AS n_frames, CAST(0.8 AS DOUBLE) AS duration_s "
    "FROM documents WHERE doc_id % 20 = 0 ORDER BY video_id",
)
def video_probe(spark, sf_dir):
    """Video metadata probe (operators/multimodal.video_probe) over the
    deterministic MP4 fixture: brand/duration from mvhd, dims from the
    stsd visual sample entry, codec fourcc, sample count from stsz —
    header-only (mdat never read), all in closed form (8x8, 4 frames at
    5 fps -> 0.8 s). AVI/GIF probing is pinned by the multi-container
    unit test; interframe-codec fourccs classify (not decode) by
    design."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 20 == 0
    )
    vids = multimodal.synthetic_mp4s_from_documents(docs, "doc_id", "text")
    return (
        multimodal.video_probe(vids)
        .select(
            F.col("id").alias("video_id"),
            "container",
            "codec",
            "width",
            "height",
            "n_frames",
            F.round("duration_s", 6).alias("duration_s"),
        )
        .orderBy("video_id")
    )


@declared(
    "audio_probe",
    "SELECT doc_id AS audio_id, 'wav' AS container, "
    "CAST(8000 AS INT) AS sample_rate, CAST(1 AS INT) AS channels, "
    "CAST(0.128 AS DOUBLE) AS duration_s "
    "FROM documents WHERE doc_id % 10 = 0 ORDER BY audio_id",
)
def audio_probe(spark, sf_dir):
    """Audio metadata probe (operators/multimodal.audio_probe) over the
    deterministic WAV fixture: container/rate/channels probe from real
    RIFF bytes, duration from the decoded sample count — all in closed
    form (8000 Hz, mono, 1024 samples -> 0.128 s). MP3/FLAC/OGG header
    probing is pinned by hand-built-header unit tests; sample decode for
    those keeps the entropy-codec gate."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    audio = multimodal.synthetic_audio_from_documents(docs, "doc_id")
    return (
        multimodal.audio_probe(audio)
        .select(
            F.col("id").alias("audio_id"),
            "container",
            "sample_rate",
            "channels",
            F.round("duration_s", 6).alias("duration_s"),
        )
        .orderBy("audio_id")
    )


@declared(
    "image_probe",
    "SELECT doc_id AS image_id, 'gif' AS container, "
    "CAST(8 AS INT) AS width, CAST(8 AS INT) AS height "
    "FROM documents WHERE doc_id % 20 = 0 ORDER BY image_id",
)
def image_probe(spark, sf_dir):
    """Image metadata probe (operators/multimodal.image_probe): container
    and dimensions from headers only — here over the deterministic
    animated-GIF fixture (8x8 logical screen, closed form). JPEG SOF /
    PNG IHDR / BMP / PNM / AVI probing is pinned by the multi-container
    unit test."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)
    vids = multimodal.synthetic_gifs_from_documents(docs, "doc_id", "text")
    return (
        multimodal.image_probe(vids, id_col="video_id")
        .select(F.col("id").alias("image_id"), "container", "width", "height")
        .orderBy("image_id")
    )


@declared(
    "image_near_dups",
    """WITH d AS (SELECT doc_id, doc_id // 3 AS grp FROM documents
          WHERE doc_id < 300)
SELECT a.doc_id AS id1, b.doc_id AS id2, CAST(0 AS BIGINT) AS hamming
FROM d a JOIN d b ON a.grp = b.grp AND a.doc_id < b.doc_id
ORDER BY id1, id2""",
)
def image_near_dups_q(spark, sf_dir):
    """Perceptual image dedup (multimodal.dhash -> image_near_dups) at
    hamming radius 0 with PLANTED duplicates: every group of three
    consecutive ids renders its group leader's text (the corpus itself
    has no exact text dups), images are a pure function of text, so the
    hamming-0 pair set must equal exactly the within-group pairs — a
    closed-form ground truth that fails on hash instability, banding
    recall loss, or an (observable, deterministic) dhash collision. The
    banded join never goes all-pairs; radius>0 recall is
    pigeonhole-guaranteed and pinned in tests."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    leaders = docs.select(
        F.col("doc_id").alias("leader_id"), F.col("text").alias("leader_text")
    )
    grouped = docs.select(
        "doc_id", (F.floor(F.col("doc_id") / 3) * 3).alias("leader_id")
    ).join(leaders, "leader_id")
    imgs = multimodal.synthetic_images_from_documents(
        grouped.select("doc_id", F.col("leader_text").alias("text")),
        "doc_id",
        "text",
        side=16,
    )
    hashes = multimodal.dhash(imgs)
    return multimodal.image_near_dups(hashes, max_hamming=0).orderBy("id1", "id2")


@declared(
    "audio_features_oracle",
    "SELECT doc_id AS audio_id, CAST(1024 AS DOUBLE) AS n_samples, "
    "CAST(0.128 AS DOUBLE) AS duration_s, "
    "ROUND((0.25 + 0.05 * (doc_id % 10)) / sqrt(2.0), 2) AS rms, "
    "ROUND(250.0 + 125.0 * (doc_id % 8), 1) AS centroid_hz "
    "FROM documents WHERE doc_id % 10 = 0 ORDER BY audio_id",
)
def audio_features_oracle(spark, sf_dir):
    """The audio DSP pipeline against CLOSED FORMS (sine fixture:
    RMS = amp/sqrt(2), spectral centroid = the planted frequency —
    integral periods put all energy in one FFT bin): decode, RMS, and
    FFT centroid must hit the math to the declared rounding. RMS rounds
    to 2 decimals because 16-bit PCM quantization perturbs the 6th
    decimal (~1e-5); margins to every rounding boundary were checked
    against the ten amp values. Complements the rows-only
    audio_features entry (full 7-stat surface)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    audio = multimodal.synthetic_audio_from_documents(docs, "doc_id")
    feats = multimodal.audio_features(audio, id_col="audio_id")
    return feats.select(
        F.col("id").alias("audio_id"),
        "n_samples",
        F.round("duration_s", 6).alias("duration_s"),
        F.round("rms", 2).alias("rms"),
        F.round("spectral_centroid_hz", 1).alias("centroid_hz"),
    ).orderBy("audio_id")


def _flat_images(docs, mod: int):
    """Per-document FLAT 16x16 raw image (every pixel = doc_id % 256),
    built entirely in Catalyst — the closed-form fixture the *_oracle
    image entries score against."""
    docs = docs.filter(F.col("doc_id") % mod == 0)
    byte_hex = F.lpad(F.hex(F.col("doc_id") % 256), 2, "0")
    return docs.select(
        F.col("doc_id").alias("image_id"),
        F.unhex(F.repeat(byte_hex, 256)).alias("content"),
        F.struct(
            F.lit(16).alias("height"),
            F.lit(16).alias("width"),
            F.lit(1).alias("channels"),
            F.lit("raw").alias("format"),
        ).alias("meta"),
    )


@declared(
    "image_features_oracle",
    "SELECT doc_id AS id, CAST(doc_id % 256 AS DOUBLE) AS mean, "
    "CAST(0.0 AS DOUBLE) AS std, CAST(doc_id % 256 AS DOUBLE) AS median, "
    "CAST(doc_id % 256 AS DOUBLE) AS min, CAST(doc_id % 256 AS DOUBLE) AS max, "
    "CAST(1.0 AS DOUBLE) AS corrcoef, CAST(0.0 AS DOUBLE) AS covariance "
    "FROM documents WHERE doc_id % 9 = 0 ORDER BY id",
)
def image_features_oracle(spark, sf_dir):
    """The 7-stat image pipeline against CLOSED FORMS: per-document FLAT
    16x16 raw images (every pixel = doc_id % 256, built in Catalyst —
    unhex(repeat(hex(v)))), so mean/median/min/max equal the value, std
    and row-0 covariance are exactly 0, corrcoef is the reference's
    constant 1. Scores decode, grayscale, resize, and all seven stats
    byte-exactly; image_features keeps the rows-only full-fixture
    surface."""
    imgs = _flat_images(load_table(spark, sf_dir, "documents"), mod=9)
    feats = multimodal.image_features(imgs, resize_to=(8, 8))
    return feats.select(
        "id", "mean", "std", "median", "min", "max", "corrcoef", "covariance"
    ).orderBy("id")


@declared(
    "image_edges_oracle",
    "SELECT doc_id AS id, CAST(0.0 AS DOUBLE) AS edge_density, "
    "CAST(0.0 AS DOUBLE) AS mean_grad, CAST(0.0 AS DOUBLE) AS max_grad "
    "FROM documents WHERE doc_id % 11 = 0 ORDER BY id",
)
def image_edges_oracle(spark, sf_dir):
    """Edge/gradient extraction against the flat-image closed form: a
    constant image has zero gradient everywhere, so density and both
    gradient stats must be exactly 0."""
    imgs = _flat_images(load_table(spark, sf_dir, "documents"), mod=11)
    e = multimodal.edge_map(imgs, threshold=30.0)
    return e.select("id", "edge_density", "mean_grad", "max_grad").orderBy("id")


@declared(
    "image_haralick_oracle",
    "SELECT doc_id AS id, CAST(0.0 AS DOUBLE) AS contrast, "
    "CAST(1.0 AS DOUBLE) AS homogeneity, CAST(1.0 AS DOUBLE) AS energy, "
    "CAST(1.0 AS DOUBLE) AS correlation "
    "FROM documents WHERE doc_id % 11 = 0 ORDER BY id",
)
def image_haralick_oracle(spark, sf_dir):
    """Haralick GLCM features against the flat-image closed form: one
    co-occurrence cell -> contrast 0, homogeneity 1, energy 1, and the
    zero-variance correlation convention 1."""
    imgs = _flat_images(load_table(spark, sf_dir, "documents"), mod=11)
    h = multimodal.haralick_features(imgs, levels=32)
    return h.select(
        "id", "contrast", "homogeneity", "energy", "correlation"
    ).orderBy("id")


@declared(
    "audio_flac",
    "SELECT doc_id, CAST(8000 AS BIGINT) AS sample_rate, "
    "CAST(600 + 100 * (doc_id % 4) AS BIGINT) AS n_samples, "
    "ROUND((600 + 100 * (doc_id % 4)) / 8000.0, 4) AS duration_s "
    "FROM documents WHERE doc_id % 11 = 0 ORDER BY doc_id",
)
def audio_flac(spark, sf_dir):
    """FLAC audio columns end to end (functions/flac + the multimodal
    dispatch, round 7): every 11th document becomes a deterministic
    stereo sine clip, encodes to FLAC executor-side — rotating through
    all four channel assignments (independent, left/side, right/side,
    mid/side) by doc_id — and decodes back through audio_features'
    normal path, downmixed to the channel mean. FLAC is lossless and
    frames carry no padding, so the oracle states the EXACT geometry:
    decode length == input length (vs MP3's 1152-sample quantization),
    and every decode self-verifies against the STREAMINFO MD5 the
    encoder stamped. Signal-value roundtrips are pinned bit-exact in
    tests/test_flac.py."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from graph_db_clustering_spark.functions import flac as flac_codec

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 11 == 0
    )
    modes = ("independent", "left_side", "right_side", "mid_side")

    def build(batches):
        for b in batches:
            out = []
            for did in b["doc_id"]:
                did = int(did)
                n = 600 + 100 * (did % 4)
                t = np.arange(n) / 8000.0
                l = np.round(12000 * np.sin(2 * np.pi * 400.0 * t)).astype(np.int64)
                r = np.round(9000 * np.sin(2 * np.pi * 650.0 * t)).astype(np.int64)
                blob = flac_codec.encode(
                    np.stack([l, r], axis=1),
                    rate=8000,
                    bps=16,
                    block_size=256,
                    stereo_mode=modes[did % 4],
                )
                out.append((did, bytearray(blob)))
            yield pd.DataFrame(out, columns=["audio_id", "content"])

    clips = docs.select("doc_id").mapInPandas(
        build,
        T.StructType(
            [
                T.StructField("audio_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )
    feats = multimodal.audio_features(clips, id_col="audio_id")
    return feats.select(
        F.col("id").alias("doc_id"),
        F.col("sample_rate").cast("long").alias("sample_rate"),
        F.col("n_samples").cast("long").alias("n_samples"),
        F.round(F.col("duration_s"), 4).alias("duration_s"),
    ).orderBy("doc_id")


@declared(
    "audio_vorbis",
    "SELECT doc_id, CAST(8000 AS BIGINT) AS sample_rate, "
    "CAST(700 + 100 * (doc_id % 3) AS BIGINT) AS n_samples, "
    "ROUND((700 + 100 * (doc_id % 3)) / 8000.0, 4) AS duration_s "
    "FROM documents WHERE doc_id % 13 = 0 ORDER BY doc_id",
)
def audio_vorbis(spark, sf_dir):
    """Ogg Vorbis audio columns end to end (functions/vorbis + the
    multimodal dispatch, round 11): every 13th document becomes a
    deterministic sine clip (mono/stereo alternating by doc_id),
    encodes to a complete spec-valid Vorbis stream executor-side —
    Ogg CRC framing, in-stream codebooks, flat floor1, residue type
    1/2 — and decodes back through audio_features' normal path. The
    granule-position trim makes the geometry EXACT: decode length ==
    input length (no codec padding), so the oracle states it in
    closed form. Spectral fidelity (closed-form IMDCT equality, sine
    SNR bounds, long/short window TDAC) is pinned in
    tests/test_vorbis.py."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from graph_db_clustering_spark.functions import vorbis as vorbis_codec

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 13 == 0
    )

    def build(batches):
        for b in batches:
            out = []
            for did in b["doc_id"]:
                did = int(did)
                n = 700 + 100 * (did % 3)
                t = np.arange(n) / 8000.0
                x = 0.5 * np.sin(2 * np.pi * (300.0 + 50 * (did % 5)) * t)
                if did % 2:
                    x = np.stack(
                        [x, 0.4 * np.sin(2 * np.pi * 620.0 * t)], axis=1
                    )
                blob = vorbis_codec.encode(x, rate=8000)
                out.append((did, bytearray(blob)))
            yield pd.DataFrame(out, columns=["audio_id", "content"])

    clips = docs.select("doc_id").mapInPandas(
        build,
        T.StructType(
            [
                T.StructField("audio_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )
    feats = multimodal.audio_features(clips, id_col="audio_id")
    return feats.select(
        F.col("id").alias("doc_id"),
        F.col("sample_rate").cast("long").alias("sample_rate"),
        F.col("n_samples").cast("long").alias("n_samples"),
        F.round(F.col("duration_s"), 4).alias("duration_s"),
    ).orderBy("doc_id")


@declared(
    "video_probe_webm",
    "SELECT doc_id AS video_id, 'webm' AS container, "
    "CASE WHEN doc_id % 2 = 0 THEN 'V_VP9' ELSE 'V_VP8' END AS codec, "
    "CAST(320 + 16 * (doc_id % 4) AS INT) AS width, "
    "CAST(180 + 9 * (doc_id % 4) AS INT) AS height, "
    "CAST(1.0 + 0.5 * (doc_id % 3) AS DOUBLE) AS duration_s "
    "FROM documents WHERE doc_id % 25 = 0 ORDER BY video_id",
)
def video_probe_webm(spark, sf_dir):
    """The video probe over the OTHER dominant crawled container
    (round 11, functions/matroska): deterministic WebM skeletons —
    real EBML structure, doc-derived codec/dims/duration — probed
    header-only (the EBML walk stops before any Cluster). Everything
    the probe reports is closed-form from the construction; a vint
    mis-parse, a wrong default timescale, or reading dims from the
    wrong track element shifts a cell. Interframe WebM codecs stay
    classify-not-decode by design."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 25 == 0
    )
    vids = multimodal.synthetic_webms_from_documents(docs, "doc_id")
    return (
        multimodal.video_probe(vids)
        .select(
            F.col("id").alias("video_id"),
            "container",
            "codec",
            "width",
            "height",
            F.round("duration_s", 6).alias("duration_s"),
        )
        .orderBy("video_id")
    )


@declared(
    "audio_tags",
    "SELECT doc_id AS audio_id, "
    "CASE doc_id % 3 WHEN 0 THEN 'mp3' WHEN 1 THEN 'ogg' "
    "ELSE 'm4a' END AS container, "
    "'track-' || CAST(doc_id AS VARCHAR) AS title, "
    "'artist-' || CAST(doc_id % 5 AS VARCHAR) AS artist, "
    "CAST(1990 + doc_id % 30 AS VARCHAR) AS year "
    "FROM documents WHERE doc_id % 15 = 0 ORDER BY audio_id",
)
def audio_tags_q(spark, sf_dir):
    """Audio metadata tags across all three dominant tag formats
    (round 11, functions/tags -> operators/multimodal.audio_tags):
    every 15th document becomes a tagged clip rotating ID3v2-on-MP3 /
    Vorbis-comments-in-Ogg / MP4 ilst by doc_id, with doc-derived
    title/artist/year. The probe is header-only (no sample decode);
    the oracle states every field in closed form — a synchsafe-size
    slip, a UTF-8/UTF-16 encoding-byte mix-up, or a wrong ilst data
    offset shifts a cell."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from graph_db_clustering_spark.functions import mp4 as mp4_codec
    from graph_db_clustering_spark.functions import tags as tag_codec
    from graph_db_clustering_spark.functions import vorbis as vorbis_codec

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 15 == 0
    )

    def build(batches):
        for b in batches:
            out = []
            for did in b["doc_id"]:
                did = int(did)
                vals = {
                    "title": f"track-{did}",
                    "artist": f"artist-{did % 5}",
                    "year": str(1990 + did % 30),
                }
                kind = did % 3
                if kind == 0:
                    blob = tag_codec.write_id3v2(
                        b"\xff\xfb" + b"\x00" * 16, **vals
                    )
                elif kind == 1:
                    x = 0.2 * np.sin(
                        2 * np.pi * 220.0 * np.arange(400) / 8000.0
                    )
                    blob = vorbis_codec.encode(x, 8000, tags={
                        "TITLE": vals["title"],
                        "ARTIST": vals["artist"],
                        "DATE": vals["year"],
                    })
                else:
                    blob = tag_codec.write_m4a_ilst(
                        mp4_codec.encode_audio_stub(
                            rate=8000, channels=1, duration_s=0.5
                        ),
                        **vals,
                    )
                out.append((did, bytearray(blob)))
            yield pd.DataFrame(out, columns=["audio_id", "content"])

    clips = docs.select("doc_id").mapInPandas(
        build,
        T.StructType(
            [
                T.StructField("audio_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )
    return (
        multimodal.audio_tags(clips)
        .select(
            F.col("id").alias("audio_id"),
            "container", "title", "artist", "year",
        )
        .orderBy("audio_id")
    )
