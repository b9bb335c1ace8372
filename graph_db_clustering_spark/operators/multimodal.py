"""Multimodal (image/audio/video) columns as opaque binary + typed metadata
(north-star scope; SURVEY §2.8 image UDF rows).

Data model: a multimodal table carries ``content: binary`` plus a typed
``meta`` struct (height/width/channels/format) — schema-on-write, columnar
at rest, so Catalyst prunes `content` away for any query that doesn't
touch the bytes (reading metadata of 100 TB of images scans only the
metadata columns).

Execution model: every byte-touching op is an Arrow-batched pandas UDF
over ``mapInPandas`` — the JVM ships whole columnar batches to one Python
worker per core, NumPy processes them vectorized, and nothing ever lands
on the driver. This mirrors the reference's per-image OpenCV closures
(image_classification.py:77-97, 136-185) but distributed and batched.

Codec availability: cv2/PIL/mahotas are NOT in this environment. Format
decode is therefore import-gated: real codecs are used when importable;
the ``raw`` format (height*width*channels uint8 bytes, row-major) is
decoded with pure NumPy and is fully real — tests and the declared
pipeline use it. Asking for a codec format without the codec raises
NotImplementedError at evaluation time (clearly-marked stub, per spec);
the Spark-side plumbing — schema, batching, partitioning — is identical
for both paths.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

META_SCHEMA = T.StructType(
    [
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)

FEATURE_NAMES = ("mean", "std", "median", "min", "max", "corrcoef", "covariance")


def _decode_one(content: bytes, height: int, width: int, channels: int, fmt: str) -> np.ndarray:
    """bytes -> HxW (grayscale) or HxWxC ndarray. `raw` is pure NumPy;
    codec formats require cv2/PIL (import-gated stub otherwise)."""
    if fmt == "raw":
        arr = np.frombuffer(content, dtype=np.uint8)
        want = height * width * channels
        if arr.size != want:
            raise ValueError(f"raw image: got {arr.size} bytes, expected {want}")
        shape = (height, width) if channels == 1 else (height, width, channels)
        return arr.reshape(shape)
    try:  # pragma: no cover - codec path; not installed in this container
        import cv2

        arr = cv2.imdecode(np.frombuffer(content, np.uint8), cv2.IMREAD_UNCHANGED)
        if arr is None:
            raise ValueError("cv2.imdecode failed")
        return arr
    except ImportError:
        pass
    try:  # pragma: no cover - codec path
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(content)))
    except ImportError:
        raise NotImplementedError(
            f"decoding format={fmt!r} needs cv2 or PIL (not installed); "
            "use format='raw' (height*width*channels uint8 bytes)"
        ) from None


def _grayscale(arr: np.ndarray) -> np.ndarray:
    """HxWxC -> HxW by channel mean (the cv2.cvtColor(BGR2GRAY) analog,
    image_classification.py:91; equal weights keep it codec-free and
    deterministic)."""
    if arr.ndim == 2:
        return arr
    return arr.mean(axis=2).astype(np.uint8)


def _resize_nn(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize in pure NumPy (the cv2.resize analog,
    image_classification.py:90)."""
    h, w = arr.shape[:2]
    rows = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    cols = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return arr[rows][:, cols]


def _seven_stats(img: np.ndarray) -> list[float]:
    """The reference's 7-feature vector, semantics preserved exactly
    (image_classification.py:185): [mean, std, median, min, max,
    corrcoef(img)[0][0], cov(img)[0][0]]. On a 2-D image
    np.corrcoef(img)[0][0] is row-0's self-correlation == 1.0 and
    np.cov(img)[0][0] is row-0's sample variance (ddof=1) — quirky but
    it is what the reference stores on every Image node
    (image_classification.py:220), so parity keeps it."""
    g = img.astype(np.float64)
    row0 = g[0] if g.ndim == 2 else g.reshape(g.shape[0], -1)[0]
    cov00 = float(np.var(row0, ddof=1)) if row0.size > 1 else 0.0
    return [
        float(np.mean(g)),
        float(np.std(g)),
        float(np.median(g)),
        float(np.min(g)),
        float(np.max(g)),
        1.0,
        cov00,
    ]


def image_features(
    df: DataFrame,
    id_col: str = "image_id",
    content_col: str = "content",
    meta_col: str = "meta",
    resize_to: tuple[int, int] | None = (32, 32),
) -> DataFrame:
    """Decode -> grayscale -> resize -> 7-stat feature vector, one
    mapInPandas pass (the load_image_np + extract_features pipeline,
    image_classification.py:77-97, 185, without the driver collect at
    :99). Output: (id, features: array<double>) plus the 7 stats unpacked
    as columns for SQL parity with the reference's node properties."""
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
            *[T.StructField(n, T.DoubleType()) for n in FEATURE_NAMES],
        ]
    )
    rh, rw = resize_to if resize_to else (None, None)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, content, m in zip(pdf["id"], pdf["content"], pdf["meta"]):
                arr = _decode_one(
                    bytes(content), m["height"], m["width"], m["channels"], m["format"]
                )
                arr = _grayscale(arr)
                if resize_to:
                    arr = _resize_nn(arr, rh, rw)
                feats = _seven_stats(arr)
                rows.append((int(rid), feats, *feats))
            yield pd.DataFrame(rows, columns=["id", "features", *FEATURE_NAMES])

    narrow = df.select(
        F.col(id_col).alias("id"), F.col(content_col).alias("content"), F.col(meta_col).alias("meta")
    )
    return narrow.mapInPandas(extract, out_schema)


def color_histogram(
    df: DataFrame,
    id_col: str = "image_id",
    content_col: str = "content",
    meta_col: str = "meta",
    bins: int = 32,
) -> DataFrame:
    """Normalized intensity histogram (the extract_color_histogram analog,
    image_classification.py:136-171; grayscale intensity instead of HSV —
    HSV conversion is a cv2 codec concern, binning is the operator).
    Output: (id, histogram: array<double>) with sum(histogram) == 1."""
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("histogram", T.ArrayType(T.DoubleType())),
        ]
    )

    def hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, content, m in zip(pdf["id"], pdf["content"], pdf["meta"]):
                arr = _grayscale(
                    _decode_one(
                        bytes(content), m["height"], m["width"], m["channels"], m["format"]
                    )
                )
                h, _ = np.histogram(arr, bins=bins, range=(0, 256))
                total = h.sum()
                rows.append((int(rid), (h / total if total else h).astype(float).tolist()))
            yield pd.DataFrame(rows, columns=["id", "histogram"])

    narrow = df.select(
        F.col(id_col).alias("id"), F.col(content_col).alias("content"), F.col(meta_col).alias("meta")
    )
    return narrow.mapInPandas(hist, out_schema)


def _edge_stats(img: np.ndarray, threshold: float) -> tuple[float, float, float]:
    """Gradient-magnitude edge statistics in pure NumPy — the codec-free
    stand-in for the reference's cv2.Canny edge detection
    (image_classification.py:289-310): central-difference gradients,
    magnitude = hypot(gx, gy), edge pixel = magnitude > threshold."""
    g = img.astype(np.float64)
    gy, gx = np.gradient(g)
    mag = np.hypot(gx, gy)
    return (
        float((mag > threshold).mean()),
        float(mag.mean()),
        float(mag.max()),
    )


def edge_map(
    df: DataFrame,
    id_col: str = "image_id",
    content_col: str = "content",
    meta_col: str = "meta",
    threshold: float = 30.0,
) -> DataFrame:
    """Per-image edge statistics (edge_density, mean_grad, max_grad) via
    one Arrow-batched mapInPandas pass — decode -> grayscale -> gradient
    magnitude, no codecs needed. Scalar output columns so the result is
    oracle-/gate-canonicalizable."""
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("edge_density", T.DoubleType()),
            T.StructField("mean_grad", T.DoubleType()),
            T.StructField("max_grad", T.DoubleType()),
        ]
    )

    def edges(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, content, m in zip(pdf["id"], pdf["content"], pdf["meta"]):
                arr = _grayscale(
                    _decode_one(
                        bytes(content), m["height"], m["width"], m["channels"], m["format"]
                    )
                )
                rows.append((int(rid), *_edge_stats(arr, threshold)))
            yield pd.DataFrame(
                rows, columns=["id", "edge_density", "mean_grad", "max_grad"]
            )

    narrow = df.select(
        F.col(id_col).alias("id"), F.col(content_col).alias("content"), F.col(meta_col).alias("meta")
    )
    return narrow.mapInPandas(edges, out_schema)


def _glcm_features(img: np.ndarray, levels: int) -> tuple[float, float, float, float]:
    """4-feature GLCM subset (contrast, homogeneity, energy, correlation)
    in pure NumPy — the codec-free stand-in for the reference's mahotas
    Haralick texture features (image_classification.py:312-334).

    GLCM: intensities quantized to `levels`, horizontal offset (0, 1),
    symmetric, normalized. energy = sum(p^2) (angular second moment);
    correlation guards the flat-image zero-variance case with 1.0 (a
    constant image is perfectly self-correlated). A width-1 image has no
    horizontal pixel pairs at all (counts.sum() == 0 -> NaN spray), so it
    is rejected explicitly rather than returning silent NaNs."""
    if img.shape[1] < 2:
        raise ValueError(
            f"GLCM with horizontal offset needs width >= 2, got shape {img.shape}"
        )
    q = (img.astype(np.int64) * levels) // 256
    a, b = q[:, :-1].ravel(), q[:, 1:].ravel()
    counts = np.bincount(a * levels + b, minlength=levels * levels).reshape(
        levels, levels
    )
    counts = counts + counts.T  # symmetric GLCM
    p = counts / counts.sum()
    i = np.arange(levels, dtype=np.float64)
    ii, jj = np.meshgrid(i, i, indexing="ij")
    contrast = float((p * (ii - jj) ** 2).sum())
    homogeneity = float((p / (1.0 + (ii - jj) ** 2)).sum())
    energy = float((p**2).sum())
    mu_i, mu_j = float((p * ii).sum()), float((p * jj).sum())
    var_i = float((p * (ii - mu_i) ** 2).sum())
    var_j = float((p * (jj - mu_j) ** 2).sum())
    if var_i <= 0.0 or var_j <= 0.0:
        correlation = 1.0
    else:
        correlation = float(
            (p * (ii - mu_i) * (jj - mu_j)).sum() / np.sqrt(var_i * var_j)
        )
    return contrast, homogeneity, energy, correlation


HARALICK_NAMES = ("contrast", "homogeneity", "energy", "correlation")


def haralick_features(
    df: DataFrame,
    id_col: str = "image_id",
    content_col: str = "content",
    meta_col: str = "meta",
    levels: int = 32,
) -> DataFrame:
    """Per-image GLCM texture features, one mapInPandas pass. Scalar
    output columns (id, contrast, homogeneity, energy, correlation)."""
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            *[T.StructField(n, T.DoubleType()) for n in HARALICK_NAMES],
        ]
    )

    def texture(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, content, m in zip(pdf["id"], pdf["content"], pdf["meta"]):
                arr = _grayscale(
                    _decode_one(
                        bytes(content), m["height"], m["width"], m["channels"], m["format"]
                    )
                )
                rows.append((int(rid), *_glcm_features(arr, levels)))
            yield pd.DataFrame(rows, columns=["id", *HARALICK_NAMES])

    narrow = df.select(
        F.col(id_col).alias("id"), F.col(content_col).alias("content"), F.col(meta_col).alias("meta")
    )
    return narrow.mapInPandas(texture, out_schema)


def frame_sample(
    df: DataFrame,
    id_col: str = "video_id",
    content_col: str = "content",
    every_n: int = 10,
) -> DataFrame:
    """Video frame sampling — plumbing-real, decode-stubbed (no video
    codec in this environment, per spec): output schema, batching, and the
    one-row-per-frame explode shape are the real contract; the decode
    raises NotImplementedError until a codec (e.g. PyAV) is installed."""
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("frame_index", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for _pdf in batches:
            raise NotImplementedError(
                "video decode needs a codec (PyAV/ffmpeg), not installed; "
                f"contract: one row per every {every_n}th frame (id, frame_index, frame)"
            )
        yield pd.DataFrame(columns=["id", "frame_index", "frame"])  # pragma: no cover

    narrow = df.select(F.col(id_col).alias("id"), F.col(content_col).alias("content"))
    return narrow.mapInPandas(sample, out_schema)


def synthetic_images_from_documents(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", side: int = 16
) -> DataFrame:
    """Deterministic multimodal fixture: side*side bytes of keyed md5
    output per document (16 bytes per digest, concatenated then truncated
    to exactly side*side) become a raw grayscale image. Pure Catalyst
    (md5/unhex/concat/substring on binary), so the fixture is distributed,
    byte-exact, and reproducible everywhere — this is the `raw`-format
    table the multimodal pipeline runs on in tests and the declared
    corpus."""
    need = side * side
    parts = [
        F.unhex(F.md5(F.concat(F.col(text_col), F.lit(f"#{i}"))))
        for i in range(need // 16 + 1)
    ]
    content = F.substring(F.concat(*parts), 1, need)
    return (
        docs.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("image_id"),
            content.alias("content"),
            F.struct(
                F.lit(side).alias("height"),
                F.lit(side).alias("width"),
                F.lit(1).alias("channels"),
                F.lit("raw").alias("format"),
            ).alias("meta"),
        )
    )
