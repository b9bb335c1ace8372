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
        pass
    if content[:2] == b"\xff\xd8":
        # baseline JPEG: pure-NumPy decoder (functions/jpeg) — covers the
        # reference's actual data/*.jpeg (image_classification.py:77-97)
        from graph_db_clustering_spark.functions import jpeg

        return jpeg.decode(content)
    if content[:8] == b"\x89PNG\r\n\x1a\n":
        # PNG: pure stdlib-zlib + NumPy decoder (functions/png)
        from graph_db_clustering_spark.functions import png

        return png.decode(content)
    if content[:6] in (b"GIF87a", b"GIF89a"):
        # GIF: pure-Python LZW decoder (functions/gif); first frame
        from graph_db_clustering_spark.functions import gif

        return gif.decode(content)
    if content[:2] == b"BM":
        # BMP: header + the same BI_RGB DIB rows the AVI path decodes
        from graph_db_clustering_spark.functions import simple_images

        return simple_images.decode_bmp(content)
    if content[:2] in (b"P5", b"P6"):
        # binary Netpbm (PGM/PPM): header + raw samples
        from graph_db_clustering_spark.functions import simple_images

        return simple_images.decode_pnm(content)
    if content[:4] in (b"II*\x00", b"MM\x00*"):
        # baseline TIFF: strips, none/deflate/PackBits compression
        from graph_db_clustering_spark.functions import simple_images

        return simple_images.decode_tiff(content)
    if content[:4] == b"RIFF" and content[8:12] == b"AVI ":
        # AVI (MJPEG / BI_RGB): first frame, like the GIF still path
        from graph_db_clustering_spark.functions import avi

        decoded = avi.frames(content)
        if not decoded:
            raise ValueError("AVI with no video frames")
        return decoded[0]
    raise NotImplementedError(
        f"decoding format={fmt!r} needs cv2 or PIL (not installed); "
        "use format='raw' (height*width*channels uint8 bytes), JPEG, PNG, "
        "GIF, BMP, PGM/PPM, baseline TIFF, or AVI (MJPEG/BI_RGB first frame)"
    )


def _grayscale(arr: np.ndarray) -> np.ndarray:
    """HxWxC -> HxW by channel mean (the cv2.cvtColor(BGR2GRAY) analog,
    image_classification.py:91; equal weights keep it codec-free and
    deterministic). Preserves the input's dtype: 16-bit PNGs arrive as
    uint16, and casting their 0..65535 means to uint8 would wrap mod 256
    (round-6 review)."""
    if arr.ndim == 2:
        return arr
    return arr.mean(axis=2).astype(arr.dtype)


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


def _connected_components(binary: np.ndarray) -> np.ndarray:
    """8-connected component labels (0 = background, 1..n = components)
    in pure NumPy: seed every foreground pixel with a unique label, then
    propagate the minimum positive neighbor label (vectorized padded
    shifts over all 8 directions + self) until fixpoint — O(component
    diameter) whole-array passes, no scipy. Labels are then renumbered
    1..n in first-seen (row-major seed) order, so numbering is
    deterministic."""
    h, w = binary.shape
    labels = np.where(binary, np.arange(1, h * w + 1).reshape(h, w), 0).astype(np.int64)
    sentinel = np.int64(h * w + 2)
    while True:
        p = np.pad(labels, 1, constant_values=0)
        stack = np.stack(
            [
                p[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
                for dy in (-1, 0, 1)
                for dx in (-1, 0, 1)
            ]
        )
        stack = np.where(stack > 0, stack, sentinel)
        new = np.where(binary, stack.min(axis=0), 0)
        if np.array_equal(new, labels):
            break
        labels = new
    uniq = np.unique(labels[labels > 0])
    lut = np.zeros(int(labels.max()) + 1, dtype=np.int64)
    lut[uniq] = np.arange(1, len(uniq) + 1)
    return lut[labels]


def _convex_hull_area(pts: np.ndarray) -> float:
    """Area of the convex hull of 2-D points (Andrew monotone chain +
    shoelace). Degenerate (<3 distinct points or collinear) -> 0.0."""
    pts = np.unique(pts.astype(np.float64), axis=0)
    if len(pts) < 3:
        return 0.0
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    def half(seq):
        res: list = []
        for p in seq:
            while len(res) >= 2 and cross(res[-2], res[-1], p) <= 0:
                res.pop()
            res.append(p)
        return res

    hull = half(pts)[:-1] + half(pts[::-1])[:-1]
    if len(hull) < 3:
        return 0.0
    hx = np.array([p[0] for p in hull])
    hy = np.array([p[1] for p in hull])
    return float(abs(np.dot(hx, np.roll(hy, -1)) - np.dot(hy, np.roll(hx, -1))) / 2.0)


CONTOUR_NAMES = (
    "n_components",
    "perimeter",
    "area",
    "solidity",
    "extent",
    "equiv_diameter",
    "orientation",
)


def _contour_features(
    img: np.ndarray, threshold: float = 127.0
) -> tuple[int, float, float, float, float, float, float]:
    """Contour features of the LARGEST foreground component in pure NumPy
    — the codec-free, well-defined stand-in for the reference's
    cv2.findContours pipeline (image_classification.py:243-287:
    threshold -> RETR_EXTERNAL contours -> perimeter/area/solidity/
    extent/equivalent-diameter/orientation per contour; the reference
    also divides by convexHull INDICES as if they were an area and
    hard-codes orientation to pi/2 — this implementation computes both
    for real rather than reproducing those bugs).

    Definitions (all on the binary mask img > threshold):
      n_components   — count of 8-connected foreground components
      perimeter      — crack perimeter of the largest component: number
                       of unit pixel edges between mask and background
                       (image border included)
      area           — pixel count of the largest component
      solidity       — area / convex-hull area, hull taken over the
                       component's pixel CORNER points so hull_area >=
                       area and solidity is in (0, 1], exactly 1 for
                       convex pixel sets like rectangles
      extent         — area / bounding-box area
      equiv_diameter — sqrt(4 * area / pi)
      orientation    — major-axis angle from image moments,
                       0.5 * atan2(2*mu11, mu20 - mu02), radians in
                       [-pi/2, pi/2]; 0 for x-aligned shapes
    All-background images return (0, 0, 0, 0, 0, 0, 0)."""
    binary = img.astype(np.float64) > threshold
    labels = _connected_components(binary)
    n = int(labels.max())
    if n == 0:
        return (0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    areas = np.bincount(labels.ravel())[1:]
    largest = int(np.argmax(areas)) + 1  # ties -> smaller (earlier-seed) label
    mask = labels == largest
    area = float(mask.sum())

    pm = np.pad(mask, 1, constant_values=False)
    perimeter = float(
        np.count_nonzero(pm[1:, :] != pm[:-1, :])
        + np.count_nonzero(pm[:, 1:] != pm[:, :-1])
    )

    ys, xs = np.nonzero(mask)
    bbox_area = float((ys.max() - ys.min() + 1) * (xs.max() - xs.min() + 1))
    extent = area / bbox_area
    equiv_diameter = float(np.sqrt(4.0 * area / np.pi))

    corners = np.concatenate(
        [
            np.stack([xs + dx, ys + dy], axis=1)
            for dx in (0, 1)
            for dy in (0, 1)
        ]
    )
    hull_area = _convex_hull_area(corners)
    solidity = area / hull_area if hull_area > 0 else 0.0

    mx, my = xs.mean(), ys.mean()
    mu20 = float(((xs - mx) ** 2).mean())
    mu02 = float(((ys - my) ** 2).mean())
    mu11 = float(((xs - mx) * (ys - my)).mean())
    if mu11 == 0.0 and mu20 == mu02:
        orientation = 0.0  # isotropic: no major axis; define 0
    else:
        orientation = float(0.5 * np.arctan2(2.0 * mu11, mu20 - mu02))
    return (n, perimeter, area, solidity, extent, equiv_diameter, orientation)


def contour_features(
    df: DataFrame,
    id_col: str = "image_id",
    content_col: str = "content",
    meta_col: str = "meta",
    threshold: float = 127.0,
) -> DataFrame:
    """Per-image contour features of the largest thresholded component
    (see _contour_features) in one Arrow-batched mapInPandas pass —
    decode -> grayscale -> threshold -> connected components -> shape
    features, scalar output columns (id, n_components, perimeter, area,
    solidity, extent, equiv_diameter, orientation). Closes the last
    SURVEY §2.8 row (reference image_classification.py:243-287)."""
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("n_components", T.LongType()),
            *[
                T.StructField(nm, T.DoubleType())
                for nm in CONTOUR_NAMES
                if nm != "n_components"
            ],
        ]
    )

    def contours(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, content, m in zip(pdf["id"], pdf["content"], pdf["meta"]):
                arr = _grayscale(
                    _decode_one(
                        bytes(content), m["height"], m["width"], m["channels"], m["format"]
                    )
                )
                rows.append((int(rid), *_contour_features(arr, threshold)))
            yield pd.DataFrame(rows, columns=["id", *CONTOUR_NAMES])

    narrow = df.select(
        F.col(id_col).alias("id"), F.col(content_col).alias("content"), F.col(meta_col).alias("meta")
    )
    return narrow.mapInPandas(contours, out_schema)


def frame_sample(
    df: DataFrame,
    id_col: str = "video_id",
    content_col: str = "content",
    every_n: int = 10,
) -> DataFrame:
    """Frame sampling over animated containers: one row per every_n-th
    frame, each frame re-encoded as a self-describing lossless PNG
    (RGB). REAL for animated GIFs (functions/gif — pure-Python LZW),
    for AVI containers carrying MJPEG or uncompressed BI_RGB frames
    (functions/avi walks the RIFF chunks; MJPEG payloads feed the
    package's own JPEG decoder), and — round 11 — for MP4/ISO-BMFF
    movies with Motion-JPEG video tracks (functions/mp4 walks
    stsc/stsz/stco to each sample's byte range, same JPEG decoder), so
    all three pipelines run fully in this environment; interframe
    codecs (H.264/VP9/AV1 in mp4/webm) raise naming the codec until a
    codec library (e.g. PyAV) is installed — the schema, batching, and
    explode shape are the same either way."""
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("frame_index", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from graph_db_clustering_spark.functions import avi, gif, png

        for pdf in batches:
            rows = []
            for rid, content in zip(pdf["id"], pdf["content"]):
                raw = bytes(content)
                if raw[:6] in (b"GIF87a", b"GIF89a"):
                    decoded = gif.frames(raw)
                elif raw[:4] == b"RIFF" and raw[8:12] == b"AVI ":
                    decoded = avi.frames(raw)
                elif raw[4:8] == b"ftyp":
                    from graph_db_clustering_spark.functions import mp4

                    decoded = mp4.frames(raw)
                else:
                    raise NotImplementedError(
                        "frame_sample decodes animated GIF, MJPEG/BI_RGB "
                        "AVI, and MJPEG-in-MP4 natively; interframe codecs "
                        "(H.264/H.265/VP9/AV1) need a codec (PyAV/ffmpeg), "
                        "not installed. Contract: one row per "
                        f"every {every_n}th frame (id, frame_index, "
                        "frame=PNG bytes)"
                    )
                for i, frame in enumerate(decoded):
                    if i % every_n == 0:
                        rows.append((int(rid), i, bytearray(png.encode(frame))))
            yield pd.DataFrame(rows, columns=["id", "frame_index", "frame"])

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


# ---------------------------------------------------------------------------
# Audio (WAV/PCM decodes in pure NumPy — no codec needed)
# ---------------------------------------------------------------------------


def _encode_wav(rate: int, x: np.ndarray, bits: int = 16) -> bytes:
    """Mono float samples in [-1, 1] -> RIFF/WAVE bytes (PCM 8/16/32-bit
    int, or IEEE float for bits=-32/-64). Inverse of `_decode_wav`; used
    by the deterministic audio fixture and the round-trip tests."""
    import struct as _struct

    if bits == 16:
        data = np.clip(np.round(x * 32768.0), -32768, 32767).astype("<i2").tobytes()
        fmt_tag, bps = 1, 16
    elif bits == 32:
        data = (
            np.clip(np.round(x * 2147483648.0), -2147483648, 2147483647)
            .astype("<i4")
            .tobytes()
        )
        fmt_tag, bps = 1, 32
    elif bits == 8:
        data = np.clip(np.round(x * 128.0 + 128.0), 0, 255).astype(np.uint8).tobytes()
        fmt_tag, bps = 1, 8
    elif bits == -32:
        data = x.astype("<f4").tobytes()
        fmt_tag, bps = 3, 32
    elif bits == -64:
        data = x.astype("<f8").tobytes()
        fmt_tag, bps = 3, 64
    else:
        raise ValueError(f"unsupported bits {bits}")
    block = bps // 8
    fmt_body = _struct.pack("<HHIIHH", fmt_tag, 1, rate, rate * block, block, bps)
    chunks = b"fmt " + _struct.pack("<I", len(fmt_body)) + fmt_body
    chunks += b"data" + _struct.pack("<I", len(data)) + data
    if len(data) & 1:
        chunks += b"\x00"  # word-align the final chunk
    return b"RIFF" + _struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


# IMA/DVI ADPCM tables (IMA Digital Audio Pack and Multimedia Programming
# Interface spec; identical constants in every implementation)
_IMA_STEPS = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
        41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
        190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
        724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
        2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
        6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
        16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int32,
)
_IMA_INDEX_ADJ = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def _ima_step(pred: int, index: int, nibble: int) -> tuple[int, int]:
    """One IMA ADPCM decode step: (pred, index, 4-bit code) -> next
    (pred, index). The bit-exact integer recurrence from the IMA spec."""
    step = int(_IMA_STEPS[index])
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    if nibble & 8:
        diff = -diff
    pred = max(-32768, min(32767, pred + diff))
    index = max(0, min(88, index + int(_IMA_INDEX_ADJ[nibble & 7])))
    return pred, index


def _decode_ima_adpcm(
    data: bytes, channels: int, block_align: int
) -> np.ndarray:
    """IMA ADPCM (WAV format tag 17) data chunk -> interleaved int16
    samples. Block layout per channel: 4-byte header (int16 predictor —
    which IS the first output sample — step index, reserved), then the
    channels' nibble streams interleaved in 4-byte groups (8 samples per
    channel per group), low nibble first.

    The recurrence is inherently sequential (predictor feedback), so the
    inner loop is per-sample Python over each (block, channel) — the same
    justified-state-machine shape as the CDC chunker (operators/text);
    blocks are <= ~1 KB so the loop is bounded and executor-side."""
    import struct as _struct

    out: list[list[int]] = [[] for _ in range(channels)]
    for base in range(0, len(data) - block_align + 1, block_align):
        block = data[base : base + block_align]
        preds, idxs = [], []
        for c in range(channels):
            p, i = _struct.unpack("<hB", block[c * 4 : c * 4 + 3])
            if i > 88:
                raise ValueError(f"IMA ADPCM: step index {i} > 88")
            preds.append(p)
            idxs.append(min(i, 88))
            out[c].append(p)  # header predictor is the first sample
        body = block[4 * channels :]
        # nibble payload: channels interleave in 4-byte groups
        for g in range(0, len(body) // (4 * channels)):
            for c in range(channels):
                chunk = body[(g * channels + c) * 4 : (g * channels + c) * 4 + 4]
                p, i = preds[c], idxs[c]
                for byte in chunk:
                    for nib in (byte & 0x0F, byte >> 4):
                        p, i = _ima_step(p, i, nib)
                        out[c].append(p)
                preds[c], idxs[c] = p, i
    n = min(len(ch) for ch in out)
    return np.stack([np.array(ch[:n], dtype=np.int16) for ch in out], axis=1).reshape(-1)


def _encode_wav_ima_adpcm(
    rate: int, x: np.ndarray, block_samples: int = 505
) -> bytes:
    """Mono float samples in [-1, 1] -> IMA ADPCM WAV bytes (format tag
    17, ~4:1 vs 16-bit PCM). The standard greedy encoder: each sample's
    quantizer code is chosen by the same _ima_step recurrence the decoder
    runs, so decode(encode(x)) tracks x within quantization error
    (SNR test-pinned). block_samples must be 8k+1 (nibble groups of 8
    after the header sample)."""
    import struct as _struct

    if (block_samples - 1) % 8:
        raise ValueError("block_samples must be 8k+1")
    pcm = np.clip(np.round(x * 32768.0), -32768, 32767).astype(np.int64)
    block_align = 4 + (block_samples - 1) // 2
    blocks = []
    index = 0
    for s in range(0, len(pcm), block_samples):
        seg = pcm[s : s + block_samples]
        if len(seg) < block_samples:
            seg = np.concatenate([seg, np.full(block_samples - len(seg), seg[-1])])
        pred = int(seg[0])
        head = _struct.pack("<hBB", pred, index, 0)
        nibbles = []
        for target in seg[1:]:
            best = None
            # exact greedy: pick the 4-bit code whose decoded sample is
            # nearest the target (16 candidates, bit-exact decoder step)
            for nib in range(16):
                p2, _ = _ima_step(pred, index, nib)
                err = abs(int(target) - p2)
                if best is None or err < best[0]:
                    best = (err, nib, p2)
            _, nib, p2 = best
            i2 = max(0, min(88, index + int(_IMA_INDEX_ADJ[nib & 7])))
            pred, index = p2, i2
            nibbles.append(nib)
        body = bytes(
            (nibbles[i] & 0x0F) | (nibbles[i + 1] << 4)
            for i in range(0, len(nibbles), 2)
        )
        blocks.append(head + body)
    data = b"".join(blocks)
    avg_bps = rate * block_align // block_samples
    fmt_body = _struct.pack(
        "<HHIIHHHH", 17, 1, rate, avg_bps, block_align, 4, 2, block_samples
    )
    chunks = b"fmt " + _struct.pack("<I", len(fmt_body)) + fmt_body
    # fact chunk: true sample count, so decoders drop final-block padding
    chunks += b"fact" + _struct.pack("<II", 4, len(pcm))
    chunks += b"data" + _struct.pack("<I", len(data)) + data
    if len(data) & 1:
        chunks += b"\x00"
    return b"RIFF" + _struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def synthetic_audio_from_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    rate: int = 8000,
    n_samples: int = 1024,
) -> DataFrame:
    """Deterministic WAV fixture: one 16-bit PCM mono clip per document,
    a pure sine whose frequency/amplitude derive from the id (freq =
    250 + 125*(id mod 8) Hz, amp = 0.25 + 0.05*(id mod 10)). The audio
    analog of `synthetic_images_from_documents`: real container bytes the
    decode path must actually parse, stable across runs/partitionings, and
    closed-form ground truth (sine RMS = amp/sqrt(2), centroid = freq).
    Encoded executor-side in one mapInPandas pass — bytes never transit
    the driver."""
    out_schema = T.StructType(
        [
            T.StructField("audio_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
            T.StructField("sample_rate", T.IntegerType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t = np.arange(n_samples, dtype=np.float64) / rate
        for pdf in batches:
            rows = []
            for rid in pdf["id"]:
                rid = int(rid)
                freq = 250.0 + 125.0 * (rid % 8)
                amp = 0.25 + 0.05 * (rid % 10)
                wav = _encode_wav(rate, amp * np.sin(2 * np.pi * freq * t), bits=16)
                rows.append((rid, wav, rate))
            yield pd.DataFrame(rows, columns=["audio_id", "content", "sample_rate"])

    return docs.select(F.col(id_col).alias("id")).mapInPandas(gen, out_schema)

AUDIO_FEATURE_NAMES = (
    "sample_rate",
    "n_samples",
    "duration_s",
    "rms",
    "peak",
    "zcr",
    "spectral_centroid_hz",
)


def _decode_wav(content: bytes) -> tuple[int, np.ndarray]:
    """Audio container dispatch -> (sample_rate, mono float64 samples).

    WAV (PCM 8/16/32-bit int, 32/64-bit float, IMA ADPCM format tag 17,
    G.711 A-law/mu-law tags 6/7 — round 10)
    decodes via pure struct + NumPy; MP3 (MPEG-1 Layer III mono/
    stereo/MS-joint-stereo, downmixed to channel mean, ID3v2
    tags skipped) via the pure-NumPy functions/mp3 decoder — round 7,
    VERDICT r6 Next #4; its remaining entropy-table gates are
    documented in that module. Ogg Vorbis (round 11) via
    functions/vorbis — every codebook arrives in the stream itself, so
    no memorized-table gate applies. AAC raises NotImplementedError
    (scoped gate); truncated/corrupt files raise ValueError, never a
    bare struct.error."""
    import struct as _struct

    try:
        return _decode_wav_inner(content)
    except (IndexError, _struct.error) as e:
        raise ValueError(f"WAV: truncated or corrupt file ({e!r})")


def _decode_wav_inner(content: bytes) -> tuple[int, np.ndarray]:
    import struct as _struct

    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        if content[:4] == b"fLaC":
            from graph_db_clustering_spark.functions import flac as _flac

            return _flac.decode(content)
        if content[:3] == b"ID3" or (
            len(content) >= 2
            and content[0] == 0xFF
            and (content[1] & 0xE0) == 0xE0
        ):
            from graph_db_clustering_spark.functions import mp3 as _mp3

            return _mp3.decode(content)
        if content[:4] == b"OggS":
            from graph_db_clustering_spark.functions import vorbis as _vorbis

            return _vorbis.decode(content)
        raise NotImplementedError(
            "audio decode: WAV (PCM/float/IMA-ADPCM), MP3 (MPEG-1 "
            "Layer III mono/stereo), FLAC (8/16/24-bit, mono/stereo), "
            "and Ogg Vorbis (round 11, functions/vorbis) are supported "
            "codec-free; AAC decode is a PERMANENT gate (its Huffman "
            "codebooks have no in-container cross-check source — probe "
            "via audio_probe instead)"
        )
    pos, n = 12, len(content)
    fmt = None
    data = None
    fact_samples = None
    while pos + 8 <= n:
        cid = content[pos : pos + 4]
        (clen,) = _struct.unpack("<I", content[pos + 4 : pos + 8])
        body = content[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            audio_fmt, channels, rate = _struct.unpack("<HHI", body[:8])
            block_align = _struct.unpack("<H", body[12:14])[0]
            bits = _struct.unpack("<H", body[14:16])[0]
            fmt = (audio_fmt, channels, rate, bits, block_align)
        elif cid == b"fact":
            # compressed formats declare the true per-channel sample
            # count here — block padding must be truncated away
            fact_samples = _struct.unpack("<I", body[:4])[0]
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV: missing fmt or data chunk")
    audio_fmt, channels, rate, bits, block_align = fmt
    if audio_fmt == 1:  # integer PCM
        if bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 32:
            x = np.frombuffer(data, dtype="<i4").astype(np.float64) / 2147483648.0
        elif bits == 8:  # unsigned
            x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
        else:
            raise ValueError(f"WAV: unsupported PCM bit depth {bits}")
    elif audio_fmt == 3:  # IEEE float
        x = np.frombuffer(data, dtype="<f4" if bits == 32 else "<f8").astype(np.float64)
    elif audio_fmt == 17:  # IMA/DVI ADPCM — decoded natively (4-bit, 4:1)
        x = _decode_ima_adpcm(data, channels, block_align).astype(np.float64) / 32768.0
        if fact_samples is not None:
            x = x[: fact_samples * channels]  # drop final-block padding
    elif audio_fmt in (6, 7):  # G.711 A-law / mu-law (round 10)
        codes = np.frombuffer(data, dtype=np.uint8)
        table = _ALAW_TABLE if audio_fmt == 6 else _MULAW_TABLE
        x = table[codes].astype(np.float64) / 32768.0
    else:
        raise NotImplementedError(f"WAV: compressed format tag {audio_fmt} unsupported")
    if channels > 1:
        x = x[: len(x) - len(x) % channels].reshape(-1, channels).mean(axis=1)
    return rate, x


def _g711_tables():
    """G.711 decode tables, computed from the public companding
    definitions (ITU-T G.711): A-law (even-bit inversion, 8 segments)
    and mu-law (bias 0x84, complemented codes) -> int16 per 8-bit code."""
    alaw = np.empty(256, dtype=np.int16)
    for code in range(256):
        a = code ^ 0x55
        seg = (a & 0x70) >> 4
        mant = a & 0x0F
        if seg == 0:
            val = (mant << 4) + 8
        else:
            val = ((mant << 4) + 0x108) << (seg - 1)
        alaw[code] = -val if a & 0x80 == 0 else val
    mulaw = np.empty(256, dtype=np.int16)
    for code in range(256):
        u = ~code & 0xFF
        seg = (u & 0x70) >> 4
        mant = u & 0x0F
        val = (((mant << 3) + 0x84) << seg) - 0x84
        mulaw[code] = -val if u & 0x80 else val
    return alaw, mulaw


_ALAW_TABLE, _MULAW_TABLE = _g711_tables()


def _audio_feature_row(rate: int, x: np.ndarray) -> list[float]:
    n = len(x)
    if n == 0:
        return [float(rate), 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    rms = float(np.sqrt(np.mean(x * x)))
    peak = float(np.abs(x).max())
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if n > 1 else 0.0
    spec = np.abs(np.fft.rfft(x))
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    power = spec * spec
    tot = power.sum()
    centroid = float((freqs * power).sum() / tot) if tot > 0 else 0.0
    return [float(rate), float(n), n / rate, rms, peak, zcr, centroid]


def audio_features(
    df: DataFrame,
    id_col: str = "audio_id",
    content_col: str = "content",
) -> DataFrame:
    """Decode WAV audio and extract a 7-stat signal vector per clip:
    (id, sample_rate, n_samples, duration_s, rms, peak, zcr,
    spectral_centroid_hz) — duration/energy for data curation, ZCR +
    spectral centroid as the cheap content signals (speech/music/silence
    separation). One Arrow-batched mapInPandas pass, same scale shape as
    image_features: bytes stay on executors, metadata-only queries never
    touch `content`."""
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            *[T.StructField(f, T.DoubleType()) for f in AUDIO_FEATURE_NAMES],
        ]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, content in zip(pdf["id"], pdf["content"]):
                rate, x = _decode_wav(bytes(content))
                rows.append((int(rid), *_audio_feature_row(rate, x)))
            yield pd.DataFrame(rows, columns=["id", *AUDIO_FEATURE_NAMES])

    narrow = df.select(F.col(id_col).alias("id"), F.col(content_col).alias("content"))
    return narrow.mapInPandas(extract, out_schema)


def synthetic_gifs_from_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_frames: int = 4,
    side: int = 8,
) -> DataFrame:
    """Deterministic animated-GIF fixture: per document, n_frames
    side*side index frames derived from keyed md5 bytes (one digest
    chain per frame, same recipe as synthetic_images_from_documents)
    encode through functions/gif — the real container bytes the
    frame_sample operator consumes. The md5 chain is computed in
    Catalyst; only the (small) GIF assembly runs in the Arrow batch."""
    from graph_db_clustering_spark.functions import gif as gif_codec

    need = side * side
    frames_bytes = []
    for f in range(n_frames):
        parts = [
            F.unhex(F.md5(F.concat(F.col(text_col), F.lit(f"#g{f}.{i}"))))
            for i in range(need // 16 + 1)
        ]
        frames_bytes.append(F.substring(F.concat(*parts), 1, need))
    narrow = docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("video_id"),
        F.array(*frames_bytes).alias("raw_frames"),
    )
    pal = np.stack(
        [np.arange(256, dtype=np.uint8)] * 3, axis=1
    )  # identity grayscale palette

    def assemble(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            for rid, raw in zip(pdf["video_id"], pdf["raw_frames"]):
                idx = [
                    np.frombuffer(bytes(fb), dtype=np.uint8).reshape(side, side)
                    for fb in raw
                ]
                rows.append((int(rid), bytearray(gif_codec.encode(idx, pal))))
        yield pd.DataFrame(rows, columns=["video_id", "content"])

    out_schema = T.StructType(
        [
            T.StructField("video_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    return narrow.mapInPandas(assemble, out_schema)


def synthetic_avis_from_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_frames: int = 4,
    side: int = 8,
) -> DataFrame:
    """Deterministic AVI fixture (the synthetic_gifs_from_documents
    recipe, second container): the same keyed-md5 byte planes become
    side*side RGB frames (gray replicated) in an uncompressed BI_RGB
    AVI via functions/avi.encode. md5 chain in Catalyst, container
    assembly in the Arrow batch."""
    from graph_db_clustering_spark.functions import avi as avi_codec

    need = side * side
    frames_bytes = []
    for f in range(n_frames):
        parts = [
            F.unhex(F.md5(F.concat(F.col(text_col), F.lit(f"#a{f}.{i}"))))
            for i in range(need // 16 + 1)
        ]
        frames_bytes.append(F.substring(F.concat(*parts), 1, need))
    narrow = docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("video_id"),
        F.array(*frames_bytes).alias("raw_frames"),
    )

    def assemble(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            for rid, raw in zip(pdf["video_id"], pdf["raw_frames"]):
                frames = [
                    np.repeat(
                        np.frombuffer(bytes(fb), dtype=np.uint8).reshape(
                            side, side
                        )[:, :, None],
                        3,
                        axis=2,
                    )
                    for fb in raw
                ]
                rows.append((int(rid), bytearray(avi_codec.encode(frames))))
        yield pd.DataFrame(rows, columns=["video_id", "content"])

    out_schema = T.StructType(
        [
            T.StructField("video_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    return narrow.mapInPandas(assemble, out_schema)


def _wav_meta(content: bytes):
    """RIFF/WAVE header walk -> (rate, channels, n_samples per channel)
    WITHOUT decoding any sample: fmt gives rate/channels/block size,
    the data chunk LENGTH gives the sample count (PCM/float), and
    compressed formats use the fact chunk (falling back to a
    block-geometry estimate for IMA ADPCM)."""
    import struct as _struct

    pos, n = 12, len(content)
    fmt = None
    data_len = None
    fact = None
    while pos + 8 <= n:
        cid = content[pos : pos + 4]
        (clen,) = _struct.unpack("<I", content[pos + 4 : pos + 8])
        body = content[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            audio_fmt, channels, rate = _struct.unpack("<HHI", body[:8])
            block_align = _struct.unpack("<H", body[12:14])[0]
            bits = _struct.unpack("<H", body[14:16])[0]
            fmt = (audio_fmt, channels, rate, bits, block_align)
        elif cid == b"fact":
            fact = _struct.unpack("<I", body[:4])[0]
        elif cid == b"data":
            data_len = clen
        pos += 8 + clen + (clen & 1)
    if fmt is None:
        return None, None, None
    audio_fmt, channels, rate, bits, block_align = fmt
    n_samples = None
    if data_len is not None:
        if audio_fmt in (1, 3) and bits and channels:
            n_samples = data_len // (channels * (bits // 8))
        elif fact is not None:
            n_samples = fact
        elif audio_fmt == 17 and block_align and channels:
            per_block = (block_align - 4 * channels) * 2 // channels + 1
            n_samples = (data_len // block_align) * per_block
    return rate, channels, n_samples


# MPEG-1 Layer III frame-header tables (ISO 11172-3)
_MP3_BITRATES_V1L3 = (
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320
)
_MP3_RATES_V1 = (44100, 48000, 32000)
# ADTS sampling_frequency_index table (ISO 14496-3 §1.6.3.4)
_ADTS_RATES = (
    96000, 88200, 64000, 48000, 44100, 32000,
    24000, 22050, 16000, 12000, 11025, 8000, 7350,
)


def _probe_one(content: bytes) -> tuple[str, int | None, int | None, float | None]:
    """-> (container, sample_rate, channels, duration_s_estimate).

    Corrupt/truncated headers classify as ('corrupt', None, None, None)
    instead of raising — a probe over a dirty crawl must not kill the
    task on one bad file.

    WAV probes exactly from its HEADERS (fmt chunk + data-chunk length +
    fact chunk — no sample decode, true channel count). Compressed containers
    probe from their headers WITHOUT decoding samples — the decode gate
    stays, but a pipeline can filter by rate/duration first:
      MP3  (MPEG-1 Layer III): first frame header's bitrate/rate fields;
           duration ~= bytes / byterate (CBR assumption, documented).
      FLAC: STREAMINFO block carries exact rate/channels/total samples.
      OGG:  Vorbis identification header rate/channels; duration from
            the final page's granule position (header-only tail scan).
    Unknown magic -> ('unknown', None, None, None)."""
    import struct as _struct

    try:
        return _probe_one_inner(content)
    except (ValueError, IndexError, KeyError, _struct.error):
        return "corrupt", None, None, None


def _probe_one_inner(content: bytes) -> tuple[str, int | None, int | None, float | None]:
    import struct as _struct

    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        rate, channels, n_samples = _wav_meta(content)
        return (
            "wav",
            int(rate) if rate else None,
            int(channels) if channels else None,
            (n_samples / rate) if rate and n_samples is not None else None,
        )
    if content[:4] == b"fLaC":
        # STREAMINFO: first metadata block, fixed 34-byte body. Layout
        # after the min/max block/frame sizes (10 bytes): rate 20 bits,
        # channels-1 3 bits, bps-1 5 bits, total samples 36 bits.
        body = content[8:42]
        rate = (body[10] << 12) | (body[11] << 4) | (body[12] >> 4)
        channels = ((body[12] >> 1) & 0x07) + 1
        total = ((body[13] & 0x0F) << 32) | _struct.unpack(">I", body[14:18])[0]
        return "flac", rate, channels, (total / rate) if rate else None
    if content[4:8] == b"ftyp":
        # M4A / audio-in-MP4 (round 11): header-only via functions/mp4
        from graph_db_clustering_spark.functions import mp4 as _mp4

        meta = _mp4.probe(content)
        auds = [
            t for t in meta["tracks"] if t.get("handler") == "soun"
        ]
        if not auds:
            return "mp4", None, None, meta.get("duration_s")
        t = auds[0]
        rate = t.get("sample_rate")
        return (
            "m4a",
            int(rate) if rate else None,
            t.get("channels"),
            t.get("duration_s") or meta.get("duration_s"),
        )
    if content[:4] == b"OggS":
        j = content.find(b"OpusHead")
        if 0 <= j <= 200 and j + 16 <= len(content):
            # Ogg Opus id header: version(1) channels(1) preskip(2)
            # input_rate(4 LE); granules tick at 48 kHz regardless
            channels = content[j + 9]
            (rate,) = _struct.unpack("<I", content[j + 12 : j + 16])
            dur = None
            k = content.rfind(b"OggS")
            if k >= 0 and k + 14 <= len(content):
                (gran,) = _struct.unpack("<q", content[k + 6 : k + 14])
                if gran > 0:
                    dur = gran / 48000.0
            return "ogg-opus", rate or None, channels, dur
        i = content.find(b"\x01vorbis")
        if i >= 0 and i + 16 <= len(content):
            channels = content[i + 11]
            (rate,) = _struct.unpack("<I", content[i + 12 : i + 16])
            # duration from the LAST page's granule position (total
            # decoded samples, per the Vorbis granule convention) —
            # still header-only, no packet decode
            dur = None
            j = content.rfind(b"OggS")
            if rate and j >= 0 and j + 14 <= len(content):
                (gran,) = _struct.unpack("<q", content[j + 6 : j + 14])
                if gran > 0:
                    dur = gran / rate
            return "ogg", rate, channels, dur
        return "ogg", None, None, None
    if content[:4] == b"\x1aE\xdf\xa3":  # EBML: WebM/Matroska audio
        from graph_db_clustering_spark.functions import matroska as _mk

        meta = _mk.probe(content)
        auds = [t for t in meta["tracks"] if t.get("type") == "audio"]
        if not auds:
            return meta["container"], None, None, meta.get("duration_s")
        t = auds[0]
        rate = t.get("sample_rate")
        return (
            meta["container"],
            int(rate) if rate else None,
            t.get("channels"),
            meta.get("duration_s"),
        )
    # AAC in ADTS (round 12, VERDICT r11 Next #6 — PROBE only; the
    # entropy decode gate is PERMANENT, decided round 13 mirroring the
    # MP3 escape-table call: AAC's scalefactor/spectral Huffman
    # codebooks would have to be memorized with no independent
    # transcription source in this container to cross-check against,
    # violating the repo's every-codec-claim-is-cross-checked rule):
    # syncword 0xFFF with layer bits 00.
    # Header fields per ISO 13818-7 / 14496-3; duration is exact from
    # walking every frame_length (1024 samples per raw data block).
    if (
        len(content) >= 7
        and content[0] == 0xFF
        and (content[1] & 0xF6) == 0xF0
    ):
        sr_idx = (content[2] >> 2) & 0x0F
        if sr_idx < len(_ADTS_RATES):
            profile = (content[2] >> 6) & 0x03
            rate = _ADTS_RATES[sr_idx]
            channels = ((content[2] & 0x01) << 2) | (content[3] >> 6)
            samples = 0
            i = 0
            while i + 7 <= len(content):
                if not (
                    content[i] == 0xFF
                    and (content[i + 1] & 0xF6) == 0xF0
                ):
                    break
                flen = (
                    ((content[i + 3] & 0x03) << 11)
                    | (content[i + 4] << 3)
                    | (content[i + 5] >> 5)
                )
                if flen < 7:
                    break
                blocks = (content[i + 6] & 0x03) + 1
                samples += 1024 * blocks
                i += flen
            dur = (samples / rate) if samples else None
            prof = ("main", "lc", "ssr", "ltp")[profile]
            return f"aac-{prof}", rate, channels or None, dur
    # MP3: optional ID3v2 tag, then the first 0xFFE-synced frame
    pos = 0
    if content[:3] == b"ID3":
        size = (
            (content[6] & 0x7F) << 21 | (content[7] & 0x7F) << 14
            | (content[8] & 0x7F) << 7 | (content[9] & 0x7F)
        )
        pos = 10 + size
    for i in range(pos, min(len(content) - 4, pos + 4096)):
        b0, b1, b2, _ = content[i : i + 4]
        if b0 == 0xFF and (b1 & 0xE0) == 0xE0:
            version = (b1 >> 3) & 0x03
            layer = (b1 >> 1) & 0x03
            if version != 3 or layer != 1:  # MPEG-1 Layer III only
                continue
            br_idx, sr_idx = b2 >> 4, (b2 >> 2) & 0x03
            if br_idx in (0, 15) or sr_idx == 3:
                continue
            bitrate = _MP3_BITRATES_V1L3[br_idx] * 1000
            rate = _MP3_RATES_V1[sr_idx]
            channels = 1 if ((content[i + 3] >> 6) & 0x03) == 3 else 2
            dur = (len(content) - i) * 8.0 / bitrate
            return "mp3", rate, channels, dur
    return "unknown", None, None, None


def audio_probe(
    df: DataFrame, id_col: str = "audio_id", content_col: str = "content"
) -> DataFrame:
    """Container/rate/channels/duration metadata for an audio binary
    column -> (id, container, sample_rate, channels, duration_s). One
    Arrow-batched pass; bytes never leave the executors. This is the
    filter-before-decode step of an audio pipeline: WAV probes exactly,
    MP3/FLAC/OGG probe their headers while full sample decode keeps the
    entropy-codec gate."""
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("container", T.StringType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("duration_s", T.DoubleType()),
        ]
    )

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, content in zip(pdf["id"], pdf["content"]):
                c, r, ch, d = _probe_one(bytes(content))
                rows.append((int(rid), c, r, ch, d))
            yield pd.DataFrame(
                rows, columns=["id", "container", "sample_rate", "channels", "duration_s"]
            )

    narrow = df.select(F.col(id_col).alias("id"), F.col(content_col).alias("content"))
    return narrow.mapInPandas(probe, out_schema)


def _image_probe_one(content: bytes) -> tuple[str, int | None, int | None]:
    """-> (container, width, height) from headers only — no pixel decode.
    JPEG walks markers to the first SOFn; PNG reads IHDR; GIF the
    logical-screen descriptor; BMP the info header; binary PNM the
    header fields; AVI the vids BITMAPINFOHEADER. Corrupt/truncated
    headers classify as ('corrupt', None, None) instead of raising."""
    import struct as _struct

    try:
        return _image_probe_one_inner(content)
    except (ValueError, IndexError, KeyError, _struct.error):
        return "corrupt", None, None


def _image_probe_one_inner(content: bytes) -> tuple[str, int | None, int | None]:
    import struct as _struct

    if content[:2] == b"\xff\xd8":
        i, n = 2, len(content)
        while i + 4 <= n and content[i] == 0xFF:
            marker = content[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            (seglen,) = _struct.unpack(">H", content[i + 2 : i + 4])
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = _struct.unpack(">HH", content[i + 5 : i + 9])
                return "jpeg", w, h
            i += 2 + seglen
        return "jpeg", None, None
    if content[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = _struct.unpack(">II", content[16:24])
        return "png", w, h
    if content[:6] in (b"GIF87a", b"GIF89a"):
        w, h = _struct.unpack("<HH", content[6:10])
        return "gif", w, h
    if content[:2] == b"BM":
        w, h = _struct.unpack("<ii", content[18:26])
        return "bmp", w, abs(h)
    if content[:2] in (b"P5", b"P6"):
        from graph_db_clustering_spark.functions.simple_images import pnm_header

        w, h, _maxval, _pos = pnm_header(content)
        return "pnm", w, h
    if content[:4] in (b"II*\x00", b"MM\x00*"):
        from graph_db_clustering_spark.functions.simple_images import tiff_size

        w, h = tiff_size(content)
        return "tiff", w, h
    if content[:4] == b"RIFF" and content[8:12] == b"AVI ":
        from graph_db_clustering_spark.functions import avi as _avi

        top = (12, 8 + _struct.unpack("<I", content[4:8])[0])
        hdrl = next(iter(_avi._find_lists(content, *top, b"hdrl")), None)
        if hdrl:
            # NB: _video_format grew a 5th element in round 10; a
            # 4-tuple unpack here silently classified every AVI as
            # 'corrupt' (caught round 11) — slice, don't unpack
            _, w, h, _ = _avi._video_format(content, hdrl)[:4]
            return "avi", w, abs(h)
        return "avi", None, None
    if content[:4] == b"\x1aE\xdf\xa3":  # EBML: WebM / Matroska
        from graph_db_clustering_spark.functions import matroska as _mk

        meta = _mk.probe(content)
        vids = [t for t in meta["tracks"] if t.get("type") == "video"]
        if vids:
            return meta["container"], vids[0]["width"], vids[0]["height"]
        return meta["container"], None, None
    return "unknown", None, None


def image_probe(
    df: DataFrame, id_col: str = "image_id", content_col: str = "content"
) -> DataFrame:
    """Container + dimensions for an image/video binary column ->
    (id, container, width, height) from headers only. The
    filter-before-decode step: dedupe or bucket 100 TB of images by
    size/format while reading a few dozen bytes per file, decoding
    nothing."""
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("container", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, content in zip(pdf["id"], pdf["content"]):
                c, w, h = _image_probe_one(bytes(content))
                rows.append((int(rid), c, w, h))
            yield pd.DataFrame(rows, columns=["id", "container", "width", "height"])

    narrow = df.select(F.col(id_col).alias("id"), F.col(content_col).alias("content"))
    return narrow.mapInPandas(probe, out_schema)


def dhash(
    df: DataFrame,
    id_col: str = "image_id",
    content_col: str = "content",
    meta_col: str = "meta",
) -> DataFrame:
    """Perceptual difference-hash -> (id, phash: long). dHash: decode,
    grayscale, nearest-resize to 9x8, and take the 64 horizontal
    gradient signs as bits — near-identical images (recompression,
    small edits) land within a few bits of each other, byte-identical
    images hash identically. One Arrow pass over the usual multimodal
    table shape."""
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("phash", T.LongType()),
        ]
    )

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for rid, content, m in zip(pdf["id"], pdf["content"], pdf["meta"]):
                arr = _decode_one(
                    bytes(content), m["height"], m["width"], m["channels"], m["format"]
                )
                g = _grayscale(arr).astype(np.float64)
                small = _resize_nn(g, 8, 9)
                bits = (small[:, 1:] > small[:, :-1]).ravel()
                h = 0
                for b in bits:
                    h = (h << 1) | int(b)
                ids.append(int(rid))
                hashes.append(h - (1 << 64) if h >= (1 << 63) else h)
            yield pd.DataFrame({"id": ids, "phash": hashes})

    narrow = df.select(
        F.col(id_col).alias("id"),
        F.col(content_col).alias("content"),
        F.col(meta_col).alias("meta"),
    )
    return narrow.mapInPandas(hash_batch, out_schema)


def _banded(hashes: DataFrame, id_alias: str, hash_alias: str, bands: int) -> DataFrame:
    width = 64 // bands
    mask = (1 << width) - 1
    slices = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftrightunsigned(F.col("phash"), i * width)
                .bitwiseAND(F.lit(mask))
                .alias("key"),
            )
            for i in range(bands)
        ]
    )
    return hashes.select(
        F.col("id").alias(id_alias),
        F.col("phash").alias(hash_alias),
        F.explode(slices).alias("s"),
    ).select(
        id_alias, hash_alias, F.col("s.band").alias("band"), F.col("s.key").alias("key")
    )


def image_near_dups_against(
    new_hashes: DataFrame,
    index_hashes: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Bipartite perceptual near-dup check: (new_id, index_id, hamming)
    for every new image within `max_hamming` of an INDEXED one — the
    "new crawl vs history" shape. Same pigeonhole-banded equi-join as
    image_near_dups (recall guaranteed for max_hamming <= bands-1,
    never all-pairs; an OR-of-band-equalities join would degenerate to
    a nested loop, which is why both sides explode to (band, key)
    rows)."""
    if max_hamming > bands - 1:
        raise ValueError(
            f"max_hamming={max_hamming} needs bands >= {max_hamming + 1} "
            "for guaranteed recall (pigeonhole)"
        )
    a = _banded(new_hashes, "new_id", "new_phash", bands)
    b = _banded(index_hashes, "index_id", "index_phash", bands)
    ham = F.bit_count(F.col("new_phash").bitwiseXOR(F.col("index_phash")))
    return (
        a.join(b, ["band", "key"])
        .select("new_id", "index_id", "new_phash", "index_phash")
        .distinct()
        .select("new_id", "index_id", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def image_near_dups(
    hashes: DataFrame, max_hamming: int = 3, bands: int = 4
) -> DataFrame:
    """Near-duplicate image pairs from perceptual hashes ->
    (id1, id2, hamming). Banded equi-join, never all-pairs: the 64-bit
    hash splits into `bands` equal slices; by pigeonhole, any pair
    within hamming <= bands-1 shares at least one identical slice, so
    recall is GUARANTEED for max_hamming <= bands-1 (the default 3/4;
    raise `bands` for larger radii). Candidates verify on exact popcount
    of the XOR — codegen end to end, no Python."""
    if max_hamming > bands - 1:
        raise ValueError(
            f"max_hamming={max_hamming} needs bands >= {max_hamming + 1} "
            "for guaranteed recall (pigeonhole)"
        )
    banded = _banded(hashes, "id", "phash", bands)
    a = banded.alias("a")
    b = banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            F.col("a.phash").alias("h1"),
            F.col("b.phash").alias("h2"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("h1").bitwiseXOR(F.col("h2")))
    return cands.select(
        "id1", "id2", ham.alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


def _video_probe_one(
    content: bytes,
) -> tuple[str, str | None, int | None, int | None, int | None, float | None]:
    """-> (container, codec, width, height, n_frames, duration_s) from
    container headers only — no frame decode (MP4 probe never touches
    mdat). Corrupt/truncated input classifies as ('corrupt', ...)."""
    import struct as _struct

    try:
        if content[4:8] == b"ftyp":
            from graph_db_clustering_spark.functions import mp4

            meta = mp4.probe(content)
            vids = [
                t for t in meta["tracks"] if t.get("handler") == "vide"
            ]
            t = vids[0] if vids else (
                meta["tracks"][0] if meta["tracks"] else {}
            )
            return (
                "mp4", t.get("codec"), t.get("width"), t.get("height"),
                t.get("n_samples"), meta["duration_s"],
            )
        if content[:4] == b"RIFF" and content[8:12] == b"AVI ":
            from graph_db_clustering_spark.functions import avi as _avi

            top = (12, 8 + _struct.unpack("<I", content[4:8])[0])
            hdrl = next(iter(_avi._find_lists(content, *top, b"hdrl")), None)
            if hdrl is None:
                return "avi", None, None, None, None, None
            usec, n_frames = _struct.unpack("<I", content[hdrl[0] + 8:hdrl[0] + 12])[0], _struct.unpack(
                "<I", content[hdrl[0] + 8 + 16:hdrl[0] + 8 + 20])[0]
            _idx, w, h, comp = _avi._video_format(content, hdrl)[:4]
            codec = "mjpeg" if comp in _avi._MJPG_FOURCCS else (
                "rawvideo" if comp == b"\x00" * 4 else
                comp.decode("latin-1").strip())
            return ("avi", codec, w, abs(h), n_frames,
                    n_frames * usec / 1e6 if usec else None)
        if content[:6] in (b"GIF87a", b"GIF89a"):
            from graph_db_clustering_spark.functions import gif as _gif

            w, h = _struct.unpack("<HH", content[6:10])
            n, dur = _gif.frame_count_and_duration(content)
            return "gif", "gif-lzw", w, h, n, dur
        if content[:4] == b"\x1aE\xdf\xa3":  # EBML: WebM / Matroska
            from graph_db_clustering_spark.functions import matroska as _mk

            meta = _mk.probe(content)
            vids = [
                t for t in meta["tracks"] if t.get("type") == "video"
            ]
            t = vids[0] if vids else (
                meta["tracks"][0] if meta["tracks"] else {}
            )
            return (
                meta["container"], t.get("codec"), t.get("width"),
                t.get("height"), None, meta["duration_s"],
            )
        return "unknown", None, None, None, None, None
    except (ValueError, IndexError, KeyError, _struct.error):
        return "corrupt", None, None, None, None, None


def video_probe(
    df: DataFrame, id_col: str = "video_id", content_col: str = "content"
) -> DataFrame:
    """Video metadata probe -> (id, container, codec, width, height,
    n_frames, duration_s) from headers only. The filter-before-decode
    step for the dominant crawled-video container (MP4/ISO-BMFF: ftyp
    brand, mvhd duration, tkhd dims, stsd codec fourcc, stsz sample
    count — never reads mdat), plus AVI (avih/strf) and animated GIF
    (block walk, no LZW decode). At 100 TB this reads a few hundred
    header bytes per blob and lets the pipeline route by codec before
    paying for any decoder."""
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("container", T.StringType()),
            T.StructField("codec", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("duration_s", T.DoubleType()),
        ]
    )

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, content in zip(pdf["id"], pdf["content"]):
                c, codec, w, h, n, dur = _video_probe_one(bytes(content))
                rows.append((int(rid), c, codec, w, h, n, dur))
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "container", "codec", "width", "height",
                    "n_frames", "duration_s",
                ],
            )

    narrow = df.select(
        F.col(id_col).alias("id"), F.col(content_col).alias("content")
    )
    return narrow.mapInPandas(probe, out_schema)


def synthetic_mp4s_from_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_frames: int = 4,
    side: int = 8,
    fps: int = 5,
    fragmented: bool = False,
) -> DataFrame:
    """Deterministic MP4 fixture (the synthetic_avis_from_documents
    recipe, third container): keyed-md5 byte planes become side*side
    gray frames, each REAL-JPEG-encoded (functions/jpeg.encode_gray)
    and muxed into an ISO-BMFF movie with a 'jpeg' sample entry
    (functions/mp4.encode; ``fragmented=True`` muxes moof/mdat CMAF
    fragments via functions/mp4.encode_fragmented instead — round
    12). md5 chain in Catalyst, JPEG + container assembly in the
    Arrow batch."""
    from graph_db_clustering_spark.functions import jpeg as jpeg_codec
    from graph_db_clustering_spark.functions import mp4 as mp4_codec

    mux = (
        mp4_codec.encode_fragmented if fragmented else mp4_codec.encode
    )

    need = side * side
    frames_bytes = []
    for f in range(n_frames):
        parts = [
            F.unhex(F.md5(F.concat(F.col(text_col), F.lit(f"#m{f}.{i}"))))
            for i in range(need // 16 + 1)
        ]
        frames_bytes.append(F.substring(F.concat(*parts), 1, need))
    narrow = docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("video_id"),
        F.array(*frames_bytes).alias("raw_frames"),
    )

    def assemble(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            for rid, raw in zip(pdf["video_id"], pdf["raw_frames"]):
                jps = [
                    jpeg_codec.encode_gray(
                        np.frombuffer(bytes(fb), dtype=np.uint8).reshape(
                            side, side
                        )
                    )
                    for fb in raw
                ]
                rows.append((
                    int(rid),
                    bytearray(
                        mux(jps, width=side, height=side, fps=fps)
                    ),
                ))
        yield pd.DataFrame(rows, columns=["video_id", "content"])

    out_schema = T.StructType(
        [
            T.StructField("video_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    return narrow.mapInPandas(assemble, out_schema)


def synthetic_webms_from_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic WebM fixture (round 11): per-document metadata
    skeletons from functions/matroska.encode — a real EBML container
    (head, Segment, Info, Tracks, empty Cluster) with doc-derived
    codec/dims/duration and NO media payload, exactly what the
    header-only probe path consumes. VP8/VP9 alternate by id so the
    probe's codec surface is exercised."""
    from graph_db_clustering_spark.functions import matroska as mk_codec

    narrow = docs.select(F.col(id_col).alias("video_id"))

    def assemble(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            for rid in pdf["video_id"]:
                rid = int(rid)
                rows.append((
                    rid,
                    bytearray(mk_codec.encode(
                        codec="V_VP9" if rid % 2 == 0 else "V_VP8",
                        width=320 + 16 * (rid % 4),
                        height=180 + 9 * (rid % 4),
                        duration_s=1.0 + 0.5 * (rid % 3),
                    )),
                ))
        yield pd.DataFrame(rows, columns=["video_id", "content"])

    out_schema = T.StructType(
        [
            T.StructField("video_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    return narrow.mapInPandas(assemble, out_schema)


def audio_tags(
    df: DataFrame, id_col: str = "audio_id", content_col: str = "content"
) -> DataFrame:
    """Normalized audio metadata -> (id, container, title, artist,
    album, year) from TAG HEADERS only (functions/tags: ID3v2, Vorbis
    comments / OpusTags, MP4 ilst). The filter/derive-before-decode
    metadata surface: at 100 TB a pipeline derives labels and dedup
    keys from tags without paying for a single sample decode."""
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("container", T.StringType()),
            T.StructField("title", T.StringType()),
            T.StructField("artist", T.StringType()),
            T.StructField("album", T.StringType()),
            T.StructField("year", T.StringType()),
        ]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from graph_db_clustering_spark.functions import tags as tag_codec

        for pdf in batches:
            rows = []
            for rid, content in zip(pdf["id"], pdf["content"]):
                raw = bytes(content)
                if raw[:3] == b"ID3":
                    container = "mp3"
                elif raw[:4] == b"OggS":
                    container = "ogg"
                elif raw[4:8] == b"ftyp":
                    container = "m4a"
                else:
                    container = "unknown"
                try:
                    t = tag_codec.audio_tags(raw)
                except ValueError:
                    container, t = "corrupt", {}
                rows.append((
                    int(rid), container, t.get("title"), t.get("artist"),
                    t.get("album"), t.get("year"),
                ))
            yield pd.DataFrame(
                rows,
                columns=["id", "container", "title", "artist", "album",
                         "year"],
            )

    narrow = df.select(
        F.col(id_col).alias("id"), F.col(content_col).alias("content")
    )
    return narrow.mapInPandas(extract, out_schema)
