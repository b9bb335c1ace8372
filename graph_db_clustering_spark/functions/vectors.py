"""Vector math over ArrayType columns as pure Catalyst expressions.

The reference computes cosine similarity in a driver-side Python loop
(reference: kmeans_clustering/image_classification.py:403-414, called from
the O(N*k) nested loop at :417-433). Here the same math is a higher-order
function expression (`zip_with` + `aggregate`) that runs inside whole-stage
codegen on executors — no Python crossing, no driver materialization, and it
scales with the data instead of the driver.

All accumulation is forced to DOUBLE so results are deterministic and match
the DuckDB oracle (embeddings are stored as float32 arrays).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

def _zero() -> Column:
    # built lazily: F.lit needs an active SparkContext at call time
    return F.lit(0.0).cast("double")


def vec_sum(v: Column) -> Column:
    """Sum of elements, accumulated in double."""
    return F.aggregate(v, _zero(), lambda acc, x: acc + x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array columns (element-wise, double accumulation)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        _zero(),
        lambda acc, x: acc + x,
    )


def l2_norm(v: Column) -> Column:
    return F.sqrt(
        F.aggregate(v, _zero(), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; the corrected form of the reference's
    `cosine_similarity` (image_classification.py:403-414)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def unit(v: Column) -> Column:
    """L2-normalized copy (double elements). For pairwise similarity
    pipelines, normalize each side ONCE and use dot() per pair — one HOF
    aggregate per pair instead of three (dot + both norms); ~2-3x less
    expression work in N*k assignment loops."""
    n = l2_norm(v)
    return F.transform(v, lambda x: x.cast("double") / n)
