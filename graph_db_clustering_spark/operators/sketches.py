"""Deterministic Count-Min Sketch over DataFrames.

The HLL / approx_top_k entries use Spark's DataSketches builtins; CMS
(Cormode & Muthukrishnan 2005) is built here from first principles
because its guarantee is the one the builtins don't give: a point
FREQUENCY estimate with one-sided error (never an undercount) from
O(depth * width) memory, mergeable by cell-wise addition.

Hashing is the engine-portable md5 idiom used across the repo
(hashed_bucket / weighted_sample): row j's bucket for key k is the
first 8 md5 hex digits of "j:k" mod width — fully deterministic, so
the DuckDB oracle can rebuild the identical sketch and the identical
estimates (most CMS implementations are seeded-random; determinism is
what makes this one externally checkable).

Scale shape: the sketch build is ONE partial-aggregated groupBy over
depth exploded copies (shuffle carries at most depth*width cells per
partition); estimation joins keys against the depth*width-cell table
(broadcast-sized by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(j: int, key, width: int):
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{j}:"), key)), 1, 8), 16, 10
        ).cast("long")
        % width
    )


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """Build the sketch: (row, bucket, cnt) cells, one count per
    (depth-row, bucket). Missing cells are implicit zeros."""
    key = F.col(key_col).cast("string")
    rows = F.array(
        *[
            F.struct(F.lit(j).alias("row"), _bucket(j, key, width).alias("bucket"))
            for j in range(depth)
        ]
    )
    return (
        df.select(F.explode(rows).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    keys: DataFrame, cms: DataFrame, key_col: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """Point-frequency estimate per key: min over depth rows of the
    key's cell — CMS's one-sided guarantee (estimate >= true count;
    the overcount is other keys colliding into the same cells).
    `keys` should be distinct on key_col. depth/width MUST match the
    build."""
    key = F.col(key_col).cast("string")
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"), _bucket(j, key, width).alias("bucket")
                    )
                    for j in range(depth)
                ]
            )
        ).alias("p"),
    ).select(key_col, F.col("p.row").alias("row"), F.col("p.bucket").alias("bucket"))
    return (
        probes.join(cms, ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_est"))
    )


def hll_build(
    df: DataFrame, key_col: str, group_cols: list, p: int = 6
) -> DataFrame:
    """Deterministic HyperLogLog registers (Flajolet et al. 2007) per
    group: m = 2^p registers; a key's bucket is the first 8 md5 hex
    digits mod m, its rank rho the 1-based position of the first 1 bit
    in the NEXT 13 hex digits (52 bits; all-zero caps at 53). Registers
    are max-merged — the sketch is mergeable by cell-wise MAX, and the
    md5 idiom makes it externally rebuildable (the DuckDB oracle
    reproduces every register). One partial-aggregated groupBy builds
    all groups' registers at once; memory is m cells per group."""
    m = 1 << p
    key = F.col(key_col).cast("string")
    h = F.md5(key)
    bucket = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % m
    x = F.conv(F.substring(h, 9, 13), 16, 10).cast("long")
    rho = F.when(x == 0, F.lit(53)).otherwise(
        F.instr(F.lpad(F.bin(x), 52, "0"), "1")
    )
    return (
        df.select(*group_cols, bucket.alias("b"), rho.alias("rho"))
        .groupBy(*group_cols, "b")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(registers: DataFrame, group_cols: list, p: int = 6) -> DataFrame:
    """Registers -> per-group cardinality estimate: the raw HLL
    harmonic mean alpha*m^2 / sum(2^-M[b]) (absent registers contribute
    2^0 = 1 each), with the paper's small-range correction
    m*ln(m/V) when E <= 2.5m and V (zero registers) > 0. alpha is the
    spec constant for the register count (0.709 at m = 64)."""
    m = 1 << p
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1.0 + 1.079 / m)
    )
    agg = registers.groupBy(*group_cols).agg(
        (
            F.sum(F.pow(F.lit(2.0), -F.col("rho"))) + (m - F.count("*"))
        ).alias("z"),
        (m - F.count("*")).alias("v"),
    )
    raw = F.lit(alpha * m * m) / F.col("z")
    est = F.when(
        (raw <= 2.5 * m) & (F.col("v") > 0),
        m * F.log(F.lit(float(m)) / F.col("v")),
    ).otherwise(raw)
    return agg.select(*group_cols, est.alias("hll_est"))
