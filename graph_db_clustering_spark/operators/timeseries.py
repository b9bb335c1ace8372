"""Time-series rollups (hypertable-style continuous aggregates).

A hypertable rollup maintains the same aggregate at several time
resolutions (minute/hour/day). Instead of one groupBy per tier (T scans,
T shuffles), each event row is fanned out to its T bucket labels with one
explode and aggregated once — one scan, one shuffle keyed by
(level, bucket), map-side partial aggregation collapsing each partition to
at most |levels| x |buckets| rows. Incremental maintenance falls out of
Structured Streaming: the same plan over a stream with a watermark is the
continuous aggregate, foreachBatch appending finalized buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_LEVELS = ("MINUTE", "HOUR", "DAY")


def rollup_time_series(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    levels: tuple[str, ...] = DEFAULT_LEVELS,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Tiered aggregate: (level, bucket, *group_cols, cnt, sv).

    cnt/sum per (resolution level, truncated bucket, optional extra
    keys); sums are rounded in-query for oracle stability. All levels in
    one pass — the explode multiplies rows by len(levels) inside the map
    stage, before partial aggregation, so shuffled bytes stay
    O(buckets), not O(events)."""
    tiers = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(lv).alias("level"),
                    F.date_trunc(lv, F.col(ts_col)).alias("bucket"),
                )
                for lv in levels
            ]
        )
    ).alias("tier")
    return (
        events.select(*group_cols, F.col(value_col).alias("__v"), tiers)
        .select(*group_cols, "__v", "tier.level", "tier.bucket")
        .groupBy("level", "bucket", *group_cols)
        .agg(F.count("*").alias("cnt"), F.round(F.sum("__v"), 4).alias("sv"))
    )
