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

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
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


def rolling_pandas_ema(
    df: DataFrame,
    part_col: str,
    order_col: str,
    value_col: str,
    window_rows: int = 10,
    alpha: float = 0.3,
    out: str = "ema",
) -> DataFrame:
    """Rolling exponentially-weighted mean over the trailing
    ``window_rows`` rows, as a pandas GROUPED_AGG UDAF evaluated OVER a
    bounded window frame (SURVEY §2.11 windowed-pandas-UDF surface) —
    the escape hatch for rolling statistics Catalyst has no built-in for
    (EMA's weights depend on position inside the frame, so no
    sum/avg/lag composition expresses it).

    Scale shape: the window is partitioned by ``part_col`` (parallel
    across series) and the frame is BOUNDED (rowsBetween -k..0), so each
    Arrow batch ships at most k+1 values per row — state never grows
    with partition length. A trailing unbounded frame would be the
    one-series-one-task trap; this is the right form at 100 TB.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _ema(v: pd.Series) -> float:
        if v.empty:
            return None
        w = (1.0 - alpha) ** np.arange(len(v) - 1, -1, -1)
        return float((v.to_numpy() * w).sum() / w.sum())

    frame = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(-(window_rows - 1), 0)
    )
    return df.withColumn(out, _ema(F.col(value_col)).over(frame))
