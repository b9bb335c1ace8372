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


def funnel_depth(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Ordered-funnel depth per user (round 7): how many of ``steps``
    each user completed IN ORDER — step k counts only if it happens
    strictly after the user's completion of step k-1 (first-touch
    semantics: each step anchors at its earliest qualifying event).

    Returns (user_col, depth) for every user in ``events``.

    Plan: one conditional min-aggregate per step — step 0 is a plain
    groupBy-min over that event type, each later step filters to its
    type, joins the previous step's anchor times (user-keyed equi-join)
    and min-aggregates the qualifying timestamps. The anchor chain
    guarantees reached_k is a subset of reached_{k-1}, so depth is the
    SUM of per-step reached flags, assembled as one left join per step
    onto the user base — no Union doubling (a semi/anti union per step
    would reference the depth frame twice per iteration, 2^steps plan
    growth); the anchor chain embeds its prior stages, so plan leaves
    grow quadratically in step count, fine for real funnel lengths
    (plan-pinned in tests). All hash aggregates with map-side
    partials; no windows, no per-user sort."""
    anchors = None  # DataFrame (user, t_prev) of users who reached k-1
    reached_flags = []
    for k, step in enumerate(steps):
        stage = events.filter(F.col(type_col) == step).select(
            user_col, F.col(ts_col).alias("__ts")
        )
        if anchors is not None:
            stage = stage.join(anchors, user_col).filter(
                F.col("__ts") > F.col("__t_prev")
            )
        anchors = stage.groupBy(user_col).agg(
            F.min("__ts").alias("__t_prev")
        )
        reached_flags.append(
            anchors.select(user_col).withColumn(f"__r{k}", F.lit(1))
        )
    depth = events.select(user_col).distinct()
    for flag in reached_flags:
        depth = depth.join(flag, user_col, "left")
    return depth.select(
        user_col,
        sum(
            (F.coalesce(F.col(f"__r{k}"), F.lit(0)) for k in range(len(steps))),
            F.lit(0),
        ).alias("depth"),
    )


def cohort_retention(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    max_offset: int = 7,
) -> DataFrame:
    """Classic cohort-retention matrix (round 7): cohort = each user's
    first-activity date; a user is retained at offset d if they have
    any event exactly d days after their cohort date. Returns
    (cohort_date, day_offset, users) for offsets 0..max_offset.

    Plan: one min-aggregate for cohort dates (user-keyed), one
    user-keyed equi-join back, one distinct + count aggregate — at
    100 TB the join is the only full shuffle and it is keyed on the
    user id (AQE-skew-safe); the output is |cohorts| * max_offset
    rows."""
    cohorts = events.groupBy(user_col).agg(
        F.min(F.to_date(ts_col)).alias("cohort_date")
    )
    active = (
        events.select(user_col, F.to_date(ts_col).alias("day"))
        .distinct()
        .join(cohorts, user_col)
        .withColumn("day_offset", F.datediff("day", "cohort_date"))
        .filter(F.col("day_offset") <= max_offset)
    )
    return (
        active.groupBy("cohort_date", "day_offset")
        .agg(F.count_distinct(user_col).alias("users"))
    )


def decayed_counts(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    halflife_s: float = 3600.0,
) -> DataFrame:
    """Exponentially-decayed event counts per key, evaluated at each
    key's LAST event: sum over events of 2^(-(T_key - t) / halflife).
    The recency-weighted popularity readout (trending topics, hot
    shards) — a full count forgets nothing, a window forgets abruptly;
    half-life decay is the standard compromise. Returns
    (key_col, n_events long, decayed double).

    One partial-aggregated groupBy: max(ts) and the decayed sum fold in
    the same pass because the sum telescopes — partials computed
    against a local reference fold exactly into the global one (the
    identity the streaming form in streaming/stateful.py relies on
    per micro-batch). Exponents use exact epoch-microsecond integers so
    the batch and DuckDB forms agree bit-for-bit before rounding."""
    us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(key_col)
    per = events.select(
        key_col, us.alias("us"), F.max(us).over(w).alias("T")
    )
    return (
        per.groupBy(key_col)
        .agg(
            F.count("*").alias("n_events"),
            F.sum(
                F.pow(F.lit(0.5), (F.col("T") - F.col("us")) / F.lit(halflife_s * 1e6))
            ).alias("decayed"),
        )
    )
