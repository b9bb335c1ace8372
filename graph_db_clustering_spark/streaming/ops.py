"""Streaming operators over the `events` stream (SURVEY §2.10).

Each operator is a plain DataFrame transformation — it works identically on
a batch DataFrame and a streaming one (Structured Streaming's unbounded-
table model). The batch-equivalent forms are oracle-declared in the corpus
(Q39/Q40/Q41/q42_sessions); tests assert the streamed result converges to
the batch result after a full replay (stream-batch consistency,
SURVEY §5.2.5).

State-store scale posture: every stateful op below keys its state by a
bounded-cardinality key (window x event_type, user_id, event_id within the
watermark horizon), and every aggregation carries a watermark so state is
evicted — unbounded-state streaming is a bug, not a feature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-(tumbling window, event_type) count + value sum — batch form Q39.

    Output: (w_start, w_end, event_type, cnt, sv)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 4).alias("sv"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "cnt",
            "sv",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Sliding-window event counts — batch form Q40 (each event lands in
    window/slide overlapping windows). Output: (w_start, w_end, cnt)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("w_start"), F.col("w.end").alias("w_end"), "cnt")
    )


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-user session windows (gap-based). A session merges events whose
    timestamps are strictly less than `gap` apart; the window spans
    [first_ts, last_ts + gap). Batch-equivalent: q42_sessions (lag + cumsum
    sessionization — the portable SQL form; session_window itself has no
    ANSI equivalent, SURVEY §2.10). Output: (user_id, s_start, s_end, cnt)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count("*").alias("cnt"))
        .select(
            "user_id",
            F.col("s.start").alias("s_start"),
            F.col("s.end").alias("s_end"),
            "cnt",
        )
    )


def dedup_events(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Stateful exact-once dedup on event_id. The watermark bounds the
    dedup state: an id older than the horizon is evicted (a replay later
    than the watermark would not be caught — the standard trade)."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def dedup_events_within_watermark(
    events: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Stateful dedup with GUARANTEED-bounded state:
    dropDuplicatesWithinWatermark evicts an id's state as soon as the
    watermark passes its FIRST-SEEN event time, whereas plain
    dropDuplicates keyed only on event_id (no ts in the key) retains
    every id forever. The semantic trade: duplicates arriving more than
    `watermark` apart both survive — the right contract for at-least-once
    sources whose replays cluster near the original (Kafka redelivery),
    and the ONLY safe dedup at 100 TB/unbounded-id-space scale."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def first_event_per_user_type(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """First event id per (user, type) — the Q41 batch aggregation as a
    streaming agg (update-mode; min is a commutative/associative agg so
    partial state is exact)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", "event_type")
        .agg(F.min("event_id").alias("first_id"))
    )


def stream_static_join(events: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """Stream-static equi-join (Q10 shape): the static side is planned per
    micro-batch (broadcast if small — Catalyst decides with fresh stats);
    no state store is involved for stream-static inner joins."""
    return events.join(dim, on, how)


def click_purchase_join(
    events: DataFrame,
    max_delay: str = "2 hours",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream inner join: each click paired with the same user's
    purchases within [click_ts, click_ts + max_delay] — the canonical
    attribution/funnel join.

    Both sides carry a watermark and the join has an explicit event-time
    range bound; together those let Structured Streaming evict buffered
    rows once `watermark + max_delay` has passed, so join state stays
    bounded (an unconstrained stream-stream join would buffer forever).
    Batch form: the identical expression over a batch DataFrame — the
    range predicate becomes a plain theta-join filter.

    Output: (user_id, click_id, purchase_id, click_ts, purchase_ts).

    ``how="leftOuter"`` (round 9) emits UNMATCHED clicks too — with
    null purchase columns — but only once the watermark passes
    click_ts + max_delay (the engine must prove no purchase can still
    arrive before it may declare the click unconverted; that proof is
    exactly the watermark). Batch form: a plain left join. This is the
    abandonment/no-conversion readout the inner join cannot express.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    cond = (
        (clicks["user_id"] == purchases["p_user"])
        & (purchases["purchase_ts"] >= clicks["click_ts"])
        & (purchases["purchase_ts"] <= clicks["click_ts"] + F.expr(f"INTERVAL {max_delay}"))
    )
    return clicks.join(purchases, cond, how).select(
        "user_id", "click_id", "purchase_id", "click_ts", "purchase_ts"
    )
