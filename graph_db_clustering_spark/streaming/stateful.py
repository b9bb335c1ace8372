"""Custom stateful streaming operators (applyInPandasWithState).

session_window / dropDuplicates cover the declarative cases; this module is
the escape hatch for operators that need an explicit per-key state machine
(SURVEY §2.11 / north-star "custom stateful operators"). State lives in the
state store (checkpointed, partitioned by key) — NOT in Python globals — so
the operator scales horizontally and survives restarts like any built-in
stateful op.

``sessionize_with_state`` deliberately reimplements gap sessionization so
its output can be cross-checked against both session_window (streaming) and
q42_sessions (batch oracle) — a custom stateful operator whose semantics
are pinned by two independent implementations.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id bigint, s_start timestamp, s_end timestamp, cnt bigint"
# open-session state: first/last event epoch-microseconds + event count
STATE_SCHEMA = "start bigint, last bigint, cnt bigint"


def sessionize_with_state(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-user gap sessionization as an explicit state machine.

    Per key and micro-batch: merge the batch's timestamps (sorted) into the
    open session carried in state; whenever a gap >= gap_seconds closes a
    session, emit (user_id, s_start, s_end=last+gap, cnt). The open session
    stays in state with an event-time timeout at last+gap; when the
    watermark passes it, the timeout path emits it. Emission is therefore
    exactly-once per session and append-mode safe.

    Scale: state is one (start, last, cnt) triple per active user —
    bounded, keyed, evicted on timeout; the pandas batches only ever hold
    one micro-batch x one key's events.
    """
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, last, cnt = state.get
            state.remove()
            yield _emit(user_id, [(start, last, cnt)])
            return

        ts_us = sorted(
            int(t.value) // 1000  # pandas Timestamp ns -> us
            for pdf in pdfs
            for t in pd.to_datetime(pdf["ts"])
        )
        if state.exists:
            start, last, cnt = state.get
        else:
            start, last, cnt = ts_us[0], ts_us[0], 0
        closed: list[tuple[int, int, int]] = []
        for t in ts_us:
            if cnt and t - last >= gap_us:
                closed.append((start, last, cnt))
                start, cnt = t, 0
            last, cnt = t, cnt + 1
        state.update((start, last, cnt))
        state.setTimeoutTimestamp((last + gap_us) // 1000)  # ms for the API
        if closed:
            yield _emit(user_id, closed)

    def _emit(user_id: int, sessions: list[tuple[int, int, int]]) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [user_id] * len(sessions),
                "s_start": [pd.Timestamp(s, unit="us") for s, _, _ in sessions],
                "s_end": [pd.Timestamp(l + gap_us, unit="us") for _, l, _ in sessions],
                "cnt": [c for _, _, c in sessions],
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, OUT_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.EventTimeTimeout
        )
    )
