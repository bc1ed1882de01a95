"""Streaming sessionization via arbitrary stateful processing.

``streaming_sessionize`` uses ``applyInPandasWithState``: per-user
state holds the open session; a batch closes every session whose gap
to the next event exceeds the threshold and emits it downstream,
keeping only the still-open tail session in state. On a real stream
the open session is eventually flushed by the event-time timeout.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events int, total_value double"
)
STATE_SCHEMA = "start long, end long, n int, total double"

_US = 1_000_000


def _sessionize_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_minutes: int = 30,
) -> Iterator[pd.DataFrame]:
    gap_us = gap_minutes * 60 * _US
    (user_id,) = key

    if state.hasTimedOut:
        if state.exists:
            start, end, n, total = state.get
            state.remove()
            yield _emit(user_id, start, end, n, total)
        return

    events = pd.concat(list(pdfs)).sort_values("ts")
    ts_us = (events["ts"].astype("int64") // 1000).to_list()
    values = events["value"].to_list()

    if state.exists:
        cur = list(state.get)
    else:
        cur = None

    closed: list[tuple] = []
    for t, v in zip(ts_us, values):
        if cur is None:
            cur = [t, t, 1, v]
        elif t - cur[1] > gap_us:
            closed.append(tuple(cur))
            cur = [t, t, 1, v]
        else:
            # a late (within-watermark) event may carry ts inside the
            # open session's span: never move the session window backwards
            cur[0] = min(cur[0], t)
            cur[1] = max(cur[1], t)
            cur[2] += 1
            cur[3] += v
    state.update(tuple(cur))
    state.setTimeoutTimestamp(cur[1] // 1000 + gap_minutes * 60 * 1000)

    if closed:
        yield pd.concat(
            [_emit(user_id, *c) for c in closed], ignore_index=True
        )


def _emit(user_id, start, end, n, total) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [pd.Timestamp(start * 1000)],
            "session_end": [pd.Timestamp(end * 1000)],
            "n_events": [n],
            "total_value": [total],
        }
    )


def streaming_sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """events: streaming DF with (user_id, ts, value). Emits closed
    sessions; open sessions flush via event-time timeout."""

    def fn(key, pdfs, state):
        yield from _sessionize_group(key, pdfs, state, gap_minutes)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
