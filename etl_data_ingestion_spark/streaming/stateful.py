"""Custom stateful streaming operator via applyInPandasWithState.

The reference's only state is the INBOX-label commit (main.py:630-645,
at-most-once); this is the engine's general-purpose replacement
surface: arbitrary per-key state with watermark-driven timeout, the
Structured Streaming analogue of a keyed process function.

Operator: per-user session tracking. State = (start_us, last_us,
n_events) for the user's open session; a batch of events either
extends the open session or closes it (gap exceeded) and opens a new
one. Completed sessions are APPENDED as they close; the open session
stays in state (emitted on event-time timeout once the watermark
passes last+gap, or never for a finite replay — tests compare against
batch sessionization minus each user's final session).

State size is O(users) regardless of stream length — the property
that matters at scale; the watermark timeout is what lets the store
evict idle users.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
STATE_SCHEMA = "start long, last long, n long"

_US_PER_MIN = 60_000_000


def _track_sessions(gap_minutes: int):
    gap_us = gap_minutes * _US_PER_MIN

    def track(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int]] = []
        if state.hasTimedOut:
            if state.exists:
                start, last, n = state.get
                closed.append((start, last, n))
                state.remove()
        else:
            if state.exists:
                start, last, n = state.get
            else:
                start = last = n = None
            ts_all = pd.concat([pdf["ts"] for pdf in pdfs]).sort_values()
            for ts in ts_all.astype("int64") // 1000:  # ns → us
                ts = int(ts)
                if start is None:
                    start, last, n = ts, ts, 1
                elif ts - last > gap_us:
                    closed.append((start, last, n))
                    start, last, n = ts, ts, 1
                else:
                    last, n = ts, n + 1
            state.update((start, last, n))
            state.setTimeoutTimestamp(last // 1000 + gap_minutes * 60_000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                    "n_events": [n for _, _, n in closed],
                }
            )

    return track


def sessionize_stateful(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "2 hours"
) -> DataFrame:
    """Completed per-user sessions from a stream of (user_id, ts)
    events. Requires a streaming DataFrame; batch equivalence is
    covered by window_sessionize_gaps (gaps-and-islands)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _track_sessions(gap_minutes),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
