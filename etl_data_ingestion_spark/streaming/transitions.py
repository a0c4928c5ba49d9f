"""Stateful streaming transition tracking — the streaming twin of
operators/windows.py::events_transition_matrix.

Batch mode pairs each event with its successor via LEAD over
(user_id, ts); a stream can't LEAD (the successor hasn't arrived), so
the pairing state IS the operator: per user, carry the last seen
event across micro-batches and emit one (from, to) pair as each new
event arrives. State per key is a single (last_type, last_ts) —
O(users), the same bounded-state discipline as the sessionizer and
the streaming EWMA.

Like the EWMA, cross-batch exactness assumes per-key batch order
respects event time (a replayed time-ordered log); the equivalence
test drives that explicitly. The downstream count/normalize is an
ordinary streaming aggregation over the emitted pairs.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, from_type string, to_type string"
STATE_SCHEMA = "last_type string, last_us long"


def _track(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        last_type, last_us = state.get
    else:
        last_type, last_us = None, None
    batch = pd.concat(list(pdfs))
    if len(batch):
        batch = batch.sort_values(["ts", "event_id"])
        pairs = []
        for etype, ts in zip(
            batch["event_type"], batch["ts"].astype("int64") // 1000
        ):
            if last_type is not None:
                pairs.append((last_type, etype))
            last_type, last_us = etype, int(ts)
        state.update((last_type, last_us))
        if pairs:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(pairs),
                    "from_type": [p[0] for p in pairs],
                    "to_type": [p[1] for p in pairs],
                }
            )


def transitions_stateful(events: DataFrame) -> DataFrame:
    """One (user_id, from_type, to_type) row per consecutive event
    pair, emitted as successors arrive — including pairs that SPAN
    micro-batches (the case LEAD-over-a-batch misses). Requires a
    streaming DataFrame."""
    return events.groupBy("user_id").applyInPandasWithState(
        _track,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
