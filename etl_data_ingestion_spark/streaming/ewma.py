"""Stateful streaming EWMA via applyInPandasWithState — the streaming
twin of operators/windows.py::timeseries_ewma_daily.

EWMA is the canonical "output depends on previous OUTPUT" transform:
no windowed aggregate expresses it, and in a stream the previous
output lives across micro-batches. State per key is a single (y, n)
pair — O(keys) regardless of stream length, the bounded-state
discipline every custom stateful operator here follows.

Each micro-batch folds its rows in (ts, event_id) order on top of the
carried y. Exactness across batches therefore requires per-key
batch-order to respect event time — true for a replayed time-ordered
log (the time-partitioned event-log layout sources_scan.py writes, or
any file source landed in arrival order), and the property the
equivalence test drives explicitly. Out-of-order arrival degrades
EWMA the same way it degrades any order-sensitive recursion; guard
with an upstream watermark + sort within allowed lateness when the
transport reorders.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "event_type string, ewma_value double, n_events long"
STATE_SCHEMA = "y double, n long"


def _fold_ewma(alpha: float):
    def fold(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (event_type,) = key
        if state.exists:
            y, n = state.get
        else:
            y, n = None, 0
        batch = pd.concat(list(pdfs))
        if len(batch):
            batch = batch.sort_values(["ts", "event_id"])
            for v in batch["value"]:
                v = float(v)
                y = v if y is None else alpha * v + (1.0 - alpha) * y
                n += 1
            state.update((y, n))
            yield pd.DataFrame(
                {
                    "event_type": [event_type],
                    "ewma_value": [y],
                    "n_events": [n],
                }
            )

    return fold


def ewma_stateful(events: DataFrame, alpha: float = 0.5) -> DataFrame:
    """Per-event-type running EWMA over `value`, one updated row per
    key per micro-batch (the last row per key is the current smoothed
    level). Requires a streaming DataFrame."""
    return events.groupBy("event_type").applyInPandasWithState(
        _fold_ewma(alpha),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
