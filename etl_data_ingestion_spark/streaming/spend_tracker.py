"""Stateful per-user spend tracking via transformWithStateInPandas —
the Spark 4 StatefulProcessor API (the successor surface to
applyInPandasWithState used by ewma.py/transitions.py): typed state
handles (ValueState here) owned by a processor object with an
explicit lifecycle (init / handleInputRows / close).

Semantics: per user, carry (cumulative value, cumulative events,
max single value) across micro-batches; each batch emits one row per
user seen in that batch with the UPDATED running totals — the
serving-side "customer lifetime value so far" feed.

State is O(keys) with a 3-number record per key — the bounded-state
discipline every custom stateful operator here follows. The batch
analogue (plain groupBy aggregate over the whole log) is what the
equivalence test compares against: after the final micro-batch the
carried totals must equal the one-shot aggregate exactly (value sums
rounded to 2 in both paths to absorb fold-order epsilon).

ENVIRONMENT GUARD: transformWithState's driver-worker protocol
requires ``google.protobuf`` (pyspark ships the generated
StateMessage_pb2 but not the runtime); this container doesn't have
it, so the end-to-end drive is skipped when the import fails — the
same guarded posture as sources/gmail_live.py. The processor logic
itself is pure and unit-tested against an injected state handle;
where protobuf exists the module works as-is (tests auto-unskip).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = (
    "user_id long, batch_events long, total_events long, "
    "total_value double, max_value double"
)


class SpendTracker(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "spend", "total double, n long, mx double"
        )

    def handleInputRows(
        self, key, rows, timerValues
    ) -> Iterator[pd.DataFrame]:
        total, n, mx = 0.0, 0, float("-inf")
        if self._state.exists():
            total, n, mx = self._state.get()
        batch_n = 0
        for pdf in rows:
            batch_n += len(pdf)
            total += float(pdf["value"].sum())
            n += len(pdf)
            if len(pdf):
                mx = max(mx, float(pdf["value"].max()))
        self._state.update((total, n, mx))
        (user_id,) = key
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "batch_events": [batch_n],
                "total_events": [n],
                "total_value": [round(total, 2)],
                "max_value": [mx],
            }
        )

    def close(self) -> None:
        pass


def track_spend(events: DataFrame) -> DataFrame:
    """Apply the tracker to a (streaming or batch) event frame."""
    return events.groupBy("user_id").transformWithStateInPandas(
        SpendTracker(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


def batch_totals(events: DataFrame) -> DataFrame:
    """The one-shot batch analogue the stream must converge to."""
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("total_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.max("value").alias("max_value"),
    )
