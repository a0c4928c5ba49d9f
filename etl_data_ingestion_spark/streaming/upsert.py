"""Streaming keep-latest-per-key upsert sink: the foreachBatch MERGE
pattern that turns an append-only event stream into an SCD1 warehouse
state — the streaming twin of operators/ingest_queries.py::
warehouse_upsert_latest, and the modern replacement for the
reference's blind append load (main.py:448-468).

Every micro-batch:
  1. reduces ITSELF to latest-per-key (cheap: batch-local window),
  2. unions with the current state table,
  3. keeps the overall latest row per key,
  4. atomically swaps the state directory (write new -> rename).

foreachBatch makes the sink transactional per micro-batch under
Structured Streaming's checkpointing: a replayed batch recomputes the
same state (the merge is idempotent — keep-latest of a union is
associative), which upgrades the reference's at-most-once load to
effectively-once state.

At 100 TB the same loop targets a table format with real MERGE
(Delta/Iceberg `MERGE INTO`) and bucketed state on the key so the
union-window never re-shuffles the full state; the parquet-swap here
is the dependency-free stand-in with identical semantics.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def latest_per_key(df: DataFrame, key: str = "user_id") -> DataFrame:
    w = Window.partitionBy(key).orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def run_stream_upsert(
    spark,
    events_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    key: str = "user_id",
):
    """Drive the stream into a keep-latest state table; returns the
    started query (caller awaits / stops)."""

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_latest = latest_per_key(batch_df, key)
        cur_path = os.path.join(state_dir, "current")
        if os.path.exists(cur_path):
            state = batch_latest.sparkSession.read.parquet(cur_path)
            merged = latest_per_key(state.unionByName(batch_latest), key)
        else:
            merged = batch_latest
        tmp_path = os.path.join(state_dir, f"_tmp_{batch_id}")
        merged.write.mode("overwrite").parquet(tmp_path)
        old = os.path.join(state_dir, f"_old_{batch_id}")
        if os.path.exists(cur_path):
            os.rename(cur_path, old)
        os.rename(tmp_path, cur_path)
        if os.path.exists(old):
            import shutil

            shutil.rmtree(old, ignore_errors=True)

    return (
        events_stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
