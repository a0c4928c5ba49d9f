"""Streaming keep-latest-per-key upsert sink: the foreachBatch MERGE
pattern that turns an append-only event stream into an SCD1 warehouse
state — the streaming twin of operators/ingest_queries.py::
warehouse_upsert_latest, and the modern replacement for the
reference's blind append load (main.py:448-468).

Every micro-batch:
  1. reduces ITSELF to latest-per-key (cheap: batch-local window),
  2. unions with the current state table,
  3. keeps the overall latest row per key,
  4. commits by atomically replacing a pointer file (``CURRENT``) that
     names the live versioned data directory.

The pointer-file commit is the crash-safety mechanism: data dirs are
immutable once written (``v_<batch_id>``), and the ONLY mutation is a
single ``os.replace`` of the pointer — atomic on POSIX. A crash before
the replace leaves the previous state live (the replayed batch
recomputes the same merge — keep-latest of a union is idempotent); a
crash after leaves only garbage version dirs, GC'd on the next commit.
This closes the window the earlier two-rename swap had, where a crash
between renames left no current state at all.

foreachBatch makes the sink transactional per micro-batch under
Structured Streaming's checkpointing, upgrading the reference's
at-most-once load to effectively-once state.

At 100 TB the same loop targets a table format with real MERGE
(Delta/Iceberg `MERGE INTO`) — whose commit protocol is exactly this
pointer swap on a metadata file — and bucketed state on the key so the
union-window never re-shuffles the full state.
"""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

POINTER_NAME = "CURRENT"


def current_state_path(state_dir: str) -> str | None:
    """Resolve the live state directory via the pointer file; None when
    no state has ever been committed."""
    ptr = os.path.join(state_dir, POINTER_NAME)
    if not os.path.exists(ptr):
        return None
    with open(ptr, encoding="utf-8") as fh:
        name = fh.read().strip()
    path = os.path.join(state_dir, name)
    return path if name and os.path.exists(path) else None


def latest_per_key(df: DataFrame, key: str = "user_id") -> DataFrame:
    w = Window.partitionBy(key).orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def list_versions(state_dir: str) -> list[int]:
    """Committed version ids (batch ids) present on disk, ascending.
    With retain_versions > 1 these are the time-travel points."""
    out = []
    for entry in os.listdir(state_dir):
        if entry.startswith("v_"):
            try:
                out.append(int(entry[2:]))
            except ValueError:
                pass
    return sorted(out)


def state_path_at(state_dir: str, version: int) -> str:
    """Path of a retained historical version (time travel). Raises
    KeyError when the version has been GC'd — the same contract as a
    table format's expired snapshot."""
    path = os.path.join(state_dir, f"v_{version}")
    if not os.path.exists(path):
        raise KeyError(
            f"version {version} not retained in {state_dir}; "
            f"available: {list_versions(state_dir)}"
        )
    return path


def run_stream_upsert(
    spark,
    events_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    key: str = "user_id",
    retain_versions: int = 1,
):
    """Drive the stream into a keep-latest state table; returns the
    started query (caller awaits / stops). Read the committed state via
    ``current_state_path(state_dir)``.

    ``retain_versions`` keeps the N most recent immutable version dirs
    instead of GC-ing everything but CURRENT — the snapshot-retention
    dial of a table format: each retained ``v_<batch>`` is a
    consistent state as of that commit, readable via
    ``state_path_at`` (time travel / incremental-diff audits / blast-
    radius rollback after a bad upstream batch). The pointer swap is
    unchanged — retention only widens what the GC spares, so the
    crash-safety argument (immutable dirs + one atomic replace) is
    untouched."""

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_latest = latest_per_key(batch_df, key)
        cur_path = current_state_path(state_dir)
        if cur_path is not None:
            state = batch_latest.sparkSession.read.parquet(cur_path)
            merged = latest_per_key(state.unionByName(batch_latest), key)
        else:
            merged = batch_latest
        version = f"v_{batch_id}"
        new_dir = os.path.join(state_dir, version)
        # overwrite: a replayed batch rewrites its own version dir
        merged.write.mode("overwrite").parquet(new_dir)
        ptr_tmp = os.path.join(state_dir, f"_ptr_tmp_{batch_id}")
        with open(ptr_tmp, "w", encoding="utf-8") as fh:
            fh.write(version)
        # the one and only commit point — atomic
        os.replace(ptr_tmp, os.path.join(state_dir, POINTER_NAME))
        # best-effort GC: spare the retain_versions newest committed
        # versions (current included); drop older ones + stale temps
        keep = {
            f"v_{v}"
            for v in list_versions(state_dir)[-max(1, retain_versions):]
        }
        keep.add(version)
        for entry in os.listdir(state_dir):
            stale_version = entry.startswith("v_") and entry not in keep
            stale_ptr = entry.startswith("_ptr_tmp_") and entry != f"_ptr_tmp_{batch_id}"
            if stale_version:
                shutil.rmtree(os.path.join(state_dir, entry), ignore_errors=True)
            elif stale_ptr:
                try:
                    os.remove(os.path.join(state_dir, entry))
                except OSError:
                    pass

    return (
        events_stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
