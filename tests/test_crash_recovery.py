"""Crash-recovery and fault-injection tests for the two durable-state
commit protocols:

- streaming upsert (streaming/upsert.py): staged immutable version dir
  + atomic pointer-file swap, driven by a checkpointed foreachBatch
  stream. Tested: clean restart from checkpoint (no loss, no dupes),
  and an injected crash BETWEEN staging and pointer swap (the window
  the pointer design exists to close).
- compaction (ingest/sinks.py::compact_parquet_dir): rewrite + two
  renames with entry-time recovery. Tested: crash before the swap
  (leftover __compacting) and crash between the renames (leftover
  __old, no live dir).

These extend test_streaming.py's exactly-once test per the round-3
verdict: restart/fault paths, not just the happy path.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from etl_data_ingestion_spark.catalog import load_table
from etl_data_ingestion_spark.streaming import upsert as upsert_mod
from etl_data_ingestion_spark.streaming.upsert import (
    current_state_path,
    latest_per_key,
    run_stream_upsert,
)


def _events(spark, n_parts: int):
    return (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .select("event_id", "user_id", "ts", "value")
        .repartition(n_parts)
    )


def _assert_state_matches(spark, state_dir: str, expected_events) -> None:
    state_path = current_state_path(state_dir)
    assert state_path is not None, "pointer must name a committed state"
    got = spark.read.parquet(state_path)
    want = latest_per_key(expected_events)
    # exactly-once: same keys, same chosen rows, no duplicates
    assert got.groupBy("user_id").count().filter("count > 1").count() == 0
    diff = got.select("user_id", "event_id").exceptAll(
        want.select("user_id", "event_id")
    )
    rdiff = want.select("user_id", "event_id").exceptAll(
        got.select("user_id", "event_id")
    )
    assert diff.count() == 0 and rdiff.count() == 0


def test_stream_upsert_restart_resumes_exactly_once(spark, tmp_path):
    """Kill-and-restart: process half the source, stop the query (the
    in-process stand-in for a driver crash between triggers), land more
    data, restart from the SAME checkpoint. Final state must equal the
    single-run batch answer over everything — nothing lost to the
    restart, nothing double-applied from replay."""
    events = _events(spark, 4)
    first_half = events.filter(F.col("event_id") % 2 == 0)
    second_half = events.filter(F.col("event_id") % 2 == 1)

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    first_half.write.mode("append").parquet(src)

    def start():
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return run_stream_upsert(spark, stream, state, ckpt)

    q = start()
    q.processAllAvailable()
    q.stop()  # "crash" between triggers
    _assert_state_matches(spark, state, first_half)

    second_half.write.mode("append").parquet(src)
    q = start()
    q.processAllAvailable()
    q.stop()
    _assert_state_matches(spark, state, events)


def test_stream_upsert_crash_between_staging_and_swap(spark, tmp_path):
    """Inject a crash at the exact commit point: the first pointer swap
    of the second run raises (after the version dir is fully staged),
    failing the streaming query mid-batch. On restart the checkpoint
    replays that batch; the replay re-stages its version dir and swaps
    cleanly. State must come out identical to the no-crash run and the
    orphaned staging artifacts must be gone."""
    events = _events(spark, 4)
    first = events.filter(F.col("event_id") % 2 == 0)
    second = events.filter(F.col("event_id") % 2 == 1)

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    first.write.mode("append").parquet(src)

    def start():
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return run_stream_upsert(spark, stream, state, ckpt)

    q = start()
    q.processAllAvailable()
    q.stop()
    committed_before = current_state_path(state)

    # arm the fault: next pointer swap in this state dir dies
    real_replace = os.replace
    fired = {"n": 0}

    def exploding_replace(src_p, dst_p, *a, **kw):
        if str(dst_p).startswith(state) and fired["n"] == 0:
            fired["n"] = 1
            raise OSError("injected crash between staging and pointer swap")
        return real_replace(src_p, dst_p, *a, **kw)

    second.write.mode("append").parquet(src)
    upsert_mod.os.replace = exploding_replace
    try:
        q = start()
        with pytest.raises(Exception):
            q.processAllAvailable()
            # availableNow + injected OSError fails the batch; surface it
            q.awaitTermination()
    finally:
        upsert_mod.os.replace = real_replace
        try:
            q.stop()
        except Exception:
            pass

    assert fired["n"] == 1, "fault must actually have fired"
    # crash window: previous commit still live (staged dir is garbage,
    # pointer untouched)
    assert current_state_path(state) == committed_before
    _assert_state_matches(spark, state, first)

    # restart: checkpoint replays the failed batch, commit succeeds
    q = start()
    q.processAllAvailable()
    q.stop()
    _assert_state_matches(spark, state, events)
    # the replayed commit GC'd every superseded version and stale temp
    leftovers = [
        e
        for e in os.listdir(state)
        if e.startswith("_ptr_tmp_")
        or (
            e.startswith("v_")
            and os.path.join(state, e) != current_state_path(state)
        )
    ]
    assert leftovers == []


def _mk_small_files(spark, path: str, n_files: int = 6) -> None:
    df = spark.range(0, 600).select(
        F.col("id"), (F.col("id") * 2).alias("val")
    )
    df.repartition(n_files).write.mode("overwrite").parquet(path)


def test_compaction_crash_before_swap_discards_staging(spark, tmp_path):
    """A leftover __compacting dir (crash after rewrite, before any
    rename) must be discarded on the next run; data unchanged then
    compacted normally."""
    from etl_data_ingestion_spark.ingest.sinks import compact_parquet_dir

    path = str(tmp_path / "tbl")
    _mk_small_files(spark, path)
    before = sorted(r["id"] for r in spark.read.parquet(path).collect())

    tmp = path + "__compacting"
    os.makedirs(tmp)
    with open(os.path.join(tmp, "partial.parquet"), "wb") as fh:
        fh.write(b"\x00garbage: crash mid-write")

    n = compact_parquet_dir(spark, path, target_file_bytes=1 << 30)
    assert n == 1
    assert not os.path.exists(tmp)
    after = sorted(r["id"] for r in spark.read.parquet(path).collect())
    assert after == before


def test_compaction_crash_between_renames_restores_old(spark, tmp_path):
    """Crash between the two renames leaves __old and NO live dir —
    the worst window. Entry-time recovery must rename __old back and
    proceed; no rows lost."""
    from etl_data_ingestion_spark.ingest.sinks import compact_parquet_dir

    path = str(tmp_path / "tbl")
    _mk_small_files(spark, path)
    before = sorted(r["id"] for r in spark.read.parquet(path).collect())

    # simulate: rewrite done (tmp exists), path renamed away, crash
    old = path + "__old"
    tmp = path + "__compacting"
    os.rename(path, old)
    os.makedirs(tmp)
    with open(os.path.join(tmp, "partial.parquet"), "wb") as fh:
        fh.write(b"\x00garbage")
    assert not os.path.exists(path)

    n = compact_parquet_dir(spark, path, target_file_bytes=1 << 30)
    assert n == 1
    assert not os.path.exists(old) and not os.path.exists(tmp)
    after = sorted(r["id"] for r in spark.read.parquet(path).collect())
    assert after == before


def test_upsert_version_retention_time_travel(spark, tmp_path):
    """retain_versions keeps the N newest immutable snapshots: after a
    multi-batch run, a retained historical version must read back as
    exactly the keep-latest state over the stream prefix up to that
    commit — time travel — while versions beyond the horizon are GC'd
    and raise like an expired snapshot."""
    import pytest as _pytest

    from etl_data_ingestion_spark.streaming.upsert import (
        list_versions,
        run_stream_upsert,
        state_path_at,
    )

    events = _events(spark, 1)
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    # 4 single-file micro-batches, split by event_id quartile
    quarters = [
        events.filter(F.col("event_id") % 4 == i).coalesce(1) for i in range(4)
    ]
    for q4 in quarters:
        q4.write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_stream_upsert(
        spark, stream, state, str(tmp_path / "ckpt"), retain_versions=3
    )
    q.processAllAvailable()
    q.stop()

    versions = list_versions(state)
    assert len(versions) == 3, versions  # 4 commits, horizon 3
    with _pytest.raises(KeyError):
        state_path_at(state, 0)  # oldest snapshot expired

    # time travel: version v_k = keep-latest over batches 0..k; batch
    # order follows file landing order (quartile i landed i-th)
    penultimate = versions[-2]
    prefix = events.filter(F.col("event_id") % 4 <= penultimate)
    got = spark.read.parquet(state_path_at(state, penultimate))
    want = latest_per_key(prefix)
    assert got.count() == want.count()
    assert (
        got.select("user_id", "event_id")
        .exceptAll(want.select("user_id", "event_id"))
        .count()
        == 0
    )
