"""Batch driver shell: the reference's __main__ loop, Spark-first.

Mirrors main.py:648-687 policy exactly:
- per-file isolation: one file's failure never aborts the run
  (main.py:674-677);
- partial success: ≥1 valid row → file Processed, clean runs get a
  success notification, partial runs get an error report listing
  counts (main.py:470-495);
- zero valid rows → file Failed + error notification (main.py:435-446,
  496-511);
- zero files found → no-data notification (main.py:679-685).

Unlike the reference, consumption is effectively at-least-once +
idempotent: the file moves out of Unprocessed/ only after the
warehouse append commits, and every appended row carries the file's
load_id for downstream dedup (SURVEY.md §4.1 deviation, documented).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from etl_data_ingestion_spark.ingest.lifecycle import LandingZone
from etl_data_ingestion_spark.ingest.pipeline import ingest_ctb_file
from etl_data_ingestion_spark.ingest.sinks import ParquetWarehouseSink
from etl_data_ingestion_spark.notify import Notifier


@dataclass
class FileOutcome:
    path: str
    state: str  # processed | failed
    valid_rows: int = 0
    quarantined_rows: int = 0
    error: str | None = None


@dataclass
class RunReport:
    outcomes: list[FileOutcome] = field(default_factory=list)

    @property
    def total_inserted(self) -> int:
        return sum(o.valid_rows for o in self.outcomes if o.state == "processed")


def run_landing_zone(
    spark: SparkSession,
    zone: LandingZone,
    warehouse: ParquetWarehouseSink,
    quarantine: ParquetWarehouseSink,
    notifier: Notifier,
    require_existing_target: bool = False,
) -> RunReport:
    report = RunReport()
    files = zone.list_unprocessed()
    if not files:
        notifier.no_data(zone.root)
        return report

    for path in files:
        filename = path.rsplit("/", 1)[-1]
        try:
            res = ingest_ctb_file(spark, path)
            if not res.ok:
                notifier.error(filename, res.file_error)
                zone.mark_failed(path)
                report.outcomes.append(
                    FileOutcome(path, "failed", error=res.file_error)
                )
                continue

            # L3 (main.py:416-430): missing/denied target fails the
            # file before any write, with an error notification.
            warehouse.check_target(spark, require_existing_target)

            q_rows = quarantine.write(res.quarantine, load_id=filename)
            v_rows = warehouse.write(res.valid, load_id=filename)

            if v_rows > 0:
                if q_rows == 0:
                    notifier.success(filename, v_rows)
                else:
                    notifier.error(
                        filename,
                        f"Inserted {v_rows} valid rows from '{filename}'; "
                        f"{q_rows} rows quarantined with row-level errors.",
                    )
                zone.mark_processed(path)
                report.outcomes.append(
                    FileOutcome(path, "processed", v_rows, q_rows)
                )
            else:
                msg = (
                    f"No valid data rows found in '{filename}' to insert "
                    f"({q_rows} quarantined). The file will be moved to 'Failed'."
                )
                notifier.error(filename, msg)
                zone.mark_failed(path)
                report.outcomes.append(
                    FileOutcome(path, "failed", 0, q_rows, error=msg)
                )
        except Exception as e:  # per-file isolation (main.py:674-677)
            notifier.error(filename, f"Unexpected error: {e}")
            try:
                zone.mark_failed(path)
            except Exception:
                pass
            report.outcomes.append(FileOutcome(path, "failed", error=str(e)))
    return report
