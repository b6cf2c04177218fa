"""Run-metadata bookkeeping (O11, SURVEY.md §2.9).

The reference appends a row per task run to ``task_result.<schema>``
(``helper1/task_logger.py:25-66``: dag_id, task_id, run_day, duration,
result, is_success, try_number) and per stored-proc call to
``ds.procedure_log`` (``reconciliation_batch_operator.py:160-178``).
The engine's equivalent is one append-only Parquet table; appends are
tiny single-file writes, so no snapshot-swap is needed.
"""

from __future__ import annotations

import datetime as dt
import time
from contextlib import contextmanager
from dataclasses import asdict, dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

RUN_LOG_SCHEMA = (
    "job_id string, task_id string, run_day string, started_at timestamp, "
    "duration_sec double, result string, is_success boolean, try_number int"
)


@dataclass
class RunRecord:
    job_id: str
    task_id: str
    run_day: str
    started_at: dt.datetime
    duration_sec: float
    result: str
    is_success: bool
    try_number: int = 1


class RunLog:
    def __init__(self, path: str | Path) -> None:
        self.path = str(path)

    def append(self, spark: SparkSession, rec: RunRecord) -> None:
        spark.createDataFrame([asdict(rec)], schema=RUN_LOG_SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(self.path)

    def read(self, spark: SparkSession) -> DataFrame:
        # ignoreMissingFiles: tolerate a concurrent compact() retiring
        # an append file between listing and scan (rows live on in the
        # compacted file)
        return (
            spark.read.schema(RUN_LOG_SCHEMA)
            .option("ignoreMissingFiles", "true")
            .parquet(self.path)
        )

    def compact(self, spark: SparkSession, retain_days: float | None = None,
                target_files: int = 1) -> dict:
        """Fold the one-file-per-run append pile (a year of nightly
        tasks is tens of thousands of tiny files) into
        ``target_files`` files, optionally dropping rows older than
        ``retain_days`` — same discipline as
        :meth:`..metrics.MetricsLog.compact` (round-11; shared
        implementation in ``sinks.compact_append_dir``)."""
        from .sinks import compact_append_dir

        return compact_append_dir(
            spark, self.path, self.read, "started_at",
            retain_days=retain_days, target_files=target_files,
        )

    @contextmanager
    def track(self, spark: SparkSession, job_id: str, task_id: str, try_number: int = 1):
        """Context manager mirroring the reference's pre/post_execute
        hooks (``task_logger.py`` is called from both, success or
        fail)."""
        started = dt.datetime.now()
        t0 = time.perf_counter()
        try:
            yield
        except Exception as exc:  # noqa: BLE001 — log then re-raise
            self.append(
                spark,
                RunRecord(
                    job_id, task_id, started.strftime("%Y%m%d"), started,
                    round(time.perf_counter() - t0, 3), f"error: {exc}", False,
                    try_number,
                ),
            )
            raise
        self.append(
            spark,
            RunRecord(
                job_id, task_id, started.strftime("%Y%m%d"), started,
                round(time.perf_counter() - t0, 3), "ok", True, try_number,
            ),
        )
