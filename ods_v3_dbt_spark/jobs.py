"""Job orchestration: the engine's equivalent of one reference DAG run
(SURVEY.md §3.1 "Spark rewrite" + §2.9 control-flow operators).

One :class:`EtlJob` = windowed read → cleanse → schema check → staging
snapshot → merge into ODS → run-log row. What Airflow spread over
sensors, XCom, TaskGroups, and Jinja (O1-O12) collapses into function
arguments inside a single Spark application; the scheduler's only
remaining job is picking the window.

Window calculus mirrors the reference exactly:

* scheduled runs cover ``[data_interval_start, data_interval_end)``
  (``bccp_to_ods.py:95-97``),
* manual runs take explicit bounds (O6 — ``dag_run.conf`` →
  ``manual_window`` arg; the ``_manual`` staging-twin naming is
  dropped as orchestration noise, SURVEY §7.3 risk 5),
* intra-day splits divide a day into N equal slices (O7,
  ``khl_to_ods.py:79-88``: 2 runs × 12 h),
* backdate replays re-run an old window (O8) — idempotent because the
  merge strategies are (M3 freshness gate / M6-M7 window overwrite).
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable, Sequence
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import TableSpec
from .operators import merge as M
from .operators import rollup as R
from .quality import validate_schema
from .runlog import RunLog
from .sinks import ParquetTable
from .sources.readers import read_table
from .streaming.incremental import _order_cols, merge_batch_fn


def split_day_windows(day: dt.date, parts: int) -> list[tuple[dt.datetime, dt.datetime]]:
    """O7: N equal half-open slices of one day (khl: 2 × 12 h)."""
    start = dt.datetime.combine(day, dt.time())
    step = dt.timedelta(days=1) / parts
    return [(start + i * step, start + (i + 1) * step) for i in range(parts)]


@dataclass
class JobResult:
    table: str
    window: tuple[dt.datetime, dt.datetime] | None
    rows_extracted: int
    rows_loaded: int
    success: bool


class EtlJob:
    """One table's sync run (reference: one per-table TaskGroup,
    ``dags/bccp_dag.py:75-134``)."""

    def __init__(
        self,
        spark: SparkSession,
        spec: TableSpec,
        warehouse_dir: str | Path,
        source_reader: Callable[[SparkSession, tuple | None], DataFrame] | None = None,
        source_path: str | None = None,
        cleanse: Callable[[DataFrame], DataFrame] | None = None,
        run_log: RunLog | None = None,
    ) -> None:
        self.spark = spark
        self.spec = spec
        self.warehouse = Path(warehouse_dir)
        self.source_reader = source_reader
        self.source_path = source_path
        self.cleanse = cleanse
        self.run_log = run_log

    def _staging(self) -> ParquetTable:
        return ParquetTable(self.warehouse / "staging" / self.spec.name)

    def target(self) -> ParquetTable:
        return ParquetTable(
            self.warehouse / self.spec.schema_name / self.spec.name,
            partition_cols=self.spec.partition_cols,
        )

    # -- pipeline stages ----------------------------------------------------

    def extract(self, window: tuple[dt.datetime, dt.datetime] | None) -> DataFrame:
        if self.source_reader is not None:
            df = self.source_reader(self.spark, window)
        elif self.source_path is not None:
            df = read_table(self.spark, self.source_path, self.spec, window)
        else:
            raise ValueError("EtlJob needs source_reader or source_path")
        if self.cleanse is not None:
            df = self.cleanse(df)
        return df

    def run(
        self,
        window: tuple[dt.datetime, dt.datetime] | None = None,
        manual_window: tuple[dt.datetime, dt.datetime] | None = None,
        try_number: int = 1,
    ) -> JobResult:
        """Extract the window slice, validate, stage, merge. Replay-safe:
        re-running any window is a no-op or a clean overwrite per the
        spec's strategy."""
        win = manual_window or window
        job_id = f"sync_{self.spec.schema_name}"
        task_id = self.spec.name

        def _run() -> JobResult:
            batch = self.extract(win)
            failed = [c for c in validate_schema(batch, self.spec.struct_type()) if not c.passed]
            if failed:
                detail = "; ".join(f"{c.name}: {c.detail}" for c in failed)
                raise ValueError(f"{self.spec.name}: schema check failed: {detail}")
            n_extracted = batch.count()  # A2/A5 count probe + reconciliation
            staging = self._staging()
            staging.write(batch)
            staged = staging.read(self.spark)
            merge_batch_fn(self.spec, self.target())(staged, -1)
            n_loaded = self.target().read(self.spark).count()
            return JobResult(self.spec.qualified_name, win, n_extracted, n_loaded, True)

        if self.run_log is not None:
            with self.run_log.track(self.spark, job_id, task_id, try_number):
                return _run()
        return _run()


def run_catalog(
    jobs: list[EtlJob],
    window: tuple[dt.datetime, dt.datetime] | None = None,
    attempts: int = 1,
) -> list[JobResult]:
    """O5 TaskGroup-per-table fan-out + O12 failure accumulation: run
    every table's EtlJob for one window, isolating failures — one
    table's schema drift must not stop the other 16 (Airflow task
    semantics; the reference's end-task callback collects the failed
    list, ``helper1/task_callback.py:5-21``). ``attempts`` adds the
    O9 retry loop (``reconciliation_batch_operator.py:106-131``'s
    3-attempt pattern). Failed tables yield a JobResult with
    success=False and zero counts, so the caller's reconciliation
    report is total over the catalog.

    Tables run sequentially here — on a cluster each job's stages
    already parallelize across executors, and the scheduler
    interleaves independent jobs submitted from one driver; submit
    via a thread pool if per-table driver latency dominates."""
    results: list[JobResult] = []
    for job in jobs:
        last_err: Exception | None = None
        for attempt in range(1, attempts + 1):
            try:
                results.append(job.run(window=window, try_number=attempt))
                last_err = None
                break
            except Exception as e:  # noqa: BLE001 — isolate per-table failures
                last_err = e
        if last_err is not None:
            results.append(
                JobResult(job.spec.qualified_name, window, 0, 0, False)
            )
    return results


def freshness_guarded_rollup(
    spark: SparkSession,
    fact_table: ParquetTable,
    day_table: ParquetTable,
    month_table: ParquetTable,
    group_cols: Sequence[str],
    day_col: str,
    measures: dict[str, "F.Column"],
) -> bool:
    """A3/A4 + O-guard: recompute the day/month datamart pair only when
    ``MAX(fact.day) > MAX(target.day)`` (``update_datamart.sql:8-25``).
    ``measures`` maps output alias → aggregate Column (F13 declared
    spec). Returns whether a rebuild ran."""
    fact = fact_table.read(spark)
    if day_table.exists() and not R.needs_rollup(
        fact, day_table.read(spark), day_col, day_col
    ):
        return False
    day_df = R.rollup_day(fact, list(group_cols), day_col, measures)
    day_table.write(day_df)
    month_table.write(
        R.rollup_month_from_day(day_table.read(spark), list(group_cols), day_col)
    )
    return True


def health_check(spark: SparkSession, path: str) -> bool:
    """O1: the reference's ``SELECT 1`` SqlSensor → can we plan+read one
    row from the source."""
    try:
        spark.read.parquet(path).limit(1).count()
        return True
    except Exception:  # noqa: BLE001
        return False
