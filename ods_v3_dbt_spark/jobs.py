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
from .sinks import BucketedTable, ParquetTable
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
    skipped: str | None = None  # O2 gate reason; None = actually ran


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
        bucketed: bool = False,
        num_buckets: int = 32,
        metrics=None,
    ) -> None:
        self.spark = spark
        self.spec = spec
        self.warehouse = Path(warehouse_dir)
        self.source_reader = source_reader
        self.source_path = source_path
        self.cleanse = cleanse
        self.run_log = run_log
        self.bucketed = bucketed
        self.num_buckets = num_buckets
        #: optional MetricsLog (metrics.py) — per-stage rows/bytes/
        #: wall, the statsd/fluentd analog; run_log stays the per-run
        #: audit row
        self.metrics = metrics

    def _staging(self) -> ParquetTable:
        return ParquetTable(self.warehouse / "staging" / self.spec.name)

    def target(self) -> ParquetTable | BucketedTable:
        """Merge target. ``bucketed=True`` keeps the fact
        hash-bucketed (+sorted) on the spec's merge keys in the
        session catalog, so every incremental merge streams the
        target without an Exchange or Sort — only the staging slice
        shuffles (round-2 verdict item 8; plan asserted in
        tests/test_recon_gates.py::test_etl_job_bucketed_target).
        Path-based partitioned ParquetTable remains the default."""
        if self.bucketed:
            return BucketedTable(
                f"{self.spec.schema_name}__{self.spec.name}",
                keys=list(self.spec.keys),
                num_buckets=self.num_buckets,
            )
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
            import time as _time

            t0 = _time.perf_counter()
            batch = self.extract(win)
            failed = [c for c in validate_schema(batch, self.spec.struct_type()) if not c.passed]
            if failed:
                detail = "; ".join(f"{c.name}: {c.detail}" for c in failed)
                raise ValueError(f"{self.spec.name}: schema check failed: {detail}")
            n_extracted = batch.count()  # A2/A5 count probe + reconciliation
            t1 = _time.perf_counter()
            staging = self._staging()
            staging.write(batch)
            staged = staging.read(self.spark)
            t2 = _time.perf_counter()
            merge_batch_fn(self.spec, self.target())(staged, -1)
            n_loaded = self.target().read(self.spark).count()
            t3 = _time.perf_counter()
            if self.metrics is not None:
                n_files, n_bytes = staging.file_stats()
                self.metrics.emit(
                    self.spark, job_id, task_id, "extract",
                    {"rows_out": (n_extracted, "rows"),
                     "wall": (round(t1 - t0, 3), "sec")},
                )
                self.metrics.emit(
                    self.spark, job_id, task_id, "stage_load",
                    {"rows_out": (n_extracted, "rows"),
                     "bytes": (n_bytes, "bytes"),
                     "files": (n_files, "files"),
                     "wall": (round(t2 - t1, 3), "sec")},
                )
                self.metrics.emit(
                    self.spark, job_id, task_id, "merge",
                    {"rows_out": (n_loaded, "rows"),
                     "wall": (round(t3 - t2, 3), "sec")},
                )
            return JobResult(self.spec.qualified_name, win, n_extracted, n_loaded, True)

        if self.run_log is not None:
            with self.run_log.track(self.spark, job_id, task_id, try_number):
                return _run()
        return _run()


def run_catalog(
    jobs: list[EtlJob],
    window: tuple[dt.datetime, dt.datetime] | None = None,
    attempts: int = 1,
    gate: "RunGate | None" = None,
    at: dt.datetime | None = None,
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
        if gate is not None:
            ok, reason = gate.admits(
                job.spec.name, at or dt.datetime.now()
            )
            if not ok:  # O2 short-circuit (bccp_dag.py:60-85)
                results.append(
                    JobResult(job.spec.qualified_name, window, 0, 0, True, reason)
                )
                continue
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


# ---------------------------------------------------------------------------
# O10: reconciliation batch fan-out (control query → chunked procedures)
# ---------------------------------------------------------------------------


def chunk_list(lst: list, chunk_size: int) -> list[list]:
    """``reconciliation_batch_operator.py:12-14`` verbatim semantics."""
    return [lst[i : i + chunk_size] for i in range(0, len(lst), chunk_size)]


@dataclass
class ReconProcedure:
    """One parameterized statement in the fan-out
    (``reconciliation_batch_operator.py:59-64``): named-parameter
    Spark SQL instead of a Postgres stored-proc call. ``param_func``
    maps the chunk context dict onto the statement's named args (the
    reference's ``proc['param_func']``)."""

    name: str
    sql: str
    param_func: "Callable[[dict], dict]"
    is_accntid_list: bool = True
    chunk_size: int | None = None


def reconciliation_batch(
    spark: SparkSession,
    filter_sql: str,
    procedures: Sequence[ReconProcedure],
    execution_date: str,
    chunk_size: int = 1000,
    run_log: RunLog | None = None,
    max_retry: int = 3,
) -> list[dict]:
    """O10 (``reconciliation_batch_operator.py:16-135``): control
    query → (from_day, to_day) groups → ``chunk_size``-id chunks →
    parameterized statement per chunk with a 3-attempt retry, audit
    row per call, and error accumulation that never halts the batch.

    The control query returns *control periods* (accntid, from_day,
    to_day) — a steering table of at most thousands of rows, so the
    driver-side collect is a scalar-class probe, not a data path; the
    fanned-out statements themselves run fully distributed. Chunks
    pass their id list as one comma-joined named arg exactly like the
    reference's ``accntid_str``.

    Returns the audit records (also appended to ``run_log`` when
    given, mirroring ``ds.procedure_log``).
    """
    controls = [r.asDict() for r in spark.sql(filter_sql).collect()]
    audits: list[dict] = []
    for proc in procedures:
        size = proc.chunk_size or chunk_size
        if proc.is_accntid_list and controls and all(
            "from_day" in c and "to_day" in c for c in controls
        ):
            groups: dict[tuple, list[dict]] = {}
            for c in controls:
                groups.setdefault((c["from_day"], c["to_day"]), []).append(c)
            chunks = [
                (fd, td, idx + 1, len(chunk_list(grp, size)), chunk)
                for (fd, td), grp in groups.items()
                for idx, chunk in enumerate(chunk_list(grp, size))
            ]
        elif proc.is_accntid_list:
            chunks = [
                (None, None, idx + 1, len(chunk_list(controls, size)), chunk)
                for idx, chunk in enumerate(chunk_list(controls, size))
            ]
        else:  # whole-period procedure, no id fan-out
            chunks = [(None, None, 1, 1, [])]
        for from_day, to_day, chunk_index, chunk_total, chunk in chunks:
            ids = [str(c["accntid"]) for c in chunk if c.get("accntid") is not None]
            ctx = dict(chunk[0]) if chunk else {}
            ctx.update(
                accntid=",".join(ids),
                accntid_list=ids,
                accntid_count=len(ids),
                execution_date=execution_date,
                from_day=from_day,
                to_day=to_day,
                chunk_index=chunk_index,
                chunk_total=chunk_total,
            )
            args = proc.param_func(ctx)
            started = dt.datetime.now()
            status, error, rows = "FAILED", None, 0
            for attempt in range(1, max_retry + 1):
                try:
                    out = spark.sql(proc.sql, args=args)
                    rows = out.count() if out.columns else 0
                    status, error = "SUCCESS", None
                    break
                except Exception as e:  # noqa: BLE001 — retry then accumulate
                    error = str(e)[:500]
            rec = {
                "proc": proc.name,
                "status": status,
                "from_day": from_day,
                "to_day": to_day,
                "chunk_index": chunk_index,
                "chunk_total": chunk_total,
                "accntid_count": len(ids),
                "rows": rows,
                "error": error,
                "attempts": attempt,
            }
            audits.append(rec)
            if run_log is not None:
                from .runlog import RunRecord

                run_log.append(
                    spark,
                    RunRecord(
                        job_id=f"recon_{proc.name}",
                        task_id=f"{from_day}-{to_day}#chunk{chunk_index}/{chunk_total}",
                        run_day=execution_date,
                        started_at=started,
                        duration_sec=0.0,
                        result=error or f"rows={rows}",
                        is_success=status == "SUCCESS",
                        try_number=attempt,
                    ),
                )
    return audits


# ---------------------------------------------------------------------------
# O2/O3: run gates — allow-list, time-window short-circuit, row-count branch
# ---------------------------------------------------------------------------


@dataclass
class RunGate:
    """Declarative run gate (O2): the reference short-circuits a
    table's TaskGroup when the table isn't in the run's allow-list or
    the logical time falls outside its processing window
    (``dags/bccp_dag.py:60-85``). ``None`` fields mean "no
    constraint"."""

    allowed_tables: Sequence[str] | None = None
    not_before_hour: int | None = None
    not_after_hour: int | None = None

    def admits(self, table: str, at: dt.datetime) -> tuple[bool, str]:
        if self.allowed_tables is not None and table not in self.allowed_tables:
            return False, f"{table}: not in allow-list"
        if self.not_before_hour is not None and at.hour < self.not_before_hour:
            return False, f"{table}: before window ({at.hour} < {self.not_before_hour})"
        if self.not_after_hour is not None and at.hour >= self.not_after_hour:
            return False, f"{table}: after window ({at.hour} >= {self.not_after_hour})"
        return True, "admitted"


def row_count_branch(
    spark: SparkSession,
    path: str,
    predicate: "F.Column | None" = None,
    threshold: int = 0,
) -> bool:
    """O3 row-count branch probe (``helper1/optimize_compute.py:
    65-84``: run the expensive recompute only when the probe count
    exceeds the threshold). The count is a metadata/scan-cheap
    aggregate with the predicate pushed down; returns True = take the
    heavy branch."""
    df = spark.read.parquet(path)
    if predicate is not None:
        df = df.filter(predicate)
    return df.count() > threshold


def maintain_indexes(
    spark: SparkSession,
    indexes: Sequence,
    fold_multi_segment: bool = True,
    ivf_recall_floor_ppm: int = 900_000,
    ivf_recall_k: int = 10,
    ivf_nprobe: int = 3,
    lsh_recall_floor_ppm: int = 900_000,
    lsh_recall_threshold_ppm: int = 600_000,
    lsh_recall_sample: int = 256,
    run_log=None,
    job_id: str = "index-maintenance",
    conflict_retries: int = 2,
) -> list[dict]:
    """Retry shell around :func:`_maintain_indexes_once` — index
    maintenance is a deterministic fold over committed state, so a
    transient :class:`~.fs.PointerCommitConflict` (a racing writer
    slipped past a stolen lock) replays bounded times instead of
    wasting the whole fold (round-12 verdict task 3); an
    already-folded index replays as a no-op. Non-idempotent verbs
    (writes, takedowns) are NOT wrapped and keep failing fast."""
    from . import fs as FS

    return FS.retry_pointer_conflicts(
        lambda: _maintain_indexes_once(
            spark, indexes, fold_multi_segment=fold_multi_segment,
            ivf_recall_floor_ppm=ivf_recall_floor_ppm,
            ivf_recall_k=ivf_recall_k, ivf_nprobe=ivf_nprobe,
            lsh_recall_floor_ppm=lsh_recall_floor_ppm,
            lsh_recall_threshold_ppm=lsh_recall_threshold_ppm,
            lsh_recall_sample=lsh_recall_sample,
            run_log=run_log, job_id=job_id,
        ),
        attempts=conflict_retries + 1,
    )


def _maintain_indexes_once(
    spark: SparkSession,
    indexes: Sequence,
    fold_multi_segment: bool = True,
    ivf_recall_floor_ppm: int = 900_000,
    ivf_recall_k: int = 10,
    ivf_nprobe: int = 3,
    lsh_recall_floor_ppm: int = 900_000,
    lsh_recall_threshold_ppm: int = 600_000,
    lsh_recall_sample: int = 256,
    run_log=None,
    job_id: str = "index-maintenance",
) -> list[dict]:
    """The scheduled MAINTENANCE pass over persisted indexes — the
    weekly sibling of the nightly O(batch) appends/deletes (round 7).
    The LSM design deliberately defers two O(corpus) rewrites off the
    nightly path: the segment/tombstone FOLD (probe fan-out and
    anti-join overhead accrue until compaction) and the IVF
    RE-CLUSTER (frozen centroids drift under out-of-distribution
    appends). This job runs both on a schedule, the reference's
    split between incremental syncs and scheduled full refreshes
    (M8 full-refresh scripts vs the nightly M1-M7 merges) applied to
    index state:

    * every handle with >1 live segment (``fold_multi_segment``) or
      ANY live tombstone compacts — one clean segment, tombs folded
      away physically;
    * every :class:`~.operators.vector_index.IvfIndex` additionally
      measures probe recall on a sample and re-clusters when it sags
      below ``ivf_recall_floor_ppm`` (``ivf_index_refresh`` — a
      no-op write when healthy);
    * every :class:`~.operators.neardup_index.LshIndex` measures
      BANDING recall on a hash-ordered sample
      (``lsh_index_recall_ppm`` — round-12 verdict task 5) and flags
      ``recall_low`` below ``lsh_recall_floor_ppm``; no auto-action,
      because widening banding recall means a new spec
      (``lsh_index_rebuild``), an operator decision.

    Appends one run-log row per index when ``run_log`` is given
    (O11), with the action report as the result payload. Returns the
    reports. Probes resolved before any fold keep reading the
    previous (retained) epoch — maintenance never blocks readers."""
    import json as _json
    import time as _time

    from .operators.neardup_index import (
        DedupIndex,
        LshIndex,
        dedup_index_compact,
        lsh_index_compact,
    )
    from .operators.pq_index import PqIndex, pq_index_compact
    from .operators.simhash_index import SimhashIndex, simhash_index_compact
    from .operators.text_index import Bm25Index, bm25_index_compact
    from .operators.vector_index import (
        IvfIndex,
        ivf_index_compact,
        ivf_index_refresh,
    )

    compact_fn = {
        LshIndex: lsh_index_compact,
        DedupIndex: dedup_index_compact,
        SimhashIndex: simhash_index_compact,
        Bm25Index: bm25_index_compact,
        IvfIndex: ivf_index_compact,
        PqIndex: pq_index_compact,
    }
    reports: list[dict] = []
    for idx in indexes:
        started = dt.datetime.now()
        t0 = _time.perf_counter()
        cur = idx.resolve(spark)
        rep: dict = {
            "index": idx.name,
            "kind": idx.spec()["kind"],
            "segments_before": len(cur.segments),
            "tombs_before": len(cur.tombs),
            "compacted": False,
        }
        needs_fold = bool(cur.tombs) or (
            fold_multi_segment and len(cur.segments) > 1
        )
        if needs_fold:
            fn = next(
                f for t, f in compact_fn.items() if isinstance(idx, t)
            )
            fn(idx, spark)
            rep["compacted"] = True
        if isinstance(idx, IvfIndex):
            out = ivf_index_refresh(
                idx, spark, k=ivf_recall_k, nprobe=ivf_nprobe,
                recall_floor_ppm=ivf_recall_floor_ppm,
            )
            rep["recall_ppm"] = out["recall_ppm"]
            rep["refreshed"] = out["refreshed"]
        if isinstance(idx, LshIndex):
            # banding-recall gauge (round-12 verdict task 5) — the
            # LSH twin of the IVF recall gate, measure-and-flag only:
            # banding recall is a SPEC property (hashes/bands), so
            # the response to a sagging gauge is an operator-chosen
            # lsh_index_rebuild with a wider spec, never an in-place
            # refresh this job could pick unilaterally.
            from .operators.neardup_index import lsh_index_recall_ppm

            recall = lsh_index_recall_ppm(
                spark, idx,
                threshold_ppm=lsh_recall_threshold_ppm,
                max_sample=lsh_recall_sample,
            )
            rep["recall_ppm"] = recall
            rep["recall_low"] = recall < lsh_recall_floor_ppm
        rep["segments_after"] = len(idx.resolve(spark).segments)
        reports.append(rep)
        if run_log is not None:
            from .runlog import RunRecord

            run_log.append(
                spark,
                RunRecord(
                    job_id, f"maintain:{idx.name}",
                    started.strftime("%Y%m%d"), started,
                    round(_time.perf_counter() - t0, 3),
                    _json.dumps(rep, sort_keys=True), True,
                ),
            )
    return reports


def _pointer_log_depth(fs, ptr) -> int:
    """Commit-log depth of one pointer: entry count of the log-dir
    protocol (``<ptr>.d/*.ptr`` — grows until retention trims), or 1
    for a legacy single-file pointer, or 0 (never committed)."""
    from .fs import _log_dir

    d = _log_dir(ptr)
    if fs.exists(d):
        return len([n for (n, is_dir, _) in fs.list(d)
                    if not is_dir and n.endswith(".ptr")])
    return 1 if fs.exists(ptr) else 0


def _stale_lock(fs, root) -> bool:
    """True when a writer-lock file exists whose holder is dead — the
    residue a crashed writer leaves (harmless: the next writer steals
    it, but an audit should SEE it rather than infer it later)."""
    from . import fs as FS
    from .sinks import LOCK_MARKER, _holder_dead

    lock = FS.join(root, LOCK_MARKER)
    return bool(fs.exists(lock) and _holder_dead(fs, lock))


def _audit_table(tbl) -> dict:
    """Listing-only audit of one snapshot table (ParquetTable or
    PartitionedTable): retained/reclaimable snapshots, pins, pointer
    commit-log depth, dead-writer lock residue, and (partitioned)
    orphan partition dirs no retained manifest references."""
    from . import fs as FS
    from .sinks import PartitionedTable

    fs = tbl._fs()
    hist = tbl.history()
    cur = tbl.current_snapshot()
    pinned = tbl.pinned_snapshots()
    rep = {
        "root": str(tbl.root),
        "snapshots": len(hist),
        "has_current": cur is not None,
        "pinned": len(pinned),
        # pool a vacuum could reclaim (subject to its keep window):
        # every retained snapshot that is neither current nor pinned
        "reclaimable_snapshots": len(
            [p for p in hist if p != cur and p.name not in pinned]
        ),
        "pointer_log_depth": _pointer_log_depth(
            fs, FS.join(tbl.root, "_CURRENT")
        ),
        "stale_lock": _stale_lock(fs, tbl.root),
    }
    if isinstance(tbl, PartitionedTable):
        referenced = tbl._referenced_dirs()
        parts_root = FS.join(tbl.root, "parts")
        on_disk = (
            [nm for (nm, is_dir, _) in fs.list(parts_root) if is_dir]
            if fs.exists(parts_root)
            else []
        )
        rep["partition_dirs"] = len(on_disk)
        rep["orphan_partition_dirs"] = len(
            [n for n in on_disk if n not in referenced]
        )
    return rep


def _audit_index(spark: SparkSession, idx) -> dict:
    """Listing-only audit of one persisted index: live segment/tomb
    counts, retained-epoch and pin ledgers, spec-history depth,
    manifest commit-log depth, member dirs on disk vs the manifest's
    keep set (orphans = crashed-build residue the next writer's GC
    would clear), and dead-holder residue on the index/pins locks."""
    import re

    from . import fs as FS
    from .operators.neardup_index import (
        _keep_epochs,
        _manifest_path,
        _read_manifest,
        _read_pins,
    )
    from .sinks import _holder_dead, _warehouse_path

    man = _read_manifest(spark, idx.name)
    wh = _warehouse_path(spark)
    fs = FS.fs_for(wh)
    pat = re.compile(rf"^{re.escape(idx.name.lower())}__e(\d+)_")
    member_epochs = sorted(
        {
            int(m.group(1))
            for (nm, is_dir, _) in fs.list(wh)
            if is_dir
            for m in [pat.match(nm)]
            if m
        }
    )
    rep = {
        "index": idx.name,
        "kind": idx.spec()["kind"],
        "exists": man is not None,
    }
    if man is None:
        return rep
    keep = _keep_epochs(man["history"], man.get("tomb_history"))
    pins = _read_pins(spark, idx.name)
    rep.update(
        {
            "live_epoch": man["epoch"],
            "segments": len(man["segments"]),
            "tombs": len(man.get("tombs", [])),
            "retained_epochs": len(man["history"]),
            "pinned_epochs": len({e for eps in pins.values() for e in eps}),
            "spec_history_depth": len(man.get("spec_history", {})),
            "member_epochs_on_disk": len(member_epochs),
            "orphan_member_epochs": len(
                [e for e in member_epochs if e not in keep]
            ),
            "manifest_log_depth": _pointer_log_depth(
                fs, _manifest_path(spark, idx.name)
            ),
            "stale_lock": any(
                fs.exists(p) and _holder_dead(fs, p)
                for p in (
                    FS.join(
                        wh, f"{idx.name.lower()}__index_lock", "_LOCK"
                    ),
                    FS.join(
                        wh, f"{idx.name.lower()}__pins_lock", "_LOCK"
                    ),
                )
            ),
        }
    )
    return rep


def store_audit(
    spark: SparkSession,
    corpus_path,
    indexes: Sequence | None = None,
) -> dict:
    """Read-only GC/retention pre-flight for a store (round-12
    verdict task 7): the whole-store report the ops story previously
    had to infer from individual verb receipts. LISTING-ONLY by
    construction — no Spark job, no lock taken, no file written — so
    it can run against a LIVE store at any cadence:

    * every table (the corpus plus any ``__deny*`` sidecars):
      retained vs reclaimable snapshots, pins, pointer commit-log
      depth, dead-writer lock residue, and — partitioned layout —
      orphan partition dirs no retained manifest references;
    * every index (resolved from the ``_CURATED`` co-manifest when
      one exists; pass ``indexes=`` handles for bare index audits):
      live segments/tombs (the compaction pressure gauge), retained
      + pinned epoch ledgers, spec-history depth, manifest log
      depth, member epochs on disk vs the manifest keep set (orphans
      = crashed-build residue), lock residue.

    This is the dry-run for :func:`maintain_curated_store` (pass
    ``audit_only=True`` there) — the numbers it reports are exactly
    the work the maintenance verbs would do: ``reclaimable_snapshots``
    → vacuum, ``segments``/``tombs`` > 1/0 → compact,
    ``orphan_member_epochs``/``orphan_partition_dirs`` → the next
    writer's GC, ``stale_lock`` → steal-on-contact. A store with no
    ``_CURATED`` co-manifest audits as a bare snapshot table."""
    from . import fs as FS
    from .pipelines import (
        _corpus_table_from_manifest,
        _curated_fields,
        _index_from_manifest,
        _read_curated_manifest,
        _sem_index_from_manifest,
    )
    from .sinks import ParquetTable

    raw = _read_curated_manifest(corpus_path)
    idx_targets = list(indexes or [])
    if raw is not None:
        man = _curated_fields(raw)
        corpus_tbl = _corpus_table_from_manifest(corpus_path, man)
        if not idx_targets:
            idx_targets.append(_index_from_manifest(man))
            sem = _sem_index_from_manifest(man)
            if sem is not None:
                idx_targets.append(sem)
    else:
        corpus_tbl = ParquetTable(corpus_path)
    tables = {"corpus": _audit_table(corpus_tbl)}
    for arm in ("__deny", "__deny_sig", "__deny_sem"):
        t = ParquetTable(f"{corpus_path}{arm}")
        if t.exists():
            tables[f"deny{arm[6:] or ''}"] = _audit_table(t)
    report = {
        "store": str(corpus_path),
        "curated": raw is not None,
        "tables": tables,
        "indexes": [_audit_index(spark, i) for i in idx_targets],
        "curated_log_depth": _pointer_log_depth(
            FS.fs_for(FS.join(corpus_path, "_CURATED")),
            FS.join(corpus_path, "_CURATED"),
        ),
    }
    return report


def maintain_curated_store(
    spark: SparkSession,
    corpus_path,
    target_file_bytes: int = 128 << 20,
    keep: int = 3,
    ivf_recall_floor_ppm: int = 900_000,
    run_log=None,
    job_id: str = "store-maintenance",
    conflict_retries: int = 2,
    audit_only: bool = False,
) -> dict:
    """Retry shell around :func:`_maintain_curated_store_once`: store
    maintenance (index folds + corpus compaction + one `_CURATED`
    re-publish) is replay-idempotent — a retry re-acquires the store
    lock, re-resolves the now-current manifest, and folds whatever is
    still fragmented — so a transient
    :class:`~.fs.PointerCommitConflict` replays bounded times instead
    of killing the weekly fold (round-12 verdict task 3). Verbs with
    caller payloads (the curation batch itself, takedowns) are NOT
    wrapped.

    ``audit_only=True`` is the DRY-RUN: it returns
    :func:`store_audit`'s read-only report of exactly the work a
    real pass would do (reclaimable snapshots, fragmented segments,
    orphans, lock residue) and touches nothing — no store lock, no
    commits."""
    from . import fs as FS

    if audit_only:
        return store_audit(spark, corpus_path)
    return FS.retry_pointer_conflicts(
        lambda: _maintain_curated_store_once(
            spark, corpus_path, target_file_bytes=target_file_bytes,
            keep=keep, ivf_recall_floor_ppm=ivf_recall_floor_ppm,
            run_log=run_log, job_id=job_id,
        ),
        attempts=conflict_retries + 1,
    )


def _maintain_curated_store_once(
    spark: SparkSession,
    corpus_path,
    target_file_bytes: int = 128 << 20,
    keep: int = 3,
    ivf_recall_floor_ppm: int = 900_000,
    run_log=None,
    job_id: str = "store-maintenance",
) -> dict:
    """Scheduled maintenance for a WHOLE curated store (round 8) —
    the one weekly verb that keeps a ``curate_increment_stream``
    deployment healthy after months of nightly O(batch) commits:

    * the store's index fleet (curation text index + semantic IVF if
      the store runs the embedding channel) folds segments/tombstones
      and recall-gates the IVF re-cluster via
      :func:`maintain_indexes`;
    * the corpus compacts — a partitioned store rewrites ONLY
      fragmented partitions (:meth:`~..sinks.PartitionedTable.compact`,
      everything else carried by reference), a monolithic store
      bin-packs when its file count exceeds the target;
    * ONE new ``_CURATED`` pointer pair publishes the (compacted
      corpus snapshot, post-fold index epochs), so
      ``curated_view`` readers actually SEE the folded state —
      without this commit they keep resolving the pre-maintenance
      pair and pay the old probe fan-out forever;
    * pins + vacuum advance exactly like the loop's (live + previous
      pairs stay readable; older unpinned history retires).

    Runs under the store-scoped writer mutex (``pipelines._store_lock``)
    so it can never interleave with a live batch or a takedown —
    corpus compaction is read-modify-write at store scope, and racing
    a batch would lose its admission (the round-8 race lesson).
    Content is provably unchanged: compaction and folds are
    value-identical rewrites (pinned in tests). Returns a report
    dict; with ``run_log`` it lands as one O11 row per index plus a
    ``maintain_store`` row."""
    import json as _json
    import time as _time

    from . import fs as FS
    from .pipelines import (
        _corpus_table_from_manifest,
        _curated_fields,
        _index_from_manifest,
        _sem_index_from_manifest,
        _store_lock,
    )
    from .sinks import ParquetTable, PartitionedTable, TableGroup

    started = dt.datetime.now()
    t0 = _time.perf_counter()
    from .pipelines import _read_curated_manifest

    man_path = FS.join(corpus_path, "_CURATED")
    if _read_curated_manifest(corpus_path) is None:
        raise FileNotFoundError(
            f"no _CURATED co-manifest under {corpus_path} — "
            "maintain_curated_store operates on a curated store"
        )
    with _store_lock(corpus_path):
        man = _curated_fields(_read_curated_manifest(corpus_path))
        corpus_tbl = _corpus_table_from_manifest(corpus_path, man)
        idx = _index_from_manifest(man)
        targets = [idx]
        ivf = _sem_index_from_manifest(man)
        if ivf is not None:
            targets.append(ivf)
        index_reports = maintain_indexes(
            spark, targets,
            ivf_recall_floor_ppm=ivf_recall_floor_ppm,
            run_log=run_log, job_id=job_id,
        )
        # IVFADC recall gate: maintain_indexes recall-refreshes only
        # IvfIndex (a PqIndex retains no full vectors to re-train
        # from); at STORE scope the corpus supplies the floats — the
        # same consistency rule the stream's rebuild path follows.
        from .operators.pq_index import PqIndex, pq_index_refresh

        if isinstance(ivf, PqIndex):
            cem = corpus_tbl.read(spark)
            if "embedding" in cem.columns:
                cem = cem.filter(
                    cem["embedding"].isNotNull()
                ).select("doc_id", "embedding")
                if cem.take(1):
                    out = pq_index_refresh(
                        ivf, cem, spark,
                        recall_floor_ppm=ivf_recall_floor_ppm,
                        vec_col="embedding", id_col="doc_id",
                    )
                    for rep in index_reports:
                        if rep["index"] == ivf.name:
                            rep["recall_ppm"] = out["recall_ppm"]
                            rep["refreshed"] = out["refreshed"]

        # corpus compaction — partial for partitioned stores, gated
        # by file-count for monolithic ones (ParquetTable.compact
        # rewrites unconditionally, so the gate lives here)
        corpus_report: dict = {}
        if isinstance(corpus_tbl, PartitionedTable):
            rep = corpus_tbl.compact(
                spark, target_file_bytes=target_file_bytes
            )
            corpus_report = {
                "partitions_compacted": sorted(rep),
                "files": {v: list(fa) for v, fa in rep.items()},
            }
        else:
            n, total = corpus_tbl.file_stats()
            target = max(1, -(-total // target_file_bytes))
            if n > target:
                before, after = corpus_tbl.compact(
                    spark, target_file_bytes=target_file_bytes
                )
                corpus_report = {"files_before": before,
                                 "files_after": after}

        # publish the post-maintenance pair: folded index epochs +
        # (possibly) compacted corpus snapshot, one pointer commit
        from .operators.neardup_index import set_index_pin

        group = TableGroup.wrap({"corpus": corpus_tbl}, man_path)
        prev_man = _curated_fields(group.manifest())
        new_epoch = idx.resolve(spark).epoch
        snap = corpus_tbl.current_snapshot()
        extras = {
            "batch_id": man.get("batch_id"),
            "maintenance": True,
            "index_name": man["index_name"],
            "index_kind": man["index_kind"],
            "index_epoch": new_epoch,
            "index_spec": idx.spec(),
        }
        ivf_epoch = None
        if ivf is not None:
            ivf_epoch = ivf.resolve(spark).epoch
            extras["ivf_name"] = ivf.name
            extras["ivf_epoch"] = ivf_epoch
            extras["ivf_spec"] = man.get("ivf_spec", ivf.spec())
        if man.get("corpus_layout") == "partitioned":
            extras["corpus_layout"] = "partitioned"
            extras["corpus_partition"] = man["corpus_partition"]
        group.commit_pointers({"corpus": snap.name}, extras=extras)

        pin_epochs = [new_epoch]
        pin_snaps = [snap.name]
        if prev_man is not None and prev_man["index_name"] == man["index_name"]:
            pin_epochs.append(prev_man["index_epoch"])
            pin_snaps.append(prev_man["corpus_snapshot"])
        set_index_pin(spark, man["index_name"], f"curated:{corpus_path}",
                      pin_epochs)
        if ivf is not None and ivf_epoch is not None:
            ivf_pins = [ivf_epoch]
            if prev_man is not None and prev_man.get("ivf_name") == ivf.name:
                ivf_pins.append(prev_man["ivf_epoch"])
            set_index_pin(spark, ivf.name, f"curated:{corpus_path}",
                          ivf_pins)
        corpus_tbl.vacuum(keep=keep, pinned=pin_snaps)
        # expire time-bounded deny holds (corpus_takedown's
        # deny_expires_at) — still under the store lock
        from .pipelines import deny_expire

        deny_report = deny_expire(spark, corpus_path, _locked=True)
    report = {
        "corpus": corpus_report,
        "indexes": index_reports,
        "corpus_snapshot": snap.name,
        "index_epoch": new_epoch,
        "deny_expired": deny_report,
    }
    if run_log is not None:
        from .runlog import RunRecord

        run_log.append(
            spark,
            RunRecord(
                job_id, "maintain_store", started.strftime("%Y%m%d"),
                started, round(_time.perf_counter() - t0, 3),
                _json.dumps(report, sort_keys=True), True,
            ),
        )
    return report
