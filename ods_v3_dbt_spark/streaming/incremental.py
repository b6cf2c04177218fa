"""Structured-Streaming wrapper for the reference's micro-batch
cadence (SURVEY.md §2.11).

The reference's tightest pipeline is a 5-minute cron re-running a
windowed extract + MERGE (``dags/bccp_dag.py:30-33``), with hourly/
3-hourly backdate DAGs re-reading wide windows to catch late updates
(``dags/bccp_backdate_dag.py``). The Spark-native equivalent:

* a file-source ``readStream`` over the landing zone,
* ``foreachBatch`` applying the spec's merge strategy into the target
  :class:`ParquetTable` — the freshness-gated M3 merge makes replays
  and out-of-order batches idempotent (the reference's de-facto
  late-data policy, no separate backdate machinery needed),
* ``availableNow`` trigger for per-cron-run drains, or
  ``processingTime="5 minutes"`` for a resident stream,
* optional watermark for bounded state in windowed aggregations.

Scale note: per micro-batch work is one keyed shuffle (the merge
window) over batch ∪ matched-target rows; checkpointing tracks the
landing files, so a 1000-executor cluster drains arbitrarily large
backlogs in bounded batches (``maxFilesPerTrigger``).
"""

from __future__ import annotations

from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from ..catalog import TableSpec
from ..operators import merge as M
from ..sinks import BucketedTable, ParquetTable


def merge_batch_fn(
    spec: TableSpec, target: ParquetTable | BucketedTable
) -> Callable[[DataFrame, int], None]:
    """Build the foreachBatch body: apply the spec's declared strategy
    against the current target snapshot and swap in the result.

    The target may be a path-based :class:`ParquetTable` or a
    catalog-registered :class:`BucketedTable` — with the latter, the
    target side of every M1-M9 merge join scans bucket-aligned
    (no Exchange, no Sort; only the batch slice shuffles), the
    layout's whole point at fact scale."""

    def apply(batch: DataFrame, batch_id: int) -> None:  # noqa: ARG001
        spark = batch.sparkSession
        exists = (
            target.exists(spark)
            if isinstance(target, BucketedTable)
            else target.exists()
        )
        if not exists:
            target.write(batch)
            return
        tgt = target.read(spark)
        keys = list(spec.keys)
        if spec.strategy == "merge_upsert_fresh":
            merged = M.merge_upsert_fresh(
                tgt, batch, keys, spec.cursor_field, spec.tie_update
            )
        elif spec.strategy == "merge_upsert":
            merged = M.merge_upsert(tgt, batch, keys)
        elif spec.strategy == "merge_nullsafe":
            merged = M.merge_upsert(tgt, batch, keys, null_safe=True)
        elif spec.strategy == "dedup_then_merge":
            merged = M.dedup_then_merge(tgt, batch, keys, _order_cols(spec))
        elif spec.strategy == "partition_overwrite":
            merged = M.partition_overwrite(tgt, batch, list(spec.partition_cols))
        elif spec.strategy == "append":
            merged = tgt.unionByName(batch)
        else:
            merged = batch  # full_refresh: batch replaces table
        target.write(merged)

    return apply


def _order_cols(spec: TableSpec):
    from pyspark.sql import functions as F

    cols = []
    for entry in spec.dedup_order:
        name, _, direction = entry.partition(" ")
        col = F.col(name)
        cols.append(col.desc() if direction.strip() == "desc" else col.asc())
    return cols


class IncrementalStream:
    """landing-dir stream → foreachBatch merge into a ParquetTable."""

    def __init__(
        self,
        spark: SparkSession,
        spec: TableSpec,
        landing_dir: str | Path,
        target: ParquetTable,
        checkpoint_dir: str | Path,
        max_files_per_trigger: int | None = None,
        watermark: tuple[str, str] | None = None,  # (col, "10 minutes")
    ) -> None:
        self.spark = spark
        self.spec = spec
        self.landing_dir = str(landing_dir)
        self.target = target
        self.checkpoint_dir = str(checkpoint_dir)
        self.max_files = max_files_per_trigger
        self.watermark = watermark

    def _source(self) -> DataFrame:
        reader = self.spark.readStream.schema(self.spec.struct_type())
        if self.max_files:
            reader = reader.option("maxFilesPerTrigger", str(self.max_files))
        df = reader.parquet(self.landing_dir)
        if self.watermark:
            df = df.withWatermark(*self.watermark)
        return df

    def start(self, trigger: dict | None = None):
        """Start the stream. ``trigger`` defaults to ``availableNow``
        (one cron-run drain); pass ``{"processingTime": "5 minutes"}``
        for the resident-stream cadence."""
        writer = (
            self._source()
            .writeStream.foreachBatch(merge_batch_fn(self.spec, self.target))
            .option("checkpointLocation", self.checkpoint_dir)
            .outputMode("update")
        )
        writer = writer.trigger(**(trigger or {"availableNow": True}))
        return writer.start()

    def run_once(self, timeout_sec: int = 300) -> None:
        """Drain everything currently in the landing dir and stop —
        the engine's equivalent of one reference cron run."""
        q = self.start({"availableNow": True})
        q.awaitTermination(timeout_sec)
        if q.isActive:
            q.stop()


def run_available_now(stream: IncrementalStream, timeout_sec: int = 300) -> None:
    stream.run_once(timeout_sec)
