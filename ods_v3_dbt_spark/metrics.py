"""Per-stage structured metrics emission — the engine's analog of
the reference's observability stack: statsd→Prometheus counters
(`configs/statsd.yaml`, `configs/prometheus.yaml`) and fluentd→
Elasticsearch task logs (`fluentd/conf/fluent.conf:1-26`). The
run-log table (runlog.py, O11) records one row per task RUN; this
module records one row per (run, stage, metric) — rows in/out,
bytes, wall seconds — which is what dashboards and SLO alerts
actually consume.

Storage is the same append-only Parquet discipline as RunLog: tiny
single-file appends, no snapshot-swap needed, and the table is
itself queryable by the engine (a metrics rollup is just another
declared aggregation). A production deployment points `sink` at a
statsd/OTLP exporter instead — the emit API is deliberately the
flat (name, value, unit) triple those protocols speak.
"""

from __future__ import annotations

import datetime as dt
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

METRICS_SCHEMA = (
    "job_id string, task_id string, stage string, metric string, "
    "value double, unit string, emitted_at timestamp"
)


class MetricsLog:
    """Append-only (job, task, stage, metric, value) table."""

    def __init__(self, path: str | Path) -> None:
        self.path = str(path)

    def emit(
        self,
        spark: SparkSession,
        job_id: str,
        task_id: str,
        stage: str,
        metrics: dict[str, tuple[float, str]],
    ) -> None:
        """Append one row per metric: ``metrics`` maps metric name →
        (value, unit), e.g. ``{"rows_out": (1234, "rows"),
        "wall": (2.5, "sec")}``."""
        now = dt.datetime.now()
        rows = [
            (job_id, task_id, stage, name, float(value), unit, now)
            for name, (value, unit) in metrics.items()
        ]
        spark.createDataFrame(rows, schema=METRICS_SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(self.path)

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.schema(METRICS_SCHEMA).parquet(self.path)
