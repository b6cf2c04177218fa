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

    # -- export arms ---------------------------------------------------------
    #
    # The reference's observability stack is statsd counters scraped
    # into Prometheus (configs/statsd.yaml maps `airflow.*` names,
    # configs/prometheus.yaml scrapes the statsd-exporter). The table
    # above is the durable record; these arms are the WIRE formats a
    # monitoring stack actually ingests, derived from it on demand.

    def latest(self, spark: SparkSession) -> list:
        """One row per (job, task, stage, metric) series — the most
        recent emission (gauge semantics: a scrape reports current
        state; history stays queryable in the table). Driver-sized by
        construction: series count = jobs × stages × metric names,
        never rows×."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        w = Window.partitionBy(
            "job_id", "task_id", "stage", "metric"
        ).orderBy(F.col("emitted_at").desc(), F.col("value").desc())
        return (
            self.read(spark)
            .withColumn("__rn", F.row_number().over(w))
            .filter("__rn = 1")
            .drop("__rn")
            .collect()
        )

    def prometheus_text(self, spark: SparkSession,
                        prefix: str = "ods") -> str:
        """The Prometheus text exposition (version 0.0.4) of every
        live series: ``{prefix}_{metric}{labels} value timestamp_ms``
        with one ``# TYPE … gauge`` header per metric name — what a
        prometheus.yaml scrape job ingests verbatim (the reference's
        statsd-exporter emits exactly this shape)."""
        rows = self.latest(spark)
        by_name: dict[str, list] = {}
        for r in rows:
            by_name.setdefault(_prom_name(prefix, r.metric), []).append(r)
        out: list[str] = []
        for name in sorted(by_name):
            out.append(f"# TYPE {name} gauge")
            for r in sorted(
                by_name[name],
                key=lambda r: (r.job_id, r.task_id, r.stage),
            ):
                labels = ",".join(
                    f'{k}="{_prom_label(v)}"'
                    for k, v in (
                        ("job_id", r.job_id),
                        ("task_id", r.task_id),
                        ("stage", r.stage),
                        ("unit", r.unit),
                    )
                )
                ts = int(r.emitted_at.timestamp() * 1000)
                out.append(f"{name}{{{labels}}} {r.value:g} {ts}")
        return "\n".join(out) + "\n"

    def statsd_lines(self, spark: SparkSession,
                     prefix: str = "ods") -> list[str]:
        """statsd line protocol (``name:value|g``) of every live
        series — the push-side analog for deployments that keep the
        reference's statsd ingestion (configs/statsd.yaml) instead of
        scraping. Label dimensions flatten into the dotted name the
        statsd mapping rules split back apart."""
        return [
            f"{prefix}.{r.job_id}.{r.task_id}.{r.stage}.{r.metric}"
            f":{r.value:g}|g"
            for r in self.latest(spark)
        ]

    def serve_prometheus(self, spark: SparkSession, port: int = 0,
                         prefix: str = "ods"):
        """Start a daemon-thread ``/metrics`` scrape endpoint over
        this table (stdlib http.server — no new dependencies) and
        return the bound (server, port). Each scrape re-renders from
        the table, so the endpoint reflects whatever the pipeline
        emitted last — point a prometheus.yaml scrape job at it and
        the reference's dashboards carry over. ``port=0`` binds an
        ephemeral port (tests). Call ``server.shutdown()`` to stop;
        the thread is daemonized so it never blocks JVM exit."""
        import http.server
        import threading

        log = self

        class _Handler(http.server.BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 — stdlib contract
                if self.path.rstrip("/") not in ("", "/metrics"):
                    self.send_response(404)
                    self.end_headers()
                    return
                try:
                    body = log.prometheus_text(spark, prefix).encode()
                except Exception as e:  # table missing/mid-write
                    self.send_response(503)
                    self.end_headers()
                    self.wfile.write(str(e).encode()[:500])
                    return
                self.send_response(200)
                self.send_header(
                    "Content-Type", "text/plain; version=0.0.4"
                )
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):  # quiet scrapes
                pass

        srv = http.server.ThreadingHTTPServer(("127.0.0.1", port), _Handler)
        threading.Thread(
            target=srv.serve_forever, name="metrics-scrape", daemon=True
        ).start()
        return srv, srv.server_address[1]


def _prom_name(prefix: str, metric: str) -> str:
    import re

    return f"{prefix}_{re.sub(r'[^a-zA-Z0-9_:]', '_', metric)}"


def _prom_label(v) -> str:
    return (
        str(v)
        .replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
    )
