"""Elasticsearch bulk-export arm for the run/metrics tables — the
engine's analog of the reference's fluentd→Elasticsearch log-shipping
leg (``fluentd/conf/fluent.conf:1-26``: tail → ``@type
elasticsearch`` with ``logstash_format true``, ``index_name
airflow-logs``, ``id_key``/``tag_key``/``time_key``; the Kibana pane
reads those indexes, ``kibana/kibana.yml``). The Prometheus/statsd
arms (metrics.py) cover the METRICS plane; this covers the LOG/audit
plane: RunLog and MetricsLog rows rendered as Elasticsearch **bulk
API NDJSON** — the exact wire format ``POST /_bulk`` ingests — with
the same stdlib-only, zero-new-dependency discipline.

Fidelity to the fluentd output shape:

* ``logstash_format true`` → the action line's ``_index`` is the
  date-suffixed ``{base}-YYYY.MM.DD`` (fluentd derives the suffix
  from each record's event time, so one export can span indexes);
* ``id_key`` → every action carries a DETERMINISTIC ``_id`` derived
  from the row's identity, so a replayed export (the engine's
  idempotent-replay discipline) overwrites instead of duplicating —
  exactly why the reference sets ``id_key log_file``;
* ``tag_key tag`` / ``time_key timestamp`` → each source doc carries
  ``tag`` and a ``@timestamp`` (ISO-8601, what Kibana's time filter
  indexes on).

Driver-sized by construction: one row per task run / per (run,
stage, metric) emission — operational cardinality, the same class
``MetricsLog.latest`` already collects. Ship a WINDOW (``since=``)
from a scheduled job rather than the whole history.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import json

from pyspark.sql import SparkSession

__all__ = ["es_bulk_lines", "runlog_es_bulk", "metrics_es_bulk"]


def _iso(ts: dt.datetime) -> str:
    return ts.isoformat(timespec="milliseconds")


def _action(index_base: str, ts: dt.datetime, doc_id: str) -> str:
    return json.dumps(
        {
            "index": {
                "_index": f"{index_base}-{ts.strftime('%Y.%m.%d')}",
                "_id": doc_id,
            }
        },
        sort_keys=True,
    )


def es_bulk_lines(rows, index_base: str, tag: str, time_field: str,
                  id_fields) -> list[str]:
    """Render Row-like records as ES bulk NDJSON: alternating action
    and source lines (callers join with ``"\\n"`` + trailing newline
    for ``POST /_bulk``). ``time_field`` names the datetime column
    that becomes ``@timestamp`` and the logstash date suffix;
    ``id_fields`` name the identity columns hashed into ``_id``."""
    out: list[str] = []
    for r in rows:
        d = r.asDict() if hasattr(r, "asDict") else dict(r)
        ts = d[time_field]
        ident = "\x1f".join(str(d[f]) for f in id_fields)
        doc_id = hashlib.md5(
            f"{tag}\x1f{ident}".encode()
        ).hexdigest()
        src = {
            k: (_iso(v) if isinstance(v, dt.datetime) else v)
            for k, v in d.items()
        }
        src["@timestamp"] = _iso(ts)
        src["tag"] = tag
        out.append(_action(index_base, ts, doc_id))
        out.append(json.dumps(src, sort_keys=True))
    return out


def runlog_es_bulk(spark: SparkSession, run_log,
                   index_base: str = "ods-run-log",
                   since: dt.datetime | None = None) -> list[str]:
    """RunLog rows (O11 — the reference's ``task_result`` audit,
    ``helper1/task_logger.py:25-66``) as bulk NDJSON. ``_id`` hashes
    (job_id, task_id, run_day, try_number, started_at): a re-shipped
    window or a replayed task run lands on the same document."""
    df = run_log.read(spark)
    if since is not None:
        df = df.filter(df["started_at"] >= since)
    return es_bulk_lines(
        df.collect(), index_base, tag="ods.runlog",
        time_field="started_at",
        id_fields=("job_id", "task_id", "run_day", "try_number",
                   "started_at"),
    )


def metrics_es_bulk(spark: SparkSession, metrics_log,
                    index_base: str = "ods-task-metrics",
                    since: dt.datetime | None = None) -> list[str]:
    """MetricsLog rows (per-stage rows/bytes/wall) as bulk NDJSON;
    ``_id`` hashes the series key + emission time."""
    df = metrics_log.read(spark)
    if since is not None:
        df = df.filter(df["emitted_at"] >= since)
    return es_bulk_lines(
        df.collect(), index_base, tag="ods.metrics",
        time_field="emitted_at",
        id_fields=("job_id", "task_id", "stage", "metric", "emitted_at"),
    )
