"""Watermarked event-time window aggregation (append mode).

The reference's backdate-DAG family re-reads wide historical windows
to catch late rows (SURVEY §2.11) — the Structured-Streaming-native
form is a watermark: declare how late data may arrive, aggregate into
event-time tumbling windows, and emit each window once, when the
watermark passes its end. State is bounded (windows older than the
watermark are finalized and evicted), which is what makes the pattern
viable on an unbounded 100 TB/day stream where the batch engine's
"re-scan the last 6 hours every hour" approach would re-read the fact
table forever.

Late-data contract (append mode):

* rows later than ``delay`` behind the max event time seen are DROPPED
  (counted nowhere) — the streaming analog of the freshness-gated
  merge M3 discarding stale updates;
* rows within the delay re-open their window's running state;
* a window's row is emitted exactly once, after watermark > window end.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_agg(
    stream: DataFrame,
    ts_col: str,
    window_duration: str,
    delay: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] | None = None,
) -> DataFrame:
    """Tumbling event-time windows with a watermark.

    Returns ``(window_start, window_end, *keys, *aggs)``; default agg
    is ``count(1) AS n_events``. Works identically on a batch frame
    (watermark is a no-op there) — the batch twin used by the
    ``events_tumbling_daily`` declared query has the same grouping
    semantics, so replays reconcile.
    """
    aggs = list(aggs) if aggs else [F.count(F.lit(1)).alias("n_events")]
    w = F.window(F.col(ts_col), window_duration)
    out = stream.withWatermark(ts_col, delay).groupBy(w, *keys).agg(*aggs)
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[c for c in out.columns if c != "window"],
    )
