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


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    delay: str,
    max_lag: str,
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream interval join: match right-side rows
    to left-side rows with the same ``key`` whose timestamp falls in
    ``[left_ts − max_lag, left_ts]`` (e.g. attribute a purchase to the
    click that preceded it by ≤ max_lag).

    Both sides carry a watermark and the join condition bounds
    ``right_ts`` relative to ``left_ts`` on BOTH ends — that pair of
    constraints is what lets Spark evict buffered state once the
    watermark passes, keeping state proportional to ``max_lag``'s
    worth of traffic instead of the whole stream (the unbounded-state
    failure mode of an unconstrained stream-stream join, which Spark
    rejects in append mode for exactly that reason).

    Works identically on batch frames (watermarks no-op) — the batch
    twin is a plain range predicate join, so replays reconcile.
    """
    lw = left.withWatermark(left_ts, delay)
    rw = right.withWatermark(right_ts, delay)
    lcol, rcol = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (rcol >= lcol - F.expr(f"INTERVAL {max_lag}"))
        & (rcol <= lcol)
    )
    return lw.alias("l").join(rw.alias("r"), cond, how)


def session_windowed_agg(
    stream: DataFrame,
    ts_col: str,
    gap: str,
    delay: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] | None = None,
) -> DataFrame:
    """NATIVE session windows (``F.session_window``) with a
    watermark — the built-in twin of the custom
    ``stateful.streaming_sessionize``: Spark merges windows whose
    events are within ``gap`` of each other and, in streaming, emits
    a session only once the watermark passes its close (so the state
    store, not Python, holds the open sessions — use this one unless
    you need custom per-event state logic; the applyInPandasWithState
    variant remains for semantics the native operator can't express,
    e.g. emitting provisional session rows).

    Contract difference worth knowing: the native ``session_window``
    END is ``last event + gap`` (the window extends by the gap),
    while the gaps-and-islands batch operator ends at the LAST EVENT
    — start and event counts agree, pinned in pytest against
    ``operators.sessionize`` on the same frame. Works identically on
    a batch frame (watermark is a no-op there)."""
    aggs = list(aggs) if aggs else [F.count(F.lit(1)).alias("n_events")]
    w = F.session_window(F.col(ts_col), gap)
    out = stream.withWatermark(ts_col, delay).groupBy(w, *keys).agg(*aggs)
    return out.select(
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        *[c for c in out.columns if c != "session_window"],
    )
