"""Batch gap-based sessionization.

The batch twin of ``streaming/stateful.py``'s stateful sessionizer:
assign each key's ordered events to sessions split wherever the gap
between consecutive events exceeds ``gap`` — the standard
clickstream/session-log primitive the reference's 5-minute micro-batch
cadence implies but never computes relationally (SURVEY §2.11: "no
sessionization" in the reference — this is engine-added surface).

Plan shape: one hash exchange + one sort per key (two stacked window
functions over the same ``(key, ts)`` ordering collapse into a single
Window physical node), then an ordinary groupBy for session stats.
Linear in input, AQE-splittable, no self-join — the naive
"join events to session boundaries" formulation is quadratic per key
and never worth it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    gap: int,
    session_col: str = "session_idx",
) -> DataFrame:
    """Add a 0-based ``session_idx`` per key: a new session starts at
    the first event and after every inter-event gap > ``gap`` (in the
    time column's own units — µs for ``unix_micros`` longs).

    Ties/order: events are ordered by ``(ts, remaining cols)`` — pass
    an already-unique ts per key, or accept that equal-ts events sort
    together into one session (gap 0 never splits them).
    """
    keys = list(keys)
    order = Window.partitionBy(*keys).orderBy(ts_col)
    prev = F.lag(ts_col).over(order)
    is_new = (prev.isNull() | ((F.col(ts_col) - prev) > F.lit(gap))).cast("bigint")
    run = (
        Window.partitionBy(*keys)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(session_col, (F.sum(is_new).over(run) - F.lit(1)))


def session_stats(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    gap: int,
) -> DataFrame:
    """Sessionize then aggregate one row per session:
    ``(keys..., session_idx, n_events, start, end, duration)``."""
    keys = list(keys)
    s = sessionize(df, keys, ts_col, gap)
    return s.groupBy(*keys, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.max(ts_col) - F.min(ts_col)).alias("duration"),
    )
