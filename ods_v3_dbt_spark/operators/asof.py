"""As-of (point-in-time) join.

Not in the reference's surface (its joins are all equi-joins, SURVEY
§2.5) but a core training-data / event-enrichment primitive: attach to
each left row the most recent right row at-or-before its timestamp,
per key — "what was the user's last purchase when this view
happened", "which dimension version was live when this fact landed"
(the lookup a slowly-changing dimension needs at 100 TB).

Spark-first plan: **union + ordered window**, not a range join. A
range/theta join materializes every (left, right) candidate pair —
quadratic per hot key. The union approach tags both sides, sorts each
key's rows once by time, and carries the latest right-side values
forward with ``last(..., ignorenulls=True)`` over an unbounded-
preceding frame: exactly one hash exchange + one sort on the join key,
linear in input size — the same cost as Spark's own window operator,
and AQE-splittable per key range. Ties (right.t == left.t) order the
right row first, so the match is inclusive — identical to DuckDB/pandas
``merge_asof`` backward semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"  # 0 = right (sorts first on tie), 1 = left


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    value_cols: Sequence[str] | None = None,
    tolerance: int | None = None,
) -> DataFrame:
    """Backward as-of join: for each left row, the latest right row
    with ``right_time <= left_time`` on the same ``on`` key.

    ``value_cols``: right-side columns to attach (default: everything
    except the key and time columns). The matched right timestamp is
    attached as ``<right_time>_matched``. Unmatched left rows keep
    NULLs (left-outer semantics).

    ``tolerance``: optional maximum lag in the time column's own units
    (e.g. µs for a ``unix_micros`` long); matches older than
    ``left_time - tolerance`` are nulled out, like pandas
    ``merge_asof(tolerance=...)``.

    Determinism: if several right rows share ``(on, right_time)`` the
    carried row is the last of them in the sort — pre-aggregate the
    right side to one row per (key, time) when exact determinism is
    required (the declared query does).
    """
    on = list(on)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (*on, right_time)]
    matched_t = f"{right_time}_matched"

    r = right.select(
        *on,
        F.col(right_time).alias("__t"),
        F.lit(0).alias(_SIDE),
        F.col(right_time).alias(matched_t),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
        *[F.lit(None).alias(f"__l_{c}") for c in left.columns],
    )
    l = left.select(
        *on,
        F.col(left_time).alias("__t"),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(dict(right.dtypes)[right_time]).alias(matched_t),
        *[
            F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__v_{c}")
            for c in value_cols
        ],
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    w = (
        Window.partitionBy(*on)
        .orderBy("__t", _SIDE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l.unionByName(r).select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        F.col(_SIDE).alias("__side"),
        F.last(matched_t, ignorenulls=True).over(w).alias(matched_t),
        *[
            F.last(f"__v_{c}", ignorenulls=True).over(w).alias(c)
            for c in value_cols
        ],
    )
    out = carried.filter(F.col("__side") == 1).drop("__side")
    if tolerance is not None:
        lag_ok = F.col(matched_t) >= (F.col(left_time) - F.lit(tolerance))
        out = out.select(
            *left.columns,
            F.when(lag_ok, F.col(matched_t)).alias(matched_t),
            *[F.when(lag_ok, F.col(c)).alias(c) for c in value_cols],
        )
    return out
