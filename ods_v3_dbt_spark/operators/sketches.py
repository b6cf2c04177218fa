"""Sketch twins of the exact-order-statistic queries (round-2
verdict item 5 — "documents become code").

Three declared queries compute exact order statistics through
single-partition sorts — ``orders_equidepth_histogram`` and
``customer_balance_quartiles`` (global rank windows) and
``wau_sliding_distinct_users`` (exact sliding COUNT DISTINCT). Each
docstring promised a sketch-based 100 TB path; these are those
operators, with the exact queries kept as their test oracles:

* equi-depth buckets and quartile assignment via
  ``percentile_approx`` — Spark's Greenwald-Khanna quantile summary,
  a MERGEABLE aggregate (map-side partials, one 1-row reduce, no
  sort of any kind in the plan);
* sliding distinct users via HLL day-sketches unioned over the
  window offsets (``rollup.distinct_sketch_day``'s monoid pushed
  through the 7-day hop) — the per-day sketch table is tiny, so the
  window explode replicates sketches, never events.

Approximation contracts are pinned in tests/test_sketches.py:
bucket populations within a relative band of n/k, quartile labels
agreeing with exact ntile away from boundary ties, HLL estimates
within the lg_k error envelope of the exact distinct counts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantile_bounds(
    df: DataFrame,
    value_col: str,
    probabilities: Sequence[float],
    accuracy: int = 10_000,
) -> list:
    """The quantile boundary values at ``probabilities`` via ONE
    ``percentile_approx`` aggregate — a K-value driver result (the
    scalar-probe class), produced without sorting anything: GK
    summaries build per task and merge associatively, so the plan is
    scan → partial_percentile_approx → 1-row reduce. Rank error is
    bounded by n/accuracy."""
    row = df.agg(
        F.percentile_approx(
            F.col(value_col), F.array(*[F.lit(p) for p in probabilities]), accuracy
        ).alias("q")
    ).first()
    return list(row.q)


def _bucket_of(value: Column, bounds: list) -> Column:
    """0-based bucket index by comparing against the K−1 interior
    boundary literals — a CASE chain over a broadcast-free constant
    array, evaluated in the scan stage."""
    b: Column = F.lit(0)
    for i, edge in enumerate(bounds):
        b = F.when(value > F.lit(edge), F.lit(i + 1)).otherwise(b)
    return b


def approx_equidepth_histogram(
    df: DataFrame,
    value_col: str,
    num_buckets: int = 8,
    accuracy: int = 10_000,
) -> DataFrame:
    """Sketch twin of ``orders_equidepth_histogram``: bucket edges
    from the GK summary instead of a global row_number sort, then one
    hash aggregate for (n_rows, lo, hi) per bucket. Two fact scans,
    ZERO sorts, nothing single-partition — at 100 TB the exact
    version's rank window serializes on one task; this plan is
    embarrassingly parallel both passes. Rank error n/accuracy moves
    rows only between ADJACENT buckets (edges are still true values
    from the column's domain).
    """
    interior = [i / num_buckets for i in range(1, num_buckets)]
    bounds = quantile_bounds(df, value_col, interior, accuracy)
    v = F.col(value_col)
    return (
        df.withColumn("bucket", _bucket_of(v, bounds).cast("int"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(v).alias("lo"),
            F.max(v).alias("hi"),
        )
    )


def approx_quartile_assign(
    df: DataFrame,
    value_col: str,
    out_col: str = "quartile",
    accuracy: int = 10_000,
) -> DataFrame:
    """Sketch twin of ``customer_balance_quartiles``' ntile(4) (and
    the scale path for ``customer_rfm_segments``' three R/F/M
    windows): quartile labels 1-4 by comparison against the three GK
    boundaries — no rank window, no global sort, label evaluation in
    the scan stage. Differs from exact ntile only for rows whose
    value ties/straddles a boundary within the rank-error band (and
    ntile's own split of exact boundary ties is engine-arbitrary
    anyway — the reason the exact queries tiebreak on a unique id).
    """
    bounds = quantile_bounds(df, value_col, [0.25, 0.5, 0.75], accuracy)
    return df.withColumn(
        out_col, (_bucket_of(F.col(value_col), bounds) + 1).cast("int")
    )


def sliding_distinct_sketch(
    fact: DataFrame,
    group_cols: Sequence[str],
    day_col: str,
    key_col: str,
    window_days: int = 7,
    lg_k: int = 12,
) -> DataFrame:
    """Sketch twin of ``wau_sliding_distinct_users``: HLL day
    sketches (one shuffle of the FACT, to (group, day) —
    ``rollup.distinct_sketch_day``), then each day's sketch
    replicates into the ``window_days`` sliding windows covering it
    and a second ``hll_union_agg`` merges per window — the monoid
    that makes sliding distinct cheap: the explode×union runs over
    the tiny 4 KB-sketch table, while the exact query ships the
    partially-deduped (window, user) pair stream off every task.

    ``day_col`` must be a DATE column (window offsets are calendar
    days — yyyymmdd ints don't subtract across month boundaries).
    Output: (group_cols, window_start DATE, approx_distinct).
    """
    from .rollup import distinct_sketch_day

    day = distinct_sketch_day(fact, group_cols, day_col, key_col, lg_k=lg_k)
    windows = day.select(
        *group_cols,
        day_col,
        "key_sketch",
        F.explode(F.sequence(F.lit(0), F.lit(window_days - 1))).alias("k"),
    ).withColumn("window_start", F.date_sub(F.col(day_col), F.col("k")))
    return (
        windows.groupBy(*group_cols, "window_start")
        .agg(F.hll_union_agg("key_sketch").alias("merged"))
        .select(
            *group_cols,
            "window_start",
            F.hll_sketch_estimate("merged").cast("bigint").alias("approx_distinct"),
        )
    )
