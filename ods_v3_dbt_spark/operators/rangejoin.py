"""Banded (binned) range joins: point-in-interval and interval-overlap.

The reference has no range/theta joins (SURVEY §2.5: equi-joins only —
"no theta/range/as-of joins"); this is engine-added surface for the
time-window enrichments a large-scale pipeline needs (join events to
maintenance/promo/validity windows, overlap reconciliation of two
interval sets).

Why not ``a JOIN b ON p >= lo AND p < hi`` directly: Spark compiles a
pure inequality join to BroadcastNestedLoopJoin (small side) or a
cartesian product — O(|A|·|B|) comparisons and, for the cartesian
case, a full replication shuffle. The banded rewrite turns it into an
**equi-join on a bucket id**:

* points land in exactly one bucket of width ``W``;
* each interval is replicated to the buckets it covers
  (``sequence(lo div W, (hi-1) div W)`` + explode);
* a hash equi-join on the bucket id (shuffle or broadcast — Catalyst's
  choice) followed by the residual range predicate gives exactly the
  range-join pairs, each produced once (the point's bucket is covered
  by the interval exactly once).

Cost: |A| + |B|·(len/W + 1) shuffled rows instead of |A|·|B|
comparisons. Pick ``W`` near the median interval length: replication
factor stays O(1) while each bucket pairs a point only with intervals
that could plausibly match. Skewed buckets (a hot hour) are split by
AQE skew-join handling like any other equi-join — which is the point:
once it IS an equi-join, every scale tool (AQE, broadcast, bucketing)
applies.

Domain: bucket ids use integer ``div``, which truncates toward zero —
identical to floor only for non-negative values. Use non-negative
domains (epoch µs, yyyymmdd ints) or shift first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(col: str, width: int) -> F.Column:
    return F.expr(f"`{col}` div {int(width)}")


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``lo <= point < hi`` (half-open, matching the engine's window
    convention). Returns points columns + intervals columns.

    ``how='inner'`` or ``'left'`` (left keeps unmatched points with
    null interval columns — implemented as inner + anti union so the
    banded rewrite still applies).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r}")
    iv = intervals.filter(F.col(lo_col) < F.col(hi_col))
    iv_rep = iv.withColumn(
        "__rj_b",
        F.explode(
            F.sequence(_bucket(lo_col, bucket_width), F.expr(f"(`{hi_col}` - 1) div {int(bucket_width)}"))
        ),
    )
    pts = points.withColumn("__rj_b", _bucket(point_col, bucket_width))
    residual = (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    matched = (
        pts.join(iv_rep, on="__rj_b", how="inner").filter(residual).drop("__rj_b")
    )
    if how == "inner":
        return matched
    # left: unmatched points via anti join on the same banded condition
    anti_cond = (
        (pts["__rj_b"] == iv_rep["__rj_b"])
        & (pts[point_col] >= iv_rep[lo_col])
        & (pts[point_col] < iv_rep[hi_col])
    )
    unmatched = pts.join(iv_rep, on=anti_cond, how="left_anti").drop("__rj_b")
    for c in intervals.columns:
        unmatched = unmatched.withColumn(c, F.lit(None).cast(dict(intervals.dtypes)[c]))
    return matched.unionByName(unmatched)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    llo: str,
    lhi: str,
    rlo: str,
    rhi: str,
    bucket_width: int,
) -> DataFrame:
    """Pairs of intervals with non-empty overlap:
    ``llo < rhi AND rlo < lhi`` (half-open on both sides).

    Both sides replicate to their covered buckets; a pair would match
    in every shared bucket, so it is emitted only in the bucket of the
    overlap's start ``max(llo, rlo) div W`` — one row per pair with NO
    distinct/dedup shuffle. (That bucket is covered by both intervals
    whenever the overlap is non-empty, so exactly one emission exists.)
    """
    lf = left.filter(F.col(llo) < F.col(lhi)).withColumn(
        "__rj_b",
        F.explode(
            F.sequence(_bucket(llo, bucket_width), F.expr(f"(`{lhi}` - 1) div {int(bucket_width)}"))
        ),
    )
    rf = right.filter(F.col(rlo) < F.col(rhi)).withColumn(
        "__rj_b",
        F.explode(
            F.sequence(_bucket(rlo, bucket_width), F.expr(f"(`{rhi}` - 1) div {int(bucket_width)}"))
        ),
    )
    overlap = (F.col(llo) < F.col(rhi)) & (F.col(rlo) < F.col(lhi))
    once = F.col("__rj_b") == F.greatest(
        _bucket(llo, bucket_width), _bucket(rlo, bucket_width)
    )
    return lf.join(rf, on="__rj_b", how="inner").filter(overlap & once).drop("__rj_b")
