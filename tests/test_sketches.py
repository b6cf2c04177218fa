"""Sketch twins of the exact-order-statistic family (operators/
sketches.py): accuracy pinned against the EXACT queries they
replace at scale, and plan shape pinned sort-free."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from ods_v3_dbt_spark.operators.sketches import (
    approx_equidepth_histogram,
    approx_quartile_assign,
    quantile_bounds,
    sliding_distinct_sketch,
)
from ods_v3_dbt_spark.plans.declared_queries import cents, load

SF = "/root/testdata/sf0.01"


def test_equidepth_buckets_near_uniform(spark):
    o = load(spark, SF, "orders").select(cents(F.col("o_totalprice")).alias("price_c"))
    hist = approx_equidepth_histogram(o, "price_c", num_buckets=8).collect()
    n = o.count()
    assert sorted(r.bucket for r in hist) == list(range(8))
    assert sum(r.n_rows for r in hist) == n  # every row lands somewhere
    for r in hist:
        assert abs(r.n_rows - n / 8) <= 0.05 * n  # equal-depth within 5%
    by_bucket = sorted(hist, key=lambda r: r.bucket)
    for a, b in zip(by_bucket, by_bucket[1:]):
        assert a.hi <= b.lo  # value ranges ordered and non-overlapping


def test_equidepth_bounded_rank_error_at_low_accuracy(spark):
    """The GK contract observable: accuracy=100 on 200k rows bounds
    bucket-population drift by ~n/accuracy per edge."""
    df = spark.range(200_000).select((F.col("id") * 37 % 100_000).alias("v"))
    hist = approx_equidepth_histogram(df, "v", num_buckets=4, accuracy=100).collect()
    n = 200_000
    for r in hist:
        assert abs(r.n_rows - n / 4) <= 3 * n / 100  # 3× rank-error slack


def test_quartile_assign_agrees_with_exact_ntile(spark):
    c = load(spark, SF, "customer").select(
        "c_custkey", cents(F.col("c_acctbal")).alias("bal_c")
    )
    w = Window.orderBy(F.col("bal_c"), F.col("c_custkey"))
    exact = {
        r.c_custkey: r.q
        for r in c.select("c_custkey", F.ntile(4).over(w).alias("q")).collect()
    }
    approx = {
        r.c_custkey: r.quartile
        for r in approx_quartile_assign(c, "bal_c").collect()
    }
    agree = sum(exact[k] == approx[k] for k in exact) / len(exact)
    assert agree >= 0.98, agree
    # disagreements are boundary-adjacent, never off by 2+
    assert all(abs(exact[k] - approx[k]) <= 1 for k in exact)


def test_sliding_distinct_sketch_tracks_exact_wau(spark):
    ev = load(spark, SF, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    approx = {
        r.window_start: r.approx_distinct
        for r in sliding_distinct_sketch(ev, [], "day", "user_id").collect()
    }
    exact_df = (
        ev.select(
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("k"),
            F.col("day"),
        )
        .withColumn("window_start", F.date_sub(F.col("day"), F.col("k")))
        .groupBy("window_start")
        .agg(F.countDistinct("user_id").alias("n"))
    )
    exact = {r.window_start: r.n for r in exact_df.collect()}
    assert set(approx) == set(exact)
    for wstart, n in exact.items():
        assert abs(approx[wstart] - n) <= max(2, 0.05 * n), (wstart, approx[wstart], n)


def test_sketch_plans_are_sort_free(spark):
    """The whole point: no Sort, no rank Window anywhere — the exact
    twins' single-partition sort is replaced by mergeable aggregates.
    (The 1-row reduce of the GK partials is the scalar-probe class —
    partial states cross that exchange, never data rows.)"""
    o = load(spark, SF, "orders").select(cents(F.col("o_totalprice")).alias("price_c"))
    bounds_plan = (
        o.agg(F.percentile_approx("price_c", F.array(F.lit(0.5)), 10_000).alias("q"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial_percentile_approx" in bounds_plan  # map-side combine
    hist_plan = (
        approx_equidepth_histogram(o, "price_c")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Sort " not in hist_plan and "Window" not in hist_plan
    ev = load(spark, SF, "events").select(F.to_date("ts").alias("day"), "user_id")
    wau_plan = (
        sliding_distinct_sketch(ev, [], "day", "user_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Sort " not in wau_plan and "Window" not in wau_plan
