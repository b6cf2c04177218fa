"""HLL-sketch distinct rollups: the re-aggregatable COUNT DISTINCT.
Exact distincts can't be maintained incrementally (a month ≠ sum of
its days); sketches form a monoid under union, so coarser grains
re-aggregate the tiny sketch table instead of re-scanning the fact."""

from __future__ import annotations

import pyspark.sql.functions as F

from ods_v3_dbt_spark.operators.rollup import (
    distinct_sketch_day,
    distinct_sketch_union,
)

SF = "/root/testdata/sf0.01"


def _events(spark):
    from ods_v3_dbt_spark.plans.declared_queries import load

    return load(spark, SF, "events").withColumn(
        "day_id", F.date_format("ts", "yyyyMMdd").cast("int")
    )


def test_union_of_days_equals_global_sketch(spark):
    """The monoid law, observably: merging 30 daily sketches must give
    the same estimate as sketching the whole fact in one pass."""
    ev = _events(spark)
    merged = distinct_sketch_union(
        distinct_sketch_day(ev, ["event_type"], "day_id", "user_id"),
        ["event_type"],
    )
    global_ = (
        ev.groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("s"))
        .select(
            "event_type",
            F.hll_sketch_estimate("s").cast("bigint").alias("approx_distinct"),
        )
    )
    m = {r["event_type"]: r["approx_distinct"] for r in merged.collect()}
    g = {r["event_type"]: r["approx_distinct"] for r in global_.collect()}
    assert m == g


def test_sketch_estimate_accuracy(spark):
    """lg_k=12 → ~1.6% relative error; assert 5% against exact over a
    200k-key synthetic (large enough to leave HLL sparse mode)."""
    df = spark.range(200_000).select(
        (F.col("id") % 10).alias("g"),
        F.col("id").alias("k"),
        (F.col("id") % 20).cast("int").alias("day_id"),
    )
    merged = distinct_sketch_union(
        distinct_sketch_day(df, ["g"], "day_id", "k"), ["g"]
    )
    exact = {r["g"]: r["n"] for r in
             df.groupBy("g").agg(F.countDistinct("k").alias("n")).collect()}
    for r in merged.collect():
        assert abs(r["approx_distinct"] - exact[r["g"]]) / exact[r["g"]] < 0.05


def test_sketch_agg_partials_combine_map_side(spark):
    """The day sketch must build with partial aggregation (map-side
    sketch merge) — what ships over the shuffle is sketches, not
    rows."""
    ev = _events(spark)
    day = distinct_sketch_day(ev, ["event_type"], "day_id", "user_id")
    plan = day._jdf.queryExecution().executedPlan().toString()
    assert "partial_hll_sketch_agg" in plan


def test_union_reaggregates_sketch_table_not_fact(spark):
    """Coarsening must touch only the day-sketch table: no events scan
    in the union plan once the day table is materialized."""
    ev = _events(spark)
    day = distinct_sketch_day(ev, ["event_type"], "day_id", "user_id")
    day.cache()
    try:
        day.count()
        merged = distinct_sketch_union(day, ["event_type"])
        plan = merged._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan
    finally:
        day.unpersist()
