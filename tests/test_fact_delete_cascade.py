"""fact_delete_cascade — M6 DELETE cascaded into the A4 datamarts as
ONE TableGroup transaction (the relational twin of corpus_takedown):
fact rows vanish, only affected days re-derive, untouched days carry
over, and fact/day/month flip together."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ods_v3_dbt_spark.operators.rollup import (
    fact_delete_cascade,
    rollup_day,
    rollup_month_from_day,
)
from ods_v3_dbt_spark.sinks import TableGroup

AGGS = lambda: {  # noqa: E731 — fresh Column objects per use
    "item_count": F.count(F.lit(1)),
    "value_c": F.sum(F.round(F.col("value") * 100).cast("bigint")),
}


def _fact(spark):
    # three days; day 20240103 belongs ENTIRELY to user 7 (the
    # all-vanished-day case)
    rows = [
        (1, "a", 20240101, 1.00),
        (1, "a", 20240101, 2.00),
        (2, "a", 20240101, 4.00),
        (2, "b", 20240102, 8.00),
        (3, "b", 20240102, 16.00),
        (7, "a", 20240103, 32.00),
        (7, "b", 20240103, 64.00),
    ]
    return spark.createDataFrame(
        rows, "user_id bigint, event_type string, day_id int, value double"
    )


def _seed(spark, tmp_path):
    group = TableGroup(tmp_path / "mart", ("fact", "day", "month"))
    fact = _fact(spark)
    day = rollup_day(fact, ["event_type"], "day_id", AGGS())
    group.commit(
        {"fact": fact, "day": day,
         "month": rollup_month_from_day(day, ["event_type"], "day_id")}
    )
    return group


def test_cascade_trio_consistent_and_carryover_exact(spark, tmp_path):
    group = _seed(spark, tmp_path)
    keys = spark.createDataFrame([(1,), (7,)], "user_id bigint")
    receipt = fact_delete_cascade(
        spark, group, keys, ["user_id"], ["event_type"], "day_id", AGGS()
    )
    assert receipt["n_days_affected"] == 2  # 20240101 and 20240103
    cur = group.read(spark)
    # fact: users 1 and 7 gone
    assert {r.user_id for r in cur["fact"].collect()} == {2, 3}
    # day: 20240101 re-derived (only user 2's 4.00), 20240102 carried
    # over untouched, 20240103 DISAPPEARED (all its rows vanished)
    day = {(r.event_type, r.day_id): (r.item_count, r.value_c)
           for r in cur["day"].collect()}
    assert day == {
        ("a", 20240101): (1, 400),
        ("b", 20240102): (2, 2400),
    }
    # month re-summed from the merged day table
    month = {(r.event_type, r.month_id): (r.item_count, r.value_c)
             for r in cur["month"].collect()}
    assert month == {("a", 202401): (1, 400), ("b", 202401): (2, 2400)}
    # the trio equals a from-scratch rollup of the reduced fact —
    # the carry-over+delta merge loses nothing vs full recompute
    full = rollup_day(cur["fact"], ["event_type"], "day_id", AGGS())
    assert {
        (r.event_type, r.day_id): (r.item_count, r.value_c)
        for r in full.collect()
    } == day
    # replay: nothing left to delete; state converges
    receipt2 = fact_delete_cascade(
        spark, group, keys, ["user_id"], ["event_type"], "day_id", AGGS()
    )
    assert receipt2["n_days_affected"] == 0
    again = group.read(spark)
    assert {
        (r.event_type, r.day_id): (r.item_count, r.value_c)
        for r in again["day"].collect()
    } == day


def test_cascade_requires_fact_day_month_group(spark, tmp_path):
    bad = TableGroup(tmp_path / "bad", ("day", "month"))
    with pytest.raises(ValueError, match="fact"):
        fact_delete_cascade(
            spark, bad,
            spark.createDataFrame([(1,)], "user_id bigint"),
            ["user_id"], ["event_type"], "day_id", AGGS(),
        )
