"""Engine-layer tests: catalog, sources, sinks, model runner,
streaming merge, EtlJob, run log.

These cover the orchestration surface the oracle-parity suite can't
(file layout, snapshot swap, streaming checkpoints, replay
idempotency — the reference's backdate-DAG invariant, SURVEY §2.11).
"""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F

from ods_v3_dbt_spark.catalog import Catalog, TableSpec, fixture_catalog, to_spark_type
from ods_v3_dbt_spark.jobs import EtlJob, freshness_guarded_rollup, run_catalog, split_day_windows
from ods_v3_dbt_spark.models import Model, ModelGraph, ModelTest
from ods_v3_dbt_spark.runlog import RunLog
from ods_v3_dbt_spark.sinks import ParquetTable
from ods_v3_dbt_spark.sources.readers import (
    excel_rows_source,
    rest_source,
    window_predicate,
    windowed_extract_sql,
)
from ods_v3_dbt_spark.streaming.incremental import IncrementalStream

T0 = dt.datetime(2024, 9, 1)
T1 = dt.datetime(2024, 9, 2)


# ---------------------------------------------------------------------------
# catalog
# ---------------------------------------------------------------------------


def test_fixture_catalog_schemas():
    cat = fixture_catalog()
    assert len(cat) >= 12
    bccp = cat.get("bccp_item")
    st = bccp.struct_type()
    assert st["last_updated_time"].dataType.simpleString() == "timestamp"
    assert st["is_domestic"].dataType.simpleString() == "boolean"
    assert bccp.strategy == "merge_upsert_fresh" and bccp.tie_update is False
    khl = cat.get("khl_portal_billing_result")
    assert khl.tie_update is True
    s98 = cat.get("f_item_s98")
    assert s98.cursor_is_int_day()


def test_catalog_json_round_trip(tmp_path):
    params = {
        "item": {
            "des_schema_name": "ods_bccp",
            "des_table_name": "bccp_item",
            "columns": {"item_code": "string", "weight": "float64",
                        "last_updated_time": "datetime64[ns]"},
            "cursor_field": "last_updated_time",
            "key": ["item_code"],
            "strategy": "merge_upsert_fresh",
        }
    }
    p = tmp_path / "bccp.json"
    p.write_text(json.dumps(params))
    cat = Catalog.from_params_json(p)
    spec = cat.get("bccp_item")
    assert spec.qualified_name == "ods_bccp.bccp_item"
    assert spec.keys == ("item_code",)
    assert spec.struct_type()["weight"].dataType.simpleString() == "double"


def test_catalog_validation_errors():
    with pytest.raises(ValueError):
        TableSpec(name="x", schema_name="s", columns={"a": "string"}, keys=("b",))
    with pytest.raises(ValueError):
        TableSpec(name="x", schema_name="s", columns={"a": "string"}, strategy="nope")
    with pytest.raises(ValueError):
        to_spark_type("varchar(99)")


# ---------------------------------------------------------------------------
# sources
# ---------------------------------------------------------------------------


def test_windowed_extract_sql_dialects():
    cat = fixture_catalog()
    bccp = cat.get("bccp_item")
    mssql = windowed_extract_sql(bccp, T0, T1, "mssql")
    assert "CONVERT(DATETIME, '2024-09-01 00:00:00', 120)" in mssql
    assert ">=" in mssql and "< CONVERT" in mssql  # half-open
    khl = cat.get("khl_portal_billing_result")
    ora = windowed_extract_sql(khl, T0, T1, "oracle")
    assert "TO_DATE('2024-09-01 00:00:00', 'YYYY-MM-DD HH24:MI:SS')" in ora
    # S3: int yyyymmdd cursor compares day-ids
    s98 = cat.get("f_item_s98")
    intq = windowed_extract_sql(s98, T0, T1, "oracle")
    assert "tran_date_id >= 20240901 AND tran_date_id < 20240902" in intq
    # S5: no cursor → unbounded
    dim = cat.get("d_row_item")
    assert "WHERE" not in windowed_extract_sql(dim, T0, T1)
    # oracle-quoted: every identifier double-quoted + T-1 lower-bound-
    # only window (tms_to_ods.py:119-134)
    from ods_v3_dbt_spark.sources.readers import t_minus_window

    lo, hi = t_minus_window(dt.datetime(2024, 9, 2, 14, 30))
    assert lo == dt.datetime(2024, 9, 1) and hi is None
    oq = windowed_extract_sql(khl, lo, hi, "oracle-quoted",
                              src_schema="TMS", src_table="CONTRACT")
    assert 'FROM "TMS"."CONTRACT"' in oq
    assert f'"{khl.cursor_field}" >= TO_DATE(\'2024-09-01 00:00:00\'' in oq
    assert "<" not in oq.split("WHERE")[1]  # no upper bound
    for c in khl.columns:
        assert f'"{c}"' in oq


def test_window_predicate_halfopen(spark):
    spec = fixture_catalog().get("bccp_item")
    df = spark.createDataFrame(
        [("a", dt.datetime(2024, 8, 31, 23, 59, 59)),
         ("b", T0),                       # == start → in
         ("c", dt.datetime(2024, 9, 1, 12)),
         ("d", T1)],                      # == end → out
        "item_code string, last_updated_time timestamp",
    )
    got = sorted(
        r.item_code for r in df.filter(window_predicate(spec, T0, T1)).collect()
    )
    assert got == ["b", "c"]


def test_rest_source_rename_and_mask(spark):
    spec = fixture_catalog().get("hrm_unit")
    rows = [
        {"unitId": "u1", "parentId": None, "levelId": 2, "unitCode": "U1",
         "unitName": "Unit 1", "provinceCode": "01",
         "createdDate": T0, "updatedDate": T0, "status": "A"},
        {"unitId": "u2", "levelId": 3, "unitCode": "U2", "unitName": "Unit 2",
         "provinceCode": "02", "createdDate": T0, "updatedDate": T1, "status": "A"},
    ]
    df = rest_source(spark, rows, spec, mask_cols=["province_code"])
    assert df.columns == list(spec.columns)
    out = {r.unit_id: r for r in df.collect()}
    assert out["u2"].unit_name == "Unit 2"
    assert out["u1"].province_code is None and out["u2"].province_code is None


def test_excel_rows_coercions(spark):
    spec = fixture_catalog().get("item_delivery_detail")
    header = [list(spec.columns)[:-1]]  # header row (no etl_date)
    rows = header + [
        ["L1", "P1", "PM1", "S", "1.5", "7", "100", "20240901", "10.1", "106.2"],
        ["L2", "P1", "PM1", "S", "2.0", "99999999999", "", "20240901", "", "nan"],  # int32 overflow + empty
        [None, "P2", "PM2", "S", "1.0", "3", "5", "20240902", "10.0", "106.0"],     # null key → dropped
        ["L3", "P2", "PM2", "S", "NULL", "nan", "None", "20240902", "x", "y"],      # markers → NULL
        ["junk-footer", None, None, None, None, None, None, None, None, None],
    ]
    df = excel_rows_source(
        spark, rows, spec, header_rows=1, end_skip=1,
        drop_null_cols=["lading_code"], etl_date=T0,
    )
    got = {r.lading_code: r for r in df.collect()}
    assert set(got) == {"L1", "L2", "L3"}
    assert got["L1"].quantity == 7 and got["L1"].status_date == 20240901
    assert got["L2"].quantity is None          # out-of-int32 → NULL
    assert got["L2"].so_tien_thu_ho is None    # "" → NULL
    assert got["L3"].weight is None            # "NULL" marker
    assert got["L1"].etl_date == T0


# ---------------------------------------------------------------------------
# sinks
# ---------------------------------------------------------------------------


def test_parquet_table_snapshot_swap(spark, tmp_path):
    tbl = ParquetTable(tmp_path / "t")
    assert not tbl.exists()
    df1 = spark.range(5).withColumnRenamed("id", "k")
    tbl.write(df1)
    assert tbl.read(spark).count() == 5
    tbl.write(spark.range(3).withColumnRenamed("id", "k"))
    assert tbl.read(spark).count() == 3         # pointer flipped
    assert len(list((tmp_path / "t").glob("snap-*"))) == 2  # old snapshot kept
    removed = tbl.vacuum(keep=1)
    assert len(removed) == 1
    assert tbl.read(spark).count() == 3         # current untouched


def test_parquet_table_partitioned(spark, tmp_path):
    tbl = ParquetTable(tmp_path / "p", partition_cols=("day",))
    df = spark.createDataFrame([(1, 20240901), (2, 20240902)], "v int, day int")
    snap = tbl.write(df)
    days = {p.name for p in snap.glob("day=*")}
    assert days == {"day=20240901", "day=20240902"}


# ---------------------------------------------------------------------------
# model runner
# ---------------------------------------------------------------------------


def _orders_df(spark, n):
    return spark.createDataFrame(
        [(i, f"c{i % 3}", float(i), dt.datetime(2024, 9, 1 + i % 3)) for i in range(n)],
        "order_id long, customer string, amount double, updated_at timestamp",
    )


def test_model_graph_view_table_incremental(spark, tmp_path):
    g = ModelGraph(tmp_path / "wh")
    src_holder = {"df": _orders_df(spark, 6)}
    g.add(Model(
        name="stg_orders",
        fn=lambda s: src_holder["df"].filter(F.col("order_id").isNotNull()),
        materialized="view",
        tests=[ModelTest("not_null", column="order_id", severity="error")],
    ))
    g.add(Model(
        name="mart_orders",
        fn=lambda s, stg_orders: stg_orders,
        materialized="incremental",
        refs=["stg_orders"],
        unique_key="order_id",
        watermark_col="updated_at",
        tests=[ModelTest("unique", column="order_id", severity="error"),
               ModelTest("expression", expression="count(*) > 0", severity="warn")],
    ))
    results = g.run(spark)
    assert all(r.passed for r in results)
    assert g.table("mart_orders").read(spark).count() == 6

    # incremental: feed 3 new + 6 old rows; watermark keeps only newer,
    # unique-key merge dedups — dbt's is_incremental() contract
    newer = spark.createDataFrame(
        [(100, "c9", 1.0, dt.datetime(2024, 9, 9)), (5, "c9", 99.0, dt.datetime(2024, 9, 9))],
        "order_id long, customer string, amount double, updated_at timestamp",
    )
    src_holder["df"] = _orders_df(spark, 6).unionByName(newer)
    g.run(spark)
    mart = g.table("mart_orders").read(spark)
    assert mart.count() == 7                      # 6 + 1 new key
    assert mart.filter("order_id = 5").head().amount == 99.0  # updated row


def test_model_test_failure_raises(spark, tmp_path):
    g = ModelGraph(tmp_path / "wh")
    g.add(Model(
        name="bad",
        fn=lambda s: spark.createDataFrame([(None,), (1,)], "k int"),
        materialized="table",
        tests=[ModelTest("not_null", column="k", severity="error")],
    ))
    with pytest.raises(AssertionError):
        g.run(spark)


# ---------------------------------------------------------------------------
# streaming foreachBatch merge
# ---------------------------------------------------------------------------


def test_incremental_stream_fresh_merge_and_replay(spark, tmp_path):
    spec = fixture_catalog().get("khl_portal_billing_result")
    landing = tmp_path / "landing"
    target = ParquetTable(tmp_path / "target")

    def batch(rows):
        return spark.createDataFrame(rows, spec.struct_type())

    r1 = [("1", "bg1", "SVC", 1.0, 0.1, 0.0, 0.0, 0.08, T0),
          ("2", "bg2", "SVC", 2.0, 0.2, 0.0, 0.0, 0.08, T0)]
    batch(r1).write.mode("append").parquet(str(landing))
    stream = IncrementalStream(
        spark, spec, landing, target, tmp_path / "ckpt", max_files_per_trigger=10
    )
    stream.run_once()
    assert target.read(spark).count() == 2

    # batch 2: id=1 updated (newer), id=2 stale (older) → gate drops it
    r2 = [("1", "bg1", "SVC", 9.0, 0.9, 0.0, 0.0, 0.08, T1),
          ("2", "bg2", "SVC", 0.0, 0.0, 0.0, 0.0, 0.08, dt.datetime(2024, 8, 1))]
    batch(r2).write.mode("append").parquet(str(landing))
    stream.run_once()
    got = {r.id: r for r in target.read(spark).collect()}
    assert got["1"].fee_public == 9.0          # updated
    assert got["2"].fee_public == 2.0          # stale dropped
    # replay the same landing data through a fresh checkpoint (backdate
    # DAG semantics, O8) → idempotent
    stream2 = IncrementalStream(spark, spec, landing, target, tmp_path / "ckpt2")
    stream2.run_once()
    got2 = {r.id: r for r in target.read(spark).collect()}
    assert len(got2) == 2 and got2["1"].fee_public == 9.0 and got2["2"].fee_public == 2.0


# ---------------------------------------------------------------------------
# EtlJob end-to-end + run log + rollup guard
# ---------------------------------------------------------------------------


def test_etl_job_windowed_sync_and_replay(spark, tmp_path):
    spec = fixture_catalog().get("bccp_item")
    src_path = tmp_path / "src"
    wh = tmp_path / "wh"

    def row(code, ts, status):
        return (code, "POS1", "name", True, 1.0, 10.0, status,
                T0, T0, ts)

    spark.createDataFrame(
        [row("A", dt.datetime(2024, 9, 1, 5), "new"),
         row("B", dt.datetime(2024, 9, 1, 6), "new"),
         row("A", dt.datetime(2024, 9, 2, 5), "upd")],   # next-day update
        spec.struct_type(),
    ).write.parquet(str(src_path))

    log = RunLog(tmp_path / "runlog")
    job = EtlJob(spark, spec, wh, source_path=str(src_path), run_log=log)
    res1 = job.run(window=(T0, T1))
    assert res1.rows_extracted == 2 and res1.rows_loaded == 2
    res2 = job.run(window=(T1, dt.datetime(2024, 9, 3)))
    assert res2.rows_loaded == 2
    got = {r.item_code: r.status for r in job.target().read(spark).collect()}
    assert got == {"A": "upd", "B": "new"}
    # O8 replay of window 1: stale rows, freshness gate → no-op
    job.run(window=(T0, T1))
    got2 = {r.item_code: r.status for r in job.target().read(spark).collect()}
    assert got2 == {"A": "upd", "B": "new"}
    # run log captured all three runs
    entries = log.read(spark).collect()
    assert len(entries) == 3 and all(e.is_success for e in entries)


def test_etl_job_bucketed_target(spark, tmp_path):
    """EtlJob(bucketed=True) — round-2 verdict item 8: the M1 merge
    path runs end-to-end against a catalog-bucketed target. Same
    sync/replay contract as the path-based job, and the merge's
    anti-join scans the fact bucket-aligned: with broadcast off, the
    only Exchange in the join plan belongs to the staging slice."""
    spec = fixture_catalog().get("d_row_item")
    src1, src2, wh = tmp_path / "s1", tmp_path / "s2", tmp_path / "whb"

    def row(code, name):
        return (code, name, "g1", 1.0, "active")

    spark.createDataFrame(
        [row("R1", "one"), row("R2", "two")], spec.struct_type()
    ).write.parquet(str(src1))
    spark.createDataFrame(
        [row("R2", "two-updated"), row("R3", "three")], spec.struct_type()
    ).write.parquet(str(src2))

    job = EtlJob(spark, spec, wh, source_path=str(src1), bucketed=True, num_buckets=4)
    bt = job.target()
    try:
        res1 = job.run()
        assert res1.rows_extracted == 2 and res1.rows_loaded == 2
        job.source_path = str(src2)
        res2 = job.run()
        assert res2.rows_loaded == 3  # upsert: R2 updated, R3 inserted
        got = {r.row_item_code: r.row_item_name for r in bt.read(spark).collect()}
        assert got == {"R1": "one", "R2": "two-updated", "R3": "three"}
        # replay the same slice: upsert idempotent
        job.run()
        assert job.target().read(spark).count() == 3

        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        old_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        try:
            from ods_v3_dbt_spark.operators.merge import merge_upsert

            stg = spark.read.parquet(str(src2))
            merged = merge_upsert(bt.read(spark), stg, list(spec.keys))
            merged.write.format("noop").mode("overwrite").save()
            plan = merged._jdf.queryExecution().executedPlan().toString()
            assert "Bucketed: true" in plan
            assert plan.count("Exchange") == 1  # staging side only
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
            if old_aqe is not None:
                spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe)
            else:
                spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {bt.name}")
        spark.sql(f"DROP TABLE IF EXISTS {bt.name}__snap")


def test_run_catalog_isolates_failures(spark, tmp_path):
    """O5 fan-out + O12 failure accumulation: a table whose extract
    violates its declared schema fails ALONE; the healthy table still
    syncs, and the result list reports both."""
    spec = fixture_catalog().get("bccp_item")
    good_src, bad_src, wh = tmp_path / "good", tmp_path / "bad", tmp_path / "wh"

    def row(code, ts, status):
        return (code, "POS1", "name", True, 1.0, 10.0, status, T0, T0, ts)

    spark.createDataFrame(
        [row("A", dt.datetime(2024, 9, 1, 5), "new")], spec.struct_type()
    ).write.parquet(str(good_src))
    # schema drift: missing columns entirely
    spark.createDataFrame([(1, "x")], "a int, b string").write.parquet(str(bad_src))

    jobs = [
        EtlJob(spark, spec, wh, source_path=str(good_src)),
        EtlJob(spark, spec, wh / "other", source_path=str(bad_src)),
    ]
    results = run_catalog(jobs, window=(T0, T1), attempts=2)
    assert [r.success for r in results] == [True, False]
    assert results[0].rows_loaded == 1
    assert results[1].rows_extracted == 0


def test_split_day_windows():
    wins = split_day_windows(dt.date(2024, 9, 1), 2)
    assert wins[0] == (T0, dt.datetime(2024, 9, 1, 12))
    assert wins[1] == (dt.datetime(2024, 9, 1, 12), T1)


def test_freshness_guarded_rollup(spark, tmp_path):
    fact_t = ParquetTable(tmp_path / "fact")
    day_t = ParquetTable(tmp_path / "day")
    month_t = ParquetTable(tmp_path / "month")
    fact_t.write(spark.createDataFrame(
        [("P1", 20240901, 1.0), ("P1", 20240901, 2.0), ("P1", 20241001, 5.0)],
        "pos_code string, status_date int, weight double",
    ))
    measures = {"item_count": F.count(F.lit(1)), "total_weight": F.sum("weight")}
    ran = freshness_guarded_rollup(
        spark, fact_t, day_t, month_t, ["pos_code"], "status_date", measures
    )
    assert ran
    day = {(r.pos_code, r.status_date): r for r in day_t.read(spark).collect()}
    assert day[("P1", 20240901)].item_count == 2
    assert day[("P1", 20240901)].total_weight == 3.0
    month = {(r.pos_code, r.month_id): r for r in month_t.read(spark).collect()}
    assert month[("P1", 202409)].total_weight == 3.0
    assert month[("P1", 202410)].total_weight == 5.0
    # second call: fact unchanged → guard skips
    assert not freshness_guarded_rollup(
        spark, fact_t, day_t, month_t, ["pos_code"], "status_date", measures
    )


def test_salted_agg_matches_plain(spark):
    from ods_v3_dbt_spark.operators.skew import salted_agg

    # one hot key (90% of rows) + a long tail — the shape salting targets
    df = spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, F.lit("HOT")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 37).cast("string"))
        ).alias("k"),
        (F.col("id") * 3 % 101).alias("v"),
        F.col("id"),
    )
    got = salted_agg(
        df,
        ["k"],
        {"n": F.count(F.lit(1)), "s": F.sum("v"), "mx": F.max("v")},
        {"n": F.sum("n"), "s": F.sum("s"), "mx": F.max("mx")},
        num_salts=8,
        salt_col="id",
    )
    want = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"), F.max("v").alias("mx")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # default final_aggs (sum of partials) is correct for sum/count
    got2 = salted_agg(df, ["k"], {"n": F.count(F.lit(1)), "s": F.sum("v")}, num_salts=8)
    want2 = want.select("k", "n", "s")
    assert sorted(map(tuple, got2.collect())) == sorted(map(tuple, want2.collect()))


def test_salted_join_matches_plain(spark):
    import pytest
    from ods_v3_dbt_spark.operators.skew import salted_join

    big = spark.range(3000).select(
        F.when(F.col("id") % 5 < 4, F.lit(0)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(40).select(
        F.col("id").alias("k"), F.concat(F.lit("dim"), F.col("id")).alias("attr")
    )
    for how in ("inner", "left"):
        got = salted_join(big, small, ["k"], how=how, num_salts=4)
        want = big.join(small, ["k"], how)
        assert sorted(got.columns) == sorted(want.columns)
        cols = sorted(want.columns)
        assert sorted(map(tuple, got.select(cols).collect()), key=repr) == sorted(
            map(tuple, want.select(cols).collect()), key=repr
        )
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(big, small, ["k"], how="full")


def test_bucketed_table_merge_roundtrip(spark, tmp_path):
    """BucketedTable: merge staging into a bucketed fact; correctness +
    the bucketed scan carries no Exchange (only staging shuffles)."""
    from ods_v3_dbt_spark.operators.merge import merge_upsert
    from ods_v3_dbt_spark.sinks import BucketedTable

    bt = BucketedTable("t_bucketed_fact", ["k"], num_buckets=4)
    tgt = spark.createDataFrame(
        [(i, f"old{i}") for i in range(1000)], "k long, v string"
    )
    bt.write(tgt)
    try:
        stg = spark.createDataFrame(
            [(5, "new5"), (2000, "new2000")], "k long, v string"
        )
        merged = merge_upsert(bt.read(spark), stg, ["k"])
        rows = {r.k: r.v for r in merged.collect()}
        assert rows[5] == "new5" and rows[2000] == "new2000" and rows[7] == "old7"
        assert len(rows) == 1001

        # plan audit: with broadcast off, the bucketed side must scan
        # Bucketed: true with no Exchange above it
        def _get(k):
            try:
                return spark.conf.get(k)
            except Exception:
                return None

        def _restore(k, v):
            spark.conf.set(k, v) if v is not None else spark.conf.unset(k)

        old = _get("spark.sql.autoBroadcastJoinThreshold")
        old_aqe = _get("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        try:
            j = bt.read(spark).join(stg, "k")
            j.write.format("noop").mode("overwrite").save()
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "Bucketed: true" in plan
            assert plan.count("Exchange") == 1  # staging side only
        finally:
            _restore("spark.sql.autoBroadcastJoinThreshold", old)
            _restore("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe)

        # groupBy on the bucket key: exchange-free
        g = bt.read(spark).groupBy("k").count()
        gplan = g._jdf.queryExecution().executedPlan().toString()
        assert gplan.count("Exchange") == 0

        # write-back keeps one file per bucket (no small-file fanout)
        bt.write(merged.select("k", "v"))
        assert bt.read(spark).count() == 1001
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bucketed_fact")


def test_asof_join_semantics(spark):
    from ods_v3_dbt_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 50, "b"), (1, 10, "c"), (2, 100, "d")],
        "k long, t long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 50, 5.0), (1, 90, 9.0), (3, 1, 1.0)], "k long, rt long, val double"
    )
    out = {
        r.tag: (r.rt_matched, r.val)
        for r in asof_join(left, right, ["k"], "t", "rt", ["val"]).collect()
    }
    assert out["a"] == (90, 9.0)   # latest <= 100
    assert out["b"] == (50, 5.0)   # tie at 50 is inclusive
    assert out["c"] == (None, None)  # nothing at or before 10
    assert out["d"] == (None, None)  # key 2 has no right rows

    # tolerance: match older than t - 20 is nulled
    tol = {
        r.tag: (r.rt_matched, r.val)
        for r in asof_join(
            left, right, ["k"], "t", "rt", ["val"], tolerance=20
        ).collect()
    }
    assert tol["a"] == (90, 9.0)     # lag 10 <= 20
    assert tol["b"] == (50, 5.0)     # lag 0
    assert tol["c"] == (None, None)


def test_asof_join_single_shuffle(spark):
    """The union+window as-of plan must shuffle exactly once (hash on
    the key) — no range-join pair explosion, no extra exchanges."""
    from ods_v3_dbt_spark.operators.asof import asof_join

    left = spark.range(1000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("t")
    )
    right = spark.range(100).select(
        (F.col("id") % 7).alias("k"), (F.col("id") * 9).alias("rt"),
        F.col("id").alias("val"),
    )
    plan = (
        asof_join(left, right, ["k"], "t", "rt", ["val"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1


def test_parquet_table_compact(spark, tmp_path):
    from ods_v3_dbt_spark.sinks import ParquetTable

    t = ParquetTable(tmp_path / "frag")
    df = spark.range(10000).select(F.col("id"), (F.col("id") % 9).alias("v"))
    t.write(df.repartition(32))  # fragment: 32 tiny files
    n_before, _ = t.file_stats()
    assert n_before >= 32
    before_rows = sorted(r.id for r in t.read(spark).collect())
    nb, na = t.compact(spark)
    assert nb == n_before and na == 1  # 10k rows << 128MB → one file
    assert sorted(r.id for r in t.read(spark).collect()) == before_rows

    # partitioned: compaction keeps the partition layout, 1 file/dir
    p = ParquetTable(tmp_path / "fragp", partition_cols=["v"])
    p.write(df.repartition(16))
    p_before, _ = p.file_stats()
    assert p_before > 9
    nb, na = p.compact(spark)
    assert na == 9  # one file per partition value
    assert p.read(spark).count() == 10000


def test_column_profile_nulls_and_approx(spark):
    from ods_v3_dbt_spark.quality import column_profile

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b"), (4, "a"), (None, "c")],
        "x long, s string",
    )
    prof = {r.col_name: r for r in column_profile(df, ["x", "s"]).collect()}
    assert prof["x"].n_rows == 5 and prof["x"].n_null == 1
    assert prof["x"].n_distinct == 4
    assert (prof["x"].min_val, prof["x"].max_val) == ("1", "4")  # typed, not lexical
    assert prof["s"].n_null == 1 and prof["s"].n_distinct == 3

    # approx path: single-pass plan (no Expand), HLL close on tiny input
    ap = {r.col_name: r for r in column_profile(df, ["x", "s"], approx=True).collect()}
    assert ap["x"].n_distinct == 4
    plan = (
        column_profile(df, ["x", "s"], approx=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" not in plan
    exact_plan = (
        column_profile(df, ["x", "s"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" in exact_plan  # documents why approx exists


def test_sessionize_semantics(spark):
    from ods_v3_dbt_spark.operators.sessionize import session_stats, sessionize

    df = spark.createDataFrame(
        [(1, 0), (1, 100), (1, 1000), (1, 1050), (2, 0)], "k long, t long"
    )
    s = {
        (r.k, r.t): r.session_idx
        for r in sessionize(df, ["k"], "t", gap=500).collect()
    }
    assert s[(1, 0)] == 0 and s[(1, 100)] == 0      # within gap
    assert s[(1, 1000)] == 1 and s[(1, 1050)] == 1  # split at 900 > 500
    assert s[(2, 0)] == 0                            # per-key restart

    stats = {
        (r.k, r.session_idx): r
        for r in session_stats(df, ["k"], "t", gap=500).collect()
    }
    assert stats[(1, 0)].n_events == 2 and stats[(1, 0)].duration == 100
    assert stats[(1, 1)].session_start == 1000 and stats[(1, 1)].session_end == 1050

    # plan: both windows collapse into ONE exchange+sort on the key
    plan = (
        sessionize(df, ["k"], "t", gap=500)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1


def test_rangejoin_semantics(spark):
    """Banded range joins vs brute-force cross+filter on data chosen to
    cross bucket boundaries; half-open [lo, hi) boundaries exact."""
    from ods_v3_dbt_spark.operators.rangejoin import (
        interval_overlap_join,
        point_in_interval_join,
    )

    pts = [(i, 7 * i % 100) for i in range(30)]
    ivs = [(100 + j, (13 * j) % 90, (13 * j) % 90 + (j % 25)) for j in range(20)]
    p = spark.createDataFrame(pts, "pid long, t long")
    iv = spark.createDataFrame(ivs, "ivid long, lo long, hi long")

    got = {
        (r.pid, r.ivid)
        for r in point_in_interval_join(p, iv, "t", "lo", "hi", 8).collect()
    }
    want = {
        (pid, ivid)
        for pid, t in pts
        for ivid, lo, hi in ivs
        if lo <= t < hi
    }
    assert got == want  # includes lo-inclusive/hi-exclusive boundaries

    left = point_in_interval_join(p, iv, "t", "lo", "hi", 8, how="left").collect()
    matched_pids = {pid for pid, _ in want}
    assert {(r.pid, r.ivid) for r in left if r.ivid is not None} == want
    assert {r.pid for r in left if r.ivid is None} == {
        pid for pid, _ in pts if pid not in matched_pids
    }

    # overlap join: exactly-once emission, no dedup needed
    a = spark.createDataFrame(
        [(1, 0, 50), (2, 40, 60), (3, 90, 91), (4, 5, 5)], "aid long, alo long, ahi long"
    )
    b = spark.createDataFrame(
        [(10, 45, 95), (20, 0, 3), (30, 50, 55)], "bid long, blo long, bhi long"
    )
    rows = interval_overlap_join(a, b, "alo", "ahi", "blo", "bhi", 16).collect()
    pairs = [(r.aid, r.bid) for r in rows]
    assert sorted(pairs) == sorted(set(pairs))  # no duplicate emissions
    want_pairs = {
        (aid, bid)
        for aid, alo, ahi in [(1, 0, 50), (2, 40, 60), (3, 90, 91), (4, 5, 5)]
        for bid, blo, bhi in [(10, 45, 95), (20, 0, 3), (30, 50, 55)]
        if alo < ahi and blo < bhi and alo < bhi and blo < ahi
    }
    assert set(pairs) == want_pairs


def test_csv_json_landing_sources(spark, tmp_path):
    """Landing reads enforce the DECLARED catalog schema (no inference
    pass): FAILFAST raises on a malformed row, PERMISSIVE quarantines
    it in _corrupt_record with the other rows intact."""
    from py4j.protocol import Py4JJavaError

    from ods_v3_dbt_spark.sources.readers import (
        csv_landing_source,
        json_landing_source,
    )

    spec = TableSpec(
        name="t", schema_name="staging",
        columns={"id": "Int64", "amount": "float64", "label": "string"},
    )
    csv_dir = tmp_path / "csv"
    csv_dir.mkdir()
    (csv_dir / "b1.csv").write_text("id,amount,label\n1,1.5,a\n2,2.5,b\n")
    (csv_dir / "b2.csv").write_text("id,amount,label\nNOTANINT,9.9,c\n")

    ok = csv_landing_source(spark, str(csv_dir), spec, mode="PERMISSIVE")
    rows = ok.collect()
    good = {r.id: (r.amount, r.label) for r in rows if r._corrupt_record is None}
    bad = [r for r in rows if r._corrupt_record is not None]
    assert good == {1: (1.5, "a"), 2: (2.5, "b")}
    assert len(bad) == 1 and "NOTANINT" in bad[0]._corrupt_record

    with pytest.raises(Py4JJavaError):
        csv_landing_source(spark, str(csv_dir), spec, mode="FAILFAST").collect()

    j_dir = tmp_path / "json"
    j_dir.mkdir()
    (j_dir / "b1.json").write_text(
        '{"id": 1, "amount": 1.5, "label": "a"}\n{"id": "x", "amount": "y"}\n'
    )
    jrows = json_landing_source(spark, str(j_dir), spec, mode="PERMISSIVE").collect()
    assert {r.id for r in jrows if r._corrupt_record is None} == {1}
    assert sum(r._corrupt_record is not None for r in jrows) == 1


def test_orc_landing_source_roundtrip(spark, tmp_path):
    """ORC landing read imposes the declared schema (columnar twin of
    the CSV/JSON landing contract) and prunes columns at the scan."""
    from ods_v3_dbt_spark.sources.readers import orc_landing_source

    spec = TableSpec(
        name="t", schema_name="staging",
        columns={"id": "Int64", "amount": "float64", "label": "string"},
    )
    orc_dir = str(tmp_path / "orc")
    spark.createDataFrame(
        [(1, 1.5, "a"), (2, 2.5, "b")], schema=spec.struct_type()
    ).write.orc(orc_dir)

    df = orc_landing_source(spark, orc_dir, spec)
    assert df.schema == spec.struct_type()
    assert {(r.id, r.amount, r.label) for r in df.collect()} == {
        (1, 1.5, "a"), (2, 2.5, "b")
    }
    plan = df.select("id")._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<id:bigint>" in plan


def test_apply_cdc_semantics_and_replay(spark):
    """apply_cdc: max-seq wins, winning delete drops the key, insert
    lands, base survives untouched keys — and re-applying the same
    changelog to the applied snapshot is a no-op (idempotent replay,
    the backdate-DAG property)."""
    from ods_v3_dbt_spark.operators.merge import apply_cdc

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, val string"
    )
    changes = spark.createDataFrame(
        [
            (2, "b1", 1, "U"), (2, "b2", 2, "U"),   # second-gen update wins
            (3, "c", 1, "D"),                        # delete
            (4, "d", 1, "I"),                        # insert
        ],
        "k long, val string, seq int, op string",
    )
    out = apply_cdc(base, changes, ["k"], "seq")
    got = {(r.k, r.val) for r in out.collect()}
    assert got == {(1, "a"), (2, "b2"), (4, "d")}

    replay = apply_cdc(out, changes, ["k"], "seq")
    assert {(r.k, r.val) for r in replay.collect()} == got


def test_scd2_collapses_runs_and_intervalizes(spark):
    from ods_v3_dbt_spark.operators.merge import scd2_from_changes

    feed = spark.createDataFrame(
        [
            (1, "x", 10, 100), (1, "x", 20, 101), (1, "y", 30, 102),
            (1, "x", 40, 103), (2, "z", 10, 104),
        ],
        "k long, attr string, ts long, eid long",
    )
    out = scd2_from_changes(feed, ["k"], ["attr"], "ts", tiebreak_cols=["eid"])
    got = {(r.k, r.attr, r.valid_from, r.valid_to) for r in out.collect()}
    assert got == {
        (1, "x", 10, 30), (1, "y", 30, 40), (1, "x", 40, None), (2, "z", 10, None)
    }


def test_parquet_table_time_travel(spark, tmp_path):
    """Snapshot-swap tables retain prior versions until vacuum:
    history() lists them newest-first and read_snapshot() reads any
    retained version while current() serves the latest."""
    from ods_v3_dbt_spark.sinks import ParquetTable

    t = ParquetTable(tmp_path / "t")
    t.write(spark.createDataFrame([(1, "v1")], "k long, v string"))
    t.write(spark.createDataFrame([(1, "v2"), (2, "v2")], "k long, v string"))

    assert len(t.history()) == 2
    assert t.read(spark).count() == 2
    old = t.read_snapshot(spark, 1)
    assert [(r.k, r.v) for r in old.collect()] == [(1, "v1")]
    assert t.read_snapshot(spark, t.history()[0].name).count() == 2

    t.vacuum(keep=1)
    assert len(t.history()) == 1
    assert t.read(spark).count() == 2


def test_parquet_table_writer_lock_two_writers(spark, tmp_path):
    """Two-writer safety (round-4 task 5): while one writer holds the
    table lock, a second write fails fast with ConcurrentWriteError
    (one wins) and succeeds cleanly on retry after the winner
    commits; a stale lock from a crashed writer is stolen. The
    reference relies on Postgres transactions for this
    (dags/bccp_dag.py runs max_active_runs=2 overlapping syncs);
    snapshot-swap plus the lock file is the plain-parquet analog —
    Delta's transaction log is the production-grade swap-in (README).
    """
    import os
    import time

    import pytest

    from ods_v3_dbt_spark.sinks import (
        ConcurrentWriteError,
        LOCK_MARKER,
        ParquetTable,
        _writer_lock,
    )

    t = ParquetTable(tmp_path / "t")
    df1 = spark.createDataFrame([(1, "a")], "k int, v string")
    df2 = spark.createDataFrame([(2, "b")], "k int, v string")
    t.write(df1)  # lock acquired and released around the commit
    assert not (t.root / LOCK_MARKER).exists()

    # writer A holds the lock mid-commit → writer B must NOT corrupt
    # the table; it errors and retries after A releases
    with _writer_lock(t.root):
        with pytest.raises(ConcurrentWriteError):
            t.write(df2)
        # loser left no pointer/partial state behind the winner's back
        assert {r.k for r in t.read(spark).collect()} == {1}
    t.write(df2)  # retry after release succeeds
    assert {r.k for r in t.read(spark).collect()} == {2}

    # crashed-writer lock (old mtime) is stolen, write proceeds
    lock = t.root / LOCK_MARKER
    lock.write_text("dead-writer 0")
    old = time.time() - 7200
    os.utime(lock, (old, old))
    t.write(df1)
    assert {r.k for r in t.read(spark).collect()} == {1}
    assert not lock.exists() or lock.read_text() != "dead-writer 0"


def test_writer_lock_heartbeat_prevents_live_eviction(tmp_path):
    """Round-5 verdict task 3a: a LIVE writer whose hold exceeds
    stale_after_s is NOT evicted — the mtime heartbeat (refreshed at
    stale_after_s/4, ownership-verified) keeps the lock looking
    fresh, so a contender sees a held (not stale) lock and fails
    fast instead of stealing."""
    import time

    import pytest

    from ods_v3_dbt_spark.sinks import ConcurrentWriteError, _writer_lock

    root = tmp_path / "t"
    with _writer_lock(root, stale_after_s=0.4) as lk:
        time.sleep(1.2)  # 3× the TTL: pre-heartbeat this was stale
        with pytest.raises(ConcurrentWriteError, match="held"):
            with _writer_lock(root, stale_after_s=0.4):
                pass
        lk.check()  # still owned — never evicted
    # released cleanly after the marathon hold
    with _writer_lock(root, stale_after_s=0.4):
        pass


def test_writer_lock_fencing_evicted_holder(tmp_path):
    """Round-5 verdict task 3b, handle level: when a stealer evicts a
    genuinely-stale-looking lock (heartbeat disabled here to simulate
    a stalled writer), the evicted holder's check() raises instead of
    letting it proceed to a flip, and its release does not unlink the
    evictor's lock."""
    import time

    import pytest

    from ods_v3_dbt_spark.sinks import (
        ConcurrentWriteError,
        LOCK_MARKER,
        _writer_lock,
    )

    root = tmp_path / "t"
    with _writer_lock(root, stale_after_s=0.2, heartbeat=False) as stalled:
        time.sleep(0.5)  # no heartbeat → now looks stale
        with _writer_lock(root, stale_after_s=0.2) as evictor:
            evictor.check()  # the evictor owns the lock
            with pytest.raises(ConcurrentWriteError, match="fenced"):
                stalled.check()
        # stalled's release must not have removed evictor's (now
        # released) state; re-acquire proves the mutex is healthy
    assert not (root / LOCK_MARKER).exists()
    with _writer_lock(root):
        pass


def test_parquet_table_slow_writer_fenced_commit(spark, tmp_path):
    """Round-5 verdict task 3 done-criterion: a deliberately slow
    writer loses its lock to an eager stealer (mtime backdated to
    simulate a dead heartbeat) while mid-produce; EXACTLY ONE commit
    wins — the stealer's — and the slow writer's flip is fenced off
    with ConcurrentWriteError, leaving the winner's data intact."""
    import threading
    import time

    from ods_v3_dbt_spark.sinks import (
        ConcurrentWriteError,
        LOCK_MARKER,
        ParquetTable,
    )

    t = ParquetTable(tmp_path / "t")
    slow = spark.range(1).select(
        F.udf(lambda x: (time.sleep(4.0), 111)[1], "long")("id").alias("k")
    )
    errs: list[BaseException] = []

    def slow_writer() -> None:
        try:
            t.write(slow)
        except BaseException as e:  # noqa: BLE001 — captured for assert
            errs.append(e)

    a = threading.Thread(target=slow_writer)
    a.start()
    lock = t.root / LOCK_MARKER
    deadline = time.time() + 10
    while not lock.exists() and time.time() < deadline:
        time.sleep(0.02)
    assert lock.exists()
    time.sleep(0.3)  # let A enter its parquet write
    import os

    old = time.time() - 7200
    os.utime(lock, (old, old))  # simulate A's heartbeat having died
    t.write(spark.createDataFrame([(222,)], "k long"))  # stealer commits
    a.join(timeout=30)
    assert not a.is_alive()
    # exactly one commit won: the stealer's; the slow writer was fenced
    assert [r.k for r in t.read(spark).collect()] == [222]
    assert len(errs) == 1 and isinstance(errs[0], ConcurrentWriteError)


def test_bucketed_table_legacy_layout_migration(spark):
    """Round-12 protocol change: a pre-pointer table (bucket files
    directly under the warehouse root — the tombstone-swap era
    layout) still attaches, and the first write() migrates it to the
    pointer-epoch layout: data correct, pointer committed, legacy
    root files retired, and the bucketed groupBy stays
    exchange-free."""
    import json
    import shutil

    from ods_v3_dbt_spark.sinks import BucketedTable, _warehouse_path

    name = "t_legacy_migrate"
    wh = _warehouse_path(spark)
    root = wh / name
    shutil.rmtree(root, ignore_errors=True)
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    try:
        t = BucketedTable(name, ["k"], num_buckets=2)
        t.write(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
        # DOWNGRADE to the legacy flat layout: hoist the committed
        # snapshot's files into the root, drop pointer + snapshot dir
        cur = (root / "_CURRENT").read_text()
        for f in (root / cur).iterdir():
            f.rename(root / f.name)
        shutil.rmtree(root / cur)
        (root / "_CURRENT").unlink()
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        assert json.loads((root / "_BUCKET_SPEC").read_text())["num_buckets"] == 2

        # legacy attach arm: registers over the flat root
        assert BucketedTable(name, ["k"], num_buckets=2).attach(spark)
        assert {r.v for r in spark.table(name).collect()} == {"a", "b"}

        # first write migrates: pointer layout from here on
        t.write(spark.createDataFrame([(3, "c")], "k long, v string"))
        assert {r.v for r in t.read(spark).collect()} == {"c"}
        assert (root / "_CURRENT").exists() or (root / "_CURRENT.d").is_dir()
        # legacy root files retired; exactly one committed snapshot
        stray = [f for f in root.iterdir()
                 if f.is_file() and f.name.endswith(".parquet")]
        assert stray == []
        snaps = [d for d in root.iterdir() if d.name.startswith("snap-")]
        assert len(snaps) == 1
        g = t.read(spark).groupBy("k").count()
        assert g._jdf.queryExecution().executedPlan().toString().count(
            "Exchange") == 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        spark.sql(f"DROP TABLE IF EXISTS {name}__snap")
        shutil.rmtree(root, ignore_errors=True)


def test_bucketed_table_stale_catalog_refresh_and_prev_input(spark):
    """Round-12 self-review finding 1, pinned: (a) a session whose
    catalog entry lags a cross-session commit follows the pointer on
    read() instead of serving the stale snapshot; (b) a write whose
    INPUT scans the previous snapshot succeeds — the old-snapshot
    sweep runs post-commit, never under a live produce — and the
    post-commit sweep then retires everything older than the new
    commit's predecessor."""
    import shutil

    from ods_v3_dbt_spark.sinks import BucketedTable, _warehouse_path

    name = "t_r12_stale"
    wh = _warehouse_path(spark)
    root = wh / name
    shutil.rmtree(root, ignore_errors=True)
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    try:
        t = BucketedTable(name, ["k"], num_buckets=2)
        t.write(spark.createDataFrame([(1, "v1")], "k long, v string"))
        snap1 = (root / "_CURRENT").read_text()
        t.write(spark.createDataFrame([(2, "v2")], "k long, v string"))
        snap2 = (root / "_CURRENT").read_text()
        assert (root / snap1).is_dir()  # previous retained (grace)

        # (a) simulate the lagging session: force-register at snap-1
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        t._register(spark, root / snap1,
                    spark.read.parquet(str(root / snap1)).schema)
        assert {r.v for r in spark.table(name).collect()} == {"v1"}  # stale
        assert {r.v for r in t.read(spark).collect()} == {"v2"}  # refreshed

        # (b) a write whose input reads the PREVIOUS snapshot: the
        # produce scans snap-1 while the write commits snap-3 — the
        # sweep must not pull snap-1 out from under the scan
        prev = spark.read.parquet(str(root / snap1)).selectExpr(
            "k + 10 as k", "v"
        )
        t.write(prev)
        assert {(r.k, r.v) for r in t.read(spark).collect()} == {(11, "v1")}
        snaps = {d.name for d in root.iterdir() if d.name.startswith("snap-")}
        snap3 = (root / "_CURRENT").read_text()
        # post-commit sweep: new + its predecessor retained, older gone
        assert snaps == {snap2, snap3}
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        spark.sql(f"DROP TABLE IF EXISTS {name}__snap")
        shutil.rmtree(root, ignore_errors=True)


def test_bucketed_table_tombstone_crash_repair(spark):
    """Round-4 advisor (sinks.py:495): the swap never passes through
    a state with NO complete data dir. Simulate a crash between the
    two renames (live demoted to tombstone, side never promoted): a
    fresh session's attach() promotes the tombstone back and the
    table reads its full previous content; a subsequent write()
    repairs then commits normally. The un-promoted side snapshot is
    NOT resurrected (it may belong to a fenced loser)."""
    from ods_v3_dbt_spark.sinks import BucketedTable, _warehouse_path

    t = BucketedTable("t_tomb_repair", ["k"], num_buckets=2)
    t.write(spark.createDataFrame([(1, "v1"), (2, "v1")], "k long, v string"))
    live, tomb, side = t._dirs(spark)
    # simulate the crash window: live demoted, promotion never ran,
    # and the catalog is gone (fresh driver session)
    spark.sql(f"DROP TABLE IF EXISTS {t.name}")
    live.rename(tomb)
    assert not live.exists() and tomb.exists()
    assert t.attach(spark) is True
    assert {r.v for r in t.read(spark).collect()} == {"v1"}
    # and a write over the repaired table commits cleanly
    t.write(spark.createDataFrame([(1, "v2")], "k long, v string"))
    assert {r.v for r in t.read(spark).collect()} == {"v2"}
    assert not tomb.exists() and not side.exists()


def test_bucketed_table_writer_lock(spark, tmp_path):
    """BucketedTable shares the writer mutex, keyed in the warehouse
    dir — a held lock rejects the overlapping writer, and the lock
    clears after commit."""
    import pytest

    from ods_v3_dbt_spark.sinks import (
        BucketedTable,
        ConcurrentWriteError,
        _warehouse_path,
        _writer_lock,
    )

    t = BucketedTable("t_lock_probe", ["k"], num_buckets=2)
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    with _writer_lock(_warehouse_path(spark) / "t_lock_probe__lock"):
        with pytest.raises(ConcurrentWriteError):
            t.write(df)
    t.write(df)
    assert t.read(spark).count() == 2
    assert not (_warehouse_path(spark) / "t_lock_probe__lock" / "_LOCK").exists()


def test_etl_job_emits_stage_metrics(spark, tmp_path):
    """Round-4 task 6 (observability parity with statsd/fluentd,
    configs/statsd.yaml + fluentd/conf/fluent.conf:1-26): an EtlJob
    run with a MetricsLog attached appends one row per
    (stage, metric) — extract/stage_load/merge each report rows_out
    + wall, stage_load additionally bytes + files — and the metrics
    table is itself queryable."""
    from ods_v3_dbt_spark.metrics import MetricsLog

    spec = fixture_catalog().get("bccp_item")
    src_path = tmp_path / "src"

    def row(code, ts, status):
        return (code, "POS1", "name", True, 1.0, 10.0, status, T0, T0, ts)

    spark.createDataFrame(
        [row("A", dt.datetime(2024, 9, 1, 5), "new"),
         row("B", dt.datetime(2024, 9, 1, 6), "new")],
        spec.struct_type(),
    ).write.parquet(str(src_path))

    m = MetricsLog(tmp_path / "metrics")
    job = EtlJob(spark, spec, tmp_path / "wh", source_path=str(src_path),
                 metrics=m)
    job.run(window=(T0, T1))

    rows = m.read(spark).collect()
    by_stage = {}
    for r in rows:
        by_stage.setdefault(r.stage, {})[r.metric] = (r.value, r.unit)
    assert set(by_stage) == {"extract", "stage_load", "merge"}
    assert by_stage["extract"]["rows_out"] == (2.0, "rows")
    assert by_stage["merge"]["rows_out"] == (2.0, "rows")
    assert by_stage["stage_load"]["bytes"][0] > 0
    assert all("wall" in v for v in by_stage.values())
    # queryable like any table: per-stage wall rollup
    agg = (m.read(spark).filter("metric = 'wall'")
           .groupBy("stage").count().collect())
    assert len(agg) == 3


def test_model_lineage_manifest_roundtrip(spark, tmp_path):
    """Round-4 task 9: the ModelGraph emits its ref-graph +
    materializations + tests as a JSON lineage manifest (dbt docs
    generate analog, dags/casreport_dbt_sample_dag.py:109-116) —
    parents/children consistent, build order topological, atomic
    write round-trips."""
    import json

    g = ModelGraph(tmp_path / "wh")
    g.add(Model(
        name="stg_orders",
        fn=lambda s: _orders_df(spark, 3),
        materialized="view",
        tests=[ModelTest("not_null", column="order_id", severity="error")],
    ))
    g.add(Model(
        name="mart_orders",
        fn=lambda s, stg_orders: stg_orders,
        materialized="incremental",
        refs=["stg_orders"],
        unique_key="order_id",
        watermark_col="updated_at",
    ))
    g.add(Model(
        name="mart_daily",
        fn=lambda s, mart_orders: mart_orders,
        materialized="table",
        refs=["mart_orders"],
    ))

    m = g.manifest()
    assert m["models"]["stg_orders"]["children"] == ["mart_orders"]
    assert m["models"]["mart_orders"]["depends_on"] == ["stg_orders"]
    assert m["models"]["mart_orders"]["unique_key"] == "order_id"
    assert m["models"]["stg_orders"]["storage"] is None          # view
    assert m["models"]["mart_daily"]["storage"].endswith("mart_daily")
    assert m["models"]["stg_orders"]["tests"][0]["kind"] == "not_null"
    order = m["build_order"]
    assert order.index("stg_orders") < order.index("mart_orders") < order.index("mart_daily")

    p = g.write_manifest(tmp_path / "docs" / "manifest.json")
    assert json.loads(p.read_text()) == m


def test_bucketed_table_attach_after_catalog_loss(spark, tmp_path):
    """Cross-session durability: the in-memory catalog dies with the
    session while the warehouse data survives. attach() must
    re-register the surviving directory with the declared bucket
    spec — and the re-attached table must behave as BUCKETED (scan
    reports the bucket layout). Tables are EXTERNAL (round-5
    tombstone swap) so DROP is catalog-only; session loss is
    simulated by a DROP plus an explicit data stash/restore."""
    import shutil

    from pyspark.sql import functions as F

    from ods_v3_dbt_spark.sinks import BucketedTable, _warehouse_path

    t = BucketedTable("t_attach_probe", ["k"], num_buckets=4)
    df = spark.range(200).select(F.col("id").alias("k"), (F.col("id") * 3).alias("v"))
    t.write(df)
    data_dir = _warehouse_path(spark) / "t_attach_probe"
    stash = tmp_path / "stash"
    shutil.copytree(data_dir, stash)
    spark.sql("DROP TABLE t_attach_probe")          # catalog forgot...
    shutil.rmtree(data_dir)                         # ...and data gone
    assert not t.exists(spark)
    assert not t.attach(spark)                      # nothing to attach
    shutil.copytree(stash, data_dir)                # ...but data survived
    assert t.attach(spark)
    assert t.exists(spark)
    assert t.read(spark).count() == 200
    # bucketing metadata really registered: a join on the bucket key
    # with broadcast off reads the bucketed layout, corpus side
    # exchange-free
    probe = spark.range(50).select(F.col("id").alias("k"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            t.read(spark).join(probe, "k")
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Bucketed: true" in plan
    assert plan.count("Exchange") == 1  # probe side only
    # a subsequent write still swaps cleanly over the attached entry
    t.write(df.limit(10))
    assert t.read(spark).count() == 10


def test_dedup_index_attach_after_catalog_loss(spark, tmp_path):
    """DedupIndex.exists() re-attaches all parts in a fresh catalog —
    a restarted nightly driver probes the persisted index instead of
    rebuilding it."""
    import shutil

    from ods_v3_dbt_spark.operators.neardup_index import (
        DedupIndex,
        dedup_index_write,
        neardup_probe,
    )
    from ods_v3_dbt_spark.sinks import _warehouse_path

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "one two three four five six seven")],
        "doc_id long, text string",
    )
    idx = dedup_index_write(docs, "t_attach_idx", num_buckets=2)
    before = {tuple(r) for r in neardup_probe(docs, idx, 500_000).collect()}
    parts = [
        t.name.lower()
        for p in ("fps", "shingles", "sizes")
        for t in getattr(idx.resolve(spark), p).tables
    ]
    stashes = {}
    for part in parts:
        src = _warehouse_path(spark) / part
        stashes[part] = tmp_path / part
        shutil.copytree(src, stashes[part])
        spark.sql(f"DROP TABLE {part}")             # catalog-only (external)
        shutil.rmtree(src)                          # simulate data loss too
    fresh = DedupIndex("t_attach_idx", 3, 2)
    assert not fresh.exists(spark)                  # members gone
    for part, stash in stashes.items():
        shutil.copytree(stash, _warehouse_path(spark) / part)
    assert fresh.exists(spark)                      # attach path
    after = {tuple(r) for r in neardup_probe(docs, fresh, 500_000).collect()}
    assert after == before and after


def test_table_group_all_old_or_all_new(spark, tmp_path, monkeypatch):
    """Round-6 verdict task 3: a TableGroup commit is atomic across
    ALL members. A group reader resolving after every member table
    has individually committed — but before the group-manifest
    replace — still reads the entirely-OLD assignment; a crash in
    that window leaves the group at the old assignment and the
    replayed commit advances it; post-commit reads are entirely
    new. This is the fact+rollup / staging+runlog invariant the
    reference gets from one Postgres transaction per merge script
    (dags/sql/casreport/update_des_table/casreport_mailsitemhdr.sql)."""
    import pytest as _pytest

    from ods_v3_dbt_spark import sinks as S

    root = tmp_path / "grp"
    grp = S.TableGroup(root, ["fact", "rollup_day"])
    fact1 = spark.createDataFrame([(1, 100), (2, 200)], "k long, amt long")
    day1 = fact1.groupBy().sum("amt").selectExpr("`sum(amt)` as total")
    grp.commit({"fact": fact1, "rollup_day": day1}, extras={"window": "d1"})

    def snap(dfs):
        return {n: {tuple(r) for r in d.collect()} for n, d in dfs.items()}

    v1 = snap(grp.read(spark))
    assert v1["fact"] == {(1, 100), (2, 200)} and v1["rollup_day"] == {(300,)}

    fact2 = spark.createDataFrame([(1, 100), (2, 200), (3, 400)],
                                  "k long, amt long")
    day2 = fact2.groupBy().sum("amt").selectExpr("`sum(amt)` as total")

    # a reader sampling the group BETWEEN the member commits and the
    # manifest flip must see all-old (member pointers already moved —
    # that is exactly the skew the group manifest closes)
    seen = {}
    orig_write = S.ParquetTable.write

    def spy_write(self, df):
        out = orig_write(self, df)
        if self.root.name == "rollup_day":  # both members now flipped
            reader = S.TableGroup(root, ["fact", "rollup_day"])
            seen["mid"] = snap(reader.read(spark))
            seen["member_direct"] = {
                tuple(r) for r in reader.tables["fact"].read(spark).collect()
            }
        return out

    monkeypatch.setattr(S.ParquetTable, "write", spy_write)
    man = grp.commit({"fact": fact2, "rollup_day": day2}, extras={"window": "d2"})
    monkeypatch.setattr(S.ParquetTable, "write", orig_write)
    assert seen["mid"] == v1                       # group: all-old
    assert seen["member_direct"] == {(1, 100), (2, 200), (3, 400)}
    v2 = snap(grp.read(spark))
    assert v2["fact"] == {(1, 100), (2, 200), (3, 400)}
    assert v2["rollup_day"] == {(700,)}
    assert man["extras"] == {"window": "d2"} and man["prev"] is not None

    # crash AFTER all member writes, BEFORE the manifest replace:
    # the group stays at v2; the replayed commit advances it
    fact3 = spark.createDataFrame([(9, 1)], "k long, amt long")
    day3 = fact3.groupBy().sum("amt").selectExpr("`sum(amt)` as total")

    class CrashFS:
        def __init__(self, inner):
            self.inner = inner

        def __getattr__(self, name):  # delegate everything else
            return getattr(self.inner, name)

        def write_text_atomic(self, p, c):
            raise RuntimeError("simulated crash before group manifest")

    real_fs = grp._fs()
    monkeypatch.setattr(S.TableGroup, "_fs", lambda self: CrashFS(real_fs))
    with _pytest.raises(RuntimeError, match="simulated crash"):
        grp.commit({"fact": fact3, "rollup_day": day3})
    monkeypatch.undo()
    assert snap(S.TableGroup(root, ["fact", "rollup_day"]).read(spark)) == v2
    grp2 = S.TableGroup(root, ["fact", "rollup_day"])
    grp2.commit({"fact": fact3, "rollup_day": day3})
    v3 = snap(grp2.read(spark))
    assert v3["fact"] == {(9, 1)} and v3["rollup_day"] == {(1,)}

    # partial commits are refused — they would decouple the members
    with _pytest.raises(ValueError, match="cover exactly"):
        grp2.commit({"fact": fact3})


def test_table_group_commit_pointers_wrap(spark, tmp_path):
    """TableGroup.wrap + commit_pointers — the curated-view shape:
    members committed individually (work interleaving between member
    commit and group flip), then ONE pointer commit publishes the
    assignment with non-table extras. A pointer to a nonexistent
    snapshot is refused; the flip records prev for vacuum/readers."""
    import pytest as _pytest

    from ods_v3_dbt_spark.sinks import ParquetTable, TableGroup

    tbl = ParquetTable(tmp_path / "store")
    s1 = tbl.write(spark.createDataFrame([(1,)], "v long"))
    grp = TableGroup.wrap({"store": tbl}, tmp_path / "store" / "_PAIR")
    man1 = grp.commit_pointers({"store": s1.name}, extras={"epoch": 7})
    assert man1 == grp.manifest()
    assert man1["tables"] == {"store": s1.name} and man1["prev"] is None
    assert man1["extras"] == {"epoch": 7}
    # member advanced OUTSIDE the group: group readers keep the
    # recorded snapshot until the next pointer commit
    s2 = tbl.write(spark.createDataFrame([(2,)], "v long"))
    assert [tuple(r) for r in grp.read(spark)["store"].collect()] == [(1,)]
    man2 = grp.commit_pointers({"store": s2.name}, extras={"epoch": 8})
    assert man2["prev"] == {"store": s1.name}
    assert [tuple(r) for r in grp.read(spark)["store"].collect()] == [(2,)]
    # a typo'd snapshot would publish an unreadable group — refused
    with _pytest.raises(FileNotFoundError, match="no snapshot"):
        grp.commit_pointers({"store": "snap-nope"})
    with _pytest.raises(ValueError, match="cover exactly"):
        grp.commit_pointers({"other": s2.name})


def test_curated_manifest_rides_table_group(spark, tmp_path):
    """Round-6 verdict task 3, closing clause: the curation loop's
    ``_CURATED`` co-manifest IS a TableGroup pointer manifest (group
    shape on disk), and a legacy pre-group flat manifest still
    resolves through curated_view — read back-compat."""
    import datetime as dt
    import json

    from ods_v3_dbt_spark.pipelines import (
        curate_increment_stream,
        curated_view,
    )

    corpus = tmp_path / "corpus"
    T0 = dt.datetime(2024, 9, 1, 12, 0, 0)
    process = curate_increment_stream(
        corpus, "t_group_ride_idx", str(tmp_path / "dec"), num_buckets=2
    )
    process(
        spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon zeta", T0)],
            "doc_id long, text string, ingest_ts timestamp",
        ),
        0,
    )
    raw = json.loads((corpus / "_CURATED").read_text())
    assert set(raw) == {"tables", "prev", "extras"}      # group shape
    assert set(raw["tables"]) == {"corpus"}
    assert raw["extras"]["index_kind"] == "exact"
    c0, r0, m0 = curated_view(spark, corpus)
    assert {r.doc_id for r in c0.collect()} == {1}
    assert m0["corpus_snapshot"] == raw["tables"]["corpus"]

    # legacy flat manifest (round-5 shape) resolves identically
    legacy = dict(m0)
    (corpus / "_CURATED").write_text(json.dumps(legacy, sort_keys=True))
    c1, r1, m1 = curated_view(spark, corpus)
    assert {r.doc_id for r in c1.collect()} == {1}
    assert m1 == m0


def test_table_group_vacuum_protects_live_and_prev(spark, tmp_path):
    """TableGroup.vacuum never drops a snapshot the live OR previous
    manifest records, so a group reader resolved just before a
    refresh finishes its read; older unprotected snapshots go."""
    from ods_v3_dbt_spark import sinks as S

    root = tmp_path / "grp"
    grp = S.TableGroup(root, ["a", "b"])
    mans = []
    for i in range(4):
        df = spark.createDataFrame([(i,)], "v long")
        mans.append(grp.commit({"a": df, "b": df}))
    # a lazy reader of the PREVIOUS manifest, resolved pre-vacuum
    prev_assign = mans[-1]["prev"]
    grp.vacuum(keep=1)
    for name in ("a", "b"):
        retained = {p.name for p in grp.tables[name].history()}
        assert mans[-1]["tables"][name] in retained   # live
        assert prev_assign[name] in retained          # previous
        assert mans[0]["tables"][name] not in retained  # collected
    # the previous assignment still READS in full
    for name in ("a", "b"):
        df = grp.tables[name].read_snapshot(spark, prev_assign[name])
        assert [tuple(r) for r in df.collect()] == [(2,)]


def test_update_datamart_transactional_day_month(spark, tmp_path):
    """A4 day+month refresh through TableGroup — the reference's
    one-transaction update_datamart.sql shape: both rollups commit
    together (a group read is always internally consistent: month
    totals equal the day table re-aggregated), the A3 freshness
    guard skips a no-new-data refresh, and new fact days re-roll
    BOTH members."""
    from pyspark.sql import functions as F

    from ods_v3_dbt_spark.operators.rollup import update_datamart
    from ods_v3_dbt_spark.sinks import TableGroup

    grp = TableGroup(tmp_path / "datamart", ["day", "month"])
    aggs = {"n_rows": F.count(F.lit(1)), "amount": F.sum("amt")}
    fact1 = spark.createDataFrame(
        [("a", 20240101, 10.0), ("a", 20240102, 5.0), ("b", 20240201, 7.0)],
        "grp string, day_id int, amt double",
    )
    assert update_datamart(fact1, grp, ["grp"], "day_id", aggs) is True
    v1 = grp.read(spark)
    day = {(r.grp, r.day_id): (r.n_rows, r.amount) for r in v1["day"].collect()}
    assert day == {("a", 20240101): (1, 10.0), ("a", 20240102): (1, 5.0),
                   ("b", 20240201): (1, 7.0)}
    month = {(r.grp, r.month_id): r.amount for r in v1["month"].collect()}
    assert month == {("a", 202401): 15.0, ("b", 202402): 7.0}

    # freshness guard: same fact → skipped, manifest unchanged
    man_before = grp.manifest()
    assert update_datamart(fact1, grp, ["grp"], "day_id", aggs) is False
    assert grp.manifest() == man_before

    # a newer day re-rolls BOTH members in one commit
    fact2 = fact1.unionByName(spark.createDataFrame(
        [("b", 20240202, 3.0)], "grp string, day_id int, amt double"
    ))
    assert update_datamart(fact2, grp, ["grp"], "day_id", aggs) is True
    v2 = grp.read(spark)
    assert {(r.grp, r.month_id): r.amount for r in v2["month"].collect()} == {
        ("a", 202401): 15.0, ("b", 202402): 10.0
    }
    assert grp.manifest()["extras"]["max_day"] == 20240202


def test_update_datamart_window_incremental_and_backdate(spark, tmp_path):
    """Incremental A4: a window slice advances the day+month group
    without re-scanning the fact; whole-day REPLACE semantics make
    replays idempotent and backdate corrections land (the M6/M7
    delete+insert discipline applied to the datamart)."""
    from pyspark.sql import functions as F

    from ods_v3_dbt_spark.operators.rollup import update_datamart_window
    from ods_v3_dbt_spark.sinks import TableGroup

    grp = TableGroup(tmp_path / "dm", ["day", "month"])
    aggs = {"n_rows": F.count(F.lit(1)), "amount": F.sum("amt")}
    schema = "grp string, day_id int, amt double"

    def slice_(rows):
        return spark.createDataFrame(rows, schema)

    update_datamart_window(
        slice_([("a", 20240101, 10.0), ("a", 20240102, 5.0)]),
        grp, ["grp"], "day_id", aggs,
    )
    update_datamart_window(
        slice_([("b", 20240201, 7.0)]), grp, ["grp"], "day_id", aggs
    )

    def month_view():
        return {(r.grp, r.month_id): r.amount
                for r in grp.read(spark)["month"].collect()}

    assert month_view() == {("a", 202401): 15.0, ("b", 202402): 7.0}
    # replay of the same window → identical content (whole-day replace)
    update_datamart_window(
        slice_([("b", 20240201, 7.0)]), grp, ["grp"], "day_id", aggs
    )
    assert month_view() == {("a", 202401): 15.0, ("b", 202402): 7.0}
    # backdate correction: day 20240101 re-extracted with new values
    update_datamart_window(
        slice_([("a", 20240101, 99.0)]), grp, ["grp"], "day_id", aggs
    )
    assert month_view() == {("a", 202401): 104.0, ("b", 202402): 7.0}
    day = {(r.grp, r.day_id): r.amount for r in grp.read(spark)["day"].collect()}
    assert day[("a", 20240101)] == 99.0 and day[("a", 20240102)] == 5.0
