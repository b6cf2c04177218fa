"""O10 reconciliation batch fan-out + O2/O3 run gates.

Reference contracts: ``reconciliation_batch_operator.py:16-135``
(control query → (from_day, to_day) groups → 1000-id chunks →
parameterized procedure + retry + ``ds.procedure_log`` audit rows,
errors accumulated, batch never halts) and ``dags/bccp_dag.py:60-85``
/ ``helper1/optimize_compute.py:65-84`` (allow-list + time-window
short-circuit, row-count branch)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ods_v3_dbt_spark.jobs import (
    EtlJob,
    ReconProcedure,
    RunGate,
    chunk_list,
    reconciliation_batch,
    row_count_branch,
    run_catalog,
)
from ods_v3_dbt_spark.runlog import RunLog

T0 = dt.datetime(2024, 9, 1)
T1 = dt.datetime(2024, 9, 2)


@pytest.fixture()
def control_view(spark):
    # 1500 ids in period (10, 20), 1000 ids in period (30, 40) —
    # chunk_size=1000 must yield chunks of 1000+500 and 1000.
    rows = [(i, 10, 20) for i in range(1500)] + [(i, 30, 40) for i in range(2000, 3000)]
    spark.createDataFrame(rows, "accntid bigint, from_day int, to_day int").createOrReplaceTempView(
        "recon_ctl"
    )
    return "SELECT accntid, from_day, to_day FROM recon_ctl"


def test_chunk_list_boundaries():
    assert [len(c) for c in chunk_list(list(range(2500)), 1000)] == [1000, 1000, 500]
    assert chunk_list([], 1000) == []


def test_reconciliation_batch_groups_chunks_audit(spark, tmp_path, control_view):
    log = RunLog(tmp_path / "proclog")
    proc = ReconProcedure(
        name="rebuild_balance",
        sql="""
        SELECT accntid FROM recon_ctl
        WHERE array_contains(split(:ids, ','), cast(accntid as string))
          AND from_day = :fd AND to_day = :td
        """,
        param_func=lambda c: {
            "ids": c["accntid"],
            "fd": c["from_day"],
            "td": c["to_day"],
        },
    )
    audits = reconciliation_batch(
        spark, control_view, [proc], execution_date="20240901",
        chunk_size=1000, run_log=log,
    )
    key = lambda a: (a["from_day"], a["chunk_index"])  # noqa: E731
    audits = sorted(audits, key=key)
    assert [(a["from_day"], a["to_day"], a["chunk_index"], a["chunk_total"],
             a["accntid_count"]) for a in audits] == [
        (10, 20, 1, 2, 1000), (10, 20, 2, 2, 500), (30, 40, 1, 1, 1000)]
    # every chunk's statement saw exactly its own ids (rows == ids)
    assert all(a["rows"] == a["accntid_count"] for a in audits)
    assert all(a["status"] == "SUCCESS" and a["attempts"] == 1 for a in audits)
    # audit rows persisted per call, mirroring ds.procedure_log
    logged = log.read(spark).collect()
    assert len(logged) == 3 and all(r.is_success for r in logged)
    assert {r.task_id for r in logged} == {
        "10-20#chunk1/2", "10-20#chunk2/2", "30-40#chunk1/1"}


def test_reconciliation_retry_and_error_accumulation(spark, control_view):
    bad = ReconProcedure(
        name="broken",
        sql="SELECT * FROM this_table_does_not_exist WHERE x = :ids",
        param_func=lambda c: {"ids": c["accntid"]},
    )
    good = ReconProcedure(
        name="count_ctl",
        sql="SELECT count(1) AS n FROM recon_ctl WHERE from_day = :fd",
        param_func=lambda c: {"fd": c["from_day"]},
    )
    audits = reconciliation_batch(
        spark, control_view, [bad, good], execution_date="20240901",
        chunk_size=1000, max_retry=3,
    )
    bad_audits = [a for a in audits if a["proc"] == "broken"]
    good_audits = [a for a in audits if a["proc"] == "count_ctl"]
    # every bad chunk failed after the full retry budget, with the
    # error captured — and the batch continued to the next procedure
    assert len(bad_audits) == 3
    assert all(a["status"] == "FAILED" and a["attempts"] == 3 for a in bad_audits)
    assert all(a["error"] for a in bad_audits)
    assert len(good_audits) == 3 and all(a["status"] == "SUCCESS" for a in good_audits)


def test_run_gate_allowlist_and_window():
    gate = RunGate(allowed_tables=["bccp_item"], not_before_hour=6, not_after_hour=22)
    ok, _ = gate.admits("bccp_item", dt.datetime(2024, 9, 1, 12))
    assert ok
    for table, hour, frag in [
        ("other_table", 12, "allow-list"),
        ("bccp_item", 5, "before window"),
        ("bccp_item", 22, "after window"),
    ]:
        ok, reason = gate.admits(table, dt.datetime(2024, 9, 1, hour))
        assert not ok and frag in reason


def test_run_catalog_honors_gate(spark, tmp_path):
    from .test_engine import fixture_catalog

    spec = fixture_catalog().get("bccp_item")
    src, wh = tmp_path / "src", tmp_path / "wh"
    spark.createDataFrame(
        [("A", "POS1", "name", True, 1.0, 10.0, "new", T0, T0,
          dt.datetime(2024, 9, 1, 5))],
        spec.struct_type(),
    ).write.parquet(str(src))
    jobs = [EtlJob(spark, spec, wh, source_path=str(src))]

    gated = run_catalog(
        jobs, window=(T0, T1),
        gate=RunGate(not_before_hour=6), at=dt.datetime(2024, 9, 1, 3),
    )
    assert gated[0].skipped and "before window" in gated[0].skipped
    assert gated[0].rows_loaded == 0

    ran = run_catalog(
        jobs, window=(T0, T1),
        gate=RunGate(not_before_hour=6), at=dt.datetime(2024, 9, 1, 8),
    )
    assert ran[0].skipped is None and ran[0].success and ran[0].rows_loaded == 1


def test_row_count_branch(spark, tmp_path):
    p = str(tmp_path / "probe")
    spark.range(100).withColumn("flag", F.col("id") % 10 == 0).write.parquet(p)
    assert row_count_branch(spark, p, threshold=50)
    assert not row_count_branch(spark, p, F.col("flag"), threshold=50)
    assert row_count_branch(spark, p, F.col("flag"), threshold=5)
