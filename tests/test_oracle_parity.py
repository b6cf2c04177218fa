"""Every declared query must hash-match its DuckDB oracle — the same
check the driver runs (CORRECTNESS_r{N}.json), mirrored locally at
sf0.001 so regressions are caught pre-round."""

from __future__ import annotations

import pytest

from ods_v3_dbt_spark.plans.declared_queries import registry

from .conftest import SF_SMOKE
from .oracle_harness import compare, duck_connection

_REG = registry()
_WITH_ORACLE = sorted(name for name, qd in _REG.items() if qd.oracle is not None)
_ROWS_ONLY = sorted(name for name, qd in _REG.items() if qd.oracle is None)


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_parity(spark, duck, name):
    qd = _REG[name]
    spark_df = qd.spark(spark, SF_SMOKE)
    oracle_df = duck.execute(qd.oracle).df()
    compare(spark_df, oracle_df, name)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_runs(spark, name):
    qd = _REG[name]
    df = qd.spark(spark, SF_SMOKE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
