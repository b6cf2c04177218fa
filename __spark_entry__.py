"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``ods_v3_dbt_spark.plans.declared_queries``, where
each SURVEY.md §2 operator is declared as a (Spark impl, DuckDB
oracle SQL) pair. The driver runs ``entry(spark)`` as a smoke check,
then each ``queries()[name]`` at sf=0.01 against the matching
``oracle_sql()[name]``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ods_v3_dbt_spark.plans import declared_queries as DQ
from ods_v3_dbt_spark.session import apply_runtime_conf

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (A1/J1 revenue aggregation) on sf0.001."""
    apply_runtime_conf(spark)
    return DQ.revenue_by_customer(spark, SF0001)


def _wrap(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        apply_runtime_conf(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(qd.spark) for name, qd in DQ.registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: qd.oracle for name, qd in DQ.registry().items() if qd.oracle is not None
    }
