"""Programmatic physical-plan introspection for the declared suite.

tests/test_plan_audit.py pins individual queries' plan properties;
this module makes the same signals available for EVERY query as a
machine-readable report — the suite-wide plan-hygiene audit (how many
exchanges, which join strategies, whether filters reached the scans)
that you'd otherwise eyeball query by query with `.explain()`.

Run as a module to regenerate the committed artifact:

    python -m ods_v3_dbt_spark.plans.planreport [out.json]
"""

from __future__ import annotations

import json
import re
import sys

from pyspark.sql import DataFrame, SparkSession


def plan_report(df: DataFrame) -> dict:
    """Summarize a DataFrame's physical plan into counters.

    Works off the executed-plan string (pre-AQE final but
    strategy-resolved): exchange/sort/scan counts, join strategies,
    Python-eval presence, and whether any parquet scan carries
    pushed filters.
    """
    qe = df._jdf.queryExecution()
    phys = qe.executedPlan().toString()
    formatted = qe.explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    scans = len(re.findall(r"Scan parquet|FileScan parquet", phys))
    return {
        "exchanges": phys.count("Exchange"),
        "hash_exchanges": phys.count("Exchange hashpartitioning"),
        "sorts": phys.count("Sort "),
        "parquet_scans": scans,
        "broadcast_hash_joins": phys.count("BroadcastHashJoin"),
        "sort_merge_joins": phys.count("SortMergeJoin"),
        "nested_loop_joins": phys.count("BroadcastNestedLoopJoin")
        + phys.count("CartesianProduct"),
        "window_group_limits": phys.count("WindowGroupLimit"),
        "take_ordered": phys.count("TakeOrderedAndProject"),
        "expands": phys.count("Expand"),
        "generates": phys.count("Generate"),
        "python_evals": phys.count("BatchEvalPython")
        + phys.count("ArrowEvalPython")
        + phys.count("MapInPandas")
        + phys.count("FlatMapGroupsInPandas"),
        "has_pushed_filters": bool(
            re.search(r"PushedFilters: \[[^\]]", formatted)
        ),
    }
    # NOTE: no whole-stage-codegen counter — under AQE the
    # pre-execution plan doesn't expose codegen subtrees, and forcing
    # the codegen explain compiles every stage. python_evals == 0 is
    # the load-bearing JVM-residency signal.


def suite_report(spark: SparkSession, sf_dir: str) -> dict[str, dict]:
    from . import declared_queries as DQ

    out: dict[str, dict] = {}
    for name, qd in sorted(DQ.registry().items()):
        try:
            # clear cached relations between queries: an earlier
            # query's cache swaps a file scan for an InMemoryRelation
            # whose statistics flip later join strategies, so the
            # recorded plan would depend on SWEEP ORDER instead of
            # the query (observed: minhash_lsh_neardup 15 exchanges
            # isolated vs 21 mid-sweep). bench.py does the same
            # between timed rows.
            spark.catalog.clearCache()
            out[name] = plan_report(qd.spark(spark, sf_dir))
        except Exception as e:  # pragma: no cover — report, don't die
            out[name] = {"error": str(e)[:200]}
    return out


def main() -> None:  # pragma: no cover — CLI
    from ..session import get_spark

    out_path = sys.argv[1] if len(sys.argv) > 1 else "PLAN_REPORT.json"
    spark = get_spark("plan-report", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    rep = suite_report(spark, "/root/testdata/sf0.01")
    totals = {
        "queries": len(rep),
        "with_python_eval": sum(
            1 for r in rep.values() if r.get("python_evals", 0) > 0
        ),
        "with_nested_loop": sum(
            1 for r in rep.values() if r.get("nested_loop_joins", 0) > 0
        ),
        "zero_shuffle": sum(1 for r in rep.values() if r.get("exchanges") == 0),
    }
    with open(out_path, "w") as f:
        json.dump({"_totals": totals, "queries": rep}, f, indent=1, sort_keys=True)
    print(json.dumps(totals))


if __name__ == "__main__":
    main()
