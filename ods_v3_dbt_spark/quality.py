"""Data-quality checks (SURVEY §2.10): Soda-style schema validation
(Q1) + dbt-style assertion tests (Q2) + row-count reconciliation (Q3).

Reference: Soda in-flight scans per batch (``soda/check/**``, runner
``bccp_to_ods.py:265-296``); dbt ``not_null``/``unique``/expression
tests (``dbt/models/staging/casreport/schema.yml:1-53``, default
severity warn ``dbt/dbt_project.yml:91``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


@dataclass
class CheckResult:
    name: str
    passed: bool
    severity: str = "error"  # or "warn"
    detail: str = ""


def validate_schema(
    df: DataFrame,
    expected: StructType,
    check_types: bool = True,
) -> list[CheckResult]:
    """Q1: required columns present (all 17 Soda checks) and, where
    declared, matching types (``soda/check/casadmin/fee_type.yml:5-14``).
    Pure metadata comparison — no job runs."""
    results: list[CheckResult] = []
    have = {f.name: f.dataType for f in df.schema.fields}
    for f in expected.fields:
        if f.name not in have:
            results.append(CheckResult(f"column_present:{f.name}", False, detail="missing"))
            continue
        results.append(CheckResult(f"column_present:{f.name}", True))
        if check_types and have[f.name] != f.dataType:
            results.append(
                CheckResult(
                    f"column_type:{f.name}",
                    False,
                    detail=f"expected {f.dataType.simpleString()}, got {have[f.name].simpleString()}",
                )
            )
        elif check_types:
            results.append(CheckResult(f"column_type:{f.name}", True))
    return results


def assertion_metrics(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Q2 as one aggregate pass: row count, per-key null count,
    distinct-key count — enough to decide not_null/unique/row_count>0
    in a single job (vs dbt's one query per test)."""
    key = F.concat_ws("", *[F.coalesce(F.col(c).cast("string"), F.lit(" ")) for c in key_cols])
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(key).alias("n_distinct_keys"),
    ] + [
        F.sum(F.col(c).isNull().cast("bigint")).alias(f"n_null_{c}") for c in key_cols
    ]
    return df.agg(*aggs)


def run_assertions(df: DataFrame, key_cols: list[str], severity: str = "warn") -> list[CheckResult]:
    """Evaluate dbt-parity tests: not_null(key), unique(key), count>0."""
    row = assertion_metrics(df, key_cols).first()
    results = [
        CheckResult("row_count_gt_0", row["n_rows"] > 0, severity),
        CheckResult("unique_key", row["n_distinct_keys"] == row["n_rows"], severity),
    ]
    for c in key_cols:
        results.append(CheckResult(f"not_null:{c}", row[f"n_null_{c}"] == 0, severity))
    return results


def reconcile_counts(extracted: int, loaded: int) -> CheckResult:
    """Q3: extract-vs-load row-count reconciliation
    (``bccp_to_ods.py:150-171,322-325``)."""
    return CheckResult(
        "rowcount_reconciliation",
        extracted == loaded,
        detail=f"extracted={extracted} loaded={loaded}",
    )


def column_profile(
    df: DataFrame, cols: list[str], approx: bool = False
) -> DataFrame:
    """Single-pass column profiler → one row per column:
    ``(col_name, n_rows, n_null, n_distinct, min_val, max_val)``.

    The at-scale sibling of the Soda/dbt checks above: where Q1/Q2
    assert a fixed expectation, this *measures* the landed data (the
    first step of any 100 TB ingest triage). All per-column aggregates
    run in ONE aggregation over the scan; the wide 1-row result is then
    unpivoted with ``stack`` — no per-column passes, no driver loop.

    ``approx=True`` swaps exact COUNT(DISTINCT) for HyperLogLog
    ``approx_count_distinct``: the exact form needs an Expand (input
    ×len(cols)) before the shuffle, the approx form is a plain
    single-pass partial agg — use it for wide tables at scale. Min/max
    are computed in the column's own type and cast to string after, so
    ordering is typed (no lexical '9' > '10' trap).
    """
    nd = (
        (lambda c: F.approx_count_distinct(c))
        if approx
        else (lambda c: F.countDistinct(F.col(c)))
    )
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"__null_{c}"),
            nd(c).cast("bigint").alias(f"__nd_{c}"),
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `__null_{c}`, `__nd_{c}`, `__min_{c}`, `__max_{c}`" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(col_name, n_null, n_distinct, min_val, max_val)"
        ),
        F.col("__n").alias("n_rows"),
    ).select("col_name", "n_rows", "n_null", "n_distinct", "min_val", "max_val")


def rule_violations(
    df: DataFrame,
    rules: dict[str, Column],
    table_name: str = "",
) -> DataFrame:
    """Row-level expectation suite → per-rule violation counts.

    ``rules`` maps rule name → a Column predicate that each row
    SHOULD satisfy (dbt-test style, SURVEY §2.10 Q2 generalized from
    not_null/unique to arbitrary row predicates). One conditional-sum
    pass over the table — N rules never means N scans; NULL
    predicate results count as violations (unknown ≠ pass, matching
    dbt's not_null strictness rather than SQL WHERE semantics).
    """
    aggs = [
        F.sum(
            F.when(rule.isNull() | ~rule, F.lit(1)).otherwise(F.lit(0))
        ).alias(name)
        for name, rule in rules.items()
    ]
    wide = df.agg(*aggs)
    stacked = wide.unpivot([], list(rules), "rule", "n_violations")
    if table_name:
        stacked = stacked.select(
            F.lit(table_name).alias("table_name"), "rule", "n_violations"
        )
    return stacked
