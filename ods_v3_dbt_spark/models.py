"""dbt-parity model runner (SURVEY.md §3.3).

The reference's dbt project materializes staging views and incremental
marts over Postgres (``dbt/dbt_project.yml:1-120``; staging view
``dbt/models/staging/casreport/stg_casreport__v_prd_srv.sql:1-27``;
incremental mart ``dbt/models/marts/casreport/dim_casreport_services
.sql:1-31``) with schema tests (``schema.yml:1-53``). Here a model is
a named DataFrame-producing function with a materialization mode; the
runner resolves ``ref()`` dependencies topologically and applies
tests, exactly dbt's contract re-expressed on Spark:

* ``view``        → temp view (lazy; downstream models compose plans,
                    Catalyst optimizes across model boundaries)
* ``table``       → full snapshot overwrite into a :class:`ParquetTable`
* ``incremental`` → high-watermark filter + unique-key upsert
                    (``is_incremental()`` + MAX-watermark,
                    ``dim_casreport_services.sql:25-30``)

Tests mirror dbt severities: ``error`` raises, ``warn`` records
(``dbt_project.yml:91`` defaults severity warn).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import merge as M
from .sinks import ParquetTable


@dataclass
class ModelTest:
    """One schema test: kind ∈ {not_null, unique, expression}."""

    kind: str
    column: str | None = None
    expression: str | None = None       # SQL bool expr over aggregated scope
    severity: str = "warn"              # "warn" | "error"

    def failures(self, df: DataFrame) -> int:
        if self.kind == "not_null":
            return df.filter(F.col(self.column).isNull()).limit(1).count()
        if self.kind == "unique":
            return (
                df.groupBy(self.column).count().filter(F.col("count") > 1).limit(1).count()
            )
        if self.kind == "expression":
            # dbt_utils.expression_is_true over the whole relation
            # (e.g. "count(*) > 0", schema.yml:25-29)
            ok = df.agg(F.expr(self.expression).alias("ok")).head()[0]
            return 0 if ok else 1
        raise ValueError(f"unknown test kind {self.kind!r}")


@dataclass
class Model:
    name: str
    fn: Callable[..., DataFrame]        # (spark, **ref DataFrames) -> DataFrame
    materialized: str = "view"          # view | table | incremental
    refs: Sequence[str] = ()
    unique_key: str | None = None       # incremental merge key
    watermark_col: str | None = None    # incremental high-watermark column
    tests: Sequence[ModelTest] = field(default_factory=tuple)


@dataclass
class TestResult:
    model: str
    test: str
    passed: bool
    severity: str


class ModelGraph:
    """A set of models + their storage; ``run()`` is ``dbt run`` +
    ``dbt test`` in dependency order."""

    def __init__(self, warehouse_dir: str | Path) -> None:
        self.warehouse = Path(warehouse_dir)
        self._models: dict[str, Model] = {}

    def add(self, model: Model) -> Model:
        self._models[model.name] = model
        return model

    def table(self, name: str) -> ParquetTable:
        return ParquetTable(self.warehouse / name)

    def _topo_order(self) -> list[Model]:
        order: list[Model] = []
        seen: dict[str, int] = {}  # 0=visiting, 1=done

        def visit(name: str) -> None:
            state = seen.get(name)
            if state == 1:
                return
            if state == 0:
                raise ValueError(f"model cycle through {name!r}")
            seen[name] = 0
            for r in self._models[name].refs:
                visit(r)
            seen[name] = 1
            order.append(self._models[name])

        for name in self._models:
            visit(name)
        return order

    def _materialize(self, spark: SparkSession, model: Model, df: DataFrame) -> DataFrame:
        if model.materialized == "view":
            df.createOrReplaceTempView(model.name)
            return df
        tbl = self.table(model.name)
        if model.materialized == "table" or not tbl.exists():
            tbl.write(df)
            return tbl.read(spark)
        if model.materialized == "incremental":
            target = tbl.read(spark)
            fresh = df
            if model.watermark_col:
                fresh = M.incremental_watermark_filter(target, df, model.watermark_col)
            if model.unique_key:
                merged = M.merge_upsert(target, fresh, [model.unique_key])
            else:
                merged = target.unionByName(fresh)
            tbl.write(merged)
            return tbl.read(spark)
        raise ValueError(f"unknown materialization {model.materialized!r}")

    def run(
        self, spark: SparkSession, select: Sequence[str] | None = None
    ) -> list[TestResult]:
        """Build every selected model (with upstreams) in topological
        order, run its tests; ``error``-severity failures raise."""
        results: list[TestResult] = []
        wanted = set(select) if select else None
        for model in self._topo_order():
            if wanted is not None and model.name not in wanted:
                # upstream refs of a selected model still must build
                if not any(model.name in self._models[w].refs for w in wanted):
                    continue
            inputs = {r: self._resolve(spark, r) for r in model.refs}
            df = model.fn(spark, **inputs)
            out = self._materialize(spark, model, df)
            for t in model.tests:
                n_fail = t.failures(out)
                label = f"{t.kind}({t.column or t.expression})"
                ok = n_fail == 0
                results.append(TestResult(model.name, label, ok, t.severity))
                if not ok and t.severity == "error":
                    raise AssertionError(f"model {model.name}: test {label} failed")
        return results

    def _resolve(self, spark: SparkSession, name: str) -> DataFrame:
        m = self._models[name]
        if m.materialized == "view":
            return spark.table(name)
        return self.table(name).read(spark)

    # -- lineage manifest ---------------------------------------------------

    def manifest(self) -> dict:
        """The graph as a JSON-able lineage manifest — the engine's
        ``dbt docs generate`` (the reference schedules it per run,
        ``dags/casreport_dbt_sample_dag.py:109-116``): per model its
        materialization, declared refs (parents), derived children,
        storage path for table-class models, and test inventory;
        plus the topological build order. Pure metadata — no Spark
        session, no data read."""
        children: dict[str, list[str]] = {n: [] for n in self._models}
        for m in self._models.values():
            for r in m.refs:
                children[r].append(m.name)
        return {
            "models": {
                m.name: {
                    "materialized": m.materialized,
                    "depends_on": list(m.refs),
                    "children": sorted(children[m.name]),
                    "unique_key": m.unique_key,
                    "watermark_col": m.watermark_col,
                    "storage": (
                        None
                        if m.materialized == "view"
                        else str(self.warehouse / m.name)
                    ),
                    "tests": [
                        {
                            "kind": t.kind,
                            "column": t.column,
                            "expression": t.expression,
                            "severity": t.severity,
                        }
                        for t in m.tests
                    ],
                }
                for m in self._models.values()
            },
            "build_order": [m.name for m in self._topo_order()],
        }

    def write_manifest(self, path: str | Path) -> Path:
        """Serialize :meth:`manifest` to ``path`` (atomic tmp+rename,
        like the snapshot pointer flip). Returns the path."""
        import json
        import uuid

        p = Path(path)
        p.parent.mkdir(parents=True, exist_ok=True)
        tmp = p.parent / f".{p.name}.{uuid.uuid4().hex[:8]}"
        tmp.write_text(json.dumps(self.manifest(), indent=1, sort_keys=True))
        tmp.replace(p)
        return p
