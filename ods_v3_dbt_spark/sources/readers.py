"""Source readers S1-S12 (SURVEY.md §2.1), Spark-first.

The reference's extraction operators hand-build dialect SQL with a
half-open cursor window and page through cursors with
``fetchmany(50000)`` (``plugins/operators/bccp_to_ods.py:185-258``,
``khl_to_ods.py:169-237``, ``casreport_to_ods.py:252-301``). Here the
same window semantics compile into a JDBC pushdown predicate — Spark's
JDBC source plans partitioned reads, replacing client-side paging —
and into plain Column filters for Parquet landings, where Catalyst
pushes them into the scan (``PushedFilters`` in explain).

Driver-side sources (REST S7, xlsx S10) deliberately parse on the
driver — they are small dimension feeds in the reference (a few
thousand rows); the DataFrame is created once with the declared schema
and all coercion runs as JVM expressions, not Python loops.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as St

from ..catalog import TableSpec
from ..functions import cleansing as C

# ---------------------------------------------------------------------------
# Window predicate — the engine's incremental-slice contract (half-open)
# ---------------------------------------------------------------------------


def _day_id(ts: dt.datetime) -> int:
    """yyyymmdd int from a timestamp (``casreport_to_ods.py:132-135``)."""
    return ts.year * 10000 + ts.month * 100 + ts.day


def window_predicate(spec: TableSpec, start: dt.datetime, end: dt.datetime) -> Column | None:
    """``cursor >= start AND cursor < end`` as a Column filter.

    Half-open exactly like every reference extract
    (``bccp_to_ods.py:198-201``); int-cursor tables compare yyyymmdd
    day-ids computed from the window bounds (S3,
    ``casreport_to_ods.py:272-283``). ``None`` when the spec has no
    cursor (S5 full-dim scan — condition suppressed, like
    ``khl_to_ods.py:225-228``).
    """
    if spec.cursor_field is None:
        return None
    c = F.col(spec.cursor_field)
    if spec.cursor_is_int_day():
        return (c >= F.lit(_day_id(start))) & (c < F.lit(_day_id(end)))
    return (c >= F.lit(start)) & (c < F.lit(end))


def windowed_extract_sql(
    spec: TableSpec,
    start: dt.datetime,
    end: dt.datetime,
    dialect: str = "ansi",
    src_schema: str | None = None,
    src_table: str | None = None,
) -> str:
    """The dialect SELECT the reference would emit, for JDBC
    ``dbtable=(subquery)`` pushdown against a real source DB.

    Dialects mirror the reference exactly: MSSQL wraps literals in
    ``CONVERT(DATETIME, :s, 120)`` (``bccp_to_ods.py:199-200``); Oracle
    in ``TO_DATE(:s,'YYYY-MM-DD HH24:MI:SS')`` (``khl_to_ods.py:
    225-228``); int cursors compare raw yyyymmdd ints
    (``casreport_to_ods.py:272-283``).
    """
    cols = ", ".join(spec.columns)
    table = f"{src_schema or spec.schema_name}.{src_table or spec.name}"
    base = f"SELECT {cols} FROM {table}"
    if spec.cursor_field is None:
        return base
    cur = spec.cursor_field
    if spec.cursor_is_int_day():
        return f"{base} WHERE {cur} >= {_day_id(start)} AND {cur} < {_day_id(end)}"
    s, e = start.strftime("%Y-%m-%d %H:%M:%S"), end.strftime("%Y-%m-%d %H:%M:%S")
    if dialect == "mssql":
        lo = f"CONVERT(DATETIME, '{s}', 120)"
        hi = f"CONVERT(DATETIME, '{e}', 120)"
    elif dialect == "oracle":
        lo = f"TO_DATE('{s}', 'YYYY-MM-DD HH24:MI:SS')"
        hi = f"TO_DATE('{e}', 'YYYY-MM-DD HH24:MI:SS')"
    else:
        lo, hi = f"TIMESTAMP '{s}'", f"TIMESTAMP '{e}'"
    return f"{base} WHERE {cur} >= {lo} AND {cur} < {hi}"


def jdbc_window_reader(
    spark: SparkSession,
    url: str,
    spec: TableSpec,
    start: dt.datetime,
    end: dt.datetime,
    dialect: str = "ansi",
    num_partitions: int = 8,
    fetchsize: int = 50000,
    src_schema: str | None = None,
    properties: dict[str, str] | None = None,
):
    """S1-S5: windowed JDBC read, partitioned on the cursor.

    Replaces the reference's 50k ``fetchmany`` paging with Spark's
    partitioned JDBC scan: the window subquery is the ``dbtable`` (the
    source DB evaluates the predicate — true pushdown), split into
    ``num_partitions`` ranges on the cursor so executors read in
    parallel. Returns the configured reader (unstarted, so tests can
    inspect options without a live DB).
    """
    sql = windowed_extract_sql(spec, start, end, dialect, src_schema)
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", f"({sql}) src")
        .option("fetchsize", str(fetchsize))
    )
    if spec.cursor_field and not spec.cursor_is_int_day():
        reader = (
            reader.option("partitionColumn", spec.cursor_field)
            .option("lowerBound", start.strftime("%Y-%m-%d %H:%M:%S"))
            .option("upperBound", end.strftime("%Y-%m-%d %H:%M:%S"))
            .option("numPartitions", str(num_partitions))
        )
    elif spec.cursor_field:
        reader = (
            reader.option("partitionColumn", spec.cursor_field)
            .option("lowerBound", str(_day_id(start)))
            .option("upperBound", str(_day_id(end)))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader


# ---------------------------------------------------------------------------
# Parquet landing / table reads
# ---------------------------------------------------------------------------


def normalize_ns_timestamps(df: DataFrame, spec: TableSpec) -> DataFrame:
    """Repair columns that ``nanosAsLong`` surfaced as bigint.

    Parquet TIMESTAMP(NANOS) (pandas/pyarrow default) is unreadable as
    Spark's µs TimestampType; the session reads them as long
    (``session.ENGINE_CONF``) and this converts ns → µs explicitly.
    """
    out = df
    for c, declared in spec.columns.items():
        if declared in ("datetime64[ns]", "timestamp", "datetime") and c in df.columns:
            if dict(df.dtypes)[c] in ("bigint", "long"):
                out = out.withColumn(c, F.timestamp_micros((F.col(c) / 1000).cast("long")))
    return out


def read_table(
    spark: SparkSession,
    path: str,
    spec: TableSpec | None = None,
    window: tuple[dt.datetime, dt.datetime] | None = None,
) -> DataFrame:
    """Read a Parquet-backed table, optionally windowed on the spec's
    cursor. The filter is a plain Column predicate — Catalyst pushes it
    into the scan (partition pruning when the cursor is the partition
    key)."""
    df = spark.read.parquet(path)
    if spec is not None:
        df = normalize_ns_timestamps(df, spec)
        if window is not None:
            pred = window_predicate(spec, *window)
            if pred is not None:
                df = df.filter(pred)
    return df


# ---------------------------------------------------------------------------
# REST source (S7)
# ---------------------------------------------------------------------------


def rest_source(
    spark: SparkSession,
    rows: Iterable[dict],
    spec: TableSpec,
    mask_cols: Sequence[str] = (),
) -> DataFrame:
    """S7: JSON payload (already fetched) → typed DataFrame.

    Mirrors ``HRMToStagingDailyOperator.extract`` (``hrm_to_ods.py:
    132-157``): select+rename ``src_columns → des_columns``, enforce the
    declared schema, null out PII columns (``hrm_to_ods.py:199-201``
    masks mobile/email to None). The HTTP fetch itself (OAuth2 password
    grant, ``hrm_to_ods.py:56-66``) stays outside — tests inject rows.
    """
    rename = spec.src_columns or {c: c for c in spec.columns}
    projected = [
        {des: r.get(src) for src, des in rename.items()} for r in rows
    ]
    sdf = spark.createDataFrame(projected, schema=spec.struct_type())
    for c in mask_cols:
        sdf = sdf.withColumn(c, F.lit(None).cast(dict(sdf.dtypes)[c]))
    return sdf


# ---------------------------------------------------------------------------
# Excel source (S10) — streaming row semantics, expression coercions
# ---------------------------------------------------------------------------


def excel_rows_source(
    spark: SparkSession,
    rows: Sequence[Sequence],
    spec: TableSpec,
    header_rows: int = 1,
    end_skip: int = 0,
    drop_null_cols: Sequence[str] = (),
    etl_date: dt.datetime | None = None,
) -> DataFrame:
    """S10: xlsx row stream → typed DataFrame with the reference's
    per-cell coercion contract (``pns_to_ods_optimize.py:95-221``):

    * skip ``header_rows`` top / ``end_skip`` bottom rows (135-139),
    * ``'' / 'NULL' / 'nan'`` → NULL (148-149, 165, 325-327),
    * out-of-int32 ints → NULL (the reference warns + nulls, 152-162),
    * drop rows whose ``drop_null_cols`` key is NULL (168-175),
    * append ``etl_date`` for detail-type feeds (S10).

    The raw grid lands as all-string; every coercion is a ``when/cast``
    Column so the hot path stays in codegen. With the openpyxl
    streaming reader absent in this environment, callers hand us the
    row iterable — the Spark-side semantics are identical.
    """
    data = list(rows)[header_rows: len(rows) - end_skip if end_skip else None]
    names = list(spec.columns)
    width = len([c for c in names if c != "etl_date"])
    as_str = [
        [None if v is None else str(v) for v in (list(r) + [None] * width)[:width]]
        for r in data
    ]
    raw_names = [c for c in names if c != "etl_date"]
    df = spark.createDataFrame(as_str, schema=", ".join(f"{c} string" for c in raw_names))

    null_markers = ("", "NULL", "nan", "None")
    out_cols: list[Column] = []
    for c in raw_names:
        declared = spec.columns[c]
        col = F.when(F.col(c).isin(*null_markers), F.lit(None)).otherwise(F.col(c))
        if declared in ("Int64", "int", "int64", "long", "bigint"):
            num = col.cast("double")
            col = C.int32_guard(num).cast("long" if declared != "int" else "int")
        elif declared in ("float64", "double", "float"):
            col = col.cast("double")
        elif declared in ("datetime64[ns]", "timestamp"):
            col = F.to_timestamp(col)
        elif declared in ("bool", "boolean"):
            col = col.cast("boolean")
        out_cols.append(col.alias(c))
    typed = df.select(*out_cols)
    for c in drop_null_cols:
        typed = typed.filter(F.col(c).isNotNull())
    if "etl_date" in names:
        typed = typed.withColumn(
            "etl_date", F.lit(etl_date or dt.datetime.now()).cast("timestamp")
        )
    return typed


# ---------------------------------------------------------------------------
# CSV / JSON landing sources (L1 landing-zone formats)
# ---------------------------------------------------------------------------


def csv_landing_source(
    spark: SparkSession,
    path: str,
    spec: TableSpec,
    mode: str = "FAILFAST",
    header: bool = True,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """Schema-enforced CSV landing read.

    The reference spills every 50k-row extract batch as CSV into MinIO
    (``plugins/operators/bccp_to_ods.py:245-255``) before COPYing to
    Postgres; the engine reads such a landing directory directly. The
    catalog schema is DECLARED, never inferred — schema inference is a
    second full pass over the data, a non-starter at 100 TB.
    ``mode='FAILFAST'`` makes a malformed row fail the job (Soda-style
    Q1 gate); ``mode='PERMISSIVE'`` captures malformed source lines in
    ``corrupt_col`` for quarantine instead.
    """
    schema = spec.struct_type()
    if mode.upper() == "PERMISSIVE":
        schema = St.StructType(
            [*schema.fields, St.StructField(corrupt_col, St.StringType(), True)]
        )
    return (
        spark.read.schema(schema)
        .options(header=str(header).lower(), mode=mode, columnNameOfCorruptRecord=corrupt_col)
        .csv(path)
    )


def json_landing_source(
    spark: SparkSession,
    path: str,
    spec: TableSpec,
    mode: str = "FAILFAST",
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """Schema-enforced JSON-lines landing read — same declared-schema
    contract as :func:`csv_landing_source` (API sources like the
    reference's HRM REST feed (S7) land as JSONL at scale)."""
    schema = spec.struct_type()
    if mode.upper() == "PERMISSIVE":
        schema = St.StructType(
            [*schema.fields, St.StructField(corrupt_col, St.StringType(), True)]
        )
    return (
        spark.read.schema(schema)
        .options(mode=mode, columnNameOfCorruptRecord=corrupt_col)
        .json(path)
    )


def orc_landing_source(
    spark: SparkSession,
    path: str,
    spec: TableSpec,
) -> DataFrame:
    """Schema-enforced ORC landing read (columnar twin of the CSV/JSON
    landing sources — for upstreams that hand over ORC instead of
    parquet). Self-describing format, so there is no corrupt-row mode;
    the declared catalog schema is still imposed so drift in the
    landing files surfaces as an analysis error at read time instead
    of a type surprise mid-pipeline. Predicate pushdown and column
    pruning work as with parquet (native vectorized reader)."""
    return spark.read.schema(spec.struct_type()).orc(path)
