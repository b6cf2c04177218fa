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


def t_minus_window(now: dt.datetime, days: int = 1) -> tuple[dt.datetime, None]:
    """The T-minus convenience window of ``tms_to_ods.py:127``: lower
    bound at MIDNIGHT ``days`` days before ``now``, NO upper bound —
    the reference formats ``(now - timedelta(days=1)).strftime('%Y-%m-
    %d')`` and emits only ``cursor >= TO_DATE(yesterday)``. Pass the
    pair straight to :func:`windowed_extract_sql` (``end=None``
    suppresses the upper bound)."""
    lo = (now - dt.timedelta(days=days)).replace(
        hour=0, minute=0, second=0, microsecond=0
    )
    return lo, None


def windowed_extract_sql(
    spec: TableSpec,
    start: dt.datetime,
    end: dt.datetime | None,
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
    (``casreport_to_ods.py:272-283``). ``oracle-quoted`` double-quotes
    EVERY identifier — columns, schema, table, cursor — the way
    ``tms_to_ods.py:119-134`` / ``casadmin_to_ods.py`` emit
    ``SELECT "COL" FROM "SCHEMA"."TABLE" WHERE "CUR" >= …`` for
    case-sensitive Oracle catalogs. ``end=None`` suppresses the upper
    bound (the reference's T-1 windows are lower-bound-only — pair
    with :func:`t_minus_window`)."""
    quoted = dialect == "oracle-quoted"

    def q(ident: str) -> str:
        return f'"{ident}"' if quoted else ident

    cols = ", ".join(q(c) for c in spec.columns)
    schema_n = src_schema or spec.schema_name
    table_n = src_table or spec.name
    table = f"{q(schema_n)}.{q(table_n)}"
    base = f"SELECT {cols} FROM {table}"
    if spec.cursor_field is None:
        return base
    cur = q(spec.cursor_field)
    if spec.cursor_is_int_day():
        pred = f"{cur} >= {_day_id(start)}"
        if end is not None:
            pred += f" AND {cur} < {_day_id(end)}"
        return f"{base} WHERE {pred}"

    def _lit(ts: dt.datetime) -> str:
        s = ts.strftime("%Y-%m-%d %H:%M:%S")
        if dialect == "mssql":
            return f"CONVERT(DATETIME, '{s}', 120)"
        if dialect in ("oracle", "oracle-quoted"):
            return f"TO_DATE('{s}', 'YYYY-MM-DD HH24:MI:SS')"
        return f"TIMESTAMP '{s}'"

    pred = f"{cur} >= {_lit(start)}"
    if end is not None:
        pred += f" AND {cur} < {_lit(end)}"
    return f"{base} WHERE {pred}"


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


class OAuth2Client:
    """S7 token handshake (``hrm_to_ods.py:56-66,155-157``): the
    reference POSTs a form-encoded password grant to the token URL
    and reads ``access_token`` from the JSON body, then sends
    ``Authorization: Bearer <token>`` on every data GET.

    Adds the lifecycle the reference hard-codes away: ``expires_in``
    is honored (with a safety margin), and when the server issued a
    ``refresh_token`` the renewal uses the refresh grant instead of
    re-sending the password. Pure stdlib urllib — no requests dep.
    """

    def __init__(
        self,
        token_url: str,
        payload: dict[str, str],
        expiry_margin_s: float = 30.0,
    ) -> None:
        self.token_url = token_url
        self.payload = dict(payload)  # username/password/grant_type/client_*
        self.expiry_margin_s = expiry_margin_s
        self._token: str | None = None
        self._refresh_token: str | None = None
        self._expires_at: float = 0.0
        self.grants_sent: list[str] = []  # observability for tests/runlog

    def _post_grant(self, payload: dict[str, str]) -> None:
        import json
        import time
        import urllib.parse
        import urllib.request

        body = urllib.parse.urlencode(payload).encode()
        req = urllib.request.Request(
            self.token_url,
            data=body,
            headers={"Content-Type": "application/x-www-form-urlencoded"},
            method="POST",
        )
        with urllib.request.urlopen(req) as resp:
            tok = json.loads(resp.read().decode())
        self.grants_sent.append(payload.get("grant_type", "?"))
        self._token = tok["access_token"]
        self._refresh_token = tok.get("refresh_token", self._refresh_token)
        self._expires_at = time.time() + float(
            tok.get("expires_in", 3600)
        ) - self.expiry_margin_s

    def token(self) -> str:
        import time

        if self._token is None:
            self._post_grant(self.payload)
        elif time.time() >= self._expires_at:
            if self._refresh_token:
                try:
                    self._post_grant(
                        {
                            "grant_type": "refresh_token",
                            "refresh_token": self._refresh_token,
                            "client_id": self.payload.get("client_id", ""),
                            "client_secret": self.payload.get("client_secret", ""),
                        }
                    )
                except Exception:
                    self._post_grant(self.payload)  # refresh rejected → re-auth
            else:
                self._post_grant(self.payload)
        return self._token  # type: ignore[return-value]

    def invalidate(self) -> None:
        self._expires_at = 0.0


def fetch_rest_pages(
    base_url: str,
    auth: OAuth2Client,
    data_key: str = "DATA",
    page_param: str = "page",
    max_pages: int = 10_000,
) -> list[dict]:
    """Paged GET with Bearer auth (``hrm_to_ods.py:86,133-141``): the
    reference fetches one windowed URL and reads ``json()['DATA']``;
    real deployments page. Pages are requested as ``page=1,2,…``
    until a page returns no rows; a 401 mid-pagination invalidates
    the token and retries that page once with a fresh one (expiry
    mid-run must not drop rows). Driver-side by design — these are
    small dimension feeds (see module docstring)."""
    import json
    import urllib.error
    import urllib.parse
    import urllib.request

    rows: list[dict] = []
    for page in range(1, max_pages + 1):
        sep = "&" if urllib.parse.urlparse(base_url).query else "?"
        url = f"{base_url}{sep}{page_param}={page}"
        for attempt in (1, 2):
            req = urllib.request.Request(
                url,
                headers={
                    "Authorization": f"Bearer {auth.token()}",
                    "Content-Type": "application/json",
                },
            )
            try:
                with urllib.request.urlopen(req) as resp:
                    payload = json.loads(resp.read().decode())
                break
            except urllib.error.HTTPError as e:
                if e.code == 401 and attempt == 1:
                    auth.invalidate()  # token expired mid-run → refresh
                    continue
                raise
        batch = payload.get(data_key) or []
        if not batch:
            return rows
        # reference's '' → None normalization (hrm_to_ods.py:139)
        rows.extend(
            {k: (None if v == "" else v) for k, v in r.items()} for r in batch
        )
    raise RuntimeError(f"pagination did not terminate within {max_pages} pages")


def rest_source_http(
    spark: SparkSession,
    base_url: str,
    auth: OAuth2Client,
    spec: TableSpec,
    mask_cols: Sequence[str] = (),
    data_key: str = "DATA",
    page_param: str = "page",
) -> DataFrame:
    """S7 end-to-end: OAuth2 token → paged Bearer GET → typed,
    masked DataFrame (:func:`rest_source`)."""
    rows = fetch_rest_pages(
        base_url, auth, data_key=data_key, page_param=page_param
    )
    return rest_source(spark, rows, spec, mask_cols=mask_cols)


# ---------------------------------------------------------------------------
# Excel source (S10) — streaming row semantics, expression coercions
# ---------------------------------------------------------------------------


#: ``'' / 'NULL' / 'nan' / 'None'`` cells → NULL
#: (``pns_to_ods_optimize.py:148-149,165,325-327``).
EXCEL_NULL_MARKERS = ("", "NULL", "nan", "None")


def excel_cell_coercions(
    df: DataFrame,
    columns: dict[str, str],
    drop_null_cols: Sequence[str] = (),
) -> DataFrame:
    """S10 per-cell coercion contract as pure Column expressions over
    an all-string grid (``pns_to_ods_optimize.py:95-221``): null
    markers → NULL, declared-int cells through the int32 guard
    (out-of-range → NULL with a warning in the reference, :152-162),
    floats/timestamps/bools cast, then drop rows whose key columns
    coerced to NULL (:168-175). Whole-stage-codegen throughout —
    usable both on driver-parsed sheets (:func:`excel_rows_source`)
    and on string grids landed as columns at scale."""
    out_cols: list[Column] = []
    for c, declared in columns.items():
        col = F.when(F.col(c).isin(*EXCEL_NULL_MARKERS), F.lit(None)).otherwise(F.col(c))
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
    return typed


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
    typed = excel_cell_coercions(
        df, {c: spec.columns[c] for c in raw_names}, drop_null_cols
    )
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
