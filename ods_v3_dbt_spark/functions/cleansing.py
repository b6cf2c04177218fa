"""Scalar cleansing transforms (reference §2.4 inventory).

Every transform the reference applies cell-by-cell in pandas
(``plugins/operators/bccp_to_ods.py:243``,
``pns_to_ods_optimize.py:143-175``) or in Jinja-SQL
(``dbt/macros/transformations.sql:1-29``,
``dags/sql/cms/extract/customers.sql:7-8``) is re-expressed here as a
pure ``Column`` function so it stays inside whole-stage codegen — no
Python UDFs, which is what makes these viable at 100 TB.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Control characters scrubbed from every string column
#: (reference: ``bccp_to_ods.py:243``, ``ods_to_llb.py:133``,
#: ``dbt/macros/transformations.sql:4-6``).
CONTROL_CHARS_PATTERN = "[\\r\\n\\x00]"

INT32_MIN, INT32_MAX = -(2**31), 2**31 - 1

#: Sentinel dates: Oracle 9999-12-31 was folded to 2261-12-31 for
#: pandas-ns compatibility (``casreport_to_ods.py:331-335``) and
#: restored at load (``casreport_d_service_product.sql:9-17``). Spark
#: handles year 9999 natively; we normalize either sentinel to 9999.
SENTINEL_YEAR_PANDAS = 2261
SENTINEL_DATE = "9999-12-31"


def scrub_control_chars(col: Column) -> Column:
    """Strip \\r, \\n, \\x00 (reference scrubbing contract)."""
    return F.regexp_replace(col, CONTROL_CHARS_PATTERN, "")


def empty_to_null(col: Column) -> Column:
    """'' / 'NULL' / 'nan' → NULL (``pns_to_ods_optimize.py:148,325-327``,
    ``hrm_to_ods.py:139``)."""
    return F.when(F.trim(col).isin("", "NULL", "nan"), F.lit(None)).otherwise(col)


def clean_string(col: Column) -> Column:
    """Full string contract: scrub control chars, trim, empty→NULL."""
    return empty_to_null(F.trim(scrub_control_chars(col)))


def coalesce_key(col: Column) -> Column:
    """``COALESCE(key,'')`` merge-key normalization
    (``bccp_item.sql:10-11``)."""
    return F.coalesce(col, F.lit(""))


def coalesce_zero(col: Column) -> Column:
    """``COALESCE(x,0)`` measure defaulting
    (``staging_revenue_by_employee.sql:4-16``)."""
    return F.coalesce(col, F.lit(0.0))


def bool_to_bit(col: Column) -> Column:
    """boolean → '1'/'0' bit rendering (``bccp_item.sql:19-169``)."""
    return F.when(col, F.lit("1")).when(~col, F.lit("0")).otherwise(F.lit(None))


def int32_guard(col: Column) -> Column:
    """Out-of-int32-range → NULL (``pns_to_ods_optimize.py:152-162``)."""
    return F.when(col.between(INT32_MIN, INT32_MAX), col).otherwise(F.lit(None))


def null_bad_dates(col: Column, min_year: int = 1000) -> Column:
    """Dates before a sanity floor → NULL (year<1000:
    ``cms/extract/customers.sql:7-8``; <1700:
    ``khl_to_ods_backdate.py:228-229``)."""
    return F.when(F.year(col) < min_year, F.lit(None)).otherwise(col)


def restore_sentinel_date(col: Column) -> Column:
    """2261-12-31 (pandas-era sentinel) → 9999-12-31
    (``casreport_d_service_product.sql:9-17``)."""
    return F.when(
        F.year(col) == SENTINEL_YEAR_PANDAS,
        F.to_timestamp(F.lit(SENTINEL_DATE)),
    ).otherwise(col)


def mask_pii(*_ignored: Column) -> Column:
    """PII masking: project NULL regardless of input
    (``bccp/extract/bccp_item.sql:7-9``, ``khl_to_ods_backdate.py:228-237``)."""
    return F.lit(None).cast("string")


def day_id(col: Column) -> Column:
    """timestamp/date → yyyymmdd int day-id (``casreport_to_ods.py:132-135``)."""
    return F.date_format(col, "yyyyMMdd").cast("int")


def month_id_from_day_id(col: Column) -> Column:
    """yyyymmdd → yyyymm via integer division (``update_datamart.sql:22-24``)."""
    return F.floor(col / 100).cast("int")


_CAMEL_RE1 = re.compile(r"(.)([A-Z][a-z]+)")
_CAMEL_RE2 = re.compile(r"([a-z0-9])([A-Z])")


def to_snake(name: str) -> str:
    """CamelCase → snake_case column rename (``bccp_to_ods.py:219-223``)."""
    s = _CAMEL_RE1.sub(r"\1_\2", name)
    return _CAMEL_RE2.sub(r"\1_\2", s).lower()


def snake_case_columns(df: DataFrame) -> DataFrame:
    """Rename every column to snake_case (driver-side metadata op)."""
    return df.toDF(*[to_snake(c) for c in df.columns])


def clean_strings(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Apply :func:`clean_string` to all (or the given) string columns."""
    targets = set(
        columns
        if columns is not None
        else [f.name for f in df.schema.fields if f.dataType.simpleString() == "string"]
    )
    return df.select(
        *[
            clean_string(F.col(c)).alias(c) if c in targets else F.col(c)
            for c in df.columns
        ]
    )
