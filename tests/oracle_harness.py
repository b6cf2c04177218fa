"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs a declared query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column names, and
values (rows sorted by all columns — order-insensitive, like the
driver's value-hash).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from ods_v3_dbt_spark.plans.declared_queries import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
    if len(df):
        df = df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)
    return df


def compare(spark_df, oracle_df: pd.DataFrame, name: str, float_rtol: float = 0.0) -> None:
    s = _normalize(spark_df.toPandas())
    o = _normalize(oracle_df)
    assert len(s) == len(o), f"{name}: row count {len(s)} != oracle {len(o)}"
    assert list(s.columns) == list(o.columns), (
        f"{name}: columns {list(s.columns)} != oracle {list(o.columns)}"
    )
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            sa, oa = sv.astype("float64"), ov.astype("float64")
            both_nan = sa.isna() & oa.isna()
            if float_rtol == 0.0:
                ok = (sa == oa) | both_nan
            else:
                ok = both_nan | sa.combine(
                    oa, lambda a, b: (math.isnan(a) and math.isnan(b)) or a == b
                    or abs(a - b) <= float_rtol * max(abs(a), abs(b))
                )
            bad = ~ok
        else:
            bad = ~((sv == ov) | (sv.isna() & ov.isna()))
        if bad.any():
            i = bad.idxmax()
            raise AssertionError(
                f"{name}: column {c!r} mismatch at sorted row {i}: "
                f"spark={sv[i]!r} oracle={ov[i]!r} ({int(bad.sum())} rows differ)"
            )
