"""L4 reverse JDBC export executed end-to-end against embedded Derby
(on Spark's own classpath — no external DB needed), mirroring the
reference's truncate-target + chunked-insert contract
(``ods_to_llb.py:168-198``) including the int-coerce-to-0 quirk
(:178). Round 1 only constructed the writer options; this proves the
write path runs and reads back exactly."""

from __future__ import annotations

import pytest

from ods_v3_dbt_spark import sinks

DERBY_PROPS = {"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"}


def _url(tmp_path):
    return f"jdbc:derby:{tmp_path}/exportdb;create=true"


def _read(spark, url, table):
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .load()
    )


@pytest.fixture(scope="module")
def dirty_df(spark):
    # id declared int (one unparseable → 0), v float (one unparseable
    # → NULL), s string (NUL byte stripped) — the reference's three
    # coercion classes from ods_to_llb.py:176-183.
    rows = [
        ("1", "1.5", "alpha"),
        ("2x", "2.5", "be\x00ta"),
        ("3", "junk", None),
    ]
    return spark.createDataFrame(rows, "ID string, V string, S string")


def test_coerce_for_export_semantics(dirty_df):
    out = {
        r.id: r
        for r in sinks.coerce_for_export(
            dirty_df, {"id": "int", "v": "float", "s": "str"}
        ).collect()
    }
    assert set(out) == {1, 0, 3}  # "2x" coerced to 0, names lower-cased
    assert out[0].v == 2.5 and out[0].s == "beta"  # NUL stripped
    assert out[3].v is None  # float coerce → NULL, not 0
    assert out[3].s is None or out[3].s == "None"  # str(None) quirk tolerated


def test_jdbc_roundtrip_truncate_overwrite_and_append(spark, tmp_path):
    url = _url(tmp_path)
    df = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b")], "k bigint, v double, s string"
    )
    sinks.export_jdbc(df, url, "APP.EXPORT_T", mode="overwrite",
                      batchsize=1, properties=DERBY_PROPS)
    back = _read(spark, url, "APP.EXPORT_T")
    assert sorted((r.k, r.v, r.s) for r in back.collect()) == [
        (1, 10.0, "a"), (2, 20.0, "b")]

    # append accumulates
    sinks.export_jdbc(df, url, "APP.EXPORT_T", mode="append",
                      properties=DERBY_PROPS)
    assert _read(spark, url, "APP.EXPORT_T").count() == 4

    # truncate+overwrite resets to exactly the new payload, keeping
    # the table (reference truncates, never drops)
    df2 = spark.createDataFrame([(9, 90.0, "z")], "k bigint, v double, s string")
    sinks.export_jdbc(df2, url, "APP.EXPORT_T", mode="overwrite",
                      properties=DERBY_PROPS)
    rows = _read(spark, url, "APP.EXPORT_T").collect()
    assert [(r.k, r.v, r.s) for r in rows] == [(9, 90.0, "z")]


def test_jdbc_export_applies_declared_coercions(spark, tmp_path, dirty_df):
    url = _url(tmp_path)
    sinks.export_jdbc(
        dirty_df,
        url,
        "APP.COERCED_T",
        column_types={"id": "int", "v": "float", "s": "str"},
        mode="overwrite",
        properties=DERBY_PROPS,
    )
    back = {r.id: r for r in _read(spark, url, "APP.COERCED_T").collect()}
    assert set(back) == {1, 0, 3}
    assert back[0].v == 2.5 and back[0].s == "beta"
    assert back[3].v is None
