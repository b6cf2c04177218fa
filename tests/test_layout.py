"""Z-order layout: correctness (row preservation, code interleaving)
and the actual point — multi-dimensional file pruning that a
single-column sort can't give."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ods_v3_dbt_spark.operators.layout import files_read, morton_code, zorder

SF = "/root/testdata/sf0.01"
N_FILES = 16


def test_morton_code_interleaves_bits(spark):
    # (x=0b11, y=0b00) -> bits of x at even positions: 0b0101 = 5
    # (x=0b00, y=0b11) -> bits of y at odd positions:  0b1010 = 10
    df = spark.createDataFrame([(3, 0), (0, 3), (3, 3), (0, 0)], "x long, y long")
    out = df.select(morton_code(["x", "y"], bits=2).alias("z")).collect()
    got = [r.z for r in out]
    assert got == [5, 10, 15, 0]


def test_morton_code_is_jvm_side(spark):
    df = spark.range(10).select(
        F.col("id").alias("x"), (F.col("id") * 3 % 7).alias("y")
    )
    out = df.select(morton_code(["x", "y"], bits=8).alias("z"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_zorder_preserves_rows(spark, tmp_path):
    o = spark.read.parquet(f"{SF}/orders.parquet")
    z = zorder(
        o.withColumn("o_date_int", F.unix_date(F.col("o_orderdate").cast("date"))),
        ["o_custkey", "o_date_int"],
        num_files=N_FILES,
    )
    assert z.count() == o.count()
    assert z.agg(F.sum("o_orderkey")).collect()[0][0] == \
        o.agg(F.sum("o_orderkey")).collect()[0][0]


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    """orders written three ways: unsorted, single-column sort
    (custkey), and z-ordered (custkey, orderdate)."""
    base = tmp_path_factory.mktemp("layout")
    o = spark.read.parquet(f"{SF}/orders.parquet").withColumn(
        "o_date_int", F.unix_date(F.col("o_orderdate").cast("date"))
    )
    paths = {}
    paths["linear"] = str(base / "linear")
    o.repartitionByRange(N_FILES, "o_custkey").sortWithinPartitions(
        "o_custkey"
    ).write.parquet(paths["linear"])
    paths["zorder"] = str(base / "zorder")
    zorder(o, ["o_custkey", "o_date_int"], num_files=N_FILES).write.parquet(
        paths["zorder"]
    )
    return paths


def test_zorder_prunes_both_dimensions(spark, layouts):
    """The crux: a tight predicate on EITHER clustered column must
    touch a strict subset of files under z-order. The custkey-sorted
    layout prunes custkey ranges but reads EVERY file for a date
    predicate; z-order reads a subset for both."""
    lin = spark.read.parquet(layouts["linear"])
    zo = spark.read.parquet(layouts["zorder"])
    total = files_read(zo)
    assert total >= N_FILES // 2  # layout actually produced many files

    # dimension 1: custkey slice — both layouts prune
    ck = (F.col("o_custkey") >= 100) & (F.col("o_custkey") < 150)
    assert files_read(zo.filter(ck)) < total
    # dimension 2: date slice — linear reads all, z-order prunes
    dt = (F.col("o_date_int") >= 11000) & (F.col("o_date_int") < 11060)
    lin_files = files_read(lin.filter(dt))
    zo_files = files_read(zo.filter(dt))
    lin_total = files_read(lin)
    assert lin_files == lin_total  # single-col sort can't skip on dim 2
    assert zo_files < total  # z-order can

    # combined predicate prunes multiplicatively (at least as tight
    # as the better single dimension)
    both = files_read(zo.filter(ck & dt))
    assert both <= min(files_read(zo.filter(ck)), zo_files)
