"""``similarity._scan_par_floor`` — the round-13 parallelism floor
on expression-heavy TRAIN paths (PQ argmin encode): a corpus that
arrives as one 128 MB-bounded parquet file otherwise trains on one
core (no shuffle below the assignment = no parallelism, opt guide
§2). The floor must (a) fan a provably narrow file scan out to
``defaultParallelism``, (b) leave wide and non-file-backed inputs
UNTOUCHED (at production scale it is a structural no-op — never an
extra exchange), and (c) never change what the PQ verbs compute —
the encode is pinned value-identical with and without it here, on
top of the oracle-parity suite that replays every registered PQ
query at sf0.001."""

from __future__ import annotations

from pyspark.sql import functions as F

from ods_v3_dbt_spark.operators.similarity import _scan_par_floor
from tests.conftest import SF_SMOKE


def _emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


def test_floors_single_file_scan(spark):
    df = _emb(spark).filter(F.col("vec_id") % 2 == 0)
    out = _scan_par_floor(df)
    par = spark.sparkContext.defaultParallelism
    assert out.rdd.getNumPartitions() == par
    # same rows, only the distribution changed
    assert out.count() == df.count()


def test_leaves_wide_input_untouched(spark, tmp_path):
    # a multi-file table (>= defaultParallelism files) already scans
    # wide — the floor must pass it through as the SAME object (no
    # extra exchange in the plan)
    par = spark.sparkContext.defaultParallelism
    path = str(tmp_path / "wide_emb")
    _emb(spark).repartition(par * 2).write.parquet(path)
    wide = spark.read.parquet(path)
    assert len(wide.inputFiles()) >= par
    assert _scan_par_floor(wide) is wide


def test_leaves_non_file_backed_untouched(spark):
    rng = spark.range(0, 100, 1, 2)
    assert _scan_par_floor(rng) is rng
    ckpt = _emb(spark).select("vec_id").localCheckpoint()
    assert _scan_par_floor(ckpt) is ckpt


def test_pq_encode_value_identical_under_floor(spark):
    from ods_v3_dbt_spark.operators.similarity import (
        pq_train_encode,
        quantize_embedding,
    )

    c = _emb(spark).select(
        F.col("vec_id").alias("vid"),
        quantize_embedding(F.col("embedding")).alias("v"),
    )
    codes_flat, books_flat = pq_train_encode(c, 8, 8, 64)
    codes_floor, books_floor = pq_train_encode(
        _scan_par_floor(c), 8, 8, 64
    )
    assert books_flat == books_floor
    flat = {r.vid: list(r.codes) for r in codes_flat.collect()}
    floored = {r.vid: list(r.codes) for r in codes_floor.collect()}
    assert flat == floored
