"""``similarity._scan_par_floor`` — the parallelism floor on
expression-heavy TRAIN paths (PQ argmin encode): a corpus that
arrives as one 128 MB-bounded parquet file otherwise trains on one
core (no shuffle below the assignment = no parallelism, opt guide
§2). Round 14 made the target DATA-proportional (round-13 verdict
item 1): ``min(defaultParallelism, ceil(bytes / split_bytes))`` —
the floor must (a) fan a provably narrow file scan out
proportionally to its bytes, engaging fully on a genuinely large
single-file corpus, (b) leave tiny, wide, and non-file-backed
inputs UNTOUCHED (a ~few-KB input repartitioned to 32 partitions
pays an exchange + 32-task scheduling for nothing — the measured
pq_index_ann_topk regression), and (c) never change what the PQ
verbs compute — the encode is pinned value-identical with and
without it here, on top of the oracle-parity suite that replays
every registered PQ query at sf0.001.

Plan-shape assertions read the analyzed/optimized plan text (the
round-13 advisor note: ``.rdd.getNumPartitions()`` is the exact AQE
throwaway-plan hazard the floor's own docstring warns against)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ods_v3_dbt_spark.operators.similarity import (
    _scan_par_floor,
    _size_bytes,
)
from tests.conftest import SF_SMOKE


def _emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


def _roundrobin_target(df) -> int | None:
    """The RoundRobinPartitioning target in df's optimized plan, or
    None when the plan has no repartition — asserted on the PLAN,
    never via .rdd (AQE throwaway-plan hazard)."""
    import re

    plan = df._jdf.queryExecution().optimizedPlan().toString()
    m = re.search(r"RoundRobinPartitioning[(,\s]+(\d+)", plan) or re.search(
        r"Repartition (\d+)", plan
    )
    return int(m.group(1)) if m else None


def test_floors_large_single_file_scan(spark, tmp_path):
    # a genuinely large single parquet file (>> split_bytes ×
    # defaultParallelism) must floor all the way to
    # defaultParallelism — the round-13 verdict's done-criterion
    par = spark.sparkContext.defaultParallelism
    path = str(tmp_path / "big_single")
    spark.range(0, 400_000, 1, 1).select(
        "id", F.expr("repeat(uuid(), 4)").alias("pad")
    ).coalesce(1).write.parquet(path)
    big = spark.read.parquet(path)
    assert len(big.inputFiles()) == 1
    out = _scan_par_floor(big)
    assert _roundrobin_target(out) == par
    assert out.count() == big.count()


def test_floor_target_is_data_proportional(spark):
    # the ~190 KB smoke embeddings file is worth ceil(bytes/32 KiB)
    # ≈ 6 partitions — NOT defaultParallelism (the round-13 fixed
    # target that pessimized tiny inputs)
    import os

    df = _emb(spark)
    size = os.path.getsize(f"{SF_SMOKE}/embeddings.parquet")
    expect = -(-size // (32 << 10))
    par = spark.sparkContext.defaultParallelism
    out = _scan_par_floor(df)
    if expect >= par:
        assert _roundrobin_target(out) == par
    else:
        assert _roundrobin_target(out) == expect
        assert expect < par


def test_leaves_tiny_input_untouched(spark, tmp_path):
    # at or under one split's worth of bytes the 1-task plan is
    # already right — no exchange
    path = str(tmp_path / "tiny")
    spark.range(0, 10, 1, 1).coalesce(1).write.parquet(path)
    tiny = spark.read.parquet(path)
    assert _scan_par_floor(tiny) is tiny


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


def test_size_bytes_parses_spark_suffixes():
    # round-13 advisor (medium): the old parser raised ValueError on
    # Spark-valid two-letter suffixes and silently used multiplier 1
    # on unknown ones
    assert _size_bytes("134217728") == 128 << 20
    assert _size_bytes("128m") == 128 << 20
    assert _size_bytes("128mb") == 128 << 20
    assert _size_bytes("128MB") == 128 << 20
    assert _size_bytes("1g") == 1 << 30
    assert _size_bytes("1gb") == 1 << 30
    assert _size_bytes("1t") == 1 << 40
    assert _size_bytes("1p") == 1 << 50
    assert _size_bytes("64k") == 64 << 10
    assert _size_bytes("512b") == 512
    # unparseable → the safe 128 MiB default, never a crash
    assert _size_bytes("bogus") == 128 << 20
    assert _size_bytes(None) == 128 << 20
    assert _size_bytes("12q") == 128 << 20


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
