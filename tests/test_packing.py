"""Per-shard packing / budget-selection operators (operators/
packing.py) — the scale-safe twins of the round-2 global-window
queries. Semantics are pinned against a driver-side recomputation of
the same contract; plan shape (hash-partitioned, never a global
sort) is asserted in test_plan_audit.py.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from ods_v3_dbt_spark.operators.packing import (
    BIN_SHARD_STRIDE,
    budget_select,
    md5_shard,
    pack_sequences,
)


def py_shard(doc_id: int, num_shards: int, salt: str = "pk") -> int:
    h = hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()
    return int(h[:15], 16) % num_shards


@pytest.fixture(scope="module")
def toks(spark):
    # deterministic token counts, deliberately non-uniform
    rows = [(i, 1 + (i * 37) % 300) for i in range(400)]
    return spark.createDataFrame(rows, "doc_id long, n_tokens int")


def test_md5_shard_matches_python(spark, toks):
    got = {
        r.doc_id: r.s
        for r in toks.select("doc_id", md5_shard(F.col("doc_id"), 8).alias("s")).collect()
    }
    assert got == {i: py_shard(i, 8) for i in range(400)}
    assert len(set(got.values())) == 8  # all shards populated


def test_pack_sequences_matches_reference_packing(spark, toks):
    """Every (shard, local_bin) assignment equals the driver-side
    replay of the running-sum-before ⫽ pack_tokens rule within the
    doc-id-ordered shard stream."""
    got = {
        r.doc_id: (r.shard, r.local_bin, r.bin_id)
        for r in pack_sequences(toks, pack_tokens=256, num_shards=4).collect()
    }
    streams = defaultdict(list)
    for i in range(400):
        streams[py_shard(i, 4)].append(i)
    for s, ids in streams.items():
        cum = 0
        for i in sorted(ids):
            n = 1 + (i * 37) % 300
            expected_bin = cum // 256
            assert got[i] == (s, expected_bin, s * BIN_SHARD_STRIDE + expected_bin)
            cum += n


def test_pack_sequences_honors_explicit_shard_col(spark, toks):
    two = toks.withColumn("grp", (F.col("doc_id") % 2).cast("int"))
    packed = pack_sequences(two, pack_tokens=256, shard_col="grp")
    assert {r.shard for r in packed.select("shard").distinct().collect()} == {0, 1}
    # shard column drives the window: doc 0 and doc 2 share a stream
    rows = {r.doc_id: r.local_bin for r in packed.collect()}
    assert rows[0] == 0


def test_budget_select_per_shard_prefix(spark):
    rows = [(i, 10 + i % 7, 1000 - i) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens int, quality_milli int")
    sel = budget_select(df, total_budget=800, num_shards=4)
    got = sel.collect()
    per_shard = defaultdict(list)
    for r in got:
        per_shard[r.shard].append(r)
    assert per_shard  # something admitted
    for s, admitted in per_shard.items():
        # budget respected
        assert sum(r.n_tokens for r in admitted) <= 800 // 4
        # admitted set is exactly the quality-ordered prefix of the shard
        shard_ids = [i for i in range(200) if py_shard(i, 4) == s]
        ranked = sorted(shard_ids, key=lambda i: (-(1000 - i), i))
        cum, expected = 0, set()
        for i in ranked:
            cum += 10 + i % 7
            if cum > 800 // 4:
                break
            expected.add(i)
        assert {r.doc_id for r in admitted} == expected
