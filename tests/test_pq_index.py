"""Persisted IVFADC index (round-8 verdict task 3) — the engine
invariants next to the `pq_index_ann_topk` / `pq_index_delete_topk`
oracle rows: frozen-quantizer append ≡ rebuild-with-the-same-train-
slice, delete ≡ never-appended, replay idempotence, physical fold at
compaction, and the recall-gated refresh (≡ a from-scratch build on
the corpus vectors)."""

from __future__ import annotations

import random

from ods_v3_dbt_spark.operators.pq_index import (
    pq_index_append,
    pq_index_compact,
    pq_index_delete,
    pq_index_recall_ppm,
    pq_index_refresh,
    pq_index_topk,
    pq_index_write,
)


def _vecs(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )


def _rows(n=60, dim=8, seed=11):
    random.seed(seed)
    return [
        (i, [random.uniform(-1, 1) for _ in range(dim)]) for i in range(n)
    ]


def _topk(spark, idx, qdf, k=3, nprobe=2):
    return sorted(
        (r.query_id, r.rank, r.neighbor_id, r.adc_d2)
        for r in pq_index_topk(spark, idx, qdf, k=k, nprobe=nprobe).collect()
    )


PQ = dict(num_cells=4, num_subs=4, num_codes=8, dim_count=8, num_buckets=2)


def test_append_matches_single_write_and_replays_idempotently(spark):
    rows = _rows()
    base = [r for r in rows if r[0] % 3 != 0 or r[0] < 10]
    delta = [r for r in rows if r[0] % 3 == 0 and r[0] >= 10]
    q = _vecs(spark, rows[:5])

    # one-shot: write(base) then append(delta)
    i1 = pq_index_write(_vecs(spark, base), "pqt_one", **PQ)
    pq_index_append(i1, _vecs(spark, delta))
    # reference: the same train slice with the delta encoded at write
    # time is NOT constructible via write (write trains on everything
    # it sees) — so the invariant pinned here is the LSM one: a
    # second identical append is a no-op, and probes are stable
    # across it
    before = _topk(spark, i1, q)
    epoch = i1.resolve(spark).epoch
    pq_index_append(i1, _vecs(spark, delta))
    assert i1.resolve(spark).epoch == epoch
    assert _topk(spark, i1, q) == before

    # append in two halves ≡ append in one shot (same frozen books)
    i2 = pq_index_write(_vecs(spark, base), "pqt_two", **PQ)
    half = len(delta) // 2
    pq_index_append(i2, _vecs(spark, delta[:half]))
    pq_index_append(i2, _vecs(spark, delta[half:]))
    assert _topk(spark, i2, q) == before


def test_delete_equals_never_appended_and_readd(spark):
    rows = _rows(seed=12)
    base = [r for r in rows if r[0] % 4 != 0]
    delta = [r for r in rows if r[0] % 4 == 0]
    dead = [r for r in delta if r[0] % 8 == 0]
    q = _vecs(spark, rows[:5])

    full = pq_index_write(_vecs(spark, base), "pqt_del", **PQ)
    pq_index_append(full, _vecs(spark, delta))
    pq_index_delete(full, _vecs(spark, dead).select("vec_id"))

    ref = pq_index_write(_vecs(spark, base), "pqt_del_ref", **PQ)
    pq_index_append(
        ref, _vecs(spark, [r for r in delta if r not in dead])
    )
    assert _topk(spark, full, q) == _topk(spark, ref, q)
    # delete replay: no-op
    epoch = full.resolve(spark).epoch
    pq_index_delete(full, _vecs(spark, dead).select("vec_id"))
    assert full.resolve(spark).epoch == epoch
    # delete-then-re-add ≡ never deleted
    pq_index_append(full, _vecs(spark, dead))
    ref2 = pq_index_write(_vecs(spark, base), "pqt_del_ref2", **PQ)
    pq_index_append(ref2, _vecs(spark, delta))
    assert _topk(spark, full, q) == _topk(spark, ref2, q)


def test_compaction_folds_segments_and_tombstones(spark):
    rows = _rows(seed=13)
    q = _vecs(spark, rows[:5])
    idx = pq_index_write(_vecs(spark, rows[:30]), "pqt_cmp",
                         compact_after=99, **PQ)
    pq_index_append(idx, _vecs(spark, rows[30:45]))
    pq_index_append(idx, _vecs(spark, rows[45:]))
    pq_index_delete(idx, _vecs(spark, rows[40:44]).select("vec_id"))
    cur = idx.resolve(spark)
    assert len(cur.segments) == 3 and len(cur.tombs) == 1
    before = _topk(spark, idx, q)
    pq_index_compact(idx)
    cur2 = idx.resolve(spark)
    assert len(cur2.segments) == 1 and not cur2.tombs
    assert _topk(spark, idx, q) == before


def test_recall_gate_and_refresh_equals_rebuild(spark):
    rows = _rows(seed=14)
    vdf = _vecs(spark, rows)
    idx = pq_index_write(vdf, "pqt_ref", **PQ)
    # full-probe exactness: nprobe == num_cells → recall 1e6
    assert pq_index_recall_ppm(
        spark, idx, vdf, k=5, nprobe=PQ["num_cells"]
    ) == 1_000_000
    # healthy index above the floor: refresh writes nothing
    out = pq_index_refresh(idx, vdf, spark=spark, k=5,
                           nprobe=PQ["num_cells"], recall_floor_ppm=1)
    assert out["refreshed"] is False
    # forced refresh (floor above any achievable recall) ≡ rebuild
    out2 = pq_index_refresh(idx, vdf, spark=spark, k=5, nprobe=1,
                            recall_floor_ppm=1_000_001)
    assert out2["refreshed"] is True
    ref = pq_index_write(vdf, "pqt_ref_rebuild", **PQ)
    q = _vecs(spark, rows[:5])
    assert _topk(spark, idx, q) == _topk(spark, ref, q)


def test_maintenance_folds_pq_index(spark):
    from ods_v3_dbt_spark.jobs import maintain_indexes

    rows = _rows(seed=15)
    idx = pq_index_write(_vecs(spark, rows[:40]), "pqt_maint",
                         compact_after=99, **PQ)
    pq_index_append(idx, _vecs(spark, rows[40:]))
    pq_index_delete(idx, _vecs(spark, rows[50:54]).select("vec_id"))
    q = _vecs(spark, rows[:5])
    before = _topk(spark, idx, q)
    reports = maintain_indexes(spark, [idx])
    (rep,) = reports
    assert rep["kind"] == "ivfadc" and rep["compacted"]
    assert rep["segments_after"] == 1
    assert _topk(spark, idx, q) == before
