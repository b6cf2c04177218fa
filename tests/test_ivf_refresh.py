"""IVF centroid refresh + recall telemetry (round-7 verdict task 3):
appends assign to FROZEN centroids, so out-of-distribution drift
decays probe recall silently — `ivf_index_recall_ppm` measures it
against exact top-k on a sample, and `ivf_index_refresh` re-clusters
when it sags below the floor, value-identically to a from-scratch
rebuild on the same corpus.

The drift fixture is DETERMINISTIC geometry: the build slice is two
exact lumps at 0·1⃗ and 0.2·1⃗ (centroids land exactly there), and the
appended lump sits on their perpendicular BISECTOR (0.1·1⃗) with a
±0.005·1⃗ side nudge alternating by parity plus a zero-sum spread —
so consecutive drift points are true nearest neighbors of each other
while parity splits them across the two frozen cells. An nprobe=1
probe then loses ~half of every drift query's true top-k; after
re-clustering the drift lump owns a cell and recall returns to 1.0.
"""

from __future__ import annotations

from ods_v3_dbt_spark.operators.vector_index import (
    ivf_index_append,
    ivf_index_recall_ppm,
    ivf_index_refresh,
    ivf_index_topk,
    ivf_index_write,
)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def _base_rows():
    # vid 1 anchors lump a1 = 0·1⃗, vid 2 anchors a2 = 0.2·1⃗ (the
    # build's two seeds — one per lump, so the trained centroids are
    # exactly the lump centers)
    a1 = [(1, [0.0, 0.0, 0.0, 0.0])] + [
        (1002 + i, [0.0, 0.0, 0.0, 0.0]) for i in range(19)
    ]
    a2 = [(2, [0.2, 0.2, 0.2, 0.2])] + [
        (1102 + i, [0.2, 0.2, 0.2, 0.2]) for i in range(19)
    ]
    return a1 + a2


def _drift_rows():
    # bisector lump: 0.1·1⃗ + parity side nudge ±0.005·1⃗ + zero-sum
    # spread (i/100 on dims 1/-2) — vid 0 included so a refresh's
    # lowest-id seeds straddle the drift and base clusters
    rows = []
    for i in range(40):
        s = 0.005 if i % 2 == 0 else -0.005
        t = i / 100.0
        vid = 0 if i == 0 else i + 2  # skip 1 and 2 — the base anchors
        rows.append(
            (vid, [0.1 + s + t, 0.1 + s - t, 0.1 + s, 0.1 + s])
        )
    return rows


def _drifted_store(spark, name):
    idx = ivf_index_write(
        _vecs(spark, _base_rows()), name, num_cells=2, num_buckets=2
    )
    ivf_index_append(idx, _vecs(spark, _drift_rows()))
    return idx


def test_recall_telemetry_full_probe_is_exact(spark):
    idx = _drifted_store(spark, "t_ivf_full")
    assert ivf_index_recall_ppm(spark, idx, k=5, nprobe=2) == 1_000_000


def test_refresh_noop_above_floor(spark):
    idx = _drifted_store(spark, "t_ivf_noop")
    before = idx.resolve(spark).epoch
    out = ivf_index_refresh(idx, spark, k=5, nprobe=2,
                            recall_floor_ppm=900_000)
    assert out["refreshed"] is False and out["epoch"] == before


def test_drift_decays_recall_and_refresh_recovers(spark):
    name = "t_ivf_drift"
    idx = ivf_index_write(
        _vecs(spark, _base_rows()), name, num_cells=2, num_buckets=2
    )
    # healthy pre-drift: every lump owns a cell, nprobe=1 is exact
    assert ivf_index_recall_ppm(spark, idx, k=10, nprobe=1) == 1_000_000

    ivf_index_append(idx, _vecs(spark, _drift_rows()))
    pre = ivf_index_recall_ppm(spark, idx, k=10, nprobe=1)
    assert pre < 900_000, pre  # the bisector lump straddles cells

    out = ivf_index_refresh(idx, spark, k=10, nprobe=1,
                            recall_floor_ppm=900_000)
    assert out["refreshed"] is True
    post = ivf_index_recall_ppm(spark, idx, k=10, nprobe=1)
    assert post == 1_000_000, (pre, post)

    # refresh ≡ rebuild: probes of the refreshed index equal probes
    # of a from-scratch index over the same corpus — the append≡
    # rebuild oracle discipline survives a refresh
    allv = _vecs(spark, _base_rows() + _drift_rows())
    rebuilt = ivf_index_write(
        allv, "t_ivf_drift_reb", num_cells=2, num_buckets=2
    )
    qs = allv.filter("vec_id in (0, 5, 1, 2)")
    got = sorted(
        tuple(r)
        for r in ivf_index_topk(spark, idx, qs, k=5, nprobe=2).collect()
    )
    ref = sorted(
        tuple(r)
        for r in ivf_index_topk(spark, rebuilt, qs, k=5, nprobe=2).collect()
    )
    assert got == ref
