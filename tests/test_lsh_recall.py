"""LSH banding-recall telemetry (round-12 verdict task 5).

The IVF/PQ channels gauge probe recall and gate refreshes on it; the
LSH text channel's banding recall degrades just as silently when the
doc-length/Jaccard distribution drifts — true near-dup pairs stop
colliding in any band and the candidate join quietly stops seeing
them. ``lsh_index_recall_ppm`` measures exactly that trade from the
persisted members; these tests pin a healthy corpus at 1e6, a
deterministic drift fixture at a sagging value, the
``maintain_indexes`` report wiring, and the stream's telemetry
cadence (mirroring ``test_advice_r10.py``'s IVF telemetry test).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _pair_corpus(spark, n_pairs: int, ntok: int, change_every: int | None):
    """n_pairs (base, variant) doc pairs: variant replaces every
    ``change_every``-th token (None = exact copy). ntok=80,
    change_every=16 lands pair Jaccard just above the 0.6 threshold
    — high enough to be TRUTH, low enough that 16-hash/4-band
    banding deterministically misses a chunk of them."""
    rows = []
    for p in range(n_pairs):
        base = [f"w{p}_{i}" for i in range(ntok)]
        var = list(base)
        if change_every is not None:
            for i in range(0, ntok, change_every):
                var[i] = f"x{p}_{i}"
        rows.append((p * 2, " ".join(base)))
        rows.append((p * 2 + 1, " ".join(var)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_recall_healthy_corpus_is_total(spark):
    """Exact-duplicate pairs share every band — recall 1e6, and the
    maintenance report carries the gauge without flagging."""
    from ods_v3_dbt_spark.jobs import maintain_indexes
    from ods_v3_dbt_spark.operators.neardup_index import (
        lsh_index_recall_stats,
        lsh_index_write,
    )

    idx = lsh_index_write(
        _pair_corpus(spark, 10, 40, None), "t_lshrecall_healthy",
        num_buckets=4, mode="md5",
    )
    row = lsh_index_recall_stats(
        idx, threshold_ppm=600_000, max_sample=256, spark=spark
    ).collect()[0]
    assert row.sampled_docs == 20
    assert row.truth_pairs == 10
    assert row.caught_pairs == 10
    assert row.recall_ppm == 1_000_000

    (rep,) = maintain_indexes(spark, [idx], fold_multi_segment=False)
    assert rep["recall_ppm"] == 1_000_000
    assert rep["recall_low"] is False


def test_recall_sags_under_banding_drift(spark):
    """The drift fixture: 25 truth pairs at J≈0.62 — banding
    (16 hashes, 4 bands) deterministically misses 9 of them, the
    gauge reads 640_000, and ``maintain_indexes`` flags
    ``recall_low`` against the 900_000 floor. This is the decay an
    operator answers with a wider-spec ``lsh_index_rebuild``."""
    from ods_v3_dbt_spark.jobs import maintain_indexes
    from ods_v3_dbt_spark.operators.neardup_index import (
        lsh_index_recall_stats,
        lsh_index_write,
    )

    idx = lsh_index_write(
        _pair_corpus(spark, 25, 80, 16), "t_lshrecall_drift",
        num_buckets=4, mode="md5",
    )
    row = lsh_index_recall_stats(
        idx, threshold_ppm=600_000, max_sample=256, spark=spark
    ).collect()[0]
    assert row.sampled_docs == 50
    assert row.truth_pairs == 25
    assert row.caught_pairs < row.truth_pairs  # banding misses some
    assert row.recall_ppm == 640_000  # deterministic (md5 hashing)

    (rep,) = maintain_indexes(spark, [idx], fold_multi_segment=False)
    assert rep["recall_ppm"] == 640_000
    assert rep["recall_low"] is True


def test_recall_respects_tombstones(spark):
    """Deleted docs leave the sample AND the truth/candidate sets:
    deleting every variant doc removes all truth pairs — recall
    snaps back to 1e6 (nothing left to miss)."""
    from ods_v3_dbt_spark.operators.neardup_index import (
        lsh_index_delete,
        lsh_index_recall_stats,
        lsh_index_write,
    )

    idx = lsh_index_write(
        _pair_corpus(spark, 25, 80, 16), "t_lshrecall_tomb",
        num_buckets=4, mode="md5",
    )
    lsh_index_delete(
        idx,
        spark.range(50).select(F.col("id").alias("doc_id"))
        .filter(F.col("doc_id") % 2 == 1),
    )
    row = lsh_index_recall_stats(
        idx, threshold_ppm=600_000, max_sample=256, spark=spark
    ).collect()[0]
    assert row.sampled_docs == 25  # only the surviving base docs
    assert row.truth_pairs == 0
    assert row.recall_ppm == 1_000_000


def test_stream_emits_banding_recall_gauge(spark, tmp_path):
    """The curation stream's telemetry cadence (round-10 shape)
    extends to the LSH channel: with ``index_kind='lsh'`` and a
    metrics_log attached, ``lsh_index_recall_ppm`` lands as a gauge
    every ``recall_probe_every`` batches."""
    from ods_v3_dbt_spark.metrics import MetricsLog
    from ods_v3_dbt_spark.pipelines import curate_increment_stream

    SCHEMA = "doc_id long, text string, ingest_ts timestamp"
    src, ckpt = tmp_path / "src", tmp_path / "ckpt"
    corpus, dec = tmp_path / "corpus", tmp_path / "dec"
    mlog = MetricsLog(tmp_path / "mlog")
    process = curate_increment_stream(
        corpus, "t_lshrecall_stream", str(dec), num_buckets=2,
        index_kind="lsh", metrics_log=mlog,
        recall_probe_every=1, recall_probe_sample=8,
    )

    def write(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    def drain():
        q = (
            spark.readStream.schema(SCHEMA).parquet(str(src))
            .writeStream.foreachBatch(process)
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    write([(1, "alpha beta gamma delta epsilon zeta", T0),
           (2, "one two three four five six seven", T0)])
    drain()
    rows = [
        r for r in mlog.read(spark).collect()
        if r.metric == "lsh_index_recall_ppm"
    ]
    assert rows, "banding recall gauge never emitted"
    r = rows[-1]
    assert r.job_id == "curation:t_lshrecall_stream"
    assert r.stage == "banding_recall"
    assert 0 <= r.value <= 1_000_000 and r.unit == "ppm"
