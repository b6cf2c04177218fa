"""Whole-store GC/retention audit verb (round-12 verdict task 7).

``store_audit`` is the read-only pre-flight for vacuum/compaction:
the numbers the ops story previously inferred from individual verb
receipts (orphan snapshot dirs, unpinned stale epochs, lock residue,
pointer-log depth) reported in one listing-only pass — no Spark job,
no lock, no write. Wired into ``maintain_curated_store`` as the
``audit_only=True`` dry-run.
"""

from __future__ import annotations

import datetime as dt
import json

from ods_v3_dbt_spark.jobs import maintain_curated_store, store_audit
from ods_v3_dbt_spark.sinks import ParquetTable, _warehouse_path

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def test_bare_table_audit_shape(spark, tmp_path):
    """A store with no _CURATED co-manifest audits as a bare
    snapshot table: retention counts, pointer depth, no indexes."""
    t = ParquetTable(tmp_path / "corpus")
    t.write(spark.range(5).toDF("doc_id"))
    t.write(spark.range(8).toDF("doc_id"))

    rep = store_audit(spark, tmp_path / "corpus")
    assert rep["curated"] is False
    c = rep["tables"]["corpus"]
    assert c["snapshots"] == 2
    assert c["has_current"] is True
    assert c["reclaimable_snapshots"] == 1  # previous, unpinned
    assert c["pinned"] == 0
    assert c["pointer_log_depth"] == 1  # legacy single-file pointer
    assert c["stale_lock"] is False
    assert rep["indexes"] == []
    # the report is JSON-serializable (receipt discipline)
    json.dumps(rep)


def test_audit_detects_residue(spark, tmp_path):
    """Planted residue surfaces: a dead-writer lock file, a pinned
    snapshot, and an orphan index member epoch no manifest keeps."""
    from ods_v3_dbt_spark.operators.neardup_index import (
        dedup_index_write,
    )
    from ods_v3_dbt_spark.sinks import LOCK_MARKER

    t = ParquetTable(tmp_path / "corpus")
    t.write(spark.range(4).toDF("doc_id"))
    t.write(spark.range(6).toDF("doc_id"))
    t.write(spark.range(9).toDF("doc_id"))
    t.set_pin("reader-x", [t.history()[1].name])
    # dead-writer lock residue (pid 999999999 cannot exist: > pid_max)
    (tmp_path / "corpus" / LOCK_MARKER).write_text("999999999-dead 0.0")

    # isolate from residue: the repo-level warehouse survives across
    # pytest sessions, and a re-run's build would RETAIN the previous
    # run's epoch (reader grace) — the audit would then honestly
    # count live + retained + orphan = 3 and the fresh-build
    # assertions below would misfire
    import shutil

    wh = _warehouse_path(spark)
    for p in wh.glob("t_audit_residue_idx*"):
        if p.is_dir():
            shutil.rmtree(p, ignore_errors=True)
        else:
            p.unlink(missing_ok=True)

    idx = dedup_index_write(
        spark.createDataFrame(
            [(1, "a b c d e"), (2, "f g h i j")], "doc_id long, text string"
        ),
        "t_audit_residue_idx", num_buckets=2,
    )
    # orphan member epoch: a crashed build's dir, never in a manifest
    orphan = _warehouse_path(spark) / "t_audit_residue_idx__e99_fps"
    orphan.mkdir(parents=True, exist_ok=True)
    try:
        rep = store_audit(spark, tmp_path / "corpus", indexes=[idx])
        c = rep["tables"]["corpus"]
        assert c["snapshots"] == 3
        assert c["pinned"] == 1
        assert c["reclaimable_snapshots"] == 1  # not current, not pinned
        assert c["stale_lock"] is True
        (i,) = rep["indexes"]
        assert i["exists"] is True
        assert i["segments"] == 1 and i["tombs"] == 0
        assert i["member_epochs_on_disk"] == 2  # live + orphan
        assert i["orphan_member_epochs"] == 1
        assert i["stale_lock"] is False
    finally:
        import shutil

        shutil.rmtree(orphan, ignore_errors=True)


def test_curated_store_audit_and_dry_run_flag(spark, tmp_path):
    """On a real curated store the audit resolves the index fleet
    from the _CURATED co-manifest, and
    ``maintain_curated_store(audit_only=True)`` returns it without
    taking the store lock or committing anything (pointer depths
    unchanged after the dry run)."""
    from ods_v3_dbt_spark.pipelines import curate_increment_stream

    SCHEMA = "doc_id long, text string, ingest_ts timestamp"
    src, ckpt = tmp_path / "src", tmp_path / "ckpt"
    corpus, dec = tmp_path / "corpus", tmp_path / "dec"
    process = curate_increment_stream(
        corpus, "t_audit_store_idx", str(dec), num_buckets=2,
    )
    spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon", T0),
         (2, "one two three four five six", T0)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(src))
    q = (
        spark.readStream.schema(SCHEMA).parquet(str(src))
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    rep = store_audit(spark, corpus)
    assert rep["curated"] is True
    assert rep["curated_log_depth"] >= 1
    assert rep["tables"]["corpus"]["has_current"] is True
    names = [i["index"] for i in rep["indexes"]]
    assert "t_audit_store_idx" in names
    assert all(i["exists"] for i in rep["indexes"])

    dry = maintain_curated_store(spark, corpus, audit_only=True)
    assert dry == rep  # pure read: same listing twice, same report
