"""Snapshot stores on ``scheme://`` URI roots (round-9 verdict
task 6 / round-8 task 2).

The writer-lock/manifest protocol already ran through the
:mod:`ods_v3_dbt_spark.fs` adapter, but the stores' LISTING paths
(history, vacuum GC, partition staging, file stats) were
pathlib-only — so a curated store could not live on an object
store even though every individual commit primitive could. These
tests drive :class:`ParquetTable`, :class:`PartitionedTable`,
:class:`TableGroup`, and the full curation stream end-to-end on a
``file://`` root: every list/rename/delete goes through
``org.apache.hadoop.fs.FileSystem`` (HadoopFS), the exact code
path an ``s3a://`` / ``gs://`` / ``abfs://`` root would take —
``file://`` is the one scheme this container can host (fs.py
module docstring documents the S3 rename caveat).
"""

from __future__ import annotations

from ods_v3_dbt_spark.fs import HadoopFS, UriPath, fs_for, norm_root
from ods_v3_dbt_spark.sinks import (
    ParquetTable,
    PartitionedTable,
    TableGroup,
)


def test_norm_root_dispatch(spark, tmp_path):
    from pathlib import Path

    assert isinstance(norm_root(str(tmp_path)), Path)
    u = norm_root(f"file://{tmp_path}/x")
    assert isinstance(u, UriPath)
    assert str(u / "y") == f"file://{tmp_path}/x/y"
    assert u.name == "x"
    assert str(u.parent) == f"file://{tmp_path}"
    assert isinstance(fs_for(u, spark), HadoopFS)


def test_parquet_table_lifecycle_on_uri_root(spark, tmp_path):
    """write → read → second write → history/time-travel → pins →
    vacuum → file_stats, all on a file:// root (pure-HadoopFS
    listings; no pathlib fallback anywhere in the store)."""
    t = ParquetTable(f"file://{tmp_path}/t")
    assert isinstance(t.root, UriPath)
    t.write(spark.range(5).toDF("id"))
    assert sorted(r.id for r in t.read(spark).collect()) == list(range(5))

    t.write(spark.range(3).toDF("id"))
    snaps = t.history()
    assert len(snaps) == 2 and all(isinstance(p, UriPath) for p in snaps)
    # time travel: index 1 is the previous snapshot
    assert t.read_snapshot(spark, 1).count() == 5
    assert t.read_snapshot(spark, snaps[1].name).count() == 5

    n_files, n_bytes = t.file_stats()
    assert n_files >= 1 and n_bytes > 0

    # pin the old snapshot: vacuum(keep=1) must not collect it
    t.set_pin("reader-a", [snaps[1].name])
    assert t.vacuum(keep=1) == []
    assert t.read_snapshot(spark, snaps[1].name).count() == 5
    t.set_pin("reader-a", None)
    removed = t.vacuum(keep=1)
    assert [p.name for p in removed] == [snaps[1].name]
    assert len(t.history()) == 1
    assert t.read(spark).count() == 3


def test_partitioned_table_lifecycle_on_uri_root(spark, tmp_path):
    """Full write → partial overwrite (one partition carried by
    reference) → manifest-pruned read → vacuum refcounting, on a
    file:// root — the curated-corpus layout on an object store."""
    t = PartitionedTable(f"file://{tmp_path}/pt", "day")
    t.write(
        spark.createDataFrame(
            [(1, "d1"), (2, "d1"), (3, "d2")], "id long, day string"
        )
    )
    before = dict(t.partitions())
    t.overwrite_partitions(
        spark.createDataFrame([(9, "d2")], "id long, day string"), ["d2"]
    )
    after = dict(t.partitions())
    # untouched partition carried BY REFERENCE (same physical dir)
    assert after["d1"] == before["d1"]
    assert after["d2"] != before["d2"]
    assert sorted(r.id for r in t.read(spark).collect()) == [1, 2, 9]
    assert [r.id for r in t.read_partitions(spark, ["d2"]).collect()] == [9]
    # absent value → empty DF in store schema, not None / not an error
    assert t.read_partitions(spark, ["zzz"]).count() == 0

    assert len(t.history()) == 2
    removed = t.vacuum(keep=1)
    # the old manifest and the replaced d2 dir go; shared d1 survives
    names = {p.name for p in removed}
    assert before["d2"] in names
    assert before["d1"] not in names
    assert sorted(r.id for r in t.read(spark).collect()) == [1, 2, 9]

    n_files, n_bytes = t.file_stats()
    assert n_files >= 2 and n_bytes > 0


def test_table_group_commit_on_uri_root(spark, tmp_path):
    g = TableGroup(f"file://{tmp_path}/grp", ["fact", "roll"])
    g.commit(
        {
            "fact": spark.range(4).toDF("id"),
            "roll": spark.range(2).toDF("id"),
        }
    )
    got = g.read(spark)
    assert got["fact"].count() == 4 and got["roll"].count() == 2
    # second commit + vacuum keeps the previous assignment readable
    g.commit(
        {
            "fact": spark.range(6).toDF("id"),
            "roll": spark.range(3).toDF("id"),
        }
    )
    g.vacuum(keep=1)
    man = g.manifest()
    prev_fact = man["prev"]["fact"]
    assert g.tables["fact"].read_snapshot(spark, prev_fact).count() == 4


def test_curated_store_end_to_end_on_uri_root(spark, tmp_path):
    """The round-9 verdict's 'done' bar for task 6: the curation
    stream (corpus + decisions + persisted index + store mutex)
    running against a file:// corpus root through HadoopFS."""
    import datetime as dt

    from ods_v3_dbt_spark.pipelines import curate_increment_stream

    SCHEMA = "doc_id long, text string, ingest_ts timestamp"
    src = tmp_path / "src"
    ckpt = tmp_path / "ckpt"
    corpus = f"file://{tmp_path}/corpus"
    decisions = tmp_path / "decisions"
    T0 = dt.datetime(2024, 9, 1, 12, 0, 0)
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    fresh = "totally new words nobody used before in any earlier batch"

    def write(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    process = curate_increment_stream(
        corpus, "t_uri_idx", str(decisions), num_buckets=2
    )

    def drain():
        q = (
            spark.readStream.schema(SCHEMA).parquet(str(src))
            .writeStream.foreachBatch(process)
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    write([(1, base, T0), (2, "!!! ???", T0)])
    drain()
    write([(11, base, T0), (13, fresh, T0)])
    drain()

    by_doc = {
        r.doc_id: r.verdict
        for r in spark.read.parquet(str(decisions)).collect()
    }
    assert by_doc[1] == "admitted"
    assert by_doc[11] == "dup_exact_existing"
    assert by_doc[13] == "admitted"
    got = sorted(r.doc_id for r in ParquetTable(corpus).read(spark).collect())
    assert got == [1, 13]
