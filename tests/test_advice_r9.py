"""Round-10 regression tests for the round-9 VERDICT / ADVICE findings
on the persisted near-dup indexes (sizes-member totality):

1. (high) the LSH delta writer gives a sub-shingle doc an explicit
   ``n_shingles = 0`` sizes row, so a replayed append is a no-op —
   the round-9 pytest red (``_write_lsh_members`` derived sizes from
   the shingle read-back only).
2. (high) the APPEND-TRIGGERED FOLD preserves the zero rows: append a
   sub-shingle doc, fold (via ``compact_after``), replay the append —
   still a no-op, both kinds (both fold branches rebuilt sizes by
   ``shingles.groupBy(doc_id).count()``, dropping zero rows).
3. (medium) a pre-round-10 on-disk index whose spec lacks the
   ``sizes: total`` marker refuses at resolve with a rebuild message
   instead of silently re-admitting sub-shingle docs on replay.
4. (medium) membership joins — ``_not_yet_indexed`` for appends,
   ``_live_subset`` for the delete live-set restriction — are
   bucket-local: the corpus/segment side of each per-segment join
   carries NO Exchange; only the batch side shuffles (the O(batch)
   append/delete contract at 100 TB).
5. simhash: the ``docs`` membership member keeps appends idempotent
   across a fold, deletes restrict by it, and a legacy (docs-less)
   manifest refuses at resolve.
"""

from __future__ import annotations

import json
import re

import pytest


def _append_fns(kind):
    from ods_v3_dbt_spark.operators import neardup_index as NI

    if kind == "exact":
        return (NI.dedup_index_write, NI.dedup_index_append,
                NI.dedup_index_delete, NI.dedup_index_compact)
    return (NI.lsh_index_write, NI.lsh_index_append,
            NI.lsh_index_delete, NI.lsh_index_compact)


# ---------------------------------------------------------------------------
# 1+2. sizes totality: delta segments AND append-triggered folds
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("kind", ["exact", "lsh"])
def test_sub_shingle_append_replay_noop_across_fold(spark, kind):
    from ods_v3_dbt_spark.operators.neardup_index import exact_probe

    write, append, delete, _ = _append_fns(kind)
    base = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    # compact_after=2: the THIRD segment-creating write folds
    idx = write(base, f"adv9_fold_{kind}", num_buckets=2, compact_after=2)

    tiny = spark.createDataFrame([(2, "tiny doc")], "doc_id long, text string")
    append(idx, tiny)  # delta segment carrying a zero-shingle doc
    e1 = idx.resolve(spark)
    assert len(e1.segments) == 2

    # replay against the DELTA segment: sizes row must exist there
    append(idx, tiny)
    assert idx.resolve(spark).epoch == e1.epoch

    # trigger the append-fold: 2 live segments >= compact_after
    more = spark.createDataFrame(
        [(3, "zeta eta theta iota kappa")], "doc_id long, text string"
    )
    append(idx, more)
    e2 = idx.resolve(spark)
    assert len(e2.segments) == 1 and e2.epoch > e1.epoch

    # replay the sub-shingle append against the FOLDED segment: the
    # fold must have preserved the n_shingles=0 row (round-9 ADVICE —
    # rebuilding sizes from folded shingles dropped it)
    append(idx, tiny)
    assert idx.resolve(spark).epoch == e2.epoch

    # and the fold in the batch position: a sub-shingle doc arriving
    # IN the folding batch gets its zero row too
    tiny2 = spark.createDataFrame([(4, "wee")], "doc_id long, text string")
    append(idx, spark.createDataFrame(
        [(5, "lambda mu nu xi omicron pi")], "doc_id long, text string"
    ))
    append(idx, tiny2)  # 2 segments again -> this folds
    e3 = idx.resolve(spark)
    assert len(e3.segments) == 1
    append(idx, tiny2)
    assert idx.resolve(spark).epoch == e3.epoch

    # the delete live-set restriction reads the (total) sizes member:
    # deleting the sub-shingle doc must retract its fingerprint
    probe = spark.createDataFrame([(99, "tiny doc")],
                                  "doc_id long, text string")
    assert exact_probe(probe, idx).count() == 1
    delete(idx, spark.createDataFrame([(2,)], "doc_id long"))
    assert exact_probe(probe, idx).count() == 0
    # deleting it AGAIN is a no-op (restriction sees it gone)
    epoch_before = idx.resolve(spark).epoch
    delete(idx, spark.createDataFrame([(2,)], "doc_id long"))
    assert idx.resolve(spark).epoch == epoch_before


@pytest.mark.parametrize("kind", ["exact", "lsh"])
def test_sub_shingle_replay_noop_after_explicit_compact(spark, kind):
    write, append, _, compact = _append_fns(kind)
    base = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    idx = write(base, f"adv9_cpct_{kind}", num_buckets=2)
    tiny = spark.createDataFrame([(2, "no")], "doc_id long, text string")
    append(idx, tiny)
    compact(idx, spark)
    e = idx.resolve(spark)
    assert len(e.segments) == 1
    append(idx, tiny)
    assert idx.resolve(spark).epoch == e.epoch


# ---------------------------------------------------------------------------
# 3. legacy on-disk spec (no `sizes: total`) refuses at resolve
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("kind", ["exact", "lsh"])
def test_legacy_index_without_totality_marker_refuses(spark, kind):
    from ods_v3_dbt_spark import fs as FS
    from ods_v3_dbt_spark.operators.neardup_index import _manifest_path

    write, _, _, _ = _append_fns(kind)
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    idx = write(docs, f"adv9_legacy_{kind}", num_buckets=2)
    # simulate a round-9-or-earlier index: strip the totality marker
    p = _manifest_path(spark, idx.name)
    fs = FS.fs_for(p)
    man = json.loads(fs.read_text(p))
    del man["spec"]["sizes"]
    # a genuinely pre-round-10 manifest predates spec_history (round
    # 12) too; _read_manifest re-derives it from the mutated spec
    man.pop("spec_history", None)
    fs.write_text_atomic(p, json.dumps(man, sort_keys=True))
    with pytest.raises(ValueError, match="rebuild"):
        idx.resolve(spark)
    # rebuild IS the migration: a fresh write resolves cleanly again
    idx = write(docs, f"adv9_legacy_{kind}", num_buckets=2)
    assert idx.resolve(spark).epoch >= 1


def test_legacy_simhash_without_docs_member_refuses(spark):
    from ods_v3_dbt_spark import fs as FS
    from ods_v3_dbt_spark.operators.neardup_index import _manifest_path
    from ods_v3_dbt_spark.operators.simhash_index import simhash_index_write

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    idx = simhash_index_write(docs, "adv9_legacy_sh", num_buckets=2)
    p = _manifest_path(spark, idx.name)
    fs = FS.fs_for(p)
    man = json.loads(fs.read_text(p))
    del man["spec"]["docs"]
    man.pop("spec_history", None)  # legacy manifests predate it too
    fs.write_text_atomic(p, json.dumps(man, sort_keys=True))
    with pytest.raises(ValueError, match="rebuild"):
        idx.resolve(spark)


# ---------------------------------------------------------------------------
# 4. membership joins are bucket-local (plan-pinned)
# ---------------------------------------------------------------------------

def _formatted(df):
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted")
    )


@pytest.fixture
def no_broadcast(spark):
    """Force the sort-merge shape a corpus-sized member gets at 100 TB
    (a 20-row test member broadcasts, hiding where the shuffle would
    land)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


@pytest.mark.parametrize("path", ["append", "delete"])
def test_membership_join_no_corpus_exchange(spark, no_broadcast, path):
    """One shuffle per segment hop — the BATCH side only. A second
    hash-partitioning Exchange would mean the corpus-sized sizes
    member is shuffling per append/delete (the round-8 fps
    regression, re-pinned here)."""
    from ods_v3_dbt_spark.operators.neardup_index import (
        _live_subset,
        _not_yet_indexed,
        dedup_index_write,
    )

    docs = spark.createDataFrame(
        [(i, f"word{i} alpha beta gamma delta") for i in range(20)],
        "doc_id long, text string",
    )
    idx = dedup_index_write(docs, "adv9_plan_idx", num_buckets=2)
    cur = idx.resolve(spark)
    batch = spark.createDataFrame(
        [(100, "fresh text never seen before here")],
        "doc_id long, text string",
    )
    if path == "append":
        probe = _not_yet_indexed(batch, cur, spark)
    else:
        probe = _live_subset(batch.select("doc_id"), cur, spark, "sizes")
    plan = _formatted(probe)
    # single-segment index: exactly one per-segment join -> exactly
    # one shuffle (the batch), zero on the bucketed sizes scan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
    assert "sizes" in plan  # the membership member, not fps
    assert "_fps" not in plan


def test_simhash_membership_join_no_corpus_exchange(spark, no_broadcast):
    from ods_v3_dbt_spark.operators.neardup_index import _live_subset
    from ods_v3_dbt_spark.operators.simhash_index import simhash_index_write

    docs = spark.createDataFrame(
        [(i, f"word{i} alpha beta gamma delta") for i in range(20)],
        "doc_id long, text string",
    )
    idx = simhash_index_write(docs, "adv9_plan_sh", num_buckets=2)
    cur = idx.resolve(spark)
    ids = spark.createDataFrame([(3,)], "doc_id long")
    plan = _formatted(_live_subset(ids, cur, spark, "docs"))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
    assert "_docs" in plan and "_sigs" not in plan


# ---------------------------------------------------------------------------
# 5. simhash docs member: idempotence across fold, delete restriction
# ---------------------------------------------------------------------------

def test_simhash_append_replay_noop_across_fold(spark):
    from ods_v3_dbt_spark.operators.simhash_index import (
        simhash_index_append,
        simhash_index_delete,
        simhash_index_probe,
        simhash_index_write,
    )

    base = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    idx = simhash_index_write(base, "adv9_sh_fold", num_buckets=2,
                              compact_after=2)
    d2 = spark.createDataFrame([(2, "zeta eta theta iota kappa")],
                               "doc_id long, text string")
    simhash_index_append(idx, d2)
    e1 = idx.resolve(spark)
    simhash_index_append(idx, d2)  # replay vs delta
    assert idx.resolve(spark).epoch == e1.epoch
    d3 = spark.createDataFrame([(3, "lambda mu nu xi omicron")],
                               "doc_id long, text string")
    simhash_index_append(idx, d3)  # folds
    e2 = idx.resolve(spark)
    assert len(e2.segments) == 1
    simhash_index_append(idx, d2)  # replay vs folded docs member
    assert idx.resolve(spark).epoch == e2.epoch
    # delete restricts by the docs member and suppresses probes
    probe = spark.createDataFrame([(99, "zeta eta theta iota kappa")],
                                  "doc_id long, text string")
    assert simhash_index_probe(probe, idx, max_hamming=0).count() >= 1
    simhash_index_delete(idx, spark.createDataFrame([(2,)], "doc_id long"))
    assert simhash_index_probe(probe, idx, max_hamming=0).count() == 0
    epoch_before = idx.resolve(spark).epoch
    simhash_index_delete(idx, spark.createDataFrame([(2,)], "doc_id long"))
    assert idx.resolve(spark).epoch == epoch_before


# ---------------------------------------------------------------------------
# 6. empty-bootstrap curated store + sinks hardening (round-9 ADVICE)
# ---------------------------------------------------------------------------

def test_empty_first_microbatch_does_not_wedge_store(spark, tmp_path):
    """First micro-batch admits NOTHING (gate rejects everything):
    the committed zero-partition snapshot must stay readable —
    curated_view resolves, takedown no-ops — and the next batch
    proceeds normally (round-9 ADVICE: the empty manifest's read()
    raised FileNotFoundError, wedging the store until a partition
    landed)."""
    import datetime as dt

    from ods_v3_dbt_spark.pipelines import (
        corpus_takedown,
        curate_increment_stream,
        curated_view,
    )
    from ods_v3_dbt_spark.sinks import PartitionedTable

    t0 = dt.datetime(2024, 9, 1, 12, 0, 0)
    PSCHEMA = "doc_id long, text string, day string, ingest_ts timestamp"
    corpus, dec = tmp_path / "corpus", tmp_path / "dec"
    process = curate_increment_stream(
        corpus, "adv9_boot_idx", str(dec), num_buckets=2,
        corpus_partition="day",
    )
    # batch 1: the lone doc fails the min_tokens gate -> zero admitted
    process(spark.createDataFrame([(1, "too short", "d1", t0)], PSCHEMA), 1)
    tbl = PartitionedTable(corpus, "day")
    assert tbl.exists()
    assert tbl.read(spark).count() == 0  # readable, not wedged
    view, vidx, _ = curated_view(spark, corpus)
    assert view.count() == 0
    # takedown against the empty store is a readable no-op
    receipt = corpus_takedown(
        spark, corpus, spark.createDataFrame([(1,)], "doc_id long")
    )
    assert receipt["n_removed"] == 0
    # batch 2 proceeds normally
    process(
        spark.createDataFrame(
            [(2, "plenty of honest words fill this document nicely",
              "d2", t0)],
            PSCHEMA,
        ),
        2,
    )
    view2, _, _ = curated_view(spark, corpus)
    assert [r.doc_id for r in view2.collect()] == [2]


def test_partitioned_empty_write_reads_back_with_schema(spark, tmp_path):
    from ods_v3_dbt_spark.sinks import PartitionedTable

    t = PartitionedTable(tmp_path / "t", "day")
    empty = spark.createDataFrame([], "doc_id long, day string, text string")
    t.write(empty)
    back = t.read(spark)
    assert back.count() == 0 and back.schema == empty.schema
    assert t.read_partitions(spark, ["d1"]).schema == empty.schema


def test_staged_manifest_never_enters_history(spark, tmp_path):
    """A crashed/evicted writer's staged manifest is invisible to
    history()/vacuum refcounting and is GC'd by the next writer."""
    from ods_v3_dbt_spark.sinks import PartitionedTable

    t = PartitionedTable(tmp_path / "t", "day")
    df = spark.createDataFrame([(1, "d1", "a")],
                               "doc_id long, day string, text string")
    t.write(df)
    # simulate a writer that died between staging and publishing
    orphan = t.root / ".snap-9999-dead.json.staged"
    orphan.write_text('{"partition_col": "day", "partitions": {}}')
    assert len(t.history()) == 1  # staged name never matches snap-*
    t.write(df)
    assert not orphan.exists()  # GC'd under the next writer's lock


def test_vacuum_vs_writer_race_keeps_new_snapshot(spark, tmp_path):
    """vacuum holds the writer lock, so it serializes against a
    concurrent commit instead of sampling a stale pointer and
    deleting the commit's snapshot (round-9 ADVICE low)."""
    import threading
    import time

    from ods_v3_dbt_spark.sinks import ConcurrentWriteError, ParquetTable

    t = ParquetTable(tmp_path / "t")
    df = spark.createDataFrame([(1,)], "a long")
    for _ in range(3):
        t.write(df)
    errs = []

    def retrying(op, n):
        def run():
            done = 0
            while done < n:
                try:
                    op()
                    done += 1
                except ConcurrentWriteError:
                    time.sleep(0.05)  # fail-fast lock: loser retries
                except Exception as e:  # pragma: no cover
                    errs.append(e)
                    return
        return run

    th = [
        threading.Thread(target=retrying(lambda: t.write(df), 4)),
        threading.Thread(target=retrying(lambda: t.vacuum(keep=1), 4)),
    ]
    [x.start() for x in th]
    [x.join() for x in th]
    assert not errs
    # the current snapshot always survives and reads cleanly
    assert t.read(spark).count() == 1


# ---------------------------------------------------------------------------
# 7. dead-holder lock janitor (verdict task 4 — two rounds of stale
#    locks from killed test runs failing unrelated suites)
# ---------------------------------------------------------------------------

def test_dead_holder_lock_steals_immediately(spark, tmp_path):
    import subprocess
    import time

    from ods_v3_dbt_spark.sinks import LOCK_MARKER, ParquetTable

    t = ParquetTable(tmp_path / "t")
    df = spark.createDataFrame([(1,)], "a long")
    t.write(df)
    # fake a kill -9'd writer: a FRESH lock file naming a dead pid
    proc = subprocess.Popen(["true"])
    proc.wait()
    (t.root / LOCK_MARKER).write_text(f"{proc.pid}-deadbeef {time.time()}")
    t.write(df)  # steals immediately; age-out alone would block 1h
    assert t.read(spark).count() == 1


def test_live_holder_lock_still_blocks(spark, tmp_path):
    import os
    import time

    from ods_v3_dbt_spark.sinks import (
        LOCK_MARKER,
        ConcurrentWriteError,
        ParquetTable,
    )

    t = ParquetTable(tmp_path / "t")
    df = spark.createDataFrame([(1,)], "a long")
    t.write(df)
    # a LIVE process's fresh lock is never stolen (pid exists)
    (t.root / LOCK_MARKER).write_text(f"{os.getpid()}-beef {time.time()}")
    with pytest.raises(ConcurrentWriteError):
        t.write(df)
    (t.root / LOCK_MARKER).unlink()
