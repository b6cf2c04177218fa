"""Object-store-atomic commit protocol (round-10 verdict task 1).

These tests register :class:`tests.fake_object_fs.FakeObjectFS` —
per-object atomic PUT + conditional create, but copy+delete renames
and delete-then-copy replace, i.e. exactly what S3-class stores
document — over local roots via ``fs.register_fs_override`` and
prove the engine's durability claims survive it:

* pointer commits switch to the log-dir protocol (``_CURRENT.d/<seq
  020d>.ptr`` via conditional-put; readers resolve max(seq)) — NO
  ``replace`` ever touches a pointer, so there is no
  reader-visible missing/torn-pointer window by construction;
* a seq collision raises :class:`PointerCommitConflict` loudly
  (create-if-absent CAS) instead of last-writer-wins;
* ParquetTable / PartitionedTable / TableGroup lifecycles run green
  end-to-end, including time travel, pins, vacuum, and the
  all-old-or-all-new group read;
* a crash mid dir-copy (injected) aborts a commit WITHOUT tearing
  the published table;
* BucketedTable (round-12 verdict task 1) overwrites a LIVE table
  via pointer-indirected epoch snapshots — zero ``replace`` calls,
  zero renames of a live directory — and the catalog bucket
  registration survives the indirection (exchange-free scans).
"""

from __future__ import annotations

import pytest

from ods_v3_dbt_spark import fs as FS
from ods_v3_dbt_spark.fs import (
    PointerCommitConflict,
    commit_pointer,
    read_pointer,
)
from ods_v3_dbt_spark.sinks import (
    ParquetTable,
    PartitionedTable,
    TableGroup,
)
from tests.fake_object_fs import FakeCrash, FakeObjectFS


@pytest.fixture()
def objfs(tmp_path):
    """A FakeObjectFS routed over ``tmp_path`` for the test's
    duration; every engine ``fs_for`` under that root sees object
    semantics while Spark does native local I/O on the same paths."""
    fs = FakeObjectFS()
    FS.register_fs_override(str(tmp_path), fs)
    try:
        yield fs
    finally:
        FS.clear_fs_override(str(tmp_path))


def test_pointer_log_commit_and_cas(tmp_path, objfs):
    ptr = tmp_path / "_CURRENT"
    assert read_pointer(objfs, ptr) is None

    commit_pointer(objfs, ptr, "snap-1")
    assert read_pointer(objfs, ptr) == "snap-1"
    commit_pointer(objfs, ptr, "snap-2")
    assert read_pointer(objfs, ptr) == "snap-2"
    # log protocol, not a single replaceable file
    assert not ptr.exists()
    assert (tmp_path / "_CURRENT.d" / f"{2:020d}.ptr").exists()

    # CAS: a concurrent writer lands the next seq AFTER our listing
    # but BEFORE our conditional-put → the put fails → LOUD conflict
    class RacingFS(FakeObjectFS):
        race = None

        def list(self, p):
            out = super().list(p)
            if self.race is not None:
                race, self.race = self.race, None
                race()
            return out

    racing = RacingFS()
    FS.register_fs_override(str(tmp_path), racing)  # replaces objfs
    racing.race = lambda: racing.create_exclusive(
        tmp_path / "_CURRENT.d" / f"{3:020d}.ptr", "x"
    )
    with pytest.raises(PointerCommitConflict):
        commit_pointer(racing, ptr, "snap-3")
    # the competitor's committed value was NOT clobbered
    assert read_pointer(racing, ptr) == "x"


def test_pointer_log_retention(tmp_path, objfs):
    ptr = tmp_path / "_CURRENT"
    for i in range(20):
        commit_pointer(objfs, ptr, f"snap-{i}", retain=8)
    assert read_pointer(objfs, ptr) == "snap-19"
    entries = [n for (n, d, _) in objfs.list(tmp_path / "_CURRENT.d")]
    assert len(entries) <= 8
    # newest entry always retained
    assert f"{20:020d}.ptr" in entries


def test_legacy_pointer_still_readable(tmp_path, objfs):
    """A store created on a rename-atomic FS (legacy single-file
    pointer) stays readable after moving behind object semantics;
    the first commit there switches to the log, which supersedes."""
    ptr = tmp_path / "_CURRENT"
    (tmp_path / "snap-old").mkdir(parents=True)
    ptr.write_text("snap-old")
    assert read_pointer(objfs, ptr) == "snap-old"
    commit_pointer(objfs, ptr, "snap-new")
    assert read_pointer(objfs, ptr) == "snap-new"


def test_parquet_table_lifecycle_on_object_store(spark, tmp_path, objfs):
    """write → read → second write → time travel → pins → vacuum,
    with object-store semantics underneath — and NO replace/delete
    ever touching a pointer (the torn-flip class is structurally
    gone, not just untriggered)."""
    t = ParquetTable(tmp_path / "t")
    t.write(spark.range(5).toDF("id"))
    assert sorted(r.id for r in t.read(spark).collect()) == list(range(5))

    t.write(spark.range(3).toDF("id"))
    snaps = t.history()
    assert len(snaps) == 2
    assert t.read_snapshot(spark, 1).count() == 5

    # pointer committed via the log, never via replace
    assert not (tmp_path / "t" / "_CURRENT").exists()
    assert (tmp_path / "t" / "_CURRENT.d").is_dir()
    assert not [op for op in objfs.ops if op[0] == "replace"]

    t.set_pin("reader-a", [snaps[1].name])
    assert t.vacuum(keep=1) == []
    assert t.read_snapshot(spark, snaps[1].name).count() == 5
    t.set_pin("reader-a", None)
    removed = t.vacuum(keep=1)
    assert [p.name for p in removed] == [snaps[1].name]
    assert t.read(spark).count() == 3


def test_partitioned_table_crash_mid_promote_never_tears(
    spark, tmp_path, objfs
):
    """Inject a crash during the staging dir-copy of a partial
    rewrite: the commit aborts, the published table still reads the
    FULL previous version, and a retry commits cleanly."""
    t = PartitionedTable(tmp_path / "pt", "day")
    df1 = spark.createDataFrame(
        [(1, "d1"), (2, "d1"), (3, "d2")], "id long, day string"
    )
    t.write(df1)
    before = {(r.id, r.day) for r in t.read(spark).collect()}

    objfs.fail_after_copies = 0  # first object copy inside a rename dies
    with pytest.raises(FakeCrash):
        t.overwrite_partitions(
            spark.createDataFrame([(9, "d1")], "id long, day string"),
            ["d1"],
        )
    objfs.fail_after_copies = None

    after = {(r.id, r.day) for r in t.read(spark).collect()}
    assert after == before  # all-old, never a mix

    t.overwrite_partitions(
        spark.createDataFrame([(9, "d1")], "id long, day string"),
        ["d1"],
    )
    got = sorted(r.id for r in t.read(spark).collect())
    assert got == [3, 9]


def test_table_group_all_old_or_all_new_on_object_store(
    spark, tmp_path, objfs
):
    g = TableGroup(tmp_path / "g", ["fact", "mart"])
    g.commit(
        {
            "fact": spark.range(4).toDF("id"),
            "mart": spark.range(2).toDF("id"),
        }
    )
    v1 = {n: df.count() for n, df in g.read(spark).items()}
    assert v1 == {"fact": 4, "mart": 2}

    # advance the MEMBER tables (new snapshots + member pointers) —
    # the group read must stay pinned to the committed assignment
    # until the single group pointer commit lands
    snap_f = g.tables["fact"].write(spark.range(10).toDF("id"))
    snap_m = g.tables["mart"].write(spark.range(20).toDF("id"))
    mid = {n: df.count() for n, df in g.read(spark).items()}
    assert mid == v1  # all-old

    g.commit_pointers({"fact": snap_f.name, "mart": snap_m.name})
    v2 = {n: df.count() for n, df in g.read(spark).items()}
    assert v2 == {"fact": 10, "mart": 20}  # all-new

    # the group manifest went through the log protocol
    assert not (tmp_path / "g" / "_GROUP").exists()
    assert (tmp_path / "g" / "_GROUP.d").is_dir()
    assert not [op for op in objfs.ops if op[0] == "replace"]


def test_bucketed_table_live_overwrite_on_object_store(spark, tmp_path):
    """Round-12 verdict task 1 pinned DONE-criteria: overwriting an
    EXISTING BucketedTable behind object-store semantics commits via
    pointer indirection — zero ``replace`` calls, zero renames
    touching the live table root — and the bucket metastore
    registration survives the indirection (groupBy on the bucket key
    stays exchange-free after the overwrite). The previous snapshot
    is retained for reader grace and swept by the next write."""
    from ods_v3_dbt_spark.sinks import BucketedTable, _warehouse_path

    import shutil
    from pathlib import Path

    wh = _warehouse_path(spark)
    name = "fakeobj_live_overwrite_tbl"
    for d in (name, f"{name}__tomb", f"{name}__snap"):
        shutil.rmtree(wh / d, ignore_errors=True)
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(f"DROP TABLE IF EXISTS {name}__snap")
    fs = FakeObjectFS()
    FS.register_fs_override(str(wh / name), fs)
    try:
        t = BucketedTable(name, ["id"], num_buckets=4)
        t.write(spark.range(10).toDF("id"))  # fresh
        assert t.read(spark).count() == 10
        t.write(spark.range(3).toDF("id"))  # LIVE overwrite: allowed now
        assert sorted(r.id for r in t.read(spark).collect()) == [0, 1, 2]
        t.write(spark.range(7).toDF("id"))  # and again
        assert t.read(spark).count() == 7

        # zero replace calls, zero renames anywhere near the live root
        assert not [op for op in fs.ops if op[0] == "replace"]
        assert not [op for op in fs.ops if op[0] == "rename"]
        # pointer went through the log protocol
        root = Path(str(wh / name))
        assert not (root / "_CURRENT").exists()
        assert (root / "_CURRENT.d").is_dir()
        # current + previous snapshot retained (reader grace), older
        # epochs swept
        snaps = [d for d in root.iterdir() if d.name.startswith("snap-")]
        assert len(snaps) == 2

        # bucket registration survives: groupBy on the bucket key is
        # exchange-free after the pointer-indirected overwrite
        g = t.read(spark).groupBy("id").count()
        gplan = g._jdf.queryExecution().executedPlan().toString()
        assert gplan.count("Exchange") == 0

        # attach from a fresh catalog resolves the pointer
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        assert BucketedTable(name, ["id"], num_buckets=4).attach(spark)
        assert spark.table(name).count() == 7
        with pytest.raises(ValueError, match="bucket-spec mismatch"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            BucketedTable(name, ["id"], num_buckets=8).attach(spark)
    finally:
        FS.clear_fs_override(str(wh / name))
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        spark.sql(f"DROP TABLE IF EXISTS {name}__snap")
        for d in (name, f"{name}__tomb", f"{name}__snap"):
            shutil.rmtree(wh / d, ignore_errors=True)


def test_index_manifest_log_commit(spark, tmp_path):
    """The shared index-manifest commit point (every index family
    funnels through it) uses the pointer log on object stores."""
    from ods_v3_dbt_spark.operators.neardup_index import (
        _commit_manifest,
        _manifest_path,
        _read_manifest,
    )

    name = "fakeobj_idx_manifest"
    p = _manifest_path(spark, name)
    fs = FakeObjectFS()
    FS.register_fs_override(str(p), fs)
    try:
        spec = {"kind": "test", "shingle_n": 3}
        _commit_manifest(spark, name, 1, spec, [1], {"1": [1]})
        man = _read_manifest(spark, name)
        assert man["epoch"] == 1 and man["segments"] == [1]
        _commit_manifest(spark, name, 2, spec, [1, 2], {"2": [1, 2]})
        assert _read_manifest(spark, name)["epoch"] == 2
        from pathlib import Path

        assert not Path(str(p)).exists()
        assert Path(str(p) + ".d").is_dir()
    finally:
        FS.clear_fs_override(str(p))


def test_log_supersedes_legacy_after_migration_back(tmp_path, objfs):
    """One-way door: a store that ever committed via the log keeps
    committing via the log even back on a rename-atomic FS — a
    legacy single-file write would be invisible behind the log."""
    from ods_v3_dbt_spark.fs import LocalFS

    ptr = tmp_path / "_CURRENT"
    commit_pointer(objfs, ptr, "snap-obj")  # log entry created
    local = LocalFS()
    commit_pointer(local, ptr, "snap-local")  # atomic FS, log exists
    assert read_pointer(local, ptr) == "snap-local"
    assert read_pointer(objfs, ptr) == "snap-local"
    assert not ptr.exists()  # never wrote the legacy file


def test_writer_lock_steal_on_object_store(tmp_path, objfs):
    """The stale-lock steal (rename + content verification) works
    through object-store rename semantics: copy+delete with a
    client-side no-clobber check — the content re-read after the
    rename is what makes the steal safe there."""
    import time

    from ods_v3_dbt_spark.sinks import _writer_lock

    root = tmp_path / "t"
    objfs.mkdirs(root)
    # an abandoned lock: foreign holder id, aged past stale_after_s
    (root / "_LOCK").write_text("999999999-deadbeef 0.0")
    old = time.time() - 3600
    import os

    os.utime(root / "_LOCK", (old, old))
    with _writer_lock(root, stale_after_s=1.0) as lk:
        lk.check()  # we own it; the stale lock was stolen
    assert not (root / "_LOCK").exists()  # released cleanly


def test_dedup_index_lifecycle_on_object_store(spark, tmp_path):
    """The LSM index layer end-to-end behind object-store semantics:
    build → O(batch) append → exact probe → delete → compact, with
    every member promote a copy+delete dir rename and the manifest a
    log-dir pointer. Index members are write-once-per-epoch fresh
    BucketedTables, so the live-swap refusal never fires."""
    from ods_v3_dbt_spark.operators.neardup_index import (
        DedupIndex,
        dedup_index_append,
        dedup_index_compact,
        dedup_index_delete,
        dedup_index_write,
        exact_probe,
    )
    from ods_v3_dbt_spark.sinks import _warehouse_path

    wh = _warehouse_path(spark)
    name = "fakeobjidx2"
    fs = FakeObjectFS()
    FS.register_fs_override(str(wh / name), fs)
    try:
        docs = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon"),
             (2, "one two three four five six")],
            "doc_id long, text string",
        )
        idx = dedup_index_write(docs, name, num_buckets=2)
        dedup_index_append(
            idx,
            spark.createDataFrame(
                [(3, "red orange yellow green blue")],
                "doc_id long, text string",
            ),
        )
        probe = spark.createDataFrame(
            [(90, "alpha beta gamma delta epsilon"),
             (91, "red orange yellow green blue"),
             (92, "nothing matches this probe at all")],
            "doc_id long, text string",
        )
        hits = {r.doc_id for r in exact_probe(probe, idx).collect()}
        assert hits == {90, 91}
        # manifest went through the log protocol
        from pathlib import Path

        man = wh / f"{name}__index_manifest.json"
        assert not Path(str(man)).exists()
        assert Path(str(man) + ".d").is_dir()

        dedup_index_delete(idx, spark.createDataFrame(
            [(1,)], "doc_id long"))
        hits = {r.doc_id for r in exact_probe(probe, idx).collect()}
        assert hits == {91}
        dedup_index_compact(idx)
        hits = {r.doc_id for r in exact_probe(probe, idx).collect()}
        assert hits == {91}
    finally:
        FS.clear_fs_override(str(wh / name))


def test_curated_store_end_to_end_on_object_store(spark, tmp_path):
    """The flagship claim at full strength: the curation stream
    (corpus snapshots + `_CURATED` co-manifest + persisted dedup
    index + store mutex) AND a takedown with denylisting, with BOTH
    the corpus root and the index's warehouse paths behind
    object-store semantics — every pointer a log commit, every
    promote a copy+delete rename, zero `replace` calls anywhere."""
    import datetime as dt

    from ods_v3_dbt_spark.pipelines import corpus_takedown, curate_increment_stream
    from ods_v3_dbt_spark.sinks import ParquetTable, _warehouse_path

    SCHEMA = "doc_id long, text string, ingest_ts timestamp"
    src, ckpt = tmp_path / "src", tmp_path / "ckpt"
    corpus, decisions = tmp_path / "corpus", tmp_path / "dec"
    T0 = dt.datetime(2024, 9, 1, 12, 0, 0)
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    fresh = "totally new words nobody used before in any earlier batch"

    fs = FakeObjectFS()
    name = "fakeobjstream_idx"
    wh = _warehouse_path(spark)
    FS.register_fs_override(str(tmp_path), fs)       # corpus + deny arms
    FS.register_fs_override(str(wh / name), fs)      # index members/manifest
    try:
        process = curate_increment_stream(
            corpus, name, str(decisions), num_buckets=2
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

        write([(1, base, T0)])
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

        receipt = corpus_takedown(
            spark, corpus, spark.createDataFrame([(13,)], "doc_id bigint"),
            request_id="req-obj",
        )
        assert receipt["n_removed"] == 1
        got = sorted(
            r.doc_id for r in ParquetTable(corpus).read(spark).collect()
        )
        assert got == [1]

        # resubmission of taken-down content refused at the gate
        write([(31, fresh, T0)])
        drain()
        by_doc = {
            r.doc_id: r.verdict
            for r in spark.read.parquet(str(decisions)).collect()
        }
        assert by_doc[31] == "denied"

        # the whole run never used the non-atomic replace primitive
        assert not [op for op in fs.ops if op[0] == "replace"]
    finally:
        FS.clear_fs_override(str(tmp_path))
        FS.clear_fs_override(str(wh / name))


def test_two_writer_curation_race_on_object_store(spark, tmp_path):
    """Round-12 verdict task 2: the store mutex and the pointer CAS,
    COMPOSED — a curation stream batch racing a corpus_takedown on
    the SAME corpus over object-store semantics. Contract: writers
    either serialize or fail LOUDLY (ConcurrentWriteError /
    PointerCommitConflict) and replay cleanly — never a torn
    ``_CURATED`` pair, never a lost admission or deny row.

    Two arms: (a) deterministic — a held store lock makes the
    contender fail fast with ConcurrentWriteError and the replay
    after release succeeds; (b) concurrent — batch and takedown race
    from two threads with bounded retry-on-conflict, and the final
    state reflects BOTH writers regardless of commit order."""
    import datetime as dt
    import threading

    from ods_v3_dbt_spark.pipelines import (
        _store_lock,
        corpus_takedown,
        curate_increment_stream,
        curated_view,
    )
    from ods_v3_dbt_spark.sinks import (
        ConcurrentWriteError,
        ParquetTable,
        _warehouse_path,
    )

    SCHEMA = "doc_id long, text string, ingest_ts timestamp"
    corpus, decisions = tmp_path / "corpus", tmp_path / "dec"
    T0 = dt.datetime(2024, 9, 1, 12, 0, 0)
    d1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    d2 = "remove me later this text is the takedown target words"
    d3 = "totally new words nobody used before in any earlier batch"

    fs = FakeObjectFS()
    name = "fakeobj_race_idx"
    wh = _warehouse_path(spark)
    FS.register_fs_override(str(tmp_path), fs)
    FS.register_fs_override(str(wh / name), fs)
    try:
        process = curate_increment_stream(
            corpus, name, str(decisions), num_buckets=2
        )

        def batch(rows, bid):
            process(spark.createDataFrame(rows, SCHEMA), bid)

        batch([(1, d1, T0), (2, d2, T0)], 0)

        # (a) deterministic: a takedown contending with a held store
        # lock fails FAST and LOUD, and replays cleanly after release
        with _store_lock(corpus):
            with pytest.raises(ConcurrentWriteError):
                corpus_takedown(
                    spark, corpus,
                    spark.createDataFrame([(2,)], "doc_id bigint"),
                    request_id="req-race",
                )
        # store state untouched by the loser: both docs still live
        assert sorted(
            r.doc_id for r in ParquetTable(corpus).read(spark).collect()
        ) == [1, 2]

        # (b) concurrent: batch admission races the takedown replay;
        # each retries on the loud conflict classes until it lands
        errs: list = []
        conflicts = {"n": 0}
        start = threading.Barrier(2)

        def _retrying(fn):
            start.wait(timeout=60)
            for _ in range(200):
                try:
                    fn()
                    return
                except (ConcurrentWriteError, PointerCommitConflict):
                    conflicts["n"] += 1
                    import time as _t

                    _t.sleep(0.05)
                except Exception as e:  # anything else = torn protocol
                    errs.append(e)
                    return
            errs.append(TimeoutError("writer never landed"))

        ta = threading.Thread(
            target=_retrying, args=(lambda: batch([(3, d3, T0)], 1),)
        )
        tb = threading.Thread(
            target=_retrying,
            args=(
                lambda: corpus_takedown(
                    spark, corpus,
                    spark.createDataFrame([(2,)], "doc_id bigint"),
                    request_id="req-race",
                ),
            ),
        )
        ta.start(), tb.start()
        ta.join(timeout=300), tb.join(timeout=300)
        assert not errs, errs

        # BOTH writers' effects landed, no lost update in either order
        got = sorted(
            r.doc_id for r in ParquetTable(corpus).read(spark).collect()
        )
        assert got == [1, 3]

        # no torn _CURATED pair: the co-manifest resolves to a
        # mutually consistent (corpus snapshot, index epoch) view
        cdf, idx, man = curated_view(spark, corpus)
        assert sorted(r.doc_id for r in cdf.collect()) == [1, 3]
        assert idx.epoch == man["index_epoch"]

        # no lost deny row: resubmission of the taken-down content is
        # refused at the gate
        batch([(31, d2, T0)], 2)
        by_doc = {
            r.doc_id: r.verdict
            for r in spark.read.parquet(str(decisions)).collect()
        }
        assert by_doc[31] == "denied"
        # admission decisions for the racing batch are intact too
        assert by_doc[3] == "admitted"

        # object semantics held throughout: no replace anywhere
        assert not [op for op in fs.ops if op[0] == "replace"]
    finally:
        FS.clear_fs_override(str(tmp_path))
        FS.clear_fs_override(str(wh / name))


def test_no_missing_pointer_window_under_live_commits(spark, tmp_path, objfs):
    """A reader polling current_snapshot() concurrently with a
    committing writer NEVER observes a missing pointer on object
    semantics — the log commit is create-only (the in-place replace
    protocol had a reader-visible delete-then-copy window)."""
    import threading

    t = ParquetTable(tmp_path / "t")
    t.write(spark.range(2).toDF("id"))

    stop = threading.Event()
    misses: list[int] = []
    polls: list[int] = []

    def reader():
        while not stop.is_set():
            polls.append(1)
            if t.current_snapshot() is None:
                misses.append(1)
                return

    th = threading.Thread(target=reader, daemon=True)
    th.start()
    try:
        for i in range(4):
            t.write(spark.range(3 + i).toDF("id"))
    finally:
        stop.set()
        th.join(timeout=30)
    assert not misses and len(polls) > 50
