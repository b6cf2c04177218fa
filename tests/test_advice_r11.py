"""Round-11 advisor findings + round-12 verdict tasks 3/6, pinned.

* compact_append_dir crash window (advisor, sinks.py:1233): the
  retirement intent is recorded in a ``_RETIRE-*.json`` manifest
  before any promote; a compactor dying between promote and retire
  leaves residue the NEXT compact replays to completion — no
  permanent duplicates, no loss, whichever side of the promote the
  crash lands on.
* read_pointer legacy fallback (advisor, fs.py:477): once log
  entries were observed, exhausting the re-list retries raises
  instead of silently serving a stale legacy value / None.
* rows_dropped (advisor, metrics.py:97): exact for the pinned input
  set — measured on the staged parts, immune to concurrent appends.
* PointerCommitConflict bounded retry (verdict task 3): maintenance
  verbs replay on a transient conflict and converge; non-idempotent
  verbs still fail fast.
* MetricsLog path normalization (verdict task 6): aliased spellings
  of one table dir share one live-gauge series map.
"""

from __future__ import annotations

import json

import pytest

from ods_v3_dbt_spark import fs as FS
from ods_v3_dbt_spark.fs import PointerCommitConflict, retry_pointer_conflicts
from ods_v3_dbt_spark.metrics import MetricsLog
from ods_v3_dbt_spark.sinks import compact_append_dir


def _emit_files(spark, log, n, start=0):
    for i in range(start, start + n):
        log.emit(spark, "j", "t", "s", {f"m{i}": (float(i), "rows")})


def test_compact_crash_before_promote_replays_cleanly(spark, tmp_path):
    """Crash AFTER the _RETIRE manifest but BEFORE any promote: the
    next compact finishes the promote, retires the folded inputs, and
    the table holds exactly the original rows — no duplicates, no
    loss."""
    path = tmp_path / "metrics"
    log = MetricsLog(path)
    _emit_files(spark, log, 3)
    assert log.read(spark).count() == 3
    old = [f for f in log.read(spark).inputFiles() if f.endswith(".parquet")]
    assert len(old) == 3

    # hand-build the crash state: staged compacted parts + manifest,
    # promote/retire never ran
    log.read(spark).coalesce(1).write.parquet(str(path / ".compact-dead1"))
    parts = [
        p.name for p in (path / ".compact-dead1").iterdir()
        if p.name.endswith(".parquet")
    ]
    from urllib.parse import unquote, urlparse

    retire = [unquote(urlparse(f).path) for f in old]
    (path / "_RETIRE-dead1.json").write_text(json.dumps({
        "tmp": ".compact-dead1",
        "promote": [[parts[0], "compacted-dead1recover.parquet"]],
        "retire": retire,
    }))
    # reader mid-crash sees the OLD files only (staging is invisible)
    assert log.read(spark).count() == 3

    rep = log.compact(spark)
    assert log.read(spark).count() == 3  # exact — no dup, no loss
    assert not (path / "_RETIRE-dead1.json").exists()
    assert not (path / ".compact-dead1").exists()
    # the recovered file was promoted, then legitimately folded by
    # this compact — the fold's input was the RECOVERED state
    assert rep["files_before"] == 1
    assert rep["rows_dropped"] == 0


def test_compact_crash_after_promote_retires_duplicates(spark, tmp_path):
    """Crash AFTER the promote but BEFORE retiring the inputs — the
    state the round-11 advisor flagged as a PERMANENT duplicate: both
    file sets visible, and the next fold used to bake them in. Now
    the manifest replay deletes the folded inputs first, so the next
    compact lands on the exact original rows."""
    path = tmp_path / "metrics"
    log = MetricsLog(path)
    _emit_files(spark, log, 3)
    old = [f for f in log.read(spark).inputFiles() if f.endswith(".parquet")]

    # promote happened: compacted file in place; inputs NOT retired
    log.read(spark).coalesce(1).write.parquet(str(path / ".compact-dead2"))
    parts = [
        p.name for p in (path / ".compact-dead2").iterdir()
        if p.name.endswith(".parquet")
    ]
    (path / ".compact-dead2" / parts[0]).rename(
        path / "compacted-dead2promoted.parquet"
    )
    import shutil

    shutil.rmtree(path / ".compact-dead2")
    from urllib.parse import unquote, urlparse

    retire = [unquote(urlparse(f).path) for f in old]
    (path / "_RETIRE-dead2.json").write_text(json.dumps({
        "tmp": ".compact-dead2",
        "promote": [[parts[0], "compacted-dead2promoted.parquet"]],
        "retire": retire,
    }))
    # transient duplicates are visible (documented) ...
    assert log.read(spark).count() == 6
    # ... but the next compact replays the retirement and folds the
    # EXACT original rows — the duplicates never become permanent
    log.compact(spark)
    assert log.read(spark).count() == 3
    assert not (path / "_RETIRE-dead2.json").exists()


def test_compact_orphan_staging_dir_swept(spark, tmp_path):
    """A crash BEFORE the manifest leaves only an invisible orphan
    staging dir — swept by the next compact, inputs untouched."""
    path = tmp_path / "metrics"
    log = MetricsLog(path)
    _emit_files(spark, log, 2)
    log.read(spark).coalesce(1).write.parquet(str(path / ".compact-orphan"))
    assert log.read(spark).count() == 2
    log.compact(spark)
    assert not (path / ".compact-orphan").exists()
    assert log.read(spark).count() == 2


def test_compact_rows_dropped_exact_under_concurrent_append(
    spark, tmp_path, monkeypatch
):
    """rows_dropped is measured on the staged parts of the PINNED
    input set — an append landing mid-fold neither skews it negative
    nor counts as dropped (round-11 advisor, metrics.py:97 /
    sinks.py:1246)."""
    path = tmp_path / "metrics"
    log = MetricsLog(path)
    _emit_files(spark, log, 3)

    # inject an append between the fold's pin and its promote by
    # hooking the staging write via fs.write_text_atomic (the first
    # post-stage step) — i.e. the append lands mid-compact
    orig = FS.LocalFS.write_text_atomic
    fired = {"done": False}

    def hook(self, p, content):
        if "_RETIRE-" in str(p) and not fired["done"]:
            fired["done"] = True
            _emit_files(spark, log, 1, start=100)
        return orig(self, p, content)

    monkeypatch.setattr(FS.LocalFS, "write_text_atomic", hook)
    rep = log.compact(spark)
    assert fired["done"]
    assert rep["rows_dropped"] == 0  # nothing expired; never negative
    assert rep["files_before"] == 3
    # pinned rows + the mid-fold append both survive
    assert log.read(spark).count() == 4


def test_read_pointer_raises_when_log_entries_unreadable(tmp_path):
    """Entries observed + every max-seq read racing away is an
    anomaly, not 'table missing': read_pointer raises instead of
    falling through to the stale legacy file (round-11 advisor,
    fs.py:477)."""

    class VanishingFS(FS.LocalFS):
        def read_text(self, p):
            if str(p).endswith(".ptr"):
                raise FileNotFoundError(str(p))
            return super().read_text(p)

    ptr = tmp_path / "_CURRENT"
    FS.commit_pointer(FS.LocalFS(), ptr, "snap-legacy")  # legacy file
    d = tmp_path / "_CURRENT.d"
    d.mkdir()
    (d / f"{1:020d}.ptr").write_text("snap-log")
    with pytest.raises(RuntimeError, match="pointer log"):
        FS.read_pointer(VanishingFS(), ptr)
    # empty log dir still falls back to the legacy file (unchanged)
    (d / f"{1:020d}.ptr").unlink()
    assert FS.read_pointer(VanishingFS(), ptr) == "snap-legacy"


def test_retry_pointer_conflicts_bounded():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise PointerCommitConflict("transient")
        return "ok"

    assert retry_pointer_conflicts(flaky, attempts=3, base_sleep_s=0.0) == "ok"
    assert calls["n"] == 3

    calls["n"] = 0
    with pytest.raises(PointerCommitConflict):
        retry_pointer_conflicts(flaky, attempts=2, base_sleep_s=0.0)
    assert calls["n"] == 2  # bounded — no infinite spin


def test_maintain_indexes_retries_transient_conflict(spark, tmp_path):
    """Verdict task 3 end-to-end: a PointerCommitConflict injected
    into the FIRST manifest commit of an index fold makes the
    maintenance verb replay and converge (second attempt folds
    cleanly); the injected conflict is not swallowed silently —
    exhausting retries re-raises (checked via conflict_retries=0)."""
    from ods_v3_dbt_spark.jobs import maintain_indexes
    from ods_v3_dbt_spark.operators.neardup_index import (
        dedup_index_append,
        dedup_index_write,
        exact_probe,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"),
         (2, "one two three four five six")],
        "doc_id long, text string",
    )
    idx = dedup_index_write(docs, "t_r12_retry_idx", num_buckets=2)
    dedup_index_append(idx, spark.createDataFrame(
        [(3, "red orange yellow green blue")], "doc_id long, text string"))
    assert len(idx.resolve(spark).segments) == 2  # multi-segment → folds

    real = FS.commit_pointer
    state = {"fail_next": True}

    def flaky_commit(fs, ptr, value, retain=8, fence=None):
        if state["fail_next"] and "index_manifest" in str(ptr):
            state["fail_next"] = False
            raise PointerCommitConflict("injected")
        return real(fs, ptr, value, retain=retain, fence=fence)

    import unittest.mock as mock

    # fail fast when retries are exhausted (non-idempotent posture)
    state["fail_next"] = True
    with mock.patch.object(FS, "commit_pointer", flaky_commit):
        with pytest.raises(PointerCommitConflict):
            maintain_indexes(spark, [idx], conflict_retries=0)
        # bounded retry: replays once and converges
        state["fail_next"] = True
        reports = maintain_indexes(spark, [idx], conflict_retries=2)
    assert len(idx.resolve(spark).segments) == 1  # folded
    assert any(r["compacted"] for r in reports)
    probe = spark.createDataFrame(
        [(90, "alpha beta gamma delta epsilon")], "doc_id long, text string")
    assert {r.doc_id for r in exact_probe(probe, idx).collect()} == {90}


def test_metricslog_path_aliases_share_one_series(spark, tmp_path):
    """Verdict task 6: `path` and `path + '/'` (and a dot segment)
    key the SAME live map — one series set, no splits."""
    p = str(tmp_path / "m")
    a = MetricsLog(p)
    b = MetricsLog(p + "/")
    c = MetricsLog(str(tmp_path / "." / "m"))
    assert a.path == b.path == c.path
    a.emit(spark, "j", "t", "s", {"x": (1.0, "rows")})
    b.emit(spark, "j", "t", "s", {"x": (2.0, "rows")})  # same series
    lines = c.statsd_lines(None)
    assert lines == ["ods.j.t.s.x:2|g"]  # one series, latest value

    # URI spelling: trailing-slash alias normalizes too (no FS trip)
    u = MetricsLog("s3a://bucket/metrics/")
    v = MetricsLog("s3a://bucket/metrics")
    assert u.path == v.path


def test_index_rebuild_spec_migration(spark):
    """Round-12 verdict task 8: `dedup_index_rebuild(new_spec)` is a
    one-verb migration — rebuild ≡ build-from-scratch equivalence,
    pinned pre-migration epochs survive and stay resolvable by the
    OLD-spec handle, and stale old-spec handles refuse loudly on the
    current epoch."""
    from ods_v3_dbt_spark.operators.neardup_index import (
        DedupIndex,
        dedup_index_rebuild,
        dedup_index_write,
        exact_probe,
        neardup_probe,
        set_index_pin,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "one two three four five six seven"),
         (3, "red orange yellow green blue indigo")],
        "doc_id long, text string",
    )
    old = dedup_index_write(docs, "t_r12_rebuild_idx", shingle_n=3,
                            num_buckets=2)
    pinned_epoch = old.resolve(spark).epoch
    set_index_pin(spark, old.name, "trainer-1", [pinned_epoch])
    try:
        # migrate to 5-gram shingles
        new = DedupIndex("t_r12_rebuild_idx", shingle_n=5, num_buckets=2)
        dedup_index_rebuild(docs, new)

        # rebuild ≡ from-scratch: probe results match a fresh 5-gram
        # build of the same corpus
        fresh = dedup_index_write(docs, "t_r12_rebuild_fresh",
                                  shingle_n=5, num_buckets=2)
        probe = spark.createDataFrame(
            [(90, "alpha beta gamma delta epsilon zeta"),
             (91, "nothing matches this probe text here")],
            "doc_id long, text string",
        )
        got = {r.doc_id for r in exact_probe(probe, new).collect()}
        want = {r.doc_id for r in exact_probe(probe, fresh).collect()}
        assert got == want == {90}
        nd_got = sorted(
            (r.doc_id, r.corpus_id)
            for r in neardup_probe(probe, new, threshold_ppm=400_000).collect()
        )
        nd_want = sorted(
            (r.doc_id, r.corpus_id)
            for r in neardup_probe(probe, fresh,
                                   threshold_ppm=400_000).collect()
        )
        assert nd_got == nd_want

        # pinned pre-migration epoch survives: the OLD-spec handle
        # resolves it and probes through it
        old_handle = DedupIndex("t_r12_rebuild_idx", shingle_n=3,
                                num_buckets=2)
        pinned = old_handle.resolve(spark, epoch=pinned_epoch)
        assert pinned.epoch == pinned_epoch
        # ...while the CURRENT epoch refuses the stale handle loudly
        import pytest as _pytest

        with _pytest.raises(ValueError, match="index-spec mismatch"):
            old_handle.resolve(spark)
        # and the new handle cannot resolve the old-spec pinned epoch
        with _pytest.raises(ValueError, match="index-spec mismatch"):
            new.resolve(spark, epoch=pinned_epoch)

        # post-migration increments run on the new spec
        from ods_v3_dbt_spark.operators.neardup_index import (
            dedup_index_append,
        )

        dedup_index_append(new, spark.createDataFrame(
            [(4, "completely novel appended words arrive here now")],
            "doc_id long, text string"))
        probe2 = spark.createDataFrame(
            [(92, "completely novel appended words arrive here now")],
            "doc_id long, text string")
        assert {r.doc_id for r in exact_probe(probe2, new).collect()} == {92}
    finally:
        set_index_pin(spark, "t_r12_rebuild_idx", "trainer-1", None)


def test_curated_store_migrate_end_to_end(spark, tmp_path):
    """Round-12: `curated_store_migrate` re-specs a LIVE curated
    store's text index in one verb — the pair republishes, a stream
    restarted with matching parameters continues catching dups of
    pre-migration content THROUGH the migrated index (no inline
    rebuild at the next batch), the previous pinned pair survives,
    and a takedown still honors through the new spec."""
    import datetime as dt

    from ods_v3_dbt_spark.operators.neardup_index import DedupIndex
    from ods_v3_dbt_spark.pipelines import (
        corpus_takedown,
        curate_increment_stream,
        curated_store_migrate,
        curated_view,
    )

    SCHEMA = "doc_id long, text string, ingest_ts timestamp"
    corpus, decisions = tmp_path / "corpus", tmp_path / "dec"
    T0 = dt.datetime(2024, 9, 1, 12, 0, 0)
    d1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    d2 = "one two three four five six seven eight nine ten eleven"

    def batch(process, rows, bid):
        process(spark.createDataFrame(rows, SCHEMA), bid)

    name = "t_r12_migrate_idx"
    p3 = curate_increment_stream(corpus, name, str(decisions), num_buckets=2)
    batch(p3, [(1, d1, T0), (2, d2, T0)], 0)

    # hold a pinned view of the pre-migration pair
    _, _pinned_idx, pinned_man = curated_view(spark, corpus,
                                              pin_id="trainer-m")
    assert pinned_man["index_spec"]["shingle_n"] == 3

    receipt = curated_store_migrate(
        spark, corpus, DedupIndex(name, 5, 2))
    assert receipt["index_spec"]["shingle_n"] == 5
    assert receipt["previous_spec"]["shingle_n"] == 3

    # a wrong-name handle is refused loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="different name"):
        curated_store_migrate(spark, corpus, DedupIndex("other_idx", 5, 2))

    # the republished pair resolves at the new spec
    cdf, idx, man = curated_view(spark, corpus)
    assert man["index_spec"]["shingle_n"] == 5
    assert sorted(r.doc_id for r in cdf.collect()) == [1, 2]

    # stream restarted with MATCHING parameters: an exact dup of
    # pre-migration content is caught through the migrated index
    p5 = curate_increment_stream(corpus, name, str(decisions),
                                 num_buckets=2, shingle_n=5)
    batch(p5, [(11, d1, T0),
               (12, "fresh words that match nothing else at all ok", T0)], 1)
    by_doc = {
        r.doc_id: r.verdict
        for r in spark.read.parquet(str(decisions)).collect()
    }
    assert by_doc[11] == "dup_exact_existing"
    assert by_doc[12] == "admitted"
    # and the index was NOT self-migrated/rebuilt back: still epoch'd
    # forward from the migration (append only), spec unchanged
    cur = DedupIndex(name, 5, 2).resolve(spark)
    assert cur.epoch >= receipt["index_epoch"]

    # the pinned pre-migration pair is still resolvable (old handle,
    # pinned epoch — spec_history keeps it readable)
    old_handle = DedupIndex(name, 3, 2)
    assert old_handle.resolve(
        spark, epoch=pinned_man["index_epoch"]
    ).epoch == pinned_man["index_epoch"]

    # takedown still honors through the migrated store
    receipt2 = corpus_takedown(
        spark, corpus, spark.createDataFrame([(1,)], "doc_id bigint"),
        request_id="req-m",
    )
    assert receipt2["n_removed"] == 1
    batch(p5, [(21, d1, T0)], 2)
    by_doc = {
        r.doc_id: r.verdict
        for r in spark.read.parquet(str(decisions)).collect()
    }
    assert by_doc[21] == "denied"


def test_read_pointer_emptied_log_reports_none(tmp_path):
    """A log dir that EMPTIES mid-read (concurrent table delete /
    store teardown) reports the table nonexistent — never the stale
    pre-migration legacy value, never the anomaly error reserved for
    entries that persist but stay unreadable (round-12 self-review,
    finding 3)."""

    class EmptyingFS(FS.LocalFS):
        def __init__(self):
            self.calls = 0

        def list(self, p):
            self.calls += 1
            if self.calls == 1:
                return [(f"{1:020d}.ptr", False, 10)]
            return []

        def read_text(self, p):
            if str(p).endswith(".ptr"):
                raise FileNotFoundError(str(p))
            return super().read_text(p)

    ptr = tmp_path / "_CURRENT"
    ptr.write_text("snap-legacy-stale")  # migrated store's stale file
    assert FS.read_pointer(EmptyingFS(), ptr) is None


def test_metricslog_file_uri_alias_shares_series(spark, tmp_path):
    """'file:///x' and '/x' name ONE table: the live-map key unwraps
    the file: scheme while self.path keeps the caller's spelling
    (different I/O targets on HDFS-default clusters) — round-12
    self-review, finding 4."""
    bare = str(tmp_path / "m2")
    a = MetricsLog(f"file://{bare}")
    b = MetricsLog(bare)
    assert a._key == b._key
    assert a.path != b.path  # I/O spelling preserved
    a.emit(spark, "j", "t", "s", {"y": (5.0, "rows")})
    assert b.statsd_lines(None) == ["ods.j.t.s.y:5|g"]
