"""Round-10 verdict tasks 2 & 4 — deny-store provenance/expiry and
the zero-count-jobs micro-batch gate.

* ``corpus_takedown(request_id=, deny_expires_at=)`` stamps every
  deny row with per-request provenance;
* ``deny_release(request_id=...)`` releases exactly that request's
  rows — the verdict's named incident class: releasing one of two
  NEAR-COPY takedowns must NOT weaken the other even though their
  content shares band keys (content-keyed release, the old only
  verb, removes shared residues for both);
* ``deny_expire`` / ``maintain_curated_store`` purge time-bounded
  holds;
* the streaming gate sizes its broadcast choice from the
  ``_DENY_COUNTS`` sidecar — zero per-batch ``count()`` jobs on the
  deny tables (round-10 "what's wrong" #2).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tests.test_takedown import (  # reuse the seeded curation store
    BASE,
    FRESH,
    OTHER,
    SCHEMA,
    T0,
    _seed_store,
)

# three one-word perturbations of one sentence, chosen so their
# deny band keys overlap under the persisted md5 family (verified:
# NEAR1∩NEAR2 = 3 bands, NEAR2∩NEAR3 = 3 bands) — the
# shared-residue case the request scope exists for
_S = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "sleepy badgers watch from the mossy riverbank at {}"
)
NEAR1 = _S.format("night")
NEAR2 = _S.format("sunrise")
NEAR3 = _S.format("twilight")


def _decisions(spark, tmp_path) -> dict:
    return {
        r.doc_id: r.verdict
        for r in spark.read.parquet(str(tmp_path / "decisions")).collect()
    }


def test_release_by_request_survives_shared_residues(spark, tmp_path):
    """Take down two near-copies under two request ids; release ONE
    by request id; a resubmission of the other's content is STILL
    refused (denied_neardup) — its request's rows are its own, even
    for band keys the released request also held."""
    from ods_v3_dbt_spark.pipelines import corpus_takedown, deny_release
    from ods_v3_dbt_spark.sinks import ParquetTable

    corpus, process, write, drain = _seed_store(spark, tmp_path, "tk_reqrel")

    # plant the two near-copies directly in the corpus (the gate
    # would reject the second as a near-dup of the first — takedown
    # provenance is what's under test, not admission)
    tbl = ParquetTable(corpus)
    cur = tbl.read(spark)
    planted = spark.createDataFrame(
        [(101, NEAR1), (102, NEAR2)], "doc_id long, text string"
    ).select(*cur.columns)
    tbl.write(cur.unionByName(planted))

    corpus_takedown(
        spark, corpus, spark.createDataFrame([(101,)], "doc_id bigint"),
        request_id="req-A",
    )
    corpus_takedown(
        spark, corpus, spark.createDataFrame([(102,)], "doc_id bigint"),
        request_id="req-B",
    )
    sig = ParquetTable(f"{corpus}__deny_sig").read(spark)
    assert {"band_idx", "band_key", "request_id", "expires_at"} <= set(
        sig.columns
    )
    reqs = {r.request_id for r in sig.select("request_id").distinct().collect()}
    assert reqs == {"req-A", "req-B"}
    # the near-copies DO share band keys — the collision the
    # request scope exists for
    shared = (
        sig.groupBy("band_idx", "band_key")
        .agg(F.countDistinct("request_id").alias("n"))
        .filter(F.col("n") == 2)
        .count()
    )
    assert shared > 0

    receipt = deny_release(spark, corpus, request_id="req-A")
    assert receipt["bands_removed"] > 0 and receipt["fps_removed"] == 1
    # req-B rows intact, including the previously-shared keys
    left = ParquetTable(f"{corpus}__deny_sig").read(spark)
    assert left.filter(F.col("request_id") == "req-B").count() == \
        sig.filter(F.col("request_id") == "req-B").count()

    # gate: a perturbation of the STILL-DENIED doc refuses via the
    # band arm (fresh fp, shared bands with NEAR2's req-B rows) —
    # under content-keyed release of NEAR1 those shared keys would
    # be gone and this would wrongly admit
    write([(111, NEAR3, T0)])
    drain()
    assert _decisions(spark, tmp_path)[111] == "denied_neardup"

    # releasing req-B too clears the arm for that content entirely
    deny_release(spark, corpus, request_id="req-B")
    write([(112, NEAR1, T0)])
    drain()
    assert _decisions(spark, tmp_path)[112] == "admitted"


def test_release_scope_validation(spark, tmp_path):
    from ods_v3_dbt_spark.pipelines import deny_release

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="exactly one scope"):
        deny_release(spark, tmp_path / "nostore")
    with pytest.raises(ValueError, match="exactly one scope"):
        deny_release(spark, tmp_path / "nostore", docs=docs,
                     request_id="req-X")


def test_release_by_request_skips_unattributed_rows(spark, tmp_path):
    """Legacy rows (NULL request_id) are never touched by a
    request-scoped release — content-keyed release remains their
    only way out."""
    from ods_v3_dbt_spark.pipelines import corpus_takedown, deny_release
    from ods_v3_dbt_spark.sinks import ParquetTable

    corpus, process, write, drain = _seed_store(spark, tmp_path, "tk_legacy")
    # legacy takedown: no request id
    corpus_takedown(
        spark, corpus, spark.createDataFrame([(13,)], "doc_id bigint")
    )
    n_sig = ParquetTable(f"{corpus}__deny_sig").read(spark).count()
    receipt = deny_release(spark, corpus, request_id="req-nope")
    assert receipt == {"fps_removed": 0, "bands_removed": 0,
                       "request_id": "req-nope"}
    assert ParquetTable(f"{corpus}__deny_sig").read(spark).count() == n_sig

    # content-keyed release still works for them
    receipt = deny_release(
        spark, corpus,
        docs=spark.createDataFrame([(13, FRESH)], "doc_id long, text string"),
    )
    assert receipt["fps_removed"] == 1 and receipt["bands_removed"] > 0


def test_deny_expiry_via_maintenance(spark, tmp_path):
    """A time-bounded takedown stops gating once the hold lapses and
    the weekly verb runs; an unbounded takedown survives the purge."""
    from ods_v3_dbt_spark.jobs import maintain_curated_store
    from ods_v3_dbt_spark.pipelines import corpus_takedown
    from ods_v3_dbt_spark.sinks import ParquetTable

    corpus, process, write, drain = _seed_store(spark, tmp_path, "tk_expiry")
    corpus_takedown(
        spark, corpus, spark.createDataFrame([(13,)], "doc_id bigint"),
        request_id="req-hold",
        deny_expires_at="2020-01-01T00:00:00",  # already lapsed
    )
    corpus_takedown(
        spark, corpus, spark.createDataFrame([(14,)], "doc_id bigint"),
        request_id="req-forever",
    )
    report = maintain_curated_store(spark, corpus)
    exp = report["deny_expired"]
    assert exp["fps_expired"] == 1 and exp["bands_expired"] > 0

    deny = ParquetTable(f"{corpus}__deny").read(spark)
    assert {r.request_id for r in deny.collect()} == {"req-forever"}

    # gate: lapsed hold readmits, standing hold still refuses
    write([(61, FRESH, T0), (62, OTHER, T0)])
    drain()
    verdicts = _decisions(spark, tmp_path)
    assert verdicts[61] == "admitted"
    assert verdicts[62] == "denied"


def test_deny_expire_null_never_expires(spark, tmp_path):
    from ods_v3_dbt_spark.pipelines import corpus_takedown, deny_expire
    from ods_v3_dbt_spark.sinks import ParquetTable

    corpus, process, write, drain = _seed_store(spark, tmp_path, "tk_noexp")
    corpus_takedown(
        spark, corpus, spark.createDataFrame([(13,)], "doc_id bigint"),
        request_id="req-1",
    )
    receipt = deny_expire(
        spark, corpus, now=dt.datetime(2099, 1, 1)
    )
    assert receipt["fps_expired"] == 0 and receipt["bands_expired"] == 0
    assert ParquetTable(f"{corpus}__deny").read(spark).count() == 1


def test_stream_gate_uses_cached_counts_not_count_jobs(
    spark, tmp_path, monkeypatch
):
    """After a takedown, every micro-batch gate call receives the
    sidecar total (deny_count not None) — deny_probe runs ZERO
    count() jobs on the deny tables; a store whose sidecar predates
    the feature backfills it once."""
    import ods_v3_dbt_spark.pipelines as P
    from ods_v3_dbt_spark.pipelines import (
        _deny_counts_path,
        _read_deny_counts,
        corpus_takedown,
    )

    corpus, process, write, drain = _seed_store(spark, tmp_path, "tk_counts")
    corpus_takedown(
        spark, corpus, spark.createDataFrame([(13,)], "doc_id bigint"),
        request_id="req-C",
    )
    counts = _read_deny_counts(corpus)
    assert counts is not None and counts["fps"] == 1 and counts["bands"] > 0

    seen: list = []
    real = P.deny_probe

    def spy(*args, **kwargs):
        seen.append(kwargs.get("deny_count"))
        assert kwargs.get("deny_count") is not None, (
            "micro-batch gate must pass the precomputed sidecar total"
        )
        # make an actual count() on a deny side a loud failure
        for df in (args[1], args[2], kwargs.get("deny_sem")):
            if df is not None:
                df.count = _forbidden  # instance attr shadows method
        return real(*args, **kwargs)

    def _forbidden():
        raise AssertionError("deny-arm count() job on the hot path")

    monkeypatch.setattr(P, "deny_probe", spy)
    write([(71, "wholly novel content for the counts test", T0)])
    drain()
    assert len(seen) == 1 and seen[0] == sum(counts.values())

    # legacy store: sidecar missing → ONE backfill, then cached
    from ods_v3_dbt_spark import fs as FS

    p = _deny_counts_path(corpus)
    FS.fs_for(p).delete(p, recursive=False)
    write([(72, "another novel doc after sidecar loss", T0)])
    drain()
    assert _read_deny_counts(corpus) == counts  # backfilled
    assert len(seen) == 2 and seen[1] == sum(counts.values())


def test_stream_semantic_recall_telemetry(spark, tmp_path):
    """Round-10 verdict task 6: with a ``metrics_log`` attached, the
    semantic channel emits a sampled ``ivf_index_recall_ppm`` gauge
    every ``recall_probe_every`` micro-batches — the between-
    maintenance drift signal (alert floor = the refresh gate's
    900_000 ppm, SCALE.md)."""
    import random

    from ods_v3_dbt_spark.metrics import MetricsLog
    from ods_v3_dbt_spark.pipelines import curate_increment_stream

    random.seed(7)
    SEM_SCHEMA = (
        "doc_id long, text string, embedding array<double>, "
        "ingest_ts timestamp"
    )
    vecs = [[random.uniform(-1, 1) for _ in range(8)] for _ in range(4)]
    src, ckpt = tmp_path / "src", tmp_path / "ckpt"
    corpus, dec = tmp_path / "corpus", tmp_path / "dec"
    mlog = MetricsLog(tmp_path / "mlog")
    process = curate_increment_stream(
        corpus, "t_recall_tel", str(dec), num_buckets=2,
        embedding_col="embedding", ivf_cells=2,
        metrics_log=mlog, recall_probe_every=1, recall_probe_sample=8,
    )

    def write(rows):
        spark.createDataFrame(rows, SEM_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    def drain():
        q = (
            spark.readStream.schema(SEM_SCHEMA).parquet(str(src))
            .writeStream.foreachBatch(process)
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    write([(1, "alpha beta gamma delta epsilon", vecs[0], T0),
           (2, "one two three four five", vecs[1], T0)])
    drain()  # batch 0: trains the first IVF epoch (no probe yet)
    write([(3, "red orange yellow green blue", vecs[2], T0)])
    drain()  # batch 1+: index ready → telemetry emits
    rows = [
        r for r in mlog.read(spark).collect()
        if r.metric == "ivf_index_recall_ppm"
    ]
    assert rows, "semantic recall gauge never emitted"
    r = rows[-1]
    assert r.job_id == "curation:t_recall_tel" and r.stage == "semantic_recall"
    assert 0 <= r.value <= 1_000_000 and r.unit == "ppm"


def test_release_and_takedown_receipts_carry_request_id(spark, tmp_path):
    """Compliance audit trail: takedown and release receipts record
    the request id, and deny_release(run_log=) lands in the
    run-metadata table like the takedown itself (O11 discipline)."""
    from ods_v3_dbt_spark.pipelines import corpus_takedown, deny_release
    from ods_v3_dbt_spark.runlog import RunLog

    corpus, process, write, drain = _seed_store(spark, tmp_path, "tk_audit")
    rl = RunLog(tmp_path / "runs")
    receipt = corpus_takedown(
        spark, corpus, spark.createDataFrame([(13,)], "doc_id bigint"),
        request_id="req-42", run_log=rl, job_id="gdpr-42",
    )
    assert receipt["request_id"] == "req-42"
    rel = deny_release(spark, corpus, request_id="req-42",
                       run_log=rl, job_id="gdpr-42-withdrawn")
    assert rel["request_id"] == "req-42" and rel["fps_removed"] == 1
    rows = {(r.job_id, r.task_id) for r in rl.read(spark).collect()}
    assert ("gdpr-42", "corpus_takedown") in rows
    assert ("gdpr-42-withdrawn", "deny_release") in rows


def test_maintenance_still_vacuums_corpus_snapshots(spark, tmp_path):
    """Regression (round-11 self-review): wiring deny expiry into
    maintain_curated_store must not displace the corpus vacuum —
    the weekly verb still retires snapshots beyond ``keep``."""
    from ods_v3_dbt_spark.jobs import maintain_curated_store
    from ods_v3_dbt_spark.sinks import ParquetTable

    corpus, process, write, drain = _seed_store(spark, tmp_path, "tk_vac")
    # several more admissions → several more snapshots
    for i, t in enumerate([
        "one two three four five six seven",
        "red orange yellow green blue indigo",
        "north south east west up down around",
    ]):
        write([(40 + i, t, T0)])
        drain()
    tbl = ParquetTable(corpus)
    n_before = len(tbl.history())
    assert n_before >= 3  # the loop's own keep=3 retention
    report = maintain_curated_store(spark, corpus, keep=1)
    assert "deny_expired" in report  # the new arm ran too
    # vacuum honored keep (live/prev pair pins can retain a couple
    # extra; what must NOT happen is 'no snapshot ever retired')
    n_after = len(tbl.history())
    assert n_after < n_before
