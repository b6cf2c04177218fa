"""corpus_takedown — right-to-be-forgotten across a curated store:
the corpus table and every derived index drop a doc set, one
consistent pointer commit publishes the pair, and a taken-down doc
can no longer be retrieved through ANY probe path. Reference analog:
M6 DELETE semantics (casreport_rpt_full_item.sql:1-3) extended to a
table + its index fleet."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

SCHEMA = "doc_id long, text string, ingest_ts timestamp"
T0 = dt.datetime(2024, 9, 1, 12, 0, 0)
BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
FRESH = "totally new words nobody used before in any earlier batch"
OTHER = "unrelated vocabulary occupying its own lexical island entirely"


def _seed_store(spark, tmp_path, name):
    """Two micro-batches through the production curation loop —
    corpus {1, 13, 14} with the persisted dedup index in step."""
    from ods_v3_dbt_spark.pipelines import curate_increment_stream

    src, ckpt = tmp_path / "src", tmp_path / "ckpt"
    corpus, decisions = tmp_path / "corpus", tmp_path / "decisions"
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

    write([(1, BASE, T0)])
    drain()
    write([(13, FRESH, T0), (14, OTHER, T0)])
    drain()
    return corpus, process, write, drain


def test_takedown_removes_from_corpus_and_every_index(spark, tmp_path):
    from ods_v3_dbt_spark.operators.text_index import (
        bm25_index_topk,
        bm25_index_write,
    )
    from ods_v3_dbt_spark.operators.vector_index import (
        ivf_index_topk,
        ivf_index_write,
    )
    from ods_v3_dbt_spark.pipelines import corpus_takedown, curated_view
    from ods_v3_dbt_spark.sinks import ParquetTable

    corpus, process, write, drain = _seed_store(spark, tmp_path, "tk_idx")
    docs = ParquetTable(corpus).read(spark)
    assert sorted(r.doc_id for r in docs.select("doc_id").collect()) == [
        1, 13, 14,
    ]

    # derived state beyond the curation index: BM25 + IVF over the
    # same doc ids (embeddings keyed by doc_id as vec_id)
    bm = bm25_index_write(docs, "tk_bm25", num_buckets=2)
    import random

    random.seed(3)
    emb = spark.createDataFrame(
        [
            (i, [random.uniform(-1, 1) for _ in range(8)])
            for i in (1, 13, 14)
        ],
        "vec_id bigint, embedding array<double>",
    )
    iv = ivf_index_write(emb, "tk_ivf", num_cells=2, num_buckets=2)

    # doc 13 is retrievable pre-takedown through every path
    assert 13 in {
        r.doc_id
        for r in bm25_index_topk(spark, bm, ["totally", "new"], k=3).collect()
    }
    assert 13 in {
        r.neighbor_id
        for r in ivf_index_topk(
            spark, iv, emb.filter("vec_id = 13"), k=3, nprobe=2
        ).collect()
    }

    receipt = corpus_takedown(
        spark,
        corpus,
        spark.createDataFrame([(13,)], "doc_id bigint"),
        extra_indexes=(bm, iv),
    )
    assert receipt["n_removed"] == 1

    # corpus: gone; consistent view pairs the reduced corpus with the
    # post-delete index epoch
    view_docs, ridx, man = curated_view(spark, corpus)
    assert sorted(r.doc_id for r in view_docs.select("doc_id").collect()) == [
        1, 14,
    ]
    assert man["index_epoch"] == receipt["index_epoch"]
    assert man.get("takedown") is True

    # BM25: doc 13 unretrievable, and scores equal a rebuild without it
    got = [
        (r.rank, r.doc_id, r.score_micro)
        for r in bm25_index_topk(spark, bm, ["totally", "new"], k=3).collect()
    ]
    ref = bm25_index_write(
        docs.filter("doc_id <> 13"), "tk_bm25_ref", num_buckets=2
    )
    assert got == [
        (r.rank, r.doc_id, r.score_micro)
        for r in bm25_index_topk(spark, ref, ["totally", "new"], k=3).collect()
    ]
    assert not any(d == 13 for (_, d, _) in got)

    # IVF: its own embedding no longer finds it
    assert 13 not in {
        r.neighbor_id
        for r in ivf_index_topk(
            spark, iv, emb.filter("vec_id = 13"), k=3, nprobe=2
        ).collect()
    }

    # curation index: the taken-down doc's exact text probes clean,
    # so a re-submission is genuinely NEW (documented re-ingestion
    # policy: delete-then-re-add ≡ never deleted)
    from ods_v3_dbt_spark.operators.neardup_index import exact_probe
    from ods_v3_dbt_spark.pipelines import _index_from_manifest

    probe = spark.createDataFrame([(99, FRESH)], "doc_id long, text string")
    idx = _index_from_manifest(man)
    assert exact_probe(probe, idx).count() == 0

    # replay: a second identical takedown is a no-op converging on
    # the same terminal state
    receipt2 = corpus_takedown(
        spark,
        corpus,
        spark.createDataFrame([(13,)], "doc_id bigint"),
        extra_indexes=(bm, iv),
    )
    assert receipt2["n_removed"] == 0
    assert receipt2["index_epoch"] == receipt["index_epoch"]


def test_takedown_pinned_epoch_time_travel_then_retire(spark, tmp_path):
    """A reader that PINNED the pre-takedown pair keeps its view
    (time travel is the point of pins); releasing the pin and one
    more refresh retires the old epoch — the taken-down doc then
    resolves NOWHERE."""
    from ods_v3_dbt_spark.pipelines import (
        _index_from_manifest,
        corpus_takedown,
        curated_view,
        release_curated_view,
    )

    corpus, process, write, drain = _seed_store(spark, tmp_path, "tk_pin")
    pre_docs, pre_idx, pre_man = curated_view(spark, corpus, pin_id="aud")
    assert 13 in {r.doc_id for r in pre_docs.select("doc_id").collect()}

    corpus_takedown(
        spark, corpus, spark.createDataFrame([(13,)], "doc_id bigint")
    )

    # pinned pre-takedown pair still readable (audit window)
    pre_docs2, pre_idx2, _ = curated_view(spark, corpus, pin_id="aud")
    # the pin resolves the CURRENT manifest; re-resolve the ORIGINAL
    # epoch explicitly — pinned, so it must still attach
    idx = _index_from_manifest(pre_man)
    old = idx.resolve(spark, epoch=pre_man["index_epoch"])
    assert old.epoch == pre_man["index_epoch"]

    # release + one more refresh (a new batch through the loop) →
    # the pre-takedown epoch ages out of retention and is collected
    release_curated_view(spark, corpus, "aud")
    write([(21, "yet another brand new document body arriving", T0)])
    drain()
    write([(22, "and one more to push retention past the pair", T0)])
    drain()
    with pytest.raises(FileNotFoundError):
        idx.resolve(spark, epoch=pre_man["index_epoch"])
    # and the current view still lacks the taken-down doc
    cur_docs, _, _ = curated_view(spark, corpus)
    ids = {r.doc_id for r in cur_docs.select("doc_id").collect()}
    assert 13 not in ids and {21, 22} <= ids


def test_takedown_requires_curated_store(spark, tmp_path):
    from ods_v3_dbt_spark.pipelines import corpus_takedown
    from ods_v3_dbt_spark.sinks import ParquetTable

    tbl = ParquetTable(tmp_path / "bare")
    tbl.write(spark.createDataFrame([(1, "x")], "doc_id long, text string"))
    with pytest.raises(FileNotFoundError, match="_CURATED"):
        corpus_takedown(
            spark,
            tmp_path / "bare",
            spark.createDataFrame([(1,)], "doc_id bigint"),
        )


def test_denylist_blocks_reingestion_of_taken_down_content(spark, tmp_path):
    """corpus_takedown(deny=True) records content fingerprints in the
    persistent denylist; a later submission of IDENTICAL text under a
    fresh doc_id is refused at the gate (verdict ``denied``, never
    admitted, never indexed), while new content flows normally. The
    denylist stores fingerprints only — no retained text."""
    from ods_v3_dbt_spark.pipelines import corpus_takedown
    from ods_v3_dbt_spark.sinks import ParquetTable

    corpus, process, write, drain = _seed_store(spark, tmp_path, "tk_deny")
    corpus_takedown(
        spark, corpus, spark.createDataFrame([(13,)], "doc_id bigint")
    )
    deny = ParquetTable(f"{corpus}__deny")
    assert deny.exists()
    assert sorted(deny.read(spark).columns) == ["expires_at", "fp", "request_id"]

    # identical text, new id -> denied; fresh content -> admitted
    write([(31, FRESH, T0),
           (32, "genuinely novel material for the denylist test", T0)])
    drain()
    verdicts = {
        r.doc_id: r.verdict for r in spark.read.parquet(
            str(tmp_path / "decisions")
        ).collect()
    }
    assert verdicts[31] == "denied"
    assert verdicts[32] == "admitted"
    ids = {r.doc_id for r in ParquetTable(corpus).read(spark).collect()}
    assert 31 not in ids and 32 in ids

    # the denied text is not in the curation index either
    from ods_v3_dbt_spark.operators.neardup_index import exact_probe
    from ods_v3_dbt_spark.pipelines import _index_from_manifest, curated_view

    _, _, man = curated_view(spark, corpus)
    probe = spark.createDataFrame([(99, FRESH)], "doc_id long, text string")
    assert exact_probe(probe, _index_from_manifest(man)).count() == 0

    # replay idempotence: a second takedown of already-gone content
    # leaves the denylist converged (one fp row per taken-down text)
    n = deny.read(spark).count()
    corpus_takedown(
        spark, corpus, spark.createDataFrame([(13,)], "doc_id bigint")
    )
    assert deny.read(spark).count() == n


def test_takedown_deny_false_keeps_readd_doctrine(spark, tmp_path):
    """deny=False: no denylist lands and an identical re-submission is
    genuinely new (delete-then-re-add ≡ never deleted)."""
    from ods_v3_dbt_spark.pipelines import corpus_takedown
    from ods_v3_dbt_spark.sinks import ParquetTable

    corpus, process, write, drain = _seed_store(spark, tmp_path, "tk_nodeny")
    corpus_takedown(
        spark, corpus, spark.createDataFrame([(13,)], "doc_id bigint"),
        deny=False,
    )
    assert not ParquetTable(f"{corpus}__deny").exists()
    write([(41, FRESH, T0)])
    drain()
    verdicts = {
        r.doc_id: r.verdict for r in spark.read.parquet(
            str(tmp_path / "decisions")
        ).collect()
    }
    assert verdicts[41] == "admitted"


def test_takedown_runlog_receipt(spark, tmp_path):
    """corpus_takedown(run_log=) appends the receipt to the run-
    metadata table (O11 applied to compliance actions): queryable
    when/what, zero retained content."""
    import json

    from ods_v3_dbt_spark.pipelines import corpus_takedown
    from ods_v3_dbt_spark.runlog import RunLog

    corpus, process, write, drain = _seed_store(spark, tmp_path, "tk_log")
    log = RunLog(tmp_path / "runlog")
    receipt = corpus_takedown(
        spark, corpus, spark.createDataFrame([(13,)], "doc_id bigint"),
        run_log=log, job_id="gdpr-req-42",
    )
    rows = log.read(spark).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.job_id == "gdpr-req-42" and r.task_id == "corpus_takedown"
    assert r.is_success and json.loads(r.result) == receipt


def test_denylist_blocks_perturbed_copies_of_taken_down_content(
    spark, tmp_path
):
    """Round-8 lead task: takedown tombstones the doc from every
    dedup index, so the near-dup machinery no longer remembers it —
    the deny store's SIGNATURE arm must therefore refuse a lightly
    perturbed copy (verdict ``denied_neardup``) while an unrelated
    doc passes. The deny store holds one-way hashes only (fps + band
    keys), growth O(taken-down docs)."""
    from ods_v3_dbt_spark.pipelines import corpus_takedown
    from ods_v3_dbt_spark.sinks import ParquetTable

    corpus, process, write, drain = _seed_store(spark, tmp_path, "tk_dnnd")
    corpus_takedown(
        spark, corpus, spark.createDataFrame([(13,)], "doc_id bigint")
    )
    sig = ParquetTable(f"{corpus}__deny_sig")
    assert sig.exists()
    assert sorted(sig.read(spark).columns) == [
        "band_idx", "band_key", "expires_at", "request_id"
    ]
    n_sig = sig.read(spark).count()
    assert n_sig <= 4  # bands rows per taken-down doc, nothing more

    # a lightly-edited copy of the taken-down text (exact-fp gate
    # blind: different fingerprint) is refused; unrelated content
    # passes; a VERBATIM copy still reports the exact verdict
    write([
        (51, FRESH + " nearly", T0),
        (52, "entirely unrelated content about something else", T0),
        (53, FRESH, T0),
    ])
    drain()
    verdicts = {
        r.doc_id: r.verdict for r in spark.read.parquet(
            str(tmp_path / "decisions")
        ).collect()
    }
    assert verdicts[51] == "denied_neardup"
    assert verdicts[52] == "admitted"
    assert verdicts[53] == "denied"
    ids = {r.doc_id for r in ParquetTable(corpus).read(spark).collect()}
    assert 51 not in ids and 53 not in ids and 52 in ids

    # replay idempotence: a second takedown converges (no sig growth)
    corpus_takedown(
        spark, corpus, spark.createDataFrame([(13,)], "doc_id bigint")
    )
    assert sig.read(spark).count() == n_sig


def test_takedown_deny_signatures_false_keeps_exact_only_gate(
    spark, tmp_path
):
    """deny_signatures=False: exact-fp denylist only — the perturbed
    copy admits (the pre-round-8 contract, kept opt-out-able)."""
    from ods_v3_dbt_spark.pipelines import corpus_takedown
    from ods_v3_dbt_spark.sinks import ParquetTable

    corpus, process, write, drain = _seed_store(spark, tmp_path, "tk_dexo")
    corpus_takedown(
        spark, corpus, spark.createDataFrame([(13,)], "doc_id bigint"),
        deny_signatures=False,
    )
    assert not ParquetTable(f"{corpus}__deny_sig").exists()
    write([(61, FRESH + " nearly", T0), (62, FRESH, T0)])
    drain()
    verdicts = {
        r.doc_id: r.verdict for r in spark.read.parquet(
            str(tmp_path / "decisions")
        ).collect()
    }
    assert verdicts[61] == "admitted"
    assert verdicts[62] == "denied"


def _seed_partitioned_store(spark, tmp_path, name):
    """Three docs across three day-partitions through the production
    loop with corpus_partition='day'."""
    from ods_v3_dbt_spark.pipelines import curate_increment_stream

    PSCHEMA = "doc_id long, text string, day string, ingest_ts timestamp"
    src, ckpt = tmp_path / "src", tmp_path / "ckpt"
    corpus, decisions = tmp_path / "corpus", tmp_path / "decisions"
    process = curate_increment_stream(
        corpus, name, str(decisions), num_buckets=2, corpus_partition="day"
    )

    def write(rows):
        spark.createDataFrame(rows, PSCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    def drain():
        q = (
            spark.readStream.schema(PSCHEMA).parquet(str(src))
            .writeStream.foreachBatch(process)
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    write([(1, BASE, "d1", T0), (2, FRESH, "d1", T0)])
    drain()
    write([(3, OTHER, "d2", T0),
           (4, "fourth document with its own vocabulary", "d3", T0)])
    drain()
    return corpus, process, write, drain


def _partition_fingerprints(corpus, dirnames):
    import hashlib
    from pathlib import Path

    out = {}
    for d in dirnames:
        root = Path(corpus) / "parts" / d
        out[d] = {
            p.name: hashlib.md5(p.read_bytes()).hexdigest()
            for p in sorted(root.rglob("*.parquet"))
        }
    return out


def test_partitioned_takedown_rewrites_only_affected_partitions(
    spark, tmp_path
):
    """Round-8 verdict task 2: on a day-partitioned curated store,
    takedown step 2 rewrites ONLY the partitions containing the doc
    set — untouched partitions' files stay byte-identical, the
    receipt records partitions_touched, and the consistent-view /
    deny / replay contracts all hold."""
    from ods_v3_dbt_spark.pipelines import (
        _index_from_manifest,
        corpus_takedown,
        curated_view,
    )
    from ods_v3_dbt_spark.sinks import PartitionedTable

    corpus, process, write, drain = _seed_partitioned_store(
        spark, tmp_path, "tk_part_idx"
    )
    tbl = PartitionedTable(corpus, "day")
    parts0 = tbl.partitions()
    assert sorted(parts0) == ["d1", "d2", "d3"]
    fp0 = _partition_fingerprints(corpus, [parts0["d2"], parts0["d3"]])

    receipt = corpus_takedown(
        spark, corpus, spark.createDataFrame([(1,)], "doc_id bigint")
    )
    assert receipt["n_removed"] == 1
    assert receipt["partitions_touched"] == ["d1"]
    assert receipt["partitions_total"] == 3

    # d2/d3: same physical dirs, same bytes (carried by reference)
    parts1 = tbl.partitions()
    assert parts1["d2"] == parts0["d2"] and parts1["d3"] == parts0["d3"]
    assert parts1["d1"] != parts0["d1"]
    assert _partition_fingerprints(
        corpus, [parts1["d2"], parts1["d3"]]
    ) == fp0

    # consistent view pairs the reduced corpus with the new epoch
    view_docs, _, man = curated_view(spark, corpus)
    got = sorted(r.doc_id for r in view_docs.select("doc_id").collect())
    assert got == [2, 3, 4]
    assert man["corpus_layout"] == "partitioned"
    assert man["index_epoch"] == receipt["index_epoch"]

    # the curation index probes clean for the taken-down text
    from ods_v3_dbt_spark.operators.neardup_index import exact_probe

    probe = spark.createDataFrame([(99, BASE)], "doc_id long, text string")
    assert exact_probe(probe, _index_from_manifest(man)).count() == 0

    # replay: converges, touches nothing
    receipt2 = corpus_takedown(
        spark, corpus, spark.createDataFrame([(1,)], "doc_id bigint")
    )
    assert receipt2["n_removed"] == 0
    assert receipt2["partitions_touched"] == []
    assert receipt2["index_epoch"] == receipt["index_epoch"]

    # the deny gate still runs on the partitioned store: a perturbed
    # copy of the taken-down text is refused, and the new batch's day
    # partition appends WITHOUT touching d2/d3
    write([(11, BASE + " nearly", "d4", T0),
           (12, "completely new content for day four", "d4", T0)])
    drain()
    verdicts = {
        r.doc_id: r.verdict for r in spark.read.parquet(
            str(tmp_path / "decisions")
        ).collect()
    }
    assert verdicts[11] == "denied_neardup"
    assert verdicts[12] == "admitted"
    parts2 = tbl.partitions()
    assert parts2["d2"] == parts0["d2"] and parts2["d3"] == parts0["d3"]
    assert sorted(parts2) == ["d1", "d2", "d3", "d4"]
    assert _partition_fingerprints(
        corpus, [parts2["d2"], parts2["d3"]]
    ) == fp0


def test_takedown_races_live_curation_loop_serializably(spark, tmp_path):
    """Round-8 verdict task 6: corpus_takedown running CONCURRENTLY
    with live curate_increment_stream batches must serialize — the
    per-store writer locks make each side fail fast with
    ConcurrentWriteError (never interleave), and with both sides
    retrying, the terminal state equals BOTH serial orders (the batch
    content is unrelated to the victim, so the orders converge): the
    victim is gone from corpus + index, every batch doc landed, and
    the _CURATED pair reads consistently."""
    import threading

    from ods_v3_dbt_spark.operators.neardup_index import exact_probe
    from ods_v3_dbt_spark.pipelines import (
        _index_from_manifest,
        corpus_takedown,
        curated_view,
    )
    from ods_v3_dbt_spark.sinks import ConcurrentWriteError

    corpus, process, write, drain = _seed_store(spark, tmp_path, "tk_race")
    batches = [
        [(100 + i, f"race batch number {i} with unique token u{i} "
                   f"and more filler words here", T0)]
        for i in range(4)
    ]
    errors: list = []

    def run_batches():
        try:
            for i, rows in enumerate(batches):
                df = spark.createDataFrame(rows, SCHEMA)
                for attempt in range(600):
                    try:
                        process(df, 100 + i)
                        break
                    except ConcurrentWriteError:
                        import time as _t

                        _t.sleep(0.5)
                else:
                    raise RuntimeError("batch never got the lock")
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    def run_takedown():
        try:
            for attempt in range(600):
                try:
                    corpus_takedown(
                        spark, corpus,
                        spark.createDataFrame([(13,)], "doc_id bigint"),
                    )
                    return
                except ConcurrentWriteError:
                    import time as _t

                    _t.sleep(0.5)
            raise RuntimeError("takedown never got the lock")
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    t1 = threading.Thread(target=run_batches)
    t2 = threading.Thread(target=run_takedown)
    t1.start(); t2.start()
    t1.join(300); t2.join(300)
    assert not errors, errors

    # terminal state = the (unique) serializable outcome
    view_docs, _, man = curated_view(spark, corpus)
    ids = sorted(r.doc_id for r in view_docs.select("doc_id").collect())
    assert ids == [1, 14, 100, 101, 102, 103]
    idx = _index_from_manifest(man)
    # victim unprobeable; every batch doc's text is indexed
    gone = spark.createDataFrame([(99, FRESH)], "doc_id long, text string")
    assert exact_probe(gone, idx).count() == 0
    probe = spark.createDataFrame(
        [(200 + i, rows[0][1]) for i, rows in enumerate(batches)],
        "doc_id long, text string",
    )
    assert exact_probe(probe, idx).count() == len(batches)
    # the denylist landed despite the race: the victim's exact text
    # is refused on re-ingestion
    write([(300, FRESH, T0)])
    drain()
    verdicts = {
        r.doc_id: r.verdict for r in spark.read.parquet(
            str(tmp_path / "decisions")
        ).collect()
    }
    assert verdicts[300] in ("denied", "denied_neardup")


def test_deny_probe_shuffle_fallback_identical(spark):
    """deny_probe above broadcast_limit switches the deny semi-joins
    to shuffles — identical verdicts (the lsh_index_probe size-gate
    discipline applied to the compliance gate)."""
    from pyspark.sql import functions as F

    from ods_v3_dbt_spark.functions import text as T
    from ods_v3_dbt_spark.pipelines import deny_probe, deny_signature_bands

    deny_docs = spark.createDataFrame(
        [(1, BASE), (2, FRESH)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(10, BASE), (11, FRESH + " nearly"), (12, OTHER)],
        "doc_id long, text string",
    )
    fps = deny_docs.select(
        T.fingerprint_md5(F.col("text")).alias("fp")
    ).distinct()
    bands = deny_signature_bands(deny_docs).select(
        "band_idx", "band_key"
    ).distinct()
    broad = sorted(
        (r.doc_id, r.verdict)
        for r in deny_probe(batch, fps, bands).collect()
    )
    shuf = sorted(
        (r.doc_id, r.verdict)
        for r in deny_probe(batch, fps, bands, broadcast_limit=0).collect()
    )
    assert broad == shuf
    assert broad == [(10, "denied"), (11, "denied_neardup")]


def test_partitioned_store_with_semantic_channel(spark, tmp_path):
    """The two round-8 corpus modes COMPOSE: a day-partitioned store
    with embedding_col runs both — appends touch only the batch's
    partitions, takedown tombstones the IVF channel AND rewrites only
    the victim's partition, and the post-takedown paraphrase of the
    victim admits (index memory gone) unless the deny arm catches
    textual near-copies."""
    import random

    from ods_v3_dbt_spark.pipelines import (
        corpus_takedown,
        curate_increment_stream,
    )
    from ods_v3_dbt_spark.sinks import PartitionedTable

    random.seed(21)
    SCHEMA_PS = (
        "doc_id long, text string, embedding array<double>, day string, "
        "ingest_ts timestamp"
    )
    vecs = [[random.uniform(-1, 1) for _ in range(8)] for _ in range(3)]
    corpus, dec = tmp_path / "corpus", tmp_path / "dec"
    process = curate_increment_stream(
        corpus, "tk_ps_idx", str(dec), num_buckets=2,
        embedding_col="embedding", ivf_cells=2, corpus_partition="day",
    )
    process(
        spark.createDataFrame(
            [(1, BASE, vecs[0], "d1", T0), (2, FRESH, vecs[1], "d1", T0)],
            SCHEMA_PS,
        ),
        1,
    )
    process(
        spark.createDataFrame(
            [(3, OTHER, vecs[2], "d2", T0)], SCHEMA_PS
        ),
        2,
    )
    tbl = PartitionedTable(corpus, "day")
    parts0 = tbl.partitions()
    assert sorted(parts0) == ["d1", "d2"]

    receipt = corpus_takedown(
        spark, corpus, spark.createDataFrame([(1,)], "doc_id bigint")
    )
    assert receipt["partitions_touched"] == ["d1"]
    assert "ivf_epoch" in receipt  # the semantic channel was reached
    assert tbl.partitions()["d2"] == parts0["d2"]  # carried by ref

    # paraphrase of the victim (same embedding + bump, different
    # words): the IVF index forgot it, the deny arm has no semantic
    # signatures (text-only), so it ADMITS — the documented trade
    bumped = [vecs[0][0] + 0.05] + vecs[0][1:]
    process(
        spark.createDataFrame(
            [(11, "wholly different words same meaning here",
              bumped, "d3", T0)],
            SCHEMA_PS,
        ),
        3,
    )
    verdicts = {
        r.doc_id: r.verdict
        for r in spark.read.parquet(str(dec)).collect()
    }
    assert verdicts[11] == "admitted"
    # but a textual near-copy of the victim is still denied
    process(
        spark.createDataFrame(
            [(12, BASE + " nearly", vecs[1], "d3", T0)], SCHEMA_PS
        ),
        4,
    )
    verdicts = {
        r.doc_id: r.verdict
        for r in spark.read.parquet(str(dec)).collect()
    }
    assert verdicts[12] == "denied_neardup"


def test_maintain_curated_store_folds_compacts_and_advances_pair(
    spark, tmp_path
):
    """maintain_curated_store: index segments fold, the (partitioned)
    corpus compacts only fragmented partitions, and ONE new _CURATED
    pair publishes the folded epochs — curated_view sees identical
    content on fewer segments/files."""
    from ods_v3_dbt_spark.jobs import maintain_curated_store
    from ods_v3_dbt_spark.pipelines import curated_view
    from ods_v3_dbt_spark.runlog import RunLog
    from ods_v3_dbt_spark.sinks import PartitionedTable

    corpus, process, write, drain = _seed_partitioned_store(
        spark, tmp_path, "tk_maint_idx"
    )
    # a few more single-doc batches fragment d1 and grow segments
    write([(21, "more words for day one first extra batch", "d1", T0)])
    drain()
    write([(22, "and again different new content second", "d1", T0)])
    drain()
    pre_docs, pre_idx, pre_man = curated_view(spark, corpus)
    pre_ids = sorted(r.doc_id for r in pre_docs.select("doc_id").collect())
    assert len(pre_idx.segments) > 1

    log = RunLog(tmp_path / "runlog")
    report = maintain_curated_store(spark, corpus, run_log=log,
                                    job_id="weekly")
    assert report["indexes"][0]["compacted"]

    post_docs, post_idx, post_man = curated_view(spark, corpus)
    assert sorted(
        r.doc_id for r in post_docs.select("doc_id").collect()
    ) == pre_ids
    # curated_view now resolves the FOLDED epoch (one segment)
    assert len(post_idx.segments) == 1
    assert post_man.get("maintenance") is True
    assert post_man["corpus_layout"] == "partitioned"
    # decisions keep working after maintenance (the pair is live)
    write([(31, "post maintenance document flows normally", "d2", T0)])
    drain()
    verdicts = {
        r.doc_id: r.verdict for r in spark.read.parquet(
            str(tmp_path / "decisions")
        ).collect()
    }
    assert verdicts[31] == "admitted"
    # run-log: one row per index + one store row
    kinds = {r.task_id for r in log.read(spark).collect()}
    assert "maintain_store" in kinds
    assert any(k.startswith("maintain:") for k in kinds)
    # monolithic flavor: the plain-store path also advances the pair
    corpus2, p2, w2, d2 = _seed_store(spark, tmp_path / "m", "tk_maint2")
    rep2 = maintain_curated_store(spark, corpus2)
    docs2, idx2, man2 = curated_view(spark, corpus2)
    assert len(idx2.segments) == 1 and man2.get("maintenance") is True
    assert sorted(r.doc_id for r in docs2.select("doc_id").collect()) == [
        1, 13, 14,
    ]


def test_curated_view_partition_pruned_read(spark, tmp_path):
    """curated_view(partitions=[...]) on a partitioned store reads
    only the named days' dirs from the PINNED snapshot; a
    non-partitioned store refuses."""
    import pytest as _pt

    from ods_v3_dbt_spark.pipelines import curated_view

    corpus, process, write, drain = _seed_partitioned_store(
        spark, tmp_path, "tk_view_idx"
    )
    docs, _, man = curated_view(spark, corpus, partitions=["d1", "d9"])
    assert sorted(r.doc_id for r in docs.select("doc_id").collect()) == [
        1, 2,
    ]
    corpus2, *_ = _seed_store(spark, tmp_path / "m", "tk_view2")
    with _pt.raises(ValueError, match="partitioned corpus"):
        curated_view(spark, corpus2, partitions=["d1"])


def test_deny_spec_mismatch_refuses(spark, tmp_path):
    """A takedown passing a deny_spec different from the store's
    pinned family must refuse loudly — the gate replays the
    persisted family and silent drift would quietly zero the
    near-dup arm's recall."""
    import pytest as _pt

    from ods_v3_dbt_spark.pipelines import DENY_SIG_SPEC, corpus_takedown

    corpus, process, write, drain = _seed_store(spark, tmp_path, "tk_spec")
    corpus_takedown(
        spark, corpus, spark.createDataFrame([(13,)], "doc_id bigint")
    )
    other = dict(DENY_SIG_SPEC, bands=8)
    with _pt.raises(ValueError, match="deny-signature spec mismatch"):
        corpus_takedown(
            spark, corpus, spark.createDataFrame([(14,)], "doc_id bigint"),
            deny_spec=other,
        )
    # the pinned family keeps working
    r = corpus_takedown(
        spark, corpus, spark.createDataFrame([(14,)], "doc_id bigint")
    )
    assert r["n_removed"] == 1
