"""End-to-end curation pipeline: the composed workflow must clean a
deliberately dirty corpus — low-quality rows, exact copies, near-dup
variants, eval-contaminated docs — and produce a packed train split
plus a held-out split, deterministically."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ods_v3_dbt_spark.functions import text as T
from ods_v3_dbt_spark.pipelines import _four_gram_shingles, curate_corpus

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def dirty_corpus(spark):
    base = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    exact = base.filter(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + 100_000
    )
    near = (
        base.filter(F.col("doc_id") % 25 == 0)
        .withColumn("doc_id", F.col("doc_id") + 200_000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" extra marker token")))
    )
    junk = spark.createDataFrame(
        [(300_000 + i, "!!! ??? ***") for i in range(5)], "doc_id long, text string"
    )
    return base.unionByName(exact).unionByName(near).unionByName(junk)


@pytest.fixture(scope="module")
def eval_set(spark, dirty_corpus):
    # protect every 17th doc's content: those (and any doc sharing a
    # 4-gram with them) must not reach the train/heldout outputs
    return dirty_corpus.filter(F.col("doc_id") % 17 == 0).filter(
        F.col("doc_id") < 100_000
    )


@pytest.fixture(scope="module")
def curated(spark, dirty_corpus, eval_set):
    return curate_corpus(dirty_corpus, eval_set)


def test_stage_counts_monotone_and_effective(curated, dirty_corpus):
    train, heldout, audit = curated
    a = audit.as_dict()
    assert (
        a["n_input"]
        >= a["n_quality"]
        >= a["n_exact_unique"]
        >= a["n_canonical"]
        >= a["n_clean"]
    )
    assert a["n_input"] == dirty_corpus.count()
    # every stage actually removed something on the dirty corpus
    assert a["n_quality"] < a["n_input"]          # junk docs gone
    assert a["n_exact_unique"] < a["n_quality"]   # exact copies gone
    assert a["n_canonical"] < a["n_exact_unique"]  # near-dups gone
    assert a["n_clean"] < a["n_canonical"]        # contaminated gone
    assert a["n_train"] + a["n_heldout"] == a["n_clean"]
    assert a["n_train"] > 0 and a["n_heldout"] > 0


def test_output_free_of_dups_and_contamination(spark, curated, eval_set):
    train, heldout, _ = curated
    out = train.select("doc_id", "text").unionByName(
        heldout.select("doc_id", "text")
    )
    # no two output docs share a content fingerprint
    n = out.count()
    n_fp = out.select(T.fingerprint_md5(F.col("text")).alias("fp")).distinct().count()
    assert n == n_fp
    # zero 4-gram overlap with the protected eval set
    overlap = (
        _four_gram_shingles(out)
        .join(_four_gram_shingles(eval_set).select("shingle").distinct(), "shingle")
        .count()
    )
    assert overlap == 0


def test_packing_conserves_tokens_and_bins_contiguous(curated):
    """Per-shard packing contract: bin ids decompose as
    shard · 2⁴⁰ + local_bin, local bins are contiguous from 0 WITHIN
    each shard, no token is lost, and every non-final bin in a shard
    is filled past the 512 boundary by at most one spanning doc."""
    import collections

    from ods_v3_dbt_spark.operators.packing import BIN_SHARD_STRIDE

    train, _, _ = curated
    rows = train.select("shard", "local_bin", "bin_id", "n_tokens").collect()
    assert all(r.bin_id == r.shard * BIN_SHARD_STRIDE + r.local_bin for r in rows)
    shard_bins = collections.defaultdict(set)
    bin_tokens = collections.Counter()
    for r in rows:
        shard_bins[r.shard].add(r.local_bin)
        bin_tokens[(r.shard, r.local_bin)] += r.n_tokens
    assert len(shard_bins) > 1  # the corpus actually spreads over shards
    for s, bins in shard_bins.items():
        assert sorted(bins) == list(range(len(bins)))
    assert sum(bin_tokens.values()) == sum(r.n_tokens for r in rows)
    max_doc = max(r.n_tokens for r in rows)
    for (s, b), t in bin_tokens.items():
        if b < max(shard_bins[s]):  # non-final bin within its shard
            assert 1 <= t <= 512 + max_doc


def test_pipeline_is_deterministic(dirty_corpus, eval_set, curated):
    _, _, audit1 = curated
    _, _, audit2 = curate_corpus(dirty_corpus, eval_set)
    assert audit1.as_dict() == audit2.as_dict()


def test_curate_stream_gates_and_dedups_across_batches(spark, tmp_path):
    """Streaming ingest: quality junk filtered statelessly; a
    byte-identical doc re-ingested in a later micro-batch inside the
    watermark horizon is suppressed by fingerprint state."""
    import datetime as dt

    from ods_v3_dbt_spark.pipelines import curate_stream

    SCHEMA = "doc_id long, text string, ingest_ts timestamp"
    src, ckpt, out = tmp_path / "src", tmp_path / "ckpt", tmp_path / "out"
    T0 = dt.datetime(2024, 9, 1, 12, 0, 0)
    good = "the quick brown fox jumps over the lazy dog again and again"

    def write(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(str(src))

    def drain():
        q = (
            curate_stream(spark.readStream.schema(SCHEMA).parquet(str(src)))
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write([(1, good, T0), (2, "!!! ???", T0)])          # junk gated out
    drain()
    write([(3, good, T0), (4, good + " fresh tail", T0)])  # 3 = dup of 1
    drain()

    got = sorted(r.doc_id for r in spark.read.parquet(str(out)).collect())
    assert got == [1, 4]


def test_curate_increment_verdicts_and_precedence(spark):
    """Incremental curation on a planted batch: every verdict class,
    min-id keep rules, and the precedence contract (a doc that
    exact-dups existing is dup_exact_existing even if it also
    near-dups a batch doc; stage-4 edges exclude already-rejected
    docs so survivors aren't dragged into clusters through them)."""
    from ods_v3_dbt_spark.pipelines import curate_increment

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    other = "one two three four five six seven eight nine ten"
    existing = spark.createDataFrame(
        [(1, base), (2, other)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (10, "totally fresh words nobody else ever used here today"),
            (11, base),                       # exact dup of existing 1
            (12, base + " suffix"),           # near-dup of existing 1
            (13, "unique doc repeated inside the batch exactly twice"),
            (14, "unique doc repeated inside the batch exactly twice"),
            (15, "brand new sentence with many matching tokens inside"),
            (16, "brand new sentence with many matching tokens inside extra"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.verdict
        for r in curate_increment(batch, existing).collect()
    }
    assert got == {
        10: "admitted",
        11: "dup_exact_existing",
        12: "neardup_existing",
        13: "admitted",             # min id of the in-batch exact pair
        14: "dup_exact_batch",
        15: "admitted",             # min id of the in-batch near pair
        16: "neardup_batch",
    }


def test_curate_increment_indexed_matches_inline(spark):
    """The two corpus-state modes of curate_increment — inline
    ``existing=`` re-derivation vs the persisted bucketed ``index=``
    probe — must decide IDENTICAL verdicts (same planted batch as
    the inline test, so every verdict class crosses the boundary)."""
    from ods_v3_dbt_spark.operators.neardup_index import dedup_index_write
    from ods_v3_dbt_spark.pipelines import curate_increment

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    other = "one two three four five six seven eight nine ten"
    existing = spark.createDataFrame(
        [(1, base), (2, other)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (10, "totally fresh words nobody else ever used here today"),
            (11, base),
            (12, base + " suffix"),
            (13, "unique doc repeated inside the batch exactly twice"),
            (14, "unique doc repeated inside the batch exactly twice"),
            (15, "brand new sentence with many matching tokens inside"),
            (16, "brand new sentence with many matching tokens inside extra"),
        ],
        "doc_id long, text string",
    )
    inline = {
        r.doc_id: r.verdict
        for r in curate_increment(batch, existing).collect()
    }
    idx = dedup_index_write(existing, "t_incr_eq_idx", num_buckets=4)
    indexed = {
        r.doc_id: r.verdict
        for r in curate_increment(batch, index=idx).collect()
    }
    assert indexed == inline
    # exactly one corpus-state argument is accepted
    import pytest

    with pytest.raises(ValueError):
        curate_increment(batch)
    with pytest.raises(ValueError):
        curate_increment(batch, existing, index=idx)


def test_curate_increment_stream_end_to_end(spark, tmp_path):
    """Round-4 task 7: the streaming production shape — two
    micro-batches through foreachBatch(curate_increment_stream).
    Batch 1 seeds the corpus and the persisted index; batch 2's
    exact dup and near-dup OF BATCH 1 DOCS are caught via the
    index (no history re-shingle), its fresh doc admitted, junk
    gated; the corpus table holds exactly the admitted set."""
    import datetime as dt

    from ods_v3_dbt_spark.pipelines import curate_increment_stream
    from ods_v3_dbt_spark.sinks import ParquetTable

    SCHEMA = "doc_id long, text string, ingest_ts timestamp"
    src = tmp_path / "src"
    ckpt = tmp_path / "ckpt"
    corpus = tmp_path / "corpus"
    decisions = tmp_path / "decisions"
    T0 = dt.datetime(2024, 9, 1, 12, 0, 0)
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    fresh = "totally new words nobody used before in any earlier batch"

    def write(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    process = curate_increment_stream(
        corpus, "t_stream_idx", str(decisions), num_buckets=2
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
    write([(11, base, T0),                      # exact dup of corpus 1
           (12, base + " suffix", T0),          # near-dup of corpus 1
           (13, fresh, T0)])
    drain()

    dec = {
        (r.batch_id, r.doc_id): r.verdict
        for r in spark.read.parquet(str(decisions)).collect()
    }
    # batch ids are per-query; the second drain restarts numbering at 0
    by_doc = {doc: v for (_, doc), v in dec.items()}
    assert by_doc[1] == "admitted"
    assert 2 not in by_doc                       # junk never reached decisions
    assert by_doc[11] == "dup_exact_existing"    # via the persisted fp table
    assert by_doc[12] == "neardup_existing"      # via the persisted shingles
    assert by_doc[13] == "admitted"
    got = sorted(r.doc_id for r in ParquetTable(corpus).read(spark).collect())
    assert got == [1, 13]


def test_curate_increment_stream_lsh_mode(spark, tmp_path):
    """Round-5: the streaming loop with index_kind='lsh' — the
    web-scale sub-linear variant. Whole-text dups/near-dups of an
    earlier micro-batch (identical or near-identical shingle sets →
    identical minhash in at least one band) are caught through the
    persisted LSH band table across batches; the fresh doc is
    admitted; verdicts and corpus match the exact-index mode on
    this fixture."""
    import datetime as dt

    from ods_v3_dbt_spark.pipelines import curate_increment_stream
    from ods_v3_dbt_spark.sinks import ParquetTable

    SCHEMA = "doc_id long, text string, ingest_ts timestamp"
    src = tmp_path / "src"
    ckpt = tmp_path / "ckpt"
    corpus = tmp_path / "corpus"
    decisions = tmp_path / "decisions"
    T0 = dt.datetime(2024, 9, 1, 12, 0, 0)
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    fresh = "totally new words nobody used before in any earlier batch"

    def write(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    process = curate_increment_stream(
        corpus, "t_stream_lsh_idx", str(decisions), num_buckets=2,
        index_kind="lsh",
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
    write([(11, base, T0),                      # exact dup of corpus 1
           (12, base + " suffix", T0),          # near-dup: bands collide
           (13, fresh, T0)])
    drain()

    by_doc = {r.doc_id: r.verdict
              for r in spark.read.parquet(str(decisions)).collect()}
    assert by_doc[1] == "admitted"
    assert 2 not in by_doc
    assert by_doc[11] == "dup_exact_existing"    # stage-1 fp probe
    assert by_doc[12] == "neardup_existing"      # via the band table
    assert by_doc[13] == "admitted"
    got = sorted(r.doc_id for r in ParquetTable(corpus).read(spark).collect())
    assert got == [1, 13]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown index_kind"):
        curate_increment_stream(corpus, "x", str(decisions),
                                index_kind="cosine")


def test_curate_increment_stream_replay_idempotent(spark, tmp_path):
    """foreachBatch replay semantics: running the SAME micro-batch
    through the process function twice (a crash-retry) leaves
    decisions, corpus, and index state byte-equivalent to running it
    once — dynamic-overwrite decisions, corpus anti-join guard, and
    the index append's already-indexed skip."""
    from ods_v3_dbt_spark.operators.neardup_index import DedupIndex
    from ods_v3_dbt_spark.pipelines import curate_increment_stream
    from ods_v3_dbt_spark.sinks import ParquetTable

    corpus = tmp_path / "corpus"
    decisions = tmp_path / "decisions"
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    process = curate_increment_stream(
        corpus, "t_replay_idx", str(decisions), num_buckets=2
    )
    batch = spark.createDataFrame(
        [(1, base), (2, "totally different words in this other document here")],
        "doc_id long, text string",
    )
    process(batch, 0)
    snap1 = {
        "decisions": sorted(
            (r.batch_id, r.doc_id, r.verdict)
            for r in spark.read.parquet(str(decisions)).collect()
        ),
        "corpus": sorted(
            r.doc_id for r in ParquetTable(corpus).read(spark).collect()
        ),
        "sizes": sorted(
            tuple(r)
            for r in DedupIndex("t_replay_idx", 3, 2)
            .resolve(spark).sizes.read(spark).drop("__epoch").collect()
        ),
    }
    process(batch, 0)  # the retry
    snap2 = {
        "decisions": sorted(
            (r.batch_id, r.doc_id, r.verdict)
            for r in spark.read.parquet(str(decisions)).collect()
        ),
        "corpus": sorted(
            r.doc_id for r in ParquetTable(corpus).read(spark).collect()
        ),
        "sizes": sorted(
            tuple(r)
            for r in DedupIndex("t_replay_idx", 3, 2)
            .resolve(spark).sizes.read(spark).drop("__epoch").collect()
        ),
    }
    assert snap1 == snap2
    assert len(snap1["corpus"]) == 2


def test_curate_increment_stream_stale_partition_purged(spark, tmp_path):
    """Round-4 advisor (pipelines.py:352): a same-numbered decisions
    partition from a PRIOR stream incarnation is detected stale
    (doc-set mismatch) — and when the current batch's gated set is
    EMPTY, the dynamic overwrite writes zero partitions, so the
    stale partition must be deleted explicitly or its ghost verdicts
    survive attributed to this epoch's batch_id."""
    from ods_v3_dbt_spark.pipelines import curate_increment_stream

    corpus = tmp_path / "corpus"
    decisions = tmp_path / "decisions"
    process = curate_increment_stream(
        corpus, "t_ghost_idx", str(decisions), num_buckets=2
    )
    # prior incarnation: batch 0 decided real docs
    first = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    process(first, 0)
    assert spark.read.parquet(str(decisions)).count() == 1
    # new incarnation, fresh checkpoint, SAME batch number — but its
    # only doc fails the token gate, so the gated set is empty
    ghostly = spark.createDataFrame(
        [(50, "too short")], "doc_id long, text string"
    )
    process(ghostly, 0)
    # the prior incarnation's verdicts are gone: the partition now
    # holds THIS batch's (empty) decision record — round 5's atomic
    # per-partition publication always writes the partition, so a
    # stale record can never survive by absence of new rows
    assert spark.read.parquet(str(decisions)).count() == 0


def test_curate_increment_lsh_index_mode(spark):
    """curate_increment with an LshIndex: whole-text near-dups (which
    share nearly all shingles → identical minhash in some band) get
    the same verdicts as the exact-index mode on the planted batch,
    and the precedence contract holds through the sub-linear
    probe."""
    from ods_v3_dbt_spark.operators.neardup_index import lsh_index_write
    from ods_v3_dbt_spark.pipelines import curate_increment

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    other = "one two three four five six seven eight nine ten"
    existing = spark.createDataFrame(
        [(1, base), (2, other)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (10, "totally fresh words nobody else ever used here today"),
            (11, base),
            (12, base + " suffix"),
            (13, "unique doc repeated inside the batch exactly twice"),
            (14, "unique doc repeated inside the batch exactly twice"),
            (15, "brand new sentence with many matching tokens inside"),
            (16, "brand new sentence with many matching tokens inside extra"),
        ],
        "doc_id long, text string",
    )
    idx = lsh_index_write(existing, "t_incr_lsh_idx", num_buckets=4, mode="md5")
    got = {
        r.doc_id: r.verdict
        for r in curate_increment(batch, index=idx).collect()
    }
    assert got == {
        10: "admitted",
        11: "dup_exact_existing",
        12: "neardup_existing",
        13: "admitted",
        14: "dup_exact_batch",
        15: "admitted",
        16: "neardup_batch",
    }


def test_curated_view_consistent_pair(spark, tmp_path, monkeypatch):
    """Round-5 consistent-view co-manifest: curated_view() pins the
    (corpus snapshot, index epoch) pair recorded AFTER both commits
    succeeded. A crash between the corpus commit and the index
    commit leaves the co-manifest at the previous consistent pair —
    the view never shows a new corpus against an old index — and the
    replayed batch advances it."""
    import datetime as dt

    import ods_v3_dbt_spark.operators.neardup_index as NI
    from ods_v3_dbt_spark.operators.neardup_index import neardup_probe
    from ods_v3_dbt_spark.pipelines import (
        curate_increment_stream,
        curated_view,
    )

    corpus = tmp_path / "corpus"
    decisions = tmp_path / "decisions"
    T0 = dt.datetime(2024, 9, 1, 12, 0, 0)
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    fresh = "totally new words nobody used before in any earlier batch"

    def batch(rows):
        return spark.createDataFrame(
            rows, "doc_id long, text string, ingest_ts timestamp"
        )

    process = curate_increment_stream(
        corpus, "t_view_idx", str(decisions), num_buckets=2
    )
    process(batch([(1, base, T0)]), 0)
    c0, r0, m0 = curated_view(spark, corpus)
    assert {r.doc_id for r in c0.collect()} == {1}
    assert m0["batch_id"] == 0 and m0["index_kind"] == "exact"

    # crash AFTER the corpus commit, BEFORE the index commit: the
    # closure binds index_append at construction time, so patch first
    real_append = NI.dedup_index_append
    monkeypatch.setattr(
        NI, "dedup_index_append",
        lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("simulated crash before index commit")
        ),
    )
    crashy = curate_increment_stream(
        corpus, "t_view_idx", str(decisions), num_buckets=2
    )
    with pytest.raises(RuntimeError, match="simulated crash"):
        crashy(batch([(13, fresh, T0)]), 1)
    # the CORPUS pointer already advanced (doc 13 committed there)...
    from ods_v3_dbt_spark.sinks import ParquetTable

    assert {r.doc_id for r in ParquetTable(corpus).read(spark).collect()} \
        == {1, 13}
    # ...but the consistent view still serves the OLD pair
    c1, r1, m1 = curated_view(spark, corpus)
    assert {r.doc_id for r in c1.collect()} == {1}
    assert m1 == m0

    # replay with a healthy loop: both commits re-drive, view advances
    monkeypatch.setattr(NI, "dedup_index_append", real_append)
    healthy = curate_increment_stream(
        corpus, "t_view_idx", str(decisions), num_buckets=2
    )
    healthy(batch([(13, fresh, T0)]), 1)
    c2, r2, m2 = curated_view(spark, corpus)
    assert {r.doc_id for r in c2.collect()} == {1, 13}
    assert m2["batch_id"] == 1
    assert m2["index_epoch"] >= m0["index_epoch"]
    # the pinned index really serves the pinned epoch: a clone of the
    # replayed doc probes as an exact near-dup through the view's
    # resolved handle
    from ods_v3_dbt_spark.operators.neardup_index import DedupIndex

    idx = DedupIndex("t_view_idx", 3, 2)
    clone = batch([(99, fresh, T0)]).select("doc_id", "text")
    hits = {(r.corpus_id, r.jacc_ppm)
            for r in neardup_probe(clone, idx, 500_000).collect()}
    assert hits == {(13, 1_000_000)}


def test_curated_view_pin_survives_refreshes(spark, tmp_path):
    """Round-6 verdict task 4, end to end: a ``curated_view``
    resolved with ``pin_id`` keeps BOTH sides of its pair — the
    corpus snapshot (beyond the loop's ``keep=3`` vacuum horizon)
    and the index epoch (beyond the current/previous retention) —
    readable across five subsequent refreshes; releasing the pin
    makes the pair collectible again. Retention is now a guarantee
    the reader holds, not a convention the writer happens to
    follow."""
    import datetime as dt

    from ods_v3_dbt_spark.pipelines import (
        curate_increment_stream,
        curated_view,
        release_curated_view,
    )
    from ods_v3_dbt_spark.sinks import ParquetTable

    corpus = tmp_path / "corpus"
    T0 = dt.datetime(2024, 9, 1, 12, 0, 0)

    def batch(rows):
        return spark.createDataFrame(
            rows, "doc_id long, text string, ingest_ts timestamp"
        )

    process = curate_increment_stream(
        corpus, "t_pinview_idx", str(tmp_path / "decisions"), num_buckets=2
    )
    process(batch([(1, "alpha beta gamma delta epsilon zeta", T0)]), 0)
    c0, r0, m0 = curated_view(spark, corpus, pin_id="trainer-1")
    pinned_epoch = m0["index_epoch"]
    texts = [
        "one two three four five six seven",
        "red orange yellow green blue indigo",
        "do re mi fa sol la ti",
        "north south east west up down around",
        "cold warm hot cool mild freezing melting",
    ]
    for i, t in enumerate(texts):
        process(batch([(10 + i, t, T0)]), i + 1)
    # five refreshes later the PINNED pair still reads in full: the
    # snapshot dir survived five keep=3 vacuums, the epoch five GCs
    tbl = ParquetTable(corpus)
    assert m0["corpus_snapshot"] in {p.name for p in tbl.history()}
    again = tbl.read_snapshot(spark, m0["corpus_snapshot"])
    assert {r.doc_id for r in again.collect()} == {1}
    from ods_v3_dbt_spark.pipelines import _index_from_manifest

    idx = _index_from_manifest(m0)
    pinned = idx.resolve(spark, epoch=pinned_epoch)
    assert {r.doc_id for r in pinned.sizes.read(spark).collect()} == {1}
    # the live view moved on independently
    c_live, _, m_live = curated_view(spark, corpus)
    assert m_live["batch_id"] == 5

    # release → the next refresh collects both sides
    release_curated_view(spark, corpus, "trainer-1")
    process(batch([(99, "whiskey tango foxtrot over and out", T0)]), 6)
    assert m0["corpus_snapshot"] not in {p.name for p in tbl.history()}
    with pytest.raises(FileNotFoundError):
        idx.resolve(spark, epoch=pinned_epoch)


def test_curate_increment_stream_semantic_channel(spark, tmp_path):
    """Round-7 lead task: the streaming loop with ``embedding_col``
    maintains a persisted IVF index alongside the text index — a
    near-PARAPHRASE of a doc admitted in an EARLIER micro-batch
    (different words, near-identical embedding) is caught across
    batches as ``neardup_semantic``, and after the source doc's
    takedown (which reaches the loop's IVF index automatically via
    the co-manifest) the same paraphrase is genuinely new again."""
    import datetime as dt
    import random

    from ods_v3_dbt_spark.pipelines import (
        corpus_takedown,
        curate_increment_stream,
    )
    from ods_v3_dbt_spark.sinks import ParquetTable

    random.seed(5)
    SCHEMA = "doc_id long, text string, embedding array<double>, ingest_ts timestamp"
    T0 = dt.datetime(2024, 9, 1, 12, 0, 0)
    vecs = [[random.uniform(-1, 1) for _ in range(8)] for _ in range(3)]
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    fresh = "totally new words nobody used before in any earlier batch"
    para = "entirely different phrasing conveying the very same idea again"
    src, ckpt = tmp_path / "src", tmp_path / "ckpt"
    corpus, dec = tmp_path / "corpus", tmp_path / "dec"
    process = curate_increment_stream(
        corpus, "t_sem_idx", str(dec), num_buckets=2,
        embedding_col="embedding", ivf_cells=2,
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

    write([(1, base, vecs[0], T0), (2, fresh, vecs[1], T0)])
    drain()
    # batch 2: paraphrase of doc 1 (zero shared shingles, embedding =
    # doc 1's + a small bump) and an unrelated new doc
    bumped = [vecs[0][0] + 0.05] + vecs[0][1:]
    write([
        (11, para, bumped, T0),
        (12, "completely separate topic about gardening tools", vecs[2], T0),
    ])
    drain()
    verdicts = {
        r.doc_id: r.verdict for r in spark.read.parquet(str(dec)).collect()
    }
    assert verdicts[11] == "neardup_semantic"
    assert verdicts[1] == verdicts[2] == verdicts[12] == "admitted"
    got = sorted(
        r.doc_id for r in ParquetTable(corpus).read(spark).collect()
    )
    assert got == [1, 2, 12]

    # takedown of the semantic source reaches the IVF index via the
    # co-manifest; the paraphrase then admits
    corpus_takedown(
        spark, corpus, spark.createDataFrame([(1,)], "doc_id bigint")
    )
    write([(21, para + " slightly", bumped, T0)])
    drain()
    verdicts = {
        r.doc_id: r.verdict for r in spark.read.parquet(str(dec)).collect()
    }
    assert verdicts[21] == "admitted"
