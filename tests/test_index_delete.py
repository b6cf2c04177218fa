"""Tombstone-delete semantics for the persisted indexes (dedup, LSH,
BM25, IVF) — the right-to-be-forgotten contract the oracle rows
(`*_delete_probe`, `bm25_indexed_delete_topk`, `ivf_index_delete_topk`)
hash-verify, plus the invariants SQL can't express: GC safety of
tombstone member tables across later writers, pinned-epoch replay of
delete state, replay idempotence, and physical fold at compaction.

Reference anchor: M6 DELETE semantics
(dags/sql/casreport/update_des_table/casreport_rpt_full_item.sql:1-3)
applied to persisted index members instead of plain tables.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ods_v3_dbt_spark.operators.neardup_index import (
    DedupIndex,
    dedup_index_append,
    dedup_index_compact,
    dedup_index_delete,
    dedup_index_write,
    exact_probe,
    lsh_index_delete,
    lsh_index_probe,
    lsh_index_write,
    neardup_probe,
    set_index_pin,
)
from ods_v3_dbt_spark.operators.text_index import (
    bm25_index_delete,
    bm25_index_topk,
    bm25_index_write,
)
from ods_v3_dbt_spark.operators.vector_index import (
    ivf_index_append,
    ivf_index_delete,
    ivf_index_topk,
    ivf_index_write,
)


def _docs(spark, n=30):
    return spark.createDataFrame(
        [
            (
                i,
                f"alpha beta gamma delta epsilon zeta doc{i} "
                f"tail{i % 4} more words here",
            )
            for i in range(n)
        ],
        "doc_id bigint, text string",
    )


def _batch(spark):
    return spark.createDataFrame(
        [
            (
                1005,
                "alpha beta gamma delta epsilon zeta doc5 tail1 "
                "more words here extra",
            )
        ],
        "doc_id bigint, text string",
    )


def _pairs(df):
    return sorted((r.doc_id, r.corpus_id, r.jacc_ppm) for r in df.collect())


def test_dedup_delete_equals_rebuild_and_append_gc_keeps_tomb(spark):
    """Delete == rebuild-without-the-docs, and — the round-6 ADVICE
    GC hazard — a LATER append's GC pass must not collect the live
    tombstone member table."""
    docs = _docs(spark)
    idx = dedup_index_write(
        docs.filter("doc_id < 20"), "tdel_dd", num_buckets=4
    )
    dedup_index_append(idx, docs.filter("doc_id >= 20 and doc_id < 25"))
    dels = spark.createDataFrame([(5,), (21,)], "doc_id bigint")
    dedup_index_delete(idx, dels)
    # a subsequent append runs two GC passes; the tombstone (still in
    # the live manifest) must survive both
    dedup_index_append(idx, docs.filter("doc_id >= 25"))
    got = _pairs(neardup_probe(_batch(spark), idx, 400_000))
    ref_idx = dedup_index_write(
        docs.filter("doc_id not in (5, 21)"), "tdel_dd_ref", num_buckets=4
    )
    ref = _pairs(neardup_probe(_batch(spark), ref_idx, 400_000))
    assert got == ref
    assert not any(c in (5, 21) for (_, c, _) in got)


def test_dedup_delete_readd_and_replay_idempotent(spark):
    """Delete-then-re-add == never deleted (epoch-scoped tombstones);
    replaying a delete of already-tombstoned docs is a no-op commit."""
    docs = _docs(spark)
    idx = dedup_index_write(docs, "tdel_readd", num_buckets=4)
    dels = spark.createDataFrame([(5,), (9,)], "doc_id bigint")
    dedup_index_delete(idx, dels)
    epoch_after_delete = idx.resolve(spark).epoch
    # replay: nothing visible to delete -> manifest unmoved
    dedup_index_delete(idx, dels)
    assert idx.resolve(spark).epoch == epoch_after_delete
    # re-add doc 5: lands in a NEW segment the tombstone predates
    dedup_index_append(idx, docs.filter("doc_id = 5"))
    got = _pairs(neardup_probe(_batch(spark), idx, 400_000))
    ref_idx = dedup_index_write(
        docs.filter("doc_id <> 9"), "tdel_readd_ref", num_buckets=4
    )
    ref = _pairs(neardup_probe(_batch(spark), ref_idx, 400_000))
    assert got == ref
    assert any(c == 5 for (_, c, _) in got)
    # exact probe: re-added text matches, deleted text does not
    eb = docs.filter("doc_id in (5, 9)").select(
        (F.col("doc_id") + 100).alias("doc_id"), "text"
    )
    hits = {r.doc_id for r in exact_probe(eb, idx).collect()}
    assert hits == {105}


def test_dedup_doc_aware_fps_keeps_shared_text_alive(spark):
    """Deleting ONE doc of an exact-duplicate pair must not suppress
    the other's fingerprint — the doc-aware fps contract."""
    docs = spark.createDataFrame(
        [(1, "shared text body one two three"),
         (2, "shared text body one two three"),
         (3, "unique text body four five six")],
        "doc_id bigint, text string",
    )
    idx = dedup_index_write(docs, "tdel_fps", num_buckets=4)
    dedup_index_delete(
        idx, spark.createDataFrame([(1,)], "doc_id bigint")
    )
    probe = spark.createDataFrame(
        [(10, "shared text body one two three")], "doc_id bigint, text string"
    )
    assert exact_probe(probe, idx).count() == 1  # doc 2 still carries it
    dedup_index_delete(
        idx, spark.createDataFrame([(2,)], "doc_id bigint")
    )
    assert exact_probe(probe, idx).count() == 0


def test_delete_overflow_triggers_fold_and_pins_replay_delete_state(spark):
    """compact_after deletes fold the index (bounded probe fan-out);
    a pinned pre-delete epoch keeps resolving with its own (empty)
    delete state while the current epoch suppresses."""
    docs = _docs(spark)
    idx = dedup_index_write(
        docs, "tdel_fold", num_buckets=4, compact_after=2
    )
    pinned = idx.resolve(spark).epoch
    set_index_pin(spark, idx.name, "t", [pinned])
    dedup_index_delete(
        idx, spark.createDataFrame([(5,)], "doc_id bigint")
    )
    cur = idx.resolve(spark)
    assert [te for te, _ in cur.tombs]  # one live tombstone
    # second delete reaches compact_after=2 -> fold right after commit
    dedup_index_delete(
        idx, spark.createDataFrame([(9,)], "doc_id bigint")
    )
    cur = idx.resolve(spark)
    assert cur.tombs == [] and len(cur.segments) == 1
    got = _pairs(neardup_probe(_batch(spark), idx, 400_000))
    assert not any(c in (5, 9) for (_, c, _) in got)
    # the pinned epoch still sees the full pre-delete corpus
    old = idx.resolve(spark, epoch=pinned)
    assert old.tombs == []
    assert old.sizes.read(spark).count() == 30
    set_index_pin(spark, idx.name, "t", None)


def test_lsh_delete_equals_rebuild(spark):
    docs = _docs(spark)
    idx = lsh_index_write(docs, "tdel_lsh", num_buckets=4)
    lsh_index_delete(
        idx, spark.createDataFrame([(5,)], "doc_id bigint")
    )
    got = _pairs(lsh_index_probe(_batch(spark), idx, 400_000))
    ref_idx = lsh_index_write(
        docs.filter("doc_id <> 5"), "tdel_lsh_ref", num_buckets=4
    )
    ref = _pairs(lsh_index_probe(_batch(spark), ref_idx, 400_000))
    assert got == ref


def test_bm25_delete_exact_scores_and_stats_correction(spark):
    """Post-delete ranking must be BIT-IDENTICAL to an index built
    without the docs — df re-derivation and the tomb-row stats
    correction (N, total_len) both participate in every score."""
    docs = _docs(spark)
    idx = bm25_index_write(docs, "tdel_bm", num_buckets=4)
    dels = spark.createDataFrame([(5,), (13,)], "doc_id bigint")
    bm25_index_delete(idx, dels)
    terms = ["doc5", "tail1", "alpha"]
    got = [
        (r.rank, r.doc_id, r.score_micro)
        for r in bm25_index_topk(spark, idx, terms, k=8).collect()
    ]
    ref_idx = bm25_index_write(
        docs.filter("doc_id not in (5, 13)"), "tdel_bm_ref", num_buckets=4
    )
    ref = [
        (r.rank, r.doc_id, r.score_micro)
        for r in bm25_index_topk(spark, ref_idx, terms, k=8).collect()
    ]
    assert got == ref
    assert not any(d in (5, 13) for (_, d, _) in got)


def test_ivf_delete_suppresses_and_readd_restores(spark):
    import random

    random.seed(11)
    vecs = spark.createDataFrame(
        [(i, [random.uniform(-1, 1) for _ in range(8)]) for i in range(40)],
        "vec_id bigint, embedding array<double>",
    )
    idx = ivf_index_write(vecs, "tdel_ivf", num_cells=4, num_buckets=4)
    qs = vecs.filter("vec_id < 3")
    top1 = {
        r.neighbor_id
        for r in ivf_index_topk(spark, idx, qs, k=1, nprobe=2).collect()
    }
    dels = spark.createDataFrame([(v,) for v in top1], "vec_id bigint")
    ivf_index_delete(idx, dels)
    post = {
        r.neighbor_id
        for r in ivf_index_topk(spark, idx, qs, k=3, nprobe=2).collect()
    }
    assert not (post & top1)
    # re-append the deleted vectors: assignment to the same frozen
    # centroids means the original top-1s come back verbatim
    ivf_index_append(idx, vecs.join(dels, "vec_id", "left_semi"))
    back = {
        r.neighbor_id
        for r in ivf_index_topk(spark, idx, qs, k=1, nprobe=2).collect()
    }
    assert back == top1


def test_pre_doc_aware_index_spec_refuses_loudly(spark):
    """A handle whose spec differs from the on-disk manifest (e.g. a
    pre-doc-aware fps index) must raise at resolve, not probe wrong."""
    docs = _docs(spark, n=6)
    dedup_index_write(docs, "tdel_spec", num_buckets=4)
    import json

    from ods_v3_dbt_spark.fs import fs_for
    from ods_v3_dbt_spark.operators.neardup_index import _manifest_path

    p = _manifest_path(spark, "tdel_spec")
    man = json.loads(fs_for(p).read_text(p))
    man["spec"].pop("fps")  # simulate a pre-doc-aware on-disk index
    # a genuinely old manifest predates spec_history too (round 12);
    # _read_manifest re-derives it from the mutated spec
    man.pop("spec_history", None)
    fs_for(p).write_text_atomic(p, json.dumps(man, sort_keys=True))
    with pytest.raises(ValueError, match="spec mismatch"):
        DedupIndex("tdel_spec", 3, 4).resolve(spark)


def test_delete_crash_replay_converges(spark, monkeypatch):
    """Delete shares the append's epoch-commit crash semantics: a
    delete that dies before the manifest replace leaves the index
    fully readable with the doc still visible (the orphaned tomb
    member is invisible), and the replay converges — one tombstone,
    suppression exact, no double-subtraction anywhere."""
    import ods_v3_dbt_spark.operators.neardup_index as NI

    docs = _docs(spark)
    idx = dedup_index_write(docs, "tdel_crash", num_buckets=4)
    e0 = idx.resolve(spark).epoch
    dels = spark.createDataFrame([(5,)], "doc_id bigint")

    real_commit = NI._commit_manifest

    def dying_commit(*a, **k):
        raise RuntimeError("simulated crash before manifest commit")

    monkeypatch.setattr(NI, "_commit_manifest", dying_commit)
    with pytest.raises(RuntimeError, match="simulated crash"):
        dedup_index_delete(idx, dels)
    cur = idx.resolve(spark)
    assert cur.epoch == e0 and cur.tombs == []
    assert any(
        c == 5 for (_, c, _) in
        ((r.doc_id, r.corpus_id, r.jacc_ppm)
         for r in neardup_probe(_batch(spark), idx, 400_000).collect())
    )

    monkeypatch.setattr(NI, "_commit_manifest", real_commit)
    dedup_index_delete(idx, dels)
    cur = idx.resolve(spark)
    assert cur.epoch == e0 + 1
    assert [te for te, _ in cur.tombs] == [e0 + 1]
    got = _pairs(neardup_probe(_batch(spark), idx, 400_000))
    ref_idx = dedup_index_write(
        docs.filter("doc_id <> 5"), "tdel_crash_ref", num_buckets=4
    )
    assert got == _pairs(neardup_probe(_batch(spark), ref_idx, 400_000))


def test_pinned_epoch_with_tombs_survives_compaction(spark):
    """The GC-subtlety the round-6 ADVICE flagged, end to end: pin an
    epoch WHOSE DELETE STATE IS LIVE (tombs attached), then compact
    (tombs fold physically, new epoch) — the pinned epoch must keep
    resolving with its tombstone tables attached and keep suppressing
    exactly what its commit saw, because tomb_history carries pinned
    epochs' tomb lists and the GC keep-set unions them."""
    from ods_v3_dbt_spark.operators.neardup_index import exact_probe

    docs = _docs(spark)
    idx = dedup_index_write(docs, "tdel_pintomb", num_buckets=4)
    dedup_index_delete(
        idx, spark.createDataFrame([(5,)], "doc_id bigint")
    )
    pinned = idx.resolve(spark).epoch  # the tombed epoch
    set_index_pin(spark, idx.name, "aud", [pinned])
    # fold: tombs vanish from the CURRENT epoch...
    dedup_index_compact(idx, spark)
    # ...and an unrelated append GCs again
    dedup_index_append(
        idx,
        spark.createDataFrame(
            [(200, "brand new appended document body here")],
            "doc_id bigint, text string",
        ),
    )
    cur = idx.resolve(spark)
    assert cur.tombs == []
    # the pinned epoch still attaches its tombstone and suppresses
    old = idx.resolve(spark, epoch=pinned)
    assert [te for te, _ in old.tombs] == [pinned]
    probe = docs.filter("doc_id = 5").select(
        (F.col("doc_id") + 100).alias("doc_id"), "text"
    )
    # doc 5's exact text: invisible at the pinned epoch (tombstoned),
    # invisible now (folded away) — visible nowhere
    b = probe.select(
        "doc_id",
        F.md5(F.lower(F.trim(F.col("text")))).alias("fp"),
    )
    from ods_v3_dbt_spark.operators.neardup_index import _fp_hits

    assert _fp_hits(b, old, spark).count() == 0
    assert exact_probe(probe, idx).count() == 0
    set_index_pin(spark, idx.name, "aud", None)


def test_bm25_multiquery_delete_equals_rebuild(spark):
    """The df re-derivation and stats correction must also hold in
    the BATCH retrieval shape (one set of pruned posting reads fanned
    out to many queries) — scores bit-equal to a rebuilt index."""
    from ods_v3_dbt_spark.operators.text_index import (
        bm25_index_multiquery_topk,
    )

    docs = _docs(spark)
    idx = bm25_index_write(docs, "tdel_bmq", num_buckets=4)
    bm25_index_delete(
        idx, spark.createDataFrame([(5,), (13,)], "doc_id bigint")
    )
    qs = spark.createDataFrame(
        [("q1", "doc5"), ("q1", "alpha"), ("q2", "tail1"), ("q2", "beta")],
        "query_id string, term string",
    )
    got = sorted(
        tuple(r)
        for r in bm25_index_multiquery_topk(spark, idx, qs, k=5).collect()
    )
    ref_idx = bm25_index_write(
        docs.filter("doc_id not in (5, 13)"), "tdel_bmq_ref", num_buckets=4
    )
    ref = sorted(
        tuple(r)
        for r in bm25_index_multiquery_topk(spark, ref_idx, qs, k=5).collect()
    )
    assert got == ref
    assert not any(t[2] in (5, 13) for t in got)


def test_maintain_indexes_folds_and_refreshes(spark, tmp_path):
    """The weekly maintenance job: multi-segment / tombstoned indexes
    fold, healthy single-segment ones are untouched, IVF gets recall
    telemetry, and every action lands an audit row."""
    import json

    from ods_v3_dbt_spark.jobs import maintain_indexes
    from ods_v3_dbt_spark.runlog import RunLog

    docs = _docs(spark)
    d_idx = dedup_index_write(
        docs.filter("doc_id < 15"), "tmnt_dd", num_buckets=4,
        compact_after=99,
    )
    dedup_index_append(d_idx, docs.filter("doc_id >= 15"))
    dedup_index_delete(
        d_idx, spark.createDataFrame([(5,)], "doc_id bigint")
    )
    b_idx = bm25_index_write(docs, "tmnt_bm", num_buckets=4)  # healthy
    import random

    random.seed(9)
    emb = spark.createDataFrame(
        [(i, [random.uniform(-1, 1) for _ in range(8)]) for i in range(30)],
        "vec_id bigint, embedding array<double>",
    )
    v_idx = ivf_index_write(emb, "tmnt_ivf", num_cells=2, num_buckets=2)

    log = RunLog(tmp_path / "mlog")
    reports = maintain_indexes(
        spark, [d_idx, b_idx, v_idx], ivf_nprobe=2, run_log=log
    )
    by_name = {r["index"]: r for r in reports}
    assert by_name["tmnt_dd"]["compacted"] is True
    assert by_name["tmnt_dd"]["segments_after"] == 1
    assert by_name["tmnt_bm"]["compacted"] is False
    assert by_name["tmnt_ivf"]["recall_ppm"] == 1_000_000  # full probe
    assert by_name["tmnt_ivf"]["refreshed"] is False

    # the fold kept the delete: suppression is now physical
    got = _pairs(neardup_probe(_batch(spark), d_idx, 400_000))
    assert not any(c == 5 for (_, c, _) in got)
    cur = d_idx.resolve(spark)
    assert cur.tombs == [] and len(cur.segments) == 1

    rows = log.read(spark).collect()
    assert {r.task_id for r in rows} == {
        "maintain:tmnt_dd", "maintain:tmnt_bm", "maintain:tmnt_ivf"
    }
    assert all(r.is_success for r in rows)
    logged = json.loads(
        next(r for r in rows if r.task_id == "maintain:tmnt_dd").result
    )
    assert logged["compacted"] is True


def test_simhash_index_delete_compact_and_maintenance(spark, tmp_path):
    """The SimHash kind honors the family contracts: delete ==
    rebuild-without, compaction folds tombs physically, and
    maintain_indexes dispatches its fold."""
    from ods_v3_dbt_spark.jobs import maintain_indexes
    from ods_v3_dbt_spark.operators.simhash_index import (
        simhash_index_append,
        simhash_index_delete,
        simhash_index_probe,
        simhash_index_write,
    )

    docs = _docs(spark)
    idx = simhash_index_write(
        docs.filter("doc_id < 20"), "tdel_sh", num_buckets=4,
        compact_after=99,
    )
    simhash_index_append(idx, docs.filter("doc_id >= 20"))
    simhash_index_delete(
        idx, spark.createDataFrame([(5,)], "doc_id bigint")
    )
    batch = docs.filter("doc_id in (5, 9)").select(
        (F.col("doc_id") + 100).alias("doc_id"), "text"
    )
    got = sorted(
        (r.doc_id, r.corpus_id, r.hamming)
        for r in simhash_index_probe(batch, idx, 6).collect()
    )
    ref = simhash_index_write(
        docs.filter("doc_id <> 5"), "tdel_sh_ref", num_buckets=4
    )
    assert got == sorted(
        (r.doc_id, r.corpus_id, r.hamming)
        for r in simhash_index_probe(batch, ref, 6).collect()
    )
    assert (105, 9, 0) not in got  # different docs, no false pair
    assert not any(c == 5 for (_, c, _) in got)
    assert any(b == 109 and c == 9 for (b, c, _) in got)

    # maintenance folds the 2 segments + 1 tomb into one clean segment
    reports = maintain_indexes(spark, [idx])
    rep = reports[0]
    assert rep["compacted"] is True and rep["segments_after"] == 1
    cur = idx.resolve(spark)
    assert cur.tombs == []
    assert got == sorted(
        (r.doc_id, r.corpus_id, r.hamming)
        for r in simhash_index_probe(batch, idx, 6).collect()
    )


def test_index_self_pairs_matches_inline_and_honors_tombs(spark):
    """index_self_pairs == the inline shingle-blocked pipeline over
    the same corpus, and a tombstoned doc contributes no pairs until
    re-added."""
    from ods_v3_dbt_spark.operators.dedup import ngram_jaccard_pairs
    from ods_v3_dbt_spark.operators.neardup_index import index_self_pairs

    docs = _docs(spark).unionByName(
        # plant a near-dup pair inside the corpus
        spark.createDataFrame(
            [(105, "alpha beta gamma delta epsilon zeta doc5 tail1 "
                   "more words here extra")],
            "doc_id bigint, text string",
        )
    )
    idx = dedup_index_write(docs, "tsp_idx", num_buckets=4)
    got = sorted(
        (r.doc_a, r.doc_b, r.jacc_ppm)
        for r in index_self_pairs(idx, 400_000, spark=spark).collect()
    )
    ref = sorted(
        (r.doc_a, r.doc_b, r.jacc_ppm)
        for r in ngram_jaccard_pairs(docs, threshold_ppm=400_000).collect()
    )
    assert got == ref and got  # non-trivial and identical
    # tombstone doc 5: every pair it participated in vanishes
    dedup_index_delete(idx, spark.createDataFrame([(5,)], "doc_id bigint"))
    post = sorted(
        (r.doc_a, r.doc_b, r.jacc_ppm)
        for r in index_self_pairs(idx, 400_000, spark=spark).collect()
    )
    assert post == sorted(
        (r.doc_a, r.doc_b, r.jacc_ppm)
        for r in ngram_jaccard_pairs(
            docs.filter("doc_id <> 5"), threshold_ppm=400_000
        ).collect()
    )
    assert not any(5 in (a, b) for (a, b, _) in post)


def test_simhash_self_pairs_matches_inline_and_honors_tombs(spark):
    """simhash_index_self_pairs == the inline simhash64 +
    simhash_near_pairs pipeline over the same corpus, and a
    tombstoned doc contributes no pairs until re-added."""
    from ods_v3_dbt_spark.operators.dedup import (
        simhash64,
        simhash_near_pairs,
    )
    from ods_v3_dbt_spark.operators.simhash_index import (
        simhash_index_append,
        simhash_index_delete,
        simhash_index_self_pairs,
        simhash_index_write,
    )

    docs = _docs(spark).unionByName(
        # exact copy of doc 5 → hamming 0, guaranteed in any blocking
        spark.createDataFrame(
            [(105, "alpha beta gamma delta epsilon zeta doc5 "
                   "tail1 more words here")],
            "doc_id bigint, text string",
        )
    )

    def inline(d):
        return sorted(
            (r.doc_a, r.doc_b, r.hamming)
            for r in simhash_near_pairs(
                simhash64(d, hash_mode="md5"),
                max_hamming=10, prefix_bits=8, hash_bits=60,
            ).collect()
        )

    idx = simhash_index_write(docs, "tspsim_idx", num_buckets=4)
    got = sorted(
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_index_self_pairs(idx, 10, spark=spark).collect()
    )
    assert got == inline(docs) and got
    # tombstone doc 5: every pair it participated in vanishes
    simhash_index_delete(idx, spark.createDataFrame([(5,)], "doc_id bigint"))
    post = sorted(
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_index_self_pairs(idx, 10, spark=spark).collect()
    )
    assert post == inline(docs.filter("doc_id <> 5"))
    assert not any(5 in (a, b) for (a, b, _) in post)
    # re-add via append: delete-then-re-add ≡ never deleted
    simhash_index_append(
        idx, docs.filter("doc_id = 5").select("doc_id", "text")
    )
    back = sorted(
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_index_self_pairs(idx, 10, spark=spark).collect()
    )
    assert back == inline(docs)


def test_dedup_index_random_walk_matches_model(spark):
    """Model-based walk over the LSM index state machine: random
    interleavings of append / tombstone-delete / compact against a
    dict model — after every op, exact probes see exactly the model's
    live texts (epoch-scoped delete-then-re-add, fps doc-awareness,
    and tombstone GC can never lose or resurrect a membership)."""
    import random

    from ods_v3_dbt_spark.operators.neardup_index import (
        DedupIndex,
        dedup_index_append,
        dedup_index_compact,
        dedup_index_delete,
        dedup_index_write,
        exact_probe,
    )

    for seed in (3, 23):
        rng = random.Random(seed)
        name = f"walk_idx_{seed}"
        texts = [
            f"alpha beta gamma document body number {i} tail words"
            for i in range(12)
        ] + ["tiny doc"]  # sub-shingle member exercises the fps path
        model: dict[int, str] = {}
        next_id = 0

        def batch(rows):
            return spark.createDataFrame(rows, "doc_id long, text string")

        # bootstrap with 4 docs
        for _ in range(4):
            model[next_id] = texts[next_id % len(texts)]
            next_id += 1
        idx = dedup_index_write(batch(list(model.items())), name,
                                num_buckets=2, compact_after=99)

        def check(step, op):
            probe = batch([(900 + i, t) for i, t in enumerate(texts)])
            hits = {
                r.doc_id
                for r in exact_probe(probe, idx).collect()
            }
            live_texts = set(model.values())
            want = {
                900 + i for i, t in enumerate(texts) if t in live_texts
            }
            assert hits == want, f"seed={seed} step={step} {op}"

        for step in range(8):
            op = rng.choice(["append", "append", "delete", "compact"])
            if op == "append":
                rows = []
                for _ in range(rng.randint(1, 3)):
                    model[next_id] = texts[rng.randrange(len(texts))]
                    rows.append((next_id, model[next_id]))
                    next_id += 1
                if rng.random() < 0.3 and model:
                    # replay an existing doc too (idempotence)
                    did = rng.choice(list(model))
                    rows.append((did, model[did]))
                dedup_index_append(idx, batch(rows))
            elif op == "delete" and model:
                k = rng.randint(1, min(2, len(model)))
                dead = rng.sample(list(model), k)
                dedup_index_delete(
                    idx, batch([(d, "") for d in dead]).select("doc_id")
                )
                for d in dead:
                    model.pop(d)
            elif op == "compact":
                dedup_index_compact(idx, spark)
            check(step, op)


def test_ivf_self_dedup_matches_inline_and_honors_tombs(spark):
    """ivf_index_self_dedup == the inline semantic_dedup_l2q over the
    same corpus, and a tombstoned vector contributes no rows/pairs
    until re-added."""
    import random

    from ods_v3_dbt_spark.operators.similarity import semantic_dedup_l2q
    from ods_v3_dbt_spark.operators.vector_index import (
        ivf_index_self_dedup,
        ivf_index_write,
    )

    random.seed(41)
    rows = [(i, [random.uniform(-1, 1) for _ in range(8)])
            for i in range(40)]
    # plant near-dups: clones of every 4th vector, one dim bumped
    rows += [
        (i + 100, [v + (0.05 if d == 0 else 0.0)
                   for d, v in enumerate(vec)])
        for i, vec in rows[:40:4]
    ]
    vdf = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )

    def shape(df):
        return sorted(
            (r.vec_id, r.cell, r.component_id, r.keep)
            for r in df.collect()
        )

    idx = ivf_index_write(vdf, "tsd_ivf", num_cells=4, num_buckets=2)
    inline = shape(semantic_dedup_l2q(vdf, num_cells=4, radius2=300_000))
    assert shape(ivf_index_self_dedup(idx, 300_000, spark=spark)) == inline
    assert any(not k for (_, _, _, k) in inline)  # dups actually found

    # tombstone one planted clone: its row vanishes and its source
    # becomes (or stays) its own keeper — equal to the inline run on
    # the reduced corpus ASSIGNED under the same frozen centroids,
    # which for this fixture equals dropping its rows/edges
    from ods_v3_dbt_spark.operators.vector_index import ivf_index_delete

    ivf_index_delete(idx, spark.createDataFrame([(100,)], "vec_id bigint"))
    post = shape(ivf_index_self_dedup(idx, 300_000, spark=spark))
    assert all(v != 100 for (v, _, _, _) in post)
    # vec 0 (the clone's source) now keeps itself unless another
    # clone shares its component
    d = {v: (comp, k) for (v, _, comp, k) in post}
    assert d[0][1] or d[0][0] != 0
