"""Semantic deny arm (round-9 verdict task 7): a takedown with
``deny_semantic=True`` persists quantized embedding centroids +
radii, and the ingest gate refuses PARAPHRASES of taken-down
content — reworded copies that share no shingles (fp and band arms
both blind) but sit inside the radius in embedding space — with
verdict ``denied_semantic``. The oracle-checked
``deny_semantic_decisions`` registry row value-verifies the probe
math; these tests pin the END-TO-END store behavior: takedown →
paraphrase resubmit → refused, plus the precedence, spec-pinning,
and misconfiguration contracts."""

from __future__ import annotations

import datetime as dt
import random

import pytest

from ods_v3_dbt_spark.pipelines import (
    DENY_SEM_SPEC,
    corpus_takedown,
    curate_increment_stream,
)
from ods_v3_dbt_spark.sinks import ParquetTable

SCHEMA = "doc_id long, text string, embedding array<double>, ingest_ts timestamp"
T0 = dt.datetime(2024, 9, 1, 12, 0, 0)
BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
FRESH = "totally new words nobody used before in any earlier batch"
PARA = "entirely different phrasing conveying the very same idea again"


def _harness(spark, tmp_path, index_name):
    src, ckpt = tmp_path / "src", tmp_path / "ckpt"
    corpus, dec = tmp_path / "corpus", tmp_path / "dec"
    process = curate_increment_stream(
        corpus, index_name, str(dec), num_buckets=2,
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

    def verdicts():
        return {
            r.doc_id: r.verdict
            for r in spark.read.parquet(str(dec)).collect()
        }

    return corpus, write, drain, verdicts


def test_takedown_then_paraphrase_resubmit_refused(spark, tmp_path):
    """The arm's reason to exist: after a semantic takedown, a
    PARAPHRASE of the removed doc — zero shared shingles, so the
    exact-fp and band arms are both blind, and the takedown's own
    index tombstones erased the near-dup memory — is refused at the
    gate as ``denied_semantic`` and never re-enters the corpus.
    Contrast ``test_curate_increment_stream_semantic_channel``:
    WITHOUT the arm the same resubmit is 'genuinely new again'."""
    random.seed(5)
    vecs = [[random.uniform(-1, 1) for _ in range(8)] for _ in range(3)]
    corpus, write, drain, verdicts = _harness(spark, tmp_path, "t_dsem_idx")

    write([(1, BASE, vecs[0], T0), (2, FRESH, vecs[1], T0)])
    drain()
    assert sorted(
        r.doc_id for r in ParquetTable(corpus).read(spark).collect()
    ) == [1, 2]

    corpus_takedown(
        spark, corpus, spark.createDataFrame([(1,)], "doc_id bigint"),
        deny_semantic=True,
    )
    # __deny_sem holds QUANTIZED residue only — never text/embedding
    sem = ParquetTable(f"{corpus}__deny_sem").read(spark)
    assert set(sem.columns) == {"centroid", "radius2", "request_id",
                                "expires_at"}
    assert sem.count() == 1

    # paraphrase: different words (both textual arms blind),
    # embedding = source + one small bump (quantized L2² = 50² =
    # 2500, far inside the 300 000 radius); plus a genuinely new doc
    bumped = [vecs[0][0] + 0.05] + vecs[0][1:]
    write([
        (21, PARA, bumped, T0),
        (22, "completely separate topic about gardening tools", vecs[2], T0),
    ])
    drain()
    v = verdicts()
    assert v[21] == "denied_semantic"
    assert v[22] == "admitted"
    got = sorted(r.doc_id for r in ParquetTable(corpus).read(spark).collect())
    assert 21 not in got and 22 in got

    # precedence: a VERBATIM resubmit reports the strongest class
    # (denied, not denied_semantic) even though it also sits at
    # distance zero from the centroid
    write([(31, BASE, vecs[0], T0)])
    drain()
    assert verdicts()[31] == "denied"

    # replay idempotence: a second takedown of the same (now absent)
    # doc converges — the centroid set is union-distinct
    corpus_takedown(
        spark, corpus, spark.createDataFrame([(1,)], "doc_id bigint"),
        deny_semantic=True,
    )
    assert ParquetTable(f"{corpus}__deny_sem").read(spark).count() == 1


def test_sem_spec_pinned_and_mismatch_refused(spark, tmp_path):
    """The family pins spec-first at the first semantic takedown
    (same crash-window ordering as the band arm's _DENY_SPEC); a
    later takedown passing a DIFFERENT family must refuse loudly —
    the gate replays the persisted one."""
    import json

    from ods_v3_dbt_spark import fs as FS
    from ods_v3_dbt_spark.pipelines import _deny_sem_spec_path

    random.seed(7)
    vecs = [[random.uniform(-1, 1) for _ in range(8)] for _ in range(2)]
    corpus, write, drain, _ = _harness(spark, tmp_path, "t_dsemspec_idx")
    write([(1, BASE, vecs[0], T0), (2, FRESH, vecs[1], T0)])
    drain()

    custom = dict(DENY_SEM_SPEC, dist2_max=10_000)
    corpus_takedown(
        spark, corpus, spark.createDataFrame([(1,)], "doc_id bigint"),
        deny_semantic=True, deny_sem_spec=custom,
    )
    p = _deny_sem_spec_path(corpus)
    assert json.loads(FS.fs_for(p).read_text(p)) == custom

    with pytest.raises(ValueError, match="semantic deny spec mismatch"):
        corpus_takedown(
            spark, corpus, spark.createDataFrame([(2,)], "doc_id bigint"),
            deny_semantic=True, deny_sem_spec=dict(DENY_SEM_SPEC),
        )

    # the persisted (tightened) radius governs the gate: a bump of
    # 0.2 → quantized L2² = 200² = 40 000 > 10 000 admits, while the
    # default family would have refused it
    bumped = [vecs[0][0] + 0.2] + vecs[0][1:]
    write([(21, PARA, bumped, T0)])
    drain()
    v = {
        r.doc_id: r.verdict
        for r in spark.read.parquet(str(tmp_path / "dec")).collect()
    }
    assert v[21] == "admitted"


def test_semantic_denylist_requires_embedding_channel(spark, tmp_path):
    """Two loud-misconfiguration contracts: (a) deny_semantic=True
    on a store WITHOUT the embedding channel raises (a takedown
    cannot promise semantic refusal it has no embeddings for); (b) a
    store CARRYING semantic deny state gated by a text-only stream
    raises instead of silently re-admitting paraphrases."""
    src, ckpt = tmp_path / "src", tmp_path / "ckpt"
    corpus, dec = tmp_path / "corpus", tmp_path / "dec"
    process = curate_increment_stream(
        corpus, "t_dsemtext_idx", str(dec), num_buckets=2
    )
    txt_schema = "doc_id long, text string, ingest_ts timestamp"
    spark.createDataFrame([(1, BASE, T0)], txt_schema).coalesce(
        1
    ).write.mode("append").parquet(str(src))
    q = (
        spark.readStream.schema(txt_schema).parquet(str(src))
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    with pytest.raises(ValueError, match="embedding"):
        corpus_takedown(
            spark, corpus, spark.createDataFrame([(1,)], "doc_id bigint"),
            deny_semantic=True,
        )

    # (b): fake semantic deny state next to the text-only store, then
    # drive one more batch — the gate must refuse to run blind
    ParquetTable(f"{corpus}__deny_sem").write(
        spark.createDataFrame(
            [([1000] * 8, 300000)], "centroid array<bigint>, radius2 long"
        )
    )
    spark.createDataFrame([(2, FRESH, T0)], txt_schema).coalesce(
        1
    ).write.mode("append").parquet(str(src))
    q = (
        spark.readStream.schema(txt_schema).parquet(str(src))
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="semantic denylist|__deny_sem"):
        q.awaitTermination(180)
        raise RuntimeError("stream should have failed")


def test_deny_release_reallows_content(spark, tmp_path):
    """The inverse verb: releasing ONE doc's residues re-admits its
    content (verbatim AND paraphrase) while the other taken-down
    doc's residues keep refusing — across all three arms."""
    from ods_v3_dbt_spark.pipelines import deny_release

    random.seed(9)
    vecs = [[random.uniform(-1, 1) for _ in range(8)] for _ in range(2)]
    corpus, write, drain, verdicts = _harness(spark, tmp_path, "t_drel_idx")
    write([(1, BASE, vecs[0], T0), (2, FRESH, vecs[1], T0)])
    drain()
    corpus_takedown(
        spark, corpus,
        spark.createDataFrame([(1,), (2,)], "doc_id bigint"),
        deny_semantic=True,
    )
    bump1 = [vecs[0][0] + 0.05] + vecs[0][1:]
    write([(31, BASE, vecs[0], T0), (32, PARA, bump1, T0)])
    drain()
    v = verdicts()
    assert v[31] == "denied" and v[32] == "denied_semantic"

    receipt = deny_release(
        spark, corpus,
        spark.createDataFrame(
            [(1, BASE, vecs[0])], "doc_id long, text string, embedding array<double>"
        ),
    )
    assert receipt["fps_removed"] == 1
    assert receipt["bands_removed"] >= 1
    assert receipt["centroids_removed"] == 1
    # released content re-admits (takedown tombstoned the index, so
    # it is genuinely new); the OTHER doc's residues keep refusing
    bump2 = [vecs[1][0] + 0.05] + vecs[1][1:]
    write([(41, BASE, vecs[0], T0), (42, PARA + " two", bump1, T0),
           (43, FRESH, vecs[1], T0),
           (44, "reworded copy of the still denied second document", bump2, T0)])
    drain()
    v = verdicts()
    assert v[41] == "admitted" and v[42] == "admitted"
    assert v[43] == "denied" and v[44] == "denied_semantic"
    # idempotent: releasing the same content again removes nothing
    receipt = deny_release(
        spark, corpus,
        spark.createDataFrame(
            [(1, BASE, vecs[0])], "doc_id long, text string, embedding array<double>"
        ),
    )
    assert receipt == {"fps_removed": 0, "bands_removed": 0,
                       "centroids_removed": 0}
