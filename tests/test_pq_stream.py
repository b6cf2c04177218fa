"""Stream-level IVFADC semantic channel (round-9 verdict task 9,
stream arm): ``curate_increment_stream(semantic_index_kind="pq")``
maintains a persisted PqIndex alongside the text index — decisions
come from ADC lookup sums, appends encode against frozen codebooks,
and takedown / whole-store maintenance resolve the flavor from the
co-manifest's recorded ``kind: ivfadc`` spec."""

from __future__ import annotations

import datetime as dt
import json
import random

from ods_v3_dbt_spark import fs as FS
from ods_v3_dbt_spark.operators.pq_index import PqIndex
from ods_v3_dbt_spark.pipelines import (
    _curated_fields,
    _sem_index_from_manifest,
    corpus_takedown,
    curate_increment_stream,
)
from ods_v3_dbt_spark.sinks import ParquetTable

SCHEMA = "doc_id long, text string, embedding array<double>, ingest_ts timestamp"
T0 = dt.datetime(2024, 9, 1, 12, 0, 0)
BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
FRESH = "totally new words nobody used before in any earlier batch"
PARA = "entirely different phrasing conveying the very same idea again"


def test_stream_pq_semantic_channel_end_to_end(spark, tmp_path):
    """The semantic-channel stream test re-run on the IVFADC flavor:
    a paraphrase of an EARLIER batch's doc (no shared shingles,
    nearby embedding) is caught across batches as
    ``neardup_semantic`` through the persisted PqIndex; the
    co-manifest records ``kind: ivfadc`` and resolves back to a
    PqIndex handle; takedown tombstones it through that handle and
    the paraphrase then admits."""
    # 8 training docs with diverse vectors and 8 codewords per
    # subspace: PQ reconstruction is coarse BY DESIGN, and a
    # degenerate codebook (2 codes over 2 training points) collapses
    # every vector onto a handful of reconstruction points — an
    # unrelated doc can then reconstruct NEXT TO the query and flag
    # a false neardup_semantic. That is declared ADC behavior, not a
    # plumbing bug; the fixture sizes the codebook like a real
    # deployment would (num_codes ~ training diversity).
    random.seed(5)
    vecs = [[random.uniform(-1, 1) for _ in range(8)] for _ in range(10)]
    words = ["ocean", "mountain", "forest", "desert", "river", "valley",
             "glacier"]
    texts = {1: BASE}
    for i in range(2, 9):
        w = words[i - 2]
        texts[i] = (
            f"{w} stories describe the {w} landscape with {w} specific "
            f"vocabulary item{i} here{i} now{i}"
        )
    src, ckpt = tmp_path / "src", tmp_path / "ckpt"
    corpus, dec = tmp_path / "corpus", tmp_path / "dec"
    process = curate_increment_stream(
        corpus, "t_pqstream_idx", str(dec), num_buckets=2,
        embedding_col="embedding", ivf_cells=2,
        semantic_index_kind="pq", pq_subs=4, pq_codes=8, pq_dims=8,
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

    write([(i, texts[i], vecs[i - 1], T0) for i in range(1, 9)])
    drain()
    # the co-manifest records the IVFADC spec and resolves back to a
    # PqIndex handle — what takedown/maintenance will drive
    fs = FS.fs_for(str(corpus))
    man = _curated_fields(
        json.loads(fs.read_text(FS.join(str(corpus), "_CURATED")))
    )
    assert man["ivf_spec"]["kind"] == "ivfadc"
    sem = _sem_index_from_manifest(man)
    assert isinstance(sem, PqIndex) and sem.exists(spark)
    assert sem.dim_count == 8 and sem.num_subs == 4

    # batch 2: paraphrase of doc 1 (zero shared shingles, embedding =
    # doc 1's + a small bump → ADC distance far inside the radius)
    # and an unrelated new doc
    bumped = [vecs[0][0] + 0.05] + vecs[0][1:]
    write([
        (11, PARA, bumped, T0),
        (12, "completely separate topic about gardening tools", vecs[8], T0),
    ])
    drain()
    verdicts = {
        r.doc_id: r.verdict for r in spark.read.parquet(str(dec)).collect()
    }
    assert verdicts[11] == "neardup_semantic"
    assert all(verdicts[i] == "admitted" for i in [*range(1, 9), 12])
    got = sorted(r.doc_id for r in ParquetTable(corpus).read(spark).collect())
    assert got == [*range(1, 9), 12]

    # takedown reaches the PQ index via the co-manifest; the
    # paraphrase is then genuinely new again (no deny arms requested)
    corpus_takedown(
        spark, corpus, spark.createDataFrame([(1,)], "doc_id bigint"),
        deny=False,
    )
    write([(21, PARA + " slightly", bumped, T0)])
    drain()
    verdicts = {
        r.doc_id: r.verdict for r in spark.read.parquet(str(dec)).collect()
    }
    assert verdicts[21] == "admitted"


def test_maintain_store_refreshes_pq_channel(spark, tmp_path):
    """Whole-store maintenance on an IVFADC store: folds the PQ
    index's delta segments and runs the recall gate with the
    CORPUS's floats (the index retains none — the consistency
    rule); the report carries recall telemetry for the PQ handle."""
    random.seed(11)
    vecs = [[random.uniform(-1, 1) for _ in range(8)] for _ in range(4)]
    src, ckpt = tmp_path / "src", tmp_path / "ckpt"
    corpus, dec = tmp_path / "corpus", tmp_path / "dec"
    process = curate_increment_stream(
        corpus, "t_pqmaint_idx", str(dec), num_buckets=2,
        embedding_col="embedding", ivf_cells=2,
        semantic_index_kind="pq", pq_subs=4, pq_codes=2, pq_dims=8,
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

    write([(1, BASE, vecs[0], T0), (2, FRESH, vecs[1], T0)])
    drain()
    write([(3, "yet another brand new document with its own words entirely",
            vecs[2], T0)])
    drain()  # second batch appends a PQ delta segment

    from ods_v3_dbt_spark.jobs import maintain_curated_store

    report = maintain_curated_store(spark, corpus)
    pq_rep = next(
        r for r in report["indexes"] if r["kind"] == "ivfadc"
    )
    assert pq_rep["compacted"] is True  # delta segments folded
    assert "recall_ppm" in pq_rep  # the store-scope recall gate ran
    assert pq_rep["segments_after"] == 1