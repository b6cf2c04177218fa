"""Round-8 regression tests for the round-7 ADVICE findings:

1. (high) corpus_takedown must carry the semantic IVF pointers into
   the new _CURATED manifest — a second takedown before the next
   curation batch must still tombstone the IVF index.
2. (medium) deleting a sub-shingle-length doc (zero shingles → no
   sizes row) must still retract its fingerprint; appends of such
   docs must stay idempotent.
3. (medium) wds_shards_takedown must execute its rewrites inside the
   call — an unactioned return must remove nothing is the BUG shape.
4. (low) enabling embedding_col on a pre-existing text-only store is
   a working migration (NULL backfill), not a per-batch crash.
5. (low) a stream pointed at a legacy index whose on-disk spec no
   longer matches rebuilds from the corpus instead of failing every
   batch.
"""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F

T0 = dt.datetime(2024, 9, 1, 12, 0, 0)


# ---------------------------------------------------------------------------
# 1. takedown keeps the IVF pointer (high)
# ---------------------------------------------------------------------------

def test_two_takedowns_keep_tombstoning_the_ivf_index(spark, tmp_path):
    import random

    from ods_v3_dbt_spark.operators.vector_index import (
        IvfIndex,
        ivf_index_topk,
    )
    from ods_v3_dbt_spark.pipelines import (
        corpus_takedown,
        curate_increment_stream,
    )

    random.seed(7)
    SCHEMA = (
        "doc_id long, text string, embedding array<double>, "
        "ingest_ts timestamp"
    )
    vecs = [[random.uniform(-1, 1) for _ in range(8)] for _ in range(3)]
    corpus, dec = tmp_path / "corpus", tmp_path / "dec"
    process = curate_increment_stream(
        corpus, "adv8_sem_idx", str(dec), num_buckets=2,
        embedding_col="embedding", ivf_cells=2,
    )
    batch = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta", vecs[0], T0),
            (2, "totally new words nobody used before", vecs[1], T0),
            (3, "unrelated vocabulary on its own island", vecs[2], T0),
        ],
        SCHEMA,
    )
    process(batch, 1)

    import json as _json

    from ods_v3_dbt_spark import fs as FS

    man_path = FS.join(corpus, "_CURATED")
    fs = FS.fs_for(corpus)

    def manifest_extras():
        return _json.loads(fs.read_text(man_path))["extras"]

    pre = manifest_extras()
    assert pre["ivf_name"] == "adv8_sem_idx_ivf"

    # first takedown: manifest must STILL carry the ivf pointers
    corpus_takedown(
        spark, corpus, spark.createDataFrame([(1,)], "doc_id bigint")
    )
    m1 = manifest_extras()
    assert m1.get("ivf_name") == pre["ivf_name"]
    assert m1.get("ivf_spec") == pre["ivf_spec"]
    assert m1.get("ivf_epoch") is not None

    # second consecutive takedown (no curation batch in between) must
    # still find and tombstone the IVF index: doc 2's own embedding no
    # longer retrieves it through the ANN channel
    receipt = corpus_takedown(
        spark, corpus, spark.createDataFrame([(2,)], "doc_id bigint")
    )
    assert receipt["n_removed"] == 1 and "ivf_epoch" in receipt
    ivf = IvfIndex("adv8_sem_idx_ivf", 2, 2)
    q = spark.createDataFrame(
        [(2, vecs[1])], "vec_id bigint, embedding array<double>"
    )
    hits = {
        r.neighbor_id
        for r in ivf_index_topk(spark, ivf, q, k=3, nprobe=2).collect()
    }
    assert 2 not in hits and 1 not in hits and 3 in hits


# ---------------------------------------------------------------------------
# 2. sub-shingle-length docs delete (and re-append) correctly (medium)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("kind", ["exact", "lsh"])
def test_delete_sub_shingle_doc_retracts_fingerprint(spark, kind):
    from ods_v3_dbt_spark.operators.neardup_index import (
        dedup_index_delete,
        dedup_index_write,
        exact_probe,
        lsh_index_delete,
        lsh_index_write,
    )

    # doc 2 has fewer tokens than shingle_n=3: zero shingles, no sizes
    # row — but it DOES have a fingerprint row, and deleting it must
    # stop exact probes from matching its text
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"), (2, "tiny doc")],
        "doc_id long, text string",
    )
    if kind == "exact":
        idx = dedup_index_write(docs, f"adv8_sub_{kind}", num_buckets=2)
        delete = dedup_index_delete
    else:
        idx = lsh_index_write(docs, f"adv8_sub_{kind}", num_buckets=2)
        delete = lsh_index_delete
    probe = spark.createDataFrame([(99, "tiny doc")], "doc_id long, text string")
    assert exact_probe(probe, idx).count() == 1
    delete(idx, spark.createDataFrame([(2,)], "doc_id long"))
    assert exact_probe(probe, idx).count() == 0
    # delete-then-re-add ≡ never deleted, even for sub-shingle docs
    if kind == "exact":
        from ods_v3_dbt_spark.operators.neardup_index import dedup_index_append as append
    else:
        from ods_v3_dbt_spark.operators.neardup_index import lsh_index_append as append
    append(idx, spark.createDataFrame([(2, "tiny doc")], "doc_id long, text string"))
    assert exact_probe(probe, idx).count() == 1
    # replaying the append is a no-op (fps-based idempotence guard
    # sees the sub-shingle doc): fp stays single-valued per segment
    epoch_before = idx.resolve(spark).epoch
    append(idx, spark.createDataFrame([(2, "tiny doc")], "doc_id long, text string"))
    assert idx.resolve(spark).epoch == epoch_before


# ---------------------------------------------------------------------------
# 3. wds takedown executes inside the call (medium)
# ---------------------------------------------------------------------------

def test_wds_takedown_rewrites_even_when_receipt_unactioned(spark, tmp_path):
    from ods_v3_dbt_spark.sources import wds as W

    rows = [(i, i // 4, f"{i:06d}", f"body of {i}") for i in range(8)]
    df = spark.createDataFrame(
        rows, "doc_id long, shard_id long, key string, txt string"
    )
    W.write_wds_shards(
        df, str(tmp_path), shard_col="shard_id", key_col="key",
        part_cols=("txt",),
    ).collect()
    keys = spark.createDataFrame([("000001",)], "key string")
    # deliberately IGNORE the returned receipt — the rewrite must have
    # happened anyway (compliance actions are not lazy side effects)
    W.wds_shards_takedown(spark, str(tmp_path / "*.tar"), keys)
    back = W.wds_samples(spark, str(tmp_path / "*.tar"))
    got = {r.key for r in back.collect() if r.ok}
    assert "000001" not in got and "000002" in got


# ---------------------------------------------------------------------------
# 4. embedding_col migration on a text-only store (low)
# ---------------------------------------------------------------------------

def test_semantic_channel_enables_on_legacy_text_only_store(spark, tmp_path):
    import random

    from ods_v3_dbt_spark.pipelines import curate_increment_stream
    from ods_v3_dbt_spark.sinks import ParquetTable

    random.seed(9)
    corpus, dec = tmp_path / "corpus", tmp_path / "dec"
    # phase 1: text-only store
    p1 = curate_increment_stream(corpus, "adv8_mig_idx", str(dec),
                                 num_buckets=2)
    p1(
        spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon zeta", T0)],
            "doc_id long, text string, ingest_ts timestamp",
        ),
        1,
    )
    # phase 2: same store, semantic channel ON — must not crash on the
    # missing embedding column; old docs backfill NULL
    vecs = [[random.uniform(-1, 1) for _ in range(8)] for _ in range(2)]
    p2 = curate_increment_stream(
        corpus, "adv8_mig_idx", str(dec), num_buckets=2,
        embedding_col="embedding", ivf_cells=2,
    )
    SCHEMA = (
        "doc_id long, text string, embedding array<double>, "
        "ingest_ts timestamp"
    )
    p2(
        spark.createDataFrame(
            [(2, "totally new words nobody used before", vecs[0], T0)],
            SCHEMA,
        ),
        2,
    )
    out = ParquetTable(corpus).read(spark)
    assert "embedding" in out.columns
    rows = {r.doc_id: r.embedding for r in out.collect()}
    assert set(rows) == {1, 2}
    assert rows[1] is None and rows[2] is not None
    # phase 3: the migrated channel actually works — a paraphrase of
    # doc 2 (no shared shingles, bumped embedding) is caught
    bumped = [vecs[0][0] + 0.05] + vecs[0][1:]
    p2(
        spark.createDataFrame(
            [(3, "entirely different phrasing same idea", bumped, T0)],
            SCHEMA,
        ),
        3,
    )
    verdicts = {
        r.doc_id: r.verdict
        for r in spark.read.parquet(str(dec)).collect()
    }
    assert verdicts[3] == "neardup_semantic"


# ---------------------------------------------------------------------------
# 5. legacy index-spec mismatch rebuilds instead of failing (low)
# ---------------------------------------------------------------------------

def test_stream_rebuilds_index_on_spec_mismatch(spark, tmp_path):
    from ods_v3_dbt_spark.fs import fs_for
    from ods_v3_dbt_spark.operators.neardup_index import _manifest_path
    from ods_v3_dbt_spark.pipelines import curate_increment_stream
    from ods_v3_dbt_spark.sinks import ParquetTable

    corpus, dec = tmp_path / "corpus", tmp_path / "dec"
    process = curate_increment_stream(corpus, "adv8_spec_idx", str(dec),
                                      num_buckets=2)
    SCHEMA = "doc_id long, text string, ingest_ts timestamp"
    process(
        spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon zeta", T0)], SCHEMA
        ),
        1,
    )
    # simulate a LEGACY store: doctor the persisted spec so the
    # current handle mismatches (pre-doc-aware fps marker removed)
    mp = _manifest_path(spark, "adv8_spec_idx")
    fs = fs_for(mp)
    man = json.loads(fs.read_text(mp))
    man["spec"].pop("fps", None)
    fs.write_text_atomic(mp, json.dumps(man, sort_keys=True))
    # next batch must self-migrate (rebuild from the corpus) and keep
    # deciding correctly: an exact copy of doc 1 is a dup, a new doc
    # admits
    process(
        spark.createDataFrame(
            [
                (11, "alpha beta gamma delta epsilon zeta", T0),
                (12, "fresh words never before seen anywhere", T0),
            ],
            SCHEMA,
        ),
        2,
    )
    verdicts = {
        r.doc_id: r.verdict
        for r in spark.read.parquet(str(dec)).collect()
    }
    assert verdicts[11] == "dup_exact_existing"
    assert verdicts[12] == "admitted"
    ids = {r.doc_id for r in ParquetTable(corpus).read(spark).collect()}
    assert ids == {1, 12}


def test_fresh_store_ignores_ghost_ivf_under_same_index_name(spark, tmp_path):
    """Warehouse index state outlives corpus stores (attach-aware
    catalogs); a NEW curated store reusing an index name must not
    probe a previous deployment's IVF ghosts — the _CURATED
    co-manifest is the authority on whether THIS store ever committed
    an IVF pointer (round-8 race-suite catch: a doc whose embedding
    matched a ghost was flagged neardup_semantic of vanished
    content)."""
    import random

    from ods_v3_dbt_spark.pipelines import curate_increment_stream
    from ods_v3_dbt_spark.sinks import ParquetTable

    random.seed(31)
    SCHEMA = (
        "doc_id long, text string, embedding array<double>, "
        "ingest_ts timestamp"
    )
    vecs = [[random.uniform(-1, 1) for _ in range(8)] for _ in range(2)]

    # deployment A: semantic store admits docs 1-2, leaves its IVF
    # index in the warehouse under the shared name
    pa = curate_increment_stream(
        tmp_path / "a", "adv8_ghost_idx", str(tmp_path / "deca"),
        num_buckets=2, embedding_col="embedding", ivf_cells=2,
    )
    pa(
        spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon zeta", vecs[0], T0),
             (2, "totally new words nobody used before", vecs[1], T0)],
            SCHEMA,
        ),
        1,
    )

    # deployment B: FRESH store, same index name. Doc 11 reuses doc
    # 1's exact embedding — against A's ghost IVF it would score
    # dist2=0; a correct store sees an empty semantic history and
    # ADMITS it.
    pb = curate_increment_stream(
        tmp_path / "b", "adv8_ghost_idx", str(tmp_path / "decb"),
        num_buckets=2, embedding_col="embedding", ivf_cells=2,
    )
    pb(
        spark.createDataFrame(
            [(11, "wholly unrelated sentence with its own words",
              vecs[0], T0)],
            SCHEMA,
        ),
        1,
    )
    verdicts = {
        r.doc_id: r.verdict
        for r in spark.read.parquet(str(tmp_path / "decb")).collect()
    }
    assert verdicts[11] == "admitted"
    assert {r.doc_id for r in ParquetTable(tmp_path / "b").read(spark).collect()} == {11}
    # and the same-embedding paraphrase WITHIN store B is still caught
    pb(
        spark.createDataFrame(
            [(12, "different words conveying the very same idea",
              vecs[0], T0)],
            SCHEMA,
        ),
        2,
    )
    verdicts = {
        r.doc_id: r.verdict
        for r in spark.read.parquet(str(tmp_path / "decb")).collect()
    }
    assert verdicts[12] == "neardup_semantic"
