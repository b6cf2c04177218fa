"""Persisted inverted index for BM25 retrieval — the corpus-side
state that stops repeated retrieval from re-scanning the corpus.

``operators/retrieval.py``'s scan-path BM25 recomputes tokenization,
df, and the collection stats on EVERY query batch: right for ad-hoc
exploration, wrong for a retrieval service over a 100 TB corpus
(round-6 verdict task 7). This module persists the classic IR
decomposition as bucketed member tables under the SAME epoch /
segment / manifest / pin protocol as the dedup indexes
(:mod:`.neardup_index` — one manifest-replace commit, LSM delta
segments for O(batch) appends, pinned-epoch retention):

* ``postings`` (term, doc_id, tf, dl) bucketed on term — the
  inverted file; dl rides the rows (the no-dl-join discipline of
  the scan path, materialized). A query's scan is BUCKET-PRUNED:
  ``term IN (...)`` touches only the buckets holding the query
  terms, so probe I/O scales with the posting lists, not the
  corpus;
* ``dfreq``  (term, df) bucketed on term — per-segment document
  frequencies; the probe sums the ≤K segment rows per query term
  (corpus docs are segment-disjoint, so per-segment dfs ADD);
* ``doclen`` (doc_id, dl) bucketed on doc_id — the append
  idempotence anti-join target (and per-doc length lookup);
* ``stats``  (stat_key, n_docs, total_len) — one row per segment;
  the probe sums them into the collection totals.

Exactness: everything persisted is INTEGER counts; the probe's
score arithmetic is byte-for-byte the scan path's rational-idf
evaluation tree, so indexed BM25 equals scan BM25 bit-exactly and
the same DuckDB oracle verifies both (pinned by the
``bm25_indexed_topk`` declared query and
``tests/test_llm_ops.py::test_bm25_index_probe_equals_scan``).
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .neardup_index import (
    _ckpt_nonempty,
    EPOCH_COL,
    DedupIndex,
    _commit_manifest,
    _gc_epochs,
    _index_lock,
    _keep_epochs,
    _read_manifest,
    _read_pins,
    _retained_history,
    _retained_tomb_history,
    _seg_visible,
    _tomb_delete,
    _visible,
    _overlap_writes,
    _write_member,
)


@dataclass(frozen=True)
class Bm25Index:
    """Handle to a persisted BM25 inverted index (module docstring).
    Same commit/retention protocol as :class:`~.neardup_index
    .DedupIndex`; ``compact_after`` bounds the live segment count."""

    name: str
    num_buckets: int = 32
    compact_after: int = 8

    PARTS = {
        "postings": ("postings", ("term",)),
        "dfreq": ("dfreq", ("term",)),
        "doclen": ("doclen", ("doc_id",)),
        "stats": ("stats", ("stat_key",)),
    }

    _table = DedupIndex._table
    resolve = DedupIndex.resolve
    exists = DedupIndex.exists

    def spec(self) -> dict:
        return {"kind": "bm25", "num_buckets": self.num_buckets}


def _tokenized(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, dl, term) token rows — the module-wide tokenization
    (split lower trim \\s+, the corpus convention every text operator
    and oracle shares)."""
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("w"),
    ).select("doc_id", F.size("w").alias("dl"), F.explode("w").alias("term"))
    return base


def _write_bm25_members(idx: Bm25Index, epoch: int, docs: DataFrame,
                        spark: SparkSession, text_col: str,
                        id_col: str) -> None:
    """Write one index segment from ``docs``: the full-vocabulary
    postings explode (the index build pays O(tokens) ONCE so probes
    never do), df derived from the just-written postings by a
    bucket-local re-read, doclen and the 1-row stats from a second
    scan-stage pass."""
    tok = _tokenized(docs, text_col, id_col)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("dl"),
    )

    # postings→dfreq is a dependent chain (df derives from the
    # written postings' bucket-local read-back); doclen and the 1-row
    # stats both derive from ``base`` directly — three independent
    # groups, overlapped as driver threads (opt guide §2.6)
    def _postings_then_dfreq():
        post_tbl = idx._table("postings", epoch)
        _write_member(
            post_tbl,
            tok.groupBy("term", "doc_id").agg(
                F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl")
            ),
            epoch,
        )
        _write_member(
            idx._table("dfreq", epoch),
            post_tbl.read(spark).groupBy("term").agg(
                F.count(F.lit(1)).alias("df")
            ),
            epoch,
        )

    _overlap_writes(
        _postings_then_dfreq,
        lambda: _write_member(idx._table("doclen", epoch), base, epoch),
        lambda: _write_member(
            idx._table("stats", epoch),
            base.agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("dl").alias("total_len"),
            ).select(F.lit("s").alias("stat_key"), "n_docs", "total_len"),
            epoch,
        ),
    )


def bm25_index_write(
    corpus: DataFrame,
    name: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 32,
    compact_after: int = 8,
) -> Bm25Index:
    """Build and persist the inverted index as a NEW single-segment
    epoch — one atomic manifest commit, same protocol as
    :func:`~.neardup_index.dedup_index_write`."""
    idx = Bm25Index(name, num_buckets, compact_after)
    spark = corpus.sparkSession
    with _index_lock(spark, name) as lk:
        man = _read_manifest(spark, name)
        cur = man["epoch"] if man else 0
        new = cur + 1
        pins = _read_pins(spark, name)
        hist = _retained_history(man, new, [new], pins)
        tomb_hist = _retained_tomb_history(man, new, [], pins)
        _gc_epochs(spark, name, _keep_epochs(hist, tomb_hist) - {new})
        _write_bm25_members(idx, new, corpus, spark, text_col, id_col)
        lk.check()
        _commit_manifest(spark, name, new, idx.spec(), [new], hist,
                         [], tomb_hist, prev_man=man)
        _gc_epochs(spark, name, _keep_epochs(hist, tomb_hist))
    return idx


def bm25_index_append(
    index: Bm25Index,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Bm25Index:
    """Incremental refresh, LSM-shaped: tokenize ONLY the new docs
    and land them as an O(batch) delta segment (per-segment
    anti-join idempotence against the doclen tables; all-or-nothing
    manifest commit; fold at ``compact_after`` — where dfreq
    RE-AGGREGATES across segments and stats re-sum, since those
    members are per-segment partials, unlike the doc-disjoint
    postings/doclen which simply concatenate)."""
    spark = new_docs.sparkSession
    with _index_lock(spark, index.name) as lk:
        man = _read_manifest(spark, index.name)
        cur = index.resolve(spark)
        probe = new_docs.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        )
        for t, seg in zip(cur.doclen.tables, cur.segments):
            probe = probe.join(
                _seg_visible(cur, spark, t, seg).select("doc_id"),
                "doc_id", "left_anti",
            )
        new_docs, nonempty = _ckpt_nonempty(probe)
        if not nonempty:
            return index
        new_epoch = cur.epoch + 1
        compact = len(cur.segments) >= index.compact_after
        segments = [new_epoch] if compact else [*cur.segments, new_epoch]
        tombs = [] if compact else [te for te, _ in cur.tombs]
        pins = _read_pins(spark, index.name)
        hist = _retained_history(man, new_epoch, segments, pins)
        tomb_hist = _retained_tomb_history(man, new_epoch, tombs, pins)
        _gc_epochs(spark, index.name,
                   _keep_epochs(hist, tomb_hist) - {new_epoch})
        if compact:
            # two dependent chains (postings→dfreq, doclen→stats),
            # mutually independent — overlapped (opt guide §2.6)
            def _fold_postings_dfreq():
                tok = _tokenized(new_docs, "text", "doc_id")
                post_new = tok.groupBy("term", "doc_id").agg(
                    F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl")
                )
                post_tbl = index._table("postings", new_epoch)
                _write_member(
                    post_tbl,
                    _visible(cur, spark, "postings").unionByName(post_new),
                    new_epoch,
                )
                _write_member(
                    index._table("dfreq", new_epoch),
                    post_tbl.read(spark).groupBy("term").agg(
                        F.count(F.lit(1)).alias("df")
                    ),
                    new_epoch,
                )

            def _fold_doclen_stats():
                base = new_docs.select(
                    "doc_id",
                    F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
                    .alias("dl"),
                )
                doclen_tbl = index._table("doclen", new_epoch)
                _write_member(
                    doclen_tbl,
                    _visible(cur, spark, "doclen").unionByName(base),
                    new_epoch,
                )
                _write_member(
                    index._table("stats", new_epoch),
                    doclen_tbl.read(spark).agg(
                        F.count(F.lit(1)).alias("n_docs"),
                        F.sum("dl").alias("total_len"),
                    ).select(F.lit("s").alias("stat_key"), "n_docs",
                             "total_len"),
                    new_epoch,
                )

            _overlap_writes(_fold_postings_dfreq, _fold_doclen_stats)
        else:
            _write_bm25_members(index, new_epoch, new_docs, spark,
                                "text", "doc_id")
        lk.check()
        _commit_manifest(spark, index.name, new_epoch, index.spec(),
                         segments, hist, tombs, tomb_hist, prev_man=man)
        _gc_epochs(spark, index.name, _keep_epochs(hist, tomb_hist))
    return index


def _index_tf_df_stats(spark: SparkSession, index: Bm25Index,
                       terms: list[str]):
    """(tf, dfreq, stats) for ``terms`` from a resolved index —
    bucket-pruned per-segment posting/df scans unioned; per-segment
    df partials summed (docs are segment-disjoint); the ≤K stats
    rows summed into the collection totals. Shared by the single-
    and multi-query probes.

    TOMBSTONES: posting rows of deleted docs anti-join away per
    segment. df then re-derives from the surviving tf rows — exact,
    and free, because df(term) IS the posting-row count for the term
    and the probe already reads every surviving row (the persisted
    dfreq partials still count suppressed docs; they serve the
    zero-tomb fast path unchanged). Collection stats subtract the
    tomb tables' own (1 row per suppressed doclen row, dl carried —
    written by ``bm25_index_delete``), so N and total_len correct
    without any doclen scan: probe cost stays query-bound even with
    deletes in flight."""
    cur = index.resolve(spark)
    tf = None
    for t, seg in zip(cur.postings.tables, cur.segments):
        part = (
            _seg_visible(cur, spark, t, seg)
            .filter(F.col("term").isin(terms))
            .select("doc_id", "term", "tf", "dl")
        )
        tf = part if tf is None else tf.unionByName(part)
    if cur.tombs:
        dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    else:
        dfp = None
        for t in cur.dfreq.tables:
            part = t.read(spark).filter(F.col("term").isin(terms)).select(
                "term", "df"
            )
            dfp = part if dfp is None else dfp.unionByName(part)
        dfreq = dfp.groupBy("term").agg(F.sum("df").alias("df"))
    sts = None
    for t in cur.stats.tables:
        part = t.read(spark).select("n_docs", "total_len")
        sts = part if sts is None else sts.unionByName(part)
    for _te, tt in cur.tombs:
        part = tt.read(spark).select(
            F.lit(-1).cast("bigint").alias("n_docs"),
            (-F.col("dl")).cast("bigint").alias("total_len"),
        )
        sts = sts.unionByName(part)
    stats = sts.agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("total_len").alias("total_len"),
    )
    return tf, dfreq, stats


def bm25_index_multiquery_topk(
    spark: SparkSession,
    index: Bm25Index,
    queries: DataFrame,
    k: int = 5,
    k1_milli: int = 1200,
    b_milli: int = 750,
    mode: str = "rational",
) -> DataFrame:
    """Batch retrieval from the PERSISTED index — the indexed twin
    of :func:`~.retrieval.bm25_multiquery_topk` (bit-identical
    output): MANY queries served by ONE set of bucket-pruned
    posting-list reads restricted to the union of query terms, the
    term→query mapping broadcast fans per-(doc, term) scores out to
    (query_id, doc) pairs, and the per-query top-k runs the same
    deterministic fold + WindowGroupLimit as the scan path. This is
    what a retrieval SERVICE over a 100 TB corpus runs: per query
    batch, cost proportional to the touched posting lists — zero
    corpus scans, zero tokenization, zero stats recompute."""
    if mode not in ("rational", "ln"):
        raise ValueError(f"unknown bm25 mode: {mode}")
    k1 = F.lit(k1_milli) / F.lit(1000.0)
    b = F.lit(b_milli) / F.lit(1000.0)
    q = queries.select("query_id", "term")
    terms = sorted({r.term for r in q.select("term").distinct().collect()})
    tf, dfreq, stats = _index_tf_df_stats(spark, index, terms)
    j = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(q), "term")
    )
    avgdl = F.col("total_len") / F.col("n_docs")
    ratio = (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (
        F.col("df") + F.lit(0.5)
    )
    idf = F.log(ratio + F.lit(1.0)) if mode == "ln" else ratio
    tf_d = F.col("tf").cast("double")
    denom = tf_d + (k1 * ((F.lit(1.0) - b) + (b * (F.col("dl") / avgdl))))
    s = idf * ((tf_d * (k1 + F.lit(1.0))) / denom)
    per_term = j.select(
        "query_id", "doc_id", F.struct(F.col("term"), s.alias("s")).alias("ts")
    )
    scored = per_term.groupBy("query_id", "doc_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list("ts")),
            F.lit(0.0),
            lambda acc, x: acc + x["s"],
        ).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "rank", "doc_id",
            F.round(F.col("score") * F.lit(1000000.0)).cast("bigint")
            .alias("score_micro"),
        )
    )


def bm25_index_topk(
    spark: SparkSession,
    index: Bm25Index,
    terms: Sequence[str],
    k: int = 10,
    k1_milli: int = 1200,
    b_milli: int = 750,
    mode: str = "rational",
) -> DataFrame:
    """Top-k BM25 from the PERSISTED index — bit-identical results
    to :func:`~.retrieval.bm25_topk` (same rational evaluation tree
    over the same integers) with the corpus scan replaced by
    bucket-pruned posting-list reads:

    * per live segment, ``postings`` filters ``term IN (...)`` —
      the bucketed scan touches only the query terms' buckets
      (``SelectedBucketsCount`` < total, pinned in
      tests/test_plan_audit.py) and contributes rows proportional
      to the posting lists;
    * per-segment ``dfreq`` rows for the query terms SUM into
      global df (docs are segment-disjoint); the ≤K ``stats`` rows
      sum into (N, total_len) — both broadcast;
    * scoring, the deterministic term-sorted fold, and the top-k
      window are the scan path's, unchanged.

    Probe cost is query-bound: no tokenization, no full-corpus
    shuffle, no stats recompute — the reference's
    incremental-against-accumulated-state pattern
    (plugins/operators/bccp_to_ods.py:198-201) applied to ranked
    retrieval."""
    if mode not in ("rational", "ln"):
        raise ValueError(f"unknown bm25 mode: {mode}")
    terms = list(terms)
    k1 = F.lit(k1_milli) / F.lit(1000.0)
    b = F.lit(b_milli) / F.lit(1000.0)
    tf, dfreq, stats = _index_tf_df_stats(spark, index, terms)
    j = tf.join(F.broadcast(dfreq), "term").crossJoin(F.broadcast(stats))
    avgdl = F.col("total_len") / F.col("n_docs")
    ratio = (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (
        F.col("df") + F.lit(0.5)
    )
    idf = F.log(ratio + F.lit(1.0)) if mode == "ln" else ratio
    tf_d = F.col("tf").cast("double")
    denom = tf_d + (k1 * ((F.lit(1.0) - b) + (b * (F.col("dl") / avgdl))))
    s = idf * ((tf_d * (k1 + F.lit(1.0))) / denom)
    per_term = j.select(
        "doc_id", F.struct(F.col("term"), s.alias("s")).alias("ts")
    )
    scored = per_term.groupBy("doc_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list("ts")),
            F.lit(0.0),
            lambda acc, x: acc + x["s"],
        ).alias("score")
    )
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "rank",
            "doc_id",
            F.round(F.col("score") * F.lit(1000000.0)).cast("bigint")
            .alias("score_micro"),
        )
    )


def bm25_index_compact(index: Bm25Index,
                       spark: SparkSession | None = None) -> Bm25Index:
    """Fold all live segments into ONE — the explicit form of the
    fold an append performs at ``compact_after``, for scheduling the
    O(corpus) rewrite off the nightly path (the dedup index's
    ``dedup_index_compact`` discipline). Postings/doclen are
    doc-disjoint and concatenate; dfreq RE-AGGREGATES (per-segment
    partials) and stats re-derive from the folded doclen; tombstones
    fold away physically (tomb-filtered reads, empty tomb set).
    No-op if already one segment with no live tombstones."""
    from pyspark.sql import SparkSession as _SS

    spark = spark or _SS.getActiveSession()
    with _index_lock(spark, index.name) as lk:
        man = _read_manifest(spark, index.name)
        cur = index.resolve(spark)
        if len(cur.segments) <= 1 and not cur.tombs:
            return index
        new_epoch = cur.epoch + 1
        pins = _read_pins(spark, index.name)
        hist = _retained_history(man, new_epoch, [new_epoch], pins)
        tomb_hist = _retained_tomb_history(man, new_epoch, [], pins)
        _gc_epochs(spark, index.name,
                   _keep_epochs(hist, tomb_hist) - {new_epoch})
        def _fold_postings_dfreq():
            post_tbl = index._table("postings", new_epoch)
            _write_member(
                post_tbl, _visible(cur, spark, "postings"), new_epoch
            )
            _write_member(
                index._table("dfreq", new_epoch),
                post_tbl.read(spark).groupBy("term").agg(
                    F.count(F.lit(1)).alias("df")
                ),
                new_epoch,
            )

        def _fold_doclen_stats():
            doclen_tbl = index._table("doclen", new_epoch)
            _write_member(
                doclen_tbl, _visible(cur, spark, "doclen"), new_epoch
            )
            _write_member(
                index._table("stats", new_epoch),
                doclen_tbl.read(spark).agg(
                    F.count(F.lit(1)).alias("n_docs"),
                    F.sum("dl").alias("total_len"),
                ).select(F.lit("s").alias("stat_key"), "n_docs",
                         "total_len"),
                new_epoch,
            )

        # the two chains are mutually independent — overlap (§2.6)
        _overlap_writes(_fold_postings_dfreq, _fold_doclen_stats)
        lk.check()
        _commit_manifest(spark, index.name, new_epoch, index.spec(),
                         [new_epoch], hist, [], tomb_hist, prev_man=man)
        _gc_epochs(spark, index.name, _keep_epochs(hist, tomb_hist))
    return index


def _bm25_tomb_rows(dead: DataFrame, cur, spark: SparkSession) -> DataFrame:
    """Tomb rows for the BM25 kind: each deleted doc's VISIBLE doclen
    rows (doc_id, dl) — one row per persisted doclen row the tombstone
    suppresses, so the probe's stats correction is an exact aggregate
    over the (tiny) tomb tables themselves."""
    parts = []
    for t, seg in zip(cur.doclen.tables, cur.segments):
        vis = _seg_visible(cur, spark, t, seg).select("doc_id", "dl")
        parts.append(vis.join(F.broadcast(dead), "doc_id", "left_semi"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def bm25_index_delete(index: Bm25Index, doc_ids: DataFrame,
                      id_col: str = "doc_id") -> Bm25Index:
    """Tombstone-delete ``doc_ids`` from the BM25 index — O(batch):
    one small (doc_id, dl) tomb member lands as a new epoch; postings
    stay untouched and probes anti-join the suppressed docs away,
    re-deriving df from the surviving (already-read) posting rows and
    correcting collection stats from the tomb rows' dl. Post-delete
    ranking is value-identical to an index rebuilt without those docs
    (``bm25_indexed_delete_topk`` oracle); compaction folds the
    tombstones away physically. Reference analog: M6 DELETE semantics
    (dags/sql/casreport/update_des_table/casreport_rpt_full_item.sql:1-3)."""
    return _tomb_delete(index, doc_ids, id_col, "doclen",
                        tomb_rows_fn=_bm25_tomb_rows,
                        compact_fn=bm25_index_compact)
