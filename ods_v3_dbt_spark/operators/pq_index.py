"""Persisted IVFADC vector index — the SERVICE-grade ANN state
(round-8 verdict task 3).

The persisted :class:`~.vector_index.IvfIndex` stores FULL quantized
vectors in its cell lists — exact, but at 100 TB the inverted lists
ARE the corpus. The memory-frugal flavor a retrieval service deploys
is IVFADC (Jégou, Douze, Schmid 2011 §IV): cells hold ``num_subs``
one-byte PQ codes per vector (8-64× smaller lists), queries build
per-cell ADC lookup tables against frozen codebooks, and scoring
never touches a full-precision vector. The ad-hoc
:func:`~.similarity.ivfadc_topk` recomputes coarse training, residual
codebooks, and every corpus code per call; this module persists the
whole decomposition under the family's epoch / LSM-segment /
manifest / tombstone / pin protocol (:mod:`.neardup_index` module
docstring):

* ``codes``     (vid, cell, codes array<int>) bucketed on ``cell`` —
  the compressed inverted lists. Probes are CELL-PRUNED exactly like
  the IVF index's, but read codes instead of vectors;
* ``centroids`` (cell, v) — the frozen coarse quantizer (K rows,
  copied per segment — reading any segment's copy is authoritative);
* ``books``     (sub, code, cw) — the frozen residual PQ codebooks
  (num_subs × num_codes rows, copied per segment).

Everything TRAINS at :func:`pq_index_write` and FREEZES: appends
assign the batch to the frozen centroids and encode against the
frozen books (:func:`~.similarity.pq_encode` — one linear map, no
shuffle, no corpus touch beyond the vid idempotence anti-joins) and
land as an O(batch) delta segment; deletes are doc-bucketed
tombstones; compaction is a plain union (code lists are vid-disjoint);
:func:`pq_index_refresh` re-trains from caller-supplied corpus
vectors under the same recall-floor gate as the IVF refresh (the
index itself retains no full vectors to re-train from — the corpus
table is the source of truth, the curation loop's consistency rule).

Exactness: the integer arithmetic is BIT-IDENTICAL to
``similarity.ivfadc_topk`` (same quantization, same +2000 residual
offset, same (d2, cell)/(d2, code) tie-breaks, same ADC lookup sum),
so an index built on a base slice and appended with the rest equals
the scan-path recomputation — the ``pq_index_ann_topk`` /
``pq_index_delete_topk`` declared queries hash-verify
build + append (+ delete) + probe against a DuckDB replay from raw
floats.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

from .neardup_index import (
    _ckpt_nonempty,
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
from .similarity import (
    _adc_tables,
    _int_matrix_sql,
    _l2q_cells,
    _l2q_dist2,
    _pair_scan_floor,
    _scan_par_floor,
    pq_encode,
    pq_train_encode,
    quantize_embedding,
)
from .vector_index import _centroid_df, _quantized, _read_centroids


@dataclass(frozen=True)
class PqIndex:
    """Handle to a persisted IVFADC index (module docstring). Same
    commit/retention protocol as :class:`~.neardup_index.DedupIndex`;
    ``compact_after`` bounds the live segment count."""

    name: str
    num_cells: int = 8
    num_subs: int = 32
    num_codes: int = 32
    dim_count: int = 64
    num_buckets: int = 8
    compact_after: int = 8

    PARTS = {
        "codes": ("codes", ("cell",)),
        "centroids": ("centroids", ("cell",)),
        "books": ("books", ("sub",)),
    }

    _table = DedupIndex._table
    resolve = DedupIndex.resolve
    exists = DedupIndex.exists

    def spec(self) -> dict:
        return {
            "kind": "ivfadc",
            "num_cells": self.num_cells,
            "num_subs": self.num_subs,
            "num_codes": self.num_codes,
            "dim_count": self.dim_count,
            "num_buckets": self.num_buckets,
        }


def _books_df(spark: SparkSession, books: list) -> DataFrame:
    rows = [
        (m, k, [int(x) for x in cw])
        for m, sub in enumerate(books)
        for k, cw in enumerate(sub)
    ]
    return spark.createDataFrame(
        rows, "sub int, code int, cw array<bigint>"
    )


def _read_books(spark: SparkSession, cur) -> list:
    """The frozen codebooks from the first live segment's copy —
    num_subs × num_codes rows, scalar-class."""
    rows = (
        cur.books.tables[0]
        .read(spark)
        .select("sub", "code", "cw")
        .orderBy("sub", "code")
        .collect()
    )
    books: dict[int, list] = {}
    for r in rows:
        books.setdefault(r.sub, []).append(list(r.cw))
    return [books[m] for m in sorted(books)]


def _residual(v_col, cell_col, ref_lit):
    """v − centroid[cell] + 2000 — the positive-integer residual of
    ``ivfadc_topk`` (the offset keeps Lloyd floor-means and both
    engines' integer division in agreement)."""
    return F.zip_with(
        v_col,
        F.element_at(ref_lit, cell_col + 1),
        lambda a, b: a - b + 2000,
    )


def _train(c: DataFrame, num_cells: int, num_subs: int, num_codes: int,
           dim_count: int):
    """The fused train path of ``similarity.ivfadc_topk``, verbatim:
    one lowest-vid seed fetch feeds both the coarse quantizer and the
    residual PQ seeds (driver-side assignment replay — exact integer
    math, no extra corpus action). Returns (codes df
    (vid, cell, codes), cents matrix, books)."""
    low = c.orderBy(F.col("vid").asc()).limit(
        max(num_cells, num_codes)
    ).collect()
    asg, ref_lit, cents = _l2q_cells(
        c, num_cells, seeds=[list(r.v) for r in low[:num_cells]]
    )
    res = asg.select(
        "vid", "cell", _residual(F.col("v"), F.col("cell"), ref_lit).alias("v")
    )
    sub_dim = dim_count // num_subs
    pq_seed_rows = []
    for r in low[:num_codes]:
        v = list(r.v)
        _, cell = min(
            (sum((a - b) * (a - b) for a, b in zip(v, cent)), i)
            for i, cent in enumerate(cents)
        )
        pq_seed_rows.append([a - b + 2000 for a, b in zip(v, cents[cell])])
    pq_seeds = [
        [row[m * sub_dim : (m + 1) * sub_dim] for row in pq_seed_rows]
        for m in range(num_subs)
    ]
    codes, books = pq_train_encode(
        res, num_subs, num_codes, dim_count, carry=("cell",), seeds=pq_seeds
    )
    return codes, cents, books


def pq_index_write(
    vectors: DataFrame,
    name: str,
    num_cells: int = 8,
    num_subs: int = 32,
    num_codes: int = 32,
    dim_count: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_buckets: int = 8,
    compact_after: int = 8,
) -> PqIndex:
    """Train (coarse quantizer + residual PQ codebooks, the exact
    ``ivfadc_topk`` pipeline over the build slice) and persist
    codes + centroids + books as a NEW single-segment epoch; one
    atomic manifest commit. Centroids AND codebooks are frozen here —
    appends only encode (classic IVFADC: train once, encode
    forever)."""
    idx = PqIndex(name, num_cells, num_subs, num_codes, dim_count,
                  num_buckets, compact_after)
    spark = vectors.sparkSession
    # parallelism floor: training + argmin encode are scan-stage
    # expression work (similarity._scan_par_floor — no-op at scale)
    c = _scan_par_floor(_quantized(vectors, vec_col, id_col))
    with _index_lock(spark, name) as lk:
        man = _read_manifest(spark, name)
        cur = man["epoch"] if man else 0
        new = cur + 1
        pins = _read_pins(spark, name)
        hist = _retained_history(man, new, [new], pins)
        tomb_hist = _retained_tomb_history(man, new, [], pins)
        _gc_epochs(spark, name, _keep_epochs(hist, tomb_hist) - {new})
        codes, cents, books = _train(
            c, num_cells, num_subs, num_codes, dim_count
        )
        # centroids/books (tiny driver literals) and codes are
        # independent members — overlapped (opt guide §2.6)
        _overlap_writes(
            lambda: _write_member(
                idx._table("centroids", new),
                _centroid_df(spark, cents), new,
            ),
            lambda: _write_member(
                idx._table("books", new), _books_df(spark, books), new
            ),
            lambda: _write_member(
                idx._table("codes", new),
                codes.select("vid",
                             F.col("cell").cast("int").alias("cell"),
                             "codes"),
                new,
            ),
        )
        lk.check()
        _commit_manifest(spark, name, new, idx.spec(), [new], hist,
                         [], tomb_hist, prev_man=man)
        _gc_epochs(spark, name, _keep_epochs(hist, tomb_hist))
    return idx


def pq_index_append(
    index: PqIndex,
    new_vectors: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> PqIndex:
    """Incremental refresh, LSM-shaped: assign ONLY the batch to the
    FROZEN centroids, encode against the FROZEN codebooks
    (``similarity.pq_encode`` — a linear map, no training, no
    shuffle), land as an O(batch) delta segment. Idempotent via
    per-segment vid anti-joins; all-or-nothing manifest commit; fold
    at ``compact_after`` (plain union — segments are vid-disjoint)."""
    spark = new_vectors.sparkSession
    with _index_lock(spark, index.name) as lk:
        man = _read_manifest(spark, index.name)
        cur = index.resolve(spark)
        # floor the batch before the idempotence anti-joins so the
        # checkpoint (and the encode off it) inherits the fan-out
        probe = _scan_par_floor(_quantized(new_vectors, vec_col, id_col))
        for t, seg in zip(cur.codes.tables, cur.segments):
            probe = probe.join(
                _seg_visible(cur, spark, t, seg, "vid").select("vid"),
                "vid", "left_anti",
            )
        batch, nonempty = _ckpt_nonempty(probe)
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
        cents = _read_centroids(spark, cur)
        books = _read_books(spark, cur)
        ref_lit = F.expr(_int_matrix_sql(cents))
        asg = batch.select(
            "vid",
            "v",
            F.array_min(_l2q_dist2(F.col("v"), ref_lit))
            .getField("cell")
            .cast("int")
            .alias("cell"),
        )
        res = asg.select(
            "vid", "cell",
            _residual(F.col("v"), F.col("cell"), ref_lit).alias("v"),
        )
        codes_new = pq_encode(res, books, carry=("cell",)).select(
            "vid", F.col("cell").cast("int").alias("cell"), "codes"
        )
        if compact:
            codes_new = (
                _visible(cur, spark, "codes", "vid")
                .select("vid", F.col("cell").cast("int").alias("cell"),
                        "codes")
                .unionByName(codes_new)
            )
        _overlap_writes(
            lambda: _write_member(
                index._table("codes", new_epoch), codes_new, new_epoch
            ),
            lambda: _write_member(
                index._table("centroids", new_epoch),
                _centroid_df(spark, cents),
                new_epoch,
            ),
            lambda: _write_member(
                index._table("books", new_epoch),
                _books_df(spark, books),
                new_epoch,
            ),
        )
        lk.check()
        _commit_manifest(spark, index.name, new_epoch, index.spec(),
                         segments, hist, tombs, tomb_hist, prev_man=man)
        _gc_epochs(spark, index.name, _keep_epochs(hist, tomb_hist))
    return index


def pq_index_topk(
    spark: SparkSession,
    index: PqIndex,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    epoch: int | None = None,
) -> DataFrame:
    """ANN top-k served from the persisted IVFADC index: each query
    probes its ``nprobe`` nearest frozen centroids, builds per-cell
    ADC lookup tables against the frozen codebooks (residual
    distances — ``similarity.ivfadc_topk``'s exact arithmetic), and
    the CELL-PRUNED compressed lists are scored by pure table-lookup
    sums — at 100 TB a query reads nprobe/num_cells of the corpus
    and only ever its codes (≈ dim_count/num_subs × int8 per
    vector), never a full-precision vector. Output byte-identical to
    ``ivfadc_topk`` over the same corpus/train split: (query_id,
    neighbor_id, adc_d2, rank)."""
    cur = index.resolve(spark, epoch=epoch)
    # centroids and books are tiny INDEPENDENT member reads — two
    # sequential collect jobs were ~0.25 s of a ~1.3 s warm probe;
    # overlapped driver threads halve that wall (opt guide §2.6)
    cents, books = _overlap_writes(
        lambda: _read_centroids(spark, cur),
        lambda: _read_books(spark, cur),
    )
    sub_dim = index.dim_count // index.num_subs
    ref_lit = F.expr(_int_matrix_sql(cents))
    q = _quantized(queries, vec_col, id_col)
    probes = q.select(
        F.col("vid").alias("query_id"),
        F.col("v").alias("__qv"),
        F.explode(
            F.transform(
                F.slice(
                    F.array_sort(_l2q_dist2(F.col("v"), ref_lit)), 1, nprobe
                ),
                lambda s: s.getField("cell"),
            )
        ).alias("cell"),
    )
    # ONE materialization for the whole query side (round 14; was
    # two localCheckpoints + a distinct-collect = three driver-bound
    # jobs per probe): the residual is bound ONCE per row as a
    # higher-order-function variable (transform over a one-element
    # array — the Catalyst common-subexpression idiom), so
    # _adc_tables' per-sub slices reference the EVALUATED residual
    # instead of re-evaluating the zip_with num_subs× per row (the
    # CollapseProject hazard the first checkpoint used to block);
    # the probed-cell set and probe-row count ride the checkpoint's
    # materialization via observe() (the components trick) instead
    # of a separate distinct-collect action. The checkpoint is
    # query-sized: nprobe rows of num_subs×num_codes bigints per
    # query.
    obs = Observation()
    qtabs = probes.select(
        "query_id",
        F.col("cell").cast("int").alias("cell"),
        F.element_at(
            F.transform(
                F.array(_residual(F.col("__qv"), F.col("cell"), ref_lit)),
                lambda r: _adc_tables(r, books, sub_dim),
            ),
            1,
        ).alias("tabs"),
    ).observe(
        obs,
        F.collect_set("cell").alias("cells"),
        F.count(F.lit(1)).alias("n"),
    ).localCheckpoint(eager=True)
    got = obs.get  # filled by the checkpoint's materialization
    probed_cells = sorted(int(c) for c in got["cells"])
    n_probe_rows = int(got["n"])
    seg_lists = [
        _seg_visible(cur, spark, t, seg, "vid")
        .filter(F.col("cell").isin(probed_cells))
        for t, seg in zip(cur.codes.tables, cur.segments)
    ]
    lists = seg_lists[0]
    for sl in seg_lists[1:]:
        lists = lists.unionByName(sl)
    # scoring parallelism floor — data-proportional (round 14; see
    # similarity._pair_scan_floor): fan the PRUNED lists (never the
    # corpus) across the cluster before the pair expansion, but only
    # when the expanded work is worth the exchange. Static split
    # estimate (live buckets × segments), never `.rdd` — under AQE
    # that would finalize and partially execute a throwaway plan per
    # probe (round-12 self-review, finding 6).
    lists = _pair_scan_floor(
        lists, n_probe_rows, len(probed_cells) or 1,
        min(len(probed_cells) or 1, index.num_buckets)
        * len(cur.segments),
    )
    scored = lists.join(F.broadcast(qtabs), "cell").select(
        "query_id",
        F.col("vid").alias("neighbor_id"),
        F.expr(
            "aggregate(zip_with(tabs, codes, (t, c) -> element_at(t, c + 1)), "
            "0L, (a, x) -> a + x)"
        ).alias("adc_d2"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_d2").asc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def pq_index_compact(index: PqIndex,
                     spark: SparkSession | None = None) -> PqIndex:
    """Fold all live segments into ONE — code lists are vid-disjoint
    so compaction is a plain union; centroids and books copy
    unchanged (frozen); tombstoned vids fold away physically. No-op
    if already one clean segment."""
    spark = spark or SparkSession.getActiveSession()
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
        _write_member(
            index._table("codes", new_epoch),
            _visible(cur, spark, "codes", "vid")
            .select("vid", F.col("cell").cast("int").alias("cell"), "codes"),
            new_epoch,
        )
        _write_member(
            index._table("centroids", new_epoch),
            _centroid_df(spark, _read_centroids(spark, cur)),
            new_epoch,
        )
        _write_member(
            index._table("books", new_epoch),
            _books_df(spark, _read_books(spark, cur)),
            new_epoch,
        )
        lk.check()
        _commit_manifest(spark, index.name, new_epoch, index.spec(),
                         [new_epoch], hist, [], tomb_hist, prev_man=man)
        _gc_epochs(spark, index.name, _keep_epochs(hist, tomb_hist))
    return index


def pq_index_delete(index: PqIndex, vec_ids: DataFrame,
                    id_col: str = "vec_id") -> PqIndex:
    """Tombstone-delete ``vec_ids`` — O(batch): one small tomb member
    lands as a new epoch; code lists stay untouched and probes
    anti-join the suppressed vids away per segment, so post-delete
    top-k is value-identical to an index whose lists never held
    those vectors (same frozen centroids AND codebooks — the
    ``pq_index_delete_topk`` oracle replays exactly that)."""
    return _tomb_delete(index, vec_ids, id_col, "codes", "vid",
                        compact_fn=pq_index_compact)


def pq_index_recall_ppm(
    spark: SparkSession,
    index: PqIndex,
    vectors: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    max_sample: int = 32,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> int:
    """Cell-pruning recall TELEMETRY in the compressed domain: a
    deterministic hash-ordered sample of ``vectors`` (the corpus the
    index serves — the index itself retains no full vectors) is
    probed twice, nprobe-pruned vs ALL cells, both scored by ADC;
    recall@k is the mean overlap in ppm (1e6 exactly when
    nprobe == num_cells). Measures the same drift the IVF recall
    gate watches: appends encode against FROZEN centroids, so
    out-of-distribution growth spreads true neighbors into unprobed
    cells."""
    sample = (
        _quantized(vectors, vec_col, id_col)
        .orderBy(F.xxhash64(F.col("vid").cast("string")), F.col("vid"))
        .limit(max_sample)
        .select(F.col("vid").alias(id_col), F.col("v").alias("__qv"))
        .localCheckpoint()
    )
    qdf = sample.select(
        id_col,
        F.transform(F.col("__qv"), lambda x: x - 1000).alias("__raw"),
    ).select(
        id_col,
        F.transform(
            F.col("__raw"), lambda x: x.cast("double") / 1000.0
        ).alias(vec_col),
    )
    hits = pq_index_topk(spark, index, qdf, k=k, nprobe=nprobe,
                         vec_col=vec_col, id_col=id_col)
    full = pq_index_topk(spark, index, qdf, k=k, nprobe=index.num_cells,
                         vec_col=vec_col, id_col=id_col)
    row = (
        full.select("query_id", "neighbor_id")
        .join(
            hits.select("query_id", "neighbor_id")
            .withColumn("__hit", F.lit(1)),
            ["query_id", "neighbor_id"],
            "left",
        )
        .agg(F.count(F.lit(1)).alias("n"), F.count("__hit").alias("hits"))
        .collect()[0]
    )
    if row.n == 0:
        return 1_000_000
    return int(row.hits * 1_000_000 // row.n)


def pq_index_refresh(
    index: PqIndex,
    vectors: DataFrame,
    spark: SparkSession | None = None,
    k: int = 10,
    nprobe: int = 4,
    recall_floor_ppm: int = 900_000,
    max_sample: int = 32,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> dict:
    """Re-train MAINTENANCE under the same recall gate as
    :func:`~.vector_index.ivf_index_refresh`: measure cell-pruning
    recall (:func:`pq_index_recall_ppm`); at or above the floor,
    write nothing. Below it, RE-TRAIN coarse centroids AND residual
    codebooks from ``vectors`` (the corpus table — the index stores
    only codes, so the source of truth supplies the floats; the
    curation consistency rule) and land one new single-segment epoch
    — value-identical to ``pq_index_write`` over the same vectors.
    Returns ``{"recall_ppm", "refreshed", "epoch"}``."""
    spark = spark or SparkSession.getActiveSession()
    recall = pq_index_recall_ppm(spark, index, vectors, k, nprobe,
                                 max_sample, vec_col, id_col)
    if recall >= recall_floor_ppm:
        return {
            "recall_ppm": recall,
            "refreshed": False,
            "epoch": index.resolve(spark).epoch,
        }
    c = _scan_par_floor(_quantized(vectors, vec_col, id_col))
    with _index_lock(spark, index.name) as lk:
        man = _read_manifest(spark, index.name)
        cur = index.resolve(spark)
        new_epoch = cur.epoch + 1
        pins = _read_pins(spark, index.name)
        hist = _retained_history(man, new_epoch, [new_epoch], pins)
        tomb_hist = _retained_tomb_history(man, new_epoch, [], pins)
        _gc_epochs(spark, index.name,
                   _keep_epochs(hist, tomb_hist) - {new_epoch})
        codes, cents, books = _train(
            c, index.num_cells, index.num_subs, index.num_codes,
            index.dim_count,
        )
        _write_member(
            index._table("centroids", new_epoch),
            _centroid_df(spark, cents), new_epoch,
        )
        _write_member(
            index._table("books", new_epoch), _books_df(spark, books),
            new_epoch,
        )
        _write_member(
            index._table("codes", new_epoch),
            codes.select("vid", F.col("cell").cast("int").alias("cell"),
                         "codes"),
            new_epoch,
        )
        lk.check()
        _commit_manifest(spark, index.name, new_epoch, index.spec(),
                         [new_epoch], hist, [], tomb_hist, prev_man=man)
        _gc_epochs(spark, index.name, _keep_epochs(hist, tomb_hist))
    return {"recall_ppm": recall, "refreshed": True, "epoch": new_epoch}
