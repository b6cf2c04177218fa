"""Persisted IVF vector index — ANN's corpus-side state, so repeated
similarity search stops re-training and re-assigning the corpus.

The ad-hoc ANN queries (``similarity.ivf_topk_l2q`` and friends)
recompute seed selection, the Lloyd refinement, and EVERY corpus
vector's cell assignment on each call: right for one-off analysis,
wrong for a retrieval service over a 100 TB embedding store. This
module persists the IVF decomposition under the SAME epoch / segment
/ manifest / pin protocol as the dedup and BM25 indexes
(:mod:`.neardup_index`, :mod:`.text_index` — one manifest-replace
commit, LSM delta segments for O(batch) appends, pinned-epoch
retention):

* ``assign``    (vid, v, cell) bucketed on ``cell`` — the inverted
  lists. A probe is CELL-PRUNED: ``cell IN (probed)`` touches only
  the buckets holding the ≤ num_cells probed cells, so probe I/O
  scales with the probed lists, not the corpus;
* ``centroids`` (cell, v) — the K refined centroids, FROZEN at build
  time (classic IVF: train once, assign forever — re-training is a
  rebuild, not an append). K rows, copied into every segment so the
  per-segment member invariant holds; reading any one segment's copy
  is authoritative.

Appends assign ONLY the batch to the frozen centroids (one linear
map over the batch — no shuffle, no corpus touch beyond the
vid-column idempotence anti-join) and land it as a delta segment;
at ``compact_after`` live segments the append folds the inverted
lists back into one (assign rows are vid-disjoint across segments,
so compaction is a plain union — no re-aggregation, unlike BM25's
per-segment df partials).

Exactness: quantization, centroid math, and scoring are the
INTEGER pipeline of ``similarity._l2q_cells`` (positive-BIGINT
milli-units, floor means, L2² with cell/neighbor tie-breaks), so an
index built on a base slice and appended with the rest equals the
scan-path recomputation bit-for-bit — the ``ivf_index_ann_topk``
declared query hash-verifies build + append + probe against a DuckDB
oracle that replays the whole pipeline from raw floats.
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
    _int_matrix_sql,
    _l2q_cells,
    _l2q_dist2,
    _pair_scan_floor,
    quantize_embedding,
)


@dataclass(frozen=True)
class IvfIndex:
    """Handle to a persisted IVF index (module docstring). Same
    commit/retention protocol as :class:`~.neardup_index.DedupIndex`;
    ``compact_after`` bounds the live segment count."""

    name: str
    num_cells: int = 8
    num_buckets: int = 8
    compact_after: int = 8

    PARTS = {
        "assign": ("assign", ("cell",)),
        "centroids": ("centroids", ("cell",)),
    }

    _table = DedupIndex._table
    resolve = DedupIndex.resolve
    exists = DedupIndex.exists

    def spec(self) -> dict:
        return {
            "kind": "ivf_l2q",
            "num_cells": self.num_cells,
            "num_buckets": self.num_buckets,
        }


def _quantized(vectors: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    return vectors.select(
        F.col(id_col).alias("vid"),
        quantize_embedding(F.col(vec_col)).alias("v"),
    )


def _centroid_df(spark: SparkSession, cents: list[list[int]]) -> DataFrame:
    rows = [(i, [int(x) for x in row]) for i, row in enumerate(cents)]
    return spark.createDataFrame(rows, "cell int, v array<bigint>")


def _read_centroids(spark: SparkSession, cur) -> list[list[int]]:
    """The frozen centroid matrix from the first live segment's copy
    (all copies are identical by construction — K rows, trivially
    collectable: the scalar-class driver path every ANN operator
    already uses)."""
    rows = (
        cur.centroids.tables[0]
        .read(spark)
        .select("cell", "v")
        .orderBy("cell")
        .collect()
    )
    return [list(r.v) for r in rows]


def ivf_index_write(
    vectors: DataFrame,
    name: str,
    num_cells: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_buckets: int = 8,
    compact_after: int = 8,
) -> IvfIndex:
    """Train (seed + one Lloyd round over the build slice — the
    deterministic integer machinery of ``similarity._l2q_cells``)
    and persist centroids + inverted lists as a NEW single-segment
    epoch; one atomic manifest commit."""
    idx = IvfIndex(name, num_cells, num_buckets, compact_after)
    spark = vectors.sparkSession
    # NOTE: no _scan_par_floor here — measured (round 13, interleaved
    # in-session A/B): the IVF assignment's per-row work (8 cells ×
    # 64 dims) is light enough that the floor's extra exchange COSTS
    # ~0.2-0.3 s more than the single-core scan stage saves; the PQ
    # paths (32-codeword argmin per subvector row) are where it pays.
    c = _quantized(vectors, vec_col, id_col)
    with _index_lock(spark, name) as lk:
        man = _read_manifest(spark, name)
        cur = man["epoch"] if man else 0
        new = cur + 1
        pins = _read_pins(spark, name)
        hist = _retained_history(man, new, [new], pins)
        tomb_hist = _retained_tomb_history(man, new, [], pins)
        _gc_epochs(spark, name, _keep_epochs(hist, tomb_hist) - {new})
        asg, _ref_lit, cents = _l2q_cells(c, num_cells)
        # centroids (tiny driver literal) and assign are independent
        # members — overlapped driver threads (opt guide §2.6)
        _overlap_writes(
            lambda: _write_member(
                idx._table("centroids", new),
                _centroid_df(spark, cents), new,
            ),
            lambda: _write_member(
                idx._table("assign", new),
                asg.select("vid", "v",
                           F.col("cell").cast("int").alias("cell")),
                new,
            ),
        )
        lk.check()
        _commit_manifest(spark, name, new, idx.spec(), [new], hist,
                         [], tomb_hist, prev_man=man)
        _gc_epochs(spark, name, _keep_epochs(hist, tomb_hist))
    return idx


def ivf_index_append(
    index: IvfIndex,
    new_vectors: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> IvfIndex:
    """Incremental refresh, LSM-shaped: assign ONLY the batch to the
    FROZEN centroids (a linear map — the K×dim matrix is a literal,
    no join, no shuffle) and land it as an O(batch) delta segment.
    Idempotent via per-segment vid anti-joins (column-pruned scans of
    the assign tables); all-or-nothing manifest commit; fold at
    ``compact_after`` (plain union — segments are vid-disjoint)."""
    spark = new_vectors.sparkSession
    with _index_lock(spark, index.name) as lk:
        man = _read_manifest(spark, index.name)
        cur = index.resolve(spark)
        probe = _quantized(new_vectors, vec_col, id_col)
        for t, seg in zip(cur.assign.tables, cur.segments):
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
        ref_lit = F.expr(_int_matrix_sql(cents))
        asg_new = batch.select(
            "vid",
            "v",
            F.array_min(_l2q_dist2(F.col("v"), ref_lit))
            .getField("cell")
            .cast("int")
            .alias("cell"),
        )
        if compact:
            asg_new = (
                _visible(cur, spark, "assign", "vid")
                .select("vid", "v", F.col("cell").cast("int").alias("cell"))
                .unionByName(asg_new)
            )
        _overlap_writes(
            lambda: _write_member(
                index._table("assign", new_epoch), asg_new, new_epoch
            ),
            lambda: _write_member(
                index._table("centroids", new_epoch),
                _centroid_df(spark, cents),
                new_epoch,
            ),
        )
        lk.check()
        _commit_manifest(
            spark, index.name, new_epoch, index.spec(), segments, hist,
            tombs, tomb_hist, prev_man=man)
        _gc_epochs(spark, index.name, _keep_epochs(hist, tomb_hist))
    return index


def ivf_index_topk(
    spark: SparkSession,
    index: IvfIndex,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    epoch: int | None = None,
) -> DataFrame:
    """ANN top-k served from the persisted index: each query probes
    its ``nprobe`` nearest frozen centroids; the inverted lists are
    read CELL-PRUNED (``cell IN (probed ∪)`` — at most num_cells
    values, a scalar-class driver set — pushes into the bucketed
    scans, so untouched cells cost zero I/O) across the ≤ K live
    segments; exact integer L2² scores inside, row_number top-k with
    the scan path's cell/neighbor tie-breaks. Byte-identical output
    to ``similarity.ivf_topk_l2q`` over the same corpus."""
    cur = index.resolve(spark, epoch=epoch)
    cents = _read_centroids(spark, cur)
    ref_lit = F.expr(_int_matrix_sql(cents))
    q = _quantized(queries, vec_col, id_col)
    # localCheckpoint: the probe table feeds the probed-cells lookup
    # AND the scoring join — without it the quantize+argmin subtree
    # (batch-sized when the curation loop probes a whole micro-batch)
    # computes twice. The probed-cell set and probe-row count ride
    # the checkpoint's materialization via observe() (round 14, the
    # components trick) instead of a separate distinct-collect job.
    obs = Observation()
    probes = q.select(
        F.col("vid").alias("query_id"),
        F.col("v").alias("__qv"),
        F.explode(
            F.transform(
                F.slice(
                    F.array_sort(_l2q_dist2(F.col("v"), ref_lit)), 1, nprobe
                ),
                lambda s: s.getField("cell").cast("int"),
            )
        ).alias("cell"),
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
        for t, seg in zip(cur.assign.tables, cur.segments)
    ]
    lists = seg_lists[0]
    for sl in seg_lists[1:]:
        lists = lists.unionByName(sl)
    # Scoring parallelism floor (round-12 sem_ivf_probe profile): the
    # cell-pruned lists often collapse to a handful of input splits
    # (few files per probed cell), but the broadcast join below
    # EXPANDS each list row ×|queries probing its cell| and scores a
    # dim-length distance per pair — profiled at sf0.1: 333k pairs
    # ran on 5 of 32 cores, 1.4 s where the join alone costs 0.3 s.
    # One cheap shuffle of the PRUNED lists (never the corpus; at
    # scale nprobe/num_cells of it) fans the pair expansion across
    # the cluster — DATA-proportionally since round 14
    # (similarity._pair_scan_floor: a single-query probe of a tiny
    # list must not pay an exchange + 32-task scheduling). The split
    # estimate is STATIC metadata — under AQE a
    # `.rdd.getNumPartitions()` here would finalize and partially
    # EXECUTE a throwaway plan per probe (round-12 self-review,
    # finding 6).
    lists = _pair_scan_floor(
        lists, n_probe_rows, len(probed_cells) or 1,
        min(len(probed_cells) or 1, index.num_buckets)
        * len(cur.segments),
    )
    scored = lists.join(F.broadcast(probes), "cell").select(
        "query_id",
        F.col("vid").alias("neighbor_id"),
        F.aggregate(
            F.zip_with(
                F.col("__qv"), F.col("v"), lambda a, b: (a - b) * (a - b)
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("dist2"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist2").asc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).filter(F.col("rank") <= k)


def ivf_index_self_dedup(
    index: IvfIndex,
    radius2: int = 300_000,
    max_cell_rows: int = 8192,
    spark: SparkSession | None = None,
    epoch: int | None = None,
) -> DataFrame:
    """SemDeDup served from the PERSISTED IVF index — the semantic
    member of the ``*_indexed`` self-dedup family (round 8; exact
    shingles, banded MinHash, and SimHash got theirs in rounds 7-8):
    instead of re-quantizing, re-seeding, re-Lloyd-ing, and
    re-assigning the corpus per run (``similarity.semantic_dedup_l2q``'s
    front half — a full corpus pass plus two driver collects at
    100 TB), the within-cell dedup back half
    (``similarity.within_cell_dedup`` — numpy-gram pair kernels,
    hot-cell block decomposition, components, min-id keep) runs
    directly over the index's visible (vid, v, cell) inverted lists:
    zero training work, cell-bucketed scans in place, tombstoned
    vectors suppressed. Value-identical to the inline flavor over the
    same corpus (the index's write/append pipeline IS the inline
    assignment arithmetic) — the ``semantic_dedup_indexed_cells``
    declared query shares ``semantic_dedup_cells``' oracle. Returns
    (vec_id, cell, component_id, keep)."""
    from .similarity import within_cell_dedup

    spark = spark or SparkSession.getActiveSession()
    cur = index.resolve(spark, epoch=epoch)
    asg = _visible(cur, spark, "assign", "vid").select("vid", "v", "cell")
    return within_cell_dedup(asg, radius2, max_cell_rows)


def ivf_index_compact(index: IvfIndex,
                      spark: SparkSession | None = None) -> IvfIndex:
    """Fold all live segments into ONE — the explicit maintenance
    form of the append-time fold (``dedup_index_compact``'s
    discipline applied to the IVF kind). Lists are vid-disjoint, so
    compaction is a plain union; centroids copy unchanged (they are
    frozen); tombstoned vids fold away physically. No-op if already
    one segment with no live tombstones."""
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
            index._table("assign", new_epoch),
            _visible(cur, spark, "assign", "vid")
            .select("vid", "v", F.col("cell").cast("int").alias("cell")),
            new_epoch,
        )
        _write_member(
            index._table("centroids", new_epoch),
            _centroid_df(spark, _read_centroids(spark, cur)),
            new_epoch,
        )
        lk.check()
        _commit_manifest(spark, index.name, new_epoch, index.spec(),
                         [new_epoch], hist, [], tomb_hist, prev_man=man)
        _gc_epochs(spark, index.name, _keep_epochs(hist, tomb_hist))
    return index


def ivf_index_recall_ppm(
    spark: SparkSession,
    index: IvfIndex,
    k: int = 10,
    nprobe: int = 3,
    max_sample: int = 32,
) -> int:
    """Probe-recall TELEMETRY (round-7 verdict task 3): how much of
    the exact top-k does a cell-pruned probe still find? Appends
    assign to FROZEN centroids, so after heavy out-of-distribution
    drift the true neighbors of a query spread across cells the
    probe never visits and recall decays silently — this measures
    it. A deterministic hash-ordered sample of the index's own
    visible vectors (≤ ``max_sample``) is probed twice: through the
    normal nprobe-pruned path and against the FULL visible list
    (brute force — maintenance-priced, sample×corpus); recall@k is
    the mean overlap, returned in ppm. 1e6 exactly when
    nprobe == num_cells (the full-probe exactness contract)."""
    from pyspark.sql import Window

    cur = index.resolve(spark)
    vis = _visible(cur, spark, "assign", "vid").select("vid", "v", "cell")
    sample = (
        vis.select("vid", "v")
        .orderBy(F.xxhash64(F.col("vid").cast("string")), F.col("vid"))
        .limit(max_sample)
        .localCheckpoint()
    )
    cents = _read_centroids(spark, cur)
    ref_lit = F.expr(_int_matrix_sql(cents))
    probes = sample.select(
        F.col("vid").alias("query_id"),
        F.col("v").alias("__qv"),
        F.explode(
            F.transform(
                F.slice(
                    F.array_sort(_l2q_dist2(F.col("v"), ref_lit)), 1, nprobe
                ),
                lambda s: s.getField("cell").cast("int"),
            )
        ).alias("cell"),
    )
    dist2 = F.aggregate(
        F.zip_with(F.col("__qv"), F.col("v"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist2").asc(), F.col("neighbor_id").asc()
    )

    def topk(scored):
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id")
        )

    ivf_hits = topk(
        vis.join(F.broadcast(probes), "cell").select(
            "query_id", F.col("vid").alias("neighbor_id"), dist2.alias("dist2")
        )
    )
    exact = topk(
        vis.crossJoin(
            F.broadcast(
                sample.select(
                    F.col("vid").alias("query_id"), F.col("v").alias("__qv")
                )
            )
        ).select(
            "query_id", F.col("vid").alias("neighbor_id"), dist2.alias("dist2")
        )
    )
    row = (
        exact.join(ivf_hits.withColumn("__hit", F.lit(1)),
                   ["query_id", "neighbor_id"], "left")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("__hit").alias("hits"),
        )
        .collect()[0]
    )
    if row.n == 0:
        return 1_000_000
    return int(row.hits * 1_000_000 // row.n)


def ivf_index_refresh(
    index: IvfIndex,
    spark: SparkSession | None = None,
    k: int = 10,
    nprobe: int = 3,
    recall_floor_ppm: int = 900_000,
    max_sample: int = 32,
) -> dict:
    """Centroid-refresh MAINTENANCE with a recall gate (round-7
    verdict task 3): measure probe recall (:func:`ivf_index_recall_ppm`);
    if it sits at or above ``recall_floor_ppm`` the index is healthy
    and nothing is written. Below the floor, RE-TRAIN from the
    current visible vectors — the same deterministic seed + one-Lloyd
    integer pipeline as a fresh build — and land centroids + full
    reassignment as one new single-segment epoch (tombstones fold
    away; same manifest-commit atomicity as compaction). A refresh is
    value-identical to ``ivf_index_write`` over the visible vectors,
    so the append≡rebuild oracle discipline survives it: probes of
    the refreshed index equal probes of a from-scratch index on the
    same corpus (pinned in tests). Schedule it weekly next to
    compaction; nightly appends stay O(batch) against the new frozen
    centroids. Returns
    ``{"recall_ppm", "refreshed", "epoch"}``."""
    spark = spark or SparkSession.getActiveSession()
    recall = ivf_index_recall_ppm(spark, index, k, nprobe, max_sample)
    if recall >= recall_floor_ppm:
        return {
            "recall_ppm": recall,
            "refreshed": False,
            "epoch": index.resolve(spark).epoch,
        }
    with _index_lock(spark, index.name) as lk:
        man = _read_manifest(spark, index.name)
        cur = index.resolve(spark)
        new_epoch = cur.epoch + 1
        pins = _read_pins(spark, index.name)
        hist = _retained_history(man, new_epoch, [new_epoch], pins)
        tomb_hist = _retained_tomb_history(man, new_epoch, [], pins)
        _gc_epochs(spark, index.name,
                   _keep_epochs(hist, tomb_hist) - {new_epoch})
        vis = _visible(cur, spark, "assign", "vid").select("vid", "v")
        asg, _ref_lit, cents = _l2q_cells(vis, index.num_cells)
        _write_member(
            index._table("centroids", new_epoch),
            _centroid_df(spark, cents),
            new_epoch,
        )
        _write_member(
            index._table("assign", new_epoch),
            asg.select("vid", "v", F.col("cell").cast("int").alias("cell")),
            new_epoch,
        )
        lk.check()
        _commit_manifest(spark, index.name, new_epoch, index.spec(),
                         [new_epoch], hist, [], tomb_hist, prev_man=man)
        _gc_epochs(spark, index.name, _keep_epochs(hist, tomb_hist))
    return {"recall_ppm": recall, "refreshed": True, "epoch": new_epoch}


def ivf_index_delete(index: IvfIndex, vec_ids: DataFrame,
                     id_col: str = "vec_id") -> IvfIndex:
    """Tombstone-delete ``vec_ids`` from the IVF index — O(batch):
    one small tomb member lands as a new epoch; inverted lists stay
    untouched and probes anti-join the suppressed vids away per
    segment, so post-delete top-k is value-identical to an index
    whose lists never held those vectors (same frozen centroids —
    the ``ivf_index_delete_topk`` oracle replays exactly that).
    Compaction folds tombstones away physically."""
    return _tomb_delete(index, vec_ids, id_col, "assign", "vid",
                        compact_fn=ivf_index_compact)
