"""Deduplication operators for LLM-data pipelines.

Four tiers, all DataFrame-native (no driver materialization, no
Python in the hot path), designed so each stage is one keyed shuffle:

* exact       — hash-groupBy on a content fingerprint
* minhash+LSH — shingle → K minhashes → banded bucket join → verify
* simhash     — 64-bit sign-aggregated word hashes, near-dup by
                low Hamming distance within buckets
* n-gram Jaccard — shingle-blocked pair join with exact Jaccard

Scale notes (100 TB): the shingle explode is the dominant cost and is
embarrassingly partition-parallel; the LSH band join shuffles only
(band_idx, band_key) pairs — cardinality ≈ docs × bands, not doc
pairs. Hot shingles ("the the the") can skew the Jaccard block join —
the LSH path is the scale answer; the direct Jaccard join exists for
verification and small corpora.

Hash modes: ``xxhash`` (64-bit JVM xxhash64 — fast path) or ``md5``
(hex-string md5 — slower, but bit-identical in any ANSI SQL engine,
which is what the DuckDB oracle gate checks).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T
from ..functions import vectors as V


def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep: str = "min_id",
) -> DataFrame:
    """Exact dedup on the md5 fingerprint of normalized text.

    Keeps the representative with the smallest id (deterministic) and
    adds ``dup_count``. One shuffle on the 128-bit fingerprint —
    uniform keys, no skew.
    """
    assert keep == "min_id"
    fp = df.withColumn("__fp", T.fingerprint_md5(F.col(text_col)))
    w = Window.partitionBy("__fp").orderBy(F.col(id_col).asc())
    return (
        fp.withColumn("__rn", F.row_number().over(w))
        .withColumn("dup_count", F.count(F.lit(1)).over(Window.partitionBy("__fp")))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__fp")
    )


def _shingle_table(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(id, shingle) exploded distinct shingle table.

    Tokenizes in its own projection so the shingle lambda references a
    materialized array, not an inline split — see
    :func:`..functions.text.shingles_of_tokens`.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"), T.tokens(F.col(text_col)).alias("__w")
    )
    sh = toks.select(
        "doc_id",
        F.explode(T.shingles_of_tokens(F.col("__w"), n)).alias("shingle"),
    ).distinct()
    # 8-byte surrogate join key: pair joins shuffle/compare longs, not
    # variable-width shingle strings (64-bit collision odds ~1e-9 for
    # million-shingle corpora — below any float tolerance we hold).
    return sh.withColumn("sid", F.xxhash64("shingle"))


def _minhash_expr(i: int, mode: str) -> Column:
    if mode == "md5":
        # min over hex strings == min over 128-bit values (fixed width)
        return F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle"))))
    # xxhash64 seeded by i — JVM-side, ~10× cheaper than md5
    return F.min(F.xxhash64(F.lit(i), F.col("shingle"))).cast("string")


def minhash_signatures(
    shingle_tbl: DataFrame,
    num_hashes: int = 16,
    mode: str = "xxhash",
) -> DataFrame:
    """doc_id → K minhash values, computed as K min-aggregates in ONE
    groupBy pass over the shingle table (single shuffle on doc_id)."""
    return shingle_tbl.groupBy("doc_id").agg(
        *[_minhash_expr(i, mode).alias(f"mh{i}") for i in range(num_hashes)]
    )


def lsh_band_table(
    signatures: DataFrame,
    num_hashes: int,
    bands: int,
) -> DataFrame:
    """(doc_id, band_idx, band_key): the signature split into
    ``bands`` groups of ``num_hashes // bands`` rows, each group
    keyed by the md5 of its concatenated minhashes. A doc appears in
    exactly ``bands`` rows — the table the candidate join AND the
    tuning diagnostics both read."""
    rows = num_hashes // bands
    band_cols = [
        F.md5(
            F.concat_ws("|", *[F.col(f"mh{b * rows + r}") for r in range(rows)])
        ).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = signatures.select("doc_id", *band_cols)
    return banded.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band_idx"), F.col(f"band{b}").alias("band_key"))
                for b in range(bands)
            ])
        ).alias("bk"),
    ).select("doc_id", "bk.band_idx", "bk.band_key")


def lsh_candidate_pairs(
    signatures: DataFrame,
    num_hashes: int,
    bands: int,
    max_bucket: int | None = None,
) -> DataFrame:
    """Banded LSH: split the signature into ``bands`` groups of
    ``num_hashes // bands`` rows; docs sharing any band key are
    candidates. Emits distinct (doc_a < doc_b) pairs.

    The band join shuffles (band_idx, band_key) — linear in corpus
    size. A doc appears in exactly ``bands`` buckets.

    ``max_bucket`` is the hot-bucket guard: band-key groups larger
    than it are dropped BEFORE the self-join. Without it one
    boilerplate-heavy band key (every page sharing a template
    footer) emits n·(n−1)/2 candidate pairs — an OUTPUT-cardinality
    blow-up that AQE skew handling cannot fix, because the quadratic
    rows are the answer, not a partitioning artifact. Oversized
    buckets are boilerplate clusters that exact dedup and connected
    components already catch; docs keep their other ``bands − 1``
    buckets, so genuine near-dup pairs still surface through any
    non-hot band (see ``minhash_band_stats`` for sizing the cap).
    The guard is a broadcast ANTI-join against the hot-key set: one
    map-side-combined count over the band table, filtered to keys
    ABOVE the cap before it ships — by construction a small table
    (the point of the cap is that oversized buckets are rare), so
    the probe side pays no sort, no shuffle, no per-row window. (A
    count-window formulation costs a sort per self-join side — 2×
    the uncapped pipeline, measured.)
    """
    # The band table feeds both self-join sides (plus the hot-key
    # count when the cap is on). Unpersisted, EACH consumer
    # recomputes the minhash-signature aggregation — the dominant
    # cost of the whole pipeline (the capped flavor measured ~1.8×
    # the uncapped one at sf0.1 for exactly this reason before the
    # cap branch got its persist; round 13 extends the persist to
    # the uncapped path, whose self-join was still signing the
    # corpus TWICE). Persist once (memory-and-disk: at 100 TB the
    # band table is corpus×bands small fixed-width rows, far below
    # the shuffle the self-join pays anyway) and every consumer
    # reads the cached band rows.
    from pyspark import StorageLevel

    stacked = lsh_band_table(signatures, num_hashes, bands).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    if max_bucket is not None:
        hot = (
            stacked.groupBy("band_idx", "band_key")
            .agg(F.count(F.lit(1)).alias("__bn"))
            .filter(F.col("__bn") > max_bucket)
            .select("band_idx", "band_key")
        )
        stacked = stacked.join(
            F.broadcast(hot), ["band_idx", "band_key"], "left_anti"
        )
    a = stacked.alias("a")
    b = stacked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def _attach_jaccard(inter: DataFrame, sizes: DataFrame) -> DataFrame:
    """Join per-doc shingle counts onto an intersection-count table and
    derive ``jacc_ppm`` (Jaccard in parts-per-million — integer,
    cross-engine exact). ``sizes`` is one row per doc (post-agg), so
    AQE upgrades these joins to broadcast when the corpus allows."""
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_shingles", "size_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_shingles", "size_b"), "doc_b")
    )
    union = F.col("size_a") + F.col("size_b") - F.col("inter")
    return out.withColumn(
        "jacc_ppm", F.round(F.col("inter") * 1000000.0 / union).cast("bigint")
    )


def jaccard_for_pairs(pairs: DataFrame, shingle_tbl: DataFrame) -> DataFrame:
    """Exact Jaccard for given (doc_a, doc_b) pairs via shingle joins.

    Output adds ``inter``, ``size_a``, ``size_b`` and ``jacc_ppm``.
    """
    sizes = shingle_tbl.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    s1 = shingle_tbl.alias("s1")
    s2 = shingle_tbl.alias("s2")
    inter = (
        pairs.alias("p")
        .join(s1, F.col("p.doc_a") == F.col("s1.doc_id"))
        .join(
            s2,
            (F.col("p.doc_b") == F.col("s2.doc_id"))
            & (F.col("s1.sid") == F.col("s2.sid")),
        )
        .groupBy("p.doc_a", "p.doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return _attach_jaccard(inter, sizes)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold_ppm: int = 600000,
    mode: str = "xxhash",
    max_bucket: int | None = None,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: shingle → sign → band →
    candidate join → exact-Jaccard verify → threshold.

    Returns (doc_a, doc_b, jacc_ppm) pairs with Jaccard ≥ threshold.
    ``max_bucket`` forwards to the hot-bucket guard in
    :func:`lsh_candidate_pairs` — set it on real web corpora.
    """
    # The exploded shingle table feeds signatures, both sides of the
    # verify join, and the size agg — persist it once instead of four
    # explode+distinct recomputations. At cluster scale the same slot
    # is a materialized intermediate (MEMORY_AND_DISK spills cleanly).
    sh = _shingle_table(df, text_col, id_col, shingle_n).persist()
    sigs = minhash_signatures(sh, num_hashes, mode)
    cand = lsh_candidate_pairs(sigs, num_hashes, bands, max_bucket=max_bucket)
    verified = jaccard_for_pairs(cand, sh)
    return verified.filter(F.col("jacc_ppm") >= threshold_ppm).select(
        "doc_a", "doc_b", "jacc_ppm"
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold_ppm: int = 500000,
) -> DataFrame:
    """Direct n-gram Jaccard near-dup: all pairs sharing ≥1 shingle,
    exact Jaccard, threshold. Shingle-blocked — no LSH approximation;
    quadratic in the worst case, use :func:`minhash_lsh_pairs` at
    scale."""
    sh = _shingle_table(df, text_col, id_col, shingle_n).persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    s1, s2 = sh.alias("s1"), sh.alias("s2")
    # One self-join does double duty: each matched row IS one shared
    # shingle, so groupBy counts the intersection directly — no
    # distinct-pairs materialization, no re-join against the shingles.
    inter = (
        s1.join(
            s2,
            (F.col("s1.sid") == F.col("s2.sid"))
            & (F.col("s1.doc_id") < F.col("s2.doc_id")),
        )
        .groupBy(
            F.col("s1.doc_id").alias("doc_a"), F.col("s2.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        _attach_jaccard(inter, sizes)
        .filter(F.col("jacc_ppm") >= threshold_ppm)
        .select("doc_a", "doc_b", "jacc_ppm")
    )


def embedding_cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold_ppm: int = 400000,
    num_blocks: int = 8,
    scale: int = 1000,
) -> DataFrame:
    """Embedding-cosine near-dup: (id_a < id_b) pairs with quantized
    cosine ≥ threshold (ppm), engine-exact (integer dot/norms, one
    ``floor`` over identical IEEE doubles — matches the DuckDB oracle
    bit-for-bit; ``.5`` rounding ties can't occur because (n+0.5)/1000
    is not float-representable).

    Physical design is the classic distributed all-pairs **triangle
    block join**: vectors hash into ``num_blocks`` buckets, each
    unordered bucket pair (i ≤ j) becomes one task, and a numpy gram
    kernel (``applyInPandas`` — Arrow batches, no driver collect)
    scores that tile. Each vector replicates ~``num_blocks`` times;
    tile memory is (N/num_blocks)² — tune ``num_blocks`` so a tile
    fits an executor. The all-pairs product is inherently quadratic;
    the sub-linear path is LSH bucketing
    (``operators.similarity.lsh_bucketed_topk``) feeding candidates
    through this same exact verify.
    """
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    base = df.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")
    ).withColumn("blk", F.pmod(F.xxhash64("vid"), F.lit(num_blocks)).cast("int"))
    block_pairs = spark.createDataFrame(
        [(i, j) for i in range(num_blocks) for j in range(num_blocks) if i <= j],
        "bi int, bj int",
    )
    a_side = base.join(F.broadcast(block_pairs), base["blk"] == block_pairs["bi"]).select(
        "vid", "vec", "bi", "bj", F.lit(0).alias("side")
    )
    b_side = base.join(
        F.broadcast(block_pairs),
        (base["blk"] == block_pairs["bj"]) & (block_pairs["bi"] != block_pairs["bj"]),
    ).select("vid", "vec", "bi", "bj", F.lit(1).alias("side"))
    tiles = a_side.unionByName(b_side)

    def gram(pdf: pd.DataFrame) -> pd.DataFrame:
        # Quantized values are integers with |v| <= scale, D = dim; every
        # dot product is an integer with |dot| <= D*scale^2 << 2^53, so a
        # float64 gemm over the integer-valued matrices is BIT-EXACT while
        # using BLAS (numpy int64 matmul is a naive loop, ~50x slower at
        # real tile sizes).
        def qmat(sub: pd.DataFrame):
            m = np.round(np.vstack(sub["vec"].to_numpy()).astype("float64") * scale)
            return sub["vid"].to_numpy(), m, (m * m).sum(axis=1)  # nsq exact

        a = pdf[pdf["side"] == 0]
        b = pdf[pdf["side"] == 1]
        if not len(a):  # tile with only one populated block side
            return pd.DataFrame({"id_a": [], "id_b": [], "cos_ppm": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cos_ppm": "int64"}
            )
        ids_a, ma, nsq_a = qmat(a)
        if len(b):
            ids_b, mb, nsq_b = qmat(b)
        else:  # diagonal tile: intra-block upper triangle
            ids_b, mb, nsq_b = ids_a, ma, nsq_a
        dots = ma @ mb.T
        # Candidate mask instead of materializing all NxM index pairs:
        # truth is dots*1e6 >= thr*sqrt(nsq_a*nsq_b); the outer-product rhs
        # carries ~1 ulp of rounding, so widen by 1 ppm (>= 1e-6 relative,
        # dwarfing 1e-15 fp error) and re-score survivors exactly below.
        # lhs is exact (|dots|*1e6 < 2^53). Zero-norm rows pass the mask
        # (0 >= 0) and are dropped by the exact denom > 0 check.
        mask = dots * 1000000.0 >= (threshold_ppm - 1) * np.outer(
            np.sqrt(nsq_a), np.sqrt(nsq_b)
        )
        if not len(b):
            mask &= np.triu(np.ones(dots.shape, dtype=bool), k=1)
        ia, ib = np.nonzero(mask)
        denom = np.sqrt(nsq_a[ia] * nsq_b[ib])
        with np.errstate(divide="ignore", invalid="ignore"):
            cos_ppm = np.floor(dots[ia, ib] * 1000000.0 / denom)
        keep = (denom > 0) & (cos_ppm >= threshold_ppm)
        lo = np.minimum(ids_a[ia[keep]], ids_b[ib[keep]])
        hi = np.maximum(ids_a[ia[keep]], ids_b[ib[keep]])
        return pd.DataFrame(
            {"id_a": lo, "id_b": hi, "cos_ppm": cos_ppm[keep].astype("int64")}
        )

    return tiles.groupBy("bi", "bj").applyInPandas(
        gram, schema="id_a long, id_b long, cos_ppm long"
    )


def simhash64(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_mode: str = "xxhash",
) -> DataFrame:
    """SimHash per document (word hashes, sign-sum per bit). Near-dups
    have low Hamming distance.

    Hash modes mirror minhash's: ``xxhash`` = 63-bit JVM xxhash64
    (fast path), ``md5`` = top 60 bits of md5 — slower but
    bit-identical in any ANSI SQL engine, which is what upgrades the
    declared query from rows-only to hash-verified.

    One explode + one per-bit-agg groupBy — a single shuffle on
    doc_id. Returns (id, simhash bigint, always non-negative).
    """
    nbits = simhash_bits(hash_mode)
    words = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(T.tokens(F.col(text_col))).alias("word"),
    )
    if hash_mode == "md5":
        # md5+conv is ~5× the cost of xxhash64 per call, so hash each
        # DISTINCT word once per doc and weight the sign-sum by its
        # multiplicity — Σ_instances ±1 ≡ Σ_distinct n·(±1), bit-
        # identical results (the oracle keeps the per-instance form).
        # The (doc, word) pre-aggregate combines map-side; the per-doc
        # rollup reuses the same doc_id hash partitioning — Catalyst
        # plans ONE exchange for both.
        words = words.groupBy("doc_id", "word").agg(
            F.count(F.lit(1)).alias("n")
        )
        h = F.conv(F.substring(F.md5(F.col("word")), 1, 15), 16, 10).cast("bigint")
        weight = F.col("n")
    else:
        h = F.xxhash64(F.col("word"))
        weight = F.lit(1)
    words = words.withColumn("h", h)
    bit_aggs = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.lit(1 << b)) != 0, weight).otherwise(-weight)
        ).alias(f"b{b}")
        for b in range(nbits)
    ]
    sums = words.groupBy("doc_id").agg(*bit_aggs)
    sim = None
    for b in range(nbits):
        term = F.when(F.col(f"b{b}") > 0, F.lit(1 << b).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        sim = term if sim is None else sim + term
    return sums.select("doc_id", sim.alias("simhash"))


def simhash_bits(hash_mode: str) -> int:
    """Signature width: 63 for xxhash (bit 63 is the sign bit —
    skipped to stay positive), 60 for md5 (15 hex chars)."""
    return 60 if hash_mode == "md5" else 63


def simhash_near_pairs(
    sims: DataFrame,
    max_hamming: int = 3,
    prefix_bits: int = 16,
    hash_bits: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs: block on the top ``prefix_bits`` of
    the ``hash_bits``-wide simhash (docs differing only in low bits
    collide), then exact Hamming ≤ ``max_hamming`` via
    bit_count(xor).

    ``hash_bits`` must match the signature width ``simhash64``
    produced — ``simhash_bits(hash_mode)``: 63 for xxhash, 60 for
    md5. The default is the xxhash width (the production mode);
    round 2 defaulted to 64, which silently blocked on
    ``prefix_bits − 1`` effective bits (the top bit of a 63-bit
    signature is always zero — round-2 ADVICE)."""
    if hash_bits is None:
        hash_bits = simhash_bits("xxhash")
    # ``keyed`` feeds BOTH self-join sides — unpersisted, each side
    # recomputes the upstream signature aggregation (60 bit-sums over
    # an md5 per word in the declared query: the dominant cost), so
    # the corpus was signed twice per run. Persist the (doc_id,
    # simhash, block) rows once — 3 fixed-width columns, far smaller
    # than the word explode they replace (round 13, opt guide §2.4:
    # two operations keyed the same way share one computation).
    from pyspark import StorageLevel

    keyed = sims.withColumn(
        "block",
        F.shiftrightunsigned(F.col("simhash"), hash_bits - prefix_bits),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    a, b = keyed.alias("a"), keyed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .withColumn(
            "hamming",
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            "hamming",
        )
    )


# ---------------------------------------------------------------------------
# Connected components (dup-cluster resolution)
# ---------------------------------------------------------------------------


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to u's min
    neighborhood label (min over Γ(u) ∪ {u}).

    Emits duplicates freely — min() is duplicate-insensitive, so the
    round's single distinct lives at the end of the small-star
    (2 exchanges/round instead of 4)."""
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    w = Window.partitionBy("u")
    m = F.least(F.min("v").over(w), F.col("u"))
    return (
        sym.withColumn("m", m)
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Direct edges large→small; connect every small neighbor (and u
    itself) to u's min small neighbor. The trailing distinct
    canonicalizes the round's edge set (dup-tolerant inputs, exact
    fixed-point signatures)."""
    d = e.filter(F.col("u") != F.col("v")).select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    w = Window.partitionBy("u")
    d = d.withColumn("m", F.min("v").over(w))
    to_small = d.filter(F.col("v") != F.col("m")).select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    to_self = d.select(F.col("u"), F.col("m").alias("v"))
    return to_small.unionByName(to_self).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Undirected connected components over an edge list →
    ``(node, component_id)`` for every node appearing in ``edges``,
    where ``component_id`` is the smallest node id in the component.

    Alternating large-star / small-star (Kiveris et al., "Connected
    Components in MapReduce and Beyond") — converges in O(log² n)
    rounds regardless of component diameter, unlike naive min-label
    propagation whose round count is the graph diameter (a 1M-doc
    duplicate *chain* would need 1M rounds; this needs ~40). Each
    round is two keyed shuffles (window-min + distinct) with no
    driver-side data movement; the fixed-point probe ships back two
    longs. ``localCheckpoint`` truncates the iterative lineage so the
    plan doesn't grow exponentially (on a cluster, set a reliable
    checkpoint dir and swap to ``checkpoint``).

    Reference has no graph ops — this backs the LLM-pipeline dedup
    story: near-dup *pairs* (minhash/simhash/ngram) → clusters →
    one canonical doc per cluster.
    """
    # The fixed-point signature rides each round's checkpoint job via
    # observe() instead of a separate agg-collect action — one job
    # per round, not two (the eager materialization fills the
    # observed count/xor as a side effect of the same pass; measured
    # ~35% off the components wall at sf0.1, identical rounds).
    from pyspark.sql import Observation

    def _ckpt_with_sig(df: DataFrame, tag: str):
        # signature = (count, order-insensitive hash-XOR). XOR, not
        # SUM: the edge set is distinct so xor is collision-safe
        # enough, and it can't overflow (ANSI mode makes a long-sum
        # of xxhash64 values throw).
        obs = Observation(tag)
        out = df.observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)
            ).alias("h"),
        ).localCheckpoint(eager=True)
        got = obs.get  # filled by the checkpoint's materialization
        return out, (int(got["n"]), int(got["h"]))

    e, sig = _ckpt_with_sig(
        edges.select(
            F.col(src).cast("bigint").alias("u"),
            F.col(dst).cast("bigint").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct(),
        "cc_init",
    )
    for i in range(max_iter):
        e2, sig2 = _ckpt_with_sig(
            _small_star(_large_star(e)), f"cc_round_{i}"
        )
        e = e2
        if sig2 == sig:
            break
        sig = sig2
    else:
        raise RuntimeError(f"connected_components: no fixed point in {max_iter} rounds")
    # Fixed point of small∘large is a star forest directed large→small:
    # (node, root) plus the roots themselves.
    roots = e.select(F.col("v").alias("node")).distinct()
    return (
        e.select(F.col("u").alias("node"), F.col("v").alias("component_id"))
        .unionByName(
            roots.join(
                e.select(F.col("u").alias("node")).distinct(), "node", "left_anti"
            ).select(F.col("node"), F.col("node").alias("component_id"))
        )
    )


def shingle_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 5,
    threshold_ppm: int = 800000,
) -> DataFrame:
    """Directional shingle-set CONTAINMENT (Broder's resemblance twin:
    c(A,B) = |S(A)∩S(B)| / |S(A)|) — the quote-inclusion detector
    Jaccard near-dup misses by construction. A short document pasted
    verbatim into a long one has c(short→long) ≈ 1 while the pair's
    Jaccard ≈ |A|/|B| falls under every near-dup threshold, so
    symmetric dedup keeps both and the training set still carries the
    duplicated passage. Output: one row per (contained, container)
    DIRECTION with ``containment_ppm ≥ threshold_ppm``, alongside the
    symmetric ``jacc_ppm`` for triage.

    Scale: identical machinery to :func:`ngram_jaccard_pairs` — one
    shingle-blocked self-join on the 8-byte ``sid`` surrogate (each
    matched row IS one shared shingle, counted straight into the
    intersection; no pair materialization, no second shingle join),
    sizes broadcast by AQE. Never all-pairs: only docs sharing ≥1
    shingle meet. The directional emit is a projection of the same
    unordered-pair aggregate, so containment costs exactly one
    near-dup pass.
    """
    # persist: the shingle table feeds the self-join twice plus the
    # sizes agg — same discipline as ngram_jaccard_pairs (at scale
    # this is the materialized shingle artifact, not a re-scan ×3)
    sh = _shingle_table(df, text_col, id_col, shingle_n).persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    s1, s2 = sh.alias("s1"), sh.alias("s2")
    inter = (
        s1.join(
            s2,
            (F.col("s1.sid") == F.col("s2.sid"))
            & (F.col("s1.doc_id") < F.col("s2.doc_id")),
        )
        .groupBy(
            F.col("s1.doc_id").alias("doc_a"), F.col("s2.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    both = _attach_jaccard(inter, sizes)
    # both DIRECTIONS from one in-row explode — a union of two
    # projections would replay the entire self-join + aggregate
    # subtree per branch in the plan (measured: 2× the exchanges and
    # scans of the single pass this op advertises)
    direction = F.explode(
        F.array(
            F.struct(
                F.col("doc_a").alias("contained_id"),
                F.col("doc_b").alias("container_id"),
                F.round(F.col("inter") * 1000000.0 / F.col("size_a"))
                .cast("bigint")
                .alias("containment_ppm"),
            ),
            F.struct(
                F.col("doc_b").alias("contained_id"),
                F.col("doc_a").alias("container_id"),
                F.round(F.col("inter") * 1000000.0 / F.col("size_b"))
                .cast("bigint")
                .alias("containment_ppm"),
            ),
        )
    )
    return (
        both.select(direction.alias("d"), "jacc_ppm")
        .select("d.*", "jacc_ppm")
        .filter(F.col("containment_ppm") >= threshold_ppm)
    )
