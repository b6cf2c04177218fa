"""Semantic tests for the LLM-pipeline operators whose declared
queries are rows-only checked (no ANSI oracle): simhash, LSH ANN,
multimodal decode — plus invariants the oracle can't express
(blocking invariance, recall floors, determinism across runs).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ods_v3_dbt_spark.operators import dedup as DD
from ods_v3_dbt_spark.operators import multimodal as MM
from ods_v3_dbt_spark.operators import similarity as SIM
from ods_v3_dbt_spark.plans.llm_queries import corpus_with_dups

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def corpus(spark):
    return corpus_with_dups(spark, SF_SMOKE)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def test_simhash_deterministic_across_runs(spark, corpus):
    s1 = {r.doc_id: r.simhash for r in DD.simhash64(corpus).collect()}
    s2 = {r.doc_id: r.simhash for r in DD.simhash64(corpus).collect()}
    assert s1 == s2 and len(s1) > 0


def test_simhash_finds_exact_copies(spark, corpus):
    """Every doc_id+10000 exact copy must pair with its original at
    hamming 0 (identical token multiset → identical signature)."""
    sims = DD.simhash64(corpus)
    pairs = DD.simhash_near_pairs(sims, max_hamming=0, prefix_bits=8)
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    originals = {r.doc_id for r in corpus.filter("doc_id < 10000").collect()}
    expected = {
        (i, i + 10000) for i in originals if i % 10 == 0
    }
    assert expected <= got


def test_simhash_near_variant_low_hamming(spark, corpus):
    """The +20000 near-dup variants (two extra tokens) stay within a
    small hamming distance of their originals."""
    sims = DD.simhash64(corpus)
    pairs = DD.simhash_near_pairs(sims, max_hamming=10, prefix_bits=4)
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    near_ids = [r.doc_id for r in corpus.filter("doc_id >= 20000").collect()]
    hits = sum((i - 20000, i) in got for i in near_ids)
    assert hits >= len(near_ids) * 0.5  # prefix blocking loses some, most survive


# ---------------------------------------------------------------------------
# LSH hot-bucket guard
# ---------------------------------------------------------------------------


def test_lsh_hot_bucket_cap(spark):
    """An injected boilerplate mega-bucket (30 byte-identical docs —
    identical signatures, so one size-30 bucket in EVERY band) must
    be dropped by the cap, bounding the candidate output, while a
    genuine near-dup pair in normal-sized buckets keeps surfacing."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " \
           "lambda mu nu xi omicron pi rho sigma tau upsilon"
    rows = [(i, "the same boilerplate footer on every page of the site") for i in range(30)]
    rows += [(100, base), (101, base + " omega")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = DD._shingle_table(df, "text", "doc_id", 3)
    sigs = DD.minhash_signatures(sh, num_hashes=16)

    uncapped = {
        (r.doc_a, r.doc_b)
        for r in DD.lsh_candidate_pairs(sigs, 16, 4).collect()
    }
    assert len(uncapped) >= 30 * 29 // 2  # quadratic blow-up is real
    assert (100, 101) in uncapped

    capped = {
        (r.doc_a, r.doc_b)
        for r in DD.lsh_candidate_pairs(sigs, 16, 4, max_bucket=10).collect()
    }
    assert (100, 101) in capped  # normal buckets untouched
    assert not any(a < 30 and b < 30 for a, b in capped)  # mega-bucket gone
    assert len(capped) <= 1


# ---------------------------------------------------------------------------
# ANN / similarity
# ---------------------------------------------------------------------------


def test_lsh_ann_recall_floor(spark, emb):
    """Bucketed ANN must recover a reasonable share of the exact float
    top-k (deterministic hyperplanes → stable recall)."""
    q = emb.filter(F.col("vec_id") < 10)
    c = emb.filter(F.col("vec_id") >= 10)
    exact = SIM.topk_bruteforce(c, q, k=5, metric="cosine")
    approx = SIM.lsh_bucketed_topk(c, q, k=5, num_planes=4, num_tables=8)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"recall {recall:.2f}"


def test_ivf_ann_recall_floor(spark, emb):
    """IVF with nprobe=3/8 cells must beat random-subset recall and be
    deterministic (seeded from lowest-id vectors)."""
    q = emb.filter(F.col("vec_id") < 10)
    c = emb.filter(F.col("vec_id") >= 10)
    exact = {(r.query_id, r.neighbor_id) for r in
             SIM.topk_bruteforce(c, q, k=5, metric="cosine").collect()}
    a1 = {(r.query_id, r.neighbor_id) for r in
          SIM.ivf_topk(c, q, k=5, num_cells=8, nprobe=3).collect()}
    a2 = {(r.query_id, r.neighbor_id) for r in
          SIM.ivf_topk(c, q, k=5, num_cells=8, nprobe=3).collect()}
    assert a1 == a2  # deterministic end to end
    recall = len(exact & a1) / len(exact)
    assert recall >= 0.5, f"recall {recall:.2f}"


def test_pq_adc_recall_and_compression(spark, emb):
    """PQ-ADC (32 subspaces × 32 codes over 64 dims — synthetic
    uniform unit vectors have no cluster structure, so recall comes
    from code bits) must recover a reasonable share of the exact
    top-k purely from the compressed codes, be deterministic, and
    actually compress: every corpus vector encodes to exactly
    num_subs codes in [0, num_codes)."""
    q = emb.filter(F.col("vec_id") < 10)
    c = emb.filter(F.col("vec_id") >= 10)
    exact = {(r.query_id, r.neighbor_id) for r in
             SIM.topk_bruteforce(c, q, k=5, metric="cosine").collect()}
    a1 = {(r.query_id, r.neighbor_id) for r in
          SIM.pq_topk_adc(c, q, k=5, num_subs=32, num_codes=32).collect()}
    a2 = {(r.query_id, r.neighbor_id) for r in
          SIM.pq_topk_adc(c, q, k=5, num_subs=32, num_codes=32).collect()}
    assert a1 == a2  # deterministic end to end
    recall = len(exact & a1) / len(exact)
    assert recall >= 0.5, f"recall {recall:.2f}"

    from ods_v3_dbt_spark.operators.similarity import (
        pq_train_encode, quantize_embedding,
    )
    cq = c.select(F.col("vec_id").alias("vid"),
                  quantize_embedding(F.col("embedding")).alias("v"))
    codes, books = pq_train_encode(cq, num_subs=32, num_codes=32, dim_count=64)
    assert len(books) == 32 and all(len(b) == 32 for b in books)
    assert all(len(cw) == 2 for b in books for cw in b)
    rows = codes.collect()
    assert all(len(r.codes) == 32 for r in rows)
    assert all(0 <= v < 32 for r in rows for v in r.codes)


def test_pq_identical_vectors_share_codes_and_tie_on_adc(spark):
    """Byte-identical vectors must encode identically, and a query
    equal to a codeword reconstructs its own cell at ADC distance
    whose per-subspace terms are the codebook residuals — planted
    clones land jointly at the top (tie broken by neighbor id)."""
    base = [float(((i * 37) % 100) / 100.0 - 0.4) for i in range(64)]
    other = [float(((i * 53) % 100) / 100.0 - 0.5) for i in range(64)]
    rows = [(i, base) for i in range(10, 16)] + [(i, other) for i in range(16, 40)]
    c = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = spark.createDataFrame([(0, base)], "vec_id long, embedding array<double>")
    top = SIM.pq_topk_adc(c, q, k=6, num_subs=8, num_codes=4).collect()
    got = sorted((r.rank, r.neighbor_id) for r in top)
    # the 6 clones of the query occupy the full top-6, id-ordered
    assert [n for _, n in got] == [10, 11, 12, 13, 14, 15]
    assert len({r.adc_d2 for r in top}) == 1  # identical compressed distance


def test_ivfadc_recall_floor_and_probe_restriction(spark, emb):
    """IVFADC recall composes the probe recall with the codebook
    reconstruction error — floor it, pin determinism, and assert the
    probe restriction is real: every returned neighbor sits in one
    of its query's 4 probed cells."""
    from ods_v3_dbt_spark.operators.similarity import (
        _l2q_cells, quantize_embedding,
    )

    q = emb.filter(F.col("vec_id") < 10)
    c = emb.filter(F.col("vec_id") >= 10)
    exact = {(r.query_id, r.neighbor_id) for r in
             SIM.topk_bruteforce(c, q, k=5, metric="cosine").collect()}
    a1 = {(r.query_id, r.neighbor_id) for r in
          SIM.ivfadc_topk(c, q, k=5, num_cells=8, nprobe=4,
                          num_subs=32, num_codes=32).collect()}
    a2 = {(r.query_id, r.neighbor_id) for r in
          SIM.ivfadc_topk(c, q, k=5, num_cells=8, nprobe=4,
                          num_subs=32, num_codes=32).collect()}
    assert a1 == a2
    recall = len(exact & a1) / len(exact)
    assert recall >= 0.3, f"recall {recall:.2f}"

    cq = c.select(F.col("vec_id").alias("vid"),
                  quantize_embedding(F.col("embedding")).alias("v"))
    asg, _, _cents = _l2q_cells(cq, 8)
    cell_of = {r.vid: r.cell for r in asg.select("vid", "cell").collect()}
    probed = {}
    full = SIM.ivf_topk_l2q(c, q, k=10**9, num_cells=8, nprobe=4)
    for r in full.select("query_id", "neighbor_id").collect():
        probed.setdefault(r.query_id, set()).add(cell_of[r.neighbor_id])
    for qid, nid in a1:
        assert cell_of[nid] in probed[qid]


def test_blockwise_matches_bruteforce_cosine(spark, emb):
    """The numpy mapInPandas scale path must return the same neighbor
    sets as the expression-only exact path (float cosine both)."""
    q = emb.filter(F.col("vec_id") < 5)
    c = emb.filter(F.col("vec_id") >= 5)
    exact = SIM.topk_bruteforce(c, q, k=3, metric="cosine")
    qpdf = (
        q.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("vector"))
        .toPandas()
    )
    block = SIM.topk_blockwise(c, qpdf, k=3)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    b = {(r.query_id, r.neighbor_id) for r in block.collect()}
    assert e == b


def test_embedding_cosine_pairs_blocking_invariance(spark, emb):
    """Result set must not depend on the physical num_blocks choice."""
    p1 = {(r.id_a, r.id_b, r.cos_ppm) for r in
          DD.embedding_cosine_pairs(emb, threshold_ppm=300000, num_blocks=1).collect()}
    p8 = {(r.id_a, r.id_b, r.cos_ppm) for r in
          DD.embedding_cosine_pairs(emb, threshold_ppm=300000, num_blocks=8).collect()}
    assert p1 == p8 and len(p1) > 0


# ---------------------------------------------------------------------------
# Multimodal
# ---------------------------------------------------------------------------


def _media(spark, corpus):
    return corpus.limit(50).select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "video")
        .when(F.col("doc_id") % 3 == 1, "image")
        .otherwise("audio")
        .alias("media_type"),
        F.col("text").cast("binary").alias("content"),
    )


def test_multimodal_decode_deterministic_schema(spark, corpus):
    m = _media(spark, corpus)
    f1 = MM.decode_features(m, decoder="fake")
    assert set(f1.columns) >= {"media_id", "media_type", "byte_len", "ok"}
    key = lambda r: (r.media_id, r.byte_len, r.width, r.height, r.frame_count)  # noqa: E731
    r1 = sorted(map(key, f1.collect()))
    r2 = sorted(map(key, MM.decode_features(m, decoder="fake").collect()))
    assert r1 == r2 and len(r1) == 50
    assert all(r.ok for r in f1.collect())


def _encode_bmp24(arr):
    """Minimal uncompressed 24-bit bottom-up BMP encoder (test-side
    reference; RGB in, BGR rows padded to 4 bytes on disk)."""
    import numpy as np

    h, w, _ = arr.shape
    stride = (w * 3 + 3) // 4 * 4
    rows = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = arr[y, :, ::-1].tobytes()  # RGB→BGR
        rows += row + b"\x00" * (stride - len(row))
    px_off = 14 + 40
    size = px_off + len(rows)
    header = (
        b"BM" + size.to_bytes(4, "little") + b"\x00\x00\x00\x00"
        + px_off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")  # BI_RGB
        + len(rows).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return header + bytes(rows)


def test_real_codecs_roundtrip_and_pinned_stats():
    """Pure-codec checks (no Spark): PPM encode→decode roundtrip,
    BMP decode vs the reference encoder, pinned pixel stats."""
    import numpy as np

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 9, 3), dtype=np.uint8)
    fmt, w, h, c, arr = MM.decode_raster(MM.encode_ppm(img))
    assert (fmt, w, h, c) == ("ppm", 9, 5, 3)
    assert (arr == img).all()
    fmt, w, h, c, arr = MM.decode_raster(_encode_bmp24(img))
    assert (fmt, w, h, c) == ("bmp", 9, 5, 3)
    assert (arr == img).all()  # BGR swap + bottom-up flip undone
    # PPM with header comment + pinned stats
    payload = b"P6\n# comment\n2 2\n255\n" + bytes(range(12))
    fmt, w, h, c, arr = MM.decode_raster(payload)
    assert (w, h) == (2, 2) and int(arr.sum()) == sum(range(12))
    assert int(arr.min()) == 0 and int(arr.max()) == 11


def test_png_roundtrip_all_filters_and_color_types():
    """encode_png(filter cycle) → decode_png must reproduce every
    pixel for gray/gray+alpha/RGB/RGBA, on noise AND on a gradient
    (where average/paeth predictions are non-trivial)."""
    import numpy as np

    rng = np.random.default_rng(3)
    for shape in [(7, 5, 3), (6, 6, 4), (9, 2, 1), (8, 4, 2)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        fmt, w, h, c, arr = MM.decode_raster(MM.encode_png(img))
        assert (fmt, w, h, c) == ("png", shape[1], shape[0], shape[2])
        assert (arr == img).all()
    grad = (
        np.add.outer(np.arange(20), np.arange(30))[:, :, None]
        .repeat(3, axis=2)
        .astype(np.uint8)
    )
    assert (MM.decode_png(MM.encode_png(grad))[4] == grad).all()


def test_png_decode_against_spec_reference():
    """Independent check that cannot cancel an encoder/decoder bug
    pair: scanlines are filtered HERE with a scalar per-spec
    reimplementation (PNG spec §9), assembled into IDAT by hand, and
    decode_png must invert them. One scanline per filter type."""
    import zlib

    import numpy as np

    w, bpp = 4, 3
    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, size=(5, w, bpp), dtype=np.uint8)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    lines = bytearray()
    for y in range(5):
        raw = [int(v) for v in img[y].reshape(-1)]
        prev = [int(v) for v in img[y - 1].reshape(-1)] if y else [0] * (w * bpp)
        f = y % 5
        lines.append(f)
        for x in range(w * bpp):
            left = raw[x - bpp] if x >= bpp else 0
            up = prev[x]
            ul = prev[x - bpp] if x >= bpp else 0
            if f == 0:
                v = raw[x]
            elif f == 1:
                v = raw[x] - left
            elif f == 2:
                v = raw[x] - up
            elif f == 3:
                v = raw[x] - (left + up) // 2
            else:
                v = raw[x] - paeth(left, up, ul)
            lines.append(v % 256)

    def chunk(ctype, data):
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return len(data).to_bytes(4, "big") + ctype + data + crc.to_bytes(4, "big")

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", w.to_bytes(4, "big") + (5).to_bytes(4, "big") + bytes([8, 2, 0, 0, 0]))
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )
    fmt, gw, gh, gc, arr = MM.decode_png(payload)
    assert (fmt, gw, gh, gc) == ("png", 4, 5, 3)
    assert (arr == img).all()


def test_png_unsupported_variants_raise_cleanly():
    import zlib

    import numpy as np

    img = np.zeros((3, 3, 3), dtype=np.uint8)
    good = MM.encode_png(img)

    def mutate(depth=8, color=2, interlace=0):
        ihdr = (3).to_bytes(4, "big") * 2 + bytes([depth, color, 0, 0, interlace])
        crc = zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF
        return (
            good[:8]
            + (13).to_bytes(4, "big") + b"IHDR" + ihdr + crc.to_bytes(4, "big")
            + good[8 + 25:]
        )

    with pytest.raises(ValueError, match="16|depth"):
        MM.decode_png(mutate(depth=16))
    with pytest.raises(ValueError, match="color type"):
        MM.decode_png(mutate(color=3))  # palette
    with pytest.raises(ValueError, match="nterlaced"):
        MM.decode_png(mutate(interlace=1))
    with pytest.raises(ValueError, match="signature"):
        MM.decode_png(b"\x89PNG not a raster")


def test_real_decode_resize_on_spark(spark):
    """Real kernels through mapInPandas on real-format bytes: decode
    stats match numpy; resize content matches the nearest-neighbor
    numpy reference computed driver-side."""
    import numpy as np

    rng = np.random.default_rng(11)
    imgs = {i: rng.integers(0, 256, size=(6 + i, 20 - i, 3), dtype=np.uint8) for i in range(4)}
    rows = [(i, "image", bytearray(MM.encode_ppm(a))) for i, a in imgs.items()]
    rows.append((99, "image", bytearray(b"\x89PNG not a raster")))
    df = spark.createDataFrame(rows, "media_id long, media_type string, content binary")

    feats = {r.media_id: r for r in MM.decode_features(df, decoder="real").collect()}
    for i, a in imgs.items():
        r = feats[i]
        assert (r.width, r.height, r.channels, r.fmt, r.ok) == (
            a.shape[1], a.shape[0], 3, "ppm", True)
        assert r.px_sum == int(a.sum()) and r.px_min == int(a.min())
        assert r.px_mean_milli == int(a.sum()) * 1000 // a.size
    # non-raster payload: per-row error naming the PIL stub, not a crash
    assert feats[99].ok is False and "PIL" in feats[99].error

    out = {r.media_id: r for r in MM.resize_images(df, max_side=8, decoder="real").collect()}
    for i, a in imgs.items():
        r = out[i]
        w, h = MM.fit_dims(a.shape[1], a.shape[0], 8)
        assert (r.width, r.height) == (w, h)
        assert bytes(r.content) == MM.encode_ppm(MM.resize_nearest(a, w, h))
    assert out[99].ok is False


def test_frame_sample_plan(spark, corpus):
    feats = MM.decode_features(_media(spark, corpus), decoder="fake")
    sampled = MM.frame_sample_plan(feats, every_nth=10)
    assert sampled.columns == ["media_id", "frame_idx"]
    n_videos = feats.filter("media_type = 'video'").count()
    assert sampled.count() >= n_videos  # ≥1 frame row per video


def test_resize_images_bounded_and_deterministic(spark, corpus):
    """Resize: only image rows; output dims fit max_side preserving
    the (fake-)decoded aspect; payload size is exactly w*h*channels —
    bounded output regardless of input size; deterministic."""
    m = _media(spark, corpus)
    out = MM.resize_images(m, max_side=32, decoder="fake").collect()
    n_images = m.filter(F.col("media_type") == "image").count()
    assert len(out) == n_images and all(r.ok for r in out)
    dims = {r.media_id: (r.width, r.height, len(r.content)) for r in out}
    feats = {
        r.media_id: (r.width, r.height)
        for r in MM.decode_features(m, decoder="fake").collect()
    }
    for mid, (w, h, blen) in dims.items():
        W, H = feats[mid]
        assert max(w, h) <= 32 and blen == w * h * 3
        # aspect preserved via the exact integer fit
        assert (w, h) == MM.fit_dims(W, H, 32)
    out2 = {
        r.media_id: bytes(r.content)
        for r in MM.resize_images(m, max_side=32, decoder="fake").collect()
    }
    assert out2 == {r.media_id: bytes(r.content) for r in out}


# ---------------------------------------------------------------------------
# Connected components (alternating star algorithm)
# ---------------------------------------------------------------------------


def _union_find_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {x: find(x) for x in range(n_nodes)}


def _cc_spark(spark, edges):
    from ods_v3_dbt_spark.operators.dedup import connected_components

    df = spark.createDataFrame(edges, "doc_a: long, doc_b: long")
    out = connected_components(df).collect()
    return {int(r["node"]): int(r["component_id"]) for r in out}


def test_connected_components_chain(spark):
    """A 60-node chain: diameter 59, but the star algorithm must
    converge inside its 25-round budget (log², not diameter)."""
    edges = [(i, i + 1) for i in range(59)]
    got = _cc_spark(spark, edges)
    assert got == {i: 0 for i in range(60)}


def test_connected_components_random(spark):
    import random

    rng = random.Random(7)
    n = 80
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(70)]
    edges = [(u, v) for u, v in edges if u != v]
    want_root = _union_find_components(n, edges)
    # union-find roots are path-compressed reps; normalize to min of
    # each component for comparison
    groups = {}
    for x, r in want_root.items():
        groups.setdefault(r, []).append(x)
    want = {}
    for members in groups.values():
        m = min(members)
        for x in members:
            want[x] = m
    got = _cc_spark(spark, edges)
    touched = {u for e in edges for u in e}
    assert got == {x: want[x] for x in touched}


def test_connected_components_two_clusters_and_selfloop(spark):
    edges = [(5, 9), (9, 2), (30, 40), (7, 7)]
    got = _cc_spark(spark, edges)
    assert got == {5: 2, 9: 2, 2: 2, 30: 30, 40: 30}


def test_semantic_dedup_l2q_groups_and_keeps(spark):
    """SemDeDup operator semantics on a planted corpus: exact clones
    land in one component keeping the min id; distant vectors stay
    singletons; output is one row per vector and deterministic."""
    import numpy as np

    from ods_v3_dbt_spark.operators.similarity import semantic_dedup_l2q

    rng = np.random.RandomState(4)
    rows = []
    for vid in range(20):
        v = (rng.rand(64) - 0.5).tolist()
        rows.append((vid, v))
    # clones of 3, 7, 11 at ids 103/107/111 with a tiny nudge
    for vid in (3, 7, 11):
        v = list(rows[vid][1])
        v[5] += 0.001
        rows.append((100 + vid, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup_l2q(df, num_cells=4, radius2=300000)
    got = {r.vec_id: (r.component_id, r.keep) for r in out.collect()}
    assert len(got) == 23
    for vid in (3, 7, 11):
        # clone groups with its parent (same cell — the nudge is tiny)
        assert got[100 + vid][0] == vid and not got[100 + vid][1]
        assert got[vid] == (vid, True)
    singles = [v for v in range(20) if v not in (3, 7, 11)]
    assert all(got[v] == (v, True) for v in singles)
    again = {r.vec_id: (r.component_id, r.keep) for r in
             semantic_dedup_l2q(df, num_cells=4, radius2=300000).collect()}
    assert again == got


def test_semantic_dedup_hot_cell_guard(spark):
    """Round-5 verdict task 4: the block-pair decomposition bounds
    the all-pairs kernel's per-group row count under a planted HOT
    cell (num_cells=1 forces everything into one cell) while the
    dedup output stays byte-identical to the unguarded kernel — the
    guard is exact, not a recall trade."""
    import numpy as np

    from pyspark.sql import functions as F

    from ods_v3_dbt_spark.operators.similarity import (
        _cell_blocks,
        semantic_dedup_l2q,
    )

    rng = np.random.RandomState(11)
    rows = [(vid, (rng.rand(64) - 0.5).tolist()) for vid in range(60)]
    for vid in (5, 17, 29, 41):  # planted near-dup clones
        v = list(rows[vid][1])
        v[3] += 0.001
        rows.append((200 + vid, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def snap(max_cell_rows):
        out = semantic_dedup_l2q(
            df, num_cells=1, radius2=300000, max_cell_rows=max_cell_rows
        )
        return {(r.vec_id, r.cell, r.component_id, r.keep)
                for r in out.collect()}

    unguarded = snap(max_cell_rows=10_000)   # k = 1, single group
    guarded = snap(max_cell_rows=8)          # hot cell → many blocks
    assert guarded == unguarded
    assert any(not keep for (_, _, _, keep) in guarded)  # dups found

    # bounded per-group row count, proven on the decomposition itself:
    # every (cell, bi, bj) kernel group holds ≤ 2·max_cell_rows rows
    asg = df.select(
        F.col("vec_id").alias("vid"),
        F.lit(0).alias("cell"),
        F.array([F.lit(0)] * 4).alias("v"),
    )
    blocks = _cell_blocks(asg, max_cell_rows=8)
    sizes = blocks.groupBy("cell", "bi", "bj").count()
    assert sizes.agg(F.max("count")).first()[0] <= 16
    # exact coverage: every unordered row pair lands in EXACTLY one
    # group — diagonal for same-sub pairs, (min,max) for cross pairs
    a = blocks.select("vid", "bi", "bj", "sub")
    kernel_pairs = (  # what the kernel pairs: sub==bi side × sub==bj side
        ((F.col("x.sub") == F.col("x.bi")) & (F.col("y.sub") == F.col("x.bj")))
        | ((F.col("x.sub") == F.col("x.bj")) & (F.col("y.sub") == F.col("x.bi")))
    )
    pair_groups = (
        a.alias("x")
        .join(
            a.alias("y"),
            (F.col("x.bi") == F.col("y.bi"))
            & (F.col("x.bj") == F.col("y.bj"))
            & (F.col("x.vid") < F.col("y.vid"))
            & kernel_pairs,
        )
        .groupBy(F.col("x.vid").alias("u"), F.col("y.vid").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    n_rows = df.count()
    assert pair_groups.count() == n_rows * (n_rows - 1) // 2
    assert pair_groups.agg(F.max("n")).first()[0] == 1


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------


def test_pagerank_int_matches_scalar_replay(spark):
    """pagerank_int must reproduce a driver-side scalar replay of the
    integer recurrence on a hand-built micro-graph (hub + chain +
    dangling-free cycle), and hold its invariants: teleport floor,
    hub dominance, determinism."""
    from ods_v3_dbt_spark.operators.graph import pagerank_int

    edges = [(0, 1), (1, 2), (2, 0), (3, 0), (4, 0), (5, 0), (3, 4), (4, 5), (5, 3)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.pr for r in pagerank_int(e, iterations=4).collect()}

    # scalar replay of the exact same floor recurrence
    from collections import defaultdict
    nodes = sorted({u for ed in edges for u in ed})
    deg = defaultdict(int)
    for s, _ in edges:
        deg[s] += 1
    pr = {n: 1_000_000 for n in nodes}
    for _ in range(4):
        s = defaultdict(int)
        for a, b in edges:
            s[b] += pr[a] // deg[a]
        pr = {n: 150_000 + 850_000 * s[n] // 1_000_000 for n in nodes}
    assert got == pr
    # node 0 has in-degree 4 → must outrank everything
    assert max(pr, key=pr.get) == 0
    # teleport term is the floor for every node
    assert all(v >= 150_000 for v in got.values())
    # deterministic across runs
    again = {r.node: r.pr for r in pagerank_int(e, iterations=4).collect()}
    assert again == got


def test_pq_ivfadc_recall_floors_sf01(spark):
    """Round-4 task 8: explicit recall floors for BOTH compressed-
    domain ANN operators against exact brute-force at sf0.1 (2k
    corpus vectors — the scale the bench prices). Floors are set
    below observed steady-state (PQ ~0.7, IVFADC ~0.5 on the
    synthetic uniform corpus) but high enough that a broken codebook
    refinement, assignment tie-break, or ADC lookup fails loudly."""
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    c = emb.filter(F.col("vec_id") >= 10)
    exact = {(r.query_id, r.neighbor_id) for r in
             SIM.topk_bruteforce(c, q, k=5, metric="cosine").collect()}
    pq = {(r.query_id, r.neighbor_id) for r in
          SIM.pq_topk_adc(c, q, k=5, num_subs=32, num_codes=32).collect()}
    ivfadc = {(r.query_id, r.neighbor_id) for r in
              SIM.ivfadc_topk(c, q, k=5, num_cells=8, nprobe=4,
                              num_subs=32, num_codes=32).collect()}
    pq_recall = len(exact & pq) / len(exact)
    ivfadc_recall = len(exact & ivfadc) / len(exact)
    assert pq_recall >= 0.4, f"PQ recall {pq_recall:.2f}"
    assert ivfadc_recall >= 0.25, f"IVFADC recall {ivfadc_recall:.2f}"


def test_lsh_index_probe_subset_of_exact_probe(spark, corpus):
    """The LSH index probe's verified pairs are a SUBSET of the
    exact shingle-index probe's (LSH can only lose candidates, never
    invent them — both verify with the same exact Jaccard), and the
    planted whole-text near-dups collide in at least one band, so
    the probe is not vacuously empty."""
    from pyspark.sql import functions as F

    from ods_v3_dbt_spark.operators.neardup_index import (
        dedup_index_write,
        lsh_index_write,
        lsh_index_probe,
        neardup_probe,
    )

    existing = corpus.filter(F.col("doc_id") < 10000)
    batch = corpus.filter(F.col("doc_id") >= 10000)
    exact_idx = dedup_index_write(existing, "t_subset_exact", num_buckets=4)
    lsh_idx = lsh_index_write(existing, "t_subset_lsh", num_buckets=4, mode="md5")
    exact = {(r.doc_id, r.corpus_id, r.jacc_ppm)
             for r in neardup_probe(batch, exact_idx, 500_000).collect()}
    lsh = {(r.doc_id, r.corpus_id, r.jacc_ppm)
           for r in lsh_index_probe(batch, lsh_idx, 500_000).collect()}
    assert lsh <= exact
    # the +10000 exact clones share ALL shingles → identical minhash
    # signatures → guaranteed band collision → jacc 1e6 pairs present
    assert any(j == 1_000_000 for (_, _, j) in lsh)


def test_lsh_probe_candidate_broadcast_fallback(spark, corpus):
    """Round-5 verdict task 5: when the candidate-pair count exceeds
    broadcast_cand_limit, the verify restrictions switch from
    broadcast to shuffle semi-joins — IDENTICAL probe output on both
    paths (limit=0 forces the fallback for every non-empty candidate
    set), and the fallback's executed plan carries no broadcast of
    the candidate table."""
    from pyspark.sql import functions as F

    from ods_v3_dbt_spark.operators.neardup_index import (
        lsh_index_probe,
        lsh_index_write,
    )

    existing = corpus.filter(F.col("doc_id") < 10000)
    batch = corpus.filter(F.col("doc_id") >= 10000)
    idx = lsh_index_write(existing, "t_bcfall_lsh", num_buckets=4, mode="md5")
    normal = lsh_index_probe(batch, idx, 500_000)
    fallback = lsh_index_probe(batch, idx, 500_000, broadcast_cand_limit=0)
    n = {tuple(r) for r in normal.collect()}
    f = {tuple(r) for r in fallback.collect()}
    assert n == f and n
    # the danger is the UNCONDITIONAL broadcast hint (it overrides
    # Spark's size checks); auto-broadcast of genuinely-small tables
    # is size-capped and fine. With auto-broadcast off, any remaining
    # BroadcastHashJoin must come from a hint — the fallback plan
    # must then have none, while the normal path's hints survive.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        fb_plan = (
            lsh_index_probe(batch, idx, 500_000, broadcast_cand_limit=0)
            ._jdf.queryExecution().executedPlan().toString()
        )
        hint_plan = (
            lsh_index_probe(batch, idx, 500_000)
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "BroadcastHashJoin" not in fb_plan
    assert "BroadcastHashJoin" in hint_plan


def test_index_append_equals_rebuild(spark, corpus):
    """Incremental index refresh: appending a delta to an index built
    on the base corpus yields EXACTLY the state of a full rebuild
    over base ∪ delta — for both index flavors, checked table by
    table (fingerprints as sets; shingles/sizes/bands as row sets) —
    and a probe against the appended index equals a probe against
    the rebuilt one."""
    from pyspark.sql import functions as F

    from ods_v3_dbt_spark.operators.neardup_index import (
        dedup_index_append,
        dedup_index_write,
        lsh_index_append,
        lsh_index_probe,
        lsh_index_write,
        neardup_probe,
    )

    base = corpus.filter(F.col("doc_id") % 2 == 0)
    delta = corpus.filter((F.col("doc_id") % 2 == 1) & (F.col("doc_id") < 10000))
    probe_docs = corpus.filter(F.col("doc_id") >= 20000)

    def part_rows(idx, part):
        # epoch tags differ by construction (append commits epoch 2,
        # rebuild is epoch 1) — compare the CONTENT rows
        tbl = getattr(idx.resolve(spark), part)
        return {tuple(r) for r in tbl.read(spark).drop("__epoch").collect()}

    ai = dedup_index_write(base, "t_app_exact", num_buckets=4)
    dedup_index_append(ai, delta)
    ri = dedup_index_write(base.unionByName(delta), "t_reb_exact", num_buckets=4)
    for part in ("fps", "shingles", "sizes"):
        assert part_rows(ai, part) == part_rows(ri, part), part
    pa = {tuple(r) for r in neardup_probe(probe_docs, ai, 500_000).collect()}
    pr = {tuple(r) for r in neardup_probe(probe_docs, ri, 500_000).collect()}
    assert pa == pr and pa

    al = lsh_index_write(base, "t_app_lsh", num_buckets=4, mode="md5")
    lsh_index_append(al, delta)
    rl = lsh_index_write(
        base.unionByName(delta), "t_reb_lsh", num_buckets=4, mode="md5"
    )
    for part in ("band_tbl", "shingles", "sizes"):
        assert part_rows(al, part) == part_rows(rl, part), part
    la = {tuple(r) for r in lsh_index_probe(probe_docs, al, 500_000).collect()}
    lr = {tuple(r) for r in lsh_index_probe(probe_docs, rl, 500_000).collect()}
    assert la == lr and la


def test_index_append_crash_replay_converges(spark, monkeypatch):
    """Epoch-commit crash semantics (round-5 verdict task 1): an
    append that dies ANYWHERE before the manifest replace leaves the
    readable index exactly at the old epoch (the orphaned part-built
    epoch is invisible), and the replayed append converges to the
    full-append state — no duplicate (doc_id, sid) rows, correct
    sizes, correct probe Jaccard, orphan epochs garbage-collected."""
    from pyspark.sql import functions as F

    import ods_v3_dbt_spark.operators.neardup_index as NI
    from ods_v3_dbt_spark.operators.neardup_index import (
        dedup_index_append,
        dedup_index_write,
        neardup_probe,
    )

    base = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    delta = spark.createDataFrame(
        [(2, "one two three four five six seven eight")],
        "doc_id long, text string",
    )
    idx = dedup_index_write(base, "t_crash_idx", num_buckets=2)
    e0 = idx.resolve(spark).epoch  # absolute value persists across
    # pytest sessions (the manifest survives in the warehouse) — all
    # assertions below are RELATIVE to this build's epoch

    # simulate the crash: every epoch-2 member table lands, but the
    # process dies at the very last instant — the manifest replace
    real_commit = NI._commit_manifest

    def dying_commit(*a, **k):
        raise RuntimeError("simulated crash before manifest commit")

    monkeypatch.setattr(NI, "_commit_manifest", dying_commit)
    with pytest.raises(RuntimeError, match="simulated crash"):
        dedup_index_append(idx, delta)
    # the readable index is untouched: old epoch, doc 2 invisible
    cur = idx.resolve(spark)
    assert cur.epoch == e0
    assert {r.doc_id for r in cur.sizes.read(spark).collect()} == {1}

    # the replay: anti-join does NOT skip doc 2 (not in the CURRENT
    # epoch's sizes), the orphan epoch is cleared and rebuilt
    monkeypatch.setattr(NI, "_commit_manifest", real_commit)
    dedup_index_append(idx, delta)
    cur = idx.resolve(spark)
    assert cur.epoch == e0 + 1
    sh = cur.shingles.read(spark)
    assert sh.count() == sh.distinct().count()          # no dup rows
    sizes = {r.doc_id: r.n_shingles
             for r in cur.sizes.read(spark).collect()}
    n2 = sh.filter(F.col("doc_id") == 2).count()
    assert sizes[2] == n2 and n2 > 0
    # probe of an exact clone of doc 2 reports jacc exactly 1e6 —
    # doubled shingle rows would have inflated the intersection
    clone = spark.createDataFrame(
        [(99, "one two three four five six seven eight")],
        "doc_id long, text string",
    )
    hits = {(r.corpus_id, r.jacc_ppm)
            for r in neardup_probe(clone, idx, 500_000).collect()}
    assert hits == {(2, 1_000_000)}


def test_index_epoch_atomic_refresh(spark):
    """Atomic-commit semantics under the LSM segment design: a
    reader probing DURING a refresh sees the entirely-old or
    entirely-new committed SEGMENT SET, never a mix — proven by the
    segment tag carried in every member row (a resolved handle
    serves exactly its declared ``segments``). A probe plan
    resolved BEFORE an append still executes against the pure old
    segment set after the append commits (previous epoch retained
    for lazy readers); appends grow the segment list by exactly the
    batch; compaction folds to one segment and — one commit later —
    the pre-fold segments are garbage-collected."""
    from ods_v3_dbt_spark.operators.neardup_index import (
        EPOCH_COL,
        dedup_index_append,
        dedup_index_compact,
        dedup_index_write,
        neardup_probe,
    )
    from ods_v3_dbt_spark.sinks import _warehouse_path

    base = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    d2 = spark.createDataFrame(
        [(2, "one two three four five six seven eight")],
        "doc_id long, text string",
    )
    d3 = spark.createDataFrame(
        [(3, "red orange yellow green blue indigo violet")],
        "doc_id long, text string",
    )
    idx = dedup_index_write(base, "t_epoch_idx", num_buckets=2)

    def tags(resolved, part):
        return {
            r[0]
            for r in getattr(resolved, part).read(spark)
            .select(EPOCH_COL).distinct().collect()
        }

    r1 = idx.resolve(spark)
    e0 = r1.epoch  # persists across pytest sessions — relative asserts
    assert r1.segments == [e0]
    # a reader's lazy plan, resolved pre-refresh
    clone2 = spark.createDataFrame(
        [(99, "one two three four five six seven eight")],
        "doc_id long, text string",
    )
    pre_plan = neardup_probe(clone2, idx, 500_000)
    assert pre_plan.count() == 0          # doc 2 not in the base epoch

    dedup_index_append(idx, d2)           # commit epoch e0+1 mid-"probe"

    # 1) the pre-refresh plan still reads the PURE old segment set
    assert pre_plan.count() == 0
    for part in ("fps", "shingles", "sizes"):
        assert tags(r1, part) == {e0}, part
    # 2) a post-commit resolve serves exactly the committed segment
    #    set: base segment + the O(batch) delta segment
    r2 = idx.resolve(spark)
    assert r2.epoch == e0 + 1
    assert r2.segments == [e0, e0 + 1]
    for part in ("fps", "shingles", "sizes"):
        assert tags(r2, part) == {e0, e0 + 1}, part
    hits = {(r.corpus_id, r.jacc_ppm)
            for r in neardup_probe(clone2, idx, 500_000).collect()}
    assert hits == {(2, 1_000_000)}
    # 3) LSM retention: base segments stay LIVE across appends (no
    #    corpus rewrite) — only compaction retires them, and even
    #    then the pre-fold segments survive one commit as the
    #    previous epoch's set before GC
    wh = _warehouse_path(spark)
    dedup_index_append(idx, d3)           # epoch e0+2, segments +[e0+2]
    r3 = idx.resolve(spark)
    assert r3.segments == [e0, e0 + 1, e0 + 2]
    assert (wh / f"t_epoch_idx__e{e0}_shingles").is_dir()
    dedup_index_compact(idx, spark)       # epoch e0+3, segments [e0+3]
    r4 = idx.resolve(spark)
    assert r4.segments == [e0 + 3]
    for part in ("fps", "shingles", "sizes"):
        assert tags(r4, part) == {e0 + 3}, part
    # pre-fold segments retained for lazy readers of the prev epoch …
    assert (wh / f"t_epoch_idx__e{e0}_shingles").is_dir()
    assert {r.doc_id for r in r3.sizes.read(spark).collect()} == {1, 2, 3}
    # … and collected after the NEXT commit
    d4 = spark.createDataFrame(
        [(4, "do re mi fa sol la ti high")], "doc_id long, text string"
    )
    dedup_index_append(idx, d4)           # epoch e0+4, segments [e0+3, e0+4]
    assert not (wh / f"t_epoch_idx__e{e0}_shingles").is_dir()
    assert (wh / f"t_epoch_idx__e{e0 + 3}_shingles").is_dir()
    # probes see the full corpus through every reshape
    hits = {(r.corpus_id, r.jacc_ppm)
            for r in neardup_probe(clone2, idx, 500_000).collect()}
    assert hits == {(2, 1_000_000)}


def test_index_append_writes_batch_sized_delta(spark, corpus):
    """The round-6 lead criterion: an append's I/O is O(batch), not
    O(corpus) — the new segment's member tables hold ONLY the
    batch's rows (the corpus segments are untouched on disk), for
    both index flavors. Verified by row accounting: every member
    row tagged with the new epoch derives from the batch, and the
    base segment's row counts are unchanged."""
    from pyspark.sql import functions as F

    from ods_v3_dbt_spark.operators.neardup_index import (
        EPOCH_COL,
        dedup_index_append,
        dedup_index_write,
        lsh_index_append,
        lsh_index_write,
    )

    base = corpus.filter(F.col("doc_id") % 2 == 0)
    delta = corpus.filter(
        (F.col("doc_id") % 2 == 1) & (F.col("doc_id") < 10000)
    )
    n_delta = delta.count()
    n_base = base.count()

    for flavor, write, append in (
        ("exact", dedup_index_write, dedup_index_append),
        ("lsh", lsh_index_write, lsh_index_append),
    ):
        idx = write(base, f"t_obatch_{flavor}", num_buckets=4)
        e_base = idx.resolve(spark).epoch
        base_sizes = idx.resolve(spark).sizes.read(spark).count()
        assert base_sizes == n_base
        append(idx, delta)
        cur = idx.resolve(spark)
        assert cur.segments == [e_base, e_base + 1]
        # the delta segment carries exactly the batch's docs …
        delta_sizes = cur.sizes.read(spark).filter(
            F.col(EPOCH_COL) == e_base + 1
        )
        assert delta_sizes.count() == n_delta
        # … and the base segment's member tables were not rewritten:
        # same physical table (epoch tag) and same row count
        assert cur.sizes.read(spark).filter(
            F.col(EPOCH_COL) == e_base
        ).count() == n_base
        # shingle member: every new-epoch row belongs to a delta doc
        delta_ids = {r.doc_id for r in delta.select("doc_id").collect()}
        new_sh_ids = {
            r.doc_id
            for r in cur.shingles.read(spark)
            .filter(F.col(EPOCH_COL) == e_base + 1)
            .select("doc_id").distinct().collect()
        }
        assert new_sh_ids <= delta_ids and new_sh_ids


def test_index_append_compacts_at_threshold(spark):
    """``compact_after`` bounds the live segment count: the append
    that would exceed it folds everything into ONE segment instead,
    and probe results are identical across the fold."""
    from ods_v3_dbt_spark.operators.neardup_index import (
        dedup_index_append,
        dedup_index_write,
        neardup_probe,
    )

    docs = [
        (i, t)
        for i, t in enumerate(
            [
                "alpha beta gamma delta epsilon zeta",
                "one two three four five six seven",
                "red orange yellow green blue indigo",
                "do re mi fa sol la ti",
                "north south east west up down around",
            ]
        )
    ]

    def df(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    idx = dedup_index_write(df(docs[:1]), "t_compact_idx", num_buckets=2,
                            compact_after=3)
    e0 = idx.resolve(spark).epoch
    dedup_index_append(idx, df(docs[1:2]))
    dedup_index_append(idx, df(docs[2:3]))
    assert idx.resolve(spark).segments == [e0, e0 + 1, e0 + 2]
    probe = df([(99, docs[3][1])])
    dedup_index_append(idx, df(docs[3:4]))      # 4th segment → fold
    cur = idx.resolve(spark)
    assert cur.segments == [e0 + 3]
    assert {r.doc_id for r in cur.sizes.read(spark).collect()} == {0, 1, 2, 3}
    hits = {(r.corpus_id, r.jacc_ppm)
            for r in neardup_probe(probe, idx, 500_000).collect()}
    assert hits == {(3, 1_000_000)}
    # and the fold participates in normal retention: next append is
    # a delta on top of the folded base
    dedup_index_append(idx, df(docs[4:5]))
    assert idx.resolve(spark).segments == [e0 + 3, e0 + 4]


def test_index_pinned_epoch_survives_refreshes(spark):
    """Round-6 verdict task 4: an epoch protected by
    ``set_index_pin`` stays resolvable and readable across MANY
    subsequent refreshes — including a compaction — until the pin
    is released, after which its segments are collectible again."""
    import pytest as _pytest

    from ods_v3_dbt_spark.operators.neardup_index import (
        dedup_index_append,
        dedup_index_compact,
        dedup_index_write,
        set_index_pin,
    )

    def df(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    idx = dedup_index_write(
        df([(1, "alpha beta gamma delta epsilon zeta")]),
        "t_pin_idx", num_buckets=2, compact_after=3,
    )
    e0 = idx.resolve(spark).epoch
    set_index_pin(spark, "t_pin_idx", "reader-a", [e0])
    texts = [
        "one two three four five six seven",
        "red orange yellow green blue indigo",
        "do re mi fa sol la ti",
        "north south east west up down around",
        "cold warm hot cool mild freezing melting",
    ]
    for i, t in enumerate(texts):
        dedup_index_append(idx, df([(10 + i, t)]))
    # five refreshes later (including the compact_after fold), the
    # pinned epoch still resolves and reads its exact original state
    pinned = idx.resolve(spark, epoch=e0)
    assert pinned.segments == [e0]
    assert {r.doc_id for r in pinned.sizes.read(spark).collect()} == {1}
    # release → the next commit collects it
    set_index_pin(spark, "t_pin_idx", "reader-a", None)
    dedup_index_compact(idx, spark)
    dedup_index_append(idx, df([(99, "whiskey tango foxtrot over and out")]))
    with _pytest.raises(FileNotFoundError):
        idx.resolve(spark, epoch=e0)


def test_neardup_probe_hot_shingle_cap(spark):
    """max_corpus_df (the exact path's hot-shingle guard): a batch
    doc related to a corpus doc ONLY through a boilerplate shingle
    shared corpus-wide is not emitted under the cap, while a genuine
    near-dup pair still surfaces (its jacc may only DECREASE —
    conservative lower bound, denominators keep full sizes)."""
    from ods_v3_dbt_spark.operators.neardup_index import (
        dedup_index_write,
        neardup_probe,
    )

    boiler = "click here to subscribe"  # 3 shingles, in docs 1-3
    corpus = spark.createDataFrame(
        [
            (1, f"alpha beta gamma delta epsilon zeta {boiler}"),
            (2, f"one two three four five six {boiler}"),
            (3, f"red orange yellow green blue indigo {boiler}"),
            # corpus doc WITHOUT the boilerplate — the pair that
            # exposes a shrunken batch denominator (advisor round-4):
            # a batch near-dup of THIS doc carries hot shingles the
            # doc lacks, so inter is unchanged by the cap while a
            # buggy post-filter size_batch would inflate jacc above
            # its true (uncapped) value
            (4, "sun moon star comet nebula quasar"),
        ],
        "doc_id long, text string",
    )
    idx = dedup_index_write(corpus, "t_hotcap_idx", num_buckets=2)
    batch = spark.createDataFrame(
        [
            # genuine near-dup of 1 (shares its content shingles)
            (10, f"alpha beta gamma delta epsilon zeta {boiler} tail"),
            # unrelated content, only the boilerplate in common
            (11, f"totally different words here entirely {boiler}"),
            # near-dup of 4, plus boilerplate the corpus doc lacks
            (12, f"sun moon star comet nebula quasar {boiler}"),
        ],
        "doc_id long, text string",
    )
    uncapped = {(r.doc_id, r.corpus_id)
                for r in neardup_probe(batch, idx, 100_000).collect()}
    capped_rows = neardup_probe(batch, idx, 100_000, max_corpus_df=2).collect()
    capped = {(r.doc_id, r.corpus_id) for r in capped_rows}
    # uncapped: doc 11 pairs with every corpus doc through boilerplate
    assert (11, 2) in uncapped and (11, 3) in uncapped
    # capped: boilerplate shingles (df=3 > 2) stop creating pairs
    assert all(d != 11 for d, _ in capped)
    # the genuine near-dups survive the cap
    assert (10, 1) in capped and (12, 4) in capped
    # capped jacc never exceeds the uncapped value for ANY emitted
    # pair — the lower-bound guarantee. (12, 4) is the load-bearing
    # case: its inter has no hot shingles, so any inflation can only
    # come from a wrongly-shrunken size_batch.
    unc_j = {(r.doc_id, r.corpus_id): r.jacc_ppm
             for r in neardup_probe(batch, idx, 100_000).collect()}
    cap_j = {(r.doc_id, r.corpus_id): r.jacc_ppm for r in capped_rows}
    for pair, j in cap_j.items():
        assert j <= unc_j[pair], pair
    # doc 12 carries zero hot shingles in its intersection with 4:
    # capped jacc must EQUAL the exact value, not merely bound it
    assert cap_j[(12, 4)] == unc_j[(12, 4)]


# ---------------------------------------------------------------------------
# Retrieval: BM25 + priority sampling (round 5)
# ---------------------------------------------------------------------------


def test_bm25_modes_and_semantics(spark):
    """BM25 operator semantics: more occurrences of the query term →
    higher score at equal length; longer docs are penalized at equal
    tf; the production ln-idf mode agrees with the oracle-checkable
    rational mode on single-term RANKING (idf is a per-term constant
    — any monotone transform preserves the ordering)."""
    from ods_v3_dbt_spark.operators.retrieval import bm25_scores, bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "spark spark spark filler filler filler"),   # tf=3, dl=6
            (2, "spark filler filler filler filler filler"), # tf=1, dl=6
            (3, "spark spark spark filler filler filler "
                "pad pad pad pad pad pad"),                  # tf=3, dl=12
            (4, "no match here at all whatsoever ok"),       # tf=0
        ],
        "doc_id long, text string",
    )
    for mode in ("rational", "ln"):
        s = {r.doc_id: r.score
             for r in bm25_scores(docs, ["spark"], mode=mode).collect()}
        assert set(s) == {1, 2, 3}              # non-matching doc absent
        assert s[1] > s[2]                      # tf monotone
        assert s[1] > s[3]                      # length penalty
        assert all(v > 0 for v in s.values())
    rat = [r.doc_id for r in bm25_topk(docs, ["spark"], k=3).collect()]
    ln = [r.doc_id
          for r in bm25_topk(docs, ["spark"], k=3, mode="ln").collect()]
    assert rat == ln                            # single-term rank equality

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown bm25 mode"):
        bm25_scores(docs, ["spark"], mode="cosine")


def test_priority_sample_weighted_determinism(spark):
    """Priority sampling: deterministic across runs (the md5-derived
    u is rank-by-definition), an overwhelming weight always wins
    rank 1, and the sample is exactly k rows without replacement."""
    from pyspark.sql import functions as F

    from ods_v3_dbt_spark.operators.retrieval import priority_sample

    base = spark.range(200).select(
        F.col("id").alias("doc_id"), F.lit(10).alias("w")
    )
    heavy = spark.createDataFrame([(999, 10_000_000_000)], "doc_id long, w long")
    df = base.unionByName(heavy)
    s1 = [(r.rank, r.doc_id) for r in priority_sample(df, "w", 20).collect()]
    s2 = [(r.rank, r.doc_id) for r in priority_sample(df, "w", 20).collect()]
    assert s1 == s2 and len(s1) == 20
    assert s1[0][1] == 999                      # heavy item always sampled
    assert len({d for _, d in s1}) == 20        # without replacement
    # a different seed reshuffles the equal-weight tail
    s3 = [r.doc_id for r in priority_sample(df, "w", 20, seed="other").collect()]
    assert s3[0] == 999 and s3 != [d for _, d in s1]


def test_repetition_signals_short_docs_get_rows(spark):
    """Round-6 advisor (text.py:215): docs with fewer than 2 (bigram)
    or 3 (trigram) tokens must still get their signal row — missing
    gram slots mean zero repetition evidence (0 ppm), not a silently
    missing row that bypasses the Gopher cuts downstream."""
    from ods_v3_dbt_spark.functions.text import repetition_signals

    docs = spark.createDataFrame(
        [
            (1, "solo"),                       # 1 token: no bigrams/trigrams
            (2, "two words"),                  # 2 tokens: no trigrams
            (3, "three total tokens"),         # 3 tokens: one trigram
            (4, "spam spam spam spam spam"),   # degenerate repeater
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_signals(docs).collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[1].top_token_ppm == 1_000_000
    assert rows[1].top_bigram_ppm == 0 and rows[1].dup_trigram_ppm == 0
    assert rows[2].top_bigram_ppm == 1_000_000 and rows[2].dup_trigram_ppm == 0
    assert rows[3].dup_trigram_ppm == 0       # single trigram, no dup
    assert rows[4].top_token_ppm == 1_000_000
    assert rows[4].dup_trigram_ppm == 1_000_000


def test_bm25_index_probe_equals_scan(spark, corpus):
    """Indexed BM25 (operators/text_index.py) must return BIT-
    IDENTICAL top-k to the scan path over the same corpus — through
    a build + LSM append (so index maintenance preserves tf, df,
    dl, and the collection stats exactly), for both idf modes."""
    from ods_v3_dbt_spark.operators.retrieval import bm25_topk
    from ods_v3_dbt_spark.operators.text_index import (
        bm25_index_append,
        bm25_index_topk,
        bm25_index_write,
    )

    docs = corpus.select("doc_id", "text")
    terms = ["merge", "scan", "window"]
    idx = bm25_index_write(
        docs.filter(F.col("doc_id") % 2 == 0), "t_bm25_idx", num_buckets=4
    )
    bm25_index_append(idx, docs.filter(F.col("doc_id") % 2 == 1))
    for mode in ("rational", "ln"):
        scan = [tuple(r) for r in
                bm25_topk(docs, terms, k=15, mode=mode).collect()]
        indexed = [tuple(r) for r in
                   bm25_index_topk(spark, idx, terms, k=15, mode=mode)
                   .collect()]
        assert indexed == scan and indexed, mode


def test_bm25_index_append_is_batch_sized(spark, corpus):
    """The BM25 index inherits the LSM contract: an append writes
    only the batch's postings/doclen rows as a delta segment; the
    base segment is untouched."""
    from ods_v3_dbt_spark.operators.text_index import (
        EPOCH_COL,
        bm25_index_append,
        bm25_index_write,
    )

    docs = corpus.select("doc_id", "text")
    base = docs.filter(F.col("doc_id") % 2 == 0)
    delta = docs.filter(F.col("doc_id") % 2 == 1)
    idx = bm25_index_write(base, "t_bm25_obatch", num_buckets=4)
    e0 = idx.resolve(spark).epoch
    n_base = base.count()
    bm25_index_append(idx, delta)
    cur = idx.resolve(spark)
    assert cur.segments == [e0, e0 + 1]
    dl = cur.doclen.read(spark)
    assert dl.filter(F.col(EPOCH_COL) == e0).count() == n_base
    assert dl.filter(F.col(EPOCH_COL) == e0 + 1).count() == delta.count()
    # replay is a no-op (anti-join fast path)
    bm25_index_append(idx, delta)
    assert idx.resolve(spark).epoch == e0 + 1


def test_window_and_phrase_contains(spark):
    """Positional predicates: contiguous phrase vs N-token window
    co-occurrence, pinned against hand-computed expectations
    (including the short-doc and trailing-span edges)."""
    from ods_v3_dbt_spark.operators.retrieval import (
        phrase_contains,
        window_contains,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha merge scan beta"),            # phrase "merge scan"
            (2, "merge alpha beta gamma scan"),      # within 5, not phrase
            (3, "merge " + "x " * 20 + "scan"),      # far apart
            (4, "scan merge"),                       # reversed order
            (5, "merge"),                            # shorter than phrase
            (6, ""),                                 # empty text
        ],
        "doc_id long, text string",
    )
    ph = {r.doc_id for r in docs.filter(
        phrase_contains(F.col("text"), ["merge", "scan"])).collect()}
    assert ph == {1}
    w5 = {r.doc_id for r in docs.filter(
        window_contains(F.col("text"), ["merge", "scan"], 5)).collect()}
    assert w5 == {1, 2, 4}          # window is unordered co-occurrence
    w30 = {r.doc_id for r in docs.filter(
        window_contains(F.col("text"), ["merge", "scan"], 30)).collect()}
    assert w30 == {1, 2, 3, 4}


def test_knn_graph_blocking_invariance(spark, emb):
    """The blocked sqrt-decomposition self-join must be INVISIBLE in
    the result: any block count gives the identical exact graph
    (including num_blocks=1 — the single-task degenerate), and no
    row ever lists itself as a neighbor."""
    g1 = {tuple(r) for r in
          SIM.knn_graph(emb, k=4, num_blocks=1).collect()}
    g4 = {tuple(r) for r in
          SIM.knn_graph(emb, k=4, num_blocks=4).collect()}
    g7 = {tuple(r) for r in
          SIM.knn_graph(emb, k=4, num_blocks=7).collect()}
    assert g1 == g4 == g7 and g1
    assert all(q != n for (q, n, _, _) in g1)


# ---------------------------------------------------------------------------
# Round-6 late additions: RRF fusion, retrieval eval, int8 quant, PPR
# ---------------------------------------------------------------------------


def test_rrf_fuse_hand_case(spark):
    """Exact integer contributions on a hand-computed two-list case:
    doc 1 (rank 1 + rank 2) beats doc 2 (rank 2 + rank 1)? No — they
    tie in score and break on id; doc 3 (one list only) trails."""
    from ods_v3_dbt_spark.operators.retrieval import rrf_fuse

    l1 = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id int, rank int")
    l2 = spark.createDataFrame([(2, 1), (1, 2)], "doc_id int, rank int")
    out = {r.doc_id: r for r in rrf_fuse([l1, l2], k0=60, k=10).collect()}
    c = lambda r: 1000000 // (60 + r)
    assert out[1].rrf_micro == c(1) + c(2) and out[1].n_lists == 2
    assert out[2].rrf_micro == c(2) + c(1) and out[2].n_lists == 2
    assert out[3].rrf_micro == c(3) and out[3].n_lists == 1
    # equal fused scores tie-break on id: doc 1 ranks 1, doc 2 ranks 2
    assert out[1].rank == 1 and out[2].rank == 2 and out[3].rank == 3


def test_retrieval_eval_no_relevant_in_topk(spark):
    from ods_v3_dbt_spark.operators.retrieval import retrieval_eval_binary

    ranked = spark.createDataFrame([(1, 10), (2, 20)], "rank int, doc_id int")
    rel = spark.createDataFrame([(99,)], "doc_id int")
    r = retrieval_eval_binary(ranked, rel, k=10).collect()[0]
    assert r.mrr_micro == 0 and r.hits_at_k == 0
    assert r.precision_at_k_ppm == 0 and r.recall_at_k_ppm == 0
    assert r.n_relevant == 1


def test_retrieval_eval_exact_fractions(spark):
    from ods_v3_dbt_spark.operators.retrieval import retrieval_eval_binary

    ranked = spark.createDataFrame(
        [(r, r * 100) for r in range(1, 11)], "rank int, doc_id int"
    )
    rel = spark.createDataFrame([(300,), (700,), (9999,)], "doc_id int")
    r = retrieval_eval_binary(ranked, rel, k=10).collect()[0]
    assert r.mrr_micro == 1000000 // 3  # first relevant at rank 3
    assert r.hits_at_k == 2 and r.n_relevant == 3
    assert r.precision_at_k_ppm == 200000
    assert r.recall_at_k_ppm == 666666


def test_int8_quant_bounds_and_zero_vector(spark):
    """q8 stays in int8 range and the reconstruction error obeys the
    floor-quantization bound err ≤ scale//127 + 1; a zero vector
    declares scale 1 with zero error."""
    import pyspark.sql.functions as F
    from ods_v3_dbt_spark.operators.similarity import int8_quantize_stats

    rows = [
        (1, [1.0, -1.0, 0.5, -0.25]),
        (2, [0.0, 0.0, 0.0, 0.0]),
        (3, [2.5, -0.001, 0.003, 1.999]),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    out = {r.vec_id: r for r in int8_quantize_stats(df).collect()}
    assert out[2].scale == 1 and out[2].sum_abs_err == 0
    for vid, r in out.items():
        assert r.max_abs_err <= r.scale // 127 + 1
        assert r.sum_sq_err >= r.max_abs_err * r.max_abs_err * (0 if r.max_abs_err == 0 else 1)
    # explicit q8 range audit on the largest-magnitude vector
    v = [round(x * 1000) for x in rows[2][1]]
    scale = max(1, max(abs(x) for x in v))
    import math
    q8s = [math.floor(x * 127 / scale) for x in v]
    assert all(-128 <= q <= 127 for q in q8s)


def test_personalized_pagerank_hand_replay(spark):
    """Two-node cycle, seed {A}: hand-replayed two rounds of the
    seeded integer recurrence."""
    from ods_v3_dbt_spark.operators.graph import pagerank_int

    edges = spark.createDataFrame([(0, 1), (1, 0)], "src int, dst int")
    seeds = spark.createDataFrame([(0,)], "node int")
    pr = {r.node: r.pr for r in
          pagerank_int(edges, iterations=2, seeds=seeds).collect()}
    # pr0: A=1e6, B=0
    # r1:  A = 150000 + 850000*0        = 150000
    #      B = 0      + 850000*1e6/1e6  = 850000
    # r2:  A = 150000 + 850000*850000 div 1e6 = 872500
    #      B = 0      + 850000*150000 div 1e6 = 127500
    assert pr == {0: 872500, 1: 127500}


def test_personalized_pagerank_seedless_equals_global(spark):
    """seeds=None must preserve the original global recurrence."""
    from ods_v3_dbt_spark.operators.graph import pagerank_int

    edges = spark.createDataFrame(
        [(i, (3 * i + 1) % 10) for i in range(10)]
        + [(i, (7 * i + 3) % 10) for i in range(10)],
        "src int, dst int",
    )
    allseed = spark.createDataFrame([(i,) for i in range(10)], "node int")
    a = {r.node: r.pr for r in pagerank_int(edges, iterations=3).collect()}
    b = {r.node: r.pr for r in
         pagerank_int(edges, iterations=3, seeds=allseed).collect()}
    assert a == b


# ---------------------------------------------------------------------------
# Round 6 session 2: containment, line dedup rebuild, bigram-LM surprisal
# ---------------------------------------------------------------------------

def test_containment_catches_what_jaccard_misses(spark):
    """A short doc pasted into a long one: containment fires at 1.0
    while the pair Jaccard sits below the 0.5/0.6 near-dup gates."""
    from ods_v3_dbt_spark.operators.dedup import shingle_containment_pairs

    short = "alpha beta gamma delta epsilon zeta eta theta"
    filler = " ".join(f"pad{i}" for i in range(12))
    rows = [(1, short), (2, f"{filler} {short}")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = shingle_containment_pairs(df, shingle_n=5, threshold_ppm=800000)
    got = {(r.contained_id, r.container_id): (r.containment_ppm, r.jacc_ppm)
           for r in out.collect()}
    assert (1, 2) in got
    cont, jacc = got[(1, 2)]
    assert cont == 1000000          # every shingle of doc 1 is in doc 2
    assert jacc < 500000            # below every near-dup threshold
    assert (2, 1) not in got        # direction matters: 2 ⊄ 1


def test_containment_direction_is_asymmetric(spark):
    from ods_v3_dbt_spark.operators.dedup import shingle_containment_pairs

    text = "a b c d e f g h i j"
    df = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    )
    out = shingle_containment_pairs(df, shingle_n=5, threshold_ppm=800000)
    got = {(r.contained_id, r.container_id) for r in out.collect()}
    # identical docs contain each other — BOTH directions emitted
    assert got == {(1, 2), (2, 1)}


def test_line_dedup_rebuild_reconstruction(spark):
    """The rebuilt-text md5 must equal a hand reconstruction: header
    and footer (df = corpus) cut, unique content lines kept in order."""
    import hashlib

    from ods_v3_dbt_spark.plans.llm_queries import (
        _FOOTER_LINE,
        _HEADER_LINE,
        line_dedup_rebuild,
    )

    out = {
        r.doc_id: r
        for r in line_dedup_rebuild(spark, "/root/testdata/sf0.001").collect()
    }
    assert out, "empty result"
    # pick a base doc and recompute its cleaned text by hand
    import pyarrow.parquet as pq

    tbl = pq.read_table("/root/testdata/sf0.001/documents.parquet").to_pydict()
    docs = dict(zip(tbl["doc_id"], tbl["text"]))
    doc_id, text = next(iter(sorted(docs.items())))
    w = [t for t in text.strip().lower().split()]
    content = [" ".join(w[j * 12:(j + 1) * 12]) for j in range((len(w) - 1) // 12 + 1)]
    # content lines of a %10==0 doc also live in its +10000 exact copy
    # (df 2-3 < 10) so every content line survives; header/footer go
    rebuilt = "\n".join(content)
    r = out[doc_id]
    assert r.n_lines == len(content) + 2
    assert r.n_kept == len(content)
    assert r.removed_chars == len(_HEADER_LINE) + len(_FOOTER_LINE)
    assert r.cleaned_md5 == hashlib.md5(rebuilt.encode()).hexdigest()


def test_bigram_lm_surprisal_hand_case(spark):
    """Hand-checked tiny LM: train 'a b a b', score 'a b' and 'a z'."""
    from ods_v3_dbt_spark.plans import declared_queries as DQ
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        df = spark.createDataFrame(
            [(1, "a b a b a c"), (2, "x y x y x y"), (3, "a b x q")],
            "doc_id long, text string",
        )
        df.coalesce(1).write.parquet(os.path.join(td, "documents.parquet"))
        from ods_v3_dbt_spark.plans.llm_queries import bigram_lm_surprisal

        rows = {r.doc_id: r for r in bigram_lm_surprisal(spark, td).collect()}
        # train = docs 1,2 (doc_id %3 != 0) ; score = doc 3
        # train bigrams: (a,b)x2 (b,a)x2 (a,c)x1 (x,y)x3 (y,x)x2
        # c1: a=3, b=2, x=3, y=2 ; V = |{a,b,c,x,y}| + 1 = 6
        # doc 3 bigrams: (a,b): p=(2+1)/(3+6)=1/3 → inv=3 → bits=1
        #   (b,x): c2=0,c1(b)=2 → p=1/8 → inv=8 → bits=3
        #   (x,q): c2=0,c1(x)=3 → p=1/9 → inv=9 → bits=3
        r = rows[3]
        assert r.n_bigrams == 3
        assert r.sum_bits == 1 + 3 + 3
        assert r.mean_mbits == (7 * 1000) // 3
        assert r.unseen_ppm == (2 * 1000000) // 3
        assert set(rows) == {3}


# ---------------------------------------------------------------------------
# Persisted IVF index
# ---------------------------------------------------------------------------

def _ivf_parts(spark, idx):
    from ods_v3_dbt_spark.operators import vector_index as VI

    cur = idx.resolve(spark)
    return cur, VI


def test_ivf_index_probe_equals_scan(spark, emb):
    """An index built whole (no split) must serve byte-identical
    top-k to the scan-path ivf_topk_l2q over the same corpus."""
    from ods_v3_dbt_spark.operators.similarity import ivf_topk_l2q
    from ods_v3_dbt_spark.operators.vector_index import (
        ivf_index_topk,
        ivf_index_write,
    )

    q = emb.filter(F.col("vec_id") < 10)
    c = emb.filter(F.col("vec_id") >= 10)
    idx = ivf_index_write(c, "t_ivf_whole", num_cells=8, num_buckets=4)
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.dist2)
        for r in ivf_index_topk(spark, idx, q, k=5, nprobe=3).collect()
    }
    want = {
        (r.query_id, r.rank): (r.neighbor_id, r.dist2)
        for r in ivf_topk_l2q(c, q, k=5, num_cells=8, nprobe=3).collect()
    }
    assert got == want


def test_ivf_index_append_is_batch_sized_and_idempotent(spark, emb):
    """The delta segment holds exactly the new vectors (O(batch), not
    O(corpus)); a full replay appends nothing; appended index equals
    a whole rebuild's probe output."""
    from ods_v3_dbt_spark.operators.vector_index import (
        ivf_index_append,
        ivf_index_topk,
        ivf_index_write,
    )

    q = emb.filter(F.col("vec_id") < 10)
    c = emb.filter(F.col("vec_id") >= 10)
    base = c.filter(F.col("vec_id") % 4 != 0)
    batch = c.filter(F.col("vec_id") % 4 == 0)
    idx = ivf_index_write(base, "t_ivf_split", num_cells=8, num_buckets=4)
    cur0 = idx.resolve(spark)
    assert len(cur0.segments) == 1
    ivf_index_append(idx, batch)
    cur1 = idx.resolve(spark)
    assert len(cur1.segments) == 2
    # delta segment row count == batch size (O(batch) writes)
    delta = cur1.assign.tables[-1].read(spark)
    assert delta.count() == batch.count()
    # replay: nothing new → same epoch
    ivf_index_append(idx, batch)
    assert idx.resolve(spark).epoch == cur1.epoch
    # centroids are frozen: both segments carry identical copies
    c0 = sorted(map(tuple, (r.v for r in
                cur1.centroids.tables[0].read(spark).collect())))
    c1 = sorted(map(tuple, (r.v for r in
                cur1.centroids.tables[1].read(spark).collect())))
    assert c0 == c1


def test_ivf_index_append_compacts_at_threshold(spark, emb):
    """compact_after bounds live segments: the fold unions the
    vid-disjoint lists into ONE segment, probe output unchanged."""
    from ods_v3_dbt_spark.operators.vector_index import (
        ivf_index_append,
        ivf_index_topk,
        ivf_index_write,
    )

    q = emb.filter(F.col("vec_id") < 10)
    c = emb.filter(F.col("vec_id") >= 10)
    idx = ivf_index_write(
        c.filter(F.col("vec_id") % 4 == 1), "t_ivf_cmp",
        num_cells=8, num_buckets=4, compact_after=2,
    )
    before = None
    for m in (2, 3, 0):
        ivf_index_append(idx, c.filter(F.col("vec_id") % 4 == m))
    cur = idx.resolve(spark)
    # 1 base + appends folded: segment count bounded by compact_after
    assert len(cur.segments) <= 2
    got = {
        (r.query_id, r.rank): r.neighbor_id
        for r in ivf_index_topk(spark, idx, q, k=5, nprobe=3).collect()
    }
    # full corpus indexed: assignment total matches corpus count
    assert cur.assign.read(spark).count() == c.count()
    assert len(got) > 0


def test_ivf_index_pinned_epoch_survives_appends(spark, emb):
    """The pin protocol extends to the IVF kind: an epoch-pinned
    resolve stays readable (and probe-able) across multiple appends
    that would otherwise GC it."""
    from ods_v3_dbt_spark.operators.neardup_index import set_index_pin
    from ods_v3_dbt_spark.operators.vector_index import (
        ivf_index_append,
        ivf_index_topk,
        ivf_index_write,
    )

    q = emb.filter(F.col("vec_id") < 10)
    c = emb.filter(F.col("vec_id") >= 10)
    idx = ivf_index_write(
        c.filter(F.col("vec_id") % 4 == 1), "t_ivf_pin",
        num_cells=8, num_buckets=4,
    )
    e0 = idx.resolve(spark).epoch
    set_index_pin(spark, idx.name, "t_reader", [e0])
    try:
        base_top = {
            (r.query_id, r.rank): r.neighbor_id
            for r in ivf_index_topk(spark, idx, q, k=3, nprobe=8,
                                    epoch=e0).collect()
        }
        for m in (2, 3, 0):
            ivf_index_append(idx, c.filter(F.col("vec_id") % 4 == m))
        assert idx.resolve(spark).epoch == e0 + 3
        # the pinned epoch still resolves AND probes identically
        again = {
            (r.query_id, r.rank): r.neighbor_id
            for r in ivf_index_topk(spark, idx, q, k=3, nprobe=8,
                                    epoch=e0).collect()
        }
        assert again == base_top
    finally:
        set_index_pin(spark, idx.name, "t_reader", None)


def test_ivf_index_full_probe_is_exact(spark, emb):
    """nprobe = num_cells degrades IVF to exact search: the probe
    must return the brute-force L2 top-k (recall 1.0 by identity,
    not approximation)."""
    from ods_v3_dbt_spark.operators.similarity import quantize_embedding
    from ods_v3_dbt_spark.operators.vector_index import (
        ivf_index_topk,
        ivf_index_write,
    )

    q = emb.filter(F.col("vec_id") < 10)
    c = emb.filter(F.col("vec_id") >= 10)
    idx = ivf_index_write(c, "t_ivf_exact", num_cells=8, num_buckets=4)
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.dist2)
        for r in ivf_index_topk(spark, idx, q, k=5, nprobe=8).collect()
    }
    # brute force: exact integer L2^2 over the full corpus
    qd = q.select(F.col("vec_id").alias("query_id"),
                  quantize_embedding(F.col("embedding")).alias("qv"))
    cd = c.select(F.col("vec_id").alias("neighbor_id"),
                  quantize_embedding(F.col("embedding")).alias("cv"))
    d2 = F.aggregate(
        F.zip_with(F.col("qv"), F.col("cv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"), lambda acc, x: acc + x,
    )
    from pyspark.sql import Window
    w = Window.partitionBy("query_id").orderBy("d2", "neighbor_id")
    brute = (
        cd.crossJoin(qd).withColumn("d2", d2)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
    )
    want = {
        (r.query_id, r.rank): (r.neighbor_id, r.d2) for r in brute.collect()
    }
    assert got == want


def test_bm25_index_compact_preserves_scores(spark, corpus):
    """Explicit compaction folds segments to one; scores (df partials
    re-aggregated, stats re-summed) are unchanged."""
    from ods_v3_dbt_spark.operators.text_index import (
        bm25_index_compact,
        bm25_index_append,
        bm25_index_topk,
        bm25_index_write,
    )

    docs = corpus.select("doc_id", "text")
    idx = bm25_index_write(
        docs.filter(F.col("doc_id") % 3 == 0), "t_bm25_cmpx", num_buckets=4,
        compact_after=99,
    )
    for m in (1, 2):
        bm25_index_append(idx, docs.filter(F.col("doc_id") % 3 == m))
    assert len(idx.resolve(spark).segments) == 3
    terms = ["merge", "scan", "window"]
    before = [tuple(r) for r in
              bm25_index_topk(spark, idx, terms, k=10).collect()]
    bm25_index_compact(idx, spark)
    assert len(idx.resolve(spark).segments) == 1
    after = [tuple(r) for r in
             bm25_index_topk(spark, idx, terms, k=10).collect()]
    assert before == after


def test_ivf_index_compact_preserves_probe(spark, emb):
    from ods_v3_dbt_spark.operators.vector_index import (
        ivf_index_append,
        ivf_index_compact,
        ivf_index_topk,
        ivf_index_write,
    )

    q = emb.filter(F.col("vec_id") < 10)
    c = emb.filter(F.col("vec_id") >= 10)
    idx = ivf_index_write(
        c.filter(F.col("vec_id") % 3 == 0), "t_ivf_cmpx",
        num_cells=8, num_buckets=4, compact_after=99,
    )
    for m in (1, 2):
        ivf_index_append(idx, c.filter(F.col("vec_id") % 3 == m))
    assert len(idx.resolve(spark).segments) == 3
    before = [tuple(r) for r in
              ivf_index_topk(spark, idx, q, k=5, nprobe=3).collect()]
    ivf_index_compact(idx, spark)
    assert len(idx.resolve(spark).segments) == 1
    after = [tuple(r) for r in
             ivf_index_topk(spark, idx, q, k=5, nprobe=3).collect()]
    assert before == after
