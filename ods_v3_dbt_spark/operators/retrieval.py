"""Retrieval-grade scoring and weighted sampling over the document
corpus — the query-time face of a training-data engine (the same
tokenization the dedup/text-analysis family uses feeds ranked
retrieval for data exploration, decontamination triage, and
curriculum selection).

Engine discipline as everywhere: whole-stage-codegen column
expressions, one corpus-sized shuffle per aggregation level,
1-row/vocabulary-bound broadcasts, and EXACT cross-engine
arithmetic so every operator has a DuckDB-replayable oracle. Floats
appear only through IEEE-exact operations (single correctly-rounded
divisions/multiplications/additions over identical inputs, fold
sums in a deterministic sorted order) — the ``sqrt``-not-``pow``
discipline of ``temperature_sampled_mixture`` applied to ranking.

Public-knowledge anchors: Robertson & Spärck Jones probabilistic
relevance / BM25 (Robertson et al., TREC-3), priority sampling for
subset-sum estimation (Duffield, Lund & Thorup, JACM 2007).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _bm25_tf_stats(docs: DataFrame, terms: list[str], text_col: str,
                   id_col: str):
    """The corpus-touching core, shared by single- and multi-query
    BM25: ONE scan-stage projection computes doc length (size of the
    token array) and the QUERY-TERM-filtered token list per doc —
    the corpus is never exploded on its full vocabulary. Three
    consumers read it, each a cheap scan-stage pass: the 1-row
    (n_docs, total_len) aggregate; the tf explode+count, whose rows
    CARRY dl — so there is no separate per-doc length aggregation
    and no doc-keyed dl join anywhere in the plan (the first cut
    had both); and the df count over distinct-per-doc terms. The tf
    (doc, term) count is the only corpus-sized shuffle — df and
    stats map-side combine to ≤ |terms| / 1 rows per task.

    Returns (tf, dfreq, stats): tf = (doc_id, term, tf, dl), dfreq =
    (term, df) — computed DIRECTLY from the distinct-per-doc terms
    (one groupBy whose partials map-side combine to ≤ |terms| rows
    per task), not by re-aggregating tf — and stats = 1-row
    (n_docs, total_len)."""
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("w"),
    ).select(
        "doc_id",
        F.size("w").alias("dl"),
        F.filter(F.col("w"), lambda x: x.isin(terms)).alias("qw"),
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_len")
    )
    tf = (
        base.select("doc_id", "dl", F.explode("qw").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
    )
    dfreq = (
        base.select(F.explode(F.array_distinct("qw")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    return tf, dfreq, stats


def bm25_scores(
    docs: DataFrame,
    terms: Sequence[str],
    k1_milli: int = 1200,
    b_milli: int = 750,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "rational",
) -> DataFrame:
    """BM25 relevance of every matching document against a bag of
    query ``terms``: (doc_id, score) for docs containing ≥1 term.

    Spark shape (see :func:`_bm25_tf_stats`): two scan-stage passes
    over the corpus — a 1-row stats aggregate and the
    query-term-restricted tf explode whose rows carry dl, so no
    per-doc length aggregation or dl join exists in the plan; df
    and stats are vocabulary-bound / 1-row broadcasts; the per-doc
    score is a deterministic LEFT FOLD over the term-sorted
    per-term scores (``array_sort`` + ``aggregate`` —
    ``collect_list`` order is nondeterministic, the sort is what
    makes the float sum reproducible). The only corpus-sized
    shuffle is the (doc, term) tf count.

    ``mode`` mirrors the minhash md5/xxhash discipline:

    * ``"rational"`` (oracle-checkable): idf_t = (N − df + ½)/(df + ½)
      — the inner ratio of the Robertson–Spärck Jones idf with the
      log OMITTED. Every arithmetic step is then a single IEEE
      correctly-rounded op over identical doubles, so DuckDB
      replays the scores bit-exactly. Per-term ranking is monotone
      in the standard idf; cross-term weighting is steeper (rare
      terms weigh more than log-idf would) — a documented variant,
      not an approximation error.
    * ``"ln"`` (production): the standard
      idf_t = ln(1 + (N − df + ½)/(df + ½)). ``ln`` is not
      correctly-rounded across engines, so this mode is pytest-
      (not hash-) verified.

    k1/b arrive in milli-units and are materialized as
    ``milli / 1000.0`` — one exact-rounded division that yields the
    same double in any engine, dodging decimal-literal parsing
    differences."""
    if mode not in ("rational", "ln"):
        raise ValueError(f"unknown bm25 mode: {mode}")
    k1 = F.lit(k1_milli) / F.lit(1000.0)
    b = F.lit(b_milli) / F.lit(1000.0)
    tf, dfreq, stats = _bm25_tf_stats(docs, list(terms), text_col, id_col)
    j = tf.join(F.broadcast(dfreq), "term").crossJoin(F.broadcast(stats))
    # every expression below is parenthesized EXACTLY as the oracle
    # writes it — identical evaluation trees give identical doubles
    avgdl = F.col("total_len") / F.col("n_docs")
    ratio = (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (
        F.col("df") + F.lit(0.5)
    )
    idf = F.log(ratio + F.lit(1.0)) if mode == "ln" else ratio
    tf_d = F.col("tf").cast("double")
    denom = tf_d + (k1 * ((F.lit(1.0) - b) + (b * (F.col("dl") / avgdl))))
    s = idf * ((tf_d * (k1 + F.lit(1.0))) / denom)
    per_term = j.select("doc_id", F.struct(F.col("term"), s.alias("s")).alias("ts"))
    return per_term.groupBy("doc_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list("ts")),
            F.lit(0.0),
            lambda acc, x: acc + x["s"],
        ).alias("score")
    )


def bm25_topk(
    docs: DataFrame,
    terms: Sequence[str],
    k: int = 10,
    **kwargs,
) -> DataFrame:
    """Top-k BM25 docs: (rank, doc_id, score_micro). Rank is a
    row_number over (score DESC, doc_id ASC) — computed on the
    bit-identical doubles, so it replays exactly; the exposed score
    is micro-unit-quantized bigint (the ``jacc_ppm``/``*_c``
    integer-output convention)."""
    scored = bm25_scores(docs, terms, **kwargs)
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


def bm25f_scores(
    docs: DataFrame,
    terms: Sequence[str],
    fields: dict[str, int],
    k1_milli: int = 1200,
    b_milli: int = 750,
    id_col: str = "doc_id",
    mode: str = "rational",
) -> DataFrame:
    """BM25F — BM25 over MULTIPLE weighted fields (Robertson &
    Zaragoza's simple weighted-tf variant): per term, the field tf
    counts combine as Σ_f w_f·tf_f and the doc length as
    Σ_f w_f·len_f, then the combined values run through the ordinary
    BM25 saturation. ``fields`` maps text column → weight in
    MILLI-units. The standard use: title tokens count ~2-3× body
    tokens.

    Exactness discipline (the md5/rational convention of this
    module): weighted tf and weighted length are computed as exact
    BIGINT milli-sums — per (doc, term) the per-field INTEGER counts
    combine as (tf_a·w_a) + (tf_b·w_b) in a deterministic
    field-name-sorted parenthesization, never as a float sum over
    occurrences — and become doubles through ONE exact-rounded
    /1000.0-style division each, so DuckDB replays the scores
    bit-exactly in ``rational`` mode. df counts a doc once if the
    term appears in ANY field.

    Spark shape: one scan projects every field's token array, the
    milli doc length, and the query-term-filtered per-field lists;
    the per-(doc, term, field) explode unions and the single
    corpus-sized shuffle is the (doc, term) count aggregate (field
    tf's pivot inside it as conditional counts); df and the 1-row
    stats broadcast; the per-doc score is the same deterministic
    term-sorted fold as :func:`bm25_scores`."""
    if mode not in ("rational", "ln"):
        raise ValueError(f"unknown bm25 mode: {mode}")
    if not fields:
        raise ValueError("bm25f needs at least one field")
    fnames = sorted(fields)
    terms = list(terms)
    k1 = F.lit(k1_milli) / F.lit(1000.0)
    b = F.lit(b_milli) / F.lit(1000.0)

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        *[
            F.split(F.lower(F.trim(F.col(f))), r"\s+").alias(f"__w{i}")
            for i, f in enumerate(fnames)
        ],
    )
    dl_milli = F.lit(0).cast("bigint")
    for i, f in enumerate(fnames):
        dl_milli = dl_milli + (
            F.size(f"__w{i}").cast("bigint") * F.lit(int(fields[f]))
        )
    base = base.select(
        "doc_id",
        dl_milli.alias("dl_milli"),
        *[
            F.filter(F.col(f"__w{i}"), lambda x: x.isin(terms)).alias(f"__q{i}")
            for i in range(len(fnames))
        ],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl_milli").alias("total_len_milli"),
    )
    ex = None
    for i in range(len(fnames)):
        part = base.select(
            "doc_id", "dl_milli",
            F.explode(f"__q{i}").alias("term"), F.lit(i).alias("__fld"),
        )
        ex = part if ex is None else ex.unionByName(part)
    tf = ex.groupBy("doc_id", "term").agg(
        F.max("dl_milli").alias("dl_milli"),
        *[
            F.count(F.when(F.col("__fld") == i, 1)).alias(f"__tf{i}")
            for i in range(len(fnames))
        ],
    )
    wtf_milli = F.lit(0).cast("bigint")
    for i, f in enumerate(fnames):
        wtf_milli = wtf_milli + (F.col(f"__tf{i}") * F.lit(int(fields[f])))
    tf = tf.select("doc_id", "term", "dl_milli", wtf_milli.alias("wtf_milli"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    j = tf.join(F.broadcast(dfreq), "term").crossJoin(F.broadcast(stats))
    # identical parenthesization to the oracle — exact replay
    avgdl = F.col("total_len_milli") / F.col("n_docs")
    ratio = (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (
        F.col("df") + F.lit(0.5)
    )
    idf = F.log(ratio + F.lit(1.0)) if mode == "ln" else ratio
    wtf = F.col("wtf_milli") / F.lit(1000.0)
    denom = wtf + (
        k1 * ((F.lit(1.0) - b)
              + (b * (F.col("dl_milli").cast("double") / avgdl)))
    )
    s = idf * ((wtf * (k1 + F.lit(1.0))) / denom)
    per_term = j.select(
        "doc_id", F.struct(F.col("term"), s.alias("s")).alias("ts")
    )
    return per_term.groupBy("doc_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list("ts")),
            F.lit(0.0),
            lambda acc, x: acc + x["s"],
        ).alias("score")
    )


def bm25f_topk(
    docs: DataFrame,
    terms: Sequence[str],
    fields: dict[str, int],
    k: int = 10,
    **kwargs,
) -> DataFrame:
    """Top-k BM25F docs: (rank, doc_id, score_micro) — the
    :func:`bm25_topk` contract over weighted fields."""
    scored = bm25f_scores(docs, terms, fields, **kwargs)
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


def window_contains(text_col, terms: Sequence[str], window: int,
                    tokens=None):
    """Boolean column: some ``window``-token span of ``text_col``
    contains EVERY term — the positional AND/proximity predicate of
    phrase-aware retrieval. Pure scan-stage array lambdas: zero
    shuffle, zero explode, replayable in any engine with list
    lambdas. ``window == len(terms)`` with a single in-order check
    is the contiguous-phrase special case — see
    :func:`phrase_contains`.

    Cost shape (the round-6 ``bm25_window_topk`` 4.4 s fix): the
    naive form sliced a ``window``-token array at EVERY start
    position — O(L·window·terms) with an allocation per start, paid
    by every corpus doc, and HOF lambda bodies run INTERPRETED per
    element so the constant factor is brutal. This is the classic
    single-pass sliding check instead: ONE ``aggregate`` over the
    token array carrying (last-seen position per term, index, found)
    — at token i the predicate holds iff every term's last
    occurrence lies in the span ending at i, i.e. ``least(last_j) ≥
    i-window+1`` (spans ending at i ↔ spans starting at i-window+1;
    a prefix shorter than ``window`` is a sub-span of the first
    window, covered by the ``≥ 1`` clip). O(L·terms), zero array
    allocations per step — measured 0.4 s vs 5 s for the slice form
    on sf0.1.

    ``tokens``: pass a pre-tokenized array COLUMN (an attribute, not
    an expression) when calling from a plan that can afford a
    ``select`` — per-element lambda evaluation re-runs any embedded
    expression (``split`` would make it O(L²)); an attribute
    reference is a row-value lookup."""
    w = tokens if tokens is not None \
        else F.split(F.lower(F.trim(text_col)), r"\s+")
    terms = list(terms)
    k = len(terms)
    zero = F.struct(
        *[F.lit(0).alias(f"l{j}") for j in range(k)],
        F.lit(0).alias("i"),
        F.lit(False).alias("f"),
    )

    def step(acc, x):
        i = acc["i"] + F.lit(1)
        ls = [
            F.when(x == F.lit(terms[j]), i).otherwise(acc[f"l{j}"])
            for j in range(k)
        ]
        seen_all = F.least(*ls) if k > 1 else ls[0]
        hit = (seen_all > F.lit(0)) & (
            seen_all >= i - F.lit(window - 1)
        )
        return F.struct(
            *[l.alias(f"l{j}") for j, l in enumerate(ls)],
            i.alias("i"),
            (acc["f"] | hit).alias("f"),
        )

    return F.aggregate(w, zero, step, lambda acc: acc["f"])


def phrase_contains(text_col, phrase: Sequence[str], tokens=None):
    """Boolean column: the tokens of ``text_col`` contain ``phrase``
    CONTIGUOUSLY in order — exact phrase match, same zero-shuffle
    scan-stage shape as :func:`window_contains` (``tokens`` takes a
    pre-tokenized attribute for the same per-element-lambda-eval
    reason)."""
    w = tokens if tokens is not None \
        else F.split(F.lower(F.trim(text_col)), r"\s+")
    phrase = list(phrase)

    def at(i):
        cond = F.lit(True)
        for off, t in enumerate(phrase):
            cond = cond & (F.element_at(w, i + off) == F.lit(t))
        return cond

    n = len(phrase)
    # guard the short-doc case explicitly: sequence(1, 0) would count
    # DOWN in Spark ([1, 0]) and index 0 is an error, not a miss
    starts = F.when(
        F.size(w) >= n, F.sequence(F.lit(1), F.size(w) - F.lit(n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.exists(starts, at)


def bm25_topk_windowed(
    docs: DataFrame,
    terms: Sequence[str],
    k: int = 10,
    window: int | None = None,
    phrase: Sequence[str] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    **kwargs,
) -> DataFrame:
    """BM25 top-k restricted to docs satisfying a positional
    predicate — ``window=N`` keeps docs where every query term
    appears inside some N-token span, ``phrase=[...]`` keeps exact
    contiguous matches. Statistics (df, N, avgdl) stay CORPUS-GLOBAL
    (the standard phrase-AND + rank semantics: the predicate selects
    candidates, it does not re-define the collection); the predicate
    is a scan-stage boolean on the same tokenization, so the plan
    adds one filtered pass and no shuffle."""
    if (window is None) == (phrase is None):
        raise ValueError("pass exactly one of window= or phrase=")
    # tokenize ONCE into an attribute: lambda bodies inside the
    # positional predicate are interpreted per element, and an
    # expression-typed w would re-split the text per token (O(L²))
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("__w"),
    )
    pred = (
        window_contains(None, terms, window, tokens=F.col("__w"))
        if window is not None
        else phrase_contains(None, phrase, tokens=F.col("__w"))
    )
    scored = bm25_scores(docs, terms, text_col=text_col, id_col=id_col,
                         **kwargs)
    keep = toks.filter(pred).select("doc_id")
    # heap-based global top-k (round-7 verdict task 6): orderBy+limit
    # compiles to TakeOrderedAndProject — per-partition k-heaps merged
    # on the driver — instead of the previous unpartitioned
    # row_number Window that funneled every candidate through ONE
    # partition. The residual Window below ranks only the k survivors.
    top = (
        scored.join(keep, "doc_id", "left_semi")
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(k)
    )
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select(
            "rank",
            "doc_id",
            F.round(F.col("score") * F.lit(1000000.0)).cast("bigint")
            .alias("score_micro"),
        )
    )


def priority_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    seed: str = "ps",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via priority sampling
    (Duffield–Lund–Thorup): each row gets priority w / u with
    u ~ Uniform(0, 1]; the k highest-priority rows form the sample
    (inclusion probability ∝ weight for heavy items, and subset
    sums are estimable from the threshold — the classic use). Rank
    by definition, not randomness: u derives from a 48-bit md5
    slice of (seed, id) — ``(h + 1) / 2^48`` is EXACTLY
    representable (numerator ≤ 2^48 < 2^53, power-of-two
    denominator), so the single correctly-rounded division w / u is
    bit-identical in any IEEE engine and the whole sample is
    hash-verifiable and replayable (the md5-threshold discipline of
    the split/sample family, upgraded from Bernoulli to weighted
    without-replacement).

    Scale: one scan computing the priority expression in codegen +
    one top-k. The global row_number is fine at k ≤ thousands
    (WindowGroupLimit pushes the limit map-side); for huge k,
    partition-local top-k then re-rank — the standard two-phase
    refinement."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))), 1, 12),
        16, 10,
    ).cast("long")
    u = (h + F.lit(1)).cast("double") / F.lit(float(2**48))
    pri = F.col(weight_col).cast("double") / u
    w = Window.orderBy(F.col("__pri").desc(), F.col(id_col))
    return (
        df.withColumn("__pri", pri)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("rank", F.col(id_col), F.col(weight_col))
    )


def bm25_multiquery_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k1_milli: int = 1200,
    b_milli: int = 750,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "rational",
) -> DataFrame:
    """Batch retrieval — the shape a 100 TB corpus actually serves:
    MANY queries scored in one pass. ``queries`` is (query_id, term)
    rows; returns (query_id, rank, doc_id, score_micro) with rank ≤
    k per query.

    The corpus work is :func:`_bm25_tf_stats` — shared across every
    query: two scan-stage passes (1-row stats, query-term-restricted
    tf explode carrying dl), restricted to the UNION of query terms
    (collected driver-side — bounded by the query workload, the
    codebook-collect convention); df and stats are vocabulary-bound
    / 1-row broadcasts; the term→query mapping broadcast-joins the
    per-(doc, term) scores out to (query_id, doc) pairs; the
    per-pair sum is the same deterministic term-sorted fold as
    :func:`bm25_scores`, and the per-query top-k is a row_number
    over (score DESC, doc_id) — WindowGroupLimit pushes the k cut
    map-side. Exactness contract identical to :func:`bm25_scores`
    (the oracle replays the fold as a term-rank pivot sum: adding a
    COALESCEd 0.0 is the IEEE identity, so the parenthesized chain
    equals the fold over present terms)."""
    if mode not in ("rational", "ln"):
        raise ValueError(f"unknown bm25 mode: {mode}")
    k1 = F.lit(k1_milli) / F.lit(1000.0)
    b = F.lit(b_milli) / F.lit(1000.0)
    q = queries.select("query_id", "term")
    terms = sorted({r.term for r in q.select("term").distinct().collect()})
    tf, dfreq, stats = _bm25_tf_stats(docs, terms, text_col, id_col)
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


def rrf_fuse(
    rankings: Sequence[DataFrame],
    k0: int = 60,
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR
    2009) of N ranked lists — the standard hybrid-retrieval combiner
    (sparse BM25 + dense embedding ranks fused without score
    calibration). Each input is (id_col, rank) rows; a document's
    fused score is the sum over lists of floor(1e6 / (k0 + rank)),
    i.e. the classic 1/(k0+r) contribution in exact integer micro
    units, so the fusion is engine-replayable (every contribution is
    a single correctly-rounded division of exact integers, floored —
    no float accumulation order can differ because the per-list
    contributions are integers summed by a commutative BIGINT agg).
    Returns (rank, id_col, rrf_micro, n_lists) with rank ≤ k over
    (rrf_micro DESC, id ASC).

    Scale: the inputs are already top-K-bounded candidate lists
    (each produced by its own scale-shaped retriever), so the union
    + groupBy touches O(N·K) rows — executor-trivial at any corpus
    size; the corpus never re-enters the fusion. With full-corpus
    rankings the same plan is one shuffle on the id."""
    parts = None
    for r in rankings:
        contrib = r.select(
            F.col(id_col),
            F.floor(
                F.lit(1000000.0) / (F.lit(k0) + F.col("rank")).cast("double")
            ).cast("bigint").alias("c"),
        )
        parts = contrib if parts is None else parts.unionByName(contrib)
    fused = parts.groupBy(id_col).agg(
        F.sum("c").alias("rrf_micro"),
        F.count(F.lit(1)).cast("int").alias("n_lists"),
    )
    w = Window.orderBy(F.col("rrf_micro").desc(), F.col(id_col))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("rank", id_col, "rrf_micro", "n_lists")
    )


def retrieval_eval_binary(
    ranked: DataFrame,
    relevant: DataFrame,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Offline retrieval evaluation against a binary relevance set —
    the measurement face of the retrieval family (a pipeline that
    ships BM25/ANN/RRF needs MRR / precision / recall dashboards
    computed engine-side, at corpus scale, from the same tables).
    ``ranked`` is (rank, id) from any retriever, ``relevant`` is the
    judgment set (id rows). One output row:

      mrr_micro      floor(1e6 / first-relevant rank), 0 if none
      hits_at_k      relevant docs in the top-k
      n_relevant     judgment-set size
      precision_at_k_ppm  floor(1e6 · hits / k)
      recall_at_k_ppm     floor(1e6 · hits / n_relevant), 0 if empty

    All-integer outputs (exact rational metrics — the reciprocal
    discount replaces log2 DCG so no transcendental crosses engines).
    Scale: judgment join is a broadcast against an already-bounded
    top-k list; the three scalar aggregates reduce k rows."""
    hits = (
        ranked.filter(F.col("rank") <= k)
        .join(F.broadcast(relevant.select(id_col)), id_col, "inner")
    )
    agg = hits.agg(
        F.min("rank").alias("first_rank"),
        F.count(F.lit(1)).alias("hits_at_k"),
    )
    n_rel = relevant.agg(F.count(F.lit(1)).alias("n_relevant"))
    return agg.crossJoin(n_rel).select(
        F.coalesce(
            F.floor(F.lit(1000000.0) / F.col("first_rank").cast("double")),
            F.lit(0),
        ).cast("bigint").alias("mrr_micro"),
        F.coalesce(F.col("hits_at_k"), F.lit(0)).cast("bigint")
        .alias("hits_at_k"),
        F.col("n_relevant").cast("bigint").alias("n_relevant"),
        F.floor(
            F.coalesce(F.col("hits_at_k"), F.lit(0)).cast("double")
            * F.lit(1000000.0) / F.lit(float(k))
        ).cast("bigint").alias("precision_at_k_ppm"),
        F.when(
            F.col("n_relevant") > 0,
            F.floor(
                F.coalesce(F.col("hits_at_k"), F.lit(0)).cast("double")
                * F.lit(1000000.0) / F.col("n_relevant").cast("double")
            ),
        ).otherwise(F.lit(0)).cast("bigint").alias("recall_at_k_ppm"),
    )


def bm25_rm3_topk(
    docs: DataFrame,
    terms: Sequence[str],
    k: int = 10,
    fb_k: int = 5,
    expand_m: int = 3,
    min_term_len: int = 4,
    orig_milli: int = 600,
    exp_milli: int = 400,
    k1_milli: int = 1200,
    b_milli: int = 750,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "rational",
) -> DataFrame:
    """RM3-style pseudo-relevance feedback (Lavrenko & Croft's
    relevance models, the Anserini/Indri default query expansion):
    retrieve the top ``fb_k`` docs for the original query, mine
    ``expand_m`` expansion terms from them, and re-score the corpus
    against the INTERPOLATED query — original terms weighted
    ``orig_milli``/1000, expansion terms ``exp_milli``/1000. The
    vocabulary-mismatch fix every retrieval stack ships: docs about
    the query's topic that share none of its literal terms become
    reachable through the feedback docs' vocabulary.

    Determinism discipline (what makes this hash-verifiable against
    a DuckDB replay, dynamic expansion terms included):

    * feedback selection is the already-exact :func:`bm25_topk`
      (rank over bit-identical doubles);
    * expansion scoring is INTEGER — total term frequency within the
      feedback docs, ties broken by term — with a deterministic
      ``min_term_len`` floor standing in for a stopword list and the
      original terms excluded;
    * the final score is a sum of PER-TERM MICRO-QUANTIZED integer
      contributions: each term's weighted BM25 score rounds to
      micro-units first, then sums as bigint — order-free by
      construction, so the data-dependent term set needs no pinned
      float fold order (the coalesce-chain trick the fixed-term
      oracle uses cannot enumerate dynamic terms).

    Driver state: ``fb_k`` doc ids + ``expand_m`` terms — scalar
    class, same as the query-term sets the multiquery path already
    collects. Corpus work: the feedback pass, one token scan of
    ``fb_k`` docs, and the standard query-term-restricted scoring
    pass — never a full-vocabulary corpus explode."""
    terms = list(terms)
    fb = bm25_topk(
        docs, terms, k=fb_k, k1_milli=k1_milli, b_milli=b_milli,
        text_col=text_col, id_col=id_col, mode=mode,
    )
    fb_ids = [r.doc_id for r in fb.select("doc_id").collect()]
    toks = docs.filter(F.col(id_col).isin(fb_ids)).select(
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("term")
    )
    cand = (
        toks.filter(
            (F.length("term") >= min_term_len)
            & (~F.col("term").isin(terms))
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    exp = [
        r.term
        for r in cand.orderBy(F.col("w").desc(), F.col("term"))
        .limit(expand_m)
        .collect()
    ]
    all_terms = terms + exp
    k1 = F.lit(k1_milli) / F.lit(1000.0)
    b = F.lit(b_milli) / F.lit(1000.0)
    tf, dfreq, stats = _bm25_tf_stats(docs, all_terms, text_col, id_col)
    j = tf.join(F.broadcast(dfreq), "term").crossJoin(F.broadcast(stats))
    avgdl = F.col("total_len") / F.col("n_docs")
    ratio = (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (
        F.col("df") + F.lit(0.5)
    )
    idf = F.log(ratio + F.lit(1.0)) if mode == "ln" else ratio
    tf_d = F.col("tf").cast("double")
    denom = tf_d + (k1 * ((F.lit(1.0) - b) + (b * (F.col("dl") / avgdl))))
    s = idf * ((tf_d * (k1 + F.lit(1.0))) / denom)
    wmap = F.when(
        F.col("term").isin(terms), F.lit(orig_milli)
    ).otherwise(F.lit(exp_milli))
    contrib = (
        F.round((s * (wmap / F.lit(1000.0))) * F.lit(1000000.0))
        .cast("bigint")
    )
    scored = (
        j.select("doc_id", contrib.alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("score_micro"))
    )
    w = Window.orderBy(F.col("score_micro").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("rank", "doc_id", "score_micro")
    )
