"""BPE (byte-pair-encoding) tokenizer TRAINING over a corpus — the
subword-vocabulary learning step of every modern LLM data pipeline
(Sennrich et al. 2016), plus merge application for tokenization.

How industrial BPE trainers scale (and this one does): the corpus is
reduced ONCE to the distinct-word frequency table — the only
corpus-sized shuffle. Every merge iteration then runs over that
vocabulary-bound table: adjacent-symbol-pair counts weighted by word
frequency (map-side combined), a 1-row argmax probe (the same scalar
fixed-point-probe pattern as ``connected_components``), and a merge
application. 100 TB of text with a 10M-word vocabulary trains at
vocabulary cost per iteration, not corpus cost.

Merge application is BPE's greedy left-to-right non-overlapping
rule — ``a a a a`` under merge (a, a) becomes ``[aa, aa]``, and
``a a a`` becomes ``[aa, a]``. That is a FOLD, not a string
replace (replace() consumes the boundary between adjacent matches
and splits runs wrongly): here it is a Spark ``aggregate`` lambda
over the symbol array whose accumulator merges when the incoming
symbol is ``b`` and the accumulator's last token is ``a``. The
declared query's DuckDB oracle runs the same fold as
``list_reduce`` over a space-joined string accumulator — both
engines implement the identical recurrence, so training is
hash-verified iteration by iteration (ties in pair frequency break
on the lexicographically smallest ``'left right'`` pair string, a
total order both engines share).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Adjacent-pair extraction over the symbol array: 'a b' pair
#: strings, one per adjacency.
_PAIRS_EXPR = (
    "transform(slice(syms, 1, size(syms) - 1),"
    " (x, i) -> concat(x, ' ', syms[i + 1]))"
)


def _lit(s: str) -> str:
    """Symbol → Spark SQL string literal. Symbols come from word
    characters, so apostrophes/backslashes are possible in messy
    corpora — escape them rather than assume them away."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def merge_fold_expr(inner: str, left: str, right: str) -> str:
    """The greedy merge as a Spark SQL fold: wrap an array<string>
    expression so every left-to-right non-overlapping (left, right)
    adjacency collapses to the concatenated symbol."""
    merged = left + right
    return (
        f"aggregate({inner}, cast(array() as array<string>), (acc, x) -> "
        f"CASE WHEN x = {_lit(right)} AND size(acc) > 0 "
        f"AND element_at(acc, -1) = {_lit(left)} "
        f"THEN concat(slice(acc, 1, size(acc) - 1), array({_lit(merged)})) "
        f"ELSE concat(acc, array(x)) END)"
    )


def word_symbol_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → distinct-word frequency table with each word split to
    its character-symbol array: (syms array<string>, cnt). The ONE
    corpus-sized shuffle of BPE training; everything after runs at
    vocabulary cardinality."""
    return (
        df.select(
            F.explode(
                F.expr(
                    rf"filter(split(lower(trim({text_col})), '\\s+'), x -> x <> '')"
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .select(F.expr("split(word, '')").alias("syms"), F.col("cnt"))
    )


def pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-symbol-pair frequencies over the (syms, cnt)
    vocabulary table: (pair 'a b', c). Map-side combined; output is
    bounded by the distinct-pair count, not the corpus."""
    return (
        vocab.filter(F.size("syms") >= 2)
        .select("cnt", F.explode(F.expr(_PAIRS_EXPR)).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("cnt").alias("c"))
    )


def apply_merge(vocab: DataFrame, left: str, right: str) -> DataFrame:
    """One merge applied to every word via the greedy fold."""
    return vocab.select(
        F.expr(merge_fold_expr("syms", left, right)).alias("syms"), "cnt"
    )


def learn_bpe(
    df: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
) -> list[tuple[str, str, int]]:
    """Train ``n_merges`` BPE merges: returns [(left, right,
    pair_count)] in merge order. Each iteration: pair counts over the
    vocab table, a 1-row argmax collect (count desc, pair asc — the
    deterministic tie-break), greedy-fold merge application. The
    vocab frame is localCheckpointed each round to keep lineage flat
    (the ``connected_components`` iteration discipline)."""
    vocab = word_symbol_counts(df, text_col).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        best = (
            pair_counts(vocab)
            .orderBy(F.col("c").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        pair, c = best[0]["pair"], int(best[0]["c"])
        left, right = pair.split(" ")
        merges.append((left, right, c))
        vocab = apply_merge(vocab, left, right).localCheckpoint()
    return merges


def merges_df(spark: SparkSession, merges: list[tuple[str, str, int]]) -> DataFrame:
    """Learned merges as a DataFrame: (rank, left, right, merged,
    pair_count) — the vocabulary artifact a tokenizer ships."""
    rows = [
        (i + 1, l, r, l + r, c) for i, (l, r, c) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "rank int, left string, right string, merged string, pair_count bigint"
    )


def tokenize_with_merges(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
) -> DataFrame:
    """Apply a learned merge list to every document: per word, the
    merge chain runs in training order (nested greedy folds inside
    one scan-stage projection — zero shuffle, no Python), then the
    doc's subword tokens are re-assembled in order. Output: (doc_id,
    tokens array<string>, n_tokens).

    The folds are higher-order-function lambdas (interpreted per
    element, not codegen), so this pays fold cost per word
    OCCURRENCE — right when the caller needs the actual token
    sequence. When only counts are needed, use
    :func:`token_counts_with_merges`, which folds each DISTINCT word
    once."""
    word_expr = rf"filter(split(lower(trim({text_col})), '\\s+'), x -> x <> '')"
    s = "split(w, '')"
    for left, right, _ in merges:
        s = merge_fold_expr(s, left, right)
    return df.select(
        "doc_id",
        F.expr(f"flatten(transform({word_expr}, w -> {s}))").alias("tokens"),
    ).select(
        "doc_id",
        "tokens",
        F.size("tokens").cast("bigint").alias("n_tokens"),
    )


def token_counts_with_merges(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
) -> DataFrame:
    """Per-doc subword token COUNTS at vocabulary cost: the merge
    fold chain (interpreted lambdas — the expensive part) runs once
    per DISTINCT word, the resulting per-word token counts broadcast
    back onto the word occurrences, and one doc-keyed aggregation
    sums them. At 100 TB this turns occurrence-many fold evaluations
    into vocabulary-many — the same distinct-word reduction BPE
    training itself rides. Output: (doc_id, n_tokens)."""
    word_expr = rf"filter(split(lower(trim({text_col})), '\\s+'), x -> x <> '')"
    occurrences = df.select(
        "doc_id", F.explode(F.expr(word_expr)).alias("word")
    )
    s = "split(word, '')"
    for left, right, _ in merges:
        s = merge_fold_expr(s, left, right)
    word_tokens = (
        occurrences.select("word")
        .distinct()
        .select("word", F.expr(f"size({s})").cast("bigint").alias("w_toks"))
    )
    return (
        occurrences.join(F.broadcast(word_tokens), "word")
        .groupBy("doc_id")
        .agg(F.sum("w_toks").alias("n_tokens"))
    )
