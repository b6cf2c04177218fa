"""Text-analysis column functions for LLM-data pipelines.

All JVM-side (``pyspark.sql.functions`` only — no Python UDFs), so
they stay inside whole-stage codegen and scale linearly with corpus
partitions. These extend the reference's surface per BASELINE.json
(the reference has no text analytics; its string handling stops at
the §2.4 scrubbing contract).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny per-language stopword profiles for the n-gram/lexicon lang-ID
#: heuristic. Deliberately small and ASCII-safe; real deployments
#: would swap in fastText-style models via mapInPandas.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "a"],
    "fr": ["le", "la", "et", "les", "des", "un"],
    "es": ["el", "los", "las", "una", "y", "que"],
    "de": ["der", "die", "das", "und", "ein", "ist"],
    "zh": ["de", "shi", "le", "zai", "he", "you"],
}

STOPWORDS_EN = LANG_PROFILES["en"]


def normalize(col: Column) -> Column:
    """lower + trim — the canonical form all text ops key on."""
    return F.lower(F.trim(col))


def tokens(col: Column) -> Column:
    """Whitespace tokenization of normalized text → array<string>."""
    return F.split(normalize(col), r"\s+")


def token_count(col: Column) -> Column:
    """Number of whitespace tokens; 0 for empty/blank text."""
    return F.when(F.length(normalize(col)) == 0, F.lit(0)).otherwise(
        F.size(tokens(col))
    ).cast("int")


#: BPE-ish pre-tokenization classes: letter runs, digit runs, single
#: non-alnum marks — the shape GPT-2-style byte-pair pre-splitters use.
BPE_SPLIT_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def bpe_token_count(col: Column) -> Column:
    """Count of BPE-ish pre-tokens (letter runs / digit runs / marks)
    over normalized text — the subword-cost estimate a training-data
    pipeline budgets with, without needing a vocab file."""
    return F.regexp_count(normalize(col), F.lit(BPE_SPLIT_PATTERN)).cast("int")


def token_char_count(col: Column) -> Column:
    """Total non-whitespace characters (per-token character mass)."""
    return F.length(F.regexp_replace(normalize(col), r"\s+", "")).cast("int")


def punct_count(col: Column) -> Column:
    """Count of non-word, non-space characters."""
    return F.regexp_count(col, F.lit(r"[^\w\s]")).cast("int")


def digit_count(col: Column) -> Column:
    return F.regexp_count(col, F.lit(r"[0-9]")).cast("int")


def stopword_count(col: Column, words: list[str] | None = None) -> Column:
    """Occurrences of profile stopwords (word-boundary matched)."""
    pattern = r"\b(" + "|".join(words or STOPWORDS_EN) + r")\b"
    return F.regexp_count(normalize(col), F.lit(pattern)).cast("int")


def lang_scores(col: Column) -> dict[str, Column]:
    """Per-language lexicon hit counts — the lang-ID signal."""
    return {lang: stopword_count(col, words) for lang, words in LANG_PROFILES.items()}


def lang_guess(col: Column) -> Column:
    """Deterministic argmax over :func:`lang_scores` with a fixed
    precedence chain (en > fr > es > de > zh on ties) so results are
    reproducible across engines."""
    scores = lang_scores(col)
    ordered = list(LANG_PROFILES)
    expr = F.lit(ordered[-1])
    for lang in reversed(ordered[:-1]):
        later = [scores[o] for o in ordered[ordered.index(lang) + 1 :]]
        cond = scores[lang] >= F.greatest(*later) if len(later) > 1 else scores[lang] >= later[0]
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def fingerprint_md5(col: Column) -> Column:
    """Content fingerprint: md5 of normalized text (exact-dup key)."""
    return F.md5(normalize(col))


def rolling_hash(col: Column, base: int = 31, mod: int = 2**31 - 1) -> Column:
    """Polynomial rolling hash over characters — a SQL-expressible
    document fingerprint (sequential fold via ``aggregate``, no UDF).
    """
    chars = F.split(normalize(col), "")
    return F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, c: (acc * base + F.ascii(c)) % mod,
    )


def quality_score_milli(col: Column) -> Column:
    """Heuristic doc-quality score in [0, 1000] (integer millis so the
    score is cross-engine exact): rewards mid-length docs and prose-like
    token length, penalizes punctuation/digit soup.

    score = 1000 - penalties; clamped at 0.
    """
    n_tok = token_count(col)
    n_char = F.length(col).cast("int")
    # penalty terms, all integer arithmetic
    short_pen = F.when(n_tok < 10, (10 - n_tok) * 50).otherwise(F.lit(0))
    punct_pen = F.least(punct_count(col) * 20, F.lit(400))
    digit_pen = F.least(digit_count(col) * 10, F.lit(200))
    empty_pen = F.when(n_char == 0, F.lit(1000)).otherwise(F.lit(0))
    raw = F.lit(1000) - short_pen - punct_pen - digit_pen - empty_pen
    return F.greatest(raw, F.lit(0)).cast("int")


def shingles_of_tokens(w: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a token-array column.

    ``w`` must be a *materialized column reference* (not an inline
    ``split(...)`` expression): the per-gram lambda references it once
    per element, and an inline expression tree would re-tokenize the
    whole document per gram — O(len²). ``slice`` + ``array_join``
    mirrors the ANSI ``w[i] || ' ' || w[i+1] …`` oracle exactly for
    full-width grams; docs with fewer than ``n`` tokens yield an empty
    array (guarded — Spark's ``sequence(1, k)`` would count *down*
    for k<1).
    """
    idx = F.when(
        F.size(w) >= n, F.sequence(F.lit(1), F.size(w) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    gram = F.transform(idx, lambda i: F.array_join(F.slice(w, i, n), " "))
    return F.array_distinct(gram)


def shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of raw text → array<string>.

    Convenience form; hot paths should project :func:`tokens` to a
    column first and call :func:`shingles_of_tokens` (see note there).
    """
    return shingles_of_tokens(tokens(col), n)


def ngrams_of_tokens(w: Column, n: int) -> Column:
    """ALL word n-grams (with repeats — unlike
    :func:`shingles_of_tokens`, which distincts) from a materialized
    token-array column. Repetition signals need the multiset: a doc
    that repeats one 2-gram fifty times must count it fifty times."""
    idx = F.when(
        F.size(w) >= n, F.sequence(F.lit(1), F.size(w) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.array_join(F.slice(w, i, n), " "))


def repetition_signals(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Gopher-style repetition quality signals (Rae et al. 2021,
    "Scaling Language Models" §A.1.1 repetition filters, re-expressed
    for whitespace tokens), one row per doc, all-integer ppm outputs
    so the whole computation is oracle-exact:

    * ``top_token_ppm``   — share of tokens that are the single most
      frequent token (only the top COUNT is exposed, so gram ties
      cannot introduce ambiguity);
    * ``top_bigram_ppm``  — share of 2-gram slots taken by the most
      frequent 2-gram;
    * ``dup_trigram_ppm`` — share of 3-gram slots whose gram occurs
      more than once (1 − distinct/total in mass terms).

    Shape: one tokenize scan; each signal is an explode → per-(doc,
    gram) count → per-doc aggregate — doc-keyed shuffles only, no
    corpus-wide state. Thresholding into keep/drop flags is the
    caller's policy (the declared query applies Gopher's 0.20 /
    0.18 cuts)."""
    d = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("w")
    )

    def top_share(gram_col: Column, n: int) -> "object":
        g = d.select("doc_id", F.explode(gram_col).alias("g"))
        per = g.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
        agg = per.groupBy("doc_id").agg(
            F.max("c").alias("top_c"),
            F.sum("c").alias("total"),
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0))).alias("dup_mass"),
        )
        return agg.select(
            "doc_id",
            F.round(F.col("top_c") * 1000000.0 / F.col("total")).cast("bigint")
            .alias(f"top{n}"),
            F.round(F.col("dup_mass") * 1000000.0 / F.col("total")).cast("bigint")
            .alias(f"dup{n}"),
        )

    t1 = top_share(F.col("w"), 1)
    t2 = top_share(ngrams_of_tokens(F.col("w"), 2), 2)
    t3 = top_share(ngrams_of_tokens(F.col("w"), 3), 3)
    # LEFT joins with a 0-ppm default: a doc with fewer than 2
    # (bigram) or 3 (trigram) tokens has NO gram slots — zero
    # repetition evidence, reported as 0 ppm — and must still get
    # its row, or short/degenerate docs would silently bypass the
    # caller's keep/drop policy (round-6 advisor, text.py:215; the
    # previous inner joins dropped them). "One row per doc" holds
    # for every doc with ≥1 token; fully-empty docs have no token
    # multiset to measure and remain absent by contract.
    return (
        t1.select("doc_id", F.col("top1").alias("top_token_ppm"))
        .join(t2.select("doc_id", F.col("top2").alias("top_bigram_ppm")),
              "doc_id", "left")
        .join(t3.select("doc_id", F.col("dup3").alias("dup_trigram_ppm")),
              "doc_id", "left")
        .select(
            "doc_id",
            "top_token_ppm",
            F.coalesce(F.col("top_bigram_ppm"), F.lit(0).cast("bigint"))
            .alias("top_bigram_ppm"),
            F.coalesce(F.col("dup_trigram_ppm"), F.lit(0).cast("bigint"))
            .alias("dup_trigram_ppm"),
        )
    )
