"""BPE training/tokenization pinned against a scalar pure-Python
reference (the classic Sennrich dict-based algorithm, reimplemented
here with no Spark, no string-replace trick) — the engine's
vocabulary-table formulation must reproduce it merge for merge."""

from __future__ import annotations

import pytest

from ods_v3_dbt_spark.operators import bpe as B

CORPUS = [
    (0, "low low low lower lowest"),
    (1, "new newer newest wider wide"),
    (2, "low new wide wide wider"),
    (3, "newest lowest widest"),
]


def _ref_learn(texts: list[str], n_merges: int):
    """Scalar reference: word→tuple-of-symbols dict, pair counting
    with plain dict loops, greedy left-to-right merge application."""
    words: dict[tuple[str, ...], int] = {}
    for t in texts:
        for w in t.lower().split():
            k = tuple(w)
            words[k] = words.get(k, 0) + 1
    merges = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, cnt in words.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + cnt
        if not pairs:
            break
        # tie-break: max count, then lexicographically smallest
        # 'left right' pair string — the engine's declared order
        best = min(pairs.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
        (a, b), c = best
        merges.append((a, b, c))
        new_words: dict[tuple[str, ...], int] = {}
        for syms, cnt in words.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            k = tuple(out)
            new_words[k] = new_words.get(k, 0) + cnt
        words = new_words
    return merges


def _ref_tokenize(text: str, merges):
    toks = []
    for w in text.lower().split():
        syms = list(w)
        for a, b, _ in merges:
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        toks.extend(syms)
    return toks


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_learn_matches_scalar_reference(corpus_df):
    got = B.learn_bpe(corpus_df, n_merges=8)
    want = _ref_learn([t for _, t in CORPUS], 8)
    assert got == want, f"\nengine {got}\nref    {want}"


def test_tokenize_matches_scalar_reference(corpus_df, spark):
    merges = B.learn_bpe(corpus_df, n_merges=8)
    rows = {
        r["doc_id"]: (list(r["tokens"]), r["n_tokens"])
        for r in B.tokenize_with_merges(corpus_df, merges).collect()
    }
    for doc_id, text in CORPUS:
        want = _ref_tokenize(text, merges)
        assert rows[doc_id][0] == want, f"doc {doc_id}: {rows[doc_id][0]} != {want}"
        assert rows[doc_id][1] == len(want)


def test_overlapping_pair_greedy_left_to_right(spark):
    """'aaaa' with merge (a,a) must tokenize to [aa, aa]; 'aaa' to
    [aa, a] — the greedy non-overlapping contract the string-replace
    formulation must honor."""
    df = spark.createDataFrame(
        [(0, "aaaa aaa aaaa aaa")], "doc_id long, text string"
    )
    merges = B.learn_bpe(df, n_merges=1)
    assert merges[0][:2] == ("a", "a")
    (row,) = B.tokenize_with_merges(df, merges).collect()
    assert list(row["tokens"]) == ["aa", "aa", "aa", "a", "aa", "aa", "aa", "a"]


def test_merge_exhaustion_stops_early(spark):
    """Single-char words have no pairs: learn_bpe returns [] instead
    of looping."""
    df = spark.createDataFrame([(0, "a b c a b")], "doc_id long, text string")
    assert B.learn_bpe(df, n_merges=5) == []


def test_symbols_with_quotes_do_not_break_sql(spark):
    """Apostrophes in words become symbols embedded as SQL literals
    in the fold expressions — escaping must hold."""
    df = spark.createDataFrame(
        [(0, "don't don't d'oh")], "doc_id long, text string"
    )
    merges = B.learn_bpe(df, n_merges=3)
    assert merges  # learned something, no parse error
    rows = B.tokenize_with_merges(df, merges).collect()
    assert rows[0]["n_tokens"] >= 3
