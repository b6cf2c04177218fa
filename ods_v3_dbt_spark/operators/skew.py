"""Skew-mitigation helpers.

AQE's skew-join splitting (on in ``session.ENGINE_CONF``) covers
joins; these cover the cases AQE doesn't: heavily skewed *aggregation*
keys (one merchant with half the events; the empty-string key that
``COALESCE(key,'')`` normalization concentrates — SURVEY §2.4) and
deliberate pre-salted joins against a known-hot dimension key.

Two-phase salted aggregation: phase 1 aggregates on
``(key, salt=hash(row)%N)`` — N-way fan-out of the hot key across
executors with map-side partial aggregation; phase 2 re-aggregates the
N partials per key. Works for any algebraic aggregate (sum/count/min/
max expressible as merge of partials).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column] | None = None,
    num_salts: int = 16,
    salt_col: str | None = None,
) -> DataFrame:
    """Two-phase aggregation over salted keys.

    ``partial_aggs``: alias → aggregate over raw rows (phase 1).
    ``final_aggs``: alias → aggregate over the phase-1 columns; default
    sums every partial alias (correct for sum/count). For min/max pass
    e.g. ``{"mx": F.max("mx")}``.

    ``salt_col``: column to derive the salt from; defaults to a hash
    of *all* columns, which spreads even single-key storms. Pass a
    high-cardinality id column to make the salt cheap.
    """
    salt_src = F.col(salt_col) if salt_col else F.concat_ws("\x1f", *df.columns)
    salted = df.withColumn(_SALT, F.pmod(F.xxhash64(salt_src), F.lit(num_salts)))
    phase1 = salted.groupBy(*keys, _SALT).agg(
        *[expr.alias(alias) for alias, expr in partial_aggs.items()]
    )
    final = final_aggs or {alias: F.sum(alias) for alias in partial_aggs}
    return phase1.groupBy(*keys).agg(
        *[expr.alias(alias) for alias, expr in final.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    how: str = "inner",
    num_salts: int = 16,
) -> DataFrame:
    """Equi-join with the big side's hot keys fanned out over salts.

    For when the small side is too large to broadcast and one join key
    dominates the big side: the big side gets a random salt in
    ``[0, num_salts)``; the small side is replicated ``num_salts``
    times (explode over ``sequence``), so every ``(key, salt)`` bucket
    holds ``1/num_salts`` of the hot key's rows. Shuffle is on
    ``(key, salt)`` — the hot key no longer lands on one task.

    Costs ``num_salts``× the small side's shuffle volume; only worth it
    when AQE's skew split doesn't trigger (e.g. the skew is inside an
    aggregation feeding the join) or ``how`` is an outer join AQE
    won't split. Semantics-preserving for inner/left joins keyed on
    ``keys`` (salt matches exactly once per replica).
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            "salted_join preserves semantics only for inner/left joins; "
            f"got how={how!r} (unmatched small-side rows would duplicate)"
        )
    salted_big = big.withColumn(
        _SALT, F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(num_salts))
    )
    salted_small = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)).cast("array<long>"))
    )
    joined = salted_big.join(salted_small, [*keys, _SALT], how)
    return joined.drop(_SALT)
