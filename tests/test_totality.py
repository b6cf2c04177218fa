"""Window-ordering totality hardening (round-2, VERDICT item 3).

Round 1 shipped one wrong answer: ``dedup_keep_first_ordered`` used
``row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber)``
but the fixture lineitem deliberately contains duplicate
``(l_orderkey, l_linenumber)`` keys, so the rn=1 tie broke
differently on Spark vs DuckDB — *at sf0.01*. The local sf0.001
parity suite missed it because both engines happened to agree there.

Two defenses:

1. ``test_merge_dedup_parity_sf001`` — the whole merge/dedup/keep-one
   family re-run against the DuckDB oracle at sf0.01, the same scale
   the driver uses. This test FAILS on the round-1 bug (verified by
   reverting the fix).
2. ``test_keep_one_orderings_total`` — a lint that extracts every
   ``row_number() OVER (PARTITION BY … ORDER BY …) … FROM <base
   table> … rn = 1`` keep-one pattern from the declared oracle SQL
   and checks on the sf0.01 data that any rows tied on
   (partition keys, order keys) are *full-row duplicates* — i.e. the
   ordering is total up to value-identical winners. The round-1
   ordering violates this (ties with differing l_quantity).
"""

from __future__ import annotations

import re

import pytest

from ods_v3_dbt_spark.plans.declared_queries import TABLES, registry

from .conftest import SF_CORRECTNESS
from .oracle_harness import compare, duck_connection

_REG = registry()

# The keep-one / merge family: every query whose output depends on a
# row_number()=1 winner (or an equivalent keyed keep-one), run at the
# driver's correctness scale.
MERGE_DEDUP_FAMILY = [
    "merge_upsert_single",
    "merge_upsert_composite",
    "merge_fresh_tie_keep_target",
    "merge_fresh_tie_take_source",
    "dedup_window_keep_oldest",
    "merge_nullsafe_composite",
    "delete_insert_window",
    "partition_overwrite_days",
    "dedup_keep_first_ordered",
    "latest_order_per_customer",
    "top_events_per_user",
    "mode_event_type_per_user",
    "per_source_hash_sample",
    "event_burst_dedup",
    "sparse_update_coalesce",
    "cdc_apply_orders",
]


@pytest.fixture(scope="module")
def duck01():
    con = duck_connection(SF_CORRECTNESS)
    yield con
    con.close()


@pytest.mark.parametrize("name", MERGE_DEDUP_FAMILY)
def test_merge_dedup_parity_sf001(spark, duck01, name):
    qd = _REG[name]
    assert qd.oracle is not None, f"{name} has no oracle"
    spark_df = qd.spark(spark, SF_CORRECTNESS)
    oracle_df = duck01.execute(qd.oracle).df()
    compare(spark_df, oracle_df, name)


# --- totality lint ---------------------------------------------------------

# Matches the canonical keep-one shape used by the declared oracles:
#   row_number() OVER (PARTITION BY <p> ORDER BY <o>) AS rn
#   FROM <base_table>)
_WIN_RE = re.compile(
    r"row_number\(\)\s+OVER\s*\(\s*PARTITION\s+BY\s+(?P<part>[^)]+?)"
    r"\s+ORDER\s+BY\s+(?P<order>[^)]+?)\)\s+AS\s+\w+\s+FROM\s+(?P<table>\w+)\s*\)",
    re.IGNORECASE | re.DOTALL,
)

_BASE_TABLES = set(TABLES)


def _split_cols(spec: str) -> list[str]:
    cols = []
    for piece in spec.split(","):
        tok = piece.strip().split()[0].strip()
        # only simple column refs participate in the base-table lint
        if re.fullmatch(r"[A-Za-z_][A-Za-z_0-9]*", tok):
            cols.append(tok)
        else:
            return []  # expression ordering — skip (not lintable here)
    return cols


def _keep_one_sites():
    sites = []
    for name, qd in _REG.items():
        if qd.oracle is None:
            continue
        for m in _WIN_RE.finditer(qd.oracle):
            table = m.group("table").lower()
            if table not in _BASE_TABLES:
                continue
            part = _split_cols(m.group("part"))
            order = _split_cols(m.group("order"))
            if part and order:
                sites.append((name, table, tuple(part), tuple(order)))
    return sites


def test_lint_finds_known_sites():
    """The extractor must keep seeing the known base-table keep-one
    sites — if this fails the lint below is silently vacuous."""
    names = {s[0] for s in _keep_one_sites()}
    assert "dedup_keep_first_ordered" in names


@pytest.mark.parametrize(
    "name,table,part,order",
    _keep_one_sites(),
    ids=[s[0] for s in _keep_one_sites()],
)
def test_keep_one_orderings_total(duck01, name, table, part, order):
    """Rows tied on (partition, order) keys must be full-row
    duplicates, otherwise the rn=1 winner is engine-dependent."""
    keys = ", ".join(dict.fromkeys([*part, *order]))
    # After collapsing full-row duplicates, no two remaining rows may
    # share the (partition, order) key tuple — that is exactly
    # "ordering total up to value-identical winners".
    n_nontrivial = duck01.execute(
        f"""
        SELECT COUNT(*) FROM (
          SELECT {keys} FROM (SELECT DISTINCT * FROM {table})
          GROUP BY {keys} HAVING COUNT(*) > 1
        )
        """
    ).fetchone()[0]
    assert n_nontrivial == 0, (
        f"{name}: ordering ({keys}) over {table} is not total — "
        f"{n_nontrivial} tie groups contain non-identical rows; "
        "Spark and DuckDB may keep different winners"
    )


def test_survey_s8_count_matches_registry():
    """SURVEY §8 is the contract table the correctness gate is keyed
    to (round-6 verdict task 5): its stated oracle-checked count must
    equal the live registry, and every declared-query name its rows
    cite must actually be registered (no stale contract rows)."""
    import re

    from ods_v3_dbt_spark.plans import declared_queries as DQ

    src = open("SURVEY.md").read()
    s8 = src.split("## 8. Implementation map", 1)[1]
    m = re.search(r"ALL (\d+) oracle-checked", s8)
    assert m, "SURVEY §8 must state the oracle-checked registry count"
    assert int(m.group(1)) == len(DQ.registry()), (
        f"SURVEY §8 says {m.group(1)} queries, registry has "
        f"{len(DQ.registry())} — update the §8 header and add rows "
        "for the new operators"
    )
    reg = set(DQ.registry())
    # every `name` cited in a Declared-query cell must be registered
    for row in s8.splitlines():
        if not row.startswith("|") or row.count("|") < 4:
            continue
        cell = row.split("|")[3]
        for name in re.findall(r"`([a-z0-9_]+)`", cell):
            assert name in reg, f"SURVEY §8 cites unregistered query {name!r}"
