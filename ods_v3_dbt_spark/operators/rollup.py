"""Datamart rollups with freshness guard (SURVEY §2.6 A3/A4).

The reference calls closed-source stored procedures
``sp_item_general_pos_day/month`` from
``dags/sql/pns/update_des_table/update_datamart.sql:19-25``, guarded
by MAX-freshness probes (lines 8-18). The measure set is therefore
*our declared spec* (FIXTURES.md F13): per group — row count, sum of
the measure columns.

Day and month stay two explicit aggregations (not GROUP BY ROLLUP)
for oracle parity with the reference's two procedures; the month
rollup re-aggregates the day table (tiny), not the fact — at 100 TB
that's the difference between scanning the fact twice and once.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.cleansing import month_id_from_day_id


def rollup_day(
    fact: DataFrame,
    group_cols: Sequence[str],
    day_id_col: str,
    aggs: dict[str, Column],
) -> DataFrame:
    """Aggregate a fact to (group_cols, day_id).

    ``aggs`` maps output alias → aggregate expression (the reference's
    measure set is closed-source, so the spec is declared by the
    caller — FIXTURES.md F13).
    """
    return fact.groupBy(*group_cols, day_id_col).agg(
        *[expr.alias(alias) for alias, expr in aggs.items()]
    )


def rollup_month_from_day(
    day_table: DataFrame,
    group_cols: Sequence[str],
    day_id_col: str,
    month_id_col: str = "month_id",
) -> DataFrame:
    """Second-level rollup: day table → (group_cols, yyyymm).

    yyyymm = floor(yyyymmdd / 100), the reference's integer division
    (``update_datamart.sql:22-24``).
    """
    measure_cols = [
        c for c in day_table.columns if c not in (*group_cols, day_id_col)
    ]
    return (
        day_table.withColumn(month_id_col, month_id_from_day_id(F.col(day_id_col)))
        .groupBy(*group_cols, month_id_col)
        .agg(*[F.sum(c).alias(c) for c in measure_cols])
    )


def needs_rollup(fact: DataFrame, target: DataFrame, fact_day_col: str, target_day_col: str) -> bool:
    """A3 freshness guard: recompute only when
    ``MAX(fact.day) > MAX(target.day)`` or target is empty
    (``update_datamart.sql:8-18``). Two 1-row aggregates — cheap."""
    src_max = fact.agg(F.max(fact_day_col)).first()[0]
    dst_max = target.agg(F.max(target_day_col)).first()[0]
    return dst_max is None or (src_max is not None and src_max > dst_max)


def merge_day_rollups(
    base: DataFrame,
    delta: DataFrame,
    group_cols: Sequence[str],
    day_id_col: str,
) -> DataFrame:
    """Merge two partial day rollups by re-summing measures.

    Valid for decomposable aggregates (COUNT/SUM/MIN/MAX — everything
    the A4 datamart uses): sum-of-partials ≡ full recompute. Inputs
    are already-aggregated day tables (≪ fact size), so the merge
    shuffle is negligible; this is how the engine maintains the
    datamart incrementally instead of re-scanning the fact per run.
    """
    measure_cols = [c for c in base.columns if c not in (*group_cols, day_id_col)]
    assert measure_cols == [
        c for c in delta.columns if c not in (*group_cols, day_id_col)
    ]
    return (
        base.unionByName(delta)
        .groupBy(*group_cols, day_id_col)
        .agg(*[F.sum(c).alias(c) for c in measure_cols])
    )


# ---------------------------------------------------------------------------
# Sketch-based distinct rollups (beyond-reference, 100 TB device)
# ---------------------------------------------------------------------------


def distinct_sketch_day(
    fact: DataFrame,
    group_cols: Sequence[str],
    day_id_col: str,
    key_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Per-(group, day) HLL sketches of ``key_col`` (Datasketches,
    ``lg_k`` buckets → ~1.6%/sqrt(2^(lg_k-12)) rel. error, 4 KB each).

    Exact distinct counts are NOT re-aggregatable — a month's
    distinct users can't be summed from 30 daily counts, so the naive
    pipeline re-scans the fact for every window it reports. A sketch
    IS re-aggregatable: keep this day table and every coarser rollup
    (month, region, all-time) is a cheap union over it
    (``distinct_sketch_union``) — the incremental-aggregate-
    maintenance pattern (merge_day_rollups) extended to COUNT
    DISTINCT."""
    return fact.groupBy(*group_cols, day_id_col).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lg_k)).alias("key_sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def distinct_sketch_union(
    day_sketches: DataFrame,
    group_cols: Sequence[str],
) -> DataFrame:
    """Merge day-level sketches to a coarser grain: union is the
    sketch monoid's +, so this re-aggregates the TINY sketch table —
    the fact is never re-scanned. Estimate materialized alongside the
    merged sketch (kept for further unions up the hierarchy)."""
    merged = day_sketches.groupBy(*group_cols).agg(
        F.hll_union_agg(F.col("key_sketch")).alias("key_sketch"),
        F.sum("n_rows").alias("n_rows"),
    )
    return merged.withColumn(
        "approx_distinct", F.hll_sketch_estimate(F.col("key_sketch")).cast("bigint")
    )


def update_datamart(
    fact: DataFrame,
    group,
    group_cols: Sequence[str],
    day_id_col: str,
    aggs: dict[str, Column],
    month_id_col: str = "month_id",
) -> bool:
    """A4 day+month datamart refresh as ONE transaction — the shape
    of the reference's ``update_datamart.sql``: a single DO block
    runs the freshness probe, ``sp_item_general_pos_day``, AND
    ``sp_item_general_pos_month`` inside one Postgres transaction
    (dags/sql/pns/update_des_table/update_datamart.sql:4-27), so no
    reader can ever pair a refreshed day table with a stale month
    table. Over plain files that guarantee comes from
    :class:`..sinks.TableGroup`: ``group`` must be a TableGroup with
    members ``("day", "month")``; both rollups commit behind its
    single group-manifest replace (group readers see all-old or
    all-new; per-member standalone readers still see each table's
    latest commit).

    Returns True if a refresh committed, False if the A3 freshness
    guard (:func:`needs_rollup` against the COMMITTED day member)
    short-circuited — the reference's MAX-probe skip, and the same
    skip discipline as ``jobs.freshness_guarded_rollup``. The month
    rollup re-aggregates the day DataFrame (tiny), never the fact."""
    if tuple(group.names) != ("day", "month"):
        raise ValueError(
            "update_datamart needs a TableGroup with members "
            f"('day', 'month'), got {group.names}"
        )
    spark = fact.sparkSession
    if group.exists():
        committed_day = group.read(spark)["day"]
        if not needs_rollup(fact, committed_day, day_id_col, day_id_col):
            return False
    day = rollup_day(fact, group_cols, day_id_col, aggs)
    month = rollup_month_from_day(day, group_cols, day_id_col, month_id_col)
    src_max = fact.agg(F.max(day_id_col)).first()[0]
    group.commit(
        {"day": day, "month": month},
        extras={"max_day": src_max, "fact_day_col": day_id_col},
    )
    return True


def update_datamart_window(
    fact_slice: DataFrame,
    group,
    group_cols: Sequence[str],
    day_id_col: str,
    aggs: dict[str, Column],
    month_id_col: str = "month_id",
) -> None:
    """INCREMENTAL A4 refresh — the reference's real nightly shape:
    the extract hands over only the cursor window's fact slice
    (plugins/operators/bccp_to_ods.py:198-201), so the datamart
    must advance WITHOUT re-scanning the full fact (which
    :func:`update_datamart` does, correctly but O(fact) per run).
    Window semantics are the M6/M7 delete+insert discipline: the
    slice must cover WHOLE days; every day present in it REPLACES
    that day's rows in the committed day member (so replays and
    backdate corrections are idempotent — no sum-of-partials
    double-count), days absent from the slice carry over untouched,
    and the month member re-rolls from the merged day table (tiny,
    never the fact). Both members commit through the
    :class:`..sinks.TableGroup` — one transaction, same all-old-or-
    all-new guarantee as :func:`update_datamart`."""
    if tuple(group.names) != ("day", "month"):
        raise ValueError(
            "update_datamart_window needs a TableGroup with members "
            f"('day', 'month'), got {group.names}"
        )
    spark = fact_slice.sparkSession
    day_delta = rollup_day(fact_slice, group_cols, day_id_col, aggs)
    if group.exists():
        base_day = group.read(spark)["day"]
        touched = day_delta.select(day_id_col).distinct()
        day = base_day.join(touched, day_id_col, "left_anti").unionByName(
            day_delta
        )
    else:
        day = day_delta
    month = rollup_month_from_day(day, group_cols, day_id_col, month_id_col)
    src_max = day.agg(F.max(day_id_col)).first()[0]
    group.commit(
        {"day": day, "month": month},
        extras={"max_day": src_max, "fact_day_col": day_id_col},
    )


def fact_delete_cascade(
    spark,
    group,
    keys: DataFrame,
    key_cols: Sequence[str],
    group_cols: Sequence[str],
    day_id_col: str,
    aggs: dict[str, Column],
    month_id_col: str = "month_id",
) -> dict:
    """M6 DELETE cascaded into the A4 datamarts as ONE transaction
    (round 7 — the relational twin of ``pipelines.corpus_takedown``):
    remove every fact row matching ``keys`` (e.g. all events of an
    opted-out user) and re-derive EXACTLY the affected days' rollup
    rows from the reduced fact, committing fact + day + month behind
    one :class:`..sinks.TableGroup` manifest replace — a reader can
    never pair a reduced fact with a datamart still counting the
    deleted rows, which is precisely why the reference runs its
    delete+insert scripts and datamart procs inside one Postgres
    transaction (dags/sql/casreport/update_des_table/
    casreport_rpt_full_item.sql:1-3; dags/sql/pns/update_des_table/
    update_datamart.sql:4-27).

    Scale shape: the delete keys broadcast; untouched days carry
    over WITHOUT recompute (anti-join on the affected-day set); the
    delta recompute scans the reduced fact restricted to affected
    days — with a day-partitioned fact that is a pruned scan, so
    cascade cost tracks the deleted rows' day spread, not fact size.
    A day whose rows all vanished disappears from the day member and
    its month re-sums accordingly. Idempotent: a replay deletes
    nothing and recommits the same state. ``group`` must be a
    TableGroup with members ``("fact", "day", "month")`` holding a
    prior commit (build it with :func:`update_datamart` over the
    same group, or commit the initial trio directly)."""
    if tuple(group.names) != ("fact", "day", "month"):
        raise ValueError(
            "fact_delete_cascade needs a TableGroup with members "
            f"('fact', 'day', 'month'), got {group.names}"
        )
    cur = group.read(spark)
    fact = cur["fact"]
    kb = keys.select(*key_cols).distinct().localCheckpoint()
    affected = (
        fact.join(F.broadcast(kb), list(key_cols), "left_semi")
        .select(day_id_col)
        .distinct()
        .localCheckpoint()
    )
    reduced = fact.join(F.broadcast(kb), list(key_cols), "left_anti")
    day_delta = rollup_day(
        reduced.join(F.broadcast(affected), day_id_col, "left_semi"),
        group_cols, day_id_col, aggs,
    )
    day = (
        cur["day"]
        .join(F.broadcast(affected), day_id_col, "left_anti")
        .unionByName(day_delta)
    )
    month = rollup_month_from_day(day, group_cols, day_id_col, month_id_col)
    group.commit(
        {"fact": reduced, "day": day, "month": month},
        extras={"cascade_delete": True, "fact_day_col": day_id_col},
    )
    n_days = affected.count()
    return {"n_days_affected": n_days}
