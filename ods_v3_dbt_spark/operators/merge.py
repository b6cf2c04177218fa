"""Upsert / merge / refresh strategies M1-M9 (SURVEY.md §2.3).

The reference implements these as 35 Postgres ``MERGE INTO`` scripts
plus TRUNCATE+INSERT and DELETE+INSERT variants
(``dags/sql/**/update_des_table/*.sql``). Here each strategy is a pure
``(target, source) -> DataFrame`` function: the caller (a table sink)
decides how the result is materialized (overwrite-swap on Parquet, or
a Delta MERGE if that format is in play). Pure functions make the
semantics unit-testable and DuckDB-oracle-checkable.

Scale notes
-----------
* Every strategy is one shuffle on the merge keys (a single window or
  join) — no driver-side collection, no per-row Python.
* ``partition_overwrite`` / ``delete_insert_window`` are designed for
  date-partitioned targets where the physical write path uses dynamic
  partition overwrite, i.e. only the touched day-partitions rewrite.
* Freshness-gated merges (M3) make replays idempotent — the engine's
  late-data story (reference backdate DAGs, SURVEY §2.11).

Tie semantics (M3) differ per reference table and are preserved
exactly: ``tie_update=False`` keeps the target row on equal
timestamps (``bccp_item.sql:175`` — ``des.ts < src.ts``);
``tie_update=True`` takes the source row
(``khl_portal_billing_result.sql:3-4`` — ``src.UPDATED >= des.UPDATED``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SRC_FLAG = "__is_source"
_RN = "__rn"


def _key_condition(left: DataFrame, right: DataFrame, keys: Sequence[str], null_safe: bool) -> Column:
    cond = None
    for k in keys:
        c = left[k].eqNullSafe(right[k]) if null_safe else (left[k] == right[k])
        cond = c if cond is None else (cond & c)
    assert cond is not None, "merge requires at least one key"
    return cond


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    null_safe: bool = False,
) -> DataFrame:
    """M1/M2/M5: SCD-1 upsert — source wins unconditionally.

    ``MERGE … WHEN MATCHED THEN UPDATE WHEN NOT MATCHED THEN INSERT``
    (reference ``casreport_mailsitemhdr.sql:1-399`` single key;
    ``casreport_settlements.sql:3`` composite key;
    ``ods_to_llb/update_des_table/staging_revenue_by_employee.sql:3-12``
    null-safe ``ISNULL(c,'')=ISNULL(c,'')`` keys → ``null_safe=True``).

    Spark-first: kept target rows are an anti-join (one shuffle, AQE
    may broadcast the smaller side); no full-table rewrite semantics
    beyond the keys touched.
    """
    t, s = target.alias("t"), source.alias("s")
    keep = t.join(s, on=_key_condition(t, s, keys, null_safe), how="left_anti")
    return keep.unionByName(source.select(*target.columns))


def merge_upsert_fresh(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    tie_update: bool,
) -> DataFrame:
    """M3: freshness-gated upsert (late-arrival protection).

    Update only when the source row is strictly newer
    (``tie_update=False``: ``des.ts < src.ts``, ties keep target —
    ``bccp_item.sql:175``) or newer-or-equal (``tie_update=True``:
    ``src.ts >= des.ts`` — ``khl_portal_billing_result.sql:3-4``).

    Implemented as one window over the union: per key, rank by
    ``(ts desc, origin)`` where the origin tiebreak encodes the gate's
    tie semantics. A source batch with several rows per key behaves
    like repeated MERGE passes: the freshest source row wins.
    """
    t = target.withColumn(_SRC_FLAG, F.lit(0))
    s = source.select(*target.columns).withColumn(_SRC_FLAG, F.lit(1))
    # On ts ties: tie_update → prefer source (flag desc); else target.
    tie_order = F.col(_SRC_FLAG).desc() if tie_update else F.col(_SRC_FLAG).asc()
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        F.col(ts_col).desc_nulls_last(), tie_order
    )
    return (
        t.unionByName(s)
        .withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) == 1)
        .drop(_RN, _SRC_FLAG)
    )


def dedup_keep_first(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
) -> DataFrame:
    """W1/M4/A7: keyed dedup with an explicit deterministic order.

    Reference W1 keeps ``row_number() over (partition by employee_code
    order by updated_date ASC, action_status DESC) = 1`` — ascending,
    i.e. the *oldest* row wins (``hrm_employee.sql:23,51``); A7 is
    pandas ``drop_duplicates(keep='first')`` whose file order we pin
    with an explicit ordering column (``pns_to_ods_optimize.py:186-188``).
    """
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order_by)
    return df.withColumn(_RN, F.row_number().over(w)).filter(F.col(_RN) == 1).drop(_RN)


def dedup_then_merge(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
) -> DataFrame:
    """M4: window-dedup the source, then plain upsert
    (``hrm_employee.sql:1-52``)."""
    return merge_upsert(target, dedup_keep_first(source, keys, order_by), keys)


def delete_insert_window(
    target: DataFrame,
    source: DataFrame,
    ts_col: str,
    start,
    end,
) -> DataFrame:
    """M6: half-open time-window overwrite.

    Delete target rows with ``start <= ts < end``, re-insert the same
    window from source (``casreport_rpt_full_item.sql:1-7``). With a
    date-partitioned target the physical write is a dynamic partition
    overwrite of just the touched days.
    """
    in_window = (F.col(ts_col) >= F.lit(start)) & (F.col(ts_col) < F.lit(end))
    return target.filter(~in_window | F.col(ts_col).isNull()).unionByName(
        source.filter(in_window).select(*target.columns)
    )


def partition_overwrite(
    target: DataFrame,
    source: DataFrame,
    part_cols: Sequence[str],
) -> DataFrame:
    """M7: overwrite exactly the partitions present in the source.

    ``DELETE WHERE day = :d; INSERT …`` per day
    (``pns/item_delivery_detail.sql:1-6``). Semantically: drop target
    rows whose partition value appears in source, then append source.
    Physically (sink path): ``INSERT OVERWRITE`` with
    ``partitionOverwriteMode=dynamic`` — touched partitions only.
    """
    parts = source.select(*part_cols).distinct()
    keep = target.join(F.broadcast(parts), on=list(part_cols), how="left_anti")
    return keep.unionByName(source.select(*target.columns))


def full_refresh(source: DataFrame, target_columns: Sequence[str] | None = None) -> DataFrame:
    """M8: TRUNCATE + INSERT — target is replaced wholesale
    (``cms/update_des_table/customers.sql:1-2``, all casadmin dims)."""
    return source.select(*target_columns) if target_columns else source


def refresh_dedup(
    source: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
) -> DataFrame:
    """M9: TRUNCATE + MERGE ≡ full refresh deduped by key
    (``casreport_v_prd_srv.sql:1-28``). The reference's arbitrary
    keep-one is pinned to a deterministic order here (SURVEY §7.3
    risk 3)."""
    return dedup_keep_first(source, keys, order_by)


def incremental_watermark_filter(
    target: DataFrame,
    source: DataFrame,
    watermark_col: str,
    floor_literal: str = "1900-01-01",
) -> DataFrame:
    """dbt incremental high-watermark: keep source rows newer than
    ``COALESCE(MAX(target.wm), floor)``
    (``dbt/models/marts/casreport/dim_casreport_services.sql:25-30``).

    The scalar watermark is computed as a 1-row aggregate and joined
    via broadcast — no driver round-trip, works under streaming
    foreachBatch too.
    """
    wm = target.agg(
        F.coalesce(F.max(watermark_col), F.to_timestamp(F.lit(floor_literal))).alias("__wm")
    )
    return (
        source.crossJoin(F.broadcast(wm))
        .filter(F.col(watermark_col) > F.col("__wm"))
        .drop("__wm")
    )


def apply_cdc(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Apply an I/U/D changelog to a snapshot: per key, the
    highest-``seq_col`` record wins; a winning delete removes the key.

    The M-family merges (SURVEY §2.3) are the op-less special case —
    this is the general CDC-apply the reference approximates with its
    backdate re-scans. One window shuffle on the key over
    base ∪ changes; no join, so a replay of already-applied changes
    is idempotent (same winner). Base rows rank beneath every change
    (seq = -∞ via null-first ordering).
    """
    keys = list(keys)
    data_cols = [c for c in base.columns]
    b = base.select(
        *data_cols,
        F.lit(None).cast(changes.schema[seq_col].dataType).alias("__seq"),
        F.lit(None).cast("string").alias("__op"),
    )
    c = changes.select(
        *data_cols,
        F.col(seq_col).alias("__seq"),
        F.col(op_col).alias("__op"),
    )
    w = Window.partitionBy(*keys).orderBy(F.col("__seq").desc_nulls_last())
    return (
        b.unionByName(c)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .filter((F.col("__op").isNull()) | (F.col("__op") != F.lit(delete_op)))
        .select(*data_cols)
    )


def scd2_from_changes(
    changes: DataFrame,
    keys: Sequence[str],
    attr_cols: Sequence[str],
    ts_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a change feed:
    collapse consecutive identical attribute states per key, then
    interval-ize — ``valid_from`` = change timestamp, ``valid_to`` =
    next change (NULL = current row).

    Both windows share one (key, ts) sort spec, so the whole history
    build is a single exchange+sort; no self-join against the feed.
    The reference's SCD-1 merges overwrite history — this is the
    auditable variant its `task_result` log hints at wanting.
    Ordering must be total per key — pass ``tiebreak_cols`` (e.g. the
    event id) if ``ts_col`` alone can tie.
    """
    keys = list(keys)
    attrs = list(attr_cols)
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak_cols]]
    w = Window.partitionBy(*keys).orderBy(*order)
    state = F.struct(*[F.col(a) for a in attrs])
    # "changed" must mean IS DISTINCT FROM: eqNullSafe keeps the
    # first row per key (NULL lag struct ≠ any state) and treats
    # NULL attribute values as equal to NULL — a NULL→NULL feed row
    # is NOT a new version (oracle contract: IS DISTINCT FROM).
    changed = changes.withColumn("__prev", F.lag(state).over(w)).filter(
        ~F.col("__prev").eqNullSafe(state)
    )
    return (
        changed.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .select(*keys, *attrs, "valid_from", "valid_to")
    )
