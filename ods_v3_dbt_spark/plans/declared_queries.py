"""Declared queries for the DuckDB-oracle correctness gate.

Each entry pairs a Spark implementation (built on the engine's
operator library) with the equivalent ANSI SQL that DuckDB executes
over the same parquet tables. These are the [Q]-marked operators from
SURVEY.md §2 re-expressed over the driver's TPC-H-ish testdata
(TESTDATA.md): the merge strategies M1-M9, window dedup W1, the
revenue aggregation A1/J1, rollups A3/A4, quality metrics Q2, and the
scalar-cleansing contract §2.4.

Cross-engine determinism rules (SURVEY §7.3 risk 3/4):

* Money/measure aggregates are summed as integer cents
  (``ROUND(x*100)`` → BIGINT) — double summation order differs
  between engines, integer sums don't. Scalar double arithmetic
  before the round is written with identical nesting on both sides
  (IEEE-deterministic).
* Timestamps are output as epoch microseconds (BIGINT both engines).
* Every window/dedup ordering is total (unique id as final
  tiebreaker).
* Aggregate results are CAST to BIGINT on the DuckDB side (DuckDB
  SUM(BIGINT) is HUGEINT).
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import cleansing as CL
from ..operators import merge as M
from ..operators import rollup as R
from .. import quality as Q

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


#: Columns the driver has generated as either parquet
#: TIMESTAMP(NANOS) (read as ns-long under ``legacy.parquet
#: .nanosAsLong``) or TIMESTAMP(MICROS) isAdjustedToUTC=false (read
#: as TIMESTAMP_NTZ). The loader normalizes both to session-local
#: µs TimestampType: ns → integer ``div`` (DuckDB truncates ns→µs
#: the same way), NTZ → plain cast (session tz is pinned UTC, so
#: the wall-clock reinterpretation is epoch-exact vs DuckDB's naive
#: timestamps).
NS_TIMESTAMP_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    dtypes = dict(df.dtypes)
    for c in NS_TIMESTAMP_COLS.get(name, ()):
        if dtypes.get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif dtypes.get(c) == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_events_windowed(
    spark: SparkSession, sf_dir: str, start: str | None = None, end: str | None = None
) -> DataFrame:
    """events scan with the window pushed to the RAW ns-long column.

    ``timestamp_micros(ts div 1000)`` is monotone, so
    ``µs(ts) >= T ⟺ ts >= T·1000`` exactly (integer floor-div, whole-µs
    bounds) — filtering before the conversion turns an unpushable
    expression predicate into parquet ``PushedFilters`` + row-group
    stats pruning. At 100 TB this is scan-everything vs scan-window.
    """
    import datetime as dt

    df = spark.read.parquet(f"{sf_dir}/events.parquet")

    def ns(lit: str) -> int:
        d = dt.datetime.fromisoformat(lit).replace(tzinfo=dt.timezone.utc)
        return int(d.timestamp()) * 1_000_000_000

    ts_dtype = dict(df.dtypes).get("ts")
    if ts_dtype == "bigint":
        if start is not None:
            df = df.filter(F.col("ts") >= F.lit(ns(start)))
        if end is not None:
            df = df.filter(F.col("ts") < F.lit(ns(end)))
        return df.withColumn("ts", F.timestamp_micros(F.expr("`ts` div 1000")))
    if ts_dtype == "timestamp_ntz":
        # Filter on the raw NTZ column with NTZ literals (pushable to
        # the parquet scan), THEN reinterpret at UTC — filtering after
        # the cast would hide the predicate behind an expression.
        if start is not None:
            df = df.filter(F.col("ts") >= F.expr(f"TIMESTAMP_NTZ '{start}'"))
        if end is not None:
            df = df.filter(F.col("ts") < F.expr(f"TIMESTAMP_NTZ '{end}'"))
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    if start is not None:
        df = df.filter(F.col("ts") >= _ts(start))
    if end is not None:
        df = df.filter(F.col("ts") < _ts(end))
    return df


def cents(col: F.Column) -> F.Column:
    """double money → integer cents; exact to sum in any order."""
    return F.round(col * 100).cast("bigint")


def ts_us(col: F.Column) -> F.Column:
    return F.unix_micros(col)


def _ts(lit: str) -> F.Column:
    return F.to_timestamp(F.lit(lit))


@dataclass(frozen=True)
class QueryDef:
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check


_REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None):
    def deco(fn):
        # Refuse silent shadowing: a duplicate registration would
        # REPLACE an existing green oracle row at import time with
        # nobody noticing (round 5 nearly shipped exactly that — a
        # second pii_redaction_stats overwrote the round-1 query).
        if name in _REGISTRY:
            raise ValueError(
                f"duplicate query registration: {name!r} is already "
                "registered — pick a distinct name"
            )
        _REGISTRY[name] = QueryDef(fn, oracle)
        return fn

    return deco


#: Registry rows added in recent rounds (7 onward). The round-12
#: verdict found the priority window frozen at its round-6 state, so
#: no round-7..12 addition ever reached a driver sample — this tuple
#: is the explicit ledger that restores (and now ENFORCES, via
#: ``tests/test_round_window.py``) SURVEY's "new rows always enter
#: the window that ships them" invariant. Convention from round 13
#: on: every ``@register`` added in a round ALSO appends its name
#: here and to ``_ROUND_WINDOW_PRIORITY``'s recent-additions block;
#: names only retire from this ledger once a ``CORRECTNESS_r*.json``
#: records them green (then they join the normal staleness rotation).
_RECENT_ADDITIONS: tuple[str, ...] = (
    # round 7 — tombstone-delete probes + SimHash index family
    "dedup_index_delete_probe",
    "dedup_index_delete_readd_probe",
    "lsh_index_delete_probe",
    "bm25_indexed_delete_topk",
    "ivf_index_delete_topk",
    "simhash_index_probe",
    "simhash_index_delete_probe",
    "ngram_jaccard_indexed_pairs",
    "fact_delete_cascade_day",
    "incremental_curation_semantic_decisions",
    # round 8 — IVFADC (PQ) index family + indexed self-pair flavors
    "pq_index_ann_topk",
    "pq_index_delete_topk",
    "hybrid_indexed_rrf_pq",
    "semantic_dedup_indexed_cells",
    "simhash_indexed_pairs",
    "deny_neardup_decisions",
    # round 10 — PQ curation channel + semantic deny
    "deny_semantic_decisions",
    "incremental_curation_pq_decisions",
    # round 12 — RM3 feedback + spec-migration rebuild
    "bm25_rm3_topk",
    "dedup_index_rebuild_probe",
    # round 13 — LSH banding-recall telemetry + store audit
    "lsh_index_recall",
    "store_audit_counts",
)

#: The driver's correctness gate hash-checks the FIRST 50 registry
#: entries per round (CORRECTNESS_r01.json stopped at entry 50
#: exactly). Registration order is therefore a scheduling decision:
#: this list pins the names that lead the current round's checked
#: window; everything else follows in registration order. Rounds 1-3
#: are on record in CORRECTNESS_r0{1,2,3}.json (all 50/50 green).
#: ROUND-13 WINDOW (the round-12 verdict's task 2 — the list had
#: been frozen since round 6, so CORRECTNESS_r7..r12 re-sampled the
#: same 50 rows): cheap warmup leads, then EVERY round-7..13
#: addition (none has a driver-sample row yet — see
#: ``_RECENT_ADDITIONS``), the three standing anchor re-checks, and
#: the remaining slots backfilled with the rows whose last driver
#: sample is oldest (round 1). Names listed but not registered are
#: ignored (the guard test asserts the list stays typo-free);
#: ``tests/test_round_window.py`` asserts every recent addition
#: lands inside the first 50.
_ROUND_WINDOW_PRIORITY: tuple[str, ...] = (
    # Cheap single-scan aggregates lead: the suite's FIRST query
    # absorbs session-residual warmup (first-plan codegen, parquet
    # page cache — measured ~6 s when a heavy pipeline ran first at
    # sf0.1), so it must land where it is absolutely small.
    "discount_band_revenue",
    "returnflag_priority_mix",
    "fk_integrity_counts",
    "nation_revenue_share",
    "cube_returnflag_status",
    # round-7..13 additions — every row _RECENT_ADDITIONS tracks, in
    # ledger order (cheapest probes lead their family)
    *_RECENT_ADDITIONS,
    # anchors re-checked early (cheap, price at near-steady state);
    # dedup_keep_first_ordered keeps its historically-red slot
    "pricing_summary",
    "revenue_by_customer",
    "dedup_keep_first_ordered",
    # staleness rotation: rows whose last driver sample is ROUND 1
    # (31 such rows exist; the 22 that fit this window's remaining
    # slots — the rest lead the round-14 rotation)
    "count_window_probe",
    "rollup_day",
    "column_profile_orders",
    "customer_balance_quartiles",
    "date_id_conversions",
    "sentinel_date_repair",
    "latest_order_per_customer",
    "order_priority_count",
    "orderpriority_quantiles",
    "orders_price_histogram",
    "regional_supplier_volume",
    "top_customers_by_revenue",
    "smallqty_part_revenue",
    "dormant_customers",
    "repeat_vs_churned_customers",
    "events_asof_enrich",
    "events_json_extract",
    "events_tumbling_daily",
    "sessionize_events",
    "skewed_agg_salted",
    "unpivot_lineitem_measures",
    "user_event_type_pivot",
)


def registry() -> dict[str, QueryDef]:
    ordered: dict[str, QueryDef] = {}
    for name in _ROUND_WINDOW_PRIORITY:
        if name in _REGISTRY:
            ordered[name] = _REGISTRY[name]
    for name, qd in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = qd
    return ordered


# ---------------------------------------------------------------------------
# Relational core — scans, filters, joins, aggregations
# ---------------------------------------------------------------------------

@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
           CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_c,
           CAST(SUM(CAST(ROUND((l_extendedprice*(1.0-l_discount))*100) AS BIGINT)) AS BIGINT) AS sum_disc_c,
           CAST(SUM(CAST(ROUND(((l_extendedprice*(1.0-l_discount))*(1.0+l_tax))*100) AS BIGINT)) AS BIGINT) AS sum_charge_c,
           CAST(COUNT(1) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped scan+agg: the engine's B1-class headline scan.

    Filter reaches the parquet scan (PushedFilters), grouping is a
    two-key partial-agg — the canonical map-side-combine shape.
    """
    li = load(spark, sf_dir, "lineitem")
    ep, d, t = F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax")
    return (
        li.filter(F.col("l_shipdate") <= _ts("2000-12-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(cents(F.col("l_quantity"))).alias("sum_qty_c"),
            F.sum(cents(ep)).alias("sum_base_c"),
            F.sum(F.round((ep * (F.lit(1.0) - d)) * 100).cast("bigint")).alias("sum_disc_c"),
            F.sum(F.round(((ep * (F.lit(1.0) - d)) * (F.lit(1.0) + t)) * 100).cast("bigint")).alias("sum_charge_c"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_REVENUE_ORACLE = """
    SELECT c.c_custkey, c.c_name, c.c_mktsegment, n.n_name,
           CAST(SUM(CAST(ROUND((l.l_extendedprice*(1.0-l.l_discount))*100) AS BIGINT)) AS BIGINT) AS revenue_c,
           CAST(SUM(CAST(ROUND((l.l_extendedprice*(1.0+l.l_tax))*100) AS BIGINT)) AS BIGINT) AS sales_c,
           CAST(COUNT(1) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_mktsegment, n.n_name
"""


@register("revenue_by_customer", _REVENUE_ORACLE)
def revenue_by_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship A1/J1 analog: filter + fact⋈fact⋈dim joins + 4-col
    group-by with two COALESCE-style money sums (reference
    ``dags/sql/ods_to_llb/extract/staging_revenue_by_employee.sql:1-26``).

    customer/nation are broadcast (small dims, J1 note in SURVEY
    §2.5); the lineitem⋈orders join shuffles on the order key with the
    date filter pushed below the join.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    ep, d, t = F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .groupBy("c_custkey", "c_name", "c_mktsegment", "n_name")
        .agg(
            F.sum(F.round((ep * (F.lit(1.0) - d)) * 100).cast("bigint")).alias("revenue_c"),
            F.sum(F.round((ep * (F.lit(1.0) + t)) * 100).cast("bigint")).alias("sales_c"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "order_priority_count",
    """
    SELECT o_orderpriority, CAST(COUNT(1) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
    GROUP BY o_orderpriority
    """,
)
def order_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed count probe per group (A2-class, over a date window)."""
    return (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= _ts("1997-01-01"))
            & (F.col("o_orderdate") < _ts("1997-07-01"))
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "top_customers_by_revenue",
    f"""
    SELECT * FROM ({_REVENUE_ORACLE})
    ORDER BY revenue_c DESC, c_custkey ASC
    LIMIT 10
    """,
)
def top_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic top-k: total order (revenue desc, key asc) then
    LIMIT — the only sort+limit shape the reference has (§2.8)."""
    return revenue_by_customer(spark, sf_dir).orderBy(
        F.col("revenue_c").desc(), F.col("c_custkey").asc()
    ).limit(10)


@register(
    "count_window_probe",
    """
    SELECT CAST(COUNT(1) AS BIGINT) AS n_rows
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'
    """,
)
def count_window_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: half-open cursor-window COUNT probe
    (``helper1/optimize_compute.py:27-57``). Window pushed to the raw
    column → parquet PushedFilters (see ``load_events_windowed``)."""
    return load_events_windowed(
        spark, sf_dir, "2024-01-10", "2024-01-20"
    ).agg(F.count(F.lit(1)).alias("n_rows"))


@register(
    "max_freshness_probe",
    "SELECT CAST(epoch_us(MAX(ts)) AS BIGINT) AS max_ts_us FROM events",
)
def max_freshness_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: MAX-freshness probe driving conditional rollups
    (``update_datamart.sql:8-17``)."""
    return load(spark, sf_dir, "events").agg(ts_us(F.max("ts")).alias("max_ts_us"))


# ---------------------------------------------------------------------------
# Merge strategies M1-M9 (targets/sources derived deterministically
# from the events/lineitem tables; outputs in cents / epoch-us)
# ---------------------------------------------------------------------------

_EVENT_COLS = "event_id user_id event_type value ts".split()


def _events_proj(spark, sf_dir):
    return load(spark, sf_dir, "events").select(*_EVENT_COLS)


@register(
    "merge_upsert_single",
    """
    WITH tgt AS (
      SELECT event_id, user_id, event_type, value, ts FROM events
      WHERE ts < TIMESTAMP '2024-01-20'
    ), src AS (
      SELECT event_id, user_id, event_type, value + 1.0 AS value, ts FROM events
      WHERE ts >= TIMESTAMP '2024-01-15'
    )
    SELECT event_id, user_id, event_type,
           CAST(ROUND(value*100) AS BIGINT) AS value_c,
           CAST(epoch_us(ts) AS BIGINT) AS ts_us
    FROM (
      SELECT * FROM src
      UNION ALL
      SELECT t.* FROM tgt t WHERE NOT EXISTS (
        SELECT 1 FROM src s WHERE s.event_id = t.event_id)
    )
    """,
)
def merge_upsert_single(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1: SCD-1 single-key upsert, source wins
    (``casreport_mailsitemhdr.sql:1-399``). Target = history slice,
    source = overlapping newer slice with changed measures."""
    ev = _events_proj(spark, sf_dir)
    tgt = ev.filter(F.col("ts") < _ts("2024-01-20"))
    src = ev.filter(F.col("ts") >= _ts("2024-01-15")).withColumn(
        "value", F.col("value") + F.lit(1.0)
    )
    return M.merge_upsert(tgt, src, ["event_id"]).select(
        "event_id", "user_id", "event_type",
        cents(F.col("value")).alias("value_c"),
        ts_us(F.col("ts")).alias("ts_us"),
    )


@register(
    "merge_upsert_composite",
    """
    WITH tgt AS (
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem
      WHERE l_shipdate < TIMESTAMP '1998-01-01'
    ), src AS (
      SELECT l_orderkey, l_linenumber, l_quantity + 5.0 AS l_quantity, l_extendedprice
      FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-06-01'
    )
    SELECT l_orderkey, l_linenumber,
           CAST(ROUND(l_quantity*100) AS BIGINT) AS qty_c,
           CAST(ROUND(l_extendedprice*100) AS BIGINT) AS price_c
    FROM (
      SELECT * FROM src
      UNION ALL
      SELECT t.* FROM tgt t WHERE NOT EXISTS (
        SELECT 1 FROM src s
        WHERE s.l_orderkey = t.l_orderkey AND s.l_linenumber = t.l_linenumber)
    )
    """,
)
def merge_upsert_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2: composite-key upsert (``casreport_settlements.sql:3``)."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate"
    )
    tgt = li.filter(F.col("l_shipdate") < _ts("1998-01-01")).drop("l_shipdate")
    src = (
        li.filter(F.col("l_shipdate") >= _ts("1997-06-01"))
        .drop("l_shipdate")
        .withColumn("l_quantity", F.col("l_quantity") + F.lit(5.0))
    )
    return M.merge_upsert(tgt, src, ["l_orderkey", "l_linenumber"]).select(
        "l_orderkey", "l_linenumber",
        cents(F.col("l_quantity")).alias("qty_c"),
        cents(F.col("l_extendedprice")).alias("price_c"),
    )


def _fresh_oracle(tie_order: str) -> str:
    return f"""
    WITH t0 AS (
      SELECT user_id, CAST(strftime(ts, '%Y%m%d') AS INT) AS day_id, value, event_type, event_id
      FROM events WHERE ts < TIMESTAMP '2024-01-16'
    ), tgt AS (
      SELECT user_id, day_id, value, event_type, event_id FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY day_id DESC, event_id ASC) AS rn
        FROM t0) WHERE rn = 1
    ), s0 AS (
      SELECT user_id, CAST(strftime(ts, '%Y%m%d') AS INT) AS day_id, value + 10.0 AS value, event_type, event_id
      FROM events WHERE ts >= TIMESTAMP '2024-01-08'
    ), src AS (
      SELECT user_id, day_id, value, event_type, event_id FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY day_id DESC, event_id ASC) AS rn
        FROM s0) WHERE rn = 1
    ), u AS (
      SELECT *, 0 AS is_src FROM tgt
      UNION ALL
      SELECT *, 1 AS is_src FROM src
    )
    SELECT user_id, day_id, CAST(ROUND(value*100) AS BIGINT) AS value_c, event_type, event_id
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY day_id DESC, is_src {tie_order}) AS rn2
      FROM u) WHERE rn2 = 1
    """


def _merge_fresh(spark: SparkSession, sf_dir: str, tie_update: bool) -> DataFrame:
    order = [F.col("day_id").desc(), F.col("event_id").asc()]
    ev_all = _events_proj(spark, sf_dir)
    tgt = M.dedup_keep_first(
        ev_all.filter(F.col("ts") < _ts("2024-01-16"))
        .withColumn("day_id", CL.day_id(F.col("ts")))
        .drop("ts"),
        ["user_id"],
        order,
    )
    src = M.dedup_keep_first(
        ev_all.filter(F.col("ts") >= _ts("2024-01-08"))
        .withColumn("day_id", CL.day_id(F.col("ts")))
        .withColumn("value", F.col("value") + F.lit(10.0))
        .drop("ts"),
        ["user_id"],
        order,
    )
    merged = M.merge_upsert_fresh(tgt, src, ["user_id"], "day_id", tie_update=tie_update)
    return merged.select(
        "user_id", "day_id", cents(F.col("value")).alias("value_c"),
        "event_type", "event_id",
    )


@register("merge_fresh_tie_keep_target", _fresh_oracle("ASC"))
def merge_fresh_tie_keep_target(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 with ``des.ts < src.ts`` gate — ties keep the target row
    (``bccp_item.sql:175``). Day-granularity cursor manufactures real
    ties between the overlapping slices."""
    return _merge_fresh(spark, sf_dir, tie_update=False)


@register("merge_fresh_tie_take_source", _fresh_oracle("DESC"))
def merge_fresh_tie_take_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 with ``src.ts >= des.ts`` gate — ties take the source row
    (``khl_portal_billing_result.sql:3-4``)."""
    return _merge_fresh(spark, sf_dir, tie_update=True)


@register(
    "dedup_window_keep_oldest",
    """
    SELECT user_id, event_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS ts_us
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts ASC, event_type DESC, event_id ASC) AS rn
      FROM events) WHERE rn = 1
    """,
)
def dedup_window_keep_oldest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/M4: the reference's dedup window — ascending order keeps the
    *oldest* row per key, tiebreak status DESC
    (``hrm_employee.sql:23,51``; quirk preserved deliberately)."""
    ev = _events_proj(spark, sf_dir)
    out = M.dedup_keep_first(
        ev, ["user_id"],
        [F.col("ts").asc(), F.col("event_type").desc(), F.col("event_id").asc()],
    )
    return out.select("user_id", "event_id", "event_type", ts_us(F.col("ts")).alias("ts_us"))


@register(
    "merge_nullsafe_composite",
    """
    WITH tgt AS (
      SELECT nullif(event_type, 'view') AS k1, user_id % 5 AS k2,
             CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS revenue_c,
             CAST(COUNT(1) AS BIGINT) AS n
      FROM events WHERE ts < TIMESTAMP '2024-01-16' GROUP BY 1, 2
    ), src AS (
      SELECT nullif(event_type, 'view') AS k1, user_id % 5 AS k2,
             CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS revenue_c,
             CAST(COUNT(1) AS BIGINT) AS n
      FROM events WHERE ts >= TIMESTAMP '2024-01-16' GROUP BY 1, 2
    )
    SELECT * FROM src
    UNION ALL
    SELECT t.* FROM tgt t WHERE NOT EXISTS (
      SELECT 1 FROM src s
      WHERE (s.k1 IS NOT DISTINCT FROM t.k1) AND (s.k2 IS NOT DISTINCT FROM t.k2))
    """,
)
def merge_nullsafe_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5: null-safe composite-key merge — NULL keys match NULL keys
    (``ods_to_llb/update_des_table/staging_revenue_by_employee.sql:3-12``,
    MSSQL ``ISNULL(c,'')=ISNULL(c,'')``; Spark ``<=>``)."""
    ev = _events_proj(spark, sf_dir)

    def grp(df):
        return (
            df.withColumn("k1", F.nullif(F.col("event_type"), F.lit("view")))
            .withColumn("k2", F.col("user_id") % 5)
            .groupBy("k1", "k2")
            .agg(
                F.sum(cents(F.col("value"))).alias("revenue_c"),
                F.count(F.lit(1)).alias("n"),
            )
        )

    tgt = grp(ev.filter(F.col("ts") < _ts("2024-01-16")))
    src = grp(ev.filter(F.col("ts") >= _ts("2024-01-16")))
    return M.merge_upsert(tgt, src, ["k1", "k2"], null_safe=True)


@register(
    "delete_insert_window",
    """
    WITH src AS (
      SELECT event_id, value + 10.0 AS value, ts FROM events
      WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-15'
    )
    SELECT event_id, CAST(ROUND(value*100) AS BIGINT) AS value_c,
           CAST(epoch_us(ts) AS BIGINT) AS ts_us
    FROM (
      SELECT event_id, value, ts FROM events
      WHERE NOT (ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-15')
      UNION ALL
      SELECT * FROM src
    )
    """,
)
def delete_insert_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6: half-open window DELETE + INSERT
    (``casreport_rpt_full_item.sql:1-7``)."""
    ev = load(spark, sf_dir, "events").select("event_id", "value", "ts")
    src = ev.filter(
        (F.col("ts") >= _ts("2024-01-10")) & (F.col("ts") < _ts("2024-01-15"))
    ).withColumn("value", F.col("value") + F.lit(10.0))
    out = M.delete_insert_window(
        ev, src, "ts",
        _dt.datetime(2024, 1, 10), _dt.datetime(2024, 1, 15),
    )
    return out.select(
        "event_id", cents(F.col("value")).alias("value_c"), ts_us(F.col("ts")).alias("ts_us")
    )


@register(
    "partition_overwrite_days",
    """
    WITH src AS (
      SELECT event_id, CAST(strftime(ts, '%Y%m%d') AS INT) AS day_id, value + 20.0 AS value
      FROM events WHERE ts >= TIMESTAMP '2024-01-29'
    )
    SELECT event_id, day_id, CAST(ROUND(value*100) AS BIGINT) AS value_c
    FROM (
      SELECT event_id, CAST(strftime(ts, '%Y%m%d') AS INT) AS day_id, value
      FROM events
      WHERE CAST(strftime(ts, '%Y%m%d') AS INT) NOT IN (SELECT DISTINCT day_id FROM src)
      UNION ALL
      SELECT * FROM src
    )
    """,
)
def partition_overwrite_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7: overwrite exactly the day-partitions present in the source
    (``pns/item_delivery_detail.sql:1-6``); physical path is dynamic
    partition overwrite."""
    ev = load(spark, sf_dir, "events").select(
        "event_id", CL.day_id(F.col("ts")).alias("day_id"), "value", "ts"
    )
    tgt = ev.drop("ts")
    src = (
        ev.filter(F.col("ts") >= _ts("2024-01-29"))
        .drop("ts")
        .withColumn("value", F.col("value") + F.lit(20.0))
    )
    out = M.partition_overwrite(tgt, src, ["day_id"])
    return out.select("event_id", "day_id", cents(F.col("value")).alias("value_c"))


_CLEAN_SQL = (
    "CASE WHEN trim(regexp_replace({col}, '[\\r\\n\\x00]', '', 'g')) IN ('', 'NULL', 'nan') "
    "THEN NULL ELSE trim(regexp_replace({col}, '[\\r\\n\\x00]', '', 'g')) END"
)


@register(
    "full_refresh_clean_dim",
    f"""
    SELECT c_custkey,
           {_CLEAN_SQL.format(col="(' ' || c_name || chr(13))")} AS name_clean,
           lower(c_mktsegment) AS mkt_lower,
           CAST(ROUND(COALESCE(c_acctbal, 0.0)*100) AS BIGINT) AS acctbal_c,
           c_nationkey
    FROM customer
    """,
)
def full_refresh_clean_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M8 + §2.4: full-refresh dimension load through the cleansing
    contract (scrub control chars, trim, empty→NULL, COALESCE(x,0))
    (``cms/update_des_table/customers.sql:1-2``; ``bccp_to_ods.py:243``).
    Dirt is synthesized (pad + CR) so the scrub provably fires."""
    c = load(spark, sf_dir, "customer")
    dirty = F.concat(F.lit(" "), F.col("c_name"), F.lit("\r"))
    return c.select(
        "c_custkey",
        CL.clean_string(dirty).alias("name_clean"),
        F.lower(F.col("c_mktsegment")).alias("mkt_lower"),
        cents(F.coalesce(F.col("c_acctbal"), F.lit(0.0))).alias("acctbal_c"),
        "c_nationkey",
    )


#: Total tiebreak for keep-one dedup over lineitem: the fixture
#: deliberately contains duplicate (l_orderkey, l_linenumber) keys
#: (11,785 groups at sf0.01), so ordering by l_linenumber alone is
#: NOT total and Spark/DuckDB break the rn=1 tie differently (the
#: round-1 driver hash failure). Ordering by EVERY column makes the
#: only remaining ties full-duplicate rows, whose winner is
#: value-identical — deterministic on both engines by construction.
_LINEITEM_TOTAL_ORDER = (
    "l_linenumber l_partkey l_suppkey l_quantity l_extendedprice "
    "l_discount l_tax l_returnflag l_linestatus l_shipdate"
).split()


@register(
    "dedup_keep_first_ordered",
    f"""
    SELECT l_orderkey, l_linenumber, CAST(ROUND(l_quantity*100) AS BIGINT) AS qty_c
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY l_orderkey
        ORDER BY {', '.join(c + ' ASC' for c in _LINEITEM_TOTAL_ORDER)}) AS rn
      FROM lineitem) WHERE rn = 1
    """,
)
def dedup_keep_first_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7/M9: keep-first dedup with the arbitrary pandas order pinned
    to an explicit deterministic ordering (SURVEY §2.6 A7 note). The
    ordering is TOTAL (all non-key columns as tiebreak) because the
    fixture has duplicate (l_orderkey, l_linenumber) keys."""
    li = load(spark, sf_dir, "lineitem")
    out = M.dedup_keep_first(
        li, ["l_orderkey"], [F.col(c).asc() for c in _LINEITEM_TOTAL_ORDER]
    )
    return out.select("l_orderkey", "l_linenumber", cents(F.col("l_quantity")).alias("qty_c"))


@register(
    "incremental_watermark",
    """
    SELECT event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us
    FROM events
    WHERE ts > (SELECT COALESCE(MAX(ts), TIMESTAMP '1900-01-01')
                FROM events WHERE ts < TIMESTAMP '2024-01-20')
    """,
)
def incremental_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt incremental high-watermark filter
    (``dim_casreport_services.sql:25-30``): source rows newer than
    MAX(target watermark); watermark computed distributed + broadcast,
    no driver round-trip."""
    ev = load(spark, sf_dir, "events").select("event_id", "ts")
    tgt = ev.filter(F.col("ts") < _ts("2024-01-20"))
    out = M.incremental_watermark_filter(tgt, ev, "ts")
    return out.select("event_id", ts_us(F.col("ts")).alias("ts_us"))


@register(
    "masked_extract",
    """
    SELECT c_custkey,
           CAST(NULL AS VARCHAR) AS c_name_masked,
           c_mktsegment,
           CAST(ROUND(COALESCE(c_acctbal, 0) * 100) AS BIGINT) AS acctbal_c
    FROM customer
    """,
)
def masked_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4/S6: inline-anonymized extract — PII columns projected as
    NULL at source (``khl_to_ods_backdate.py:225-247`` nulls
    CUSTOMER_EMAIL/ADD/PHONE; ``bccp/extract/bccp_item.sql:7-9``
    masks to ''), measures COALESCE-defaulted
    (``transformations.sql:19-21``). Masking in the projection means
    the sensitive column never leaves the scan."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        CL.mask_pii(F.col("c_name")).alias("c_name_masked"),
        "c_mktsegment",
        cents(CL.coalesce_zero(F.col("c_acctbal"))).alias("acctbal_c"),
    )


@register(
    "events_tumbling_daily",
    """
    SELECT CAST(epoch_us(date_trunc('day', ts)) AS BIGINT) AS window_start_us,
           event_type,
           CAST(COUNT(1) AS BIGINT) AS n_events,
           CAST(ROUND(SUM(COALESCE(value, 0)) * 100) AS BIGINT) AS value_c
    FROM events
    GROUP BY 1, 2
    """,
)
def events_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.11: tumbling daily window aggregation via ``F.window`` — the
    batch twin of the streaming windowed agg (same expression works
    under readStream + watermark; the reference's cron slices are this
    with the window precomputed by the scheduler)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window(F.col("ts"), "1 day").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            cents(F.sum(CL.coalesce_zero(F.col("value")))).alias("value_c"),
        )
        .select(
            ts_us(F.col("w.start")).alias("window_start_us"),
            "event_type", "n_events", "value_c",
        )
    )


# ---------------------------------------------------------------------------
# Scalar transforms / date-ids / sentinel repair (§2.4)
# ---------------------------------------------------------------------------

@register(
    "scalar_cleanse_strings",
    f"""
    SELECT doc_id,
           {_CLEAN_SQL.format(col="('  ' || text || chr(13) || chr(10))")} AS text_clean,
           CAST(length({_CLEAN_SQL.format(col="('  ' || text || chr(13) || chr(10))")}) AS INT) AS clean_len,
           lang, source
    FROM documents
    """,
)
def scalar_cleanse_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.4 string contract over documents: scrub \\r/\\n/\\x00, trim,
    empty→NULL (``bccp_to_ods.py:243``, ``transformations.sql:4-6``)."""
    d = load(spark, sf_dir, "documents")
    dirty = F.concat(F.lit("  "), F.col("text"), F.lit("\r\n"))
    clean = CL.clean_string(dirty)
    return d.select(
        "doc_id",
        clean.alias("text_clean"),
        F.length(clean).cast("int").alias("clean_len"),
        "lang", "source",
    )


@register(
    "date_id_conversions",
    """
    SELECT event_id,
           CAST(strftime(ts, '%Y%m%d') AS INT) AS day_id,
           CAST(floor(CAST(strftime(ts, '%Y%m%d') AS INT) / 100) AS INT) AS month_id,
           CAST(strftime(ts, '%H') AS INT) AS hour_of_day
    FROM events
    """,
)
def date_id_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """yyyymmdd int day-ids + integer-division month-ids — the
    reference's date-id convention (``casreport_to_ods.py:132-135``,
    ``update_datamart.sql:22-24``)."""
    ev = load(spark, sf_dir, "events")
    day = CL.day_id(F.col("ts"))
    return ev.select(
        "event_id",
        day.alias("day_id"),
        CL.month_id_from_day_id(day).alias("month_id"),
        F.date_format(F.col("ts"), "HH").cast("int").alias("hour_of_day"),
    )


@register(
    "sentinel_date_repair",
    """
    WITH base AS (
      SELECT o_orderkey,
             CASE WHEN year(o_orderdate) >= 2000 THEN TIMESTAMP '2261-12-31' ELSE o_orderdate END AS d,
             CASE WHEN o_orderkey % 7 = 0 THEN TIMESTAMP '0500-01-01' ELSE o_orderdate END AS dob
      FROM orders
    )
    SELECT o_orderkey,
           CAST(epoch_us(CASE WHEN year(d) = 2261 THEN TIMESTAMP '9999-12-31' ELSE d END) AS BIGINT) AS repaired_us,
           CAST(epoch_us(CASE WHEN year(dob) < 1000 THEN NULL ELSE dob END) AS BIGINT) AS dob_us
    FROM base
    """,
)
def sentinel_date_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentinel-date round-trip (2261↔9999,
    ``casreport_d_service_product.sql:9-17``) + pre-1000-CE date
    sanitation (``cms/extract/customers.sql:7-8``). Sentinels are
    synthesized since the testdata has none."""
    o = load(spark, sf_dir, "orders")
    d = F.when(F.year("o_orderdate") >= 2000, _ts("2261-12-31")).otherwise(F.col("o_orderdate"))
    dob = F.when(F.col("o_orderkey") % 7 == 0, _ts("0500-01-01")).otherwise(F.col("o_orderdate"))
    return o.select(
        "o_orderkey",
        ts_us(CL.restore_sentinel_date(d)).alias("repaired_us"),
        ts_us(CL.null_bad_dates(dob, min_year=1000)).alias("dob_us"),
    )


# ---------------------------------------------------------------------------
# Rollups A3/A4 + quality Q2
# ---------------------------------------------------------------------------

_ROLLUP_DAY_SQL = """
    SELECT event_type, CAST(strftime(ts, '%Y%m%d') AS INT) AS day_id,
           CAST(COUNT(1) AS BIGINT) AS item_count,
           CAST(SUM(CAST(ROUND(COALESCE(value, 0.0)*100) AS BIGINT)) AS BIGINT) AS value_c
    FROM events
    GROUP BY event_type, CAST(strftime(ts, '%Y%m%d') AS INT)
"""


@register("rollup_day", _ROLLUP_DAY_SQL)
def rollup_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 day rollup: per (event_type, day) count + COALESCE-sum —
    declared measure spec for the reference's closed-source
    ``sp_item_general_pos_day`` (``update_datamart.sql:19-25``)."""
    ev = load(spark, sf_dir, "events").withColumn("day_id", CL.day_id(F.col("ts")))
    return R.rollup_day(
        ev, ["event_type"], "day_id",
        {
            "item_count": F.count(F.lit(1)),
            "value_c": F.sum(cents(F.coalesce(F.col("value"), F.lit(0.0)))),
        },
    )


@register(
    "rollup_month",
    f"""
    SELECT event_type, CAST(floor(day_id / 100) AS INT) AS month_id,
           CAST(SUM(item_count) AS BIGINT) AS item_count,
           CAST(SUM(value_c) AS BIGINT) AS value_c
    FROM ({_ROLLUP_DAY_SQL})
    GROUP BY event_type, CAST(floor(day_id / 100) AS INT)
    """,
)
def rollup_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 month rollup re-aggregating the (tiny) day table, not the
    fact — at 100 TB this scans the fact once, not twice."""
    return R.rollup_month_from_day(rollup_day(spark, sf_dir), ["event_type"], "day_id")


@register(
    "fact_delete_cascade_day",
    """
    SELECT event_type, CAST(strftime(ts, '%Y%m%d') AS INT) AS day_id,
           CAST(COUNT(1) AS BIGINT) AS item_count,
           CAST(SUM(CAST(ROUND(COALESCE(value, 0.0)*100) AS BIGINT)) AS BIGINT)
             AS value_c
    FROM events
    WHERE NOT user_id % 13 = 4
    GROUP BY event_type, CAST(strftime(ts, '%Y%m%d') AS INT)
    """,
)
def fact_delete_cascade_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 DELETE cascaded into the A4 datamarts, hash-verified
    (operators/rollup.py::fact_delete_cascade — round 7, the
    relational twin of ``corpus_takedown``): the events fact + its
    day/month rollups commit as one TableGroup; then every event of
    the opted-out users (``user_id % 13 = 4``) is deleted and ONLY
    the affected days' rollup rows re-derive from the reduced fact —
    untouched days carry over without recompute, a day whose rows
    all vanished disappears, and fact + day + month flip behind ONE
    manifest replace. The oracle re-aggregates the reduced fact from
    scratch, so what is value-checked is that the carry-over +
    affected-day-delta merge equals a full recompute — the
    correctness trap in every incremental-delete datamart. Reference
    anchor: the one-Postgres-transaction delete+refresh discipline
    (casreport_rpt_full_item.sql:1-3, update_datamart.sql:4-27)."""
    from ..operators.rollup import fact_delete_cascade
    from ..sinks import TableGroup, _warehouse_path

    import re as _re

    slug = _re.sub(r"[^0-9a-zA-Z]+", "_", sf_dir.strip("/"))
    group = TableGroup(
        _warehouse_path(spark) / f"cascade_{slug}", ("fact", "day", "month")
    )
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        CL.day_id(F.col("ts")).alias("day_id"),
        "value",
        "user_id",
    )
    aggs = {
        "item_count": F.count(F.lit(1)),
        "value_c": F.sum(cents(F.coalesce(F.col("value"), F.lit(0.0)))),
    }
    day0 = R.rollup_day(ev, ["event_type"], "day_id", aggs)
    group.commit(
        {"fact": ev, "day": day0,
         "month": R.rollup_month_from_day(day0, ["event_type"], "day_id")}
    )
    keys = ev.filter(F.col("user_id") % 13 == 4).select("user_id")
    fact_delete_cascade(
        spark, group, keys, ["user_id"], ["event_type"], "day_id", aggs
    )
    return group.read(spark)["day"]


@register(
    "quality_assertion_metrics",
    """
    SELECT CAST(COUNT(1) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT COALESCE(CAST(o_orderkey AS VARCHAR), ' ')) AS BIGINT) AS n_distinct_keys,
           CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_o_orderkey
    FROM orders
    """,
)
def quality_assertion_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2: dbt not_null/unique/count>0 assertions folded into one
    aggregate pass (``dbt/models/staging/casreport/schema.yml:1-53``)."""
    return Q.assertion_metrics(load(spark, sf_dir, "orders"), ["o_orderkey"])


@register(
    "skewed_agg_salted",
    """
    SELECT event_type,
           CAST(COUNT(1) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(COALESCE(value, 0.0)*100) AS BIGINT)) AS BIGINT) AS value_c,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY event_type
    """,
)
def skewed_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over the skewed ``event_type`` key
    (a handful of values across the whole fact — the shape of the
    reference's status-code group-bys, ``bccp_item_status.sql:8``).

    Salting is semantics-preserving, so the oracle is the plain GROUP
    BY; phase 1 fans each hot key over 16 salts with map-side partial
    aggregation, phase 2 merges 16 partials per key. The exact COUNT
    DISTINCT is *not* salted: it shuffles on the high-cardinality
    ``(event_type, user_id)`` pair (naturally unskewed), then counts
    per key — the scalable exact-distinct shape. The two tiny per-key
    aggregates meet in a broadcastable join.
    """
    from ..operators.skew import salted_agg

    ev = load(spark, sf_dir, "events")
    measures = salted_agg(
        ev,
        ["event_type"],
        {
            "n_events": F.count(F.lit(1)),
            "value_c": F.sum(cents(F.coalesce(F.col("value"), F.lit(0.0)))),
        },
        salt_col="event_id",
    )
    users = (
        ev.select("event_type", "user_id")
        .filter(F.col("user_id").isNotNull())  # COUNT(DISTINCT x) skips NULLs
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    return measures.join(F.broadcast(users), "event_type", "left").select(
        "event_type",
        "n_events",
        "value_c",
        F.coalesce("n_users", F.lit(0)).cast("bigint").alias("n_users"),
    )


_PROFILE_COLS = ("o_orderstatus", "o_orderpriority", "o_orderkey", "o_custkey")

_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""
    SELECT '{c}' AS col_name,
           CAST(COUNT(1) AS BIGINT) AS n_rows,
           CAST(COUNT(1) - COUNT({c}) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(MIN({c}) AS VARCHAR) AS min_val,
           CAST(MAX({c}) AS VARCHAR) AS max_val
    FROM orders
    """
    for c in _PROFILE_COLS
)


@register("column_profile_orders", _PROFILE_ORACLE)
def column_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profiler (``quality.column_profile``): one
    aggregation computes null/distinct/min/max for every column, then
    ``stack`` unpivots to a row per column. The oracle is the naive
    per-column UNION ALL — same result, N scans; the engine's point is
    doing it in one."""
    cols = [c for c in _PROFILE_COLS]
    return Q.column_profile(load(spark, sf_dir, "orders"), cols)


@register(
    "sessionize_events",
    """
    WITH e AS (
      SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS t FROM events
    ), marked AS (
      SELECT user_id, t,
             CASE WHEN LAG(t) OVER w IS NULL
                       OR t - LAG(t) OVER w > 1800000000 THEN 1 ELSE 0 END AS is_new
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)
    ), sess AS (
      SELECT user_id, t,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY t
                               ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
      FROM marked
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           CAST(COUNT(1) AS BIGINT) AS n_events,
           CAST(MIN(t) AS BIGINT) AS session_start,
           CAST(MAX(t) AS BIGINT) AS session_end,
           CAST(MAX(t) - MIN(t) AS BIGINT) AS duration
    FROM sess GROUP BY user_id, session_idx
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gap sessionization (30-min gap) + per-session stats
    (``operators/sessionize.py``) — the batch twin of the stateful
    streaming sessionizer. One exchange+sort on user_id, then a
    groupBy; no self-joins."""
    from ..operators.sessionize import session_stats

    ev = load(spark, sf_dir, "events").select(
        "user_id", ts_us(F.col("ts")).alias("t")
    )
    out = session_stats(ev, ["user_id"], "t", gap=30 * 60 * 1_000_000)
    return out.select(
        "user_id",
        F.col("session_idx").cast("bigint").alias("session_idx"),
        "n_events",
        "session_start",
        "session_end",
        "duration",
    )


@register(
    "rollup_returnflag_status",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_c,
           CAST(COUNT(1) AS BIGINT) AS n_items
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP (leaf / per-flag / grand total in one
    pass): the multi-level datamart rollup A4 expressed as grouping
    sets — one Expand + one shuffle instead of three scans. (SURVEY
    §2.6 notes the reference does day→month manually; this is the
    engine-added one-pass form.)"""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(cents(F.col("l_extendedprice"))).alias("sum_base_c"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "top_events_per_user",
    """
    SELECT user_id, event_id, value_c, rn FROM (
      SELECT user_id, event_id,
             CAST(ROUND(value*100) AS BIGINT) AS value_c,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY user_id
               ORDER BY CAST(ROUND(value*100) AS BIGINT) DESC, event_id
             ) AS INT) AS rn
      FROM events WHERE event_type = 'purchase'
    ) WHERE rn <= 3
    """,
)
def top_events_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via ranked window with a total order
    (value desc, event_id as unique tiebreaker — deterministic across
    engines). Spark pushes the rn<=3 predicate into the window sort as
    a group-limit, so each partition keeps only k rows through the
    shuffle."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    vc = cents(F.col("value"))
    w = Window.partitionBy("user_id").orderBy(vc.desc(), F.col("event_id"))
    return (
        ev.select(
            "user_id", "event_id", vc.alias("value_c"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "events_asof_enrich",
    """
    WITH l AS (
      SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS t
      FROM events WHERE event_type = 'view'
    ), r AS (
      SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS rt,
             CAST(MAX(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS last_purchase_c
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, CAST(epoch_us(ts) AS BIGINT)
    )
    SELECT l.event_id, l.user_id, l.t, r.rt AS rt_matched, r.last_purchase_c
    FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.t >= r.rt
    """,
)
def events_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of enrichment: each 'view' event gets the user's most recent
    'purchase' amount at-or-before its timestamp (point-in-time
    lookup; ``operators/asof.py``). The right side is pre-aggregated
    to one row per (user, time) so tie-carrying is deterministic on
    both engines. Union+window plan: one exchange + one sort on
    user_id, no range-join pair explosion.
    """
    from ..operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    l = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", ts_us(F.col("ts")).alias("t")
    )
    r = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", ts_us(F.col("ts")).alias("rt"))
        .agg(F.max(cents(F.col("value"))).alias("last_purchase_c"))
    )
    return asof_join(l, r, ["user_id"], "t", "rt", ["last_purchase_c"])


#: 2024-01-01T00:00:00Z in epoch µs — anchor for the deterministic
#: synthetic service windows derived from dim keys (range-join queries).
_SVC_BASE_US = 1_704_067_200_000_000
_HOUR_US = 3_600_000_000
_DAY_US = 86_400_000_000


def _supplier_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier half-open service window inside the events month:
    start = base + (suppkey % 720) hours, length = (suppkey % 36)+1
    hours. Pure integer arithmetic on the key — identical on both
    engines, no data dependence."""
    return load(spark, sf_dir, "supplier").select(
        "s_suppkey",
        (F.lit(_SVC_BASE_US) + (F.col("s_suppkey") % 720) * F.lit(_HOUR_US)).alias("lo"),
        (
            F.lit(_SVC_BASE_US)
            + (F.col("s_suppkey") % 720) * F.lit(_HOUR_US)
            + ((F.col("s_suppkey") % 36) + 1) * F.lit(_HOUR_US)
        ).alias("hi"),
    )


_SUPPLIER_WINDOWS_SQL = """
      SELECT s_suppkey,
             1704067200000000 + (s_suppkey % 720) * 3600000000 AS lo,
             1704067200000000 + (s_suppkey % 720) * 3600000000
               + ((s_suppkey % 36) + 1) * 3600000000 AS hi
      FROM supplier
"""


@register(
    "events_in_service_windows",
    f"""
    WITH iv AS ({_SUPPLIER_WINDOWS_SQL}),
    e AS (SELECT CAST(epoch_us(ts) AS BIGINT) AS t, value FROM events)
    SELECT iv.s_suppkey,
           CAST(COUNT(1) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(e.value*100) AS BIGINT)) AS BIGINT) AS sum_value_c
    FROM e JOIN iv ON e.t >= iv.lo AND e.t < iv.hi
    GROUP BY iv.s_suppkey
    """,
)
def events_in_service_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join (``operators/rangejoin.py``):
    events landing inside each supplier's service window, aggregated
    per supplier. Banded rewrite — points bucket once, intervals
    replicate to covered 6h buckets, hash equi-join on bucket id +
    residual range predicate. No BroadcastNestedLoopJoin/cartesian:
    the plan is an ordinary equi-join AQE can treat like any other."""
    from ..operators.rangejoin import point_in_interval_join

    pts = load(spark, sf_dir, "events").select(
        ts_us(F.col("ts")).alias("t"), "value"
    )
    iv = _supplier_windows(spark, sf_dir)
    joined = point_in_interval_join(pts, iv, "t", "lo", "hi", 6 * _HOUR_US)
    return joined.groupBy("s_suppkey").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(cents(F.col("value"))).alias("sum_value_c"),
    )


@register(
    "service_window_overlaps",
    f"""
    WITH sup AS ({_SUPPLIER_WINDOWS_SQL}),
    nat AS (
      SELECT n_nationkey,
             1704067200000000 + (n_nationkey % 30) * 86400000000 AS nlo,
             1704067200000000 + (n_nationkey % 30) * 86400000000
               + ((n_nationkey % 5) + 1) * 86400000000 AS nhi
      FROM nation
    )
    SELECT n.n_nationkey, s.s_suppkey,
           CAST(LEAST(n.nhi, s.hi) - GREATEST(n.nlo, s.lo) AS BIGINT) AS overlap_us
    FROM nat n JOIN sup s ON n.nlo < s.hi AND s.lo < n.nhi
    """,
)
def service_window_overlaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap range join: nation maintenance windows (days)
    × supplier service windows (hours), one row per overlapping pair
    with the overlap length. Each pair is emitted exactly once — in
    the bucket where the overlap starts — so there is NO
    distinct/dedup shuffle after the join."""
    from ..operators.rangejoin import interval_overlap_join

    nat = load(spark, sf_dir, "nation").select(
        "n_nationkey",
        (F.lit(_SVC_BASE_US) + (F.col("n_nationkey") % 30) * F.lit(_DAY_US)).alias("nlo"),
        (
            F.lit(_SVC_BASE_US)
            + (F.col("n_nationkey") % 30) * F.lit(_DAY_US)
            + ((F.col("n_nationkey") % 5) + 1) * F.lit(_DAY_US)
        ).alias("nhi"),
    )
    sup = _supplier_windows(spark, sf_dir)
    pairs = interval_overlap_join(nat, sup, "nlo", "nhi", "lo", "hi", _DAY_US)
    return pairs.select(
        "n_nationkey",
        "s_suppkey",
        (F.least("nhi", "hi") - F.greatest("nlo", "lo")).alias("overlap_us"),
    )


@register(
    "regional_supplier_volume",
    """
    SELECT n_name,
           CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT)
             AS revenue_c,
           CAST(COUNT(1) AS BIGINT) AS n_items
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def regional_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shape six-table join: local-supplier revenue per
    nation in one region-year. The deep join tree is left entirely to
    Catalyst: dims (region/nation/supplier/customer) broadcast under
    the default threshold, the date filter prunes orders before the
    fact join, and only the orders⋈lineitem join shuffles. The test
    suite asserts the dim joins are BroadcastHashJoins."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    cust = load(spark, sf_dir, "customer")
    sup = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"])
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            sup,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(reg, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(rev).alias("revenue_c"), F.count(F.lit(1)).alias("n_items"))
    )


@register(
    "running_customer_revenue",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(c) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_c,
           CAST(c - COALESCE(LAG(c) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey), 0)
                AS BIGINT) AS delta_c,
           CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS INT) AS order_seq
    FROM (SELECT o_custkey, o_orderkey, o_orderdate,
                 CAST(ROUND(o_totalprice*100) AS BIGINT) AS c
          FROM orders)
    """,
)
def running_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative/lead-lag analytics: per-customer running revenue,
    order-over-order delta, and sequence number. All three window
    functions share ONE spec (same partition, same total order with
    unique orderkey tiebreak), so the plan is a single exchange + a
    single sort — not one per function."""
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate",
        cents(F.col("o_totalprice")).alias("c"),
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum("c").over(run).alias("running_c"),
        (F.col("c") - F.coalesce(F.lag("c").over(w), F.lit(0))).alias("delta_c"),
        F.row_number().over(w).alias("order_seq"),
    )


@register(
    "orderpriority_quantiles",
    """
    WITH r AS (
      SELECT o_orderpriority AS priority,
             CAST(ROUND(o_totalprice*100) AS BIGINT) AS c,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY CAST(ROUND(o_totalprice*100) AS BIGINT),
                                         o_orderkey) AS rn,
             COUNT(1) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
    )
    SELECT priority,
           CAST(MAX(CASE WHEN rn = CAST(CEIL(0.5*n)  AS BIGINT) THEN c END) AS BIGINT) AS p50_c,
           CAST(MAX(CASE WHEN rn = CAST(CEIL(0.9*n)  AS BIGINT) THEN c END) AS BIGINT) AS p90_c,
           CAST(MAX(CASE WHEN rn = CAST(CEIL(0.99*n) AS BIGINT) THEN c END) AS BIGINT) AS p99_c,
           CAST(MAX(n) AS BIGINT) AS n
    FROM r GROUP BY priority
    """,
)
def orderpriority_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group discrete quantiles (p50/p90/p99) of order value
    via one sort shuffle: rank rows in group order, pick the
    ceil(p·n)-th element. Deterministic across engines (integer cents,
    unique tiebreak; the ceil(p·n) index is the same IEEE double
    expression on both sides). The approximate single-pass alternative
    for 100 TB is percentile_approx / the HLL-style profiler —
    this is the exact oracle-checkable form."""
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        "o_orderkey",
        cents(F.col("o_totalprice")).alias("c"),
    )
    w = Window.partitionBy("priority").orderBy("c", "o_orderkey")
    wn = Window.partitionBy("priority")
    r = o.select(
        "priority", "c",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )

    def pick(p: float, out: str) -> F.Column:
        idx = F.ceil(F.lit(p) * F.col("n"))
        return F.max(F.when(F.col("rn") == idx, F.col("c"))).alias(out)

    return r.groupBy("priority").agg(
        pick(0.5, "p50_c"), pick(0.9, "p90_c"), pick(0.99, "p99_c"),
        F.max("n").alias("n"),
    )


@register(
    "dormant_customers",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate < TIMESTAMP '2000-01-01')
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    """,
)
def dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi + anti join in one query: customers who ordered before
    1996 (left-semi) but never since (cutoff chosen so the result is non-empty at sf0.01) (left-anti). Both are
    shuffle-free on the probe side when the filtered orders key set
    broadcasts; no count/distinct materialization of the subqueries."""
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    before = orders.filter(F.col("o_orderdate") < _ts("2000-01-01"))
    after = orders.filter(F.col("o_orderdate") >= _ts("2000-01-01"))
    return (
        cust.join(before, cust["c_custkey"] == before["o_custkey"], "left_semi")
        .join(after, cust["c_custkey"] == after["o_custkey"], "left_anti")
    )


@register(
    "user_event_type_pivot",
    """
    SELECT user_id,
           CAST(COUNT(CASE WHEN event_type = 'click'    THEN 1 END) AS BIGINT) AS n_click,
           CAST(COUNT(CASE WHEN event_type = 'error'    THEN 1 END) AS BIGINT) AS n_error,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS n_purchase,
           CAST(COUNT(CASE WHEN event_type = 'signup'   THEN 1 END) AS BIGINT) AS n_signup,
           CAST(COUNT(CASE WHEN event_type = 'view'     THEN 1 END) AS BIGINT) AS n_view,
           CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                THEN CAST(ROUND(value*100) AS BIGINT) END), 0) AS BIGINT) AS purchase_value_c
    FROM events GROUP BY user_id
    """,
)
def user_event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide): per-user event-type counts + purchase value
    as ONE conditional aggregation — the expansion `pivot()` compiles
    to when given an explicit value list (without the list Spark adds
    a distinct-scan job to discover categories: a full extra pass over
    the fact at 100 TB). Single groupBy shuffle, map-side partials,
    no join with a second aggregate."""
    ev = load(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    return ev.groupBy("user_id").agg(
        *[
            F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")
            for t in types
        ],
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "purchase", cents(F.col("value")))),
            F.lit(0),
        ).alias("purchase_value_c"),
    )


_UNPIVOT_ARMS = [
    ("quantity", "l_quantity"),
    ("extendedprice", "l_extendedprice"),
    ("discount", "l_discount"),
    ("tax", "l_tax"),
]


@register(
    "unpivot_lineitem_measures",
    "\nUNION ALL\n".join(
        f"""SELECT l_orderkey, l_linenumber, '{m}' AS measure,
            CAST(ROUND({c}*100) AS BIGINT) AS value_c FROM lineitem"""
        for m, c in _UNPIVOT_ARMS
    ),
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long): 4 measure columns → (measure, value)
    rows via ``stack`` — a Generate node inside the scan's codegen
    stage, one pass over the fact with zero shuffles, vs the 4-scan
    UNION ALL the naive SQL implies (the oracle keeps that shape on
    purpose: DuckDB reads the 240 KB fixture 4×, we read 100 TB 1×)."""
    li = load(spark, sf_dir, "lineitem")
    arms = ", ".join(
        f"'{m}', CAST(ROUND({c}*100) AS BIGINT)" for m, c in _UNPIVOT_ARMS
    )
    return li.selectExpr(
        "l_orderkey",
        "l_linenumber",
        f"stack({len(_UNPIVOT_ARMS)}, {arms}) AS (measure, value_c)",
    )


@register(
    "smallqty_part_revenue",
    """
    WITH lif AS (
      SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
      FROM lineitem l JOIN part p
        ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#4'
    ),
    pa AS (
      SELECT l_partkey, COUNT(1) AS n,
             SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS sumq_c
      FROM lif GROUP BY l_partkey
    )
    SELECT CAST(COALESCE(SUM(CAST(ROUND(l.l_extendedprice*100) AS BIGINT)), 0) AS BIGINT) AS small_rev_c,
           CAST(COUNT(1) AS BIGINT) AS n_small
    FROM lif l JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE 5 * CAST(ROUND(l.l_quantity*100) AS BIGINT) * pa.n < pa.sumq_c
    """,
)
def smallqty_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (correlated scalar-agg subquery): revenue from
    lineitems with quantity below 20% of that part's average.

    Decorrelated Spark-first: broadcast the filtered part dim into the
    fact scan FIRST (so the per-part aggregate runs over the ~1/25
    brand slice, not the whole fact), then fact⨝agg co-partition on
    ``l_partkey`` — AQE reuses the exchange. The 20%-of-avg predicate
    is integer-exact: ``qty < 0.2·avg ⟺ 5·qty_c·n < Σqty_c`` — no
    cross-engine double division."""
    li = load(spark, sf_dir, "lineitem")
    pt = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#4")
        .select("p_partkey")
    )
    lif = li.join(
        F.broadcast(pt), li["l_partkey"] == pt["p_partkey"]
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    pa = lif.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents(F.col("l_quantity"))).alias("sumq_c"),
    )
    return (
        lif.join(pa, "l_partkey")
        .filter(F.lit(5) * cents(F.col("l_quantity")) * F.col("n") < F.col("sumq_c"))
        .agg(
            F.coalesce(F.sum(cents(F.col("l_extendedprice"))), F.lit(0)).alias(
                "small_rev_c"
            ),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


@register("incremental_rollup_merge", _ROLLUP_DAY_SQL)
def incremental_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: a frozen base rollup (days
    before the split) merged with a delta rollup (the new window) by
    summing partials — count and sum are decomposable, so the merged
    table is bit-identical to a full recompute (the oracle IS the
    full recompute). At 100 TB this is the difference between
    re-scanning the whole fact nightly and scanning one day: the
    merge re-aggregates two already-tiny day tables."""
    base = rollup_day_for_window(spark, sf_dir, end="2024-01-21")
    delta = rollup_day_for_window(spark, sf_dir, start="2024-01-21")
    return R.merge_day_rollups(base, delta, ["event_type"], "day_id")


def rollup_day_for_window(
    spark: SparkSession, sf_dir: str, start: str | None = None, end: str | None = None
) -> DataFrame:
    ev = load_events_windowed(spark, sf_dir, start, end).withColumn(
        "day_id", CL.day_id(F.col("ts"))
    )
    return R.rollup_day(
        ev,
        ["event_type"],
        "day_id",
        {
            "item_count": F.count(F.lit(1)),
            "value_c": F.sum(cents(F.coalesce(F.col("value"), F.lit(0.0)))),
        },
    )


@register(
    "events_json_extract",
    """
    SELECT event_type,
           CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(COUNT(CASE WHEN props->>'k' IS NOT NULL THEN 1 END) AS BIGINT) AS n_k
    FROM events GROUP BY event_type
    """,
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: parse the JSON props column ONCE
    with a declared schema (`from_json` — JVM-side, vectorizable, no
    Python) and aggregate the typed field. The anti-pattern at 100 TB
    is `get_json_object` per field (re-parses the blob per call) or
    schema inference (extra full scan). Malformed rows → NULL field,
    counted out by n_k, never a job abort."""
    ev = load(spark, sf_dir, "events")
    parsed = ev.withColumn(
        "p", F.from_json(F.col("props"), "k BIGINT", {"mode": "PERMISSIVE"})
    )
    return parsed.groupBy("event_type").agg(
        F.sum(F.col("p.k")).alias("sum_k"),
        F.count(F.col("p.k")).alias("n_k"),
    )


@register(
    "events_day_spine_fill",
    """
    WITH spine AS (
      SELECT CAST(strftime(d, '%Y%m%d') AS INT) AS day_id
      FROM generate_series(DATE '2024-01-01', DATE '2024-01-30', INTERVAL 1 DAY) AS t(d)
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    daily AS (
      SELECT event_type, CAST(strftime(ts, '%Y%m%d') AS INT) AS day_id,
             COUNT(1) AS n
      FROM events GROUP BY event_type, CAST(strftime(ts, '%Y%m%d') AS INT)
    )
    SELECT t.event_type, s.day_id,
           CAST(COALESCE(d.n, 0) AS BIGINT) AS n
    FROM spine s CROSS JOIN types t
    LEFT JOIN daily d ON d.event_type = t.event_type AND d.day_id = s.day_id
    """,
)
def events_day_spine_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily series: a generated date spine × the type dim
    left-joins the day aggregate so missing days surface as explicit
    zeros (the reference's datamart consumers assume dense days).
    The spine is `sequence()`-generated — a few hundred rows on the
    driver-side plan, broadcast into the join; the fact is scanned
    once for the aggregate only."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", CL.day_id(F.col("ts")).alias("day_id")
    ).agg(F.count(F.lit(1)).alias("n"))
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_date(F.lit("2024-01-01")),
                F.to_date(F.lit("2024-01-30")),
                F.expr("interval 1 day"),
            )
        ).alias("d")
    ).select(CL.day_id(F.col("d")).alias("day_id"))
    types = ev.select("event_type").distinct()
    return (
        spine.crossJoin(types)
        .join(daily, ["event_type", "day_id"], "left")
        .select(
            "event_type", "day_id", F.coalesce(F.col("n"), F.lit(0)).alias("n")
        )
    )


@register(
    "customer_name_editdist_pairs",
    """
    SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
           CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
    FROM customer a JOIN customer b
      ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def customer_name_editdist_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution by edit distance, deletion-neighborhood
    blocked (SymSpell): each name explodes into its ≤1-deletion
    variants (the name itself + every single-character deletion), and
    candidates are the pairs sharing a (nation, variant) key — an
    equi-join whose groups are only ever genuinely-near names. Two
    strings at lev ≤ 1 ALWAYS share a variant (substitution at p ⇒
    both delete p; insert/delete ⇒ the shorter IS the longer's
    deletion and is its own i=0 variant), so recall is exact; false
    candidates (deletes at different positions can be lev 2) are
    removed by the banded levenshtein verify on the deduped pair set.

    Round 13 (opt guide §2.4/§8): the previous shape — nation-blocked
    BroadcastHashJoin with the banded DP in the join residual — had
    ZERO exchanges, so the O(Σ block²) ≈ 4.5M-pair DP residual ran in
    the scan's task count (ONE split at bench scale: a single-core
    7 s stage). The explode trades a ~(len+1)× row fan-out of a
    3-column projection for a candidate set ~200× smaller, and its
    shuffle parallelizes the verify. At 100 TB the same shape holds:
    candidates scale with true near-pairs, not with block²."""
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_name"
    )
    # i = 0 keeps the name itself; i = 1..len deletes character i.
    variants = F.expr(
        "transform(sequence(0, length(c_name)), i -> CASE WHEN i = 0 "
        "THEN c_name ELSE concat(substring(c_name, 1, i-1), "
        "substring(c_name, i+1, length(c_name))) END)"
    )
    v = c.select(
        "c_custkey", "c_nationkey", "c_name",
        F.explode(variants).alias("vkey"),
    )
    a, b = v.alias("a"), v.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.vkey") == F.col("b.vkey"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .select(
            F.col("a.c_custkey").alias("key_a"),
            F.col("b.c_custkey").alias("key_b"),
            F.col("a.c_name").alias("name_a"),
            F.col("b.c_name").alias("name_b"),
        )
        # a pair sharing k variants arrives k times — dedup before the
        # DP so each candidate is verified exactly once. groupBy the
        # KEY pair and carry the names as min() aggregates (names are
        # functionally determined by the keys, so min == the name):
        # (a) the exchange shuffles 2 longs, not 2 longs + 2 strings,
        # and (b) the lev filter below references aggregate OUTPUTS,
        # which Catalyst cannot push below the aggregate — a plain
        # .distinct() kept the names as grouping keys and the
        # optimizer pushed the DP back into the join residual,
        # re-evaluating it once per shared variant instead of once
        # per candidate pair.
        .groupBy("key_a", "key_b")
        .agg(
            F.min("name_a").alias("name_a"),
            F.min("name_b").alias("name_b"),
        )
    )
    # Banded levenshtein(l, r, 1): O(len) with early exit, -1 past the
    # band — ≥0 alone decides ≤1, one DP eval per verified candidate.
    band = F.levenshtein(F.col("name_a"), F.col("name_b"), 1)
    return cand.filter(band >= 0).select(
        "key_a", "key_b", band.cast("int").alias("dist")
    )


@register(
    "orders_price_histogram",
    """
    SELECT LEAST(CAST(ROUND(o_totalprice*100) AS BIGINT) // 5000000, 9) AS bucket,
           CAST(COUNT(1) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_c
    FROM orders
    GROUP BY LEAST(CAST(ROUND(o_totalprice*100) AS BIGINT) // 5000000, 9)
    """,
)
def orders_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram entirely in integer space ($50k buckets,
    top-coded at bucket 9): integer cents `div` avoids the
    cross-engine float-division edge cases that make float binning
    nondeterministic at bucket boundaries. One groupBy on ≤10 keys —
    partial aggregation collapses everything map-side."""
    o = load(spark, sf_dir, "orders")
    bucket = F.least(
        F.expr("CAST(ROUND(o_totalprice*100) AS BIGINT) div 5000000"), F.lit(9)
    )
    return o.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents(F.col("o_totalprice"))).alias("total_c"),
    )


@register(
    "repeat_vs_churned_customers",
    """
    WITH y1 AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
    ),
    y2 AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    )
    SELECT o_custkey, 'repeat' AS cohort FROM (SELECT o_custkey FROM y1 INTERSECT SELECT o_custkey FROM y2)
    UNION ALL
    SELECT o_custkey, 'churned' AS cohort FROM (SELECT o_custkey FROM y1 EXCEPT SELECT o_custkey FROM y2)
    """,
)
def repeat_vs_churned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (INTERSECT / EXCEPT): year-over-year repeat vs
    churned customer cohorts. Spark compiles both to aggregate+join
    on the key — the date predicates push to the scan, so each cohort
    input is a pruned year slice, never a row-to-row comparison."""
    o = load(spark, sf_dir, "orders")

    def keys(start: str, end: str) -> DataFrame:
        return (
            o.filter(
                (F.col("o_orderdate") >= _ts(start))
                & (F.col("o_orderdate") < _ts(end))
            )
            .select("o_custkey")
            .distinct()
        )

    y1 = keys("1995-01-01", "1996-01-01")
    y2 = keys("1996-01-01", "1997-01-01")
    rep = y1.intersect(y2).withColumn("cohort", F.lit("repeat"))
    churn = y1.exceptAll(y2).withColumn("cohort", F.lit("churned"))
    return rep.unionByName(churn)


@register(
    "rolling_7day_event_value",
    """
    SELECT event_id, user_id,
           CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 518400000000 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS roll7_value_c
    FROM events
    """,
)
def rolling_7day_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based rolling aggregate: per-user trailing 7-day value
    sum via a RANGE frame [ts−6d, ts] over epoch-µs — an integer
    axis with inclusive bounds on both engines, so frame membership
    is bit-identical. One exchange+sort on user_id; the frame slides
    in-place instead of the naive self-range-join rewrite that
    replicates the fact ~7× at daily density."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-518400000000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(cents(F.col("value"))).over(w).alias("roll7_value_c"),
    )


@register(
    "latest_order_per_customer",
    """
    WITH keyed AS (
      SELECT *, strftime(o_orderdate, '%Y%m%d%H%M%S')
                || lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS ord_key
      FROM orders
    )
    SELECT o_custkey,
           arg_max(o_orderkey, ord_key) AS o_orderkey,
           arg_max(o_orderstatus, ord_key) AS o_orderstatus,
           CAST(ROUND(arg_max(o_totalprice, ord_key)*100) AS BIGINT) AS totalprice_c
    FROM keyed GROUP BY o_custkey
    """,
)
def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-row-per-group via max_by on a (ts, unique-id) sort key —
    an ordinary aggregate with map-side partials, NOT a window: the
    row_number() rewrite sorts every group on one node post-shuffle,
    while max_by ships one candidate row per group per map task. The
    orderkey tiebreak makes the argmax total. The key is a sortable
    string (timestamp || zero-padded id) because the oracle's arg_max
    can't order by a struct; Spark-side a struct key works too."""
    o = load(spark, sf_dir, "orders")
    key = F.concat(
        F.date_format(F.col("o_orderdate"), "yyyyMMddHHmmss"),
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0"),
    )
    return o.groupBy("o_custkey").agg(
        F.max_by(F.col("o_orderkey"), key).alias("o_orderkey"),
        F.max_by(F.col("o_orderstatus"), key).alias("o_orderstatus"),
        cents(F.max_by(F.col("o_totalprice"), key)).alias("totalprice_c"),
    )


@register(
    "hopping_window_event_agg",
    """
    SELECT event_type,
           epoch_us(date_trunc('day', ts) - k * INTERVAL 1 DAY) AS window_start_us,
           CAST(COUNT(1) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS value_c
    FROM events CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS k) offs
    GROUP BY event_type, epoch_us(date_trunc('day', ts) - k * INTERVAL 1 DAY)
    """,
)
def hopping_window_event_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) window aggregation: 7-day windows advancing
    1 day — each event lands in 7 windows via the built-in `window()`
    generator (epoch-aligned starts, same day boundaries the oracle
    derives by explicit offset replication). The 7× row expansion is
    inherent to the slide ratio, but it happens inside the scan stage
    and collapses map-side: what shuffles is one partial per
    (type, window) per task, not 7× the fact. The streaming twin is
    the same expression over readStream (streaming/windowed.py)."""
    ev = load(spark, sf_dir, "events")
    win = F.window(F.col("ts"), "7 days", "1 day")
    return ev.groupBy("event_type", win.alias("w")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents(F.col("value"))).alias("value_c"),
    ).select(
        "event_type",
        ts_us(F.col("w.start")).alias("window_start_us"),
        "n",
        "value_c",
    )


@register(
    "customer_balance_quartiles",
    """
    SELECT c_custkey,
           CAST(ntile(4) OVER w AS INT) AS balance_quartile,
           CAST(ROUND(percent_rank() OVER w * 1000000) AS BIGINT) AS pct_rank_ppm
    FROM customer
    WINDOW w AS (ORDER BY CAST(ROUND(c_acctbal*100) AS BIGINT), c_custkey)
    """,
)
def customer_balance_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution ranking (ntile + percent_rank) over a total order
    (cents balance, custkey tiebreak — rank functions are only
    deterministic under a total order). Unpartitioned ORDER BY means
    a single-partition sort: fine for a dim, and the audit-worthy
    smell to avoid on facts — the implemented fact-scale twin is
    ``operators/sketches.approx_quartile_assign`` (GK quartile
    boundaries, no rank window; agreement pinned vs this query in
    tests/test_sketches.py)."""
    c = load(spark, sf_dir, "customer")
    w = Window.orderBy(cents(F.col("c_acctbal")), F.col("c_custkey"))
    return c.select(
        "c_custkey",
        F.ntile(4).over(w).alias("balance_quartile"),
        F.round(F.percent_rank().over(w) * 1000000)
        .cast("bigint")
        .alias("pct_rank_ppm"),
    )


@register(
    "orders_per_customer_distribution",
    """
    WITH per_cust AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey
    )
    SELECT CAST(n_orders AS BIGINT) AS n_orders,
           CAST(COUNT(1) AS BIGINT) AS n_customers
    FROM per_cust GROUP BY n_orders
    """,
)
def orders_per_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: orders-per-customer histogram including the
    zero bucket — LEFT join so order-less customers count, then a
    second aggregation over the (tiny) per-customer table. COUNT(col)
    skips the NULLs the outer join introduces; the second groupBy has
    ≤ a few dozen keys, so it collapses map-side."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


@register(
    "embedding_vector_stats",
    """
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           CAST(ROUND(list_sum(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) * 1000) AS BIGINT) AS sqnorm_k,
           CAST(ROUND(list_max(embedding) * 1000) AS BIGINT) AS max_k
    FROM embeddings
    """,
)
def embedding_vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions on the embedding column: per-row
    squared L2 norm and max via `aggregate`/`transform`/`array_max` —
    JVM-side lambda evaluation inside codegen, no explode (the
    explode+groupBy rewrite shuffles dim× the table to compute a
    per-row scalar), no Python. Quantized ×1000 for cross-engine
    hashing; the float32→float64 widening is explicit on both sides
    so the sums are IEEE-identical."""
    e = load(spark, sf_dir, "embeddings")
    sq = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    return e.select(
        "vec_id",
        F.size(F.col("embedding")).alias("dim"),
        F.round(sq * 1000).cast("bigint").alias("sqnorm_k"),
        F.round(F.array_max(F.col("embedding")).cast("double") * 1000)
        .cast("bigint")
        .alias("max_k"),
    )


@register(
    "cdc_apply_orders",
    """
    WITH base AS (
      SELECT o_orderkey, o_orderstatus AS status,
             CAST(ROUND(o_totalprice*100) AS BIGINT) AS totalprice_c,
             CAST(NULL AS INT) AS seq, CAST(NULL AS VARCHAR) AS op
      FROM orders
    ),
    ch AS (
      SELECT o_orderkey, 'X' AS status,
             CAST(ROUND(o_totalprice*100) AS BIGINT) AS totalprice_c,
             1 AS seq, 'U' AS op
      FROM orders WHERE o_orderkey % 10 = 3
      UNION ALL
      SELECT o_orderkey, o_orderstatus,
             CAST(ROUND(o_totalprice*100) AS BIGINT), 1, 'D'
      FROM orders WHERE o_orderkey % 10 = 4
      UNION ALL
      SELECT o_orderkey, 'Y', CAST(ROUND(o_totalprice*100) AS BIGINT), 2, 'U'
      FROM orders WHERE o_orderkey % 20 = 3
      UNION ALL
      SELECT o_orderkey + 10000000, 'N', CAST(0 AS BIGINT), 1, 'I'
      FROM orders WHERE o_orderkey % 1000 = 0
    ),
    u AS (SELECT * FROM base UNION ALL SELECT * FROM ch),
    r AS (
      SELECT *, row_number() OVER (
        PARTITION BY o_orderkey ORDER BY seq DESC NULLS LAST
      ) AS rn
      FROM u
    )
    SELECT o_orderkey, status, totalprice_c
    FROM r WHERE rn = 1 AND (op IS NULL OR op <> 'D')
    """,
)
def cdc_apply_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog apply (operators/merge.py::apply_cdc): a
    deterministic I/U/D feed (updates on keys ≡3 mod 10, a
    second-generation update on ≡3 mod 20, deletes on ≡4 mod 10,
    inserts on fresh keys) applied to the orders snapshot — per key
    the max-seq record wins, winning deletes drop the key, base ranks
    beneath all changes. One window shuffle on the key, no join, and
    replaying the same feed is a no-op (idempotent by construction,
    the property the reference's backdate DAGs re-scan for)."""
    o = load(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        cents(F.col("o_totalprice")).alias("totalprice_c"),
    )
    def ch(pred, status_col, tp_col, seq, op):
        return o.filter(pred).select(
            F.col("o_orderkey"),
            status_col.alias("status"),
            tp_col.alias("totalprice_c"),
            F.lit(seq).cast("int").alias("seq"),
            F.lit(op).alias("op"),
        )
    k = F.col("o_orderkey")
    changes = (
        ch(k % 10 == 3, F.lit("X"), cents(F.col("o_totalprice")), 1, "U")
        .unionByName(ch(k % 10 == 4, F.col("o_orderstatus"), cents(F.col("o_totalprice")), 1, "D"))
        .unionByName(ch(k % 20 == 3, F.lit("Y"), cents(F.col("o_totalprice")), 2, "U"))
        .unionByName(
            o.filter(k % 1000 == 0).select(
                (k + 10000000).alias("o_orderkey"),
                F.lit("N").alias("status"),
                F.lit(0).cast("bigint").alias("totalprice_c"),
                F.lit(1).cast("int").alias("seq"),
                F.lit("I").alias("op"),
            )
        )
    )
    return M.apply_cdc(base, changes, ["o_orderkey"], "seq")


@register(
    "scd2_user_event_history",
    """
    WITH feed AS (
      SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events
    ),
    marked AS (
      SELECT *, lag(event_type) OVER (
        PARTITION BY user_id ORDER BY ts_us, event_id
      ) AS prev
      FROM feed
    ),
    changed AS (
      SELECT user_id, event_type, ts_us, event_id
      FROM marked WHERE prev IS DISTINCT FROM event_type
    )
    SELECT user_id, event_type,
           ts_us AS valid_from_us,
           lead(ts_us) OVER (
             PARTITION BY user_id ORDER BY ts_us, event_id
           ) AS valid_to_us
    FROM changed
    """,
)
def scd2_user_event_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 history build (operators/merge.py::scd2_from_changes):
    collapse consecutive identical states per user, then interval-ize
    with valid_from/valid_to (NULL = current). Both the change-point
    lag and the interval lead share one (key, ts) sort spec — a
    single exchange+sort builds the whole history, vs the
    self-join-on-next-row rewrite that shuffles the feed twice."""
    ev = load(spark, sf_dir, "events")
    feed = ev.select(
        "user_id",
        "event_type",
        ts_us(F.col("ts")).alias("ts_us"),
        "event_id",
    )
    return M.scd2_from_changes(
        feed, ["user_id"], ["event_type"], "ts_us", tiebreak_cols=["event_id"]
    ).select(
        "user_id",
        "event_type",
        F.col("valid_from").alias("valid_from_us"),
        F.col("valid_to").alias("valid_to_us"),
    )


@register(
    "fk_integrity_counts",
    """
    SELECT
      (SELECT COUNT(1) FROM orders o
        LEFT JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE c.c_custkey IS NULL) AS orphan_orders,
      (SELECT COUNT(1) FROM lineitem l
        LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IS NULL) AS orphan_lineitems
    """,
)
def fk_integrity_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphaned fact rows per FK edge via
    left-anti joins (broadcast for the customer dim, co-partitioned
    for lineitem→orders). The dbt relationship test generalized —
    counts, not a boolean, so drift is quantified."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    li = load(spark, sf_dir, "lineitem")
    orphan_o = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"], "left_anti")
        .agg(F.count(F.lit(1)).alias("orphan_orders"))
    )
    orphan_l = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"], "left_anti")
        .agg(F.count(F.lit(1)).alias("orphan_lineitems"))
    )
    return orphan_o.crossJoin(orphan_l)


@register(
    "nation_revenue_share",
    """
    WITH n AS (
      SELECT na.n_name,
             SUM(CAST(ROUND(o.o_totalprice*100) AS BIGINT)) AS rev_c
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation na ON na.n_nationkey = c.c_nationkey
      GROUP BY na.n_name
    )
    SELECT n_name, CAST(rev_c AS BIGINT) AS rev_c,
           CAST(ROUND(rev_c * 1000000.0 / SUM(rev_c) OVER ()) AS BIGINT) AS share_ppm
    FROM n
    """,
)
def nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: per-nation revenue share of the global total —
    the grand total comes from an unpartitioned window over the
    ALREADY-AGGREGATED 25-row table (the fact is scanned and shuffled
    once for the groupBy; the total costs one single-partition pass
    over 25 rows, not a second fact scan or a driver collect).
    Dims broadcast into the fact scan."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(F.sum(cents(F.col("o_totalprice"))).alias("rev_c"))
    )
    total = Window.partitionBy()
    return rev.select(
        "n_name",
        "rev_c",
        F.round(F.col("rev_c") * 1000000.0 / F.sum("rev_c").over(total))
        .cast("bigint")
        .alias("share_ppm"),
    )


@register(
    "cube_returnflag_status",
    """
    SELECT COALESCE(l_returnflag, '<all>') AS l_returnflag,
           COALESCE(l_linestatus, '<all>') AS l_linestatus,
           CAST(COUNT(1) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS extprice_c
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets: all 4 grouping combinations in ONE pass
    via the Expand operator — the hand-rolled alternative is 4 scans
    + UNION ALL (4× the 100 TB read). Expand multiplies rows 4× but
    map-side partials collapse each set before the single shuffle.
    NULL group placeholders are COALESCEd to a sentinel so the
    all-bucket is distinguishable from a NULL data value both engines
    agree on."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents(F.col("l_extendedprice"))).alias("extprice_c"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("<all>")).alias("l_returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("<all>")).alias("l_linestatus"),
            "n",
            "extprice_c",
        )
    )


@register(
    "user_event_type_csv",
    """
    SELECT user_id,
           string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS event_types_csv,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
    FROM events GROUP BY user_id
    """,
)
def user_event_type_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic list aggregation: collect_set → sort_array →
    array_join. collect_list/string_agg alone are ORDER-UNDEFINED in
    a distributed engine — the explicit sort is what makes the result
    reproducible (and hashable cross-engine). One shuffle; the set
    dedups map-side."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(
            F.sort_array(F.collect_set("event_type")), ","
        ).alias("event_types_csv"),
        F.countDistinct("event_type").cast("bigint").alias("n_types"),
    )


@register(
    "median_order_value_by_priority",
    """
    WITH ranked AS (
      SELECT o_orderpriority,
             CAST(ROUND(o_totalprice*100) AS BIGINT) AS price_c,
             row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY CAST(ROUND(o_totalprice*100) AS BIGINT), o_orderkey
             ) AS rn,
             COUNT(1) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
    ),
    picks AS (
      SELECT o_orderpriority,
             MAX(CASE WHEN rn = (n+1)//2 THEN price_c END) AS lo_c,
             MAX(CASE WHEN rn = n//2 + 1 THEN price_c END) AS hi_c
      FROM ranked GROUP BY o_orderpriority
    )
    SELECT o_orderpriority,
           CAST(lo_c*5 + hi_c*5 AS BIGINT) AS median_x10_c
    FROM picks
    """,
)
def median_order_value_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated median (percentile_cont 0.5) per group in PURE
    integer arithmetic: rank the cents values, pick the two middle
    ranks, and report (lo+hi)·5 = median×10 — odd groups collapse to
    lo=hi. Calling each engine's percentile_cont would compare two
    float interpolation formulas ((1−f)·lo+f·hi vs lo+f·(hi−lo)) that
    differ in last-ulp; ×10 integerization sidesteps the class of bug
    instead of tolerating it. Rank + count share one partition spec →
    single exchange+sort, then a tiny per-group aggregate."""
    o = load(spark, sf_dir, "orders")
    price = cents(F.col("o_totalprice"))
    wo = Window.partitionBy("o_orderpriority").orderBy(price, F.col("o_orderkey"))
    wp = Window.partitionBy("o_orderpriority")
    ranked = o.select(
        "o_orderpriority",
        price.alias("price_c"),
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    lo_rank = F.expr("(n + 1) div 2")
    hi_rank = F.expr("n div 2 + 1")
    picks = ranked.groupBy("o_orderpriority").agg(
        F.max(F.when(F.col("rn") == lo_rank, F.col("price_c"))).alias("lo_c"),
        F.max(F.when(F.col("rn") == hi_rank, F.col("price_c"))).alias("hi_c"),
    )
    return picks.select(
        "o_orderpriority",
        (F.col("lo_c") * 5 + F.col("hi_c") * 5).alias("median_x10_c"),
    )


@register(
    "locf_fill_event_values",
    """
    WITH gappy AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us,
             CASE WHEN event_id % 5 = 0 THEN NULL
                  ELSE CAST(ROUND(value*100) AS BIGINT) END AS value_c
      FROM events
    )
    SELECT event_id, user_id,
           last_value(value_c IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts_us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_c
    FROM gappy
    """,
)
def locf_fill_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward gap fill: sensor-style NULLs
    (every 5th reading, injected deterministically) take the most
    recent non-null value per key via `last_value(... IGNORE NULLS)`
    over a running ROWS frame — one exchange+sort on the key, no
    self-join against the history and no loop. Rows before the first
    observation stay NULL (no lookahead — that would be leakage in a
    training pipeline)."""
    ev = load(spark, sf_dir, "events")
    gappy = ev.select(
        "event_id",
        "user_id",
        ts_us(F.col("ts")).alias("ts_us"),
        F.when(F.col("event_id") % 5 == 0, F.lit(None))
        .otherwise(cents(F.col("value")))
        .alias("value_c"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return gappy.select(
        "event_id",
        "user_id",
        F.last(F.col("value_c"), ignorenulls=True).over(w).alias("filled_c"),
    )


# ---------------------------------------------------------------------------
# Correlated-subquery decorrelation family (TPC-H Q4/Q14/Q15/Q18 shapes)
#
# The reference's only subqueries are the implicit MERGE anti-inserts
# (SURVEY §2.5 J2); these queries extend the engine with the classic
# decision-support correlated shapes, each decorrelated into the join
# the optimizer should produce — semi joins for EXISTS, a broadcast
# scalar for the global aggregate — instead of a per-row re-execution.
# ---------------------------------------------------------------------------


@register(
    "exists_late_orders",
    """
    SELECT o_orderpriority, CAST(COUNT(1) AS BIGINT) AS n_orders
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 365 DAY)
    GROUP BY o_orderpriority
    """,
)
def exists_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (TPC-H Q4 shape) decorrelated to a LEFT SEMI
    join: equi key (orderkey) hashes/shuffles, the correlated
    inequality (shipped >1y after order) rides along as the join
    residual — each order emitted at most once, no DISTINCT needed,
    which is exactly what EXISTS means. The orderdate window filters
    the probe side before the join, so only one year of orders
    shuffles. Ref: dags/sql casreport merges use the same anti/semi
    machinery implicitly (SURVEY §2.5 J2)."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    hit = o.join(
        l,
        (o["o_orderkey"] == l["l_orderkey"])
        & (l["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 365 DAYS")),
        "left_semi",
    )
    return hit.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


@register(
    "promo_revenue_ratio",
    """
    WITH j AS (
      SELECT CAST(ROUND((l_extendedprice*(1.0-l_discount))*100) AS BIGINT) AS rev_c,
             p_type
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '2000-01-01'
        AND l_shipdate < TIMESTAMP '2000-04-01'
    )
    SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev_c ELSE 0 END) AS BIGINT) AS promo_rev_c,
           CAST(SUM(rev_c) AS BIGINT) AS total_rev_c,
           CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev_c ELSE 0 END) * 1000000
                // SUM(rev_c) AS BIGINT) AS promo_ppm
    FROM j
    """,
)
def promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-ratio aggregate (TPC-H Q14 shape): promo share of
    revenue in one pass — the CASE folds the "two sums" into a single
    scan+broadcast-join, no second subquery over the fact. The ratio
    is integer ppm via floor division (both engines floor for
    positives), so no cross-engine float division at the boundary."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("2000-01-01"))
        & (F.col("l_shipdate") < _ts("2000-04-01"))
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"]).select(
        cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias(
            "rev_c"
        ),
        "p_type",
    )
    agg = j.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", F.col("rev_c")).otherwise(F.lit(0)))
        .alias("promo_rev_c"),
        F.sum("rev_c").alias("total_rev_c"),
    )
    return agg.select(
        "promo_rev_c",
        "total_rev_c",
        F.expr("promo_rev_c * 1000000 div total_rev_c").alias("promo_ppm"),
    )


@register(
    "top_supplier_revenue",
    """
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(ROUND((l_extendedprice*(1.0-l_discount))*100) AS BIGINT)) AS total_rev_c
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '2000-01-01'
        AND l_shipdate < TIMESTAMP '2000-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_rev_c AS BIGINT) AS total_rev_c
    FROM rev JOIN supplier ON s_suppkey = l_suppkey
    WHERE total_rev_c = (SELECT MAX(total_rev_c) FROM rev)
    """,
)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery-on-a-view (TPC-H Q15 shape): the max is taken
    over the ALREADY-AGGREGATED per-supplier table (|suppliers| rows)
    with an unpartitioned window — the fact is scanned and shuffled
    exactly once, vs the naive plan's two scans (one for the view,
    one for the scalar). Ties all surface (= on integer cents, no
    float equality hazard). Supplier names arrive by broadcast."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("2000-01-01"))
        & (F.col("l_shipdate") < _ts("2000-04-01"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
        ).alias("total_rev_c")
    )
    mx = F.max("total_rev_c").over(Window.partitionBy())
    top = rev.withColumn("mx", mx).filter(F.col("total_rev_c") == F.col("mx"))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return top.join(
        F.broadcast(s), top["l_suppkey"] == s["s_suppkey"]
    ).select("s_suppkey", "s_name", "total_rev_c")


@register(
    "large_volume_customers",
    """
    WITH big AS (
      SELECT l_orderkey,
             SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS sum_qty_c
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) > 25000
    )
    SELECT c_custkey, c_name, o_orderkey,
           epoch_us(o_orderdate) AS orderdate_us,
           CAST(ROUND(o_totalprice*100) AS BIGINT) AS totalprice_c,
           CAST(sum_qty_c AS BIGINT) AS sum_qty_c
    FROM big
    JOIN orders ON o_orderkey = big.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-(GROUP BY … HAVING) membership (TPC-H Q18 shape): the
    qualifying-order set is the aggregate itself, so instead of a
    semi join back onto lineitem the HAVING output (tiny: >250-unit
    orders are the p99 tail) joins orders directly and carries
    sum_qty along — one fact shuffle on orderkey, customer dim
    broadcast. Threshold in integer cents."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(cents(F.col("l_quantity"))).alias("sum_qty_c"))
        .filter(F.col("sum_qty_c") > 25000)
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            ts_us(F.col("o_orderdate").cast("timestamp")).alias("orderdate_us"),
            cents(F.col("o_totalprice")).alias("totalprice_c"),
            "sum_qty_c",
        )
    )


@register(
    "part_value_share",
    """
    WITH agg AS (
      SELECT l_partkey,
             SUM(CAST(ROUND((l_extendedprice*(1.0-l_discount))*100) AS BIGINT)) AS value_c
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(value_c AS BIGINT) AS value_c
    FROM agg
    WHERE value_c * (SELECT COUNT(1) FROM agg) * 4 > (SELECT SUM(value_c) FROM agg) * 5
    """,
)
def part_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-vs-global HAVING (TPC-H Q11 shape): keep parts holding
    more than 1.25× the average per-part value — a scale-free threshold
    (a fixed ppm cutoff empties out as |parts| grows). The global
    (count, sum) pair is an unpartitioned window over the
    ALREADY-AGGREGATED per-part table — one fact scan+shuffle total,
    where the textbook rewrite scans the fact once per comparison
    side. The share test multiplies through (value·4n > total·5) so no
    division touches the bucket boundary."""
    li = load(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_partkey").agg(
        F.sum(
            cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
        ).alias("value_c")
    )
    w = Window.partitionBy()
    return (
        agg.withColumn("total_c", F.sum("value_c").over(w))
        .withColumn("n_parts", F.count(F.lit(1)).over(w))
        .filter(F.col("value_c") * F.col("n_parts") * 4 > F.col("total_c") * 5)
        .select("l_partkey", "value_c")
    )


@register(
    "part_supplier_counts",
    """
    SELECT p_brand, p_size, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 9, 19, 29, 39, 49)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_name LIKE '%9')
    GROUP BY p_brand, p_size
    """,
)
def part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT-IN exclusion + distinct count (TPC-H Q16 shape): the
    blacklist subquery becomes a broadcast LEFT ANTI join (s_suppkey
    is never NULL here, so NOT IN ≡ anti join — with nullable keys
    NOT IN needs the null-aware variant), the NOT/IN attribute
    predicates push into the broadcast part dim BEFORE the join, and
    COUNT(DISTINCT) runs as Spark's two-level Expand aggregate."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = (
        load(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 9, 19, 29, 39, 49)
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    bad = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_name").like("%9"))
        .select(F.col("s_suppkey").alias("bad_suppkey"))
    )
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"]).join(
        F.broadcast(bad), li["l_suppkey"] == bad["bad_suppkey"], "left_anti"
    )
    return j.groupBy("p_brand", "p_size").agg(
        F.countDistinct("l_suppkey").alias("supplier_cnt")
    )


@register(
    "disjunctive_part_revenue",
    """
    SELECT CAST(SUM(CAST(ROUND((l_extendedprice*(1.0-l_discount))*100) AS BIGINT)) AS BIGINT) AS revenue_c
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity >= 1.0 AND l_quantity <= 11.0)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10.0 AND l_quantity <= 20.0)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 20.0 AND l_quantity <= 30.0)
    """,
)
def disjunctive_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive join predicates (TPC-H Q19 shape): OR-of-AND
    triples spanning both sides. Expressed as one equi-join on
    partkey with the disjunction as residual — Catalyst additionally
    factors side-local implied predicates (l_quantity ≤ 30, brand
    set) below the join, so the scans prune before the broadcast
    probe. The naive form — three joins unioned — scans the fact
    three times."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & (q >= 1.0) & (q <= 11.0))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & (q >= 10.0) & (q <= 20.0))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)
           & (q >= 20.0) & (q <= 30.0))
    )
    return j.filter(cond).agg(
        F.sum(
            cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
        ).alias("revenue_c")
    )


@register(
    "lonely_late_supplier",
    """
    WITH ls AS (
      SELECT l_orderkey, l_suppkey,
             MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 365 DAY
                      THEN 1 ELSE 0 END) AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY l_orderkey, l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(COUNT(1) AS BIGINT) AS numwait
    FROM ls l1 JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE l1.late = 1
      AND EXISTS (SELECT 1 FROM ls l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM ls l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.late = 1)
    GROUP BY s_suppkey, s_name
    """,
)
def lonely_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Double-correlated EXISTS + NOT EXISTS (TPC-H Q21 shape):
    suppliers who were the ONLY late shipper in a multi-supplier
    order. The oracle keeps the textbook two-subquery form; the Spark
    plan decorrelates BOTH into one per-order aggregate —
    (distinct suppliers, late suppliers, the unique late suppkey) —
    so the fact joins orders once and shuffles twice total, vs the
    classic plan's two extra self-joins of lineitem. 'Late' is
    shipped >1y after order date (this schema has no commit/receipt
    dates; SURVEY §2.1)."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    per_supp = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 365 DAYS"),
                    1,
                ).otherwise(0)
            ).alias("late")
        )
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("late").alias("n_late"),
        F.max(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias("late_supp"),
    )
    lonely = per_order.filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        lonely.groupBy("late_supp")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(s), F.col("late_supp") == s["s_suppkey"])
        .select("s_suppkey", "s_name", "numwait")
    )


@register(
    "rich_dormant_customers",
    """
    WITH pos AS (
      SELECT COUNT(1) AS n,
             SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS s
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_mktsegment, CAST(COUNT(1) AS BIGINT) AS numcust,
           CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS BIGINT) AS totacctbal_c
    FROM customer, pos
    WHERE CAST(ROUND(c_acctbal*100) AS BIGINT) * pos.n > pos.s
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-07-01')
    GROUP BY c_mktsegment
    """,
)
def rich_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-average comparison + anti join (TPC-H Q22 shape):
    above-average-balance customers with no recent orders. The global
    average arrives as a broadcast (count, sum) pair and the test
    multiplies through (bal·n > sum) — integer-exact, no division,
    and no second customer scan shape in the oracle thanks to the
    shared CTE. NOT EXISTS is a LEFT ANTI against the pruned recent
    slice of orders (date filter pushed to the scan)."""
    c = load(spark, sf_dir, "customer")
    pos = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents(F.col("c_acctbal"))).alias("s"),
    )
    recent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _ts("2000-07-01"))
        .select("o_custkey")
    )
    rich = c.crossJoin(F.broadcast(pos)).filter(
        cents(F.col("c_acctbal")) * F.col("n") > F.col("s")
    )
    dormant = rich.join(recent, rich["c_custkey"] == recent["o_custkey"], "left_anti")
    return dormant.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum(cents(F.col("c_acctbal"))).alias("totacctbal_c"),
    )


# ---------------------------------------------------------------------------
# Behavioral analytics over the event stream — funnel, cohort
# retention, interpolation, mode. The reference's event-shaped data is
# its 5-min incremental feed (SURVEY §2.11); these are the analyses a
# warehouse runs on top of it.
# ---------------------------------------------------------------------------


@register(
    "funnel_view_click_purchase",
    """
    WITH w1 AS (
      SELECT user_id, event_type, ts,
             MIN(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id) AS v
      FROM events),
    w2 AS (
      SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > v THEN ts END)
                  OVER (PARTITION BY user_id) AS c
      FROM w1),
    w3 AS (
      SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > c THEN ts END)
                  OVER (PARTITION BY user_id) AS p
      FROM w2)
    SELECT
      CAST(COUNT(DISTINCT CASE WHEN v IS NOT NULL THEN user_id END) AS BIGINT) AS n_view,
      CAST(COUNT(DISTINCT CASE WHEN c IS NOT NULL THEN user_id END) AS BIGINT) AS n_view_click,
      CAST(COUNT(DISTINCT CASE WHEN p IS NOT NULL THEN user_id END) AS BIGINT) AS n_full_funnel
    FROM w3
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel (view → click → purchase, strictly
    increasing timestamps): each stage's earliest qualifying time is a
    whole-partition conditional MIN window that references the
    previous stage — three chained Window ops over the SAME user
    partitioning, so Catalyst plans ONE exchange and no sort (frames
    are unordered). No per-stage self-join of the fact, which is the
    naive funnel plan and replicates the stream once per stage."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    t, ty = F.col("ts"), F.col("event_type")
    staged = (
        ev.withColumn("v", F.min(F.when(ty == "view", t)).over(w))
        .withColumn(
            "c", F.min(F.when((ty == "click") & (t > F.col("v")), t)).over(w)
        )
        .withColumn(
            "p", F.min(F.when((ty == "purchase") & (t > F.col("c")), t)).over(w)
        )
    )
    u = F.col("user_id")
    return staged.agg(
        F.countDistinct(F.when(F.col("v").isNotNull(), u)).alias("n_view"),
        F.countDistinct(F.when(F.col("c").isNotNull(), u)).alias("n_view_click"),
        F.countDistinct(F.when(F.col("p").isNotNull(), u)).alias("n_full_funnel"),
    )


@register(
    "retention_cohorts",
    """
    WITH w AS (
      SELECT user_id, ts, MIN(ts) OVER (PARTITION BY user_id) AS first_ts
      FROM events),
    b AS (
      SELECT user_id,
             date_trunc('week', first_ts) AS cw,
             date_trunc('week', ts) AS aw
      FROM w)
    SELECT CAST(epoch_us(cw) AS BIGINT) AS cohort_week_us,
           CAST(date_diff('day', cw, aw) // 7 AS BIGINT) AS week_offset,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users
    FROM b GROUP BY cohort_week_us, week_offset
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users bucketed by first-seen week,
    counted distinct in each subsequent week offset. First-seen is a
    whole-partition MIN window (one exchange on user, no sort), NOT a
    groupBy+self-join — the fact is scanned once and re-keyed once
    for the (cohort, offset) count. Weeks via date_trunc (ISO Monday
    in both engines); offset in whole weeks by integer day-div."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    b = ev.withColumn("first_ts", F.min("ts").over(w)).select(
        "user_id",
        F.date_trunc("week", F.col("first_ts")).alias("cw"),
        F.date_trunc("week", F.col("ts")).alias("aw"),
    )
    return (
        b.select(
            ts_us(F.col("cw")).alias("cohort_week_us"),
            F.expr("datediff(aw, cw) div 7").cast("bigint").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week_us", "week_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@register(
    "linear_interp_event_values",
    """
    WITH gappy AS (
      SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
             CASE WHEN event_id % 5 = 0 THEN NULL
                  ELSE CAST(ROUND(value*100) AS BIGINT) END AS value_c
      FROM events),
    nb AS (
      SELECT *,
        last_value(value_c IGNORE NULLS) OVER wp AS prev_v,
        last_value(CASE WHEN value_c IS NOT NULL THEN ts_us END IGNORE NULLS)
          OVER wp AS prev_t,
        first_value(value_c IGNORE NULLS) OVER wn AS nxt_v,
        first_value(CASE WHEN value_c IS NOT NULL THEN ts_us END IGNORE NULLS)
          OVER wn AS nxt_t
      FROM gappy
      WINDOW
        wp AS (PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        wn AS (PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT event_id, user_id,
           CASE WHEN value_c IS NOT NULL THEN value_c
                WHEN prev_v IS NULL THEN NULL
                WHEN nxt_v IS NULL THEN prev_v
                ELSE prev_v + ((nxt_v - prev_v) * (ts_us - prev_t))
                              // GREATEST(nxt_t - prev_t, 1)
           END AS filled_c
    FROM nb
    """,
)
def linear_interp_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation gap fill: NULLed readings (every 5th,
    injected deterministically) take the time-weighted blend of the
    nearest observations on both sides. Neighbor (value, ts) pairs
    come from IGNORE-NULLS last/first over two frames of ONE
    partition+ordering — one exchange + one sort, no self-join. The
    blend is pure BIGINT: cents × µs fits (≲1e17), and Spark `div` /
    DuckDB `//` both truncate toward zero so the engines agree at
    every boundary. Head rows stay NULL (no back-fill leakage);
    tail rows degrade to LOCF."""
    ev = load(spark, sf_dir, "events")
    gappy = ev.select(
        "event_id",
        "user_id",
        ts_us(F.col("ts")).alias("ts_us"),
        F.when(F.col("event_id") % 5 == 0, F.lit(None))
        .otherwise(cents(F.col("value")))
        .alias("value_c"),
    )
    base = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    wp = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wn = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    obs_ts = F.when(F.col("value_c").isNotNull(), F.col("ts_us"))
    nb = (
        gappy.withColumn("prev_v", F.last("value_c", ignorenulls=True).over(wp))
        .withColumn("prev_t", F.last(obs_ts, ignorenulls=True).over(wp))
        .withColumn("nxt_v", F.first("value_c", ignorenulls=True).over(wn))
        .withColumn("nxt_t", F.first(obs_ts, ignorenulls=True).over(wn))
    )
    interp = F.col("prev_v") + F.expr(
        "((nxt_v - prev_v) * (ts_us - prev_t)) div greatest(nxt_t - prev_t, 1L)"
    )
    return nb.select(
        "event_id",
        "user_id",
        F.when(F.col("value_c").isNotNull(), F.col("value_c"))
        .when(F.col("prev_v").isNull(), F.lit(None))
        .when(F.col("nxt_v").isNull(), F.col("prev_v"))
        .otherwise(interp)
        .alias("filled_c"),
    )


@register(
    "mode_event_type_per_user",
    """
    WITH cnts AS (
      SELECT user_id, event_type, CAST(COUNT(1) AS BIGINT) AS cnt
      FROM events GROUP BY user_id, event_type),
    r AS (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY cnt DESC, event_type ASC) AS rn
      FROM cnts)
    SELECT user_id, event_type AS mode_type, cnt FROM r WHERE rn = 1
    """,
)
def mode_event_type_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode with a pinned tiebreak (count DESC, then
    lexicographic — rank picks are only deterministic under a total
    order). Counting first collapses the fact to |user × type| rows
    map-side, so the row_number window sorts the tiny aggregate, not
    the stream; rn=1 compiles to WindowGroupLimit."""
    ev = load(spark, sf_dir, "events")
    cnts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("user_id").orderBy(
        F.col("cnt").desc(), F.col("event_type").asc()
    )
    return (
        cnts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("mode_type"), "cnt")
    )


@register(
    "nation_pair_trade",
    """
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(year(l_shipdate) AS INT) AS ship_year,
           CAST(SUM(CAST(ROUND((l_extendedprice*(1.0-l_discount))*100) AS BIGINT)) AS BIGINT) AS revenue_c
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    WHERE ((cn.n_name = 'NATION_1' AND sn.n_name = 'NATION_2')
        OR (cn.n_name = 'NATION_2' AND sn.n_name = 'NATION_1'))
    GROUP BY cust_nation, supp_nation, ship_year
    """,
)
def nation_pair_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-nation trade flow (TPC-H Q7 shape): revenue between two
    nations, both directions, by ship year. Six-table join — every
    dim (orders side included? no: orders is a fact) — customer,
    supplier and both nation copies broadcast; the only shuffle join
    is lineitem⋈orders. The direction disjunction is applied AFTER
    the dims resolve names, where the row is already dim-annotated —
    no union-of-two-plans, one fact pass."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(cn), c["c_nationkey"] == F.col("cn_key"))
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(sn), s["s_nationkey"] == F.col("sn_key"))
    )
    pair = (
        (F.col("cust_nation") == "NATION_1") & (F.col("supp_nation") == "NATION_2")
    ) | ((F.col("cust_nation") == "NATION_2") & (F.col("supp_nation") == "NATION_1"))
    return (
        j.filter(pair)
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year(F.col("l_shipdate")).alias("ship_year"),
        )
        .agg(
            F.sum(
                cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
            ).alias("revenue_c")
        )
    )


@register(
    "snapshot_diff_orders",
    """
    WITH base AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0
                  THEN CAST(ROUND(o_totalprice*100) AS BIGINT) - 500
                  ELSE CAST(ROUND(o_totalprice*100) AS BIGINT) END AS price_c
      FROM orders WHERE o_orderkey % 11 <> 0),
    curr AS (
      SELECT o_orderkey, CAST(ROUND(o_totalprice*100) AS BIGINT) AS price_c
      FROM orders WHERE o_orderkey % 13 <> 0)
    SELECT change_type, CAST(COUNT(1) AS BIGINT) AS n
    FROM (
      SELECT CASE WHEN base.o_orderkey IS NULL THEN 'added'
                  WHEN curr.o_orderkey IS NULL THEN 'removed'
                  WHEN base.price_c IS DISTINCT FROM curr.price_c THEN 'changed'
                  ELSE 'unchanged' END AS change_type
      FROM base FULL OUTER JOIN curr USING (o_orderkey)
    ) d GROUP BY change_type
    """,
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed snapshot diff (data-diff / reconciliation): classify every
    key across two table versions as added / removed / changed /
    unchanged via ONE co-partitioned FULL OUTER join — the two-anti-
    joins-plus-inner rewrite scans both snapshots three times. The
    'snapshots' here are deterministic residue-class slices of orders
    (%11 drops rows from base → added, %13 from curr → removed,
    %7 perturbs cents → changed) so the classes are all non-empty at
    every SF. Pairs with sinks.ParquetTable time travel (read two
    retained snapshots) and cdc_apply (the diff IS the changelog)."""
    o = load(spark, sf_dir, "orders")
    price = cents(F.col("o_totalprice"))
    base = o.filter(F.col("o_orderkey") % 11 != 0).select(
        F.col("o_orderkey").alias("b_key"),
        F.when(F.col("o_orderkey") % 7 == 0, price - 500)
        .otherwise(price)
        .alias("b_price_c"),
    )
    curr = o.filter(F.col("o_orderkey") % 13 != 0).select(
        F.col("o_orderkey").alias("c_key"), price.alias("c_price_c")
    )
    d = base.join(curr, base["b_key"] == curr["c_key"], "full_outer").select(
        F.when(F.col("b_key").isNull(), "added")
        .when(F.col("c_key").isNull(), "removed")
        # IS DISTINCT FROM, not <>: a NULL price on one side is a
        # CHANGE, not silently 'unchanged' (same hardening as SCD2)
        .when(~F.col("b_price_c").eqNullSafe(F.col("c_price_c")), "changed")
        .otherwise("unchanged")
        .alias("change_type")
    )
    return d.groupBy("change_type").agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# Corpus statistics — TF-IDF and collocations (log-free integer
# weighting so both engines rank identically; ln() differs in the
# last ulp across engines and these are declared-query contracts).
# ---------------------------------------------------------------------------


@register(
    "tfidf_top_terms",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
      FROM documents WHERE length(trim(text)) > 0),
    tf AS (
      SELECT doc_id, token, CAST(COUNT(1) AS BIGINT) AS tf
      FROM toks WHERE token <> '' GROUP BY doc_id, token),
    wdf AS (
      SELECT *, CAST(COUNT(1) OVER (PARTITION BY token) AS BIGINT) AS df FROM tf),
    n AS (
      SELECT CAST(COUNT(1) AS BIGINT) AS n_docs FROM documents
      WHERE length(trim(text)) > 0),
    scored AS (
      SELECT doc_id, token, tf,
             tf * (n_docs * 1000000 // df) AS score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tf * (n_docs * 1000000 // df) DESC,
                                         token ASC) AS rn
      FROM wdf, n)
    SELECT doc_id, token, CAST(tf AS BIGINT) AS tf, CAST(score AS BIGINT) AS score
    FROM scored WHERE rn <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document. IDF is the LOG-FREE integer
    rarity weight n_docs·1e6 ⫽ df — monotone in 1/df like ln(n/df),
    but exact in BIGINT on both engines (ln() ranks can flip on the
    last ulp). Everything after the explode runs on the collapsed
    (doc, term) table: df is a count window over token (no separate
    agg+join), n_docs a 1-row broadcast, and the per-doc top-3 is
    WindowGroupLimit under a total (score, token) order."""
    d = load(spark, sf_dir, "documents")
    nonempty = d.filter(F.length(F.trim(F.col("text"))) > 0)
    toks = nonempty.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    wdf = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("token"))
    )
    n = nonempty.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = wdf.crossJoin(F.broadcast(n)).withColumn(
        "score", F.expr("tf * ((n_docs * 1000000) div df)")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "token", "tf", "score")
    )


@register(
    "bigram_collocations",
    """
    WITH t AS (
      SELECT list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents WHERE length(trim(text)) > 0),
    big AS (
      SELECT unnest(list_transform(range(1, len(toks)),
                                   i -> toks[i] || ' ' || toks[i+1])) AS bigram
      FROM t),
    uni AS (
      SELECT unnest(toks) AS token FROM t),
    bc AS (SELECT bigram, CAST(COUNT(1) AS BIGINT) AS n_ab FROM big GROUP BY bigram),
    uc AS (SELECT token, CAST(COUNT(1) AS BIGINT) AS n FROM uni GROUP BY token),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_tok FROM uc),
    scored AS (
      SELECT bigram, n_ab,
             (n_ab * n_tok * 1000) // (ua.n * ub.n) AS lift_k
      FROM bc, tot
      JOIN uc ua ON ua.token = string_split(bigram, ' ')[1]
      JOIN uc ub ON ub.token = string_split(bigram, ' ')[2]
      WHERE n_ab >= 5)
    SELECT bigram, n_ab, CAST(lift_k AS BIGINT) AS lift_k
    FROM scored ORDER BY lift_k DESC, bigram ASC LIMIT 50
    """,
)
def bigram_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: adjacent-token bigrams scored by integer
    lift (n_ab·N·1000 ⫽ n_a·n_b — monotone in PMI without ln()).
    Bigrams are built INSIDE the array with a transform lambda
    (slice + index — no posexplode self-join, no window over the
    exploded stream: the pairing never leaves the scan stage). Two
    grouped counts (bigrams, unigrams), two broadcast joins to attach
    unigram counts, TakeOrderedAndProject top-50."""
    d = load(spark, sf_dir, "documents")
    t = d.filter(F.length(F.trim(F.col("text"))) > 0).select(
        F.expr(r"filter(split(lower(trim(text)), '\\s+'), x -> x <> '')").alias(
            "toks"
        )
    )
    big = t.select(
        F.explode(
            F.expr(
                "transform(slice(toks, 1, size(toks)-1),"
                " (x, i) -> concat(x, ' ', toks[i+1]))"
            )
        ).alias("bigram")
    )
    uni = t.select(F.explode("toks").alias("token"))
    bc = big.groupBy("bigram").agg(F.count(F.lit(1)).alias("n_ab"))
    uc = uni.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    tot = uc.agg(F.sum("n").alias("n_tok"))
    ua = uc.select(F.col("token").alias("tok_a"), F.col("n").alias("n_a"))
    ub = uc.select(F.col("token").alias("tok_b"), F.col("n").alias("n_b"))
    scored = (
        bc.filter(F.col("n_ab") >= 5)
        .crossJoin(F.broadcast(tot))
        .withColumn("tok_a", F.split(F.col("bigram"), " ")[0])
        .withColumn("tok_b", F.split(F.col("bigram"), " ")[1])
        .join(F.broadcast(ua), "tok_a")
        .join(F.broadcast(ub), "tok_b")
        .withColumn("lift_k", F.expr("(n_ab * n_tok * 1000) div (n_a * n_b)"))
    )
    return (
        scored.select("bigram", "n_ab", "lift_k")
        .orderBy(F.desc("lift_k"), F.asc("bigram"))
        .limit(50)
    )


@register(
    "unshipped_order_revenue",
    """
    SELECT o_orderkey,
           CAST(SUM(CAST(ROUND((l_extendedprice*(1.0-l_discount))*100) AS BIGINT)) AS BIGINT) AS revenue_c,
           epoch_us(o_orderdate) AS orderdate_us
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '2000-03-15'
      AND l_shipdate > TIMESTAMP '2000-03-15'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue_c DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def unshipped_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority top-k (TPC-H Q3 shape): value still in flight
    at the cutoff for one market segment. Both date predicates push
    to their scans, the segment filter prunes customer BEFORE its
    broadcast, and the final top-10 is TakeOrderedAndProject
    (per-partition heaps) under a total (revenue, orderkey) order —
    no global sort of the aggregate."""
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < _ts("2000-03-15")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > _ts("2000-03-15")
    )
    j = o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"]).join(
        li, o["o_orderkey"] == li["l_orderkey"]
    )
    return (
        j.groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.sum(
                cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
            ).alias("revenue_c")
        )
        .select(
            "o_orderkey",
            "revenue_c",
            ts_us(F.col("o_orderdate").cast("timestamp")).alias("orderdate_us"),
        )
        .orderBy(F.desc("revenue_c"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "nation_market_share",
    """
    WITH sales AS (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             CAST(ROUND((l_extendedprice*(1.0-l_discount))*100) AS BIGINT) AS rev_c,
             sn.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON cn.n_nationkey = c_nationkey
      JOIN region   ON r_regionkey = cn.n_regionkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation sn ON sn.n_nationkey = s_nationkey
      WHERE r_name = 'ASIA'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN rev_c ELSE 0 END) AS BIGINT) AS nation_rev_c,
           CAST(SUM(rev_c) AS BIGINT) AS total_rev_c,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN rev_c ELSE 0 END) * 1000000
                // SUM(rev_c) AS BIGINT) AS share_ppm
    FROM sales GROUP BY o_year
    """,
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market share (TPC-H Q8 shape): one nation's slice of a
    region's purchases per year. The share is a conditional sum over
    ONE seven-table join pass (region filter pushed into the
    customer-nation broadcast chain) — not two parallel aggregates
    unioned — and lands as integer ppm floor-div."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation")
    r = (
        load(spark, sf_dir, "region")
        .filter(F.col("r_name") == "ASIA")
        .select("r_regionkey")
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    sales = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(cn), c["c_nationkey"] == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == r["r_regionkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(sn), s["s_nationkey"] == F.col("sn_key"))
        .select(
            F.year(F.col("o_orderdate")).alias("o_year"),
            cents(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
            ).alias("rev_c"),
            "supp_nation",
        )
    )
    agg = sales.groupBy("o_year").agg(
        F.sum(
            F.when(F.col("supp_nation") == "NATION_7", F.col("rev_c")).otherwise(0)
        ).alias("nation_rev_c"),
        F.sum("rev_c").alias("total_rev_c"),
    )
    return agg.select(
        "o_year",
        "nation_rev_c",
        "total_rev_c",
        F.expr("nation_rev_c * 1000000 div total_rev_c").alias("share_ppm"),
    )


@register(
    "product_profit_by_nation",
    """
    SELECT sn.n_name AS supp_nation, CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(ROUND(((l_extendedprice*(1.0-l_discount))
                               - ((l_quantity*p_retailprice)*0.1))*100) AS BIGINT)) AS BIGINT) AS profit_c
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY supp_nation, o_year
    """,
)
def product_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-line profit (TPC-H Q9 shape): revenue minus a
    10%-of-retail cost proxy (this schema has no ps_supplycost;
    SURVEY §1), for parts matching a name pattern, by supplier
    nation and year. The LIKE prunes the part dim before broadcast;
    the profit expression keeps IDENTICAL double nesting on both
    engines before the single cents round-off."""
    li = load(spark, sf_dir, "lineitem")
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sn = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    profit = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        - (F.col("l_quantity") * F.col("p_retailprice")) * F.lit(0.1)
    )
    j = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(sn), s["s_nationkey"] == F.col("sn_key"))
    )
    return j.groupBy(
        "supp_nation", F.year(F.col("o_orderdate")).alias("o_year")
    ).agg(F.sum(cents(profit)).alias("profit_c"))


@register(
    "returned_item_customers",
    """
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(ROUND((l_extendedprice*(1.0-l_discount))*100) AS BIGINT)) AS BIGINT) AS revenue_c,
           cn.n_name AS cust_nation
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '2000-01-01'
      AND o_orderdate < TIMESTAMP '2000-07-01'
    GROUP BY c_custkey, c_name, cust_nation
    ORDER BY revenue_c DESC, c_custkey ASC
    LIMIT 20
    """,
)
def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item ranking (TPC-H Q10 shape): customers behind the
    most returned revenue in a half-year window. Return-flag and date
    predicates push to the fact scans; customer+nation broadcast;
    top-20 via TakeOrderedAndProject under a total order."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("2000-01-01"))
        & (F.col("o_orderdate") < _ts("2000-07-01"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cn = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(cn), c["c_nationkey"] == F.col("cn_key"))
    )
    return (
        j.groupBy("c_custkey", "c_name", "cust_nation")
        .agg(
            F.sum(
                cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
            ).alias("revenue_c")
        )
        .select("c_custkey", "c_name", "revenue_c", "cust_nation")
        .orderBy(F.desc("revenue_c"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "dominant_part_suppliers",
    """
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS qty_c
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE '%blue%'
      GROUP BY l_partkey, l_suppkey),
    tot AS (
      SELECT *, SUM(qty_c) OVER (PARTITION BY l_partkey) AS part_total_c,
             COUNT(1) OVER (PARTITION BY l_partkey) AS n_supp FROM ps)
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM tot WHERE qty_c * n_supp > part_total_c * 2)
    """,
)
def dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-semi chain (TPC-H Q20 shape): suppliers who shipped
    more than 2x the average supplier's volume of some name-filtered
    part — a scale-free dominance test (an absolute majority never
    survives growth in suppliers-per-part). The inner
    membership set collapses the fact to (part, supplier) partials,
    takes the part total as a window on that aggregate (no second
    fact scan), majority-tests by multiply-through, and feeds a LEFT
    SEMI join against the supplier dim — EXISTS-over-aggregate
    without re-executing per supplier."""
    li = load(spark, sf_dir, "lineitem")
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%blue%"))
        .select("p_partkey")
    )
    ps = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(cents(F.col("l_quantity"))).alias("qty_c"))
    )
    wp = Window.partitionBy("l_partkey")
    tot = ps.withColumn("part_total_c", F.sum("qty_c").over(wp)).withColumn(
        "n_supp", F.count(F.lit(1)).over(wp)
    )
    dominant = tot.filter(
        F.col("qty_c") * F.col("n_supp") > F.col("part_total_c") * 2
    ).select("l_suppkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return s.join(dominant, s["s_suppkey"] == dominant["l_suppkey"], "left_semi")


@register(
    "dq_rule_violations",
    """
    WITH o AS (
      SELECT 'orders' AS table_name, r.rule,
             CAST(r.n AS BIGINT) AS n_violations
      FROM (
        SELECT
          SUM(CASE WHEN NOT (o_totalprice > 0.0) OR o_totalprice IS NULL
                   THEN 1 ELSE 0 END) AS positive_price,
          SUM(CASE WHEN NOT (o_orderstatus IN ('F','O','P'))
                        OR o_orderstatus IS NULL THEN 1 ELSE 0 END) AS known_status,
          SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS custkey_not_null
        FROM orders) w
      CROSS JOIN LATERAL (VALUES
        ('positive_price', w.positive_price),
        ('known_status', w.known_status),
        ('custkey_not_null', w.custkey_not_null)) AS r(rule, n)),
    c AS (
      SELECT 'customer' AS table_name, r.rule,
             CAST(r.n AS BIGINT) AS n_violations
      FROM (
        SELECT
          SUM(CASE WHEN NOT (c_acctbal BETWEEN -100000.0 AND 100000.0)
                        OR c_acctbal IS NULL THEN 1 ELSE 0 END) AS acctbal_range,
          SUM(CASE WHEN NOT (c_name LIKE 'Customer#%') OR c_name IS NULL
                   THEN 1 ELSE 0 END) AS name_format
        FROM customer) w
      CROSS JOIN LATERAL (VALUES
        ('acctbal_range', w.acctbal_range),
        ('name_format', w.name_format)) AS r(rule, n))
    SELECT * FROM o UNION ALL SELECT * FROM c
    """,
)
def dq_rule_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation-suite audit (SURVEY §2.10 Q2 generalized): row
    predicates per table → violation counts. All of a table's rules
    evaluate in ONE conditional-sum scan (quality.rule_violations);
    the per-rule rows come from unpivoting the 1-row aggregate —
    adding a rule never adds a scan. NULL predicate results count as
    violations (dbt strictness, not SQL WHERE semantics)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    oc = Q.rule_violations(
        o,
        {
            "positive_price": F.col("o_totalprice") > 0.0,
            "known_status": F.col("o_orderstatus").isin("F", "O", "P"),
            "custkey_not_null": F.col("o_custkey").isNotNull(),
        },
        table_name="orders",
    )
    cc = Q.rule_violations(
        c,
        {
            "acctbal_range": F.col("c_acctbal").between(-100000.0, 100000.0),
            "name_format": F.col("c_name").like("Customer#%"),
        },
        table_name="customer",
    )
    return oc.unionByName(cc)


@register(
    "orders_equidepth_histogram",
    """
    WITH ranked AS (
      SELECT CAST(ROUND(o_totalprice*100) AS BIGINT) AS price_c,
             row_number() OVER (ORDER BY CAST(ROUND(o_totalprice*100) AS BIGINT),
                                         o_orderkey) AS rn,
             COUNT(1) OVER () AS n
      FROM orders)
    SELECT CAST(((rn - 1) * 8) // n AS INT) AS bucket,
           CAST(COUNT(1) AS BIGINT) AS n_rows,
           CAST(MIN(price_c) AS BIGINT) AS lo_c,
           CAST(MAX(price_c) AS BIGINT) AS hi_c
    FROM ranked GROUP BY bucket
    """,
)
def orders_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (8 equal-population buckets with their
    value bounds) — the complement of the equi-width
    orders_price_histogram: bucket = (rank-1)·8 ⫽ n from a
    row_number under a total (cents, orderkey) order, so bucket
    edges are exact order statistics, not arithmetic grid lines.
    Integer floor-div keeps the edges engine-identical. The
    unpartitioned rank is the single-sort caveat (fine for a
    dim/probe); the implemented 100 TB twin is
    ``operators/sketches.approx_equidepth_histogram`` — GK edges,
    zero sorts, bucket populations pinned within 5% of n/k in
    tests/test_sketches.py."""
    o = load(spark, sf_dir, "orders")
    price = cents(F.col("o_totalprice"))
    w = Window.orderBy(price, F.col("o_orderkey"))
    ranked = o.select(
        price.alias("price_c"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    return (
        ranked.withColumn("bucket", F.expr("CAST(((rn - 1) * 8) div n AS INT)"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("price_c").alias("lo_c"),
            F.max("price_c").alias("hi_c"),
        )
    )


@register(
    "region_nation_revenue_share",
    """
    WITH per_nation AS (
      SELECT r_name AS region, cn.n_name AS nation,
             SUM(CAST(ROUND((l_extendedprice*(1.0-l_discount))*100) AS BIGINT)) AS rev_c
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON cn.n_nationkey = c_nationkey
      JOIN region ON r_regionkey = cn.n_regionkey
      GROUP BY r_name, cn.n_name)
    SELECT region, nation, CAST(rev_c AS BIGINT) AS rev_c,
           CAST(rev_c * 1000000 // SUM(rev_c) OVER (PARTITION BY region) AS BIGINT)
             AS share_of_region_ppm,
           CAST(rev_c * 1000000 // SUM(rev_c) OVER () AS BIGINT)
             AS share_of_total_ppm
    FROM per_nation
    """,
)
def region_nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical percent-of-parent (region→nation): each nation's
    ppm share of its region AND of the grand total, both as window
    sums over the 25-row aggregate — the fact is scanned and shuffled
    once for the base agg, then every level of the hierarchy is free
    (generalizes nation_revenue_share to multi-level)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    per_nation = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(
            F.sum(
                cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
            ).alias("rev_c")
        )
    )
    wr = Window.partitionBy("region")
    wt = Window.partitionBy()
    return per_nation.select(
        "region",
        "nation",
        "rev_c",
        F.expr("rev_c * 1000000").cast("bigint").alias("_num"),
        F.sum("rev_c").over(wr).alias("_rtot"),
        F.sum("rev_c").over(wt).alias("_gtot"),
    ).select(
        "region",
        "nation",
        "rev_c",
        F.expr("_num div _rtot").alias("share_of_region_ppm"),
        F.expr("_num div _gtot").alias("share_of_total_ppm"),
    )


@register(
    "event_transition_matrix",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events)
    SELECT event_type AS from_type, next_type AS to_type,
           CAST(COUNT(1) AS BIGINT) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY from_type, to_type
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition matrix over each user's event sequence
    (the Markov-chain summary behind next-action models): lead()
    under one total (ts, event_id) order per user — one exchange+sort
    — then a count over the 25-cell (from, to) space that collapses
    map-side. Terminal events drop (no synthetic END state)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    )
    return (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "dow_hour_activity_profile",
    """
    SELECT CAST(isodow(ts) AS INT) AS dow,
           CAST(hour(ts) AS INT) AS hod,
           CAST(COUNT(1) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS value_c
    FROM events GROUP BY dow, hod
    """,
)
def dow_hour_activity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality heatmap (ISO day-of-week × hour-of-day): the
    168-cell activity profile behind load forecasting. Calendar-part
    alignment is the cross-engine trap — Spark weekday() is 0=Monday
    vs DuckDB isodow 1=Monday, reconciled by +1 (dayofweek() would
    be 1=SUNDAY — worse). Pure map-side collapse: 168 keys."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        (F.weekday(F.col("ts")) + 1).cast("int").alias("dow"),
        F.hour(F.col("ts")).cast("int").alias("hod"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents(F.col("value"))).alias("value_c"),
    )


@register(
    "grouping_sets_event_stats",
    """
    SELECT COALESCE(event_type, '<all>') AS event_type,
           COALESCE(CAST(user_id % 10 AS BIGINT), -1) AS user_bucket,
           CAST(COUNT(1) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS value_c
    FROM events
    GROUP BY GROUPING SETS ((event_type), (user_id % 10))
    """,
)
def grouping_sets_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSTOM grouping sets — two disjoint profiles, (by type) and
    (by user bucket), in ONE Expand pass: the fact is scanned once
    and each row contributes to both sets map-side, vs two scans +
    UNION ALL. Completes the grouping-analytics trio
    (rollup_returnflag_status, cube_returnflag_status). NULL
    sentinels (<all>/-1) disambiguate each set's inactive column —
    neither grouping column is nullable in the data, so the sentinel
    can't collide."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        (F.col("user_id") % 10).alias("user_bucket"),
        cents(F.col("value")).alias("value_c"),
    )
    gs = ev.groupingSets(
        [["event_type"], ["user_bucket"]], "event_type", "user_bucket"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value_c").alias("value_c"),
    )
    return gs.select(
        F.coalesce(F.col("event_type"), F.lit("<all>")).alias("event_type"),
        F.coalesce(F.col("user_bucket"), F.lit(-1)).cast("bigint").alias(
            "user_bucket"
        ),
        "n",
        "value_c",
    )


@register(
    "doc_stats_by_lang",
    """
    SELECT lang, CAST(COUNT(1) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
    FROM documents GROUP BY lang
    """,
)
def doc_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition audit (per-language volume/size/source
    spread) — the first table a training-data curator asks for.
    Single scan, distinct-source via Expand; n_chars comes from the
    stored column, not a re-measure of text."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.max("n_chars").alias("max_chars"),
        F.countDistinct("source").alias("n_sources"),
    )


@register(
    "part_abc_classification",
    """
    WITH agg AS (
      SELECT l_partkey,
             SUM(CAST(ROUND((l_extendedprice*(1.0-l_discount))*100) AS BIGINT)) AS rev_c
      FROM lineitem GROUP BY l_partkey),
    cum AS (
      SELECT l_partkey, rev_c,
             SUM(rev_c) OVER (ORDER BY rev_c DESC, l_partkey
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_c,
             SUM(rev_c) OVER () AS tot_c
      FROM agg)
    SELECT l_partkey, CAST(rev_c AS BIGINT) AS rev_c,
           CASE WHEN (run_c - rev_c) * 10 < tot_c * 7 THEN 'A'
                WHEN (run_c - rev_c) * 10 < tot_c * 9 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM cum
    """,
)
def part_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification: parts ranked by revenue, class A
    until the running share BEFORE the row reaches 70%, B to 90%,
    C after — the standard inventory 80/20 cut. The running sum and
    the grand total are two frames of one unpartitioned window over
    the ALREADY-AGGREGATED per-part table (single fact shuffle);
    share thresholds multiply through in BIGINT (run·10 < tot·7) so
    no division anywhere. The prior-row share (run−rev) makes the
    classification left-continuous: the part that crosses a
    boundary still belongs to the richer class, matching the
    inventory-management convention."""
    li = load(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_partkey").agg(
        F.sum(
            cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
        ).alias("rev_c")
    )
    wrun = (
        Window.orderBy(F.desc("rev_c"), F.asc("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy()
    cum = agg.select(
        "l_partkey",
        "rev_c",
        F.sum("rev_c").over(wrun).alias("run_c"),
        F.sum("rev_c").over(wtot).alias("tot_c"),
    )
    before = (F.col("run_c") - F.col("rev_c")) * 10
    return cum.select(
        "l_partkey",
        "rev_c",
        F.when(before < F.col("tot_c") * 7, "A")
        .when(before < F.col("tot_c") * 9, "B")
        .otherwise("C")
        .alias("abc_class"),
    )


@register(
    "order_lines_bag_ops",
    """
    WITH a AS (
      SELECT l_partkey, l_suppkey FROM lineitem WHERE l_orderkey % 3 = 0),
    b AS (
      SELECT l_partkey, l_suppkey FROM lineitem WHERE l_orderkey % 4 = 0)
    SELECT
      CAST((SELECT COUNT(1) FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) x)
           AS BIGINT) AS n_except_all,
      CAST((SELECT COUNT(1) FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) x)
           AS BIGINT) AS n_intersect_all
    """,
)
def order_lines_bag_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set operations (EXCEPT ALL / INTERSECT ALL) —
    multiplicities subtract/min rather than collapse, which is what
    dedup accounting needs (set-semantics EXCEPT silently erases
    duplicate counts; cf. repeat_vs_churned_customers for the set
    variant). Spark's exceptAll/intersectAll implement the rewrite:
    per-key count partials, then generate (replicate) the surviving
    multiplicity — no row-identity join, scales as an aggregate."""
    a = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 3 == 0).select(
        "l_partkey", "l_suppkey"
    )
    b = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 4 == 0).select(
        "l_partkey", "l_suppkey"
    )
    ex = a.exceptAll(b).agg(F.count(F.lit(1)).alias("n_except_all"))
    ix = a.intersectAll(b).agg(F.count(F.lit(1)).alias("n_intersect_all"))
    return ex.crossJoin(ix)


@register(
    "brand_weighted_avg_price",
    """
    SELECT p_brand,
           CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)
                    * CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_wx,
           CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_w,
           CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)
                    * CAST(ROUND(l_extendedprice*100) AS BIGINT))
                // SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS BIGINT) AS wavg_price_c
    FROM lineitem JOIN part ON p_partkey = l_partkey
    GROUP BY p_brand
    """,
)
def brand_weighted_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted average price per brand, entirely in BIGINT:
    Σ(w·x) and Σw as integer partials (order-independent), the ratio
    one floor-div at the end — avg() on doubles would accumulate in
    shuffle-arrival order and drift between engines. Products peak
    ~5e10/row, Σ well under 2^63. One broadcast join + one agg."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"]).select(
        "p_brand",
        (cents(F.col("l_quantity")) * cents(F.col("l_extendedprice"))).alias("wx"),
        cents(F.col("l_quantity")).alias("w"),
    )
    return (
        j.groupBy("p_brand")
        .agg(F.sum("wx").alias("sum_wx"), F.sum("w").alias("sum_w"))
        .withColumn("wavg_price_c", F.expr("sum_wx div sum_w"))
    )


@register(
    "order_rank_trio",
    """
    SELECT o_orderkey, o_orderpriority,
           CAST(rank() OVER w AS BIGINT) AS price_rank,
           CAST(dense_rank() OVER w AS BIGINT) AS price_dense_rank,
           CAST(row_number() OVER (PARTITION BY o_orderpriority
                                   ORDER BY CAST(ROUND(o_totalprice*100) AS BIGINT) // 1000000 DESC,
                                            o_orderkey) AS BIGINT) AS rn
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY CAST(ROUND(o_totalprice*100) AS BIGINT) // 1000000 DESC)
    """,
)
def order_rank_trio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / row_number in one query, disambiguated on
    deliberate ties ($10k price bands): rank gaps, dense_rank
    doesn't, row_number needs the extra orderkey tiebreak to be
    deterministic at all. All three share one partition+ordering
    prefix, so Catalyst plans a single exchange+sort (the rn spec
    adds a tiebreak suffix — same sort run)."""
    o = load(spark, sf_dir, "orders")
    band = F.expr("CAST(ROUND(o_totalprice*100) AS BIGINT) div 1000000")
    wb = Window.partitionBy("o_orderpriority").orderBy(band.desc())
    wr = Window.partitionBy("o_orderpriority").orderBy(
        band.desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(wb).cast("bigint").alias("price_rank"),
        F.dense_rank().over(wb).cast("bigint").alias("price_dense_rank"),
        F.row_number().over(wr).cast("bigint").alias("rn"),
    )


@register(
    "monthly_revenue_growth",
    """
    WITH m AS (
      SELECT CAST(strftime(o_orderdate, '%Y%m') AS INT) AS month_id,
             SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS rev_c
      FROM orders GROUP BY month_id)
    SELECT month_id, CAST(rev_c AS BIGINT) AS rev_c,
           CAST(lag(rev_c) OVER (ORDER BY month_id) AS BIGINT) AS prev_rev_c,
           CAST(CASE WHEN lag(rev_c) OVER (ORDER BY month_id) IS NULL THEN NULL
                ELSE (rev_c - lag(rev_c) OVER (ORDER BY month_id)) * 1000000
                     // lag(rev_c) OVER (ORDER BY month_id) END AS BIGINT)
             AS growth_ppm
    FROM m
    """,
)
def monthly_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month growth: lag over the ~80-row month aggregate
    (single fact shuffle; the unpartitioned lag window sorts rows
    that already fit one task). Growth in integer ppm — note the
    truncation-toward-zero div both engines share applies to the
    NEGATIVE growth months too, which is exactly where a floor-vs-
    truncate disagreement would bite."""
    o = load(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_format("o_orderdate", "yyyyMM").cast("int").alias("month_id")
    ).agg(F.sum(cents(F.col("o_totalprice"))).alias("rev_c"))
    w = Window.orderBy("month_id")
    prev = F.lag("rev_c").over(w)
    return m.select(
        "month_id",
        "rev_c",
        prev.alias("prev_rev_c"),
        F.when(prev.isNull(), F.lit(None))
        .otherwise(F.expr(
            "(rev_c - lag(rev_c) OVER (ORDER BY month_id)) * 1000000"
            " div lag(rev_c) OVER (ORDER BY month_id)"
        ))
        .cast("bigint")
        .alias("growth_ppm"),
    )


@register(
    "yoy_nation_revenue",
    """
    SELECT cn.n_name AS nation,
           CAST(SUM(CASE WHEN year(o_orderdate) = 2000
                         THEN CAST(ROUND(o_totalprice*100) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS rev_2000_c,
           CAST(SUM(CASE WHEN year(o_orderdate) = 1999
                         THEN CAST(ROUND(o_totalprice*100) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS rev_1999_c,
           CAST(SUM(CASE WHEN year(o_orderdate) = 2000
                         THEN CAST(ROUND(o_totalprice*100) AS BIGINT) ELSE 0 END)
              - SUM(CASE WHEN year(o_orderdate) = 1999
                         THEN CAST(ROUND(o_totalprice*100) AS BIGINT) ELSE 0 END)
             AS BIGINT) AS delta_c
    FROM orders
    JOIN customer ON c_custkey = o_custkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    WHERE o_orderdate >= TIMESTAMP '1999-01-01'
      AND o_orderdate < TIMESTAMP '2001-01-01'
    GROUP BY nation
    """,
)
def yoy_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year comparison WITHOUT a self-join: both years land
    as conditional sums in one scan (the classic rewrite of
    `t a JOIN t b ON a.year = b.year+1` — which scans twice and
    shuffles twice). Two-year window pushed to the orders scan; dims
    broadcast."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1999-01-01"))
        & (F.col("o_orderdate") < _ts("2001-01-01"))
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("nation")
    )
    yr = F.year(F.col("o_orderdate"))
    price = cents(F.col("o_totalprice"))
    agg = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == F.col("cn_key"))
        .groupBy("nation")
        .agg(
            F.sum(F.when(yr == 2000, price).otherwise(0)).alias("rev_2000_c"),
            F.sum(F.when(yr == 1999, price).otherwise(0)).alias("rev_1999_c"),
        )
    )
    return agg.withColumn("delta_c", F.col("rev_2000_c") - F.col("rev_1999_c"))


@register(
    "customer_order_gap_stats",
    """
    WITH gaps AS (
      SELECT o_custkey,
             date_diff('day',
                       lag(o_orderdate) OVER (PARTITION BY o_custkey
                                              ORDER BY o_orderdate, o_orderkey),
                       o_orderdate) AS gap_days
      FROM orders)
    SELECT o_custkey,
           CAST(COUNT(gap_days) AS BIGINT) AS n_gaps,
           CAST(SUM(gap_days) AS BIGINT) AS total_gap_days,
           CAST(MAX(gap_days) AS BIGINT) AS max_gap_days,
           CAST(SUM(gap_days) // COUNT(gap_days) AS BIGINT) AS avg_gap_days
    FROM gaps WHERE gap_days IS NOT NULL
    GROUP BY o_custkey
    """,
)
def customer_order_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase cadence per customer (the recency feature
    behind churn models): consecutive-order gaps via lag under one
    (date, orderkey) total order per customer, then integer gap
    stats — the lag window and the aggregate share the same
    partitioning key, so the second shuffle collapses to a local agg
    after the window's exchange. First orders drop (no gap)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("gap_days"),
    ).filter(F.col("gap_days").isNotNull())
    return gaps.groupBy("o_custkey").agg(
        F.count("gap_days").alias("n_gaps"),
        F.sum("gap_days").cast("bigint").alias("total_gap_days"),
        F.max("gap_days").cast("bigint").alias("max_gap_days"),
        F.expr("CAST(sum(gap_days) div count(gap_days) AS BIGINT)").alias(
            "avg_gap_days"
        ),
    )


@register(
    "post_purchase_7d_activity",
    """
    WITH e AS (
      SELECT event_id, user_id, event_type,
             CAST(epoch_us(ts) AS BIGINT) AS ts_us
      FROM events),
    win AS (
      SELECT event_id, user_id, event_type,
             CAST(COUNT(1) OVER (
               PARTITION BY user_id ORDER BY ts_us
               RANGE BETWEEN 1 FOLLOWING AND 604800000000 FOLLOWING
             ) AS BIGINT) AS n_next_7d
      FROM e)
    SELECT event_id, user_id, n_next_7d
    FROM win WHERE event_type = 'purchase'
    """,
)
def post_purchase_7d_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-looking RANGE frame: events in the 7 days AFTER each
    purchase (the engagement-after-conversion feature). The frame is
    (ts, ts+7d] in epoch-µs — strictly after, so simultaneous events
    don't self-count — over one exchange+sort per user; the
    complement of rolling_7day_event_value's PRECEDING frame, pinning
    that frames work both directions. Window evaluated BEFORE the
    purchase filter (the frame must see all event types), which is
    why the filter can't push below the window — the one predicate
    in this suite that legitimately must not reach the scan."""
    ev = load(spark, sf_dir, "events")
    e = ev.select(
        "event_id", "user_id", "event_type", ts_us(F.col("ts")).alias("ts_us")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(1, 604_800_000_000)
    )
    return (
        e.withColumn("n_next_7d", F.count(F.lit(1)).over(w).cast("bigint"))
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "n_next_7d")
    )


@register(
    "user_value_outliers",
    """
    WITH w AS (
      SELECT event_id, user_id,
             CAST(ROUND(value*100) AS BIGINT) AS value_c,
             SUM(CAST(ROUND(value*100) AS BIGINT)) OVER (PARTITION BY user_id) AS sum_c,
             COUNT(1) OVER (PARTITION BY user_id) AS n
      FROM events)
    SELECT user_id,
           CAST(COUNT(CASE WHEN value_c * n > 3 * sum_c THEN 1 END) AS BIGINT)
             AS n_outliers,
           CAST(MAX(CASE WHEN value_c * n > 3 * sum_c THEN value_c END) AS BIGINT)
             AS max_outlier_c
    FROM w GROUP BY user_id
    """,
)
def user_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user anomaly flags: events worth >3× the user's own
    average, tested multiply-through (value·n > 3·Σ — no division,
    no float stddev whose sqrt can land differently across engines).
    Whole-partition windows (no sort) share one exchange with the
    follow-up per-user aggregate — the same partitioning-reuse as
    customer_order_gap_stats."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    base = ev.select(
        "user_id",
        cents(F.col("value")).alias("value_c"),
    ).select(
        "user_id",
        "value_c",
        F.sum("value_c").over(w).alias("sum_c"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    is_out = F.col("value_c") * F.col("n") > 3 * F.col("sum_c")
    return base.groupBy("user_id").agg(
        F.count(F.when(is_out, 1)).alias("n_outliers"),
        F.max(F.when(is_out, F.col("value_c"))).alias("max_outlier_c"),
    )


@register(
    "session_conversion_rate",
    """
    WITH e AS (
      SELECT user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS ts_us, event_id
      FROM events),
    flagged AS (
      SELECT *, CASE WHEN ts_us - lag(ts_us) OVER w > 1800000000
                       OR lag(ts_us) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
    sess AS (
      SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sess_no
      FROM flagged),
    per_sess AS (
      SELECT user_id, sess_no,
             MIN(CASE WHEN event_type = 'view' THEN ts_us END) AS first_view,
             MAX(CASE WHEN event_type = 'purchase' THEN ts_us END) AS last_purchase
      FROM sess GROUP BY user_id, sess_no)
    SELECT CAST(COUNT(1) AS BIGINT) AS n_sessions,
           CAST(COUNT(CASE WHEN last_purchase > first_view THEN 1 END) AS BIGINT)
             AS n_converting,
           CAST(COUNT(CASE WHEN last_purchase > first_view THEN 1 END) * 1000000
                // COUNT(1) AS BIGINT) AS conversion_ppm
    FROM per_sess
    """,
)
def session_conversion_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionized conversion: gap-sessionize (30-min silence starts
    a session — the same running-sum-of-gap-flags device as
    operators/sessionize.py) composed with an in-session funnel
    (a view followed later by a purchase). Three window steps share
    ONE user partitioning+ordering — one exchange, one sort — then
    two tiny aggregates. The conversion test compares the session's
    first view to its LAST purchase, so any later purchase counts,
    in integer µs."""
    ev = load(spark, sf_dir, "events")
    e = ev.select(
        "user_id", "event_type", ts_us(F.col("ts")).alias("ts_us"), "event_id"
    )
    wo = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    run = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("ts_us").over(wo)
    flagged = e.withColumn(
        "new_sess",
        F.when(
            prev.isNull() | (F.col("ts_us") - prev > 1_800_000_000), 1
        ).otherwise(0),
    )
    sess = flagged.withColumn("sess_no", F.sum("new_sess").over(run))
    per_sess = sess.groupBy("user_id", "sess_no").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts_us"))).alias(
            "first_view"
        ),
        F.max(F.when(F.col("event_type") == "purchase", F.col("ts_us"))).alias(
            "last_purchase"
        ),
    )
    conv = F.count(F.when(F.col("last_purchase") > F.col("first_view"), 1))
    return per_sess.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        conv.alias("n_converting"),
    ).select(
        "n_sessions",
        "n_converting",
        F.expr("n_converting * 1000000 div n_sessions").alias("conversion_ppm"),
    )


@register(
    "dup_rate_by_source",
    """
    SELECT source,
           CAST(COUNT(1) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
           CAST((COUNT(1) - COUNT(DISTINCT md5(text))) * 1000000
                // COUNT(1) AS BIGINT) AS dup_ppm
    FROM documents GROUP BY source
    """,
)
def dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication rate per corpus source — the triage table that
    decides where dedup effort goes. Content identity via md5 (same
    hex both engines; the exact_dedup_docs device), distinct counted
    through Spark's Expand, rate in integer ppm. One scan; at 100 TB
    swap COUNT(DISTINCT) for the HLL sketch rollup
    (rollup.distinct_sketch_day) and keep the same contract."""
    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct(F.md5(F.col("text").cast("binary"))).alias("n_distinct"),
        )
        .select(
            "source",
            "n_docs",
            "n_distinct",
            F.expr("(n_docs - n_distinct) * 1000000 div n_docs").alias("dup_ppm"),
        )
    )


@register(
    "brand_distinct_buyers",
    """
    SELECT p_brand,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_buyers,
           CAST(COUNT(DISTINCT CASE WHEN l_quantity >= 40.0 THEN o_custkey END)
                AS BIGINT) AS n_bulk_buyers,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    JOIN part ON p_partkey = l_partkey
    GROUP BY p_brand
    """,
)
def brand_distinct_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTIPLE distinct aggregates over different columns in one
    query — total buyers, bulk buyers (conditional distinct), and
    suppliers per brand. Catalyst compiles N distinct columns into
    one Expand (N× row replication, each copy keyed by its distinct
    column) + two-level aggregate — one fact pass, not one scan per
    distinct. The conditional distinct rides the same machinery with
    a CASE-masked key."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).join(
        F.broadcast(p), li["l_partkey"] == p["p_partkey"]
    )
    return j.groupBy("p_brand").agg(
        F.countDistinct("o_custkey").alias("n_buyers"),
        F.countDistinct(
            F.when(F.col("l_quantity") >= 40.0, F.col("o_custkey"))
        ).alias("n_bulk_buyers"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
    )


@register(
    "token_positions_long",
    """
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents WHERE doc_id % 50 = 0 AND length(trim(text)) > 0)
    SELECT doc_id,
           CAST(generate_subscripts(toks, 1) AS INT) AS pos,
           unnest(toks) AS token
    FROM t
    """,
)
def token_positions_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode (LATERAL VIEW posexplode): the long-format
    (doc, position, token) table that positional n-gram / alignment
    features build on. Position comes out of the SAME Generate as
    the token (1-based to match SQL), never from a window over the
    exploded stream — zero shuffles, pure scan-stage expansion.
    Sampled to every 50th doc (a deterministic residue slice, not a
    RNG sample)."""
    d = load(spark, sf_dir, "documents")
    t = d.filter(
        (F.col("doc_id") % 50 == 0) & (F.length(F.trim(F.col("text"))) > 0)
    ).select(
        "doc_id",
        F.expr(r"filter(split(lower(trim(text)), '\\s+'), x -> x <> '')").alias(
            "toks"
        ),
    )
    return t.select(
        "doc_id", F.posexplode(F.col("toks")).alias("pos0", "token")
    ).select("doc_id", (F.col("pos0") + 1).cast("int").alias("pos"), "token")


@register(
    "user_value_variance",
    """
    SELECT user_id,
           CAST(COUNT(1) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS sum_c,
           CAST(COUNT(1) * SUM(CAST(ROUND(value*100) AS BIGINT)
                               * CAST(ROUND(value*100) AS BIGINT))
                - SUM(CAST(ROUND(value*100) AS BIGINT))
                  * SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS var_num,
           CAST((COUNT(1) * SUM(CAST(ROUND(value*100) AS BIGINT)
                                * CAST(ROUND(value*100) AS BIGINT))
                 - SUM(CAST(ROUND(value*100) AS BIGINT))
                   * SUM(CAST(ROUND(value*100) AS BIGINT)))
                // (COUNT(1) * COUNT(1)) AS BIGINT) AS pop_variance_c2
    FROM events GROUP BY user_id
    """,
)
def user_value_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT population variance per user in integer cents²:
    n·Σx² − (Σx)² over n² — both moments are order-independent
    BIGINT partials (map-side combinable like any sum), where
    var_pop() on doubles accumulates M2 in arrival order and drifts
    between engines. Magnitudes checked: x≲49e3 cents → x²≲2.4e9,
    per-user Σx²≲2e11, ×n≲1.4e13 — five orders of magnitude under 2⁶³.
    The raw numerator ships too: numerators ADD across re-partitions
    (the sketch-style mergeability that a finished variance loses)."""
    ev = load(spark, sf_dir, "events")
    x = cents(F.col("value"))
    agg = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sum_c"),
        F.sum(x * x).alias("sum_x2"),
    )
    num = F.col("n") * F.col("sum_x2") - F.col("sum_c") * F.col("sum_c")
    return agg.select(
        "user_id",
        "n",
        "sum_c",
        num.alias("var_num"),
        F.expr(
            "(n * sum_x2 - sum_c * sum_c) div (n * n)"
        ).alias("pop_variance_c2"),
    )


@register(
    "excel_cell_coercion_grid",
    """
    WITH grid AS (
      SELECT CAST(o_orderkey AS VARCHAR) AS item_key,
             CASE WHEN o_orderkey % 7 = 0 THEN ''
                  WHEN o_orderkey % 11 = 0 THEN 'NULL'
                  WHEN o_orderkey % 13 = 0 THEN 'nan'
                  ELSE CAST(o_custkey AS VARCHAR) END AS cust_cell,
             CAST((o_orderkey % 5) * 1000000000 AS VARCHAR) AS big_cell,
             CASE WHEN o_orderkey % 17 = 0 THEN 'nan'
                  ELSE CAST(CAST(ROUND(o_totalprice*100) AS BIGINT) AS VARCHAR)
                  END AS price_cell
      FROM orders),
    typed AS (
      SELECT CASE WHEN CAST(item_key AS DOUBLE)
                       BETWEEN -2147483648 AND 2147483647
                  THEN CAST(CAST(item_key AS DOUBLE) AS BIGINT) ELSE NULL
                  END AS item_key,
             CASE WHEN cust_cell IN ('', 'NULL', 'nan', 'None') THEN NULL
                  WHEN CAST(cust_cell AS DOUBLE)
                       NOT BETWEEN -2147483648 AND 2147483647 THEN NULL
                  ELSE CAST(CAST(cust_cell AS DOUBLE) AS BIGINT) END AS cust_id,
             CASE WHEN CAST(big_cell AS DOUBLE)
                       BETWEEN -2147483648 AND 2147483647
                  THEN CAST(CAST(big_cell AS DOUBLE) AS BIGINT) ELSE NULL
                  END AS big_val,
             CASE WHEN price_cell IN ('', 'NULL', 'nan', 'None') THEN NULL
                  ELSE CAST(price_cell AS DOUBLE) END AS price_c
      FROM grid)
    SELECT item_key, cust_id, big_val,
           CAST(price_c AS BIGINT) AS price_c
    FROM typed WHERE item_key IS NOT NULL
    """,
)
def excel_cell_coercion_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10 per-cell coercion contract, oracle-checked (VERDICT item
    10): an Excel-like all-string grid is synthesized from orders
    (null-marker dirt on a schedule, a column that overflows int32
    for 2 of 5 rows) and pushed through the engine's
    ``excel_cell_coercions`` — the same Column-expression contract
    ``excel_rows_source`` applies to driver-parsed sheets
    (``pns_to_ods_optimize.py:135-175``): marker cells → NULL,
    declared-int cells through the int32 guard (3e9/4e9 → NULL,
    0/1e9/2e9 kept), floats cast, rows with a NULL key dropped.
    The oracle replays the int32 guard for EVERY Int64 column
    (item_key/cust_cell too, not just big_cell) so it encodes the
    full declared contract rather than relying on fixture value
    ranges — at large SF an orderkey past int32 must NULL-and-drop
    identically on both engines (round-2 ADVICE).
    Everything is whole-stage codegen over one scan — no Python, no
    shuffle."""
    from ..sources.readers import excel_cell_coercions

    o = load(spark, sf_dir, "orders")
    grid = o.select(
        F.col("o_orderkey").cast("string").alias("item_key"),
        F.when(F.col("o_orderkey") % 7 == 0, "")
        .when(F.col("o_orderkey") % 11 == 0, "NULL")
        .when(F.col("o_orderkey") % 13 == 0, "nan")
        .otherwise(F.col("o_custkey").cast("string"))
        .alias("cust_cell"),
        ((F.col("o_orderkey") % 5) * 1000000000).cast("string").alias("big_cell"),
        F.when(F.col("o_orderkey") % 17 == 0, "nan")
        .otherwise(cents(F.col("o_totalprice")).cast("string"))
        .alias("price_cell"),
    )
    typed = excel_cell_coercions(
        grid,
        {
            "item_key": "Int64",
            "cust_cell": "Int64",
            "big_cell": "Int64",
            "price_cell": "float64",
        },
        drop_null_cols=["item_key"],
    )
    return typed.select(
        F.col("item_key"),
        F.col("cust_cell").alias("cust_id"),
        F.col("big_cell").alias("big_val"),
        F.col("price_cell").cast("bigint").alias("price_c"),
    )


# Register the LLM-pipeline declared queries (dedup / similarity /
# text analysis / multimodal) and the wave-2 analytics/curation
# queries into the same registry. Imports sit at the bottom because
# both modules import `register`/`load` from here.
from . import llm_queries  # noqa: E402,F401
from . import analytics_queries  # noqa: E402,F401


@register(
    "native_session_windows",
    """
    WITH e AS (
      SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS t FROM events
    ), marked AS (
      SELECT user_id, t,
             CASE WHEN LAG(t) OVER w IS NULL
                       OR t - LAG(t) OVER w > 1800000000 THEN 1 ELSE 0 END AS is_new
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)
    ), sess AS (
      SELECT user_id, t,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY t
                               ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM marked
    )
    SELECT user_id,
           CAST(MIN(t) AS BIGINT) AS session_start,
           CAST(MAX(t) + 1800000000 AS BIGINT) AS session_end,
           CAST(COUNT(1) AS BIGINT) AS n_events
    FROM sess GROUP BY user_id, session_idx
    """,
)
def native_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session-window aggregation
    (streaming/windowed.py::session_windowed_agg, here in its batch
    mode) value-checked against a gaps-and-islands replay: the
    native operator merges events within the 30-min gap into
    [first, last+gap] windows inside the aggregation itself — a
    genuinely different code path from the lag/window formulation
    (`sessionize_events`), which is exactly why it earns its own
    oracle row. Boundary contract (verified in pytest): events
    spaced EXACTLY one gap apart merge in both formulations (native
    window end is inclusive; islands split strictly greater-than).
    One exchange on user_id; sessions merge inside the agg — no
    second window pass."""
    from ..streaming.windowed import session_windowed_agg

    ev = load(spark, sf_dir, "events")
    out = session_windowed_agg(
        ev, "ts", "30 minutes", "0 seconds", keys=["user_id"]
    )
    return out.select(
        "user_id",
        ts_us(F.col("session_start")).alias("session_start"),
        ts_us(F.col("session_end")).alias("session_end"),
        F.col("n_events").cast("bigint").alias("n_events"),
    )
