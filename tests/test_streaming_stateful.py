"""applyInPandasWithState operators: cross-batch dedup and
sessionization, exercised through real file-source streams with
checkpointed state surviving query restarts."""

from __future__ import annotations

import datetime as dt

import pytest

SCHEMA = "event_id long, user_id long, ts timestamp, value double"


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(str(path))


def _drain(spark, src, ckpt, out, transform):
    q = (
        transform(spark.readStream.schema(SCHEMA).parquet(str(src)))
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


T = dt.datetime(2024, 9, 1, 12, 0, 0)


def test_streaming_dedup_first_seen_across_batches(spark, tmp_path):
    from ods_v3_dbt_spark.streaming.stateful import streaming_dedup_first_seen

    src, ckpt, out = tmp_path / "src", tmp_path / "ckpt", tmp_path / "out"
    tf = lambda df: streaming_dedup_first_seen(df, ["event_id"], SCHEMA)  # noqa: E731

    _write_batch(spark, src, [(1, 10, T, 1.0), (2, 10, T, 2.0)])
    _drain(spark, src, ckpt, out, tf)
    # batch 2 replays event 1+2 (different value) and adds event 3 —
    # state in the checkpoint must suppress the replays
    _write_batch(spark, src, [(1, 10, T, 99.0), (2, 10, T, 99.0), (3, 11, T, 3.0)])
    _drain(spark, src, ckpt, out, tf)

    got = {r.event_id: r.value for r in spark.read.parquet(str(out)).collect()}
    assert got == {1: 1.0, 2: 2.0, 3: 3.0}


def test_streaming_sessionize_gap_close(spark, tmp_path):
    from ods_v3_dbt_spark.streaming.stateful import streaming_sessionize

    src, ckpt, out = tmp_path / "src", tmp_path / "ckpt", tmp_path / "out"
    tf = lambda df: streaming_sessionize(df, gap_seconds=600)  # noqa: E731

    def ev(eid, uid, offset_s):
        return (eid, uid, T + dt.timedelta(seconds=offset_s), 1.0)

    # user 10: 3 events within gap; user 11: 1 event
    _write_batch(spark, src, [ev(1, 10, 0), ev(2, 10, 100), ev(3, 10, 500), ev(4, 11, 0)])
    _drain(spark, src, ckpt, out, tf)
    # nothing closed yet — sessions still open in state
    assert spark.read.schema(
        "user_id long, session_start_s long, session_end_s long, n_events long"
    ).parquet(str(out)).count() == 0

    # user 10 returns 2h later → previous session closes (3 events);
    # user 11 within gap → still open
    _write_batch(spark, src, [ev(5, 10, 7800), ev(6, 11, 300)])
    _drain(spark, src, ckpt, out, tf)
    rows = spark.read.parquet(str(out)).collect()
    assert len(rows) == 1
    s = rows[0]
    base = int(T.replace(tzinfo=dt.timezone.utc).timestamp())
    assert s.user_id == 10 and s.n_events == 3
    assert s.session_start_s == base and s.session_end_s == base + 500


def test_streaming_windowed_agg_drops_late_rows(spark, tmp_path):
    """Watermarked tumbling windows in append mode: a row later than
    the delay behind max event time is dropped; in-delay rows still
    land; each window is emitted exactly once, after the watermark
    passes its end (across checkpointed restarts)."""
    from pyspark.sql import functions as F

    from ods_v3_dbt_spark.streaming.windowed import windowed_agg

    src, ckpt, out = tmp_path / "src", tmp_path / "ckpt", tmp_path / "out"
    tf = lambda df: windowed_agg(  # noqa: E731
        df, "ts", "1 hour", "30 minutes", aggs=[F.count(F.lit(1)).alias("n_events")]
    )

    def ev(eid, hh, mm):
        return (eid, 10, dt.datetime(2024, 9, 1, hh, mm), 1.0)

    # batch 1: two rows in [12:00,13:00), one at 14:00 → max event 14:00,
    # so the checkpointed watermark becomes 13:30 after this drain
    _write_batch(spark, src, [ev(1, 12, 5), ev(2, 12, 10), ev(3, 14, 0)])
    _drain(spark, src, ckpt, out, tf)
    # batch 2: 12:20 is older than the 13:30 watermark → DROPPED;
    # 13:40 is within delay → counts into [13:00,14:00); 14:30 joins
    # [14:00,15:00). Emits [12:00,13:00) with n=2 (late row excluded).
    _write_batch(spark, src, [ev(4, 12, 20), ev(5, 13, 40), ev(6, 14, 30)])
    _drain(spark, src, ckpt, out, tf)
    # two flush batches: advance the watermark past 14:00 then 15:00
    _write_batch(spark, src, [ev(7, 16, 0)])
    _drain(spark, src, ckpt, out, tf)
    _write_batch(spark, src, [ev(8, 17, 0)])
    _drain(spark, src, ckpt, out, tf)

    got = {
        (r.window_start.hour): r.n_events
        for r in spark.read.parquet(str(out)).collect()
    }
    assert got == {12: 2, 13: 1, 14: 2}


def test_streaming_interval_join_cross_batch(spark, tmp_path):
    """Watermarked stream-stream interval join: purchases match the
    click from the same user within the 10-minute lookback, including
    a click buffered in state from an earlier micro-batch; a purchase
    with no in-window click never emits (inner join)."""
    from pyspark.sql import functions as F

    from ods_v3_dbt_spark.streaming.windowed import interval_join

    clicks, buys = tmp_path / "clicks", tmp_path / "buys"
    ckpt, out = tmp_path / "ckpt", tmp_path / "out"

    def drain():
        l = spark.readStream.schema(SCHEMA).parquet(str(buys))
        r = spark.readStream.schema(SCHEMA).parquet(str(clicks))
        j = interval_join(
            l, r, key="user_id", left_ts="ts", right_ts="ts",
            delay="30 minutes", max_lag="10 minutes",
        ).select(
            F.col("l.event_id").alias("purchase_id"),
            F.col("r.event_id").alias("click_id"),
            F.col("l.user_id").alias("user_id"),
        )
        q = (
            j.writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def ev(eid, uid, hh, mm):
        return (eid, uid, dt.datetime(2024, 9, 1, hh, mm), 1.0)

    # batch 1: click c1 then purchase p1 five minutes later — matches
    _write_batch(spark, clicks, [ev(100, 10, 12, 0)])
    _write_batch(spark, buys, [ev(1, 10, 12, 5)])
    drain()
    # batch 2: p4 (u10) matches c1 BUFFERED from batch 1; c2+p3 (u11)
    # match within the batch
    _write_batch(spark, clicks, [ev(101, 11, 12, 0)])
    _write_batch(spark, buys, [ev(4, 10, 12, 7), ev(3, 11, 12, 8)])
    drain()
    # batch 3: p2 (u10, 14:00) has no click in (13:50, 14:00] → no row
    _write_batch(spark, clicks, [ev(102, 99, 14, 0)])
    _write_batch(spark, buys, [ev(2, 10, 14, 0)])
    drain()

    got = {(r.purchase_id, r.click_id) for r in spark.read.parquet(str(out)).collect()}
    assert got == {(1, 100), (4, 100), (3, 101)}


def test_stream_static_enrich_sees_dim_refresh(spark, tmp_path):
    """Stream-static enrichment across micro-batch cycles: rows
    processed after the dim is rewritten must carry the NEW
    attributes, and unmatched stream rows survive with NULLs (left
    join — facts are never dropped). Each cycle re-reads the dim the
    way the engine's run_available_now cadence does."""
    from ods_v3_dbt_spark.streaming.enrich import enrich_stream

    src, ckpt, out = tmp_path / "src", tmp_path / "ckpt", tmp_path / "out"
    dim_path = tmp_path / "dim"

    def dim_df():
        return spark.read.parquet(str(dim_path))

    def drain():
        q = (
            enrich_stream(
                spark.readStream.schema(SCHEMA).parquet(str(src)),
                dim_df().withColumnRenamed("uid", "user_id"),
                on="user_id",
            )
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame([(10, "bronze")], "uid long, tier string").write.parquet(
        str(dim_path)
    )
    _write_batch(spark, src, [(1, 10, T, 1.0), (2, 77, T, 2.0)])
    drain()

    # dim refresh between cycles (snapshot-swap semantics)
    spark.createDataFrame(
        [(10, "gold"), (77, "silver")], "uid long, tier string"
    ).write.mode("overwrite").parquet(str(dim_path))
    _write_batch(spark, src, [(3, 10, T, 3.0), (4, 77, T, 4.0)])
    drain()

    got = {r.event_id: r.tier for r in spark.read.parquet(str(out)).collect()}
    assert got == {1: "bronze", 2: None, 3: "gold", 4: "silver"}


def test_dedup_within_watermark_bounded_state(spark, tmp_path):
    """Native dropDuplicatesWithinWatermark semantics: a replay
    inside the watermark horizon is suppressed; once the watermark
    passes a key, its state is EVICTED and a later replay re-emits —
    the documented bounded-state trade-off vs first-seen dedup
    (state ~ keys per horizon, not all keys ever)."""
    from ods_v3_dbt_spark.streaming.stateful import dedup_within_watermark

    src, ckpt, out = tmp_path / "src", tmp_path / "ckpt", tmp_path / "out"
    tf = lambda df: dedup_within_watermark(df, ["event_id"], "ts", "1 hour")  # noqa: E731

    # batch 1: e1 + an in-batch replay of e1 → one row
    _write_batch(spark, src, [(1, 10, T, 1.0), (1, 10, T, 99.0)])
    _drain(spark, src, ckpt, out, tf)
    # batch 2: e1 replay within the horizon → suppressed by state;
    # e2 at T+10h drags the watermark far past e1
    _write_batch(
        spark, src,
        [(1, 10, T + dt.timedelta(minutes=5), 98.0),
         (2, 11, T + dt.timedelta(hours=10), 2.0)],
    )
    _drain(spark, src, ckpt, out, tf)
    # batch 3: e1 again, long after the watermark evicted it → re-emitted
    _write_batch(spark, src, [(1, 10, T + dt.timedelta(hours=10), 97.0)])
    _drain(spark, src, ckpt, out, tf)

    rows = spark.read.parquet(str(out)).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.event_id, []).append(r.value)
    assert sorted(by_id[1]) == [1.0, 97.0]  # first win + post-eviction re-emit
    assert by_id[2] == [2.0]


def test_streaming_change_filter_suppresses_unchanged(spark, tmp_path):
    """transformWithState CDC filter: re-extracted unchanged rows are
    suppressed across micro-batches (checkpointed fingerprint state);
    a real change passes; a change back to an OLD value also passes
    (the state is last-emitted, not a seen-set)."""
    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="transformWithState's JVM<->Python state protocol needs protobuf",
    )
    from ods_v3_dbt_spark.streaming.stateful import streaming_change_filter

    schema = "item long, fp string, payload double"
    src, ckpt, out = tmp_path / "src", tmp_path / "ckpt", tmp_path / "out"

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(str(src))

    def drain():
        q = (
            streaming_change_filter(
                spark.readStream.schema(schema).parquet(str(src)),
                ["item"], "fp", schema,
            )
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write([(1, "a", 1.0), (2, "x", 2.0)])
    drain()
    # batch 2: item 1 unchanged (suppressed), item 2 changed (passes),
    # item 3 new (passes)
    write([(1, "a", 1.5), (2, "y", 2.5), (3, "q", 3.0)])
    drain()
    # batch 3: item 2 flips BACK to x — must pass (last-emitted was y)
    write([(2, "x", 2.9)])
    drain()

    rows = spark.read.parquet(str(out)).collect()
    got = sorted((r.item, r.fp, r.payload) for r in rows)
    assert got == [
        (1, "a", 1.0),
        (2, "x", 2.0),
        (2, "x", 2.9),
        (2, "y", 2.5),
        (3, "q", 3.0),
    ]


def test_native_session_window_matches_gaps_and_islands(spark):
    """Batch equivalence: the native session_window aggregation and
    the gaps-and-islands sessionize operator must agree on session
    START and event count per user (ends differ by contract: native
    extends last event by the gap)."""
    from pyspark.sql import functions as F

    from ods_v3_dbt_spark.operators.sessionize import sessionize
    from ods_v3_dbt_spark.streaming.windowed import session_windowed_agg

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    native = session_windowed_agg(
        ev, "ts", "30 minutes", "0 seconds", keys=["user_id"]
    )
    evs = ev.withColumn("ts_s", F.unix_timestamp("ts"))
    gi = (
        sessionize(evs, ["user_id"], "ts_s", gap=1800)
        .groupBy("user_id", "session_idx")
        .agg(F.min("ts").alias("session_start"), F.count(F.lit(1)).alias("n_events"))
    )
    a = {(r.user_id, r.session_start, r.n_events) for r in native.collect()}
    b = {(r.user_id, r.session_start, r.n_events) for r in gi.collect()}
    assert a == b and len(a) > 0


def test_streaming_native_session_window_emits_on_watermark(spark, tmp_path):
    """Streaming: a session is emitted only once the watermark passes
    its close — batch 1 leaves both sessions open (no watermark
    progress beyond close+gap), batch 2's late-clock event closes
    user 10's first session."""
    from ods_v3_dbt_spark.streaming.windowed import session_windowed_agg

    src, ckpt, out = tmp_path / "src", tmp_path / "ckpt", tmp_path / "out"
    tf = lambda df: session_windowed_agg(  # noqa: E731
        df, "ts", "10 minutes", "5 minutes", keys=["user_id"]
    )

    def ev(eid, uid, offset_s):
        return (eid, uid, T + dt.timedelta(seconds=offset_s), 1.0)

    _write_batch(spark, src, [ev(1, 10, 0), ev(2, 10, 100), ev(3, 11, 0)])
    _drain(spark, src, ckpt, out, tf)
    schema = "session_start timestamp, session_end timestamp, user_id long, n_events long"
    assert spark.read.schema(schema).parquet(str(out)).count() == 0

    # 2h later: watermark jumps past both earlier session closes
    _write_batch(spark, src, [ev(4, 10, 7200)])
    _drain(spark, src, ckpt, out, tf)
    rows = spark.read.schema(schema).parquet(str(out)).collect()
    got = {(r.user_id, r.n_events) for r in rows}
    assert got == {(10, 2), (11, 1)}
    s10 = next(r for r in rows if r.user_id == 10)
    # native contract: end = last event + gap
    assert (s10.session_end - s10.session_start).total_seconds() == 100 + 600
