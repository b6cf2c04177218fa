"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference has no true streaming runtime (SURVEY §2.11) — these
cover the beyond-parity streaming surface a continuous ingest needs:

* :func:`streaming_dedup_first_seen` — cross-batch keyed dedup: emit
  each key's first-seen row exactly once, however many micro-batches
  (or replays) later duplicates arrive. State = one marker per key,
  persisted in the checkpoint, so a restart resumes exactly.
* :func:`streaming_sessionize` — gap-based sessionization per user:
  events within ``gap`` of the previous event extend the session;
  a longer silence closes it and emits (user, session_start, end,
  n_events). The classic ``applyInPandasWithState`` shape.

Scale notes: state is partitioned by the grouping key (same hash
shuffle as any groupBy); per-key state here is O(1) bytes, so state
store size is linear in distinct keys, not events. Use watermarks +
timeouts to bound it for unbounded key spaces.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_dedup_first_seen(
    df: DataFrame,
    key_cols: Sequence[str],
    output_schema: str,
) -> DataFrame:
    """Exactly-once-per-key emission across micro-batches.

    ``output_schema`` must be the DDL of the input columns (the rows
    pass through unchanged). Within one batch, the first row by
    arrival order wins — pin an explicit ordering upstream if the
    source can reorder (A7 determinism rule).
    """

    def dedup(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return
        first: pd.DataFrame | None = None
        for pdf in pdfs:
            if len(pdf):
                first = pdf.head(1)
                break
        if first is not None:
            state.update((True,))
            yield first

    return (
        df.groupBy(*key_cols)
        .applyInPandasWithState(
            dedup,
            outputStructType=output_schema,
            stateStructType="seen boolean",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Gap-based session aggregation per user.

    Emits one row per CLOSED session (a new event more than
    ``gap_seconds`` after the last one closes the previous session);
    the open session stays in state awaiting more events. Epoch-second
    state keeps the state row fixed-width.
    """

    out_schema = f"{user_col} long, session_start_s long, session_end_s long, n_events long"

    def sessionize(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (start_s, end_s, n) = state.get if state.exists else (None, None, 0)
        closed: list[tuple[Any, int, int, int]] = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            ts = (
                pd.to_datetime(pdf[ts_col]).astype("int64") // 1_000_000_000
            ).sort_values()
            for t in ts:
                t = int(t)
                if start_s is None:
                    start_s, end_s, n = t, t, 1
                elif t - end_s <= gap_seconds:
                    end_s, n = max(end_s, t), n + 1
                else:
                    closed.append((key[0], start_s, end_s, n))
                    start_s, end_s, n = t, t, 1
        if start_s is not None:
            state.update((start_s, end_s, n))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[user_col, "session_start_s", "session_end_s", "n_events"],
            )

    return (
        df.groupBy(user_col)
        .applyInPandasWithState(
            sessionize,
            outputStructType=out_schema,
            stateStructType="start_s long, end_s long, n long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def dedup_within_watermark(
    stream: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    delay: str = "6 hours",
) -> DataFrame:
    """Native bounded-state streaming dedup
    (``dropDuplicatesWithinWatermark``): suppress duplicate keys that
    arrive within the watermark ``delay`` of each other, and EVICT
    the key's state once the watermark passes it.

    This is the 100 TB-stream counterpart to
    :func:`streaming_dedup_first_seen`: first-seen keeps one marker
    per key FOREVER (exact, but state grows with distinct keys —
    right for bounded key spaces like dimension codes), while this
    operator bounds state to the keys seen inside one watermark
    horizon (right for unbounded key spaces like event ids, at the
    documented cost that a duplicate arriving after the horizon is
    re-emitted). The batch twin is ``event_burst_dedup``'s 6 h
    near-time rule (plans/analytics_queries.py).
    """
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


# ---------------------------------------------------------------------------
# transformWithState (Spark 4 arbitrary-state API)
# ---------------------------------------------------------------------------


def streaming_change_filter(
    df: DataFrame,
    key_cols: Sequence[str],
    fingerprint_col: str,
    output_schema: str,
    ttl_ms: int | None = None,
) -> DataFrame:
    """CDC change suppression on the new ``transformWithStateInPandas``
    API (Spark 4 StatefulProcessor): per key, emit a row only when its
    content fingerprint DIFFERS from the last emitted one — the
    streaming twin of the batch sparse-update coalescing (a full-row
    re-extract where most rows are unchanged should cost downstream
    merges only the real changes; the reference re-extracts whole ODS
    tables nightly, so this is the filter that turns "everything
    arrived again" into "what actually changed").

    Within one batch, rows for a key are processed in arrival order
    (pin an explicit ordering upstream if the source reorders — the
    A7 determinism rule). State = one fingerprint string per key in a
    ``ValueState``; ``ttl_ms`` bounds state for unbounded key spaces
    (an expired key's next row re-emits — at-least-once on the
    re-emit side, never a missed change).

    Scale: state is hash-partitioned by key like any groupBy; per-key
    state is one fingerprint, so the store is O(distinct keys), and
    TTL turns that into O(active keys).

    Runtime requirement: the transformWithState protocol speaks
    protobuf between the JVM and the Python state server —
    ``google.protobuf`` must be importable (it is in any standard
    PySpark deployment; this container omits it, so the test
    skips). The operator raises ImportError eagerly with a clear
    message rather than crashing the streaming driver worker.
    """
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "transformWithStateInPandas requires the protobuf package "
            "(pip install protobuf) — the Spark state-server protocol "
            "uses it; applyInPandasWithState operators in this module "
            "have no such dependency"
        ) from e
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class ChangeFilter(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._last = handle.getValueState(
                "last_fp", "fp string", ttlDurationMs=ttl_ms
            )

        def handleInputRows(self, key, rows, timerValues):
            last = self._last.get()[0] if self._last.exists() else None
            for pdf in rows:
                if not len(pdf):
                    continue
                fps = pdf[fingerprint_col].astype(str)
                keep = []
                for i, fp in enumerate(fps):
                    if fp != last:
                        keep.append(i)
                        last = fp
                if keep:
                    yield pdf.iloc[keep]
            if last is not None:
                self._last.update((last,))

        def close(self) -> None:
            pass

    return df.groupBy(*key_cols).transformWithStateInPandas(
        statefulProcessor=ChangeFilter(),
        outputStructType=output_schema,
        outputMode="append",
        timeMode="None",
    )
