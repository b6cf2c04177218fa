"""Stream–static dimension enrichment.

The reference enriches facts with dims only in batch SQL (J1,
`dags/sql/ods_to_llb/extract/staging_revenue_by_employee.sql:18`);
the streaming engine needs the same join against a slowly-changing
dim WITHOUT restarting the query when the dim changes. Structured
Streaming's stream–static join re-evaluates the static side per
micro-batch, so a dim TABLE (not a cached DataFrame) picks up
updates between batches — that is the property this module pins
down (and the test exercises: rows arriving after a dim rewrite see
the new attributes).

Scale notes: the static side is re-planned every batch, so keep it
broadcast-sized or pre-bucketed; a snapshot-swapped ParquetTable
(sinks.py) is the intended dim source — its atomic rename means a
micro-batch never reads a half-written dim.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: Sequence[str] | str,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Join a streaming fact with a static dim.

    ``left`` keeps unmatched stream rows (late dim arrival shows as
    NULL attributes rather than dropped facts — the reference's
    MERGE semantics never drop source rows either, SURVEY §2.3).
    ``broadcast_dim`` pins the hash-side: stream–static inner/left
    joins must never shuffle the stream on a per-batch basis.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on=list(on) if not isinstance(on, str) else [on], how=how)
