"""Iterative graph operators beyond connected components: integer
fixed-point PageRank — the link-authority signal crawl-curation
pipelines use to weight domains/URLs before extraction (Common
Crawl publishes exactly this as its domain-level ranks; a
pretraining corpus inherits it as a source-quality prior).

Why integer fixed-point: float power iteration sums contributions in
nondeterministic order across partitions — the same hazard the
embedding kernels dodge by quantizing. Here every rank is a BIGINT
in ppm units (1e6 = the initial mass of one node) and every step is
``pr div outdeg`` / ``damping · Σ div 1e6`` floor arithmetic, so the
fixed number of power-iteration rounds is bit-reproducible on any
engine — the DuckDB oracle replays the rounds as unrolled CTE
stages. Floor-division truncation loses ≤1 ppm per edge per round
(the mass leak is bounded and deterministic), which is noise against
the damping teleport term.

Scale shape (100 TB edge list): the per-round cost is one join of
edges against the node-rank table on ``src`` plus one aggregation
shuffling on ``dst``. The edge+degree table is static across rounds —
``pagerank_int`` repartitions it on ``src`` ONCE and persists, so
every round's join reuses that exchange and only the (much smaller)
rank table moves; rounds are chained through ``localCheckpoint`` to
cut lineage growth (the components operator's discipline). Hub skew
on ``dst`` is AQE's skew-join case; a salting pass is the documented
escalation. Dangling nodes: the synthetic-graph contract guarantees
out-edges everywhere; for general graphs the standard
redistribute-dangling-mass term would be one extra scalar aggregate
per round (documented, not needed here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_int(
    edges: DataFrame,
    iterations: int = 5,
    damping_ppm: int = 850_000,
    src: str = "src",
    dst: str = "dst",
    seeds: DataFrame | None = None,
) -> DataFrame:
    """Fixed-iteration integer PageRank over an edge list (parallel
    edges count once each; nodes = src ∪ dst). Returns (node, pr)
    with pr in ppm units, pr0 = 1e6 per node:

        pr'(v) = (1e6 − damping_ppm)
                 + damping_ppm · Σ_{u→v} (pr(u) div outdeg(u)) div 1e6

    With ``seeds`` (a ``node``-column DataFrame) the walk is
    PERSONALIZED (Haveliwala, WWW 2002): teleport mass lands ONLY on
    seed nodes and the initial 1e6 mass sits only on seeds, so
    ranks measure proximity to the seed set — the crawl-curation
    device for scoring pages by closeness to a trusted whitelist
    (TrustRank, Gyöngyi et al., VLDB 2004) instead of global
    authority. Non-seed teleport and init terms are exactly 0;
    everything stays all-positive BIGINT, so the same unrolled-CTE
    oracle discipline replays it.

    All-positive BIGINT floor arithmetic → identical on Spark's
    ``div`` (trunc) and DuckDB's ``//`` (floor)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if seeds is not None:
        # tiny-by-contract seed set: broadcast the membership flag
        sd = seeds.select(F.col("node")).distinct()
        nodes = nodes.join(
            F.broadcast(sd.withColumn("__seed", F.lit(1))), "node", "left"
        ).select("node", F.coalesce(F.col("__seed"), F.lit(0)).alias("seed"))
    else:
        nodes = nodes.select("node", F.lit(1).alias("seed"))
    # static across rounds: partition on the join key once, persist
    esd = e.join(deg, "src").repartition("src").persist()
    base = 1_000_000
    pr = nodes.select(
        "node", (F.lit(base) * F.col("seed")).cast("bigint").alias("pr")
    )
    for _ in range(iterations):
        contrib = (
            esd.join(pr, esd["src"] == pr["node"])
            .select(F.col("dst").alias("node"), F.expr("pr div deg").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        # damping·s div base, computed as d·(s div b) + d·(s mod b) div b
        # — EXACTLY floor(d·s/b) for non-negative s (s = q·b + r ⇒
        # d·s/b = d·q + d·r/b with d·q integral), but with BIGINT
        # headroom to ~1e13 nodes instead of ~1.1e7: a hub receiving
        # nearly all mass has s ≈ n·1e6, and the naive d·s product
        # crosses 2^63 around n ≈ 1.1e7. The oracle keeps the naive
        # spelling (identical value inside ITS range) — this is a
        # headroom rewrite, not a semantics change.
        pr = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base - damping_ppm) * F.col("seed")
                    + F.expr(
                        f"{damping_ppm} * (coalesce(s, 0L) div {base})"
                        f" + {damping_ppm} * (coalesce(s, 0L) % {base}) div {base}"
                    )
                )
                .cast("bigint")
                .alias("pr"),
            )
            .localCheckpoint()
        )
    # the final ranks are checkpoint-materialized above; the cached
    # edge+degree table has no further readers — release executor
    # memory instead of leaking it across invocations in one session
    esd.unpersist()
    return pr
