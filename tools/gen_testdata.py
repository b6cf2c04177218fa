#!/usr/bin/env python
"""Deterministic synthetic-table generator for the scale-proof tier
(round-12 verdict task 1).

The driver materializes ``/root/testdata/sf{0.001,0.01,0.1}`` but its
generator is not part of this repo, and the read-only mount stops at
sf0.1 — so every claim above ~600k rows was argued by plan shape, not
measured. This module is a REIMPLEMENTATION calibrated against the
driver fixtures' observable contract (schemas, per-table row-count ∝
sf laws, key ranges, value distributions, dimension vocabularies —
all enumerated in ``tests/test_gen_testdata.py``), seed-pinned
(default 42) so any sf regenerates byte-stable.

The scale protocol (BASELINE.md §6) deliberately compares
**generator-to-generator**: the sf0.1→sf1 scaling ratio is measured
between two tiers built by THIS generator, never by mixing this
generator's sf1 against the driver's sf0.1 (two generators could
differ in dup rates or skew and pollute the ratio); a separate
fidelity check benches this generator's sf0.1 against the driver's
sf0.1 to bound that difference.

Calibration (measured on the driver's sf0.1):

=========  ==========================  =================================
table      rows                        distributions
=========  ==========================  =================================
region     5                           fixed TPC-H region names
nation     25                          NATION_i, region i%5
customer   150000·sf                   acctbal U(-1000,10000), 5 segments
supplier   10000·sf                    acctbal U(-1000,10000)
part       200000·sf                   8 adj × 8 noun names, 25 brands,
                                       6 types (incl PROMO), size 1..50,
                                       retail U(900,1000)
orders     1500000·sf                  custkey uniform, status O/P/F,
                                       total U(1000,500000), date
                                       U(1995-01-01, 2001-08-01) days
lineitem   ≈6000000·sf                 1+Poisson(3) lines/order, qty
                                       1..50, extprice U(900,105000),
                                       disc U(0,.1), tax U(0,.08),
                                       flag A/N/R × status O/F, ship =
                                       orderdate + U(1,95) days
events     1000000·sf                  users 15000·sf, 5 types, value
                                       Exp(50), 30 days of 2024-01 µs
                                       timestamps, props {"k": 0..99}
documents  max(500, 50000·sf)          10..100 words over the 31-word
                                       fixture vocab, lang en 40% /
                                       zh es fr de 15%, 20 sources,
                                       ~0.16% planted exact dups
embeddings max(500, 20000·sf)          64-dim float32, 10 weak cluster
                                       labels (centers N(0,.02), noise
                                       N(0,.124))
=========  ==========================  =================================
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

#: the driver fixtures' exact 31-word vocabulary (DISTINCT words of
#: the sf0.1 documents table) — FIXED across sf by the fixture
#: design, which means per-shingle document frequency grows linearly
#: with the corpus: the boilerplate-shingle stress the hot-key
#: guards exist for, present at every tier by construction
VOCAB = (
    "a agg batch big column customer data dup fast filter group hash "
    "join key line merge order part query row scan slow small sort "
    "spark stream table the value vector window"
).split()
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "HOUSEHOLD", "FURNITURE", "BUILDING", "MACHINERY"]
ADJ = ["blue", "old", "new", "small", "red", "large", "hot", "cold"]
NOUN = ["widget", "gizmo", "ring", "gear", "anvil", "bolt", "plate", "rod"]
PTYPES = ["LARGE", "STANDARD", "MEDIUM", "SMALL", "PROMO", "ECONOMY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
LANGS = ["en", "zh", "es", "fr", "de"]

EPOCH = dt.datetime(1970, 1, 1)

#: bump on ANY calibration/recipe change — the completion manifest
#: records it, and bench_scale regenerates when it mismatches, so a
#: stale .scaledata dir from an older generator can never silently
#: pollute a scaling ratio (round-13 self-review, finding 3)
GEN_VERSION = 2


def _day_us(d: dt.date) -> int:
    return int((dt.datetime(d.year, d.month, d.day) - EPOCH)
               .total_seconds()) * 1_000_000


def _write(out: str, name: str, cols: dict, schema: pa.Schema) -> int:
    tbl = pa.table(cols, schema=schema)
    pq.write_table(tbl, os.path.join(out, f"{name}.parquet"))
    return tbl.num_rows


def generate(sf: float, out: str, seed: int = 42) -> dict:
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)
    counts: dict[str, int] = {}
    ts_us = pa.timestamp("us")

    counts["region"] = _write(out, "region", {
        "r_regionkey": np.arange(5, dtype=np.int32),
        "r_name": REGIONS,
    }, pa.schema([("r_regionkey", pa.int32()), ("r_name", pa.string())]))

    counts["nation"] = _write(out, "nation", {
        "n_nationkey": np.arange(25, dtype=np.int32),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": (np.arange(25) % 5).astype(np.int32),
    }, pa.schema([("n_nationkey", pa.int32()), ("n_name", pa.string()),
                  ("n_regionkey", pa.int32())]))

    n_cust = int(150_000 * sf)
    counts["customer"] = _write(out, "customer", {
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": [SEGMENTS[i] for i in rng.integers(0, 5, n_cust)],
    }, pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string()),
                  ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
                  ("c_mktsegment", pa.string())]))

    n_supp = int(10_000 * sf)
    counts["supplier"] = _write(out, "supplier", {
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }, pa.schema([("s_suppkey", pa.int64()), ("s_name", pa.string()),
                  ("s_nationkey", pa.int32()), ("s_acctbal", pa.float64())]))

    n_part = int(200_000 * sf)
    adj = rng.integers(0, 8, n_part)
    noun = rng.integers(0, 8, n_part)
    counts["part"] = _write(out, "part", {
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": [f"{ADJ[a]} {NOUN[b]}" for a, b in zip(adj, noun)],
        "p_brand": [f"Brand#{i}" for i in rng.integers(0, 25, n_part)],
        "p_type": [PTYPES[i] for i in rng.integers(0, 6, n_part)],
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 1),
    }, pa.schema([("p_partkey", pa.int64()), ("p_name", pa.string()),
                  ("p_brand", pa.string()), ("p_type", pa.string()),
                  ("p_size", pa.int32()), ("p_retailprice", pa.float64())]))

    n_ord = int(1_500_000 * sf)
    d0 = _day_us(dt.date(1995, 1, 1))
    span_days = (dt.date(2001, 8, 1) - dt.date(1995, 1, 1)).days
    order_day = rng.integers(0, span_days + 1, n_ord)
    orderdate_us = d0 + order_day * 86_400_000_000
    counts["orders"] = _write(out, "orders", {
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, max(n_cust, 1), n_ord),
        "o_orderstatus": [("O", "P", "F")[i]
                          for i in rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": orderdate_us,
        "o_orderpriority": [PRIORITIES[i]
                            for i in rng.integers(0, 5, n_ord)],
    }, pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
                  ("o_orderstatus", pa.string()),
                  ("o_totalprice", pa.float64()), ("o_orderdate", ts_us),
                  ("o_orderpriority", pa.string())]))

    lines_per = 1 + rng.poisson(3.0, n_ord)
    n_li = int(lines_per.sum())
    l_orderkey = np.repeat(np.arange(n_ord, dtype=np.int64), lines_per)
    l_linenumber = (
        np.arange(n_li) - np.repeat(
            np.concatenate(([0], np.cumsum(lines_per)[:-1])), lines_per
        ) + 1
    ).astype(np.int32)
    ship_us = (
        np.repeat(orderdate_us, lines_per)
        + rng.integers(1, 96, n_li) * 86_400_000_000
    )
    counts["lineitem"] = _write(out, "lineitem", {
        "l_orderkey": l_orderkey,
        "l_partkey": rng.integers(0, max(n_part, 1), n_li),
        "l_suppkey": rng.integers(0, max(n_supp, 1), n_li),
        "l_linenumber": l_linenumber,
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(rng.uniform(0, 0.1, n_li), 2),
        "l_tax": np.round(rng.uniform(0, 0.08, n_li), 2),
        "l_returnflag": [("A", "N", "R")[i]
                         for i in rng.integers(0, 3, n_li)],
        "l_linestatus": [("O", "F")[i] for i in rng.integers(0, 2, n_li)],
        "l_shipdate": ship_us,
    }, pa.schema([("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
                  ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
                  ("l_quantity", pa.float64()),
                  ("l_extendedprice", pa.float64()),
                  ("l_discount", pa.float64()), ("l_tax", pa.float64()),
                  ("l_returnflag", pa.string()),
                  ("l_linestatus", pa.string()),
                  ("l_shipdate", ts_us)]))

    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    t0 = _day_us(dt.date(2024, 1, 1))
    counts["events"] = _write(out, "events", {
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": t0 + rng.integers(0, 30 * 86_400_000_000, n_ev),
        "user_id": rng.integers(0, max(n_users, 1), n_ev),
        "event_type": [EVENT_TYPES[i] for i in rng.integers(0, 5, n_ev)],
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": [json.dumps({"k": int(k)})
                  for k in rng.integers(0, 100, n_ev)],
    }, pa.schema([("event_id", pa.int64()), ("ts", ts_us),
                  ("user_id", pa.int64()), ("event_type", pa.string()),
                  ("value", pa.float64()), ("props", pa.string())]))

    n_doc = max(500, int(50_000 * sf))
    lens = rng.integers(10, 101, n_doc)
    vocab_ids = rng.integers(0, len(VOCAB), int(lens.sum()))
    texts, pos = [], 0
    for ln in lens:
        texts.append(" ".join(VOCAB[i] for i in vocab_ids[pos:pos + ln]))
        pos += ln
    # planted exact dups at the driver-fixture rate (~0.16%)
    for k in range(max(1, n_doc // 625)):
        texts[n_doc - 1 - k] = texts[k]
    counts["documents"] = _write(out, "documents", {
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": [LANGS[i] for i in
                 rng.choice(5, n_doc, p=[0.4, 0.15, 0.15, 0.15, 0.15])],
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }, pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                  ("lang", pa.string()), ("source", pa.string()),
                  ("n_chars", pa.int64())]))

    n_vec = max(500, int(20_000 * sf))
    centers = rng.normal(0, 0.02, (10, 64))
    labels = rng.integers(0, 10, n_vec)
    vecs = (centers[labels]
            + rng.normal(0, 0.124, (n_vec, 64))).astype(np.float32)
    counts["embeddings"] = _write(out, "embeddings", {
        "vec_id": np.arange(n_vec, dtype=np.int64),
        "embedding": list(vecs),
        "label": labels.astype(np.int32),
    }, pa.schema([("vec_id", pa.int64()),
                  ("embedding", pa.list_(pa.float32())),
                  ("label", pa.int32())]))
    # completion manifest written LAST: its presence certifies every
    # table above landed under exactly this (sf, seed, version) — the
    # reuse check consumers key on, instead of probing one mid-order
    # table file
    manifest = {"sf": sf, "seed": seed, "version": GEN_VERSION,
                "rows": counts}
    tmp = os.path.join(out, "_GEN_MANIFEST.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, sort_keys=True)
    os.replace(tmp, os.path.join(out, "_GEN_MANIFEST.json"))
    return counts


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    counts = generate(args.sf, args.out, args.seed)
    print(json.dumps({"sf": args.sf, "out": args.out, "seed": args.seed,
                      "rows": counts}))


if __name__ == "__main__":
    main()
