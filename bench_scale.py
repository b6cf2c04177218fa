#!/usr/bin/env python
"""Scale-proof tier (round-12 verdict task 1): measure, don't argue.

Every 100 TB claim in SCALE.md is an asymptotic argument pinned by
plan-shape tests; no wall-clock number existed above sf0.1 (~600k
lineitem rows). This harness measures the anchor suite plus the
heavy index builds at sf0.1 AND sf1 (10×) in one clean window and
records per-query scaling ratios — the cheapest way the 100 TB
story can still be falsified.

Protocol (BASELINE.md §6):

* fixtures come from ``tools/gen_testdata.py`` (seed 42) for BOTH
  tiers — generator-to-generator, never mixing this generator's sf1
  against the driver's sf0.1 (different generators could differ in
  dup rates/skew and pollute the ratio);
* a FIDELITY arm benches the generated sf0.1 against the driver's
  sf0.1 in the same window, bounding what the generator swap itself
  costs (ratios ≈1 mean the generated tiers speak for the driver
  fixtures);
* each tier runs in its OWN subprocess/JVM (``bench.py`` with
  ``SPARK_GRAFT_ONLY`` = the scale row set, concurrency arm off) so
  tiers can't warm each other;
* every row is classed ``linear`` (scan/agg/merge/build/append —
  wall ∝ rows) or ``pairs`` (banded/blocked self-join families —
  candidate volume may grow faster than rows when key cardinality
  saturates); a row whose sf0.1→sf1 ratio exceeds its class bound
  is FLAGGED in the artifact and needs a profiled explanation or a
  fix before the claim stands.

Output: one JSON artifact (default ``BENCH_SCALE.json``) with the
per-tier walls, ratios, classes, flags, and the fidelity arm.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))

#: The scale row set: BASELINE.md anchors + their gate rows + the
#: verdict-named heavies not already in the anchors tier.
SCALE_ROWS = [
    "pricing_summary", "revenue_by_customer", "merge_upsert_single",
    "rollup_day", "rollup_month", "minhash_lsh_neardup",
    "ngram_jaccard_neardup", "embedding_cosine_neardup",
    "simhash_neardup", "embedding_ann_lsh", "embedding_topk",
    "bm25_indexed_topk", "dedup_index_probe", "lsh_index_probe",
    "ivf_index_ann_topk", "pq_index_ann_topk",
    "incremental_curation_semantic_decisions",
    "incremental_curation_pq_decisions",
    "dedup_index_append_probe",
    "neardup_components",
    # round-14 additions (round-13 verdict item 7): the SymSpell
    # editdist rewrite's asymptotic claim (candidates ∝ true
    # near-pair density, not block²) and the PQ parallelism floor's
    # no-op-on-wide-input claim both need a measured 10× ratio
    "customer_name_editdist_pairs",
]

#: wall ∝ rows (one shuffle pass, fixed key cardinality, or an
#: O(batch) maintenance verb whose batch scales with sf)
LINEAR = {
    "pricing_summary", "revenue_by_customer", "merge_upsert_single",
    "rollup_day", "rollup_month", "embedding_topk",
    "bm25_indexed_topk",
    "ivf_index_ann_topk", "pq_index_ann_topk",
    "dedup_index_build", "sem_ivf_index_build", "sem_pq_index_build",
    "lsh_index_build", "bm25_index_build", "ivf_index_build",
    "pq_index_build", "sem_ivf_probe",
    "lsh_index_append_probe",
    "index_append_fixed_batch_small_base",
    "index_append_fixed_batch_large_base",
    "index_delete_fixed_batch_small_base",
    "index_delete_fixed_batch_large_base",
    "index_probe_8_segments", "index_probe_1_segment",
    "corpus_append_partitioned", "corpus_append_monolithic",
    "corpus_takedown_partitioned", "corpus_takedown_monolithic",
    "dedup_index_append_probe_base_build",
    "dedup_index_append_probe_append",
    "incremental_curation_decisions",
    "incremental_curation_semantic_decisions",
    "incremental_curation_pq_decisions",
}
#: candidate-pair families: documents×10 can grow shared-key bucket
#: sizes, so the bound is wider; anything beyond it means a hot-key
#: guard failed to bite and the row needs a fix, not an excuse.
#: dedup_index_probe / dedup_index_append_probe are PAIRS, not
#: linear (first-run flag, profiled): the EXACT probe's candidate
#: volume is Σ_sid df_batch·df_corpus, and the fixtures' fixed
#: 31-word vocabulary makes EVERY shingle's df grow ∝ corpus
#: (uniform saturation, no Zipf tail) — measured 19× at 10× data.
#: The boilerplate guard (``dedup_index_probe_capped`` — same class:
#: on a uniform-df corpus the 2%-of-corpus cap correctly does not
#: bite, so it rides the same candidate volume) prices the guard's
#: overhead; the demonstrated scale path for df-saturated text is
#: the banded LSH probe (``lsh_index_probe``: 2.9× at 10×).
PAIRS = {
    "minhash_lsh_neardup", "ngram_jaccard_neardup",
    "embedding_cosine_neardup", "simhash_neardup",
    "embedding_ann_lsh", "lsh_index_probe", "neardup_components",
    "dedup_index_probe", "dedup_index_append_probe",
    "dedup_index_probe_capped",
    # SymSpell blocking: candidate pairs grow with shared deletion
    # variants — near-linear on random names, but classed PAIRS so a
    # variant-collision blowup is flagged, not excused
    "customer_name_editdist_pairs",
}

#: class → max allowed sf0.1→sf1 wall ratio at 10× rows on fixed
#: cores. Linear rows get 10× + scheduling/spill grace; pair rows
#: get head-room for bounded bucket growth (sub-quadratic: well
#: under the 100× an unguarded all-pairs would show).
BOUNDS = {"linear": 14.0, "pairs": 30.0}


def _class_of(q: str) -> str:
    if q in PAIRS:
        return "pairs"
    return "linear"


def run_tier(sf_dir: str, cpus: int) -> dict:
    """One bench.py subprocess over ``sf_dir``; returns its compact
    JSON line (full per-query map — SPARK_GRAFT_ONLY mode)."""
    env = dict(os.environ)
    env.update({
        "SPARK_GRAFT_SF_DIR": sf_dir,
        "SPARK_GRAFT_CPUS": str(cpus),
        "SPARK_GRAFT_ONLY": ",".join(SCALE_ROWS),
        "SPARK_GRAFT_BENCH_CONCURRENCY": "0",
        # 10× tier: the 8g default OOM'd on the sf1 receipt rows;
        # 12g was marginal once the round-14 overlapped curation
        # probes allowed TWO broadcast builds in flight (one OOM in
        # two sf1 windows) — 16g on the 128 GB sandbox
        "SPARK_GRAFT_DRIVER_MEM": "16g",
        # prices the capped-probe twin (scale-profile-only receipt)
        "SPARK_GRAFT_SCALE_PROFILE": "1",
    })
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        capture_output=True, text=True, env=env, timeout=7200,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"bench.py failed on {sf_dir}:\n{proc.stderr[-4000:]}"
        )
    line = [ln for ln in proc.stdout.strip().splitlines()
            if ln.startswith("{")][-1]
    out = json.loads(line)
    out["tier_wall_s"] = round(time.time() - t0, 1)
    return out


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    gen_01 = os.path.join(ROOT, ".scaledata", "sf0.1")
    gen_1 = os.path.join(ROOT, ".scaledata", "sf1")
    driver_01 = os.environ.get("SPARK_GRAFT_DRIVER_SF01",
                               "/root/testdata/sf0.1")
    from tools.gen_testdata import GEN_VERSION, generate

    for sf, out in ((0.1, gen_01), (1.0, gen_1)):
        # reuse ONLY a tier whose completion manifest (written last
        # by the generator) matches this generator's version+seed —
        # a crashed or stale-version .scaledata dir regenerates
        # instead of silently polluting the ratios
        man_path = os.path.join(out, "_GEN_MANIFEST.json")
        ok = False
        if os.path.exists(man_path):
            with open(man_path) as f:
                man = json.load(f)
            ok = (man.get("version") == GEN_VERSION
                  and man.get("seed") == 42 and man.get("sf") == sf)
        if not ok:
            print(f"== generating tier sf{sf} -> {out}", file=sys.stderr)
            generate(sf, out, seed=42)

    tiers: dict[str, dict] = {}
    for key, d in (("driver_sf0.1", driver_01), ("gen_sf0.1", gen_01),
                   ("gen_sf1", gen_1)):
        print(f"== running tier {key} ({d})", file=sys.stderr)
        tiers[key] = run_tier(d, cpus)

    t01, t1 = tiers["gen_sf0.1"]["queries"], tiers["gen_sf1"]["queries"]
    ratios = {
        q: round(t1[q] / t01[q], 2)
        for q in sorted(t01) if q in t1 and t01[q] > 0
    }
    # no silent caps: a row missing from either tier (or rounding to
    # 0.000 at sf0.1) produces no ratio and no flag — record exactly
    # which rows fell out so the artifact can't read as total
    # coverage when it isn't (round-13 self-review, finding 4)
    ratio_dropped = sorted(
        (set(t01) | set(t1)) - set(ratios)
    )
    classes = {q: _class_of(q) for q in ratios}
    flags = sorted(
        q for q, r in ratios.items() if r > BOUNDS[classes[q]]
    )
    fidelity = {
        q: round(tiers["gen_sf0.1"]["queries"][q]
                 / tiers["driver_sf0.1"]["queries"][q], 2)
        for q in sorted(t01)
        if tiers["driver_sf0.1"]["queries"].get(q, 0) > 0
    }
    artifact = {
        "protocol": {
            "generator": "tools/gen_testdata.py",
            "seed": 42,
            "cpus": cpus,
            "rows": SCALE_ROWS,
            "bounds": BOUNDS,
            "tier_dirs": {"gen_sf0.1": gen_01, "gen_sf1": gen_1,
                          "driver_sf0.1": driver_01},
        },
        "tiers": {k: {"queries": v["queries"],
                      "anchor_drift": v.get("anchor_drift"),
                      "tier_wall_s": v["tier_wall_s"]}
                  for k, v in tiers.items()},
        "ratios_sf1_over_sf01": ratios,
        "ratio_dropped": ratio_dropped,
        "class": classes,
        "flags_super_linear": flags,
        "fidelity_gen_over_driver_sf01": fidelity,
    }
    out_path = os.environ.get(
        "SPARK_GRAFT_SCALE_OUT", os.path.join(ROOT, "BENCH_SCALE.json")
    )
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(json.dumps({
        "metric": "scale_ratio_geomean",
        "value": _geomean(ratios.values()),
        "unit": "x",
        "flags": flags,
        "artifact": out_path,
    }))


def _geomean(vals) -> float | None:
    import math

    vals = [v for v in vals if v > 0]
    if not vals:
        return None
    return round(math.exp(sum(math.log(v) for v in vals) / len(vals)), 2)


if __name__ == "__main__":
    main()
