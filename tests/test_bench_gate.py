"""Mechanized bench gate (round-12 verdict task 4): bench.py's
pinned anchor table and BASELINE.md §4.1 cannot drift apart, and the
gate math implements exactly the documented noise protocol."""

from __future__ import annotations

import re
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _load_bench():
    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location(
        "bench", ROOT / "bench.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("bench", mod)
    spec.loader.exec_module(mod)
    return mod


def _baseline_md_anchors() -> dict[str, float]:
    """Parse the §4.1 anchor table out of BASELINE.md."""
    text = (ROOT / "BASELINE.md").read_text()
    m = re.search(
        r"### 4\.1 .*?\n(.*?)\n## ", text, flags=re.DOTALL
    )
    assert m, "BASELINE.md §4.1 anchor table missing"
    out: dict[str, float] = {}
    for line in m.group(1).splitlines():
        row = re.match(r"\|\s*([a-z0-9_]+)\s*\|\s*([0-9.]+)\s*\|", line)
        if row:
            out[row.group(1)] = float(row.group(2))
    assert out, "no anchor rows parsed from §4.1"
    return out


def test_anchor_table_matches_baseline_md():
    bench = _load_bench()
    md = _baseline_md_anchors()
    assert md == bench.ANCHOR_BASELINES
    # every bench ANCHORS row is priced, and nothing extra is pinned
    assert set(bench.ANCHOR_BASELINES) == set(bench.ANCHORS)
    # the drift-calibration trio is a subset with identical values
    for q, v in bench.DRIFT_CALIBRATION.items():
        assert bench.ANCHOR_BASELINES[q] == v


def test_baseline_gate_math():
    bench = _load_bench()
    # exactly-at-anchor in a clean window: all ratios 1.0, pass
    times = dict(bench.ANCHOR_BASELINES)
    gate = bench.baseline_gate(times, drift=1.0)
    assert gate["gate_pass"] is True
    assert gate["baseline_geomean"] == 1.0
    assert gate["baseline_geomean_calibrated"] == 1.0
    assert set(gate["baseline_ratio"]) == set(bench.ANCHOR_BASELINES)

    # throttled window: raw 1.5× everywhere, drift stamp 1.5 →
    # calibrated back to 1.0 — pass (the documented protocol)
    times = {q: v * 1.5 for q, v in bench.ANCHOR_BASELINES.items()}
    gate = bench.baseline_gate(times, drift=1.5)
    assert gate["baseline_geomean"] == 1.5
    assert gate["baseline_geomean_calibrated"] == 1.0
    assert gate["gate_pass"] is True

    # one genuinely regressed query (>2× calibrated) fails the gate
    # even when the geomean stays under 2.0
    times = dict(bench.ANCHOR_BASELINES)
    times["sem_ivf_probe"] = bench.ANCHOR_BASELINES["sem_ivf_probe"] * 2.5
    gate = bench.baseline_gate(times, drift=1.0)
    assert gate["baseline_ratio_calibrated"]["sem_ivf_probe"] == 2.5
    assert gate["gate_pass"] is False
    assert gate["baseline_geomean_calibrated"] < 2.0

    # missing rows (a subset run) simply aren't priced
    gate = bench.baseline_gate({"pricing_summary": 0.63}, drift=None)
    assert list(gate["baseline_ratio"]) == ["pricing_summary"]
    assert gate["gate_pass"] is True


def test_gate_rejects_self_cancelling_uniform_regression():
    """Round-12 advisor (low): anchor_drift is computed from three
    gated queries, so an ENGINE-wide uniform slowdown inflates the
    stamp and divides itself away — calibrated geomean stays 1.0.
    The gate must still fail: calibration only forgives plausible
    host throttling (drift ≤ DRIFT_SANITY_MAX), never a stamp no
    host on record produced."""
    bench = _load_bench()
    # uniform 3× regression: drift stamp rides along at 3.0,
    # calibrated geomean self-cancels to 1.0 — gate FAILS on sanity
    times = {q: v * 3.0 for q, v in bench.ANCHOR_BASELINES.items()}
    gate = bench.baseline_gate(times, drift=3.0)
    assert gate["baseline_geomean_calibrated"] == 1.0
    assert gate["drift_sane"] is False
    assert gate["gate_pass"] is False

    # the worst throttle on record (≈1.43) stays forgivable
    times = {q: v * 1.43 for q, v in bench.ANCHOR_BASELINES.items()}
    gate = bench.baseline_gate(times, drift=1.43)
    assert gate["drift_sane"] is True
    assert gate["gate_pass"] is True

    # a sane drift stamp cannot stretch a larger regression under
    # the gate either: with drift capped at DRIFT_SANITY_MAX and
    # calibrated ratios capped at 2.0, raw walls are bounded by
    # RAW_GEOMEAN_MAX — a 4× uniform slowdown fails however the
    # stamp reads
    times = {q: v * 4.0 for q, v in bench.ANCHOR_BASELINES.items()}
    gate = bench.baseline_gate(times, drift=1.2)
    assert gate["drift_sane"] is True
    assert gate["baseline_geomean"] == 4.0
    assert gate["baseline_geomean"] > bench.RAW_GEOMEAN_MAX
    assert gate["gate_pass"] is False


def test_gate_host_drift_probe_cannot_self_cancel():
    """Round 13: with the ENGINE-INDEPENDENT probe drift supplied,
    calibration divides by host speed alone — an engine-wide uniform
    regression leaves host_drift at 1.0 and fails the gate outright,
    with no sanity-cap heuristic needed; a genuinely throttled window
    (probes and anchors both 3×) still calibrates clean, deeper than
    the legacy DRIFT_SANITY_MAX could ever forgive."""
    bench = _load_bench()
    # engine 3× slower, host clean → calibrated stays 3.0 → FAIL
    times = {q: v * 3.0 for q, v in bench.ANCHOR_BASELINES.items()}
    gate = bench.baseline_gate(times, drift=3.0, host_drift=1.0)
    assert gate["baseline_geomean_calibrated"] == 3.0
    assert gate["gate_pass"] is False

    # genuine 3× host throttle (probe agrees) → calibrated 1.0 → PASS
    gate = bench.baseline_gate(times, drift=3.0, host_drift=3.0)
    assert gate["baseline_geomean_calibrated"] == 1.0
    assert gate["drift_sane"] is True
    assert gate["gate_pass"] is True

    # an implausible probe reading must not calibrate the gate
    gate = bench.baseline_gate(times, drift=3.0, host_drift=40.0)
    assert gate["drift_sane"] is False
    assert gate["gate_pass"] is False


def test_drift_probe_shape(spark):
    """The probe runs pure-Spark synthetic work (range/xxhash64,
    keyed repartition, a lineitem scan) — no engine operators — and
    returns one positive wall per pinned calibration row."""
    bench = _load_bench()
    probes = bench.drift_probe(spark, "/root/testdata/sf0.001")
    assert set(probes) == set(bench.DRIFT_PROBE_CALIBRATION)
    assert all(v > 0 for v in probes.values())
    assert bench._host_drift(probes) > 0


def test_concurrency_section_shape(spark):
    """Round-12 verdict task 6: the concurrency arm runs without
    deadlock and reports the three shapes — overlapped anchors,
    append-vs-probe (readers unblocked by the writer lock), and
    two lock-serialized writers (retry-after-winner priced)."""
    from ods_v3_dbt_spark.plans.declared_queries import registry

    bench = _load_bench()
    out = bench.concurrency_section(
        spark, "/root/testdata/sf0.001", registry()
    )
    a = out["anchors"]
    assert len(a["names"]) == 4
    assert a["sequential_s"] > 0 and a["concurrent_s"] > 0
    p = out["append_vs_probe"]
    assert p["probe_solo_s"] > 0 and p["probe_concurrent_s"] > 0
    w = out["two_writers"]
    assert len(w["writer_walls_s"]) == 2
    assert w["concurrent_wall_s"] >= max(w["writer_walls_s"]) - 0.05
    assert w["lock_wait_s"] >= 0
