"""Scale-protocol pins (round-12 verdict task 1): bench_scale.py's
row set, complexity classes, and super-linear bounds cannot drift
from the registry or from the BASELINE.md §6 protocol prose."""

from __future__ import annotations

import re
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _load(name):
    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location(name, ROOT / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault(name, mod)
    spec.loader.exec_module(mod)
    return mod


def test_scale_rows_are_registered():
    from ods_v3_dbt_spark.plans.declared_queries import registry

    bs = _load("bench_scale")
    reg = registry()
    missing = [q for q in bs.SCALE_ROWS if q not in reg]
    assert not missing, missing


def test_every_measured_row_is_classed():
    """Every row the harness can emit (registry rows + the bench.py
    fixture-build receipt rows they trigger) resolves to a class, and
    the PAIRS set is the banded/blocked-join family only."""
    bs = _load("bench_scale")
    for q in bs.SCALE_ROWS:
        assert bs._class_of(q) in bs.BOUNDS
    assert bs.PAIRS.isdisjoint(bs.LINEAR)
    # bounds ordered: pair rows get more head-room than linear, and
    # both sit far under the ~100× an unguarded all-pairs would show
    assert 10 < bs.BOUNDS["linear"] < bs.BOUNDS["pairs"] < 100


def test_baseline_md_section6_matches_protocol():
    bs = _load("bench_scale")
    text = (ROOT / "BASELINE.md").read_text()
    m = re.search(r"## 6\. Scale protocol(.*?)(?:\n## |\Z)", text,
                  flags=re.DOTALL)
    assert m, "BASELINE.md §6 (scale protocol) missing"
    sec = m.group(1)
    # the prose states the same bounds the code enforces
    lin = re.search(r"linear[^0-9]*?(\d+(?:\.\d+)?)×", sec)
    prs = re.search(r"pairs?[^0-9]*?(\d+(?:\.\d+)?)×", sec)
    assert lin and float(lin.group(1)) == bs.BOUNDS["linear"], sec[:400]
    assert prs and float(prs.group(1)) == bs.BOUNDS["pairs"]
    assert "seed 42" in sec or "seed=42" in sec
    assert "tools/gen_testdata.py" in sec
