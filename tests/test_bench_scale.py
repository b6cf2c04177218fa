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


#: Every row the scale window emits at HEAD: SCALE_ROWS plus the
#: bench.py receipt rows their fixture triggers produce (the
#: BENCH_SCALE.json ratio keys). A bench.py receipt rename or a new
#: receipt row must be added here AND to LINEAR/PAIRS explicitly —
#: _class_of()'s linear default would otherwise swallow it silently
#: (round-13 self-review, finding 6).
EMITTED_ROWS = {
    "pricing_summary", "revenue_by_customer", "merge_upsert_single",
    "rollup_day", "rollup_month", "minhash_lsh_neardup",
    "ngram_jaccard_neardup", "embedding_cosine_neardup",
    "simhash_neardup", "embedding_ann_lsh", "embedding_topk",
    "bm25_indexed_topk", "dedup_index_probe", "lsh_index_probe",
    "ivf_index_ann_topk", "pq_index_ann_topk",
    "incremental_curation_semantic_decisions",
    "incremental_curation_pq_decisions",
    "dedup_index_append_probe", "neardup_components",
    "customer_name_editdist_pairs",
    # bench.py receipt rows the triggers above produce
    "dedup_index_build", "dedup_index_probe_capped",
    "sem_ivf_index_build", "sem_ivf_probe", "sem_pq_index_build",
    "lsh_index_build", "bm25_index_build", "ivf_index_build",
    "pq_index_build",
    "dedup_index_append_probe_base_build",
    "dedup_index_append_probe_append",
    "index_append_fixed_batch_small_base",
    "index_append_fixed_batch_large_base",
    "index_delete_fixed_batch_small_base",
    "index_delete_fixed_batch_large_base",
    "index_probe_8_segments", "index_probe_1_segment",
    "corpus_append_partitioned", "corpus_append_monolithic",
    "corpus_takedown_partitioned", "corpus_takedown_monolithic",
}


def test_every_measured_row_is_classed():
    """Every row the scale window emits is EXPLICITLY classed —
    membership in LINEAR or PAIRS, never _class_of()'s default — and
    the class sets partition cleanly."""
    bs = _load("bench_scale")
    unclassed = sorted(EMITTED_ROWS - bs.LINEAR - bs.PAIRS)
    assert not unclassed, unclassed
    assert bs.PAIRS.isdisjoint(bs.LINEAR)
    assert set(bs.SCALE_ROWS) <= EMITTED_ROWS
    for q in EMITTED_ROWS:
        assert bs._class_of(q) in bs.BOUNDS
    # bounds ordered: pair rows get more head-room than linear, and
    # both sit far under the ~100× an unguarded all-pairs would show
    assert 10 < bs.BOUNDS["linear"] < bs.BOUNDS["pairs"] < 100


def test_artifact_rows_all_classed_and_flagged_or_bounded():
    """The committed BENCH_SCALE.json at HEAD: every measured ratio
    row appears in EMITTED_ROWS (no receipt escaped the class pin),
    nothing was silently dropped, and every unflagged row sits
    inside its class bound."""
    import json

    bs = _load("bench_scale")
    art = json.loads((ROOT / "BENCH_SCALE.json").read_text())
    ratios = art["ratios_sf1_over_sf01"]
    stray = sorted(set(ratios) - EMITTED_ROWS)
    assert not stray, stray
    assert art.get("ratio_dropped", []) == []
    for q, r in ratios.items():
        if q not in art["flags_super_linear"]:
            assert r <= bs.BOUNDS[bs._class_of(q)], (q, r)


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
