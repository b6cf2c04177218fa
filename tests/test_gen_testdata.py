"""Scale-tier generator calibration (round-12 verdict task 1).

``tools/gen_testdata.py`` reimplements the driver's fixture
generator from its observable contract; these tests pin that
contract so the generated tiers can stand in for the driver
fixtures in the scale protocol (BASELINE.md §6): identical schemas,
the per-table row-count ∝ sf laws, the driver's exact dimension
vocabularies, in-range values, and byte-stable determinism per
(sf, seed).
"""

from __future__ import annotations

import pytest

pa = pytest.importorskip("pyarrow")
import pyarrow.parquet as pq  # noqa: E402

from tools.gen_testdata import VOCAB, generate  # noqa: E402

DRIVER = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


@pytest.fixture(scope="module")
def gen_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("gen") / "sf0.001"
    counts = generate(0.001, str(out), seed=42)
    return out, counts


def test_schemas_match_driver(gen_dir):
    out, _ = gen_dir
    for t in TABLES:
        mine = pq.read_schema(out / f"{t}.parquet")
        drv = pq.read_schema(f"{DRIVER}/{t}.parquet")
        assert mine.names == drv.names, t
        for f_m, f_d in zip(mine, drv):
            # the driver re-materialized events.ts at either ns or µs
            # across rounds; the engine's load() normalizes both, so
            # any timestamp unit is conformant
            if pa.types.is_timestamp(f_d.type):
                assert pa.types.is_timestamp(f_m.type), (t, f_m.name)
            else:
                assert f_m.type == f_d.type, (t, f_m.name)


def test_rowcount_laws(gen_dir):
    _, counts = gen_dir
    exact = {"region": 5, "nation": 25, "customer": 150, "supplier": 10,
             "part": 200, "orders": 1500, "events": 1000,
             "documents": 500, "embeddings": 500}
    for t, n in exact.items():
        assert counts[t] == n, t
    # lineitem is 1+Poisson(3) lines/order ≈ 4·orders — ±5% of the
    # driver's 6000·sf law
    assert abs(counts["lineitem"] - 6000) <= 300


def test_value_ranges_and_vocab(gen_dir):
    out, _ = gen_dir
    li = pq.read_table(out / "lineitem.parquet").to_pydict()
    assert min(li["l_quantity"]) >= 1 and max(li["l_quantity"]) <= 50
    assert max(li["l_discount"]) <= 0.1 and max(li["l_tax"]) <= 0.08
    assert set(li["l_returnflag"]) == {"A", "N", "R"}
    docs = pq.read_table(out / "documents.parquet").to_pydict()
    words = {w for t in docs["text"] for w in t.split(" ")}
    assert words <= set(VOCAB)
    assert all(
        n == len(t) for n, t in zip(docs["n_chars"], docs["text"])
    )
    # planted exact dups present (the dedup fixtures rely on them)
    assert len(set(docs["text"])) < len(docs["text"])
    emb = pq.read_table(out / "embeddings.parquet").to_pydict()
    assert all(len(v) == 64 for v in emb["embedding"][:20])
    assert set(emb["label"]) <= set(range(10))


def test_driver_vocab_is_exact(gen_dir):
    """The generator's vocabulary IS the driver fixtures' 31 distinct
    words — EQUALITY against the sf0.1 fixtures (the calibration
    source), both directions: a phantom word in VOCAB would inflate
    the shingle space and change the df-saturation behavior §6's
    pairs-class reasoning depends on (round-13 self-review,
    finding 7)."""
    import duckdb

    drv = set(
        r[0] for r in duckdb.connect().execute(
            "SELECT DISTINCT unnest(string_split(text,' ')) FROM "
            "read_parquet('/root/testdata/sf0.1/documents.parquet')"
        ).fetchall()
    )
    assert drv == set(VOCAB)
    assert len(VOCAB) == 31


def test_deterministic_per_seed(tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    generate(0.001, str(a), seed=42)
    generate(0.001, str(b), seed=42)
    for t in ("lineitem", "documents", "embeddings"):
        assert (a / f"{t}.parquet").read_bytes() == (
            b / f"{t}.parquet"
        ).read_bytes(), t
    c = tmp_path / "c"
    generate(0.001, str(c), seed=7)
    assert (a / "lineitem.parquet").read_bytes() != (
        c / "lineitem.parquet"
    ).read_bytes()
