"""PartitionedTable — partition-manifest snapshots (round-8 verdict
task 2): partial rewrites touch only the named partitions, untouched
partition directories are carried by reference (byte-identical across
snapshots), retention refcounts shared dirs, and the ParquetTable
time-travel/pin contracts hold."""

from __future__ import annotations

import hashlib
from pathlib import Path

import pytest

from ods_v3_dbt_spark.sinks import PartitionedTable


def _rows(spark, spec):
    """spec: [(doc_id, day, text)]"""
    return spark.createDataFrame(spec, "doc_id long, day string, text string")


def _dir_fingerprint(d: Path) -> dict[str, str]:
    return {
        p.name: hashlib.md5(p.read_bytes()).hexdigest()
        for p in sorted(d.rglob("*.parquet"))
    }


def test_roundtrip_and_partition_pruned_read(spark, tmp_path):
    t = PartitionedTable(tmp_path / "t", "day")
    t.write(_rows(spark, [(1, "d1", "a"), (2, "d1", "b"), (3, "d2", "c")]))
    assert sorted(t.partitions()) == ["d1", "d2"]
    got = {(r.doc_id, r.day, r.text) for r in t.read(spark).collect()}
    assert got == {(1, "d1", "a"), (2, "d1", "b"), (3, "d2", "c")}
    only = t.read_partitions(spark, ["d2", "d9"])
    assert {r.doc_id for r in only.collect()} == {3}
    # all-absent values: EMPTY DataFrame in the store schema, not
    # None (round-9 ADVICE — None crashed every caller's next call)
    none_hit = t.read_partitions(spark, ["d9"])
    assert none_hit.count() == 0
    assert none_hit.schema == t.read(spark).schema


def test_overwrite_touches_only_named_partitions(spark, tmp_path):
    t = PartitionedTable(tmp_path / "t", "day")
    t.write(_rows(spark, [(1, "d1", "a"), (2, "d2", "b"), (3, "d3", "c")]))
    parts0 = t.partitions()
    fp_d2 = _dir_fingerprint(tmp_path / "t" / "parts" / parts0["d2"])
    fp_d3 = _dir_fingerprint(tmp_path / "t" / "parts" / parts0["d3"])

    # rewrite d1 only (doc 1 edited + doc 4 added); d2/d3 carried
    t.overwrite_partitions(
        _rows(spark, [(1, "d1", "A"), (4, "d1", "d")]), ["d1"]
    )
    parts1 = t.partitions()
    assert parts1["d2"] == parts0["d2"] and parts1["d3"] == parts0["d3"]
    assert parts1["d1"] != parts0["d1"]
    # carried dirs byte-identical (same files, same bytes)
    assert _dir_fingerprint(tmp_path / "t" / "parts" / parts1["d2"]) == fp_d2
    assert _dir_fingerprint(tmp_path / "t" / "parts" / parts1["d3"]) == fp_d3
    got = {(r.doc_id, r.text) for r in t.read(spark).collect()}
    assert got == {(1, "A"), (4, "d"), (2, "b"), (3, "c")}
    # time travel: the previous snapshot still reads the old d1
    old = {(r.doc_id, r.text) for r in t.read_snapshot(spark, 1).collect()}
    assert old == {(1, "a"), (2, "b"), (3, "c")}


def test_overwrite_drops_emptied_and_adds_new_partitions(spark, tmp_path):
    t = PartitionedTable(tmp_path / "t", "day")
    t.write(_rows(spark, [(1, "d1", "a"), (2, "d2", "b")]))
    # d1 emptied (takedown), d9 appended, in one commit
    t.overwrite_partitions(_rows(spark, [(9, "d9", "z")]), ["d1", "d9"])
    assert sorted(t.partitions()) == ["d2", "d9"]
    got = {(r.doc_id, r.day) for r in t.read(spark).collect()}
    assert got == {(2, "d2"), (9, "d9")}


def test_overwrite_rejects_stray_and_null_partition_rows(spark, tmp_path):
    t = PartitionedTable(tmp_path / "t", "day")
    t.write(_rows(spark, [(1, "d1", "a")]))
    with pytest.raises(ValueError, match="outside the declared"):
        t.overwrite_partitions(_rows(spark, [(2, "d2", "b")]), ["d1"])
    with pytest.raises(ValueError, match="NULL"):
        t.write(
            spark.createDataFrame(
                [(3, None, "c")], "doc_id long, day string, text string"
            )
        )


def test_vacuum_refcounts_shared_partition_dirs(spark, tmp_path):
    t = PartitionedTable(tmp_path / "t", "day")
    t.write(_rows(spark, [(1, "d1", "a"), (2, "d2", "b")]))
    d2_dir = t.partitions()["d2"]
    for i in range(3):
        t.overwrite_partitions(_rows(spark, [(1, "d1", f"v{i}")]), ["d1"])
    # d2's dir is shared by every retained manifest — vacuum must keep
    # it while dropping aged d1 versions
    removed = t.vacuum(keep=2)
    assert (tmp_path / "t" / "parts" / d2_dir).is_dir()
    assert len(t.history()) == 2
    assert any(p.name.startswith("p-") for p in removed)
    got = {(r.doc_id, r.text) for r in t.read(spark).collect()}
    assert got == {(1, "v2"), (2, "b")}
    # pinned snapshot survives vacuum and stays readable
    pin = t.history()[1].name
    t.set_pin("aud", [pin])
    t.overwrite_partitions(_rows(spark, [(1, "d1", "v3")]), ["d1"])
    t.vacuum(keep=1)
    old = {(r.doc_id, r.text) for r in t.read_snapshot(spark, pin).collect()}
    assert old == {(1, "v1"), (2, "b")}
    t.set_pin("aud", None)


def test_partition_values_survive_url_encoding(spark, tmp_path):
    t = PartitionedTable(tmp_path / "t", "day")
    t.write(_rows(spark, [(1, "a b/c", "x"), (2, "2024-01-01", "y")]))
    assert sorted(t.partitions()) == ["2024-01-01", "a b/c"]
    only = t.read_partitions(spark, ["a b/c"])
    assert {r.doc_id for r in only.collect()} == {1}


def test_compact_rewrites_only_fragmented_partitions(spark, tmp_path):
    """compact() coalesces a partition fragmented by repeated
    appends while untouched partitions carry by reference; content
    and time travel survive."""
    t = PartitionedTable(tmp_path / "t", "day")
    t.write(_rows(spark, [(1, "d1", "a"), (2, "d2", "b")]))
    # fragment d1: three single-row overwrites appending docs
    for i in range(3):
        cur = {(r.doc_id, r.day, r.text)
               for r in t.read_partitions(spark, ["d1"]).collect()}
        t.overwrite_partitions(
            _rows(spark, sorted(cur) + [(10 + i, "d1", f"x{i}")]), ["d1"]
        )
    d2_dir = t.partitions()["d2"]
    fp_d2 = _dir_fingerprint(tmp_path / "t" / "parts" / d2_dir)
    before = {(r.doc_id, r.text) for r in t.read(spark).collect()}
    n_before = len(list(
        (tmp_path / "t" / "parts" / t.partitions()["d1"]).rglob("*.parquet")
    ))
    assert n_before >= 2

    rep = t.compact(spark)
    assert set(rep) == {"d1"}
    assert rep["d1"][1] < rep["d1"][0] and rep["d1"][1] == 1
    # d2 untouched byte-for-byte; logical content identical
    assert t.partitions()["d2"] == d2_dir
    assert _dir_fingerprint(tmp_path / "t" / "parts" / d2_dir) == fp_d2
    assert {(r.doc_id, r.text) for r in t.read(spark).collect()} == before
    # idempotent: a second compact finds nothing fragmented
    assert t.compact(spark) == {}


def test_write_collects_crashed_writer_orphans(spark, tmp_path):
    """A parts dir no manifest references (a crashed writer's
    residue) is swept by the next write's orphan GC — never a live
    dir (manifests only reference fully-promoted dirs)."""
    t = PartitionedTable(tmp_path / "t", "day")
    t.write(_rows(spark, [(1, "d1", "a")]))
    orphan = tmp_path / "t" / "parts" / "p-deadbeefcafe"
    orphan.mkdir()
    (orphan / "junk.parquet").write_bytes(b"not really parquet")
    live = set(t.partitions().values())
    t.overwrite_partitions(_rows(spark, [(2, "d2", "b")]), ["d2"])
    assert not orphan.exists()
    for d in live:  # live dirs survived the sweep
        assert (tmp_path / "t" / "parts" / d).is_dir()


def test_overwrite_partitions_bootstraps_empty_table(spark, tmp_path):
    """overwrite_partitions on a table with no snapshot behaves as a
    first write of exactly the named partitions."""
    t = PartitionedTable(tmp_path / "t", "day")
    t.overwrite_partitions(_rows(spark, [(1, "d1", "a")]), ["d1"])
    assert sorted(t.partitions()) == ["d1"]
    assert {r.doc_id for r in t.read(spark).collect()} == {1}


def test_partitioned_table_random_walk_matches_model(spark, tmp_path):
    """Model-based walk: random interleavings of overwrite / full
    write / compact / vacuum against a plain dict model — after every
    op the table's logical content equals the model (the storage
    layer's refcounting, carry-by-reference, and GC can never lose or
    resurrect a row)."""
    import random

    for seed in (5, 17):
        rng = random.Random(seed)
        t = PartitionedTable(tmp_path / f"w{seed}", "day")
        model: dict[str, dict[int, str]] = {}
        days = [f"d{i}" for i in range(4)]
        next_id = 0

        def flat(m):
            return [
                (i, d, s) for d, docs in m.items() for i, s in docs.items()
            ]

        # bootstrap
        for d in days[:2]:
            model[d] = {}
            for _ in range(2):
                model[d][next_id] = f"t{next_id}"
                next_id += 1
        t.write(_rows(spark, flat(model)))

        for step in range(10):
            op = rng.choice(["overwrite", "compact", "vacuum", "overwrite"])
            if op == "overwrite":
                k = rng.randint(1, 2)
                vals = rng.sample(days, k)
                for d in vals:
                    if rng.random() < 0.25:
                        model[d] = {}  # emptied (takedown shape)
                    else:
                        model.setdefault(d, {})
                        for _ in range(rng.randint(1, 2)):
                            model[d][next_id] = f"t{next_id}"
                            next_id += 1
                        # occasionally drop one doc
                        if model[d] and rng.random() < 0.5:
                            model[d].pop(rng.choice(list(model[d])))
                repl = {d: model.get(d, {}) for d in vals}
                t.overwrite_partitions(
                    _rows(spark, [
                        (i, d, s)
                        for d, docs in repl.items()
                        for i, s in docs.items()
                    ]),
                    vals,
                )
                for d in vals:
                    if not model.get(d):
                        model.pop(d, None)
            elif op == "compact":
                t.compact(spark)
            else:
                t.vacuum(keep=2)
            got = sorted(
                (r.doc_id, r.day, r.text) for r in t.read(spark).collect()
            ) if model else []
            assert got == sorted(flat(model)), f"seed={seed} step={step} {op}"
            assert sorted(t.partitions()) == sorted(model)
