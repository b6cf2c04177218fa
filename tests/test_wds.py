"""WebDataset tar-shard source: roundtrip, first-dot key grouping,
512-block offset arithmetic, malformed-shard degradation, and the
binaryFile Spark reader end-to-end."""

from __future__ import annotations

import pytest

from ods_v3_dbt_spark.sources import wds as W


def _samples(n=3):
    return [
        {
            "__key__": f"{i:06d}",
            "txt": f"document number {i} body text".encode(),
            "json": b'{"label": %d}' % i,
        }
        for i in range(n)
    ]


def test_roundtrip_multi_sample():
    samples = _samples(4)
    shard = W.build_tar_shard(samples)
    got = W.parse_tar_samples(shard)
    assert [s["key"] for s in got] == [s["__key__"] for s in samples]
    for want, s in zip(samples, got):
        assert set(s["parts"]) == {"txt", "json"}
        assert s["parts"]["txt"] == want["txt"]
        assert s["parts"]["json"] == want["json"]
        assert s["sizes"]["txt"] == len(want["txt"])


def test_first_dot_key_grouping():
    """WebDataset contract: key = basename up to the FIRST dot, so
    dotted part names (seg.png) stay within the sample."""
    shard = W.build_tar_shard(
        [{"__key__": "a01", "txt": b"t", "seg.png": b"fakepng"}]
    )
    (s,) = W.parse_tar_samples(shard)
    assert s["key"] == "a01"
    assert set(s["parts"]) == {"seg.png", "txt"}


def test_directory_prefix_ignored_for_key():
    import io
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in [("sub/dir/k9.txt", b"x"), ("sub/dir/k9.cls", b"7")]:
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    (s,) = W.parse_tar_samples(buf.getvalue())
    assert s["key"] == "k9"
    assert set(s["parts"]) == {"txt", "cls"}


def test_offsets_follow_block_arithmetic():
    """first_offset = Σ prior members' (512 header + 512·ceil(size/512))
    — including the zero-length-member edge (header only, no data
    block)."""
    samples = [
        {"__key__": "s0", "a": b"x" * 513, "b": b""},   # 512+1024, 512+0
        {"__key__": "s1", "a": b"y" * 512},             # starts after 2048
        {"__key__": "s2", "a": b"z"},
    ]
    got = W.parse_tar_samples(W.build_tar_shard(samples))
    assert [s["first_offset"] for s in got] == [0, 2048, 2048 + 1024]


def test_malformed_shard_raises_valueerror():
    with pytest.raises(ValueError):
        W.parse_tar_samples(b"not a tar at all" * 40)
    # truncated: a valid header claiming more data than present
    shard = W.build_tar_shard(_samples(1))
    with pytest.raises(ValueError):
        W.parse_tar_samples(shard[:600])


def test_build_is_deterministic():
    assert W.build_tar_shard(_samples(3)) == W.build_tar_shard(_samples(3))


def test_wds_samples_spark_reader(spark, tmp_path):
    for i in range(3):
        (tmp_path / f"shard-{i}.tar").write_bytes(
            W.build_tar_shard(_samples(4))
        )
    (tmp_path / "shard-bad.tar").write_bytes(b"garbage" * 100)
    df = W.wds_samples(spark, str(tmp_path / "*.tar"))
    rows = df.collect()
    ok = [r for r in rows if r.ok]
    bad = [r for r in rows if not r.ok]
    assert len(ok) == 12 and len(bad) == 1
    r = next(r for r in ok if r.sample_idx == 2)
    assert r.key == "000002"
    assert r.part_names == ["json", "txt"]
    assert bytes(r.parts["txt"]) == b"document number 2 body text"
    assert bad[0].error


def test_write_wds_shards_roundtrip(spark, tmp_path):
    """Export → re-ingest roundtrip: curated rows become real shard
    files plus a manifest whose counts/bytes match the files, and
    reading the shards back recovers every sample."""
    import pyspark.sql.functions as F

    rows = [(i, i // 4, f"{i:06d}", f"body of {i}", str(i % 3)) for i in range(12)]
    df = spark.createDataFrame(
        rows, "doc_id long, shard_id long, key string, txt string, cls string"
    )
    out = str(tmp_path)
    manifest = W.write_wds_shards(
        df, out, shard_col="shard_id", key_col="key", part_cols=("cls", "txt")
    ).collect()
    assert sorted(m.shard_id for m in manifest) == [0, 1, 2]
    assert all(m.n_samples == 4 for m in manifest)
    import os
    for m in manifest:
        assert os.path.getsize(m.path) == m.n_bytes

    back = W.wds_samples(spark, f"{out}/*.tar")
    got = back.filter(F.col("ok")).collect()
    assert len(got) == 12
    r = next(r for r in got if r.key == "000007")
    assert bytes(r.parts["txt"]) == b"body of 7"
    assert bytes(r.parts["cls"]) == b"1"
    # deterministic export: rewriting produces byte-identical shards
    sizes1 = {m.shard_id: m.n_bytes for m in manifest}
    manifest2 = W.write_wds_shards(
        df, out, shard_col="shard_id", key_col="key", part_cols=("cls", "txt")
    ).collect()
    assert {m.shard_id: m.n_bytes for m in manifest2} == sizes1


def test_wds_shards_takedown_rewrites_only_affected(spark, tmp_path):
    """Round-7 takedown for the multimodal container: samples vanish
    from exactly the shards holding them (atomic in-place swap);
    untouched shards stay BYTE-IDENTICAL; an all-taken-down shard
    rewrites to an empty tar; replay is a no-op."""
    rows = [
        (i, i // 4, f"{i:06d}", f"body of {i}", str(i % 3))
        for i in range(12)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, shard_id long, key string, txt string, cls string"
    )
    W.write_wds_shards(
        df, str(tmp_path), shard_col="shard_id", key_col="key",
        part_cols=("cls", "txt"),
    ).collect()
    untouched = (tmp_path / "shard-000002.tar").read_bytes()

    # take down two samples from shard 0 and one from shard 1
    keys = spark.createDataFrame(
        [("000001",), ("000002",), ("000005",)], "key string"
    )
    receipt = {
        r.path.rsplit("/", 1)[-1]: (r.n_removed, r.n_samples_after)
        for r in W.wds_shards_takedown(
            spark, str(tmp_path / "*.tar"), keys
        ).collect()
    }
    assert receipt == {
        "shard-000000.tar": (2, 2),
        "shard-000001.tar": (1, 3),
    }
    # shard 2 untouched byte-for-byte
    assert (tmp_path / "shard-000002.tar").read_bytes() == untouched
    # re-read: the keys are gone, everything else survives
    back = W.wds_samples(spark, str(tmp_path / "*.tar"))
    got = {r.key for r in back.collect() if r.ok}
    assert got == {f"{i:06d}" for i in range(12)} - {"000001", "000002",
                                                     "000005"}
    # replay: nothing left to rewrite
    assert W.wds_shards_takedown(
        spark, str(tmp_path / "*.tar"), keys
    ).count() == 0

    # all-vanished shard: empty tar, zero samples, file kept
    all_keys = spark.createDataFrame(
        [(f"{i:06d}",) for i in range(8, 12)], "key string"
    )
    rec = {
        r.path.rsplit("/", 1)[-1]: r.n_samples_after
        for r in W.wds_shards_takedown(
            spark, str(tmp_path / "*.tar"), all_keys
        ).collect()
    }
    assert rec == {"shard-000002.tar": 0}
    assert W.parse_tar_samples(
        (tmp_path / "shard-000002.tar").read_bytes()
    ) == []
