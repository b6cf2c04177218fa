"""FS adapter tests (round-5 verdict task 7): one semantics contract,
two implementations — LocalFS over bare paths (what every existing
epoch/lock/snapshot test now runs through) and HadoopFS over file://
URIs through the real Hadoop FileSystem stack in the Spark JVM (the
only scheme this container can host; hdfs/s3a/abfs reuse the same
code path)."""

from __future__ import annotations

import pytest


def _contract(fs, root, join):
    """The six-primitive contract both implementations must satisfy."""
    fs.mkdirs(join(root, "d"))
    assert fs.is_dir(join(root, "d"))

    # exclusive create: first wins, second refuses
    lock = join(root, "d", "_LOCK")
    assert fs.create_exclusive(lock, "me-1") is True
    assert fs.create_exclusive(lock, "me-2") is False
    assert fs.read_text(lock) == "me-1"

    # mtime + touch move forward
    t0 = fs.mtime(lock)
    fs.touch(lock)
    assert fs.mtime(lock) >= t0

    # atomic pointer replace: content is old or new, never torn
    ptr = join(root, "d", "_CURRENT")
    fs.write_text_atomic(ptr, "snap-1")
    assert fs.read_text(ptr) == "snap-1"
    fs.write_text_atomic(ptr, "snap-2")
    assert fs.read_text(ptr) == "snap-2"

    # non-clobbering rename: refuses an occupied destination,
    # succeeds to a free one, raises on a missing source
    a, b = join(root, "d", "a"), join(root, "d", "b")
    fs.write_text_atomic(a, "A")
    fs.write_text_atomic(b, "B")
    assert fs.rename(a, b) is False
    assert fs.read_text(b) == "B" and fs.read_text(a) == "A"
    c = join(root, "d", "c")
    assert fs.rename(a, c) is True
    assert fs.read_text(c) == "A" and not fs.exists(a)
    with pytest.raises(FileNotFoundError):
        fs.rename(join(root, "d", "missing"), join(root, "d", "x"))

    # clobbering replace (the flip primitive)
    fs.replace(c, b)
    assert fs.read_text(b) == "A" and not fs.exists(c)

    # dir rename is the tombstone-swap primitive
    d1, d2 = join(root, "dir1"), join(root, "dir2")
    fs.mkdirs(d1)
    fs.write_text_atomic(join(d1, "f"), "payload")
    assert fs.rename(d1, d2) is True
    assert fs.read_text(join(d2, "f")) == "payload"
    assert not fs.exists(d1)

    # recursive delete + read-missing raises
    fs.delete(d2)
    assert not fs.exists(d2)
    with pytest.raises(FileNotFoundError):
        fs.read_text(join(d2, "f"))


def test_localfs_contract(tmp_path):
    from ods_v3_dbt_spark.fs import LocalFS, fs_for, join

    root = tmp_path / "lfs"
    fs = fs_for(root)
    assert isinstance(fs, LocalFS)
    _contract(fs, root, join)


def test_hadoopfs_contract(spark, tmp_path):
    from ods_v3_dbt_spark.fs import HadoopFS, fs_for, join

    root = f"file://{tmp_path}/hfs"
    fs = fs_for(root, spark)
    assert isinstance(fs, HadoopFS)
    _contract(fs, root, join)


def test_writer_lock_over_hadoopfs(spark, tmp_path):
    """The writer lock's acquire/steal/fence/release protocol runs
    unchanged over the Hadoop arm — a held lock rejects a contender,
    fencing works, release clears, and a stale lock is stolen."""
    import time

    from ods_v3_dbt_spark.fs import fs_for, join
    from ods_v3_dbt_spark.sinks import (
        ConcurrentWriteError,
        LOCK_MARKER,
        _writer_lock,
    )

    root = f"file://{tmp_path}/lockroot"
    fs = fs_for(root, spark)
    with _writer_lock(root) as lk:
        lk.check()
        with pytest.raises(ConcurrentWriteError, match="held"):
            with _writer_lock(root):
                pass
    assert not fs.exists(join(root, LOCK_MARKER))

    # stale steal over HadoopFS: backdated mtime via setTimes
    lock = join(root, LOCK_MARKER)
    assert fs.create_exclusive(lock, "dead-writer 0")
    fs._fs.setTimes(fs._path(lock), int((time.time() - 7200) * 1000), -1)
    with _writer_lock(root) as lk2:
        lk2.check()  # stole the dead lock and owns it
    assert not fs.exists(lock)
