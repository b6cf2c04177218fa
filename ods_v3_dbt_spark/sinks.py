"""Sinks / loads L1-L4 (SURVEY.md §2.2) + the engine's table store.

The reference lands CSV batches in MinIO then ``COPY``s into Postgres
staging (``bccp_to_ods.py:245-332``); ODS tables mutate in place via
SQL MERGE. On Spark-over-Parquet, in-place MERGE isn't atomic
(SURVEY §7.3 risk 1), so the engine uses **snapshot-swap tables**: a
table is a directory of immutable snapshot subdirs plus a ``_CURRENT``
pointer file. Writers produce a full new snapshot and flip the
pointer — readers never observe a half-written table, and a failed
write leaves the previous snapshot intact. (Swap-by-pointer is the
plain-Spark stand-in for Delta's transaction log; the merge operators
in ``operators/merge.py`` stay storage-agnostic.)

Partitioned facts write with ``partitionBy(day)`` so M6/M7 windows
prune at read time; with ``partitionOverwriteMode=dynamic`` an
in-place ``INSERT OVERWRITE`` of touched days is also offered
(:func:`overwrite_partitions`) for the landing zone where snapshot
isolation doesn't matter.
"""

from __future__ import annotations

import contextlib
import os
import threading
import time
import uuid
from collections.abc import Sequence
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

CURRENT_MARKER = "_CURRENT"
LOCK_MARKER = "_LOCK"


def _warehouse_path(spark: SparkSession):
    """The warehouse root as a path object: ``file:`` URIs unwrap to
    a local :class:`~pathlib.Path` (byte-identical to the historical
    behavior every local deployment and test relies on); any OTHER
    scheme (s3a://, hdfs://, …) stays a URI (:func:`..fs.norm_root`)
    so the index manifests/locks/GC that key off this root run
    through HadoopFS instead of mangling the URI into a relative
    local path."""
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    for prefix in ("file://", "file:"):
        if wh.startswith(prefix):
            wh = wh[len(prefix):]
            break
    return _norm_root(wh)


def _loc(p) -> str:
    """A path object as a catalog LOCATION / writer path string:
    local paths resolve (relative warehouse dirs must anchor to one
    absolute location), URIs pass through."""
    return str(p.resolve()) if isinstance(p, Path) else str(p)


def _norm_root(root):
    """Store roots accept bare paths AND ``scheme://`` URIs: the
    latter become :class:`..fs.UriPath` so every ``root / name``
    stays a URI and :func:`..fs.fs_for` dispatches the whole
    snapshot protocol (locks, manifests, listings, deletes) to
    :class:`..fs.HadoopFS` — the curated store runs on any
    Hadoop-supported object store (round-8/9 verdict task; proven
    through ``file://`` in tests, the one scheme this container
    hosts)."""
    from . import fs as FS

    return FS.norm_root(root)


class ConcurrentWriteError(RuntimeError):
    """Another writer holds the table's writer lock. Retry after it
    commits (snapshot-swap keeps the table readable throughout)."""


class AtomicRenameRequiredError(RuntimeError):
    """A requested protocol would swap a LIVE directory in place,
    which is only safe where renames are atomic
    (``fs.supports_atomic_rename``). Since round 12 NO engine
    protocol needs this: :class:`BucketedTable` — the last holdout —
    commits via pointer indirection like every other store. The
    class is retained for import compatibility and for any future
    protocol that genuinely cannot avoid a live-dir swap."""


class _LockHandle:
    """What ``_writer_lock`` yields: the holder's identity plus a
    FENCING check. ``check()`` re-reads the lock file and raises
    :class:`ConcurrentWriteError` unless this holder still owns it —
    write paths call it immediately before their commit/flip step, so
    a writer that was (wrongly or rightly) evicted mid-produce aborts
    instead of flipping the pointer over the evictor's commit. This is
    the fencing-token pattern: ownership is re-verified at the moment
    that matters, not only at acquisition."""

    def __init__(self, fs, lock, me: str) -> None:
        self.fs = fs
        self.lock = lock
        self.me = me
        self._fenced = False

    def owned(self) -> bool:
        if self._fenced:
            return False
        try:
            return self.fs.read_text(self.lock).startswith(self.me)
        except FileNotFoundError:
            return False

    def check(self) -> None:
        if not self.owned():
            self._fenced = True
            raise ConcurrentWriteError(
                f"fenced: writer lock {self.lock} no longer held by "
                f"{self.me} — another writer evicted this one; "
                "aborting before the pointer flip"
            )


def _holder_dead(fs, lock) -> bool:
    """True when the lock's recorded holder is a LOCAL pid that no
    longer exists — a crashed (kill -9'd) writer's lock is then
    stolen IMMEDIATELY instead of blocking every later writer for
    the full ``stale_after_s`` age-out (a stale 20-minute lock from
    a killed test run failed unrelated suites two rounds straight).
    Only meaningful for LocalFS locks: a pid recorded from another
    host is indistinguishable from a live local one, so non-local
    adapters return False and the age-out path applies. Pid reuse
    makes a dead holder look alive, never the reverse — the check
    can only delay a steal, not evict a live writer."""
    from . import fs as FS

    if not isinstance(fs, FS.LocalFS):
        return False
    try:
        pid = int(fs.read_text(lock).split("-", 1)[0])
    except (FileNotFoundError, ValueError):
        return False
    if pid == os.getpid():
        return False  # our own lock (misuse, not a crash)
    try:
        os.kill(pid, 0)
        return False
    except ProcessLookupError:
        return True
    except PermissionError:
        return False  # exists, owned by another user


@contextlib.contextmanager
def _writer_lock(root: Path, stale_after_s: float = 3600.0,
                 heartbeat: bool = True):
    """Exclusive writer mutex via atomic O_CREAT|O_EXCL lock-file
    creation — the one primitive every filesystem (and object store
    with if-none-match) gives. The reference gets this for free from
    Postgres transactions (its merges run inside one SQL statement,
    and Airflow overlaps runs with max_active_runs=2,
    dags/bccp_dag.py:30-33); plain-parquet Spark does not, so two
    concurrent EtlJobs could interleave snapshot-write and
    pointer-flip. Holding the lock from before the snapshot write
    until after the flip makes writer commits serial; readers never
    block (they only follow the pointer). A lock older than
    ``stale_after_s`` is presumed abandoned (crashed writer) and
    stolen.

    Two liveness/safety upgrades (round-5 verdict task 3):

    * **mtime heartbeat** — a daemon thread refreshes the lock's
      mtime every ``stale_after_s/4`` (ownership-verified first, so
      it never refreshes an evictor's lock), which means a LIVE
      writer is never seen stale no matter how long its commit runs;
      only a genuinely crashed writer's lock ages out.
    * **fencing at the flip** — yields a :class:`_LockHandle` whose
      ``check()`` the write paths call immediately before their
      pointer-flip/catalog-swap, so an evicted writer aborts its
      commit instead of clobbering the evictor's.

    Residual LIMIT (inherent to lock files without server-side CAS):
    the check-then-flip pair is not one atomic step, so a stall
    landing exactly between them can still slip through — that
    window is microseconds (was: the entire produce time) and
    requires the heartbeat to have ALSO failed for hours. A steal
    that detects mid-restore that a third writer re-locked raises
    loudly (round-4 advisor: silently discarding the evicted lock
    widened the overlap window). All file operations go through the
    :mod:`..fs` adapter (round-5 task 7) — LocalFS on bare paths,
    HadoopFS on URIs — with the same atomicity contract; see fs.py
    for the object-store caveats. Production note: Delta Lake's
    transaction log is the grown-up version of this file —
    documented in README."""
    from . import fs as FS

    fs = FS.fs_for(root)
    fs.mkdirs(root)
    lock = FS.join(root, LOCK_MARKER)
    me = f"{os.getpid()}-{uuid.uuid4().hex[:8]}"
    while True:
        if fs.create_exclusive(lock, f"{me} {time.time()}"):
            break
        try:
            age = time.time() - fs.mtime(lock)
        except FileNotFoundError:
            continue  # holder just released; race again
        if age > stale_after_s or _holder_dead(fs, lock):
            # Steal-by-rename with CONTENT VERIFICATION: between
            # our stat and our rename another stealer may have
            # removed the stale lock and a fresh writer may have
            # re-locked — renaming unconditionally would evict a
            # LIVE writer (the classic lockfile TOCTOU). Capture
            # the stale content first; after the rename, check we
            # renamed the file we statted. On mismatch restore via
            # non-clobbering rename (fails rather than clobbers if
            # a newer lock appeared) and re-evaluate.
            try:
                expected = fs.read_text(lock)
            except FileNotFoundError:
                continue
            stale_name = FS.join(root, f".{LOCK_MARKER}.stale.{me}")
            try:
                if not fs.rename(lock, stale_name):
                    continue
            except FileNotFoundError:
                continue
            if fs.read_text(stale_name) != expected:
                # we evicted a FRESH lock — put it back without
                # clobbering anything newer
                if not fs.rename(stale_name, lock):
                    # a THIRD writer re-locked between our rename
                    # and restore: the fresh holder we evicted is
                    # now lockless while believing it holds the
                    # mutex. Its own flip is fenced off by
                    # _LockHandle.check(), but this overlap must
                    # surface loudly, not pass silently
                    # (round-4 advisor, sinks.py:112).
                    fs.delete(stale_name)
                    raise ConcurrentWriteError(
                        f"multi-stealer collision on {lock}: evicted a "
                        "fresh lock and a third writer re-locked before "
                        "restore — the evicted writer will be fenced at "
                        "its flip; back off and retry"
                    )
                continue
            fs.delete(stale_name)  # verified stale; no residue
            continue
        raise ConcurrentWriteError(
            f"writer lock held on {root} (age {age:.0f}s)"
        )
    handle = _LockHandle(fs, lock, me)
    stop = None
    if heartbeat:
        import threading

        stop = threading.Event()
        interval = max(0.05, stale_after_s / 4.0)

        def _beat() -> None:
            # A transiently missing/foreign lock is NOT proof of
            # eviction: a stealer's rename-then-restore window makes
            # owned() flicker False / touch raise FileNotFoundError
            # for a lock that is about to be restored. Exiting the
            # thread on the first such reading silently forfeits the
            # liveness guarantee the heartbeat exists for (the holder
            # keeps running un-heartbeated and ages out mid-commit) —
            # so re-check after a short sleep and only give up on a
            # CONFIRMED loss (round-6 advisor, sinks.py:198).
            misses = 0
            while not stop.wait(interval if misses == 0 else 0.2):
                owned = handle.owned()
                if owned:
                    try:
                        fs.touch(handle.lock)
                        misses = 0
                        continue
                    except FileNotFoundError:
                        pass  # fell into a steal window — re-check
                misses += 1
                if misses > 3:
                    return  # confirmed eviction; fencing covers safety

        beat = threading.Thread(
            target=_beat, name=f"lock-heartbeat-{me}", daemon=True
        )
        beat.start()
    try:
        yield handle
    finally:
        if stop is not None:
            stop.set()
        # OWNERSHIP-CHECKED release: if a stealer evicted us despite
        # the heartbeat, the current lock file belongs to someone
        # else — unlinking it blindly would let a third writer in
        # while the stealer is mid-commit.
        try:
            if fs.read_text(lock).startswith(me):
                fs.delete(lock)
        except FileNotFoundError:
            pass


class ParquetTable:
    """Snapshot-swap Parquet table (see module docstring)."""

    def __init__(self, root: str | Path, partition_cols: Sequence[str] = ()) -> None:
        self.root = _norm_root(root)
        self.partition_cols = tuple(partition_cols)

    # -- pointer management -------------------------------------------------

    def _fs(self):
        from . import fs as FS

        return FS.fs_for(self.root)

    def _pointer(self) -> Path:
        return self.root / CURRENT_MARKER

    def current_snapshot(self) -> Path | None:
        from . import fs as FS

        fs = self._fs()
        name = FS.read_pointer(fs, self._pointer())
        if name is None:
            return None
        snap = self.root / name.strip()
        return snap if fs.exists(snap) else None

    def exists(self) -> bool:
        return self.current_snapshot() is not None

    # -- IO -----------------------------------------------------------------

    def read(self, spark: SparkSession) -> DataFrame:
        snap = self.current_snapshot()
        if snap is None:
            raise FileNotFoundError(f"table has no snapshot: {self.root}")
        return spark.read.parquet(str(snap))

    def write(self, df: DataFrame) -> Path:
        """Write a new immutable snapshot, then flip the pointer.

        The pointer flip is a single small-file write — the closest a
        filesystem gives to atomic commit; stale snapshots stay until
        :meth:`vacuum`, so concurrent readers finish safely. The
        whole produce+flip holds the writer lock (:func:`_writer_lock`)
        so a second concurrent writer fails fast with
        :class:`ConcurrentWriteError` instead of silently losing the
        race — it retries after the winner commits (two-writer
        semantics pinned in tests/test_engine.py).
        """
        with _writer_lock(self.root) as lk:
            return self._produce(df, lk)

    def _produce(self, df: DataFrame, lk) -> Path:
        """Snapshot write + pointer flip, CALLER-LOCKED — the shared
        tail of :meth:`write` and :meth:`compact` (compact must hold
        the lock across its read→rewrite, and the lock file is not
        reentrant)."""
        snap = f"snap-{int(time.time() * 1000)}-{uuid.uuid4().hex[:8]}"
        writer = df.write.mode("errorifexists")
        if self.partition_cols:
            writer = writer.partitionBy(*self.partition_cols)
        writer.parquet(str(self.root / snap))
        lk.check()  # fencing: abort (not flip) if evicted mid-produce
        # pointer commit through the FS adapter: atomic replace on
        # rename-atomic stores, conditional-put log entry on object
        # stores (fs.commit_pointer — all-old-or-all-new either way)
        from . import fs as FS

        FS.commit_pointer(self._fs(), self._pointer(), snap,
                          fence=lk.check)
        return self.root / snap

    def history(self) -> list[Path]:
        """All retained snapshots, newest first (current marked by the
        pointer, prior ones readable until :meth:`vacuum`) — the
        snapshot-swap design gives time travel for free within the
        retention window (one adapter listing, URI-capable)."""
        return sorted(
            (
                self.root / name
                for (name, is_dir, _) in self._fs().list(self.root)
                if is_dir and name.startswith("snap-")
            ),
            reverse=True,
        )

    def read_snapshot(self, spark: SparkSession, version: int | str) -> DataFrame:
        """Time-travel read: ``version`` is either a snapshot name from
        :meth:`history` or a non-negative index into it (0 = newest
        retained, 1 = previous, …)."""
        snaps = self.history()
        if isinstance(version, int):
            if not 0 <= version < len(snaps):
                raise IndexError(f"snapshot index {version} out of range ({len(snaps)} retained)")
            snap = snaps[version]
        else:
            snap = self.root / version
            if not self._fs().is_dir(snap):
                raise FileNotFoundError(f"no such snapshot: {snap}")
        return spark.read.parquet(str(snap))

    # -- snapshot pins ------------------------------------------------------

    def _pins_file(self) -> Path:
        return self.root / "_PINS.json"

    def pinned_snapshots(self) -> set[str]:
        """Snapshot names protected from :meth:`vacuum` by
        :meth:`set_pin` (long-running time-travel readers)."""
        import json

        fs = self._fs()
        if not fs.exists(self._pins_file()):
            return set()
        pins = json.loads(fs.read_text(self._pins_file())).get("pins", {})
        return {s for names in pins.values() for s in names}

    def set_pin(self, pin_id: str, snapshots: Sequence[str] | None) -> None:
        """Declare (or with ``snapshots=None`` release) a named pin
        on retained snapshots: pinned snapshots survive ANY number of
        :meth:`vacuum` calls until the pin is released — the
        guarantee a reader holding a :meth:`read_snapshot` plan
        across many refreshes needs (round-6 verdict task 4; the
        previous ``keep=N`` heuristic was a convention, not a
        guarantee). The read-modify-write runs under the table's
        writer lock so it cannot race a concurrent writer's vacuum."""
        import json

        fs = self._fs()
        with _writer_lock(self.root):
            pins = {}
            if fs.exists(self._pins_file()):
                pins = json.loads(fs.read_text(self._pins_file())).get(
                    "pins", {}
                )
            if snapshots is None:
                pins.pop(pin_id, None)
            else:
                pins[pin_id] = sorted(set(snapshots))
            fs.write_text_atomic(
                self._pins_file(), json.dumps({"pins": pins}, sort_keys=True)
            )

    def vacuum(self, keep: int = 2, pinned: Sequence[str] = ()) -> list[Path]:
        """Drop all but the newest ``keep`` snapshots — never the
        current one, never a snapshot named in ``pinned`` (caller-
        supplied, e.g. the live/previous ``_CURATED`` co-manifest
        pair), and never one protected by :meth:`set_pin`. Runs under
        the writer lock: an unlocked vacuum could sample the pointer,
        lose the CPU while a writer commits + a reader resolves the
        NEW snapshot, and then delete it as 'beyond keep' (round-9
        ADVICE). Returns removed paths."""
        with _writer_lock(self.root):
            fs = self._fs()
            current = self.current_snapshot()
            protect = set(pinned) | self.pinned_snapshots()
            snaps = self.history()
            victims = [
                p for p in snaps[keep:]
                if p != current and p.name not in protect
            ]
            for p in victims:
                fs.delete(p)
            return victims

    def file_stats(self) -> tuple[int, int]:
        """(n_data_files, total_bytes) of the current snapshot."""
        snap = self.current_snapshot()
        if snap is None:
            return (0, 0)
        files = [
            (n, s)
            for (n, s) in self._fs().list_files(snap)
            if n.endswith(".parquet")
        ]
        return (len(files), sum(s for _, s in files))

    def compact(
        self, spark: SparkSession, target_file_bytes: int = 128 << 20
    ) -> tuple[int, int]:
        """Rewrite the current snapshot with right-sized files
        (OPTIMIZE-style bin packing). Incremental appends and
        per-window merges accrete small files; every downstream scan
        then pays a task per file — at 100 TB the scheduler, not IO,
        becomes the bottleneck. Compaction coalesces to
        ``ceil(bytes / target_file_bytes)`` files (per partition for
        partitioned tables via a shuffle-free coalesce / partition-key
        repartition) and snapshot-swaps, so readers never see a
        half-compacted table. Holds the writer lock across the whole
        read→rewrite: unlocked, a writer committing between
        compact's read and its write would have its commit replaced
        by the stale pre-commit rows (round-9 ADVICE — lost update).
        Returns (files_before, files_after)."""
        with _writer_lock(self.root) as lk:
            n_before, total = self.file_stats()
            if n_before == 0:
                return (0, 0)
            df = self.read(spark)
            if self.partition_cols:
                # one task per partition value → one file per dir
                df = df.repartition(*[df[c] for c in self.partition_cols])
            else:
                n_target = max(1, -(-total // target_file_bytes))
                df = df.coalesce(n_target)
            self._produce(df, lk)
            return (n_before, self.file_stats()[0])


class PartitionedTable:
    """Partition-manifest snapshot table — the layout that makes
    partial rewrites O(touched partitions) while keeping snapshot
    isolation and time travel (round-8 verdict task 2).

    :class:`ParquetTable` snapshots are monolithic: every write —
    including a takedown that removes three docs, or a nightly append
    of one day — produces a full new copy of the table, O(corpus) at
    100 TB. This table versions at PARTITION granularity instead,
    the same idea Delta/Iceberg apply at file granularity:

    * each partition value owns an IMMUTABLE physical directory
      under ``root/parts/`` (data files keep the partition column —
      a dir is self-describing, readable standalone);
    * a snapshot is ONE small JSON manifest mapping partition value →
      directory; ``_CURRENT`` points at the live manifest (atomic
      flip, same as ParquetTable);
    * a writer rewrites only the partitions it touches — new dirs for
      those values, every other entry CARRIED BY REFERENCE from the
      previous manifest, so untouched partitions stay byte-identical
      across snapshots (pinned in tests) and cost zero I/O;
    * retention is refcounted: :meth:`vacuum` drops old manifests,
      then deletes only partition dirs no retained (or pinned)
      manifest references — shared dirs survive as long as any
      reader can reach them.

    Partition values are tracked as STRINGS (the column is cast on
    write; pass str/int/date-like values — ``str(v)`` must equal
    Spark's string cast, which holds for those types). NULL partition
    values are refused: a takedown/append must be able to NAME every
    partition it touches. Readers either take the whole table
    (:meth:`read` — a union of the manifest's dirs; per-dir constant
    partition columns still prune at row-group level) or name values
    (:meth:`read_partitions` — only those dirs are even listed, the
    manifest IS the partition index, no filesystem glob at 100 TB).

    Same writer-lock/fencing, pin, and time-travel contracts as
    :class:`ParquetTable`; `TableGroup.wrap`/`commit_pointers`
    compose unchanged (a manifest file is the snapshot name).
    Production note: Delta's DELETE/OVERWRITE WHERE is the grown-up
    version of this manifest — documented in README."""

    def __init__(self, root: str | Path, partition_col: str) -> None:
        if not partition_col:
            raise ValueError("PartitionedTable requires a partition column")
        self.root = _norm_root(root)
        self.partition_col = partition_col

    # -- plumbing shared with ParquetTable ----------------------------------

    _fs = ParquetTable._fs
    _pins_file = ParquetTable._pins_file
    pinned_snapshots = ParquetTable.pinned_snapshots
    set_pin = ParquetTable.set_pin

    def _pointer(self) -> Path:
        return self.root / CURRENT_MARKER

    def current_snapshot(self) -> Path | None:
        from . import fs as FS

        fs = self._fs()
        name = FS.read_pointer(fs, self._pointer())
        if name is None:
            return None
        snap = self.root / name.strip()
        return snap if fs.exists(snap) else None

    def exists(self) -> bool:
        return self.current_snapshot() is not None

    def history(self) -> list[Path]:
        return sorted(
            (
                self.root / name
                for (name, is_dir, _) in self._fs().list(self.root)
                if not is_dir
                and name.startswith("snap-")
                and name.endswith(".json")
            ),
            reverse=True,
        )

    # -- manifest IO ----------------------------------------------------------

    def _manifest(self, snap: Path) -> dict:
        import json

        return json.loads(self._fs().read_text(snap))

    def partitions(self, version: int | str | None = None) -> dict[str, str]:
        """{partition value: physical dir name} of a snapshot
        (default: current)."""
        snap = self._resolve_snap(version)
        return self._manifest(snap)["partitions"]

    def _resolve_snap(self, version: int | str | None) -> Path:
        if version is None:
            snap = self.current_snapshot()
            if snap is None:
                raise FileNotFoundError(f"table has no snapshot: {self.root}")
            return snap
        snaps = self.history()
        if isinstance(version, int):
            if not 0 <= version < len(snaps):
                raise IndexError(
                    f"snapshot index {version} out of range "
                    f"({len(snaps)} retained)"
                )
            return snaps[version]
        snap = self.root / version
        fs = self._fs()
        if not fs.exists(snap) or fs.is_dir(snap):
            raise FileNotFoundError(f"no such snapshot: {snap}")
        return snap

    # -- reads ----------------------------------------------------------------

    def _read_dirs(self, spark: SparkSession, dirs: list[str],
                   man: dict | None = None) -> DataFrame:
        """Union scan of the named dirs; ZERO dirs returns an EMPTY
        DataFrame with the manifest's recorded schema. Every commit
        records the written DataFrame's schema precisely so an empty
        snapshot stays READABLE: the curation stream's first
        micro-batch can admit nothing, and the zero-partition
        manifest it commits must not wedge curated_view / takedown /
        the IVF rebuild until a partition lands (round-9 ADVICE). A
        legacy zero-partition manifest (pre-schema) still raises."""
        if not dirs:
            schema = (man or {}).get("schema")
            if schema is not None:
                from pyspark.sql.types import StructType

                return spark.createDataFrame([], StructType.fromJson(schema))
            if man is not None and man["partitions"]:
                # schema-less manifest but live partitions: footer-only
                # read of one dir gives the store schema
                return self._read_dirs(
                    spark, [sorted(man["partitions"].values())[0]]
                ).limit(0)
            raise FileNotFoundError(
                f"partitioned table has no partitions: {self.root}"
            )
        return spark.read.parquet(
            *[str(self.root / "parts" / d) for d in dirs]
        )

    def read(self, spark: SparkSession) -> DataFrame:
        return self.read_snapshot(spark, None)

    def read_snapshot(self, spark: SparkSession,
                      version: int | str | None) -> DataFrame:
        man = self._manifest(self._resolve_snap(version))
        return self._read_dirs(spark, sorted(man["partitions"].values()), man)

    def read_partitions(self, spark: SparkSession, values,
                        version: int | str | None = None) -> DataFrame:
        """Read ONLY the named partition values (absent values are
        simply not in the manifest — zero I/O, no error): the
        manifest-pruned scan a partial rewrite plans against. All
        values absent returns an EMPTY DataFrame in the store's
        schema (returning None made every caller crash on the next
        method call — round-9 ADVICE)."""
        man = self._manifest(self._resolve_snap(version))
        parts = man["partitions"]
        dirs = sorted(
            parts[v] for v in {str(v) for v in values} if v in parts
        )
        return self._read_dirs(spark, dirs, man)

    # -- writes ---------------------------------------------------------------

    def _stage_partitions(self, df: DataFrame, fs) -> dict[str, str]:
        """Write ``df`` ONCE partitioned by (a string copy of) the
        partition column into a staging dir, then promote each hive
        subdir to an immutable ``parts/p-*`` dir. Returns
        {value: dirname}. The copy column keeps the real column in
        the data files, so every partition dir is self-describing."""
        import json
        from urllib.parse import unquote

        from pyspark.sql import functions as F

        pt = "__pt"
        pcol = F.col(self.partition_col).cast("string")
        staged = df.withColumn(pt, pcol)
        stage_dir = self.root / f".staging-{uuid.uuid4().hex[:8]}"
        staged.write.partitionBy(pt).parquet(str(stage_dir))
        fs.mkdirs(self.root / "parts")
        out: dict[str, str] = {}
        subs = [
            stage_dir / name
            for (name, is_dir, _) in fs.list(stage_dir)
            if is_dir and name.startswith(f"{pt}=")
        ]
        for sub in subs:
            enc = sub.name[len(pt) + 1:]
            if enc == "__HIVE_DEFAULT_PARTITION__":
                raise ValueError(
                    f"NULL {self.partition_col!r} partition value: a "
                    "partitioned table must be able to NAME every "
                    "partition it touches — filter or backfill first"
                )
            val = unquote(enc)
            dirname = f"p-{uuid.uuid4().hex[:12]}"
            if not fs.rename(sub, self.root / "parts" / dirname):
                raise ConcurrentWriteError(
                    f"staging promote lost a race: {sub}"
                )
            # per-dir sidecar: which value this dir holds (debugging /
            # audit; the manifest is authoritative)
            fs.write_text_atomic(
                self.root / "parts" / dirname / "_PARTITION",
                json.dumps({self.partition_col: val}),
            )
            out[val] = dirname
        fs.delete(stage_dir)
        return out

    def _commit(self, fs, partitions: dict[str, str], lk,
                schema: dict | None = None) -> Path:
        import json

        snap = f"snap-{int(time.time() * 1000)}-{uuid.uuid4().hex[:8]}.json"
        man = {
            "partition_col": self.partition_col,
            "partitions": partitions,
        }
        if schema is not None:
            # written-DataFrame schema: keeps a zero-partition
            # snapshot readable (see _read_dirs)
            man["schema"] = schema
        # STAGE the manifest (a name history()/_referenced_dirs never
        # match), fence, then publish: writing the snap-*.json before
        # lk.check() let an EVICTED writer's manifest enter history —
        # pinning dirs alive and serving time-travel reads of a
        # commit that never happened (round-9 ADVICE)
        from . import fs as FS

        if fs.supports_atomic_rename():
            staged = self.root / f".{snap}.staged"
            fs.write_text_atomic(staged, json.dumps(man, sort_keys=True))
            lk.check()  # fencing: abort (not publish) if evicted
            if not fs.rename(staged, self.root / snap):
                raise ConcurrentWriteError(
                    f"manifest publish lost a race: {staged}"
                )
        else:
            # object store: no-clobber rename is check-then-act there,
            # so publish with the atomic conditional-put directly (the
            # manifest name is the CAS key) — the POSIX stage-then-
            # rename dance would just be a wasted PUT + DELETE here,
            # and the fence ordering is identical
            lk.check()  # fencing: abort (not publish) if evicted
            if not fs.create_exclusive(
                self.root / snap, json.dumps(man, sort_keys=True)
            ):
                raise ConcurrentWriteError(
                    f"manifest publish lost a race: {snap}"
                )
        FS.commit_pointer(fs, self._pointer(), snap, fence=lk.check)
        return self.root / snap

    def _referenced_dirs(self) -> set[str]:
        return {
            d
            for snap in self.history()
            for d in self._manifest(snap)["partitions"].values()
        }

    def _gc_orphan_dirs(self, fs) -> None:
        """Under the writer lock: delete parts dirs no manifest
        references (crashed writers' residue — never a live dir,
        since manifests only ever reference fully-promoted dirs)."""
        live = self._referenced_dirs()
        parts_root = self.root / "parts"
        # crashed/evicted writers' staged manifests (never published,
        # nothing references them)
        for (name, is_dir, _) in fs.list(self.root):
            if (
                not is_dir
                and name.startswith(".snap-")
                and name.endswith(".staged")
            ):
                fs.delete(self.root / name)
        for (name, is_dir, _) in fs.list(parts_root):
            if is_dir and name not in live:
                fs.delete(parts_root / name)

    def write(self, df: DataFrame) -> Path:
        """Full snapshot write (every partition rewrites) — the
        bootstrap / full-refresh path; incremental writers use
        :meth:`overwrite_partitions`."""
        import json

        with _writer_lock(self.root) as lk:
            fs = self._fs()
            self._gc_orphan_dirs(fs)
            return self._commit(fs, self._stage_partitions(df, fs), lk,
                                schema=json.loads(df.schema.json()))

    def overwrite_partitions(self, df: DataFrame, values) -> Path:
        """The M7 move at snapshot granularity: replace EXACTLY the
        named partition values with ``df``'s rows (which must all
        fall inside them — enforced), carry every other partition by
        reference, flip one manifest. A named value with zero rows in
        ``df`` drops out of the new snapshot (how a takedown empties
        a partition); a new value appends. I/O is O(touched
        partitions); untouched partitions are not read, not written,
        and stay byte-identical."""
        from pyspark.sql import functions as F

        values = {str(v) for v in values}
        if not values:
            raise ValueError("overwrite_partitions: empty value set")
        stray = (
            df.select(F.col(self.partition_col).cast("string").alias("__v"))
            .filter(~F.col("__v").isin(*values) | F.col("__v").isNull())
            .take(1)
        )
        if stray:
            raise ValueError(
                f"overwrite_partitions: rows outside the declared "
                f"partition set (found {self.partition_col}="
                f"{stray[0]['__v']!r}) — the declared values bound "
                "what this commit may replace"
            )
        with _writer_lock(self.root) as lk:
            return self._overwrite_locked(df, values, lk)

    def _overwrite_locked(self, df: DataFrame, values: set, lk) -> Path:
        """CALLER-LOCKED tail of :meth:`overwrite_partitions`
        (compact holds the lock across its read→rewrite — the lock
        file is not reentrant)."""
        import json

        fs = self._fs()
        self._gc_orphan_dirs(fs)
        prev = {}
        if self.exists():
            prev = dict(self.partitions())
        fresh = self._stage_partitions(df, fs)
        merged = {
            v: d for v, d in prev.items() if v not in values
        }
        merged.update(fresh)
        return self._commit(fs, merged, lk,
                            schema=json.loads(df.schema.json()))

    # -- retention --------------------------------------------------------------

    def vacuum(self, keep: int = 2, pinned: Sequence[str] = ()) -> list[Path]:
        """Drop all but the newest ``keep`` manifests (never the
        current, never one named in ``pinned`` or held by
        :meth:`set_pin`), then refcount-delete partition dirs no
        retained manifest references. Runs under the writer lock —
        unlocked, the pointer sample could predate a concurrent
        commit and vacuum would delete the NEW snapshot as 'beyond
        keep' (round-9 ADVICE; same fix as
        :meth:`ParquetTable.vacuum`). Returns removed paths."""
        with _writer_lock(self.root):
            fs = self._fs()
            current = self.current_snapshot()
            protect = set(pinned) | self.pinned_snapshots()
            snaps = self.history()
            victims = [
                p
                for p in snaps[keep:]
                if p != current and p.name not in protect
            ]
            removed: list[Path] = []
            for p in victims:
                fs.delete(p)
                removed.append(p)
            live = self._referenced_dirs()
            parts_root = self.root / "parts"
            for (name, is_dir, _) in fs.list(parts_root):
                if is_dir and name not in live:
                    fs.delete(parts_root / name)
                    removed.append(parts_root / name)
            return removed

    def file_stats(self) -> tuple[int, int]:
        """(n_data_files, total_bytes) of the current snapshot."""
        if not self.exists():
            return (0, 0)
        stats = self._partition_stats()
        return (
            sum(n for n, _ in stats.values()),
            sum(b for _, b in stats.values()),
        )

    def _partition_stats(self) -> dict[str, tuple[int, int]]:
        """{value: (n_files, n_bytes)} of the current snapshot."""
        fs = self._fs()
        out: dict[str, tuple[int, int]] = {}
        for v, d in self.partitions().items():
            files = [
                (n, s)
                for (n, s) in fs.list_files(self.root / "parts" / d)
                if n.endswith(".parquet")
            ]
            out[v] = (len(files), sum(s for _, s in files))
        return out

    def compact(
        self,
        spark: SparkSession,
        values=None,
        target_file_bytes: int = 128 << 20,
        min_files: int = 2,
    ) -> dict[str, tuple[int, int]]:
        """OPTIMIZE at partition scope: rewrite fragmented partitions
        with right-sized files and carry everything else by
        reference — the maintenance pass a partitioned curation
        corpus needs once nightly O(batch) appends accrete small
        files per day (the same scheduler-vs-IO argument as
        :meth:`ParquetTable.compact`, but the rewrite cost is
        O(fragmented partitions), never the table). ``values`` names
        the partitions to consider (default: all); a partition is
        rewritten only when it holds at least ``min_files`` files OR
        more than ceil(bytes / target_file_bytes) files. One
        manifest commit publishes the result; readers mid-scan keep
        the previous snapshot. Holds the writer lock across the whole
        read→rewrite (see :meth:`ParquetTable.compact` — unlocked,
        a commit landing between the stats read and the overwrite
        would be replaced by stale rows). Returns {value:
        (files_before, files_after)} for the rewritten partitions."""
        from pyspark.sql import functions as F

        with _writer_lock(self.root) as lk:
            stats = self._partition_stats()
            if values is not None:
                names = {str(v) for v in values}
                stats = {v: s for v, s in stats.items() if v in names}
            victims = {
                v
                for v, (n, total) in stats.items()
                if n >= min_files
                and n > max(1, -(-total // target_file_bytes))
            }
            if not victims:
                return {}
            # ONE job rewrites every fragmented partition: hash
            # repartitioning on the partition column puts each value
            # wholly in one task, so each victim lands as one
            # right-sized dir (values larger than target_file_bytes
            # can pass a values= subset and a bigger target instead)
            df = self.read_partitions(spark, sorted(victims)).repartition(
                F.col(self.partition_col)
            )
            self._overwrite_locked(df, {str(v) for v in victims}, lk)
            after = self._partition_stats()
            return {v: (stats[v][0], after[v][0]) for v in sorted(victims)}


def _overlap_writes(*thunks):
    """Run independent snapshot/member writes as CONCURRENT driver
    threads (opt guide §2.6: Spark's scheduler happily overlaps jobs
    from several threads; FIFO scheduling back-fills the tail of one
    write's job with the next one's tasks). Each write lands in its
    OWN table (distinct writer locks, distinct catalog entries or
    snapshot dirs), and visibility is gated solely by the manifest /
    pointer commit AFTER every thread returns, so ordering between
    the writes never mattered — the manifest is the only commit
    point. Exceptions propagate (a failed write must abort the
    commit). Returns the thunks' results in argument order.

    Under py4j pinned-thread mode (the default) each Python worker
    thread maps to a FRESH JVM thread whose thread-local active
    session is unset, so ``SparkSession.getActiveSession()`` — which
    the fs adapter uses to build a HadoopFS for ``scheme://``
    warehouses — returns None inside the pool. Each worker therefore
    re-binds the caller's session as its JVM active session first
    (caught by ``test_uri_warehouse``'s index lifecycle).

    Lived in operators/neardup_index.py for the index member writes;
    hoisted here (round 13) so TableGroup.commit shares it — the
    group's member snapshots are exactly this shape of independent
    write."""
    from concurrent.futures import ThreadPoolExecutor

    if len(thunks) == 1:
        return [thunks[0]()]
    s = SparkSession.getActiveSession()

    def _run(t):
        if s is not None:
            try:
                s._jvm.org.apache.spark.sql.SparkSession.setActiveSession(
                    s._jsparkSession
                )
            except Exception:
                pass  # non-classic sessions: fs paths carry no URIs
        return t()

    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(_run, t) for t in thunks]
        return [f.result() for f in futures]


class TableGroup:
    """N named snapshot-swap tables + ONE atomic commit — the
    multi-table transaction (round-6 verdict task 3).

    Each :class:`ParquetTable`'s own pointer flip is atomic, but a
    reader sampling TWO related tables mid-refresh could pair a new
    fact with an old rollup. The reference never faces this: its
    fact + datamart updates run inside one Postgres transaction
    (`dags/sql/casreport/update_des_table/casreport_mailsitemhdr.sql:1-399`
    is one atomic MERGE; `dags/sql/pns/update_des_table/update_datamart.sql:4-27`
    one DO block). This type restores that guarantee over plain
    files, generalizing the curation loop's 1-table+index
    ``_CURATED`` co-manifest into N tables: a commit writes every
    member table as a NEW snapshot (each invisible to group readers
    until the end), then replaces ONE group-manifest file recording
    the complete {name: snapshot} assignment. Group reads resolve
    the manifest ONCE and time-travel every member to its recorded
    snapshot — all-old or all-new, never a mix; a crash anywhere
    before the manifest replace leaves the group at the previous
    consistent assignment, and the replayed job simply re-commits.

    Members remain ordinary :class:`ParquetTable`\\ s — their own
    ``_CURRENT`` pointers advance per-member (standalone readers of
    one table see its latest commit; only GROUP consistency needs
    the manifest), so every existing snapshot/vacuum/pin mechanism
    composes. :meth:`vacuum` protects the snapshots of the live AND
    previous manifests (plus per-table :meth:`ParquetTable.set_pin`
    pins), so a group reader resolved before a refresh stays
    readable through it. Delta Lake's multi-table story needs an
    external coordinator even in production — this manifest file IS
    that coordinator for the engine's warehouse."""

    MANIFEST = "_GROUP"

    def __init__(self, root: str | Path, names: Sequence[str],
                 partition_cols: dict[str, Sequence[str]] | None = None) -> None:
        if not names:
            raise ValueError("TableGroup requires at least one member")
        self.root = _norm_root(root)
        self.names = tuple(names)
        pc = partition_cols or {}
        self.tables = {
            n: ParquetTable(self.root / n, pc.get(n, ())) for n in self.names
        }
        self._manifest_override: Path | None = None

    @classmethod
    def wrap(cls, tables: dict[str, "ParquetTable"],
             manifest_path: str | Path) -> "TableGroup":
        """Build a group over ALREADY-PLACED member tables (any
        roots, not the ``root/name`` layout) with an explicit
        manifest file. This is how the curation loop's ``_CURATED``
        co-manifest rides the group machinery: its corpus table
        lives AT the store root and its manifest name predates the
        group type, but the commit/read/retention semantics are the
        same pointer-set transaction."""
        if not tables:
            raise ValueError("TableGroup requires at least one member")
        g = cls.__new__(cls)
        g.root = _norm_root(manifest_path).parent
        g.names = tuple(tables)
        g.tables = dict(tables)
        g._manifest_override = _norm_root(manifest_path)
        return g

    def _fs(self):
        from . import fs as FS

        return FS.fs_for(self.root)

    def _manifest_path(self) -> Path:
        if self._manifest_override is not None:
            return self._manifest_override
        return self.root / self.MANIFEST

    def manifest(self) -> dict | None:
        """The committed group manifest (or None before the first
        commit): ``{"tables": {name: snapshot}, "prev": {...}|None,
        "extras": {...}}``."""
        import json

        from . import fs as FS

        raw = FS.read_pointer(self._fs(), self._manifest_path())
        if raw is None:
            return None
        return json.loads(raw)

    def exists(self) -> bool:
        return self.manifest() is not None

    def commit(self, dfs: dict[str, DataFrame],
               extras: dict | None = None) -> dict:
        """Atomically publish a new consistent version of the WHOLE
        group. ``dfs`` must cover every member (partial updates
        would silently decouple the members the group exists to
        couple — re-commit an unchanged member's DataFrame
        explicitly). ``extras`` is caller metadata recorded in the
        manifest (e.g. a run window or an index epoch). Holds the
        group writer lock across all member writes and the manifest
        replace; each member write additionally holds its own table
        lock (nested, same process — the group lock serializes
        GROUP writers, the table lock serializes against standalone
        single-table writers). Returns the committed manifest."""
        import json

        missing = set(self.names) - set(dfs)
        extra = set(dfs) - set(self.names)
        if missing or extra:
            raise ValueError(
                f"TableGroup.commit must cover exactly the members: "
                f"missing={sorted(missing)}, unknown={sorted(extra)}"
            )
        # the overlap below relies on member writes taking DISTINCT
        # writer locks (round-13 advisor: TableGroup.wrap accepts
        # caller-placed tables, and two members sharing a root would
        # nondeterministically fail fast on lock contention where the
        # old sequential commit succeeded) — check the invariant
        # instead of assuming it
        roots = [str(t.root) for t in self.tables.values()]
        if len(set(roots)) != len(roots):
            raise ValueError(
                "TableGroup.commit: member tables must have distinct "
                f"roots (got {sorted(roots)}) — concurrent member "
                "writes take per-root writer locks"
            )
        fs = self._fs()
        fs.mkdirs(self.root)
        with _writer_lock(self.root) as lk:
            prev = self.manifest()
            # member snapshots are independent until the manifest
            # flip — overlapped driver threads (see _overlap_writes)
            snaps = _overlap_writes(*[
                (lambda n=name: self.tables[n].write(dfs[n]))
                for name in self.names
            ])
            assignment = {
                name: snap.name
                for name, snap in zip(self.names, snaps)
            }
            man = {
                "tables": assignment,
                "prev": prev["tables"] if prev else None,
                "extras": extras or {},
            }
            from . import fs as FS

            # fencing: evicted writers must not flip — checked at the
            # narrowest point, inside the pointer commit itself
            FS.commit_pointer(
                fs, self._manifest_path(), json.dumps(man, sort_keys=True),
                fence=lk.check,
            )
            return man

    def commit_pointers(self, assignment: dict[str, str],
                        extras: dict | None = None) -> dict:
        """Atomically advance the group manifest to ALREADY-WRITTEN
        member snapshots. :meth:`commit` owns the member writes; this
        variant is for flows where member commits interleave with
        non-table work that must land BEFORE the group flips — the
        curation loop commits the corpus snapshot, then appends the
        near-dup index, and only then publishes the (corpus, index)
        pair, so a crash between the two leaves the group at the
        previous consistent assignment. Each named snapshot must
        exist (a typo here would publish an unreadable group);
        ``extras`` carries the non-table pointers (e.g. the index
        epoch). Holds the group writer lock across the
        read-prev+flip so concurrent pointer commits serialize."""
        missing = set(self.names) - set(assignment)
        extra = set(assignment) - set(self.names)
        if missing or extra:
            raise ValueError(
                f"TableGroup.commit_pointers must cover exactly the members: "
                f"missing={sorted(missing)}, unknown={sorted(extra)}"
            )
        import json

        fs = self._fs()
        for name, snap in assignment.items():
            if not fs.exists(self.tables[name].root / snap):
                raise FileNotFoundError(
                    f"group member {name!r} has no snapshot {snap!r}"
                )
        fs.mkdirs(self.root)
        with _writer_lock(self.root) as lk:
            prev = self.manifest()
            man = {
                "tables": dict(assignment),
                # a pre-group manifest (legacy _CURATED shape) has no
                # "tables" key — treat it as no group history
                "prev": prev.get("tables") if prev else None,
                "extras": extras or {},
            }
            from . import fs as FS

            # fencing: evicted writers must not flip — checked at the
            # narrowest point, inside the pointer commit itself
            FS.commit_pointer(
                fs, self._manifest_path(), json.dumps(man, sort_keys=True),
                fence=lk.check,
            )
            return man

    def read(self, spark: SparkSession) -> dict[str, DataFrame]:
        """Resolve the manifest ONCE and return every member pinned
        to its recorded snapshot — the mutually-consistent read. A
        concurrent commit cannot skew the result: it writes new
        snapshots (invisible here) and flips the manifest only after
        all of them land, and :meth:`vacuum` never drops a snapshot
        the live or previous manifest records."""
        man = self.manifest()
        if man is None:
            raise FileNotFoundError(f"table group has no commit: {self.root}")
        return {
            name: self.tables[name].read_snapshot(spark, snap)
            for name, snap in man["tables"].items()
        }

    def vacuum(self, keep: int = 2) -> list[Path]:
        """Per-member vacuum protecting the live and previous
        manifest assignments (and each member's own pins)."""
        man = self.manifest() or {"tables": {}, "prev": None}
        removed: list[Path] = []
        for name in self.names:
            protect = []
            if name in man["tables"]:
                protect.append(man["tables"][name])
            if man.get("prev") and name in man["prev"]:
                protect.append(man["prev"][name])
            removed.extend(self.tables[name].vacuum(keep, pinned=protect))
        return removed


def _finish_retirements(fs, p) -> None:
    """Crash recovery for :func:`compact_append_dir` (round-12
    advisor, sinks.py:1233): replay any ``_RETIRE-*.json`` manifest
    left by a compactor that died between promoting its compacted
    parts and deleting the folded inputs. The manifest records the
    full intent (staging dir, part→final promote pairs, input files
    to retire) and every step is idempotent — finish the promotes
    that didn't happen (a final that already exists means that
    promote landed), delete the inputs, drop the manifest. Without
    this, crash residue left BOTH file sets visible and the next
    fold made the duplicates permanent. Orphan ``.compact-*``
    staging dirs with no manifest (crash before intent was recorded)
    are plain garbage — their inputs were never retired — and are
    swept."""
    import json

    manifests = sorted(
        name
        for (name, is_dir, _) in fs.list(p)
        if not is_dir and name.startswith("_RETIRE-") and name.endswith(".json")
    )
    from . import fs as FS

    claimed_tmp: set[str] = set()
    for mname in manifests:
        intent = json.loads(fs.read_text(p / mname))
        tmp = p / intent["tmp"]
        claimed_tmp.add(intent["tmp"])
        for part, final in intent["promote"]:
            if not fs.exists(p / final) and fs.exists(tmp / part):
                fs.rename(tmp / part, p / final)
        fs.delete(tmp)
        for target in intent["retire"]:
            FS.fs_for(target).delete(target, recursive=False)
        fs.delete(p / mname, recursive=False)
    for (name, is_dir, _) in fs.list(p):
        if is_dir and name.startswith(".compact-") and name not in claimed_tmp:
            fs.delete(p / name)


def compact_append_dir(spark: SparkSession, path: str, read_fn,
                       ts_col: str, retain_days: float | None = None,
                       target_files: int = 1) -> dict:
    """Fold an append-only parquet dir (one tiny file per append —
    the RunLog/MetricsLog discipline) into ``target_files`` files,
    optionally dropping rows whose ``ts_col`` is older than
    ``retain_days``. The compact lock serializes concurrent COMPACTS
    (only) — appenders need no lock at all: the fold deletes exactly
    the files the DataFrame actually read (``df.inputFiles()`` — the
    scan's pinned file set), so a file appended mid-fold is neither
    folded nor deleted — no permanent duplicates, no loss. Readers
    racing the fold either see the old files, or the compacted file
    plus not-yet-deleted old files — transient duplicates the log
    consumers are idempotent to — never a torn read (callers'
    ``read`` uses ignoreMissingFiles).

    CRASH SAFETY (round-12 advisor, sinks.py:1233): before the first
    promote, the full intent — staging dir, part→final names, the
    pinned input files to retire — is written atomically as a
    ``_RETIRE-*.json`` manifest (underscore-prefixed: invisible to
    Spark listings). A compactor dying anywhere after that point
    leaves a manifest the NEXT compact replays to completion under
    the same lock (:func:`_finish_retirements`), so crash residue is
    transient, never a permanent duplicate. A crash BEFORE the
    manifest leaves only an invisible orphan staging dir, also swept.

    Returns {files_before, files_after, rows_dropped};
    ``rows_dropped`` is exact for the pinned input set (rows pinned
    minus rows kept), unaffected by concurrent appends."""
    import datetime as _dt
    import json
    from urllib.parse import unquote, urlparse

    from pyspark.sql import functions as F

    from . import fs as FS

    p = _norm_root(path)
    fs = FS.fs_for(p)
    with _writer_lock(p.parent / f"._{p.name}_compact_lock"):
        if not fs.exists(p):  # never appended to: nothing to fold
            return {"files_before": 0, "files_after": 0, "rows_dropped": 0}
        _finish_retirements(fs, p)  # replay a dead compactor's intent
        df = read_fn(spark)
        # the EXACT file set this scan pinned at planning — only
        # these are retired below
        old = [f for f in df.inputFiles() if f.endswith(".parquet")]
        before_rows = df.count()
        if retain_days is not None:
            cutoff = _dt.datetime.now() - _dt.timedelta(days=retain_days)
            df = df.filter(F.col(ts_col) >= F.lit(cutoff))
        # stage into a dot-dir (invisible to Spark listings), record
        # the retirement intent, promote the parts (unique final
        # names, never referenced until they appear in a listing —
        # object-store safe), retire the old
        tmp_name = f".compact-{uuid.uuid4().hex[:8]}"
        tmp = p / tmp_name
        df.coalesce(max(1, target_files)).write.parquet(str(tmp))
        parts = sorted(
            name
            for (name, is_dir, _) in fs.list(tmp)
            if not is_dir and name.endswith(".parquet")
        )
        promote = [
            (part, f"compacted-{uuid.uuid4().hex[:12]}.parquet")
            for part in parts
        ]
        retire = []
        for furi in old:
            # inputFiles returns URIs; file: ones unwrap to the local
            # path (matching the store root's dispatch), others stay
            # URIs for HadoopFS
            parsed = urlparse(furi)
            retire.append(
                unquote(parsed.path) if parsed.scheme == "file" else furi
            )
        # exact kept-row count for the pinned set, measured on the
        # staged (not-yet-promoted) parts — immune to appends landing
        # mid-fold (the old post-fold recount could go negative)
        kept_rows = (
            spark.read.parquet(str(tmp)).count() if parts else 0
        )
        manifest = p / f"_RETIRE-{uuid.uuid4().hex[:8]}.json"
        fs.write_text_atomic(
            manifest,
            json.dumps(
                {"tmp": tmp_name, "promote": promote, "retire": retire}
            ),
        )
        for part, final in promote:
            fs.rename(tmp / part, p / final)
        fs.delete(tmp)
        for target in retire:
            FS.fs_for(target).delete(target, recursive=False)
        fs.delete(manifest, recursive=False)
        return {
            "files_before": len(old),
            "files_after": len(promote),
            "rows_dropped": before_rows - kept_rows,
        }


def write_landing(df: DataFrame, path: str, partition_cols: Sequence[str] = ()) -> None:
    """L1: landing-zone write — the reference's CSV-batch-to-MinIO spill
    (``bccp_to_ods.py:245-255``) becomes a straight Parquet append (no
    CSV detour; columnar from the first hop)."""
    writer = df.write.mode("append")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def overwrite_staging(df: DataFrame, table: ParquetTable) -> None:
    """L2/L3: TRUNCATE + load staging (``bccp_to_ods.py:298-356``) — a
    full snapshot replace."""
    table.write(df)


def overwrite_partitions(df: DataFrame, path: str, partition_cols: Sequence[str]) -> None:
    """M7 physical path for non-snapshot landings: dynamic partition
    overwrite — only the day-partitions present in ``df`` rewrite
    (requires ``spark.sql.sources.partitionOverwriteMode=dynamic``,
    set in ``session.ENGINE_CONF``)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def coerce_for_export(df: DataFrame, column_types: dict[str, str]) -> DataFrame:
    """L4 pre-export coercions, JVM-side (``ods_to_llb.py:168-186``):
    the reference lower-cases column names and per declared dtype
    runs pandas coercions row-by-row on the driver — int columns
    ``to_numeric(errors='coerce').fillna(0)`` (the int-coerce-to-0
    quirk at :178), float columns ``to_numeric(errors='coerce')``
    (NaN→NULL), string columns NUL-byte-stripped. Re-expressed as
    ``try_cast`` / ``regexp_replace`` column expressions these run
    in whole-stage codegen on the executors — no driver round-trip,
    no pandas, same results."""
    from pyspark.sql import functions as F

    out = []
    for c in df.columns:
        lc = c.lower()
        dtype = (column_types.get(lc) or column_types.get(c) or "").lower()
        if dtype in ("int", "int64", "bigint"):
            col = F.coalesce(F.expr(f"try_cast(`{c}` as bigint)"), F.lit(0))
        elif dtype in ("float", "float64"):
            col = F.expr(f"try_cast(`{c}` as double)")
        elif dtype in ("str", "string"):
            col = F.regexp_replace(F.col(c).cast("string"), "\u0000", "")
        else:
            col = F.col(c)
        out.append(col.alias(lc))
    return df.select(*out)


def jdbc_export_writer(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    batchsize: int = 50000,
    properties: dict[str, str] | None = None,
):
    """L4: reverse export ODS→external warehouse (``ods_to_llb.py:
    168-198``: truncate MSSQL target + chunked insert_rows). Returns
    the configured writer (unstarted — tests inspect, jobs call
    ``.save()``). ``batchsize`` is the JDBC twin of the reference's
    ``commit_every`` chunk size; executors stream their partitions in
    batches — rows never funnel through the driver."""
    writer = (
        df.write.format("jdbc")
        .mode(mode)
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .option("truncate", "true")  # reference truncates, not drops
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    return writer


def export_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    column_types: dict[str, str] | None = None,
    mode: str = "overwrite",
    batchsize: int = 50000,
    properties: dict[str, str] | None = None,
) -> None:
    """Execute the L4 reverse export end-to-end: declared-dtype
    coercions (:func:`coerce_for_export`) then the truncate-target
    JDBC write. Proven against embedded Derby (on Spark's own
    classpath) in ``tests/test_jdbc_export.py`` — truncate+overwrite
    keeps the target schema, append accumulates, both read back
    exactly."""
    if column_types:
        df = coerce_for_export(df, column_types)
    jdbc_export_writer(df, url, table, mode=mode, batchsize=batchsize,
                       properties=properties).save()


#: session-local registration cache: (applicationId, table name) →
#: the snapshot-dir name this session's catalog entry points at. Lets
#: BucketedTable._refresh verify freshness with ONE pointer read on
#: the common path instead of a catalog DESCRIBE per read(). Keyed by
#: ``sparkContext.applicationId`` (unique per context — carries the
#: context start time), NOT ``id(sparkContext)``: CPython reuses ids
#: after GC, so a stop/recreate-session pattern could false-hit a
#: dead context's entry (round-12 judge watch item).
_BT_REG_CACHE: dict[tuple, str | None] = {}

#: serializes BucketedTable._refresh's DROP+CREATE re-registration:
#: two threads of one session hitting the same stale entry could
#: otherwise interleave the catalog commands (one CREATE fails with
#: TableAlreadyExists) — round-12 advisor, low. One process-wide lock
#: is enough: re-registrations only happen when a pointer actually
#: moved, which is rare on the read path.
_BT_REFRESH_MU = threading.Lock()


def _bt_cache_key(spark: SparkSession, name: str) -> tuple:
    return (spark.sparkContext.applicationId, name.lower())


class BucketedTable:
    """Catalog-registered Parquet table, hash-bucketed on the merge key.

    The layout for merge-heavy ODS facts: every incremental run joins
    a small staging slice against the full target on the same key
    (M1-M9, ``dags/sql/**/update_des_table/*.sql`` — always ``ON`` the
    declared merge key). With the fact bucketed (+ sorted) by that key,
    the target side of the merge join carries **no Exchange and no
    Sort** — only the staging slice shuffles, into ``num_buckets``
    partitions. At 100 TB that converts the nightly merge from
    "re-shuffle the fact every run" to "stream the fact buckets once";
    the same layout makes groupBy-on-key exchange-free.

    Unlike :class:`ParquetTable` this lives in the session catalog
    (``saveAsTable``) because Spark's bucketing metadata only exists
    there — the bucket spec rides on the catalog entry, which
    :meth:`write` re-creates over each committed snapshot.

    STORAGE PROTOCOL (round-12 verdict task 1 — pointer indirection,
    the same commit primitive every other store here uses): the
    warehouse dir ``wh/{name}`` is a ROOT holding a ``_CURRENT``
    pointer (:func:`..fs.commit_pointer` — legacy single-file flip on
    rename-atomic stores, log-dir conditional-put CAS on object
    stores) plus immutable snapshot dirs ``snap-<seq>-<uuid>``. A
    write lands the new bucketed snapshot DIRECTLY into a fresh
    never-referenced snapshot dir, flips the pointer, and re-registers
    the catalog entry over it — **no live directory is ever renamed or
    swapped**, so mutable bucketed tables work on any store, object
    stores included (this retired the round-10/11
    ``AtomicRenameRequiredError`` refusal). The previous snapshot is
    retained until the NEXT write commits (reader grace, mirroring
    ParquetTable's keep-previous vacuum default); crash residue —
    a partial snapshot dir from a dead writer — is unreferenced by
    construction and cleared by the next writer under the lock.

    Pre-round-12 tables (bucket files directly under the root, the
    tombstone-swap era layout) stay readable: :meth:`attach` falls
    back to the legacy layout when no pointer exists, and the first
    :meth:`write` migrates — it stages the new snapshot in a
    dot-prefixed dir (invisible to a legacy reader listing the root),
    renames it into place, commits the pointer, and retires the
    legacy root files.
    """

    def __init__(self, name: str, keys: Sequence[str], num_buckets: int = 32) -> None:
        if not keys:
            raise ValueError("BucketedTable requires at least one bucket key")
        self.name = name
        self.keys = tuple(keys)
        self.num_buckets = num_buckets

    def exists(self, spark: SparkSession) -> bool:
        return spark.catalog.tableExists(self.name)

    def _dirs(self, spark: SparkSession) -> tuple[Path, Path, Path]:
        """(live, tombstone, side) data directories in the warehouse."""
        wh = _warehouse_path(spark)
        base = self.name.lower()
        return wh / base, wh / f"{base}__tomb", wh / f"{base}__snap"

    def _repair(self, spark: SparkSession) -> None:
        """Crash repair for the LEGACY tombstone swap (round-4
        advisor, sinks.py:495): if a pre-round-12 writer died between
        demoting the live dir to its tombstone and promoting the new
        snapshot, the live dir is missing but the tombstone holds the
        complete previous table — rename it back so the table
        resolves again. The pointer protocol that replaced the swap
        never strands a table (the root dir is not touched by a
        commit), so this only fires on tombstone-era residue. The
        side (un-promoted) snapshot is NEVER auto-promoted: it may
        belong to a fenced-off loser whose commit must not
        resurrect."""
        from . import fs as FS

        live, tomb, _ = self._dirs(spark)
        fs = FS.fs_for(live)
        if not fs.exists(live) and fs.exists(tomb):
            fs.rename(tomb, live)

    def _current(self, fs, live) -> str | None:
        """The committed snapshot-dir name, or None (legacy layout or
        never written)."""
        from . import fs as FS

        return FS.read_pointer(fs, live / "_CURRENT")

    def _sweep_unpointed_snapshots(self, spark, fs, live) -> None:
        """Clear VISIBLE ``snap-*`` dirs when no ``_CURRENT`` pointer
        exists (round-12 advisor, medium): a commit flips the pointer
        before any snapshot becomes authoritative, so with cur=None a
        visible snapshot can only be (a) a crashed MIGRATION's
        renamed-but-uncommitted snapshot — reader-visible torn state,
        because legacy catalog entries and :meth:`attach` resolve the
        ROOT and recursively list legacy+snapshot parquet together —
        or (b) a dead first writer's partial. Both must go; deleting
        restores all-old semantics after a crashed migration. Runs
        under the writer lock and re-checks the pointer inside it, so
        a LIVE migrating writer (which holds the lock between its
        rename and its pointer commit) can never lose its snapshot;
        :meth:`write` does the same sweep inline while already
        holding the lock."""
        snaps = [
            nm
            for (nm, is_dir, _) in fs.list(live)
            if is_dir and nm.startswith("snap-")
        ]
        if not snaps:
            return
        with _writer_lock(
            _warehouse_path(spark) / f"{self.name.lower()}__lock"
        ):
            if self._current(fs, live) is not None:
                return  # a racing writer just committed — not residue
            for (nm, is_dir, _) in fs.list(live):
                if is_dir and nm.startswith("snap-"):
                    fs.delete(live / nm)

    def attach(self, spark: SparkSession) -> bool:
        """Ensure this table is catalog-registered, re-attaching a
        surviving data directory if the catalog forgot it.

        The default session catalog is in-memory: it dies with the
        session while the warehouse directory (and the bucket-id
        file naming Spark reads bucketing from) survives. Without
        re-attachment every nightly driver restart would believe
        persisted state (e.g. the incremental dedup indexes) is gone
        and rebuild from scratch — the exact cost the state exists
        to avoid. Re-registration is one CREATE TABLE with the
        declared bucket spec over the existing LOCATION (schema read
        from the parquet footers); the entry is external, which
        composes with :meth:`write`'s swap (DROP leaves data, the
        stale-location cleanup removes it). A Hive metastore or
        Delta removes the need — this is the in-memory-catalog
        bridge. Returns True if the table is registered (already or
        now), False if no surviving data exists."""
        if self.exists(spark):
            self._refresh(spark)  # follow cross-session commits
            return True
        self._repair(spark)  # promote a crash-orphaned tombstone first
        from . import fs as FS

        root = _warehouse_path(spark) / self.name.lower()
        fs = FS.fs_for(root)
        # pointer layout first (round 12); legacy flat layout second
        cur = self._current(fs, root)
        if cur is None:
            # no pointer → about to resolve path=root and recursively
            # list it; clear crashed-migration residue first or the
            # read would union legacy + uncommitted-snapshot rows
            # (round-12 advisor, medium)
            self._sweep_unpointed_snapshots(spark, fs, root)
            cur = self._current(fs, root)  # a racer may have committed
        path = root / cur if cur is not None else root
        if not any(
            n.endswith(".parquet") for (n, d, _) in fs.list(path) if not d
        ):
            return False
        # Registering the DECLARED spec over files laid out under a
        # DIFFERENT spec would make Spark trust wrong bucketing
        # metadata — scans prune/elide exchanges by it, so a
        # num_buckets or key drift silently loses join matches. The
        # write path drops a _BUCKET_SPEC sidecar inside the snapshot
        # (legacy: the root); refuse on mismatch (rebuild is the
        # correct response).
        spec = path / "_BUCKET_SPEC"
        if fs.exists(spec):
            import json

            want = {"keys": list(self.keys), "num_buckets": self.num_buckets}
            got = json.loads(fs.read_text(spec))
            if got != want:
                raise ValueError(
                    f"bucket-spec mismatch attaching {self.name}: "
                    f"on disk {got}, declared {want}"
                )
        self._register(spark, path, spark.read.parquet(str(path)).schema)
        return True

    def _register(self, spark: SparkSession, path: Path, schema) -> None:
        """Register this table as EXTERNAL over ``path`` with the
        declared bucket spec — shared by :meth:`attach` (surviving
        data, fresh catalog) and :meth:`write` (post-swap
        re-registration). External means catalog DROPs never delete
        data: all data motion in the swap is explicit dir renames."""
        cols = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
        )
        keys = ", ".join(self.keys)
        spark.sql(
            f"CREATE TABLE {self.name} ({cols}) USING parquet "
            f"CLUSTERED BY ({keys}) SORTED BY ({keys}) "
            f"INTO {self.num_buckets} BUCKETS "
            f"LOCATION '{_loc(path)}'"
        )
        nm = str(path.name)
        _BT_REG_CACHE[_bt_cache_key(spark, self.name)] = (
            nm if nm.startswith("snap-") else None
        )

    def _refresh(self, spark: SparkSession) -> None:
        """Re-point a STALE same-session catalog entry at the
        committed snapshot (round-12 self-review, finding 1): the
        catalog entry is re-created by the WRITER's session at commit
        time, so another session that registered earlier still points
        at a previous snapshot — it would read stale data for one
        grace generation and fail once the sweep retires the dir.
        Cost on the common path: ONE pointer read (no Spark job, no
        catalog command) — the session-local registration cache
        remembers which snapshot this session's entry points at, so
        the catalog-command DESCRIBE runs only on a cache miss and a
        re-register only when the pointer actually moved. Write-once
        tables (the LSM index members) always cache-hit. Legacy flat
        layouts (no pointer) have a stable root location and need no
        refresh."""
        if not self.exists(spark):
            return
        from . import fs as FS

        live, _, _ = self._dirs(spark)
        fs = FS.fs_for(live)
        cur = self._current(fs, live)
        if cur is None:
            # legacy flat layout (stable root location, no refresh) —
            # but first clear any reader-visible residue a crashed
            # MIGRATION left next to the legacy files (round-12
            # advisor, medium): a renamed-but-uncommitted snapshot
            # would double every row this entry serves.
            self._sweep_unpointed_snapshots(spark, fs, live)
            return
        key = _bt_cache_key(spark, self.name)
        if _BT_REG_CACHE.get(key) == cur:
            return
        with _BT_REFRESH_MU:
            # re-check under the mutex: another thread of this
            # session may have just re-registered the same target
            # (round-12 advisor: unguarded DROP+CREATE interleaving)
            if _BT_REG_CACHE.get(key) == cur:
                return
            rows = (
                spark.sql(f"DESCRIBE FORMATTED {self.name}")
                .where("col_name = 'Location'")
                .collect()
            )
            registered = str(rows[0][1]).rstrip("/") if rows else ""
            if registered.endswith(cur):
                _BT_REG_CACHE[key] = cur
                return
            path = live / cur
            spark.sql(f"DROP TABLE IF EXISTS {self.name}")
            self._register(spark, path, spark.read.parquet(str(path)).schema)
            _BT_REG_CACHE[key] = cur

    def read(self, spark: SparkSession) -> DataFrame:
        self._refresh(spark)  # follow cross-session commits
        return spark.table(self.name)

    def write(self, df: DataFrame) -> None:
        """Bucketed snapshot write + pointer commit (round-12 verdict
        task 1 — the tombstone dir-swap is retired).

        Pre-repartitions on the bucket keys so each task holds exactly
        one bucket's rows → one file per bucket, not
        ``tasks × buckets`` shards (the classic bucketed-write
        small-file trap). A merge result is usually already hash-
        partitioned on the key from its own shuffle, so this
        repartition reuses the existing exchange.

        Round 14 NOTE (tried, measured, reverted): a key-only
        AQE-coalescible repartition (no pinned count) was trialled so
        KB-sized delta segments would write from one task instead of
        ``num_buckets`` mostly-empty ones — but AQE's 64 MB advisory
        coalesced MB-scale members to ONE task too, serializing the
        bucketed write's per-task sort + parquet encode: alternating
        same-window A/B on the write-heavy rebuild path measured it
        ~10% SLOWER (4.43/4.16 s vs 3.97/3.75 s medians) and a wash
        on small members. The pinned ``num_buckets`` fan-out stays;
        at production scale ``num_buckets`` is the spec-level knob
        that sizes both probe locality and write parallelism.

        The snapshot lands as an external SIDE table (Spark refuses to
        overwrite a table its own plan reads — UNSUPPORTED_OVERWRITE —
        and a merge result always reads its target) written DIRECTLY
        into a fresh never-referenced ``snap-<seq>-<uuid>`` dir under
        the table root, then commits by flipping the root's
        ``_CURRENT`` pointer (:func:`..fs.commit_pointer` — atomic
        single-file flip or object-store log CAS) and re-registering
        the catalog entry over the new snapshot. No rename touches a
        live directory at any point, so the protocol is object-store
        safe end-to-end; a crash leaves either the old pointer intact
        (partial snapshot dir = invisible residue, cleared by the next
        writer's post-commit sweep) or the new commit complete. The
        sweep that retires old snapshots runs AFTER the pointer
        commit and retains the new commit's immediate predecessor, so
        (a) an input DataFrame scanning the previous snapshot (a
        cross-session writer whose catalog lags one commit) survives
        its own write, and (b) readers pinned to the previous
        snapshot get one full write cycle of grace; read()/attach()
        additionally follow the pointer (``_refresh``) so a lagging
        session never serves stale data. The catalog
        entry is re-created after the commit (brief same-session
        catalog-resolution window, documented; data is never at risk
        since all entries are external). The fencing check runs before
        the pointer commit so an evicted writer aborts without
        publishing.

        LEGACY MIGRATION: a pre-round-12 table (bucket files directly
        under the root, no pointer) is migrated by this write — the
        snapshot stages in a dot-prefixed dir (invisible to a legacy
        reader listing the root) and renames into its final snapshot
        name before the pointer commit; the legacy root files retire
        after the catalog re-registration. Legacy layouts only exist
        on rename-atomic stores (object-store writes refused before
        round 12), so the one staging rename is atomic where it can
        ever run."""
        spark = df.sparkSession
        side = f"{self.name}__snap"
        live, tomb, side_dir = self._dirs(spark)
        # same writer mutex as ParquetTable, keyed in the warehouse
        # dir: serializes cross-session writers racing on the same
        # snapshot-produce + pointer commit
        with _writer_lock(
            _warehouse_path(spark) / f"{self.name.lower()}__lock"
        ) as lk:
            import json

            from . import fs as FS

            fs = FS.fs_for(live)
            self._repair(spark)  # finish a tombstone-era crashed swap
            cur = self._current(fs, live)
            legacy_files = [
                nm
                for (nm, is_dir, _) in fs.list(live)
                if not is_dir
                and (
                    nm.endswith(".parquet")
                    or nm in ("_BUCKET_SPEC", "_SUCCESS")
                )
            ]
            # pre-produce sweep: ONLY invisible residue (dot-staged
            # dirs from dead writers, tombstone-era side/tomb dirs).
            # Visible snapshot dirs are NOT touched here — the
            # caller's input DataFrame may legitimately scan the
            # PREVIOUS snapshot (a cross-session writer whose catalog
            # lags one commit), and deleting it before the produce
            # would fail that scan mid-write (round-12 self-review,
            # finding 1). The snapshot sweep runs AFTER the pointer
            # commit below, when the produce no longer reads anything.
            spark.sql(f"DROP TABLE IF EXISTS {side}")
            for (nm, is_dir, _) in fs.list(live):
                if is_dir and nm.startswith(".stage-"):
                    fs.delete(live / nm)
                elif is_dir and nm.startswith("snap-") and cur is None:
                    # no pointer → this visible snapshot is a crashed
                    # migration's uncommitted rename (reader-visible
                    # torn state next to the legacy files) or a dead
                    # first writer's partial — residue either way; we
                    # hold the writer lock, so no live producer owns
                    # it (round-12 advisor, medium)
                    fs.delete(live / nm)
            fs.delete(side_dir)
            fs.delete(tomb)
            seq = int(cur.split("-")[1]) + 1 if cur is not None else 1
            new = f"snap-{seq:08d}-{uuid.uuid4().hex[:12]}"
            migrating = cur is None and bool(legacy_files)
            # during a legacy migration the root IS a live data dir —
            # stage dot-prefixed (invisible to Spark listings) and
            # rename once; otherwise write straight into the final
            # never-referenced snapshot dir (zero renames)
            target_dir = live / (f".stage-{new}" if migrating else new)
            (
                df.repartition(self.num_buckets, *[df[k] for k in self.keys])
                .write.format("parquet")
                .bucketBy(self.num_buckets, self.keys[0], *self.keys[1:])
                .sortBy(self.keys[0], *self.keys[1:])
                .option("path", _loc(target_dir))
                .saveAsTable(side)
            )
            # bucket-spec sidecar rides INSIDE the snapshot from birth
            # (underscore prefix → invisible to Spark's file listing,
            # like _SUCCESS), so a committed dir always validates
            fs.write_text_atomic(
                FS.join(target_dir, "_BUCKET_SPEC"),
                json.dumps(
                    {"keys": list(self.keys), "num_buckets": self.num_buckets}
                ),
            )
            if migrating and not fs.rename(target_dir, live / new):
                raise ConcurrentWriteError(
                    f"bucketed migration: promoting {target_dir} to "
                    f"{live / new} failed (a concurrent writer slipped "
                    "past the lock?) — write aborted, legacy table "
                    "untouched"
                )
            lk.check()  # fencing: abort (not commit) if evicted mid-write
            FS.commit_pointer(fs, live / "_CURRENT", new, fence=lk.check)
            spark.sql(f"DROP TABLE IF EXISTS {side}")
            spark.sql(f"DROP TABLE IF EXISTS {self.name}")
            self._register(spark, live / new, df.schema)
            # POST-commit sweep (the produce no longer reads anything):
            # retire every snapshot dir that is neither the new commit
            # nor its immediate predecessor — dead writers' partials
            # and epochs older than the one-generation reader grace —
            # plus migrated legacy root files (a crash mid-sweep leaves
            # harmless residue the next write's sweep clears; the
            # catalog never resolves it again).
            for (nm, is_dir, _) in fs.list(live):
                if (
                    is_dir
                    and nm.startswith("snap-")
                    and nm not in (new, cur)
                ):
                    fs.delete(live / nm)
            for nm in legacy_files:
                fs.delete(live / nm, recursive=False)
