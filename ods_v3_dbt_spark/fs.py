"""Filesystem adapter for the engine's commit machinery (round-5
verdict task 7).

The snapshot/lock/epoch protocols in :mod:`.sinks`,
:mod:`.operators.neardup_index`, and :mod:`.pipelines` need exactly
six primitives: existence probe, whole-file read, atomic pointer
replace, non-clobbering rename, exclusive create, and delete (plus
mtime get/touch for the lock heartbeat). They were pathlib-only —
correct on local disk and any POSIX mount, silently wrong on an
object store. This module narrows that to ONE seam:

* :class:`LocalFS` — the os/pathlib implementation, byte-identical
  to the previous inline code (every existing epoch/lock/snapshot
  test now runs through it);
* :class:`HadoopFS` — the same surface over
  ``org.apache.hadoop.fs.FileSystem`` reached through the running
  Spark JVM, so the engine talks to ANY Hadoop-supported store
  (hdfs://, s3a://, gs://, abfs://, file://) without new Python
  dependencies. Proven in tests against ``file://`` through the
  real Hadoop stack (the only scheme this container can host).

``fs_for(path, spark=None)`` dispatches on the scheme: URIs with a
``://`` go to HadoopFS (requires the active session's JVM), bare
paths go to LocalFS.

SEMANTICS CONTRACT (both implementations):

* ``rename(src, dst)`` NEVER clobbers: returns False if ``dst``
  exists (HDFS's native rename contract; LocalFS emulates it with a
  hardlink+unlink for files, which is also atomic);
* ``replace(src, dst)`` atomically clobbers (``os.replace`` /
  FileContext rename-OVERWRITE) — the pointer-flip primitive;
* ``create_exclusive`` is the lock-acquire primitive: atomic
  create-if-absent (O_CREAT|O_EXCL / HDFS create(overwrite=false)).

OBJECT-STORE SEMANTICS (round-10 verdict task 1 — the commit
protocol no longer ASSUMES atomic rename anywhere):

* Every FS advertises ``supports_atomic_rename()``. LocalFS and the
  rename-atomic Hadoop schemes (hdfs, file, viewfs, abfs/abfss,
  ofs/o3fs) answer True; object-store schemes (s3/s3a/s3n, gs, oss,
  cos, swift, wasb/wasbs) and UNKNOWN schemes answer False — the
  conservative default, since a wrong True silently tears commits
  while a wrong False merely switches to the log protocol below.
* ``write_text_atomic`` stays atomic EVERYWHERE by changing its
  implementation, not its contract: on rename-atomic stores it is
  tmp-in-dir + atomic replace (POSIX needs the dance); on object
  stores it is ONE direct ``create(overwrite=true)`` whole-object
  PUT — visible only at close(), which on S3A/GCS *is* the atomic
  primitive, and the tmp+rename dance would be the broken path.
* Clobbering pointer flips are gone from the commit protocol:
  :func:`commit_pointer` / :func:`read_pointer` keep the legacy
  single-file pointer on rename-atomic stores (unchanged on-disk
  format) and switch to a **log-dir commit** on object stores —
  entries ``<ptr>.d/<seq 020d>.ptr`` created with the atomic
  ``create_exclusive`` conditional-put, readers resolve max(seq).
  A seq collision means two writers believed they held the mutex:
  it raises :class:`PointerCommitConflict` LOUDLY instead of
  last-writer-wins. Old entries beyond a retention window are
  pruned; readers re-list on a raced delete.
* ``create_exclusive`` is REQUIRED atomic on every implementation.
  On S3 that is the conditional write (PUT + If-None-Match,
  Hadoop 3.4.1+ S3A); on GCS generation-match; on Azure ETag.
  Connectors predating conditional create degrade to
  check-then-act — the same residual any lockfile has — which is
  why the pointer COMMIT no longer depends on the lock alone.
* Multi-file directory renames remain copy+delete on object
  stores. The snapshot stores only ever rename INTO unique
  uuid-named immutable destinations before the pointer commit
  (crash residue is invisible and GC'd), so no reader can observe
  a torn directory. Since round 12 NO engine protocol swaps a live
  directory in place: BucketedTable — the last holdout — writes
  each bucketed snapshot into a fresh epoch dir under its root and
  flips a ``_CURRENT`` pointer (zero renames on the steady-state
  path; the one legacy-migration rename promotes a never-referenced
  dot-staged dir), so mutable bucketed tables are fully
  object-store capable.

The object-store semantics are proven in tests against
``tests/fake_object_fs.FakeObjectFS`` — a seam implementation with
atomic per-object PUT / conditional create but copy+delete renames,
delete-then-copy replace, and crash injection — via
``register_fs_override`` below (this container cannot host MinIO;
the fake models exactly the primitives real stores document).
"""

from __future__ import annotations

import os
import time
import uuid
from pathlib import Path


class UriPath:
    """Minimal pathlib-like wrapper for ``scheme://`` URIs so the
    snapshot stores can hold EITHER a local :class:`~pathlib.Path`
    or an object-store URI in ``self.root`` and keep using the
    ``root / name`` idiom (round-8/9 verdict: the store listings
    were pathlib-only, so the curated store could not live on a
    Hadoop-reachable URI even though the lock/manifest protocol
    already ran through this adapter). Only the operations the
    stores use: ``/``, ``str``, ``.name``, ``.parent``, ordering
    (snapshot names sort lexicographically), equality, hashing."""

    __slots__ = ("_s",)

    def __init__(self, s) -> None:
        s = str(s)
        # keep the scheme's "//" but trim a trailing separator so
        # name/parent splits are stable
        self._s = s if s.endswith("://") else s.rstrip("/")

    def __truediv__(self, other) -> "UriPath":
        return UriPath(f"{self._s}/{other}")

    def __str__(self) -> str:
        return self._s

    def __repr__(self) -> str:
        return f"UriPath({self._s!r})"

    def __eq__(self, other) -> bool:
        if isinstance(other, (UriPath, str)):
            return self._s == str(other)
        return NotImplemented

    def __hash__(self) -> int:
        return hash(self._s)

    def __lt__(self, other) -> bool:
        return self._s < str(other)

    @property
    def name(self) -> str:
        return self._s.rsplit("/", 1)[1]

    @property
    def parent(self) -> "UriPath":
        return UriPath(self._s.rsplit("/", 1)[0])


def norm_root(p):
    """The store-root constructor: URIs become :class:`UriPath`
    (every subsequent ``root / x`` stays a URI and ``fs_for``
    dispatches to :class:`HadoopFS`), bare paths stay
    :class:`~pathlib.Path`."""
    s = str(p)
    return UriPath(s) if "://" in s else Path(p)


class PointerCommitConflict(RuntimeError):
    """Two writers raced the SAME pointer-log sequence number — the
    writer-mutex discipline was already broken, so the loser must
    surface loudly instead of silently becoming (or clobbering) the
    committed value. On a rename-atomic FS this cannot happen (the
    legacy single-file flip is used there); on an object store the
    ``create_exclusive`` conditional-put is what detects it."""


#: Hadoop schemes whose FileSystem.rename is a single atomic
#: metadata operation. Everything else — object stores and any
#: scheme not listed — is treated as an OBJECT store: pointer
#: commits go through the log protocol (always safe) and
#: write_text_atomic becomes one whole-object PUT, which is atomic
#: on every real object store (visible at close). A POSIX-like
#: filesystem behind an unlisted scheme would see torn small-file
#: reads from that PUT arm — if you deploy on one, add its scheme
#: here (that is also the faster path for it).
_ATOMIC_RENAME_SCHEMES = frozenset(
    {"hdfs", "file", "viewfs", "abfs", "abfss", "ofs", "o3fs",
     "webhdfs", "swebhdfs"}
)


class LocalFS:
    """os/pathlib implementation — the engine's default seam."""

    def supports_atomic_rename(self) -> bool:
        return True

    def exists(self, p) -> bool:
        return Path(p).exists()

    def is_dir(self, p) -> bool:
        return Path(p).is_dir()

    def mkdirs(self, p) -> None:
        Path(p).mkdir(parents=True, exist_ok=True)

    def read_text(self, p) -> str:
        return Path(p).read_text()

    def write_text_atomic(self, p, content: str) -> None:
        """tmp-in-same-dir + atomic replace — readers of ``p`` see
        the old or the new content, never a torn write."""
        p = Path(p)
        tmp = p.parent / f".{p.name}.{uuid.uuid4().hex[:8]}"
        tmp.write_text(content)
        tmp.replace(p)

    def create_exclusive(self, p, content: str) -> bool:
        """Atomic create-if-absent; False if it already exists."""
        try:
            fd = os.open(str(p), os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        os.write(fd, content.encode())
        os.close(fd)
        return True

    def rename(self, src, dst) -> bool:
        """Non-clobbering atomic move; False if ``dst`` exists.
        Files use link+unlink (atomic no-clobber on POSIX); dirs use
        an existence check + rename — callers hold the writer lock
        across dir swaps, so the check-then-rename pair is not
        racing another mover."""
        src, dst = Path(src), Path(dst)
        if src.is_dir():
            if dst.exists():
                return False
            src.rename(dst)
            return True
        try:
            os.link(src, dst)
        except FileExistsError:
            return False
        except FileNotFoundError:
            raise
        src.unlink()
        return True

    def replace(self, src, dst) -> None:
        """Atomic clobbering move — the pointer-flip primitive."""
        os.replace(str(src), str(dst))

    def delete(self, p, recursive: bool = True) -> None:
        p = Path(p)
        if not p.exists():
            return
        if p.is_dir():
            if recursive:
                import shutil

                shutil.rmtree(p, ignore_errors=True)
            else:
                p.rmdir()
        else:
            try:
                p.unlink()
            except FileNotFoundError:
                pass

    def mtime(self, p) -> float:
        return Path(p).stat().st_mtime

    def touch(self, p) -> None:
        now = time.time()
        os.utime(str(p), (now, now))

    def list(self, p) -> list[tuple[str, bool, int]]:
        """Non-recursive children of ``p`` as ``(name, is_dir,
        size)``; ``[]`` when ``p`` is missing or not a dir — the
        listing primitive the snapshot stores' history/vacuum/GC
        paths run on (one RPC per level on object stores, never a
        client-side glob)."""
        p = Path(p)
        if not p.is_dir():
            return []
        out: list[tuple[str, bool, int]] = []
        for c in p.iterdir():
            try:
                d = c.is_dir()
                out.append((c.name, d, 0 if d else c.stat().st_size))
            except FileNotFoundError:
                continue  # raced a concurrent delete
        return out

    def list_files(self, p) -> list[tuple[str, int]]:
        """All FILES under ``p`` recursively as ``(name, size)`` —
        the file_stats primitive (HadoopFS maps it to the single
        bulk ``listFiles(recursive)`` RPC object stores optimize)."""
        p = Path(p)
        if not p.exists():
            return []
        return [
            (c.name, c.stat().st_size) for c in p.rglob("*") if c.is_file()
        ]


class HadoopFS:
    """The same surface over ``org.apache.hadoop.fs.FileSystem``
    via the active Spark session's JVM — no new Python deps, every
    Hadoop-supported scheme. See module docstring for the semantics
    contract and the object-store caveats."""

    def __init__(self, spark, base_uri: str) -> None:
        self._jvm = spark._jvm
        self._gw = spark.sparkContext._gateway
        self._conf = spark._jsc.hadoopConfiguration()
        self._fs = self._path(base_uri).getFileSystem(self._conf)
        scheme = str(base_uri).split("://", 1)[0].lower()
        self._atomic_rename = scheme in _ATOMIC_RENAME_SCHEMES

    def supports_atomic_rename(self) -> bool:
        return self._atomic_rename

    def _path(self, p):
        return self._jvm.org.apache.hadoop.fs.Path(str(p))

    def exists(self, p) -> bool:
        return self._fs.exists(self._path(p))

    def is_dir(self, p) -> bool:
        jp = self._path(p)
        return self._fs.exists(jp) and self._fs.getFileStatus(jp).isDirectory()

    def mkdirs(self, p) -> None:
        self._fs.mkdirs(self._path(p))

    def read_text(self, p) -> str:
        jp = self._path(p)
        if not self._fs.exists(jp):
            raise FileNotFoundError(str(p))
        stream = self._fs.open(jp)
        try:
            # commons-io ships on Spark's classpath
            return self._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()

    def _write(self, p, content: str, overwrite: bool) -> None:
        out = self._fs.create(self._path(p), overwrite)
        try:
            out.write(bytearray(content.encode()))
        finally:
            out.close()

    def write_text_atomic(self, p, content: str) -> None:
        if not self._atomic_rename:
            # Object store: ONE whole-object PUT, visible at close()
            # — that IS the store's atomic primitive. The tmp+rename
            # dance below would be the torn path here (rename is
            # copy+delete; FileContext OVERWRITE may delete dst
            # first, leaving a reader-visible missing-pointer window).
            self._write(p, content, overwrite=True)
            return
        parent = str(p).rsplit("/", 1)[0]
        name = str(p).rsplit("/", 1)[1]
        tmp = f"{parent}/.{name}.{uuid.uuid4().hex[:8]}"
        self._write(tmp, content, overwrite=True)
        self.replace(tmp, p)

    def create_exclusive(self, p, content: str) -> bool:
        from py4j.protocol import Py4JJavaError

        try:
            self._write(p, content, overwrite=False)
            return True
        except Py4JJavaError as e:
            # classify by EXCEPTION CLASS, not message text: an
            # unrelated failure whose message merely contains
            # "exists" (parent-path errors on some stores) must
            # surface as a fault, not masquerade as lock-held
            # (round-6 advisor, fs.py:189)
            cls = e.java_exception.getClass().getName()
            if cls.endswith("FileAlreadyExistsException"):
                return False
            raise

    def rename(self, src, dst) -> bool:
        """HDFS's native contract: atomic, False when dst exists."""
        jsrc = self._path(src)
        if not self._fs.exists(jsrc):
            raise FileNotFoundError(str(src))
        return bool(self._fs.rename(jsrc, self._path(dst)))

    def replace(self, src, dst) -> None:
        """Rename with OVERWRITE via FileContext (atomic on HDFS;
        see module docstring for object-store degradation)."""
        fc = self._jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            self._path(dst).toUri(), self._conf
        )
        ren_cls = getattr(self._jvm, "org.apache.hadoop.fs.Options$Rename")
        opts = self._gw.new_array(ren_cls, 1)  # varargs → explicit array
        opts[0] = ren_cls.OVERWRITE
        fc.rename(self._path(src), self._path(dst), opts)

    def delete(self, p, recursive: bool = True) -> None:
        self._fs.delete(self._path(p), recursive)

    def mtime(self, p) -> float:
        return self._fs.getFileStatus(self._path(p)).getModificationTime() / 1000.0

    def touch(self, p) -> None:
        self._fs.setTimes(self._path(p), int(time.time() * 1000), -1)

    def list(self, p) -> list[tuple[str, bool, int]]:
        jp = self._path(p)
        if not self._fs.exists(jp):
            return []
        return [
            (st.getPath().getName(), st.isDirectory(), st.getLen())
            for st in self._fs.listStatus(jp)
        ]

    def list_files(self, p) -> list[tuple[str, int]]:
        jp = self._path(p)
        if not self._fs.exists(jp):
            return []
        it = self._fs.listFiles(jp, True)
        out: list[tuple[str, int]] = []
        while it.hasNext():
            st = it.next()
            out.append((st.getPath().getName(), st.getLen()))
        return out


def join(base, *parts) -> str | Path:
    """Path join that survives URIs: ``s3a://b/x`` + ``y`` →
    ``s3a://b/x/y`` (PurePath would eat the double slash); local
    paths stay Path objects."""
    s = str(base)
    if "://" in s:
        return "/".join([s.rstrip("/"), *parts])
    return Path(base).joinpath(*parts)


_LOCAL = LocalFS()

#: prefix → FS instance, consulted FIRST by :func:`fs_for`. This is
#: the test seam that lets the suite route a local path through an
#: object-store-semantics implementation (tests/fake_object_fs.py)
#: while Spark keeps reading/writing the same path natively — the
#: only way to integration-test the non-atomic-rename protocol in a
#: container that cannot host MinIO. Production code never registers
#: overrides.
_FS_OVERRIDES: dict[str, object] = {}


def register_fs_override(prefix: str, fs) -> None:
    _FS_OVERRIDES[str(prefix)] = fs


def clear_fs_override(prefix: str) -> None:
    _FS_OVERRIDES.pop(str(prefix), None)


def _log_dir(ptr):
    """Sibling commit-log directory of a pointer file:
    ``…/_CURRENT`` → ``…/_CURRENT.d`` (never collides with the
    stores' ``snap-*`` history namespaces)."""
    s = str(ptr) + ".d"
    return UriPath(s) if "://" in s else Path(s)


def read_pointer(fs, ptr) -> str | None:
    """Resolve a committed pointer value, or None before the first
    commit. Log-dir entries (object-store protocol) supersede the
    legacy single file; readers take max(seq) and re-list (with a
    short back-off) if a retention prune raced the read.

    The legacy single-file fallback applies ONLY when the log dir is
    empty: once log entries were OBSERVED, falling through would
    return a stale pre-migration value (or None — a live table
    briefly "nonexistent"), so exhausting the retries then raises
    instead of masking the anomaly (round-12 advisor, fs.py:477).
    Retention keeps ``retain`` entries and always the newest, so all
    retries failing means something beyond a routine prune race —
    surface it."""
    d = _log_dir(ptr)
    saw_entries = False
    for attempt in range(5):
        entries = sorted(
            name
            for (name, is_dir, _) in fs.list(d)
            if not is_dir and name.endswith(".ptr")
        )
        if not entries:
            if saw_entries:
                # the log EMPTIED mid-read: a concurrent table
                # delete / store teardown removed it wholesale
                # (retention always keeps the newest entry, so
                # routine prunes never empty it). The table is
                # going away — report nonexistent; the legacy file
                # (a stale pre-migration value on a migrated store)
                # must not resurface here (round-12 self-review,
                # finding 3)
                return None
            break
        saw_entries = True
        try:
            return fs.read_text(join(d, entries[-1]))
        except FileNotFoundError:
            # raced a retention prune (or a stale listing); back off
            # briefly and re-list
            time.sleep(0.02 * (attempt + 1))
            continue
    if saw_entries:
        raise RuntimeError(
            f"pointer log {d} has entries but every max-seq read "
            "raced away across retries — listing/read inconsistency "
            "beyond a routine retention prune; refusing the stale "
            "legacy fallback"
        )
    if fs.exists(ptr):
        return fs.read_text(ptr)
    return None


def commit_pointer(fs, ptr, value: str, retain: int = 8,
                   fence=None) -> None:
    """THE pointer commit. Rename-atomic FS → legacy single-file
    atomic replace (on-disk format unchanged for every existing
    store). Non-atomic FS → log-dir commit: entry
    ``<ptr>.d/<seq:020d>.ptr`` created with the atomic
    ``create_exclusive`` conditional-put; readers resolve max(seq),
    so the commit is all-old-or-all-new with NO rename anywhere. A
    seq collision (two writers both computed the same next seq) is a
    broken-mutex signal and raises :class:`PointerCommitConflict`
    loudly — create-if-absent makes the pointer flip itself a CAS,
    which the posix single-file flip never was. Entries beyond
    ``retain`` are pruned after the commit (readers re-list on a
    raced delete; max(seq) is always retained).

    ``fence`` (optional, e.g. a ``_LockHandle.check`` bound method)
    runs immediately before the final write/create — the narrowest
    possible check-then-flip window for an evicted writer (callers
    previously fenced, then spent the pointer-IO time unfenced)."""
    d = _log_dir(ptr)
    if fs.supports_atomic_rename():
        # one-way door: once a store has log entries (it lived on an
        # object store), later commits on an atomic FS MUST keep
        # appending to the log — readers prefer the log, so a legacy
        # single-file write here would be invisible behind a stale
        # log entry
        has_log = any(
            not is_dir and name.endswith(".ptr")
            for (name, is_dir, _) in fs.list(d)
        )
        if not has_log:
            if fence is not None:
                fence()
            fs.write_text_atomic(ptr, value)
            return
    fs.mkdirs(d)
    seqs = sorted(
        int(name.split(".", 1)[0])
        for (name, is_dir, _) in fs.list(d)
        if not is_dir and name.endswith(".ptr")
    )
    seq = (seqs[-1] + 1) if seqs else 1
    if fence is not None:
        fence()
    if not fs.create_exclusive(join(d, f"{seq:020d}.ptr"), value):
        raise PointerCommitConflict(
            f"pointer log {d} seq {seq} already committed by a "
            "concurrent writer — writer-mutex discipline broke; "
            "back off, re-resolve, and retry"
        )
    for old in seqs[: max(0, len(seqs) - (retain - 1))]:
        fs.delete(join(d, f"{old:020d}.ptr"), recursive=False)


def retry_pointer_conflicts(fn, attempts: int = 3,
                            base_sleep_s: float = 0.2):
    """Run a REPLAY-IDEMPOTENT verb, retrying on
    :class:`PointerCommitConflict` with exponential back-off
    (round-12 verdict task 3). The CAS loser is contract-correct to
    die loudly — the conflict means two writers believed they held
    the mutex — but for verbs whose whole body is a deterministic
    fold over committed state (index/store maintenance, log
    compaction) a transient conflict wasting the entire fold is the
    wrong economics at 100 TB: the verb re-acquires the lock,
    RE-RESOLVES the now-current state, and replays; converging on a
    no-op if the racing writer already did the work.

    ONLY wrap verbs where replay-after-a-competitor's-commit is
    semantically a no-op or a fresh fold. Verbs carrying
    caller-supplied payloads (writes, takedowns, deny releases) must
    NOT be wrapped — their loser has to surface so the caller can
    decide; they keep failing fast."""
    last: PointerCommitConflict | None = None
    for attempt in range(max(1, attempts)):
        try:
            return fn()
        except PointerCommitConflict as e:
            last = e
            if attempt + 1 < max(1, attempts):
                time.sleep(base_sleep_s * (2 ** attempt))
    raise last


def fs_for(path, spark=None):
    """Scheme dispatch: ``scheme://…`` → :class:`HadoopFS` (needs the
    active session), bare paths → :class:`LocalFS`. ``file://`` URIs
    deliberately go through HadoopFS — that is how the Hadoop arm is
    integration-tested in this container."""
    s = str(path)
    if _FS_OVERRIDES:
        for prefix, fsimpl in _FS_OVERRIDES.items():
            if s.startswith(prefix):
                return fsimpl
    if "://" in s:
        if spark is None:
            from pyspark.sql import SparkSession

            spark = SparkSession.getActiveSession()
            if spark is None:
                raise ValueError(
                    f"URI path {s} needs an active SparkSession for HadoopFS"
                )
        return HadoopFS(spark, s)
    return _LOCAL
