"""FakeObjectFS — an object-store-semantics implementation of the
:mod:`ods_v3_dbt_spark.fs` seam, rooted on a LOCAL directory so
Spark keeps reading/writing the same paths natively while the commit
protocol sees exactly the primitives real object stores document
(round-10 verdict task 1; this container cannot host MinIO, the
reference's landing store — ``docker-compose-swarm.yml`` minio
service, ``plugins/operators/bccp_to_ods.py:245-255``):

* per-object PUT is ATOMIC (visible whole at close — S3/GCS/Azure);
* ``create_exclusive`` is an atomic conditional-put (S3
  If-None-Match, GCS generation-match, Azure ETag);
* ``rename`` is CLIENT-SIDE copy+delete: the no-clobber check is
  check-then-act, directory renames copy one object at a time (a
  crash leaves a half-copied destination), nothing is atomic;
* ``replace`` is delete-dst-then-copy — readers can observe the
  destination MISSING mid-flip (the S3A FileContext degradation);
* ``supports_atomic_rename()`` → False, which is what switches the
  engine to the pointer-log commit protocol.

Instrumentation for tests: ``ops`` records every mutating call as
``(op, path)``; ``fail_after_copies`` injects a crash
(:class:`FakeCrash`) after N object copies inside a rename — the
torn-directory scenario.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid
from pathlib import Path


class FakeCrash(RuntimeError):
    """Injected mid-rename crash (simulated writer death)."""


class FakeObjectFS:
    def __init__(self) -> None:
        self.ops: list[tuple[str, str]] = []
        self.fail_after_copies: int | None = None
        self._copies = 0

    def supports_atomic_rename(self) -> bool:
        return False

    # -- reads (object stores serve these consistently) ------------------

    def exists(self, p) -> bool:
        return Path(p).exists()

    def is_dir(self, p) -> bool:
        return Path(p).is_dir()

    def mkdirs(self, p) -> None:
        Path(p).mkdir(parents=True, exist_ok=True)

    def read_text(self, p) -> str:
        return Path(p).read_text()

    def mtime(self, p) -> float:
        return Path(p).stat().st_mtime

    def touch(self, p) -> None:
        now = time.time()
        os.utime(str(p), (now, now))

    def list(self, p) -> list[tuple[str, bool, int]]:
        p = Path(p)
        if not p.is_dir():
            return []
        out: list[tuple[str, bool, int]] = []
        for c in p.iterdir():
            d = c.is_dir()
            out.append((c.name, d, 0 if d else c.stat().st_size))
        return out

    def list_files(self, p) -> list[tuple[str, int]]:
        p = Path(p)
        if not p.exists():
            return []
        return [(c.name, c.stat().st_size) for c in p.rglob("*") if c.is_file()]

    # -- writes -----------------------------------------------------------

    def _put_bytes(self, p: Path, data: bytes) -> None:
        """One whole-object PUT: atomic per object (modeled with a
        tmp+os.replace so an in-process concurrent reader never sees
        a partial object — exactly the guarantee a real PUT gives)."""
        p.parent.mkdir(parents=True, exist_ok=True)
        tmp = p.parent / f".put.{uuid.uuid4().hex[:8]}"
        tmp.write_bytes(data)
        os.replace(tmp, p)

    def write_text_atomic(self, p, content: str) -> None:
        self.ops.append(("put", str(p)))
        self._put_bytes(Path(p), content.encode())

    def create_exclusive(self, p, content: str) -> bool:
        self.ops.append(("create_exclusive", str(p)))
        Path(p).parent.mkdir(parents=True, exist_ok=True)
        try:
            fd = os.open(str(p), os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        os.write(fd, content.encode())
        os.close(fd)
        return True

    def _copy_object(self, src: Path, dst: Path) -> None:
        self._copies += 1
        if (
            self.fail_after_copies is not None
            and self._copies > self.fail_after_copies
        ):
            raise FakeCrash(f"injected crash copying {src} -> {dst}")
        self._put_bytes(dst, src.read_bytes())

    def rename(self, src, dst) -> bool:
        """Copy+delete with a CLIENT-SIDE no-clobber check."""
        src, dst = Path(src), Path(dst)
        self.ops.append(("rename", f"{src} -> {dst}"))
        if not src.exists():
            raise FileNotFoundError(str(src))
        if dst.exists():
            return False
        if src.is_dir():
            for f in sorted(c for c in src.rglob("*") if c.is_file()):
                self._copy_object(f, dst / f.relative_to(src))
            shutil.rmtree(src, ignore_errors=True)
        else:
            self._copy_object(src, dst)
            src.unlink()
        return True

    def replace(self, src, dst) -> None:
        """Delete-dst-then-copy: NON-atomic — dst is observably
        missing mid-flip. The engine must never call this on a
        pointer when ``supports_atomic_rename()`` is False."""
        src, dst = Path(src), Path(dst)
        self.ops.append(("replace", f"{src} -> {dst}"))
        if dst.exists():
            dst.unlink()
        self._copy_object(src, dst)
        src.unlink()

    def delete(self, p, recursive: bool = True) -> None:
        self.ops.append(("delete", str(p)))
        p = Path(p)
        if not p.exists():
            return
        if p.is_dir():
            if recursive:
                shutil.rmtree(p, ignore_errors=True)
            else:
                p.rmdir()
        else:
            try:
                p.unlink()
            except FileNotFoundError:
                pass
