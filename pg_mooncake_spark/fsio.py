"""Storage-interface seam for transactional metadata writes.

Every commit in this engine — moontable log entries (`storage.py`),
Delta log versions (`sources/delta.py`), Iceberg metadata versions
(`sources/iceberg.py`) — reduces to a handful of primitives.  The
reference's mirrors live in an ``iceberg_warehouse_location`` that is
object storage in practice (reference src/functions.rs:89), where POSIX
rename/hard-link do not exist, so the primitives are defined by what
object stores CAN do and the local implementation is just one backend:

==================  =========================  ===========================
Primitive           Local filesystem           S3 / GCS mapping
==================  =========================  ===========================
put_if_absent       write temp + ``os.link``   conditional PUT
                    (EEXIST = conflict)        ``If-None-Match: *`` (S3,
                                               since 2024-08 on all
                                               buckets) / ``x-goog-if-
                                               generation-match: 0`` (GCS)
write_atomic        write temp + ``os.rename`` plain PUT (object PUTs are
                                               atomic: readers see old or
                                               new, never partial)
listdir             ``os.listdir``             LIST with prefix
read_bytes          ``open().read()``          GET
==================  =========================  ===========================

The commit protocols above rely ONLY on these: optimistic concurrency is
"serialize on put_if_absent of the next version's key", not on rename
semantics, so the same code commits correctly against a conditional-PUT
object store.  The DATA plane (parquet files) deliberately does not go
through this seam — executors write data files via Spark/Hadoop
committers (s3a on a real cluster), under unique names whose VISIBILITY
is governed entirely by the committed log entry, so data-file writes
need no atomicity of their own.

``FakeObjectStore`` emulates the object-store contract (flat keys, no
rename, conditional put, atomic overwrite) in memory; the tests run a
full moontable lifecycle with its commit log hosted there to prove the
protocol never reaches for a POSIX-only primitive.
"""

from __future__ import annotations

import os
import threading
import uuid


class CommitConflict(Exception):
    """put_if_absent lost the race: the key already exists."""


class StorageBackend:
    """Interface: metadata-plane primitives (see module docstring)."""

    def put_if_absent(self, path: str, data: bytes) -> None:
        raise NotImplementedError

    def write_atomic(self, path: str, data: bytes) -> None:
        raise NotImplementedError

    def listdir(self, path: str) -> list[str]:
        """Names (not full paths) directly under ``path``; [] if absent."""
        raise NotImplementedError

    def read_bytes(self, path: str) -> bytes:
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def mkdirs(self, path: str) -> None:
        """Ensure the parent container exists (no-op on flat stores)."""
        raise NotImplementedError


class LocalFS(StorageBackend):
    """POSIX implementation.  put_if_absent uses hard-link-into-place:
    unlike exists-check-then-rename there is no TOCTOU window — two
    racing committers serialize on the kernel's EEXIST."""

    def put_if_absent(self, path: str, data: bytes) -> None:
        tmp = path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "wb") as fh:
            fh.write(data)
        try:
            os.link(tmp, path)
        except FileExistsError:
            raise CommitConflict(path) from None
        finally:
            os.unlink(tmp)

    def write_atomic(self, path: str, data: bytes) -> None:
        tmp = path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "wb") as fh:
            fh.write(data)
        os.rename(tmp, path)

    def listdir(self, path: str) -> list[str]:
        if not os.path.isdir(path):
            return []
        return os.listdir(path)

    def read_bytes(self, path: str) -> bytes:
        with open(path, "rb") as fh:
            return fh.read()

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def mkdirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)


class FakeObjectStore(StorageBackend):
    """In-memory object store with S3 semantics: a flat key → bytes map,
    no directories, no rename; put_if_absent is a conditional PUT and
    write_atomic is a plain PUT.  Thread-safe, and counts conditional
    PUTs and conflicts so tests can assert the OCC path actually ran."""

    def __init__(self) -> None:
        self._objects: dict[str, bytes] = {}
        self._lock = threading.Lock()
        self.conditional_puts = 0
        self.conflicts = 0

    def put_if_absent(self, path: str, data: bytes) -> None:
        with self._lock:
            self.conditional_puts += 1
            if path in self._objects:
                self.conflicts += 1
                raise CommitConflict(path)
            self._objects[path] = bytes(data)

    def write_atomic(self, path: str, data: bytes) -> None:
        with self._lock:
            self._objects[path] = bytes(data)

    def listdir(self, path: str) -> list[str]:
        prefix = path.rstrip("/") + "/"
        with self._lock:
            out = set()
            for k in self._objects:
                if k.startswith(prefix):
                    out.add(k[len(prefix):].split("/", 1)[0])
            return sorted(out)

    def read_bytes(self, path: str) -> bytes:
        with self._lock:
            try:
                return self._objects[path]
            except KeyError:
                raise FileNotFoundError(path) from None

    def exists(self, path: str) -> bool:
        with self._lock:
            if path in self._objects:
                return True
            prefix = path.rstrip("/") + "/"
            return any(k.startswith(prefix) for k in self._objects)

    def mkdirs(self, path: str) -> None:
        pass  # flat namespace: containers don't exist


_DEFAULT = LocalFS()


def get_backend(path: str) -> StorageBackend:  # noqa: ARG001 - scheme hook
    """Backend for ``path``.  Local paths (the only scheme reachable in
    this image) resolve to the shared LocalFS; a real deployment maps
    s3://... / gs://... prefixes to conditional-PUT implementations
    here.  Tests bypass this by injecting a backend explicitly."""
    return _DEFAULT
