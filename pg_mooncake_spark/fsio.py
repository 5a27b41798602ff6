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
import re
import threading
import uuid
from typing import Optional


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


class S3ObjectStore(StorageBackend):
    """Metadata plane on Amazon S3 (or any S3-compatible store that
    supports conditional writes).  Requires boto3 — gated behind an
    import so the engine stays dependency-free where S3 is unreachable.

    put_if_absent maps to the conditional PUT ``IfNoneMatch='*'``
    (supported on ALL S3 buckets since 2024-08, and the primitive the
    reference's object-store warehouses rely on — reference
    src/functions.rs:89 ``iceberg_warehouse_location``); a 412
    PreconditionFailed is the commit conflict.  write_atomic is a plain
    PUT (object PUTs are atomic).  Paths are ``s3://bucket/key...``."""

    def __init__(self, region: Optional[str] = None) -> None:
        import boto3  # real deployments only; ImportError surfaces raw

        self._s3 = boto3.client("s3", region_name=region)

    @staticmethod
    def _split(path: str) -> tuple[str, str]:
        # scheme-agnostic: registered for both s3:// and s3a:// (ADVICE
        # r9 #3 — a fixed 5-char strip parsed s3a:// into bucket='')
        rest = path.split("://", 1)[1] if "://" in path else path
        bucket, _, key = rest.partition("/")
        return bucket, key

    def put_if_absent(self, path: str, data: bytes) -> None:
        import botocore.exceptions

        bucket, key = self._split(path)
        try:
            self._s3.put_object(
                Bucket=bucket, Key=key, Body=data, IfNoneMatch="*"
            )
        except botocore.exceptions.ClientError as e:
            code = e.response.get("Error", {}).get("Code")
            if code in ("PreconditionFailed", "412"):
                raise CommitConflict(path) from None
            raise

    def write_atomic(self, path: str, data: bytes) -> None:
        bucket, key = self._split(path)
        self._s3.put_object(Bucket=bucket, Key=key, Body=data)

    def listdir(self, path: str) -> list[str]:
        bucket, key = self._split(path)
        prefix = key.rstrip("/") + "/" if key else ""
        out: set[str] = set()
        paginator = self._s3.get_paginator("list_objects_v2")
        for page in paginator.paginate(
            Bucket=bucket, Prefix=prefix, Delimiter="/"
        ):
            for o in page.get("Contents", []):
                out.add(o["Key"][len(prefix):])
            for p in page.get("CommonPrefixes", []):
                out.add(p["Prefix"][len(prefix):].rstrip("/"))
        return sorted(n for n in out if n)

    def read_bytes(self, path: str) -> bytes:
        import botocore.exceptions

        bucket, key = self._split(path)
        try:
            return self._s3.get_object(Bucket=bucket, Key=key)["Body"].read()
        except botocore.exceptions.ClientError as e:
            if e.response.get("Error", {}).get("Code") in ("NoSuchKey", "404"):
                raise FileNotFoundError(path) from None
            raise

    def exists(self, path: str) -> bool:
        # exact key first, then '/'-boundary directory prefix — matching
        # FakeObjectStore semantics (ADVICE r9 #4: a raw-key Prefix list
        # made exists('wh/t1') true when only 'wh/t10/...' existed)
        import botocore.exceptions

        bucket, key = self._split(path)
        try:
            self._s3.head_object(Bucket=bucket, Key=key)
            return True
        except botocore.exceptions.ClientError as e:
            code = e.response.get("Error", {}).get("Code")
            if code not in ("404", "NoSuchKey", "NotFound"):
                raise
        resp = self._s3.list_objects_v2(
            Bucket=bucket, Prefix=key.rstrip("/") + "/", MaxKeys=1
        )
        return resp.get("KeyCount", 0) > 0

    def mkdirs(self, path: str) -> None:
        pass  # flat namespace


_DEFAULT = LocalFS()
_MEM_BUCKETS: dict[str, FakeObjectStore] = {}
_MEM_LOCK = threading.Lock()
_SCHEME_RE = re.compile(r"^([a-z][a-z0-9+.-]*)://")
_SCHEMES: dict[str, "object"] = {}  # scheme → factory(path) -> backend


def register_scheme(scheme: str, factory) -> None:
    """Map ``scheme://`` paths to a backend: ``factory(path)`` is called
    per get_backend and may return a shared instance.  Deployment hook
    for custom stores (MinIO endpoints, Azure, test doubles)."""
    _SCHEMES[scheme] = factory


def _mem_backend(path: str) -> FakeObjectStore:
    """``mem://bucket/...``: process-shared in-memory object store, one
    per bucket — the object-store contract without a network, used to
    run whole lifecycles through a non-LocalFS backend in tests/CI."""
    bucket = path[len("mem://"):].split("/", 1)[0]
    with _MEM_LOCK:
        if bucket not in _MEM_BUCKETS:
            _MEM_BUCKETS[bucket] = FakeObjectStore()
        return _MEM_BUCKETS[bucket]


def _s3_backend(_path: str) -> StorageBackend:
    return S3ObjectStore()


register_scheme("mem", _mem_backend)
register_scheme("s3", _s3_backend)
register_scheme("s3a", _s3_backend)


def get_backend(path: str) -> StorageBackend:
    """Backend for ``path``, dispatched on the URI scheme: plain local
    paths (and file://) resolve to the shared LocalFS; ``mem://`` to a
    process-shared in-memory object store; ``s3://``/``s3a://`` to the
    conditional-PUT S3 implementation (needs boto3).  register_scheme
    adds more.  Tests may also inject a backend explicitly."""
    m = _SCHEME_RE.match(path)
    if not m or m.group(1) == "file":
        return _DEFAULT
    scheme = m.group(1)
    factory = _SCHEMES.get(scheme)
    if factory is None:
        raise ValueError(
            f"no storage backend registered for scheme {scheme!r} "
            f"({path!r}); register one with fsio.register_scheme"
        )
    return factory(path)
