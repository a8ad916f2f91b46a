"""Commit-log storage primitive — the portable contract under the
optimistic multi-writer protocol (VERDICT r9 task #6).

The whole lakehouse concurrency story reduces to ONE storage operation:
an atomic, exclusive **put-if-absent** of a fully-written manifest into
the next version slot. Everything else the commit path touches is
ordinary read/list/replace. This module names that contract and ships
two implementations:

* ``PosixCommitLog`` — the default: put-if-absent is write-temp +
  fsync + ``link(2)`` (atomic and EXCLUSIVE on one filesystem);
  replace is write-temp + fsync + ``rename(2)``.
* ``FakeS3CommitLog`` — an in-memory double with OBJECT-STORE
  semantics only: no rename, no link, no directories — just
  conditional and unconditional whole-object puts over a flat
  key space, the way every real store exposes it:

    - S3:    ``PutObject`` with ``If-None-Match: *``
    - GCS:   ``x-goog-if-generation-match: 0``
    - Azure: ``Put Blob`` with ``If-None-Match: *``

The race suite (tests/test_io.py) runs the SAME commit-conflict
scenarios against the double, proving the protocol depends on nothing
POSIX — the claim the module docstring of dataset_export makes, made
testable. Data files are out of scope: Spark's parquet writers land
them under unique names, so they need no coordination primitive at
all; only the manifest log does.
"""

from __future__ import annotations

import os
import threading
import uuid as _uuid


class CommitLog:
    """Storage interface for the manifest log of ONE dataset `path`.

    ``name`` values are flat object names inside the dataset prefix
    (``_MANIFEST.json``, ``_MANIFEST.v{N}.json``). Implementations
    must make ``put_if_absent`` atomic and exclusive across concurrent
    writers; ``put`` atomic (readers see old or new bytes, never a
    torn write); ``get``/``list_names`` strongly consistent after a
    successful put (S3 has been read-after-write consistent since
    2020, GCS/Azure always were)."""

    def put_if_absent(self, path: str, name: str, data: bytes) -> bool:
        """Atomically create `name`; False if it already exists."""
        raise NotImplementedError

    def put(self, path: str, name: str, data: bytes) -> None:
        """Atomically create-or-replace `name`."""
        raise NotImplementedError

    def get(self, path: str, name: str) -> bytes:
        """Read `name`; raise FileNotFoundError if absent."""
        raise NotImplementedError

    def list_names(self, path: str) -> list[str]:
        """All object names under `path` ([] if the prefix is empty)."""
        raise NotImplementedError

    def delete(self, path: str, name: str) -> None:
        """Remove `name`; no-op if already absent."""
        raise NotImplementedError


class PosixCommitLog(CommitLog):
    """link(2)/rename(2)-based implementation for one shared POSIX
    filesystem (the local default; also correct on NFSv4)."""

    def put_if_absent(self, path: str, name: str, data: bytes) -> bool:
        target = os.path.join(path, name)
        tmp = target + f".{_uuid.uuid4().hex}.tmp"
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, target)
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)
        return True

    def put(self, path: str, name: str, data: bytes) -> None:
        target = os.path.join(path, name)
        tmp = target + f".{_uuid.uuid4().hex}.tmp"
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, target)

    def get(self, path: str, name: str) -> bytes:
        with open(os.path.join(path, name), "rb") as f:
            return f.read()

    def list_names(self, path: str) -> list[str]:
        try:
            return os.listdir(path)
        except FileNotFoundError:
            return []

    def delete(self, path: str, name: str) -> None:
        try:
            os.unlink(os.path.join(path, name))
        except FileNotFoundError:
            pass


class FakeS3CommitLog(CommitLog):
    """In-memory object store: flat (path, name) → bytes map, one lock
    standing in for the store's internal conditional-write serializer.
    Deliberately offers NO rename/link — a protocol that needs either
    cannot run against it, which is the point of the double."""

    def __init__(self) -> None:
        self._objects: dict[tuple[str, str], bytes] = {}
        self._lock = threading.Lock()

    def put_if_absent(self, path: str, name: str, data: bytes) -> bool:
        with self._lock:  # PutObject If-None-Match:* — one winner
            if (path, name) in self._objects:
                return False
            self._objects[(path, name)] = bytes(data)
            return True

    def put(self, path: str, name: str, data: bytes) -> None:
        with self._lock:
            self._objects[(path, name)] = bytes(data)

    def get(self, path: str, name: str) -> bytes:
        with self._lock:
            try:
                return self._objects[(path, name)]
            except KeyError:
                raise FileNotFoundError(f"{path}/{name}") from None

    def list_names(self, path: str) -> list[str]:
        with self._lock:
            return [n for (p, n) in self._objects if p == path]

    def delete(self, path: str, name: str) -> None:
        with self._lock:
            self._objects.pop((path, name), None)
