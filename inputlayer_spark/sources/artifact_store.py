"""Pluggable byte-blob storage for index artifacts (sharded HNSW).

The reference persists index artifacts through a storage abstraction
(`/root/reference/src/storage/persist/` — a trait with filesystem and
object-store implementations) so the same index code runs against a
local disk or a bucket. This is the Spark-side analog: every persisted
artifact (shard graphs, index metadata) goes through an `ObjectStore`
with S3-shaped semantics —

* **flat keys**, not paths: no directories, no mkdir, no rename in the
  public contract. `put` is an atomic whole-object publish (like an S3
  PUT); readers see the old bytes or the new bytes, never a torn write.
* **prefix operations**: `list_prefix` / `delete_prefix` replace
  directory listing / rmtree.
* **scheme routing**: `store_for(path)` picks the backend from the URI
  scheme. Plain paths (no scheme) use the local filesystem; `mem://`
  uses the flat key-value double below. A real S3/GCS/ABFS backend
  drops in by registering its scheme — none ship here because their
  SDKs aren't in the container, but nothing in the index code would
  change.

Executor-side use: Spark python workers are separate PROCESSES, so a
backend cannot rely on driver-process state. `store_for` is re-resolved
by import inside `mapInPandas` kernels, and both backends derive all
state from the URI alone (the `mem://` double maps a bucket to a
deterministic spill root under the system temp dir), so driver and
every worker agree on where bytes live without shipping any handles.
"""

from __future__ import annotations

import os
import tempfile
import urllib.parse
from typing import Callable, Dict, Iterable


class ObjectStore:
    """S3-shaped byte-blob store: flat keys, atomic whole-object put."""

    def put(self, key: str, data: bytes) -> None:
        raise NotImplementedError

    def get(self, key: str) -> bytes:
        raise NotImplementedError

    def exists(self, key: str) -> bool:
        raise NotImplementedError

    def list_prefix(self, prefix: str) -> Iterable[str]:
        raise NotImplementedError

    def delete_prefix(self, prefix: str) -> None:
        raise NotImplementedError


class LocalFsStore(ObjectStore):
    """Keys are filesystem paths. `put` publishes atomically via a
    same-directory temp file + rename (POSIX rename is the local analog
    of an atomic PUT)."""

    def put(self, key: str, data: bytes) -> None:
        d = os.path.dirname(key)
        if d:
            os.makedirs(d, exist_ok=True)
        tmp = key + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(data)
        os.replace(tmp, key)

    def get(self, key: str) -> bytes:
        with open(key, "rb") as fh:
            return fh.read()

    def exists(self, key: str) -> bool:
        return os.path.exists(key)

    def list_prefix(self, prefix: str) -> Iterable[str]:
        # prefix is a directory-ish path; walk it
        root = prefix.rstrip("/")
        if os.path.isdir(root):
            for dirpath, _dirs, files in os.walk(root):
                for f in files:
                    yield os.path.join(dirpath, f)
        elif os.path.exists(root):
            yield root

    def delete_prefix(self, prefix: str) -> None:
        import shutil

        root = prefix.rstrip("/")
        if os.path.isdir(root):
            shutil.rmtree(root, ignore_errors=True)
        elif os.path.exists(root):
            try:
                os.remove(root)
            except OSError:
                pass


class MemStore(ObjectStore):
    """`mem://bucket/...` — the non-POSIX test double. Honors ONLY the
    flat-key contract: no directories, no rename, keys listed by string
    prefix. Cross-process (driver + Spark python workers) by deriving a
    spill root from the bucket name under the system temp dir; each key
    is one file whose NAME is the percent-encoded key — flat and
    listable, with no path semantics borrowed from the key."""

    def __init__(self, bucket: str):
        self.bucket = bucket
        self.root = os.path.join(
            tempfile.gettempdir(), f"sparkgraft-memstore-{bucket}"
        )

    def _fname(self, key: str) -> str:
        return os.path.join(self.root, urllib.parse.quote(key, safe=""))

    def put(self, key: str, data: bytes) -> None:
        os.makedirs(self.root, exist_ok=True)
        tmp = self._fname(key) + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(data)
        os.replace(tmp, self._fname(key))  # internal detail: PUT is atomic

    def get(self, key: str) -> bytes:
        try:
            with open(self._fname(key), "rb") as fh:
                return fh.read()
        except FileNotFoundError:
            raise FileNotFoundError(f"no such object: {key}")

    def exists(self, key: str) -> bool:
        return os.path.exists(self._fname(key))

    def list_prefix(self, prefix: str) -> Iterable[str]:
        try:
            names = os.listdir(self.root)
        except OSError:
            return
        for n in names:
            if n.endswith(".tmp"):
                continue
            key = urllib.parse.unquote(n)
            if key.startswith(prefix):
                yield key

    def delete_prefix(self, prefix: str) -> None:
        for key in list(self.list_prefix(prefix)):
            try:
                os.remove(self._fname(key))
            except OSError:
                pass


_SCHEMES: Dict[str, Callable[[str], ObjectStore]] = {}


def register_scheme(scheme: str, factory: Callable[[str], ObjectStore]) -> None:
    """Plug in a backend for `scheme://...` keys. `factory` receives the
    bucket/authority component."""
    _SCHEMES[scheme] = factory


register_scheme("mem", MemStore)


def store_for(path: str) -> ObjectStore:
    """Resolve the backend for a key/prefix. Derives everything from the
    URI so driver and executors resolve identically by import."""
    if "://" in path:
        scheme, rest = path.split("://", 1)
        factory = _SCHEMES.get(scheme)
        if factory is None:
            raise ValueError(f"no ObjectStore registered for {scheme}://")
        bucket = rest.split("/", 1)[0]
        return factory(bucket)
    return LocalFsStore()


def join_key(prefix: str, *parts: str) -> str:
    """Key concatenation that works for both plain paths and URIs —
    always '/'-joined (S3 keys and POSIX paths agree on that)."""
    out = prefix.rstrip("/")
    for p in parts:
        out = f"{out}/{p.strip('/')}"
    return out
