"""Cloud storage: quota-limited, size-capped, asynchronous (fire-and-poll).

Reference behavior: `/root/reference/src/storage/gcp.rs` — 100 KiB per
file (:13), 1 MiB user quota (:16), pre-flight size/quota checks on write
(:269-292), REST requests on background threads.

The REST transport is a pluggable `backend` (get/put/delete/list_keys) —
this build ships `MemoryCloudBackend` (in-memory dict with an optional
artificial latency) because the target environment has zero egress; a
real GCS backend plugs in without touching CloudStorage.
"""

from __future__ import annotations

import threading
import time
from typing import Dict, List, Optional

from .core import StorageError, StorageHandle

MAX_FILE_SIZE = 100 * 1024   # gcp.rs:13
USER_QUOTA = 1024 * 1024     # gcp.rs:16


class MemoryCloudBackend:
    """Thread-safe in-memory object store standing in for GCS."""

    def __init__(self, latency_s: float = 0.0):
        self.latency_s = latency_s
        self._lock = threading.Lock()
        self._objects: Dict[str, bytes] = {}

    def _wait(self):
        if self.latency_s > 0:
            time.sleep(self.latency_s)

    def get(self, key: str) -> bytes:
        self._wait()
        with self._lock:
            if key not in self._objects:
                raise StorageError.not_found(key)
            return self._objects[key]

    def put(self, key: str, data: bytes) -> None:
        self._wait()
        with self._lock:
            self._objects[key] = bytes(data)

    def delete(self, key: str) -> None:
        self._wait()
        with self._lock:
            self._objects.pop(key, None)

    def list_keys(self, prefix: str) -> List[str]:
        self._wait()
        with self._lock:
            return sorted(k for k in self._objects if k.startswith(prefix))

    def total_bytes(self) -> int:
        with self._lock:
            return sum(len(v) for v in self._objects.values())


class CloudStorage:
    """gcp.rs:70 — quota-tracked async storage for `assets/userdata/*`."""

    def __init__(self, backend: Optional[MemoryCloudBackend] = None):
        self.backend = backend if backend is not None \
            else MemoryCloudBackend()

    def quota_used(self) -> int:
        return self.backend.total_bytes()

    def quota_limit(self) -> int:
        return USER_QUOTA

    def can_write(self) -> bool:
        """gcp.rs:97."""
        return self.quota_used() < USER_QUOTA

    def list(self, path: str) -> StorageHandle[List[str]]:
        prefix = path if path.endswith("/") else path + "/"
        return StorageHandle.spawn(
            lambda: [k[len(prefix):] for k in self.backend.list_keys(prefix)])

    def read(self, path: str) -> StorageHandle[bytes]:
        return StorageHandle.spawn(lambda: self.backend.get(path))

    def write(self, path: str, data: bytes) -> StorageHandle[None]:
        # pre-flight checks resolve immediately (gcp.rs:269-292)
        if len(data) > MAX_FILE_SIZE:
            return StorageHandle.error(
                StorageError.file_too_large(len(data), MAX_FILE_SIZE))
        used = self.quota_used()
        if used + len(data) > USER_QUOTA:
            return StorageHandle.error(
                StorageError.quota_exceeded(used, USER_QUOTA))
        return StorageHandle.spawn(lambda: self.backend.put(path, data))

    def delete(self, path: str) -> StorageHandle[None]:
        return StorageHandle.spawn(lambda: self.backend.delete(path))

    def exists(self, path: str) -> StorageHandle[bool]:
        def check():
            try:
                self.backend.get(path)
                return True
            except StorageError:
                return False
        return StorageHandle.spawn(check)
