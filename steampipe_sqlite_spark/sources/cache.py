"""TTL result cache for connector scans.

Parity with the reference's cache policy (B15, SURVEY.md §2.1):
- enabled by default; env ``STEAMPIPE_CACHE`` ("true"/"false") overrides
  (/root/reference/cache.go:11-21);
- TTL default 300 s (server-level default, /root/reference/register.go:17)
  capped by env ``STEAMPIPE_CACHE_MAX_TTL`` seconds
  (/root/reference/cache.go:23-33, default 10 h);
- bounded size (32 MB default, /root/reference/register.go:18) with LRU
  eviction.

Keyed exactly on (connection-config, table, quals, columns, limit,
partition); qual-subsumption (serving a subset query from a cached superset)
is future work, as in SURVEY.md §7.5.4.
"""

from __future__ import annotations

import os
import time
from collections import OrderedDict
from dataclasses import dataclass

import pyarrow as pa

DEFAULT_TTL_S = 300
DEFAULT_MAX_TTL_S = 36_000  # 10 h, reference constants.go:8
DEFAULT_MAX_BYTES = 32 * 1024 * 1024


def cache_enabled() -> bool:
    v = os.environ.get("STEAMPIPE_CACHE")
    if v is None:
        return True
    return v.strip().lower() not in ("false", "0", "off")


def cache_max_ttl_s() -> int:
    v = os.environ.get("STEAMPIPE_CACHE_MAX_TTL")
    if v is None:
        return DEFAULT_MAX_TTL_S
    try:
        return max(int(v), 1)
    except ValueError:
        return DEFAULT_MAX_TTL_S


@dataclass
class _Entry:
    batches: list[pa.RecordBatch]
    nbytes: int
    expires_at: float


class ScanCache:
    """LRU + TTL cache of Arrow batches."""

    def __init__(self, ttl_s: int = DEFAULT_TTL_S, max_bytes: int = DEFAULT_MAX_BYTES):
        self.ttl_s = min(ttl_s, cache_max_ttl_s())
        self.max_bytes = max_bytes
        self._data: OrderedDict[tuple, _Entry] = OrderedDict()
        self._bytes = 0
        self.hits = 0
        self.misses = 0

    @staticmethod
    def key(
        connector_cls: str,
        config: str | None,
        table: str,
        quals: tuple,
        columns: tuple | None,
        limit: int | None,
        partition: int = 0,
    ) -> tuple:
        # connector_cls (module:Class path) disambiguates two connector
        # classes exposing a same-named table with identical config — the
        # shared per-process cache must never serve one the other's rows
        return (connector_cls, config, table, quals, columns, limit, partition)

    def get(self, key: tuple) -> list[pa.RecordBatch] | None:
        if not cache_enabled():
            return None
        entry = self._data.get(key)
        if entry is None:
            self.misses += 1
            return None
        if entry.expires_at < time.monotonic():
            self._evict(key)
            self.misses += 1
            return None
        self._data.move_to_end(key)
        self.hits += 1
        return entry.batches

    def put(self, key: tuple, batches: list[pa.RecordBatch]) -> None:
        if not cache_enabled():
            return
        nbytes = sum(b.nbytes for b in batches)
        if nbytes > self.max_bytes:
            return
        if key in self._data:
            self._evict(key)
        self._data[key] = _Entry(batches, nbytes, time.monotonic() + self.ttl_s)
        self._bytes += nbytes
        while self._bytes > self.max_bytes and self._data:
            oldest = next(iter(self._data))
            self._evict(oldest)

    def _evict(self, key: tuple) -> None:
        entry = self._data.pop(key, None)
        if entry is not None:
            self._bytes -= entry.nbytes

    def clear(self) -> None:
        self._data.clear()
        self._bytes = 0
