"""Per-process rate limiting for connector API calls.

SURVEY §7.5.5: API rate limits × Spark parallelism need a throttle — a
plugin backed by a rate-limited API must not get hammered by 32 executor
threads at once.  The plugin SDK's limiter is per-plugin-process with
configurable rates; the analog here is a process-wide token bucket keyed
by (connector class, config), shared by every scan thread in that worker.

Connection-config keys (read by :meth:`Connector.throttle`):
- ``rate_limit_rps``: sustained calls/second budget for this connection,
  **per executor process** — cluster-wide rate = rps × python workers, so
  size it as (api_budget / expected_workers).
- ``rate_limit_burst``: bucket capacity (default: max(rps, 1)) — short
  bursts up to this many calls pass without waiting.

Blocking happens in the executor's Python worker thread — Spark tasks
simply take longer, backpressuring the scan to the API's pace instead of
erroring.
"""

from __future__ import annotations

import threading
import time


class TokenBucket:
    """Thread-safe token bucket: ``acquire()`` blocks until a token is
    available at the configured refill rate."""

    def __init__(self, rate_per_s: float, burst: float | None = None):
        if rate_per_s <= 0:
            raise ValueError("rate_per_s must be positive")
        self.rate = float(rate_per_s)
        self.capacity = float(burst) if burst else max(self.rate, 1.0)
        self._tokens = self.capacity
        self._last = time.monotonic()
        self._lock = threading.Lock()

    def _refill(self) -> None:
        now = time.monotonic()
        self._tokens = min(self.capacity, self._tokens + (now - self._last) * self.rate)
        self._last = now

    def try_acquire(self, n: float = 1.0) -> bool:
        with self._lock:
            self._refill()
            if self._tokens >= n:
                self._tokens -= n
                return True
            return False

    def acquire(self, n: float = 1.0) -> float:
        """Block until ``n`` tokens are available; returns seconds waited."""
        waited = 0.0
        while True:
            with self._lock:
                self._refill()
                if self._tokens >= n:
                    self._tokens -= n
                    return waited
                need = (n - self._tokens) / self.rate
            time.sleep(need)
            waited += need


_BUCKETS: dict[tuple, TokenBucket] = {}
_SHARES: dict[tuple, float] = {}
_REGISTRY_LOCK = threading.Lock()


def bucket_for(key: tuple, rate_per_s: float, burst: float | None = None) -> TokenBucket:
    """Process-wide bucket registry: every scan thread of the same
    (connector, config) shares one budget."""
    with _REGISTRY_LOCK:
        b = _BUCKETS.get(key)
        if b is None or b.rate != float(rate_per_s):
            b = TokenBucket(rate_per_s, burst)
            _BUCKETS[key] = b
        return b


def cached_share(key: tuple, value: float) -> float:
    """First-computed global-scope rate share per (connection, table),
    pinned for the process lifetime.  Required-qual connectors can't
    answer the unpruned partitions() probe, so the share falls back to
    the PRUNED count — which varies scan-to-scan with the quals; since
    the applied rate is part of the bucket key, every distinct rate
    would open a separate bucket with a fresh burst for the same shard
    (ADVICE r13).  Pinning the first-computed share keeps one rate — and
    therefore one long-lived bucket — per shard within a process."""
    with _REGISTRY_LOCK:
        return _SHARES.setdefault(key, value)
