"""Rate limiting: the SURVEY §7.5.5 throttle — API budgets must hold even
when Spark fans a scan across many threads/partitions."""

import threading
import time

import pytest

from steampipe_sqlite_spark.sources.chaos import ChaosConnector
from steampipe_sqlite_spark.sources.ratelimit import TokenBucket, bucket_for


class TestTokenBucket:
    def test_burst_passes_immediately(self):
        b = TokenBucket(rate_per_s=10, burst=5)
        t0 = time.monotonic()
        for _ in range(5):
            b.acquire()
        assert time.monotonic() - t0 < 0.05

    def test_sustained_rate_enforced(self):
        b = TokenBucket(rate_per_s=100, burst=1)
        t0 = time.monotonic()
        for _ in range(11):
            b.acquire()
        elapsed = time.monotonic() - t0
        assert elapsed >= 0.095  # 10 refills @ 100/s ≥ 0.1 s (timer slack)

    def test_try_acquire_never_blocks(self):
        b = TokenBucket(rate_per_s=1, burst=1)
        assert b.try_acquire()
        t0 = time.monotonic()
        assert not b.try_acquire()
        assert time.monotonic() - t0 < 0.05

    def test_threads_share_budget(self):
        b = TokenBucket(rate_per_s=200, burst=1)
        t0 = time.monotonic()
        threads = [threading.Thread(target=b.acquire) for _ in range(21)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert time.monotonic() - t0 >= 0.095  # 20 refills @ 200/s

    def test_rejects_nonpositive_rate(self):
        with pytest.raises(ValueError):
            TokenBucket(0)

    def test_registry_shares_by_key(self):
        b1 = bucket_for(("m", "C", "cfg-a"), 50)
        b2 = bucket_for(("m", "C", "cfg-a"), 50)
        b3 = bucket_for(("m", "C", "cfg-b"), 50)
        assert b1 is b2 and b1 is not b3


class TestConnectorThrottle:
    def test_unconfigured_is_free(self):
        c = ChaosConnector()
        assert c.throttle() == 0.0

    def test_configured_rps_blocks(self):
        c = ChaosConnector()
        c.set_config('{"rate_limit_rps": 100, "rate_limit_burst": 1}')
        t0 = time.monotonic()
        for _ in range(6):
            c.throttle()
        assert time.monotonic() - t0 >= 0.045  # 5 refills @ 100/s

    def test_hcl_config_works_too(self):
        c = ChaosConnector()
        c.set_config("rate_limit_rps = 100\nrate_limit_burst = 1")
        c.throttle()
        waited = c.throttle()
        assert waited > 0.0


class TestRetry:
    """SDK RetryHydrate analog: whole-scan retry with exponential backoff,
    gated on the connector's retriable-error taxonomy."""

    def _reader(self, conn):
        from steampipe_sqlite_spark.sources import datasource as ds

        ds._SCAN_CACHE.clear()
        table = conn.get_schema().table("all_types")
        return ds.ConnectorReader(conn, table, {})

    def test_transient_failures_retried_to_success(self):
        class Flaky(ChaosConnector):
            calls = 0

            def execute(self, *a, **kw):
                Flaky.calls += 1
                if Flaky.calls <= 2:
                    raise ConnectionError("transient")
                yield from super().execute(*a, **kw)

        conn = Flaky()
        conn.set_config('{"retry_attempts": 3, "retry_min_backoff_ms": 1}')
        r = self._reader(conn)
        rows = [x for b in r.read(r.partitions()[0]) for x in b.to_pylist()]
        assert Flaky.calls == 3 and len(rows) > 0

    def test_non_retriable_error_raises_immediately(self):
        class Broken(ChaosConnector):
            calls = 0

            def execute(self, *a, **kw):
                Broken.calls += 1
                raise ValueError("logic bug")
                yield  # pragma: no cover

        conn = Broken()
        conn.set_config('{"retry_attempts": 5, "retry_min_backoff_ms": 1}')
        r = self._reader(conn)
        with pytest.raises(ValueError):
            list(r.read(r.partitions()[0]))
        assert Broken.calls == 1

    def test_attempts_exhausted_raises_last_error(self):
        class AlwaysDown(ChaosConnector):
            calls = 0

            def execute(self, *a, **kw):
                AlwaysDown.calls += 1
                raise TimeoutError("down")
                yield  # pragma: no cover

        conn = AlwaysDown()
        conn.set_config('{"retry_attempts": 2, "retry_min_backoff_ms": 1}')
        r = self._reader(conn)
        with pytest.raises(TimeoutError):
            list(r.read(r.partitions()[0]))
        assert AlwaysDown.calls == 3  # first + 2 retries

    def test_backoff_waits_between_attempts(self):
        class SlowFail(ChaosConnector):
            calls = 0

            def execute(self, *a, **kw):
                SlowFail.calls += 1
                if SlowFail.calls <= 2:
                    raise ConnectionError("x")
                yield from super().execute(*a, **kw)

        conn = SlowFail()
        conn.set_config('{"retry_attempts": 2, "retry_min_backoff_ms": 40}')
        r = self._reader(conn)
        t0 = time.monotonic()
        list(r.read(r.partitions()[0]))
        assert time.monotonic() - t0 >= 0.115  # 40 ms + 80 ms backoffs

    def test_no_retry_config_streams_unbuffered(self):
        conn = ChaosConnector()
        assert conn.retry_policy() is None

    def test_retries_still_apply_when_cache_disabled(self):
        """Caching and retries are orthogonal (reference SDK): cache=false
        must skip only the cache get/put, not the RetryHydrate backoff
        (ADVICE r3 — the cache-disabled branch used to bypass retry)."""

        class FlakyNoCache(ChaosConnector):
            calls = 0

            def execute(self, *a, **kw):
                FlakyNoCache.calls += 1
                if FlakyNoCache.calls <= 2:
                    raise ConnectionError("transient")
                yield from super().execute(*a, **kw)

        conn = FlakyNoCache()
        conn.set_config(
            '{"cache": false, "retry_attempts": 3, "retry_min_backoff_ms": 1}'
        )
        r = self._reader(conn)
        rows = [x for b in r.read(r.partitions()[0]) for x in b.to_pylist()]
        assert FlakyNoCache.calls == 3 and len(rows) > 0
        # and the scan really did bypass the cache: a second read hits the
        # connector again instead of being served from _SCAN_CACHE
        rows2 = [x for b in r.read(r.partitions()[0]) for x in b.to_pylist()]
        assert FlakyNoCache.calls == 4 and rows2 == rows
