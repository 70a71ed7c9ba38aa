"""Paged-HTTP connector e2e (VERDICT r12 #5): the cloud-API access
pattern — opaque page tokens, per-page throttle, injectable 429s —
driven through ratelimit + retry + cache under real executor
parallelism, with exact call accounting from the connector's
atomic-append call log.

The reference's cursor streams from the plugin SDK's paged Execute
(/root/reference/cursor.go:39-59); these tests prove the bridge speaks
that protocol shape: total connector calls == pages x partitions, the
retry replay arithmetic is exact, the throttle bounds per-process
request rate, and a partition_id qual prunes whole token chains at the
API level."""

import json
import os

import pytest

from steampipe_sqlite_spark.engine import Engine
from steampipe_sqlite_spark.sources.pagedhttp import (
    PagedHttpConnector,
    _parse_token,
    _token,
)

PAGED = "steampipe_sqlite_spark.sources.pagedhttp:PagedHttpConnector"


def _log(path):
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def _reader(conn, quals=(), options=None):
    from steampipe_sqlite_spark.sources import datasource as ds

    ds._SCAN_CACHE.clear()
    table = conn.get_schema().table("items")
    r = ds.ConnectorReader(conn, table, options or {})
    r.quals = list(quals)
    return r


class TestTokenChain:
    def test_token_roundtrip_and_tamper_detection(self):
        assert _parse_token(_token(3, 7)) == (3, 7)
        with pytest.raises(ValueError, match="invalid page token"):
            _parse_token("3:8:deadbeef")  # fabricated continuation

    def test_field_mask_skips_unrequested_payload_synthesis(self):
        """Server-side field mask (optimization r14): a projected execute
        must not synthesize the expensive payload fields (item_id
        f-string, value round) it was not asked for, while a masked
        fetch's values stay bit-identical to the unmasked fetch's for
        the fields it does return."""
        con = PagedHttpConnector(json.dumps({"n_partitions": 1, "n_pages": 1, "page_size": 4}))
        full_rows, _ = con._fetch_page(0, None)
        masked_rows, _ = con._fetch_page(0, None, {"seq", "partition_id", "page"})
        assert set(masked_rows[0]) == {"seq", "partition_id", "page"}
        for fr, mr in zip(full_rows, masked_rows):
            assert {k: fr[k] for k in mr} == mr
        # qual columns ride the mask even when not projected (advisory
        # page filtering reads them from the row dicts)
        val_rows, _ = con._fetch_page(0, None, {"seq", "value"})
        assert set(val_rows[0]) == {"seq", "partition_id", "page", "value"}
        assert [r["value"] for r in val_rows] == [r["value"] for r in full_rows]
        # end-to-end: a projected execute's batches carry only the
        # requested columns, values identical to the unprojected scan
        batches = list(con.execute("items", [], ["seq", "page"], None))
        assert batches[0].schema.names == ["seq", "page"]
        full = list(con.execute("items", [], None, None))
        assert batches[0].column("seq").to_pylist() == full[0].column("seq").to_pylist()

    def test_spark_scan_calls_equal_pages_times_partitions(self, spark, tmp_path):
        """The headline contract: a full parallel scan walks every
        partition's token chain exactly once — total fetches ==
        pages x partitions, each page fetched on attempt 1, pages
        sequential per chain (a token chain cannot be skipped into)."""
        log = str(tmp_path / "calls.jsonl")
        eng = Engine(spark)
        eng.load(PAGED)
        eng.configure(
            "paged",
            json.dumps(
                {
                    "n_partitions": 4,
                    "n_pages": 5,
                    "page_size": 20,
                    "call_log": log,
                }
            ),
        )
        row = eng.sql(
            "SELECT COUNT(*) AS n, COUNT(DISTINCT item_id) AS d, "
            "COUNT(DISTINCT partition_id) AS p FROM paged_items"
        ).first()
        assert (row.n, row.d, row.p) == (4 * 5 * 20, 4 * 5 * 20, 4)
        calls = _log(log)
        assert len(calls) == 4 * 5, "total connector calls != pages x partitions"
        assert all(c["attempt"] == 1 for c in calls)
        for part in range(4):
            chain = [c["page"] for c in calls if c["partition"] == part]
            assert chain == [0, 1, 2, 3, 4], f"partition {part} chain {chain}"

    def test_429_retry_replay_arithmetic_is_exact(self, spark, tmp_path):
        """First fetch of (partition 1, page 2) raises 429; the
        whole-scan retry (SDK RetryHydrate shape) replays that chain
        from page 0.  Exact accounting: partition 1 logs pages [0,1,2]
        then [0,1,2,3,4] = 8 fetches; the other three chains log 5
        each; rows are complete and unduplicated."""
        log = str(tmp_path / "calls.jsonl")
        eng = Engine(spark)
        eng.load(PAGED)
        eng.configure(
            "paged",
            json.dumps(
                {
                    "n_partitions": 4,
                    "n_pages": 5,
                    "page_size": 10,
                    "call_log": log,
                    "fail_page_fetches": [[1, 2]],
                    "retry_attempts": 2,
                    "retry_min_backoff_ms": 1,
                }
            ),
        )
        row = eng.sql(
            "SELECT COUNT(*) AS n, COUNT(DISTINCT item_id) AS d FROM paged_items"
        ).first()
        assert (row.n, row.d) == (200, 200)  # complete, no duplicates
        calls = _log(log)
        assert len(calls) == 3 * 5 + 8
        p1 = [c["page"] for c in calls if c["partition"] == 1]
        assert sorted(p1) == [0, 0, 1, 1, 2, 2, 3, 4]
        failed = [c for c in calls if c["partition"] == 1 and c["page"] == 2]
        assert [c["attempt"] for c in failed] == [1, 2]  # 429 then success

    def test_partition_qual_prunes_whole_token_chains(self, spark, tmp_path):
        """WHERE partition_id = 2 must reach partitions() and prune the
        other chains BEFORE any fetch — the API-level analog of region
        pruning: 5 calls, all partition 2."""
        log = str(tmp_path / "calls.jsonl")
        eng = Engine(spark)
        eng.load(PAGED)
        eng.configure(
            "paged",
            json.dumps(
                {
                    "n_partitions": 4,
                    "n_pages": 5,
                    "page_size": 10,
                    "call_log": log,
                }
            ),
        )
        rows = eng.sql(
            "SELECT COUNT(*) AS n FROM paged_items WHERE partition_id = 2"
        ).first()
        assert rows.n == 50
        calls = _log(log)
        assert len(calls) == 5
        assert {c["partition"] for c in calls} == {2}


class TestThrottleAndCache:
    def test_throttle_bounds_per_process_page_rate(self):
        """rate_limit_rps spaces the page fetches: 6 pages at 50 rps
        with burst 1 must take >= 5/50 s of bucket waiting.  Driven at
        the reader level (one process) because the token-bucket budget
        is per-process by design — at cluster scale each executor gets
        its own slice, as the SDK's per-process limiter does."""
        import time as _t

        conn = PagedHttpConnector(
            json.dumps(
                {
                    "n_partitions": 1,
                    "n_pages": 6,
                    "page_size": 5,
                    "rate_limit_rps": 50,
                    "rate_limit_burst": 1,
                }
            )
        )
        r = _reader(conn)
        t0 = _t.perf_counter()
        rows = [x for b in r.read(r.partitions()[0]) for x in b.to_pylist()]
        elapsed = _t.perf_counter() - t0
        assert len(rows) == 30
        # 6 page debits + 1 scan debit, burst 1 -> >= 6 waits of 20 ms
        assert elapsed >= 0.8 * 6 / 50, f"throttle not honored: {elapsed:.3f}s"

    def test_global_scope_divides_budget_across_partitions(self):
        """rate_limit_scope=global: the planner stamps rate_share=1/n on
        each partition and throttle() enforces rps x share per-partition
        — so the CLUSTER-wide total stays at rps even when every worker
        process has its own bucket.  With 2 partitions at 40 rps, one
        partition's 6-page chain runs at 20 rps: >= 5/20 s (the same
        chain under process scope needs only >= 5/40 s)."""
        import time as _t

        cfg = {
            "n_partitions": 2,
            "n_pages": 6,
            "page_size": 5,
            "rate_limit_rps": 40,
            "rate_limit_burst": 1,
            "rate_limit_scope": "global",
        }
        conn = PagedHttpConnector(json.dumps(cfg))
        r = _reader(conn)
        parts = r.partitions()
        assert [p.info["rate_share"] for p in parts] == [0.5, 0.5]
        t0 = _t.perf_counter()
        rows = [x for b in r.read(parts[0]) for x in b.to_pylist()]
        elapsed = _t.perf_counter() - t0
        assert len(rows) == 30
        assert elapsed >= 0.8 * 6 / 20, (
            f"global scope must halve the 2-partition rate: {elapsed:.3f}s"
        )
        # partitions draw from SEPARATE buckets (shares are additive):
        # the other chain is not starved by the first one's debits
        t0 = _t.perf_counter()
        [x for b in r.read(parts[1]) for x in b.to_pylist()]
        second = _t.perf_counter() - t0
        assert second <= 2.5 * elapsed  # same budget, not a shared-deficit stall

    def test_global_share_is_stable_under_pruning(self):
        """The per-partition budget share derives from the UNPRUNED shard
        count: a qual-pruned scan must stamp the SAME share (and thus the
        same per-partition bucket rate) as a full scan — a differing rate
        would make bucket_for rebuild the live bucket with a fresh burst,
        defeating the budget (code-review r13)."""
        from steampipe_sqlite_spark.sources.connector import Qual

        cfg = {
            "n_partitions": 4,
            "n_pages": 2,
            "page_size": 5,
            "rate_limit_rps": 40,
            "rate_limit_scope": "global",
        }
        conn = PagedHttpConnector(json.dumps(cfg))
        full = _reader(conn).partitions()
        assert [p.info["rate_share"] for p in full] == [0.25] * 4
        pruned = _reader(
            conn, quals=[Qual("partition_id", "in", [1, 2])]
        ).partitions()
        assert [p.info["rate_share"] for p in pruned] == [0.25, 0.25]
        assert [p.index for p in pruned] == [1, 2]

    def test_concurrent_partitionless_scans_share_one_budget(self):
        """VERDICT r13 #4: partitionless calls (streaming cursors, direct
        execute) of ONE connection all draw from ONE shared full-rps
        bucket — N concurrent partitionless scans stay at rps COMBINED,
        they do not each take the full budget."""
        import threading
        import time as _t

        cfg = {
            "n_partitions": 1,
            "n_pages": 2,
            "page_size": 5,
            "rate_limit_rps": 50,
            "rate_limit_burst": 1,
            "rate_limit_scope": "global",
        }
        # distinct config string -> fresh bucket (the registry is
        # process-global and keyed by config)
        conn_a = PagedHttpConnector(json.dumps({**cfg, "tag": "shared-budget"}))
        conn_b = PagedHttpConnector(json.dumps({**cfg, "tag": "shared-budget"}))
        assert getattr(conn_a, "_current_partition", None) is None

        def drain(c):
            for _ in range(5):
                c.throttle()

        t0 = _t.perf_counter()
        threads = [
            threading.Thread(target=drain, args=(c,)) for c in (conn_a, conn_b)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        elapsed = _t.perf_counter() - t0
        # 10 debits total, burst 1 -> >= 9 refills @ 50/s = 0.18 s; two
        # INDEPENDENT buckets would finish in ~4 refills' time each
        # (0.08 s) running concurrently
        assert elapsed >= 0.8 * 9 / 50, (
            f"partitionless scans must share one budget: {elapsed:.3f}s"
        )

    def test_partition_context_cleared_after_read(self):
        """ADVICE r14: ConnectorReader.read must clear the connector's
        partition context on exit, so a later partitionless execute on
        the SAME in-process instance takes the full-rps shared bucket
        instead of inheriting a stale partition's divided share."""
        cfg = {
            "n_partitions": 2,
            "n_pages": 1,
            "page_size": 5,
            "rate_limit_rps": 1000,
            "rate_limit_scope": "global",
        }
        conn = PagedHttpConnector(json.dumps({**cfg, "tag": "ctx-clear"}))
        r = _reader(conn)
        parts = r.partitions()
        list(r.read(parts[0]))
        assert getattr(conn, "_current_partition", None) is None

    def test_required_qual_share_pinned_for_process(self):
        """ADVICE r14: when the unpruned partitions() probe raises
        (required-qual connectors), the share falls back to the pruned
        count — which varies with the quals.  The FIRST computed share
        is pinned per (connection, table) so later scans with different
        pruning reuse the same rate (and thus the same long-lived
        buckets) instead of opening fresh-burst buckets per rate."""
        from steampipe_sqlite_spark.sources.connector import Qual

        class RequiredQualPaged(PagedHttpConnector):
            def partitions(self, table, quals):
                if not quals:
                    raise ValueError("partition_id qual required")
                return super().partitions(table, quals)

        cfg = {
            "n_partitions": 4,
            "n_pages": 1,
            "page_size": 5,
            "rate_limit_rps": 40,
            "rate_limit_scope": "global",
        }
        conn = RequiredQualPaged(json.dumps({**cfg, "tag": "pin-share"}))
        two = _reader(conn, quals=[Qual("partition_id", "in", [0, 1])]).partitions()
        assert [p.info["rate_share"] for p in two] == [0.5, 0.5]
        # a LATER wider scan would compute 1/3 — must reuse the pinned 1/2
        three = _reader(
            conn, quals=[Qual("partition_id", "in", [0, 1, 2])]
        ).partitions()
        assert [p.info["rate_share"] for p in three] == [0.5, 0.5, 0.5]

    def test_scan_cache_absorbs_identical_rescan(self, tmp_path):
        """Second identical scan in the same process must be served from
        the result cache: zero new page fetches in the call log."""
        log = str(tmp_path / "calls.jsonl")
        conn = PagedHttpConnector(
            json.dumps(
                {
                    "n_partitions": 1,
                    "n_pages": 4,
                    "page_size": 5,
                    "call_log": log,
                }
            )
        )
        r = _reader(conn)
        first = [x for b in r.read(r.partitions()[0]) for x in b.to_pylist()]
        assert len(_log(log)) == 4
        again = [x for b in r.read(r.partitions()[0]) for x in b.to_pylist()]
        assert again == first
        assert len(_log(log)) == 4, "cached rescan refetched pages"

    def test_paged_table_tails_as_a_stream(self, spark):
        """The streaming face of the bridge composes with the paged
        protocol unchanged: tailing paged_items by seq ranges walks the
        token chains per micro-batch (quals applied advisorily, the
        engine's offset window restores exactness) and the exhausted
        feed terminates processAllAvailable — every row exactly once."""
        eng = Engine(spark)
        eng.load(
            PAGED,
            config=json.dumps(
                {"n_partitions": 2, "n_pages": 3, "page_size": 10}
            ),
        )
        stream = eng.stream("paged", "items", batch_rows=25)
        assert stream.isStreaming
        q = (
            stream.writeStream.format("memory")
            .queryName("paged_stream_out")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        rows = spark.table("paged_stream_out").collect()
        assert len(rows) == 60
        assert {r.seq for r in rows} == set(range(60))

    def test_latency_is_paid_per_page(self):
        """page_latency_ms models the network RTT: 5 pages at 40 ms must
        take >= 0.16 s (scheduling slack aside) — the knob future probes
        use to emulate slow APIs."""
        import time as _t

        conn = PagedHttpConnector(
            json.dumps(
                {"n_partitions": 1, "n_pages": 5, "page_size": 2,
                 "page_latency_ms": 40}
            )
        )
        r = _reader(conn)
        t0 = _t.perf_counter()
        list(r.read(r.partitions()[0]))
        assert _t.perf_counter() - t0 >= 0.8 * 5 * 0.040
