"""Scale-toolkit proofs: bucketed joins skip the shuffle, salted shapes
preserve results, pre-partitioning reuses its exchange."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from steampipe_sqlite_spark.operators.scale import (
    prepartition_for_reuse,
    salted_groupby_agg,
    salted_join_skewed_left,
    table_is_bucketed,
    write_bucketed,
)
from steampipe_sqlite_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def executed_plan(df):
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_is_shuffle_free(spark):
    import shutil

    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem")
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        loc = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        shutil.rmtree(f"{loc}/{t}", ignore_errors=True)
    write_bucketed(orders.select("o_orderkey", "o_totalprice"), "b_orders", "o_orderkey", 8)
    write_bucketed(
        lineitem.select("l_orderkey", "l_quantity"), "b_lineitem", "l_orderkey", 8
    )
    assert table_is_bucketed(spark, "b_orders")

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    try:
        joined = spark.table("b_orders").join(
            spark.table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = executed_plan(joined)
        assert "Exchange" not in plan, f"bucketed join shuffled:\n{plan[:2000]}"
        # result parity with the plain join
        plain = orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_salted_groupby_matches_plain(spark):
    events = load_table(spark, SF_DIR, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    plain = {
        (r.event_type, r.n, r.total)
        for r in events.withColumn("c", cents)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("c").alias("total"))
        .collect()
    }
    salted = {
        (r.event_type, r.n, r.total)
        for r in salted_groupby_agg(
            events.withColumn("c", cents),
            "event_type",
            {"n": "count:*", "total": "sum:c"},
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    lineitem = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_orderpriority")
    right = orders.withColumnRenamed("o_orderkey", "l_orderkey")
    plain = lineitem.join(right, "l_orderkey")
    salted = salted_join_skewed_left(lineitem, right, "l_orderkey", n_salts=8)
    assert salted.count() == plain.count()
    assert sorted(salted.columns) == sorted(plain.columns)


def test_salted_hot_keys_join_matches_plain(spark):
    """Targeted salting must be value-exact, not just count-exact: hot
    rows fan over n_salts, cold rows keep salt 0, and every (key, payload)
    pairing survives — compare full aggregate fingerprints per key."""
    from steampipe_sqlite_spark.operators.scale import salted_join_hot_keys

    lineitem = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_orderpriority")
    right = orders.withColumnRenamed("o_orderkey", "l_orderkey")
    hot = [r.l_orderkey for r in lineitem.groupBy("l_orderkey").count()
           .orderBy(F.desc("count")).limit(3).collect()]

    def fingerprint(df):
        return {
            (r.l_orderkey, r.n, r.q, r.p)
            for r in df.groupBy("l_orderkey")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("l_quantity") * 100).cast("long").alias("q"),
                F.sum(F.length("o_orderpriority")).alias("p"),
            )
            .collect()
        }

    plain = lineitem.join(right, "l_orderkey")
    salted = salted_join_hot_keys(lineitem, right, "l_orderkey", hot, n_salts=8)
    assert sorted(salted.columns) == sorted(plain.columns)
    assert fingerprint(salted) == fingerprint(plain)


def test_salted_hot_keys_left_join_matches_plain(spark):
    """how='left' (ADVICE r10): an unmatched left row carries exactly one
    salt and the right side is replicated across all salts for hot keys,
    so it surfaces once with nulls — both through the salted path and
    the empty-hot-set plain-join fallback."""
    from steampipe_sqlite_spark.operators.scale import salted_join_hot_keys

    lineitem = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    # drop half the orders so some left rows are unmatched
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_orderpriority")
    right = orders.withColumnRenamed("o_orderkey", "l_orderkey").filter(
        F.col("l_orderkey") % 2 == 0
    )
    hot = [r.l_orderkey for r in lineitem.groupBy("l_orderkey").count()
           .orderBy(F.desc("count")).limit(3).collect()]

    def fingerprint(df):
        return {
            (r.l_orderkey, r.n, r.matched)
            for r in df.groupBy("l_orderkey")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.count("o_orderpriority").alias("matched"),
            )
            .collect()
        }

    plain = lineitem.join(right, "l_orderkey", "left")
    salted = salted_join_hot_keys(
        lineitem, right, "l_orderkey", hot, n_salts=8, how="left"
    )
    assert fingerprint(salted) == fingerprint(plain)
    fallback = salted_join_hot_keys(lineitem, right, "l_orderkey", [], how="left")
    assert fingerprint(fallback) == fingerprint(plain)
    with pytest.raises(ValueError):
        salted_join_hot_keys(lineitem, right, "l_orderkey", hot, how="full")


def test_salted_hot_keys_right_join_matches_plain(spark):
    """how='right' (VERDICT r11 #6): the mirrored construction — right
    rows carry exactly one salt and the LEFT side is replicated across
    all salts for hot keys — so an unmatched right row surfaces once with
    nulls and matched multiplicities are exact.  The skewed fact table
    sits on the preserved (right) side here."""
    from steampipe_sqlite_spark.operators.scale import salted_join_hot_keys

    lineitem = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_orderpriority")
    left = orders.withColumnRenamed("o_orderkey", "l_orderkey").filter(
        F.col("l_orderkey") % 2 == 0
    )
    hot = [r.l_orderkey for r in lineitem.groupBy("l_orderkey").count()
           .orderBy(F.desc("count")).limit(3).collect()]

    def fingerprint(df):
        return {
            (r.l_orderkey, r.n, r.matched)
            for r in df.groupBy("l_orderkey")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.count("o_orderpriority").alias("matched"),
            )
            .collect()
        }

    plain = left.join(lineitem, "l_orderkey", "right")
    salted = salted_join_hot_keys(
        left, lineitem, "l_orderkey", hot, n_salts=8, how="right"
    )
    assert fingerprint(salted) == fingerprint(plain)
    fallback = salted_join_hot_keys(left, lineitem, "l_orderkey", [], how="right")
    assert fingerprint(fallback) == fingerprint(plain)


def test_prepartition_reuses_exchange(spark):
    events = load_table(spark, SF_DIR, "events")
    pre = prepartition_for_reuse(events, "user_id", 8)
    agg = pre.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    plan = executed_plan(agg).split("== Initial Plan ==")[0]
    # exactly the explicit repartition exchange; the groupBy rides it
    assert plan.count("Exchange") == 1, plan[:2000]


def test_aqe_splits_skewed_join(spark):
    """AQE skew-join handling (session.py enables it): a hot key whose
    shuffle partition dwarfs the median gets split across reducers —
    the runtime answer to skew that makes hand-salting optional."""
    left = spark.range(500_000).select(
        F.when(F.col("id") < 400_000, F.lit(0)).otherwise(F.col("id") % 64).alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.range(64).select(F.col("id").alias("k"), (F.col("id") * 10).alias("w"))
    conf = spark.conf
    old_bc = conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    # session.py auto-disables AQE below 1 GiB of input; this test drives
    # the ≥1 GiB behavior, so force it on (runtime-settable).
    old_aqe = conf.get("spark.sql.adaptive.enabled")
    old_parts = conf.get("spark.sql.shuffle.partitions")
    conf.set("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.shuffle.partitions", "32")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    try:
        joined = left.join(right, "k")
        n = sum(1 for _ in joined.toLocalIterator())
        assert n == 500_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin(skew=true)" in plan, "hot partition not split"
        assert "skewed" in plan, "no skewed AQEShuffleRead"
    finally:
        conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        conf.set("spark.sql.adaptive.enabled", old_aqe)
        conf.set("spark.sql.shuffle.partitions", old_parts)
        conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
        conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")


def test_compact_parquet_merges_small_files(spark, tmp_path):
    from steampipe_sqlite_spark.operators.scale import compact_parquet

    out = str(tmp_path / "small_files")
    events = load_table(spark, SF_DIR, "events")
    events.repartition(64).write.parquet(out)  # 64 tiny files
    import glob

    assert len(glob.glob(f"{out}/*.parquet")) == 64
    before = events.count()
    n_files = compact_parquet(spark, out, target_file_mb=128)
    assert n_files <= 2
    after = spark.read.parquet(out)
    assert after.count() == before
    assert sorted(after.columns) == sorted(events.columns)


class TestPartitionedSink:
    def test_write_prunes_and_bounds_files(self, spark, tmp_path):
        import glob
        from steampipe_sqlite_spark.operators.scale import write_partitioned_dataset

        df = spark.range(0, 1000).selectExpr(
            "id", "CASE WHEN id % 2 = 0 THEN 'en' ELSE 'fr' END AS lang"
        )
        out = str(tmp_path / "curated")
        write_partitioned_dataset(df, out, ["lang"], max_records_per_file=100)
        # hive layout: one directory per partition value
        assert sorted(
            p.split("=")[-1] for p in glob.glob(f"{out}/lang=*")
        ) == ["en", "fr"]
        # maxRecordsPerFile bounds each data file
        files = glob.glob(f"{out}/lang=en/*.parquet")
        assert len(files) >= 5  # 500 rows / 100 per file
        back = spark.read.parquet(out)
        assert back.count() == 1000
        # partition pruning: an en-only read plans only the en directory
        plan = back.filter("lang = 'en'")._jdf.queryExecution().executedPlan().toString()
        assert "lang=fr" not in plan


class TestDistributedRowNumber:
    """distributed_row_number: global ROW_NUMBER parity WITHOUT the
    single-partition WindowExec (the empty-OVER form's scale killer)."""

    def test_parity_with_window_form(self, spark):
        from pyspark.sql import functions as F

        from steampipe_sqlite_spark.operators.scale import distributed_row_number

        df = spark.range(0, 5000).selectExpr("id", "(id * 37) % 1000 AS v")
        got = distributed_row_number(
            df, [F.col("v").desc(), F.col("id")], name="rn", num_partitions=8
        )
        expected = df.selectExpr(
            "id", "v", "ROW_NUMBER() OVER (ORDER BY v DESC, id) AS rn"
        )
        assert {(r.id, r.rn) for r in got.collect()} == {
            (r.id, r.rn) for r in expected.collect()
        }

    def test_no_single_partition_sort(self, spark):
        from pyspark.sql import functions as F

        from steampipe_sqlite_spark.operators.scale import distributed_row_number

        df = spark.range(0, 5000).selectExpr("id", "id % 97 AS v")
        got = distributed_row_number(df, [F.col("v"), F.col("id")], num_partitions=8)
        # the work is spread: the pre-offset data really lives in >1
        # partition (the empty-OVER window would collapse to exactly 1)
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "rangepartitioning" in plan
        assert "SinglePartition" not in plan
        # and rn is a correct total sequence
        rns = [r.rn for r in got.orderBy("rn").collect()]
        assert rns == list(range(1, 5001))

    def test_broadcast_offsets_path_identical(self, spark, monkeypatch):
        """Beyond _OFFSETS_BROADCAST_THRESHOLD partitions the offsets
        attach via broadcast equi-join on _pid instead of a create_map
        literal (VERDICT r11 #4 — the literal is O(num_partitions) plan
        nodes, unreachable headroom at 100 TB split counts).  Force the
        broadcast path and prove output identity for both helpers, and
        that the plan carries a broadcast exchange but no map literal."""
        from pyspark.sql import functions as F

        from steampipe_sqlite_spark.operators import scale
        from steampipe_sqlite_spark.operators.scale import (
            distributed_row_number,
            distributed_running_sum,
        )

        df = spark.range(0, 5000).selectExpr(
            "id", "(id * 37) % 1000 AS v", "id % 13 AS w"
        )
        lit_rn = distributed_row_number(
            df, [F.col("v"), F.col("id")], name="rn", num_partitions=8
        )
        lit_cum = distributed_running_sum(
            df, "w", [F.col("v"), F.col("id")], name="cum", num_partitions=8
        )
        lit_rows = {(r.id, r.rn) for r in lit_rn.collect()}
        lit_cums = {(r.id, r.cum) for r in lit_cum.collect()}
        spark.catalog.clearCache()

        monkeypatch.setattr(scale, "_OFFSETS_BROADCAST_THRESHOLD", 0)
        bc_rn = distributed_row_number(
            df, [F.col("v"), F.col("id")], name="rn", num_partitions=8
        )
        bc_cum = distributed_running_sum(
            df, "w", [F.col("v"), F.col("id")], name="cum", num_partitions=8
        )
        plan = bc_rn._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
        assert "map_from" not in plan and "keys:" not in plan
        assert {(r.id, r.rn) for r in bc_rn.collect()} == lit_rows
        assert {(r.id, r.cum) for r in bc_cum.collect()} == lit_cums

    def test_reserved_working_names_rejected(self, spark):
        """Inputs already carrying _pid/_off (or the output name) would be
        silently overwritten then dropped by the two-phase composition —
        the same corruption class zorder_values guards against; both
        helpers must raise instead (code-review r12)."""
        import pytest

        from steampipe_sqlite_spark.operators.scale import (
            distributed_row_number,
            distributed_running_sum,
        )

        df_off = spark.range(10).selectExpr("id", "id * 2 AS _off")
        with pytest.raises(ValueError, match="_off"):
            distributed_row_number(df_off, ["id"], num_partitions=2)
        df_pid = spark.range(10).selectExpr("id", "id AS _pid", "id AS w")
        with pytest.raises(ValueError, match="_pid"):
            distributed_running_sum(df_pid, "w", ["id"], num_partitions=2)
        df_name = spark.range(10).selectExpr("id", "id AS rn")
        with pytest.raises(ValueError, match="rn"):
            distributed_row_number(df_name, ["id"], name="rn", num_partitions=2)

    def test_persist_handle_released(self, spark):
        """The ranged intermediate must expose its owner handle so callers
        can reclaim cache memory once done (ADVICE r3: persist without a
        cleanup path leaks for the session lifetime)."""
        from pyspark.sql import functions as F

        from steampipe_sqlite_spark.operators.scale import distributed_row_number

        df = spark.range(0, 1000).selectExpr("id", "id % 7 AS v")
        got = distributed_row_number(df, [F.col("v"), F.col("id")], num_partitions=4)
        got.collect()
        handle = got._sgs_persisted
        assert handle.storageLevel.useMemory
        handle.unpersist(blocking=True)
        assert not handle.storageLevel.useMemory


class TestHelperQueriesBypassPlanCache:
    """Queries built on the distributed helpers bake partition offsets
    (computed from a persisted range shuffle) into plan literals, so a
    registry-CACHED DataFrame re-executed after clearCache would resample
    boundaries under stale offsets — silently wrong ranks.  Those queries
    register with plan_cache=False: every call rebuilds, which recomputes
    offsets from a fresh persist and makes cache clears safe."""

    def test_helper_query_rebuilds_and_survives_clear(self, spark):
        from steampipe_sqlite_spark.plans.registry import collect

        queries, _ = collect()
        sf = "/root/testdata/sf0.001"
        a = queries["stats_gini_spend"](spark, sf)
        first = a.collect()
        spark.catalog.clearCache()
        b = queries["stats_gini_spend"](spark, sf)
        assert a is not b, "helper-based query must not return a cached plan"
        assert b.collect() == first
        # a plain query stays plan-cached (the perf contract is unchanged)
        c = queries["tpch_q6"](spark, sf)
        assert queries["tpch_q6"](spark, sf) is c

    def test_rebuild_releases_previous_persists(self, spark):
        """ADVICE r7 / VERDICT r7 #3: re-invoking a plan_cache=False query
        must NOT accumulate persisted RDDs — the registry claims each
        build's operator persists (operators.scale ledger) and unpersists
        the previous build's when rebuilding.  rfm_segmentation is the
        worst case: three CHAINED distributed_row_number calls = 3 ranged
        persists per build."""
        from steampipe_sqlite_spark.plans.registry import collect

        queries, _ = collect()
        sf = "/root/testdata/sf0.001"
        q = queries["rfm_segmentation"]
        assert not getattr(q, "__plan_cache__", True)
        jsc = spark.sparkContext._jsc

        q(spark, sf).collect()
        after_first = jsc.getPersistentRDDs().size()
        for _ in range(3):
            q(spark, sf).collect()
        after_repeats = jsc.getPersistentRDDs().size()
        assert after_repeats <= after_first, (
            f"persisted RDDs grew across rebuilds: {after_first} -> "
            f"{after_repeats} (previous build's handles not released)"
        )

    def test_chained_helpers_carry_all_owner_handles(self, spark):
        """A helper built on another helper's result must expose EVERY
        upstream persisted handle (_sgs_persisted_all), so releasing the
        final frame reclaims the whole chain (ADVICE r7: rfm's d1/d2
        intermediates leaked when only the last handle survived)."""
        from pyspark.sql import functions as F

        from steampipe_sqlite_spark.operators.scale import distributed_row_number

        df = spark.range(0, 2000).selectExpr("id", "id % 13 AS v")
        d1 = distributed_row_number(df, [F.col("v"), F.col("id")], name="r1",
                                    num_partitions=4)
        d2 = distributed_row_number(d1, [F.col("id")], name="r2",
                                    num_partitions=4)
        d2.collect()
        handles = d2._sgs_persisted_all
        assert len(handles) == 2
        assert all(h.storageLevel.useMemory for h in handles)
        for h in handles:
            h.unpersist(blocking=True)
        assert all(not h.storageLevel.useMemory for h in handles)


class TestDistributedRunningSum:
    """distributed_running_sum: global prefix-sum parity WITHOUT the
    single-partition WindowExec (same two-phase shape as row_number)."""

    def test_parity_with_window_form(self, spark):
        from steampipe_sqlite_spark.operators.scale import distributed_running_sum

        df = spark.range(0, 5000).selectExpr("id", "(id * 37) % 100 + 1 AS w")
        got = distributed_running_sum(df, "w", ["id"], name="cum", num_partitions=8)
        expected = df.selectExpr(
            "id",
            "CAST(SUM(w) OVER (ORDER BY id ROWS UNBOUNDED PRECEDING) AS BIGINT)"
            " AS cum",
        )
        assert {(r.id, r.cum) for r in got.collect()} == {
            (r.id, r.cum) for r in expected.collect()
        }

    def test_no_single_partition_window(self, spark):
        from steampipe_sqlite_spark.operators.scale import distributed_running_sum

        df = spark.range(0, 5000).selectExpr("id", "id % 13 + 1 AS w")
        got = distributed_running_sum(df, "w", ["id"], num_partitions=8)
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "rangepartitioning" in plan
        assert "SinglePartition" not in plan
        got._sgs_persisted.unpersist(blocking=True)


def test_gapfill_locf_semantics(spark):
    """Gap-filled series invariants: dense grid (hours x keys), gaps carry
    the previous observed value, non-gaps equal their own bucket total,
    leading gaps stay NULL."""
    from steampipe_sqlite_spark.operators.temporal import gapfill_locf
    from steampipe_sqlite_spark.tables import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    out = gapfill_locf(events, "ts", "event_type", "value").orderBy("k", "bucket")
    rows = out.collect()
    hours = {r.bucket for r in rows}
    keys = {r.k for r in rows}
    assert len(rows) == len(hours) * len(keys), "grid must be dense"
    prev = {}
    for r in rows:
        if r.is_gap:
            expected = prev.get(r.k)  # None before the first observation
            assert r.v_filled == expected, (r.k, r.bucket, r.v_filled, expected)
        else:
            assert r.v_filled is not None
            prev[r.k] = r.v_filled


class TestZorder:
    def test_zorder_clusters_both_columns_and_preserves_rows(self, spark, tmp_path):
        import glob

        import pyarrow.parquet as pq

        from steampipe_sqlite_spark.operators.scale import zorder_write

        events = load_table(spark, SF_DIR, "events").select(
            "event_id", "user_id", "value"
        )
        out = str(tmp_path / "zorder")
        zorder_write(events, ["user_id", "value"], out, files=8, bits=8)

        # rows unchanged (layout-only transform)
        back = spark.read.parquet(out)
        assert back.count() == events.count()
        assert (
            back.select(F.sum("event_id")).first()[0]
            == events.select(F.sum("event_id")).first()[0]
        )

        # per-file min/max spread: with 8 z-ordered files each file should
        # cover a narrow slice of BOTH dimensions (~sqrt(1/8) of the domain
        # per column); an unclustered layout covers ~100% of each.
        stats = {"user_id": [], "value": []}
        domain = {
            c: events.selectExpr(f"max({c}) - min({c})").first()[0]
            for c in stats
        }
        for path in glob.glob(f"{out}/*.parquet"):
            meta = pq.ParquetFile(path).metadata
            schema_names = [meta.schema.column(i).name for i in range(meta.num_columns)]
            for c in stats:
                idx = schema_names.index(c)
                lo = min(meta.row_group(g).column(idx).statistics.min for g in range(meta.num_row_groups))
                hi = max(meta.row_group(g).column(idx).statistics.max for g in range(meta.num_row_groups))
                stats[c].append((hi - lo) / domain[c])
        for c, spreads in stats.items():
            mean_spread = sum(spreads) / len(spreads)
            assert mean_spread < 0.6, f"{c}: files cover {mean_spread:.0%} of the domain on average"

    def test_reserved_internal_names_rejected(self, spark):
        """An input column named like the internal quantization columns
        (_q<i>/_b<i>/_z) would be silently overwritten and then dropped
        (ADVICE r11) — must raise instead of corrupting data."""
        import pytest

        from steampipe_sqlite_spark.operators.scale import zorder_values

        df = spark.range(10).selectExpr("id", "id * 2 AS _q0")
        with pytest.raises(ValueError, match="_q0"):
            zorder_values(df, ["id", "_q0"])
        df2 = spark.range(10).selectExpr("id", "id * 2 AS v", "id AS _z")
        with pytest.raises(ValueError, match="_z"):
            zorder_values(df2, ["id", "v"])
        # and clean inputs still work
        out = zorder_values(
            spark.range(10).selectExpr("id", "id * 3 AS v"), ["id", "v"], bits=2
        )
        assert out.columns == ["id", "v", "_z"]
        assert out.count() == 10


def test_every_distributed_helper_query_bypasses_plan_cache():
    """Enforcement for the silent-wrong-ranks class: ANY corpus query whose
    implementation uses the distributed helpers (baked range-shuffle
    offsets) must register plan_cache=False — a cached plan re-executed
    after clearCache resamples boundaries under stale offsets.  Static
    source scan so a future adopter can't forget the flag."""
    import inspect
    import sys

    from steampipe_sqlite_spark.plans.registry import collect

    queries, _ = collect()

    # Transitive taint (ADVICE r7): a query reaching the helpers THROUGH a
    # wrapper in operators/ or plans/ must be flagged too, or a future
    # indirection would evade the guard and reintroduce the stale-offset
    # class.  Fixed-point over every package-module function: any function
    # whose source mentions a tainted name becomes tainted itself.
    tainted = {"distributed_row_number", "distributed_running_sum"}
    # Source map keyed by (module, qualname), NOT bare attribute name
    # (ADVICE r8): two same-named functions in different modules must not
    # overwrite each other's source — a tainted wrapper shadowed by an
    # identically named untainted function elsewhere would escape taint
    # and let a helper-using query evade the plan_cache=False guard.
    # Taint membership stays a set of BARE names because the propagation
    # test is textual (call sites mention the bare name); a bare-name
    # collision can only over-taint, which is safe for this guard.
    pkg_fns = {}
    for mod_name, mod in list(sys.modules.items()):
        if not mod_name.startswith("steampipe_sqlite_spark"):
            continue
        for attr_name, attr in vars(mod).items():
            if (
                inspect.isfunction(attr)
                and getattr(attr, "__module__", "").startswith("steampipe_sqlite_spark")
                and attr_name not in tainted
            ):
                try:
                    pkg_fns[(attr.__module__, attr.__qualname__)] = (
                        inspect.getsource(attr)
                    )
                except (OSError, TypeError):
                    pass
    changed = True
    while changed:
        changed = False
        for (_mod, qual), src in pkg_fns.items():
            bare = qual.rsplit(".", 1)[-1]
            if bare not in tainted and any(t in src for t in tainted):
                tainted.add(bare)
                changed = True

    offenders = []
    for name, fn in queries.items():
        src = inspect.getsource(getattr(fn, "__wrapped__", fn))
        if any(t in src for t in tainted) and getattr(fn, "__plan_cache__", True):
            offenders.append(name)
    assert not offenders, f"helper queries missing plan_cache=False: {offenders}"
    # and the flag is actually in use somewhere (guards against the scan
    # silently matching nothing after a refactor)
    assert sum(
        1 for fn in queries.values() if not getattr(fn, "__plan_cache__", True)
    ) >= 12


def test_failed_rebuild_releases_partial_persists(spark):
    """A plan_cache=False build that RAISES mid-way must release the
    persists it already took (review r8: without this, each failed
    rebuild in a heap-constrained session permanently accumulated cached
    RDDs that every future ledger slice skipped past)."""
    import pytest
    from pyspark.sql import functions as F

    from steampipe_sqlite_spark.operators.scale import (
        distributed_row_number,
        persisted_ledger,
    )
    from steampipe_sqlite_spark.plans.registry import (
        _rebuild_with_persist_ownership,
    )

    def exploding_build(spark_, sf_dir_):
        df = spark_.range(0, 500).selectExpr("id", "id % 7 AS v")
        d1 = distributed_row_number(df, [F.col("v"), F.col("id")],
                                    num_partitions=2)
        d1.count()  # materialize the persist
        raise RuntimeError("mid-build failure after one persist")

    before_led = len(persisted_ledger(spark))
    before_rdds = spark.sparkContext._jsc.getPersistentRDDs().size()
    with pytest.raises(RuntimeError, match="mid-build"):
        _rebuild_with_persist_ownership(
            exploding_build, "exploding_test_query", spark, "/tmp"
        )
    assert len(persisted_ledger(spark)) == before_led, (
        "failed build left orphans in the ledger"
    )
    assert spark.sparkContext._jsc.getPersistentRDDs().size() <= before_rdds, (
        "failed build left RDDs persisted"
    )


def test_rebuild_poisons_superseded_dataframe(spark):
    """After a plan_cache=False rebuild, the PREVIOUS build's DataFrame
    must fail loudly on any use (ADVICE r8): its baked range-shuffle
    offsets refer to released persisted data, so re-executing it would
    resample partition boundaries under stale offsets and return silently
    wrong ranks.  The registry installs a raising _jdf sentinel."""
    import pytest
    from pyspark.sql import functions as F

    from steampipe_sqlite_spark.operators.scale import distributed_row_number
    from steampipe_sqlite_spark.plans.registry import (
        _rebuild_with_persist_ownership,
    )

    def build(spark_, sf_dir_):
        df = spark_.range(0, 300).selectExpr("id", "id % 5 AS v")
        return distributed_row_number(df, [F.col("v"), F.col("id")],
                                      num_partitions=2)

    first = _rebuild_with_persist_ownership(build, "poison_test_q", spark, "/tmp")
    assert first.count() == 300  # live before the rebuild
    second = _rebuild_with_persist_ownership(build, "poison_test_q", spark, "/tmp")
    with pytest.raises(RuntimeError, match="stale plan"):
        first.count()
    assert second.count() == 300  # the current build is unaffected
    # identity-claim sanity: the rebuild released the first build's persist
    # (at most one build's worth of cached handles per query key)
    from steampipe_sqlite_spark.plans.registry import _owned_persists

    ref, handles = _owned_persists(spark)[("poison_test_q", "/tmp")]
    assert ref() is second and len(handles) == 1
    # cleanup for neighboring leak-sensitive tests
    for h in handles:
        h.unpersist()
    del _owned_persists(spark)[("poison_test_q", "/tmp")]
