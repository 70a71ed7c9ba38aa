"""Edge-semantics proofs for the round-4 temporal/CDC operators: version
tie-breaks, interval chaining, EWMA recursion values, schema-drift nulls.
The corpus oracles check these end-to-end at fixture scale; these tests pin
the corner cases tiny fixtures can't guarantee to contain."""

import datetime as dt

from pyspark.sql import functions as F

from steampipe_sqlite_spark.operators.temporal import (
    ewma_by_key,
    latest_by_key,
    scd2_intervals,
)


def _changelog(spark):
    rows = [
        # key 1: same ts twice — higher seq must win
        (1, dt.datetime(2024, 1, 1, 10, 0), 100, "a", 1.0),
        (1, dt.datetime(2024, 1, 1, 10, 0), 101, "b", 2.0),
        (1, dt.datetime(2024, 1, 1, 9, 0), 102, "c", 3.0),
        # key 2: single row
        (2, dt.datetime(2024, 1, 2, 0, 0), 200, "d", 4.0),
        # key 3: strictly increasing ts
        (3, dt.datetime(2024, 1, 1, 0, 0), 300, "e", 5.0),
        (3, dt.datetime(2024, 1, 3, 0, 0), 301, "f", 6.0),
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string, value double"
    )


def test_latest_by_key_composite_version_tiebreak(spark):
    out = {
        r.user_id: (r.event_id, r.event_type)
        for r in latest_by_key(
            _changelog(spark),
            key_cols=["user_id"],
            order_cols=["ts", "event_id"],
            payload_cols=["event_id", "event_type"],
        ).collect()
    }
    assert out == {1: (101, "b"), 2: (200, "d"), 3: (301, "f")}


def test_scd2_intervals_chain_and_current_flag(spark):
    rows = scd2_intervals(
        _changelog(spark),
        key_cols=["user_id"],
        ts_col="ts",
        order_cols=["ts", "event_id"],
        payload_cols=["event_id"],
    ).collect()
    by_key = {}
    for r in sorted(rows, key=lambda r: (r.user_id, r.valid_from, r.event_id)):
        by_key.setdefault(r.user_id, []).append(r)
    for hist in by_key.values():
        # exactly one open (current) row, and it is the last one
        assert [r.is_current for r in hist] == [0] * (len(hist) - 1) + [1]
        assert hist[-1].valid_to is None
        # closed intervals chain: each valid_to equals the next valid_from
        for prev, nxt in zip(hist, hist[1:]):
            assert prev.valid_to == nxt.valid_from
    # key 1's same-ts pair: the seq tie-break orders 100 before 101
    assert [r.event_id for r in by_key[1]] == [102, 100, 101]


def test_ewma_matches_reference_recursion(spark):
    out = ewma_by_key(
        _changelog(spark),
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
        value_col="value",
        alpha=0.25,
    ).collect()
    got = {
        (r.user_id, r.event_id): r.ewma
        for r in out
    }
    # key 3 by hand: y0 = 5.0; y1 = 0.25*6 + 0.75*5 = 5.25
    assert got[(3, 300)] == 5.0
    assert got[(3, 301)] == 5.25
    # key 1 order (ts, event_id): 102 (3.0) -> 100 (1.0) -> 101 (2.0)
    assert got[(1, 102)] == 3.0
    assert got[(1, 100)] == 0.25 * 1.0 + 0.75 * 3.0
    assert got[(1, 101)] == 0.25 * 2.0 + 0.75 * (0.25 * 1.0 + 0.75 * 3.0)


def test_ewma_null_poisons_the_tail_of_its_key(spark):
    """A null mid-series must poison every subsequent smoothed value of
    that key (the left fold's alpha*NaN + beta*prev = NaN), NOT be
    skipped-and-resumed as pandas ewm does by default — smoothing over a
    gap would fabricate continuity the data doesn't have (code-review
    r13, introduced with the ewm vectorization).  Other keys unaffected."""
    import math

    df = spark.createDataFrame(
        [("a", 1, 4.0), ("a", 2, None), ("a", 3, 2.0), ("b", 1, 8.0), ("b", 2, 4.0)],
        "k string, t int, v double",
    )
    got = {
        (r.k, r.t): r.ewma
        for r in ewma_by_key(df, ["k"], ["t"], "v", alpha=0.25).collect()
    }
    assert got[("a", 1)] == 4.0
    assert got[("a", 2)] is None or math.isnan(got[("a", 2)])
    assert got[("a", 3)] is None or math.isnan(got[("a", 3)])  # poisoned, not resumed
    assert got[("b", 1)] == 8.0
    assert got[("b", 2)] == 0.25 * 4.0 + 0.75 * 8.0


def test_ewma_carry_across_arrow_batches_matches_reference(spark):
    """The r15 partition-wise rewrite smooths whole Arrow batches and
    carries (key, last_ewma) across batch boundaries — a key longer than
    spark.sql.execution.arrow.maxRecordsPerBatch (default 10k) MUST
    continue its recursion seamlessly, including a null placed beyond
    the first boundary (the poison must propagate through the carry).
    Compared against the plain-python left fold row by row."""
    import math

    n = 25_000  # > 2 batches for one key at the 10k default
    rows = []
    vals = {}
    for i in range(n):
        v = None if i in (12_345, 24_000) else float((i * 37) % 100) / 4.0
        rows.append(("big", i, v))
        vals[i] = v
    # a second small key interleaved in input order (hash-partitioned
    # away or not — either way its recursion is independent)
    for i in range(5):
        rows.append(("small", i, float(i)))
    df = spark.createDataFrame(rows, "k string, t int, v double")
    got = {
        (r.k, r.t): r.ewma
        for r in ewma_by_key(df, ["k"], ["t"], "v", alpha=0.25).collect()
    }
    # python reference fold for the big key
    y = None
    poisoned = False
    for i in range(n):
        v = vals[i]
        if v is None:
            poisoned = True
        y = v if i == 0 else (
            None if (v is None or y is None) else 0.25 * v + 0.75 * y
        )
        expect = got[("big", i)]
        if poisoned:
            assert expect is None or math.isnan(expect), f"row {i} not poisoned"
        else:
            assert expect == y, f"row {i}: {expect} != {y}"
    for i in range(5):
        ref = float(i) if i == 0 else 0.25 * float(i) + 0.75 * ref
        assert got[("small", i)] == ref


def test_union_by_name_null_fills_missing_columns(spark):
    old = spark.createDataFrame([(1, "t", "en")], "doc_id long, text string, lang string")
    new = spark.createDataFrame([(2, "u", 9)], "doc_id long, text string, n_chars long")
    got = {
        r.doc_id: (r.lang, r.n_chars)
        for r in old.unionByName(new, allowMissingColumns=True).collect()
    }
    assert got == {1: ("en", None), 2: (None, 9)}
