"""Fixture-drift tripwire: pin the physical parquet schemas of the testdata.

Round-1 shipped a nanos→micros fix for events.ts; before round 2 the driver
regenerated the fixture with plain timestamp[us], and the now-wrong
assumption cost 13 CORRECTNESS rows, 14 tests, and the whole bench
(VERDICT.md round 2).  The code now sniffs dtypes instead of assuming, and
this test makes the NEXT silent environment change a 1-second diagnosis:
it reads each table's parquet footer with pyarrow (no Spark) and fails with
a message naming the drifted column.

Timestamp columns accept the set of physical types the engine handles
(us/ns/int64-nanos) — a flip within that set is handled drift and stays
green; anything else is unhandled and goes red.
"""

import datetime
import os

import pyarrow.parquet as pq
import pytest

SF_DIRS = [
    d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.isdir(d)
]

# column -> exact physical type, or a tuple of acceptable types
TS_OK = ("timestamp[us]", "timestamp[ns]", "int64")
EXPECTED = {
    "region": {"r_regionkey": "int32", "r_name": "string"},
    "nation": {"n_nationkey": "int32", "n_name": "string", "n_regionkey": "int32"},
    "customer": {
        "c_custkey": "int64",
        "c_name": "string",
        "c_nationkey": "int32",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "int64",
        "s_name": "string",
        "s_nationkey": "int32",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "int64",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int32",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "int64",
        "o_custkey": "int64",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": TS_OK,
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "int64",
        "l_partkey": "int64",
        "l_suppkey": "int64",
        "l_linenumber": "int32",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": TS_OK,
    },
    "events": {
        "event_id": "int64",
        "ts": TS_OK,
        "user_id": "int64",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "int64",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "int64",
    },
    "embeddings": {
        "vec_id": "int64",
        "embedding": "list<element: float>",
        "label": "int32",
    },
}


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_fixture_physical_schema(sf_dir, table):
    path = os.path.join(sf_dir, f"{table}.parquet")
    schema = pq.read_schema(path)
    got = {f.name: str(f.type) for f in schema}
    exp = EXPECTED[table]
    assert set(got) == set(exp), (
        f"FIXTURE DRIFT in {path}: column set changed — "
        f"missing={sorted(set(exp) - set(got))} extra={sorted(set(got) - set(exp))}"
    )
    for col, want in exp.items():
        ok = got[col] in want if isinstance(want, tuple) else got[col] == want
        assert ok, (
            f"FIXTURE DRIFT in {path}: column '{col}' is {got[col]}, "
            f"expected {want} — update dtype handling (tables.load_table / "
            f"streaming.jobs.events_raw_schema) before trusting any events/date results"
        )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_ts_range_tripwire(sf_dir):
    """A unit error (nanos↔micros mixed up) lands timestamps in 1970 or
    year ~56k; assert min/max stay in a plausible fixture window so a
    silent conversion bug can never again return 'plausible' rows."""
    import duckdb

    path = os.path.join(sf_dir, "events.parquet")
    lo, hi = duckdb.sql(f"select min(ts), max(ts) from '{path}'").fetchone()
    if isinstance(lo, int):  # physical int64 nanos
        lo = datetime.datetime.fromtimestamp(lo / 1e9, datetime.timezone.utc).replace(tzinfo=None)
        hi = datetime.datetime.fromtimestamp(hi / 1e9, datetime.timezone.utc).replace(tzinfo=None)
    assert datetime.datetime(2015, 1, 1) <= lo <= hi <= datetime.datetime(2035, 1, 1), (
        f"FIXTURE DRIFT in {path}: events.ts spans [{lo}, {hi}] — outside the "
        f"plausible window; a ts unit/epoch change happened"
    )
