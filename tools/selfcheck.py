"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
the given scale factor, then compares: row count, column names (sorted), and
an order-insensitive value hash.  Use while iterating so the per-round
CORRECTNESS_r{N}.json holds no surprises.

Usage:  python tools/selfcheck.py [sf_dir] [query ...]

Set SELFCHECK_VANILLA=1 to run the Spark side in a DEFAULT-config session
(no engine confs pre-set) — the external driver's environment.  Round 1
failed 24 queries on exactly this gap (code assumed a conf our builder
sets); the vanilla mode catches any new conf-dependence before the driver
does.  load_table/register_views must make each query self-sufficient.
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time
from datetime import date, datetime
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from steampipe_sqlite_spark.session import get_spark
from steampipe_sqlite_spark.tables import ALL_TABLES


def _norm_cell(v):
    # Pandas-materialized cells arrive as numpy scalars / arrays / NaT;
    # unwrap to plain Python first so the normalization below sees the same
    # value the driver's hasher sees (np.int64(286) -> 286 -> "286", but
    # np.float64(286.0) -> 286.0 -> "286.0" — the r3 HUGEINT lesson: the
    # dtype an engine→pandas bridge picks is part of the answer).
    tm = type(v).__module__
    if tm == "numpy":
        import numpy as np

        if isinstance(v, np.ndarray):
            v = v.tolist()
        else:
            v = v.item()
    elif v is not None and tm.startswith("pandas"):
        import pandas as pd

        if v is pd.NaT:
            v = None
        elif isinstance(v, pd.Timestamp):
            v = v.to_pydatetime()
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def value_hash(columns: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def driver_canon_crash(pdf) -> str | None:
    """Replay the driver's canonicalization step and report its crash, if any.

    The driver canonicalizes each result with ``pandas.sort_values`` over all
    columns (sorted by name) before hashing.  That path has materialization
    constraints our order-insensitive hasher does not: list/ndarray cells are
    unhashable under pandas' object factorization (the r4
    ``json_build_and_length`` red died exactly there, inside the driver, as an
    ``err`` row).  Returns the exception text, or None if canonicalization
    succeeds.  Three rounds of locally-green/driver-red artifacts justify the
    invariant this enforces: selfcheck red ⇔ driver red.
    """
    try:
        cols = sorted(pdf.columns)
        pdf[cols].sort_values(by=cols, kind="mergesort")
    except Exception as e:  # noqa: BLE001
        return f"{type(e).__name__}: {str(e)[:160]}"
    return None


def dtype_mismatches(spdf, opdf) -> list[str]:
    """Per-column pandas dtype comparison, aligned by name.

    The driver's schema_match compares materialized dtypes, not just names —
    tz-aware vs naive timestamps (r4 sliding windows) and int vs float
    (r3 HUGEINT) both failed there while column names matched.  One
    normalization is empirical: Spark toPandas gives datetime64[ns] while
    DuckDB .df() gives datetime64[us], and tumbling-window queries with that
    exact split are driver-GREEN — so resolution is normalized by the driver;
    the tz suffix (what actually failed r4) is not, and stays strict.
    """

    def norm(d: str) -> str:
        if d.startswith("datetime64["):
            inner = d[len("datetime64[") : -1]  # "ns" or "us, Etc/UTC"
            parts = [p.strip() for p in inner.split(",")]
            tz = parts[1] if len(parts) > 1 else ""
            return f"datetime64[tz={tz}]"
        # agg_array_ops is driver-green with spark=int32 vs duckdb=int64, so
        # integer WIDTH is normalized by the driver; int-vs-float is not (r3).
        if d.startswith(("int", "uint")):
            return "int"
        return d

    out = []
    for c in sorted(set(spdf.columns) & set(opdf.columns)):
        sd, od = str(spdf[c].dtype), str(opdf[c].dtype)
        if norm(sd) != norm(od):
            out.append(f"{c}: spark={sd} duckdb={od}")
    return out


# The external driver verifies 50 queries per round in ONE session; a
# single session running the FULL corpus accumulates broadcasts, memory-
# sink tables, and cached plan state until the (1 GiB default) vanilla
# heap dies — observed round 5: java.lang.OutOfMemoryError after ~160
# queries.  Recycling the session at the driver's own granularity keeps
# the replica faithful AND survivable.
SESSION_BUDGET = int(os.environ.get("SELFCHECK_SESSION_BUDGET", "50"))
# ^ 50 = the driver's own granularity at its sf0.01 gate.  At sf0.1 the
# 10x broadcasts/shuffle buffers exhaust the 1 GiB vanilla heap within a
# 50-query session (observed round 5) — use SELFCHECK_SESSION_BUDGET=20
# for full-corpus sf0.1 runs.


def _make_spark():
    if os.environ.get("SELFCHECK_VANILLA"):
        from pyspark.sql import SparkSession

        b = (
            SparkSession.builder.master("local[32]")
            .appName("selfcheck_vanilla")
            .config("spark.ui.enabled", "false")
        )
        # heap size is NOT a correctness conf — SQL semantics stay fully
        # default; the override exists because full-corpus sf0.1 runs
        # exhaust the 1 GiB default heap even with 20-query sessions
        # (tpch broadcasts + streaming sinks), while the driver's own
        # gate runs at sf0.01 where the default heap suffices
        mem = os.environ.get("SELFCHECK_VANILLA_MEM")
        if mem:
            b = b.config("spark.driver.memory", mem)
        return b.getOrCreate()
    return get_spark("selfcheck")


def run(sf_dir: str, only: list[str]) -> int:
    from steampipe_sqlite_spark.plans.registry import collect

    queries, oracles = collect()
    if os.environ.get("SELFCHECK_VANILLA"):
        print("# vanilla session (driver-replica): default confs only,"
              f" recycled every {SESSION_BUDGET} queries")
    spark = _make_spark()

    con = duckdb.connect()
    for t in ALL_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    names = only or sorted(queries)
    failures = 0
    for qi, name in enumerate(names):
        if qi and qi % SESSION_BUDGET == 0:
            spark.stop()
            spark = _make_spark()
        t0 = time.time()
        try:
            df = queries[name](spark, sf_dir)
            # Materialize the way the driver does (toPandas, not collect):
            # Spark→pandas dtype coercions are part of the contract.
            spdf = df.toPandas()
            srows = list(spdf.itertuples(index=False, name=None))
            scols = list(spdf.columns)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s) [no oracle]")
            continue
        try:
            # DuckDB via .df() (pandas), matching the driver: HUGEINT
            # becomes float64 here, which fetchall()'s native ints hid in r3.
            opdf = con.execute(oracles[name]).df()
            ocols = list(opdf.columns)
            orows = list(opdf.itertuples(index=False, name=None))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)}≠{len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)}≠{sorted(ocols)}")
        else:
            dt = dtype_mismatches(spdf, opdf)
            if dt:
                problems.append(f"dtypes [{'; '.join(dt)}]")
            for side, pdf in (("spark", spdf), ("duckdb", opdf)):
                crash = driver_canon_crash(pdf)
                if crash:
                    problems.append(f"driver-canon crash ({side}): {crash}")
            if not problems and value_hash(scols, srows) != value_hash(ocols, orows):
                problems.append("value-hash mismatch")
        if problems:
            failures += 1
            print(f"FAIL  {name}: {'; '.join(problems)}")
            if "value-hash mismatch" in problems and srows:
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                ss = sorted("|".join(_norm_cell(r[i]) for i in order_s) for r in srows)
                oo = sorted("|".join(_norm_cell(r[i]) for i in order_o) for r in orows)
                for a, b in zip(ss, oo):
                    if a != b:
                        print(f"      spark : {a[:220]}")
                        print(f"      duckdb: {b[:220]}")
                        break
        else:
            print(f"PASS  {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{len(names) - failures}/{len(names)} passed")
    return 1 if failures else 0


def run_chunked(sf_dir: str) -> int:
    """Full-corpus sweep as SESSION_BUDGET-sized SUBPROCESS chunks.

    Session recycling (spark.stop() + new session) is NOT enough for a
    full 270-query sweep: codegen classes, metaspace, and other
    per-context residue survive a context restart inside one JVM, and the
    vanilla 1 GiB heap dies ~218 queries into the PROCESS regardless of
    recycling (observed round 7 — the same tail passes standalone).  The
    driver never sees this (its 50-query window runs in a fresh process);
    chunked subprocesses make the replica process-faithful as well.
    """
    import subprocess

    from steampipe_sqlite_spark.plans.registry import collect

    names = sorted(collect()[0])
    failures = 0
    for i in range(0, len(names), SESSION_BUDGET):
        chunk = names[i : i + SESSION_BUDGET]
        rc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), sf_dir, *chunk]
        ).returncode
        failures += 1 if rc else 0
    print(f"\nchunked sweep: {len(names)} queries in "
          f"{-(-len(names) // SESSION_BUDGET)} processes; "
          f"{'ALL GREEN' if not failures else f'{failures} chunk(s) had failures'}")
    return 1 if failures else 0


if __name__ == "__main__":
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    only = args[1:] if args and os.path.isdir(args[0]) else args
    if not only:
        raise SystemExit(run_chunked(sf_dir))
    raise SystemExit(run(sf_dir, only))
