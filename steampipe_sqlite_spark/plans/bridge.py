"""Bridge-family corpus queries: the connector scan path, driver-checked.

Every other corpus family reads parquet natively — by design (TESTDATA
is parquet), but it left the engine's REASON-to-exist surface, the
steampipe-style connector bridge (SURVEY §2.1), exercised only by
pytest.  These entries give the bridge its own oracle-paired driver
rows: the scan goes Spark SQL -> Python DataSource -> Connector.execute
-> opaque page-token chains (sources/pagedhttp.py, the paginated
cloud-API shape of /root/reference/cursor.go:39-59), and the DuckDB
oracle reproduces the connector's deterministic row function
arithmetically with generate_series — a hash match proves the entire
bridge (schema mapping, partition planning, qual pushdown, token
walking, Arrow batch assembly) end to end.

``sf_dir`` is ignored: the connector synthesizes its rows, which is the
point — the bridge serves tables that are NOT files.  Aggregates stick
to integer columns (COUNT/MIN/MAX/SUM over seq/page) so the comparison
is exact; the double-typed ``value`` column is covered by pytest.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from steampipe_sqlite_spark.engine import Engine
from steampipe_sqlite_spark.plans.registry import presentation_sort, query

PAGED = "steampipe_sqlite_spark.sources.pagedhttp:PagedHttpConnector"

# fixed fixture geometry: 4 token chains x 5 pages x 25 rows = 500 rows
_CFG = json.dumps({"n_partitions": 4, "n_pages": 5, "page_size": 25})
_P, _PG, _I = 4, 5, 25

_GEN = f"""
WITH g AS (
  SELECT p.p AS partition_id, pg.pg AS page, i.i AS i,
         (p.p * {_PG} + pg.pg) * {_I} + i.i AS seq,
         'item-' || p.p || '-' || pg.pg || '-' || i.i AS item_id
  FROM generate_series(0, {_P - 1}) p(p),
       generate_series(0, {_PG - 1}) pg(pg),
       generate_series(0, {_I - 1}) i(i))
"""


def _items(spark):
    eng = Engine(spark)
    eng.load(PAGED, config=_CFG)
    # explicit projection (B2): the Python DataSource API has no
    # pushColumns, so the narrow scan is requested at the reader — the
    # plan's BatchScan then reads 4 columns, not 5 (``value`` is unused
    # here; a scan wider than the projection is wrong at any scale)
    return eng.table(
        "paged", "items", columns=["seq", "partition_id", "page", "item_id"]
    )


def _per_partition(df):
    return presentation_sort(
        df.groupBy("partition_id").agg(
            F.count(F.lit(1)).alias("n_items"),
            F.countDistinct("item_id").alias("n_ids"),
            F.min("seq").alias("min_seq"),
            F.max("seq").alias("max_seq"),
            F.sum("seq").alias("sum_seq"),
            F.sum("page").alias("sum_page"),
        ),
        ["partition_id"],
    )


@query(
    "bridge_paged_scan",
    oracle=_GEN
    + """
SELECT partition_id,
       COUNT(*) AS n_items,
       COUNT(DISTINCT item_id) AS n_ids,
       MIN(seq) AS min_seq,
       MAX(seq) AS max_seq,
       CAST(SUM(seq) AS BIGINT) AS sum_seq,
       CAST(SUM(page) AS BIGINT) AS sum_page
FROM g GROUP BY partition_id ORDER BY partition_id
""",
)
def bridge_paged_scan(spark, sf_dir):
    """Full parallel bridge scan: all 4 token chains walked page by page
    under executor parallelism, aggregated per chain.  At cloud scale
    each chain is a shard/region endpoint; the plan's work unit is one
    chain, so parallelism == shards regardless of corpus size."""
    return _per_partition(_items(spark))


@query(
    "bridge_paged_pruned",
    oracle=_GEN
    + """
SELECT partition_id,
       COUNT(*) AS n_items,
       COUNT(DISTINCT item_id) AS n_ids,
       MIN(seq) AS min_seq,
       MAX(seq) AS max_seq,
       CAST(SUM(seq) AS BIGINT) AS sum_seq,
       CAST(SUM(page) AS BIGINT) AS sum_page
FROM g WHERE partition_id IN (1, 2)
GROUP BY partition_id ORDER BY partition_id
""",
)
def bridge_paged_pruned(spark, sf_dir):
    """Qual-pruned bridge scan: the IN (1, 2) predicate reaches
    Connector.partitions() through pushFilters and the other chains are
    never fetched (API-level partition pruning — proven call-exact by
    test_pagedhttp_connector; this entry proves the VALUES through the
    pruned path)."""
    df = _items(spark).filter(F.col("partition_id").isin(1, 2))
    return _per_partition(df)


# -- round 14: sized-up bridge scan for per-round perf tracking ------------

# 8 chains x 20 pages x 1250 rows = 200k rows: big enough that Arrow
# batch assembly and token walking (not fixed session overhead) dominate
# the Spark leg, small enough for the bench's per-pair budget.
# cache:false (optimization r14, measurement honesty): the reference-
# parity scan cache (sources/cache.py) lives in REUSED Python worker
# processes, so repeated bench runs were PARTIALLY served from memory —
# and only partially, because task-to-worker assignment varies run to
# run (measured: 160 page fetches on run 0, then +140/+100 on repeats;
# spark_mad 0.059 in the interim bench).  The benched entry must walk
# every token chain every run — bench.py clearCache() can't reach a
# worker-process cache, so the per-connection option turns it off at
# the source.  Warm cost of honesty: ~0.42 s partially-cached →
# ~0.40-0.45 s fully fetched (machinery dominates, the cache saved
# almost nothing).  Correctness rows are value-identical either way.
_BULK_CFG = json.dumps(
    {"n_partitions": 8, "n_pages": 20, "page_size": 1250, "cache": False}
)
_BP, _BPG, _BI = 8, 20, 1250

_BULK_GEN = f"""
WITH g AS (
  SELECT p.p AS partition_id, pg.pg AS page, i.i AS i,
         (p.p * {_BPG} + pg.pg) * {_BI} + i.i AS seq
  FROM generate_series(0, {_BP - 1}) p(p),
       generate_series(0, {_BPG - 1}) pg(pg),
       generate_series(0, {_BI - 1}) i(i))
"""


@query(
    "bridge_paged_scan_bulk",
    oracle=_BULK_GEN
    + """
SELECT partition_id,
       COUNT(*) AS n_items,
       MIN(seq) AS min_seq,
       MAX(seq) AS max_seq,
       CAST(SUM(seq) AS BIGINT) AS sum_seq,
       CAST(SUM(page) AS BIGINT) AS sum_page
FROM g GROUP BY partition_id ORDER BY partition_id
""",
)
def bridge_paged_scan_bulk(spark, sf_dir):
    """Bulk bridge scan (VERDICT r13 #5: the connector path in the
    headline bench set): 200k rows walked through 8 opaque token chains
    x 20 pages under executor parallelism, aggregated per chain.

    Perf-tracking caveat, stated up front: the DuckDB twin reproduces
    the row function ARITHMETICALLY (generate_series) — same output,
    none of the paging work — so the pair's ratio tracks absolute
    bridge throughput round over round rather than engine-vs-engine
    work parity (the same-output-lighter-work shape mm_image_decode's
    oracle had before r13; here it is intrinsic — DuckDB cannot speak
    the connector protocol)."""
    eng = Engine(spark)
    eng.load(PAGED, config=_BULK_CFG, alias="pagedbulk")
    df = eng.table(
        "pagedbulk", "items", columns=["seq", "partition_id", "page"]
    )
    return presentation_sort(
        df.groupBy("partition_id").agg(
            F.count(F.lit(1)).alias("n_items"),
            F.min("seq").alias("min_seq"),
            F.max("seq").alias("max_seq"),
            F.sum("seq").alias("sum_seq"),
            F.sum("page").alias("sum_page"),
        ),
        ["partition_id"],
    )
