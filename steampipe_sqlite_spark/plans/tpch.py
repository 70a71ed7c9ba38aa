"""TPC-H-adapted corpus over the driver's star schema (FIXTURES.md §1).

Exercises: scans, filters, multi-way joins, hash aggregation, group-by /
having, top-k, correlated + scalar subqueries, CTEs, left joins, semi/anti
semantics — the SQL surface the reference delegates to SQLite core
(SURVEY.md §2.3) expressed on Catalyst.

Join-order convention: every multi-way join is written FROM lineitem (the
fact table) with dimensions joined after.  Catalyst without CBO builds the
syntactic left-deep tree and broadcasts each RIGHT side when its estimate
fits the threshold — dims-last guarantees every broadcast is a dimension
and the fact table streams.  The dims-first form was observed to broadcast
the whole lineitem table (fine at sf0.1, fatal at 100×); DuckDB reorders
joins itself, so the shared SQL stays oracle-valid.

Determinism convention (driver hash-compares Spark vs DuckDB at sf0.01):
money aggregates are computed in exact integer-hundredths (BIGINT) and
divided back to DOUBLE, so both engines produce bit-identical doubles
regardless of summation order (and Spark's hash agg runs ~2x faster than
with DECIMAL); averages are exact-sum / count (IEEE division of identical
operands); every computed column carries the same alias on both sides.
Queries with LIMIT carry a full deterministic ORDER BY tie-break.
"""

from __future__ import annotations

from steampipe_sqlite_spark.plans.registry import sql_query
from steampipe_sqlite_spark.tables import load_table


def C(expr: str) -> str:
    """Exact-money operand in integer hundredths ("cents"): BIGINT sums are
    both engine-deterministic AND ~2x faster than DECIMAL(12,2) aggregation
    in Spark's hash aggregate (measured on q1 at sf0.1: 1.10 s -> 0.52 s).
    The 2-dp fixture values make ROUND(x*100) exact."""
    return f"CAST(ROUND(({expr}) * 100) AS BIGINT)"


def DSUM(expr: str, alias: str, scale: int = 100) -> str:
    """Deterministic SUM: exact integer accumulation, double result;
    ``scale`` = product of the C() factors in ``expr`` (100 per factor)."""
    return f"CAST(SUM({expr}) AS DOUBLE) / {scale}.0 AS {alias}"


def DAVG(expr: str, alias: str, scale: int = 100) -> str:
    """Deterministic AVG: exact integer sum / count / scale (IEEE division
    of identical operands on both engines)."""
    return f"CAST(SUM({expr}) AS DOUBLE) / COUNT(*) / {scale}.0 AS {alias}"


REVENUE = f"{C('l_extendedprice')} * {C('1 - l_discount')}"  # scale 100^2
CHARGE = f"{REVENUE} * {C('1 + l_tax')}"  # scale 100^3


# --- Q1: pricing summary report (flagship) -------------------------------
# Wide aggregation: 2 group keys, 8 aggregates, sort. The canonical
# map-side-partial + final hash aggregate; one shuffle on the (tiny) group
# key space — scale-safe at any SF.
Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {DSUM(C('l_quantity'), 'sum_qty')},
       {DSUM(C('l_extendedprice'), 'sum_base_price')},
       {DSUM(REVENUE, 'sum_disc_price', 100**2)},
       {DSUM(CHARGE, 'sum_charge', 100**3)},
       {DAVG(C('l_quantity'), 'avg_qty')},
       {DAVG(C('l_extendedprice'), 'avg_price')},
       {DAVG(C('l_discount'), 'avg_disc')},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""
sql_query("tpch_q1", Q1_SQL, present_sort=["l_returnflag", "l_linestatus"])


def tpch_q1_dataframe(spark, sf_dir):
    """Q1 via the DataFrame API — same Catalyst plan as the SQL form.

    Kept as the idiomatic-API witness: filter pushed to the parquet scan,
    integer-cents partial aggregation inside whole-stage codegen.
    Registered LAST (registry.collect) so this duplicate of tpch_q1 does
    not burn a slot in the driver's bounded verification window.
    """
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    cents = lambda c: F.round(c * 100).cast("long")  # noqa: E731
    qty = cents(F.col("l_quantity"))
    price = cents(F.col("l_extendedprice"))
    disc = cents(F.col("l_discount"))
    rev = price * cents(1 - F.col("l_discount"))
    charge = rev * cents(1 + F.col("l_tax"))
    n = F.count(F.lit(1))
    s = lambda c, sc: F.sum(c).cast("double") / sc  # noqa: E731
    out = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            s(qty, 100.0).alias("sum_qty"),
            s(price, 100.0).alias("sum_base_price"),
            s(rev, 100.0**2).alias("sum_disc_price"),
            s(charge, 100.0**3).alias("sum_charge"),
            (F.sum(qty).cast("double") / n / 100.0).alias("avg_qty"),
            (F.sum(price).cast("double") / n / 100.0).alias("avg_price"),
            (F.sum(disc).cast("double") / n / 100.0).alias("avg_disc"),
            n.alias("count_order"),
        )
    )
    from steampipe_sqlite_spark.plans.registry import presentation_sort

    return presentation_sort(out, ["l_returnflag", "l_linestatus"])


# --- Q3: shipping priority (3-way join + top-k) --------------------------
sql_query(
    "tpch_q3",
    f"""
SELECT l_orderkey,
       {DSUM(REVENUE, 'revenue', 100**2)},
       o_orderdate, o_orderpriority
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON c_custkey = o_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)

# --- Q4: order priority checking (semi-join via EXISTS) ------------------
# Adapted: no l_commitdate/l_receiptdate in the fixture; the EXISTS
# correlates on returned lines instead (same decorrelation shape).
# Spark side reduces lineitem to DISTINCT orderkeys before the join
# (exactly the EXISTS semantics): Catalyst's semi-join of the naive form
# used raw filtered lineitem as the broadcast build side — order-
# cardinality after the distinct, lineitem-cardinality before.
sql_query(
    "tpch_q4",
    """
WITH returned AS (
  SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
)
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
JOIN returned ON l_orderkey = o_orderkey
WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1995-10-01 00:00:00'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1995-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)

# --- Q5: local supplier volume (6-way star join) -------------------------
# Join order starts FROM the fact table: Catalyst (CBO off) builds the
# syntactic left-deep tree and broadcasts each RIGHT side — written
# dims-last, every broadcast is a dimension and lineitem streams.  The
# customer-first form broadcast the whole fact table at step 2 (observed
# in the plan), which works at sf0.1 and dies at 100×.
sql_query(
    "tpch_q5",
    f"""
SELECT n_name,
       {DSUM(REVENUE, 'revenue', 100**2)}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
    present_sort=["revenue DESC", "n_name"],
)

# --- Q6: forecast revenue change (pure scan + filter + agg) --------------
sql_query(
    "tpch_q6",
    f"""
SELECT {DSUM(f"{C('l_extendedprice')} * {C('l_discount')}", 'revenue', 100**2)}
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)

# --- Q7: volume shipping between nation pairs ----------------------------
sql_query(
    "tpch_q7",
    f"""
SELECT supp_nation, cust_nation, l_year,
       {DSUM('volume', 'revenue', 100**2)}
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(YEAR FROM l_shipdate) AS l_year,
         {REVENUE} AS volume
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                       AND TIMESTAMP '1998-12-31 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
)

# --- Q8: national market share (CASE inside aggregate) -------------------
sql_query(
    "tpch_q8",
    f"""
SELECT o_year,
       CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE CAST(0 AS BIGINT) END) AS DOUBLE)
         / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM (
  SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
         {REVENUE} AS volume,
         n2.n_name AS nation
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA'
    AND o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                        AND TIMESTAMP '1996-12-31 00:00:00'
    AND p_type = 'ECONOMY'
) all_nations
GROUP BY o_year
ORDER BY o_year
""",
)

# --- Q9: product type profit (adapted: no partsupp in fixture) -----------
sql_query(
    "tpch_q9",
    f"""
SELECT nation, o_year,
       {DSUM('amount', 'sum_profit', 100**2)}
FROM (
  SELECT n_name AS nation,
         EXTRACT(YEAR FROM o_orderdate) AS o_year,
         {REVENUE} AS amount
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""",
    present_sort=["nation", "o_year DESC"],
)

# --- Q10: returned item reporting (join + group + top-k) -----------------
sql_query(
    "tpch_q10",
    f"""
SELECT c_custkey, c_name,
       {DSUM(REVENUE, 'revenue', 100**2)},
       c_acctbal, n_name, c_mktsegment
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1995-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)

# --- Q13: customer order distribution (left outer join + double agg) -----
sql_query(
    "tpch_q13",
    """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders ON c_custkey = o_custkey
                        AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)

# --- Q14: promotion effect (conditional aggregation) ---------------------
sql_query(
    "tpch_q14",
    f"""
SELECT CAST(100.00 AS DOUBLE) *
       CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN {REVENUE}
                     ELSE CAST(0 AS BIGINT) END) AS DOUBLE)
       / CAST(SUM({REVENUE}) AS DOUBLE) AS promo_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1995-10-01 00:00:00'
""",
)

# --- Q15: top supplier (CTE + scalar-subquery max) -----------------------
sql_query(
    "tpch_q15",
    f"""
WITH revenue0 AS (
  SELECT l_suppkey AS supplier_no,
         {DSUM(REVENUE, 'total_revenue', 100**2)}
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier
JOIN revenue0 ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
ORDER BY s_suppkey
""",
)

# --- Q17: small-quantity-order revenue (correlated scalar subquery) ------
# Spark side uses the published Q17 rewrite: the per-part quantity
# threshold is computed only for Brand#3 parts (semi-restricted BEFORE the
# aggregate), so the broadcast side is brand-cardinality, not
# all-parts-cardinality.  Catalyst's decorrelation of the naive form
# aggregates lineitem for EVERY part and broadcasts that (observed).  The
# oracle keeps the correlated form.
sql_query(
    "tpch_q17",
    f"""
WITH brand_parts AS (
  SELECT p_partkey FROM part WHERE p_brand = 'Brand#3'
),
th AS (
  SELECT l_partkey,
         0.2 * (CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / COUNT(*) / 100.0) AS max_qty
  FROM lineitem
  JOIN brand_parts ON p_partkey = l_partkey
  GROUP BY l_partkey
)
SELECT CAST(SUM({C('l_extendedprice')}) AS DOUBLE) / 100.0 / 7.0 AS avg_yearly
FROM lineitem
JOIN th ON th.l_partkey = lineitem.l_partkey
WHERE l_quantity < max_qty
""",
    oracle=f"""
SELECT CAST(SUM({C('l_extendedprice')}) AS DOUBLE) / 100.0 / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#3'
  AND l_quantity < (
    SELECT 0.2 * (CAST(SUM(CAST(ROUND(l2.l_quantity * 100) AS BIGINT)) AS DOUBLE) / COUNT(*) / 100.0)
    FROM lineitem l2
    WHERE l2.l_partkey = p_partkey
  )
""",
)

# --- Q18: large volume customers (HAVING over join) ----------------------
# Spark side pre-aggregates lineitem on the narrow l_orderkey and filters
# BEFORE joining (the published Q18 plan shape): the group keys of the
# naive join-then-group form are functionally dependent on o_orderkey, so
# the rewrite is exact — and it shuffles sum-per-order (one long key)
# instead of the full join output with 5-column string-bearing group keys.
# At 100 TB that is the difference between shuffling lineitem-sized data
# and orderkey-cardinality data.  The oracle keeps the naive form.
sql_query(
    "tpch_q18",
    """
WITH big AS (
  SELECT l_orderkey, SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS cents
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) > 25000
)
SELECT /*+ BROADCAST(big) */
       c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(cents AS DOUBLE) / 100.0 AS sum_qty
FROM big
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
    oracle="""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
HAVING SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) > 25000
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
)

# --- Q19: discounted revenue (disjunctive multi-predicate join) ----------
sql_query(
    "tpch_q19",
    f"""
SELECT {DSUM(REVENUE, 'revenue', 100**2)}
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
""",
)

# --- Q21: waiting suppliers (EXISTS + NOT EXISTS, adapted) ---------------
sql_query(
    "tpch_q21",
    """
SELECT s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN supplier ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
  AND n_name = 'NATION_5'
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
""",
)

# --- Q2: min-cost supplier (adapted: lineitem as part↔supplier link; no
# partsupp in fixture). Correlated aggregated scalar subquery + 5-way join.
sql_query(
    "tpch_q2",
    """
SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_name
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE p_size = 15 AND p_type = 'ECONOMY' AND r_name = 'EUROPE'
  AND s_acctbal = (
    SELECT MIN(s2.s_acctbal)
    FROM lineitem l2
    JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
    WHERE l2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
)

# --- Q11: important part value concentration (adapted: value from shipped
# lineitems; no partsupp). HAVING against an uncorrelated scalar subquery.
Q11_VALUE = f"SUM({C('l_extendedprice')} * {C('l_quantity')})"
sql_query(
    "tpch_q11",
    f"""
SELECT l_partkey AS ps_partkey,
       CAST({Q11_VALUE} AS DOUBLE) / 10000.0 AS part_value
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_1'
GROUP BY l_partkey
HAVING {Q11_VALUE} > (
  SELECT {Q11_VALUE} * 0.001
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_1')
ORDER BY part_value DESC, ps_partkey
""",
)

# --- Q12: shipping delay vs order priority (adapted: no l_shipmode /
# l_commitdate — buckets on shipdate-orderdate lag). Dialect split: Spark
# datediff(end, start) vs DuckDB datediff('day', start, end).
_Q12_BODY = """
SELECT delay_bucket,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM (
  SELECT o_orderpriority,
         CASE WHEN {DD} < 30 THEN 'fast'
              WHEN {DD} < 90 THEN 'normal'
              ELSE 'slow' END AS delay_bucket
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
) t
GROUP BY delay_bucket
ORDER BY delay_bucket
"""
sql_query(
    "tpch_q12",
    _Q12_BODY.format(DD="datediff(l_shipdate, o_orderdate)"),
    oracle=_Q12_BODY.format(DD="datediff('day', o_orderdate, l_shipdate)"),
)

# --- Q16: supplier diversity per part attribute (adapted: link via
# lineitem; complaint filter → low-acctbal NOT IN subquery).
sql_query(
    "tpch_q16",
    """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#5'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
)

# --- Q20: suppliers with significant shipped volume (adapted: shipped
# quantity threshold instead of partsupp availqty). IN over an aggregated
# subquery → left-semi join on Catalyst.
sql_query(
    "tpch_q20",
    """
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_2'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_name LIKE '%widget%'
      AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY l_suppkey
    HAVING SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) > 5000)
ORDER BY s_name
""",
)

# --- Q22: dormant high-balance customers (adapted: cntrycode from
# c_nationkey; no c_phone). NOT EXISTS anti-join + deterministic avg
# (exact decimal sum / count) in an uncorrelated scalar subquery.
sql_query(
    "tpch_q22",
    """
SELECT cntrycode, COUNT(*) AS numcust,
       CAST(SUM(acctbal_c) AS DOUBLE) / 100.0 AS totacctbal
FROM (
  SELECT c_nationkey % 10 AS cntrycode,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS acctbal_c
  FROM customer
  WHERE c_nationkey % 10 IN (1, 2, 3, 4, 5, 6)
    AND c_acctbal > (
      SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / COUNT(*) / 100.0
      FROM customer
      WHERE c_acctbal > 0.00 AND c_nationkey % 10 IN (1, 2, 3, 4, 5, 6))
    AND NOT EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT')
) custsale
GROUP BY cntrycode
ORDER BY cntrycode
""",
)
