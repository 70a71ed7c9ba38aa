"""SQLite-dialect compat corpus: the functions/sqlite_compat.py layer
exercised over the fixture tables, oracle-checked via DuckDB equivalents
(regex for GLOB, interval arithmetic for modifiers, epoch math for
julianday)."""

from __future__ import annotations

from pyspark.sql import functions as F

from steampipe_sqlite_spark.functions.sqlite_compat import (
    glob_match,
    julianday,
    sqlite_date,
    sqlite_time,
    strftime,
    unixepoch,
)
from steampipe_sqlite_spark.plans.registry import (
    presentation_sort,
    query,
    sql_query,
)
from steampipe_sqlite_spark.tables import load_table


@query(
    "compat_glob_filter",
    oracle=r"""
SELECT p_partkey, p_name
FROM part
WHERE regexp_matches(p_name, '^l.*e.*$') OR regexp_matches(p_name, '^.*w[io]dget$')
ORDER BY p_partkey
""",
)
def compat_glob_filter(spark, sf_dir):
    """SQLite GLOB (case-sensitive, *, ?, [seq]) → JVM rlike; two patterns
    OR-ed, matching the reference's inherited GLOB surface."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(
            glob_match(F.col("p_name"), "l*e*") | glob_match(F.col("p_name"), "*w[io]dget")
        )
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    )


@query(
    "compat_strftime_month_rollup",
    oracle="""
SELECT strftime(o_orderdate + INTERVAL 7 DAY, '%Y-%m') AS month_key,
       COUNT(*) AS n
FROM orders
GROUP BY 1
ORDER BY month_key
""",
)
def compat_strftime_month_rollup(spark, sf_dir):
    """strftime('%Y-%m', ts, '+7 days') — modifier pipeline + format-token
    compilation, aggregated (the SQLite-ism in its most common shape)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            strftime("%Y-%m", F.col("o_orderdate"), "+7 days").alias("month_key")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("month_key")
    )


@query(
    "compat_date_functions",
    oracle="""
SELECT o_orderkey,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
       epoch(o_orderdate) / 86400.0 + 2440587.5 AS jd,
       strftime(o_orderdate + INTERVAL 90 MINUTE, '%H:%M:%S') AS t_plus90
FROM orders
WHERE o_orderkey < 100
ORDER BY o_orderkey
""",
)
def compat_date_functions(spark, sf_dir):
    """date(ts, 'start of month'), unixepoch(ts), julianday(ts),
    time(ts, '+90 minutes') — the remaining SQLite date functions on one
    projection (timediff needs SQLite 3.43+, above this environment's
    stdlib 3.40 — documented rejection in sqlite_compat.sqlite_time)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderkey") < 100)
        .select(
            "o_orderkey",
            sqlite_date(F.col("o_orderdate"), "start of month").alias("month_start"),
            unixepoch(F.col("o_orderdate")).alias("epoch_s"),
            julianday(F.col("o_orderdate")).alias("jd"),
            sqlite_time(F.col("o_orderdate"), "+90 minutes").alias("t_plus90"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "compat_scalar_misc",
    oracle="""
SELECT c_custkey,
       CASE WHEN c_acctbal > 0 THEN 'credit' ELSE 'debit' END AS iif_side,
       COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
       instr(c_name, '0') AS zero_pos,
       printf('%s#%05d', c_mktsegment, c_custkey) AS tag,
       CAST(sign(c_acctbal) AS BIGINT) AS bal_sign,
       octet_length(encode(c_name)) AS name_bytes,
       unicode(c_name) AS first_cp
FROM customer
ORDER BY c_custkey
""",
)
def compat_scalar_misc(spark, sf_dir):
    """SQLite scalar-misc surface (iif / ifnull / nullif / instr / printf /
    sign / octet_length / unicode), each mapped to its Spark built-in
    (if, coalesce, nullif, instr, format_string, sign, octet_length,
    ascii) — all JVM-side, whole-stage codegen, no UDFs.  DuckDB shares
    the C-style printf and SQLite's instr/unicode semantics, so the oracle
    is direct."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.expr("if(c_acctbal > 0, 'credit', 'debit')").alias("iif_side"),
        F.expr("coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER')").alias(
            "seg_or_other"
        ),
        F.expr("instr(c_name, '0')").cast("long").alias("zero_pos"),
        F.expr("format_string('%s#%05d', c_mktsegment, c_custkey)").alias("tag"),
        F.expr("cast(sign(c_acctbal) as bigint)").alias("bal_sign"),
        F.expr("octet_length(c_name)").cast("long").alias("name_bytes"),
        F.expr("ascii(c_name)").cast("long").alias("first_cp"),
    ).orderBy("c_custkey")


# SQLite quote() (SQL-literal quoting with '' doubling) and multi-arg
# char() (codepoints → string) — neither engine ships quote(), so the
# shim is the same doubling expression on both; SQLite's char(a, b, ...)
# maps to concatenated CHR calls.
sql_query(
    "compat_quote_char",
    """
SELECT c_custkey,
       '''' || replace(c_mktsegment, '''', '''''') || '''' AS quoted_seg,
       CHR(65 + CAST(c_custkey % 26 AS INT)) || CHR(97 + CAST(c_nationkey % 26 AS INT)) AS char2,
       '''' || replace('it''s ' || c_mktsegment, '''', '''''') || '''' AS quoted_tricky
FROM customer
ORDER BY c_custkey
""",
)


sql_query(
    "str_edit_distance",
    """
SELECT c_custkey,
       levenshtein(c_name, 'Customer#000000000') AS dist_ref,
       CAST(levenshtein(substring(c_name, 10), substring(c_mktsegment, 1, 8)) AS INT)
         AS dist_cross
FROM customer
WHERE c_custkey <= 200
ORDER BY c_custkey
""",
    oracle="""
SELECT c_custkey,
       CAST(levenshtein(c_name, 'Customer#000000000') AS INT) AS dist_ref,
       CAST(levenshtein(substring(c_name, 10), substring(c_mktsegment, 1, 8)) AS INT)
         AS dist_cross
FROM customer
WHERE c_custkey <= 200
ORDER BY c_custkey
""",
    present_sort=["c_custkey"],
)
# ^ Edit-distance surface (record-linkage primitive): Spark's levenshtein
# is JVM codegen (INT), DuckDB's returns BIGINT — cast to INT on the
# oracle side.  Bounded to 200 rows: the per-pair DP cost is the point
# of measuring, not scanning; at scale edit distance runs INSIDE a
# blocking key (see ngram_jaccard_pairs), never across a corpus product.


_PRINTF_ARGS = (
    "o_orderkey, o_orderstatus,"
    " CAST(ROUND(o_totalprice * 100) AS BIGINT), o_custkey % 997"
)
# C-style formatting parity, INTEGER conversions only: %d / zero-padded
# %05d / %s / hex %x render identically in Java's Formatter (Spark
# format_string) and C's printf (DuckDB).  FLOAT conversions (%.2f) are
# deliberately absent: the engines disagree on half-even vs half-up at
# the rounding boundary — the same class as the ROUND(x, n) rule in the
# registry header.
sql_query(
    "compat_printf_integer",
    f"""
SELECT o_orderkey,
       format_string('%05d|%s|cents=%d|hex=%x', {_PRINTF_ARGS}) AS line
FROM orders
ORDER BY o_orderkey
""",
    oracle=f"""
SELECT o_orderkey,
       printf('%05d|%s|cents=%d|hex=%x', {_PRINTF_ARGS}) AS line
FROM orders
ORDER BY o_orderkey
""",
    present_sort=["o_orderkey"],
)


_NOCASE_FOLD_DD = (
    "translate({c}, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',"
    " 'abcdefghijklmnopqrstuvwxyz')"
)


@query(
    "compat_collate_nocase",
    oracle=f"""
WITH mangled AS (
  SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_name) ELSE p_name END AS name
  FROM part)
SELECT {_NOCASE_FOLD_DD.format(c='name')} AS name_nocase,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT name) AS BIGINT) AS n_forms,
       MIN(name) AS first_form
FROM mangled
GROUP BY 1
ORDER BY name_nocase
""",
)
def compat_collate_nocase(spark, sf_dir):
    """COLLATE NOCASE witness (the last §2.3 dialect nit): part names are
    case-mangled deterministically (every even partkey uppercased), then
    grouped and ordered under SQLite NOCASE semantics via
    :func:`nocase_key` — the ASCII-only fold, NOT lower() (which would
    also fold non-ASCII and diverge from SQLite core).  Groups whose
    members differ only by ASCII case collapse (n_forms counts the
    surviving spellings); ordering is by the folded key, which interleaves
    the upper- and lowercase spellings binary order would separate.
    sqlite3-parity for the fold and the ordering is pinned in
    tests/test_sqlite_compat.py."""
    from steampipe_sqlite_spark.functions.sqlite_compat import nocase_key

    part = load_table(spark, sf_dir, "part")
    mangled = part.selectExpr(
        "CASE WHEN p_partkey % 2 = 0 THEN upper(p_name) ELSE p_name END AS name"
    )
    out = mangled.groupBy(nocase_key(F.col("name")).alias("name_nocase")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct("name").cast("long").alias("n_forms"),
        F.min("name").alias("first_form"),
    )
    return presentation_sort(out, ["name_nocase"])


@query(
    "compat_blob_constructors",
    oracle="""
SELECT p_partkey,
       repeat('00', greatest(p_partkey % 7 - 2, 0)) AS zb_hex,
       CAST(greatest(p_partkey % 7 - 2, 0) AS BIGINT) AS zb_len,
       CAST(greatest(p_partkey % 7 - 2, 1) AS BIGINT) AS rb_len
FROM part
ORDER BY p_partkey
""",
)
def compat_blob_constructors(spark, sf_dir):
    """SQLite blob constructors (the last scalar-surface nit from the
    §2.3 audit): ``zeroblob(N)`` byte-exact via its hex image and the
    clamp-to-0 length rule; ``randomblob(N)`` witnessed through the part
    of its contract that IS deterministic — the clamp-to-1 LENGTH rule
    (sqlite3 func.c: N < 1 returns one byte, not zero) — with Spark
    computing length(randomblob(k)) over real generated bytes while the
    oracle computes the closed form.  N varies per row (k = partkey%7-2
    spans negative/zero/positive) so both clamps are exercised.
    Byte-level parity against stdlib sqlite3 is pinned in
    tests/test_sqlite_compat.py::TestBlobConstructors."""
    from steampipe_sqlite_spark.functions.sqlite_compat import (
        randomblob,
        zeroblob,
    )

    part = load_table(spark, sf_dir, "part")
    k = (F.col("p_partkey") % 7 - F.lit(2)).cast("int")
    out = part.select(
        "p_partkey",
        F.lower(F.hex(zeroblob(k))).alias("zb_hex"),
        F.length(zeroblob(k)).cast("long").alias("zb_len"),
        F.length(randomblob(k)).cast("long").alias("rb_len"),
    )
    return presentation_sort(out, ["p_partkey"])


@query(
    "compat_time_modifiers",
    oracle="""
SELECT o_orderkey,
       strftime(o_orderdate
                + ((1 - dayofweek(o_orderdate)) % 7 + 7) % 7 * INTERVAL 1 DAY,
                '%Y-%m-%d') AS next_monday,
       strftime(o_orderdate + INTERVAL 13 MONTH
                + greatest(day(o_orderdate)
                           - day(o_orderdate + INTERVAL 13 MONTH),
                           0) * INTERVAL 1 DAY,
                '%Y-%m-%d') AS month_norm,
       strftime(o_orderdate
                + ((3 - dayofweek(o_orderdate)) % 7 + 7) % 7 * INTERVAL 1 DAY
                + INTERVAL 36 HOUR - INTERVAL 30 MINUTE,
                '%Y-%m-%d %H:%M:%S') AS wed_plus,
       strftime(date_trunc('day', o_orderdate) - INTERVAL 90 SECOND,
                '%H:%M:%S') AS t_back
FROM orders
WHERE o_orderkey < 2000
ORDER BY o_orderkey
""",
)
def compat_time_modifiers(spark, sf_dir):
    """The SQLite date-modifier pipeline's hard cases as their own
    oracle-paired witness (VERDICT r9 #7 — time()/modifier coverage
    previously rode one column inside compat_date_functions):

    - ``weekday N`` (next matching weekday, Sunday=0, NO move when the
      date already matches — both branches present in the fixture dates);
    - month-arithmetic OVERFLOW NORMALIZATION: SQLite rolls Jan 31 +1
      month forward to Mar 2/3 (datefuncs `computeYMD_HMS` carry), while
      Spark/DuckDB interval adds CLAMP to month-end — the shim re-adds
      the clamped days, witnessed here across 13 months so leap-February
      boundaries land in-range (the fixture has month-end order dates);
    - modifier CHAINING left-to-right (``weekday 3`` then ``+36 hours``
      then ``-30 minutes`` — reordering changes the answer);
    - ``time()`` rendering after ``start of day`` + negative seconds
      (crosses the midnight boundary backwards).

    All four columns are per-value sqlite3-parity-checked in
    tests/test_sqlite_compat.py::TestTimeModifierWitness; the DuckDB
    oracle replays the same normalization closed-form.  Reference scope:
    the date surface is inherited from SQLite core by
    /root/reference/steampipe_sqlite_extension (bundled 3.42); modifiers
    per the public SQLite lang_datefunc spec."""
    from steampipe_sqlite_spark.functions.sqlite_compat import sqlite_datetime

    orders = load_table(spark, sf_dir, "orders")
    out = orders.filter(F.col("o_orderkey") < 2000).select(
        "o_orderkey",
        sqlite_date(F.col("o_orderdate"), "weekday 1").alias("next_monday"),
        sqlite_date(F.col("o_orderdate"), "+13 months").alias("month_norm"),
        sqlite_datetime(
            F.col("o_orderdate"), "weekday 3", "+36 hours", "-30 minutes"
        ).alias("wed_plus"),
        sqlite_time(
            F.col("o_orderdate"), "start of day", "-90 seconds"
        ).alias("t_back"),
    )
    return presentation_sort(out, ["o_orderkey"])
