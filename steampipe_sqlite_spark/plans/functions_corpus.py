"""Scalar-function corpus: strings, date/time, math, JSON, conditionals.

Maps SURVEY.md §2.3 rows "String fns / Date-time fns / Math fns / JSON fns /
Type fns / Table-valued fns" — the SQLite-core function surface the
reference inherits — onto Spark built-ins, with DuckDB oracles.  Where the
two dialects spell a function differently the oracle carries the DuckDB
spelling; semantics are identical.
"""

from __future__ import annotations

from steampipe_sqlite_spark.plans.registry import sql_query

# --- String functions -----------------------------------------------------

sql_query(
    "str_basics",
    """
SELECT p_partkey,
       LOWER(p_name) AS lo, UPPER(p_brand) AS up,
       LENGTH(p_name) AS len_name,
       SUBSTR(p_name, 1, 5) AS sub5,
       TRIM('  ' || p_type || ' ') AS trimmed,
       REPLACE(p_name, ' ', '_') AS underscored,
       REVERSE(p_brand) AS rev,
       REPEAT('*', p_size % 4) AS stars,
       LPAD(CAST(p_size AS STRING), 4, '0') AS padded
FROM part
ORDER BY p_partkey
""",
    oracle="""
SELECT p_partkey,
       LOWER(p_name) AS lo, UPPER(p_brand) AS up,
       LENGTH(p_name) AS len_name,
       SUBSTR(p_name, 1, 5) AS sub5,
       TRIM('  ' || p_type || ' ') AS trimmed,
       REPLACE(p_name, ' ', '_') AS underscored,
       REVERSE(p_brand) AS rev,
       REPEAT('*', p_size % 4) AS stars,
       LPAD(CAST(p_size AS VARCHAR), 4, '0') AS padded
FROM part
ORDER BY p_partkey
""",
)

sql_query(
    "str_search",
    """
SELECT p_partkey,
       POSITION('e' IN p_name) AS pos_e,
       INSTR(p_name, 'o') AS pos_o,
       SPLIT_PART(p_name, ' ', 1) AS first_word,
       SPLIT_PART(p_name, ' ', 2) AS second_word,
       LEFT(p_name, 3) AS l3, RIGHT(p_name, 3) AS r3,
       CONTAINS(p_name, 'red') AS has_red,
       p_name LIKE '%bolt%' AS like_bolt,
       p_name ILIKE '%RED%' AS ilike_red
FROM part
ORDER BY p_partkey
""",
)

sql_query(
    "str_concat_format",
    """
SELECT c_custkey,
       CONCAT(c_name, '/', c_mktsegment) AS tagged,
       CONCAT_WS('-', c_name, CAST(c_nationkey AS STRING)) AS dashed,
       ASCII(c_mktsegment) AS first_cp,
       CHR(65 + CAST(c_nationkey AS INT) % 26) AS letter,
       UPPER(HEX(LEFT(c_name, 2))) AS hex2,
       FORMAT_STRING('%s#%03d', c_mktsegment, CAST(c_nationkey AS INT)) AS fmt
FROM customer
ORDER BY c_custkey
""",
    oracle="""
SELECT c_custkey,
       CONCAT(c_name, '/', c_mktsegment) AS tagged,
       CONCAT_WS('-', c_name, CAST(c_nationkey AS VARCHAR)) AS dashed,
       ASCII(c_mktsegment) AS first_cp,
       CHR(65 + CAST(c_nationkey AS INT) % 26) AS letter,
       UPPER(HEX(LEFT(c_name, 2))) AS hex2,
       PRINTF('%s#%03d', c_mktsegment, CAST(c_nationkey AS INT)) AS fmt
FROM customer
ORDER BY c_custkey
""",
)

sql_query(
    "str_regexp",
    """
SELECT doc_id,
       REGEXP_EXTRACT(text, '([a-z]+)', 1) AS first_word,
       REGEXP_REPLACE(SUBSTR(text, 1, 50), '[aeiou]', '.') AS devoweled,
       REGEXP_COUNT(SUBSTR(text, 1, 200), 'data') AS n_data,
       SUBSTR(text, 1, 30) RLIKE '^[a-z ]+$' AS lowercase_only
FROM documents
ORDER BY doc_id
""",
    oracle="""
SELECT doc_id,
       REGEXP_EXTRACT(text, '([a-z]+)', 1) AS first_word,
       REGEXP_REPLACE(SUBSTR(text, 1, 50), '[aeiou]', '.', 'g') AS devoweled,
       LEN(REGEXP_EXTRACT_ALL(SUBSTR(text, 1, 200), 'data')) AS n_data,
       REGEXP_MATCHES(SUBSTR(text, 1, 30), '^[a-z ]+$') AS lowercase_only
FROM documents
ORDER BY doc_id
""",
)

# --- Date / time functions ------------------------------------------------

sql_query(
    "date_extract_parts",
    """
SELECT event_id,
       EXTRACT(YEAR FROM ts) AS y, EXTRACT(MONTH FROM ts) AS mo,
       EXTRACT(DAY FROM ts) AS d, EXTRACT(HOUR FROM ts) AS h,
       EXTRACT(MINUTE FROM ts) AS mi,
       CAST(EXTRACT(SECOND FROM ts) AS BIGINT) AS s
FROM events
ORDER BY event_id
LIMIT 500
""",
)

sql_query(
    "date_trunc_buckets",
    """
SELECT DATE_TRUNC('DAY', ts) AS day_bucket,
       DATE_TRUNC('HOUR', ts) AS hour_bucket,
       COUNT(*) AS n
FROM events
GROUP BY DATE_TRUNC('DAY', ts), DATE_TRUNC('HOUR', ts)
ORDER BY day_bucket, hour_bucket
""",
    oracle="""
SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day_bucket,
       DATE_TRUNC('hour', ts) AS hour_bucket,
       COUNT(*) AS n
FROM events
GROUP BY CAST(DATE_TRUNC('day', ts) AS TIMESTAMP), DATE_TRUNC('hour', ts)
ORDER BY day_bucket, hour_bucket
""",
)

sql_query(
    "date_arithmetic",
    """
SELECT o_orderkey,
       o_orderdate + INTERVAL 30 DAY AS due_date,
       o_orderdate - INTERVAL 1 DAY AS day_before,
       CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS as_date,
       CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
       DATEDIFF(TIMESTAMP '2000-01-01 00:00:00', o_orderdate) AS days_to_y2k
FROM orders
ORDER BY o_orderkey
LIMIT 500
""",
    oracle="""
SELECT o_orderkey,
       o_orderdate + INTERVAL 30 DAY AS due_date,
       o_orderdate - INTERVAL 1 DAY AS day_before,
       CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS as_date,
       CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
       DATEDIFF('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS days_to_y2k
FROM orders
ORDER BY o_orderkey
LIMIT 500
""",
)

sql_query(
    "date_format_epoch",
    """
SELECT event_id,
       DATE_FORMAT(ts, 'yyyy-MM-dd HH:mm') AS formatted,
       UNIX_TIMESTAMP(DATE_TRUNC('SECOND', ts)) AS epoch_s,
       DAYOFWEEK(ts) - 1 AS dow_sun0,
       WEEKOFYEAR(ts) AS iso_week
FROM events
ORDER BY event_id
LIMIT 500
""",
    oracle="""
SELECT event_id,
       STRFTIME(ts, '%Y-%m-%d %H:%M') AS formatted,
       CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) AS epoch_s,
       CAST(EXTRACT(dow FROM ts) AS INT) AS dow_sun0,
       CAST(EXTRACT(week FROM ts) AS INT) AS iso_week
FROM events
ORDER BY event_id
LIMIT 500
""",
)

# --- Math functions -------------------------------------------------------

sql_query(
    "math_basics",
    """
SELECT o_orderkey,
       ABS(o_totalprice - 100000) AS dist_100k,
       ROUND(o_totalprice, 1) AS rounded1,
       CAST(FLOOR(o_totalprice) AS BIGINT) AS flr, CAST(CEIL(o_totalprice) AS BIGINT) AS cl,
       MOD(o_orderkey, 7) AS m7,
       CAST(SIGN(o_totalprice - 100000) AS INT) AS sgn,
       GREATEST(o_totalprice, 50000.0) AS hi,
       LEAST(o_totalprice, 50000.0) AS lo
FROM orders
ORDER BY o_orderkey
LIMIT 500
""",
)

sql_query(
    "math_transcendental",
    """
SELECT s_suppkey,
       ROUND(SQRT(ABS(s_acctbal)), 6) AS sq,
       ROUND(POWER(1.05, s_nationkey), 6) AS pw,
       ROUND(EXP(s_nationkey / 10.0), 6) AS ex,
       ROUND(LN(ABS(s_acctbal) + 1), 6) AS lg,
       ROUND(LOG10(ABS(s_acctbal) + 1), 6) AS lg10,
       ROUND(SIN(s_nationkey), 6) AS sn,
       ROUND(COS(s_nationkey), 6) AS cs,
       ROUND(ATAN2(s_acctbal, 100.0), 6) AS at2,
       ROUND(DEGREES(ATAN(1)), 6) AS deg45
FROM supplier
ORDER BY s_suppkey
""",
)

# --- Conditionals / type functions ---------------------------------------

sql_query(
    "cond_case_coalesce",
    """
SELECT o_orderkey,
       CASE o_orderstatus WHEN 'F' THEN 'finished'
                          WHEN 'O' THEN 'open'
                          ELSE 'other' END AS status_word,
       COALESCE(NULLIF(o_orderstatus, 'P'), 'was_pending') AS no_pending,
       IFNULL(NULLIF(o_orderpriority, '5-LOW'), 'LOW') AS pri,
       IF(o_totalprice > 100000, 'big', 'small') AS size_class
FROM orders
ORDER BY o_orderkey
LIMIT 500
""",
)

sql_query(
    "cast_try_cast",
    """
SELECT c_custkey,
       CAST(FLOOR(c_acctbal) AS INT) AS bal_int,
       CAST(c_custkey AS STRING) AS key_str,
       TRY_CAST(c_mktsegment AS INT) AS seg_as_int,
       TRY_CAST(SUBSTR(c_name, 10, 8) AS BIGINT) AS name_digits,
       CAST(c_acctbal > 0 AS INT) AS positive_flag
FROM customer
ORDER BY c_custkey
""",
    oracle="""
SELECT c_custkey,
       CAST(FLOOR(c_acctbal) AS INT) AS bal_int,
       CAST(c_custkey AS VARCHAR) AS key_str,
       TRY_CAST(c_mktsegment AS INT) AS seg_as_int,
       TRY_CAST(SUBSTR(c_name, 10, 8) AS BIGINT) AS name_digits,
       CAST(c_acctbal > 0 AS INT) AS positive_flag
FROM customer
ORDER BY c_custkey
""",
)

# --- JSON functions (events.props is a JSON string — the stand-in for the
# reference's subtype-74 TEXT JSON columns, /root/reference/cursor.go:146-148)

sql_query(
    "json_extract_scalar",
    """
SELECT event_id,
       GET_JSON_OBJECT(props, '$.k') AS k_str,
       CAST(GET_JSON_OBJECT(props, '$.k') AS BIGINT) AS k_int,
       GET_JSON_OBJECT(props, '$.missing') AS absent
FROM events
ORDER BY event_id
LIMIT 500
""",
    oracle="""
SELECT event_id,
       JSON_EXTRACT_STRING(props, '$.k') AS k_str,
       CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k_int,
       JSON_EXTRACT_STRING(props, '$.missing') AS absent
FROM events
ORDER BY event_id
LIMIT 500
""",
)

# keys is CSV-joined on both sides: the corpus convention is that arrays
# never cross the driver hash (agg_array_ops precedent) — the driver's
# pandas sort_values canonicalizer cannot hash list cells (r4 red).
sql_query(
    "json_build_and_length",
    """
SELECT event_id,
       TO_JSON(NAMED_STRUCT('id', event_id, 'type', event_type)) AS built,
       CAST(JSON_ARRAY_LENGTH(CONCAT('[', props, ',', props, ']')) AS BIGINT) AS arr_len,
       ARRAY_JOIN(JSON_OBJECT_KEYS(props), ',') AS keys
FROM events
ORDER BY event_id
LIMIT 500
""",
    oracle="""
SELECT event_id,
       TO_JSON(struct_pack(id := event_id, type := event_type)) AS built,
       CAST(JSON_ARRAY_LENGTH(CONCAT('[', props, ',', props, ']')) AS BIGINT) AS arr_len,
       ARRAY_TO_STRING(CAST(JSON_KEYS(props) AS VARCHAR[]), ',') AS keys
FROM events
ORDER BY event_id
LIMIT 500
""",
)

sql_query(
    "json_group_array",
    """
SELECT user_id,
       TO_JSON(SORT_ARRAY(COLLECT_LIST(CAST(GET_JSON_OBJECT(props, '$.k') AS BIGINT)))) AS ks
FROM events
WHERE event_type = 'purchase'
GROUP BY user_id
ORDER BY user_id
""",
    oracle="""
SELECT user_id,
       TO_JSON(LIST_SORT(LIST(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)))) AS ks
FROM events
WHERE event_type = 'purchase'
GROUP BY user_id
ORDER BY user_id
""",
)

# --- Table-valued functions: sequence/explode ≈ generate_series/json_each

sql_query(
    "tvf_sequence_explode",
    """
SELECT r_regionkey, n
FROM region
LATERAL VIEW EXPLODE(SEQUENCE(1, CAST(r_regionkey AS INT) + 1)) t AS n
ORDER BY r_regionkey, n
""",
    oracle="""
SELECT r_regionkey, UNNEST(GENERATE_SERIES(1, r_regionkey + 1)) AS n
FROM region
ORDER BY r_regionkey, n
""",
)

# The SQL-callable generate_series(start, stop, step) form itself (the
# SQLite series extension the reference ships), as a registered UDTF —
# correlated lateral arguments and a negative step exercised.
from steampipe_sqlite_spark.plans.registry import query


@query(
    "tvf_generate_series",
    oracle="""
SELECT r_regionkey,
       UNNEST(GENERATE_SERIES(0, r_regionkey * 2, 2)) AS up,
FROM region
ORDER BY r_regionkey, up
""",
)
def tvf_generate_series(spark, sf_dir):
    """`FROM region, LATERAL generate_series(0, k*2, 2)` through the
    registered TVF (functions/series.py) — dialect parity for the SQLite
    series extension; bulk ranges should use sequence()/explode
    (tvf_sequence_explode) which stay JVM-side."""
    from steampipe_sqlite_spark.functions.series import ensure_generate_series
    from steampipe_sqlite_spark.tables import register_views

    ensure_generate_series(spark)
    register_views(spark, sf_dir, ("region",))
    return spark.sql(
        """
SELECT r_regionkey, t.value AS up
FROM region, LATERAL generate_series(0, CAST(r_regionkey AS LONG) * 2, 2) t
ORDER BY r_regionkey, up
"""
    )


sql_query(
    "tvf_json_each",
    """
SELECT event_id, kv.key AS k, kv.value AS v
FROM events
LATERAL VIEW EXPLODE(FROM_JSON(props, 'map<string,string>')) kv AS key, value
WHERE event_id < 100
ORDER BY event_id, k
""",
    oracle="""
SELECT event_id, k, JSON_EXTRACT_STRING(props, '$.' || k) AS v
FROM (SELECT event_id, props, UNNEST(JSON_KEYS(props)) AS k
      FROM events WHERE event_id < 100) t
ORDER BY event_id, k
""",
)


# --- remaining SQLite-inherited scalar surface (SURVEY §2.3 rows: hex,
# char/unicode, translate, scalar max/min) --------------------------------
sql_query(
    "str_hex_char_translate",
    """
SELECT p_partkey,
       hex(p_partkey) AS key_hex,
       ascii(p_name) AS first_cp,
       chr(ascii(p_name) + 1) AS next_char,
       translate(p_brand, '#', '-') AS brand_dashed,
       repeat(substr(p_type, 1, 2), 2) AS type2
FROM part
WHERE p_partkey < 50
ORDER BY p_partkey
""",
)

sql_query(
    "scalar_greatest_least",
    """
SELECT o_orderkey,
       greatest(o_totalprice, 1000.0, o_orderkey * 1.0) AS hi,
       least(o_totalprice, 1000.0, o_orderkey * 1.0) AS lo
FROM orders
WHERE o_orderkey < 200
ORDER BY o_orderkey
""",
)

# json_group_object (SQLite) → to_json(map_from_entries(collect_list(...)))
# — both engines build {type: count} per priority bucket; map entries are
# inserted in a deterministic (sorted) order so the JSON strings match.
sql_query(
    "json_group_object",
    """
SELECT o_orderpriority,
       to_json(map_from_entries(sorted_pairs)) AS status_counts
FROM (
  SELECT o_orderpriority, array_sort(collect_list(struct(o_orderstatus AS k, cnt AS v))) AS sorted_pairs
  FROM (
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS cnt
    FROM orders
    GROUP BY o_orderpriority, o_orderstatus
  ) c
  GROUP BY o_orderpriority
) g
ORDER BY o_orderpriority
""",
    oracle="""
SELECT o_orderpriority,
       to_json(map_from_entries(list_sort(list({'k': o_orderstatus, 'v': cnt})))) AS status_counts
FROM (
  SELECT o_orderpriority, o_orderstatus, COUNT(*) AS cnt
  FROM orders
  GROUP BY o_orderpriority, o_orderstatus
) c
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)


# --- VariantType JSON (SURVEY §7.4 upgrade path) --------------------------
# The engine's default JSON surface is string + get_json_object (mirroring
# the reference's subtype-74 text); Spark 4's VariantType is the idiomatic
# endpoint — parse once, typed extraction after.  The oracle reads the
# same fields with DuckDB's JSON extraction.
sql_query(
    "json_variant_extract",
    """
SELECT event_id,
       variant_get(parse_json(props), '$.k', 'bigint') AS k_int,
       CAST(try_variant_get(parse_json(props), '$.missing', 'string') IS NULL AS INT) AS missing_null
FROM events
WHERE event_id < 500
ORDER BY event_id
""",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
       CAST(json_extract_string(props, '$.missing') IS NULL AS INT) AS missing_null
FROM events
WHERE event_id < 500
ORDER BY event_id
""",
)


# --- exact percentiles / median (linear interpolation on both engines) ----
sql_query(
    "agg_percentiles_median",
    """
SELECT o_orderpriority,
       percentile(o_totalprice, 0.5) AS p50,
       percentile(o_totalprice, 0.95) AS p95,
       median(o_totalprice) AS med
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    oracle="""
SELECT o_orderpriority,
       quantile_cont(o_totalprice, 0.5) AS p50,
       quantile_cont(o_totalprice, 0.95) AS p95,
       median(o_totalprice) AS med
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)


# --- array functions (collect/sort/slice/join/contains) -------------------
# The array intermediates (collect_set → sort_array → slice) are the point
# of the query; the RESULT columns are serialized with array_join because
# the driver's pandas-based value hasher cannot hash raw list cells
# (unhashable type: 'list' — failed rounds 1 and 2).  Driver-hashable
# output is part of the oracle contract.
sql_query(
    "agg_array_ops",
    """
SELECT n_name,
       array_join(sort_array(collect_set(c_mktsegment)), '|') AS segs,
       size(collect_set(c_mktsegment)) AS n_segs,
       array_join(slice(sort_array(collect_set(c_mktsegment)), 1, 3), '|') AS first3,
       array_join(sort_array(collect_set(c_mktsegment)), '|') AS joined,
       array_contains(collect_set(c_mktsegment), 'BUILDING') AS has_building
FROM customer
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
""",
    oracle="""
SELECT n_name,
       array_to_string(list_sort(list(DISTINCT c_mktsegment)), '|') AS segs,
       len(list(DISTINCT c_mktsegment)) AS n_segs,
       array_to_string(list_sort(list(DISTINCT c_mktsegment))[1:3], '|') AS first3,
       array_to_string(list_sort(list(DISTINCT c_mktsegment)), '|') AS joined,
       list_contains(list(DISTINCT c_mktsegment), 'BUILDING') AS has_building
FROM customer
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
""",
)


# --- SQLite json1 compat shims (functions/json_compat.py) -----------------
# Semantics ground truth is the stdlib-sqlite3 parity suite
# (tests/test_sqlite_compat.py::TestJsonCompat); these corpus entries give
# the shims driver-level verification on real table data.

from steampipe_sqlite_spark.plans.registry import query
from steampipe_sqlite_spark.tables import load_table


@query(
    "json_sqlite_type_valid_quote",
    oracle="""
SELECT event_id,
       lower(json_type(props)) AS t_root,
       CASE lower(json_type(props, '$.k'))
            WHEN 'ubigint' THEN 'integer' WHEN 'bigint' THEN 'integer'
            ELSE lower(json_type(props, '$.k')) END AS t_k,
       CASE WHEN json_valid(props) THEN 1 ELSE 0 END AS is_valid,
       json_quote(event_type) AS quoted
FROM events ORDER BY event_id LIMIT 500
""",
)
def json_sqlite_type_valid_quote_q(spark, sf_dir):
    """json_type/json_valid/json_quote shims (JVM-side, variant-based) on
    the events.props JSON column; DuckDB's json_type vocabulary is mapped
    to SQLite's in the oracle (UBIGINT→integer)."""
    from pyspark.sql import functions as F

    from steampipe_sqlite_spark.functions.json_compat import (
        json_quote,
        json_type,
        json_valid,
    )

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_id",
            json_type(F.col("props")).alias("t_root"),
            json_type(F.col("props"), "$.k").alias("t_k"),
            json_valid(F.col("props")).alias("is_valid"),
            json_quote(F.col("event_type")).alias("quoted"),
        )
        .orderBy("event_id")
        .limit(500)
    )


@query(
    "json_sqlite_mutators",
    oracle="""
SELECT event_id,
       CAST(user_id AS VARCHAR) AS set_extra,
       CAST(event_id AS VARCHAR) AS insert_noop,
       CAST(NULL AS VARCHAR) AS type_after_remove,
       'en' AS lang_after_patch,
       CAST(NULL AS VARCHAR) AS type_after_patch
FROM events ORDER BY event_id LIMIT 500
""",
)
def json_sqlite_mutators_q(spark, sf_dir):
    """json_set/insert/remove/patch shims end-to-end: mutate a JSON doc
    built from table columns, then extract scalars back out.  The oracle
    states the expected extractions INDEPENDENTLY from the base columns
    (DuckDB has no json_set/insert/remove); byte-level mutation semantics
    are proven against native sqlite3 in the parity suite."""
    from pyspark.sql import functions as F

    from steampipe_sqlite_spark.functions.json_compat import (
        json_insert,
        json_patch,
        json_remove,
        json_set,
    )

    # NOTE: limit comes AFTER the orderBy at the end — a bare
    # `ev.limit(500)` takes an arbitrary 500 rows once the scan has more
    # than one partition (latent while the fixture read as a single
    # partition; surfaced by layout compaction).
    ev = load_table(spark, sf_dir, "events")
    j = F.to_json(F.named_struct(F.lit("id"), F.col("event_id"), F.lit("type"), F.col("event_type")))
    # literal: to_json(named_struct) DROPS null fields, losing the
    # RFC-7386 "type":null deletion marker
    patch = F.lit('{"type":null,"lang":"en"}')
    return (
        ev.select(
            "event_id",
            F.get_json_object(json_set(j, "$.extra", F.col("user_id")), "$.extra").alias("set_extra"),
            F.get_json_object(json_insert(j, "$.id", F.lit(999)), "$.id").alias("insert_noop"),
            F.get_json_object(json_remove(j, "$.type"), "$.type").alias("type_after_remove"),
            F.get_json_object(json_patch(j, patch), "$.lang").alias("lang_after_patch"),
            F.get_json_object(json_patch(j, patch), "$.type").alias("type_after_patch"),
        )
        .orderBy("event_id")
        .limit(500)
    )


# Statistical aggregate surface (stddev/covar/corr) via EXACT integer
# moments: raw sums of integer cents x hour-of-day are BIGINT-exact and
# fold-order-free; the derived statistics are then a fixed dag of
# correctly-rounded double ops (+,-,*,/,sqrt — bit-identical cross-engine;
# registry numeric rules), written as ONE shared SQL text.  This sidesteps
# the engines' own STDDEV/CORR implementations, whose incremental
# (Welford) vs two-pass summation orders differ in ulps.
_MOMENTS_SQL = """
WITH pts AS (
  SELECT event_type,
         CAST(ROUND(value * 100) AS BIGINT) AS x,
         CAST(hour(ts) AS BIGINT) AS y
  FROM events
),
m AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM pts GROUP BY event_type
)
SELECT event_type, n, sx, sy,
       CASE WHEN n > 1 THEN
         (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
           / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1e0))
       END AS covar_samp_cents_hour,
       CASE WHEN n > 1 AND CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0e0
                 AND CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy > 0e0 THEN
         (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
           / (SQRT(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
              * SQRT(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
       END AS corr_cents_hour,
       CASE WHEN n > 1 THEN
         SQRT((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
              / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1e0)))
       END AS std_cents
FROM m
ORDER BY event_type
"""

sql_query("agg_corr_covar_moments", _MOMENTS_SQL, present_sort=["event_type"])


# --- Bitwise aggregates & width_bucket histogram (round-6 continuation) ----

sql_query(
    "agg_bitwise",
    """
SELECT event_type,
       CAST(BIT_AND(event_id) AS BIGINT) AS band,
       CAST(BIT_OR(event_id) AS BIGINT) AS bor,
       CAST(BIT_XOR(event_id) AS BIGINT) AS bxor,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    present_sort=["event_type"],
)
# ^ Bitwise AND/OR/XOR aggregates (flag-mask rollups, parity checks,
# XOR-trick missing-id hunts).  Associative+commutative -> map-side
# partial merge like any sum; identical integer semantics both engines.

_WB_TAIL = """
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(MIN(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS min_cents,
       CAST(MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS max_cents
FROM orders
GROUP BY bucket
ORDER BY bucket
"""
sql_query(
    "agg_width_bucket_hist",
    """
SELECT CAST(WIDTH_BUCKET(o_totalprice, 0.0e0, 600000.0e0, 12) AS BIGINT)
         AS bucket,""" + _WB_TAIL,
    oracle="""
SELECT CAST(CASE WHEN o_totalprice < 0.0e0 THEN 0
                 WHEN o_totalprice >= 600000.0e0 THEN 13
                 ELSE FLOOR(o_totalprice / 50000.0e0) + 1 END AS BIGINT)
         AS bucket,""" + _WB_TAIL,
    present_sort=["bucket"],
)
# ^ SQL-standard WIDTH_BUCKET equi-width histogram (12 buckets over
# [0, 600k), under/overflow to 0/13 per the standard).  DuckDB has no
# width_bucket, so the oracle replays the SAME double arithmetic Spark's
# WidthBucket evaluates — floor((v - lo) / ((hi - lo)/n)) + 1 with
# (hi-lo)/n = 50000 exactly representable, and IEEE division/floor are
# correctly rounded on both engines, so the buckets are bit-identical.
# Plain two-level hash aggregate.
