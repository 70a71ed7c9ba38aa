"""Parity tests for the SQLite-compat layer — oracle is the stdlib
``sqlite3`` engine itself (same core the reference bundles)."""

import sqlite3

import pytest
from pyspark.sql import functions as F

from steampipe_sqlite_spark.functions.sqlite_compat import (
    apply_modifiers,
    glob_match,
    glob_to_regex,
    julianday,
    sqlite_date,
    sqlite_datetime,
    sqlite_time,
    strftime,
    unixepoch,
)

TS_SAMPLES = [
    "2024-01-31 23:59:59",
    "2024-02-29 00:00:00",
    "1995-07-16 12:34:56",
    "1998-12-01 06:00:01",
    "2000-01-01 00:00:00",
]

GLOB_CASES = [
    ("abc*", ["abc", "abcdef", "ABCdef", "xabc"]),
    ("*tab?e*", ["table scan", "tabXe", "tab e ", "tale"]),
    ("[a-c]it*", ["bit", "cite", "dit", "ait hello"]),
    ("[^a-c]it", ["dit", "ait", "it"]),
    ("a[]]b", ["a]b", "ab"]),
    ("100% *", ["100% sure", "100x sure"]),
    ("a.b|c", ["a.b|c", "aXb|c"]),
]


@pytest.fixture(scope="module")
def lite():
    con = sqlite3.connect(":memory:")
    yield con
    con.close()


def test_glob_matches_sqlite(spark, lite):
    for pattern, texts in GLOB_CASES:
        expected = [
            bool(lite.execute("SELECT ? GLOB ?", (t, pattern)).fetchone()[0]) for t in texts
        ]
        df = spark.createDataFrame([(t,) for t in texts], ["t"])
        got = [r.m for r in df.select(glob_match(F.col("t"), pattern).alias("m")).collect()]
        assert got == expected, f"pattern {pattern!r}: {got} != {expected} (regex {glob_to_regex(pattern)!r})"


MODIFIER_SETS = [
    (),
    ("+7 days",),
    ("-3 months",),
    ("+1 years", "start of month"),
    ("start of year", "+90 days"),
    ("start of day",),
    ("weekday 1",),
    ("-36 hours", "weekday 0"),
    ("+90 minutes", "+30 seconds"),
]


def _spark_vals(spark, col):
    df = spark.createDataFrame([(t,) for t in TS_SAMPLES], ["s"])
    return [
        r.v for r in df.select(col(F.to_timestamp(F.col("s"))).alias("v")).collect()
    ]


def test_date_and_datetime_with_modifiers(spark, lite):
    for mods in MODIFIER_SETS:
        exp_date = [
            lite.execute(f"SELECT date(?{',?' * len(mods)})", (t, *mods)).fetchone()[0]
            for t in TS_SAMPLES
        ]
        got_date = _spark_vals(spark, lambda c, m=mods: sqlite_date(c, *m))
        assert got_date == exp_date, f"date mods {mods}"
        exp_dt = [
            lite.execute(f"SELECT datetime(?{',?' * len(mods)})", (t, *mods)).fetchone()[0]
            for t in TS_SAMPLES
        ]
        got_dt = _spark_vals(spark, lambda c, m=mods: sqlite_datetime(c, *m))
        assert got_dt == exp_dt, f"datetime mods {mods}"


def test_time_with_modifiers(spark, lite):
    for mods in MODIFIER_SETS:
        expected = [
            lite.execute(f"SELECT time(?{',?' * len(mods)})", (t, *mods)).fetchone()[0]
            for t in TS_SAMPLES
        ]
        got = _spark_vals(spark, lambda c, m=mods: sqlite_time(c, *m))
        assert got == expected, f"time mods {mods}"


def test_strftime_token_subset(spark, lite):
    fmts = ["%Y-%m-%d", "%H:%M:%S", "%Y/%j", "%s", "%w", "%Y-%m-%dT%H:%M", "%d.%m.%Y %% %T"]
    for fmt in fmts:
        expected = [
            lite.execute("SELECT strftime(?, ?)", (fmt, t)).fetchone()[0] for t in TS_SAMPLES
        ]
        if any(e is None for e in expected):
            continue  # token postdates the stdlib's bundled SQLite
        got = _spark_vals(spark, lambda c, f=fmt: strftime(f, c))
        assert got == expected, f"fmt {fmt!r}"


def test_julianday_and_unixepoch(spark, lite):
    exp_jd = [float(lite.execute("SELECT julianday(?)", (t,)).fetchone()[0]) for t in TS_SAMPLES]
    got_jd = _spark_vals(spark, julianday)
    assert got_jd == pytest.approx(exp_jd, abs=1e-9)
    exp_ue = [int(lite.execute("SELECT unixepoch(?)", (t,)).fetchone()[0]) for t in TS_SAMPLES]
    got_ue = _spark_vals(spark, unixepoch)
    assert got_ue == exp_ue


def test_unsupported_constructs_raise(spark):
    with pytest.raises(ValueError):
        apply_modifiers(F.lit("2024-01-01").cast("timestamp"), "localtime")
    with pytest.raises(ValueError):
        strftime("%G", F.lit("2024-01-01").cast("timestamp"))


def test_groups_frame_is_a_documented_rejection(spark):
    """SQLite (3.28+) supports GROUPS window frames; Spark does not
    (SURVEY §7.5.3 documents the rejection). Pin that the gap surfaces as
    a parse error, not silent misbehavior."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import ParseException

    with pytest.raises((ParseException, Py4JJavaError, Exception)) as ei:
        spark.sql(
            "SELECT sum(o_totalprice) OVER (ORDER BY o_orderkey "
            "GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) FROM orders"
        ).collect()
    assert "GROUPS" in str(ei.value).upper() or "PARSE" in type(ei.value).__name__.upper()


class TestWindowFrameEmulation:
    """Ground truth for the GROUPS/EXCLUDE rewrites (plans/relational.py
    win_groups_frame / win_exclude_*): stdlib sqlite3 runs the NATIVE
    construct, Spark runs the emulation, results must match row for row."""

    ROWS = [
        (1, "a", "2024-01-01", 10),
        (2, "a", "2024-01-02", 20),
        (3, "a", "2024-01-02", 21),
        (4, "a", "2024-01-03", 30),
        (5, "b", "2024-01-01", 5),
        (6, "b", "2024-01-01", 7),
    ]

    @pytest.fixture()
    def sqlite_conn(self):
        import sqlite3

        c = sqlite3.connect(":memory:")
        c.execute("CREATE TABLE t(id INT, p TEXT, d TEXT, x INT)")
        c.executemany("INSERT INTO t VALUES (?,?,?,?)", self.ROWS)
        return c

    @pytest.fixture()
    def sdf(self, spark):
        return spark.createDataFrame(self.ROWS, "id int, p string, d string, x int")

    def test_groups_frame_rewrite_matches_native(self, sqlite_conn, sdf):
        native = sqlite_conn.execute(
            "SELECT id, SUM(x) OVER (PARTITION BY p ORDER BY d "
            "GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) FROM t ORDER BY id"
        ).fetchall()
        sdf.createOrReplaceTempView("t_groups")
        emulated = sdf.sparkSession.sql(
            """
            WITH g AS (
              SELECT id, x,
                     DENSE_RANK() OVER (PARTITION BY p ORDER BY d) AS grp, p
              FROM t_groups
            )
            SELECT id, SUM(x) OVER (PARTITION BY p ORDER BY grp
                 RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS s
            FROM g ORDER BY id
            """
        ).collect()
        assert [(r.id, r.s) for r in emulated] == native

    def test_exclude_current_row_rewrite_matches_native(self, sqlite_conn, sdf):
        native = sqlite_conn.execute(
            "SELECT id, SUM(x) OVER (PARTITION BY p ORDER BY id "
            "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW EXCLUDE CURRENT ROW) "
            "FROM t ORDER BY id"
        ).fetchall()
        sdf.createOrReplaceTempView("t_excl")
        emulated = sdf.sparkSession.sql(
            """
            SELECT id,
                   CASE WHEN COUNT(*) OVER w = 1 THEN NULL
                        ELSE (SUM(x) OVER w) - x END AS s
            FROM t_excl
            WINDOW w AS (PARTITION BY p ORDER BY id
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
            ORDER BY id
            """
        ).collect()
        assert [(r.id, r.s) for r in emulated] == native

    def test_exclude_group_rewrite_matches_native(self, sqlite_conn, sdf):
        native = sqlite_conn.execute(
            "SELECT id, SUM(x) OVER (PARTITION BY p ORDER BY d "
            "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE GROUP) "
            "FROM t ORDER BY id"
        ).fetchall()
        sdf.createOrReplaceTempView("t_exg")
        emulated = sdf.sparkSession.sql(
            """
            SELECT id,
                   CASE WHEN COUNT(*) OVER run = COUNT(*) OVER peers THEN NULL
                        ELSE (SUM(x) OVER run) - (SUM(x) OVER peers) END AS s
            FROM t_exg
            WINDOW run AS (PARTITION BY p ORDER BY d
                           RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   peers AS (PARTITION BY p, d)
            ORDER BY id
            """
        ).collect()
        assert [(r.id, r.s) for r in emulated] == native


class TestJsonCompat:
    """json1 mutator/validator shims vs stdlib sqlite3 native json1
    (functions/json_compat.py).  Same parity pattern as the date suite."""

    DOCS = [
        '{"a":1}',
        '{"a":{"b":2},"c":[1,2,3]}',
        '{"a":[1,2.5,"x"],"flag":true}',
        "[10,20,30]",
        '{"s":"hi \\"q\\""}',
    ]

    @pytest.fixture()
    def sqlite_conn(self):
        import sqlite3

        return sqlite3.connect(":memory:")

    @pytest.fixture()
    def jdf(self, spark):
        return spark.createDataFrame([(d,) for d in self.DOCS], "j string")

    def _native(self, conn, expr):
        return [
            conn.execute(f"SELECT {expr}", (d,)).fetchone()[0] for d in self.DOCS
        ]

    def _spark(self, jdf, col):
        return [r.out for r in jdf.select(col.alias("out")).collect()]

    def test_json_valid(self, sqlite_conn, jdf, spark):
        from steampipe_sqlite_spark.functions.json_compat import json_valid

        import pyspark.sql.functions as F

        bad = spark.createDataFrame([("nope",), ("",), ("2.5",), ("[1,",)], "j string")
        for df in (jdf, bad):
            docs = [r.j for r in df.select("j").collect()]
            native = [
                sqlite_conn.execute("SELECT json_valid(?)", (d,)).fetchone()[0]
                for d in docs
            ]
            assert self._spark(df, json_valid(F.col("j"))) == native

    def test_json_type_root_and_path(self, sqlite_conn, jdf):
        from steampipe_sqlite_spark.functions.json_compat import json_type

        import pyspark.sql.functions as F

        assert self._spark(jdf, json_type(F.col("j"))) == self._native(
            sqlite_conn, "json_type(?)"
        )
        assert self._spark(jdf, json_type(F.col("j"), "$.a")) == self._native(
            sqlite_conn, "json_type(?, '$.a')"
        )

    def test_json_quote(self, sqlite_conn, spark):
        from steampipe_sqlite_spark.functions.json_compat import json_quote

        import pyspark.sql.functions as F

        sdf = spark.createDataFrame([("plain",), ('with "q"',), (None,)], "s string")
        vals = [r.s for r in sdf.select("s").collect()]
        native = [
            sqlite_conn.execute("SELECT json_quote(?)", (v,)).fetchone()[0]
            for v in vals
        ]
        assert self._spark(sdf, json_quote(F.col("s"))) == native
        idf = spark.createDataFrame([(7,), (25,)], "i int")
        native_i = [
            sqlite_conn.execute("SELECT json_quote(?)", (v,)).fetchone()[0]
            for v in (7, 25)
        ]
        assert self._spark(idf, json_quote(F.col("i"))) == [str(v) for v in (7, 25)]
        assert native_i == ["7", "25"]

    @pytest.mark.parametrize(
        "fn_name,path,value",
        [
            ("json_set", "$.a", 9),
            ("json_set", "$.new", 1),
            ("json_set", "$.a.b", 5),          # intermediate creation / scalar no-op
            ("json_set", "$.c[1]", 99),
            ("json_set", "$.c[3]", 4),          # append at len
            ("json_set", "$.c[9]", 4),          # beyond len: no-op
            ("json_insert", "$.a", 9),          # exists: no-op
            ("json_insert", "$.zz", 3),
            ("json_replace", "$.a", 9),
            ("json_replace", "$.zz", 3),        # missing: no-op
        ],
    )
    def test_mutators_match_native(self, sqlite_conn, jdf, fn_name, path, value):
        import pyspark.sql.functions as F

        from steampipe_sqlite_spark.functions import json_compat

        native = [
            sqlite_conn.execute(
                f"SELECT {fn_name}(?, '{path}', ?)", (d, value)
            ).fetchone()[0]
            for d in self.DOCS
        ]
        fn = getattr(json_compat, fn_name)
        got = self._spark(jdf, fn(F.col("j"), path, F.lit(value)))
        # canonicalize: sqlite prints minimal whitespace like json.dumps(separators)
        import json as pyjson

        assert [pyjson.loads(g) for g in got] == [pyjson.loads(n) for n in native]

    def test_json_remove_matches_native(self, sqlite_conn, jdf):
        import json as pyjson

        import pyspark.sql.functions as F

        from steampipe_sqlite_spark.functions.json_compat import json_remove

        for path in ("$.a", "$.c[1]", "$.zz"):
            native = [
                sqlite_conn.execute(
                    f"SELECT json_remove(?, '{path}')", (d,)
                ).fetchone()[0]
                for d in self.DOCS
            ]
            got = self._spark(jdf, json_remove(F.col("j"), path))
            assert [pyjson.loads(g) for g in got] == [pyjson.loads(n) for n in native]

    def test_json_patch_matches_native(self, sqlite_conn, spark):
        import json as pyjson

        import pyspark.sql.functions as F

        from steampipe_sqlite_spark.functions.json_compat import json_patch

        cases = [
            ('{"a":1,"b":2}', '{"b":null,"c":3}'),
            ('{"a":{"x":1}}', '{"a":{"y":2}}'),
            ("[1,2]", '{"a":1}'),
            ('{"a":1}', "[9]"),
        ]
        native = [
            sqlite_conn.execute("SELECT json_patch(?, ?)", c).fetchone()[0]
            for c in cases
        ]
        pdf = spark.createDataFrame(cases, "t string, p string")
        got = [r.out for r in pdf.select(json_patch(F.col("t"), F.col("p")).alias("out")).collect()]
        assert [pyjson.loads(g) for g in got] == [pyjson.loads(n) for n in native]

    def test_json_set_structured_value(self, sqlite_conn, spark):
        import json as pyjson

        import pyspark.sql.functions as F

        from steampipe_sqlite_spark.functions.json_compat import json_set

        native = sqlite_conn.execute(
            "SELECT json_set('{\"a\":1}', '$.b', json('[1,2]'))"
        ).fetchone()[0]
        sdf = spark.createDataFrame([('{"a":1}',)], "j string")
        got = sdf.select(
            json_set(F.col("j"), "$.b", F.lit("[1,2]"), value_is_json=True).alias("out")
        ).collect()[0].out
        assert pyjson.loads(got) == pyjson.loads(native)

    def test_bad_path_raises_at_build(self):
        import pyspark.sql.functions as F

        from steampipe_sqlite_spark.functions.json_compat import json_set

        with pytest.raises(ValueError):
            json_set(F.col("j"), "a.b", F.lit(1))


class TestJsonTree:
    """json_tree UDTF vs stdlib sqlite3's native json_tree."""

    DOC = '{"a":{"b":[1,"x"]},"c":2.5,"d":true,"e":null}'

    def test_matches_native_walk(self, spark):
        import sqlite3

        from steampipe_sqlite_spark.functions.json_compat import json_tree_udtf

        native = sqlite3.connect(":memory:").execute(
            "SELECT key, value, type, atom, fullkey, path FROM json_tree(?)",
            (self.DOC,),
        ).fetchall()

        spark.udtf.register("json_tree", json_tree_udtf())
        got = spark.sql(
            f"SELECT * FROM json_tree('{self.DOC}')"
        ).collect()

        def norm(rows):
            out = []
            for k, v, t, a, fk, p in rows:
                s = lambda x: None if x is None else str(x)
                # sqlite booleans surface as integer atoms 1/0 already
                out.append((s(k), s(v), t, s(a), fk, p))
            return out

        assert norm([tuple(r) for r in got]) == norm(native)

    def test_lateral_join(self, spark):
        from steampipe_sqlite_spark.functions.json_compat import json_tree_udtf

        spark.udtf.register("json_tree", json_tree_udtf())
        spark.createDataFrame(
            [(1, '{"x":1}'), (2, "[5]"), (3, "broken")], "id int, j string"
        ).createOrReplaceTempView("jt_docs")
        rows = spark.sql(
            "SELECT id, t.fullkey, t.atom FROM jt_docs, "
            "LATERAL json_tree(j) t ORDER BY id, t.fullkey"
        ).collect()
        # id=3 contributes no rows (invalid json)
        assert [(r.id, r.fullkey, r.atom) for r in rows] == [
            (1, "$", None),
            (1, "$.x", "1"),
            (2, "$", None),
            (2, "$[0]", "5"),
        ]


class TestScalarMisc:
    """The compat_scalar_misc mappings (iif/ifnull/nullif/instr/printf/
    sign/unicode) reproduce stdlib sqlite3 byte-for-byte on sample values."""

    SAMPLES = [
        ("Customer#000000042", "BUILDING", 711.56),
        ("Customer#000000007", "AUTOMOBILE", -272.6),
        ("Ωmega#01", "MACHINERY", 0.0),
    ]

    def test_scalar_misc_matches_sqlite(self, spark):
        con = sqlite3.connect(":memory:")
        rows = []
        for name, seg, bal in self.SAMPLES:
            rows.append(
                con.execute(
                    "SELECT iif(? > 0, 'credit', 'debit'),"
                    " coalesce(nullif(?, 'BUILDING'), 'OTHER'),"
                    " instr(?, '0'), printf('%s#%05d', ?, 42),"
                    " sign(?), unicode(?)",
                    (bal, seg, name, seg, bal, name),
                ).fetchone()
            )
        df = spark.createDataFrame(self.SAMPLES, ["name", "seg", "bal"])
        got = df.select(
            F.expr("if(bal > 0, 'credit', 'debit')"),
            F.expr("coalesce(nullif(seg, 'BUILDING'), 'OTHER')"),
            F.expr("instr(name, '0')"),
            F.expr("format_string('%s#%05d', seg, 42)"),
            F.expr("cast(sign(bal) as bigint)"),
            F.expr("ascii(name)"),
        ).collect()
        assert [tuple(r) for r in got] == rows


class TestCollateNocase:
    """nocase_key must reproduce SQLite's built-in NOCASE collation
    exactly: ASCII A-Z folds, every non-ASCII codepoint stays distinct
    (lower() would wrongly fold 'Ä' → 'ä')."""

    SAMPLES = [
        "apple", "APPLE", "Apple", "aPPle",
        "Banana split", "banana SPLIT",
        "Zebra", "zebra", "100% Sure", "100% sure",
        "Äpfel", "äpfel",          # non-ASCII: NOCASE keeps these distinct
        "naïve", "NAÏVE",          # folds N→n, leaves ï / Ï distinct
        "a-b", "A-B", "", " lead", " LEAD",
    ]

    def test_fold_equality_matches_sqlite(self, spark, lite):
        from steampipe_sqlite_spark.functions.sqlite_compat import nocase_key

        df = spark.createDataFrame([(s,) for s in self.SAMPLES], ["s"])
        keys = {r.s: r.k for r in df.select("s", nocase_key(F.col("s")).alias("k")).collect()}
        for a in self.SAMPLES:
            for b in self.SAMPLES:
                expected = bool(
                    lite.execute(
                        "SELECT ? = ? COLLATE NOCASE", (a, b)
                    ).fetchone()[0]
                )
                assert (keys[a] == keys[b]) == expected, (a, b)

    def test_order_by_matches_sqlite(self, spark, lite):
        from steampipe_sqlite_spark.functions.sqlite_compat import nocase_key

        # deterministic total order: NOCASE primary, raw value tiebreak —
        # the same spelling used by compat_collate_nocase and the shim doc
        lite.execute("DROP TABLE IF EXISTS noc")
        lite.execute("CREATE TABLE noc (s TEXT)")
        lite.executemany("INSERT INTO noc VALUES (?)", [(s,) for s in self.SAMPLES])
        expected = [
            r[0]
            for r in lite.execute(
                "SELECT s FROM noc ORDER BY s COLLATE NOCASE, s"
            ).fetchall()
        ]
        df = spark.createDataFrame([(s,) for s in self.SAMPLES], ["s"])
        got = [
            r.s
            for r in df.orderBy(nocase_key(F.col("s")), F.col("s")).collect()
        ]
        assert got == expected


class TestBlobConstructors:
    """zeroblob/randomblob vs stdlib sqlite3 (func.c semantics: zeroblob
    clamps to >=0 bytes; randomblob returns ONE byte — not zero — for
    N < 1).  Values of randomblob are unmatchable by construction, so the
    pinned contract is lengths + byte diversity."""

    def test_zeroblob_bytes_match_sqlite(self, spark, lite):
        from steampipe_sqlite_spark.functions.sqlite_compat import zeroblob

        for n in (-3, 0, 1, 4, 17):
            expected = lite.execute(f"SELECT zeroblob({n})").fetchone()[0]
            got = (
                spark.range(1)
                .select(zeroblob(n).alias("b"))
                .collect()[0]
                .b
            )
            assert bytes(got) == expected, n

    def test_randomblob_length_rule_matches_sqlite(self, spark, lite):
        from steampipe_sqlite_spark.functions.sqlite_compat import randomblob

        for n in (-2, 0, 1, 7, 16, 33):
            expected = lite.execute(
                f"SELECT length(randomblob({n}))"
            ).fetchone()[0]
            got = (
                spark.range(1)
                .select(F.length(randomblob(n, seed=11)).alias("n"))
                .collect()[0]
                .n
            )
            assert got == expected, n

    def test_randomblob_bytes_vary(self, spark):
        from steampipe_sqlite_spark.functions.sqlite_compat import randomblob

        rows = (
            spark.range(8)
            .select(F.hex(randomblob(32, seed=5)).alias("h"))
            .collect()
        )
        hexes = [r.h for r in rows]
        # per-row draws differ, and within a row the bytes are not constant
        assert len(set(hexes)) == len(hexes)
        assert all(len(set(h)) > 4 for h in hexes)
        # column-N form: length follows the column value under the clamp
        lens = (
            spark.range(5)
            .select(
                F.length(
                    randomblob(F.col("id").cast("int") - F.lit(2), seed=3)
                ).alias("n")
            )
            .collect()
        )
        assert [r.n for r in lens] == [1, 1, 1, 1, 2]


class TestTimeModifierWitness:
    """Per-value sqlite3 parity for the exact modifier chains the
    compat_time_modifiers corpus entry witnesses (VERDICT r9 #7) —
    month-end samples force the overflow-normalization carry (SQLite
    rolls Jan 31 +1 month into March; Spark's interval add clamps and
    the shim re-adds the clamped days), leap-February included."""

    HARD_TS = [
        "2023-01-31 00:00:00",  # +13 months crosses leap Feb 2024
        "2023-01-30 00:00:00",
        "2024-01-31 00:00:00",  # +13 months into non-leap Feb 2025
        "2023-03-31 00:00:00",
        "2023-12-31 00:00:00",
        "2024-02-29 00:00:00",  # leap day source
        "1995-07-16 12:34:56",  # mid-month, non-midnight control
        "1997-01-06 00:00:00",  # a Monday — weekday 1 must NOT move
        "1997-01-08 00:00:00",  # a Wednesday — weekday 3 must NOT move
    ]

    def test_corpus_columns_match_sqlite(self, spark, lite):
        cases = [
            ("date", lambda c: sqlite_date(c, "weekday 1"), ("weekday 1",)),
            ("date", lambda c: sqlite_date(c, "+13 months"), ("+13 months",)),
            (
                "datetime",
                lambda c: sqlite_datetime(
                    c, "weekday 3", "+36 hours", "-30 minutes"
                ),
                ("weekday 3", "+36 hours", "-30 minutes"),
            ),
            (
                "time",
                lambda c: sqlite_time(c, "start of day", "-90 seconds"),
                ("start of day", "-90 seconds"),
            ),
        ]
        df = spark.createDataFrame([(t,) for t in self.HARD_TS], ["s"])
        for fn_name, col, mods in cases:
            expected = [
                lite.execute(
                    f"SELECT {fn_name}(?{',?' * len(mods)})", (t, *mods)
                ).fetchone()[0]
                for t in self.HARD_TS
            ]
            got = [
                r.v
                for r in df.select(
                    col(F.to_timestamp(F.col("s"))).alias("v")
                ).collect()
            ]
            assert got == expected, f"{fn_name} mods {mods}"

    def test_month_overflow_normalization_span(self, spark, lite):
        # every month-end of 2023 + 1/13/25 months — the carry must match
        # sqlite3's computeYMD_HMS normalization everywhere, not just at
        # the corpus chain's 13
        import calendar

        ends = [
            f"2023-{m:02d}-{calendar.monthrange(2023, m)[1]:02d} 10:30:00"
            for m in range(1, 13)
        ]
        df = spark.createDataFrame([(t,) for t in ends], ["s"])
        for n in (1, 13, 25):
            expected = [
                lite.execute(
                    "SELECT datetime(?, ?)", (t, f"+{n} months")
                ).fetchone()[0]
                for t in ends
            ]
            got = [
                r.v
                for r in df.select(
                    sqlite_datetime(
                        F.to_timestamp(F.col("s")), f"+{n} months"
                    ).alias("v")
                ).collect()
            ]
            assert got == expected, f"+{n} months over 2023 month-ends"
