"""SQLite-dialect compatibility functions (SURVEY.md §2.3 / §7.5 gap 3).

The reference delegates its whole SQL surface to SQLite core, so queries
written against it may use SQLite-only constructs.  This module maps the
ones Spark lacks onto Catalyst expressions:

- ``glob_match``      — SQLite ``GLOB`` (``*``, ``?``, ``[seq]``, case-
                        sensitive) translated to an anchored Java regex,
                        evaluated JVM-side via ``rlike``.
- ``apply_modifiers`` — SQLite date modifiers ('+7 days', '-3 months',
                        'start of month', 'weekday 1', ...) as timestamp
                        column arithmetic.
- ``strftime``        — SQLite strftime over a supported %-token subset,
                        compiled to ``date_format`` / ``unix_timestamp``
                        expressions.
- ``sqlite_date`` / ``sqlite_datetime`` / ``julianday`` / ``unixepoch`` —
  the remaining SQLite date functions, same modifier pipeline.

Everything here stays inside whole-stage codegen (no Python UDFs): the
pattern/format/modifiers are plan-time literals, which is also how SQLite
sees them in the overwhelming majority of queries.  'localtime'/'utc'
modifiers are rejected (session-timezone dependent — documented
divergence).

Parity oracle: tests/test_sqlite_compat.py checks every construct against
the stdlib ``sqlite3`` engine itself.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- GLOB ------------------------------------------------------------------

_REGEX_SPECIALS = set(".$^{}()|+\\")


def glob_to_regex(pattern: str) -> str:
    """SQLite GLOB pattern → anchored Java regex.

    ``*`` → ``.*``, ``?`` → ``.``, ``[seq]``/``[^seq]`` pass through as a
    character class, everything else is literal-escaped.  GLOB is
    case-sensitive (unlike LIKE), which regex matching already is.
    """
    out = ["^"]
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        elif ch == "[":
            j = pattern.find("]", i + 2)  # "]" first in class is literal
            if j == -1:
                out.append("\\[")
            else:
                body = pattern[i + 1 : j]
                if body.startswith("^"):
                    body = "^" + body[1:].replace("\\", "\\\\")
                else:
                    body = body.replace("\\", "\\\\")
                out.append("[" + body + "]")
                i = j
        elif ch in _REGEX_SPECIALS or ch in "*?":
            out.append("\\" + ch)
        else:
            out.append(ch)
        i += 1
    out.append("$")
    return "".join(out)


def glob_match(col: Column, pattern: str) -> Column:
    """``col GLOB pattern`` — JVM-side rlike on the translated regex."""
    return col.rlike(glob_to_regex(pattern))


# --- date modifiers ----------------------------------------------------------

_UNITS = {
    "year": "years",
    "years": "years",
    "month": "months",
    "months": "months",
    "day": "days",
    "days": "days",
    "hour": "hours",
    "hours": "hours",
    "minute": "minutes",
    "minutes": "minutes",
    "second": "seconds",
    "seconds": "seconds",
}


def apply_modifiers(ts: Column, *modifiers: str) -> Column:
    """Apply SQLite date modifiers left-to-right to a timestamp column.

    Supported: '±N <unit>' (year..second, fractional seconds allowed),
    'start of day|month|year', 'weekday N' (next date where weekday = N,
    Sunday=0, no move if already there).  'localtime'/'utc' raise —
    session-timezone semantics don't replicate portably.
    """
    for raw in modifiers:
        m = raw.strip().lower()
        if m in ("localtime", "utc"):
            raise ValueError(f"unsupported SQLite modifier {raw!r}: timezone-dependent")
        if m.startswith("start of "):
            unit = m[len("start of ") :]
            if unit not in ("day", "month", "year"):
                raise ValueError(f"unsupported modifier {raw!r}")
            ts = F.date_trunc(unit, ts)
        elif m.startswith("weekday "):
            n = int(m[len("weekday ") :])
            if not 0 <= n <= 6:
                raise ValueError(f"weekday out of range in {raw!r}")
            # days ahead = (n - dow) mod 7 with dow Sunday=0
            dow = F.dayofweek(ts) - 1
            ahead = F.pmod(F.lit(n) - dow, F.lit(7))
            ts = F.to_timestamp(F.date_add(ts.cast("date"), ahead)) + (
                ts - F.date_trunc("day", ts)
            )
        else:
            sign = 1
            if m.startswith(("+", "-")):
                sign = -1 if m[0] == "-" else 1
                m = m[1:]
            try:
                amount_s, unit = m.split(None, 1)
                amount = float(amount_s) * sign
            except ValueError as e:
                raise ValueError(f"unsupported SQLite modifier {raw!r}") from e
            unit = _UNITS.get(unit.strip())
            if unit is None:
                raise ValueError(f"unsupported SQLite modifier {raw!r}")
            if unit in ("years", "months"):
                months = int(amount) * (12 if unit == "years" else 1)
                added = F.timestamp_add("MONTH", F.lit(months), ts)
                # Spark clamps month-end overflow (Jan 31 +1 month → Feb 29);
                # SQLite normalizes it forward (→ Mar 2). Roll the clamped
                # days back in.
                overflow = F.greatest(
                    F.dayofmonth(ts) - F.dayofmonth(added), F.lit(0)
                )
                ts = F.timestamp_add("DAY", overflow, added)
            else:
                secs = {"days": 86400, "hours": 3600, "minutes": 60, "seconds": 1}[unit] * amount
                # integral-second arithmetic stays exact; fractional falls
                # back to microsecond add
                ts = F.timestamp_add("MICROSECOND", F.lit(int(round(secs * 1e6))), ts)
    return ts


# --- strftime ----------------------------------------------------------------

_STRFTIME_SIMPLE = {
    "%Y": "yyyy",
    "%m": "MM",
    "%d": "dd",
    "%H": "HH",
    "%M": "mm",
    "%S": "ss",
    "%j": "DDD",
    "%e": "d",
    "%F": "yyyy-MM-dd",
    "%R": "HH:mm",
    "%T": "HH:mm:ss",
    "%%": "'%'",
}


def strftime(fmt: str, ts: Column, *modifiers: str) -> Column:
    """SQLite ``strftime(fmt, ts, mods...)`` for the common %-token subset.

    %Y %m %d %H %M %S %j %e %F %R %T %% map straight to ``date_format``;
    %s (unix seconds), %w (weekday, Sunday=0), %f (SS.SSS) are stitched in
    with concat.  Unknown tokens raise rather than silently diverge.
    """
    ts = apply_modifiers(ts, *modifiers)
    parts: list[Column] = []
    buf = ""  # pending date_format pattern text

    def flush():
        nonlocal buf
        if buf:
            parts.append(F.date_format(ts, buf))
            buf = ""

    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            tok = fmt[i : i + 2]
            if tok in _STRFTIME_SIMPLE:
                buf += _STRFTIME_SIMPLE[tok]
            elif tok == "%s":
                flush()
                parts.append(F.unix_timestamp(ts).cast("string"))
            elif tok == "%w":
                flush()
                parts.append((F.dayofweek(ts) - 1).cast("string"))
            elif tok == "%f":
                buf += "ss.SSS"
            else:
                raise ValueError(f"unsupported strftime token {tok!r}")
            i += 2
        else:
            ch = fmt[i]
            # literal text inside a SimpleDateFormat pattern must be quoted
            buf += f"'{ch}'" if ch.isalpha() or ch == "'" else ch
            i += 1
    flush()
    if not parts:
        return F.lit("")
    return parts[0] if len(parts) == 1 else F.concat(*parts)


def sqlite_date(ts: Column, *modifiers: str) -> Column:
    """SQLite ``date(ts, mods...)`` → 'YYYY-MM-DD' string."""
    return F.date_format(apply_modifiers(ts, *modifiers), "yyyy-MM-dd")


def sqlite_datetime(ts: Column, *modifiers: str) -> Column:
    """SQLite ``datetime(ts, mods...)`` → 'YYYY-MM-DD HH:MM:SS' string."""
    return F.date_format(apply_modifiers(ts, *modifiers), "yyyy-MM-dd HH:mm:ss")


def sqlite_time(ts: Column, *modifiers: str) -> Column:
    """SQLite ``time`` → 'HH:MM:SS' string, same modifier pipeline.

    ``timediff`` (SQLite 3.43+) is NOT shimmed: this environment's
    stdlib sqlite3 is 3.40 (no parity oracle can run), same rejection
    class as the real media decoders — documented, not stubbed.
    """
    return F.date_format(
        apply_modifiers(ts, *modifiers).cast("timestamp"), "HH:mm:ss"
    )


def julianday(ts: Column, *modifiers: str) -> Column:
    """SQLite ``julianday``: days since noon UTC, 4714-11-24 BCE.

    Computed from unix epoch micros: JD = unix_s / 86400 + 2440587.5
    (public formula; exact for the parquet's microsecond timestamps).
    """
    ts = apply_modifiers(ts, *modifiers)
    # cast NTZ → TZ is value-preserving under the engine's pinned-UTC session
    micros = F.unix_micros(ts.cast("timestamp"))
    return micros.cast("double") / F.lit(86400e6) + F.lit(2440587.5)


def unixepoch(ts: Column, *modifiers: str) -> Column:
    """SQLite ``unixepoch`` → integer unix seconds (truncating)."""
    return F.unix_timestamp(apply_modifiers(ts, *modifiers).cast("timestamp"))


_ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"


def nocase_key(col: Column) -> Column:
    """SQLite ``COLLATE NOCASE`` fold key.

    The reference inherits collation from SQLite core (the bridge declares
    plain TEXT columns — /root/reference/mapping.go:22-35 — so NOCASE is
    whatever SQLite's built-in does): fold ASCII ``A-Z`` ONLY.  That is
    NOT ``lower()`` — Spark's lower() folds full Unicode ('Ä' → 'ä'),
    while SQLite NOCASE leaves every non-ASCII codepoint distinct.  A
    ``translate`` over the 26 ASCII letters reproduces the exact
    semantics; comparisons/grouping under NOCASE compare this key, and an
    ``ORDER BY x COLLATE NOCASE`` is ``orderBy(nocase_key(x), x)`` (the
    raw-value tiebreak makes the otherwise unspecified equal-key order
    deterministic).  Parity pinned against the real sqlite3 in
    tests/test_sqlite_compat.py.
    """
    return F.translate(col, _ASCII_UPPER, _ASCII_LOWER)


# --- blob constructors -------------------------------------------------------
#
# The last scalar-surface nit from the §2.3 audit: SQLite's two blob
# constructors.  Semantics pinned against the real sqlite3 (see
# tests/test_sqlite_compat.py):
#   zeroblob(N)   -> max(N, 0) bytes of 0x00   (zeroblob(0) / negative -> b"")
#   randomblob(N) -> max(N, 1) pseudo-random bytes (N < 1 -> ONE byte,
#                    not empty — sqlite3 func.c contract)
# Both stay inside whole-stage codegen: zeroblob is unhex(repeat('00', n));
# randomblob derives bytes from md5(rand() || ':' || block_index) blocks.
# NOTE (ADVICE r9): the rand() node sits inside the transform() lambda
# body and nondeterministic expressions are excluded from CSE, so it is
# re-evaluated per array element — each 16-byte block gets an INDEPENDENT
# draw rather than sharing one per-row seed.  That is fine for the pinned
# contract (length clamp + byte diversity both hold either way; the
# values are unreproducible across engines by construction regardless).


def zeroblob(n) -> Column:
    """SQLite ``zeroblob(N)`` → BinaryType of max(N, 0) zero bytes."""
    n_col = F.lit(n) if isinstance(n, int) else n
    n_clamped = F.greatest(n_col.cast("int"), F.lit(0))
    return F.unhex(F.repeat(F.lit("00"), n_clamped))


def randomblob(n, seed: int | None = None) -> Column:
    """SQLite ``randomblob(N)`` → BinaryType of max(N, 1) pseudo-random
    bytes.

    Bytes come from md5(rand() || ':' || block_index) blocks (16 bytes
    each).  Because ``rand()`` is nondeterministic it is excluded from
    common-subexpression elimination, so the draw inside the transform()
    lambda is re-evaluated per block — each block derives from an
    INDEPENDENT draw, not a shared per-row seed (ADVICE r9; pass ``seed``
    to seed the generator for tests, which makes runs reproducible at
    fixed partitioning).  Values cannot be oracle-matched against another
    engine by construction; the testable contract is the LENGTH rule and
    byte diversity, both pinned against sqlite3.
    """
    n_col = F.lit(n) if isinstance(n, int) else n
    n_clamped = F.greatest(n_col.cast("int"), F.lit(1))
    seed_row = (F.rand(seed) if seed is not None else F.rand()).cast("string")
    n_blocks = F.ceil(n_clamped / F.lit(16)).cast("int")
    hex_blocks = F.transform(
        F.sequence(F.lit(1), n_blocks),
        lambda i: F.md5(F.concat(seed_row, F.lit(":"), i.cast("string"))),
    )
    return F.unhex(
        F.substr(F.array_join(hex_blocks, ""), F.lit(1), n_clamped * F.lit(2))
    )
