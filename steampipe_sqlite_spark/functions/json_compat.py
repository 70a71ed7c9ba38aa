"""SQLite json1 compatibility shims (SURVEY §2.3 JSON row).

The reference surface includes the whole json1 family; Spark covers
extraction/building natively (get_json_object, to_json, variant), but has
no equivalents for SQLite's validators and mutators.  This module closes
the gap:

JVM-side (whole-stage codegen, via Spark 4 variant functions):
- ``json_valid(col)``          → 1/0       (sqlite json_valid)
- ``json_type(col[, path])``   → 'object' | 'array' | 'text' | 'integer'
                                 | 'real' | 'true' | 'false' | 'null'
- ``json_quote(col)``          → JSON literal of a scalar

Python-side (Arrow-batched pandas UDF — mutation utilities, not hot-path
analytics; the per-row work is a parsed-tree edit that has no Catalyst
expression):
- ``json_set / json_insert / json_replace / json_remove (col, path, value)``
- ``json_patch(col, patch_col)``  (RFC 7386 MergePatch, as SQLite)

Path subset: ``$``, ``$.key`` chains, ``[n]`` array indexes — the shapes
SQLite's own docs use.  Mutation semantics match stdlib ``sqlite3``
(ground truth in tests/test_sqlite_compat.py::TestJsonCompat):
- set: create-or-overwrite; missing intermediate keys become objects;
  ``$[len]`` appends, ``$[>len]`` is a no-op; subpaths of scalars no-op;
- insert: only where the path does NOT resolve; replace: only where it
  does; remove: deletes (arrays shift), missing path no-ops.

Divergence (documented): SQLite raises "malformed JSON" on invalid input;
these shims return NULL — the engine's NULL-on-error convention
(try_cast, try_parse_json) is kept consistent instead.
"""

from __future__ import annotations

import json
import re
from typing import Any

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

__all__ = [
    "json_valid",
    "json_type",
    "json_quote",
    "json_set",
    "json_insert",
    "json_replace",
    "json_remove",
    "json_patch",
    "json_tree_udtf",
    "parse_json_path",
]

_PATH_TOKEN = re.compile(r"\.([A-Za-z_][\w]*)|\[(\d+)\]")


def parse_json_path(path: str) -> list[Any]:
    """'$.a.b[2].c' → ['a', 'b', 2, 'c'].  Subset of SQLite paths."""
    if not path.startswith("$"):
        raise ValueError(f"JSON path must start with '$': {path!r}")
    out: list[Any] = []
    pos = 1
    while pos < len(path):
        m = _PATH_TOKEN.match(path, pos)
        if m is None:
            raise ValueError(f"unsupported JSON path syntax at {path[pos:]!r}")
        out.append(m.group(1) if m.group(1) is not None else int(m.group(2)))
        pos = m.end()
    return out


# --- JVM-side shims -------------------------------------------------------


def json_valid(col: Column) -> Column:
    """1 when the string parses as JSON (scalars count, as in SQLite)."""
    return F.try_parse_json(col).isNotNull().cast("int")


def json_type(col: Column | str, path: str | None = None) -> Column:
    """SQLite ``json_type(json[, path])``: the JSON type name at path;
    booleans yield their value ('true'/'false'), as SQLite does.  NULL for
    invalid JSON or an unresolvable path (SQLite raises on malformed input
    — see the module docstring's NULL-on-error note)."""
    c = F.col(col) if isinstance(col, str) else col
    v = F.try_parse_json(c)
    if path is not None:
        parse_json_path(path)  # validate eagerly — bad paths fail at build
        v = F.try_variant_get(v, path, "variant")
    sv = F.schema_of_variant(v)
    return F.when(v.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(sv.startswith("OBJECT"), "object")
        .when(sv.startswith("ARRAY"), "array")
        .when(sv == "STRING", "text")
        .when(sv.isin("BIGINT", "INT", "SMALLINT", "TINYINT"), "integer")
        .when(sv.startswith("DECIMAL") | sv.isin("DOUBLE", "FLOAT"), "real")
        .when(sv == "BOOLEAN", v.cast("string"))
        .when(sv == "VOID", "null")
    )


def json_quote(col: Column) -> Column:
    """JSON literal of a scalar: strings quoted+escaped, numbers verbatim,
    NULL → 'null' — via to_json of a 1-element array, bracket-stripped
    (Jackson escaping; stays in codegen)."""
    arr = F.to_json(F.array(col))
    return arr.substr(F.lit(2), F.length(arr) - 2)


# --- Python-side mutators -------------------------------------------------


def _mutate(doc: Any, steps: list[Any], value: Any, mode: str) -> tuple[Any, bool]:
    """Apply one set/insert/replace/remove step list to a parsed doc.

    Returns (doc, changed).  Callers must discard ``doc`` when ``changed``
    is False: sqlite leaves NO partially-created intermediates behind when
    the leaf operation cannot proceed (json_set('{"a":1}','$.c[1]',9) is a
    clean no-op), so a failed walk must not leak created objects.
    """
    if not steps:  # whole-document path '$'
        if mode in ("remove", "insert"):
            return doc, False
        return value, True

    parent_steps, leaf = steps[:-1], steps[-1]

    # walk (and for set/insert: create intermediate objects where a dict
    # key is missing — sqlite semantics)
    cur = doc
    for s in parent_steps:
        if isinstance(s, str):
            if not isinstance(cur, dict):
                return doc, False  # subpath of a scalar/array mismatch
            if s not in cur:
                if mode in ("set", "insert"):
                    cur[s] = {}
                else:
                    return doc, False
            cur = cur[s]
        else:
            if not isinstance(cur, list) or s >= len(cur):
                return doc, False
            cur = cur[s]

    if isinstance(leaf, str):
        if not isinstance(cur, dict):
            return doc, False
        exists = leaf in cur
        if mode == "remove":
            if exists:
                del cur[leaf]
                return doc, True
        elif mode == "set" or (mode == "insert" and not exists) or (
            mode == "replace" and exists
        ):
            cur[leaf] = value
            return doc, True
    else:
        if not isinstance(cur, list):
            return doc, False
        exists = leaf < len(cur)
        if mode == "remove":
            if exists:
                del cur[leaf]
                return doc, True
        elif exists and mode in ("set", "replace"):
            cur[leaf] = value
            return doc, True
        elif leaf == len(cur) and mode in ("set", "insert"):
            cur.append(value)  # $[len] appends, $[>len] no-ops
            return doc, True
    return doc, False


def _scalar(v: Any) -> Any:
    """Normalize a pandas/numpy cell to a JSON-insertable python value."""
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return None
    if hasattr(v, "item"):  # numpy scalar
        v = v.item()
    return v


def _mutator(path: str, mode: str, value_is_json: bool):
    steps = parse_json_path(path)

    def apply(docs: pd.Series, values: pd.Series) -> pd.Series:
        out = []
        for doc_s, val in zip(docs, values):
            if doc_s is None:
                out.append(None)
                continue
            try:
                doc = json.loads(doc_s)
            except (TypeError, json.JSONDecodeError):
                out.append(None)  # NULL-on-error convention
                continue
            val = _scalar(val)
            if value_is_json and val is not None:
                try:
                    val = json.loads(val)
                except (TypeError, json.JSONDecodeError):
                    out.append(None)
                    continue
            new, changed = _mutate(doc, list(steps), val, mode)
            if not changed:
                out.append(doc_s)  # clean no-op: original text, no leaks
            else:
                out.append(json.dumps(new, separators=(",", ":"), ensure_ascii=False))
        return pd.Series(out, dtype=object)

    return pandas_udf(apply, StringType())


def json_set(col: Column, path: str, value: Column, value_is_json: bool = False) -> Column:
    """SQLite ``json_set``: create-or-overwrite at path.  Pass
    ``value_is_json=True`` when ``value`` holds a JSON string to splice as
    structure (the sqlite ``json(...)`` marker)."""
    return _mutator(path, "set", value_is_json)(col, value)


def json_insert(col: Column, path: str, value: Column, value_is_json: bool = False) -> Column:
    """SQLite ``json_insert``: only where the path does not yet resolve."""
    return _mutator(path, "insert", value_is_json)(col, value)


def json_replace(col: Column, path: str, value: Column, value_is_json: bool = False) -> Column:
    """SQLite ``json_replace``: only where the path already resolves."""
    return _mutator(path, "replace", value_is_json)(col, value)


def json_remove(col: Column, path: str) -> Column:
    """SQLite ``json_remove`` (single path; arrays shift left)."""
    fn = _mutator(path, "remove", False)
    return fn(col, F.lit(None).cast("string"))


def _merge_patch(target: Any, patch: Any) -> Any:
    """RFC 7386 MergePatch — the algorithm SQLite's json_patch implements."""
    if not isinstance(patch, dict):
        return patch
    if not isinstance(target, dict):
        target = {}
    for k, v in patch.items():
        if v is None:
            target.pop(k, None)
        else:
            target[k] = _merge_patch(target.get(k), v)
    return target


def json_patch(col: Column, patch: Column) -> Column:
    """SQLite ``json_patch(target, patch)`` (RFC 7386)."""

    def apply(targets: pd.Series, patches: pd.Series) -> pd.Series:
        out = []
        for t, p in zip(targets, patches):
            try:
                merged = _merge_patch(json.loads(t), json.loads(p))
            except (TypeError, json.JSONDecodeError):
                out.append(None)
                continue
            out.append(json.dumps(merged, separators=(",", ":"), ensure_ascii=False))
        return pd.Series(out, dtype=object)

    return pandas_udf(apply, StringType())(col, patch)


# --- json_tree table-valued function (Python UDTF) ------------------------


def _json_tree_rows(node: Any, key: Any, path: str, fullkey: str):
    """Depth-first walk matching sqlite json_tree's visit order and column
    conventions: containers carry their JSON text in `value` with NULL
    `atom`; scalars carry the scalar in both (stringified — UDTF columns
    are typed string; sqlite's id/parent rowid columns are omitted)."""
    if isinstance(node, dict):
        yield (None if key is None else str(key),
               json.dumps(node, separators=(",", ":"), ensure_ascii=False),
               "object", None, fullkey, path)
        for k, v in node.items():
            yield from _json_tree_rows(v, k, fullkey, f"{fullkey}.{k}")
    elif isinstance(node, list):
        yield (None if key is None else str(key),
               json.dumps(node, separators=(",", ":"), ensure_ascii=False),
               "array", None, fullkey, path)
        for i, v in enumerate(node):
            yield from _json_tree_rows(v, i, fullkey, f"{fullkey}[{i}]")
    else:
        if node is None:
            t, s = "null", None
        elif isinstance(node, bool):
            t, s = ("true" if node else "false"), ("1" if node else "0")
        elif isinstance(node, int):
            t, s = "integer", str(node)
        elif isinstance(node, float):
            t, s = "real", repr(node)
        else:
            t, s = "text", str(node)
        yield (None if key is None else str(key), s, t, s, fullkey, path)


class JsonTreeUDTF:
    """`json_tree(json)` as a Spark Python UDTF (SURVEY §2.3 UDF row) —
    recursive JSON walk as a lateral table function:

        spark.udtf.register("json_tree", json_tree_udtf())
        spark.sql("SELECT t.* FROM docs, LATERAL json_tree(j) t")

    Columns: key, value, type, atom, fullkey, path (sqlite's rowid-ish
    id/parent columns omitted).  Ground truth: sqlite3 parity test.
    """

    def eval(self, j: str):  # noqa: D102 — contract is the class docstring
        if j is None:
            return
        try:
            doc = json.loads(j)
        except (TypeError, json.JSONDecodeError):
            return  # NULL-on-error convention: no rows
        yield from _json_tree_rows(doc, None, "$", "$")


def json_tree_udtf():
    """Decorated UDTF class, built lazily (the decorator needs pyspark)."""
    from pyspark.sql.functions import udtf

    return udtf(
        JsonTreeUDTF,
        returnType="key string, value string, type string, atom string, "
        "fullkey string, path string",
    )
