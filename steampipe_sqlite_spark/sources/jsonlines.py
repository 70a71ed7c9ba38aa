"""JSON-lines file connector — DYNAMIC-schema sibling of the CSV connector.

The reference ecosystem's config-file plugins expose local structured files
as tables (the CSV plugin is the canonical one; JSON/JSONL is the same
dynamic-discovery lifecycle: schema depends on config, drop/recreate on
reconfigure — /root/reference/configure_fn.go:114-149).

Config (JSON or HCL): ``{"paths": ["/abs/file.jsonl", ...]}`` /
``paths = ["/abs/file.jsonl"]``.  One table per file (stem-named).  Column
set and types are inferred over a sample of rows; values outside the
sampled shape degrade to NULL rather than crashing the scan.  Type
widening: bool ⊂ int ⊂ double ⊂ string; nested objects/arrays surface as
JSON strings (queryable with the engine's JSON functions).

Scale note: as with CSV, big local files belong to Spark's native reader —
this connector exists for reference parity and API-ish small files.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

import pyarrow as pa

from steampipe_sqlite_spark.sources.config import parse_config
from steampipe_sqlite_spark.sources.connector import (
    DYNAMIC,
    ColumnDef,
    ColumnType,
    Connector,
    Partition,
    Qual,
    Schema,
    TableSchema,
    rows_to_batches,
)

_INFER_SAMPLE_ROWS = 100

_RANK = {
    ColumnType.BOOL: 0,
    ColumnType.INT: 1,
    ColumnType.DOUBLE: 2,
    ColumnType.STRING: 3,
}


def _cell_type(v) -> ColumnType:
    if isinstance(v, bool):
        return ColumnType.BOOL
    if isinstance(v, int):
        return ColumnType.INT
    if isinstance(v, float):
        return ColumnType.DOUBLE
    return ColumnType.STRING  # str and nested (dict/list → JSON string)


def _widen(a: ColumnType, b: ColumnType) -> ColumnType:
    return a if _RANK[a] >= _RANK[b] else b


def _coerce(v, ctype: ColumnType):
    if v is None:
        return None
    try:
        if ctype == ColumnType.BOOL:
            return v if isinstance(v, bool) else None
        if ctype == ColumnType.INT:
            return int(v) if isinstance(v, (int, bool)) else None
        if ctype == ColumnType.DOUBLE:
            return float(v) if isinstance(v, (int, float, bool)) else None
        if isinstance(v, (dict, list)):
            return json.dumps(v, separators=(",", ":"), sort_keys=True)
        return str(v)
    except (TypeError, ValueError):
        return None


class JsonlConnector(Connector):
    """Dynamic-mode connector over local JSON-lines files."""

    name = "jsonl"

    def _paths(self) -> list[str]:
        if not self.config:
            return []
        return list(parse_config(self.config).get("paths", []))

    def _sample(self, path: str) -> list[dict]:
        rows = []
        with open(path) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                try:
                    obj = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if isinstance(obj, dict):
                    rows.append(obj)
                if len(rows) >= _INFER_SAMPLE_ROWS:
                    break
        return rows

    def get_schema(self) -> Schema:
        tables = []
        for path in self._paths():
            sample = self._sample(path)
            types: dict[str, ColumnType] = {}
            order: list[str] = []
            for row in sample:
                for k, v in row.items():
                    if v is None:
                        if k not in types:
                            order.append(k)
                            types[k] = ColumnType.STRING
                        continue
                    t = _cell_type(v)
                    if k not in types:
                        order.append(k)
                        types[k] = t
                    else:
                        types[k] = _widen(types[k], t)
            cols = tuple(ColumnDef(name, types[name]) for name in order)
            stem = os.path.splitext(os.path.basename(path))[0]
            tables.append(TableSchema(stem, cols))
        return Schema(tables=tuple(tables), mode=DYNAMIC)

    def partitions(self, table: str, quals: list[Qual]) -> list[Partition]:
        return [Partition(0)]

    def execute(
        self,
        table: str,
        quals: list[Qual],
        columns: list[str] | None,
        limit: int | None,
        partition: Partition | None = None,
    ) -> Iterator[pa.RecordBatch]:
        schema = self.get_schema().table(table)
        if schema is None:
            raise ValueError(f"unknown jsonl table {table!r}")
        path = next(
            p for p in self._paths() if os.path.splitext(os.path.basename(p))[0] == table
        )
        arrow = schema.arrow_schema(columns)
        names = set(arrow.names)
        types = {c.name: c.type for c in schema.columns}

        def rows():
            n = 0
            if limit == 0:
                return
            with open(path) as fh:
                for line in fh:
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        obj = json.loads(line)
                    except json.JSONDecodeError:
                        continue  # malformed line → skipped, never fatal
                    if not isinstance(obj, dict):
                        continue
                    row = {k: _coerce(obj.get(k), t) for k, t in types.items()}
                    if all(q.matches(row.get(q.column)) for q in quals):
                        yield {k: v for k, v in row.items() if k in names}
                        n += 1
                        if limit is not None and n >= limit:
                            return

        yield from rows_to_batches(arrow, rows())
