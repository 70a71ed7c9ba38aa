"""Bridge scan-throughput probe: rows/s through the Python DataSource.

The reference's core is its scan path, and that path is strictly ONE row
per ``Next()`` across cgo (/root/reference/cursor.go:99-115), on a
single cursor (/root/reference/cursor.go:25-34) — no batching, no
parallelism.  This repo's bridge (sources/datasource.py) was designed
around Arrow record batches and connector-declared partitions instead;
this probe puts numbers on that design by scanning a synthetic firehose
connector through the REAL engine path (Engine.load → Python DataSource
→ Arrow batches → Spark agg) in its two generation regimes:

- ``firehose``  — the connector yields Arrow batches built columnar
  (numpy → RecordBatch), the shape a high-volume plugin should use;
- ``rowgen``    — the connector yields per-row Python dicts buffered
  through ``rows_to_batches`` (the row-at-a-time producer the reference
  API forces on every plugin; our bridge still ships them to Spark as
  Arrow batches, so this is an UPPER bound on a cursor.go-style
  producer — the reference additionally pays a cgo hop and SQLite row
  materialization per row and cannot parallelize the cursor).

Usage: python tools/bridge_scan_probe.py [n_rows] [n_partitions]
Prints one JSON line:
  {"n_rows": N, "n_partitions": P,
   "firehose": {"wall_s": ..., "rows_s": ...},
   "rowgen":   {"wall_s": ..., "rows_s": ...}}

Committed reading (round 9, local[32], quiet window, 8M rows x 32
partitions, best-of-3 after one warm run):

  regime     wall_s   rows/s
  firehose   0.645    12.4 M
  rowgen     0.941     8.5 M

  Columnar Arrow generation clears 12 M rows/s through the full bridge
  (DataSource plan → 32 parallel Python readers → Arrow → JVM agg);
  even the deliberately row-at-a-time producer sustains 8.5 M rows/s
  because batching and partition parallelism live in the BRIDGE, not
  the connector.  Both regimes verify the same checksum (exact integer
  sum of ids) so the scan is measured end-to-end, not short-circuited.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa

from pyspark.sql import functions as F

from steampipe_sqlite_spark.engine import Engine
from steampipe_sqlite_spark.session import get_spark
from steampipe_sqlite_spark.sources.connector import (
    ColumnDef,
    ColumnType,
    Connector,
    Partition,
    Schema,
    TableSchema,
    rows_to_batches,
)

_TAGS = ["alpha", "beta", "gamma", "delta"]


class FirehoseConnector(Connector):
    """Synthetic high-volume source: ``n_rows`` split over ``n_parts``
    partitions, generated deterministically per partition.  Config is
    ``"<n_rows>:<n_parts>"`` (picklable scalars — readers ship to
    executor workers)."""

    name = "bench"

    def __init__(self, config: str | None = None):
        super().__init__(config)
        self.set_config(config or "1000000:8")

    def set_config(self, config: str) -> None:
        # load_connector instantiates bare and THEN calls set_config —
        # sizing must live here, not in __init__, or the executor-side
        # rebuild silently runs the default corpus.
        super().set_config(config)
        n_rows, n_parts = (config or "1000000:8").split(":")
        self.n_rows, self.n_parts = int(n_rows), int(n_parts)

    def get_schema(self) -> Schema:
        cols = (
            ColumnDef("id", ColumnType.INT),
            ColumnDef("val", ColumnType.DOUBLE),
            ColumnDef("tag", ColumnType.STRING),
        )
        return Schema(
            tables=(
                TableSchema("firehose", cols, "columnar Arrow generation"),
                TableSchema("rowgen", cols, "per-row dicts via rows_to_batches"),
            )
        )

    def partitions(self, table: str, quals) -> list[Partition]:
        return [Partition(i) for i in range(self.n_parts)]

    def _bounds(self, partition: Partition | None) -> tuple[int, int]:
        k = partition.index if partition else 0
        per = self.n_rows // self.n_parts
        lo = k * per
        hi = self.n_rows if k == self.n_parts - 1 else lo + per
        return lo, hi

    def execute(self, table, quals, columns, limit, partition=None):
        lo, hi = self._bounds(partition)
        schema = self.get_schema().tables[0].arrow_schema(columns)
        names = set(schema.names)
        if table == "firehose":
            # columnar: one numpy->Arrow batch per 64k rows
            for start in range(lo, hi, 65536):
                end = min(start + 65536, hi)
                ids = np.arange(start, end, dtype=np.int64)
                arrays = []
                for name in schema.names:
                    if name == "id":
                        arrays.append(pa.array(ids))
                    elif name == "val":
                        arrays.append(pa.array(ids % 1000 / 10.0))
                    else:
                        arrays.append(
                            pa.array(np.array(_TAGS)[ids % 4]).cast(pa.string())
                        )
                yield pa.RecordBatch.from_arrays(arrays, schema=schema)
        else:  # rowgen: the row-at-a-time producer shape
            def rows():
                for i in range(lo, hi):
                    row = {
                        "id": i,
                        "val": i % 1000 / 10.0,
                        "tag": _TAGS[i % 4],
                    }
                    yield {k: v for k, v in row.items() if k in names}

            yield from rows_to_batches(schema, rows())


def measure(eng: Engine, table: str, n_rows: int) -> dict:
    expected = n_rows * (n_rows - 1) // 2  # exact integer checksum
    best = float("inf")
    for _ in range(1 + 3):  # one warm + best-of-3
        t0 = time.perf_counter()
        row = (
            eng.table("bench", table)
            .agg(F.sum("id").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()[0]
        )
        wall = time.perf_counter() - t0
        assert (row.s, row.n) == (expected, n_rows), (row, expected)
        best = min(best, wall)
    return {"wall_s": round(best, 3), "rows_s": round(n_rows / best)}


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    n_parts = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark("bridge-scan")
    eng = Engine(spark)
    eng.load(
        "tools.bridge_scan_probe:FirehoseConnector",
        alias="bench",
        config=f"{n_rows}:{n_parts}",
    )
    out = {"n_rows": n_rows, "n_partitions": n_parts}
    for table in ("firehose", "rowgen"):
        out[table] = measure(eng, table, n_rows)
        print(f"# {table}: {out[table]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
