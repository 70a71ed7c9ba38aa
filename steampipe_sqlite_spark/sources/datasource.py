"""Generic PySpark DataSource over any Connector — the vtab module analog.

Maps the reference's SQLite virtual-table contract onto the Python Data
Source API (PySpark ≥4.1):

| reference                                  | here                        |
|--------------------------------------------|-----------------------------|
| xConnect/declare (module.go:27-33)         | DataSource.schema()         |
| xBestIndex (table.go:74-180)               | Reader.pushFilters()        |
| xOpen/xFilter (cursor.go:39-59)            | Reader.partitions()/read()  |
| xNext/xColumn row loop (cursor.go:96-162)  | Arrow batch yield           |
| Omit:false re-check (table.go:126-129)     | all filters kept residual   |
| QueryContext JSON IR (table.go:166-177)    | reader instance state       |

Scale notes: read() executes on executor Python workers; the connector is
pickled with the reader, so its config travels to every worker.  Each
connector partition becomes a Spark InputPartition — per-region/per-account
parallelism the reference cannot express (single cursor,
/root/reference/cursor.go:25-34).  Batches are Arrow record batches, not
per-row Python objects.
"""

from __future__ import annotations

import importlib
import json
from collections.abc import Iterator, Sequence
from typing import Any

from pyspark.sql.datasource import (
    SimpleDataSourceStreamReader,
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    Not,
    StringStartsWith,
)
from pyspark.sql.types import StructType

from steampipe_sqlite_spark.sources.cache import (
    ScanCache,
    connection_cache_options,
    serve_from_superset,
)
from steampipe_sqlite_spark.sources.connector import (
    ColumnType,
    Connector,
    Partition,
    Qual,
    TableSchema,
    bind_cidr,
    bind_ipaddr,
    bind_timestamp,
    check_required_quals,
)
from steampipe_sqlite_spark.sources.ratelimit import cached_share

FORMAT_NAME = "steampipe"

# process-level cache shared across scans (driver side; executors get
# fresh instances per worker — same semantics as the SDK's per-process cache)
_SCAN_CACHE = ScanCache()


def load_connector(path: str, config: str | None) -> Connector:
    """Instantiate a connector from its ``module:Class`` path."""
    mod_name, _, cls_name = path.partition(":")
    cls = getattr(importlib.import_module(mod_name), cls_name)
    conn: Connector = cls()
    if config:
        conn.set_config(config)
    return conn


def _bind_value(col_type: ColumnType, value: Any) -> Any:
    """Typed qual binding (reference cursor.go:211-233, mapping.go:88-169)."""
    if value is None:
        return None
    if col_type in (ColumnType.DATETIME, ColumnType.TIMESTAMP):
        return bind_timestamp(value)
    if col_type == ColumnType.IPADDR:
        return bind_ipaddr(value)
    if col_type in (ColumnType.CIDR, ColumnType.INET):
        return bind_cidr(value)
    if col_type == ColumnType.BOOL:
        return bool(value)
    return value


def filters_to_quals(
    filters: Sequence[Filter], table: TableSchema
) -> tuple[list[Qual], list[Filter]]:
    """Translate Spark Filter objects into connector quals.

    Returns (quals, convertible_filters).  A filter converts when it is a
    supported shape on a declared key column supporting that op — the
    analog of getPluginOperator + key-column check
    (/root/reference/mapping.go:32-59, table.go:216-244).  Filters on
    non-key columns are silently left to the engine, as in the reference.
    """
    quals: list[Qual] = []
    converted: list[Filter] = []
    for f in filters:
        try:
            parsed = _parse_filter(f)
        except ValueError:
            continue
        if parsed is None:
            continue
        col_name, op, value = parsed
        col = table.column(col_name)
        if col is None or col.require is None or op not in col.operators:
            continue
        try:
            if op == "in":
                # bind each element: bind_timestamp/ipaddr on a whole tuple
                # raises, and bool(tuple) would silently corrupt BOOL quals
                bound = tuple(_bind_value(col.type, v) for v in value)
            else:
                bound = _bind_value(col.type, value)
        except (ValueError, TypeError):
            continue  # unbindable value → leave the filter to the engine
        quals.append(Qual(col_name, op, bound))
        converted.append(f)
    return quals, converted


def _filter_column_names(filters: Sequence[Filter]) -> set[str]:
    """Best-effort column names from pushed filters, including shapes the
    qual translator rejects — gate input only (see check_required_quals).

    Untranslatable filters are unwrapped through ``child`` links
    RECURSIVELY (bounded) before reading ``attribute``: a doubly-nested
    shape (e.g. Not(Not(EqualTo(col, v))), or whatever future wrapper
    Spark pushes) still NAMES the column, and the reference's gate
    (table.go:182-214) passes on any constraint naming the column —
    stopping at one level would silently re-tighten the gate in that
    corner (ADVICE r11)."""
    names: set[str] = set()
    for f in filters:
        try:
            parsed = _parse_filter(f)
        except ValueError:
            parsed = None
        if parsed is not None:
            names.add(parsed[0])
            continue
        holder = f
        for _ in range(8):  # bound: wrapper chains are tiny in practice
            if holder is None:
                break
            attr = getattr(holder, "attribute", None)
            if attr and len(attr) == 1:
                names.add(attr[0])
                break
            holder = getattr(holder, "child", None)
    return names


def _parse_filter(f: Filter) -> tuple[str, str, Any] | None:
    def col(attr: tuple) -> str | None:
        return attr[0] if len(attr) == 1 else None  # no nested pushdown

    if isinstance(f, EqualTo):
        c = col(f.attribute)
        return (c, "=", f.value) if c else None
    if isinstance(f, Not) and isinstance(f.child, EqualTo):
        c = col(f.child.attribute)
        return (c, "<>", f.child.value) if c else None
    if isinstance(f, GreaterThan):
        c = col(f.attribute)
        return (c, ">", f.value) if c else None
    if isinstance(f, GreaterThanOrEqual):
        c = col(f.attribute)
        return (c, ">=", f.value) if c else None
    if isinstance(f, LessThan):
        c = col(f.attribute)
        return (c, "<", f.value) if c else None
    if isinstance(f, LessThanOrEqual):
        c = col(f.attribute)
        return (c, "<=", f.value) if c else None
    if isinstance(f, In):
        c = col(f.attribute)
        return (c, "in", tuple(f.value)) if c else None
    if isinstance(f, IsNull):
        c = col(f.attribute)
        return (c, "is_null", None) if c else None
    if isinstance(f, IsNotNull):
        c = col(f.attribute)
        return (c, "is_not_null", None) if c else None
    if isinstance(f, StringStartsWith):
        c = col(f.attribute)
        return (c, "prefix", f.value) if c else None
    return None


class ConnectorPartition(InputPartition):
    def __init__(self, index: int, info: dict[str, Any]):
        self.index = index
        self.info = info


class ConnectorReader(DataSourceReader):
    """One scan of one connector table (xOpen..xClose lifecycle)."""

    def __init__(self, connector: Connector, table: TableSchema, options: dict):
        self.connector = connector
        self.table = table
        self.quals: list[Qual] = []
        self.limit = None
        raw_limit = options.get("limit")
        if raw_limit is not None:
            try:
                self.limit = max(int(raw_limit), 0)
            except (TypeError, ValueError):
                self.limit = None  # non-integer limit dropped (cursor.go:203-207)
        cols_opt = options.get("columns")
        self.columns: list[str] | None = json.loads(cols_opt) if cols_opt else None
        self._filters_seen = False
        self._constrained: set[str] = set()

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """BestIndex analog.  Captures supported quals; yields back EVERY
        filter as residual so Catalyst re-applies them all — the exact
        Omit:false contract (/root/reference/table.go:126-129): the
        connector may over-return, the engine restores exactness."""
        self._filters_seen = True
        self.quals, _ = filters_to_quals(filters, self.table)
        # every column a pushed filter NAMES, independent of op support or
        # translatability — the reference's gate counts any constraint
        # naming the column (table.go:182-214), so e.g. a range filter on
        # a required col whose declared operators are ('=',) must still
        # satisfy the gate and proceed to the connector
        self._constrained = _filter_column_names(filters)
        check_required_quals(self.table, self.quals, self._constrained)
        yield from filters

    def partitions(self) -> list[ConnectorPartition]:
        # late required-check: pushFilters is skipped entirely for
        # filterless scans — mirror the reference where the missing-qual
        # error surfaces at execute time (/root/reference/table.go:156-164)
        check_required_quals(self.table, self.quals, self._constrained)
        parts = self.connector.partitions(self.table.name, self.quals)
        # rate_limit_scope=global: the per-process token bucket multiplies
        # by worker count on a real cluster (1000 executors x rps calls/s
        # would hammer the upstream API 1000x over budget), so the planned
        # partition count — known HERE, at plan time — divides the budget:
        # each partition's scan gets an rps/n share enforced by its own
        # bucket (Connector.throttle), keeping the cluster-wide total at
        # rps regardless of task placement.  Static fair-share, the same
        # discipline a Spark job uses absent a coordination service.
        try:
            from steampipe_sqlite_spark.sources.config import parse_config

            cfg = parse_config(self.connector.config)
        except Exception:  # noqa: BLE001 — unconfigured connectors
            cfg = {}
        if (
            parts
            and cfg.get("rate_limit_rps")
            and str(cfg.get("rate_limit_scope", "process")).lower() == "global"
        ):
            # Divide by the UNPRUNED shard count, not the planned count:
            # a qual-pruned scan (2 of 4 chains) and a full scan would
            # otherwise compute different per-partition rates for the
            # SAME bucket key, and bucket_for replaces a bucket whose
            # rate changed — each replacement grants a fresh burst,
            # defeating the budget (code-review r13).  The unpruned
            # count is stable across scans, so each partition's rate —
            # and therefore its bucket — is stable too; pruning then
            # only LOWERS the aggregate rate (fewer active chains).
            try:
                total = len(self.connector.partitions(self.table.name, []))
            except Exception:  # noqa: BLE001 — required-qual connectors
                total = len(parts)
            share = 1.0 / max(total, len(parts), 1)
            # pin the FIRST computed share per (connection, table) for
            # the process: the required-qual fallback above is pruning-
            # dependent, and a share that drifts between scans would
            # open a fresh-burst bucket per distinct rate for the same
            # shard (ADVICE r13 — see ratelimit.cached_share)
            conn_cls = type(self.connector)
            share = cached_share(
                (
                    conn_cls.__module__,
                    conn_cls.__qualname__,
                    self.connector.config,
                    self.table.name,
                ),
                share,
            )
            for p in parts:
                p.info.setdefault("rate_share", share)
        return [ConnectorPartition(p.index, p.info) for p in parts]

    def read(self, partition: ConnectorPartition):
        part = Partition(partition.index, partition.info)
        # partition context for global-scope throttling: the connector's
        # own per-page throttle() calls have no partition argument, so
        # the current partition rides on the instance (one reader scan
        # per partition — no concurrency on this attribute within a task).
        # Cleared on exit: a LATER partitionless execute() on the same
        # in-process instance (streaming face, direct call) must take the
        # full-rps shared bucket, not inherit this partition's share
        # (ADVICE r14 — per-task deserialized copies were always fresh,
        # only instance reuse leaked).
        self.connector._current_partition = part
        try:
            yield from self._read_with_cache(part, partition)
        finally:
            self.connector._current_partition = None

    def _read_with_cache(self, part: Partition, partition: ConnectorPartition):
        quals_key = tuple((q.column, q.op, q.value) for q in self.quals)
        cols_key = tuple(self.columns) if self.columns is not None else None
        conn_cls = type(self.connector)
        key = ScanCache.key(
            f"{conn_cls.__module__}:{conn_cls.__qualname__}",
            self.connector.config,
            self.table.name,
            quals_key,
            cols_key,
            self.limit,
            partition.index,
        )
        # per-connection cache overrides ride the connection config, as the
        # reference's config does in every ExecuteRequest (register.go:64)
        conn_enabled, conn_ttl, conn_max_bytes = connection_cache_options(
            self.connector.config
        )
        if conn_enabled is False:
            # caching and retries are orthogonal in the reference SDK:
            # cache=false skips only the get/put/subsumption steps, the
            # RetryHydrate backoff still applies (ADVICE r3)
            yield from self._execute_retrying(part)
            return
        cached = _SCAN_CACHE.get(key)
        if cached is not None:
            yield from cached
            return
        superset = _SCAN_CACHE.get_subsuming(key)
        if superset is not None:
            # SDK-cache qual subsumption: a broader cached scan covers this
            # one — filter/project/slice its Arrow batches, zero connector
            # calls (reference cache wiring cursor.go:70-92)
            batches, residual, cols = superset
            yield from serve_from_superset(batches, residual, cols, self.limit)
            return
        batches = []
        for batch in self._execute_retrying(part):
            batches.append(batch)
            yield batch
        _SCAN_CACHE.put(key, batches, conn_ttl, conn_max_bytes)

    def _execute_retrying(self, part: Partition):
        """Throttle + execute with the connector's declared retry policy.

        SDK RetryHydrate analog: re-run the WHOLE scan on failure with
        exponential backoff.  When retries are configured, attempts are
        buffered before any yield — a mid-stream retry after partial
        output would duplicate rows (same reason the SDK retries the full
        hydrate call, never resumes one).  Without retries the scan
        streams batch-by-batch: one throttle debit per partition scan;
        paging connectors additionally call throttle() per page
        (SURVEY §7.5.5 — API limits × parallelism)."""
        retries = self.connector.retry_policy()
        if retries is None:
            self.connector.throttle()
            yield from self.connector.execute(
                self.table.name, self.quals, self.columns, self.limit, part
            )
            return
        attempts, min_ms, max_ms = retries
        import time as _time

        last_exc: Exception | None = None
        for attempt in range(attempts + 1):
            if attempt:
                _time.sleep(min(max_ms, min_ms * (2 ** (attempt - 1))) / 1000.0)
            try:
                self.connector.throttle()
                batches = list(
                    self.connector.execute(
                        self.table.name, self.quals, self.columns, self.limit, part
                    )
                )
                break
            except Exception as exc:  # noqa: BLE001 — connector errors are opaque
                last_exc = exc
                if not self.connector.is_retriable_error(exc):
                    raise
        else:
            raise last_exc  # type: ignore[misc]
        yield from batches




class ConnectorSimpleStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the bridge: polls the connector by offset ranges.

    The offset is a per-table monotonically increasing sequence column the
    connector declares via the ``stream_offset_col`` option (default
    "seq"); each micro-batch reads [start, start+stream_batch) through the
    same quals path as batch scans, so the connector sees a ranged API
    call.  If fewer rows than the window come back the offset advances
    only past what arrived — an exhausted feed returns its offset
    unchanged and ``processAllAvailable()`` terminates.  readBetweenOffsets
    replays a committed range exactly (deterministic connectors ⇒
    exactly-once on restart).  The reference has no streaming at all
    (SURVEY.md §2.3) — this is the engine extension that makes live
    plugin tables tail-able.
    """

    def __init__(self, connector: Connector, table: TableSchema, options: dict):
        self.connector = connector
        self.table = table
        self.offset_col = options.get("stream_offset_col", "seq")
        self.batch = int(options.get("stream_batch", 100))
        self.fields = [c.name for c in table.columns]

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def _fetch(self, lo: int, hi: int):
        quals = [Qual(self.offset_col, ">=", lo), Qual(self.offset_col, "<", hi)]
        rows = []
        for batch in self.connector.execute(self.table.name, quals, None, None):
            for row in batch.to_pylist():
                rows.append(tuple(row.get(f) for f in self.fields))
        return rows

    def read(self, start: dict):
        lo = start["pos"]
        rows = self._fetch(lo, lo + self.batch)
        return iter(rows), {"pos": lo + len(rows)}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._fetch(start["pos"], end["pos"]))


class ConnectorDataSource(DataSource):
    """Register once per session; one temp view per connector table is the
    engine facade's job (engine.py)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def __init__(self, options: dict):
        super().__init__(options)
        self.connector = load_connector(options["connector_class"], options.get("config"))
        table_name = options["table"]
        table = self.connector.get_schema().table(table_name)
        if table is None:
            raise ValueError(
                f"connector {self.connector.name!r} has no table {table_name!r}"
            )
        self.table = table

    def schema(self) -> StructType:
        cols_opt = self.options.get("columns")
        if cols_opt:
            # projection pushdown hint (B2 analog): the scan declares only
            # the requested columns, so read() yields narrow batches and
            # the connector fetches less.  The Python DS API has no
            # engine-driven pushColumns; narrowing is requested explicitly
            # via engine.table(columns=[...]).
            wanted = json.loads(cols_opt)
            full = self.table.spark_schema()
            return StructType([f for f in full.fields if f.name in wanted])
        return self.table.spark_schema()

    def reader(self, schema: StructType) -> ConnectorReader:
        return ConnectorReader(self.connector, self.table, dict(self.options))

    def simpleStreamReader(self, schema: StructType) -> ConnectorSimpleStreamReader:
        return ConnectorSimpleStreamReader(self.connector, self.table, dict(self.options))
