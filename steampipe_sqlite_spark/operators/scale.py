"""Scale toolkit: the partitioning techniques that keep joins and
aggregations healthy at 100 TB — bucketed co-located joins, salted skew
handling, and a pre-partition helper for shuffle reuse.

None of these change results; they change plan shape.  Plan-level proofs
live in tests/test_scale_toolkit.py.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Persist ledger: every .persist() an operator takes on a caller's behalf is
# registered here (session-scoped, weakly keyed so a stopped session's list
# dies with it).  The plans registry claims slices of this list per query
# build and unpersists a query's previous slice when a plan_cache=False
# query is rebuilt — closing the accumulate-until-GC-pressure leak class
# (ADVICE r7: chained distributed_row_number calls dropped intermediate
# handles).  Direct callers can also use :func:`persisted_ledger` to sweep.
_PERSIST_LEDGER: "weakref.WeakKeyDictionary[SparkSession, list]" = (
    weakref.WeakKeyDictionary()
)


def persisted_ledger(spark: SparkSession) -> list:
    """The session's list of operator-persisted DataFrames, oldest first.
    Owners (the plans registry, or a direct caller) remove entries they
    take responsibility for; anything left is released by session stop or
    ``spark.catalog.clearCache()``.

    The ``_jsc is None`` guard mirrors registry._plan_cache / tables.py:
    CPython can reuse a stopped session object's identity, and the new
    session must not inherit the dead one's handles.  Entries already
    unpersisted out-of-band (``clearCache`` by bench/probe loops that call
    ``__wrapped__`` directly) are pruned on access so un-owned ledgers
    cannot grow without bound across a long session."""
    led = _PERSIST_LEDGER.get(spark)
    if led is None or getattr(spark.sparkContext, "_jsc", None) is None:
        led = []
        _PERSIST_LEDGER[spark] = led
    elif led:
        def _live(df: DataFrame) -> bool:
            try:
                sl = df.storageLevel
                return sl.useMemory or sl.useDisk
            except Exception:  # noqa: BLE001 — dead JVM handle = not live
                return False

        led[:] = [df for df in led if _live(df)]
    return led


def persist_tracked(df: DataFrame) -> DataFrame:
    """``df.persist()`` + ledger registration — use for every persist taken
    inside an operator so lifetime ownership is transferable (see
    :func:`persisted_ledger`)."""
    out = df.persist()
    persisted_ledger(out.sparkSession).append(out)
    return out


def write_bucketed(
    df: DataFrame, table_name: str, bucket_col: str, n_buckets: int, sort_col: str | None = None
) -> None:
    """Persist ``df`` as a bucketed managed table: rows are hash-bucketed
    on ``bucket_col`` at write time, so equi-joins and aggregations on that
    column read co-located data and skip the shuffle entirely (Catalyst
    sees the bucketing as a satisfied hash distribution).

    This is the batch-layer answer to repeated big-fact joins: pay one
    shuffle at ingest, never again.  ``sort_col`` additionally sorts within
    buckets (sort-merge joins then skip the sort too).
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def write_partitioned_dataset(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Persist a curated dataset as hive-partitioned parquet — the
    standard sink for pipeline output at scale.

    - ``partitionBy`` on low-cardinality columns (lang, source, date
      bucket) gives readers free partition pruning (a `WHERE lang='en'`
      scan touches only that directory);
    - ``maxRecordsPerFile`` bounds file size so downstream scans split
      evenly (the small-file *and* giant-file problems are both write-time
      mistakes);
    - readers recover the partition columns from directory names, so the
      data files store only the remaining columns.
    """
    (
        df.write.mode(mode)
        .option("maxRecordsPerFile", str(max_records_per_file))
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def salted_groupby_agg(
    df: DataFrame,
    key_col: str,
    agg_exprs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation for skewed keys: stage 1 aggregates on
    (key, salt) — the hot key's rows spread over ``n_salts`` reducers —
    stage 2 folds the partials on the key alone (tiny input).

    ``agg_exprs`` maps output column → 'sum'|'count'|'min'|'max' of a
    source column, e.g. {'total': 'sum:value', 'n': 'count:*'} — the
    decomposable aggregates (partial + merge both expressible with the
    same primitive).
    """
    salted = df.withColumn("_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)))
    stage1_aggs, stage2_aggs = [], []
    for out, spec in agg_exprs.items():
        op, _, col = spec.partition(":")
        p = f"_p_{out}"
        if op == "count":
            stage1_aggs.append(F.count(F.lit(1) if col in ("*", "") else F.col(col)).alias(p))
            stage2_aggs.append(F.sum(p).alias(out))
        elif op in ("sum", "min", "max"):
            stage1_aggs.append(getattr(F, op)(F.col(col)).alias(p))
            stage2_aggs.append(getattr(F, "sum" if op == "sum" else op)(p).alias(out))
        else:
            raise ValueError(f"non-decomposable aggregate {op!r}")
    return (
        salted.groupBy(key_col, "_salt")
        .agg(*stage1_aggs)
        .groupBy(key_col)
        .agg(*stage2_aggs)
    )


def salted_join_skewed_left(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join where ``left`` has skewed keys and ``right`` is moderate:
    left rows get a random salt in [0, n_salts); right is exploded to all
    salts.  The shuffle key becomes (key, salt), so a hot key's rows land
    on ``n_salts`` reducers instead of one.

    AQE's skew-join splitting handles the sort-merge case automatically
    (spark.sql.adaptive.skewJoin.enabled, on in session.py); this explicit
    form is for when the join must shuffle-hash or the skew is known ahead
    of time.  Cost: right side replicated ×n_salts — use only when right ≪
    left, which is the skew scenario by definition.
    """
    l_salted = left.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    )
    r_salted = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    out = l_salted.join(r_salted, [key, "_salt"])
    return out.drop("_salt")


def salted_join_hot_keys(
    left: DataFrame,
    right: DataFrame,
    key: str,
    hot_keys: list,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with TARGETED salting: only rows whose key is in the
    known-hot set get a salt in [0, n_salts); everything else keeps salt
    0, and the right side is replicated ONLY for the hot keys (one row
    stays one row for the long tail).  The shuffle key is (key, salt), so
    each hot key's rows land on ``n_salts`` reducers while the tail pays
    nothing — unlike :func:`salted_join_skewed_left`, whose blanket
    ×n_salts right-side explode costs n_salts× build even when 99.9% of
    keys are cold.

    This is the production pattern when the hot set is known ahead of the
    join (a heavy-hitter sketch over yesterday's partition, a static
    "null/default key" list).  When the hot set is NOT known, prefer AQE's
    runtime skew split (on in session.py) for sort-merge joins; this
    operator also covers shuffle-hash joins, which AQE's splitter does not.

    ``how`` supports ``inner`` (default), ``left`` (ADVICE r10) and
    ``right`` (VERDICT r11 #6): salting preserves outer semantics because
    the PRESERVED side's rows each carry exactly one salt and the other
    side is replicated across ALL salts for hot keys (salt 0 for cold),
    so an unmatched preserved row is unmatched at every salt and surfaces
    once with nulls.  ``right`` is the mirrored construction — salt the
    right, replicate the left.  ``full`` is impossible under salting
    (BOTH sides would have to be single-salt, leaving hot keys unsplit);
    use AQE's runtime skew join for full outer.  Measured by
    tools/skew_join_probe.py.
    """
    if how not in ("inner", "left", "right"):
        raise ValueError(
            f"salted_join_hot_keys supports how='inner'|'left'|'right', got {how!r}"
        )
    if not hot_keys:
        # no declared hot set — the salt would be constant 0 everywhere,
        # a plain join with bookkeeping overhead; do the plain join
        return left.join(right, [key], how)
    hot = F.col(key).isin(*[F.lit(k) for k in hot_keys])

    def one_salt(df: DataFrame) -> DataFrame:
        return df.withColumn(
            "_salt",
            F.when(
                hot, F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
            ).otherwise(F.lit(0)).cast("int"),
        )

    def all_salts(df: DataFrame) -> DataFrame:
        # sequence/array of int literals already yields int elements,
        # matching the other side's cast — no cast around the generator
        # (Catalyst rejects expressions nested over explode()).
        return df.withColumn(
            "_salt",
            F.when(hot, F.sequence(F.lit(0), F.lit(n_salts - 1))).otherwise(
                F.array(F.lit(0))
            ),
        ).withColumn("_salt", F.explode("_salt"))

    if how == "right":
        l_salted, r_salted = all_salts(left), one_salt(right)
    else:
        l_salted, r_salted = one_salt(left), all_salts(right)
    return l_salted.join(r_salted, [key, "_salt"], how).drop("_salt")


# Above this many range partitions, per-partition offsets attach via a
# broadcast equi-join on ``_pid`` instead of a ``create_map`` literal: the
# literal costs O(num_partitions) Catalyst expression nodes PER REFERENCE
# (analysis time + codegen size), which is fine to ~10⁴ partitions but not
# at 100 TB with default 128 MB splits (~10⁶ partitions).  The broadcast
# side is one (int, long) row per partition — metadata-sized at any SF —
# and a broadcast hash join adds no shuffle, so the plan shape is
# unchanged.  Module-level so tests can monkeypatch it to 0 and prove the
# two paths produce identical output.
_OFFSETS_BROADCAST_THRESHOLD = 10_000


def _check_prefix_sum_reserved(df: DataFrame, name: str) -> None:
    """The two-phase prefix-sum helpers stage ``_pid`` and ``_off`` working
    columns and emit ``name``: an input already carrying one of those
    would be silently overwritten then dropped (or made ambiguous on the
    broadcast-join path) — same corruption class as zorder_values'
    reserved names, same remedy: demand a rename."""
    clash = sorted({"_pid", "_off", name} & set(df.columns))
    if clash:
        raise ValueError(
            f"distributed prefix-sum: input columns {clash} collide with "
            "the reserved working/output names (_pid/_off/rank name) — "
            "rename them first"
        )


def _with_partition_offsets(ranged: DataFrame, offsets: dict) -> DataFrame:
    """Attach each row's partition prefix offset as column ``_off``.

    ``ranged`` must carry ``_pid`` (spark_partition_id at persist time);
    ``offsets`` maps pid -> exclusive prefix total.  Small maps inline as
    a ``create_map`` literal (zero extra plan nodes beyond the map);
    large maps broadcast-join so plan size stays O(1) in partition count
    (see ``_OFFSETS_BROADCAST_THRESHOLD``)."""
    if len(offsets) <= _OFFSETS_BROADCAST_THRESHOLD:
        expr = F.create_map(
            *[F.lit(x) for pair in offsets.items() for x in pair]
        )[F.col("_pid")]
        return ranged.withColumn("_off", expr)
    off_df = ranged.sparkSession.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()],
        schema="_pid int, _off long",
    )
    # inner join is total: every ranged row's _pid has exactly one offsets
    # row by construction (offsets came from grouping ranged by _pid)
    return ranged.join(F.broadcast(off_df), "_pid")


def distributed_row_number(
    df: DataFrame,
    order_cols: list,
    name: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global ROW_NUMBER without the single-partition WindowExec.

    An empty-OVER window (``ROW_NUMBER() OVER (ORDER BY ...)``) forces
    Spark to move EVERY row to one partition — correct, and fatal at
    100 TB (one task sorts the world; Spark itself warns
    "No Partition Defined for Window operation").  This is the published
    two-phase composition instead:

    1. ``repartitionByRange`` on the order keys — a range shuffle that
       keeps global order across partitions (equal keys co-locate);
    2. per-partition local row_number (window PARTITIONED by
       ``spark_partition_id()`` — parallel, no global exchange);
    3. per-partition counts (a metadata-sized action: one long per
       partition) prefix-summed on the driver and added as offsets.

    Results equal the window form whenever ``order_cols`` is a total
    order (the corpus determinism convention).  Cost: one range shuffle +
    one count job over the persisted ranged data vs one all-to-one
    shuffle — the difference between "works at any SF" and "driver OOM".

    Lifetime: ``ranged`` MUST stay persisted while the returned plan is
    live — the offsets were computed from the persisted instance, and
    ``repartitionByRange`` picks boundaries by sampling, so a recompute
    could repartition differently than the counted data (wrong offsets,
    silently).  It therefore cannot be unpersisted inside this function;
    the persisted handle is attached to the result as
    ``result._sgs_persisted`` — call ``.unpersist()`` on it when done
    with the result to reclaim executor memory (session stop also
    releases it).

    Offsets attach via :func:`_with_partition_offsets`: a ``create_map``
    literal up to ``_OFFSETS_BROADCAST_THRESHOLD`` partitions, a broadcast
    equi-join on ``_pid`` beyond it — so there is no literal-size bound at
    100 TB partition counts.
    """
    from pyspark.sql import Column, Window

    _check_prefix_sum_reserved(df, name)
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    cols = [c if isinstance(c, Column) else F.col(c) for c in order_cols]
    ranged = persist_tracked(
        df.repartitionByRange(n, *cols).withColumn("_pid", F.spark_partition_id())
    )
    # one long per partition — metadata, not data (same class as a
    # parquet footer read); ordering by _pid preserves the range order
    counts = sorted(
        ((r["_pid"], r["cnt"]) for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()),
    )
    offsets, acc = {}, 0
    for pid, cnt in counts:
        offsets[pid] = acc
        acc += cnt
    w = Window.partitionBy("_pid").orderBy(*cols)
    out = (
        _with_partition_offsets(ranged, offsets)
        .withColumn(name, (F.row_number().over(w) + F.col("_off")).cast("long"))
        .drop("_pid", "_off")
    )
    out._sgs_persisted = ranged  # owner handle — see Lifetime note above
    # chained-call ownership: a helper built ON another helper's result
    # carries EVERY upstream ranged handle, so releasing the final frame's
    # _sgs_persisted_all reclaims the whole chain (ADVICE r7: rfm's d1/d2
    # intermediates leaked when only d3's single handle survived)
    out._sgs_persisted_all = [*getattr(df, "_sgs_persisted_all", []), ranged]
    # total row count — already computed for the offsets; callers needing
    # COUNT(*) OVER () alongside the rank read this instead of re-scanning
    out._sgs_total_rows = acc
    return out


def distributed_running_sum(
    df: DataFrame,
    value_col: str,
    order_cols: list,
    name: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global running SUM(value_col) over a total order without the
    single-partition WindowExec — the prefix-sum sibling of
    :func:`distributed_row_number` (same two-phase composition, same
    lifetime contract on the persisted ranged instance, same
    literal-or-broadcast offset attach via :func:`_with_partition_offsets`):
    range shuffle on the order keys, local cumsum
    windowed by ``spark_partition_id()``, per-partition TOTALS (one long
    per partition) prefix-summed on the driver and added as offsets.

    Results equal ``SUM(v) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)``
    whenever ``order_cols`` is a total order.  The building block for
    anything needing global cumulative position at 100 TB: systematic
    weighted sampling, quantile-by-position splits, contiguous shard
    assignment by byte budget."""
    from pyspark.sql import Column, Window

    _check_prefix_sum_reserved(df, name)
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    cols = [c if isinstance(c, Column) else F.col(c) for c in order_cols]
    ranged = persist_tracked(
        df.repartitionByRange(n, *cols).withColumn("_pid", F.spark_partition_id())
    )
    totals = sorted(
        (r["_pid"], r["tot"])
        for r in ranged.groupBy("_pid")
        .agg(F.sum(F.col(value_col)).cast("long").alias("tot"))
        .collect()
    )
    offsets, acc = {}, 0
    for pid, tot in totals:
        offsets[pid] = acc
        acc += tot or 0
    w = Window.partitionBy("_pid").orderBy(*cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = (
        _with_partition_offsets(ranged, offsets)
        .withColumn(
            name, (F.sum(F.col(value_col)).over(w) + F.col("_off")).cast("long")
        ).drop("_pid", "_off")
    )
    out._sgs_persisted = ranged  # owner handle — see distributed_row_number
    out._sgs_persisted_all = [*getattr(df, "_sgs_persisted_all", []), ranged]
    out._sgs_total = acc  # grand total of value_col, free from the offsets
    return out


def coalesce_for_python(df: DataFrame, bytes_per_task: int = 64 << 20) -> DataFrame:
    """Right-size a DataFrame's partitioning for an Arrow/Python stage.

    A Python stage (mapInPandas / pandas_udf) pays a fixed per-task cost —
    worker handshake, Arrow stream setup, and (cold) interpreter imports —
    that JVM stages don't.  Measured here: decoding 5 000 binary payloads
    took 0.31 s in 1 task but 1.0 s spread over 32 tasks of ~150 rows each.
    The scale-correct sizing is BYTES PER TASK, not core count: aim for
    ``bytes_per_task`` of input per Python task so the fixed cost amortizes.
    At 100 TB this yields thousands of tasks (full parallelism); at
    test scale it collapses a 32-way scan to the handful of tasks the work
    actually needs.  ``coalesce`` merges scan splits without a shuffle.
    """
    try:
        files = df.inputFiles()
        import os

        total = sum(os.path.getsize(f.removeprefix("file:")) for f in files)
    except Exception:  # noqa: BLE001 — non-file sources keep their layout
        return df
    if not total:
        return df
    k = max(1, total // bytes_per_task)
    # coalesce never increases partition count, so this is a no-op when the
    # scan already has <= k splits
    return df.coalesce(int(k))


def prepartition_for_reuse(df: DataFrame, key: str, n: int | None = None) -> DataFrame:
    """Hash-repartition once on ``key`` so several downstream wide ops
    (groupBys / joins on the same key) reuse one exchange instead of each
    shuffling independently — Catalyst recognizes the existing
    HashPartitioning and elides the redundant Exchanges."""
    return df.repartition(n, F.col(key)) if n else df.repartition(F.col(key))


def table_is_bucketed(spark: SparkSession, table_name: str) -> bool:
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table_name}").collect()
    return any("Num Buckets" in (r.col_name or "") for r in rows)


def compact_parquet(spark: SparkSession, path: str, target_file_mb: int = 128) -> int:
    """Rewrite a parquet directory into ~``target_file_mb`` files — the
    small-files remedy (streaming sinks and fine-grained partitions
    accumulate KB-sized files whose open/footer overhead dominates scans
    at scale).  Returns the new file count.

    Uses total byte size to pick the target partition count, then a single
    coalesce-free repartition write (repartition, not coalesce: coalesce
    would chain the read parallelism down to the target too).
    """
    import glob as _glob
    import os as _os
    import shutil as _shutil

    files = _glob.glob(_os.path.join(path, "**", "*.parquet"), recursive=True)
    total_mb = sum(_os.path.getsize(f) for f in files) / 1e6
    n = max(1, round(total_mb / target_file_mb))
    tmp = path.rstrip("/") + "__compacting"
    spark.read.parquet(path).repartition(n).write.mode("overwrite").parquet(tmp)
    _shutil.rmtree(path)
    _os.rename(tmp, path)
    return len(_glob.glob(_os.path.join(path, "*.parquet")))


def zorder_values(df: DataFrame, cols: list[str], bits: int = 8) -> DataFrame:
    """Add a ``_z`` column: the Morton (Z-order) code of ``cols``.

    Each column is quantized to ``bits`` buckets via its approximate
    quantile boundaries (one distributed GK-sketch pass per column,
    driver-side result is just the 2^bits boundary list), then the bucket
    ids' bits are interleaved JVM-side with one shift/or expression chain.
    Rank-based quantization (not min/max scaling) makes the code robust to
    skew: each bucket holds ~1/2^bits of the rows regardless of the value
    distribution.

    This is the layout transform behind Delta/Iceberg's OPTIMIZE ZORDER
    (public construction: Morton 1966): sorting by ``_z`` clusters rows so
    EVERY listed column has narrow min/max ranges per file, which turns
    parquet footer stats into an effective multi-column index — the
    standard lakehouse answer to "I filter on two columns but can only
    partition by one".

    Column types: numerics, booleans, timestamps (incl. NTZ — the session
    timezone is pinned UTC), and dates quantize through a numeric
    surrogate; strings/binaries are rejected with a clear error (their
    only order-preserving surrogate IS the value — use ``partition_by``
    for low-cardinality strings, or a plain range sort on a single string
    column, which repartitionByRange handles natively).
    """
    k_res = len(cols)
    reserved = (
        {f"_q{i}" for i in range(k_res)}
        | {f"_b{i}" for i in range(k_res)}
        | {"_z"}
    )
    clash = sorted(reserved & set(df.columns))
    if clash:
        # the internal quantization columns would silently overwrite (and
        # then drop) same-named input columns — corrupting data is worse
        # than demanding a rename (ADVICE r11)
        raise ValueError(
            f"zorder_values: input columns {clash} collide with the "
            "reserved internal names (_q<i>/_b<i>/_z) — rename them first"
        )
    n = 1 << bits
    probs = [j / n for j in range(1, n)]
    # order-preserving NUMERIC surrogate per column: approxQuantile (and
    # the quantization filter below) are numeric-only, but z-ordering by
    # time + key is the canonical use — cast rather than reject
    surrogates = []
    for c, t in ((c, dict(df.dtypes)[c]) for c in cols):
        if t in ("timestamp", "timestamp_ntz"):
            surrogates.append(f"cast(cast({c} as timestamp) as double)")
        elif t == "date":
            surrogates.append(f"cast(unix_date({c}) as double)")
        elif t in ("string", "binary") or t.startswith(("array", "map", "struct")):
            raise ValueError(
                f"zorder_values: column {c!r} has non-quantizable type {t} — "
                "use partition_by for low-cardinality strings"
            )
        else:
            surrogates.append(f"cast({c} as double)")
    work = df
    for i, s in enumerate(surrogates):
        work = work.withColumn(f"_q{i}", F.expr(s))
    qcols = [f"_q{i}" for i in range(len(cols))]
    # ONE multi-column GK pass (one job), not one per column
    all_bounds = work.stat.approxQuantile(qcols, probs, 0.001)
    quantized = work
    for i, bounds in enumerate(all_bounds):
        # width_bucket via a literal sorted-array binary search would be
        # ideal; a filter-count over the literal array is one expression
        # and exact for our bucket counts
        arr = ", ".join(repr(float(b)) for b in bounds)
        quantized = quantized.withColumn(
            f"_b{i}",
            F.expr(f"size(filter(array({arr}), x -> x <= _q{i}))"),
        )
    quantized = quantized.drop(*qcols)
    k = len(cols)
    z = " | ".join(
        f"shiftleft(cast(shiftrightunsigned(_b{i}, {b}) & 1 as bigint), {b * k + (k - 1 - i)})"
        for i in range(k)
        for b in range(bits)
    )
    return quantized.withColumn("_z", F.expr(z)).drop(
        *[f"_b{i}" for i in range(k)]
    )


def zorder_write(
    df: DataFrame,
    cols: list[str],
    out_path: str,
    files: int = 32,
    bits: int = 8,
) -> None:
    """OPTIMIZE ZORDER analog: rewrite ``df`` into ``files`` parquet files
    range-partitioned and sorted by the Morton code of ``cols``, so
    min/max footer stats prune scans filtered on ANY prefix-free subset of
    those columns.  Row values are unchanged — only layout.  The shuffle
    is one range exchange on a bigint (the same cost class as a global
    sort), paid once at write time like every compaction job."""
    zorder_values(df, cols, bits=bits).repartitionByRange(
        files, "_z"
    ).sortWithinPartitions("_z").drop("_z").write.mode("overwrite").parquet(out_path)
