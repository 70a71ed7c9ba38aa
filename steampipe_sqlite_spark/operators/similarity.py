"""Similarity search over embedding columns.

Three paths:
- brute_force_topk: exact cosine top-k — broadcast the (small) query set,
  one pass over the corpus, per-query heap via window row_number.  The
  baseline and the oracle-checkable path.
- lsh_topk: random-hyperplane LSH — signatures map-side from literal plane
  vectors (seeded, deterministic), candidates meet on bucket keys, exact
  re-rank inside buckets.  The 100 TB path: never materializes the O(n·q)
  pair space, only bucket-local pairs.
- ivf_topk: inverted-file partitioning — corpus assigned to coarse Voronoi
  cells, queries probe their nprobe nearest cells.  The other standard ANN
  scale path; fully SQL-oracle-checkable thanks to deterministic centroids.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from steampipe_sqlite_spark.functions.vectors import dot_sql, norm_sql

# Upper bound on a driver-materialized ANN query batch (rows).  At 768-dim
# float64 that is ~64k * 6 KiB = ~400 MB of driver memory worst-case —
# the edge of sane for a broadcast; anything larger is not a "serving
# batch" and must go through a distributed join instead.
MAX_QUERY_BATCH = 65_536


def _cos_sql(av: str, bv: str, an: str, bn: str) -> str:
    """4-dp-rounded cosine as ONE SQL expression (construction-cheap; the
    fold order matches the DuckDB oracles exactly — see vectors.dot_sql)."""
    return f"round({dot_sql(av, bv)} / ({an} * {bn}), 4)"


def _prep(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    return df.selectExpr(
        f"{id_col} AS id", f"{vec_col} AS v", f"{norm_sql(vec_col)} AS nrm"
    )


def brute_force_topk(
    corpus: DataFrame, queries: DataFrame, vec_col: str, id_col: str, k: int = 5
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cosine, rank).

    Ranking uses the 4-dp-rounded cosine with id tie-break so results are
    total-ordered and engine-independent.
    """
    c = _prep(corpus, vec_col, id_col).alias("c")
    q = _prep(queries, vec_col, id_col).alias("q")
    # Broadcast the QUERY set and stream the corpus: the corpus is the big
    # side (unboundedly so at scale — broadcasting it OOMs every executor),
    # and streaming it keeps the scoring work spread across the corpus
    # scan's partitions instead of concentrating the whole pair space on
    # the query side's (few) partitions.
    scored = c.join(F.broadcast(q), F.expr("q.id <> c.id")).selectExpr(
        "q.id AS query_id",
        "c.id AS neighbor_id",
        f"{_cos_sql('q.v', 'c.v', 'q.nrm', 'c.nrm')} AS cosine",
    )
    return scored.selectExpr(
        "*",
        "row_number() OVER (PARTITION BY query_id"
        " ORDER BY cosine DESC, neighbor_id ASC) AS rank",
    ).where(f"rank <= {int(k)}")


def blas_topk(
    corpus: DataFrame, queries: DataFrame, vec_col: str, id_col: str, k: int = 5
) -> DataFrame:
    """Exact cosine top-k via per-partition BLAS matrix products — the
    vectorized twin of :func:`brute_force_topk` (same output contract:
    (query_id, neighbor_id, cosine, rank), same rounding, same tie-break).

    Shape: the query batch (small by the ANN serving assumption — the same
    rows ``brute_force_topk`` ships via ``F.broadcast``) is collected to a
    (Q×dim) float64 matrix and closed over by a ``mapInPandas`` stage; each
    corpus partition becomes a (P×dim) matrix, one GEMM scores all P×Q
    pairs, and only the per-partition top-k per query (≤ k·Q rows — any
    global top-k row is in its partition's top-k under the same total
    order) survives to the final global window.  Versus the expression
    form, the per-pair cost drops from an interpreted ~5 µs higher-order
    fold to a fused multiply-add inside the BLAS kernel; at 1000 executors
    this is a map-only scan plus a k·Q·partitions-row reduce.

    Numerics: scores are float64 GEMM sums (pairwise/FMA order) where the
    SQL form folds left-to-right — both exact to ~1e-15, and the emitted
    cosine is rounded to 4 dp (half-away-from-zero, matching the engines'
    ROUND on these non-boundary values), so results are hash-identical to
    the SQL path; test_llm_ops pins blas_topk == brute_force_topk exactly.
    """
    import pandas as pd

    # Hard cap on the driver-materialized query batch (VERDICT r6 #6: the
    # "small by the ANN serving assumption" contract was documented but
    # unenforced).  limit(cap+1) bounds the collect itself — an oversized
    # batch fails fast instead of OOMing the driver.
    cap = MAX_QUERY_BATCH
    q_pd = (
        queries.selectExpr(f"{id_col} AS id", f"{vec_col} AS v")
        .limit(cap + 1)
        .toPandas()
    )
    if len(q_pd) > cap:
        raise ValueError(
            f"blas_topk query batch exceeds MAX_QUERY_BATCH={cap} rows; "
            "a corpus-sized 'query' side belongs in a bucketed "
            "all-pairs join, not the broadcast-batch ANN path"
        )
    kk = int(k)
    if not len(q_pd):  # empty query batch: empty result, same schema
        return (
            corpus.selectExpr(f"{id_col} AS query_id", f"{id_col} AS neighbor_id")
            .selectExpr("query_id", "neighbor_id", "cast(0.0 as double) AS cosine", "1 AS rank")
            .limit(0)
        )
    q_ids = q_pd["id"].to_numpy(dtype=np.int64)
    qm = np.asarray([np.asarray(v, dtype=np.float64) for v in q_pd["v"]])
    q_norm = np.sqrt((qm * qm).sum(axis=1))

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            cm = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            cid = pdf["id"].to_numpy(dtype=np.int64)
            c_norm = np.sqrt((cm * cm).sum(axis=1))
            s = cm @ qm.T / np.outer(c_norm, q_norm)  # (P, Q)
            # round half-away-from-zero on the binary double, like the
            # engines' ROUND(x, 4) (np.round would be half-even)
            s = np.floor(np.abs(s) * 1e4 + 0.5) * np.sign(s) / 1e4
            out = []
            for j in range(len(q_ids)):
                keep = np.nonzero(cid != q_ids[j])[0]
                top = keep[np.lexsort((cid[keep], -s[keep, j]))[:kk]]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": q_ids[j],
                            "neighbor_id": cid[top],
                            "cosine": s[top, j],
                        }
                    )
                )
            if out:
                yield pd.concat(out)

    scored = corpus.selectExpr(f"{id_col} AS id", f"{vec_col} AS v").mapInPandas(
        score, "query_id long, neighbor_id long, cosine double"
    )
    return scored.selectExpr(
        "*",
        "row_number() OVER (PARTITION BY query_id"
        " ORDER BY cosine DESC, neighbor_id ASC) AS rank",
    ).where(f"rank <= {kk}")


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (public construction: sign-random
    projections, Charikar 2002)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def _dot_plane_sql(vec_name: str, plane: list[float]) -> str:
    """SQL for Σ vec_i·plane_i with the plane inlined as literals (same
    association as functions.vectors.dot)."""
    arr = ", ".join(f"cast({float(x)!r} as double)" for x in plane)
    return (
        f"aggregate(zip_with({vec_name}, array({arr}), "
        "(x, y) -> cast(x as double) * y), cast(0.0 as double), (acc, x) -> acc + x)"
    )


def lsh_signature(vec_name: str, planes: list[list[float]]) -> F.Column:
    """Bucket id = bits of sign(v·p_i), packed into a long.

    Built as ONE SQL string: the Column-chain form materializes every
    plane coefficient as an individual `F.lit` py4j call (n_planes × dim
    round trips per table), which dominates query build time.
    """
    sig = " + ".join(
        f"shiftleft(cast(({_dot_plane_sql(vec_name, plane)}) > 0 as long), {i})"
        for i, plane in enumerate(planes)
    )
    return F.expr(sig)


def int8_topk(
    corpus: DataFrame, queries: DataFrame, vec_col: str, id_col: str, k: int = 5
) -> DataFrame:
    """Exact-over-quantized cosine top-k: vectors are symmetric-int8
    quantized (functions/vectors.quantize_int8) and ranked by the cosine
    of the QUANTIZED vectors — scale-invariant, so no dequantization.

    Same broadcast + window shape as brute_force_topk; the payoff at scale
    is 4× less corpus IO/memory and integer dot products.  Integer sums
    are order-independent (exact in double up to 2^53), so the 4-dp cosine
    is bit-stable across engines — fully oracle-checkable.
    """
    from steampipe_sqlite_spark.functions.vectors import quantize_int8

    def prep(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col).alias("id"), quantize_int8(F.col(vec_col)).alias("qv")
        ).withColumn("qn", F.expr(f"sqrt({dot_sql('qv', 'qv')})"))

    c = prep(corpus).alias("c")
    q = prep(queries).alias("q")
    # corpus streams, queries broadcast — same rationale as brute_force_topk
    scored = c.join(F.broadcast(q), F.expr("q.id <> c.id")).selectExpr(
        "q.id AS query_id",
        "c.id AS neighbor_id",
        f"{_cos_sql('q.qv', 'c.qv', 'q.qn', 'c.qn')} AS cosine_q",
    )
    return scored.selectExpr(
        "*",
        "row_number() OVER (PARTITION BY query_id"
        " ORDER BY cosine_q DESC, neighbor_id ASC) AS rank",
    ).where(f"rank <= {int(k)}")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate cosine top-k: candidates = bucket collisions in any of
    ``n_tables`` independent hyperplane tables, re-ranked exactly.

    Per table: one narrow shuffle on (table, bucket).  Recall grows with
    n_tables and shrinks with n_planes (finer buckets); cost stays linear
    in corpus size — the property that matters at 1000 executors.  Tuning
    rule: n_planes ≈ log2(corpus_size / target_bucket_size), then raise
    n_tables until recall holds (measured here at 500×64d: 4/8 → 0.72,
    4/16 → 0.94, 3/12 → 1.00 recall@5).
    """
    c = _prep(corpus, vec_col, id_col)
    q = _prep(queries, vec_col, id_col)
    tables = [hyperplanes(dim, n_planes, seed=42 + t) for t in range(n_tables)]

    def with_buckets(df: DataFrame) -> DataFrame:
        return df.select(
            "id",
            "v",
            "nrm",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("tbl"),
                            lsh_signature("v", planes).alias("bucket"),
                        )
                        for t, planes in enumerate(tables)
                    ]
                )
            ).alias("tb"),
        ).select("id", "v", "nrm", "tb.tbl", "tb.bucket")

    cb = with_buckets(c).alias("c")
    qb = with_buckets(q).alias("q")
    cand = (
        qb.join(
            cb,
            [
                F.col("q.tbl") == F.col("c.tbl"),
                F.col("q.bucket") == F.col("c.bucket"),
                F.col("q.id") != F.col("c.id"),
            ],
        )
        .select(
            F.col("q.id").alias("query_id"),
            F.col("c.id").alias("neighbor_id"),
            F.col("q.v").alias("qv"),
            F.col("c.v").alias("cv"),
            F.col("q.nrm").alias("qn"),
            F.col("c.nrm").alias("cn"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    cos = F.expr(_cos_sql("qv", "cv", "qn", "cn"))
    scored = cand.select("query_id", "neighbor_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _assign_cells_gemm(c: DataFrame, cent_rows: list) -> DataFrame:
    """Vectorized Voronoi cell assignment (mapInPandas GEMM over the
    collected centroid matrix).  Semantics pinned to the expression-form
    argmax: 4-dp-rounded cosine, ties to the lowest cid (cent_rows sorted
    by id; np.argmax returns the first max index).  Shared by ivf_topk
    and ivf_build_index so index-then-query equals direct-query exactly."""
    cm = np.asarray([np.asarray(r.v, dtype=np.float64) for r in cent_rows])
    cn = np.asarray([r.nrm for r in cent_rows])

    def assign_np(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vm = np.asarray([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
            nrm = np.sqrt((vm * vm).sum(axis=1))
            s = vm @ cm.T / np.outer(nrm, cn)
            s = np.floor(np.abs(s) * 1e4 + 0.5) * np.sign(s) / 1e4
            out = pdf[["id", "v", "nrm"]].copy()
            out["cell"] = np.argmax(s, axis=1).astype("int32")
            yield out

    return c.mapInPandas(assign_np, "id long, v array<float>, nrm double, cell int")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 3,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: the corpus is partitioned
    into ``n_cells`` Voronoi cells around coarse centroids; each query
    probes its ``nprobe`` nearest cells and re-ranks exactly inside them.

    Centroids here are the first ``n_cells`` corpus vectors (deterministic,
    which keeps the operator SQL-oracle-checkable); a production deployment
    would k-means them offline — the plan shape is identical.  Scale
    profile: the k centroids are pre-aggregated into ONE row holding an
    array<struct<cid,cv,cn>> and broadcast-crossed onto the corpus (a
    1-row broadcast nested loop — the same shape as llm.py's scalar-total
    join), so cell assignment is a PURE MAP over the corpus scan: no
    16×-row cross-join blow-up, no corpus shuffle.  (The earlier form
    cross-joined a centroid table and re-grouped by id, which shuffles
    every corpus vector — exactly what an inverted file exists to avoid
    at 100 TB.  A literal-inlined variant was measured 2× slower: ~2k
    literal expression nodes per assignment defeat constant sharing.)
    Candidates then meet on the cell id with the nprobe-expanded query
    set broadcast.
    """
    c = _prep(corpus, vec_col, id_col)
    q = _prep(queries, vec_col, id_col)
    # The broadcast 1-row centroid array is re-aggregated from the corpus
    # (a k-row scan+agg+broadcast job).  The r14 attempt to build it from
    # the cent_rows already collected for the GEMM face (driver-side
    # createDataFrame -> LocalTableScan) was measured SLOWER and reverted
    # (r15, VERDICT r14 #1): 7/7 interleaved same-window pairs read the
    # re-agg form faster (med 0.82x, best 0.750 vs 0.925 s at sf0.1) —
    # py4j-converting the nested struct<int,array<float>,double> x16 row
    # on the driver costs more than the small distributed agg job it
    # saves, and the driver's BENCH_r14 (0.607 -> 0.868 s) agreed.
    cent_arr = (
        c.where(f"id < {int(n_cells)}")
        .selectExpr(
            "named_struct('cid', cast(id AS int), 'cv', v, 'cn', nrm) AS s"
        )
        .agg(F.expr("sort_array(collect_list(s)) AS cents"))
    )
    # cells are labeled by POSITION in the sorted centroid array, not the
    # raw centroid id: _assign_cells_gemm (the corpus side) labels by
    # argmax position, and the two labelings only coincide when the
    # first-n_cells corpus ids are dense 0..n-1 — with sparse ids the
    # query would probe cells that don't exist (the bug class the
    # persisted-index builders fixed in round 5; found by review there).
    scored_cells = (
        "transform(cents, (s, i) -> named_struct("
        f"'c', round(({dot_sql('v', 's.cv')}) / (nrm * s.cn), 4), 'cid', i))"
    )

    def assign(df: DataFrame, keep: int) -> DataFrame:
        crossed = df.crossJoin(F.broadcast(cent_arr))
        if keep == 1:
            # map-side argmax; ties break toward the lowest cid, matching
            # ORDER BY cell_cos DESC, cid ASC
            best = (
                f"aggregate({scored_cells}, "
                "named_struct('c', cast(-9.0 as double), 'cid', 2147483647), "
                "(acc, x) -> IF(x.c > acc.c OR (x.c = acc.c AND x.cid < acc.cid), x, acc))"
            )
            return crossed.selectExpr("id", "v", "nrm", f"({best}).cid AS cell")
        # top-``keep`` cells: total-order sort of the (cos, cid) structs,
        # slice, explode — still map-only
        cmp = (
            "(a, b) -> CASE WHEN a.c > b.c THEN -1 WHEN a.c < b.c THEN 1 "
            "WHEN a.cid < b.cid THEN -1 WHEN a.cid > b.cid THEN 1 ELSE 0 END"
        )
        return crossed.selectExpr(
            "id",
            "v",
            "nrm",
            f"explode(transform(slice(array_sort({scored_cells}, {cmp}), 1, {int(keep)}),"
            " s -> s.cid)) AS cell",
        )

    # Corpus-side assignment runs VECTORIZED (mapInPandas GEMM over the
    # centroid matrix — the same argmax semantics: 4-dp-rounded cosine,
    # ties to the lowest cid): the corpus is the unbounded side, and the
    # per-row interpreted HOF argmax was the operator's dominant CPU term
    # at every scale.  The k centroids are collected once (k rows —
    # metadata-sized, the same bound as the broadcast they feed) and
    # closed over.  The tiny query side keeps the expression form, which
    # the DuckDB oracle mirrors clause-for-clause.
    cent_rows = sorted(
        c.where(f"id < {int(n_cells)}").select("id", "v", "nrm").collect(),
        key=lambda r: r.id,
    )
    corpus_cells = (
        assign(c, keep=1)
        if not cent_rows
        else _assign_cells_gemm(c, cent_rows)
    ).alias("c")
    probes = assign(q, keep=nprobe).alias("q")
    # corpus_cells streams (big side at scale); the nprobe-expanded query
    # set is broadcast so the probe join never shuffles the corpus.
    # No pair dedup needed: each corpus vector lives in exactly ONE cell
    # (keep=1), so a (query, neighbor) pair can meet at most once even
    # across nprobe probes — dropDuplicates here was a wasted shuffle.
    scored = corpus_cells.join(
        F.broadcast(probes), F.expr("q.cell = c.cell AND q.id <> c.id")
    ).selectExpr(
        "q.id AS query_id",
        "c.id AS neighbor_id",
        f"{_cos_sql('q.v', 'c.v', 'q.nrm', 'c.nrm')} AS cosine",
    )
    return scored.selectExpr(
        "*",
        "row_number() OVER (PARTITION BY query_id"
        " ORDER BY cosine DESC, neighbor_id ASC) AS rank",
    ).where(f"rank <= {int(k)}")


def filtered_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    match_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """Metadata-constrained exact top-k (the RAG "filtered ANN" shape):
    a neighbor must share every ``match_cols`` value with its query, on
    top of the cosine ranking of :func:`brute_force_topk` (same output
    contract + the match columns).

    The constraint enters the BROADCAST JOIN CONDITION, not a post-filter:
    each corpus row is scored only against the queries whose metadata it
    matches, so a selective filter cuts the scored pair space
    proportionally (with a post-filter every pair would be scored first
    and discarded after).  Static predicates on the corpus side should be
    applied by the caller before the call — they push down into the
    parquet scan; this function handles the per-query dynamic half.
    """

    def prep(df, side):
        return df.selectExpr(
            f"{id_col} AS id",
            f"{vec_col} AS v",
            f"{norm_sql(vec_col)} AS nrm",
            *[f"{c} AS {side}_{c}" for c in match_cols],
        )

    c = prep(corpus, "c").alias("c")
    q = prep(queries, "q").alias("q")
    cond = " AND ".join(
        ["q.id <> c.id"] + [f"q.q_{m} = c.c_{m}" for m in match_cols]
    )
    scored = c.join(F.broadcast(q), F.expr(cond)).selectExpr(
        "q.id AS query_id",
        "c.id AS neighbor_id",
        *[f"q.q_{m} AS {m}" for m in match_cols],
        f"{_cos_sql('q.v', 'c.v', 'q.nrm', 'c.nrm')} AS cosine",
    )
    return scored.selectExpr(
        "*",
        "row_number() OVER (PARTITION BY query_id"
        " ORDER BY cosine DESC, neighbor_id ASC) AS rank",
    ).where(f"rank <= {int(k)}")


def ivf_build_index(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    path: str,
    n_cells: int = 16,
) -> None:
    """Persist an IVF index: ``path/centroids`` (k rows) plus
    ``path/cells`` partitioned BY CELL (hive layout) — the build-once /
    query-many ANN serving lifecycle.  Each query later probes nprobe
    cells, and because the assignments are hive-partitioned on ``cell``,
    the probe scan is PARTITION-PRUNED to those directories: at 10^9
    vectors a 3-of-1024-cell probe reads ~0.3% of the index, no filter
    evaluation needed.  Assignment semantics are exactly ivf_topk's
    (shared _assign_cells_gemm), so index-then-query == direct-query.
    """
    c = _prep(corpus, vec_col, id_col)
    cent_rows = sorted(
        c.where(f"id < {int(n_cells)}").select("id", "v", "nrm").collect(),
        key=lambda r: r.id,
    )
    if not cent_rows:
        raise ValueError("empty corpus: nothing to index")
    # centroids are persisted under their POSITION in the sorted list, not
    # their raw corpus id: _assign_cells_gemm labels cells by argmax
    # position, and the query side probes by the saved id — the two must
    # be the same labeling even when the first-n_cells corpus ids are
    # sparse (found by the ivfpq append invariant test: an even-id half
    # corpus yields centroid ids {0, 2} but cell labels {0, 1}).
    c.sparkSession.createDataFrame(
        [(pos, list(r.v), r.nrm) for pos, r in enumerate(cent_rows)],
        "id long, v array<float>, nrm double",
    ).write.mode("overwrite").parquet(f"{path}/centroids")
    _assign_cells_gemm(c, cent_rows).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(f"{path}/cells")


def ivf_query_index(
    spark,
    path: str,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
    nprobe: int = 3,
) -> DataFrame:
    """Query a persisted IVF index (ivf_build_index): same output contract
    as ivf_topk — (query_id, neighbor_id, cosine, rank).

    The query side assigns its nprobe probe cells against the read-back
    centroids (expression form — the query set is small), the probed cell
    ids are collected (≤ nprobe·|queries| ints, metadata-sized) and
    applied as a LITERAL ``cell IN (...)`` filter so Catalyst prunes the
    hive partitions before any row is read; the pruned scan then streams
    against the broadcast probe set exactly like ivf_topk's candidate
    join.
    """
    cents = spark.read.parquet(f"{path}/centroids")
    cent_arr = cents.selectExpr(
        "named_struct('cid', cast(id AS int), 'cv', v, 'cn', nrm) AS s"
    ).agg(F.expr("sort_array(collect_list(s)) AS cents"))
    q = _prep(queries, vec_col, id_col)
    scored_cells = (
        "transform(cents, s -> named_struct("
        f"'c', round(({dot_sql('v', 's.cv')}) / (nrm * s.cn), 4), 'cid', s.cid))"
    )
    cmp = (
        "(a, b) -> CASE WHEN a.c > b.c THEN -1 WHEN a.c < b.c THEN 1 "
        "WHEN a.cid < b.cid THEN -1 WHEN a.cid > b.cid THEN 1 ELSE 0 END"
    )
    probes = (
        q.crossJoin(F.broadcast(cent_arr))
        .selectExpr(
            "id",
            "v",
            "nrm",
            f"explode(transform(slice(array_sort({scored_cells}, {cmp}), 1, {int(nprobe)}),"
            " s -> s.cid)) AS cell",
        )
        .alias("q")
    )
    probe_cells = sorted(
        {r.cell for r in probes.select("cell").distinct().collect()}
    )
    cells = (
        spark.read.parquet(f"{path}/cells")
        .where(F.col("cell").isin(probe_cells))
        .alias("c")
    )
    scored = cells.join(
        F.broadcast(probes), F.expr("q.cell = c.cell AND q.id <> c.id")
    ).selectExpr(
        "q.id AS query_id",
        "c.id AS neighbor_id",
        f"{_cos_sql('q.v', 'c.v', 'q.nrm', 'c.nrm')} AS cosine",
    )
    return scored.selectExpr(
        "*",
        "row_number() OVER (PARTITION BY query_id"
        " ORDER BY cosine DESC, neighbor_id ASC) AS rank",
    ).where(f"rank <= {int(k)}")


# --- Product quantization (PQ) ANN -----------------------------------------


def _pq_subvectors(
    df: DataFrame, vec_col: str, id_col: str, m: int, d_sub: int
) -> DataFrame:
    """Explode each vector into its m contiguous d_sub-wide subvectors:
    (id, m, sv, svv).  Single-sourced — train, encode, LUT, and append
    all split the SAME way (a drifted copy here is exactly the
    labeling-desync class the round-5 index bugs came from).  The unused
    ``extra`` passthrough column and its fragile ' AS '-split alias
    parsing were dropped (ADVICE r5) — all four callers split on id
    alone and join any extra columns back by id."""
    return (
        df.selectExpr(
            f"{id_col} AS id",
            f"transform({vec_col}, x -> cast(x as double)) AS v",
        )
        .selectExpr(
            "id",
            f"explode(transform(sequence(0, {m - 1}),"
            f" j -> struct(j AS m, slice(v, j * {d_sub} + 1, {d_sub}) AS sv))) AS s",
        )
        .selectExpr("id", "s.m AS m", "s.sv AS sv")
        .selectExpr("id", "m", "sv", f"{dot_sql('sv', 'sv')} AS svv")
    )


def _pq_params(books: DataFrame) -> tuple[int, int]:
    """Recover (m, d_sub) from a codebook relation — the saved books are
    the source of truth for query/append paths; trusting caller-supplied
    defaults silently corrupts results on a mismatch (zip_with pads with
    null -> NULL scores -> arbitrary shortlist, no error)."""
    row = books.selectExpr(
        "cast(max(m) + 1 AS int) AS m", "cast(max(size(cv)) AS int) AS d_sub"
    ).first()
    return int(row.m), int(row.d_sub)


def _spark_round(x: "np.ndarray", scale: int) -> "np.ndarray":
    """Replicate Spark's ROUND(double, scale) — BigDecimal HALF_UP over the
    SHORTEST DECIMAL STRING of the value — vectorized.  The binary
    floor-trick (``sign·floor(|x|·10^s + 0.5)/10^s``) agrees with it
    everywhere except within ~1 ulp of a .5 boundary, where the shortest
    string is authoritative; those few candidates are re-rounded through
    ``decimal.Decimal(repr(x))``, which is the same shortest-string
    semantics (Python repr and Java Double.toString both emit the shortest
    round-trip decimal)."""
    q = 10.0 ** scale
    a = np.abs(x) * q
    frac = a - np.floor(a)
    out = np.sign(x) * np.floor(a + 0.5) / q
    risky = np.abs(frac - 0.5) < 1e-5
    if risky.any():
        from decimal import ROUND_HALF_UP, Decimal

        quant = Decimal(1).scaleb(-scale)
        flat_x, flat_o = np.ravel(x), np.ravel(out)
        for i in np.flatnonzero(np.ravel(risky)):
            flat_o[i] = float(
                Decimal(repr(float(flat_x[i]))).quantize(quant, ROUND_HALF_UP)
            )
        out = flat_o.reshape(out.shape)
    return out


def _spark_round_nano_long(vals: "np.ndarray") -> "np.ndarray":
    """int64 of Spark's ``ROUND(val * 1e9) :: long`` — the product is
    formed in binary first (exactly as the SQL multiplies before the
    round), then string-rounded at scale 0 like :func:`_spark_round`."""
    y = vals * 1e9
    return _spark_round(y, 0).astype(np.int64)


def _dot_seq(a: "np.ndarray", b: "np.ndarray") -> float:
    """Strict left-to-right double fold — bit-identical to
    functions.vectors.dot_sql for the same operand values."""
    acc = 0.0
    for t in range(len(a)):
        acc = acc + float(a[t]) * float(b[t])
    return acc


def pq_codebooks(
    corpus: DataFrame, vec_col: str, id_col: str,
    m: int = 4, codebook: int = 16, dim: int = 64, iters: int = 2,
) -> DataFrame:
    """Train PQ codebooks: ``m`` independent k-means fits (one per
    contiguous ``dim/m``-wide subspace), run as ONE generalized Lloyd loop
    keyed by (subspace, id) — the same deterministic contract as
    clustering.kmeans_assign (first-``codebook`` ids init, fixed ``iters``,
    4-dp-rounded distances, integer-nano centroid means) so the whole fit
    is oracle-replayable.  Returns (m, cid, cv, cc): m*codebook rows —
    metadata-sized whatever the corpus.

    Scale shape (r15, VERDICT r14 #3): ONE shuffle keyed on the subspace
    id + ONE grouped-pandas stage run the whole fit.  The previous
    declarative chain (per-iteration `_pq_assign` broadcast + argmin
    shuffle + `_pq_update` mean shuffle) was measured at ~15 *sequential*
    broadcast-join barriers — each `_pq_assign` broadcasts the previous
    `_pq_update`'s output, whose subtree nests every earlier round, so
    wall-clock was barrier depth, not data volume (2.46 s best-of-3 at
    sf0.1 for metadata-sized work; the r14 spread/persist attempt was
    measured NEGATIVE because it added exchanges without cutting depth).
    Each subspace's fit is a task-local numpy loop over its n×d_sub
    matrix; at 100 TB the one shuffle moves the same n·m subvector rows
    the old argmin shuffle moved PER ROUND, and the per-task state is one
    (n_subspace_rows × d_sub) matrix — the same task-sized contract as
    every grouped-pandas operator here.

    Numerics are REPLAYED, not approximated: the worker folds dots
    left-to-right like vectors.dot_sql, rounds through
    :func:`_spark_round` (Spark's shortest-string HALF_UP), sums
    integer-nano longs exactly, and reuses the Spark-computed ``svv``
    carried on the input rows — so the returned books are bit-identical
    to the old declarative chain's (pinned by
    tests/test_llm_ops.py::TestProductQuantization::
    test_batched_trainer_matches_declarative_chain) and the unrolled-CTE
    oracle replays them unchanged.
    """
    import pandas as pd

    d_sub = dim // m
    sub = _pq_subvectors(corpus, vec_col, id_col, m, d_sub)
    # fail loudly like ivf_build_index: an empty init (no corpus ids
    # below `codebook`) would otherwise train an empty codebook and
    # every downstream query would silently return zero rows.  Checked
    # on the raw corpus (id column only — column-pruned scan, no
    # explode pipeline) so the guard job stays as cheap as possible.
    if corpus.where(f"{id_col} < {int(codebook)}").limit(1).count() == 0:
        raise ValueError(
            f"empty PQ init: no corpus ids < {codebook} — re-key the corpus "
            "or pass a smaller codebook"
        )
    n_iters = int(iters)

    def train(pdf: "pd.DataFrame") -> "pd.DataFrame":
        sub_m = int(pdf["m"].iloc[0])
        sv = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["sv"]])
        svv = pdf["svv"].to_numpy(dtype=np.float64)
        ids = pdf["id"].to_numpy(dtype=np.int64)
        init = np.flatnonzero(ids < codebook)
        init = init[np.argsort(ids[init], kind="stable")]
        # centroids kept sorted ascending by cid so argmin's first-min
        # matches min_by(cid, struct(d2, cid))'s lowest-cid tie-break
        c_cid = ids[init]
        c_cv = sv[init]
        c_cc = svv[init].copy()
        for _ in range(n_iters):
            # assign: d2 = round((svv - 2*dot(sv, cv)) + cc, 4), the dot
            # accumulated position-by-position = the SQL fold's order
            acc = np.zeros((len(sv), len(c_cid)))
            for t in range(d_sub):
                acc += sv[:, t : t + 1] * c_cv[None, :, t]
            d2 = _spark_round((svv[:, None] - 2.0 * acc) + c_cc[None, :], 4)
            cells = c_cid[np.argmin(d2, axis=1)]
            # update: per-cell integer-nano mean (exact, fold-order-free),
            # cc re-derived with the sequential fold like _pq_update did
            new_cid = np.unique(cells)
            cv_rows, cc_rows = [], []
            for cid in new_cid:
                grp = sv[cells == cid]
                s = _spark_round_nano_long(grp).sum(axis=0, dtype=np.int64)
                cv = (s.astype(np.float64) / len(grp)) / 1e9
                cv_rows.append(cv)
                cc_rows.append(_dot_seq(cv, cv))
            c_cid, c_cv, c_cc = new_cid, np.stack(cv_rows), np.asarray(cc_rows)
        # dense renumber (see the note below): rank within the subspace
        return pd.DataFrame(
            {
                "m": sub_m,
                "cid": np.arange(len(c_cid), dtype=np.int32),
                "cv": [list(map(float, v)) for v in c_cv],
                "cc": c_cc,
            }
        )

    # Dense codeword ids (0..n-1 per subspace) as the LAST step: init ids
    # can be sparse (the first-``codebook`` corpus ids need not be
    # 0..codebook-1) and Lloyd cells can die, but the ADC lookup
    # (element_at(lut_row, code+1)) is positional — it is only correct if
    # cid == rank.  Renumbering by rank preserves every tie-break
    # downstream (rank is monotone in cid) and makes codes dense by
    # construction, so appended batches encoded against the SAVED books
    # stay consistent too.  Found by the ivfpq append invariant test:
    # building on the even-id half corpus left 8 sparse cids {0,2,..,14}
    # under a 16-wide positional lookup.
    return sub.groupBy("m").applyInPandas(
        train, "m int, cid int, cv array<double>, cc double"
    )


def _pq_assign(sub: DataFrame, cent: DataFrame) -> DataFrame:
    """Per (id, subspace) nearest codeword — broadcast the m*codebook
    centroids, join on the subspace key, min_by argmin (4-dp-rounded
    distance, cid tie-break — the kmeans determinism contract).

    Since r15 this is the REFERENCE implementation only: the shipped
    trainer runs the whole Lloyd loop in one grouped-pandas stage and the
    shipped encode is the map-only `_pq_encode`; the bit-parity tests in
    test_llm_ops.py::TestProductQuantization replay this chain against
    both."""
    crossed = sub.join(F.broadcast(cent), "m").withColumn(
        "d2",
        F.expr(f"round(svv - 2 * {dot_sql('sv', 'cv')} + cc, 4)"),
    )
    return (
        crossed.groupBy("id", "m")
        .agg(
            F.expr("min_by(cid, struct(d2, cid))").alias("cell"),
            F.expr("any_value(sv)").alias("sv"),
            F.expr("any_value(svv)").alias("svv"),
        )
    )


def _pq_update(assigned: DataFrame, d_sub: int) -> DataFrame:
    """Codeword update: per (m, cell, pos) integer-nano mean (exact,
    fold-order-free), re-packed into arrays per (m, cell)."""
    per_dim = (
        assigned.select("m", "cell", F.posexplode("sv").alias("pos", "val"))
        .groupBy("m", "cell", "pos")
        .agg(
            (
                F.sum(F.round(F.col("val") * 1e9).cast("long")).cast("double")
                / F.count(F.lit(1))
                / 1e9
            ).alias("avg_val")
        )
    )
    packed = per_dim.groupBy("m", "cell").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(pos, avg_val))), s -> s.avg_val)"
        ).alias("cv")
    )
    return packed.selectExpr(
        "m", "cell AS cid", "cv", f"{dot_sql('cv', 'cv')} AS cc"
    )


def _pq_encode(vecs: DataFrame, books: DataFrame, m: int, d_sub: int,
               v_col: str = "v") -> DataFrame:
    """Map-only PQ encoding (r15, guide §2.4 — remove shuffles outright):
    append a ``codes`` column (array<int>, one codeword id per subspace)
    to ``vecs`` rows by arg-minning each subvector against a broadcast
    1-row codebook array — the same broadcast-array trick as ivf_topk's
    query-side assignment.

    Replaces the ``_pq_assign(sub, books).groupBy("id")`` re-pack form,
    which shuffled the n·m exploded subvector rows TWICE (the (id, m)
    argmin aggregate, then the id-keyed collect_list) to compute what is
    a per-row function of (vector, codebooks).  At 100 TB that is two
    corpus-sized exchanges deleted; the codebooks are metadata
    (m·codebook rows) whatever the corpus.

    Numerics replicate ``_pq_assign`` bit-for-bit: the same slice
    expressions, dot_sql's cast-and-fold order, ``round((svv - 2·dot) +
    cc, 4)``, and the lowest-cid tie-break (the fold computes the
    lexicographic (d2, cid) minimum, exactly min_by's order).  The per-
    subspace ``svv`` is bound in a struct BEFORE the argmin fold so it is
    computed once per subspace, not once per codeword (the HOF-capture
    rule); ``sort_array`` orders cents by (m, cid) so scored lists stay
    cid-ascending.
    """
    books_arr = books.selectExpr(
        "named_struct('m', m, 'cid', cid, 'cv', cv, 'cc', cc) AS s"
    ).agg(F.expr("sort_array(collect_list(s)) AS cents"))
    subs0 = (
        f"transform(sequence(0, {m - 1}), j -> named_struct("
        f"'j', j, 'sv', slice({v_col}, j * {d_sub} + 1, {d_sub})))"
    )
    subs = (
        f"transform({subs0}, s -> named_struct("
        f"'j', s.j, 'sv', s.sv, 'svv', {dot_sql('s.sv', 's.sv')}))"
    )
    scored = (
        "transform(filter(cents, c -> c.m = s.j), c -> named_struct("
        f"'d', round((s.svv - 2 * {dot_sql('s.sv', 'c.cv')}) + c.cc, 4), "
        "'cid', c.cid))"
    )
    best = (
        f"aggregate({scored}, "
        "named_struct('d', cast('Infinity' as double), 'cid', 2147483647), "
        "(acc, x) -> IF(x.d < acc.d OR (x.d = acc.d AND x.cid < acc.cid), x, acc))"
    )
    return (
        vecs.crossJoin(F.broadcast(books_arr))
        .selectExpr("*", f"transform({subs}, s -> ({best}).cid) AS codes")
        .drop("cents")
    )


def _pq_luts(
    queries: DataFrame, vec_col: str, id_col: str,
    books: DataFrame, m: int, d_sub: int,
) -> DataFrame:
    """Per-query ADC lookup tables: join the query subvectors (Q*m rows)
    with the codebooks (m*codebook rows) on the subspace key, pack into
    lut[m][cid] nested arrays sorted by (m, cid).  Integer-nano partials
    (the ADC sum is then BIGINT-exact and fold-order-free — registry
    rule: never hash-compare a SUM(double) — so the relational oracle
    replay can SUM in any row order).  Returns (qid, qn, lut) — Q rows,
    broadcast-sized."""
    qsub = (
        queries.selectExpr(
            f"{id_col} AS qid",
            f"transform({vec_col}, x -> cast(x as double)) AS qv",
        )
        .selectExpr("qid", f"sqrt({dot_sql('qv', 'qv')}) AS qn",
                    f"explode(transform(sequence(0, {m - 1}),"
                    f" j -> struct(j AS m, slice(qv, j * {d_sub} + 1, {d_sub}) AS qsv))) AS s")
        .selectExpr("qid", "qn", "s.m AS m", "s.qsv AS qsv")
    )
    lut_rows = qsub.join(F.broadcast(books), "m").selectExpr(
        "qid", "qn", "m", "cid",
        f"CAST(ROUND(1e9 * ({dot_sql('qsv', 'cv')})) AS BIGINT) AS partial",
    )
    return (
        lut_rows.groupBy("qid", "m")
        .agg(
            F.expr("any_value(qn)").alias("qn"),
            F.expr(
                "transform(array_sort(collect_list(struct(cid, partial))), s -> s.partial)"
            ).alias("row"),
        )
        .groupBy("qid")
        .agg(
            F.expr("any_value(qn)").alias("qn"),
            F.expr(
                "transform(array_sort(collect_list(struct(m, row))), s -> s.row)"
            ).alias("lut"),
        )
    )


def pq_topk(
    corpus: DataFrame, queries: DataFrame, vec_col: str, id_col: str,
    k: int = 5, m: int = 4, codebook: int = 16, dim: int = 64, iters: int = 2,
) -> DataFrame:
    """PQ asymmetric-distance (ADC) top-k: encode the corpus as ``m``
    codeword ids + one exact norm per vector, score queries against codes
    through per-query lookup tables, rank on the 4-dp-rounded approximate
    cosine.

    The classic serving split (Jégou et al. 2011, public construction):
    - ENCODE (per corpus vector): nearest codeword per subspace — m small
      ids replace the full vector (here 4×4 bits vs 64 floats).
    - LUT (per query): dot(query-subvector, codeword) for every
      (subspace, codeword) — Q*m*codebook rows, metadata-sized.
    - ADC: approx_dot(q, x) = Σ_m lut[m][code_m(x)] — a map-only array
      lookup over the encoded corpus, no vector arithmetic per pair.

    approx_cos = approx_dot / (||q|| * ||x||) with the EXACT corpus norm
    kept from encoding (codes + 1 scalar per vector — the stored-norm ADC
    variant).  Everything is declarative: codebooks and LUTs are
    broadcast DataFrames, never driver-side state; the only per-corpus
    shuffles are the (id, m) argmin and the id-keyed code re-pack.
    """
    books = pq_codebooks(corpus, vec_col, id_col, m=m, codebook=codebook, dim=dim, iters=iters)
    d_sub = dim // m
    # map-only encode (r15): codes + the exact norm-square in ONE
    # projection over the corpus scan — the former _pq_assign/groupBy/
    # join-back form shuffled the exploded subvectors twice and re-joined
    # vv by id (see _pq_encode's docstring); dot_sql casts inside the
    # fold, so encoding straight off the float array is bit-identical to
    # the old cast-first pipeline.
    vecs = corpus.selectExpr(f"{id_col} AS id", f"{vec_col} AS v")
    codes = _pq_encode(vecs, books, m, d_sub).selectExpr(
        "id", "codes", f"{dot_sql('v', 'v')} AS vv"
    )
    luts = _pq_luts(queries, vec_col, id_col, books, m, d_sub)
    scored = codes.join(F.broadcast(luts), F.expr("qid <> id")).selectExpr(
        "qid AS query_id",
        "id AS neighbor_id",
        # element_at is 1-based (oracle replays the lookup as a relational
        # join, no arrays); index cast: cell ids are BIGINT, element_at
        # wants INT; the nano-int sum folds exactly in any order
        "round((cast(aggregate(zip_with(lut, codes,"
        " (l, c) -> element_at(l, cast(c + 1 AS int))),"
        " cast(0 as bigint), (acc, x) -> acc + x) AS double) / 1e9)"
        " / (qn * sqrt(vv)), 4) AS approx_cos",
    )
    return scored.selectExpr(
        "*",
        "row_number() OVER (PARTITION BY query_id"
        " ORDER BY approx_cos DESC, neighbor_id ASC) AS rank",
    ).where(f"rank <= {int(k)}")


def pq_topk_rerank(
    corpus: DataFrame, queries: DataFrame, vec_col: str, id_col: str,
    k: int = 5, shortlist: int = 50,
    m: int = 4, codebook: int = 16, dim: int = 64, iters: int = 2,
) -> DataFrame:
    """PQ serving pipeline with exact refinement: ADC retrieves a
    ``shortlist`` of candidates per query (compressed-domain scan), then
    ONLY those Q*shortlist pairs are re-scored with true vectors and
    re-ranked — the classic two-stage ANN serving shape (coarse
    candidate generation + exact re-rank over a bounded set).

    Scale shape: the exact stage touches Q*shortlist vectors regardless
    of corpus size — the candidate ids ride a broadcast semi-join into
    the corpus scan, so no second full-corpus pass of vector arithmetic.
    Output contract matches brute_force_topk: (query_id, neighbor_id,
    cosine, rank).
    """
    cand = pq_topk(
        corpus, queries, vec_col, id_col,
        k=shortlist, m=m, codebook=codebook, dim=dim, iters=iters,
    ).select("query_id", "neighbor_id")
    c = _prep(corpus, vec_col, id_col).alias("c")
    q = _prep(queries, vec_col, id_col).alias("q")
    exact = (
        c.join(F.broadcast(cand), F.col("c.id") == F.col("neighbor_id"))
        .join(F.broadcast(q), F.col("q.id") == F.col("query_id"))
        .selectExpr(
            "query_id",
            "neighbor_id",
            f"{_cos_sql('q.v', 'c.v', 'q.nrm', 'c.nrm')} AS cosine",
        )
    )
    return exact.selectExpr(
        "*",
        "row_number() OVER (PARTITION BY query_id"
        " ORDER BY cosine DESC, neighbor_id ASC) AS rank",
    ).where(f"rank <= {int(k)}")


def mmr_select(
    corpus: DataFrame, queries: DataFrame, vec_col: str, id_col: str,
    k: int = 5, pool: int = 10,
) -> DataFrame:
    """Maximal-marginal-relevance diversified selection (Carbonell &
    Goldstein 1998 construction, λ=0.5): from each query's exact top-
    ``pool`` cosine candidates, greedily pick ``k`` documents maximizing
    0.5·rel(d) − 0.5·max_{s∈S} sim(d, s).

    Two stages, both bounded:
    - CANDIDATES: brute-force top-``pool`` per query (corpus-scan bound,
      the same shape as brute_force_topk) + the pool×pool pairwise 4-dp
      cosines per query — pool²·Q rows total, metadata-sized.
    - GREEDY: applyInPandas per query group over those pairs — the
      sequential argmax loop runs on ≤ pool²ʳᵒʷˢ, never the corpus.

    Determinism: rel and sims are 4-dp-rounded before the greedy loop;
    λ=0.5 is dyadic so 0.5·x is IEEE-exact; ties break on (score DESC,
    doc_id ASC).  Output: (query_id, step 1..k, doc_id, mmr_score), where
    step 1's score is 0.5·rel (empty penalty set).
    """
    import pandas as pd

    cand = brute_force_topk(corpus, queries, vec_col, id_col, k=pool).select(
        "query_id", F.col("neighbor_id").alias("cid"), F.col("cosine").alias("rel")
    )
    cv = _prep(corpus, vec_col, id_col)
    enr = (
        cand.join(F.broadcast(cv.alias("c")), F.col("cid") == F.col("c.id"))
        .select("query_id", "cid", "rel", "c.v", "c.nrm")
    )
    x, y = enr.alias("x"), enr.alias("y")
    # LEFT join: a query whose candidate pool is a single document has no
    # pairs, but must still surface its step-1 pick — the lone candidate
    # arrives as one row with null ib/sim (review r5: the inner-join form
    # dropped such queries entirely while the oracle emitted them)
    pairs = (
        x.join(
            F.broadcast(y),
            (F.col("x.query_id") == F.col("y.query_id"))
            & (F.col("x.cid") != F.col("y.cid")),
            "left",
        )
        .selectExpr(
            "x.query_id AS query_id",
            "x.cid AS ia",
            "x.rel AS rel_a",
            "y.cid AS ib",
            f"{_cos_sql('x.v', 'y.v', 'x.nrm', 'y.nrm')} AS sim",
        )
    )
    kk = int(k)

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        rel = {}
        sim = {}
        for ia, rel_a, ib, s in zip(pdf["ia"], pdf["rel_a"], pdf["ib"], pdf["sim"]):
            rel[int(ia)] = float(rel_a)
            if ib is not None and not pd.isna(ib):
                sim[(int(ia), int(ib))] = float(s)
        selected: list[int] = []
        out = []
        for step in range(1, kk + 1):
            best = None
            for d in sorted(rel):
                if d in selected:
                    continue
                if selected:
                    score = 0.5 * rel[d] - 0.5 * max(sim[(d, s)] for s in selected)
                else:
                    score = 0.5 * rel[d]
                if best is None or score > best[0] or (score == best[0] and d < best[1]):
                    best = (score, d)
            if best is None:
                break
            selected.append(best[1])
            out.append((qid, step, best[1], best[0]))
        return pd.DataFrame(out, columns=["query_id", "step", "doc_id", "mmr_score"])

    return pairs.groupBy("query_id").applyInPandas(
        greedy, "query_id long, step int, doc_id long, mmr_score double"
    )


# --- Persisted IVF-PQ index (coarse cells + compressed-domain scan) --------


def ivfpq_build_index(
    corpus: DataFrame, vec_col: str, id_col: str, path: str,
    n_cells: int = 8, m: int = 4, codebook: int = 16, dim: int = 64, iters: int = 2,
) -> None:
    """Persist an IVF-PQ index (the classic FAISS-style serving layout,
    Jégou et al. 2011 construction): ``path/centroids`` (coarse Voronoi
    centroids), ``path/codebooks`` (PQ codebooks, m*codebook rows), and
    ``path/cells`` hive-partitioned BY CELL with columns (id, codes, nrm,
    v).

    The layout composes the two pruning axes a billion-vector serving
    index needs: the PARTITION key prunes whole cells (probe nprobe of
    n_cells directories), and parquet COLUMN pruning makes the ADC pass
    read only (id, codes, nrm) — m small ints + a scalar instead of the
    dim-float vector (~64x less I/O at dim=64/m=4); the full vectors sit
    in the same rows but are only read by the refine stage's
    shortlist-bounded second scan.
    """
    c = _prep(corpus, vec_col, id_col)
    cent_rows = sorted(
        c.where(f"id < {int(n_cells)}").select("id", "v", "nrm").collect(),
        key=lambda r: r.id,
    )
    if not cent_rows:
        raise ValueError("empty corpus: nothing to index")
    spark = c.sparkSession
    # position-labeled centroids — see ivf_build_index's note
    spark.createDataFrame(
        [(pos, list(r.v), r.nrm) for pos, r in enumerate(cent_rows)],
        "id long, v array<float>, nrm double",
    ).write.mode("overwrite").parquet(f"{path}/centroids")
    books = pq_codebooks(
        corpus, vec_col, id_col, m=m, codebook=codebook, dim=dim, iters=iters
    )
    books.write.mode("overwrite").parquet(f"{path}/codebooks")
    d_sub = dim // m
    # map-only encode ON TOP of the GEMM cell assignment (r15): codes are
    # a per-row function of (v, saved books), so the former exploded
    # _pq_assign/groupBy pipeline AND its id-keyed join back onto the
    # GEMM output are all deleted — the cells write is one corpus pass.
    _pq_encode(
        _assign_cells_gemm(c, cent_rows),
        spark.read.parquet(f"{path}/codebooks"),
        m,
        d_sub,
    ).select(
        "id", "codes", "nrm", "v", "cell"
    ).write.mode("overwrite").partitionBy("cell").parquet(f"{path}/cells")


def ivfpq_query_index(
    spark, path: str, queries: DataFrame, vec_col: str, id_col: str,
    k: int = 5, nprobe: int = 2, shortlist: int = 50,
) -> DataFrame:
    """Query a persisted IVF-PQ index: probe nprobe cells per query
    (partition-pruned scan), ADC-score ONLY (id, codes, nrm) in the
    probed cells through broadcast per-query LUTs, shortlist by
    approximate cosine, then refine the Q*shortlist candidates exactly
    against the stored vectors.  Output contract matches
    brute_force_topk: (query_id, neighbor_id, cosine, rank)."""
    books = spark.read.parquet(f"{path}/codebooks")
    m, d_sub = _pq_params(books)  # saved books are the source of truth
    cents = spark.read.parquet(f"{path}/centroids")
    cent_arr = cents.selectExpr(
        "named_struct('cid', cast(id AS int), 'cv', v, 'cn', nrm) AS s"
    ).agg(F.expr("sort_array(collect_list(s)) AS cents"))
    q = _prep(queries, vec_col, id_col)
    scored_cells = (
        "transform(cents, s -> named_struct("
        f"'c', round(({dot_sql('v', 's.cv')}) / (nrm * s.cn), 4), 'cid', s.cid))"
    )
    cmp = "(x, y) -> CASE WHEN x.c > y.c THEN -1 WHEN x.c < y.c THEN 1 WHEN x.cid < y.cid THEN -1 ELSE 1 END"
    probes = (
        q.join(F.broadcast(cent_arr))
        .selectExpr(
            "id AS qid",
            f"explode(transform(slice(array_sort({scored_cells}, {cmp}), 1, {int(nprobe)}),"
            " s -> s.cid)) AS cell",
        )
    )
    luts = _pq_luts(queries, vec_col, id_col, books, m, d_sub)
    probe_lut = probes.join(luts, probes.qid == luts.qid).select(
        probes.qid, "cell", "qn", "lut"
    )
    probe_cells = sorted({r.cell for r in probes.select("cell").distinct().collect()})
    # ADC pass: column-pruned scan (no v column touched)
    adc_scan = (
        spark.read.parquet(f"{path}/cells")
        .where(F.col("cell").isin(probe_cells))
        .select("id", "codes", "nrm", "cell")
        .alias("c")
    )
    scored = adc_scan.join(
        F.broadcast(probe_lut.alias("p")),
        F.expr("p.cell = c.cell AND p.qid <> c.id"),
    ).selectExpr(
        "p.qid AS query_id",
        "c.id AS neighbor_id",
        "round((cast(aggregate(zip_with(lut, codes,"
        " (l, cd) -> element_at(l, cast(cd + 1 AS int))),"
        " cast(0 as bigint), (acc, x) -> acc + x) AS double) / 1e9)"
        " / (qn * nrm), 4) AS approx_cos",
    )
    cand = (
        scored.selectExpr(
            "*",
            "row_number() OVER (PARTITION BY query_id"
            " ORDER BY approx_cos DESC, neighbor_id ASC) AS r",
        )
        .where(f"r <= {int(shortlist)}")
        .select("query_id", "neighbor_id")
    )
    # refine: second scan, still partition-pruned, reads v only for the
    # broadcast-joined shortlist ids
    refine_scan = (
        spark.read.parquet(f"{path}/cells")
        .where(F.col("cell").isin(probe_cells))
        .select("id", "v", "nrm")
        .alias("n")
    )
    exact = (
        refine_scan.join(F.broadcast(cand), F.col("n.id") == F.col("neighbor_id"))
        .join(F.broadcast(q.alias("q")), F.col("q.id") == F.col("query_id"))
        .selectExpr(
            "query_id",
            "neighbor_id",
            f"{_cos_sql('q.v', 'n.v', 'q.nrm', 'n.nrm')} AS cosine",
        )
    )
    return exact.selectExpr(
        "*",
        "row_number() OVER (PARTITION BY query_id"
        " ORDER BY cosine DESC, neighbor_id ASC) AS rank",
    ).where(f"rank <= {int(k)}")


def ivfpq_append_batch(
    corpus_batch: DataFrame, vec_col: str, id_col: str, path: str,
    if_exists: str = "error",
) -> None:
    """Incrementally add a batch of vectors to a persisted IVF-PQ index
    WITHOUT retraining: the saved centroids and codebooks are the frozen
    quantizers (the production contract — retraining would re-key every
    existing cell), the new rows are assigned + encoded against them and
    appended to the hive cell partitions.

    Ids must be unique across the index (duplicates would surface twice
    in every shortlist).  The guard is enforced, not documented away
    (ADVICE r5): ``if_exists='error'`` (default) raises on any overlap
    with ids already in the index; ``'skip'`` anti-joins them out so a
    re-run of the same batch is idempotent.  The check reads ONLY the
    hive cell partitions the batch lands in (partition-pruned id scan),
    never the whole index — so its cost tracks the batch, not the
    corpus.

    Scale shape: identical to the build's encode pass but over the batch
    only — one broadcast of the frozen quantizers, no touch of existing
    index files (parquet append creates new files inside the matching
    cell directories)."""
    if if_exists not in ("error", "skip"):
        raise ValueError(f"if_exists must be 'error' or 'skip', got {if_exists!r}")
    spark = corpus_batch.sparkSession
    cent_rows = sorted(
        spark.read.parquet(f"{path}/centroids").collect(), key=lambda r: r.id
    )
    books = spark.read.parquet(f"{path}/codebooks")
    # (m, d_sub) come from the SAVED books — the frozen quantizers are the
    # source of truth; a caller-supplied mismatch would silently NULL
    # every ADC score (zip_with pads the shorter array)
    m, d_sub = _pq_params(books)
    c = _prep(corpus_batch, vec_col, id_col)
    # map-only encode against the frozen books (r15) — same deletion of
    # the exploded assign/groupBy/join-back as the build path
    rows = _pq_encode(_assign_cells_gemm(c, cent_rows), books, m, d_sub).select(
        "id", "codes", "nrm", "v", "cell"
    )
    # Overlap guard: prune the existing index to the batch's target cells
    # (metadata-sized centroid count, so the IN-list is bounded), then
    # broadcast-join on id.  Deterministic assignment means a duplicate id
    # lands in the SAME cell it already occupies — pruning loses nothing.
    target_cells = [r.cell for r in rows.select("cell").distinct().collect()]
    existing = (
        spark.read.parquet(f"{path}/cells")
        .where(F.col("cell").isin(target_cells))
        .select("id")
    )
    if if_exists == "error":
        # the incremental batch is the small side — broadcast ITS ids at
        # the pruned index scan, never the other way around
        dup = existing.join(F.broadcast(rows.select("id")), "id").first()
        if dup is not None:
            raise ValueError(
                f"ivfpq_append_batch: id {dup.id!r} already present in the "
                f"index at {path} (pass if_exists='skip' for idempotent re-runs)"
            )
    else:
        rows = rows.join(existing, "id", "left_anti")
    rows.write.mode("append").partitionBy("cell").parquet(f"{path}/cells")


def random_projection(
    df: DataFrame, vec_col: str, id_col: str,
    in_dim: int = 64, out_dim: int = 16, seed: int = 7,
) -> DataFrame:
    """Johnson–Lindenstrauss random projection: dense seeded Gaussian
    planes (the dense sibling of the LSH sign projection), output scaled
    by 1/sqrt(out_dim) so pairwise distances are preserved in
    expectation.  The plane matrix ships as expression literals —
    map-only, no shuffle, no driver state; the standard dimensionality
    reduction in front of clustering / ANN at corpus scale.
    Returns (id, proj: array<double>)."""
    import math

    planes = hyperplanes(in_dim, out_dim, seed)
    scale = 1.0 / math.sqrt(out_dim)
    dots = ", ".join(
        f"({_dot_plane_sql('v', p)}) * cast({scale!r} as double)" for p in planes
    )
    return df.selectExpr(
        f"{id_col} AS id",
        f"transform({vec_col}, x -> cast(x as double)) AS v",
    ).selectExpr("id", f"array({dots}) AS proj")
