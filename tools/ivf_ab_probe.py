"""Same-window interleaved A/B of knn_cosine_ivf's centroid-broadcast
construction (VERDICT r14 #1).

Arm A ("reagg", the r13 form — SHIPPED again since r15): the broadcast
1-row centroid array is re-aggregated from a second corpus scan
(`where(id<k) -> named_struct -> agg(sort_array(collect_list))`) —
BatchScan + 2 ObjectHashAggregates + Exchange per execution.

Arm B ("collected", the r14 form, since reverted): the k centroid rows
already collected for the corpus-side GEMM closure also feed a
driver-side `createDataFrame` — the subtree is a LocalTableScan.

The r14 before-plan pair was captured after the change landed (both dumps
identical — VERDICT r14 "What's wrong" #1), and the driver read 0.70x
with MAD ±2.8, so this probe answers it properly: both arms run
ALTERNATING in ONE session (shared noise window, per box-noise memory),
best-of-N with clearCache per run and the bench's toPandas
materialization.  Measured 2026-08-17 (pre-revert): reagg best 0.750 /
med 0.824±0.056 vs collected best 0.925 / med 1.010±0.051; per-pair
ratios 0.72-0.91 in all 7 pairs -> the r14 change was a real regression
and ivf_topk was reverted to the reagg form.  Plans written by
--plans-dir: before = the r14 collected form (rebuilt here), after = the
shipped form.

Usage: python tools/ivf_ab_probe.py [N_PAIRS] [--plans-dir plans/r15]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from steampipe_sqlite_spark.functions.vectors import dot_sql
from steampipe_sqlite_spark.operators import similarity as S
from steampipe_sqlite_spark.plans.registry import presentation_sort
from steampipe_sqlite_spark.session import get_spark
from steampipe_sqlite_spark.tables import load_table


def ivf_topk_collected(
    corpus: DataFrame, queries: DataFrame, vec_col: str, id_col: str,
    k: int = 5, n_cells: int = 16, nprobe: int = 3,
) -> DataFrame:
    """ivf_topk with the r14 centroid-array construction (verbatim from
    git 1834ec1, reverted in r15): cent_arr built by createDataFrame from
    the rows already collected for the GEMM closure."""
    from pyspark.sql import types as T

    c = S._prep(corpus, vec_col, id_col)
    q = S._prep(queries, vec_col, id_col)
    cent_rows0 = sorted(
        c.where(f"id < {int(n_cells)}").select("id", "v", "nrm").collect(),
        key=lambda r: r.id,
    )
    if cent_rows0:
        elem = T.StructType(
            [
                T.StructField("cid", T.IntegerType(), False),
                T.StructField("cv", c.schema["v"].dataType),
                T.StructField("cn", T.DoubleType()),
            ]
        )
        cent_arr = c.sparkSession.createDataFrame(
            [([(int(r.id), r.v, float(r.nrm)) for r in cent_rows0],)],
            T.StructType([T.StructField("cents", T.ArrayType(elem), False)]),
        )
    else:
        cent_arr = (
            c.where(f"id < {int(n_cells)}")
            .selectExpr("named_struct('cid', cast(id AS int), 'cv', v, 'cn', nrm) AS s")
            .agg(F.expr("sort_array(collect_list(s)) AS cents"))
        )
    scored_cells = (
        "transform(cents, (s, i) -> named_struct("
        f"'c', round(({dot_sql('v', 's.cv')}) / (nrm * s.cn), 4), 'cid', i))"
    )

    def assign(df: DataFrame, keep: int) -> DataFrame:
        crossed = df.crossJoin(F.broadcast(cent_arr))
        if keep == 1:
            best = (
                f"aggregate({scored_cells}, "
                "named_struct('c', cast(-9.0 as double), 'cid', 2147483647), "
                "(acc, x) -> IF(x.c > acc.c OR (x.c = acc.c AND x.cid < acc.cid), x, acc))"
            )
            return crossed.selectExpr("id", "v", "nrm", f"({best}).cid AS cell")
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

    cent_rows = sorted(
        c.where(f"id < {int(n_cells)}").select("id", "v", "nrm").collect(),
        key=lambda r: r.id,
    )
    corpus_cells = (
        assign(c, keep=1)
        if not cent_rows
        else S._assign_cells_gemm(c, cent_rows)
    ).alias("c")
    probes = assign(q, keep=nprobe).alias("q")
    scored = corpus_cells.join(
        F.broadcast(probes), F.expr("q.cell = c.cell AND q.id <> c.id")
    ).selectExpr(
        "q.id AS query_id",
        "c.id AS neighbor_id",
        f"{S._cos_sql('q.v', 'c.v', 'q.nrm', 'c.nrm')} AS cosine",
    )
    return scored.selectExpr(
        "*",
        "row_number() OVER (PARTITION BY query_id"
        " ORDER BY cosine DESC, neighbor_id ASC) AS rank",
    ).where(f"rank <= {int(k)}")


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 7
    plans_dir = None
    if "--plans-dir" in sys.argv:
        plans_dir = sys.argv[sys.argv.index("--plans-dir") + 1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ivf-ab")

    def build(arm: str) -> DataFrame:
        emb = load_table(spark, sf_dir, "embeddings")
        queries = emb.filter(F.col("vec_id") < 10)
        fn = S.ivf_topk if arm == "reagg" else ivf_topk_collected
        return presentation_sort(
            fn(emb, queries, "embedding", "vec_id", k=5, n_cells=16, nprobe=3),
            ["query_id", "rank"],
        )

    # result parity between the arms, then plans
    pa = build("reagg").toPandas()
    pb = build("collected").toPandas()
    assert pa.equals(pb), "arms disagree!"
    print(f"parity OK: {len(pa)} rows identical")
    if plans_dir:
        os.makedirs(plans_dir, exist_ok=True)
        for arm, tag in (("collected", "before"), ("reagg", "after")):
            with open(os.path.join(plans_dir, f"knn_cosine_ivf_{tag}.txt"), "w") as f:
                f.write(build(arm)._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted")))
        print(f"plans written to {plans_dir}")

    # untimed warm-up pair, then alternating timed pairs
    def timed(arm: str) -> float:
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"ivf-ab {arm}")
        t0 = time.perf_counter()
        build(arm).toPandas()
        return time.perf_counter() - t0

    timed("reagg"), timed("collected")
    a, b = [], []
    for i in range(n_pairs):
        a.append(timed("reagg"))
        b.append(timed("collected"))
        print(f"pair {i}: reagg {a[-1]:.3f}s  collected {b[-1]:.3f}s")
    from tools.focused_ab import med_mad

    am, amad = med_mad(a)
    bm, bmad = med_mad(b)
    print(
        f"reagg     (r13): best {min(a):.3f}  med {am:.3f} ± {amad:.3f}\n"
        f"collected (r14): best {min(b):.3f}  med {bm:.3f} ± {bmad:.3f}\n"
        f"per-pair ratio reagg/collected: "
        f"{[round(x / y, 2) for x, y in zip(a, b)]}"
    )


if __name__ == "__main__":
    main()
