"""k-means + SemDeDup operator semantics (operators/clustering.py).

The corpus queries cover cross-engine hash equality; these tests check the
ALGORITHMIC properties on the fixture: partition structure, Lloyd
improvement, representative choice, and the prune contract.
"""

import pytest
from pyspark.sql import functions as F

from steampipe_sqlite_spark.operators.clustering import (
    _rep_vectors,
    kmeans_assign,
    semantic_dedup,
)
from steampipe_sqlite_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"
K = 8


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings").cache()


def test_every_vector_assigned_exactly_once(spark, emb):
    assigned = kmeans_assign(emb, "embedding", "vec_id", k=K, iters=2)
    n = emb.count()
    assert assigned.count() == n
    assert assigned.select("id").distinct().count() == n
    cells = [r.cell for r in assigned.select("cell").distinct().collect()]
    assert 1 <= len(cells) <= K and all(0 <= c < K for c in cells)


def test_lloyd_iteration_does_not_increase_cost(spark, emb):
    """Total within-cluster squared distance is non-increasing across
    rounds — the defining property of Lloyd's algorithm (up to the 4-dp
    distance rounding both engines share)."""
    cost1 = (
        kmeans_assign(emb, "embedding", "vec_id", k=K, iters=1)
        .agg(F.sum("d2")).first()[0]
    )
    cost2 = (
        kmeans_assign(emb, "embedding", "vec_id", k=K, iters=2)
        .agg(F.sum("d2")).first()[0]
    )
    assert cost2 <= cost1 + 1e-4 * K


def test_representative_is_closest_to_centroid(spark, emb):
    """Every cluster's representative must have the minimal (d2, id) among
    its members."""
    assigned = kmeans_assign(emb, "embedding", "vec_id", k=K, iters=2)
    kept = semantic_dedup(emb, "embedding", "vec_id", k=K, iters=2, tau=2.0)
    # tau=2.0 > max cosine → nothing pruned: one rep per cluster, all kept
    assert kept.count() == assigned.count()
    reps = {(r.cluster, r.vec_id) for r in kept.filter("is_rep").collect()}
    best = {
        (r.cell, r.best_id)
        for r in assigned.groupBy("cell")
        .agg(F.expr("min_by(id, struct(d2, id))").alias("best_id"))
        .collect()
    }
    assert reps == best


def test_broadcast_side_is_k_rows_not_corpus(spark, emb):
    """Scale guard (r3 verdict #3): the relation semantic_dedup broadcasts
    (_rep_vectors) must be the k representatives, NOT the n-vector corpus —
    a full-corpus broadcast OOMs every executor at 100 TB.  n >> k on the
    fixture, so the broken form (all n rows) fails this hard."""
    assigned = kmeans_assign(emb, "embedding", "vec_id", k=K, iters=2)
    reps = (
        assigned.groupBy("cell")
        .agg(F.min(F.struct("d2", "id")).alias("m"))
        .select(F.col("cell").alias("rcell"), F.col("m.id").alias("rep_id"))
    )
    n_reps = reps.count()
    assert n_reps <= K < emb.count()
    assert _rep_vectors(assigned, reps).count() == n_reps
    # and the restriction itself is map-side: the k-row reps side is the
    # broadcast build, never the corpus
    plan = (
        _rep_vectors(assigned, reps)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_prune_contract(spark, emb):
    """Dropped rows are exactly the non-representatives with
    cos_to_rep ≥ τ; kept non-reps are all below τ."""
    tau = 0.30
    all_rows = semantic_dedup(emb, "embedding", "vec_id", k=K, iters=2, tau=2.0)
    kept = semantic_dedup(emb, "embedding", "vec_id", k=K, iters=2, tau=tau)
    n_over = all_rows.filter(~F.col("is_rep") & (F.col("cos_to_rep") >= tau)).count()
    assert kept.count() == all_rows.count() - n_over
    assert kept.filter(~F.col("is_rep") & (F.col("cos_to_rep") >= tau)).count() == 0
    assert kept.filter("is_rep").count() == all_rows.filter("is_rep").count()
