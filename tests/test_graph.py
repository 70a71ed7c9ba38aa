"""connected_components (operators/graph.py): hash-min label propagation.

Ground truth is hand-computed on small graphs; the corpus-level oracle
(dedup_components vs DuckDB's recursive CTE) covers the real-data path.
"""

import pytest

from steampipe_sqlite_spark.operators.graph import connected_components


def _cc(spark, edges, nodes=None, **kw):
    e = spark.createDataFrame(edges, ["src", "dst"])
    n = spark.createDataFrame([(x,) for x in nodes], ["node"]) if nodes else None
    rows = connected_components(e, nodes=n, **kw).collect()
    return {r["node"]: r["component"] for r in rows}


def test_two_components_min_label(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_chain_converges_past_one_hop(spark):
    # a path graph needs multiple propagation rounds (diameter > 1)
    got = _cc(spark, [(5, 4), (4, 3), (3, 2), (2, 1)])
    assert set(got.values()) == {1}


def test_isolated_nodes_are_singletons(spark):
    got = _cc(spark, [(1, 2)], nodes=[1, 2, 7, 9])
    assert got == {1: 1, 2: 1, 7: 7, 9: 9}


def test_nonconvergence_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc(spark, [(5, 4), (4, 3), (3, 2), (2, 1)], max_iters=1)


def test_pagerank_nano_mass_and_determinism(spark):
    """Integer PageRank invariants: total mass never exceeds 1e9 (integer
    division only leaks downward), every rank is positive, two runs are
    bit-identical, and a sink-free cycle keeps symmetric ranks equal."""
    from steampipe_sqlite_spark.operators.graph import pagerank_nano

    # 4-cycle: perfectly symmetric -> all ranks equal at every iteration
    nodes = spark.createDataFrame([(i,) for i in range(4)], ["node"])
    edges = spark.createDataFrame(
        [(i, (i + 1) % 4) for i in range(4)], ["src", "dst"]
    )
    r1 = {r.node: r.rank_nano for r in pagerank_nano(edges, nodes, iters=3).collect()}
    r2 = {r.node: r.rank_nano for r in pagerank_nano(edges, nodes, iters=3).collect()}
    assert r1 == r2
    assert len(set(r1.values())) == 1
    assert all(v > 0 for v in r1.values())
    assert sum(r1.values()) <= 1_000_000_000

    # star with a dangling center: mass leaks, spokes keep base rank
    nodes = spark.createDataFrame([(i,) for i in range(5)], ["node"])
    edges = spark.createDataFrame([(i, 0) for i in range(1, 5)], ["src", "dst"])
    r = {x.node: x.rank_nano for x in pagerank_nano(edges, nodes, iters=2).collect()}
    assert r[0] > r[1] and len({r[i] for i in range(1, 5)}) == 1
    assert sum(r.values()) <= 1_000_000_000


def test_bfs_distances_shortest_and_bounded(spark):
    """Hand-built graph with a shorter and a longer path to the same node:
    BFS must record the SHORTER distance, stop at max_depth, and never
    relabel a visited node."""
    from steampipe_sqlite_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (0, 4), (4, 3), (3, 5), (5, 6)],
        "src long, dst long",
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r.node: r.dist for r in bfs_distances(edges, seeds, max_depth=3).collect()}
    assert got == {0: 0, 1: 1, 4: 1, 2: 2, 3: 2, 5: 3}
    # node 6 is 4 hops away — beyond max_depth, absent
    assert 6 not in got


def test_triangle_count_known_graph(spark):
    """K4 has exactly 4 triangles; adding a pendant edge and a duplicate/
    reversed edge must change nothing (canonicalization + distinct)."""
    from steampipe_sqlite_spark.operators.graph import triangle_count

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges = k4 + [(3, 4), (1, 0), (2, 1)]  # pendant + reversed duplicates
    df = spark.createDataFrame(edges, "src long, dst long")
    row = triangle_count(df).first()
    assert (row.n_nodes_in_edges, row.n_edges, row.n_triangles) == (5, 7, 4)


def test_triangle_count_no_triangles(spark):
    """A path graph has zero triangles (and the count row still emits)."""
    from steampipe_sqlite_spark.operators.graph import triangle_count

    df = spark.createDataFrame([(i, i + 1) for i in range(10)], "src long, dst long")
    row = triangle_count(df).first()
    assert row.n_triangles == 0 and row.n_edges == 10
