"""Connected-components tests (north-star extension: dedup groups).

The reference has no graph surface; these verify the iterative label
propagation against a driver-side union-find on the same edge lists.
"""

from __future__ import annotations

import random

import pytest

from tmdb_index_spark.operators.graph import (
    connected_components,
    dedup_group_representatives,
)


def _union_find(pairs):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _run(spark, pairs):
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    out = connected_components(df)
    return {r.node: r.component for r in out.collect()}


def test_chain_collapses_to_min(spark):
    # Path graph 0-1-2-...-9: one component labelled 0.  Exercises the
    # pointer-jump (plain neighbor-min would need ~9 rounds; the cap in
    # connected_components would still pass, but this is the case where
    # jumping matters).
    got = _run(spark, [(i, i + 1) for i in range(9)])
    assert got == {i: 0 for i in range(10)}


def test_disjoint_components_and_self_loops(spark):
    pairs = [(1, 2), (2, 3), (10, 11), (20, 20), (30, 31), (31, 30)]
    got = _run(spark, pairs)
    # 20's only edge is a self-loop, dropped by the a != b filter, so it
    # vanishes from the node set entirely (matches oracle semantics:
    # nodes exist only via non-self edges).
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 30: 30, 31: 30}


def test_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    pairs = [
        (rng.randrange(200), rng.randrange(200)) for _ in range(150)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    assert _run(spark, pairs) == _union_find(pairs)


def test_empty_pairs(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(df).count() == 0


def test_group_representatives_drop_list(spark):
    df = spark.createDataFrame([(5, 9), (9, 7), (1, 2)], "id_a long, id_b long")
    out = dedup_group_representatives(df)
    got = {r.drop_id: r.keep_id for r in out.collect()}
    assert got == {9: 5, 7: 5, 2: 1}


def test_pagerank_fixed_point_hand_computed(spark):
    from tmdb_index_spark.operators.graph import pagerank_fixed_point

    # star: 1 -> {2, 3}, both point back at 1
    e = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 1), (3, 1)], "src long, dst long"
    )
    got = {
        r["node"]: r["rank_ppm"]
        for r in pagerank_fixed_point(e, iterations=2).collect()
    }
    # r1: hub = 150000 + 850000*2e6 div 1e6 = 1_850_000; leaves 575_000
    # r2: hub = 150000 + 850000*(2*(575000 div 1)) div 1e6 = 1_127_500
    #     leaves = 150000 + 850000*(1_850_000 div 2) div 1e6 = 936_250
    assert got == {1: 1_127_500, 2: 936_250, 3: 936_250}


def test_pagerank_symmetric_cycle_stable(spark):
    from tmdb_index_spark.operators.graph import pagerank_fixed_point

    e = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    got = {
        r["node"]: r["rank_ppm"]
        for r in pagerank_fixed_point(e, iterations=3).collect()
    }
    # unit rank is a fixed point of the symmetric 2-cycle
    assert got == {1: 1_000_000, 2: 1_000_000}


def test_pagerank_deterministic_under_partitioning(spark):
    from tmdb_index_spark.operators.graph import pagerank_fixed_point

    e = spark.createDataFrame(
        [(i, (i * 7) % 23) for i in range(100)], "src long, dst long"
    )
    a = sorted(map(tuple, pagerank_fixed_point(e, iterations=2).collect()))
    b = sorted(
        map(
            tuple,
            pagerank_fixed_point(e.repartition(17), iterations=2).collect(),
        )
    )
    assert a == b


def test_pagerank_rejects_bad_iterations(spark):
    import pytest

    from tmdb_index_spark.operators.graph import pagerank_fixed_point

    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank_fixed_point(e, iterations=0)


# ---------------------------------------------------------------------------
# triangle_count
# ---------------------------------------------------------------------------

from tmdb_index_spark.operators.graph import triangle_count  # noqa: E402


def _tri(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return triangle_count(df).collect()[0]


def test_triangle_count_known_graph(spark):
    # Two triangles sharing edge (1,2), plus a pendant vertex.
    r = _tri(
        spark,
        [(1, 2), (2, 3), (1, 3), (2, 4), (1, 4), (4, 5)],
    )
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (5, 6, 2)


def test_triangle_count_canonicalizes_input(spark):
    # Duplicates, reversed orientation, and self-loops must not
    # change the count.
    r = _tri(
        spark,
        [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (2, 2), (1, 2)],
    )
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (3, 3, 1)


def test_triangle_count_matches_brute_force_random(spark):
    from itertools import combinations

    rng = random.Random(7)
    nodes = list(range(12))
    edges = [
        (a, b) for a, b in combinations(nodes, 2) if rng.random() < 0.4
    ]
    eset = {frozenset(e) for e in edges}
    expected = sum(
        1
        for a, b, c in combinations(nodes, 3)
        if {frozenset((a, b)), frozenset((b, c)), frozenset((a, c))} <= eset
    )
    r = _tri(spark, edges)
    assert r.n_triangles == expected
    assert r.n_edges == len(eset)


def test_triangle_count_no_cartesian_in_plan(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "src long, dst long")
    plan = triangle_count(df)._jdf.queryExecution().executedPlan().toString()
    # The 1-row count aggregates combine via broadcast nested loop by
    # design; the EDGE joins must all be hash equi-joins.
    import re

    for frag in re.findall(r"(?:SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|BroadcastNestedLoopJoin) [^\n]*", plan):
        if "BroadcastNestedLoopJoin" in frag:
            continue  # scalar-count combine only
    wedge_joins = plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin") + plan.count("ShuffledHashJoin")
    assert wedge_joins >= 4  # degree x2, wedge, closing
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------- bfs


def _edges(spark, pairs):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(pairs, "src long, dst long")
    # symmetric: tests use undirected graphs
    return df.union(df.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def test_bfs_chain_levels(spark):
    from tmdb_index_spark.operators.graph import bfs_levels

    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    src = spark.createDataFrame([(1,)], "node long")
    out = {r["node"]: r["hop"] for r in bfs_levels(e, src, max_hops=3).collect()}
    assert out == {1: 0, 2: 1, 3: 2, 4: 3}  # 5 beyond max_hops: absent


def test_bfs_min_hop_wins_on_multiple_paths(spark):
    from tmdb_index_spark.operators.graph import bfs_levels

    # 1-2-3 and direct 1-3: node 3 is hop 1, not 2
    e = _edges(spark, [(1, 2), (2, 3), (1, 3)])
    src = spark.createDataFrame([(1,)], "node long")
    out = {r["node"]: r["hop"] for r in bfs_levels(e, src, max_hops=3).collect()}
    assert out == {1: 0, 2: 1, 3: 1}


def test_bfs_multi_source_and_unreachable(spark):
    from tmdb_index_spark.operators.graph import bfs_levels

    e = _edges(spark, [(1, 2), (10, 11)])
    src = spark.createDataFrame([(1,), (10,)], "node long")
    out = {r["node"]: r["hop"] for r in bfs_levels(e, src, max_hops=2).collect()}
    assert out == {1: 0, 2: 1, 10: 0, 11: 1}
    # disconnected node 99 never appears
    assert 99 not in out


def test_bfs_source_never_demoted_by_cycle(spark):
    from tmdb_index_spark.operators.graph import bfs_levels

    # cycle back into the source: hop stays 0
    e = _edges(spark, [(1, 2), (2, 1)])
    src = spark.createDataFrame([(1,)], "node long")
    out = {r["node"]: r["hop"] for r in bfs_levels(e, src, max_hops=4).collect()}
    assert out[1] == 0


def test_bfs_zero_hops_is_sources_only(spark):
    from tmdb_index_spark.operators.graph import bfs_levels

    e = _edges(spark, [(1, 2)])
    src = spark.createDataFrame([(1,), (1,)], "node long")  # dup source
    out = bfs_levels(e, src, max_hops=0).collect()
    assert [(r["node"], r["hop"]) for r in out] == [(1, 0)]


def test_bfs_rejects_negative_hops(spark):
    import pytest
    from tmdb_index_spark.operators.graph import bfs_levels

    e = _edges(spark, [(1, 2)])
    src = spark.createDataFrame([(1,)], "node long")
    with pytest.raises(ValueError):
        bfs_levels(e, src, max_hops=-1)


# ---------------------------------------------------------------- k-core


def test_kcore_cascading_peel(spark):
    from tmdb_index_spark.operators.graph import k_core
    from tmdb_index_spark.operators.materialize import release_pins

    # triangle 1-2-3 plus a tail 3-4-5: tail nodes have degree <= 2,
    # and removing 5 then 4 must not break the triangle (2-core)
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    out = {r["node"]: r["degree"] for r in k_core(e, k=2).collect()}
    assert out == {1: 2, 2: 2, 3: 2}
    release_pins()


def test_kcore_pinned_rounds_match_convergence(spark):
    from tmdb_index_spark.operators.graph import k_core
    from tmdb_index_spark.operators.materialize import release_pins

    # chain of length 6: 1-core peeling of k=2 eats one end per wave
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 7)], "src long, dst long"
    )
    conv = sorted(map(tuple, k_core(e, k=2).collect()))
    pinned = sorted(map(tuple, k_core(e, k=2, rounds=6).collect()))
    assert conv == pinned == []  # a path has no 2-core
    release_pins()


def test_kcore_whole_graph_survives_when_dense(spark):
    from tmdb_index_spark.operators.graph import k_core
    from tmdb_index_spark.operators.materialize import release_pins

    # K4: every node has degree 3 -> 3-core is the whole graph
    nodes = [1, 2, 3, 4]
    e = spark.createDataFrame(
        [(a, b) for a in nodes for b in nodes if a < b], "src long, dst long"
    )
    out = {r["node"]: r["degree"] for r in k_core(e, k=3).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}
    release_pins()


def test_kcore_validation(spark):
    import pytest
    from tmdb_index_spark.operators.graph import k_core

    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        k_core(e, k=0)
    with pytest.raises(ValueError):
        k_core(e, k=2, rounds=-1)


# ---------------------------------------------------------------- sssp


def test_sssp_cheaper_longer_path_wins(spark):
    from tmdb_index_spark.operators.graph import sssp_bounded
    from tmdb_index_spark.operators.materialize import release_pins

    # 1->3 direct costs 10; 1->2->3 costs 2+3=5: BFS would say hop 1,
    # SSSP must pick the longer-but-cheaper path
    e = spark.createDataFrame(
        [(1, 3, 10), (1, 2, 2), (2, 3, 3)], "src long, dst long, weight long"
    )
    src = spark.createDataFrame([(1,)], "node long")
    out = {r["node"]: r["dist"] for r in sssp_bounded(e, src, max_hops=3).collect()}
    assert out == {1: 0, 2: 2, 3: 5}
    release_pins()


def test_sssp_hop_bound_limits_relaxation(spark):
    from tmdb_index_spark.operators.graph import sssp_bounded
    from tmdb_index_spark.operators.materialize import release_pins

    e = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1), (3, 4, 1)], "src long, dst long, weight long"
    )
    src = spark.createDataFrame([(1,)], "node long")
    out = {r["node"]: r["dist"] for r in sssp_bounded(e, src, max_hops=2).collect()}
    assert out == {1: 0, 2: 1, 3: 2}  # node 4 needs 3 hops: absent


def test_sssp_multi_source_min_and_source_zero(spark):
    from tmdb_index_spark.operators.graph import sssp_bounded
    from tmdb_index_spark.operators.materialize import release_pins

    e = spark.createDataFrame(
        [(1, 5, 9), (2, 5, 4)], "src long, dst long, weight long"
    )
    src = spark.createDataFrame([(1,), (2,)], "node long")
    out = {r["node"]: r["dist"] for r in sssp_bounded(e, src, max_hops=1).collect()}
    assert out == {1: 0, 2: 0, 5: 4}
    release_pins()


def test_sssp_validation(spark):
    import pytest
    from tmdb_index_spark.operators.graph import sssp_bounded

    e = spark.createDataFrame([(1, 2, 1)], "src long, dst long, weight long")
    src = spark.createDataFrame([(1,)], "node long")
    with pytest.raises(ValueError):
        sssp_bounded(e, src, max_hops=-1)
