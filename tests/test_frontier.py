"""Pareto-frontier (skyline) operator tests.

No reference counterpart; covers the dominance semantics (including
ties and duplicate points), equivalence to the brute-force dominance
definition, and the no-global-funnel plan shape.
"""

from __future__ import annotations

import itertools
import random

import pytest

from tmdb_index_spark.operators.frontier import frontier_2d


def _brute_frontier(points):
    """O(N²) reference implementation straight from the definition."""
    pairs = sorted(set(points))
    out = []
    for p in pairs:
        dominated = any(
            q[0] <= p[0] and q[1] <= p[1] and q != p for q in pairs
        )
        if not dominated:
            out.append(p)
    return sorted(out)


def _run(spark, points, buckets=None):
    df = spark.createDataFrame(points, "x double, y long")
    got = frontier_2d(df, "x", "y", buckets=buckets).collect()
    return sorted((r["x"], r["y"]) for r in got), {
        (r["x"], r["y"]): r["n_rows"] for r in got
    }


def test_frontier_basic_staircase(spark):
    # (1,5) (2,3) (4,1) form the staircase; (3,4) and (5,5) dominated
    pts = [(1.0, 5), (2.0, 3), (4.0, 1), (3.0, 4), (5.0, 5)]
    got, _ = _run(spark, pts)
    assert got == [(1.0, 5), (2.0, 3), (4.0, 1)]


def test_frontier_equal_x_keeps_only_min_y(spark):
    pts = [(1.0, 5), (1.0, 3), (2.0, 4)]
    got, _ = _run(spark, pts)
    assert got == [(1.0, 3)]


def test_frontier_equal_y_keeps_only_min_x(spark):
    pts = [(1.0, 3), (2.0, 3), (3.0, 1)]
    got, _ = _run(spark, pts)
    assert got == [(1.0, 3), (3.0, 1)]


def test_frontier_duplicate_points_counted_not_dominated(spark):
    # exact duplicates dominate nothing and nothing dominates them:
    # one frontier row with multiplicity
    pts = [(1.0, 1), (1.0, 1), (1.0, 1)]
    got, counts = _run(spark, pts)
    assert got == [(1.0, 1)]
    assert counts[(1.0, 1)] == 3


def test_frontier_matches_bruteforce_random(spark):
    rng = random.Random(7)
    pts = [
        (float(rng.randint(0, 20)), rng.randint(0, 20)) for _ in range(300)
    ]
    got, counts = _run(spark, pts, buckets=4)
    assert got == _brute_frontier(pts)
    # multiplicities reconcile against the raw multiset
    for (x, y), n in counts.items():
        assert n == sum(1 for p in pts if p == (x, y))


def test_frontier_bucket_count_does_not_change_result(spark):
    rng = random.Random(11)
    pts = [
        (float(rng.randint(0, 50)), rng.randint(0, 50)) for _ in range(200)
    ]
    for b in (1, 2, 7, 32):
        got, _ = _run(spark, pts, buckets=b)
        assert got == _brute_frontier(pts), f"buckets={b}"


def test_frontier_single_point_and_constant_x(spark):
    got, _ = _run(spark, [(3.0, 3)])
    assert got == [(3.0, 3)]
    # all x equal: frontier is the min-y point(s) only — and the
    # min/max scaling must survive hi == lo without dividing by zero
    got, _ = _run(spark, [(2.0, 5), (2.0, 1), (2.0, 3)])
    assert got == [(2.0, 1)]


def test_frontier_no_global_funnel_plan(spark):
    # The data path must stay hash-partitioned on the bucket; global
    # sorts (rangepartitioning) or a data-scale SinglePartition window
    # would be the O(N) funnel this operator exists to avoid.
    df = spark.createDataFrame(
        [(float(i % 17), i % 13) for i in range(500)], "x double, y long"
    )
    plan = (
        frontier_2d(df, "x", "y")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "hashpartitioning(__bkt__" in plan
    assert "rangepartitioning" not in plan.lower()
