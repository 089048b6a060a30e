"""Skyline (Pareto frontier) operator tests: the window plan must agree
with brute-force dominance on hand fixtures, including ties."""

import pytest

from valentinus_spark.operators import skyline_2d


def _brute_skyline(points):
    """O(n^2) dominance reference: keep p unless some q dominates it."""
    out = []
    for p in points:
        dominated = any(
            q[0] <= p[0] and q[1] >= p[1] and q != p for q in points
        )
        if not dominated:
            out.append(p)
    return sorted(set(out), key=lambda t: (-t[1], t[0]))


def test_skyline_matches_brute_force(spark):
    pts = [
        (5.0, 10), (4.0, 8), (6.0, 12), (3.0, 5), (7.0, 12),
        (2.0, 3), (4.5, 9), (3.5, 8), (10.0, 15), (9.0, 15),
    ]
    df = spark.createDataFrame(pts, ["price", "size"])
    got = [
        (r.price, r.size)
        for r in skyline_2d(df, "price", "size").collect()
    ]
    want = [(p, s) for (p, s) in _brute_skyline(pts)]
    assert got == want


def test_skyline_equal_points_not_dominating(spark):
    """Two identical points: neither dominates; both collapse to one
    frontier (max,min) pair; a strictly worse point drops."""
    pts = [(5.0, 10), (5.0, 10), (6.0, 10)]
    df = spark.createDataFrame(pts, ["price", "size"])
    got = [(r.price, r.size) for r in skyline_2d(df, "price", "size").collect()]
    assert got == [(5.0, 10)]


def test_skyline_keep_cols_retains_tied_ids(spark):
    """keep_cols joins back ALL rows at a surviving (max,min) point."""
    pts = [(1, 5.0, 10), (2, 5.0, 10), (3, 9.0, 10), (4, 4.0, 7)]
    df = spark.createDataFrame(pts, ["id", "price", "size"])
    got = [
        (r.id, r.price, r.size)
        for r in skyline_2d(df, "price", "size", keep_cols=["id"]).collect()
    ]
    assert got == [(1, 5.0, 10), (2, 5.0, 10), (4, 4.0, 7)]


def test_skyline_monotone_chain_all_kept(spark):
    """A strictly improving chain (bigger size always costs more) is
    entirely on the frontier."""
    pts = [(float(i), i) for i in range(1, 8)]
    df = spark.createDataFrame(pts, ["price", "size"])
    assert skyline_2d(df, "price", "size").count() == 7
