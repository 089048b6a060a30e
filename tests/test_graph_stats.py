"""Hand-computed oracles for degree_assortativity (graph.py),
decayed_popularity (rollup.py), and rank_normalize (profile.py)."""

import datetime

import pytest

from valentinus_spark.operators import (
    decayed_popularity,
    degree_assortativity,
    rank_normalize,
)


def _sym(spark, und):
    rows = [(a, b) for a, b in und] + [(b, a) for a, b in und]
    return spark.createDataFrame(rows, ["src", "dst"])


def test_assortativity_star_is_minus_one(spark):
    # K_{1,3}: hub-leaf graphs are maximally disassortative
    out = degree_assortativity(
        _sym(spark, [(0, 1), (0, 2), (0, 3)])
    ).collect()[0]
    assert out.n_edges == 6
    assert out.r == pytest.approx(-1.0)


def test_assortativity_triangle_with_pendant(spark):
    # triangle a-b-c + pendant c-d; degrees a2 b2 c3 d1
    # hand fold: n=8 Σx=Σy=18 Σxy=38 Σxx=Σyy=44 → r = -20/28
    out = degree_assortativity(
        _sym(spark, [(1, 2), (2, 3), (3, 1), (3, 4)])
    ).collect()[0]
    assert out.r == pytest.approx(-20 / 28, abs=1e-6)


def test_assortativity_regular_graph_null(spark):
    # 4-cycle: every degree 2 → zero variance → undefined
    out = degree_assortativity(
        _sym(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    ).collect()[0]
    assert out.r is None


def test_decayed_popularity_hand_example(spark):
    d = datetime.datetime
    rows = [
        # key a: 10.0 today (w=1), 8.0 seven days old (w=0.5) → 14.0
        ("a", d(2024, 1, 15, 12, 0), 10.0),
        ("a", d(2024, 1, 8, 3, 0), 8.0),
        # key b: 4.0 fourteen days old (w=0.25) → 1.0
        ("b", d(2024, 1, 1, 23, 59), 4.0),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "value"])
    out = {
        r.k: r
        for r in decayed_popularity(
            df, "k", "ts", "value", half_life_days=7
        ).collect()
    }
    assert out["a"].n_events == 2 and out["a"].decayed_score == pytest.approx(14.0)
    assert out["b"].decayed_score == pytest.approx(1.0)


def test_decayed_popularity_count_mode_and_order(spark):
    d = datetime.datetime
    rows = [("a", d(2024, 1, 15)), ("a", d(2024, 1, 15)), ("b", d(2024, 1, 8))]
    df = spark.createDataFrame(rows, ["k", "ts"])
    out = decayed_popularity(df, "k", "ts", None, half_life_days=7).collect()
    # ordered by score desc: a=2.0 first, b=0.5 second
    assert [r.k for r in out] == ["a", "b"]
    assert out[0].decayed_score == pytest.approx(2.0)
    assert out[1].decayed_score == pytest.approx(0.5)


def test_rank_normalize_within_group(spark):
    df = spark.createDataFrame(
        [("s1", 10), ("s1", 20), ("s1", 30), ("s1", 40), ("s2", 999)],
        ["src", "score"],
    )
    out = rank_normalize(df, "src", "score")
    got = {(r.src, r.score): r.pct_rank for r in out.collect()}
    assert got[("s1", 10)] == 0.0
    assert got[("s1", 20)] == pytest.approx(1 / 3, abs=1e-6)
    assert got[("s1", 40)] == 1.0
    assert got[("s2", 999)] == 0.0  # single-row group


def test_rank_normalize_ties_share_min_rank(spark):
    df = spark.createDataFrame(
        [("g", 5), ("g", 5), ("g", 9)], ["src", "score"]
    )
    ranks = sorted(r.pct_rank for r in rank_normalize(df, "src", "score").collect())
    assert ranks == [0.0, 0.0, 1.0]


def test_clustering_coefficient_triangle_and_star(spark):
    from valentinus_spark.operators import clustering_coefficient

    # triangle: 1 triangle, 3 wedges → C = 1
    out = clustering_coefficient(
        _sym(spark, [(1, 2), (2, 3), (3, 1)])
    ).collect()[0]
    assert out.n_triangles == 1 and out.n_wedges == 3
    assert out.transitivity == pytest.approx(1.0)
    # star: 0 triangles, 3 wedges → C = 0
    out = clustering_coefficient(
        _sym(spark, [(0, 1), (0, 2), (0, 3)])
    ).collect()[0]
    assert out.n_triangles == 0 and out.transitivity == pytest.approx(0.0)


def test_clustering_coefficient_triangle_with_pendant(spark):
    from valentinus_spark.operators import clustering_coefficient

    # triangle a-b-c + pendant c-d: 1 triangle;
    # wedges: deg(2,2,3,1) → 1+1+3+0 = 5 → C = 3/5
    out = clustering_coefficient(
        _sym(spark, [(1, 2), (2, 3), (3, 1), (3, 4)])
    ).collect()[0]
    assert out.n_wedges == 5
    assert out.transitivity == pytest.approx(0.6)


def test_benford_uniform_digits(spark):
    from valentinus_spark.operators import benford_profile
    import math

    # values 1..9 once each → observed 1/9 per digit
    df = spark.createDataFrame([(float(d),) for d in range(1, 10)], ["v"])
    out = {r.digit: r for r in benford_profile(df, "v").collect()}
    assert len(out) == 9
    assert out[1].observed_frac == pytest.approx(1 / 9, abs=1e-6)
    assert out[1].expected_frac == pytest.approx(math.log10(2), abs=1e-6)
    # chi2 term: n·(o−e)²/e with n=9
    e = math.log10(2)
    assert out[1].chi2_term == pytest.approx(9 * (1 / 9 - e) ** 2 / e, abs=1e-4)


def test_benford_digit_extraction_and_filters(spark):
    from valentinus_spark.operators import benford_profile
    import math

    # 0.25 → 25 cents → digit 2; 999.99 → 99999 → 9; 0 and -5 dropped.
    # The digit spine keeps all nine rows: unseen digits carry n = 0
    # and still contribute their full chi² term N·p_d.
    df = spark.createDataFrame(
        [(0.25,), (999.99,), (0.0,), (-5.0,)], ["v"]
    )
    rows = {r.digit: r for r in benford_profile(df, "v").collect()}
    assert {d: r.n for d, r in rows.items()} == {
        1: 0, 2: 1, 3: 0, 4: 0, 5: 0, 6: 0, 7: 0, 8: 0, 9: 1
    }
    # zero-count digit's chi2 term is N·p_d, not silently dropped
    e1 = math.log10(2)
    assert rows[1].chi2_term == pytest.approx(2 * e1, abs=1e-4)
    assert rows[1].observed_frac == 0.0


def test_benford_empty_input_keeps_spine_with_null_stats(spark):
    from valentinus_spark.operators import benford_profile

    df = spark.createDataFrame([(0.0,), (-1.0,)], ["v"])
    rows = benford_profile(df, "v").collect()
    assert [r.digit for r in rows] == list(range(1, 10))
    assert all(r.n == 0 for r in rows)
    assert all(r.observed_frac is None and r.chi2_term is None for r in rows)


def test_gini_extremes_and_hand_value(spark):
    from valentinus_spark.operators import gini_coefficient

    rows = (
        [("eq", 5)] * 4
        + [("one", 0), ("one", 0), ("one", 0), ("one", 12)]
        + [("mix", 1), ("mix", 2), ("mix", 3), ("mix", 4)]
    )
    df = spark.createDataFrame(rows, ["g", "x"])
    out = {r.g: r for r in gini_coefficient(df, "g", "x").collect()}
    assert out["eq"].gini == pytest.approx(0.0)
    # all mass in one of 4 rows: G = (n−1)/n = 0.75
    assert out["one"].gini == pytest.approx(0.75)
    # sorted 1,2,3,4: G = (2·(1+4+9+16) − 5·10)/(4·10) = 10/40
    assert out["mix"].gini == pytest.approx(0.25)
    assert out["mix"].total == 10
