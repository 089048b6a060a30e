"""Hand-computed oracles for the statistical-testing operators
(validate.py: ks_test, chi_squared, wasserstein_1d)."""

import math

import pytest

from valentinus_spark.operators import chi_squared, ks_test, wasserstein_1d


def _two_groups(spark, a_vals, b_vals):
    rows = [("a", float(v)) for v in a_vals] + [("b", float(v)) for v in b_vals]
    return spark.createDataFrame(rows, ["g", "v"])


def test_ks_identical_distributions(spark):
    df = _two_groups(spark, [1, 2, 3, 4], [1, 2, 3, 4])
    out = ks_test(df, "g", "v", "a", "b").collect()[0]
    assert out.d_stat == pytest.approx(0.0)
    assert out.p_value == pytest.approx(1.0)


def test_ks_disjoint_supports(spark):
    # a < b entirely → D = 1
    df = _two_groups(spark, [1, 2], [10, 11])
    out = ks_test(df, "g", "v", "a", "b").collect()[0]
    assert out.d_stat == pytest.approx(1.0)
    assert out.n_a == 2 and out.n_b == 2
    # p = 2·exp(−2·1·(2·2/4)) = 2·exp(−2)
    assert out.p_value == pytest.approx(2 * math.exp(-2), abs=1e-6)


def test_ks_hand_computed_shift(spark):
    # a = {1,2,3}, b = {2,3,4}. ECDF diffs at x=1: 1/3−0; x=2: 2/3−1/3;
    # x=3: 1−2/3; x=4: 1−1 → D = 1/3
    df = _two_groups(spark, [1, 2, 3], [2, 3, 4])
    out = ks_test(df, "g", "v", "a", "b").collect()[0]
    assert out.d_stat == pytest.approx(1 / 3, abs=1e-6)


def test_chi_squared_hand_computed_2x2(spark):
    # observed [[10, 20], [20, 10]]: n=60, na=(30,30), nb=(30,30), e=15
    # χ² = 4·(5²/15) = 100/15 = 6.6667; dof=1; V = sqrt(χ²/60)
    rows = (
        [("x", "u")] * 10 + [("x", "v")] * 20 + [("y", "u")] * 20 + [("y", "v")] * 10
    )
    df = spark.createDataFrame(rows, ["a", "b"])
    out = chi_squared(df, "a", "b").collect()[0]
    assert out.n == 60 and out.dof == 1
    assert out.chi2 == pytest.approx(100 / 15, abs=1e-4)
    assert out.cramers_v == pytest.approx(math.sqrt(100 / 15 / 60), abs=1e-4)


def test_chi_squared_zero_cell_exact(spark):
    # observed [[2, 0], [0, 2]] — the algebraic zero-cell fold must give
    # the full-rectangle χ² = n = 4 (perfect association), V = 1
    rows = [("x", "u")] * 2 + [("y", "v")] * 2
    df = spark.createDataFrame(rows, ["a", "b"])
    out = chi_squared(df, "a", "b").collect()[0]
    assert out.chi2 == pytest.approx(4.0)
    assert out.cramers_v == pytest.approx(1.0)


def test_chi_squared_constant_column_null_v(spark):
    df = spark.createDataFrame([("k", "u"), ("k", "v")], ["a", "b"])
    out = chi_squared(df, "a", "b").collect()[0]
    assert out.dof == 0 and out.cramers_v is None
    assert out.chi2 == pytest.approx(0.0, abs=1e-9)


def test_wasserstein_point_masses(spark):
    # a = δ(0), b = δ(3) → W1 = 3
    df = _two_groups(spark, [0, 0], [3, 3])
    out = wasserstein_1d(df, "g", "v", "a", "b").collect()[0]
    assert out.w1 == pytest.approx(3.0)


def test_wasserstein_matches_python_replica(spark):
    a, b = [0, 1, 5, 6], [2, 2, 3, 9]
    df = _two_groups(spark, a, b)
    out = wasserstein_1d(df, "g", "v", "a", "b").collect()[0]
    # python replica over the merged distinct grid
    xs = sorted(set(a) | set(b))
    w1 = 0.0
    for x, nx in zip(xs, xs[1:]):
        fa = sum(1 for v in a if v <= x) / len(a)
        fb = sum(1 for v in b if v <= x) / len(b)
        w1 += abs(fa - fb) * (nx - x)
    assert out.w1 == pytest.approx(w1, abs=1e-6)


def test_wasserstein_identical_zero(spark):
    df = _two_groups(spark, [1, 2, 3], [1, 2, 3])
    out = wasserstein_1d(df, "g", "v", "a", "b").collect()[0]
    assert out.w1 == pytest.approx(0.0)
