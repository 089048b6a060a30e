"""Property-based tests (hypothesis) for the evaluation/statistics
operators: randomized inputs, mathematical invariants that hold for ANY
data — the bounds a formula regression would violate even when a
hand-picked example still passes."""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hypo_budget import hypo_examples

from valentinus_spark.operators import (
    gini_coefficient,
    krippendorff_alpha,
    mutual_information,
    rank_correlation,
    rouge_n_pairs,
)

SLOW = settings(
    max_examples=hypo_examples(12),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

words = st.lists(
    st.sampled_from(["a", "b", "c", "dog", "cat", "run"]), min_size=1, max_size=12
)


@SLOW
@given(wa=words, wb=words)
def test_rouge_bounds_and_symmetric_overlap(spark, wa, wb):
    df = spark.createDataFrame(
        [(1, " ".join(wa), " ".join(wb))], ["pid", "a", "b"]
    )
    r = rouge_n_pairs(df, "pid", "a", "b", n=1).collect()[0]
    # clipped overlap bounded by both totals
    assert 0 <= r.overlap <= min(r.n_a, r.n_b)
    assert r.n_a == len(wa) and r.n_b == len(wb)
    # ratios in [0, 1]
    assert 0.0 <= r.precision <= 1.0 and 0.0 <= r.recall <= 1.0
    # swapping sides transposes precision/recall, overlap invariant
    df2 = spark.createDataFrame(
        [(1, " ".join(wb), " ".join(wa))], ["pid", "a", "b"]
    )
    r2 = rouge_n_pairs(df2, "pid", "a", "b", n=1).collect()[0]
    assert r2.overlap == r.overlap
    assert r2.precision == r.recall and r2.recall == r.precision


@SLOW
@given(
    pairs=st.lists(
        st.tuples(st.sampled_from("xyz"), st.sampled_from("uvw")),
        min_size=2,
        max_size=40,
    )
)
def test_mi_bounds(spark, pairs):
    df = spark.createDataFrame(pairs, ["a", "b"])
    out = mutual_information(df, "a", "b").collect()[0]
    # 0 ≤ MI ≤ min(H_a, H_b) + rounding slack; H_ab ≤ H_a + H_b
    assert out.mi >= 0.0
    assert out.mi <= min(out.h_a, out.h_b) + 1e-5
    assert out.h_ab <= out.h_a + out.h_b + 1e-5
    if out.nmi is not None:
        assert -1e-6 <= out.nmi <= 1.0 + 1e-6


@SLOW
@given(
    ratings=st.lists(
        st.tuples(st.integers(0, 6), st.sampled_from("ABC")),
        min_size=4,
        max_size=40,
    )
)
def test_krippendorff_upper_bound(spark, ratings):
    df = spark.createDataFrame(ratings, ["item", "label"])
    out = krippendorff_alpha(df, "item", "label").collect()[0]
    if out.alpha is not None:
        # alpha ≤ 1 always; D_o and D_e are disagreement rates in [0, 1]
        assert out.alpha <= 1.0 + 1e-6
        assert 0.0 <= out.d_o <= 1.0 + 1e-6
        assert 0.0 <= out.d_e <= 1.0 + 1e-6


@SLOW
@given(
    vals=st.lists(st.integers(0, 100), min_size=1, max_size=30),
)
def test_gini_bounds(spark, vals):
    df = spark.createDataFrame([("g", v) for v in vals], ["g", "x"])
    out = gini_coefficient(df, "g", "x").collect()[0]
    if out.gini is not None:
        # Gini ∈ [0, 1); equal values → 0
        assert -1e-6 <= out.gini < 1.0
        if len(set(vals)) == 1:
            assert out.gini == pytest.approx(0.0)


@SLOW
@given(
    scores=st.lists(
        st.tuples(
            st.integers(0, 20),
            st.floats(0, 10, allow_nan=False),
            st.floats(0, 10, allow_nan=False),
        ),
        min_size=3,
        max_size=25,
        unique_by=lambda t: t[0],
    )
)
def test_rank_correlation_bounds_and_self(spark, scores):
    df = spark.createDataFrame(scores, ["item", "sa", "sb"]).withColumn(
        "g", __import__("pyspark.sql.functions", fromlist=["lit"]).lit("g")
    )
    out = rank_correlation(df, "g", "sa", "sb").collect()[0]
    if out.spearman_rho is not None:
        assert -1.0 - 1e-6 <= out.spearman_rho <= 1.0 + 1e-6
    if out.kendall_tau is not None:
        assert -1.0 - 1e-6 <= out.kendall_tau <= 1.0 + 1e-6
    # self-correlation is exactly 1 when sa varies
    self_out = rank_correlation(df, "g", "sa", "sa").collect()[0]
    if self_out.spearman_rho is not None:
        assert self_out.spearman_rho == pytest.approx(1.0)
        assert self_out.kendall_tau == pytest.approx(1.0)
