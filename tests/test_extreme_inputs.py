"""Extreme-input crash screen: four more degenerate classes the fixed
fixtures never produce, pinned wholesale like test_empty_inputs.py.

1. HUGE: extreme-but-finite magnitudes — doubles near 1.8e308,
   subnormals, long ids at both ends of the int64 domain, timestamps at
   the calendar extremes, a 100k-char document. ANSI mode turns the
   quiet overflow of each of these (id subtraction past int64, double
   sums reaching +Inf, CAST(1e300 AS long)) into a crash; the benford
   CAST_OVERFLOW fix (918294f) was this class found one operator at a
   time.
2. NEGATIVE: every measured value < 0 — the log/sqrt/positivity seam
   (tail_index log-ratios, gini's mean denominator, benford's digit
   extraction, geometric-style folds).
3. ALLDUP: every document byte-identical — df == N collapses idf to
   log-of-one, every pair is a candidate pair, every cluster is one
   cluster. Dedup/search must survive, and exact_dedup must keep
   exactly one row.
4. ONEGROUP: a single distinct group where two-sample/k-sample tests
   expect two — the (k-1) divisor and empty-second-sample seam.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

import valentinus_spark.operators as O
from valentinus_spark.operators import (
    dedup,
    evaluation,
    experiment,
    profile,
    rollup,
    sketches,
    text_search,
    validate,
)

DMAX = 1.7976931348623157e308
SUBNORMAL = 5e-324
LMAX = 9223372036854775807


# ---------------------------------------------------------------------------
# 1. HUGE — extreme-but-finite magnitudes
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def huge(spark):
    d0 = dt.datetime(1, 1, 2)
    d9 = dt.datetime(9999, 12, 30)
    return {
        "nums": spark.createDataFrame(
            [
                (-LMAX - 1, DMAX, "a"),
                (-7, 1e300, "a"),
                (0, SUBNORMAL, "a"),
                (3, 4.2e13, "a"),
                (12, -1e300, "b"),
                (14, -7.7e12, "b"),
                (LMAX - 1, -DMAX, "b"),
                (LMAX, 9.3e18, "b"),
            ],
            "id long, v double, g string",
        ),
        "ev": spark.createDataFrame(
            [
                (d0, 1e300, "u0", "click", -LMAX - 1),
                (d0 + dt.timedelta(days=1), -1e300, "u0", "view", -1),
                # mid-range magnitudes: fit the (19,4) ingress grid but
                # overflow narrower derived pins like (18,9) day means
                (d0 + dt.timedelta(days=2), 4.2e13, "u0", "click", -2),
                (d0 + dt.timedelta(days=3), -7.7e12, "u0", "view", -3),
                (d9 - dt.timedelta(days=1), DMAX, "u1", "click", LMAX - 1),
                (d9, SUBNORMAL, "u1", "view", LMAX),
            ],
            "ts timestamp, value double, user_id string, "
            "event_type string, event_id long",
        ),
        "docs": spark.createDataFrame(
            [
                (1, ("lorem ipsum dolor sit amet " * 4000).strip()),
                (2, "x" * 100_000),
                (3, "tiny"),
            ],
            "doc_id long, text string",
        ),
        "xy": spark.createDataFrame(
            [(1e300, 1e300), (-1e300, 1e300), (1e300, -1e300), (2.0, 3.0)],
            "x double, y double",
        ),
        "scored": spark.createDataFrame(
            [(DMAX, 1, 1), (-DMAX, 0, 2), (1e300, 1, 3), (SUBNORMAL, 0, 4)],
            "s double, y int, id long",
        ),
        "ab": spark.createDataFrame(
            [
                (0, 1e300, 2.0), (0, -DMAX, 4.2e13), (0, 3.0, 1e300),
                (1, DMAX, -1e300), (1, -7.7e12, 5.0), (1, 6.0, 7.0),
            ],
            "arm int, y double, x double",
        ),
        "tree": spark.createDataFrame(
            [(2, 1), (3, 1), (4, 2)], "child long, parent long"
        ),
    }


HUGE_CASES = {
    "sequence_gaps": lambda f: validate.sequence_gaps(f["nums"], "id"),
    "exact_quantiles": lambda f: O.exact_quantiles(f["nums"], "v", [0.5]),
    "benford": lambda f: O.benford_profile(f["nums"], "v"),
    "gini": lambda f: O.gini_coefficient(f["nums"], "g", "v"),
    "james_stein": lambda f: O.james_stein_means(f["nums"], "g", "v"),
    "tail_index": lambda f: profile.tail_index(f["nums"], "g", "v"),
    "decile_concentration": lambda f: profile.decile_concentration(
        f["nums"], "g", "v"
    ),
    "robust_zscore": lambda f: profile.robust_zscore(f["nums"], "v"),
    "winsorize": lambda f: profile.winsorize(f["nums"], "v"),
    "quantile_discretize": lambda f: profile.quantile_discretize(f["nums"], "v"),
    "kmv_distinct": lambda f: sketches.kmv_distinct(f["nums"], "v"),
    "hll_distinct": lambda f: sketches.hll_distinct(f["nums"], "v"),
    "ams_f2": lambda f: sketches.ams_f2_estimate(f["nums"], "v"),
    "heavy_hitters": lambda f: sketches.heavy_hitters(f["nums"], "v"),
    "kruskal_wallis": lambda f: experiment.kruskal_wallis(f["nums"], "g", "v"),
    "levene": lambda f: experiment.levene_test(f["nums"], "g", "v"),
    "mann_whitney": lambda f: experiment.mann_whitney_u(
        f["nums"], "g", "v", "a", "b"
    ),
    "ks_test": lambda f: validate.ks_test(f["nums"], "g", "v", "a", "b"),
    "wasserstein": lambda f: validate.wasserstein_1d(
        f["nums"], "g", "v", "a", "b"
    ),
    "psi_drift": lambda f: profile.psi_drift(f["nums"], f["nums"], "v"),
    "t_closeness": lambda f: validate.t_closeness_stats(f["nums"], ["g"], "v"),
    "dp_median": lambda f: validate.dp_median(f["nums"], "v"),
    "correlation_matrix": lambda f: O.correlation_matrix(f["xy"], ["x", "y"]),
    "roc_auc": lambda f: O.roc_auc(f["scored"], "s", "y"),
    "gain_lift": lambda f: evaluation.gain_lift_chart(
        f["scored"], "s", "y", "id"
    ),
    "mann_kendall": lambda f: O.mann_kendall_trend(f["ev"]),
    "acf_profile": lambda f: O.acf_profile(f["ev"]),
    "cusum": lambda f: O.cusum_changepoint(f["ev"]),
    "ewma": lambda f: O.ewma_chart(f["ev"]),
    "holt_linear": lambda f: O.holt_linear_forecast(f["ev"]),
    "trailing_anomaly": lambda f: O.trailing_anomaly(f["ev"]),
    "decayed_popularity": lambda f: O.decayed_popularity(
        f["ev"], "user_id", "ts", "value"
    ),
    "msprt": lambda f: experiment.msprt_test(f["ev"], "ts", "value", "value"),
    "zipf_profile": lambda f: profile.zipf_profile(f["docs"]),
    "lexical_diversity": lambda f: O.lexical_diversity(f["docs"], "doc_id"),
    "heaps_law": lambda f: O.heaps_law(f["docs"], "doc_id"),
    "flesch_readability": lambda f: O.flesch_readability(f["docs"]),
    "texttiling": lambda f: text_search.texttiling_boundaries(f["docs"]),
    "bm25": lambda f: text_search.bm25_topk(f["docs"], ["lorem"]),
    "tfidf_keywords": lambda f: text_search.tfidf_keywords(f["docs"]),
    "exact_dedup": lambda f: dedup.exact_dedup(f["docs"], text_col="text"),
    "simhash_pairs": lambda f: dedup.simhash_pairs(f["docs"]),
    "welch": lambda f: experiment.welch_means_test(f["ab"], "arm", "y"),
    "cuped": lambda f: experiment.cuped_adjust(f["ab"], "arm", "y", "x"),
    "paired_t": lambda f: experiment.paired_t_test(f["ab"], "x", "y"),
    "wilcoxon": lambda f: experiment.wilcoxon_signed_rank(f["ab"], "x", "y"),
    "sign_test": lambda f: experiment.sign_test(f["ab"], "x", "y"),
    "cronbach": lambda f: evaluation.cronbach_alpha(f["nums"], "id", "g", "v"),
    "subtree_rollup": lambda f: __import__(
        "valentinus_spark.operators.hierarchy", fromlist=["subtree_rollup"]
    ).subtree_rollup(
        f["tree"],
        f["nums"].select(F.col("id").alias("node"), F.col("v").alias("value")),
    ),
}


@pytest.mark.parametrize("name", sorted(HUGE_CASES))
def test_operator_survives_extreme_magnitudes(spark, huge, name):
    HUGE_CASES[name](huge).collect()


# ---------------------------------------------------------------------------
# 2. NEGATIVE — every measured value below zero
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def negative(spark):
    d0 = dt.datetime(2024, 1, 1)
    return {
        "nums": spark.createDataFrame(
            [(i, -float(i + 1) * 1.5, "ab"[i % 2]) for i in range(8)],
            "id long, v double, g string",
        ),
        "ev": spark.createDataFrame(
            [
                (d0 + dt.timedelta(days=i), -2.0 - i, "u%d" % (i % 2), "click", i)
                for i in range(8)
            ],
            "ts timestamp, value double, user_id string, "
            "event_type string, event_id long",
        ),
        "scored": spark.createDataFrame(
            [(-0.5, 1, 1), (-0.9, 0, 2), (-0.1, 1, 3), (-0.7, 0, 4)],
            "s double, y int, id long",
        ),
        "ab": spark.createDataFrame(
            [(i % 2, -1.0 - i, -2.0 - i) for i in range(8)],
            "arm int, y double, x double",
        ),
    }


NEGATIVE_CASES = {
    "gini": lambda f: O.gini_coefficient(f["nums"], "g", "v"),
    "benford": lambda f: O.benford_profile(f["nums"], "v"),
    "tail_index": lambda f: profile.tail_index(f["nums"], "g", "v"),
    "decile_concentration": lambda f: profile.decile_concentration(
        f["nums"], "g", "v"
    ),
    "exact_quantiles": lambda f: O.exact_quantiles(f["nums"], "v", [0.25, 0.75]),
    "robust_zscore": lambda f: profile.robust_zscore(f["nums"], "v"),
    "winsorize": lambda f: profile.winsorize(f["nums"], "v"),
    "quantile_discretize": lambda f: profile.quantile_discretize(f["nums"], "v"),
    "james_stein": lambda f: O.james_stein_means(f["nums"], "g", "v"),
    "kmv_distinct": lambda f: sketches.kmv_distinct(f["nums"], "v"),
    "ams_f2": lambda f: sketches.ams_f2_estimate(f["nums"], "v"),
    "heavy_hitters": lambda f: sketches.heavy_hitters(f["nums"], "v"),
    "psi_drift": lambda f: profile.psi_drift(f["nums"], f["nums"], "v"),
    "t_closeness": lambda f: validate.t_closeness_stats(f["nums"], ["g"], "v"),
    "dp_median": lambda f: validate.dp_median(f["nums"], "v"),
    "ks_test": lambda f: validate.ks_test(f["nums"], "g", "v", "a", "b"),
    "wasserstein": lambda f: validate.wasserstein_1d(
        f["nums"], "g", "v", "a", "b"
    ),
    "kruskal_wallis": lambda f: experiment.kruskal_wallis(f["nums"], "g", "v"),
    "mann_whitney": lambda f: experiment.mann_whitney_u(
        f["nums"], "g", "v", "a", "b"
    ),
    "levene": lambda f: experiment.levene_test(f["nums"], "g", "v"),
    "welch": lambda f: experiment.welch_means_test(f["ab"], "arm", "y"),
    "cuped": lambda f: experiment.cuped_adjust(f["ab"], "arm", "y", "x"),
    "mann_kendall": lambda f: O.mann_kendall_trend(f["ev"]),
    "cusum": lambda f: O.cusum_changepoint(f["ev"]),
    "ewma": lambda f: O.ewma_chart(f["ev"]),
    "holt_linear": lambda f: O.holt_linear_forecast(f["ev"]),
    "holt_winters": lambda f: O.holt_winters_forecast(f["ev"]),
    "seasonal_decompose": lambda f: O.seasonal_decompose(f["ev"]),
    "trailing_anomaly": lambda f: O.trailing_anomaly(f["ev"]),
    "decayed_popularity": lambda f: O.decayed_popularity(
        f["ev"], "user_id", "ts", "value"
    ),
    "roc_auc": lambda f: O.roc_auc(f["scored"], "s", "y"),
    "gain_lift": lambda f: evaluation.gain_lift_chart(
        f["scored"], "s", "y", "id"
    ),
}


@pytest.mark.parametrize("name", sorted(NEGATIVE_CASES))
def test_operator_survives_all_negative_values(spark, negative, name):
    NEGATIVE_CASES[name](negative).collect()


# ---------------------------------------------------------------------------
# 3. ALLDUP — every document byte-identical (distinct ids)
# ---------------------------------------------------------------------------

DUP_TEXT = "the quick brown fox jumps over the lazy dog again and again"


@pytest.fixture(scope="module")
def alldup(spark):
    return {
        "docs": spark.createDataFrame(
            [(i, DUP_TEXT) for i in range(10)], "doc_id long, text string"
        ),
    }


ALLDUP_CASES = {
    "exact_dedup": lambda f: dedup.exact_dedup(f["docs"], text_col="text"),
    "ngram_jaccard": lambda f: dedup.ngram_jaccard_pairs(f["docs"], max_df=None),
    "simhash_pairs": lambda f: dedup.simhash_pairs(f["docs"]),
    "source_overlap": lambda f: dedup.source_overlap(
        f["docs"].withColumn("source", F.lit("a"))
    ),
    "ngram_novelty": lambda f: dedup.ngram_novelty(f["docs"]),
    "duplicated_span_stats": lambda f: dedup.duplicated_span_stats(f["docs"]),
    "remove_duplicated_spans": lambda f: dedup.remove_duplicated_spans(f["docs"]),
    "zipf_profile": lambda f: profile.zipf_profile(f["docs"]),
    "heaps_law": lambda f: O.heaps_law(f["docs"], "doc_id"),
    "lexical_diversity": lambda f: O.lexical_diversity(f["docs"], "doc_id"),
    "term_burstiness": lambda f: O.term_burstiness(f["docs"], min_df=1),
    "flesch_readability": lambda f: O.flesch_readability(f["docs"]),
    "bm25": lambda f: text_search.bm25_topk(f["docs"], ["quick"]),
    "ql": lambda f: text_search.ql_topk(f["docs"], ["quick"]),
    "bm25f": lambda f: text_search.bm25f_topk(f["docs"], ["quick"]),
    "tfidf_keywords": lambda f: text_search.tfidf_keywords(f["docs"]),
    "rake": lambda f: text_search.rake_keywords(f["docs"]),
    "texttiling": lambda f: text_search.texttiling_boundaries(f["docs"]),
}


@pytest.mark.parametrize("name", sorted(ALLDUP_CASES))
def test_operator_survives_all_duplicates(spark, alldup, name):
    ALLDUP_CASES[name](alldup).collect()


def test_exact_dedup_collapses_all_duplicates_to_one(spark, alldup):
    assert dedup.exact_dedup(alldup["docs"], text_col="text").count() == 1


def test_all_duplicates_pair_every_document(spark, alldup):
    # 10 byte-identical docs -> C(10,2) = 45 candidate pairs at
    # jaccard 1.0; a banding/bucketing bug that drops same-bucket
    # pairs shows up here as < 45
    pairs = dedup.ngram_jaccard_pairs(alldup["docs"], max_df=None).collect()
    assert len(pairs) == 45


# ---------------------------------------------------------------------------
# 4. ONEGROUP — a single distinct group where tests expect two samples
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def onegroup(spark):
    d0 = dt.datetime(2024, 1, 1)
    return {
        "nums": spark.createDataFrame(
            [(i, float(i) + 0.5, "a") for i in range(6)],
            "id long, v double, g string",
        ),
        "ab": spark.createDataFrame(
            [(0, float(i), float(i) * 2) for i in range(6)],
            "arm int, y double, x double",
        ),
        "succ": spark.createDataFrame([(0, i % 2) for i in range(6)], "arm int, y int"),
        "dd": spark.createDataFrame(
            [(0, 0, float(i)) for i in range(6)], "arm int, period int, v double"
        ),
        "ev": spark.createDataFrame(
            [
                (d0 + dt.timedelta(days=i), float(i), "u0", "click", i)
                for i in range(6)
            ],
            "ts timestamp, value double, user_id string, "
            "event_type string, event_id long",
        ),
    }


ONEGROUP_CASES = {
    "kruskal_wallis": lambda f: experiment.kruskal_wallis(f["nums"], "g", "v"),
    "levene": lambda f: experiment.levene_test(f["nums"], "g", "v"),
    "mann_whitney": lambda f: experiment.mann_whitney_u(
        f["nums"], "g", "v", "a", "b"
    ),
    "ks_test": lambda f: validate.ks_test(f["nums"], "g", "v", "a", "b"),
    "wasserstein": lambda f: validate.wasserstein_1d(
        f["nums"], "g", "v", "a", "b"
    ),
    "welch": lambda f: experiment.welch_means_test(f["ab"], "arm", "y"),
    "cuped": lambda f: experiment.cuped_adjust(f["ab"], "arm", "y", "x"),
    "two_prop": lambda f: experiment.two_proportion_test(f["succ"], "arm", "y"),
    "did": lambda f: experiment.did_estimate(f["dd"], "arm", "period", "v"),
    "james_stein": lambda f: O.james_stein_means(f["nums"], "g", "v"),
    "gini": lambda f: O.gini_coefficient(f["nums"], "g", "v"),
    "tail_index": lambda f: profile.tail_index(f["nums"], "g", "v"),
    "decile_concentration": lambda f: profile.decile_concentration(
        f["nums"], "g", "v"
    ),
    "t_closeness": lambda f: validate.t_closeness_stats(f["nums"], ["g"], "v"),
    "k_anonymity": lambda f: validate.k_anonymity_stats(f["nums"], ["g"], 2),
    "l_diversity": lambda f: validate.l_diversity_stats(f["nums"], ["g"], "v", 2),
    "seasonal_mk": lambda f: O.seasonal_mann_kendall(f["ev"]),
    "ljung_box": lambda f: rollup.ljung_box(f["ev"]),
}


@pytest.mark.parametrize("name", sorted(ONEGROUP_CASES))
def test_operator_survives_single_group(spark, onegroup, name):
    ONEGROUP_CASES[name](onegroup).collect()
