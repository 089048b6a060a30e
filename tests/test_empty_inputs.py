"""Empty-input crash screen: every operator here must survive a 0-row
frame without an ANSI divide-by-zero or a NULL-typed aggregate crash —
the degenerate-input class the property layer kept finding one operator
at a time (zipf_profile, mann_whitney_u, check_expectations,
fleiss_kappa, ks_test, wasserstein_1d …). This test pins the WHOLE
class: a new operator that divides by an empty-aggregate count fails
here before any fixture ever exercises it."""

import pytest
from pyspark.sql import functions as F

import valentinus_spark.operators as O
from valentinus_spark.operators import (
    dedup,
    evaluation,
    experiment,
    profile,
    quality,
    rollup,
    sketches,
    text_search,
    validate,
)


@pytest.fixture(scope="module")
def frames(spark):
    return {
        "docs": spark.createDataFrame([], "doc_id long, text string"),
        "sdocs": spark.createDataFrame(
            [], "doc_id long, text string, source string"
        ),
        "ev": spark.createDataFrame(
            [],
            "ts timestamp, value double, user_id string, "
            "event_type string, event_id long",
        ),
        "nums": spark.createDataFrame([], "id long, v double, g string"),
        "vecs": spark.createDataFrame([], "vec_id long, embedding array<double>"),
        "scored": spark.createDataFrame([], "s double, y int, id long"),
        "xy": spark.createDataFrame([], "x int, y int"),
        "ab": spark.createDataFrame([], "arm int, y double, x double"),
        "dd": spark.createDataFrame([], "arm int, period int, v double"),
        "ranked": spark.createDataFrame([], "doc_id long, score double"),
        "judged": spark.createDataFrame([], "q string, id long, s double, r int"),
    }


CASES = {
    "lexical_diversity": lambda f: O.lexical_diversity(f["docs"], "doc_id"),
    "zipf_profile": lambda f: profile.zipf_profile(f["docs"]),
    "heaps_law": lambda f: O.heaps_law(f["docs"], "doc_id"),
    "term_burstiness": lambda f: O.term_burstiness(f["docs"]),
    "flesch_readability": lambda f: O.flesch_readability(f["docs"]),
    "fog_smog": lambda f: O.fog_smog_readability(f["docs"]),
    "mann_kendall": lambda f: O.mann_kendall_trend(f["ev"]),
    "seasonal_mk": lambda f: O.seasonal_mann_kendall(f["ev"]),
    "acf_profile": lambda f: O.acf_profile(f["ev"]),
    "ljung_box": lambda f: rollup.ljung_box(f["ev"]),
    "cusum": lambda f: O.cusum_changepoint(f["ev"]),
    "ewma": lambda f: O.ewma_chart(f["ev"]),
    "holt_linear": lambda f: O.holt_linear_forecast(f["ev"]),
    "holt_winters": lambda f: O.holt_winters_forecast(f["ev"]),
    "seasonal_decompose": lambda f: O.seasonal_decompose(f["ev"]),
    "msprt": lambda f: experiment.msprt_test(f["ev"], "ts", "value", "value"),
    "mann_whitney": lambda f: experiment.mann_whitney_u(
        f["nums"], "g", "v", "a", "b"
    ),
    "kmv_distinct": lambda f: sketches.kmv_distinct(f["nums"], "v"),
    "hll_distinct": lambda f: sketches.hll_distinct(f["nums"], "v"),
    "ams_f2": lambda f: sketches.ams_f2_estimate(f["nums"], "v"),
    "heavy_hitters": lambda f: sketches.heavy_hitters(f["nums"], "v"),
    "gini": lambda f: O.gini_coefficient(f["nums"], "g", "v"),
    "benford": lambda f: O.benford_profile(f["nums"], "v"),
    "exact_quantiles": lambda f: O.exact_quantiles(f["nums"], "v", [0.5]),
    "james_stein": lambda f: O.james_stein_means(f["nums"], "g", "v"),
    "correlation_matrix": lambda f: O.correlation_matrix(f["xy"], ["x", "y"]),
    "cuped": lambda f: experiment.cuped_adjust(f["ab"], "arm", "y", "x"),
    "did": lambda f: experiment.did_estimate(f["dd"], "arm", "period", "v"),
    "roc_auc": lambda f: O.roc_auc(f["scored"], "s", "y"),
    "tail_index": lambda f: profile.tail_index(f["nums"], "g", "v"),
    "decile_concentration": lambda f: profile.decile_concentration(
        f["nums"], "g", "v"
    ),
    "rrf_fuse": lambda f: text_search.rrf_fuse([f["ranked"]]),
    "bm25": lambda f: text_search.bm25_topk(f["docs"], ["cat"]),
    "ql": lambda f: text_search.ql_topk(f["docs"], ["cat"]),
    "bm25f": lambda f: text_search.bm25f_topk(f["docs"], ["cat"]),
    "tfidf_keywords": lambda f: text_search.tfidf_keywords(f["docs"]),
    "rake": lambda f: text_search.rake_keywords(f["docs"]),
    "texttiling": lambda f: text_search.texttiling_boundaries(f["docs"]),
    "exact_dedup": lambda f: dedup.exact_dedup(f["docs"], text_col="text"),
    "ngram_jaccard_pairs": lambda f: dedup.ngram_jaccard_pairs(
        f["docs"], max_df=None
    ),
    "simhash_pairs": lambda f: dedup.simhash_pairs(f["docs"]),
    "source_overlap": lambda f: dedup.source_overlap(
        f["docs"].withColumn("source", F.lit("a"))
    ),
    "ngram_novelty": lambda f: dedup.ngram_novelty(f["docs"]),
    "duplicated_span_stats": lambda f: dedup.duplicated_span_stats(f["docs"]),
    "remove_duplicated_spans": lambda f: dedup.remove_duplicated_spans(
        f["docs"]
    ),
    "k_anonymity": lambda f: validate.k_anonymity_stats(f["nums"], ["g"], 2),
    "l_diversity": lambda f: validate.l_diversity_stats(
        f["nums"], ["g"], "v", 2
    ),
    "t_closeness": lambda f: validate.t_closeness_stats(f["nums"], ["g"], "v"),
    "dp_group_counts": lambda f: validate.dp_group_counts(f["nums"], ["g"]),
    "dp_median": lambda f: validate.dp_median(f["nums"], "v"),
    "check_expectations": lambda f: validate.check_expectations(
        f["nums"], [("v_pos", F.col("v") > 0)]
    ),
    "sequence_gaps": lambda f: validate.sequence_gaps(f["nums"], "id"),
    "embedding_drift": lambda f: profile.embedding_drift(f["vecs"], f["vecs"]),
    "cronbach_alpha": lambda f: evaluation.cronbach_alpha(
        f["nums"], "id", "g", "v"
    ),
    "map_mrr": lambda f: evaluation.map_mrr(f["judged"], "q", "id", "s", "r"),
    "gain_lift": lambda f: evaluation.gain_lift_chart(
        f["scored"], "s", "y", "id"
    ),
    "brier_log_loss": lambda f: evaluation.brier_log_loss(
        f["scored"].select("s", "y"), "s", "y"
    ),
    "repetition_stats": lambda f: quality.repetition_stats(f["sdocs"]),
    "quality_filter": lambda f: quality.quality_filter(f["sdocs"]),
    "unigram_logprob": lambda f: quality.unigram_logprob(f["sdocs"]),
    "bigram_logprob": lambda f: quality.bigram_logprob(f["sdocs"]),
    "trigram_logprob": lambda f: quality.trigram_logprob(f["sdocs"]),
    "char_entropy": lambda f: quality.char_entropy(f["sdocs"]),
    "compression_ratio": lambda f: quality.compression_ratio(f["sdocs"]),
    "source_token_kl": lambda f: quality.source_token_kl(f["sdocs"]),
    "good_turing_vocab": lambda f: quality.good_turing_vocab(
        f["sdocs"], "source"
    ),
    "js_divergence": lambda f: quality.js_divergence(f["sdocs"], "source"),
    "fightin_words": lambda f: quality.fightin_words(f["sdocs"]),
    "source_tv_distance": lambda f: quality.source_tv_distance(
        f["sdocs"], "source"
    ),
    # r9 corpus panels
    "dedup_threshold_curve": lambda f: dedup.dedup_threshold_curve(
        f["docs"], max_df=None
    ),
    "boilerplate_line_stats": lambda f: O.boilerplate_line_stats(
        f["sdocs"], "source"
    ),
    "script_profile": lambda f: quality.script_profile(f["docs"]),
    "top_ngrams": lambda f: O.top_ngrams(
        f["sdocs"].withColumnRenamed("source", "lang"), "lang"
    ),
    "source_cross_entropy": lambda f: quality.source_cross_entropy(
        f["sdocs"], "source"
    ),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_operator_survives_empty_input(spark, frames, name):
    # collect() must not raise; row CONTENT on empty input is covered by
    # each operator's own property test
    CASES[name](frames).collect()


# ---------------------------------------------------------------------------
# single-row inputs: the (n-1) / (n^3-n) denominator class
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def one_row(spark):
    import datetime as dt

    return {
        "docs": spark.createDataFrame([(1, "cat")], "doc_id long, text string"),
        "ev": spark.createDataFrame(
            [(dt.datetime(2024, 1, 1), 1.0, "u", "click", 1)],
            "ts timestamp, value double, user_id string, "
            "event_type string, event_id long",
        ),
        "nums": spark.createDataFrame([(1, 2.0, "a")], "id long, v double, g string"),
        "vecs": spark.createDataFrame(
            [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
        ),
        "scored": spark.createDataFrame([(0.5, 1, 1)], "s double, y int, id long"),
        "xy": spark.createDataFrame([(1, 2)], "x int, y int"),
    }


ONE_ROW_CASES = {
    "kruskal_wallis": lambda f: experiment.kruskal_wallis(f["nums"], "g", "v"),
    "levene": lambda f: experiment.levene_test(f["nums"], "g", "v"),
    "mann_whitney": lambda f: experiment.mann_whitney_u(
        f["nums"], "g", "v", "a", "b"
    ),
    "mann_kendall": lambda f: O.mann_kendall_trend(f["ev"]),
    "seasonal_mk": lambda f: O.seasonal_mann_kendall(f["ev"]),
    "acf_profile": lambda f: O.acf_profile(f["ev"]),
    "ljung_box": lambda f: rollup.ljung_box(f["ev"]),
    "cusum": lambda f: O.cusum_changepoint(f["ev"]),
    "ewma": lambda f: O.ewma_chart(f["ev"]),
    "holt_linear": lambda f: O.holt_linear_forecast(f["ev"]),
    "holt_winters": lambda f: O.holt_winters_forecast(f["ev"]),
    "seasonal_decompose": lambda f: O.seasonal_decompose(f["ev"]),
    "zipf_profile": lambda f: profile.zipf_profile(f["docs"]),
    "heaps_law": lambda f: O.heaps_law(f["docs"], "doc_id"),
    "term_burstiness": lambda f: O.term_burstiness(f["docs"], min_df=1),
    "james_stein": lambda f: O.james_stein_means(f["nums"], "g", "v"),
    "correlation_matrix": lambda f: O.correlation_matrix(f["xy"], ["x", "y"]),
    "roc_auc": lambda f: O.roc_auc(f["scored"], "s", "y"),
    "tail_index": lambda f: profile.tail_index(f["nums"], "g", "v"),
    "t_closeness": lambda f: validate.t_closeness_stats(f["nums"], ["g"], "v"),
    "dp_median": lambda f: validate.dp_median(f["nums"], "v"),
    "embedding_drift": lambda f: profile.embedding_drift(f["vecs"], f["vecs"]),
    "cronbach_alpha": lambda f: evaluation.cronbach_alpha(
        f["nums"], "id", "g", "v"
    ),
    "gain_lift": lambda f: evaluation.gain_lift_chart(
        f["scored"], "s", "y", "id"
    ),
    "trailing_anomaly": lambda f: O.trailing_anomaly(f["ev"]),
    "texttiling": lambda f: text_search.texttiling_boundaries(f["docs"]),
    "ngram_jaccard": lambda f: dedup.ngram_jaccard_pairs(f["docs"], max_df=None),
    # r9 corpus panels: a single doc has no pairs, one source is a 1x1
    # CE matrix, one short text exercises every short-input fallback
    "dedup_threshold_curve": lambda f: dedup.dedup_threshold_curve(
        f["docs"], max_df=None
    ),
    "boilerplate_line_stats": lambda f: O.boilerplate_line_stats(
        f["docs"].withColumn("source", F.lit("s")), "source"
    ),
    "script_profile": lambda f: quality.script_profile(f["docs"]),
    "top_ngrams": lambda f: O.top_ngrams(
        f["docs"].withColumn("lang", F.lit("en")), "lang"
    ),
    "source_cross_entropy": lambda f: quality.source_cross_entropy(
        f["docs"].withColumn("source", F.lit("s")), "source"
    ),
}


@pytest.mark.parametrize("name", sorted(ONE_ROW_CASES))
def test_operator_survives_single_row(spark, one_row, name):
    ONE_ROW_CASES[name](one_row).collect()


# ---------------------------------------------------------------------------
# all-NULL value columns: rows present, every measured value missing
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def all_null(spark):
    import datetime as dt

    return {
        "docs": spark.createDataFrame(
            [(1, None), (2, None)], "doc_id long, text string"
        ),
        "ev": spark.createDataFrame(
            [
                (dt.datetime(2024, 1, 1), None, "u", "click", 1),
                (dt.datetime(2024, 1, 2), None, "u", "view", 2),
            ],
            "ts timestamp, value double, user_id string, "
            "event_type string, event_id long",
        ),
        "nums": spark.createDataFrame(
            [(1, None, "a"), (2, None, "b")], "id long, v double, g string"
        ),
    }


ALL_NULL_CASES = {
    "lexical_diversity": lambda f: O.lexical_diversity(f["docs"], "doc_id"),
    "zipf_profile": lambda f: profile.zipf_profile(f["docs"]),
    "flesch_readability": lambda f: O.flesch_readability(f["docs"]),
    "mann_kendall": lambda f: O.mann_kendall_trend(f["ev"]),
    "acf_profile": lambda f: O.acf_profile(f["ev"]),
    "cusum": lambda f: O.cusum_changepoint(f["ev"]),
    "ewma": lambda f: O.ewma_chart(f["ev"]),
    "holt_linear": lambda f: O.holt_linear_forecast(f["ev"]),
    "msprt": lambda f: experiment.msprt_test(f["ev"], "ts", "value", "value"),
    "mann_whitney": lambda f: experiment.mann_whitney_u(
        f["nums"], "g", "v", "a", "b"
    ),
    "kruskal_wallis": lambda f: experiment.kruskal_wallis(f["nums"], "g", "v"),
    "kmv_distinct": lambda f: sketches.kmv_distinct(f["nums"], "v"),
    "hll_distinct": lambda f: sketches.hll_distinct(f["nums"], "v"),
    "ams_f2": lambda f: sketches.ams_f2_estimate(f["nums"], "v"),
    "gini": lambda f: O.gini_coefficient(f["nums"], "g", "v"),
    "benford": lambda f: O.benford_profile(f["nums"], "v"),
    "exact_quantiles": lambda f: O.exact_quantiles(f["nums"], "v", [0.5]),
    "james_stein": lambda f: O.james_stein_means(f["nums"], "g", "v"),
    "tail_index": lambda f: profile.tail_index(f["nums"], "g", "v"),
    "decile_concentration": lambda f: profile.decile_concentration(
        f["nums"], "g", "v"
    ),
    "robust_zscore": lambda f: profile.robust_zscore(f["nums"], "v"),
    "winsorize": lambda f: profile.winsorize(f["nums"], "v"),
    "quantile_discretize": lambda f: profile.quantile_discretize(f["nums"], "v"),
    "t_closeness": lambda f: validate.t_closeness_stats(f["nums"], ["g"], "v"),
    "dp_median": lambda f: validate.dp_median(f["nums"], "v"),
    "exact_dedup": lambda f: dedup.exact_dedup(f["docs"], text_col="text"),
    "ngram_jaccard": lambda f: dedup.ngram_jaccard_pairs(f["docs"], max_df=None),
    "trailing_anomaly": lambda f: O.trailing_anomaly(f["ev"]),
    "decayed_popularity": lambda f: O.decayed_popularity(
        f["ev"], "user_id", "ts", "value"
    ),
}


@pytest.mark.parametrize("name", sorted(ALL_NULL_CASES))
def test_operator_survives_all_null_values(spark, all_null, name):
    ALL_NULL_CASES[name](all_null).collect()


# ---------------------------------------------------------------------------
# non-finite doubles: NaN / +-Infinity in the measured value column.
# Spark's total order puts NaN ABOVE +Infinity and groups NaN keys as
# equal — both unlike python — so rank/quantile/divide pipelines that
# are green on finite fixtures can crash or mis-branch here.
# ---------------------------------------------------------------------------

NAN, INF = float("nan"), float("inf")


@pytest.fixture(scope="module")
def nonfinite(spark):
    import datetime as dt

    d0 = dt.datetime(2024, 1, 1)
    return {
        "ev": spark.createDataFrame(
            [
                (d0 + dt.timedelta(days=i), v, "u%d" % (i % 3), "click", i)
                for i, v in enumerate(
                    [1.0, NAN, 2.0, INF, 3.0, -INF, 4.0, NAN, 5.0, 6.0]
                )
            ],
            "ts timestamp, value double, user_id string, "
            "event_type string, event_id long",
        ),
        "nums": spark.createDataFrame(
            [
                (i, v, g)
                for i, (v, g) in enumerate(
                    [
                        (1.0, "a"), (NAN, "a"), (INF, "a"), (2.0, "a"),
                        (3.0, "b"), (-INF, "b"), (NAN, "b"), (4.0, "b"),
                    ]
                )
            ],
            "id long, v double, g string",
        ),
        "ab": spark.createDataFrame(
            [
                (0, 1.0, 1.0), (0, NAN, 2.0), (0, INF, 0.5), (0, 2.0, 1.5),
                (1, 3.0, -INF), (1, NAN, 1.0), (1, -INF, NAN), (1, 4.0, 2.0),
            ],
            "arm int, y double, x double",
        ),
        "scored": spark.createDataFrame(
            [
                (0.9, 1, 1), (NAN, 0, 2), (0.2, 0, 3), (INF, 1, 4),
                (0.5, 1, 5), (-INF, 0, 6),
            ],
            "s double, y int, id long",
        ),
        "xy": spark.createDataFrame(
            [(1.0, 2.0), (NAN, 3.0), (INF, -INF), (4.0, NAN), (5.0, 6.0)],
            "x double, y double",
        ),
        "vecs": spark.createDataFrame(
            [(1, [1.0, NAN]), (2, [INF, 0.0]), (3, [0.5, -0.5])],
            "vec_id long, embedding array<double>",
        ),
    }


NONFINITE_CASES = {
    "mann_kendall": lambda f: O.mann_kendall_trend(f["ev"]),
    "seasonal_mk": lambda f: O.seasonal_mann_kendall(f["ev"]),
    "acf_profile": lambda f: O.acf_profile(f["ev"]),
    "ljung_box": lambda f: rollup.ljung_box(f["ev"]),
    "cusum": lambda f: O.cusum_changepoint(f["ev"]),
    "ewma": lambda f: O.ewma_chart(f["ev"]),
    "holt_linear": lambda f: O.holt_linear_forecast(f["ev"]),
    "holt_winters": lambda f: O.holt_winters_forecast(f["ev"]),
    "seasonal_decompose": lambda f: O.seasonal_decompose(f["ev"]),
    "trailing_anomaly": lambda f: O.trailing_anomaly(f["ev"]),
    "msprt": lambda f: experiment.msprt_test(f["ev"], "ts", "value", "value"),
    "mann_whitney": lambda f: experiment.mann_whitney_u(
        f["nums"], "g", "v", "a", "b"
    ),
    "kruskal_wallis": lambda f: experiment.kruskal_wallis(f["nums"], "g", "v"),
    "levene": lambda f: experiment.levene_test(f["nums"], "g", "v"),
    "welch": lambda f: experiment.welch_means_test(f["ab"], "arm", "y"),
    "cuped": lambda f: experiment.cuped_adjust(f["ab"], "arm", "y", "x"),
    "ks_test": lambda f: validate.ks_test(f["nums"], "g", "v", "a", "b"),
    "wasserstein": lambda f: validate.wasserstein_1d(f["nums"], "g", "v", "a", "b"),
    "psi_drift": lambda f: profile.psi_drift(f["nums"], f["nums"], "v"),
    "kmv_distinct": lambda f: sketches.kmv_distinct(f["nums"], "v"),
    "hll_distinct": lambda f: sketches.hll_distinct(f["nums"], "v"),
    "ams_f2": lambda f: sketches.ams_f2_estimate(f["nums"], "v"),
    "heavy_hitters": lambda f: sketches.heavy_hitters(f["nums"], "v"),
    "gini": lambda f: O.gini_coefficient(f["nums"], "g", "v"),
    "benford": lambda f: O.benford_profile(f["nums"], "v"),
    "exact_quantiles": lambda f: O.exact_quantiles(f["nums"], "v", [0.5]),
    "james_stein": lambda f: O.james_stein_means(f["nums"], "g", "v"),
    "correlation_matrix": lambda f: O.correlation_matrix(f["xy"], ["x", "y"]),
    "tail_index": lambda f: profile.tail_index(f["nums"], "g", "v"),
    "decile_concentration": lambda f: profile.decile_concentration(
        f["nums"], "g", "v"
    ),
    "robust_zscore": lambda f: profile.robust_zscore(f["nums"], "v"),
    "winsorize": lambda f: profile.winsorize(f["nums"], "v"),
    "quantile_discretize": lambda f: profile.quantile_discretize(f["nums"], "v"),
    "t_closeness": lambda f: validate.t_closeness_stats(f["nums"], ["g"], "v"),
    "dp_median": lambda f: validate.dp_median(f["nums"], "v"),
    "roc_auc": lambda f: O.roc_auc(f["scored"], "s", "y"),
    "gain_lift": lambda f: evaluation.gain_lift_chart(
        f["scored"], "s", "y", "id"
    ),
    "brier_log_loss": lambda f: evaluation.brier_log_loss(
        f["scored"].select("s", "y"), "s", "y"
    ),
    "embedding_drift": lambda f: profile.embedding_drift(f["vecs"], f["vecs"]),
    "decayed_popularity": lambda f: O.decayed_popularity(
        f["ev"], "user_id", "ts", "value"
    ),
}


@pytest.mark.parametrize("name", sorted(NONFINITE_CASES))
def test_operator_survives_nonfinite_values(spark, nonfinite, name):
    NONFINITE_CASES[name](nonfinite).collect()


# ---------------------------------------------------------------------------
# zero-variance inputs: every value identical (and every score tied).
# The (x - mean)/sd, MAD, pooled-variance, and quantile-cut denominators
# all collapse to 0 here — the class behind the zipf_profile and
# kruskal_wallis fixes, pinned for the whole family.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def constant(spark):
    import datetime as dt

    d0 = dt.datetime(2024, 1, 1)
    return {
        "ev": spark.createDataFrame(
            [
                (d0 + dt.timedelta(days=i), 3.0, "u%d" % (i % 2), "click", i)
                for i in range(8)
            ],
            "ts timestamp, value double, user_id string, "
            "event_type string, event_id long",
        ),
        "nums": spark.createDataFrame(
            [(i, 5.0, "ab"[i % 2]) for i in range(8)],
            "id long, v double, g string",
        ),
        "ab": spark.createDataFrame(
            [(i % 2, 2.0, 7.0) for i in range(8)],
            "arm int, y double, x double",
        ),
        "scored": spark.createDataFrame(
            [(0.5, i % 2, i) for i in range(6)], "s double, y int, id long"
        ),
        "succ": spark.createDataFrame(
            [(i % 2, 1) for i in range(8)], "arm int, y int"
        ),
        "xy": spark.createDataFrame(
            [(1.0, 2.0)] * 5, "x double, y double"
        ),
        "docs": spark.createDataFrame(
            [(i, "same words here") for i in range(4)], "doc_id long, text string"
        ),
    }


CONSTANT_CASES = {
    "mann_kendall": lambda f: O.mann_kendall_trend(f["ev"]),
    "acf_profile": lambda f: O.acf_profile(f["ev"]),
    "ljung_box": lambda f: rollup.ljung_box(f["ev"]),
    "cusum": lambda f: O.cusum_changepoint(f["ev"]),
    "ewma": lambda f: O.ewma_chart(f["ev"]),
    "holt_winters": lambda f: O.holt_winters_forecast(f["ev"]),
    "seasonal_decompose": lambda f: O.seasonal_decompose(f["ev"]),
    "trailing_anomaly": lambda f: O.trailing_anomaly(f["ev"]),
    "msprt": lambda f: experiment.msprt_test(f["ev"], "ts", "value", "value"),
    "mann_whitney": lambda f: experiment.mann_whitney_u(
        f["nums"], "g", "v", "a", "b"
    ),
    "kruskal_wallis": lambda f: experiment.kruskal_wallis(f["nums"], "g", "v"),
    "levene": lambda f: experiment.levene_test(f["nums"], "g", "v"),
    "welch": lambda f: experiment.welch_means_test(f["ab"], "arm", "y"),
    "cuped": lambda f: experiment.cuped_adjust(f["ab"], "arm", "y", "x"),
    "two_prop": lambda f: experiment.two_proportion_test(f["succ"], "arm", "y"),
    "ks_test": lambda f: validate.ks_test(f["nums"], "g", "v", "a", "b"),
    "wasserstein": lambda f: validate.wasserstein_1d(f["nums"], "g", "v", "a", "b"),
    "psi_drift": lambda f: profile.psi_drift(f["nums"], f["nums"], "v"),
    "gini": lambda f: O.gini_coefficient(f["nums"], "g", "v"),
    "benford": lambda f: O.benford_profile(f["nums"], "v"),
    "james_stein": lambda f: O.james_stein_means(f["nums"], "g", "v"),
    "correlation_matrix": lambda f: O.correlation_matrix(f["xy"], ["x", "y"]),
    "tail_index": lambda f: profile.tail_index(f["nums"], "g", "v"),
    "decile_concentration": lambda f: profile.decile_concentration(
        f["nums"], "g", "v"
    ),
    "robust_zscore": lambda f: profile.robust_zscore(f["nums"], "v"),
    "winsorize": lambda f: profile.winsorize(f["nums"], "v"),
    "quantile_discretize": lambda f: profile.quantile_discretize(f["nums"], "v"),
    "t_closeness": lambda f: validate.t_closeness_stats(f["nums"], ["g"], "v"),
    "dp_median": lambda f: validate.dp_median(f["nums"], "v"),
    "roc_auc": lambda f: O.roc_auc(f["scored"], "s", "y"),
    "gain_lift": lambda f: evaluation.gain_lift_chart(
        f["scored"], "s", "y", "id"
    ),
    "brier_log_loss": lambda f: evaluation.brier_log_loss(
        f["scored"].select("s", "y"), "s", "y"
    ),
    "zipf_profile": lambda f: profile.zipf_profile(f["docs"]),
    "lexical_diversity": lambda f: O.lexical_diversity(f["docs"], "doc_id"),
    "texttiling": lambda f: text_search.texttiling_boundaries(f["docs"]),
}


@pytest.mark.parametrize("name", sorted(CONSTANT_CASES))
def test_operator_survives_zero_variance(spark, constant, name):
    CONSTANT_CASES[name](constant).collect()


# ---------------------------------------------------------------------------
# simultaneous events: every event of a user at ONE instant. The
# strictly-after / tie-break / zero-duration seams of the funnel
# family (the class where attribution's same-instant double-credit
# bug lived, commit 2cd758c).
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def instant(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    us0 = 1_700_000_000_000_000
    rows = [
        ("u1", "view", 1, 1.0),
        ("u1", "click", 2, 2.0),
        ("u1", "purchase", 3, 5.0),
        ("u1", "view", 4, 1.0),
        ("u1", "purchase", 5, 3.0),
        ("u2", "view", 6, 2.0),
    ]
    return {
        "ts": spark.createDataFrame(
            [(u, t0, tp, i, v) for (u, tp, i, v) in rows],
            "user_id string, ts timestamp, event_type string, "
            "event_id long, value double",
        ),
        "us": spark.createDataFrame(
            [(u, us0, tp, i, v) for (u, tp, i, v) in rows],
            "user_id string, ts_us long, event_type string, "
            "event_id long, value double",
        ),
    }


def test_funnel_family_survives_same_instant(spark, instant):
    from valentinus_spark.operators import funnel

    ts, us = instant["ts"], instant["us"]
    # strictly-after chaining: a click at the SAME instant as the
    # first view must NOT advance the funnel
    fc = {r.step: r.n_users for r in funnel.funnel_counts(us, ["view", "click"]).collect()}
    assert fc["view"] == 2 and fc["click"] == 0
    funnel.cohort_retention(us).collect()
    # one gap-island per user regardless of gap size
    assert (
        funnel.debounce_events(us, ["user_id"], "ts_us", 1, order_cols=["event_id"]).count()
        == 2
    )
    funnel.markov_transitions(us).collect()
    funnel.attribution(ts).collect()
    # one-instant corpus: everyone's last event IS the corpus edge, so
    # all users are censored and the curve has no churn-event rows
    # (documented "one row per churn-event time")
    assert funnel.kaplan_meier(ts, churn_horizon_days=0).collect() == []
    funnel.session_paths(ts).collect()
    streaks = {r.user: r.longest_streak for r in funnel.activity_streaks(ts).collect()}
    assert set(streaks.values()) == {1}  # one-instant history = 1-day streak
    funnel.cohort_ltv(us).collect()
