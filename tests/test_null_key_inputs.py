"""NULL-key and all-zero crash screens — two input classes the other
screens do not pin.

1. NULLKEY: the GROUPING/IDENTITY column is NULL on some rows while
   the measured values are fine. This is the mirror image of the
   all-NULL-value screen (test_empty_inputs.py): Spark groupBy keeps a
   NULL group, equi-joins DROP NULL keys, and window partitionBy lumps
   all NULLs together — so any operator that aggregates per group and
   joins the aggregate back to rows silently sheds its NULL-key rows,
   and per-entity sequence logic (funnel, sessionize, streaks) folds
   every anonymous row into one phantom entity. The screen requires
   survival, not a particular convention; conventions are asserted
   only where one answer is clearly right.
2. ZEROS: every measured value exactly 0.0. Distinct from the
   zero-variance screen (constant 5.0): a zero corpus collapses
   sum/mean DENOMINATORS to 0 and feeds log(0)/log10(0) seams
   (benford's digit extraction, tail_index log-ratios, gini's mean,
   share-of-total tiles) that a nonzero constant never touches.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

import valentinus_spark.operators as O
from valentinus_spark.operators import (
    dedup,
    evaluation,
    experiment,
    funnel,
    profile,
    quality,
    rollup,
    sketches,
    text_search,
    validate,
)


# ---------------------------------------------------------------------------
# 1. NULLKEY — grouping / identity columns NULL on some rows
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def nullkey(spark):
    d0 = dt.datetime(2024, 1, 1)
    return {
        # g NULL on half the rows; id NULL on one row
        "nums": spark.createDataFrame(
            [
                (1, 1.0, "a"),
                (None, 2.0, "a"),
                (3, 3.0, None),
                (4, 4.0, None),
                (5, 5.0, "b"),
                (6, 6.0, "b"),
            ],
            "id long, v double, g string",
        ),
        # user_id NULL on some events
        "ev": spark.createDataFrame(
            [
                (d0 + dt.timedelta(days=i), float(i + 1), u, t, i)
                for i, (u, t) in enumerate(
                    [
                        ("u1", "view"),
                        (None, "click"),
                        ("u1", "purchase"),
                        (None, "view"),
                        ("u2", "click"),
                        (None, "purchase"),
                    ]
                )
            ],
            "ts timestamp, value double, user_id string, "
            "event_type string, event_id long",
        ),
        # doc_id NULL on one document
        "docs": spark.createDataFrame(
            [
                (1, "the quick brown fox"),
                (None, "jumps over the lazy dog"),
                (3, "the quick brown fox"),
            ],
            "doc_id long, text string",
        ),
        # source NULL on some rows
        "sdocs": spark.createDataFrame(
            [
                (1, "alpha beta gamma", "web"),
                (2, "delta epsilon zeta", None),
                (3, "alpha beta gamma", "web"),
                (4, "eta theta iota", None),
            ],
            "doc_id long, text string, source string",
        ),
        "judged": spark.createDataFrame(
            [(None, 1, 0.9, 1), ("q1", 2, 0.5, 0), ("q1", 3, 0.7, 1)],
            "q string, id long, s double, r int",
        ),
    }


NULLKEY_CASES = {
    "gini": lambda f: O.gini_coefficient(f["nums"], "g", "v"),
    "tail_index": lambda f: profile.tail_index(f["nums"], "g", "v"),
    "james_stein": lambda f: O.james_stein_means(f["nums"], "g", "v"),
    "decile_concentration": lambda f: profile.decile_concentration(
        f["nums"], "g", "v"
    ),
    "kruskal_wallis": lambda f: experiment.kruskal_wallis(f["nums"], "g", "v"),
    "levene": lambda f: experiment.levene_test(f["nums"], "g", "v"),
    "mann_whitney": lambda f: experiment.mann_whitney_u(
        f["nums"], "g", "v", "a", "b"
    ),
    "ks_test": lambda f: validate.ks_test(f["nums"], "g", "v", "a", "b"),
    "wasserstein": lambda f: validate.wasserstein_1d(
        f["nums"], "g", "v", "a", "b"
    ),
    "k_anonymity": lambda f: validate.k_anonymity_stats(f["nums"], ["g"], 2),
    "l_diversity": lambda f: validate.l_diversity_stats(
        f["nums"], ["g"], "v", 2
    ),
    "t_closeness": lambda f: validate.t_closeness_stats(f["nums"], ["g"], "v"),
    "dp_group_counts": lambda f: validate.dp_group_counts(f["nums"], ["g"]),
    "sequence_gaps": lambda f: validate.sequence_gaps(f["nums"], "id"),
    "cronbach_alpha": lambda f: evaluation.cronbach_alpha(
        f["nums"], "id", "g", "v"
    ),
    "good_turing_vocab": lambda f: quality.good_turing_vocab(
        f["sdocs"], "source"
    ),
    "js_divergence": lambda f: quality.js_divergence(f["sdocs"], "source"),
    "source_tv_distance": lambda f: quality.source_tv_distance(
        f["sdocs"], "source"
    ),
    "fightin_words": lambda f: quality.fightin_words(f["sdocs"]),
    "repetition_stats": lambda f: quality.repetition_stats(f["sdocs"]),
    "source_overlap": lambda f: dedup.source_overlap(f["sdocs"]),
    "exact_dedup": lambda f: dedup.exact_dedup(f["docs"], text_col="text"),
    "ngram_jaccard": lambda f: dedup.ngram_jaccard_pairs(
        f["docs"], max_df=None
    ),
    "simhash_pairs": lambda f: dedup.simhash_pairs(f["docs"]),
    "lexical_diversity": lambda f: O.lexical_diversity(f["docs"], "doc_id"),
    "heaps_law": lambda f: O.heaps_law(f["docs"], "doc_id"),
    "bm25": lambda f: text_search.bm25_topk(f["docs"], ["quick"]),
    "tfidf_keywords": lambda f: text_search.tfidf_keywords(f["docs"]),
    "map_mrr": lambda f: evaluation.map_mrr(f["judged"], "q", "id", "s", "r"),
    "funnel_counts": lambda f: funnel.funnel_counts(
        f["ev"].withColumnRenamed("ts", "ts_t").withColumn(
            "ts_us", F.unix_micros("ts_t")
        ),
        ["view", "click"],
    ),
    "markov_transitions": lambda f: funnel.markov_transitions(
        f["ev"].withColumn("ts_us", F.unix_micros("ts"))
    ),
    "attribution": lambda f: funnel.attribution(f["ev"]),
    "session_paths": lambda f: funnel.session_paths(f["ev"]),
    "activity_streaks": lambda f: funnel.activity_streaks(f["ev"]),
    "decayed_popularity": lambda f: O.decayed_popularity(
        f["ev"], "user_id", "ts", "value"
    ),
    "mann_kendall": lambda f: O.mann_kendall_trend(f["ev"]),
    "heavy_hitters": lambda f: sketches.heavy_hitters(f["nums"], "g"),
    "kmv_distinct": lambda f: sketches.kmv_distinct(f["nums"], "g"),
    "hll_distinct": lambda f: sketches.hll_distinct(f["nums"], "g"),
}


@pytest.mark.parametrize("name", sorted(NULLKEY_CASES))
def test_operator_survives_null_keys(spark, nullkey, name):
    # collect() must not raise; NULL-group conventions are each
    # operator's documented business — this pins survival only
    NULLKEY_CASES[name](nullkey).collect()


def test_exact_dedup_null_doc_id_rows_not_lost(spark, nullkey):
    # identical text under a NULL id must still dedup BY TEXT, and the
    # NULL-id row must not vanish: 3 docs / 2 distinct texts -> 2 rows
    assert dedup.exact_dedup(nullkey["docs"], text_col="text").count() == 2


# ---------------------------------------------------------------------------
# 2. ZEROS — every measured value exactly 0.0
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def zeros(spark):
    d0 = dt.datetime(2024, 1, 1)
    return {
        "nums": spark.createDataFrame(
            [(i, 0.0, "ab"[i % 2]) for i in range(8)],
            "id long, v double, g string",
        ),
        "ev": spark.createDataFrame(
            [
                (d0 + dt.timedelta(days=i), 0.0, "u%d" % (i % 2), "click", i)
                for i in range(8)
            ],
            "ts timestamp, value double, user_id string, "
            "event_type string, event_id long",
        ),
        "scored": spark.createDataFrame(
            [(0.0, i % 2, i) for i in range(6)], "s double, y int, id long"
        ),
    }


ZEROS_CASES = {
    "gini": lambda f: O.gini_coefficient(f["nums"], "g", "v"),
    "benford": lambda f: O.benford_profile(f["nums"], "v"),
    "tail_index": lambda f: profile.tail_index(f["nums"], "g", "v"),
    "decile_concentration": lambda f: profile.decile_concentration(
        f["nums"], "g", "v"
    ),
    "james_stein": lambda f: O.james_stein_means(f["nums"], "g", "v"),
    "robust_zscore": lambda f: profile.robust_zscore(f["nums"], "v"),
    "winsorize": lambda f: profile.winsorize(f["nums"], "v"),
    "quantile_discretize": lambda f: profile.quantile_discretize(
        f["nums"], "v"
    ),
    "psi_drift": lambda f: profile.psi_drift(f["nums"], f["nums"], "v"),
    "exact_quantiles": lambda f: O.exact_quantiles(f["nums"], "v", [0.5]),
    "t_closeness": lambda f: validate.t_closeness_stats(f["nums"], ["g"], "v"),
    "dp_median": lambda f: validate.dp_median(f["nums"], "v"),
    "kruskal_wallis": lambda f: experiment.kruskal_wallis(f["nums"], "g", "v"),
    "mann_whitney": lambda f: experiment.mann_whitney_u(
        f["nums"], "g", "v", "a", "b"
    ),
    "ks_test": lambda f: validate.ks_test(f["nums"], "g", "v", "a", "b"),
    "wasserstein": lambda f: validate.wasserstein_1d(
        f["nums"], "g", "v", "a", "b"
    ),
    "ams_f2": lambda f: sketches.ams_f2_estimate(f["nums"], "v"),
    "cusum": lambda f: O.cusum_changepoint(f["ev"]),
    "ewma": lambda f: O.ewma_chart(f["ev"]),
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
    "brier_log_loss": lambda f: evaluation.brier_log_loss(
        f["scored"].select("s", "y"), "s", "y"
    ),
}


@pytest.mark.parametrize("name", sorted(ZEROS_CASES))
def test_operator_survives_all_zero_values(spark, zeros, name):
    ZEROS_CASES[name](zeros).collect()
