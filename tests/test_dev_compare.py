"""Regression tests for the local correctness gate's type-drift detector.

Round 2 and round 3 each shipped driver hash-only FAILs (7 queries total)
caused by DuckDB ``SUM(BIGINT) -> HUGEINT`` oracles whose Python values
stringify identically to Spark's BIGINT — ``tools/dev_compare.py``'s
``canon()`` therefore said green while the driver's width-aware hash said
red (VERDICT r3, "What's wrong" item 4).  ``type_drift_problems`` turns
that class into a local failure; these tests pin the contract:

* a planted SUM-without-cast oracle MUST be flagged,
* the int-width drift the driver provably tolerates MUST NOT be flagged
  (entity_linkage / dedup_simhash / time_travel were hash-green in r3
  with INTEGER/TINYINT oracles vs bigint Spark columns),
* every committed oracle in ``__spark_entry__.py`` is HUGEINT/DECIMAL
  clean (static bind check — no data read, so it is cheap enough to run
  in every pytest sweep).
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from dev_compare import type_drift_problems  # noqa: E402


def _duck_types(sql, **views):
    con = duckdb.connect()
    for name, create in views.items():
        con.execute(f"CREATE VIEW {name} AS {create}")
    rel = con.sql(sql)
    return {c: str(t) for c, t in zip(rel.columns, rel.types)}


def test_planted_uncast_sum_fails():
    # the exact shape that shipped broken three times: SUM over BIGINT
    dtypes = _duck_types(
        "SELECT sum(x) AS total FROM t",
        t="SELECT range::BIGINT AS x FROM range(5)",
    )
    assert dtypes["total"] == "HUGEINT"
    problems = type_drift_problems({"total": "bigint"}, dtypes)
    assert len(problems) == 1 and "HUGEINT" in problems[0]


def test_cast_sum_passes():
    dtypes = _duck_types(
        "SELECT sum(x)::BIGINT AS total FROM t",
        t="SELECT range::BIGINT AS x FROM range(5)",
    )
    assert type_drift_problems({"total": "bigint"}, dtypes) == []


def test_tolerated_int_width_drift_not_flagged():
    # driver-hash-green in r3: INTEGER and TINYINT oracles vs int Spark cols
    assert type_drift_problems({"v": "int"}, {"v": "INTEGER"}) == []
    assert type_drift_problems({"v": "int"}, {"v": "TINYINT"}) == []
    assert type_drift_problems({"v": "int"}, {"v": "BIGINT"}) == []


def test_decimal_and_float32_flagged():
    assert type_drift_problems({"v": "double"}, {"v": "DECIMAL(18,2)"})
    assert type_drift_problems({"v": "double"}, {"v": "FLOAT"})
    # spark decimal vs duck decimal is fine (both fixed-point)
    assert type_drift_problems({"v": "decimal(18,2)"}, {"v": "DECIMAL(18,2)"}) == []


@pytest.mark.parametrize("sf_dir", [os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")])
def test_all_committed_oracles_bind_clean(sf_dir):
    """Bind (don't execute) every oracle and assert no HUGEINT/DECIMAL column.

    Binding against the real parquet views resolves aggregate result types
    without scanning data, so this sweeps all ~150 oracles in seconds.
    """
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    dirty = {}
    for name, sql in entrymod.oracle_sql().items():
        rel = con.sql(sql)
        bad = [
            f"{c}:{t}"
            for c, t in zip(rel.columns, rel.types)
            if "HUGEINT" in str(t).upper() or "DECIMAL" in str(t).upper()
        ]
        if bad:
            dirty[name] = bad
    assert not dirty, f"uncast oracle columns (cast to BIGINT/DOUBLE): {dirty}"


# The r4 VERDICT's "What's missing #1" backlog: 18 registry queries that
# had never had a driver CORRECTNESS row entering round 5. The r5 window
# contract (VERDICT r4 "Next round" #1 and #8) is that these occupy the
# window HEAD so a registry edit cannot silently re-defer them.
R5_BACKLOG = [
    "warc_ingest", "epoch_shuffle_manifest", "mixture_weights_plan",
    "cm_freq_stream", "mojibake_profile", "l_diversity_audit",
    "pq_ann_planted", "merge_into_versioned", "stream_left_outer_join",
    "kcore_planted", "histogram_quantiles", "heavy_hitters",
    "unigram_encode_planted", "events_sliding_window", "name_edit_distance",
    "bigram_logprob", "incremental_neardup", "rp_ann_topk",
]

# The 30 queries added during round 5 itself — dev_compare-green but
# never driver-hashed; they occupy window slots 18-47 so the r5 window
# retires the ENTIRE never-checked set (18 backlog + these 30 = all 48
# registry queries without a driver row entering this round).
R5_NEW = [
    "pmi_collocations", "incremental_components", "media_headers",
    "dedup_paragraphs", "stream_components", "association_rules",
    "markov_transitions", "pca_planted", "resample_ffill",
    "winsorize_stats", "embedding_drift", "kcenter_planted",
    "versioned_delete", "table_changes_cdf", "token_budget_sample",
    "abtt_planted", "dsir_selection", "link_prediction_aa",
    "vocab_oov_rates", "taxonomy_tagging", "trailing_anomaly",
    "bootstrap_ci_orders", "margin_mining", "dp_segment_counts",
    "psi_price_drift", "roc_auc_planted", "robust_outliers",
    "quality_calibration", "hard_negatives", "lpa_communities",
]

# Slots 48-49: collection_e2e's upgraded hash oracle has never been
# driver-validated; the flagship headline query must not go stale.
R5_TAIL = ["collection_e2e", "flagship_filtered_cosine_topk"]

# Rows-only by design: non-deterministic internals make an exact SQL
# oracle impossible; each has an in-registry planted-oracle twin gating
# its recall/semantics (rp_ann_planted, ivf_ann_planted).
ROWS_ONLY = {"rp_ann_topk", "ivf_ann_topk"}


def test_driver_window_composition():
    """Pin the registry's FULL 50-entry window (the r2 judge found
    failures had slid OUT of the driver's window unnoticed): backlog
    head, then the 30 r5 additions, then the two re-check slots —
    together retiring every never-driver-checked query. Every window
    entry must be oracle-backed unless documented rows-only."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod

    qs = list(entrymod.queries().keys())
    oracles = entrymod.oracle_sql()
    window = qs[:50]
    assert len(qs) == len(set(qs)), "duplicate registry keys"
    assert window == R5_BACKLOG + R5_NEW + R5_TAIL, (
        "r5 window drifted — a registry edit re-deferred a "
        "never-driver-checked query or evicted a re-check slot"
    )
    missing = [q for q in window if q not in oracles and q not in ROWS_ONLY]
    assert not missing, f"window entries without oracles: {missing}"
    # every oracle key corresponds to a registered query
    orphans = [k for k in oracles if k not in set(qs)]
    assert not orphans, f"oracles without queries: {orphans}"
