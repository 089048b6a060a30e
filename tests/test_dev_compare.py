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


# The r8 VERDICT's "Next round" #1 window: the 25 r7-era rows that had
# never had a driver CORRECTNESS row (judge re-verified all 25
# oracle-green at sf0.01 on 2026-08-16) + the 25 stalest round-3
# veterans in original registry order. 25 + 25 = 50; after this
# rotation the never-checked backlog is ZERO. The window contract is
# that these occupy the registry HEAD so an edit cannot silently
# re-defer a never/stale-checked query.
R9_WINDOW = [
    # 25 r7-era rows, first driver check this round
    "ktruss_planted", "doc_fog_smog", "crawl_capture_recapture",
    "source_mean_shrinkage", "media_phash_planted", "stream_dedup_docs",
    "event_seasonal_mk", "source_quantile_normalize",
    "event_holt_winters", "source_length_theil", "event_perm_entropy",
    "bucketed_join_revenue", "dpp_partitioned_join",
    "schema_evolution_read", "forecast_conformal", "dp_value_median",
    "xml_roundtrip", "lineitem_simpsons_screen", "grouped_kfold_balance",
    "lineitem_corr_matrix", "source_fightin_words", "cohort_ltv",
    "revenue_decile_curve", "bm25f_search", "score_gain_chart",
    # 25 stalest round-3 veterans (last driver-green r3)
    "nation_order_coverage", "train_split_counts",
    "corpus_balance_sample", "setsim_join", "value_histogram",
    "time_travel", "containment_probe", "versioned_stream_ingest",
    "entity_linkage", "compaction_roundtrip", "key_skew_profile",
    "late_window_finalize", "ivf_ann_planted", "rp_ann_planted",
    "approx_distinct_hll", "c4_line_clean", "triangle_copurchase",
    "scd2_apply", "phrase_search", "semantic_dedup",
    "pagerank_copurchase", "bloom_membership", "corpus_pipeline",
    "data_expectations", "dedup_minhash",
]

# The r10 window head: every r9 addition (never driver-checked) is
# pinned immediately after position 50 so it cannot be silently
# re-deferred next rotation; the round-3 cohort remainder follows.
R9_ADDITIONS = [
    # extended in registry order as each r9 operator lands (cap 25)
    "federated_cosine_topk", "collection_compact",
    "collection_vacuum_audit", "ccnet_perplexity_buckets",
    "quality_ensemble_vote", "cluster_balanced_sample",
    "semdedup_prototypes", "embedding_dim_stats",
    "tokenizer_fertility",
    "dedup_threshold_curve", "boilerplate_lines",
    "script_mismatch_planted", "wimbd_top_ngrams",
    "collection_upsert", "pii_luhn_audit", "source_ce_matrix",
]

# Rows-only by design: non-deterministic internals make an exact SQL
# oracle impossible; each has an in-registry planted-oracle twin gating
# its recall/semantics (rp_ann_planted, ivf_ann_planted).
ROWS_ONLY = {"rp_ann_topk", "ivf_ann_topk"}


def test_driver_window_composition():
    """Pin the registry's FULL 50-entry window (the r2 judge found
    failures had slid OUT of the driver's window unnoticed): the 25
    r7-era never-checked rows + the 25 stalest round-3 veterans, with
    every r9 addition pinned immediately after position 50 as the r10
    window head. Every window entry must be oracle-backed unless
    documented rows-only."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod

    qs = list(entrymod.queries().keys())
    oracles = entrymod.oracle_sql()
    window = qs[:50]
    assert len(qs) == len(set(qs)), "duplicate registry keys"
    assert window == R9_WINDOW, (
        "r9 window drifted — a registry edit re-deferred a "
        "never/stale-driver-checked query"
    )
    assert qs[50:50 + len(R9_ADDITIONS)] == R9_ADDITIONS, (
        "every r9 addition (never driver-checked) must sit directly "
        "after the window (head of the r10 window)"
    )
    missing = [q for q in window if q not in oracles and q not in ROWS_ONLY]
    assert not missing, f"window entries without oracles: {missing}"
    # every r9 addition must itself be oracle-backed
    missing_new = [
        q for q in R9_ADDITIONS if q not in oracles and q not in ROWS_ONLY
    ]
    assert not missing_new, f"r9 additions without oracles: {missing_new}"
    # every oracle key corresponds to a registered query
    orphans = [k for k in oracles if k not in set(qs)]
    assert not orphans, f"oracles without queries: {orphans}"