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


# The r5 VERDICT's "What's missing #1" backlog: the 51 queries added
# during round 5 post-rotation, none of which had a driver CORRECTNESS
# row entering round 6 (COVERAGE.md ledger "never" rows). 51 candidates
# for 50 slots — every one rotates in EXCEPT the named holdover. The r6
# window contract (VERDICT r5 "Next round" #1) is that these occupy the
# window HEAD so a registry edit cannot silently re-defer them.
R6_WINDOW = [
    "winnow_pairs", "ql_search", "rrf_fusion", "lang_kappa",
    "lang_confusion", "tfidf_cosine_pairs", "semantic_contamination",
    "neyman_allocation", "trigram_logprob", "bt_brand_ranking",
    "winnow_spans", "rouge_pair_overlap", "fleiss_lang_raters",
    "ndcg_retrieval", "field_mutual_info", "doc_readability",
    "graph_assortativity", "event_decayed_popularity",
    "source_rank_normalize", "krippendorff_lang",
    "source_lexical_diversity", "elo_brand_ratings", "doc_char_entropy",
    "source_heaps_law", "doc_ngram_novelty", "term_burstiness",
    "ks_value_drift", "chi2_source_lang", "rank_agreement",
    "graph_transitivity", "benford_order_totals", "source_length_gini",
    "bpe_roundtrip", "event_id_gaps", "customer_rfm",
    "touch_attribution", "user_survival", "seasonal_naive_eval",
    "ab_conversion_test", "ab_revenue_welch", "ab_srm_check",
    "ab_revenue_cuped", "doc_tree_rollup", "customer_supplier_radius",
    "decayed_popularity_stream", "event_did", "mwu_value_test",
    "source_en_share_fdr", "user_purchase_mcnemar", "user_value_paired_t",
]

# The one r6 holdover (51 never-checked candidates, 50 slots): pinned
# at position 51 — the FIRST slot of the r7 window. Chosen because its
# sibling ks_value_drift (same value-drift CTE shape, same event pair)
# IS in the window, minimizing unique-coverage loss.
R6_HOLDOVER = "w1_value_drift"

# Rows-only by design: non-deterministic internals make an exact SQL
# oracle impossible; each has an in-registry planted-oracle twin gating
# its recall/semantics (rp_ann_planted, ivf_ann_planted).
ROWS_ONLY = {"rp_ann_topk", "ivf_ann_topk"}


def test_driver_window_composition():
    """Pin the registry's FULL 50-entry window (the r2 judge found
    failures had slid OUT of the driver's window unnoticed): the 50
    rotated-in never-driver-checked r5 additions, with the one named
    holdover pinned at position 51 as the r7 window head. Every window
    entry must be oracle-backed unless documented rows-only."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod

    qs = list(entrymod.queries().keys())
    oracles = entrymod.oracle_sql()
    window = qs[:50]
    assert len(qs) == len(set(qs)), "duplicate registry keys"
    assert window == R6_WINDOW, (
        "r6 window drifted — a registry edit re-deferred a "
        "never-driver-checked query"
    )
    assert qs[50] == R6_HOLDOVER, (
        "the r6 holdover must sit at position 51 (first slot of the "
        "r7 window)"
    )
    missing = [q for q in window if q not in oracles and q not in ROWS_ONLY]
    assert not missing, f"window entries without oracles: {missing}"
    # every oracle key corresponds to a registered query
    orphans = [k for k in oracles if k not in set(qs)]
    assert not orphans, f"oracles without queries: {orphans}"
