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


# The r6 VERDICT's "Next round" #1 window: head = the named r6
# holdover w1_value_drift; then the 17 queries added during round 6
# post-rotation (never driver-checked); then the 32 STALEST veterans
# (last driver-green in round 2, most first checked in round 1, code
# refactored since). 18 + 32 = 50 — no holdover this round. The window
# contract is that these occupy the registry HEAD so an edit cannot
# silently re-defer a never/stale-checked query.
R7_WINDOW = [
    "w1_value_drift",
    # 17 r6-era additions, never driver-checked
    "hits_purchase_graph", "t_closeness_audit", "event_acf",
    "hll_rolling_actives", "bloom_pruned_lookup", "textrank_keywords",
    "ab_msprt_monitor", "session_paths", "matryoshka_fidelity",
    "ppr_related_parts", "embedding_knn_outliers",
    "substring_index_search", "event_value_cusum",
    "compression_quality_flags", "hll_rolling_stream", "rank_rbo_top50",
    "source_tail_index",
    # 32 stalest veterans (driver-green r2)
    "media_content_stats", "dedup_ngram_jaccard", "dedup_clusters",
    "dedup_clusters_star", "metadata_filter_eq", "metadata_filter_range",
    "metadata_filter_in", "cosine_topk", "dot_topk_compat", "nearest_l2",
    "ann_brute_topk", "dedup_exact", "neardup_embedding",
    "neardup_embedding_lsh", "ann_lsh_topk", "text_stats",
    "lang_profile", "pricing_summary", "top_revenue_orders",
    "brand_revenue", "events_windowed", "events_sessionize",
    "dedup_keep", "bm25_search", "lang_id_heuristic", "props_json_agg",
    "revenue_rollup", "segment_intersect", "customer_rank_window",
    "regional_supply", "events_windowed_stream", "asof_join_clicks",
]

# The r8 window head: the 13 round-2-stale rows that did not fit in the
# r7 window (the round-2 cohort had 45 rows for 32 slots). Pinned at
# positions 51-63 so they cannot be silently re-deferred next rotation.
R8_HEAD = [
    "range_join_incidents", "customers_no_big_order", "order_cube",
    "event_value_quantiles", "ivf_ann_topk", "orders_heavy_semi",
    "customer_moving_sum", "brand_supplier_breadth",
    "user_totals_stateful_stream", "salted_part_join",
    "events_rollup_merge", "small_qty_revenue", "segment_except",
]

# Rows-only by design: non-deterministic internals make an exact SQL
# oracle impossible; each has an in-registry planted-oracle twin gating
# its recall/semantics (rp_ann_planted, ivf_ann_planted).
ROWS_ONLY = {"rp_ann_topk", "ivf_ann_topk"}


def test_driver_window_composition():
    """Pin the registry's FULL 50-entry window (the r2 judge found
    failures had slid OUT of the driver's window unnoticed): the r6
    holdover + the 17 never-checked r6 additions + the 32 stalest
    round-2 veterans, with the 13 round-2 leftovers pinned at positions
    51-63 as the r8 window head. Every window entry must be
    oracle-backed unless documented rows-only."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod

    qs = list(entrymod.queries().keys())
    oracles = entrymod.oracle_sql()
    window = qs[:50]
    assert len(qs) == len(set(qs)), "duplicate registry keys"
    assert window == R7_WINDOW, (
        "r7 window drifted — a registry edit re-deferred a "
        "never/stale-driver-checked query"
    )
    assert qs[50:63] == R8_HEAD, (
        "the 13 round-2-stale leftovers must sit at positions 51-63 "
        "(head of the r8 window)"
    )
    missing = [q for q in window if q not in oracles and q not in ROWS_ONLY]
    assert not missing, f"window entries without oracles: {missing}"
    # every oracle key corresponds to a registered query
    orphans = [k for k in oracles if k not in set(qs)]
    assert not orphans, f"oracles without queries: {orphans}"
