"""Plan-shape regression tests: the scale properties SCALE.md claims must
be visible in the physical plan, not just asserted in prose. Each test
pins one property — filter/projection pushdown to the parquet scan,
broadcast (not shuffle) joins for dims, no nested-loop joins in the
range join, the as-of join compiling to a window (no join operator at
all), top-k without a global sort, whole-stage codegen on the text path.
A regression that silently changes one of these shapes fails here long
before it shows up as a 100 TB incident."""

import contextlib
import io

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def plan_of(df, mode="formatted", execute=False):
    if execute:  # AQE finalizes the plan only after execution
        df.count()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_parquet_filter_and_projection_pushdown(spark):
    df = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("lang") == "en")
        .select("doc_id")
    )
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan
    # column pruning: the scan must not read text/source/n_chars
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "doc_id" in read_schema and "lang" in read_schema
    assert "text" not in read_schema and "n_chars" not in read_schema


def test_dim_joins_broadcast_not_shuffle(spark):
    import __spark_entry__ as entry

    plan = plan_of(entry.q_regional_supply(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_range_join_is_equi_join(spark):
    from valentinus_spark.operators.range_join import range_join

    pdf = spark.createDataFrame([(1, 0, 5)], "pid long, k long, ts long")
    idf = spark.createDataFrame([(9, 0, 0, 10)], "iid long, k long, s long, e long")
    plan = plan_of(
        range_join(pdf, idf, key="k", point_ts="ts", start="s", end="e", bucket_width=4)
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_asof_join_has_no_join_operator(spark):
    from valentinus_spark.operators.asof import asof_join

    ldf = spark.createDataFrame([(1, 0, 5)], "eid long, k long, ts long")
    rdf = spark.createDataFrame([(9, 0, 3, 1.0)], "rid long, k long, ts long, v double")
    plan = plan_of(asof_join(ldf, rdf, key="k", ts="ts", value_cols=["rid"]))
    assert "Join" not in plan  # union + window, never a join
    assert "Window" in plan


def test_topk_uses_take_ordered_not_global_sort(spark):
    df = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .orderBy(F.desc("n_chars"))
        .limit(10)
    )
    plan = plan_of(df)
    assert "TakeOrderedAndProject" in plan


def test_text_stats_stays_jvm_side(spark):
    from valentinus_spark.functions.text import text_quality, token_count

    df = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        token_count("text").alias("n_tokens"), text_quality("text").alias("q")
    )
    plan = plan_of(df)
    # all-Catalyst: no Python eval boundary anywhere (higher-order lambdas
    # in text_quality are interpreted JVM expressions, so the Project node
    # itself isn't codegen'd — the scan still is, marked '*')
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "* ColumnarToRow" in plan


def test_exact_dedup_single_shuffle(spark):
    from valentinus_spark.operators.dedup import exact_dedup

    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = plan_of(exact_dedup(df), execute=True)
    # exactly one required hash shuffle, keyed on the digest
    # (ensure_parallelism's REPARTITION_BY_NUM round-robin on this
    # single-file toy input is explicitly requested, not a join/agg cost)
    required = [
        ln for ln in plan.splitlines() if "ENSURE_REQUIREMENTS" in ln
    ]
    assert len(required) == 1 and "hashpartitioning(content_hash" in required[0]
    # and the shuffle carries partial aggregates (map-side combine)
    assert "partial_count" in plan


def test_map_metadata_filter_pushes_through_create_map(spark):
    """getItem over create_map collapses to the underlying column
    (SimplifyExtractValueOps) — the metadata predicate must reach the
    parquet scan as a pushed filter, not evaluate post-scan."""
    from valentinus_spark.filters import compile_filters

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").withColumn(
        "metadata",
        F.create_map(F.lit("Lang"), F.col("lang")),
    )
    df = docs.filter(compile_filters([{"Lang": {"eq": "en"}}])).select("doc_id")
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan


def test_metadata_filter_compiles_to_catalyst_predicate(spark):
    from valentinus_spark.filters import compile_filters

    pred = compile_filters(
        [{"Year": {"gte": 2017}}, {"Lang": {"eq": "en"}}], metadata_col="metadata"
    )
    df = spark.createDataFrame(
        [("a", {"Year": "2018", "Lang": "en"})], "id string, metadata map<string,string>"
    ).filter(pred)
    plan = plan_of(df)
    # pure Catalyst expressions — no Python evaluation node
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert df.count() == 1


def test_pivot_is_single_aggregate_pass(spark):
    import __spark_entry__ as entry

    import re

    plan = plan_of(entry.q_user_event_pivot(spark, SF_DIR))
    # explicit category list → no join and no second scan for category
    # inference; Spark plans pivot as a double aggregation ((user, type)
    # counts, then per-user pivot-combine) = exactly two hash shuffles
    # (formatted mode lists each node twice: tree + detail header)
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1
    required = [ln for ln in plan.splitlines() if "ENSURE_REQUIREMENTS" in ln]
    assert len(required) == 2
    assert "Join" not in plan


def test_grouping_sets_uses_expand(spark):
    import __spark_entry__ as entry

    import re

    plan = plan_of(entry.q_order_grouping_sets(spark, SF_DIR))
    # both grouping branches come from one Expand over one scan
    assert "Expand" in plan
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1


def test_interval_overlap_join_is_equi_join(spark):
    from valentinus_spark.operators.range_join import interval_overlap_join

    l = spark.createDataFrame([(0, 1, 0, 10)], "k long, lid long, s long, e long")
    r = spark.createDataFrame([(0, 2, 5, 15)], "k long, rid long, s long, e long")
    plan = plan_of(
        interval_overlap_join(
            l, r, key="k", left_start="s", left_end="e",
            right_start="s", right_end="e", bucket_width=4,
        )
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_quality_gate_not_pushed_to_scan(spark):
    """The repetition-gate predicate must NOT land in the parquet scan:
    pushed down it re-runs the whole profile on the scan's partitioning
    (the 70.8s -> 1.0s pathology in SCALE.md pitfall #6)."""
    from valentinus_spark.operators.quality import quality_filter

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = plan_of(quality_filter(docs))
    scans = [
        ln for ln in plan.splitlines() if "Scan parquet" in ln or "DataFilters" in ln
    ]
    # the expensive fold ('aggregate(array_sort') must appear in no scan
    for ln in scans:
        assert "array_sort" not in ln
    # and the gate itself survives somewhere above, guarded
    assert "monotonically_increasing_id" in plan


def test_rp_ann_prefilter_prunes_map_side(spark):
    """The projected-space top-k must compile to WindowGroupLimit (partial
    map-side pruning before the per-query shuffle) and the projection UDF
    must run below the join (once per row, not per pair)."""
    import __spark_entry__ as entry

    plan = plan_of(entry.q_rp_ann_topk(spark, SF_DIR))
    assert "WindowGroupLimit" in plan
    # ArrowEvalPython below the BroadcastNestedLoopJoin: the UDF node
    # appears in the child subtree of the join in the formatted plan
    assert plan.index("ArrowEvalPython") > plan.index("BroadcastNestedLoopJoin")


def test_incremental_dedup_prunes_corpus_columns(spark):
    """The corpus side of the anti-join must read only the text column
    (digest input) — not id/lang/source."""
    from valentinus_spark.operators.dedup import incremental_dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    inc = docs.filter(F.col("source") >= "src5")
    corp = docs.filter(F.col("source") < "src5")
    plan = plan_of(incremental_dedup(inc, corp))
    schemas = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert any(
        "text" in ln and "lang" not in ln and "n_chars" not in ln for ln in schemas
    )


def test_kmv_sketch_single_shuffle_then_reused_exchange(spark):
    """The KMV sketch must shuffle ONCE (the per-group distinct on the
    hash) and feed the window + final aggregate from that partitioning —
    a second corpus-sized Exchange would double the job at scale."""
    from valentinus_spark.operators.sketches import kmv_distinct

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    plan = plan_of(kmv_distinct(ev, "user_id", ["event_type"], k=64))
    # exactly two exchanges: (group, hash) distinct — corpus-sized,
    # map-side combined — then group re-key for the window, whose input
    # the partial WindowGroupLimit below the Exchange prunes to ≤ k rows
    # per group per partition (the thing that keeps shuffle #2 tiny)
    import re

    exch_ids = [int(s) for s in re.findall(r"\+- Exchange \((\d+)\)", plan)]
    wgl_ids = [int(s) for s in re.findall(r"\+- WindowGroupLimit \((\d+)\)", plan)]
    assert len(exch_ids) == 2, plan
    assert any(w < max(exch_ids) for w in wgl_ids), plan  # partial prune below the group exchange
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_zorder_value_is_pure_codegen(spark):
    """The Morton interleave must stay inside whole-stage codegen — no
    Python nodes, no expensive expressions in the scan."""
    from valentinus_spark.operators.layout import zorder_value

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    df = li.select(zorder_value(["l_partkey", "l_suppkey"], bits=16).alias("z"))
    plan = plan_of(df)
    # formatted mode marks codegen stages with a leading '*'
    assert "* Project" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_scd2_apply_closed_history_untouched(spark):
    """SCD2's closed-history branch must be a bare scan+filter union leg —
    no join, no shuffle touches the (at scale, enormous) closed history."""
    from valentinus_spark.operators.scd import scd2_apply

    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    current = cust.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.lit("2024-01-01").alias("effective_from"),
        F.lit(None).cast("string").alias("effective_to"),
    )
    updates = cust.select("c_custkey", F.lit("X").alias("segment"))
    out = scd2_apply(current, updates, "c_custkey", ["segment"], "2025-06-01")
    plan = plan_of(out)
    assert out.count() == 2 * cust.count()  # every key closes + reopens
    assert "BatchEvalPython" not in plan


def test_check_expectations_is_single_scan(spark):
    """N row-level rules must compile to ONE table scan (conditional-sum
    aggregates in a single pass), not a job per rule."""
    from valentinus_spark.operators.validate import check_expectations

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    import re

    plan = plan_of(
        check_expectations(
            orders,
            [
                ("a", F.col("o_totalprice") > 0),
                ("b", F.col("o_orderdate").isNotNull()),
                ("c", F.col("o_orderkey") > 0),
            ],
        )
    )
    # formatted mode lists each node twice (tree + detail header)
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_setsim_join_no_cartesian_product(spark):
    """Prefix filtering must compile to equi-joins on the token column —
    never a cartesian/nested-loop pairing of documents."""
    from valentinus_spark.operators.setsim import set_similarity_join

    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = plan_of(set_similarity_join(df, "doc_id", "text", threshold=0.8))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_linkage_candidates_are_equi_joined(spark):
    """Blocked linkage pairs come from an equi-join on (scheme, block
    key); the O(len^2) levenshtein must sit above equi-joins only."""
    from valentinus_spark.operators.linkage import linkage_pairs

    df = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", F.substring("text", 1, 40).alias("title")
    )
    plan = plan_of(linkage_pairs(df, "doc_id", "title", max_dist=10))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_histogram_bounds_join_is_broadcast(spark):
    """The bounds row joins the data pass via broadcast — the second
    scan must not shuffle the fact side against a 1-row table."""
    from valentinus_spark.operators.profile import equi_width_histogram

    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    plan = plan_of(equi_width_histogram(df, "value", n_bins=8))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_drifted_headline_queries_plan_fingerprint(spark):
    """r4 bench drift suspects (brand_revenue +35%, customer_rank_window
    +29%, events_sessionize +24%, pricing_summary +23% vs r3 — all
    attributed to single-JVM suite pressure, not plan change). Pin each
    plan's shuffle/broadcast Exchange fingerprint so a real plan
    regression is distinguishable from timing noise next time (VERDICT
    r4 perf item 5)."""
    import __spark_entry__ as entry

    expected = {
        # name: (shuffle exchanges, broadcast exchanges)
        "brand_revenue": (2, 2),
        "customer_rank_window": (4, 4),
        "events_sessionize": (2, 0),
        "pricing_summary": (2, 0),
        # r5 bench >2x-vs-baseline suspects — isolated re-bench (r6,
        # min-of-3, quiet box) recovered both to UNDER baseline
        # (dedup_minhash 1.54s vs 1.98 baseline, events_windowed 0.25s
        # vs 0.43), confirming suite pressure; fingerprints pinned so a
        # future slowdown with an unchanged fingerprint is again
        # attributable to pressure, not plan drift (counts are in
        # plan_of("formatted") units — tree + detail section — like
        # every other row here; physically 6/3 and 1/0 Exchanges)
        "dedup_minhash": (12, 6),
        "events_windowed": (2, 0),
    }
    for name, (want_shuffle, want_bcast) in expected.items():
        plan = plan_of(entry.queries()[name](spark, SF_DIR))
        n_total = plan.count("Exchange")
        n_bcast = plan.count("BroadcastExchange")
        got = (n_total - n_bcast, n_bcast)
        assert got == (want_shuffle, want_bcast), (
            f"{name}: plan fingerprint drifted to shuffle/broadcast={got}, "
            f"expected {(want_shuffle, want_bcast)} — investigate before "
            "blaming suite pressure"
        )


def test_r5_curation_ops_plan_shapes(spark):
    """r5 operator plan pins: hard_negatives keeps the per-anchor top-k
    map-side (WindowGroupLimit) and no new operator introduces a
    cartesian product — the pair/rule joins must stay keyed (bucket /
    basket / token equi-joins). BroadcastNestedLoopJoins are only the
    documented single-row totals pattern."""
    import __spark_entry__ as entry

    hn = plan_of(entry.queries()["hard_negatives"](spark, SF_DIR))
    assert "WindowGroupLimit" in hn, "top-k heap not pushed map-side"

    for name in (
        "hard_negatives",
        "pmi_collocations",
        "association_rules",
        "markov_transitions",
        "lpa_communities",
        "dedup_paragraphs",
        "resample_ffill",
    ):
        plan = plan_of(entry.queries()[name](spark, SF_DIR))
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"


def test_bucketed_tables_join_without_exchange(spark):
    """Bucketed co-located join: two tables bucketBy'd on the same key
    into the warehouse join WITHOUT any Exchange on either side (the
    SortMergeJoin reads pre-bucketed files directly). This is the
    pre-partitioning story SCALE.md tells for repeated big-big joins —
    pay the shuffle once at write time, never again at read time."""
    spark.sql("DROP TABLE IF EXISTS _bj_orders")
    spark.sql("DROP TABLE IF EXISTS _bj_lineitem")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    # broadcast would hide the property under test (AQE broadcasts the
    # small side at test scale): force the shuffle-join path so the
    # assertion is about bucketing, not size
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
            "overwrite"
        ).saveAsTable("_bj_orders")
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
            "overwrite"
        ).saveAsTable("_bj_lineitem")
        joined = (
            spark.table("_bj_orders")
            .join(
                spark.table("_bj_lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.sum("l_extendedprice").alias("rev"))
        )
        plan = plan_of(joined)
        join_section = plan.split("HashAggregate")[0]
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in join_section, join_section
        # correctness: same result as the unbucketed join
        expected = (
            orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderpriority")
            .count()
            .count()
        )
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS _bj_orders")
        spark.sql("DROP TABLE IF EXISTS _bj_lineitem")


def test_winnow_pairs_no_cartesian_and_parallel_hashing(spark):
    """The winnowing pair join must be a fingerprint equi-join (never a
    cartesian), and the per-character hashing must run AFTER the
    repartition boundary — a single-file input otherwise hashes on one
    core (the measured 13s->4s cliff)."""
    from valentinus_spark.operators.text_search import (
        winnow_fingerprints,
        winnow_overlap_pairs,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = plan_of(winnow_overlap_pairs(docs, k=8, window=4))
    assert "CartesianProduct" not in plan
    fps_plan = plan_of(winnow_fingerprints(docs, k=8, window=4))
    # hashing select (sha2/xxhash over the gram transform) sits above the
    # round-robin exchange, not in the single-split scan stage
    assert "Exchange RoundRobinPartitioning" in fps_plan.replace("\n", " ") or \
        "REPARTITION_BY_NUM" in fps_plan


def test_ql_and_rrf_topk_take_ordered(spark):
    from valentinus_spark.operators.text_search import ql_topk, rrf_fuse

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ql = ql_topk(docs, ["data", "query"], k=10)
    assert "TakeOrderedAndProject" in plan_of(ql)
    fused = rrf_fuse([ql, ql.limit(5)], topk=10)
    assert "TakeOrderedAndProject" in plan_of(fused)


def test_semantic_contamination_broadcasts_benchmark(spark):
    """The benchmark side must broadcast (BroadcastNestedLoopJoin over
    the small side) — the corpus side must never shuffle for the join."""
    from valentinus_spark.operators.contamination import semantic_contamination

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = semantic_contamination(emb, emb.filter(F.col("label") == 0))
    plan = plan_of(out)
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_rouge_pairs_grams_equi_joined(spark):
    """rouge_n_pairs joins gram counts on the (pair, gram) key — never a
    cartesian — and the clipped fold is a plain aggregate over that
    join (no window, no driver collect)."""
    from valentinus_spark.operators.evaluation import rouge_n_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = docs.select(F.col("doc_id").alias("pid"), F.col("text").alias("ta"))
    b = docs.select((F.col("doc_id") + 1).alias("pid"), F.col("text").alias("tb"))
    pairs = a.join(b, "pid").select("pid", "ta", "tb")
    plan = plan_of(rouge_n_pairs(pairs, "pid", "ta", "tb", n=1))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ndcg_windows_share_one_exchange(spark):
    """Both window ranks (by score, by relevance) partition on the query
    key — Catalyst must plan ONE shuffle for the query key, not two."""
    from valentinus_spark.operators.evaluation import ndcg_at_k

    df = spark.createDataFrame(
        [("q", i, float(i % 7), i % 3) for i in range(100)],
        ["q", "doc", "score", "rel"],
    )
    plan = plan_of(ndcg_at_k(df, "q", "doc", "score", "rel"))
    # hashpartitioning on the query key appears in exactly one Exchange
    q_exchanges = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "_q" in ln
    ]
    assert len(q_exchanges) <= 1, plan


def test_elo_rating_joins_are_broadcast(spark):
    """Each Elo round joins the k-item rating table into the round's
    match counts as a BROADCAST join (the rating table is k rows) —
    a shuffle join per round would pay rounds x full exchanges."""
    from valentinus_spark.operators.preference import elo_ratings

    df = spark.createDataFrame(
        [("A", "B", 1), ("B", "C", 1), ("C", "A", 2)],
        ["winner", "loser", "round"],
    )
    plan = plan_of(elo_ratings(df))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_assortativity_single_scan_moment_fold(spark):
    """degree_assortativity's moment fold is one aggregate over the
    degree-attached edges — no window, no cartesian; degree attach is
    an equi-join on the node key."""
    from valentinus_spark.operators.graph import degree_assortativity

    edges = spark.createDataFrame(
        [(i, (i * 7 + 1) % 50) for i in range(200)], ["src", "dst"]
    )
    plan = plan_of(degree_assortativity(edges))
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_decayed_popularity_single_corpus_shuffle(spark):
    """decayed_popularity's only corpus-sized exchange is the (key, day)
    aggregate; the reference date attaches as a broadcast single-row
    frame (BroadcastNestedLoopJoin over 1 row is the cheap pattern)."""
    import datetime

    from valentinus_spark.operators.rollup import decayed_popularity

    df = spark.createDataFrame(
        [("k%d" % (i % 5), datetime.datetime(2024, 1, 1 + i % 28), float(i))
         for i in range(500)],
        ["k", "ts", "value"],
    )
    plan = plan_of(decayed_popularity(df, "k", "ts", "value"))
    assert "CartesianProduct" not in plan
    # corpus-keyed hash exchanges: the (key, day) partial agg + final
    # key agg — no third corpus shuffle
    corpus_exchanges = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert len(corpus_exchanges) <= 2, plan


def test_char_entropy_zero_shuffle(spark):
    """char_entropy is a pure narrow map (run-length fold over the
    sorted char array) — the plan must contain NO hash-partitioning
    exchange (only the round-robin parallelism spread) and no join."""
    from valentinus_spark.operators.quality import char_entropy

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = plan_of(char_entropy(docs))
    assert "Exchange hashpartitioning" not in plan
    assert "Join" not in plan


def test_ngram_novelty_gram_equi_join_no_pairs(spark):
    """ngram_novelty joins the df table back on the GRAM key — never a
    cartesian or a doc-pair join — and repartitions before shingling
    (single-file cliff)."""
    from valentinus_spark.operators.dedup import ngram_novelty

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = plan_of(ngram_novelty(docs, n=3))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    flat = plan.replace("\n", " ")
    assert "Exchange RoundRobinPartitioning" in flat or "REPARTITION_BY_NUM" in flat


def test_heaps_law_windows_on_group_key(spark):
    """heaps_law's cumulative sums must window on the group key (one
    group-keyed sort per window family), with no cartesian anywhere."""
    from valentinus_spark.operators.quality import heaps_law

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = plan_of(heaps_law(docs, "source"))
    assert "CartesianProduct" not in plan
    assert "Window" in plan


def test_r6_operator_plan_shapes(spark):
    """r6 operator plan pins: no accidental cartesian products in the
    keyed pipelines (the only nested-loop joins allowed are the two
    documented broadcast scoring scans), and matryoshka keeps its
    per-(dim, query) top-k heaps map-side (WindowGroupLimit)."""
    import __spark_entry__ as entry

    for name in (
        "session_paths",
        "textrank_keywords",
        "event_acf",
        "hll_rolling_actives",
        "event_value_cusum",
        "substring_index_search",
        "t_closeness_audit",
    ):
        plan = plan_of(entry.queries()[name](spark, SF_DIR))
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"

    # matryoshka's top-k WindowGroupLimit sits inside a localCheckpointed
    # segment (invisible in the tail plan) — pin the heap on the
    # un-checkpointed scoring stage directly instead
    from valentinus_spark.operators.similarity import matryoshka_fidelity  # noqa: F401

    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = embs.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    from pyspark.sql import Window

    from valentinus_spark.functions.vector import cosine_similarity

    dims_df = spark.createDataFrame([(8,), (64,)], "dim int")
    scored = (
        embs.crossJoin(F.broadcast(queries))
        .crossJoin(F.broadcast(dims_df))
        .select(
            "dim", "qid", "vec_id",
            F.round(
                cosine_similarity(
                    F.slice("embedding", F.lit(1), F.col("dim")),
                    F.slice("qvec", F.lit(1), F.col("dim")),
                ), 4,
            ).alias("_s"),
        )
    )
    w = Window.partitionBy("dim", "qid").orderBy(F.desc("_s"), F.asc("vec_id"))
    top = scored.withColumn("_r", F.row_number().over(w)).filter(F.col("_r") <= 5)
    assert "WindowGroupLimit" in plan_of(top), "matryoshka top-k heap not map-side"


def test_r7_session2_operator_plan_shapes(spark):
    """Plan pins for the round-7 second-wave operators: no cartesian
    products anywhere; the skyline collapse keeps a map-side partial
    min; bloom_semijoin's dim side and frontier joins broadcast."""
    import __spark_entry__ as entry

    for name in (
        "daily_revenue_runs",
        "user_value_sign_test",
        "value_mood_median",
        "user_type_friedman",
        "source_lang_ari",
        "pr_auc_planted",
        "score_brier_logloss",
        "parts_pareto_frontier",
        "user_activity_streaks",
        "event_ljung_box",
        "source_tv_distance",
        "priority_page_trend",
    ):
        plan = plan_of(entry.queries()[name](spark, SF_DIR))
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"


def test_skyline_collapse_is_partial_min_no_selfjoin(spark):
    """The 2-D skyline must be the sort-based plan: a map-side-combined
    min per axis value (partial_min), no dominance self-join (the
    quadratic formulation would sort-merge or nest two data-sized
    sides), and no data-sized single-partition window — the running
    min comes from the distributed device, whose only join broadcasts
    the partition-count offset table."""
    from valentinus_spark.operators import skyline_2d

    parts = spark.read.parquet(f"{SF_DIR}/part.parquet").select(
        "p_size", "p_retailprice"
    )
    plan = plan_of(skyline_2d(parts, "p_retailprice", "p_size"), execute=True)
    assert "partial_min" in plan  # groupBy collapse combines map-side
    # no quadratic dominance join: every join present must broadcast
    # (the device's partition-count offset table), never shuffle
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert "ShuffledHashJoin" not in plan
    # the frontier derivation must not funnel the axis frame through one
    # task: the only SinglePartition exchange feeds the offset-table
    # window (partition-count rows), not the axis-value stream
    assert plan.count("Exchange SinglePartition") <= 1


def test_bloom_semijoin_broadcasts_filter_and_dim(spark):
    """Every join in the bloom-prefiltered semi-join must broadcast
    (bloom bits, positive keys, true dim keys are all bounded); the
    fact table is never shuffled."""
    from valentinus_spark.operators import bloom_semijoin

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select("l_partkey")
    part = spark.read.parquet(f"{SF_DIR}/part.parquet").filter(
        F.col("p_brand") == "Brand#23"
    ).select("p_partkey")
    plan = plan_of(
        bloom_semijoin(li, part, "l_partkey", "p_partkey", m=1 << 16),
        execute=True,
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, "fact side got shuffled for a join"


def test_jaccard_linkpred_hub_cut_before_wedge_join(spark):
    """The degree cap must filter CENTERS before the wedge self-join
    fans out (a Filter on the center degree below the join), and the
    top-k must be TakeOrdered, not a global sort."""
    from valentinus_spark.operators import jaccard_link_prediction

    und = [(i, (i * 7) % 50) for i in range(200) if i != (i * 7) % 50]
    edges = und + [(b, a) for a, b in und]
    df = spark.createDataFrame(edges, ["src", "dst"])
    plan = plan_of(jaccard_link_prediction(df, k=10, max_degree=20))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_bucketed_join_no_exchange(spark):
    """The bucketed-table sort-merge join must have NO Exchange on
    either side — that is the entire point of paying for the bucketed
    layout once."""
    import __spark_entry__ as entry

    df = entry.queries()["bucketed_join_revenue"](spark, SF_DIR)
    plan = plan_of(df, execute=True)
    assert "SortMergeJoin" in plan, "merge hint lost"
    assert plan.count("Bucketed: true") == 2, "bucketed scan not used"
    # in the formatted tree (root-first), the join's CHILDREN print
    # below it — the segment from the SortMergeJoin line down to the
    # detail sections must contain no Exchange (the only allowed ones
    # are the post-join groupBy/orderBy exchanges, printed ABOVE)
    tree = plan.split("\n\n")[0].splitlines()
    smj = next(i for i, ln in enumerate(tree) if "SortMergeJoin" in ln)
    below = "\n".join(tree[smj:])
    assert "Exchange" not in below, f"bucketed join shuffled:\n{below}"


def test_dpp_partitioned_join_dynamic_pruning(spark):
    """The partitioned fact scan must carry a dynamicpruning expression
    in its PartitionFilters — the dim's broadcast is reused as a
    runtime partition filter (2 of 7 year directories read)."""
    import __spark_entry__ as entry

    df = entry.queries()["dpp_partitioned_join"](spark, SF_DIR)
    plan = plan_of(df, execute=True)
    assert "dynamicpruning" in plan, "dynamic partition pruning not applied"
    pf = plan.split("PartitionFilters")[1].split("]")[0]
    assert "dynamicpruning" in pf, "pruning not on the partition filter"
