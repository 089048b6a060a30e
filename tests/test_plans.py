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
