"""Time rollup (operators/rollup.py): merged rollup+tail must equal the
direct aggregation over all raw rows (partials are mergeable monoids)."""

from pyspark.sql import functions as F

from valentinus_spark.operators.rollup import build_time_rollup, merged_rollup


def _events(spark, n=500):
    return spark.range(n).select(
        F.timestamp_seconds(F.lit(1704067200) + F.col("id") * 137).alias("ts"),
        F.concat(F.lit("t"), (F.col("id") % 3)).alias("event_type"),
        (F.col("id") % 97 / 7.0).alias("value"),
    )


def _as_dict(df):
    return {
        (r["bucket_start"], r["key"]): (
            r["n"],
            round(r["sum_value"], 6),
            round(r["min_value"], 6),
            round(r["max_value"], 6),
        )
        for r in df.collect()
    }


def test_merged_rollup_equals_direct(spark):
    ev = _events(spark)
    cutoff = "2024-01-01 10:00:00"
    rollup = build_time_rollup(ev.filter(F.col("ts") < cutoff))
    tail = ev.filter(F.col("ts") >= cutoff)
    merged = merged_rollup(rollup, tail)
    direct = build_time_rollup(ev)
    assert _as_dict(merged) == _as_dict(direct)


def test_merged_rollup_with_empty_tail(spark):
    ev = _events(spark, n=100)
    rollup = build_time_rollup(ev)
    empty = ev.filter(F.lit(False))
    assert _as_dict(merged_rollup(rollup, empty)) == _as_dict(build_time_rollup(ev))


def test_rollup_cutoff_inside_bucket_merges_partials(spark):
    # cutoff mid-bucket: both sides contribute partials to the same bucket
    ev = _events(spark, n=200)
    cutoff = "2024-01-01 01:30:00"
    rollup = build_time_rollup(ev.filter(F.col("ts") < cutoff))
    merged = merged_rollup(rollup, ev.filter(F.col("ts") >= cutoff))
    assert _as_dict(merged) == _as_dict(build_time_rollup(ev))
