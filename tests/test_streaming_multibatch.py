"""Pinned MULTI-micro-batch replay for the stateful streaming paths.

The equals-batch tests in test_streaming.py read their parquet feed
unconstrained, so availableNow may consume everything in ONE
micro-batch — which never forces the cross-batch seams: the
``state.exists`` update branch of applyInPandasWithState, the
dropDuplicates digest state surviving between batches, and a
time/session window whose rows straddle a batch boundary. Each test
here replays a deterministic 3-way split (write_ordered_batches +
maxFilesPerTrigger=1) built so the interesting entity SPANS batches,
and checks the final answer still equals the batch oracle.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from valentinus_spark.streaming.pipeline import (
    stream_dedup_exact,
    stream_events_sessionized,
    stream_events_windowed,
    write_ordered_batches,
)

BASE = 1704067200  # 2024-01-01 00:00:00 UTC


@pytest.fixture()
def events(spark):
    # 120 events over ~3.7 h; user/event_type cycles guarantee every
    # key appears in every third of the id range (= every micro-batch)
    return spark.range(120).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.lit(BASE) + F.col("id") * 111).alias("ts"),
        (F.col("id") % 5).cast("string").alias("user_id"),
        F.concat(F.lit("type"), F.col("id") % 3).alias("event_type"),
        (F.col("id") % 100 / 10.0).alias("value"),
    )


def _three_batches(events, feed):
    # split by id thirds: ts is monotone in id, so batch boundaries cut
    # straight through open windows/sessions and running totals
    write_ordered_batches(
        events,
        [F.col("event_id") < 40,
         (F.col("event_id") >= 40) & (F.col("event_id") < 80),
         F.col("event_id") >= 80],
        feed,
    )


def _one_file_stream(spark, events, feed):
    return (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(feed)
    )


def test_user_totals_state_carries_across_batches(spark, tmp_path, events):
    """Every user appears in all 3 batches, so the final emitted totals
    are only right if the GroupState update branch ADDS to the carried
    (n, sum) instead of restarting it."""
    from valentinus_spark.streaming.stateful import stream_user_totals

    feed = str(tmp_path / "feed")
    _three_batches(events, feed)
    q = (
        stream_user_totals(_one_file_stream(spark, events, feed))
        .writeStream.format("memory")
        .queryName("mb_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {}
    for r in spark.sql("SELECT * FROM mb_totals").collect():
        got[r["user_id"]] = (r["n_events"], r["sum_value"])  # latest wins
    expected = {
        r["user_id"]: (r["n"], round(r["s"], 4))
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == expected
    # the memory sink saw one row per (user, touching batch): 3 each —
    # proof the feed really ran as three micro-batches
    assert spark.sql("SELECT count(*) AS c FROM mb_totals").first()["c"] == 15


def test_dedup_exact_drops_duplicate_from_a_later_batch(spark, tmp_path):
    """A digest admitted in batch 0 shows up again in batches 1 and 2:
    only the dropDuplicates STATE (not within-batch dedup) can drop it."""
    docs = spark.createDataFrame(
        [
            (0, 0, "alpha doc"),
            (1, 0, "beta doc"),
            (2, 1, "ALPHA   doc"),   # dup of 0, later batch
            (3, 1, "gamma doc"),
            (4, 2, "beta DOC"),      # dup of 1, two batches later
            (5, 2, "delta doc"),
        ],
        "doc_id long, b int, document string",
    )
    feed = str(tmp_path / "feed")
    write_ordered_batches(
        docs, [F.col("b") == 0, F.col("b") == 1, F.col("b") == 2], feed
    )
    out = str(tmp_path / "out")
    q = (
        stream_dedup_exact(_one_file_stream(spark, docs, feed))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert kept == {0, 1, 3, 5}


def test_windowed_agg_merges_window_split_across_batches(spark, tmp_path, events):
    """ts is monotone in event_id, so the id-third boundaries land
    inside open hour windows; the final table is only right if the
    streaming agg state merges the partial counts batch over batch."""
    feed = str(tmp_path / "feed")
    _three_batches(events, feed)
    q = (
        stream_events_windowed(_one_file_stream(spark, events, feed))
        .writeStream.format("memory")
        .queryName("mb_win")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM mb_win").collect()
    }
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in stream_events_windowed(events).collect()
    }
    assert got == expected


def test_session_straddling_a_batch_boundary_stays_one_session(
    spark, tmp_path
):
    """One user's events run 90 s apart ACROSS the batch split (well
    under the 30 min gap): the split must not cut the session in two."""
    rows = [(i, BASE + i * 90, "u1", "click", 1.0) for i in range(6)]
    rows += [(10, BASE + 7200, "u2", "view", 2.0)]  # u2 far away, batch 1
    df = spark.createDataFrame(
        rows, "event_id long, sec long, user_id string, event_type string, value double"
    ).select(
        "event_id",
        F.timestamp_seconds("sec").alias("ts"),
        "user_id",
        "event_type",
        "value",
    )
    feed = str(tmp_path / "feed")
    write_ordered_batches(df, [F.col("event_id") < 3, F.col("event_id") >= 3], feed)
    q = (
        stream_events_sessionized(_one_file_stream(spark, df, feed))
        .writeStream.format("memory")
        .queryName("mb_sess")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in spark.sql("SELECT * FROM mb_sess").collect()
    }
    expected = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in stream_events_sessionized(df).collect()
    }
    assert got == expected
    assert sum(n for (u, _), n in got.items() if u == "u1") == 6
    assert len([1 for (u, _) in got if u == "u1"]) == 1
