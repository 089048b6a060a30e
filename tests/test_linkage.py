"""Blocked entity resolution (operators/linkage.py), small-file
compaction (operators/layout.py::compact_small_files), key-skew
diagnostics (operators/skew.py::key_skew_profile), and the deterministic
ordered-batch stream feed (streaming/pipeline.py::write_ordered_batches).
"""

import glob
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from valentinus_spark.operators.linkage import (
    blocking_keys,
    candidate_pairs,
    linkage_pairs,
)


def _people(spark):
    return spark.createDataFrame(
        [
            Row(pid=1, name="Ada  Lovelace"),
            Row(pid=2, name="ada lovelace"),  # case/space variant of 1
            Row(pid=3, name="Ada Lovelance"),  # 1 edit from 1
            Row(pid=4, name="Grace Hopper"),
            Row(pid=5, name="Grace Hoppers"),  # 1 edit from 4
            Row(pid=6, name="Alan Turing"),  # no near neighbor
            Row(pid=7, name="completely different entity record"),
        ]
    )


def test_linkage_finds_variants_not_strangers(spark):
    got = linkage_pairs(_people(spark), "pid", "name", max_dist=3).collect()
    pairs = {(r["id_a"], r["id_b"]): r for r in got}
    assert (1, 2) in pairs and pairs[(1, 2)]["edit_dist"] == 0
    assert (1, 3) in pairs and pairs[(1, 3)]["edit_dist"] > 0
    assert (4, 5) in pairs
    assert not any(6 in p or 7 in p for p in pairs)


def test_linkage_normalization_yields_sim_one_for_case_variants(spark):
    got = linkage_pairs(_people(spark), "pid", "name", max_dist=3).collect()
    row = next(r for r in got if (r["id_a"], r["id_b"]) == (1, 2))
    assert row["name_sim"] == 1.0


def test_candidate_pairs_symmetric_and_deduped(spark):
    cands = candidate_pairs(_people(spark), "pid", "name").collect()
    seen = [(r["id_a"], r["id_b"]) for r in cands]
    assert len(seen) == len(set(seen))  # distinct across schemes
    assert all(a < b for a, b in seen)


def test_block_purging_caps_hot_blocks(spark):
    # 60 records sharing one giant block + 2 true variants; max_block
    # below the hot-block size must purge it while keeping the pair
    # that also blocks via the (distinct) last-token scheme.
    rows = [Row(pid=i, name=f"common prefix {i:02d}") for i in range(60)]
    rows += [Row(pid=100, name="unique tail alpha"), Row(pid=101, name="uniqeu tail alpha")]
    df = spark.createDataFrame(rows)
    got = candidate_pairs(df, "pid", "name", max_block=10).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in got}
    assert (100, 101) in pairs
    assert all(a >= 100 for a, _ in pairs)  # hot block fully purged


def test_blocking_keys_band_width():
    keys = blocking_keys("name", band=4)
    assert len(keys) == 2


def test_compaction_lossless_and_exact_file_count(spark, tmp_path):
    from valentinus_spark.operators.layout import compact_small_files, file_stats

    df = spark.range(0, 500).select(
        F.col("id"), F.concat(F.lit("payload-"), F.col("id")).alias("text")
    )
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df.repartition(16).write.parquet(src)
    assert file_stats(spark, src).count() == 16
    compacted = compact_small_files(spark, src, dst, target_files=3)
    assert file_stats(spark, dst).count() == 3
    assert len(glob.glob(os.path.join(dst, "part-*.parquet"))) == 3
    assert sorted(r["id"] for r in compacted.collect()) == list(range(500))


def test_compaction_sorted_mode_clusters_ranges(spark, tmp_path):
    from valentinus_spark.operators.layout import (
        compact_small_files,
        file_minmax_manifest,
    )

    df = spark.range(0, 1000).select(F.col("id"), (F.col("id") % 7).alias("v"))
    src, dst = str(tmp_path / "s2"), str(tmp_path / "d2")
    df.repartition(20).write.parquet(src)
    compact_small_files(spark, src, dst, target_files=4, sort_cols=["id"])
    man = file_minmax_manifest(spark, dst, ["id"]).collect()
    assert len(man) == 4
    # range-partitioned + sorted => per-file id ranges must not overlap
    spans = sorted((r["min_id"], r["max_id"]) for r in man)
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi < lo


def test_key_skew_profile_flags_hot_key(spark):
    from valentinus_spark.operators.skew import key_skew_profile

    rows = [Row(k="hot")] * 90 + [Row(k=f"cold{i}") for i in range(10)]
    prof = key_skew_profile(spark.createDataFrame(rows), "k", top_n=3).collect()
    assert prof[0]["key"] == "hot"
    assert prof[0]["n_rows"] == 90
    assert prof[0]["share"] == 0.9
    # 11 distinct keys, uniform would be 100/11 rows: hotness = 90*11/100
    assert prof[0]["hotness"] == pytest.approx(9.9, abs=1e-6)


def test_write_ordered_batches_orders_files_by_mtime(spark, tmp_path):
    from valentinus_spark.streaming.pipeline import write_ordered_batches

    df = spark.range(0, 100).select(F.col("id"))
    feed = str(tmp_path / "feed")
    files = write_ordered_batches(
        df, [F.col("id") < 50, F.col("id") >= 50], feed
    )
    assert [os.path.basename(f) for f in files] == [
        "batch000.parquet",
        "batch001.parquet",
    ]
    assert os.path.getmtime(files[0]) < os.path.getmtime(files[1])
    back = spark.read.parquet(feed)
    assert back.count() == 100


def test_late_finalize_append_matches_batch_frontier(spark, tmp_path):
    """Append-mode windowed agg over a 2-batch replay equals the batch
    aggregate restricted to windows with end <= max(ts) - delay (the
    finalization frontier) — the semantics late_window_finalize's
    oracle encodes."""
    import datetime as dt

    from valentinus_spark.streaming.pipeline import (
        stream_events_windowed,
        write_ordered_batches,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        Row(event_id=i, ts=t0 + dt.timedelta(minutes=17 * i), event_type="a", value=1.0)
        for i in range(40)
    ]
    df = spark.createDataFrame(rows)
    feed = str(tmp_path / "latefeed")
    write_ordered_batches(
        df, [F.col("event_id") % 2 == 0, F.col("event_id") % 2 == 1], feed
    )
    stream = (
        spark.readStream.schema(spark.read.parquet(feed).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(feed)
    )
    agg = stream_events_windowed(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("late_fin_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (str(r["window_start"]), r["n_events"])
        for r in spark.table("late_fin_test").collect()
    )
    max_ts = max(r.ts for r in rows)
    frontier = max_ts - dt.timedelta(hours=2)
    batch = stream_events_windowed(df, window="1 hour", watermark="2 hours")
    want = sorted(
        (str(r["window_start"]), r["n_events"])
        for r in batch.collect()
        if r["window_start"] + dt.timedelta(hours=1) <= frontier
    )
    assert got == want
    assert len(got) < batch.count()  # tail windows withheld as open


def test_semantic_contamination_flags_planted_leak(spark):
    from valentinus_spark.operators.contamination import semantic_contamination

    # benchmark = 2 unit vectors; corpus = them (leaked) + orthogonal + near-dup
    rows = [
        (1, [1.0, 0.0, 0.0]),     # leaked verbatim
        (2, [0.0, 1.0, 0.0]),     # leaked verbatim
        (3, [0.0, 0.0, 1.0]),     # orthogonal -> clean
        (4, [0.999, 0.04, 0.0]),  # paraphrase-close to #1 -> flagged
        (5, [0.7, 0.7, 0.0]),     # mid similarity -> clean at 0.99
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    bench = corpus.filter("vec_id in (1, 2)")
    got = {r.vec_id: (r.max_cosine, r.contaminated)
           for r in semantic_contamination(corpus, bench, threshold=0.99).collect()}
    assert got[1] == (1.0, True) and got[2] == (1.0, True)
    assert got[3][0] == 0.0 and not got[3][1]
    import math
    exp4 = round(0.999 / math.sqrt(0.999**2 + 0.04**2), 4)
    assert got[4] == (exp4, exp4 >= 0.99)
    assert got[5][0] == round(0.7 / math.sqrt(0.98), 4) and not got[5][1]


def test_semantic_contamination_threshold_validation(spark):
    import pytest
    from valentinus_spark.operators.contamination import semantic_contamination

    df = spark.createDataFrame([(1, [1.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        semantic_contamination(df, df, threshold=0.0)
