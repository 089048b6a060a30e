"""Structured Streaming tests (streaming/pipeline.py): the streaming
windowed agg must equal its batch run (the batch expression IS the
oracle), and incremental collection append embeds on the stream path."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from valentinus_spark.embed import HashEmbedder
from valentinus_spark.streaming.pipeline import (
    stream_collection_append,
    stream_events_windowed,
)


def _write_events(spark, path, n=200):
    rows = [
        (
            i,
            # spread across ~4 hours, some late/duplicated timestamps
            F.lit(None),
        )
        for i in range(n)
    ]
    df = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(
            F.lit(1704067200) + (F.col("id") * 67) % 14400
        ).alias("ts"),
        (F.col("id") % 7).alias("user_id"),
        F.concat(F.lit("type"), (F.col("id") % 3)).alias("event_type"),
        (F.col("id") % 100 / 10.0).alias("value"),
    )
    df.write.mode("overwrite").parquet(path)
    return df


def test_stream_windowed_equals_batch(spark, tmp_path):
    path = str(tmp_path / "events")
    _write_events(spark, path)
    batch = spark.read.parquet(path)
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in stream_events_windowed(batch).collect()
    }

    stream = spark.readStream.schema(batch.schema).parquet(path)
    agg = stream_events_windowed(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("win_agg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM win_agg").collect()
    }
    assert got == expected


def test_stateful_user_totals_equals_batch(spark, tmp_path):
    """applyInPandasWithState running totals must equal the batch groupBy
    after consuming the whole stream."""
    from valentinus_spark.streaming.stateful import stream_user_totals

    path = str(tmp_path / "events_state")
    _write_events(spark, path)
    batch = spark.read.parquet(path)
    expected = {
        r["user_id"]: (r["n"], round(r["s"], 4))
        for r in batch.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }

    stream = spark.readStream.schema(batch.schema).parquet(path)
    q = (
        stream_user_totals(stream)
        .writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_state"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # latest emitted row per user wins
    got_rows = spark.sql("SELECT * FROM user_totals").collect()
    got = {}
    for r in got_rows:
        got[r["user_id"]] = (r["n_events"], r["sum_value"])
    assert got == expected


def test_stream_collection_append_embeds(spark, tmp_path):
    src = str(tmp_path / "docs_in")
    out = str(tmp_path / "collection")
    ckpt = str(tmp_path / "ckpt")
    docs = spark.createDataFrame(
        [(f"id{i}", f"document number {i}") for i in range(20)],
        "id string, document string",
    )
    docs.write.parquet(src)

    emb = HashEmbedder(dim=16)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = stream_collection_append(stream, emb, out, ckpt)
    q.awaitTermination(120)

    result = spark.read.parquet(out)
    assert result.count() == 20
    row = result.filter(F.col("id") == "id3").first()
    np.testing.assert_allclose(
        np.array(row["embedding"]),
        emb.embed_texts(["document number 3"])[0],
        rtol=1e-6,
    )


def test_stream_dedup_exact_equals_batch(spark, tmp_path):
    """Streaming dedup must keep exactly one row per normalized text."""
    from valentinus_spark.streaming.pipeline import stream_dedup_exact

    path = str(tmp_path / "docs_dup")
    docs = spark.range(60).select(
        F.col("id").alias("doc_id"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id") * 60).alias("ts"),
        # 20 distinct texts, each appearing 3 times (with case/space noise)
        F.concat(
            F.when(F.col("id") % 3 == 0, F.lit("  ")).otherwise(F.lit("")),
            F.lit("document number "),
            (F.col("id") % 20).cast("string"),
        ).alias("document"),
    )
    docs.write.mode("overwrite").parquet(path)
    batch = spark.read.parquet(path)

    stream = spark.readStream.schema(batch.schema).parquet(path)
    q = (
        stream_dedup_exact(stream, ts_col="ts", watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM dedup_stream")
    assert got.count() == 20
    assert got.columns == ["doc_id", "ts", "document"]
    # batch path through the same operator agrees on the distinct count
    assert stream_dedup_exact(batch).count() == 20


def test_stream_stream_join_equals_batch(spark, tmp_path):
    """Watermarked stream-stream join must equal the same join on batch."""
    from valentinus_spark.streaming.pipeline import stream_stream_join

    lpath, rpath = str(tmp_path / "ss_left"), str(tmp_path / "ss_right")
    base = 1704067200
    left = spark.range(50).select(
        F.col("id").alias("eid"),
        (F.col("id") % 5).alias("user_id"),
        F.timestamp_seconds(F.lit(base) + F.col("id") * 120).alias("ts"),
    )
    right = spark.range(80).select(
        F.col("id").alias("cid"),
        (F.col("id") % 5).alias("user_id"),
        F.timestamp_seconds(F.lit(base) + F.col("id") * 77).alias("ts"),
    )
    left.write.parquet(lpath)
    right.write.parquet(rpath)
    lb, rb = spark.read.parquet(lpath), spark.read.parquet(rpath)
    expected = {
        (r["l_eid"], r["r_cid"])
        for r in stream_stream_join(lb, rb, key="user_id", within="10 minutes").collect()
    }
    assert expected  # non-degenerate scenario

    ls = spark.readStream.schema(lb.schema).parquet(lpath)
    rs = spark.readStream.schema(rb.schema).parquet(rpath)
    q = (
        stream_stream_join(ls, rs, key="user_id", within="10 minutes")
        .writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ss"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["l_eid"], r["r_cid"])
        for r in spark.sql("SELECT * FROM ss_join").collect()
    }
    assert got == expected


def test_checkpoint_makes_rerun_idempotent(spark, tmp_path):
    """Re-running an availableNow stream with the SAME checkpoint must
    process nothing new — the exactly-once guarantee a restarted ingest
    pipeline depends on."""
    from valentinus_spark.embed import HashEmbedder
    from valentinus_spark.streaming.pipeline import stream_collection_append

    src, out, ckpt = (str(tmp_path / p) for p in ("src", "out", "ckpt"))
    docs = spark.range(25).select(
        F.concat(F.lit("id"), F.col("id")).alias("id"),
        F.concat(F.lit("doc "), F.col("id")).alias("document"),
    )
    docs.write.parquet(src)
    emb = HashEmbedder(dim=8)
    for _ in range(2):  # second run: same checkpoint, no new source files
        stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
        q = stream_collection_append(stream, emb, out, ckpt)
        q.awaitTermination(120)
    assert spark.read.parquet(out).count() == 25  # not 50


def test_stream_sessionized_equals_batch(spark, tmp_path):
    from valentinus_spark.streaming.pipeline import stream_events_sessionized

    path = str(tmp_path / "events_sess")
    _write_events(spark, path)
    batch = spark.read.parquet(path)
    expected = {
        (r["user_id"], r["session_start"], r["session_end"]): (
            r["n_events"],
            r["sum_value"],
        )
        for r in stream_events_sessionized(batch, gap="10 minutes").collect()
    }
    assert expected  # sessions exist
    assert any(v[0] > 1 for v in expected.values())  # some sessions merge events

    stream = spark.readStream.schema(batch.schema).parquet(path)
    q = (
        stream_events_sessionized(stream, gap="10 minutes")
        .writeStream.format("memory")
        .queryName("sess_agg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"], r["session_end"]): (
            r["n_events"],
            r["sum_value"],
        )
        for r in spark.sql("SELECT * FROM sess_agg").collect()
    }
    assert got == expected


def test_stream_static_enrich_equals_batch(spark, tmp_path):
    """Stream-static broadcast enrichment + windowed rollup must equal the
    same join+agg on batch."""
    from valentinus_spark.streaming.pipeline import stream_static_enrich

    epath = str(tmp_path / "enrich_events")
    base = 1704067200
    events = spark.range(200).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 7).alias("user_id"),
        F.timestamp_seconds(F.lit(base) + F.col("id") * 97).alias("ts"),
        (F.col("id") * 1.5).alias("value"),
    )
    dim = spark.range(7).select(
        F.col("id").alias("c_custkey"),
        F.concat(F.lit("seg"), (F.col("id") % 3)).alias("c_mktsegment"),
    )
    events.write.parquet(epath)
    eb = spark.read.parquet(epath)
    expected = {
        (r["window_start"], r["c_mktsegment"], r["n_events"], r["sum_value"])
        for r in stream_static_enrich(eb, dim).collect()
    }
    assert len(expected) > 1

    es = spark.readStream.schema(eb.schema).parquet(epath)
    q = (
        stream_static_enrich(es, dim)
        .writeStream.format("memory")
        .queryName("enrich_result")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_enrich"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["c_mktsegment"], r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM enrich_result").collect()
    }
    assert got == expected


def test_stream_incremental_dedup_grows_corpus_without_dups(spark, tmp_path):
    """Each micro-batch dedups against everything earlier batches
    admitted; restart-with-new-data continues from the corpus table."""
    from valentinus_spark.streaming.pipeline import stream_incremental_dedup

    src = str(tmp_path / "incoming")
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [(0, "first document"), (1, "second document"), (2, "FIRST   document")],
        "doc_id long, text string",
    ).write.parquet(src)

    schema = "doc_id long, text string"
    stream = spark.readStream.schema(schema).parquet(src)
    q = stream_incremental_dedup(stream, corpus, ckpt)
    q.awaitTermination(120)
    got1 = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
    # doc 2 is an exact dup of doc 0 after normalization
    assert got1 == {0, 1}

    # second wave: one dup of the admitted corpus, one genuinely new
    spark.createDataFrame(
        [(10, "second DOCUMENT"), (11, "a third one")], "doc_id long, text string"
    ).write.mode("append").parquet(src)
    stream2 = spark.readStream.schema(schema).parquet(src)
    q2 = stream_incremental_dedup(stream2, corpus, ckpt)
    q2.awaitTermination(120)
    got2 = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
    assert got2 == {0, 1, 11}


def test_hll_state_merge_is_idempotent_and_batching_independent(spark, tmp_path):
    """The streaming sketch state equals the batch sketch regardless of
    micro-batching, and replaying a batch (foreachBatch at-least-once
    delivery) changes nothing — union+max is idempotent."""
    from valentinus_spark.operators.sketches import hll_registers
    from valentinus_spark.streaming.pipeline import merge_hll_state

    df = spark.createDataFrame(
        [(i % 97, "t%d" % (i % 3)) for i in range(500)], "user_id long, et string"
    )
    state = str(tmp_path / "regs")

    def snap():
        return {
            (r["et"], r["idx"]): r["rho"]
            for r in spark.read.parquet(state).collect()
        }

    b1 = df.where("user_id % 2 = 0")
    b2 = df.where("user_id % 2 = 1")
    merge_hll_state(b1, state, "user_id", ["et"], 4)
    merge_hll_state(b2, state, "user_id", ["et"], 4)
    streamed = snap()
    merge_hll_state(b2, state, "user_id", ["et"], 4)  # replay: no-op
    assert snap() == streamed
    batch = {
        (r["et"], r["idx"]): r["rho"]
        for r in hll_registers(df, "user_id", ["et"], p=4).collect()
    }
    assert streamed == batch


def test_hll_state_merge_crash_recovery_and_cleanup(spark, tmp_path):
    """Crash-safety contract of merge_hll_state (ADVICE r3): the _next
    write-aside is cleaned up after a successful swap, a crash that
    deleted state_path mid-swap recovers from _next with zero loss, and
    a corrupt (non-parquet-readable-but-present) state raises instead of
    silently resetting the sketch to an undercount."""
    import shutil

    from valentinus_spark.streaming.pipeline import merge_hll_state

    df = spark.createDataFrame(
        [(i % 53, "t%d" % (i % 2)) for i in range(300)], "user_id long, et string"
    )
    state = str(tmp_path / "regs")

    def snap():
        return {
            (r["et"], r["idx"]): r["rho"]
            for r in spark.read.parquet(state).collect()
        }

    b1 = df.where("user_id % 2 = 0")
    b2 = df.where("user_id % 2 = 1")
    merge_hll_state(b1, state, "user_id", ["et"], 4)
    assert not os.path.exists(state + "_next"), "_next must be cleaned after swap"
    merge_hll_state(b2, state, "user_id", ["et"], 4)
    full = snap()

    # simulate a crash between "state_path deleted" and "state_path
    # rewritten": the recovery copy _next exists, state_path does not
    shutil.copytree(state, state + "_next")
    shutil.rmtree(state)
    merge_hll_state(b2, state, "user_id", ["et"], 4)  # replayed batch
    assert snap() == full, "recovery from _next must lose nothing"
    assert not os.path.exists(state + "_next")

    # a present-but-corrupt state must raise, not silently reset
    shutil.rmtree(state)
    os.makedirs(state)
    with open(os.path.join(state, "part-00000.parquet"), "wb") as f:
        f.write(b"not a parquet file")
    with pytest.raises(Exception):
        merge_hll_state(b1, state, "user_id", ["et"], 4)


def test_cm_state_merge_exactly_once_and_batching_independent(spark, tmp_path):
    """Count-Min streaming state: additive merge (NOT idempotent like
    HLL's union+max) made exactly-once by batch_id-stamped versioned
    commits — a replayed batch is a committed no-op, the final registers
    equal the one-shot batch sketch regardless of micro-batching, and
    each batch's snapshot is time-travelable."""
    from valentinus_spark.operators.sketches import count_min_sketch
    from valentinus_spark.sources.versioned import list_versions, read_version
    from valentinus_spark.streaming.pipeline import merge_cm_state

    df = spark.createDataFrame(
        [(i, "t%d" % (i % 5)) for i in range(400)], "event_id long, event_type string"
    )
    state = str(tmp_path / "cmregs")
    b1 = df.where("event_id % 2 = 0")
    b2 = df.where("event_id % 2 = 1")

    merge_cm_state(b1, state, "event_type", batch_id=0, depth=4, width=64)
    merge_cm_state(b2, state, "event_type", batch_id=1, depth=4, width=64)

    def snap():
        return {
            (r["row"], r["bucket"]): r["cnt"]
            for r in read_version(spark, state).collect()
        }

    streamed = snap()
    # replay batch 1 (at-least-once delivery): additive state would
    # double-count; the versioned commit makes it a no-op
    merge_cm_state(b2, state, "event_type", batch_id=1, depth=4, width=64)
    assert snap() == streamed
    assert len(list_versions(state)) == 2  # no third commit from the replay

    batch = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in count_min_sketch(df, "event_type", depth=4, width=64).collect()
    }
    assert streamed == batch
    # time travel: the first committed version is exactly batch 1's sketch
    first_v = list_versions(state)[0]
    v0 = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in read_version(spark, state, first_v).collect()
    }
    assert v0 == {
        (r["row"], r["bucket"]): r["cnt"]
        for r in count_min_sketch(b1, "event_type", depth=4, width=64).collect()
    }


def test_hll_state_swap_killed_mid_swap_recovers(spark, tmp_path, monkeypatch):
    """TRUE failure injection for the HLL state swap (VERDICT r5 item
    7): the writer is killed (raises) at the exact point the r4 fix
    targets — _next fully written, state_path destroyed, rewrite never
    lands — by intercepting the swap's own write call, not by
    hand-building the post-crash disk layout. The replayed batch must
    restore from _next and converge to the batch-oracle registers."""
    import shutil

    import pyspark.sql.readwriter as rw

    from valentinus_spark.operators.sketches import hll_registers
    from valentinus_spark.streaming.pipeline import merge_hll_state

    df = spark.createDataFrame(
        [(i % 61, "t%d" % (i % 2)) for i in range(400)], "user_id long, et string"
    )
    state = str(tmp_path / "regs")
    b1 = df.where("user_id % 2 = 0")
    b2 = df.where("user_id % 2 = 1")
    merge_hll_state(b1, state, "user_id", ["et"], 4)

    orig = rw.DataFrameWriter.parquet
    armed = {"on": True}

    def dying(self, path, *a, **k):
        if armed["on"] and path == state and os.path.exists(state + "_next"):
            armed["on"] = False
            # model the worst instant of mode("overwrite"): the old
            # state is already deleted, the rewrite never happens
            shutil.rmtree(state, ignore_errors=True)
            raise RuntimeError("injected crash mid-swap")
        return orig(self, path, *a, **k)

    monkeypatch.setattr(rw.DataFrameWriter, "parquet", dying)
    with pytest.raises(RuntimeError, match="injected crash mid-swap"):
        merge_hll_state(b2, state, "user_id", ["et"], 4)
    assert not os.path.exists(state), "crash left state_path destroyed"
    assert os.path.exists(state + "_next"), "_next must survive the crash"

    # restart: Structured Streaming replays the batch (checkpoint never
    # advanced). Recovery restores from _next; union+max idempotence
    # makes re-merging b2 a no-op on top of the restored merge.
    merge_hll_state(b2, state, "user_id", ["et"], 4)
    got = {
        (r["et"], r["idx"]): r["rho"] for r in spark.read.parquet(state).collect()
    }
    want = {
        (r["et"], r["idx"]): r["rho"]
        for r in hll_registers(df, "user_id", ["et"], p=4).collect()
    }
    assert got == want, "recovery must lose nothing vs the batch oracle"
    assert not os.path.exists(state + "_next"), "_next cleaned after recovery"


def test_cm_state_commit_killed_before_manifest_publish_recovers(
    spark, tmp_path, monkeypatch
):
    """Failure injection for the CM versioned-commit swap: kill the
    commit between the data write and the manifest publish (the
    os.replace). The manifest-last invariant means no reader saw the
    orphan files — and the RETRIED commit must succeed (a prior bug:
    mode='error' on the surviving commit dir failed every retry with
    'path already exists') and land exactly-once."""
    import os as _os

    from valentinus_spark.operators.sketches import count_min_sketch
    from valentinus_spark.sources.versioned import list_versions, read_version
    from valentinus_spark.streaming.pipeline import merge_cm_state

    df = spark.createDataFrame(
        [(i, "t%d" % (i % 5)) for i in range(400)], "event_id long, event_type string"
    )
    state = str(tmp_path / "cmregs")
    b1 = df.where("event_id % 2 = 0")
    b2 = df.where("event_id % 2 = 1")
    merge_cm_state(b1, state, "event_type", batch_id=0, depth=4, width=64)

    orig_replace = _os.replace
    armed = {"on": True}

    def dying(src, dst, *a, **k):
        if armed["on"] and str(dst).startswith(state):
            armed["on"] = False
            raise RuntimeError("injected crash before manifest publish")
        return orig_replace(src, dst, *a, **k)

    monkeypatch.setattr(_os, "replace", dying)
    with pytest.raises(RuntimeError, match="injected crash"):
        merge_cm_state(b2, state, "event_type", batch_id=1, depth=4, width=64)
    # the crashed commit is invisible: latest version is still batch 0's
    assert len(list_versions(state)) == 1

    # restart/replay: the retried commit must clean the orphan data dir
    # and publish exactly one new version
    merge_cm_state(b2, state, "event_type", batch_id=1, depth=4, width=64)
    assert len(list_versions(state)) == 2
    got = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in read_version(spark, state).collect()
    }
    want = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in count_min_sketch(df, "event_type", depth=4, width=64).collect()
    }
    assert got == want
    # a second replay of the same batch_id stays a no-op
    merge_cm_state(b2, state, "event_type", batch_id=1, depth=4, width=64)
    assert len(list_versions(state)) == 2


def test_stream_cm_registers_end_to_end(spark, tmp_path):
    """The actual StreamingQuery path: two pinned micro-batches through
    stream_cm_registers; final estimates equal batch CM estimates."""
    from valentinus_spark.operators.sketches import count_min_estimate, count_min_sketch
    from valentinus_spark.sources.versioned import read_version
    from valentinus_spark.streaming.pipeline import (
        stream_cm_registers,
        write_ordered_batches,
    )

    df = spark.createDataFrame(
        [(i, "t%d" % (i % 3)) for i in range(300)], "event_id long, event_type string"
    )
    feed = str(tmp_path / "feed")
    write_ordered_batches(
        df, [F.col("event_id") % 2 == 0, F.col("event_id") % 2 == 1], feed
    )
    stream = (
        spark.readStream.schema(spark.read.parquet(feed).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(feed)
    )
    state = str(tmp_path / "cmstate")
    q = stream_cm_registers(
        stream, state, str(tmp_path / "ckpt"), "event_type", depth=4, width=64
    )
    q.awaitTermination(120)
    probes = df.select("event_type").distinct()
    got = {
        r["event_type"]: r["est_count"]
        for r in count_min_estimate(
            read_version(spark, state), probes, "event_type", depth=4, width=64
        ).collect()
    }
    expect = {
        r["event_type"]: r["est_count"]
        for r in count_min_estimate(
            count_min_sketch(df, "event_type", depth=4, width=64),
            probes, "event_type", depth=4, width=64,
        ).collect()
    }
    assert got == expect and sum(got.values()) >= 300


def test_stream_stream_left_outer_join_finalized_region(spark, tmp_path):
    """Left-outer stream-stream join: within the watermark-FINALIZED
    region (left_ts <= terminal watermark) the streamed result must
    equal the batch left join — matched rows identical AND unmatched
    lefts present with NULL right columns. Rows past the finalized
    region are allowed to be missing their NULL row (the watermark
    never passes them) but must never produce a WRONG row."""
    from valentinus_spark.streaming.pipeline import stream_stream_join

    base = 1704067200
    lpath, rpath = str(tmp_path / "lo_left"), str(tmp_path / "lo_right")
    # odd users get no clicks at all -> guaranteed unmatched lefts
    left = spark.range(60).select(
        F.col("id").alias("eid"),
        (F.col("id") % 6).alias("user_id"),
        F.timestamp_seconds(F.lit(base) + F.col("id") * 120).alias("ts"),
    )
    right = spark.range(90).select(
        F.col("id").alias("cid"),
        ((F.col("id") % 3) * 2).alias("user_id"),  # users 0,2,4 only
        F.timestamp_seconds(F.lit(base) + F.col("id") * 77).alias("ts"),
    )
    left.write.parquet(lpath)
    right.write.parquet(rpath)
    lb, rb = spark.read.parquet(lpath), spark.read.parquet(rpath)

    wm, within = "10 minutes", "10 minutes"
    batch = stream_stream_join(lb, rb, key="user_id", within=within, how="left_outer")
    max_rts = rb.agg(F.max("ts")).collect()[0][0]
    import datetime

    cutoff = max_rts - datetime.timedelta(minutes=10)
    expected = {
        (r["l_eid"], r["r_cid"])
        for r in batch.collect()
        if r["l_ts"] <= cutoff
    }
    assert any(c is None for _, c in expected), "fixture lacks unmatched lefts"

    ls = spark.readStream.schema(lb.schema).parquet(lpath)
    rs = spark.readStream.schema(rb.schema).parquet(rpath)
    q = (
        stream_stream_join(ls, rs, key="user_id", within=within, watermark=wm, how="left_outer")
        .writeStream.format("memory")
        .queryName("lo_join")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_lo"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got_rows = spark.sql("SELECT * FROM lo_join").collect()
    got_final = {
        (r["l_eid"], r["r_cid"]) for r in got_rows if r["l_ts"] <= cutoff
    }
    assert got_final == expected
    # nothing outside the batch result ever appears (no wrong rows)
    batch_all = {(r["l_eid"], r["r_cid"]) for r in batch.collect()}
    assert {(r["l_eid"], r["r_cid"]) for r in got_rows} <= batch_all


def test_stream_stream_full_outer_join_no_wrong_rows(spark, tmp_path):
    """Full-outer stream-stream join: within the finalized region both
    sides' NULL rows appear exactly as in the batch full join; globally
    no row ever appears that batch would not produce."""
    from valentinus_spark.streaming.pipeline import stream_stream_join

    base = 1704067200
    lpath, rpath = str(tmp_path / "fo_left"), str(tmp_path / "fo_right")
    left = spark.range(40).select(
        F.col("id").alias("eid"),
        (F.col("id") % 6).alias("user_id"),  # users 0..5
        F.timestamp_seconds(F.lit(base) + F.col("id") * 120).alias("ts"),
    )
    right = spark.range(60).select(
        F.col("id").alias("cid"),
        ((F.col("id") % 3) * 2 + 1).alias("user_id"),  # users 1,3,5 only
        F.timestamp_seconds(F.lit(base) + F.col("id") * 77).alias("ts"),
    )
    left.write.parquet(lpath)
    right.write.parquet(rpath)
    lb, rb = spark.read.parquet(lpath), spark.read.parquet(rpath)

    batch = stream_stream_join(lb, rb, key="user_id", within="10 minutes", how="full_outer")
    batch_all = {(r["l_eid"], r["r_cid"]) for r in batch.collect()}
    assert any(a is None for a, _ in batch_all) and any(b is None for _, b in batch_all)

    ls = spark.readStream.schema(lb.schema).parquet(lpath)
    rs = spark.readStream.schema(rb.schema).parquet(rpath)
    q = (
        stream_stream_join(ls, rs, key="user_id", within="10 minutes",
                           watermark="10 minutes", how="full_outer")
        .writeStream.format("memory")
        .queryName("fo_join")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_fo"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {(r["l_eid"], r["r_cid"]) for r in spark.sql("SELECT * FROM fo_join").collect()}
    # soundness: never a row batch would not produce
    assert got <= batch_all
    # completeness on matched pairs (they emit immediately, no watermark wait)
    matched = {(a, b) for a, b in batch_all if a is not None and b is not None}
    assert matched <= got


def test_components_state_batching_independent_and_replay_safe(spark, tmp_path):
    """merge_components_state: folding pair batches one at a time ends at
    the SAME labeling as one-shot CC over all pairs (the maintained-state
    invariant), and replaying a batch is a no-op (label = f(edge set),
    idempotent under re-union)."""
    from valentinus_spark.operators.dedup import connected_components
    from valentinus_spark.streaming.pipeline import merge_components_state

    all_pairs = [(1, 2), (2, 3), (10, 11), (3, 10), (20, 21), (30, 31)]
    b1 = spark.createDataFrame(all_pairs[:3], "id_a long, id_b long")
    b2 = spark.createDataFrame(all_pairs[3:], "id_a long, id_b long")
    state = str(tmp_path / "cc_state")

    merge_components_state(b1, state)
    merge_components_state(b2, state)
    merge_components_state(b2, state)  # at-least-once replay

    got = {
        (r["id"], r["cluster_id"]) for r in spark.read.parquet(state).collect()
    }
    want = {
        (r["id"], r["cluster_id"])
        for r in connected_components(
            spark.createDataFrame(all_pairs, "id_a long, id_b long"),
            "id_a", "id_b",
        ).collect()
    }
    assert got == want
    assert dict(got)[11] == 1  # cross-batch transitive merge resolved


def test_stream_components_end_to_end(spark, tmp_path):
    """stream_components through a real StreamingQuery (file source,
    availableNow): final state equals batch CC over every pair file."""
    from valentinus_spark.operators.dedup import connected_components
    from valentinus_spark.streaming.pipeline import stream_components

    src_dir = tmp_path / "pairs"
    src_dir.mkdir()
    spark.createDataFrame([(1, 2), (3, 4)], "id_a long, id_b long").coalesce(
        1
    ).write.mode("overwrite").parquet(str(src_dir / "f1.parquet"))
    spark.createDataFrame([(2, 3)], "id_a long, id_b long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src_dir / "f2.parquet"))

    stream = (
        spark.readStream.schema("id_a long, id_b long")
        .option("recursiveFileLookup", "true")
        .parquet(str(src_dir))
    )
    state = str(tmp_path / "state")
    q = stream_components(stream, state, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    got = {
        (r["id"], r["cluster_id"]) for r in spark.read.parquet(state).collect()
    }
    want = {
        (r["id"], r["cluster_id"])
        for r in connected_components(
            spark.createDataFrame(
                [(1, 2), (3, 4), (2, 3)], "id_a long, id_b long"
            ),
            "id_a", "id_b",
        ).collect()
    }
    assert got == want == {(1, 1), (2, 1), (3, 1), (4, 1)}


def test_components_state_crash_recovery(spark, tmp_path):
    """merge_components_state inherits merge_hll_state's crash contract:
    _next cleaned after a successful swap; a crash between state delete
    and rewrite recovers from _next with zero loss (and the recovery
    batch is itself a replay no-op)."""
    import shutil

    from valentinus_spark.streaming.pipeline import merge_components_state

    b1 = spark.createDataFrame([(1, 2), (3, 4)], "id_a long, id_b long")
    b2 = spark.createDataFrame([(2, 3)], "id_a long, id_b long")
    state = str(tmp_path / "st")

    merge_components_state(b1, state)
    assert not os.path.exists(state + "_next"), "_next must be cleaned"
    merge_components_state(b2, state)
    full = {(r["id"], r["cluster_id"]) for r in spark.read.parquet(state).collect()}

    # crash simulation: state gone, only the write-aside copy remains
    shutil.copytree(state, state + "_next")
    shutil.rmtree(state)
    merge_components_state(b2, state)  # replayed batch during recovery
    got = {(r["id"], r["cluster_id"]) for r in spark.read.parquet(state).collect()}
    assert got == full == {(1, 1), (2, 1), (3, 1), (4, 1)}
    assert not os.path.exists(state + "_next")
