"""Crawl-to-training-run tour of the round-4 surfaces: WARC ingest →
corpus health gate → mixture plan → epoch shuffle, with a live
Count-Min frequency sketch maintained over the ingest stream.

    documents → WARC shards (write_warc, member-gzip) → read_warc
    payloads → encoding_artifacts gate (mojibake / U+FFFD / controls)
    clean corpus → temperature_mixture_weights (τ=2, 30% share cap)
    corpus → epoch_shuffle (reproducible per-epoch data order)
    ingest stream → stream_cm_registers (exactly-once additive sketch)

Run: python examples/warc_to_training_example.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from valentinus_spark import get_spark
from valentinus_spark.functions.text import encoding_artifacts
from valentinus_spark.operators.mixture import temperature_mixture_weights
from valentinus_spark.operators.packing import epoch_shuffle
from valentinus_spark.operators.sketches import count_min_estimate
from valentinus_spark.sources.versioned import read_version
from valentinus_spark.sources.warc import read_warc, write_warc
from valentinus_spark.streaming.pipeline import (
    stream_cm_registers,
    write_ordered_batches,
)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("warc-example")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    # 1) documents → WARC shards and back (the crawl interchange format)
    warc_dir = tempfile.mkdtemp(prefix="ex_warc_")
    payload = docs.select(
        F.concat(F.lit("http://ex.org/d"), F.col("doc_id")).alias("url"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    write_warc(payload, warc_dir, n_files=2, compression="member")
    crawl = read_warc(spark, warc_dir, record_types=["response"])
    print(f"WARC roundtrip: {crawl.count()} records from 2 member-gzip shards")

    # 2) corpus health gate: drop docs with encoding artifacts
    scored = crawl.select(
        F.regexp_extract("url", r"/d(\d+)$", 1).cast("long").alias("doc_id"),
        F.decode("payload", "UTF-8").alias("text"),
    ).withColumn("_a", encoding_artifacts("text"))
    clean = scored.where(
        (F.col("_a.replacement") + F.col("_a.mojibake") + F.col("_a.control")) == 0
    ).drop("_a")
    print(f"health gate: {clean.count()}/{scored.count()} docs artifact-free")

    # 3) mixture plan over the clean corpus
    joined = clean.join(docs.select("doc_id", "source", "n_chars"), "doc_id")
    plan = temperature_mixture_weights(joined, "source", "n_chars", tau=2.0, cap=0.3)
    plan.orderBy(F.desc("p_target")).show(5, truncate=False)

    # 4) reproducible per-epoch data order
    for epoch in (0, 1):
        shuffled = epoch_shuffle(joined, "doc_id", epoch=epoch, n_shards=4)
        head = shuffled.where("shard = 0").orderBy("position").limit(3).collect()
        print(f"epoch {epoch} shard 0 head: {[r['doc_id'] for r in head]}")

    # 5) live frequency sketch over the ingest stream (exactly-once)
    feed = tempfile.mkdtemp(prefix="ex_cmfeed_")
    ev = docs.select("doc_id", "source")
    write_ordered_batches(
        ev, [F.col("doc_id") % 2 == 0, F.col("doc_id") % 2 == 1], feed
    )
    stream = (
        spark.readStream.schema(spark.read.parquet(feed).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(feed)
    )
    state = tempfile.mkdtemp(prefix="ex_cmstate_")
    q = stream_cm_registers(
        stream, state, tempfile.mkdtemp(prefix="ex_cmckpt_"), "source",
        depth=4, width=256,
    )
    q.awaitTermination(120)
    probes = docs.select("source").distinct()
    est = count_min_estimate(
        read_version(spark, state), probes, "source", depth=4, width=256
    )
    print("streamed per-source frequency estimates (Count-Min):")
    est.orderBy(F.desc("est_count")).show(5, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
