"""Round-3 operator tour: sketches, validation, layout, graph, tokenizer.

    events   → KMV distinct users / Count-Min frequencies / Bloom probe
    tables   → expectations report (single-scan rules + FK checks)
    lineitem → Z-order bucket stats + PageRank over co-purchases
    documents→ BPE train + encode, phrase search, semantic-style dedup

Run: python examples/sketches_and_layout_example.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from valentinus_spark import get_spark
from valentinus_spark.operators import (
    bloom_build,
    bloom_might_contain,
    bpe_encode,
    check_expectations,
    copurchase_edges,
    count_min_estimate,
    count_min_sketch,
    fk_violations,
    kmv_distinct,
    learn_bpe,
    pagerank,
    phrase_search,
    validation_report,
    zorder_bucket_stats,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("sketches-example")
    spark.sparkContext.setLogLevel("ERROR")

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    print("== KMV distinct users per event type (vs exact) ==")
    kmv_distinct(ev, "user_id", ["event_type"], k=64).show(5, False)

    print("== Count-Min frequency estimates for users 0..4 ==")
    sk = count_min_sketch(ev, "user_id", depth=4, width=1024)
    probes = spark.range(5).select(F.col("id").alias("user_id"))
    count_min_estimate(sk, probes, "user_id", depth=4, width=1024).show()

    print("== Bloom: which of users 0..9 ever purchased? ==")
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    bloom = bloom_build(buyers, "user_id", k=4, m=1 << 16)
    bloom_might_contain(
        spark.range(10).select(F.col("id").alias("user_id")), bloom, "user_id",
        k=4, m=1 << 16,
    ).show()

    print("== Data-quality expectations ==")
    validation_report(
        [
            check_expectations(
                orders, [("totalprice_positive", F.col("o_totalprice") > 0)]
            ),
            fk_violations(orders, customer, "o_custkey", "c_custkey"),
        ]
    ).show(truncate=False)

    print("== Z-order bucket bounding boxes (first 5) ==")
    zorder_bucket_stats(
        li.select("l_partkey", "l_suppkey"), ["l_partkey", "l_suppkey"],
        bits=8, n_buckets=8,
    ).orderBy("bucket").show(5)

    print("== PageRank: most-connected parts ==")
    pagerank(copurchase_edges(li), iterations=4).orderBy(F.desc("rank")).show(5)

    print("== BPE: train 20 merges, encode a sample ==")
    merges = learn_bpe(docs, n_merges=20)
    print("first merges:", merges[:5])
    bpe_encode(docs.limit(2), merges).select(
        "doc_id", F.slice("bpe_tokens", 1, 12).alias("first_tokens")
    ).show(truncate=False)

    print("== Phrase search: 'table hash' ==")
    phrase_search(docs, "table hash").orderBy(F.desc("n_matches")).show(5)

    spark.stop()


if __name__ == "__main__":
    main()
