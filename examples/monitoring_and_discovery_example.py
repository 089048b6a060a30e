"""Monitoring-and-discovery tour: the round-6 operators run as one
connected story over the driver tables.

    events  → ACF seasonality fingerprint   (is the series week-shaped?)
            → CUSUM change-point monitor    (did the mean drift?)
            → mSPRT always-valid A/B p      (peek daily without lying)
            → rolling 7-day actives         (HLL register merges, no rescan)
            → top session paths             (what do users actually do?)
    orders  → HITS hubs/authorities         (who buys broadly / what sells widely?)
            → personalized PageRank         (what's NEAR part 1?)
    docs    → TextRank keywords             (what is this corpus about?)
            → trigram substring search      (find every 'stream' doc via the index)
            → compression-ratio gate        (flag document-scale repetition)
    embeds  → Matryoshka fidelity sweep     (how few dims does the index need?)
            → k-NN distance outliers        (what does NOT belong?)

Each stage prints the one small table a reviewer reads; nothing
mutates the corpus.

Run: python examples/monitoring_and_discovery_example.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from valentinus_spark import get_spark
from valentinus_spark.operators import (
    ab_assign,
    acf_profile,
    compression_ratio,
    cusum_changepoint,
    hits,
    hll_rolling_distinct,
    knn_distance_outliers,
    matryoshka_fidelity,
    msprt_test,
    personalized_pagerank,
    session_paths,
    substring_search,
    textrank_keywords,
)
from valentinus_spark.operators.graph import copurchase_edges

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("monitoring-discovery-example")
    spark.sparkContext.setLogLevel("ERROR")
    t = lambda name: spark.read.parquet(f"{SF_DIR}/{name}.parquet")  # noqa: E731

    # normalize ts across testdata generations (nanos-long / NTZ / LTZ)
    # the same way the driver contract does
    import __spark_entry__ as entry

    events = entry._events(spark, SF_DIR)
    docs = t("documents")
    embs = t("embeddings")
    orders, lineitem = t("orders"), t("lineitem")

    print("\n== 1. ACF: daily-volume seasonality fingerprint ==")
    acf_profile(events.select("ts"), max_lag=7).show()

    print("== 2. CUSUM: slow mean-drift monitor over daily values ==")
    cusum_changepoint(events.select("ts", "value")).orderBy(
        F.desc("cusum_pos")
    ).show(5)

    print("== 3. mSPRT: the p-value a dashboard may refresh daily ==")
    ab = events.select("ts", ab_assign(F.col("user_id")).alias("arm"), "value")
    msprt_test(ab, "ts", "arm", "value").orderBy(F.desc("day")).show(5)

    print("== 4. Rolling 7-day actives from daily HLL registers ==")
    hll_rolling_distinct(events, "ts", "user_id", window_days=7).orderBy(
        F.desc("day")
    ).show(5)

    print("== 5. Top session paths ==")
    session_paths(events.select("event_id", "user_id", "ts", "event_type")).show(
        8, truncate=False
    )

    print("== 6. HITS on the customer->part purchase graph ==")
    purchase = orders.join(
        lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
    ).select(
        F.col("o_custkey").alias("src"),
        (F.col("l_partkey") + F.lit(10_000_000)).alias("dst"),
    )
    hits(purchase, iterations=4).orderBy(F.desc("auth")).show(5)

    print("== 7. Personalized PageRank: parts near part 1 ==")
    personalized_pagerank(copurchase_edges(lineitem), seeds=[1]).orderBy(
        F.desc("rank")
    ).show(5)

    print("== 8. TextRank corpus keywords ==")
    textrank_keywords(docs.select("text"), topk=10).show(truncate=False)

    print("== 9. Trigram-index substring search: 'stream' ==")
    hits_df = substring_search(docs, "stream")
    print(f"   {hits_df.count()} documents contain 'stream'")

    print("== 10. Compression-ratio repetition gate (lowest 5) ==")
    compression_ratio(docs).orderBy("compression_ratio").show(5)

    print("== 11. Matryoshka: how few dims does the ANN index need? ==")
    queries = embs.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    matryoshka_fidelity(embs, queries, [8, 16, 32], k=10).show()

    print("== 12. k-NN distance outliers (what does not belong?) ==")
    knn_distance_outliers(embs, k=5, topn=5).show()

    spark.stop()


if __name__ == "__main__":
    main()
