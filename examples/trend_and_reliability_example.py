"""Trend-and-reliability tour: the round-7 operators run as one
connected story over the driver tables.

    events  → Mann-Kendall + Theil-Sen      (is the metric drifting? how fast?)
            → Page-Hinkley + EWMA chart     (forward-only drift monitors)
            → Holt one-step forecast        (the baseline a model must beat)
            → seasonal decomposition        (growth vs "it's just Saturday")
            → Kruskal-Wallis + Levene       (location AND spread across types)
            → Wilcoxon signed-rank          (paired, no normality assumption)
            → Cochran's Q (day-1 matrix)    (do event types differ per user?)
            → Cronbach's alpha              (are the 5 types one construct?)
            → HLL audience overlap          (click vs purchase user-days)
    orders  → Jonckheere-Terpstra           (monotone shift across priority tiers)
    docs    → Burrows' Delta + JS divergence (which sources share a register?)
            → Good-Turing / Chao1           (how much vocabulary is uncrawled?)
            → RAKE keywords + TextTiling    (what is it about? where to chunk?)
            → HHI language concentration    (monoculture sources)

Each stage prints the one small table a reviewer reads; nothing
mutates the corpus.

Run: python examples/trend_and_reliability_example.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from valentinus_spark import get_spark
from valentinus_spark.operators import (
    burrows_delta,
    cochran_q,
    cronbach_alpha,
    ewma_chart,
    good_turing_vocab,
    hhi_concentration,
    hll_overlap,
    holt_linear_forecast,
    jonckheere_terpstra,
    js_divergence,
    kruskal_wallis,
    levene_test,
    mann_kendall_trend,
    page_hinkley,
    rake_keywords,
    seasonal_decompose,
    texttiling_boundaries,
    theil_sen_trend,
    wilcoxon_signed_rank,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("trend-reliability-example")
    spark.sparkContext.setLogLevel("ERROR")
    t = lambda name: spark.read.parquet(f"{SF_DIR}/{name}.parquet")  # noqa: E731

    import __spark_entry__ as entry

    events = entry._events(spark, SF_DIR)
    docs = t("documents")
    orders = t("orders")
    ev = events.select("ts", "value")

    print("\n== 1. Mann-Kendall: is the daily mean drifting at all? ==")
    mann_kendall_trend(ev).show()

    print("== 2. Theil-Sen: the robust slope of that drift ==")
    theil_sen_trend(ev).show()

    print("== 3. Page-Hinkley: forward-only drift monitor (no mu/sigma) ==")
    page_hinkley(ev).orderBy(F.desc("ph_inc")).show(5)

    print("== 4. EWMA chart: warm-up control limits ==")
    ewma_chart(ev).orderBy("day").show(5)

    print("== 5. Holt forecast: the one-step baseline to beat ==")
    holt_linear_forecast(ev).orderBy(F.desc("abs_err")).show(5)

    print("== 6. Seasonal decomposition: trend vs weekday vs remainder ==")
    seasonal_decompose(ev).orderBy("day").show(10)

    print("== 7. Kruskal-Wallis: value LOCATION across event types ==")
    kruskal_wallis(events.select("event_type", "value"), "event_type", "value").show()

    print("== 8. Levene (Brown-Forsythe): value SPREAD across types ==")
    levene_test(events.select("event_type", "value"), "event_type", "value").show()

    print("== 9. Wilcoxon signed-rank: paired pre/post per user ==")
    bounds = events.agg(
        F.min(F.to_date("ts")).alias("_lo"), F.max(F.to_date("ts")).alias("_hi")
    )
    dec = F.col("value").cast("decimal(18,2)")
    zero = F.lit(0).cast("decimal(18,2)")
    paired = (
        events.crossJoin(F.broadcast(bounds))
        .withColumn(
            "_post",
            F.datediff(F.to_date("ts"), "_lo") * 2 > F.datediff("_hi", "_lo"),
        )
        .groupBy("user_id")
        .agg(
            F.sum(F.when(~F.col("_post"), dec).otherwise(zero)).cast("double").alias("before"),
            F.sum(F.when(F.col("_post"), dec).otherwise(zero)).cast("double").alias("after"),
        )
    )
    wilcoxon_signed_rank(paired, "before", "after").show()

    print("== 10. Cochran's Q on the day-1 user x type incidence matrix ==")
    lo = events.agg(F.min(F.to_date("ts")).alias("_lo"))
    day1 = events.crossJoin(F.broadcast(lo)).filter(F.to_date("ts") == F.col("_lo"))
    cochran_q(day1, "user_id", "event_type").show()

    print("== 11. Cronbach's alpha: the 5 types as a 5-item instrument ==")
    per = events.groupBy("user_id", "event_type").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("score")
    )
    cronbach_alpha(per, "user_id", "event_type", "score").show()

    print("== 12. HLL overlap: click vs purchase user-days ==")
    key = F.concat(
        F.col("user_id").cast("string"), F.lit(":"), F.to_date("ts").cast("string")
    ).alias("k")
    hll_overlap(
        events.filter(F.col("event_type") == "click").select(key),
        events.filter(F.col("event_type") == "purchase").select(key),
        "k",
        p=10,
    ).show()

    print("== 13. Jonckheere-Terpstra: totals across ordered priority tiers ==")
    jonckheere_terpstra(
        orders.select("o_orderpriority", "o_totalprice"),
        "o_orderpriority",
        "o_totalprice",
    ).show()

    print("== 14. Burrows' Delta: closest / farthest source styles ==")
    deltas = burrows_delta(docs.select("source", "text"), "source", top_n=50)
    deltas.orderBy("delta").show(3)
    deltas.orderBy(F.desc("delta")).show(3)

    print("== 15. JS divergence: the symmetric mixture-planning distance ==")
    js_divergence(docs.select("source", "text"), "source", top_v=500).orderBy(
        F.desc("js_bits")
    ).show(3)

    print("== 16. Good-Turing / Chao1: how much vocabulary is left? ==")
    good_turing_vocab(docs.select("source", "text"), "source").orderBy(
        F.desc("p_unseen")
    ).show(5)

    print("== 17. RAKE keywords (vs TextRank's graph recursion) ==")
    rake_keywords(docs.select("doc_id", "text"), topk=10).show(truncate=False)

    print("== 18. TextTiling: where do topics shift inside documents? ==")
    tt = texttiling_boundaries(docs.select("doc_id", "text"), block_tokens=20)
    tt.filter("is_boundary").show(5)

    print("== 19. HHI: language concentration per source ==")
    hhi_concentration(docs.select("source", "lang"), "source", "lang").orderBy(
        F.desc("hhi")
    ).show(5)

    spark.stop()


if __name__ == "__main__":
    main()
