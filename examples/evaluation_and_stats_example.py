"""Evaluation + statistics tour: the round-5 measurement operators
composed the way a data-quality team reviews a corpus before a training
run.

    documents / events / lineitem
      → readability + char entropy   (surface quality: FRE grade vs
                                      tokenizer-free garbage score)
      → lexical diversity + Heaps    (is each source still contributing
                                      vocabulary, or saturated template?)
      → novelty + burstiness         (information added per doc; the
                                      high-VMR boilerplate candidates)
      → agreement panel              (Fleiss κ with a full panel,
                                      Krippendorff α with missing votes)
      → ranker agreement + nDCG      (do cheap scorers agree; is the
                                      ranking actually good?)
      → drift + independence tests   (KS / Wasserstein on event values,
                                      χ² + MI on source×lang)
      → Elo vs Bradley-Terry         (drift-tracking vs static strength
                                      on the same brand preferences)

Each stage prints the small table a reviewer actually reads; nothing
mutates the corpus.

Run: python examples/evaluation_and_stats_example.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from valentinus_spark import get_spark
from valentinus_spark.operators import (
    char_entropy,
    chi_squared,
    elo_ratings,
    fleiss_kappa,
    flesch_readability,
    heaps_law,
    krippendorff_alpha,
    ks_test,
    lexical_diversity,
    mutual_information,
    ndcg_at_k,
    ngram_novelty,
    rank_correlation,
    term_burstiness,
    wasserstein_1d,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("evaluation-stats-example")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")

    print("== Surface quality: readability grade vs char entropy ==")
    surface = flesch_readability(docs).join(
        char_entropy(docs).select("doc_id", "entropy"), "doc_id"
    )
    surface.orderBy("fre").show(5)

    print("== Source health: lexical diversity + Heaps' beta ==")
    lexical_diversity(docs, "source").join(
        heaps_law(docs, "source").select("source", "beta"), "source"
    ).orderBy("source").show(6)

    print("== Information added per doc (trigram novelty, lowest first) ==")
    ngram_novelty(docs, n=3).orderBy("novelty").show(5)

    print("== Boilerplate candidates: high-burstiness terms ==")
    term_burstiness(docs, min_df=3, topk=8).show()

    print("== Annotator agreement: full panel vs panel with holes ==")
    raters = docs.select(
        "doc_id", "lang", F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("r")
    )
    cats = F.array(F.lit("en"), F.lit("es"), F.lit("de"), F.lit("fr"))
    label = F.when(
        ((F.col("doc_id") % 101) * 31 + F.col("r") * 97) % 10 < 7, F.col("lang")
    ).otherwise(cats[((F.col("doc_id") + F.col("r")) % 4).cast("int")])
    panel = raters.select("doc_id", label.alias("label"))
    fleiss_kappa(panel, "doc_id", "label").show()
    holes = raters.where(
        ((F.col("doc_id") % 101) * 37 + F.col("r") * 53) % 10 >= 2
    ).select("doc_id", label.alias("label"))
    krippendorff_alpha(holes, "doc_id", "label").show()

    print("== Do cheap scorers rank alike? (length vs word count) ==")
    scored = docs.select(
        "source",
        F.col("n_chars").cast("double").alias("len_score"),
        F.size(F.split(F.trim("text"), "\\s+")).cast("double").alias("word_score"),
    )
    rank_correlation(scored, "source", "len_score", "word_score").show(5)

    print("== Retrieval quality: nDCG@10 for tf-ranked terms ==")
    terms = spark.createDataFrame([("data",), ("query",)], ["term"])
    toks = docs.select(
        "doc_id",
        F.split(F.lower("text"), "\\s+").alias("w"),
        # relevance judged from the 200-char prefix — a separate signal
        # from the full-text score, so the metric is non-trivial
        F.split(F.lower(F.substring("text", 1, 200)), "\\s+").alias("wp"),
    ).crossJoin(F.broadcast(terms))
    judged = toks.select(
        "term",
        "doc_id",
        F.size(F.filter("w", lambda x: x == F.col("term"))).alias("score"),
        F.size(F.filter("wp", lambda x: x == F.col("term"))).alias("tfp"),
    ).where(F.col("score") > 0)
    judged = judged.withColumn(
        "rel", F.when(F.col("tfp") >= 3, 2).when(F.col("tfp") >= 1, 1).otherwise(0)
    )
    ndcg_at_k(judged, "term", "doc_id", "score", "rel", k=10).show()

    print("== Distribution drift: click vs view event values ==")
    ks_test(events, "event_type", "value", "click", "view").show()
    wasserstein_1d(events, "event_type", "value", "click", "view").show()

    print("== Metadata independence: source x lang ==")
    mutual_information(docs, "source", "lang").show()
    chi_squared(docs, "source", "lang").show()

    print("== Elo trajectory over yearly brand preferences ==")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    part = spark.read.parquet(f"{SF_DIR}/part.parquet").select(
        "p_partkey", "p_brand"
    )
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", F.year("o_orderdate").alias("yr")
    )
    lines = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select("l_orderkey", "p_brand", "l_quantity", "yr")
    )
    a, b = lines.alias("a"), lines.alias("b")
    matches = (
        a.join(b, "l_orderkey")
        .where(
            (F.col("a.l_quantity") > F.col("b.l_quantity"))
            & (F.col("a.p_brand") != F.col("b.p_brand"))
        )
        .select(
            F.col("a.p_brand").alias("winner"),
            F.col("b.p_brand").alias("loser"),
            F.col("a.yr").alias("round"),
        )
    )
    elo_ratings(matches).show(8)

    spark.stop()
    print("evaluation_and_stats_example: OK")


if __name__ == "__main__":
    main()
