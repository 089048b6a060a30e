"""Curation analytics tour: the round-5 measurement operators on one
corpus — what you run BEFORE deciding thresholds.

    documents + events
      → robust outlier scoring        (median/MAD, operators/profile.py)
      → quality-score calibration     (reliability bins, operators/quality.py)
      → PMI collocations              (boilerplate phrases, operators/collocations.py)
      → market-basket rules           (operators/collocations.py)
      → event-transition matrix       (operators/funnel.py)
      → embedding anisotropy check    (PCA top component, operators/similarity.py)

Each stage prints the small decision table a pipeline owner actually
reads; none of them mutates the corpus.

Run: python examples/curation_analytics_example.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from valentinus_spark import get_spark
from valentinus_spark.operators import (
    association_rules,
    calibration_curve,
    embedding_pca,
    markov_transitions,
    pmi_collocations,
    robust_zscore,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # events.parquet carries TIMESTAMP(NANOS)/NTZ depending on the
    # generator — the driver-contract helper normalizes ts/ts_us
    import __spark_entry__ as entry

    events = entry._events(spark, SF_DIR)
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    print("== robust length outliers per language (median/MAD) ==")
    scored = robust_zscore(docs, "n_chars", group_col="lang")
    scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("is_outlier").cast("long")).alias("n_outliers"),
        F.round(F.max(F.abs("robust_z")), 2).alias("max_abs_z"),
    ).orderBy("lang").show()

    print("== calibration of a length-based quality score vs lang=en ==")
    cal = calibration_curve(
        docs.select(
            F.least(F.col("n_chars") / 2000.0, F.lit(1.0)).alias("score"),
            (F.col("lang") == "en").alias("label"),
        ),
        "score",
        "label",
    )
    cal.select(
        "bin", "n_rows", F.round("mean_score", 3).alias("mean_score"),
        F.round("positive_rate", 3).alias("positive_rate"),
        F.round("abs_gap", 3).alias("abs_gap"),
    ).show()
    ece = cal.agg(
        F.round(
            F.sum(F.col("n_rows") * F.col("abs_gap")) / F.sum("n_rows"), 4
        ).alias("ece")
    ).first()["ece"]
    print(f"expected calibration error: {ece}")

    print("== top collocations (candidate boilerplate / vocab merges) ==")
    pmi_collocations(docs, min_count=10, top_n=10).select(
        "token_a", "token_b", "pair_count", F.round("pmi", 2).alias("pmi")
    ).show()

    print("== co-purchase association rules (lift) ==")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").where("l_partkey % 5 = 0")
    association_rules(li, "l_orderkey", "l_partkey", min_support_count=2, top_n=8).select(
        "antecedent", "consequent", "pair_baskets", F.round("lift", 1).alias("lift")
    ).show()

    print("== event-type transition matrix ==")
    markov_transitions(
        events.select("user_id", "event_type", "ts_us", "event_id")
    ).select("prev_state", "state", "n_transitions", F.round("p", 3).alias("p")).show()

    print("== embedding-space anisotropy (PCA top component) ==")
    comps, ratios = embedding_pca(embs, k=2)
    print(
        f"top-2 explained variance ratios: {[round(r, 4) for r in ratios]} "
        f"(isotropic corpus => ~1/dim each; a dominant ratio means apply "
        f"all-but-the-top before cosine search)"
    )

    assert ece is not None and len(comps) == 2
    print("curation analytics complete")


if __name__ == "__main__":
    main()
