"""Data selection → audited release: the round-5 late operators as one
pipeline — pick domain-targeted training data, check its health, and
publish privacy-safe aggregates.

    documents
      → DSIR importance weights        (target = English, operators/mixture.py)
      → Gumbel-max resample            (∝ exp(logw), deterministic)
      → taxonomy tagging               (gazetteer routing, operators/text_search.py)
      → vocabulary OOV panel           (operators/tokenizer.py)
      → classifier AUC gate            (Mann-Whitney, operators/quality.py)
      → PSI drift: selected vs corpus  (operators/profile.py)
      → Poisson-bootstrap CI           (mean doc length, operators/profile.py)
      → ε-DP released counts           (geometric mechanism, operators/validate.py)

Every stage is deterministic (sha-seeded), so the whole release is
replayable end to end — the property the driver-contract oracles verify
query by query.

Run: python examples/selection_and_release_example.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from valentinus_spark import get_spark
from valentinus_spark.operators import (
    dp_group_counts,
    dsir_importance_weights,
    gumbel_sample_key,
    poisson_bootstrap_ci,
    psi_drift,
    roc_auc,
    taxonomy_tags,
    vocab_coverage,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    print("== DSIR: importance weights toward the English target ==")
    weights = dsir_importance_weights(docs, F.col("lang") == "en").join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    weights.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("dsir_logw"), 2).alias("avg_logw"),
    ).orderBy(F.desc("avg_logw")).show()

    print("== Gumbel-max resample: top-100 ∝ exp(logw) ==")
    selected = (
        weights.withColumn("key", gumbel_sample_key("dsir_logw", "doc_id"))
        .orderBy(F.desc("key"), "doc_id")
        .limit(100)
        .select("doc_id", "lang")
    )
    sel_docs = docs.join(selected.select("doc_id"), "doc_id")
    selected.groupBy("lang").count().orderBy(F.desc("count")).show()

    print("== taxonomy routing of the selected slice ==")
    lex = {
        "storage": ["table", "column", "row", "partition"],
        "execution": ["scan", "join", "merge", "sort", "hash", "agg"],
        "streaming": ["stream", "window", "batch"],
    }
    taxonomy_tags(sel_docs, lex).groupBy("topic").agg(
        F.count(F.lit(1)).alias("tagged_docs"),
        F.sum("n_hits").alias("total_hits"),
    ).orderBy("topic").show()

    print("== OOV panel: does a 200-token vocab cover the selection? ==")
    vocab_coverage(sel_docs, vocab_size=200).orderBy("lang").show()

    print("== AUC gate: does dsir_logw actually rank English up? ==")
    auc = roc_auc(
        weights.select("dsir_logw", (F.col("lang") == "en").alias("y")),
        "dsir_logw",
        "y",
    ).first()
    print(f"AUC of dsir_logw vs lang=en: {auc['auc']}  "
          f"({auc['n_pos']} pos / {auc['n_neg']} neg)")

    print("== PSI: length drift, selected slice vs full corpus ==")
    psi_rows = psi_drift(docs, sel_docs, "n_chars", n_bins=10)
    psi = psi_rows.agg(F.round(F.sum("psi_term"), 4).alias("psi")).first()["psi"]
    psi_rows.show()
    print(f"PSI(selected vs corpus, n_chars) = {psi}  "
          f"(<0.1 stable, >0.25 action)")

    print("== bootstrap CI for mean length of the released slice ==")
    poisson_bootstrap_ci(
        sel_docs, value_col="n_chars", id_col="doc_id", group_col="lang"
    ).orderBy("lang").show()

    print("== ε-DP release: selected docs per (lang, source), ε=1 ==")
    dp_group_counts(sel_docs, ["lang", "source"], epsilon=1.0).orderBy(
        "lang", "source"
    ).show(12)

    print("selection_and_release_example: done")


if __name__ == "__main__":
    main()
