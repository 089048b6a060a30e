"""Tour of the round-7 release-governance surfaces: what gets checked,
normalized, privatized, and published on the way from corpus to
release.

    documents → fightin_words (what makes each source distinctive?)
    documents → grouped k-fold balance (leakage-safe CV folds)
    events    → dp_median next to the true median (private release)
    orders    → revenue decile Lorenz table (who concentrates value)
    events    → cohort LTV (what a cohort member is worth by day k)
    forecast  → split-conformal coverage (are the intervals honest?)
    documents → XML shard round-trip (legacy interchange, lossless)
    documents → BM25 vs BM25F (does field weighting change the answer?)

Run: python examples/release_governance_example.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

import __spark_entry__ as entry
from valentinus_spark import get_spark
from valentinus_spark.functions.text import kfold_assign, sha_hash60
from valentinus_spark.operators.funnel import cohort_ltv
from valentinus_spark.operators.profile import decile_concentration
from valentinus_spark.operators.quality import fightin_words
from valentinus_spark.operators.rollup import (
    conformal_interval_eval,
    holt_linear_forecast,
)
from valentinus_spark.operators.text_search import bm25_topk, bm25f_topk
from valentinus_spark.operators.validate import dp_median
from valentinus_spark.sources.xml_records import (
    read_xml_records,
    write_xml_records,
)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("governance-example")
    spark.sparkContext.setLogLevel("ERROR")

    documents = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    events = entry._events(spark, SF_DIR)

    print("== Fightin' Words: most distinctive terms per source ==")
    fightin_words(
        documents.select("source", "text"), top_k=2
    ).show(8, truncate=False)

    print("== Grouped 5-fold balance (no source straddles folds) ==")
    documents.select("source", kfold_assign(F.col("source"), k=5)).groupBy(
        "fold"
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
    ).orderBy("fold").show()

    print("== eps-DP median release next to the truth ==")
    dp_median(events.select("value"), "value", epsilon=1.0).show()

    print("== Revenue concentration: Lorenz deciles ==")
    decile_concentration(
        orders.select("o_custkey", "o_totalprice"),
        "o_custkey",
        "o_totalprice",
    ).show()

    print("== Cohort LTV by day (first 5 rows) ==")
    cohort_ltv(
        events.select("user_id", "ts_us", "value"), max_offset=7
    ).show(5)

    print("== Conformal coverage of the Holt forecaster ==")
    scored = holt_linear_forecast(events.select("ts", "value"))
    conformal_interval_eval(scored, "day", "abs_err", alpha=0.1).show()

    print("== XML shard round-trip (lossless interchange) ==")
    path = tempfile.mkdtemp(prefix="vs_xml_demo_")
    docs = documents.select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    write_xml_records(docs, path, fields=["doc_id", "text"], sort_cols=["doc_id"])
    back = read_xml_records(spark, path, fields=["doc_id", "text"])
    h = lambda df: df.select(  # noqa: E731
        sha_hash60(F.concat_ws("\x1f", "doc_id", "text")).alias("_h")
    ).agg(F.expr("bit_xor(_h)").alias("xor"), F.count(F.lit(1)).alias("n"))
    a, b = h(docs).collect()[0], h(back).collect()[0]
    print(f"   original n={a.n} xor={a.xor}")
    print(f"   roundtrip n={b.n} xor={b.xor}  lossless={a == b}")

    print("== BM25 vs BM25F top-5 ==")
    terms = ["data", "query", "stream"]
    bm25_topk(documents, terms=terms, k=5).show()
    bm25f_topk(documents, terms=terms, k=5).show()

    spark.stop()


if __name__ == "__main__":
    main()
