"""Round-3 batch-3 tour: linkage, set-similarity, layout maintenance,
diagnostics, interchange.

    documents → blocked entity linkage on 40-char titles
              → prefix-filtered trigram Jaccard join (PPJoin)
              → spray to 64 small files, compact to 4 (OPTIMIZE)
              → ORC interchange roundtrip
    lineitem  → join-key skew profile (salting decision input)
    events    → exact 8-bin equi-width histogram

Run: python examples/quality_and_interchange_example.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from valentinus_spark import get_spark
from valentinus_spark.operators import (
    compact_small_files,
    equi_width_histogram,
    file_stats,
    key_skew_profile,
    linkage_pairs,
    set_similarity_join,
)
from valentinus_spark.sources.formats import read_orc, write_orc


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("quality-interchange-example")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    print("== blocked entity linkage (titles within 10 edits) ==")
    titled = docs.select("doc_id", F.substring("text", 1, 40).alias("title"))
    linkage_pairs(titled, "doc_id", "title", max_dist=10).orderBy(
        "id_a", "id_b"
    ).show(5, truncate=False)

    print("== prefix-filtered trigram Jaccard >= 0.8 (PPJoin) ==")
    set_similarity_join(docs, "doc_id", "text", threshold=0.8, shingle_n=3).orderBy(
        F.desc("jaccard")
    ).show(5)

    print("== small-file compaction: 64 files -> 4 ==")
    src, dst = tempfile.mkdtemp(prefix="ex_small_"), tempfile.mkdtemp(prefix="ex_big_")
    docs.repartition(64).write.mode("overwrite").parquet(src)
    compact_small_files(spark, src, dst, target_files=4, sort_cols=["doc_id"])
    print("before:", file_stats(spark, src).count(), "files;",
          "after:", file_stats(spark, dst).count(), "files")

    print("== ORC interchange roundtrip ==")
    opath = tempfile.mkdtemp(prefix="ex_orc_")
    write_orc(docs, opath, n_files=2, sort_cols=["doc_id"])
    print("orc rows:", read_orc(spark, opath, schema=docs.schema).count())

    print("== l_partkey skew profile (top 5) ==")
    key_skew_profile(
        spark.read.parquet(f"{sf_dir}/lineitem.parquet"), "l_partkey", top_n=5
    ).show()

    print("== events.value equi-width histogram (8 bins) ==")
    equi_width_histogram(
        spark.read.parquet(f"{sf_dir}/events.parquet"), "value", n_bins=8
    ).show()


if __name__ == "__main__":
    main()
