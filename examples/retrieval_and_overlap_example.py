"""Retrieval + overlap-analysis tour: the post-rotation round-5 text
operators composed the way a corpus-QA team uses them.

    documents
      → BM25 top-k                 (probabilistic ranking, operators/text_search.py)
      → query-likelihood top-k     (Dirichlet LM ranking — disagrees with
                                    BM25 exactly where fusion helps)
      → RRF fusion                 (rank-only combiner; no score calibration)
      → winnowing overlap pairs    (MOSS fingerprints: substring-level
                                    near-dup / quote detection)
      → TF-IDF cosine pairs        (all-pairs trigram cosine ≥ θ via the
                                    lossless suffix-norm prefix filter)
      → language-heuristic kappa   (how much to trust the lang-id gate)

Each stage prints the small table a reviewer actually reads; nothing
mutates the corpus.

Run: python examples/retrieval_and_overlap_example.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from valentinus_spark import get_spark
from valentinus_spark.functions.text import lang_id
from valentinus_spark.operators import (
    agreement_matrix,
    bm25_topk,
    cohens_kappa,
    cosine_similarity_join,
    ql_topk,
    rrf_fuse,
    winnow_overlap_pairs,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("retrieval-overlap-example")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    terms = ["data", "query", "stream"]

    print("== BM25 vs query-likelihood: where the two models disagree ==")
    bm = bm25_topk(docs, terms=terms, k=10).select(
        "doc_id", F.round("score", 4).alias("score")
    )
    ql = ql_topk(docs, terms=terms, k=10)
    both = (
        bm.select("doc_id", F.col("score").alias("bm25"))
        .join(ql.select("doc_id", F.col("score").alias("ql")), "doc_id", "full")
    )
    both.orderBy(F.desc("bm25")).show(12)

    print("== RRF fusion of the two lists (rank-only, calibration-free) ==")
    rrf_fuse([bm, ql], k0=60, topk=10).show()

    print("== Winnowing overlap pairs (substring-level near-dup) ==")
    pairs = winnow_overlap_pairs(docs, k=8, window=4, min_shared=4, max_df=50)
    pairs.orderBy(F.desc("n_shared")).show(10)
    print(f"   candidate doc pairs sharing >=4 fingerprints: {pairs.count()}")

    print("== All-pairs trigram TF-IDF cosine >= 0.8 (lossless prefix filter) ==")
    cos = cosine_similarity_join(docs, threshold=0.8, shingle_n=3)
    cos.orderBy(F.desc("cosine")).show(10)

    print("== Language-heuristic trustworthiness (kappa vs gold labels) ==")
    labeled = docs.select(lang_id("text").alias("lang_pred"), "lang")
    cohens_kappa(labeled, "lang_pred", "lang").show()
    agreement_matrix(labeled, "lang_pred", "lang").show(8)

    spark.stop()


if __name__ == "__main__":
    main()
