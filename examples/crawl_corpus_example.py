"""Crawl-corpus tour: URL canonicalization, HTML extraction, dedup
canonical selection, corpus analytics.

    messy URLs (7 encodings per page) → normalize_url / url_host
    raw HTML (script/style/entity torture) → html_to_text
    near-dup clusters → cluster_canonical (keep the best copy)
    corpus → zipf_profile power-law fit + exact_quantiles order stats
    documents → BPE encode with a trained merge table

Run: python examples/crawl_corpus_example.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from valentinus_spark import get_spark
from valentinus_spark.functions import normalize_url, url_host
from valentinus_spark.functions.web import html_to_text
from valentinus_spark.operators import (
    cluster_canonical,
    dedup_clusters,
    exact_quantiles,
    ngram_jaccard_pairs,
    zipf_profile,
)
from valentinus_spark.operators.tokenizer import bpe_encode, learn_bpe

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("crawl-example")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    print("== URL canonicalization: 4 spellings, one key ==")
    urls = spark.createDataFrame(
        [
            ("HTTPS://WWW.Example.com:443/a/b/?utm_source=feed#top",),
            ("https://www.example.com/a/b",),
            ("https://www.example.com/a/b/",),
            ("https://www.example.com:443/a/b?utm_campaign=x",),
        ],
        "u string",
    )
    urls.select(
        normalize_url("u").alias("canonical"), url_host("u").alias("host")
    ).show(truncate=False)

    print("== HTML extraction (script block + entity torture) ==")
    html = spark.createDataFrame(
        [("<p>a &amp; b</p><script>if(1<2){evil()}</script><p>&lt;kept&gt;</p>",)],
        "h string",
    )
    html.select(html_to_text("h").alias("text")).show(truncate=False)

    print("== near-dup clusters -> canonical copy (longest wins) ==")
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.8, max_df=None).select(
        "id_a", "id_b"
    )
    clustered = dedup_clusters(docs, pairs).join(
        docs.select("doc_id", "n_chars"), "doc_id"
    )
    canon = cluster_canonical(
        clustered, [F.col("n_chars").desc(), F.col("doc_id").asc()]
    )
    canon.where(~F.col("is_canonical")).select(
        "doc_id", "cluster_id", "canonical_id"
    ).show(5)

    print("== corpus power-law fit (natural text: slope ~ -1) ==")
    zipf_profile(docs, "text", k=100).show()

    print("== exact global quantiles of n_chars (two-phase ranking) ==")
    exact_quantiles(docs, "n_chars", [0.25, 0.5, 0.9, 0.99]).orderBy("q").show()

    print("== BPE: train 30 merges, encode ==")
    merges = learn_bpe(docs, n_merges=30)
    print("first merges:", merges[:8])
    bpe_encode(docs.limit(3), merges).select(
        "doc_id", F.slice("bpe_tokens", 1, 12).alias("first_tokens")
    ).show(truncate=False)


if __name__ == "__main__":
    main()
