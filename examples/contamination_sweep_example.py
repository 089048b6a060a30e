"""Contamination sweep: ONE dedup decision across text, embedding, and
image evidence (r4 VERDICT "Next round" #7).

A production training-data sweep rarely gets to pick a single dedup
signal — the same underlying item shows up as byte-identical text in one
crawl, a lightly-edited paraphrase (embedding near-dup) in another, and
a re-encoded thumbnail of the same figure (perceptual near-dup) in a
third. The sweep below wires the three banded/bucketed pair generators
into a single transitive-closure decision:

    documents + embeddings + synthesized images
      → exact text pairs        (sha-digest equi-join,   dedup.py)
      → embedding near-dup pairs (LSH banded + verify,    dedup.py)
      → image dHash pairs        (banded Hamming join,    media_dedup.py)
      → union → connected_components → cluster_canonical
      → per-source keep/drop contamination report

Every pair stage is the SCALE path (equi-joins over bands/buckets, no
all-pairs scan); the union is just a pair-list concat, so the composed
sweep inherits each stage's bound.

Run: python examples/contamination_sweep_example.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

import numpy as np

from pyspark.sql import functions as F

from valentinus_spark import get_spark
from valentinus_spark.imaging import encode_png
from valentinus_spark.operators import (
    cluster_canonical,
    connected_components,
    dhash_near_pairs,
    embedding_neardup_pairs_lsh,
    image_dhash,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def _figure(seed: int, h: int = 32, w: int = 32, noise: float = 0.0) -> bytes:
    """Deterministic synthetic 'figure' PNG; noise > 0 simulates a
    re-encode/resample of the same figure (small pixel perturbations that
    perceptual dHash should see through)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w, 3))
    for c in range(3):
        a, b, ph = rng.uniform(0.5, 2, 3)
        img[:, :, c] = 128 + 100 * np.sin(a * xx / w * 3 + ph) * np.cos(b * yy / h * 3)
    if noise:
        img += np.random.default_rng(seed + 1000).normal(0, noise, img.shape)
    return encode_png(np.clip(img, 0, 255).astype(np.uint8))


def main() -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text", "source", "n_chars"
    )
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    # ---- 1. exact text duplicates: one shuffle on a 16-byte digest ----
    digests = docs.select(
        "doc_id", F.sha2(F.col("text"), 256).alias("digest")
    )
    d_a = digests.select(F.col("digest"), F.col("doc_id").alias("id_a"))
    d_b = digests.select(F.col("digest"), F.col("doc_id").alias("id_b"))
    text_pairs = (
        d_a.join(d_b, "digest")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )

    # ---- 2. embedding near-dups: LSH banding + exact verify ----
    emb_pairs = embedding_neardup_pairs_lsh(
        embs, id_col="vec_id", vec_col="embedding", threshold=0.95
    ).select("id_a", "id_b")

    # ---- 3. perceptual image near-dups on a figure attached per doc ----
    # a tenth of the docs carry a figure; doc_id % 50 picks the motif, so
    # ~10 docs share each figure across "crawls", some re-encoded with
    # pixel noise — the dHash banded Hamming join must link those too
    with_figs = [
        (int(r["doc_id"]), _figure(int(r["doc_id"]) % 50,
                                   noise=2.0 if r["doc_id"] % 3 == 0 else 0.0))
        for r in docs.where("doc_id % 10 = 0").select("doc_id").collect()
    ]
    images = spark.createDataFrame(
        [(str(d), bytearray(p)) for d, p in with_figs], "media_id string, content binary"
    )
    img_pairs = dhash_near_pairs(image_dhash(images), max_bits=6, n_bands=8).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
    )

    # ---- 4. one transitive decision over ALL evidence ----
    all_pairs = text_pairs.unionByName(emb_pairs).unionByName(img_pairs)
    cc = connected_components(all_pairs, "id_a", "id_b")
    clustered = docs.join(
        cc.withColumnRenamed("id", "doc_id"), "doc_id", "left"
    ).withColumn("cluster_id", F.coalesce("cluster_id", F.col("doc_id")))

    flagged = cluster_canonical(
        clustered,
        order_by=[F.col("n_chars").desc(), F.col("doc_id")],
        id_col="doc_id",
        cluster_col="cluster_id",
    )
    kept = flagged.where("is_canonical")

    n_docs = docs.count()
    n_pairs = {
        "text": text_pairs.count(),
        "embedding": emb_pairs.count(),
        "image": img_pairs.count(),
    }
    n_kept = kept.count()
    print(f"docs={n_docs} pairs={n_pairs} kept={n_kept} dropped={n_docs - n_kept}")

    print("\nper-source contamination (dropped = redundant under ANY signal):")
    report = (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(~F.col("is_canonical"), 1).otherwise(0)).alias("n_dropped"),
        )
        .orderBy("source")
    )
    report.show(truncate=False)

    assert n_kept < n_docs, "planted duplicates must collapse"
    assert n_pairs["image"] > 0, "figure re-encodes must link via dHash"
    print("contamination sweep complete")


if __name__ == "__main__":
    main()
