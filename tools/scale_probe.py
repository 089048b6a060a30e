"""sf0.1 -> sf1 scaling probe (VERDICT r3 item 7).

Runs the top-cost registry queries at sf0.1 and at a 10x synthetic sf1
slice (see the builder notes in SCALE.md "Round-4 sf1 probe"), recording
min-of-2 wall seconds and total shuffle-write bytes per query (diffed
from the local Spark UI REST stage metrics, which is the same number a
cluster history server reports). Prints one row per (query, sf) plus the
log10 scaling exponent: exponent 1.0 = linear in rows; anything
materially super-linear is a plan bug at 100 TB.

Usage: python tools/scale_probe.py [sf1_dir] [query ...]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, ".")

PROBE_QUERIES = [
    "pagerank_copurchase",
    "entity_linkage",
    "setsim_join",
    "corpus_pipeline",
    "semantic_dedup",
]

# r4 VERDICT item 6: heavy families whose registry queries are planted
# (O(1) outputs, no scale signal) probed here on the SCALED tables the
# sf1 fixture actually grows (lineitem edges, embeddings, documents).
# Registry names resolve through queries(); these resolve locally.


def _probe_kcore_copurchase(spark, sf_dir):
    """k_core on the 10x-densified co-purchase graph (same edge builder
    as pagerank_copurchase — the fixture's scaled direction)."""
    from pyspark.sql import functions as F

    from valentinus_spark.operators.graph import copurchase_edges, k_core

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return k_core(copurchase_edges(li), k=8)


def _probe_pq_ann_embeddings(spark, sf_dir):
    """PQ train -> encode -> ADC top-k over the scaled embeddings table:
    codebook train is bounded-sample by design, so the scaling signal is
    the encode scan + code-only ADC ranking."""
    from pyspark.sql import functions as F

    from valentinus_spark.operators.similarity import (
        pq_ann_topk,
        pq_codebooks,
        pq_encode,
    )

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    books = pq_codebooks(embs, m=8, k=16)
    codes = pq_encode(embs, books).select("vec_id", "pq_code")
    queries = embs.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    return pq_ann_topk(codes, queries, books, k=10, corpus_id="vec_id")


def _probe_dedup_paragraphs_full(spark, sf_dir):
    """dedup_paragraphs over the WHOLE scaled documents table (the
    registry query caps doc_id for its planted oracle, so it carries no
    scale signal)."""
    from pyspark.sql import functions as F

    from valentinus_spark.operators.dedup import dedup_paragraphs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    out = dedup_paragraphs(docs, sep_regex="\\. ", join_sep=". ")
    return out.select(F.sum("n_kept").alias("k"), F.sum("n_paras").alias("n"))


def _probe_warc_scaled_shards(spark, sf_dir):
    """warc roundtrip with the shard count scaling WITH the data
    (constant per-file bytes — the cluster shape), instead of the
    registry query's fixed n_files=4 that funnels 10× bytes through
    4-way parallelism (VERDICT r5 item 8: the 0.61 exponent measured
    there is an n_files artifact, not the family's scaling)."""
    import tempfile

    from pyspark.sql import functions as F

    from valentinus_spark.sources.warc import read_warc, write_warc

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.concat(
            F.lit("http://s"), (F.col("doc_id") % 7).cast("string"),
            F.lit(".example/d"), F.col("doc_id").cast("string"),
        ).alias("url"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    n_rows = docs.count()
    n_files = max(4, n_rows // 1250)  # sf0.1 (5k docs) -> 4; sf1 -> 40
    path = tempfile.mkdtemp(prefix="vs_warc_probe_")
    write_warc(docs, path, n_files=n_files, compression="member")
    back = read_warc(spark, path, record_types=["response"])
    return back.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("payload")).alias("bytes"),
    )


def _probe_transitivity_scaled_edges(spark, sf_dir):
    """clustering_coefficient on a TRUE 10x-edge co-purchase graph
    (VERDICT r6 item 4): the registry query's edges collapse under
    DISTINCT at sf1 (replica orders carry the same part sets), so only
    the k²-per-order fan-out grows, not the wedge join. Offsetting the
    part space per replica (disjoint copies: 10x nodes AND 10x edges —
    the corpus-growth direction) scales the wedge/triangle work itself.
    At sf0.1 all orderkeys are < 1e6, so k=0 and the graph is the base
    graph unchanged."""
    from pyspark.sql import functions as F

    from valentinus_spark.operators.graph import (
        clustering_coefficient,
        copurchase_edges,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey",
        (
            F.col("l_partkey")
            + (F.col("l_orderkey") / F.lit(1_000_000)).cast("bigint")
            * F.lit(10_000_000)
        ).alias("l_partkey"),
    )
    return clustering_coefficient(copurchase_edges(li))


EXTRA_PROBES = {
    "kcore_copurchase": _probe_kcore_copurchase,
    "pq_ann_embeddings": _probe_pq_ann_embeddings,
    "dedup_paragraphs_full": _probe_dedup_paragraphs_full,
    "warc_scaled_shards": _probe_warc_scaled_shards,
    "transitivity_scaled_edges": _probe_transitivity_scaled_edges,
}


def shuffle_write_bytes(ui: str) -> int:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages?status=complete")
    )
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def main() -> None:
    import __spark_entry__ as entrymod
    from valentinus_spark.session import get_spark

    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else ".sf1probe"
    names = sys.argv[2:] or PROBE_QUERIES

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    spark.range(1000).selectExpr("sum(id)").collect()  # codegen warmup

    qs = entrymod.queries()
    results: dict[str, dict] = {}
    for name in names:
        fn = EXTRA_PROBES.get(name) or qs[name]
        results[name] = {}
        for label, sf_dir in (("sf0.1", "/root/testdata/sf0.1"), ("sf1", sf1_dir)):
            best, sh = float("inf"), 0
            for _ in range(2):
                spark.sparkContext._jvm.System.gc()
                sh0 = shuffle_write_bytes(ui)
                t0 = time.time()
                n = len(fn(spark, sf_dir).collect())
                dt = time.time() - t0
                if dt < best:
                    best, sh = dt, shuffle_write_bytes(ui) - sh0
            results[name][label] = (best, sh, n)
            print(
                f"# {name} {label}: {best:.2f}s shuffleWrite={sh/1e6:.1f}MB rows={n}",
                file=sys.stderr,
            )
    print("| query | sf0.1 s | sf1 s | exponent | sf0.1 shuffle | sf1 shuffle | rows sf0.1→sf1 |")
    print("|---|---|---|---|---|---|---|")
    import math

    for name, r in results.items():
        a, b = r["sf0.1"], r["sf1"]
        exp = math.log10(b[0] / a[0]) if a[0] > 0 else float("nan")
        print(
            f"| {name} | {a[0]:.2f} | {b[0]:.2f} | {exp:.2f} | "
            f"{a[1]/1e6:.1f} MB | {b[1]/1e6:.1f} MB | {a[2]}→{b[2]} |"
        )


if __name__ == "__main__":
    main()
