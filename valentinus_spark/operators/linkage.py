"""Blocked entity resolution (record linkage): multi-pass blocking +
within-block edit-distance scoring.

The naive formulation of "find records that refer to the same entity" is
an all-pairs string comparison — O(n²) comparisons of an O(len²)
distance function, hopeless at corpus scale. The standard fix (Fellegi &
Sunter 1969 lineage; every modern ER system — Dedupe, Zingg, JedAI —
does this) is *blocking*: derive one or more cheap deterministic keys
per record (first token, length band, phonetic code, sorted-token
prefix), compare only records sharing a key, and union candidate pairs
across several blocking passes so that a single noisy key doesn't cost
recall.

Spark shape (why this survives 100 TB):
  1. each record explodes into k (scheme_idx, block_key) rows — a
     narrow map, no shuffle;
  2. candidates come from ONE self equi-join on (scheme_idx, block_key)
     — a hash/sort-merge join keyed on the block, never a cartesian
     product; block-size skew is bounded by `max_block` (oversized
     junk blocks — empty names, boilerplate — are dropped, the
     standard "block purging" step);
  3. pair dedup across schemes is a `distinct()` on (id_a, id_b) —
     one shuffle on the pair key;
  4. only surviving pairs pay the O(len²) `levenshtein` comparison,
     JVM-side whole-stage codegen (never a Python UDF).

The reference engine has no linkage surface (it is a vector store —
/root/reference/src/embeddings.rs); this module is part of the
training-data-pipeline tier: near-identical author/title/name records
are a classic dedup-adjacent contamination source.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _norm(name: Column | str) -> Column:
    """Case-fold, trim, and collapse runs of whitespace — the minimal
    canonicalization both engines (Spark / DuckDB oracle) agree on."""
    c = F.col(name) if isinstance(name, str) else name
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def blocking_keys(name: Column | str, band: int = 4) -> list[Column]:
    """The default two-pass blocking schemes over a name column:

    - pass 0: (first token, length band) — catches edits in the tail;
    - pass 1: (last token, length band)  — catches edits in the head.

    ``band`` is the length-quantization width: two strings can only block
    together if ``len(a)//band == len(b)//band``, which bounds the
    length delta a pair must bridge and keeps blocks small. Both schemes
    are pure string expressions (no shuffle, no UDF)."""
    n = _norm(name)
    toks = F.split(n, " ")
    lband = F.floor(F.length(n) / band).cast("long")
    return [
        F.concat_ws("#", F.element_at(toks, 1), lband),
        F.concat_ws("#", F.element_at(toks, -1), lband),
    ]


def candidate_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    band: int = 4,
    max_block: int = 2000,
) -> DataFrame:
    """Multi-pass blocked candidate generation: returns distinct
    ``(id_a, id_b)`` with ``id_a < id_b`` for every pair of records that
    shares at least one blocking key. Blocks larger than ``max_block``
    are purged before the join (a block of size m contributes m²/2
    pairs; unbounded hot blocks are exactly the skew that kills the
    stage at scale)."""
    from valentinus_spark.functions.util import ensure_parallelism

    keys = blocking_keys(name_col, band)
    # single-file inputs otherwise derive blocks — and pay the
    # downstream levenshtein — on one core; spread first. Records whose
    # normalized name is empty are purged: missing data all shares the
    # degenerate block key (and a 0-distance "match"), which is noise,
    # not linkage — the standard ER missing-value rule.
    from pyspark.sql import Window

    exploded = (
        ensure_parallelism(df)
        .where(F.length(_norm(name_col)) > 0)
        .select(
            F.col(id_col).alias("_bid"),
            F.posexplode(F.array(*keys)).alias("_scheme", "_bkey"),
        )
        .where(F.length("_bkey") > 1)
    )
    # block purge via a block-keyed window instead of aggregate+join:
    # ONE exchange establishes hashpartitioning on (_scheme, _bkey) —
    # exactly the self-join key — so BOTH join sides arrive
    # pre-partitioned (and pre-sorted by the window) and the candidate
    # join adds no exchange or sort of its own; the former shape paid
    # the aggregate's exchange plus two join-side exchanges for the
    # same rows (guide §2.4 — two operations keyed the same way share
    # one exchange). The exchange is an EXPLICIT keyed repartition at
    # defaultParallelism, which AQE may not coalesce: the blocked rows
    # are byte-tiny but the pipeline above them (window + self-join
    # fan-out + pair dedup) is row-expensive, and AQE's size-based
    # coalescing otherwise funneled it through 2 tasks (measured 6 s of
    # the query's 4–5 s wall on a 32-core box).
    par = df.sparkSession.sparkContext.defaultParallelism
    wblk = Window.partitionBy("_scheme", "_bkey")
    kept = (
        exploded.repartition(par, "_scheme", "_bkey")
        .withColumn("_bn", F.count(F.lit(1)).over(wblk))
        .where(F.col("_bn") <= max_block)
        .select("_scheme", "_bkey", "_bid")
    )
    a = kept.select(
        F.col("_scheme"), F.col("_bkey"), F.col("_bid").alias("_ida")
    )
    b = kept.select(
        F.col("_scheme"), F.col("_bkey"), F.col("_bid").alias("_idb")
    )
    return (
        a.join(b, ["_scheme", "_bkey"])
        .where(F.col("_ida") < F.col("_idb"))
        .select(F.col("_ida").alias("id_a"), F.col("_idb").alias("id_b"))
        .distinct()
    )


def linkage_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_dist: int = 8,
    band: int = 4,
    max_block: int = 2000,
) -> DataFrame:
    """Blocked record linkage: candidate pairs whose normalized names are
    within ``max_dist`` Levenshtein edits. Returns
    ``(id_a, id_b, edit_dist, name_sim)`` where ``name_sim`` is the
    length-normalized similarity ``1 - dist / max(len_a, len_b)``
    rounded to 4 places (the usual [0,1] match score).

    Only candidate pairs (shared block) pay the O(len²) distance; the
    comparison itself is `F.levenshtein` — JVM codegen, identical
    semantics to DuckDB's `levenshtein`, which is what makes the oracle
    bit-exact."""
    cands = candidate_pairs(df, id_col, name_col, band, max_block)
    named = df.select(
        F.col(id_col).alias("_nid"), _norm(name_col).alias("_nname")
    )
    scored = (
        cands.join(named.withColumnRenamed("_nid", "id_a"), "id_a")
        .withColumnRenamed("_nname", "_name_a")
        .join(named.withColumnRenamed("_nid", "id_b"), "id_b")
        .withColumnRenamed("_nname", "_name_b")
        .withColumn("edit_dist", F.levenshtein("_name_a", "_name_b"))
        .where(F.col("edit_dist") <= max_dist)
    )
    return scored.select(
        "id_a",
        "id_b",
        "edit_dist",
        F.round(
            1.0
            - F.col("edit_dist")
            / F.greatest(F.length("_name_a"), F.length("_name_b")),
            4,
        ).alias("name_sim"),
    )
