"""Sequence packing: assign documents to fixed-token-budget training
sequences (GPT-style packing — documents are concatenated in a
deterministic order and cut every ``budget`` tokens, so a document can
span a pack boundary). The pipeline step between a tokenized corpus and a
training dataloader.

No reference equivalent (training-pipeline extension surface).

Scale shape: a global running token offset is a prefix sum, which a naive
``Window.orderBy(id)`` computes on ONE partition — a non-starter at
100 TB. This implements the standard two-level parallel scan instead:

1. bucket rows by the order key (``floor(id / bucket_size)``);
2. per-bucket token totals → cumulative offsets (a window over the tiny
   bucket-count-sized table only);
3. broadcast the offsets back and run the intra-bucket running sum as a
   window PARTITIONED by bucket — every partition-sized window runs in
   parallel, and nothing bigger than #buckets rows is ever serialized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_assignments(
    df: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    budget: int = 2048,
    bucket_size: int = 100_000,
) -> DataFrame:
    """For each document: its global token span and the training packs it
    lands in when the corpus is concatenated in ``id_col`` order and cut
    every ``budget`` tokens. Returns (id_col, token_start, token_end,
    pack_first, pack_last) — ``pack_first != pack_last`` means the doc
    crosses a pack boundary."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    bucketed = df.select(
        id_col,
        F.col(token_col).cast("long").alias("_tok"),
        F.floor(F.col(id_col) / bucket_size).alias("_bucket"),
    )
    # tiny table: one row per bucket — the only globally-ordered window
    bucket_offsets = (
        bucketed.groupBy("_bucket")
        .agg(F.sum("_tok").alias("_btot"))
        .withColumn(
            "_boff",
            F.coalesce(
                F.sum("_btot").over(
                    Window.orderBy("_bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("_bucket", "_boff")
    )
    w = (
        Window.partitionBy("_bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        bucketed.join(F.broadcast(bucket_offsets), "_bucket")
        .withColumn("_end", F.col("_boff") + F.sum("_tok").over(w))
        .select(
            id_col,
            (F.col("_end") - F.col("_tok")).alias("token_start"),
            F.col("_end").alias("token_end"),
            F.floor((F.col("_end") - F.col("_tok")) / budget).alias("pack_first"),
            # greatest(): a zero-token doc has end == start, and end-1 would
            # point into the previous pack
            F.greatest(
                F.floor((F.col("_end") - 1) / budget),
                F.floor((F.col("_end") - F.col("_tok")) / budget),
            ).alias("pack_last"),
        )
    )


def shard_assignment(
    id_col: Column | str, n_shards: int, salt: str = "v1"
) -> Column:
    """Deterministic output-shard id in [0, n_shards) from a key column:
    first 8 hex chars of sha256(salt || key) mod n_shards. Same contract
    as stable_split (functions/text.py): reproducible across runs/engines/
    partitionings, stable under corpus growth, pure per-row expression —
    the assignment half of write planning for sharded training data.
    Change ``salt`` for an independent re-shard."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    bucket = F.conv(
        F.substring(F.sha2(F.concat(F.lit(salt), col.cast("string")), 256), 1, 8),
        16,
        10,
    ).cast("long")
    return F.pmod(bucket, F.lit(n_shards)).alias("shard")


def epoch_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    epoch: int = 0,
    n_shards: int = 16,
    salt: str = "ep-v1",
) -> DataFrame:
    """Deterministic per-epoch global shuffle: every row gets a
    ``(shard, position)`` that is (a) reproducible across runs, engines
    and partitionings, (b) a DIFFERENT permutation each epoch (the epoch
    number is folded into the hash), (c) computed with exactly one
    shuffle — the repartition-by-shard that a sharded write needs
    anyway. This is the data-order contract LLM training wants:
    dataloaders on different hosts agree on the order without
    coordination, and restarts mid-epoch re-derive it instead of
    checkpointing an RNG state.

    shard = sha-bucket of (salt, epoch, id) mod n_shards; position =
    rank of the same hash within the shard (ties broken by id, so the
    permutation is total even under hash collisions). The rank window
    partitions by shard — parallel across shards, never a global sort.

    At 100 TB: the window sorts one shard per task; pick n_shards so a
    shard fits a task's spill budget (shard_manifest predicts sizes
    from the same hash)."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    col = F.col(id_col)
    h = F.conv(
        F.substring(
            F.sha2(
                F.concat(
                    F.lit(f"{salt}:{epoch}:"), col.cast("string")
                ),
                256,
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    with_h = df.withColumn("_eh", h).withColumn(
        "shard", F.pmod(F.col("_eh"), F.lit(n_shards))
    )
    w = Window.partitionBy("shard").orderBy(F.asc("_eh"), F.asc(col))
    return with_h.withColumn(
        "position", (F.row_number().over(w) - 1).cast("long")
    ).drop("_eh")


def shard_manifest(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 16,
    size_cols: tuple[str, ...] = ("n_chars",),
    salt: str = "v1",
) -> DataFrame:
    """Write-planning manifest: per output shard, row count and summed
    sizes — what a sharded-export job checks BEFORE writing 100 TB (shard
    balance, no empty writers, bytes per file target). One map-side-
    combined aggregate on the shard id; at write time the same
    ``shard_assignment`` expression feeds ``repartition(n, shard)`` →
    one writer task per shard, so the manifest predicts the files
    exactly."""
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.col(c).cast("long")).alias(f"total_{c}") for c in size_cols
    ]
    return (
        df.withColumn("shard", shard_assignment(id_col, n_shards, salt))
        .groupBy("shard")
        .agg(*aggs)
    )


def group_sample_k(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    k: int,
    salt: str = "gsk-v1",
) -> DataFrame:
    """Deterministic k-per-group sample: the k rows with the smallest
    sha256(salt || key) within each group (exactly min(k, group size)
    rows per group — the fixed-quota counterpart to the rate-based
    [functions.text.stratified_keep]).

    Properties a corpus-curation pipeline needs and df.sampleBy cannot
    give: reproducible across runs/partitionings/engines (the DuckDB
    oracle recomputes the exact kept set), stable under corpus append
    (a new row evicts at most one old sample member per group), and
    exact quotas rather than binomial rates.

    Plan: ONE shuffle keyed on the group columns for the row_number
    window; ties in the 32-bit hash bucket break on the key itself, so
    the sample is total-order deterministic even on hash collisions.

    The default salt is function-specific on purpose — sharing a salt
    with stable_split/stratified_keep on the same key would correlate
    the sample with split assignment (see weighted_sample_key's note).
    """
    from valentinus_spark.functions.text import _c  # local: avoid cycle at import

    bucket = F.conv(
        F.substring(
            F.sha2(F.concat(F.lit(salt), _c(key_col).cast("string")), 256), 1, 8
        ),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy(*group_cols).orderBy(bucket, F.col(key_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def release_manifest(
    df: DataFrame,
    id_col: str,
    content_col: str,
    n_shards: int = 16,
    salt: str = "v1",
) -> DataFrame:
    """Reproducible-dataset release manifest: per shard (the same
    :func:`shard_assignment` scheme shard_manifest plans with) the row
    count, total content chars, and an ORDER-INDEPENDENT content
    checksum — bit_xor of the portable 60-bit hash of (id, content).
    XOR commutes, so the checksum is stable under any partitioning/
    retry order, and hashing the (id, content) PAIR keeps duplicate
    documents from cancelling each other out of the checksum.

    This is the integrity block of a dataset card: a consumer re-runs
    the same manifest over the delivered shards and diffs — any
    dropped, duplicated, or altered row flips the shard's checksum.
    ONE shuffle keyed on the shard id, fully map-side combinable."""
    from valentinus_spark.functions.text import sha_hash60

    row_h = sha_hash60(
        F.concat(F.col(id_col).cast("string"), F.lit("\x1f"), F.col(content_col))
    )
    return (
        df.select(
            shard_assignment(id_col, n_shards, salt),
            F.length(content_col).alias("_len"),
            row_h.alias("_h"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("_len").alias("n_chars"),
            F.expr("bit_xor(_h)").alias("content_xor"),
        )
    )


def length_bucket_batches(
    df: DataFrame,
    len_col: str,
    id_col: str,
    bucket_width: int = 64,
    batch_size: int = 16,
) -> DataFrame:
    """Dynamic-batching prep for inference/embedding jobs: group rows
    into batches of SIMILAR length so per-batch padding ≈ 0 instead of
    max-doc-length (a uniform-random batch of Zipfian documents pads
    every row to its longest member — routinely 2-5x wasted compute at
    embedding time; this is why serving stacks length-bucket first).

    bucket = len // bucket_width; within a bucket, rows are batched
    ``batch_size`` at a time in deterministic (len, id) order. Returns
    per-batch rows: (bucket, batch_no, n_rows, max_len, padding_waste)
    where padding_waste = Σ(max_len − len) — the exact cost the
    bucketing avoids paying at the full-corpus max.

    Plan: ONE shuffle (the per-bucket window); bucket count ~
    max_len / bucket_width keeps partitions balanced for Zipfian length
    distributions since each bucket's batch loop is embarrassingly
    ordered, not iterative."""
    b = (F.col(len_col) / bucket_width).cast("long").alias("bucket")
    w = Window.partitionBy("bucket").orderBy(F.col(len_col), F.col(id_col))
    rows = df.select(F.col(id_col), F.col(len_col).cast("long"), b).withColumn(
        "batch_no", ((F.row_number().over(w) - 1) / batch_size).cast("long")
    )
    return (
        rows.groupBy("bucket", "batch_no")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.max(len_col).alias("max_len"),
            (F.count(F.lit(1)) * F.max(len_col) - F.sum(len_col)).alias(
                "padding_waste"
            ),
        )
    )
