"""Multi-dimensional data layout: Z-order (Morton) clustering.

At 100 TB the scan cost of a query with predicates on TWO columns is set
by data LAYOUT, not plan shape: files sorted by col A alone cannot skip
for a predicate on col B. Interleaving the bits of both columns into one
Morton key and range-partitioning + sorting by it gives every file a
small bounding box in (A, B) space, so parquet min/max stats prune files
for predicates on EITHER column — the same technique Delta/Iceberg expose
as OPTIMIZE ZORDER BY.

Everything here is plain Catalyst bit arithmetic (shifts, masks, ORs) —
no UDF — so the z-value computation is whole-stage-codegen'd AND
reproducible in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def zorder_value(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton key: interleave the low ``bits`` bits of each column
    (column i contributes bit b to output position b*n_cols + i).
    Columns must be non-negative integers already scaled to ``bits``
    width (use :func:`rank_scale` for arbitrary/skewed data);
    ``n_cols * bits`` must fit in 63 bits.

    Built as an O(bits·n_cols) OR-fold of shift/mask expressions —
    constant-folded per row inside codegen, no Python anywhere."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols × {bits} bits exceeds a signed 64-bit key")
    out = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        cc = (F.col(c) if isinstance(c, str) else c).cast("long")
        for b in range(bits):
            out = out.bitwiseOR(
                F.shiftleft(F.shiftright(cc, b).bitwiseAND(F.lit(1)), b * n + i)
            )
    return out


def rank_scale(df: DataFrame, col: str, bits: int = 16) -> DataFrame:
    """Add ``<col>_scaled``: the column's percent_rank mapped onto
    [0, 2^bits): rank-based scaling makes z-ordering robust to skew and
    arbitrary ranges (a heavy-hitter value occupies one slot, not a whole
    prefix of the key space).

    Computed per DISTINCT value with the two-phase distributed device
    (operators/_distrank.py) instead of a global percent_rank window —
    the window form plans as a data-sized ``Exchange SinglePartition``
    (every row through one task). percent_rank of a row equals
    ``(rank(first peer) - 1) / (n - 1)``, and every row with the same
    value shares it, so: aggregate counts per distinct value, running
    totals over the value order give each value's rank and the grand
    total, and a value-keyed join attaches the scaled slot back to the
    rows. Arithmetic is the same double division percent_rank performs —
    bit-identical output (guarded 0.0 when n <= 1, as percent_rank
    defines). NULL values group and join null-safely, ordering first —
    the window's asc-nulls-first order — so their slot is 0, unchanged.
    """
    from valentinus_spark.operators._distrank import running_totals

    # materialized once: the device's range exchange samples its input
    # for boundaries, which would replay the whole per-value collapse a
    # second time without the checkpoint
    per_val = df.groupBy(F.col(col).alias("_rs_v")).agg(
        F.count(F.lit(1)).alias("_rs_c")
    ).localCheckpoint()
    run = running_totals(per_val, ["_rs_v"], ["_rs_c"], with_totals=True)
    pr = F.when(
        F.col("_tot_rs_c") > 1,
        # rank of the value's first peer = cumulative count up to and
        # including this value, minus its own count, plus 1; percent_rank
        # = (rank - 1) / (n - 1) in double — the window's exact formula
        (F.col("_run_rs_c") - F.col("_rs_c")).cast("double")
        / (F.col("_tot_rs_c") - 1).cast("double"),
    ).otherwise(F.lit(0.0))
    slots = run.select(
        "_rs_v",
        F.least(
            F.floor(pr * (1 << bits)).cast("long"), F.lit((1 << bits) - 1)
        ).alias(f"{col}_scaled"),
    )
    return df.join(slots, df[col].eqNullSafe(slots["_rs_v"])).drop("_rs_v")


def zorder_frame(
    df: DataFrame, cols: list[str], bits: int = 16, n_partitions: int | None = None
) -> DataFrame:
    """The clustering transform itself: add ``_zval`` and range-partition +
    sort by it. Writing the result to parquet yields files whose (cols…)
    bounding boxes are small — min/max pruning then works for predicates
    on ANY of the z-ordered columns.

    Plan: one RangePartitioning Exchange on the Morton key (sampled range
    bounds — no skew pileup) + in-partition sort; the write stays a plain
    parquet append. At 100 TB this is the standard compaction job shape:
    scan → exchange → sorted write, no driver involvement."""
    out = df.withColumn("_zval", zorder_value(list(cols), bits))
    if n_partitions:
        out = out.repartitionByRange(n_partitions, "_zval")
    else:
        out = out.repartitionByRange("_zval")
    return out.sortWithinPartitions("_zval")


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    n_files: int = 64,
) -> None:
    """Compact ``df`` into ``n_files`` z-ordered parquet files at ``path``.
    Each output file covers a contiguous Morton range ⇒ a tight bounding
    box in the z-ordered columns ⇒ parquet footer min/max stats prune
    whole files for predicates on any clustered column."""
    zorder_frame(df, cols, bits, n_partitions=n_files).drop("_zval").write.mode(
        "overwrite"
    ).parquet(path)


def zorder_bucket_stats(
    df: DataFrame, cols: list[str], bits: int = 8, n_buckets: int = 32
) -> DataFrame:
    """Layout-quality diagnostic: split the Morton key space into
    ``n_buckets`` equal-count buckets (ntile semantics) and report each
    bucket's per-column min/max bounding box + row count. Tight
    per-bucket ranges on EVERY column are exactly the property that
    makes file-level min/max pruning effective; the same numbers double
    as the oracle surface (ntile + min/max are plain SQL).

    The bucket assignment is NTILE(n_buckets) OVER (ORDER BY _zval,
    cols…) — but computed by two-phase distributed ranking (the
    profile.exact_quantiles shape: one range exchange + per-partition
    offsets) instead of a single-partition global window, which
    serializes the whole table through one task. Rows tied on the full
    ordering key are identical in every reported column, so any
    tie-consistent global rank yields the same bucket aggregates as the
    window ntile — bit-for-bit the oracle's answer."""
    z = df.select(
        *[F.col(c) for c in cols], zorder_value(list(cols), bits).alias("_zval")
    )
    ranked = (
        z.repartitionByRange(F.col("_zval"), *[F.col(c) for c in cols])
        .sortWithinPartitions("_zval", *cols)
        .withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("_pid", F.shiftrightunsigned("_mid", 33))
        .withColumn(
            "_rn", F.col("_mid").bitwiseAND(F.lit((1 << 33) - 1)) + F.lit(1)
        )
    )
    offsets = (
        ranked.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_cnt").over(
                    Window.orderBy("_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .withColumn("_n", F.sum("_cnt").over(Window.partitionBy()))
    )
    # NTILE(nb) over n rows via the shared closed form — exact integer
    # arithmetic throughout (decimal floor division: no double mis-floor
    # once n exceeds 2^53, unlike the former (n / nb).cast("long"))
    from valentinus_spark.operators._distrank import ntile_from_rank

    bucket = ntile_from_rank(
        F.col("_offset") + F.col("_rn"), F.col("_n"), n_buckets
    )
    bucketed = ranked.join(
        F.broadcast(offsets.select("_pid", "_offset", "_n")), "_pid"
    ).withColumn("bucket", bucket.cast("int"))
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return bucketed.groupBy("bucket").agg(*aggs)


def file_minmax_manifest(
    spark, path: str, cols: list[str]
) -> DataFrame:
    """Per-FILE min/max + row-count manifest of a parquet directory —
    the Delta data-skipping / Iceberg manifest-file shape, as a plain
    DataFrame: (file, n_rows, min_<c>, max_<c> …).

    At 100 TB the win is that pruning consults this (#files)-row table
    instead of opening parquet footers across object storage: persist
    the manifest next to the table after each compaction/z-order pass
    and the planner-side prune becomes a millisecond scan. One
    aggregation keyed on the file name (alignment with files makes the
    shuffle trivially combinable)."""
    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return (
        df.select(F.input_file_name().alias("file"), *cols)
        .groupBy("file")
        .agg(*aggs)
    )


def prune_files(manifest: DataFrame, col: str, lo, hi) -> list[str]:
    """File names whose [min_col, max_col] range intersects [lo, hi] —
    the candidate set a range predicate must read. The manifest is
    files-sized, so the collect is a planner-side lookup, not a data
    scan. Null-stat files (all-null column) are kept: skipping them
    would need null-count stats (correctness first)."""
    keep = manifest.filter(
        (F.col(f"min_{col}").isNull())
        | ((F.col(f"min_{col}") <= F.lit(hi)) & (F.col(f"max_{col}") >= F.lit(lo)))
    )
    return [r["file"] for r in keep.select("file").collect()]


def pruned_read(spark, path: str, manifest: DataFrame, col: str, lo, hi) -> DataFrame:
    """Read only the files that can contain ``col BETWEEN lo AND hi``
    (per :func:`prune_files`) and re-apply the exact predicate — file
    skipping is a superset prefilter, the residual filter keeps
    semantics exact. On a z-ordered table (write_zordered) the file set
    shrinks to the bounding-box hits, which is the whole point of the
    layout."""
    files = prune_files(manifest, col, lo, hi)
    if not files:
        return (
            spark.read.parquet(path)
            .filter(F.col(col).between(lo, hi))
            .limit(0)
        )
    return (
        spark.read.parquet(*files).filter(F.col(col).between(lo, hi))
    )


def file_stats(spark, path: str) -> DataFrame:
    """One row per parquet file under ``path``: (file, n_rows). Computed
    distributedly from the scan's hidden file-name column, so it works
    unchanged on object storage — no driver-side directory walk."""
    return (
        spark.read.parquet(path)
        .select(F.input_file_name().alias("file"))
        .groupBy("file")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def compact_small_files(
    spark,
    src_path: str,
    dst_path: str,
    target_files: int,
    sort_cols: list[str] | None = None,
) -> DataFrame:
    """Rewrite a parquet directory into exactly ``target_files`` files
    (the OPTIMIZE / small-file-compaction maintenance op every table
    format grows: Delta OPTIMIZE, Iceberg rewrite_data_files).

    Why it matters at 100 TB: a streaming or per-task writer leaves
    thousands of KB-sized files per partition; every later scan then
    pays one object-store round-trip + footer parse per file, and the
    scheduler drowns in single-row splits. Compaction is a single
    round-robin `repartition(n)` — an Exchange whose width you choose —
    followed by one write; with ``sort_cols`` it instead range-
    partitions and sorts within files, restoring clustering (and
    min/max skippability, see `file_minmax_manifest`) at the same cost.

    Returns the compacted DataFrame reader rooted at ``dst_path``.
    Pick ``target_files`` ≈ total_bytes / 128 MB in production; it is
    explicit here so the result (and its oracle) is deterministic."""
    df = spark.read.parquet(src_path)
    if sort_cols:
        shaped = df.repartitionByRange(target_files, *sort_cols)
        shaped = shaped.sortWithinPartitions(*sort_cols)
    else:
        shaped = df.repartition(target_files)
    shaped.write.mode("overwrite").parquet(dst_path)
    return spark.read.parquet(dst_path)


def file_bloom_manifest(
    spark, path: str, col: str, k: int = 4, m: int = 4096
) -> DataFrame:
    """Per-FILE Bloom filter manifest of a parquet directory — the
    point-lookup complement to :func:`file_minmax_manifest`: min/max
    skips RANGE misses, but a point probe whose value falls inside a
    file's [min, max] without being present still reads the file; its
    Bloom bits say "definitely absent" and skip it (Delta/Iceberg carry
    exactly this pair of stats per file). One row per (file, set bit),
    ≤ m rows per file regardless of file size; the same portable sha
    hashing as sketches.bloom_build, so the manifest replays in DuckDB.

    Plan: one scan fanning each value into k positions + a distinct
    keyed on (file, bit) — map-side combinable, aligned with files.
    """
    from valentinus_spark.operators.sketches import _sha_slice

    df = spark.read.parquet(path)
    cells = F.array(*[(_sha_slice(col, j) % m) for j in range(k)])
    return (
        df.select(F.input_file_name().alias("file"), F.explode(cells).alias("bit"))
        .distinct()
    )


def bloom_prune_files(
    spark, manifest: DataFrame, value, k: int = 4, m: int = 4096
) -> list[str]:
    """File names whose Bloom filter might contain ``value`` (ALL k bit
    positions set — no false negatives, so pruning is lossless; false
    positives only cost a wasted read). Planner-side lookup over the
    (files × bits)-sized manifest, no data scan."""
    probe = spark.createDataFrame([(str(value),)], ["_v"])
    from valentinus_spark.operators.sketches import _sha_slice

    cells = (
        probe.select(
            F.explode(
                F.array(*[(_sha_slice("_v", j) % m) for j in range(k)])
            ).alias("bit")
        )
        .distinct()  # hash slices may collide onto one bit
        .localCheckpoint()
    )
    nbits = cells.count()
    files = (
        manifest.join(F.broadcast(cells), "bit", "semi")
        .groupBy("file")
        .agg(F.count(F.lit(1)).alias("_h"))
        .filter(F.col("_h") == nbits)
    )
    return [r["file"] for r in files.select("file").collect()]


def bloom_pruned_read(
    spark, path: str, manifest: DataFrame, col: str, value, k: int = 4, m: int = 4096
) -> DataFrame:
    """Read only the files whose Bloom might contain ``col = value``
    and re-apply the exact predicate (skipping is a superset prefilter,
    the residual equality keeps semantics exact — same contract as
    :func:`pruned_read`)."""
    files = bloom_prune_files(spark, manifest, value, k, m)
    if not files:
        return spark.read.parquet(path).filter(F.col(col) == value).limit(0)
    return spark.read.parquet(*files).filter(F.col(col) == value)
