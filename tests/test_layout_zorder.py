"""Z-order layout tests (operators/layout.py): Morton key math, locality
of the clustered layout, and the write path's physical plan."""

import pytest
from pyspark.sql import functions as F

from valentinus_spark.operators.layout import (
    rank_scale,
    write_zordered,
    zorder_bucket_stats,
    zorder_frame,
    zorder_value,
)


def test_zorder_value_known_bits(spark):
    # x=0b11, y=0b01 at 2 bits: out bit layout y1 x1 y0 x0 → 0b0111 = 7
    df = spark.createDataFrame([(3, 1)], "x long, y long")
    assert df.select(zorder_value(["x", "y"], bits=2).alias("z")).first()["z"] == 7
    # single column degenerates to the identity on the low bits
    assert (
        df.select(zorder_value(["x"], bits=2).alias("z")).first()["z"] == 3
    )


def test_zorder_value_width_guard():
    with pytest.raises(ValueError, match="64-bit"):
        zorder_value(["a", "b", "c", "d"], bits=16)


def test_rank_scale_range_and_monotone(spark):
    df = spark.createDataFrame([(v,) for v in [5, 1000, 7, 99, 5]], "v long")
    out = {r["v"]: r["v_scaled"] for r in rank_scale(df, "v", bits=8).collect()}
    assert all(0 <= s < 256 for s in out.values())
    assert out[5] < out[7] < out[99] < out[1000]


def test_zorder_locality_beats_single_column_sort(spark):
    """The point of z-ordering: bucket bounding boxes stay small on BOTH
    dims. Sorting by x alone gives each bucket the FULL y range; the
    Morton layout must cut the mean y-extent by a large factor."""
    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    zstats = zorder_bucket_stats(grid, ["x", "y"], bits=6, n_buckets=16).collect()

    def mean_extent(rows, c):
        return sum(r[f"max_{c}"] - r[f"min_{c}"] for r in rows) / len(rows)

    # x-sorted baseline: bucket = ntile over x ordering
    from pyspark.sql import Window

    xsorted = (
        grid.withColumn("bucket", F.ntile(16).over(Window.orderBy("x", "y")))
        .groupBy("bucket")
        .agg(F.min("y").alias("min_y"), F.max("y").alias("max_y"))
        .collect()
    )
    assert mean_extent(zstats, "y") < 0.5 * mean_extent(xsorted, "y")
    # and the z layout still bounds x: each of 16 buckets ≪ full 0..63
    assert mean_extent(zstats, "x") < 32


def test_write_zordered_files_and_pruning_stats(spark, tmp_path):
    grid = spark.range(32 * 32).select(
        (F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("long").alias("y")
    )
    path = str(tmp_path / "zorded")
    write_zordered(grid, path, ["x", "y"], bits=5, n_files=8)
    back = spark.read.parquet(path)
    assert back.count() == 1024
    assert set(back.columns) == {"x", "y"}


def test_zorder_frame_plan_has_range_partitioning(spark):
    grid = spark.range(100).select(
        (F.col("id") % 10).alias("x"), (F.col("id") / 10).cast("long").alias("y")
    )
    plan = (
        zorder_frame(grid, ["x", "y"], bits=4, n_partitions=4)
        ._jdf.queryExecution()
        .toString()
    )
    assert "rangepartitioning" in plan.lower()


# ----------------------------------------------- min/max file skipping


from valentinus_spark.operators.layout import (  # noqa: E402
    file_minmax_manifest,
    prune_files,
    pruned_read,
    write_zordered,
)


@pytest.fixture(scope="module")
def zordered_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("zord"))
    rows = [(i, i % 100, (i * 7) % 100, float(i % 50)) for i in range(5000)]
    df = spark.createDataFrame(rows, "id long, a long, b long, v double")
    write_zordered(df, path, ["a", "b"], bits=8, n_files=16)
    return path


def test_manifest_covers_all_files_and_rows(spark, zordered_dir):
    man = file_minmax_manifest(spark, zordered_dir, ["a", "b"])
    rows = man.collect()
    assert len(rows) == 16
    assert sum(r["n_rows"] for r in rows) == 5000
    assert all(r["min_a"] <= r["max_a"] for r in rows)


def test_prune_files_skips_most_files(spark, zordered_dir):
    man = file_minmax_manifest(spark, zordered_dir, ["a", "b"])
    cand = prune_files(man, "a", 10, 19)
    # z-ordered layout: a 10%-wide range on one clustered column must
    # not touch every file (bounding boxes are tight on both columns)
    assert 0 < len(cand) < 16


def test_pruned_read_exact_vs_full_scan(spark, zordered_dir):
    man = file_minmax_manifest(spark, zordered_dir, ["a", "b"])
    pruned = sorted(
        map(tuple, pruned_read(spark, zordered_dir, man, "a", 10, 19).collect())
    )
    full = sorted(
        map(
            tuple,
            spark.read.parquet(zordered_dir).filter(F.col("a").between(10, 19)).collect(),
        )
    )
    assert pruned == full and len(full) == 500


def test_pruned_read_empty_range(spark, zordered_dir):
    man = file_minmax_manifest(spark, zordered_dir, ["a", "b"])
    assert prune_files(man, "a", 1000, 2000) == []
    assert pruned_read(spark, zordered_dir, man, "a", 1000, 2000).count() == 0


def test_bloom_manifest_prunes_point_lookup_losslessly(spark, tmp_path):
    """Files written key-disjoint: the Bloom manifest must (a) never
    skip a file that holds the probe value (lossless), (b) actually
    skip files for a value confined to one file (effective) — the case
    min/max skipping cannot help when every file's range covers the
    probe."""
    from valentinus_spark.operators import (
        bloom_prune_files,
        bloom_pruned_read,
        file_bloom_manifest,
    )

    path = str(tmp_path / "btbl")
    # keys 0..79 spread so each file holds an interleaved (not
    # contiguous) key set: every file's [min,max] covers most probes,
    # making min/max skipping useless — exactly bloom's case
    df = spark.range(0, 800).select(
        (F.col("id") % 80).alias("k"), F.col("id").alias("payload")
    )
    df.repartition(8, "k").write.mode("overwrite").parquet(path)
    man = file_bloom_manifest(spark, path, "k", k=4, m=4096).localCheckpoint()
    n_files = spark.read.parquet(path).select(
        F.input_file_name()
    ).distinct().count()

    for probe in (0, 7, 79):
        files = bloom_prune_files(spark, man, probe, k=4, m=4096)
        assert 1 <= len(files) < n_files, (
            f"probe {probe}: kept {len(files)}/{n_files} files"
        )
        got = sorted(
            r.payload
            for r in bloom_pruned_read(spark, path, man, "k", probe).collect()
        )
        want = sorted(
            r.payload
            for r in spark.read.parquet(path).filter(F.col("k") == probe).collect()
        )
        assert got == want and len(got) == 10

    # absent value: every file may be skipped (no false negatives needed)
    got = bloom_pruned_read(spark, path, man, "k", 999).collect()
    assert got == []
