"""Columnar interchange formats beyond parquet.

Parquet is this engine's native layout (the reference's LMDB pages map
to parquet row groups — SURVEY.md §2.1 disposition), but a 100 TB lake
is rarely single-format: Hive-era ORC tables, JSONL drops, CSV exports
all feed the same pipelines. Spark's DataSource V2 gives ORC the same
scan machinery as parquet — splittable stripes, predicate pushdown,
column pruning, vectorized reads — so supporting it is a format string
plus the same layout discipline (file sizing, sorted clustering), not a
new code path. These helpers exist so callers get that discipline (and
an explicit schema — no silent inference scans over object storage) by
default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_orc(
    df: DataFrame,
    path: str,
    n_files: int | None = None,
    sort_cols: list[str] | None = None,
    compression: str = "zstd",
) -> None:
    """Write ``df`` as ORC. Same shaping contract as
    ``layout.compact_small_files``: explicit file count (round-robin,
    or range-partitioned + sorted when ``sort_cols`` is given, which
    also populates ORC's stripe-level min/max indexes the reader's
    predicate pushdown consumes)."""
    shaped = df
    if n_files is not None:
        if sort_cols:
            shaped = df.repartitionByRange(n_files, *sort_cols)
            shaped = shaped.sortWithinPartitions(*sort_cols)
        else:
            shaped = df.repartition(n_files)
    shaped.write.mode("overwrite").option("compression", compression).orc(path)


def read_orc(
    spark: SparkSession, path: str, schema=None
) -> DataFrame:
    """Read an ORC directory; pass ``schema`` (DDL string or StructType)
    to skip footer-sampling inference — on object storage an inference
    pass is a full listing + footer fetch per file."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)
