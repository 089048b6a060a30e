"""Bucketed table writes: the pre-shuffle that makes repeated big joins
and aggregations on the same key shuffle-free.

Bucketing hash-partitions data INTO THE STORAGE LAYOUT (N buckets on a
key, recorded in the catalog), so a join or groupBy on that key between
co-bucketed tables needs no Exchange at query time — the shuffle was
paid once at write time. This is the standing answer to "this 100 TB
fact table joins the same dimension key in every pipeline run":

    write_bucketed(lineitem, "li_b", by="l_orderkey", buckets=64)
    write_bucketed(orders,  "ord_b", by="o_orderkey", buckets=64)
    spark.table("li_b").join(spark.table("ord_b"), ...)  # zero Exchange

Requires ``saveAsTable`` (bucket metadata lives in the session catalog);
path-based parquet cannot carry bucket info. Bucket count is fixed at
write time — pick it for the target cluster (a few × total cores), and
keep `spark.sql.sources.bucketing.autoBucketedScan.enabled` default so
Spark ignores bucketing when it doesn't help.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    by: str | Sequence[str],
    buckets: int,
    sort_by: str | Sequence[str] | None = None,
    mode: str = "errorifexists",
) -> None:
    """Persist ``df`` as a bucketed (optionally bucket-sorted) managed
    table. ``sort_by`` additionally sorts within each bucket file, which
    upgrades later sort-merge joins on the key to skip their sort."""
    cols = [by] if isinstance(by, str) else list(by)
    writer = df.write.mode(mode).bucketBy(buckets, *cols)
    if sort_by is not None:
        sort_cols = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)
