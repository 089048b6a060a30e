"""JSONL document ingest — the lingua franca of training-data corpora
(one JSON object per line: text + arbitrary metadata).

The reference ingests only CSV (examples/cosine_query_example.rs:14-43);
a 100 TB corpus arrives as millions of .jsonl(.gz/.zst) shards. Spark's
JSON source is splittable per-line, schema-inferrable or explicit, and
reads compressed shards transparently — so this is a thin projection
layer, not a parser."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import MapType, StringType


def write_jsonl(
    df: DataFrame,
    path: str,
    n_files: int | None = None,
    compression: str | None = "gzip",
    sort_cols: list[str] | None = None,
) -> None:
    """Write a DataFrame as JSONL shards (optionally gzip per shard —
    self-contained files any downstream tokenizer/trainer can stream).

    ``n_files`` bounds the shard count via repartition; ``sort_cols``
    range-partitions + sorts within shards so each file covers a
    contiguous key range (stream a shard = stream a key range, and
    gzip compresses sorted runs better). At scale prefer a shard count
    that yields 100 MB–1 GB per compressed file: small-file floods are
    the #1 JSONL-corpus pathology (see operators/compaction.py)."""
    if n_files is not None:
        if sort_cols:
            df = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(
                *sort_cols
            )
        else:
            df = df.repartition(n_files)
    writer = df.write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    text_field: str = "text",
    id_field: str | None = "id",
    meta_fields: list[str] | None = None,
    schema: str | None = None,
) -> DataFrame:
    """Read a JSONL corpus into collection-input shape
    ``(id, document, metadata)``.

    - ``id_field=None`` derives ids as ``id{monotonic}`` (NOT globally
      dense — fine as a unique key, wrong as a row number; corpora at
      scale should carry their own ids).
    - ``meta_fields``: which top-level fields to fold into the
      ``map<string,string>`` metadata column (default: every field except
      text and id).
    - ``schema``: explicit DDL string to skip inference (inference reads
      the data twice — always pass a schema for a large corpus).
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    raw = reader.json(path)
    if meta_fields is None:
        meta_fields = [c for c in raw.columns if c not in (text_field, id_field)]
    if id_field is not None:
        id_col = F.col(id_field).cast("string")
    else:
        id_col = F.concat(F.lit("id"), F.monotonically_increasing_id())
    if meta_fields:
        metadata = F.map_from_arrays(
            F.array(*[F.lit(c) for c in meta_fields]),
            F.array(*[F.col(c).cast("string") for c in meta_fields]),
        )
    else:
        metadata = F.lit(None).cast(MapType(StringType(), StringType()))
    return raw.select(
        id_col.alias("id"),
        F.col(text_field).cast("string").alias("document"),
        metadata.alias("metadata"),
    )
