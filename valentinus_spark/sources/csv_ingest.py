"""CSV ingest (reference S1): car-review CSV → collection-input DataFrame.

Reference behavior (examples/cosine_query_example.rs:14-43, test copy
embeddings.rs:589-618): read CSV, keep (review, rating, vehicle_title),
document = review, metadata = Year (first 5 chars of vehicle_title, as
int) + Rating (rating as u64, 0 on parse failure), ids = "id{i}".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_review_csv(spark: SparkSession, path: str) -> DataFrame:
    """Returns (id, document, metadata) matching the reference's derived
    collection input (FIXTURES.md F1).

    - Year: ``substring(vehicle_title, 1, 5)`` cast to long — the reference
      takes chars [0..5) (embeddings.rs:606-609; note 5 chars captures e.g.
      "2018 " whose trailing space trims away in the long cast).
    - Rating: cast with default 0 on failure (embeddings.rs:601-605).
    - id: "id{i}" in file order (embeddings.rs:615-618) —
      ``row_number`` over a file-order window; fine for the reference-shaped
      small corpus (single input file; for TB-scale ingest use
      ``monotonically_increasing_id`` and drop the global-order guarantee).
    """
    raw = (
        spark.read.option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .csv(path)
    )
    w = Window.orderBy(F.monotonically_increasing_id())
    # try_cast + default-0: the reference's parse::<u64>().unwrap_or_default()
    # maps float ratings like "4.875" and misparsed rows to 0
    # (embeddings.rs:601-605); ANSI-mode plain cast would throw instead.
    year = F.coalesce(
        F.trim(F.substring(F.col("vehicle_title"), 1, 5)).try_cast("long"), F.lit(0)
    )
    rating = F.coalesce(F.col("rating").try_cast("long"), F.lit(0))
    return (
        raw.withColumn("_rn", F.row_number().over(w) - 1)
        .select(
            F.concat(F.lit("id"), F.col("_rn")).alias("id"),
            F.coalesce(F.col("review"), F.lit("")).alias("document"),
            F.map_from_arrays(
                F.array(F.lit("Year"), F.lit("Rating")),
                F.array(year.cast("string"), rating.cast("string")),
            ).alias("metadata"),
        )
    )
