"""SparkSession construction with scale-ready defaults.

The reference's "environment open" (database.rs:48-77) maps to building the
one process-wide SparkSession (SURVEY.md §1.4). Config keys use the
``spark.valentinus.*`` namespace (reference env vars README.md:26-32).

Defaults are chosen for the 100 TB design point and are all safe on
local[32]:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing)
- Arrow on (every pandas UDF crossing is vectorized)
- shuffle partitions sized by env (driver bench uses 32 locally; a real
  cluster overrides via ``--conf`` — AQE coalescing makes the static value
  non-critical)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# spark.valentinus.* conf keys (reference env vars, README.md:26-32)
CONF_WAREHOUSE = "spark.valentinus.warehouse"  # ≈ LMDB_USER/VALENTINUS_LMDB_ENV
CONF_DIM = "spark.valentinus.dim"  # ≈ VALENTINUS_CUSTOM_DIM (onnx.rs:23)
CONF_EMBED_BATCH = "spark.valentinus.embedBatchSize"  # ≈ BATCH_SIZE (onnx.rs:17)

DEFAULT_DIM = 384  # reference onnx.rs:20
DEFAULT_EMBED_BATCH = 100  # reference onnx.rs:17


def get_spark(app_name: str = "valentinus-spark", master: str | None = None) -> SparkSession:
    """Build (or fetch) the session with engine defaults applied."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # SPARK_GRAFT_AQE=0 pins the static planner — a correctness shake
    # (dev_compare --no-aqe): results must be identical in both plan
    # spaces, so an operator relying on an AQE-specific physical shape
    # (coalesced partition order, skew-split join) fails the sweep
    aqe = "false" if os.environ.get("SPARK_GRAFT_AQE") == "0" else "true"
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", aqe)
        .config("spark.sql.adaptive.coalescePartitions.enabled", aqe)
        .config("spark.sql.adaptive.skewJoin.enabled", aqe)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        # driver testdata writes TIMESTAMP(NANOS) parquet, which Spark's
        # vectorized reader rejects; read as int64 nanos and convert
        # explicitly (see __spark_entry__._events)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    return builder.getOrCreate()


def warehouse_dir(spark: SparkSession) -> str:
    """Collection storage root (≈ LMDB env dir, database.rs:63-67)."""
    default = os.path.join(os.path.expanduser("~"), ".valentinus_spark")
    return spark.conf.get(CONF_WAREHOUSE, default)


def embedding_dim(spark: SparkSession) -> int:
    return int(spark.conf.get(CONF_DIM, str(DEFAULT_DIM)))
