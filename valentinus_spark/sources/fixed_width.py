"""Fixed-width (mainframe/COBOL copybook-style) text interchange.

The one legacy feed format the CSV/JSONL/WARC/ORC source stack didn't
cover: records are fixed-length lines, fields are (start, width)
CHARACTER slices (Spark's substring/rpad semantics — identical to byte
slices for the single-byte-encoded feeds this format comes from; a
feed carrying multi-byte text must be width-specified in characters),
numerics are right-aligned space-padded. No reference
equivalent (/root/reference ingests CSV only — SURVEY.md S1);
training-data pipelines meet this format in financial/industrial data
drops.

Scale shape: reading is `spark.read.text` (splittable line format) +
row-local substring slices — pure Catalyst, whole-stage codegen, no
Python. Writing is the same in reverse (rpad/lpad + concat) through
`spark.write.text`. Parallelism is the line-file block layout, exactly
like CSV.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# colspec: (name, start [1-based], width, type)
ColSpec = tuple


def read_fixed_width(
    spark: SparkSession,
    path: str,
    colspecs: list[ColSpec],
) -> DataFrame:
    """Read fixed-width lines into typed columns: each (name, start,
    width, dtype) slice is trimmed and cast — `try_cast` under ANSI
    mode would hide feed corruption, so a malformed numeric FAILS the
    read (use dtype 'string' and cast downstream to quarantine instead).
    1-based ``start`` matches copybook conventions."""
    lines = spark.read.text(path)
    cols = []
    for name, start, width, dtype in colspecs:
        c = F.trim(F.substring(F.col("value"), start, width))
        if dtype != "string":
            c = c.cast(dtype)
        cols.append(c.alias(name))
    return lines.select(*cols)


def write_fixed_width(
    df: DataFrame,
    path: str,
    colspecs: list[ColSpec],
    n_files: int | None = None,
) -> None:
    """Write rows as fixed-width lines. Strings left-align (rpad),
    numerics right-align (lpad); a value wider than its field raises
    rather than silently truncating (truncation is data corruption in
    this format — there is no quoting to recover from)."""
    from pyspark.sql.types import StringType

    parts = []
    for name, _start, width, _dtype in colspecs:
        is_str = isinstance(df.schema[name].dataType, StringType)
        s = F.col(name).cast("string")
        s = F.coalesce(s, F.lit(""))
        over = F.length(s) > width
        padded = F.when(
            over,
            F.raise_error(
                F.concat(
                    F.lit(f"fixed-width overflow in column {name!r}: "), s
                )
            ),
        ).otherwise(F.rpad(s, width, " ") if is_str else F.lpad(s, width, " "))
        parts.append(padded)
    out = df.select(F.concat(*parts).alias("value"))
    if n_files is not None:
        out = out.repartition(n_files)
    out.write.mode("overwrite").text(path)
