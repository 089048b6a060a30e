from valentinus_spark.sources.csv_ingest import read_review_csv
from valentinus_spark.sources.warc import encode_warc, parse_warc_bytes, read_warc, write_warc
from valentinus_spark.sources.fixed_width import read_fixed_width, write_fixed_width
from valentinus_spark.sources.formats import read_orc, write_orc
from valentinus_spark.sources.jsonl import read_documents_jsonl
from valentinus_spark.sources.tables import write_bucketed
from valentinus_spark.sources.versioned import (
    commit_version,
    merge_into,
    compact_commit,
    latest_version,
    list_versions,
    read_version,
    table_history,
    vacuum,
)

__all__ = [
    "parse_warc_bytes",
    "encode_warc",
    "write_warc",
    "read_warc",
    "merge_into",
    "read_review_csv",
    "read_documents_jsonl",
    "write_bucketed",
    "read_fixed_width",
    "read_orc",
    "write_fixed_width",
    "write_orc",
    "commit_version",
    "compact_commit",
    "latest_version",
    "list_versions",
    "read_version",
    "table_history",
    "vacuum",
]
