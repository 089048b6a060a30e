from valentinus_spark.sources.csv_ingest import read_review_csv
from valentinus_spark.sources.jsonl import read_documents_jsonl
from valentinus_spark.sources.tables import write_bucketed

__all__ = ["read_review_csv", "read_documents_jsonl", "write_bucketed"]
