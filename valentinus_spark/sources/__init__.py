from valentinus_spark.sources.csv_ingest import read_review_csv

__all__ = ["read_review_csv"]
