"""Port of the reference's cosine_query example
(reference: examples/cosine_query_example.rs:14-94): ingest the car-review
CSV, build + save a collection, run a filtered cosine top-10, then clean up.

Run: python examples/cosine_query_example.py [csv_path]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from valentinus_spark import EmbeddingCollection, HashEmbedder, get_spark
from valentinus_spark.sources.csv_ingest import read_review_csv

CSV = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/data/Scraped_Car_Review_tesla.csv"


def main():
    spark = get_spark("cosine-example")
    spark.sparkContext.setLogLevel("ERROR")

    docs = read_review_csv(spark, CSV)
    col = EmbeddingCollection.from_dataframe(
        # the reference example downloads all-MiniLM-L6-v2; swap in
        # OnnxEmbedder(model_path=...) when the model files are present
        spark, docs, "csv_test_collection", embedder=HashEmbedder(dim=384)
    ).save()

    # filtered query (reference examples/cosine_query_example.rs:64-77)
    result = col.cosine_query(
        "Find the best reviews.",
        num_results=10,
        f_where=[{"Year": {"eq": 2017}}, {"Rating": {"gt": 3}}],
    )
    result.show(10, truncate=60)

    # unfiltered (reference examples/cosine_query_example.rs:79-86)
    col.cosine_query("Find the best reviews.", num_results=5).show(5, truncate=60)

    EmbeddingCollection.delete(spark, col.get_view())
    print("deleted", col.get_view())


if __name__ == "__main__":
    main()
