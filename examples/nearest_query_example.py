"""Port of the reference's nearest_query example
(reference: examples/nearest_query_example.rs:3-50): 10 topic sentences,
find the nearest to a food-related query.

Run: python examples/nearest_query_example.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from valentinus_spark import EmbeddingCollection, HashEmbedder, get_spark

# corpus from reference examples/nearest_query_example.rs:4-15
CORPUS = [
    "The latest iPhone model comes with impressive features and a powerful camera.",
    "Exploring the beautiful beaches and vibrant culture of Bali is a dream for many travelers.",
    "Einstein's theory of relativity revolutionized our understanding of space and time.",
    "Traditional Italian pizza is famous for its thin crust, fresh ingredients, and wood-fired ovens.",
    "The American Revolution had a profound impact on the birth of the United States as a nation.",
    "Regular exercise and a balanced diet are essential for maintaining good physical health.",
    "Leonardo da Vinci's Mona Lisa is considered one of the most iconic paintings in art history.",
    "Climate change poses a significant threat to the planet's ecosystems and biodiversity.",
    "Startup companies often face challenges in securing funding and scaling their operations.",
    "Beethoven's Symphony No. 9 is celebrated for its powerful choral finale, 'Ode to Joy.'",
]


def main():
    spark = get_spark("nearest-example")
    spark.sparkContext.setLogLevel("ERROR")

    col = EmbeddingCollection.new(
        # with the real ONNX sentence-transformer this returns the pizza
        # document (reference asserts index 3); the hash embedder is
        # lexical, so the semantic match needs the real model
        spark, CORPUS, None, None, "nearest_example", embedder=HashEmbedder(dim=384)
    ).save()

    nearest_id = col.nearest_query("Find me some delicious food!")
    print("nearest:", nearest_id)
    col.nearest_query_df("Find me some delicious food!", k=3).show(truncate=60)

    EmbeddingCollection.delete(spark, col.get_view())


if __name__ == "__main__":
    main()
