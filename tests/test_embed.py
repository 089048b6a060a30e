"""Embedder tests: determinism, batch invariance (the reference's
off-by-one regression, onnx.rs:114 / FIXTURES.md F5), normalization."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from valentinus_spark.embed import HashEmbedder, get_embedder
from valentinus_spark.errors import ConfigError


def test_deterministic_across_instances():
    a = HashEmbedder(dim=64).embed_texts(["hello world", "spark"])
    b = HashEmbedder(dim=64).embed_texts(["hello world", "spark"])
    np.testing.assert_array_equal(a, b)


def test_unit_norm_and_shape():
    m = HashEmbedder(dim=32).embed_texts(["a b c", "", "x"])
    assert m.shape == (3, 32)
    norms = np.linalg.norm(m, axis=1)
    np.testing.assert_allclose(norms[[0, 2]], 1.0, rtol=1e-5)
    assert norms[1] == 0.0  # empty text → zero vector


def test_seed_changes_embedding():
    a = HashEmbedder(dim=64, seed=1).embed_texts(["hello"])
    b = HashEmbedder(dim=64, seed=2).embed_texts(["hello"])
    assert not np.allclose(a, b)


@pytest.mark.parametrize("n", [99, 100, 101, 200, 201])
def test_batch_invariance(spark, n):
    """FIXTURES.md F5: no zero rows at batch boundaries; each row equals its
    solo embedding. (The reference's batcher drops the last element of
    every full batch of 100, onnx.rs:114-115 — must not replicate.)"""
    texts = [f"document number {i}" for i in range(n)]
    emb = HashEmbedder(dim=16)
    df = spark.createDataFrame([(t,) for t in texts], "document string")
    got = {
        r["document"]: np.array(r["e"])
        for r in df.withColumn("e", emb.embed_col("document")).collect()
    }
    solo = emb.embed_texts(texts)
    for i, t in enumerate(texts):
        assert np.linalg.norm(got[t]) > 0, f"zero row at {i}"
        np.testing.assert_allclose(got[t], solo[i], rtol=1e-6)


def test_udf_matches_driver_path(spark):
    emb = HashEmbedder(dim=8)
    df = spark.createDataFrame([("alpha beta",), ("gamma",)], "document string")
    rows = df.select(emb.embed_col("document").alias("e")).collect()
    mat = emb.embed_texts(["alpha beta", "gamma"])
    np.testing.assert_allclose(np.array([r["e"] for r in rows]), mat, rtol=1e-6)


def test_registry():
    assert get_embedder("hash", dim=12).dim == 12
    with pytest.raises(ConfigError):
        get_embedder("nope")
    with pytest.raises(ConfigError):
        get_embedder("AllMiniLmL6V2")  # requires model_path
    assert get_embedder("AllMiniLmL6V2", model_path="/tmp/m").name == "onnx"
    with pytest.raises(ConfigError):
        HashEmbedder(dim=0)
