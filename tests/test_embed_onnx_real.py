"""Real-session OnnxEmbedder tests (VERDICT r5 item 6).

Every other embed test drives OnnxEmbedder through a FAKE onnxruntime
module; the reference's CI instead downloads the real MiniLM model and
runs it (`/root/reference/.github/workflows/test.yml:27-34`). This file
closes that seam where the environment allows: it builds a tiny valid
ONNX model (deterministic weights, same (input_ids, attention_mask) →
outputs[1] pooled contract as MiniLM, `onnx.rs:61-97`) plus a minimal
HF tokenizer.json, and runs the T1 path end-to-end through a REAL
onnxruntime.InferenceSession — session cache, padding, batch
invariance, and the Arrow-batched UDF.

Skips when onnxruntime/onnx/tokenizers are not installed (they are not
baked into the build container — the HashEmbedder determinism stance,
SURVEY §7.4.6 — but ARE present wherever the reference's own CI runs).
Set ``VALENTINUS_ONNX_MODEL_DIR`` to a real model directory
(model.onnx + tokenizer.json, e.g. exported all-MiniLM-L6-v2) to run
the same assertions against a production model instead of the tiny one.
"""

import importlib.util
import json
import os

import numpy as np
import pytest

_HAVE_ORT = importlib.util.find_spec("onnxruntime") is not None
_HAVE_ONNX = importlib.util.find_spec("onnx") is not None
_HAVE_TOK = importlib.util.find_spec("tokenizers") is not None

pytestmark = pytest.mark.skipif(
    not (_HAVE_ORT and _HAVE_TOK and (_HAVE_ONNX or os.environ.get("VALENTINUS_ONNX_MODEL_DIR"))),
    reason="onnxruntime/onnx/tokenizers not installed (container has no "
    "ONNX stack; reference CI downloads the real model — test.yml:27-34)",
)

DIM = 16


def _build_model_dir(path: str) -> str:
    """model.onnx: outputs[1] = MatMul(ReduceSum(ids*mask, seq), W) —
    [n, DIM], deterministic, padding-invariant (pad id 0, mask 0), so
    batch invariance is exact. tokenizer.json: whitespace WordLevel."""
    env_dir = os.environ.get("VALENTINUS_ONNX_MODEL_DIR")
    if env_dir:
        return env_dir
    import onnx
    from onnx import TensorProto, helper

    ids = helper.make_tensor_value_info("input_ids", TensorProto.INT64, ["n", "L"])
    mask = helper.make_tensor_value_info("attention_mask", TensorProto.INT64, ["n", "L"])
    tok_out = helper.make_tensor_value_info("token_embeddings", TensorProto.FLOAT, ["n", "L"])
    pooled = helper.make_tensor_value_info("sentence_embedding", TensorProto.FLOAT, ["n", DIM])
    w = helper.make_tensor(
        "W",
        TensorProto.FLOAT,
        [1, DIM],
        np.arange(1, DIM + 1, dtype=np.float32) / DIM,
    )
    nodes = [
        helper.make_node("Cast", ["input_ids"], ["ids_f"], to=TensorProto.FLOAT),
        helper.make_node("Cast", ["attention_mask"], ["mask_f"], to=TensorProto.FLOAT),
        helper.make_node("Mul", ["ids_f", "mask_f"], ["masked"]),
        helper.make_node("Identity", ["masked"], ["token_embeddings"]),
        helper.make_node(
            "ReduceSum", ["masked", "axes1"], ["summed"], keepdims=1
        ),
        helper.make_node("MatMul", ["summed", "W"], ["sentence_embedding"]),
    ]
    axes = helper.make_tensor("axes1", TensorProto.INT64, [1], [1])
    graph = helper.make_graph(
        nodes, "tiny_pooler", [ids, mask], [tok_out, pooled], initializer=[w, axes]
    )
    model = helper.make_model(
        graph, opset_imports=[helper.make_opsetid("", 17)], ir_version=8
    )
    onnx.checker.check_model(model)
    onnx.save(model, os.path.join(path, "model.onnx"))

    vocab = {"[UNK]": 0}
    for i, word in enumerate(
        "the quick brown fox jumps over lazy dog a car review".split(), start=1
    ):
        vocab[word] = i
    tok = {
        "version": "1.0",
        "truncation": None,
        "padding": None,
        "added_tokens": [],
        "normalizer": {"type": "Lowercase"},
        "pre_tokenizer": {"type": "Whitespace"},
        "post_processor": None,
        "decoder": None,
        "model": {"type": "WordLevel", "vocab": vocab, "unk_token": "[UNK]"},
    }
    with open(os.path.join(path, "tokenizer.json"), "w") as f:
        json.dump(tok, f)
    return path


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    return _build_model_dir(str(tmp_path_factory.mktemp("onnx_model")))


def _expected(texts, model_dir):
    """Numpy oracle of the tiny model: sum of token ids × W row."""
    from tokenizers import Tokenizer

    tok = Tokenizer.from_file(os.path.join(model_dir, "tokenizer.json"))
    w = np.arange(1, DIM + 1, dtype=np.float32) / DIM
    out = np.zeros((len(texts), DIM), dtype=np.float32)
    for i, t in enumerate(texts):
        s = float(sum(tok.encode(t).ids))
        out[i] = s * w
    return out


def test_real_session_embeds_and_pads(model_dir):
    if os.environ.get("VALENTINUS_ONNX_MODEL_DIR"):
        pytest.skip("numpy oracle only valid for the tiny generated model")
    from valentinus_spark.embed import OnnxEmbedder

    emb = OnnxEmbedder(model_dir, dim=DIM, batch_size=100)
    texts = ["the quick brown fox", "a", "lazy dog over the lazy dog fox car"]
    got = emb.embed_texts(texts)
    assert got.shape == (3, DIM) and got.dtype == np.float32
    np.testing.assert_allclose(got, _expected(texts, model_dir), rtol=1e-6)


def test_real_session_cached_per_process(model_dir):
    from valentinus_spark.embed import _ONNX_CACHE, OnnxEmbedder

    emb = OnnxEmbedder(model_dir, dim=DIM)
    emb.embed_texts(["the fox"])
    before = {k: id(v) for k, v in _ONNX_CACHE.items() if model_dir in k}
    assert before, "first embed must populate the session cache"
    emb.embed_texts(["the dog"])
    after = {k: id(v) for k, v in _ONNX_CACHE.items() if model_dir in k}
    assert after == before, (
        "session rebuilt between batches — the reference bug "
        "(onnx.rs:51-60) this cache exists to fix"
    )


def test_real_session_batch_invariance(model_dir):
    """n=101/200/201 with batch_size=100: every row embedded exactly
    once regardless of how batching splits — the reference's
    off-by-one (onnx.rs:114) zeroed the last row of every full batch."""
    from valentinus_spark.embed import OnnxEmbedder

    emb = OnnxEmbedder(model_dir, dim=DIM, batch_size=100)
    words = ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog"]
    for n in (101, 200, 201):
        texts = [" ".join(words[: 1 + i % len(words)]) for i in range(n)]
        whole = emb.embed_texts(texts)
        single = np.vstack([emb.embed_texts([t]) for t in texts])
        np.testing.assert_allclose(whole, single, rtol=1e-6)
        assert not np.all(whole[99] == 0) and not np.all(whole[-1] == 0)


def test_real_session_udf_path(spark, model_dir):
    """The Arrow-batched pandas UDF path — what executors actually run."""
    from pyspark.sql import functions as F

    from valentinus_spark.embed import OnnxEmbedder

    emb = OnnxEmbedder(model_dir, dim=DIM, batch_size=100)
    df = spark.createDataFrame(
        [("the quick fox",), ("lazy dog",), (None,)], ["text"]
    )
    rows = df.select(emb.embed_col("text").alias("v")).collect()
    assert all(len(r.v) == DIM for r in rows)
    if not os.environ.get("VALENTINUS_ONNX_MODEL_DIR"):
        want = _expected(["the quick fox", "lazy dog"], model_dir)
        np.testing.assert_allclose(np.array(rows[0].v), want[0], rtol=1e-6)
        np.testing.assert_allclose(np.array(rows[1].v), want[1], rtol=1e-6)
        # NULL text embeds as empty string (fillna in the UDF): zero ids
        assert all(abs(x) < 1e-6 for x in rows[2].v)
