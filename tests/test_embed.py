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


class _FakeEncoding:
    def __init__(self, ids):
        self.ids = ids
        self.attention_mask = [1] * len(ids)


class _FakeTokenizer:
    """Whitespace vocab: token -> stable small id (duck-types
    tokenizers.Tokenizer.encode_batch)."""

    def encode_batch(self, texts):
        return [
            _FakeEncoding([(hash(w) % 997) + 1 for w in t.split()] or [0])
            for t in texts
        ]


class _FakeSession:
    """Duck-types onnxruntime.InferenceSession.run: returns
    [token_embeddings, pooled] like all-MiniLM, where pooled row i is a
    deterministic function of the MASKED ids of row i only — any padding
    leak, row mix-up, or batch off-by-one changes the output."""

    def __init__(self, dim):
        self.dim = dim
        self.calls = []

    def run(self, _out_names, feeds):
        ids, mask = feeds["input_ids"], feeds["attention_mask"]
        self.calls.append(ids.shape)
        n, L = ids.shape
        token_emb = np.zeros((n, L, self.dim), dtype=np.float32)  # outputs[0]
        pooled = np.zeros((n, self.dim), dtype=np.float32)
        for i in range(n):
            for j in range(L):
                if mask[i, j]:
                    pooled[i, (ids[i, j] * 31) % self.dim] += 1.0 + 0.001 * ids[i, j]
        return [token_emb, pooled]


def test_onnx_embedder_pipeline_with_fake_runtime(monkeypatch):
    """Executes OnnxEmbedder.embed_texts end-to-end — batch split, padded
    id/mask assembly, session feed, outputs[1] pooled slice — with only
    onnxruntime/tokenizers themselves replaced by deterministic fakes
    (the libraries are absent from this container; the reference gates
    its CI on the same model download, README.md:37-48)."""
    import valentinus_spark.embed as embed_mod
    from valentinus_spark.embed import OnnxEmbedder

    fake = _FakeSession(dim=16)
    monkeypatch.setattr(
        embed_mod, "_onnx_session", lambda path, providers=None: fake
    )
    monkeypatch.setattr(embed_mod, "_onnx_tokenizer", lambda path: _FakeTokenizer())

    texts = [f"doc number {i} pad" * (1 + i % 3) for i in range(7)]
    emb = OnnxEmbedder(model_path="/nonexistent", dim=16, batch_size=3)
    out = emb.embed_texts(texts)
    assert out.shape == (7, 16) and out.dtype == np.float32
    assert fake.calls and all(s[0] <= 3 for s in fake.calls)  # batch split ran
    # every row non-zero: no batch-boundary drop (reference onnx.rs:114)
    assert (np.abs(out).sum(axis=1) > 0).all()
    # batch invariance: same rows whether batched 3-at-a-time or singly
    solo = OnnxEmbedder(model_path="/x", dim=16, batch_size=1)
    np.testing.assert_array_equal(out, solo.embed_texts(texts))
    # per-row correctness vs a direct computation (padding must not leak)
    expect = _FakeSession(dim=16)
    enc = _FakeTokenizer().encode_batch([texts[5]])
    ids = np.array([enc[0].ids], dtype=np.int64)
    mask = np.ones_like(ids)
    np.testing.assert_array_equal(out[5], expect.run(None, {"input_ids": ids, "attention_mask": mask})[1][0])


def test_onnx_execution_providers_passed_through(monkeypatch):
    """The providers knob must reach ort.InferenceSession verbatim — the
    reference registers the CUDA EP ahead of CPU (onnx.rs:45-49); here the
    same registration is a constructor argument. Fake onnxruntime module
    records the construction arguments."""
    import sys
    import types

    import valentinus_spark.embed as embed_mod

    captured = {}

    class _FakeInferenceSession:
        def __init__(self, path, sess_options=None, providers=None):
            captured["path"] = path
            captured["providers"] = providers

    class _FakeSessionOptions:
        intra_op_num_threads = 0

    fake_ort = types.ModuleType("onnxruntime")
    fake_ort.InferenceSession = _FakeInferenceSession
    fake_ort.SessionOptions = _FakeSessionOptions
    monkeypatch.setitem(sys.modules, "onnxruntime", fake_ort)
    monkeypatch.setattr(embed_mod, "_ONNX_CACHE", {})

    eps = ["CUDAExecutionProvider", "CPUExecutionProvider"]
    embed_mod._onnx_session("/models/minilm", providers=eps)
    assert captured["providers"] == eps
    assert captured["path"].endswith("model.onnx")

    # default (None) keeps onnxruntime's own provider resolution: the
    # constructor must NOT receive a providers kwarg at all
    captured.clear()
    embed_mod._onnx_session("/models/minilm")
    assert captured["providers"] is None

    # the knob is part of the embedder's config surface
    from valentinus_spark.embed import OnnxEmbedder

    emb = OnnxEmbedder(model_path="/models/minilm", dim=8, providers=eps)
    assert emb.config()["providers"] == eps


def _install_fake_onnx_modules(monkeypatch, vocab, dim=16, record=None):
    """Install importable fake ``onnxruntime`` + ``tokenizers`` modules so
    the REAL ``_onnx_session`` / ``_onnx_tokenizer`` cache code runs —
    only the libraries themselves are replaced (VERDICT r3 item 5: the
    env has no model/network, mirroring the reference's own CI gating,
    README.md:37-48 / test.yml:27-34). ``vocab`` is the planted
    word -> id vocabulary the fake Tokenizer.from_file 'loads'."""
    import sys
    import types

    record = record if record is not None else {}

    class _Sess:
        def __init__(self, path, sess_options=None, providers=None):
            record.setdefault("sessions_built", 0)
            record["sessions_built"] += 1
            record["threads"] = sess_options.intra_op_num_threads
            self._core = _FakeSession(dim=dim)

        def run(self, out_names, feeds):
            return self._core.run(out_names, feeds)

    class _Opts:
        intra_op_num_threads = 0

    fake_ort = types.ModuleType("onnxruntime")
    fake_ort.InferenceSession = _Sess
    fake_ort.SessionOptions = _Opts

    class _Tok:
        def encode_batch(self, texts):
            # planted vocabulary, unk=1: id sequences have genuinely
            # different lengths so the pad/mask assembly is exercised
            return [
                _FakeEncoding([vocab.get(w, 1) for w in t.split()] or [0])
                for t in texts
            ]

    class _TokCls:
        @staticmethod
        def from_file(path):
            record.setdefault("tokenizers_built", 0)
            record["tokenizers_built"] += 1
            record["tokenizer_path"] = path
            return _Tok()

    fake_tk = types.ModuleType("tokenizers")
    fake_tk.Tokenizer = _TokCls
    monkeypatch.setitem(sys.modules, "onnxruntime", fake_ort)
    monkeypatch.setitem(sys.modules, "tokenizers", fake_tk)
    return record


@pytest.mark.parametrize("n", [100, 101, 200, 201])
def test_onnx_embedder_batch_boundary_invariance(monkeypatch, n):
    """OnnxEmbedder at the reference's BATCH_SIZE=100 boundaries
    (onnx.rs:17,114: the reference zeroes the last row of every full
    batch — n=100/200 are exactly the shapes that bug corrupts). Rows
    must be identical batched vs singly embedded, every row non-zero,
    through the REAL session-cache + tokenize-pad-mask path."""
    import valentinus_spark.embed as embed_mod
    from valentinus_spark.embed import OnnxEmbedder

    vocab = {f"w{i}": i + 2 for i in range(50)}
    monkeypatch.setattr(embed_mod, "_ONNX_CACHE", {})
    _install_fake_onnx_modules(monkeypatch, vocab, dim=16)

    texts = [" ".join(f"w{(i + j) % 53}" for j in range(1 + i % 5)) for i in range(n)]
    out = OnnxEmbedder(model_path="/m", dim=16, batch_size=100).embed_texts(texts)
    assert out.shape == (n, 16)
    assert (np.abs(out).sum(axis=1) > 0).all(), "batch-boundary row dropped"
    solo = OnnxEmbedder(model_path="/m", dim=16, batch_size=1).embed_texts(texts)
    np.testing.assert_array_equal(out, solo)


def test_onnx_session_and_tokenizer_cached_per_model(monkeypatch):
    """The per-executor cache is the fix for the reference's
    per-batch session rebuild (onnx.rs:51-60): repeated embed_texts
    calls and multiple batches build ONE session and ONE tokenizer per
    model path; a second model path builds its own; the tokenizer is
    loaded from <model_path>/tokenizer.json."""
    import valentinus_spark.embed as embed_mod
    from valentinus_spark.embed import OnnxEmbedder

    monkeypatch.setattr(embed_mod, "_ONNX_CACHE", {})
    monkeypatch.setenv("ONNX_PARALLEL_THREADS", "3")
    rec = _install_fake_onnx_modules(monkeypatch, {"a": 2, "b": 3}, dim=8)

    emb = OnnxEmbedder(model_path="/m1", dim=8, batch_size=2)
    emb.embed_texts(["a b", "b a", "a", "b", "a a"])  # 3 batches
    emb.embed_texts(["b b"])  # second call, same model
    assert rec["sessions_built"] == 1 and rec["tokenizers_built"] == 1
    assert rec["threads"] == 3  # ONNX_PARALLEL_THREADS honored (onnx.rs:26)
    assert rec["tokenizer_path"] == "/m1/tokenizer.json"

    OnnxEmbedder(model_path="/m2", dim=8).embed_texts(["a"])
    assert rec["sessions_built"] == 2 and rec["tokenizers_built"] == 2

    # distinct provider lists are distinct session cache keys (a CUDA
    # and a CPU session may coexist in one process)
    OnnxEmbedder(model_path="/m2", dim=8, providers=["CPUExecutionProvider"]).embed_texts(["a"])
    assert rec["sessions_built"] == 3 and rec["tokenizers_built"] == 2


def test_onnx_padding_never_leaks_across_rows(monkeypatch):
    """A long row forces short rows to be zero-padded to its length; the
    short rows' embeddings must equal their unpadded solo embeddings
    (mask correctness — reference pads the same way, onnx.rs:61-77)."""
    import valentinus_spark.embed as embed_mod
    from valentinus_spark.embed import OnnxEmbedder

    vocab = {f"w{i}": i + 2 for i in range(30)}
    monkeypatch.setattr(embed_mod, "_ONNX_CACHE", {})
    _install_fake_onnx_modules(monkeypatch, vocab, dim=16)

    long_doc = " ".join(f"w{i % 29}" for i in range(64))
    texts = ["w1", long_doc, "w2 w3", ""]
    emb = OnnxEmbedder(model_path="/m", dim=16, batch_size=4)
    batched = emb.embed_texts(texts)
    for i, t in enumerate(texts):
        np.testing.assert_array_equal(batched[i], emb.embed_texts([t])[0])


def test_registry():
    assert get_embedder("hash", dim=12).dim == 12
    with pytest.raises(ConfigError):
        get_embedder("nope")
    with pytest.raises(ConfigError):
        get_embedder("AllMiniLmL6V2")  # requires model_path
    assert get_embedder("AllMiniLmL6V2", model_path="/tmp/m").name == "onnx"
    with pytest.raises(ConfigError):
        HashEmbedder(dim=0)


def test_hash_embedder_sql_replica_parity():
    """The collection_e2e oracle replays the hash embedder in DuckDB
    (sha256 bucket/sign -> float32 normalize); pin BIT-EXACT element
    parity on texts covering collisions, unicode, repeats, and sign
    cancellation so embedder drift can't silently rot the oracle."""
    import duckdb
    import numpy as np

    e = HashEmbedder(dim=64, seed=42)
    texts = [
        "the quick brown fox jumps over the lazy dog the end",
        "spark query data",
        "a a a a b b c",
        "wörld café naïve",
        "single",
    ]
    vecs = e.embed_texts(texts)
    con = duckdb.connect()
    for text, vec in zip(texts, vecs):
        rows = con.execute(
            """
            WITH toks AS (
                SELECT unnest(string_split(trim(regexp_replace(lower(?), '\\s+', ' ', 'g')), ' ')) AS t
            ),
            h AS (
                SELECT (('0x' || substr(sha256('42' || chr(31) || t), 1, 15))::UBIGINT)::BIGINT AS v
                FROM toks WHERE t != ''
            ),
            sums AS (
                SELECT ((v >> 1) % 64)::INT AS bucket,
                       sum(CASE WHEN (v & 1) = 1 THEN 1.0 ELSE -1.0 END)::DOUBLE AS val
                FROM h GROUP BY 1
            )
            SELECT bucket, CAST(val / CAST(sqrt(sum(val * val) OVER ()) AS FLOAT) AS FLOAT) AS el
            FROM sums
            """,
            [text],
        ).fetchall()
        got = np.zeros(64, dtype=np.float32)
        for bkt, el in rows:
            got[bkt] = el
        assert np.array_equal(got, vec), f"element drift for {text!r}"
