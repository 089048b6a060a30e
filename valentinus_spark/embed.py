"""Pluggable embedders: text → fixed-dim float vector.

The reference hard-wires one embedder — an ONNX all-MiniLM sentence
transformer invoked in batches of 100, with the session rebuilt for every
batch (onnx.rs:35-132; rebuild bug at onnx.rs:51-60) and an off-by-one that
zeroes the last row of every full batch (onnx.rs:114-115, not replicated —
see tests/test_embed.py batch-invariance cases). ``ModelType``
(embeddings.rs:116-125) proves the model is swappable; we formalize that as
an embedder registry.

Spark mapping (SURVEY.md §2.2 T1-T3): each embedder exposes

- ``udf()`` — an Arrow-batched ``pandas_udf`` returning ``array<float>``;
  executors stream record batches through it (batch size =
  ``spark.sql.execution.arrow.maxRecordsPerBatch``), the model/session is
  cached per executor process, and the UDF is the ONLY Python element in
  the whole engine's hot path.
- ``embed_texts(list[str]) -> np.ndarray`` — driver-side path for query
  strings (the reference embeds the query as a batch of 1,
  embeddings.rs:343-349).

``HashEmbedder`` is the deterministic default for tests/CI (no model
download; reference CI must download the real model, README.md:37-48):
feature-hashing of word tokens into ``dim`` signed buckets, L2-normalized.
It is batch-invariant by construction and embeds ~1M short docs/min/core.
"""

from __future__ import annotations

import hashlib
import os
from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

from valentinus_spark.errors import ConfigError, ModelError

DEFAULT_DIM = 384  # reference onnx.rs:20


# token→(bucket, sign) memo: corpora are Zipfian, so most sha256 calls
# repeat a token already hashed in this worker process; bound the memo so
# an adversarial corpus of unique tokens can't grow it without limit
_TOKEN_CACHE: dict[tuple[int, str], tuple[int, float]] = {}
_TOKEN_CACHE_MAX = 1_000_000


def _hash_token(token: str, seed: int) -> tuple[int, float]:
    """(bucket, sign) for one token — sha256 domain-separated by seed:
    stable across processes, Python versions, and cluster nodes (unlike
    builtin hash()), and replicable in ANSI-ish SQL — 60 bits =
    ``('0x' || substr(sha256(seed || chr(31) || token), 1, 15))::UBIGINT``
    in DuckDB — which is what lets the driver's collection_e2e query
    carry a full hash oracle over the lifecycle output instead of a
    rows-only check."""
    key = (seed, token)
    got = _TOKEN_CACHE.get(key)
    if got is None:
        h = hashlib.sha256(f"{seed}\x1f".encode("utf-8") + token.encode("utf-8")).hexdigest()
        v = int(h[:15], 16)
        got = (v >> 1, 1.0 if (v & 1) else -1.0)
        if len(_TOKEN_CACHE) < _TOKEN_CACHE_MAX:
            _TOKEN_CACHE[key] = got
    return got


class Embedder:
    """Interface every embedder implements."""

    dim: int
    name: str

    def embed_texts(self, texts: Sequence[str]) -> np.ndarray:  # [n, dim] float32
        raise NotImplementedError

    def config(self) -> dict:
        """Constructor kwargs that recreate this embedder via
        ``get_embedder(self.name, **config)`` — persisted in the collection
        catalog so find() restores the SAME vector space (a HashEmbedder
        with a non-default seed, or an OnnxEmbedder's model_path, would
        otherwise be lost and query embeddings would silently diverge)."""
        return {"dim": self.dim}

    def udf(self):
        """Arrow-batched pandas UDF: string column → array<float> column."""
        embed = self.embed_texts

        @F.pandas_udf(ArrayType(FloatType()))
        def _embed(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
            for batch in it:
                mat = embed(batch.fillna("").tolist())
                yield pd.Series(list(mat))

        return _embed

    def embed_col(self, col: Column | str) -> Column:
        return self.udf()(F.col(col) if isinstance(col, str) else col)


class HashEmbedder(Embedder):
    """Deterministic feature-hashing embedder (test/CI default).

    Proves the reference's vector algebra (dot/cosine/L2) independent of any
    specific model, exactly as the reference's ``ModelType::Custom`` +
    ``VALENTINUS_CUSTOM_DIM`` allow swapping models (embeddings.rs:123-124,
    onnx.rs:23)."""

    name = "hash"

    def __init__(self, dim: int = DEFAULT_DIM, seed: int = 42):
        if dim <= 0:
            raise ConfigError(f"embedding dim must be positive, got {dim}")
        self.dim = dim
        self.seed = seed

    def config(self) -> dict:
        return {"dim": self.dim, "seed": self.seed}

    def embed_texts(self, texts: Sequence[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        for i, text in enumerate(texts):
            for tok in text.lower().split():
                bucket, sign = _hash_token(tok, self.seed)
                out[i, bucket % self.dim] += sign
            n = np.linalg.norm(out[i])
            if n > 0:
                out[i] /= n
        return out


# Per-executor-process session cache: the fix for the reference rebuilding
# its ONNX session on every batch of 100 (onnx.rs:51-60).
_ONNX_CACHE: dict[str, object] = {}


def _onnx_session(model_path: str, providers: list[str] | None = None):
    key = model_path if not providers else model_path + "#" + ",".join(providers)
    if key not in _ONNX_CACHE:
        import onnxruntime as ort  # noqa: gated import

        threads = int(os.environ.get("ONNX_PARALLEL_THREADS", "1"))  # onnx.rs:26
        opts = ort.SessionOptions()
        # 1 intra-op thread per Spark task: partition parallelism already
        # saturates cores; ONNX threading would oversubscribe (SURVEY.md §4).
        opts.intra_op_num_threads = threads
        kwargs: dict = {"sess_options": opts}
        # Execution-provider pass-through ≈ the reference registering the
        # CUDA EP ahead of CPU (onnx.rs:45-49, `CUDAExecutionProvider`).
        # None → onnxruntime's default provider order for the build.
        if providers is not None:
            kwargs["providers"] = list(providers)
        _ONNX_CACHE[key] = ort.InferenceSession(
            os.path.join(model_path, "model.onnx"), **kwargs
        )
    return _ONNX_CACHE[key]


def _onnx_tokenizer(model_path: str):
    key = model_path + "#tokenizer"
    if key not in _ONNX_CACHE:
        from tokenizers import Tokenizer  # noqa: gated import

        _ONNX_CACHE[key] = Tokenizer.from_file(os.path.join(model_path, "tokenizer.json"))
    return _ONNX_CACHE[key]


class OnnxEmbedder(Embedder):
    """ONNX sentence-transformer embedder (reference onnx.rs:35-98).

    Tokenizes with HF tokenizers (padded batch, onnx.rs:61-77), runs the
    session on (input_ids, attention_mask), takes ``outputs[1]`` — the
    pooled sentence embedding (onnx.rs:92-97). Unlike the reference:
    session cached per executor (vs rebuilt per batch, onnx.rs:51-60) and
    batching never drops rows (vs off-by-one at onnx.rs:114).

    Requires ``onnxruntime`` + ``tokenizers`` at call time (not baked into
    this container — constructor succeeds, first embed raises ModelError
    unless the libraries and model files are present)."""

    name = "onnx"

    def __init__(
        self,
        model_path: str,
        dim: int | None = None,
        batch_size: int = 100,
        providers: list[str] | None = None,
    ):
        self.model_path = model_path
        # VALENTINUS_CUSTOM_DIM override (onnx.rs:23,103-106)
        self.dim = dim or int(os.environ.get("VALENTINUS_CUSTOM_DIM", DEFAULT_DIM))
        self.batch_size = batch_size  # reference BATCH_SIZE=100 (onnx.rs:17)
        # e.g. ["CUDAExecutionProvider", "CPUExecutionProvider"] — the
        # reference's CUDA-then-CPU registration order (onnx.rs:45-49)
        self.providers = providers

    def config(self) -> dict:
        return {
            "model_path": self.model_path,
            "dim": self.dim,
            "batch_size": self.batch_size,
            "providers": self.providers,
        }

    def embed_texts(self, texts: Sequence[str]) -> np.ndarray:
        try:
            session = _onnx_session(self.model_path, self.providers)
            tokenizer = _onnx_tokenizer(self.model_path)
        except ImportError as e:
            raise ModelError(
                "onnxruntime/tokenizers not installed — use HashEmbedder or "
                "install the ONNX runtime (reference requires the same model "
                "download, README.md:37-48)"
            ) from e
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        # Correct batching: every row embedded exactly once (fixes onnx.rs:114,
        # which drops the last element of each full batch).
        for start in range(0, len(texts), self.batch_size):
            chunk = list(texts[start : start + self.batch_size])
            enc = tokenizer.encode_batch(chunk)
            max_len = max(len(e.ids) for e in enc)
            ids = np.zeros((len(chunk), max_len), dtype=np.int64)
            mask = np.zeros((len(chunk), max_len), dtype=np.int64)
            for i, e in enumerate(enc):
                ids[i, : len(e.ids)] = e.ids
                mask[i, : len(e.attention_mask)] = e.attention_mask
            outputs = session.run(None, {"input_ids": ids, "attention_mask": mask})
            out[start : start + len(chunk)] = outputs[1][:, : self.dim]
        return out


def get_embedder(model_type: str = "hash", **kwargs) -> Embedder:
    """Embedder registry ≈ reference ``ModelType`` (embeddings.rs:116-125):
    AllMiniLmL6V2 / AllMiniLmL12V2 → OnnxEmbedder with the model dir;
    Custom → any; plus the test-grade HashEmbedder."""
    mt = model_type.lower().replace("-", "").replace("_", "")
    if mt == "hash":
        return HashEmbedder(**kwargs)
    if mt in {"allminilml6v2", "allminilml12v2", "onnx", "custom"}:
        if "model_path" not in kwargs:
            raise ConfigError(f"model_type {model_type!r} requires model_path")
        return OnnxEmbedder(**kwargs)
    raise ConfigError(f"unknown model_type {model_type!r}")
