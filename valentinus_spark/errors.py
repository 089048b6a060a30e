"""Error hierarchy mirroring the reference's ``ValentinusError``
(reference: embeddings.rs:181-209, 9 variants).

The reference enumerates: Batch, Config, Database, Json, NotFound, Regex,
Tokenizer, Onnx, Shape. We keep the same taxonomy as Python exceptions so a
user porting from the reference can catch the same failure classes.
"""

from __future__ import annotations


class ValentinusError(Exception):
    """Base error (reference embeddings.rs:181)."""


class BatchError(ValentinusError):
    """Embedding batch failure (reference embeddings.rs:183-185)."""


class ConfigError(ValentinusError):
    """Bad engine configuration (reference embeddings.rs:186-188)."""


class DatabaseError(ValentinusError):
    """Storage layer failure (reference embeddings.rs:189-191)."""


class JsonError(ValentinusError):
    """Malformed metadata / filter JSON (reference embeddings.rs:192-194)."""


class NotFoundError(ValentinusError):
    """Collection key or view not found (reference embeddings.rs:195-197)."""


class ViewNameError(ValentinusError):
    """View name failed ``^[a-zA-Z0-9_]+$`` validation or uniqueness
    (reference embeddings.rs:107-109, 248-267; Regex variant 198-200)."""


class TokenizerError(ValentinusError):
    """Tokenizer failure inside an embedder (reference embeddings.rs:201-203)."""


class ModelError(ValentinusError):
    """Embedding model failure (reference Onnx variant embeddings.rs:204-206)."""


class ShapeError(ValentinusError):
    """Embedding matrix shape mismatch (reference embeddings.rs:207-209)."""
