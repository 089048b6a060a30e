"""Metadata WHERE-filter compiler: JSON filter specs → Catalyst ``Column``.

Reference semantics (md2f.rs — "multi-dimensional metadata to filters"):

- A filter is a single-key JSON object ``{"Key": {"op": value}}`` with
  op ∈ {eq, gt, gte, lt, lte} (md2f.rs:17-23), values typed u64 or string
  (md2f.rs:37-41, parse md2f.rs:99-151).
- String values support only ``eq`` — non-equality string ops never match
  (md2f.rs:194-203).
- Multiple filters compose by AND (filter_where md2f.rs:232-247; the
  reference's flat match-counter quirk is NOT replicated — see SURVEY.md
  §2.3 — we implement clean conjunction).
- ``in`` is documented by the reference (embeddings.rs:329-331) but never
  implemented (md2f.rs:25-34 silently coerces unknown ops to eq); we
  implement it for real over u64 and string arrays.
- Unknown ops: the reference silently treats them as ``eq``
  (md2f.rs:25-34). We raise ``JsonError`` by default; ``strict=False``
  restores the reference's coercion for drop-in compatibility.

Compilation targets a ``MapType(string,string)`` metadata column (SURVEY.md
§1.4): numeric comparisons cast ``element_at(map, key)`` to long, so the
predicate stays JVM-side and Catalyst can push it down / prune with it.
This replaces the reference's per-row interpreted JSON matching
(evaluated inside the scan loop, embeddings.rs:361-363) with a compiled
expression that whole-stage codegen inlines.
"""

from __future__ import annotations

import json
from functools import reduce
from typing import Any, Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F

from valentinus_spark.errors import JsonError

_NUM_OPS = {"eq", "gt", "gte", "lt", "lte", "in"}
_STR_OPS = {"eq", "in"}  # md2f.rs:194-203 (eq) + implemented `in`


def _parse_spec(spec: str | dict[str, Any]) -> tuple[str, str, Any]:
    """One spec → (key, op, value). Mirrors create_filter (md2f.rs:78-153)."""
    if isinstance(spec, str):
        try:
            spec = json.loads(spec)
        except json.JSONDecodeError as e:  # md2f.rs Json error path
            raise JsonError(f"malformed filter JSON: {spec!r}") from e
    if not isinstance(spec, dict) or len(spec) != 1:
        # reference filters are single-key objects (md2f.rs:78-97)
        raise JsonError(f"filter must be a single-key object: {spec!r}")
    key, body = next(iter(spec.items()))
    if not isinstance(body, dict) or len(body) != 1:
        raise JsonError(f"filter body must be {{op: value}}: {spec!r}")
    op, value = next(iter(body.items()))
    return key, op, value


PROMOTED_PREFIX = "md_"


def _compile_one(
    key: str,
    op: str,
    value: Any,
    metadata_col: Column,
    strict: bool,
    promoted_columns: set[str] | None = None,
) -> Column:
    # promoted metadata keys are real top-level columns (md_<key>) written
    # at save time — predicates on them reach the parquet scan as pushed
    # filters and prune row groups, which map-element predicates cannot
    # (collection.save(promote_keys=...))
    promoted_name = PROMOTED_PREFIX + key
    if promoted_columns is not None and promoted_name in promoted_columns:
        entry = F.col(promoted_name)
    else:
        # getItem (GetMapValue), NOT element_at: same NULL-on-missing-key
        # semantics (ANSI-exempt since Spark 3.4), but SimplifyExtractValueOps
        # can rewrite getItem(create_map(k₁,v₁,...), k) to the underlying
        # column — so a filter over map metadata DERIVED from real columns
        # collapses to a plain column predicate and pushes to parquet;
        # element_at blocks that rule and evaluates post-scan
        entry = metadata_col.getItem(key)
    is_string = isinstance(value, str) or (
        isinstance(value, (list, tuple)) and any(isinstance(v, str) for v in value)
    )
    ops = _STR_OPS if is_string else _NUM_OPS
    if op not in ops:
        if strict:
            raise JsonError(
                f"op {op!r} not supported for {'string' if is_string else 'numeric'} "
                f"value in filter {key!r} (reference md2f.rs:154-203)"
            )
        if is_string and op != "eq":
            # reference: non-eq string ops never match (md2f.rs:196-199)
            return F.lit(False)
        op = "eq"  # reference coerces unknown ops to eq (md2f.rs:25-34)

    if is_string:
        if op == "in":
            return entry.isin([str(v) for v in value])
        return entry == F.lit(str(value))

    # numeric path: metadata map values are strings; cast to long like the
    # reference parses u64 (md2f.rs:134-151). try_cast: a non-numeric value
    # becomes NULL and the predicate is null-safe false (ANSI-mode plain
    # cast would error out instead).
    num = entry.try_cast("long")
    if op == "in":
        return num.isin([int(v) for v in value])
    lit = F.lit(int(value))
    return {
        "eq": num == lit,
        "gt": num > lit,
        "gte": num >= lit,
        "lt": num < lit,
        "lte": num <= lit,
    }[op]


def compile_filters(
    specs: Iterable[str | dict[str, Any]] | None,
    metadata_col: Column | str = "metadata",
    strict: bool = True,
    promoted_columns: Iterable[str] | None = None,
) -> Column:
    """Compile a list of filter specs into one conjunctive predicate.

    ``specs=None`` or empty → always-true (unfiltered query path,
    embeddings.rs:334-341 with empty f_where). Pass ``promoted_columns=
    df.columns`` to let predicates target promoted ``md_<key>`` columns
    (parquet-pushable) when present."""
    if isinstance(metadata_col, str):
        metadata_col = F.col(metadata_col)
    specs = list(specs or [])
    if not specs:
        return F.lit(True)
    promoted = set(promoted_columns) if promoted_columns is not None else None
    preds = [
        _compile_one(
            *_parse_spec(s),
            metadata_col=metadata_col,
            strict=strict,
            promoted_columns=promoted,
        )
        for s in specs
    ]
    return reduce(lambda a, b: a & b, preds)
