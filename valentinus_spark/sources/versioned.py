"""Versioned parquet tables: commit manifests, time travel, vacuum.

The minimal transaction-log pattern every lakehouse format (Delta,
Iceberg, Hudi) is built on, reduced to its load-bearing parts:

  - data files are IMMUTABLE — a commit only ever adds new files under
    ``<table>/data/commit-<n>/``;
  - a version is a MANIFEST (``<table>/_versions/v<n>.json``) listing
    exactly the live files; append commits extend the previous list,
    overwrite commits start a new one;
  - readers resolve a manifest first, then read only its files — a
    reader pinned to v3 is untouched by later commits (snapshot
    isolation for free, since nothing it references is ever mutated);
  - ``vacuum`` deletes files referenced by NO retained manifest — the
    only destructive operation, and it never touches the current
    version's files.

Why this matters at 100 TB: overwrite-in-place on object storage is a
correctness hazard (readers see partial state) and a lost-history
hazard (no rollback, no reproducible "train on the corpus as of v12").
The manifest layer costs one tiny JSON per commit and turns both into
metadata operations. This module assumes a SINGLE WRITER (manifest
publish is an atomic local rename); multi-writer coordination is what
the real formats add on top (Delta: conditional put on the log entry;
Iceberg: catalog compare-and-swap) and is out of scope here.
"""

from __future__ import annotations

import glob
import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

_VERSIONS = "_versions"
_DATA = "data"


def _versions_dir(path: str) -> str:
    return os.path.join(path, _VERSIONS)


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(_versions_dir(path), f"v{version:06d}.json")


def list_versions(path: str) -> list[int]:
    """All committed version numbers, ascending."""
    pat = os.path.join(_versions_dir(path), "v*.json")
    return sorted(int(os.path.basename(p)[1:-5]) for p in glob.glob(pat))


def latest_version(path: str) -> int | None:
    vs = list_versions(path)
    return vs[-1] if vs else None


def _load_manifest(path: str, version: int) -> dict:
    mp = _manifest_path(path, version)
    if not os.path.exists(mp):
        raise ValueError(f"version {version} does not exist at {path}")
    with open(mp) as f:
        return json.load(f)


def commit_version(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    mode: str = "append",
    batch_id: int | None = None,
    allow_schema_change: bool = False,
) -> int:
    """Write ``df`` as a new immutable commit and publish the next
    version's manifest. ``mode='append'`` keeps the previous version's
    files and adds the new ones; ``mode='overwrite'`` starts the file
    list fresh (the old files stay on disk for time travel until
    ``vacuum``). Returns the new version number.

    The data write happens FIRST, the manifest publish LAST (atomic
    rename) — a crash in between leaves orphan data files that no
    reader can see and the next vacuum reclaims, never a half-visible
    version.

    ``batch_id`` makes the commit IDEMPOTENT for streaming foreachBatch
    sinks: Structured Streaming re-runs a micro-batch after a crash
    with the SAME batch id, so a commit whose batch_id is already
    recorded in the latest manifest chain is skipped (returning the
    version that holds it) instead of double-appending — the standard
    exactly-once transactional-sink recipe.

    Schema evolution: appends may ADD columns (old rows read as null in
    them) or drop columns (merged back from the old files) — the
    parquet-mergeable cases. A column whose TYPE changes is rejected at
    commit time (``allow_schema_change`` does not override that —
    merge-on-read cannot reconcile it); any widening/narrowing of the
    column SET requires ``allow_schema_change=True`` so a pipeline bug
    (renamed field upstream) fails loudly instead of silently forking
    the schema."""
    if mode not in ("append", "overwrite"):
        raise ValueError("mode must be 'append' or 'overwrite'")
    prev = latest_version(path)
    if batch_id is not None and prev is not None:
        for v in reversed(list_versions(path)):
            m = _load_manifest(path, v)
            if m.get("batch_id") == batch_id:
                return v
    new_fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    mixed = False
    if mode == "append" and prev is not None:
        prev_man = _load_manifest(path, prev)
        prev_fields = prev_man.get("fields", new_fields)
        conflicts = [
            n for n, t in new_fields.items()
            if n in prev_fields and prev_fields[n] != t
        ]
        if conflicts:
            raise ValueError(
                f"type change on column(s) {conflicts} cannot be merged-on-read"
            )
        if set(new_fields) != set(prev_fields) and not allow_schema_change:
            raise ValueError(
                "append changes the column set "
                f"({sorted(set(new_fields) ^ set(prev_fields))}); pass "
                "allow_schema_change=True to evolve the schema"
            )
        mixed = prev_man.get("mixed_schema", False) or set(new_fields) != set(
            prev_fields
        )
        new_fields = {**prev_fields, **new_fields}
    version = (prev if prev is not None else 0) + 1
    commit_dir = os.path.join(path, _DATA, f"commit-{version:06d}")
    if os.path.exists(commit_dir):
        # orphan from a commit that crashed AFTER the data write but
        # BEFORE the manifest publish (manifest-last invariant: no
        # reader ever saw these files). Without this, the mode="error"
        # write below would fail the RETRIED commit forever on "path
        # already exists" — the crash-injection test pins the recovery.
        import shutil

        shutil.rmtree(commit_dir)
    df.write.mode("error").parquet(commit_dir)
    new_files = sorted(glob.glob(os.path.join(commit_dir, "part-*.parquet")))
    files: list[str] = []
    if mode == "append" and prev is not None:
        files.extend(_load_manifest(path, prev)["files"])
    files.extend(new_files)
    n_rows = spark.read.parquet(commit_dir).count()
    manifest = {
        "version": version,
        "mode": mode,
        "files": files,
        "commit_files": len(new_files),
        "commit_rows": n_rows,
    }
    if batch_id is not None:
        manifest["batch_id"] = batch_id
    manifest["fields"] = new_fields
    manifest["mixed_schema"] = mixed
    os.makedirs(_versions_dir(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=_versions_dir(path), suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, _manifest_path(path, version))
    return version


def read_version(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read the table as of ``version`` (default: latest). Resolving the
    manifest is a metadata lookup; the scan touches exactly that
    version's files, so a pinned reader is isolated from every later
    commit."""
    v = version if version is not None else latest_version(path)
    if v is None:
        raise ValueError(f"no versions committed at {path}")
    man = _load_manifest(path, v)
    if not man["files"]:
        raise ValueError(f"version {v} at {path} lists no files")
    reader = spark.read
    if man.get("mixed_schema"):
        # commits in this chain differ in column set: union the parquet
        # footers so added columns read as null on pre-evolution files
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(*man["files"])


def merge_into(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    on: list[str],
    when_matched: str = "update",
    when_not_matched: str = "insert",
    delete_col: str | None = None,
) -> int:
    """Delta-style MERGE INTO against a versioned table: join ``updates``
    to the latest version on the ``on`` key columns and commit the merged
    result as a new version (copy-on-write). Semantics:

    - matched rows: ``when_matched="update"`` takes the update row's
      values, with NULL update values keeping the current ones
      (partial-update semantics — an explicit NULL-out is expressed by
      deleting and re-inserting); ``"ignore"`` keeps the current row.
      With
      ``delete_col`` set, update rows where that boolean column is true
      DELETE their match instead.
    - unmatched update rows: ``when_not_matched="insert"`` appends them;
      ``"ignore"`` drops them.

    Returns the new version number.

    Plan shape: ONE outer join keyed on ``on`` (broadcast when updates
    are small — the common CDC case), then a single commit. Readers are
    snapshot-isolated throughout (they hold the old manifest); time
    travel keeps the pre-merge table. This is the general-purpose face
    of the specialized applies (operators/scd.py scd2_apply keeps
    history rows; apply_cdc replays op logs) — same machinery, simpler
    contract. Duplicate keys in ``updates`` are rejected (a MERGE with
    ambiguous sources is a pipeline bug, matching Delta's
    MERGE-cardinality check)."""
    from pyspark.sql import functions as F

    if when_matched not in ("update", "ignore"):
        raise ValueError("when_matched must be 'update' or 'ignore'")
    if when_not_matched not in ("insert", "ignore"):
        raise ValueError("when_not_matched must be 'insert' or 'ignore'")
    current = read_version(spark, path)
    data_cols = [c for c in current.columns]
    if delete_col is not None and delete_col not in updates.columns:
        raise ValueError(f"delete_col {delete_col!r} not in updates")
    dup = updates.groupBy(*on).count().filter("count > 1").limit(1).collect()
    if dup:
        key = {k: dup[0][k] for k in on}
        raise ValueError(f"updates carry duplicate merge key {key}")

    upd = updates
    u_cols = {c: f"_u_{c}" for c in upd.columns}
    upd = upd.select(*[F.col(c).alias(a) for c, a in u_cols.items()])
    # Join-side presence is detected via literal marker columns, NOT via
    # isNull on the key columns: the join uses eqNullSafe, so a NULL-keyed
    # current row can legitimately match a NULL-keyed update row — key-NULL
    # checks would misread that as "insert-only" and drop/replace the
    # current row (r4 ADVICE, versioned.py:239).
    cur = current.withColumn("_vm_cur", F.lit(True))
    upd = upd.withColumn("_vm_upd", F.lit(True))
    joined = cur.join(
        upd,
        on=[F.col(c).eqNullSafe(F.col(u_cols[c])) for c in on],
        how="full_outer",
    )
    matched = F.col("_vm_cur").isNotNull() & F.col("_vm_upd").isNotNull()
    update_only = F.col("_vm_cur").isNull()  # no current match
    deleting = (
        F.col(u_cols[delete_col]) if delete_col is not None else F.lit(False)
    )

    out_cols = []
    for c in data_cols:
        u = F.col(u_cols[c]) if c in u_cols else F.lit(None)
        if when_matched == "update":
            val = F.when(matched & ~deleting, F.coalesce(u, F.col(c))).otherwise(F.col(c))
        else:
            val = F.col(c)
        if when_not_matched == "insert":
            val = F.when(update_only, u).otherwise(val)
        out_cols.append(val.alias(c))
    keep = ~(matched & deleting)
    if when_not_matched == "ignore":
        keep = keep & ~update_only
    merged = joined.filter(keep).select(*out_cols)
    return commit_version(spark, path, merged, mode="overwrite")


def table_history(spark: SparkSession, path: str) -> DataFrame:
    """(version, mode, n_files, commit_files, commit_rows) per version —
    the DESCRIBE HISTORY shape."""
    rows = []
    for v in list_versions(path):
        m = _load_manifest(path, v)
        rows.append(
            (m["version"], m["mode"], len(m["files"]), m["commit_files"], m["commit_rows"])
        )
    return spark.createDataFrame(
        rows, "version int, mode string, n_files int, commit_files int, commit_rows long"
    )


def compact_commit(
    spark: SparkSession,
    path: str,
    target_files: int,
    sort_cols: list[str] | None = None,
) -> int:
    """OPTIMIZE as a commit: rewrite the LATEST version's rows into
    ``target_files`` files (round-robin, or range+sorted to restore
    clustering) and publish that as a new version whose manifest lists
    only the rewritten files. Readers of the old version still see the
    old small files (immutability holds); ``vacuum`` reclaims them once
    the old version ages out. Content is bit-identical by construction
    — the rewrite is a repartition of the same rows."""
    prev = latest_version(path)
    if prev is None:
        raise ValueError(f"no versions committed at {path}")
    df = read_version(spark, path, prev)
    if sort_cols:
        shaped = df.repartitionByRange(target_files, *sort_cols)
        shaped = shaped.sortWithinPartitions(*sort_cols)
    else:
        shaped = df.repartition(target_files)
    return commit_version(spark, path, shaped, mode="overwrite")


def vacuum(path: str, keep_last: int = 1) -> list[str]:
    """Delete data files referenced by none of the last ``keep_last``
    manifests (older manifests are dropped too — their versions are no
    longer readable). Never touches a retained version's files. Returns
    the deleted file paths."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    vs = list_versions(path)
    keep, drop = vs[-keep_last:], vs[:-keep_last]
    live: set[str] = set()
    for v in keep:
        live.update(_load_manifest(path, v)["files"])
    removed = []
    all_files = glob.glob(os.path.join(path, _DATA, "commit-*", "part-*.parquet"))
    for f in all_files:
        if f not in live:
            os.remove(f)
            removed.append(f)
    for v in drop:
        os.remove(_manifest_path(path, v))
    return sorted(removed)


def delete_where(spark: SparkSession, path: str, predicate) -> int:
    """DELETE FROM the latest version — copy-on-write: rows matching
    ``predicate`` (a Column or SQL string) are dropped and the remainder
    commits as a new version. Completes the DML triad next to
    :func:`merge_into` (upsert) and apply_cdc (log replay); the
    GDPR/right-to-be-forgotten face of the versioned table.

    Returns the new version number. Time travel still reads the
    pre-delete versions — a REAL erasure requires :func:`vacuum` down
    to the post-delete version once retention allows, which is exactly
    the two-step contract lakehouse deletes have everywhere (delete =
    logical now, physical at vacuum).

    Plan: one scan + anti-filter + commit; no join, no shuffle beyond
    the write."""
    from pyspark.sql import functions as F

    cond = F.expr(predicate) if isinstance(predicate, str) else predicate
    current = read_version(spark, path)
    remaining = current.filter(~cond | cond.isNull())
    return commit_version(spark, path, remaining, mode="overwrite")


def table_changes(
    spark: SparkSession,
    path: str,
    v_from: int,
    v_to: int,
    keys: list[str],
) -> DataFrame:
    """Change Data Feed between two versions — Delta CDF's read side,
    derived from snapshots instead of logged row files: diff
    ``read_version(v_from)`` against ``read_version(v_to)`` on ``keys``
    and classify every changed row. Output = the v_to schema plus
    ``_change_type`` ∈ {insert, delete, update_preimage,
    update_postimage} (Delta's vocabulary), so downstream incremental
    consumers (apply_cdc, stream_components, index maintenance) can
    replay EXACTLY what a commit did long after it landed.

    Presence detection uses literal marker columns, not key NULLs (the
    merge_into lesson: eqNullSafe key joins make NULL keys legal).
    Update detection compares the full non-key column set null-safely.

    Plan: ONE full-outer join on the keys (both sides are manifest-
    resolved parquet scans); at scale bucket commits by the key columns
    so the diff co-partitions. Cost is |v_from| + |v_to| — the price of
    not logging row-level files at write time, which is the right trade
    until CDC consumers outnumber writers."""
    from pyspark.sql import functions as F

    old = read_version(spark, path, v_from)
    new = read_version(spark, path, v_to)
    if set(old.columns) != set(new.columns):
        raise ValueError("table_changes requires a stable column set")
    data_cols = [c for c in new.columns if c not in keys]
    o = old.select(
        *[F.col(c).alias(f"_o_{c}") for c in old.columns]
    ).withColumn("_has_o", F.lit(True))
    n = new.withColumn("_has_n", F.lit(True))
    cond = [n[k].eqNullSafe(F.col(f"_o_{k}")) for k in keys]
    j = n.join(o, cond, "full_outer")
    same = (
        F.lit(True)
        if not data_cols
        else reduce_and([F.col(c).eqNullSafe(F.col(f"_o_{c}")) for c in data_cols])
    )
    inserted = j.where(F.col("_has_o").isNull()).select(
        *new.columns, F.lit("insert").alias("_change_type")
    )
    deleted = j.where(F.col("_has_n").isNull()).select(
        *[F.col(f"_o_{c}").alias(c) for c in new.columns],
        F.lit("delete").alias("_change_type"),
    )
    changed = j.where(
        F.col("_has_o").isNotNull() & F.col("_has_n").isNotNull() & ~same
    )
    pre = changed.select(
        *[F.col(f"_o_{c}").alias(c) for c in new.columns],
        F.lit("update_preimage").alias("_change_type"),
    )
    post = changed.select(
        *new.columns, F.lit("update_postimage").alias("_change_type")
    )
    return inserted.unionByName(deleted).unionByName(pre).unionByName(post)


def reduce_and(cols):
    from functools import reduce

    return reduce(lambda a, b: a & b, cols)
