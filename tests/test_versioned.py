"""Versioned parquet tables (sources/versioned.py): commit/append/
overwrite semantics, pinned-reader isolation, history, vacuum."""

import os

import pytest
from pyspark.sql import functions as F

from valentinus_spark.sources.versioned import (
    commit_version,
    latest_version,
    list_versions,
    read_version,
    table_history,
    vacuum,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), F.concat(F.lit("row-"), F.col("id")).alias("s")
    )


def test_commit_append_and_time_travel(spark, tmp_path):
    path = str(tmp_path / "tbl")
    v1 = commit_version(spark, path, _df(spark, 0, 100), mode="overwrite")
    v2 = commit_version(spark, path, _df(spark, 100, 150), mode="append")
    assert (v1, v2) == (1, 2)
    assert read_version(spark, path, 1).count() == 100
    assert read_version(spark, path, 2).count() == 150
    assert read_version(spark, path).count() == 150  # latest default
    assert list_versions(path) == [1, 2]


def test_overwrite_starts_fresh_but_keeps_old_readable(spark, tmp_path):
    path = str(tmp_path / "tbl2")
    commit_version(spark, path, _df(spark, 0, 60), mode="overwrite")
    commit_version(spark, path, _df(spark, 500, 510), mode="overwrite")
    assert read_version(spark, path, 2).count() == 10
    # time travel back across the overwrite
    assert read_version(spark, path, 1).count() == 60


def test_pinned_reader_isolated_from_later_commits(spark, tmp_path):
    path = str(tmp_path / "tbl3")
    commit_version(spark, path, _df(spark, 0, 40), mode="overwrite")
    pinned = read_version(spark, path, 1)
    commit_version(spark, path, _df(spark, 40, 80), mode="append")
    # the pinned plan resolves the SAME files regardless of new commits
    assert pinned.count() == 40
    assert sorted(r["id"] for r in pinned.collect()) == list(range(40))


def test_history_shape(spark, tmp_path):
    path = str(tmp_path / "tbl4")
    commit_version(spark, path, _df(spark, 0, 30), mode="overwrite")
    commit_version(spark, path, _df(spark, 30, 40), mode="append")
    hist = {r["version"]: r for r in table_history(spark, path).collect()}
    assert hist[1]["commit_rows"] == 30 and hist[1]["mode"] == "overwrite"
    assert hist[2]["commit_rows"] == 10 and hist[2]["mode"] == "append"
    assert hist[2]["n_files"] > hist[2]["commit_files"] or hist[1]["n_files"] == hist[1]["commit_files"]


def test_vacuum_reclaims_only_unreferenced_files(spark, tmp_path):
    path = str(tmp_path / "tbl5")
    commit_version(spark, path, _df(spark, 0, 50), mode="overwrite")
    commit_version(spark, path, _df(spark, 0, 5), mode="overwrite")
    removed = vacuum(path, keep_last=1)
    assert removed  # v1's files were unreferenced by v2
    assert all(os.path.basename(os.path.dirname(f)) == "commit-000001" for f in removed)
    # current version unaffected; old version gone
    assert read_version(spark, path, 2).count() == 5
    assert list_versions(path) == [2]
    with pytest.raises(ValueError):
        read_version(spark, path, 1)


def test_vacuum_keeps_append_chain_files(spark, tmp_path):
    path = str(tmp_path / "tbl6")
    commit_version(spark, path, _df(spark, 0, 20), mode="overwrite")
    commit_version(spark, path, _df(spark, 20, 30), mode="append")
    # v2 references v1's files too: nothing is reclaimable
    assert vacuum(path, keep_last=1) == []
    assert read_version(spark, path, 2).count() == 30


def test_commit_mode_validation(spark, tmp_path):
    with pytest.raises(ValueError):
        commit_version(spark, str(tmp_path / "x"), _df(spark, 0, 1), mode="merge")
    with pytest.raises(ValueError):
        read_version(spark, str(tmp_path / "empty"))


def test_compact_commit_rewrites_losslessly(spark, tmp_path):
    from valentinus_spark.sources.versioned import compact_commit

    path = str(tmp_path / "tbl7")
    commit_version(
        spark, path, _df(spark, 0, 200).repartition(16), mode="overwrite"
    )
    commit_version(spark, path, _df(spark, 200, 210).repartition(4), mode="append")
    v3 = compact_commit(spark, path, target_files=2, sort_cols=["id"])
    assert v3 == 3
    hist = {r["version"]: r for r in table_history(spark, path).collect()}
    assert hist[3]["n_files"] == 2 and hist[3]["commit_rows"] == 210
    assert sorted(r["id"] for r in read_version(spark, path, 3).collect()) == list(
        range(210)
    )
    # pre-compaction version unchanged and still readable
    assert read_version(spark, path, 2).count() == 210
    # after vacuum only the 2 compacted files remain on disk
    vacuum(path, keep_last=1)
    import glob as _g

    left = _g.glob(os.path.join(path, "data", "commit-*", "part-*.parquet"))
    assert len(left) == 2


def test_batch_id_makes_commits_idempotent(spark, tmp_path):
    path = str(tmp_path / "tbl8")
    v1 = commit_version(spark, path, _df(spark, 0, 10), mode="append", batch_id=0)
    v_replay = commit_version(spark, path, _df(spark, 0, 10), mode="append", batch_id=0)
    assert v_replay == v1  # replayed micro-batch: no new version
    assert read_version(spark, path).count() == 10
    v2 = commit_version(spark, path, _df(spark, 10, 15), mode="append", batch_id=1)
    assert v2 == v1 + 1
    assert read_version(spark, path).count() == 15


def test_stream_commit_versions_one_version_per_batch(spark, tmp_path):
    from pyspark.sql import functions as F2

    from valentinus_spark.streaming.pipeline import (
        stream_commit_versions,
        write_ordered_batches,
    )

    src = _df(spark, 0, 90)
    feed = str(tmp_path / "feed")
    write_ordered_batches(src, [F2.col("id") < 50, F2.col("id") >= 50], feed)
    stream = (
        spark.readStream.schema(spark.read.parquet(feed).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(feed)
    )
    path = str(tmp_path / "tbl9")
    q = stream_commit_versions(stream, path, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert read_version(spark, path).count() == 90
    hist = table_history(spark, path).collect()
    assert len(hist) == 2  # one commit per micro-batch
    assert {r["commit_rows"] for r in hist} == {50, 40}


def test_schema_evolution_add_column(spark, tmp_path):
    path = str(tmp_path / "tbl10")
    commit_version(spark, path, _df(spark, 0, 20), mode="overwrite")
    evolved = _df(spark, 20, 30).withColumn("score", F.col("id") * 2.0)
    # unsanctioned evolution fails loudly
    with pytest.raises(ValueError, match="allow_schema_change"):
        commit_version(spark, path, evolved, mode="append")
    commit_version(
        spark, path, evolved, mode="append", allow_schema_change=True
    )
    snap = read_version(spark, path)
    assert snap.count() == 30 and "score" in snap.columns
    by_id = {r["id"]: r["score"] for r in snap.collect()}
    assert by_id[5] is None          # pre-evolution rows read null
    assert by_id[25] == 50.0


def test_schema_evolution_rejects_type_change(spark, tmp_path):
    path = str(tmp_path / "tbl11")
    commit_version(spark, path, _df(spark, 0, 5), mode="overwrite")
    retyped = spark.range(5, 8).select(
        F.col("id").cast("string").alias("id"), F.lit("x").alias("s")
    )
    with pytest.raises(ValueError, match="type change"):
        commit_version(
            spark, path, retyped, mode="append", allow_schema_change=True
        )


def test_merge_into_upsert_delete_and_isolation(spark, tmp_path):
    """MERGE INTO on a versioned table: update + insert + delete in one
    commit, pre-merge readers keep their snapshot, when_matched/
    when_not_matched knobs behave, and duplicate merge keys are
    rejected (Delta's cardinality check)."""
    import pytest as _pytest

    from valentinus_spark.sources.versioned import (
        commit_version,
        merge_into,
        read_version,
    )

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id long, name string, v long"
    )
    v1 = commit_version(spark, path, base, mode="overwrite")
    pre = read_version(spark, path, v1)

    updates = spark.createDataFrame(
        [(2, "B", 99, False), (3, None, None, True), (4, "d", 40, False)],
        "id long, name string, v long, is_delete boolean",
    ).select("id", "name", "v", "is_delete")
    v2 = merge_into(
        spark, path, updates, on=["id"], delete_col="is_delete"
    )
    got = {r["id"]: (r["name"], r["v"]) for r in read_version(spark, path, v2).collect()}
    assert got == {1: ("a", 10), 2: ("B", 99), 4: ("d", 40)}  # 3 deleted
    # snapshot isolation: the pinned pre-merge reader still sees v1
    assert {r["id"] for r in pre.collect()} == {1, 2, 3}

    # when_matched=ignore keeps current values; when_not_matched=ignore drops inserts
    upd2 = spark.createDataFrame(
        [(2, "ZZZ", 0, False), (9, "x", 1, False)],
        "id long, name string, v long, is_delete boolean",
    )
    v3 = merge_into(
        spark, path, upd2, on=["id"],
        when_matched="ignore", when_not_matched="ignore", delete_col="is_delete",
    )
    got3 = {r["id"]: (r["name"], r["v"]) for r in read_version(spark, path, v3).collect()}
    assert got3 == got  # nothing changed

    dup = spark.createDataFrame(
        [(5, "p", 1, False), (5, "q", 2, False)],
        "id long, name string, v long, is_delete boolean",
    )
    with _pytest.raises(ValueError, match="duplicate merge key"):
        merge_into(spark, path, dup, on=["id"], delete_col="is_delete")


def test_merge_into_null_key_matches_null_key(spark, tmp_path):
    """NULL merge keys (r4 ADVICE, versioned.py:239): the join uses
    eqNullSafe, so a NULL-keyed current row MATCHES a NULL-keyed update
    row. Presence must come from marker columns, not key-NULL checks —
    the old formulation read the match as insert-only and silently
    deleted the current row under when_not_matched='ignore' (and
    replaced it wholesale, bypassing partial-update, under 'insert')."""
    from valentinus_spark.sources.versioned import (
        commit_version,
        merge_into,
        read_version,
    )

    path = str(tmp_path / "nulltbl")
    base = spark.createDataFrame(
        [(None, "nullrow", 1), (1, "a", 10)], "id long, name string, v long"
    )
    commit_version(spark, path, base, mode="overwrite")

    # partial update of the NULL-keyed row: NULL name keeps current
    upd = spark.createDataFrame([(None, None, 99)], "id long, name string, v long")
    v2 = merge_into(spark, path, upd, on=["id"], when_not_matched="ignore")
    got = {r["name"]: (r["id"], r["v"]) for r in read_version(spark, path, v2).collect()}
    assert got == {"nullrow": (None, 99), "a": (1, 10)}, (
        "NULL-keyed match must UPDATE (name preserved via coalesce), "
        "not delete or wholesale-replace"
    )

    # and under when_not_matched='insert' it must still be a match
    # (1 row out, not 2), with partial-update semantics intact
    upd2 = spark.createDataFrame([(None, None, 7)], "id long, name string, v long")
    v3 = merge_into(spark, path, upd2, on=["id"], when_not_matched="insert")
    rows = read_version(spark, path, v3).collect()
    assert len(rows) == 2
    got3 = {r["name"]: r["v"] for r in rows}
    assert got3 == {"nullrow": 7, "a": 10}


def test_delete_where_copy_on_write_and_vacuum_erasure(spark, tmp_path):
    """delete_where drops matching rows in a NEW version (NULL predicate
    rows are kept — SQL DELETE semantics), old versions stay readable
    until vacuum reclaims them (the logical-then-physical contract)."""
    from valentinus_spark.sources.versioned import (
        commit_version,
        delete_where,
        read_version,
        vacuum,
    )

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", None), (3, "c", 30)], "id long, name string, v long"
    )
    v1 = commit_version(spark, path, base, mode="overwrite")
    v2 = delete_where(spark, path, "v > 15")
    got = {r["id"] for r in read_version(spark, path, v2).collect()}
    assert got == {1, 2}, "NULL-predicate row must survive a DELETE"
    # pre-delete snapshot intact
    assert {r["id"] for r in read_version(spark, path, v1).collect()} == {1, 2, 3}
    # physical erasure once the old version ages out
    vacuum(path, keep_last=1)
    import pytest as _pytest
    with _pytest.raises(Exception):
        read_version(spark, path, v1).collect()
    assert {r["id"] for r in read_version(spark, path, v2).collect()} == {1, 2}


def test_table_changes_cdf_classification(spark, tmp_path):
    """CDF between snapshots: insert / delete / update pre+post images,
    NULL keys matched null-safely, NULL-to-value data changes detected."""
    from valentinus_spark.sources.versioned import (
        commit_version,
        table_changes,
    )

    path = str(tmp_path / "t")
    v1 = commit_version(
        spark,
        path,
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", None), (None, "n", 5)],
            "id long, name string, v long",
        ),
        mode="overwrite",
    )
    v2 = commit_version(
        spark,
        path,
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 99), (None, "n2", 5), (4, "d", 1)],
            "id long, name string, v long",
        ),
        mode="overwrite",
    )
    rows = table_changes(spark, path, v1, v2, keys=["id"]).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["_change_type"], []).append((r["id"], r["name"], r["v"]))
    assert by_type["insert"] == [(4, "d", 1)]
    assert "delete" not in by_type
    pre = set(by_type["update_preimage"])
    post = set(by_type["update_postimage"])
    assert (2, "b", None) in pre and (2, "b", 99) in post  # NULL -> value
    assert (None, "n", 5) in pre and (None, "n2", 5) in post  # NULL key matched
    assert len(rows) == 1 + 2 * 2
