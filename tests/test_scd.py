"""SCD2 dimension-maintenance tests (operators/scd.py)."""

import pytest
from pyspark.sql import functions as F

from valentinus_spark.operators.scd import scd2_apply, scd2_snapshot_at


@pytest.fixture(scope="module")
def dim(spark):
    rows = [
        # k1: one closed version + one open (changed 2024-03-01)
        (1, "gold", "2024-01-01", "2024-03-01"),
        (1, "platinum", "2024-03-01", None),
        # k2: single open version
        (2, "silver", "2024-01-01", None),
        # k3: single open version
        (3, "bronze", "2024-02-01", None),
    ]
    return spark.createDataFrame(
        rows, "k int, tier string, effective_from string, effective_to string"
    )


def _rows(df):
    return sorted(
        (
            (r["k"], r["tier"], r["effective_from"], r["effective_to"])
            for r in df.collect()
        ),
        key=lambda t: tuple((x is None, x) for x in t),
    )


def test_scd2_apply_change_new_and_unchanged(dim, spark):
    updates = spark.createDataFrame(
        [
            (1, "diamond"),  # changed → close + new version
            (2, "silver"),   # identical → no-op
            (9, "gold"),     # brand-new key → insert open
        ],
        "k int, tier string",
    )
    out = scd2_apply(dim, updates, "k", ["tier"], "2024-06-01")
    assert _rows(out) == sorted(
        [
            (1, "gold", "2024-01-01", "2024-03-01"),       # closed history verbatim
            (1, "platinum", "2024-03-01", "2024-06-01"),   # closed by this batch
            (1, "diamond", "2024-06-01", None),            # new open version
            (2, "silver", "2024-01-01", None),             # unchanged
            (3, "bronze", "2024-02-01", None),             # not in batch
            (9, "gold", "2024-06-01", None),               # new key
        ]
    )


def test_scd2_apply_idempotent_on_identical_batch(dim, spark):
    updates = dim.filter(F.col("effective_to").isNull()).select("k", "tier")
    out = scd2_apply(dim, updates, "k", ["tier"], "2024-06-01")
    assert _rows(out) == _rows(dim)


def test_scd2_null_safe_change_detection(spark):
    cur = spark.createDataFrame(
        [(1, None, "2024-01-01", None)],
        "k int, tier string, effective_from string, effective_to string",
    )
    same = spark.createDataFrame([(1, None)], "k int, tier string")
    diff = spark.createDataFrame([(1, "gold")], "k int, tier string")
    assert _rows(scd2_apply(cur, same, "k", ["tier"], "2024-06-01")) == _rows(cur)
    out = scd2_apply(cur, diff, "k", ["tier"], "2024-06-01")
    assert (1, "gold", "2024-06-01", None) in _rows(out)
    assert (1, None, "2024-01-01", "2024-06-01") in _rows(out)


def test_scd2_snapshot_at(dim):
    feb = scd2_snapshot_at(dim, "2024-02-15")
    assert _rows(feb) == sorted(
        [
            (1, "gold", "2024-01-01", "2024-03-01"),
            (2, "silver", "2024-01-01", None),
            (3, "bronze", "2024-02-01", None),
        ]
    )
    # boundary: effective_from inclusive, effective_to exclusive
    mar = {r["tier"] for r in scd2_snapshot_at(dim, "2024-03-01").filter("k = 1").collect()}
    assert mar == {"platinum"}


# ---------------------------------------------------------------- CDC


from valentinus_spark.operators.scd import apply_cdc  # noqa: E402


@pytest.fixture(scope="module")
def cdc_snapshot(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k int, name string, v int"
    )


def test_apply_cdc_upsert_insert_delete(spark, cdc_snapshot):
    changes = spark.createDataFrame(
        [
            (2, "U", 1, "b2", 21),   # update existing
            (3, "D", 1, None, None),  # delete existing
            (4, "I", 1, "d", 40),    # insert new
        ],
        "k int, op string, seq int, name string, v int",
    )
    out = sorted(
        map(tuple, apply_cdc(cdc_snapshot, changes, "k").collect())
    )
    assert out == [(1, "a", 10), (2, "b2", 21), (4, "d", 40)]


def test_apply_cdc_latest_seq_wins(spark, cdc_snapshot):
    changes = spark.createDataFrame(
        [
            (2, "U", 1, "first", 1),
            (2, "U", 3, "last", 3),
            (2, "U", 2, "middle", 2),
            (1, "D", 1, None, None),
            (1, "I", 2, "revived", 99),  # later insert overrides the delete
        ],
        "k int, op string, seq int, name string, v int",
    )
    out = {r["k"]: r for r in apply_cdc(cdc_snapshot, changes, "k").collect()}
    assert out[2]["name"] == "last" and out[2]["v"] == 3
    assert out[1]["name"] == "revived"


def test_apply_cdc_same_seq_tiebreak(spark, cdc_snapshot):
    # same seq: op desc — U beats I beats D (documented lexicographic)
    changes = spark.createDataFrame(
        [(2, "D", 5, None, None), (2, "U", 5, "won", 7)],
        "k int, op string, seq int, name string, v int",
    )
    out = {r["k"]: r for r in apply_cdc(cdc_snapshot, changes, "k").collect()}
    assert out[2]["name"] == "won"


def test_apply_cdc_empty_changes_identity(spark, cdc_snapshot):
    changes = spark.createDataFrame(
        [], "k int, op string, seq int, name string, v int"
    )
    out = sorted(map(tuple, apply_cdc(cdc_snapshot, changes, "k").collect()))
    assert out == sorted(map(tuple, cdc_snapshot.collect()))
