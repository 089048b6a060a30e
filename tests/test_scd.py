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
