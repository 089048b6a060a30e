"""Data-quality expectation tests (operators/validate.py)."""

import pytest
from pyspark.sql import functions as F

from valentinus_spark.operators.validate import (
    check_expectations,
    fk_violations,
    uniqueness_violations,
    validation_report,
)


@pytest.fixture(scope="module")
def tbl(spark):
    rows = [
        (1, 10.0, "a"),
        (2, -5.0, "b"),     # range violation
        (3, None, "c"),     # null violation (NULL fails the predicate)
        (3, 7.0, None),     # dup id + null name
    ]
    return spark.createDataFrame(rows, "id int, amount double, name string")


def test_check_expectations_single_scan_counts(tbl):
    out = {
        r["check"]: r["n_violations"]
        for r in check_expectations(
            tbl,
            [
                ("amount_positive", F.col("amount") > 0),
                ("name_not_null", F.col("name").isNotNull()),
                ("id_in_range", F.col("id").between(1, 100)),
            ],
        ).collect()
    }
    assert out == {"amount_positive": 2, "name_not_null": 1, "id_in_range": 0}


def test_check_expectations_null_predicate_is_violation(tbl):
    # explicit NULL-allowing wrap flips the null row to a pass
    out = {
        r["check"]: r["n_violations"]
        for r in check_expectations(
            tbl,
            [("amount_pos_or_null", F.col("amount").isNull() | (F.col("amount") > 0))],
        ).collect()
    }
    assert out["amount_pos_or_null"] == 1  # only the -5.0 row


def test_check_expectations_empty_raises(tbl):
    with pytest.raises(ValueError):
        check_expectations(tbl, [])


def test_uniqueness_violations(tbl):
    row = uniqueness_violations(tbl, ["id"]).first()
    assert row["check"] == "unique(id)" and row["n_violations"] == 1
    none = uniqueness_violations(tbl, ["id", "amount"]).first()
    assert none["n_violations"] == 0


def test_fk_violations_and_report(spark, tbl):
    parent = spark.createDataFrame([(1,), (2,)], "pid int")
    fk = fk_violations(tbl, parent, "id", "pid").first()
    assert fk["check"] == "fk(id->pid)" and fk["n_violations"] == 2  # two id=3 rows

    report = validation_report(
        [
            check_expectations(tbl, [("amount_positive", F.col("amount") > 0)]),
            uniqueness_violations(tbl, ["id"]),
            fk_violations(tbl, parent, "id", "pid"),
        ]
    ).collect()
    assert {r["check"] for r in report} == {"amount_positive", "unique(id)", "fk(id->pid)"}
