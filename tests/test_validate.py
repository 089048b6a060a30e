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


# ------------------------------------------------------- k-anonymity


from valentinus_spark.operators.validate import (  # noqa: E402
    k_anonymity_stats,
    k_anonymity_violations,
)


@pytest.fixture(scope="module")
def quasi_df(spark):
    rows = (
        [("NY", 1980, i) for i in range(5)]
        + [("NY", 1990, 100)]            # singleton
        + [("LA", 1980, 200), ("LA", 1980, 201)]  # pair
        + [(None, 1980, 300), (None, 1980, 301), (None, 1980, 302)]
    )
    return spark.createDataFrame(rows, "city string, birth_year int, pid int")


def test_k_anonymity_violations(quasi_df):
    out = sorted(
        [
            (r["city"], r["birth_year"], r["group_size"])
            for r in k_anonymity_violations(
                quasi_df, ["city", "birth_year"], k=3
            ).collect()
        ],
        key=str,
    )
    assert out == [("LA", 1980, 2), ("NY", 1990, 1)]


def test_k_anonymity_nulls_group_together(quasi_df):
    out = k_anonymity_violations(quasi_df, ["city", "birth_year"], k=4).collect()
    # the three NULL-city rows form one group of 3 (< 4)
    assert any(r["city"] is None and r["group_size"] == 3 for r in out)


def test_k_anonymity_stats(quasi_df):
    row = k_anonymity_stats(quasi_df, ["city", "birth_year"], k=3).collect()[0]
    assert row["n_rows"] == 11
    assert row["n_groups"] == 4
    assert row["violating_groups"] == 2
    assert row["rows_at_risk"] == 3
    assert row["min_group_size"] == 1


def test_l_diversity_stats_planted(spark):
    """Planted homogeneity: group A has one sensitive value for all its
    rows (classic homogeneity attack), group B has two, group C has
    three — at l=3 exactly A and B violate and their rows are at risk."""
    from valentinus_spark.operators import l_diversity_stats

    rows = (
        [("A", 1, "flu")] * 10
        + [("B", 1, "flu")] * 4 + [("B", 1, "cold")] * 4
        + [("C", 2, "flu")] * 3 + [("C", 2, "cold")] * 2 + [("C", 2, "covid")] * 1
    )
    df = spark.createDataFrame(rows, "seg string, nat int, dx string")
    r = l_diversity_stats(df, ["seg", "nat"], "dx", l=3).collect()[0]
    assert r["n_rows"] == 24 and r["n_groups"] == 3
    assert r["violating_groups"] == 2
    assert r["rows_at_risk"] == 18
    assert r["min_diversity"] == 1


def test_dp_group_counts_mechanism_properties(spark):
    """Deterministic replay (same salt → same release), bounded noise in
    practice at eps=1, clamping never emits negatives, and a different
    salt draws different noise."""
    from valentinus_spark.operators.validate import dp_group_counts

    df = spark.createDataFrame(
        [(i, f"g{i % 4}") for i in range(400)], "id long, g string"
    )
    a = {r["g"]: r["dp_count"] for r in dp_group_counts(df, ["g"]).collect()}
    b = {r["g"]: r["dp_count"] for r in dp_group_counts(df, ["g"]).collect()}
    assert a == b
    assert all(v >= 0 for v in a.values())
    # true count is 100 per group; geometric noise at eps=1 is tiny
    assert all(abs(v - 100) < 30 for v in a.values())
    c = {r["g"]: r["dp_count"] for r in dp_group_counts(df, ["g"], salt="dp-v2").collect()}
    assert c != a  # fresh salt, fresh noise draw


def test_dp_group_counts_small_group_hidden(spark):
    """A group of size 1 must not be recoverable exactly across salts:
    over several independent releases the noisy counts vary (the signal
    an attacker would need is drowned)."""
    from valentinus_spark.operators.validate import dp_group_counts

    df = spark.createDataFrame([(1, "only")], "id long, g string")
    vals = {
        dp_group_counts(df, ["g"], salt=f"s{i}").collect()[0]["dp_count"]
        for i in range(8)
    }
    assert len(vals) > 1


def test_sequence_gaps_detects_ranges(spark):
    from valentinus_spark.operators import sequence_gaps

    ids = [0, 1, 2, 5, 6, 10]  # gaps: 3-4 (2 missing), 7-9 (3 missing)
    df = spark.createDataFrame([(i,) for i in ids], ["id"])
    out = sequence_gaps(df, "id").collect()
    assert [(r.gap_start, r.gap_end, r.n_missing) for r in out] == [
        (3, 4, 2),
        (7, 9, 3),
    ]


def test_sequence_gaps_contiguous_and_dupes(spark):
    from valentinus_spark.operators import sequence_gaps

    df = spark.createDataFrame([(i % 5,) for i in range(15)], ["id"])
    assert sequence_gaps(df, "id").count() == 0


def test_t_closeness_hand_computed_emd(spark):
    """Two groups over the ordered spine {1,2,3}, exact fractions:
    A = [1,1,2] -> EMD 17/42; B = [2,3,3,3] -> EMD 17/56 (global q =
    (2/7, 2/7, 3/7)). A's missing value 3 must participate at p = 0."""
    from valentinus_spark.operators import t_closeness_stats

    rows = [("A", 1), ("A", 1), ("A", 2), ("B", 2), ("B", 3), ("B", 3), ("B", 3)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {r.g: r for r in t_closeness_stats(df, ["g"], "v", t=0.35).collect()}
    assert out["A"].n == 3 and out["B"].n == 4
    assert out["A"].emd == pytest.approx(17 / 42, abs=1e-6)
    assert out["B"].emd == pytest.approx(17 / 56, abs=1e-6)
    assert out["A"].exceeds_t and not out["B"].exceeds_t


def test_t_closeness_constant_sensitive_and_identical_dist(spark):
    from valentinus_spark.operators import t_closeness_stats

    # constant sensitive column: m = 1 -> emd 0 for every group
    df = spark.createDataFrame([("A", 7)] * 3 + [("B", 7)] * 2, ["g", "v"])
    out = t_closeness_stats(df, ["g"], "v").collect()
    assert all(r.emd == 0.0 and not r.exceeds_t for r in out)
    # group distribution == global distribution -> emd 0
    df2 = spark.createDataFrame(
        [("A", 1), ("A", 2), ("B", 1), ("B", 2)], ["g", "v"]
    )
    out2 = t_closeness_stats(df2, ["g"], "v").collect()
    assert all(r.emd == pytest.approx(0.0, abs=1e-9) for r in out2)
