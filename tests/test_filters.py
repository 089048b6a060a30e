"""Filter-compiler unit tests — FIXTURES.md F4, one per op × type
(reference md2f.rs:154-183 ops, 232-247 conjunction, 25-34 unknown-op
coercion, 194-203 string-op rejection)."""

import pytest
from pyspark.sql import functions as F

from valentinus_spark.errors import JsonError
from valentinus_spark.filters import compile_filters


@pytest.fixture(scope="module")
def table(spark):
    rows = [
        ("r1", "alpha", {"Year": "2016", "Rating": "1", "Model": "S"}),
        ("r2", "bravo", {"Year": "2017", "Rating": "3", "Model": "X"}),
        ("r3", "charlie", {"Year": "2017", "Rating": "4", "Model": "X"}),
        ("r4", "delta", {"Year": "2018", "Rating": "5", "Model": "3"}),
    ]
    return spark.createDataFrame(rows, "id string, document string, metadata map<string,string>")


def ids(df, specs, **kw):
    pred = compile_filters(specs, **kw)
    return {r["id"] for r in df.filter(pred).select("id").collect()}


CASES = [
    ([{"Year": {"eq": 2017}}], {"r2", "r3"}),          # md2f.rs:154-159
    ([{"Rating": {"gt": 3}}], {"r3", "r4"}),           # md2f.rs:160-165
    ([{"Rating": {"gte": 3}}], {"r2", "r3", "r4"}),    # md2f.rs:166-171
    ([{"Rating": {"lt": 3}}], {"r1"}),                 # md2f.rs:172-177
    ([{"Rating": {"lte": 3}}], {"r1", "r2"}),          # md2f.rs:178-183
    ([{"Model": {"eq": "X"}}], {"r2", "r3"}),          # string eq md2f.rs:194-203
    ([{"Year": {"eq": 2017}}, {"Rating": {"gt": 3}}], {"r3"}),  # AND md2f.rs:232-247
    ([{"Model": {"in": ["S", "3"]}}], {"r1", "r4"}),   # documented-but-missing op, embeddings.rs:329-331
    ([{"Rating": {"in": [1, 5]}}], {"r1", "r4"}),
    (None, {"r1", "r2", "r3", "r4"}),                  # no filters → all
    ([], {"r1", "r2", "r3", "r4"}),
]


@pytest.mark.parametrize("specs,expected", CASES)
def test_ops(table, specs, expected):
    assert ids(table, specs) == expected


def test_json_string_specs(table):
    assert ids(table, ['{"Year": {"eq": 2017}}']) == {"r2", "r3"}


def test_missing_key_matches_nothing(table):
    assert ids(table, [{"Nope": {"eq": 1}}]) == set()


def test_non_numeric_value_for_numeric_op(table):
    # letter values ("S","X") try_cast to NULL → filtered out; the one
    # numeric-looking value ("3") participates
    assert ids(table, [{"Model": {"gt": 1}}]) == {"r4"}
    assert ids(table, [{"Model": {"gt": 5}}]) == set()


def test_string_inequality_rejected_strict(table):
    with pytest.raises(JsonError):
        ids(table, [{"Model": {"gt": "S"}}])


def test_string_inequality_compat_never_matches(table):
    # reference: string filter path only evaluates eq (md2f.rs:194-203)
    assert ids(table, [{"Model": {"gt": "S"}}], strict=False) == set()


def test_unknown_op_strict_raises(table):
    with pytest.raises(JsonError):
        ids(table, [{"Year": {"like": 2017}}])


def test_unknown_op_compat_coerces_to_eq(table):
    # reference silently treats unknown ops as eq (md2f.rs:25-34)
    assert ids(table, [{"Year": {"like": 2017}}], strict=False) == {"r2", "r3"}


def test_malformed_specs(table):
    for bad in ["not json", {"A": {"eq": 1}, "B": {"eq": 2}}, {"A": 5}]:
        with pytest.raises(JsonError):
            compile_filters([bad])


def test_predicate_pushdown_visible(spark, table, tmp_path):
    """The compiled predicate must reach the Parquet scan as a pushed
    filter when metadata keys are promoted to columns (scale contract)."""
    path = str(tmp_path / "docs")
    table.withColumn("Year", F.element_at("metadata", "Year").cast("long")).write.parquet(path)
    df = spark.read.parquet(path).filter(F.col("Year") == 2017)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "Year" in plan
