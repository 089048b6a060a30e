"""Source tests: JSONL corpus ingest and salted aggregation."""

import gzip
import json

from pyspark.sql import functions as F

from valentinus_spark.operators.skew import salted_agg
from valentinus_spark.sources.jsonl import read_documents_jsonl


def _write_jsonl(path, rows, compress=False):
    opener = gzip.open if compress else open
    with opener(path, "wt") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_read_documents_jsonl(spark, tmp_path):
    rows = [
        {"id": f"d{i}", "text": f"text {i}", "lang": "en", "score": i / 10}
        for i in range(10)
    ]
    p = str(tmp_path / "corpus.jsonl")
    _write_jsonl(p, rows)
    df = read_documents_jsonl(spark, p)
    assert df.columns == ["id", "document", "metadata"]
    got = {r["id"]: (r["document"], r["metadata"]) for r in df.collect()}
    assert got["d3"][0] == "text 3"
    assert got["d3"][1] == {"lang": "en", "score": "0.3"}


def test_read_documents_jsonl_gz_with_schema_and_no_id(spark, tmp_path):
    rows = [{"text": f"doc {i}", "source": "web"} for i in range(5)]
    p = str(tmp_path / "corpus.jsonl.gz")
    _write_jsonl(p, rows, compress=True)
    df = read_documents_jsonl(
        spark, p, id_field=None, schema="text string, source string"
    )
    out = df.collect()
    assert len(out) == 5
    assert len({r["id"] for r in out}) == 5  # derived ids unique
    assert all(r["metadata"] == {"source": "web"} for r in out)


def test_salted_agg_equals_plain_groupby(spark):
    df = spark.createDataFrame(
        [(i % 3, float(i), i) for i in range(500)], "k long, v double, c long"
    )
    plain = {
        r["k"]: (r["s"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.max("c").alias("mx"))
        .collect()
    }
    salted = {
        r["k"]: (r["v_sum"], r["c_max"])
        for r in salted_agg(
            df, keys=["k"], aggs={"v": "sum", "c": "max"}, salt_count=8
        ).collect()
    }
    for k, (s, mx) in plain.items():
        assert abs(salted[k][0] - s) < 1e-9
        assert salted[k][1] == mx


def test_salted_agg_count(spark):
    df = spark.createDataFrame([(0, 1.0)] * 100 + [(1, 2.0)] * 7, "k long, v double")
    got = {
        r["k"]: r["v_count"]
        for r in salted_agg(df, keys=["k"], aggs={"v": "count"}, salt_count=4).collect()
    }
    assert got == {0: 100, 1: 7}
