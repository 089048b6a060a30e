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


def test_approx_sketches_within_tolerance(spark):
    """The 100 TB substitutes for exact distinct/quantiles: HLL-based
    approx_count_distinct and percentile_approx must land within their
    documented error of the exact answers (both are mergeable sketches —
    map-side combine applies, unlike exact percentile which shuffles
    every value)."""
    df = spark.range(20000).select(
        (F.col("id") % 811).alias("k"), (F.col("id") % 1000 / 10.0).alias("v")
    )
    row = df.agg(
        F.approx_count_distinct("k", rsd=0.02).alias("approx_k"),
        F.countDistinct("k").alias("exact_k"),
        F.percentile_approx("v", 0.5, 10000).alias("approx_p50"),
        F.expr("percentile(v, 0.5D)").alias("exact_p50"),
    ).first()
    assert abs(row["approx_k"] - row["exact_k"]) <= 0.05 * row["exact_k"]
    assert abs(row["approx_p50"] - row["exact_p50"]) <= 1.0


def test_orc_roundtrip_lossless_and_pushdown(spark, tmp_path):
    from pyspark.sql import functions as F

    from valentinus_spark.sources.formats import read_orc, write_orc

    df = spark.range(0, 300).select(
        F.col("id"), (F.col("id") % 7).alias("v"),
        F.concat(F.lit("t"), F.col("id")).alias("s"),
    )
    path = str(tmp_path / "orc")
    write_orc(df, path, n_files=3, sort_cols=["id"])
    back = read_orc(spark, path, schema=df.schema)
    assert back.count() == 300
    assert sorted(r["id"] for r in back.collect()) == list(range(300))
    # explicit schema respected (nullability widens on read, as for any
    # file source), predicate answers correctly over stripes
    assert [(f.name, f.dataType) for f in back.schema] == [
        (f.name, f.dataType) for f in df.schema
    ]
    assert back.filter(F.col("id") < 50).count() == 50


def test_orc_unsorted_write_defaults(spark, tmp_path):
    from pyspark.sql import functions as F

    from valentinus_spark.sources.formats import read_orc, write_orc

    df = spark.range(0, 64).select(F.col("id"))
    path = str(tmp_path / "orc2")
    write_orc(df, path, n_files=2)
    assert read_orc(spark, path).count() == 64


def test_write_jsonl_roundtrip_sharded_sorted(spark, tmp_path):
    """write_jsonl range-shards + sorts: 3 gzip files, each a contiguous
    id range, and read_documents_jsonl recovers every row losslessly
    (including JSON-escaping-hostile text)."""
    import os

    from valentinus_spark.sources.jsonl import write_jsonl

    rows = [
        (i, 'tricky "quotes" \\ and\nnewlines é%d' % i, "en")
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "id long, text string, lang string")
    path = str(tmp_path / "shards")
    write_jsonl(df, path, n_files=3, sort_cols=["id"])
    parts = sorted(
        f for f in os.listdir(path) if f.startswith("part-") and f.endswith(".gz")
    )
    assert len(parts) == 3
    # each shard covers a contiguous id range (range partitioning)
    spans = []
    for p in parts:
        ids = [
            json.loads(ln)["id"]
            for ln in gzip.open(os.path.join(path, p), "rt")
        ]
        assert ids == sorted(ids)
        if ids:
            spans.append((ids[0], ids[-1]))
    spans.sort()
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi < lo
    back = read_documents_jsonl(
        spark, path, id_field="id", schema="id long, text string, lang string"
    )
    got = {int(r["id"]): r["document"] for r in back.collect()}
    assert got == {i: t for i, t, _ in rows}


def test_fixed_width_roundtrip_and_overflow(spark, tmp_path):
    """Typed round-trip through fixed-width lines: strings left-pad,
    numerics right-pad, values survive exactly; an over-wide value
    raises instead of truncating."""
    import pytest
    from pyspark.sql import functions as F

    from valentinus_spark.sources import read_fixed_width, write_fixed_width

    specs = [
        ("id", 1, 6, "bigint"),
        ("name", 7, 10, "string"),
        ("price", 17, 12, "double"),
    ]
    df = spark.createDataFrame(
        [(1, "alpha", 12.5), (22, "beta", 0.125), (333, "c", 104850.5)],
        ["id", "name", "price"],
    )
    path = str(tmp_path / "fw")
    write_fixed_width(df, path, specs, n_files=1)
    back = read_fixed_width(spark, path, specs)
    rows = {r.id: r for r in back.collect()}
    assert rows[1].name == "alpha" and rows[1].price == 12.5
    assert rows[22].price == 0.125 and rows[333].price == 104850.5
    # raw line layout: id right-aligned in 6, name left-aligned in 10
    raw = sorted(r.value for r in spark.read.text(path).collect())
    assert raw[0].startswith("     1alpha     ")

    wide = spark.createDataFrame([(1, "waytoolongname", 1.0)], ["id", "name", "price"])
    with pytest.raises(Exception, match="fixed-width overflow"):
        write_fixed_width(wide, str(tmp_path / "fw2"), specs)
