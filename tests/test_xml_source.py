"""XML record source: escape/parse losslessness, sharding, casts."""

from pyspark.sql import functions as F

from valentinus_spark.sources.xml_records import (
    read_xml_records,
    write_xml_records,
)


def test_xml_roundtrip_lossless_with_hostile_text(spark, tmp_path):
    """Text containing XML metacharacters, entities, quotes and
    newlines must round-trip byte-identically (real escaping, not
    regex)."""
    rows = [
        (1, "a < b && c > d"),
        (2, 'quotes " and \' and &amp; pre-escaped-looking'),
        (3, "multi\nline\ntext with <tag>inside</tag>"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    path = str(tmp_path / "xml")
    write_xml_records(df, path, fields=["id", "text"], sort_cols=["id"], n_files=2)
    back = read_xml_records(
        spark, path, fields=["id", "text"], schema="id bigint"
    )
    got = {r.id: r.text for r in back.collect()}
    assert got == {i: t for i, t in rows}


def test_xml_strips_xml10_illegal_control_chars(spark, tmp_path):
    """Code points XML 1.0 cannot represent at all (\\x00, \\x08, ...)
    must be STRIPPED on write so the read side's real parser does not
    raise — saxutils.escape alone passes them through (r7 ADVICE).
    Legal whitespace controls (tab/LF/CR) survive; \\r is the one
    lossy-by-spec case (the XML parser normalizes it to \\n)."""
    rows = [
        (1, "nul\x00 bs\x08 vt\x0b esc\x1b end"),
        (2, "tab\tkeeps nl\nkeeps"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    path = str(tmp_path / "xml_ctl")
    write_xml_records(df, path, fields=["id", "text"], n_files=1)
    back = read_xml_records(spark, path, fields=["id", "text"], schema="id bigint")
    got = {r.id: r.text for r in back.collect()}
    assert got[1] == "nul bs vt esc end"
    assert got[2] == "tab\tkeeps nl\nkeeps"


def test_xml_shards_and_empty_partition(spark, tmp_path):
    """More shards than rows: empty shards still emit valid XML docs."""
    df = spark.createDataFrame([(1, "x"), (2, "y")], ["id", "text"])
    path = str(tmp_path / "xml2")
    write_xml_records(df, path, fields=["id", "text"], n_files=4)
    back = read_xml_records(spark, path, fields=["id", "text"])
    assert back.count() == 2
