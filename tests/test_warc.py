"""WARC source tests (sources/warc.py): encode→parse roundtrip across
compression layouts, HTTP unwrapping, quarantine posture, Spark
mapInPandas ingest, and the re-shard writer."""

import gzip
import os

import pytest

from valentinus_spark.sources.warc import (
    encode_warc,
    parse_warc_bytes,
    read_warc,
    write_warc,
)


def _recs(n=5):
    return [
        {
            "url": f"http://site{i % 3}.example/d{i}",
            "payload": f"body of doc {i} ".encode() * (i + 1),
            "http_status": 200 if i % 4 else 404,
            "http_content_type": "text/html; charset=utf-8",
        }
        for i in range(n)
    ]


def test_roundtrip_plain_and_member_gzip_and_whole_gzip():
    recs = _recs()
    plain = encode_warc(recs)
    member = encode_warc(recs, compression="member")
    whole = gzip.compress(plain, mtime=0)
    for blob in (plain, member, whole):
        got = list(parse_warc_bytes(blob))
        assert [g["url"] for g in got] == [r["url"] for r in recs]
        assert [g["payload"] for g in got] == [r["payload"] for r in recs]
        assert [g["http_status"] for g in got] == [404, 200, 200, 200, 404]
        assert all(g["record_type"] == "response" for g in got)
        assert got[0]["http_content_type"] == "text/html; charset=utf-8"


def test_http_unwrap_vs_raw_payload():
    recs = _recs(2)
    blob = encode_warc(recs)
    raw = list(parse_warc_bytes(blob, payload="raw"))
    assert raw[0]["payload"].startswith(b"HTTP/1.1 404 OK\r\n")
    assert raw[0]["http_status"] is None  # raw mode leaves the message intact
    http = list(parse_warc_bytes(blob, payload="http"))
    assert http[0]["payload"] == recs[0]["payload"]


def test_non_response_records_and_binary_bodies():
    # metadata record + a body with \r\n\r\n inside (Content-Length walk
    # must not be fooled by header-terminator bytes in payloads)
    tricky = b"\x00\xffbinary\r\n\r\nWARC/1.0\r\nnot a real record"
    recs = [
        {"record_type": "metadata", "url": "http://m.example/", "payload": b"k: v"},
        {"url": "http://b.example/", "payload": tricky},
    ]
    got = list(parse_warc_bytes(encode_warc(recs)))
    assert got[0]["record_type"] == "metadata" and got[0]["payload"] == b"k: v"
    assert got[1]["payload"] == tricky


def test_truncated_record_raises():
    blob = encode_warc(_recs(2))
    with pytest.raises(ValueError):
        list(parse_warc_bytes(blob[:-30]))
    with pytest.raises(ValueError):
        list(parse_warc_bytes(b"NOT A WARC"))


def test_spark_read_warc_and_quarantine(spark, tmp_path):
    recs = _recs(8)
    (tmp_path / "a.warc").write_bytes(encode_warc(recs[:5]))
    (tmp_path / "b.warc.gz").write_bytes(encode_warc(recs[5:], compression="member"))
    (tmp_path / "c.warc").write_bytes(b"WARC/1.0\r\nbroken")  # no header end
    df = read_warc(spark, str(tmp_path), record_types=["response"])
    rows = df.collect()
    ok = [r for r in rows if r["parse_error"] is None]
    bad = [r for r in rows if r["parse_error"] is not None]
    assert len(ok) == 8 and len(bad) == 1
    assert bad[0]["source_file"].endswith("c.warc")
    by_url = {r["url"]: r for r in ok}
    for rec in recs:
        row = by_url[rec["url"]]
        assert bytes(row["payload"]) == rec["payload"]
        assert row["payload_len"] == len(rec["payload"])
        assert row["http_status"] in (200, 404)
    # on_error="raise" propagates the broken file
    with pytest.raises(Exception):
        read_warc(spark, str(tmp_path), on_error="raise").collect()


def test_spark_read_warc_quarantines_corrupt_gzip(spark, tmp_path):
    """A truncated/corrupt gzip member raises zlib.error (not
    ValueError) out of _gunzip_members; the quarantine must catch it too
    — one bad shard byte-range must not kill the whole task (r4 ADVICE,
    warc.py:218)."""
    recs = _recs(4)
    (tmp_path / "good.warc").write_bytes(encode_warc(recs))
    blob = encode_warc(recs, compression="member")
    # valid gzip magic so the member-gzip path engages, then garbage
    (tmp_path / "trunc.warc.gz").write_bytes(blob[: len(blob) // 2] + b"\x00garbage")
    rows = read_warc(spark, str(tmp_path), record_types=["response"]).collect()
    ok = [r for r in rows if r["parse_error"] is None]
    bad = [r for r in rows if r["parse_error"] is not None]
    assert len(ok) == 4, "good shard must survive the corrupt sibling"
    assert len(bad) == 1 and bad[0]["source_file"].endswith("trunc.warc.gz")


def test_spark_write_warc_reshard_roundtrip(spark, tmp_path):
    recs = _recs(12)
    src = tmp_path / "src"
    os.makedirs(src)
    (src / "in.warc").write_bytes(encode_warc(recs))
    df = read_warc(spark, str(src), record_types=["response"])
    out = tmp_path / "out"
    write_warc(df, str(out), n_files=3)
    names = os.listdir(out)
    assert 1 <= len(names) <= 3 and all(n.endswith(".warc.gz") for n in names)
    back = read_warc(spark, str(out), record_types=["response"])
    got = {r["url"]: bytes(r["payload"]) for r in back.collect()}
    assert got == {r["url"]: r["payload"] for r in recs}


# ---- property fuzz: encode -> parse is lossless for ANY payload ----

from hypothesis import given, settings
from hypothesis import strategies as st

from hypo_budget import hypo_examples

_rec_strategy = st.lists(
    st.fixed_dictionaries(
        {
            "url": st.from_regex(r"http://[a-z]{1,8}\.example/[a-zA-Z0-9_/\-]{0,20}", fullmatch=True),
            "payload": st.binary(min_size=0, max_size=400),
            "http_status": st.sampled_from([200, 301, 404, 500]),
            "record_type": st.sampled_from(["response", "metadata", "request"]),
        }
    ),
    min_size=1,
    max_size=8,
)


@given(recs=_rec_strategy, compression=st.sampled_from([None, "member"]))
@settings(max_examples=hypo_examples(60), deadline=None)
def test_warc_roundtrip_fuzz(recs, compression):
    """Any byte payload — including ones embedding WARC headers, CRLF
    runs, gzip magic, or HTTP status lines — must survive encode→parse
    byte-exactly: the parser walks Content-Length offsets and must never
    resynchronize on payload content."""
    blob = encode_warc(recs, compression=compression)
    got = list(parse_warc_bytes(blob))
    assert len(got) == len(recs)
    for g, r in zip(got, recs):
        assert g["url"] == r["url"]
        assert g["record_type"] == r["record_type"]
        assert g["payload"] == r["payload"]
        if r["record_type"] == "response":
            assert g["http_status"] == r["http_status"]
