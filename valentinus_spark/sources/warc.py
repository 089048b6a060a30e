"""WARC (ISO 28500) crawl-archive ingest — the raw input format of
web-scale training corpora (Common-Crawl-style archives).

The reference ingests only CSV (examples/cosine_query_example.rs:14-43);
a crawl-derived corpus arrives as millions of ``.warc`` / ``.warc.gz``
files, each a concatenation of length-prefixed records (request,
response, metadata, ...). This module parses them with a pure-stdlib
parser wrapped in ``mapInPandas``:

- **Parallelism unit = the file.** ``spark.read.format("binaryFile")``
  yields one row per file; files are repartitioned across executors and
  each task streams its files record-by-record (the parser walks
  Content-Length offsets — it never builds more than one record's bytes
  beyond the raw file buffer). WARC is NOT splittable mid-file without a
  sidecar index (gzip members per record), so file-level parallelism is
  the honest unit; at 100 TB crawl shards are ~1 GB each by convention,
  so a 1000-executor cluster saturates on file count, not file size.
- **Compression**: per-record-member gzip (the Common Crawl layout) and
  whole-file gzip both decompress via a multi-member ``zlib`` loop;
  plain ``.warc`` passes through.
- **HTTP unwrapping**: response records carry an HTTP message as
  payload; ``payload="http"`` strips the status line + headers and
  returns status/content-type as columns with the body as ``binary``
  (decode/charset handling is downstream's job — bodies are bytes, not
  text, by design: half the crawl is not UTF-8).

Per-record failures quarantine (``on_error="null"``): one truncated
record must not kill a 1 GB shard task — the same posture as the media
decoders (multimodal.py).
"""

from __future__ import annotations

import gzip
import io
import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_SCHEMA = (
    "source_file string, record_type string, url string, warc_date string, "
    "record_id string, content_type string, http_status int, "
    "http_content_type string, payload binary, payload_len bigint, "
    "parse_error string"
)


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a concatenation of gzip members (the per-record-member
    layout WARC uses so records stay individually seekable)."""
    out = io.BytesIO()
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out.write(d.decompress(data[pos:]))
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed
    return out.getvalue()


def _split_http(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content-type, body) from an HTTP response message; the
    payload unchanged when it isn't one."""
    head_end = payload.find(b"\r\n\r\n")
    if head_end < 0 or not payload.startswith(b"HTTP/"):
        return None, None, payload
    head = payload[:head_end].decode("latin-1", "replace")
    lines = head.split("\r\n")
    try:
        status = int(lines[0].split()[1])
    except (IndexError, ValueError):
        return None, None, payload
    ctype = None
    for ln in lines[1:]:
        if ln.lower().startswith("content-type:"):
            ctype = ln.split(":", 1)[1].strip()
            break
    return status, ctype, payload[head_end + 4 :]


def parse_warc_bytes(data: bytes, payload: str = "http") -> Iterator[dict]:
    """Yield one dict per WARC record in ``data`` (transparently
    gunzipping member-compressed input). Walks Content-Length offsets —
    tolerant of trailing garbage, raises ValueError on a structurally
    broken record header."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            raise ValueError(f"bad WARC version line at offset {pos}")
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            raise ValueError("truncated WARC header")
        headers: dict[str, str] = {}
        for ln in data[pos:head_end].decode("utf-8", "replace").split("\r\n")[1:]:
            if ":" in ln:
                k, v = ln.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError) as e:
            raise ValueError("WARC record missing Content-Length") from e
        body_start = head_end + 4
        if body_start + clen > n:
            raise ValueError("truncated WARC record body")
        raw = data[body_start:body_start + clen]
        rec = {
            "record_type": headers.get("warc-type"),
            "url": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "record_id": headers.get("warc-record-id"),
            "content_type": headers.get("content-type"),
            "http_status": None,
            "http_content_type": None,
            "payload": raw,
        }
        if payload == "http" and rec["record_type"] == "response":
            status, ctype, body = _split_http(raw)
            rec["http_status"] = status
            rec["http_content_type"] = ctype
            rec["payload"] = body
        yield rec
        pos = body_start + clen


def encode_warc(records: list[dict], compression: str | None = None) -> bytes:
    """Records → WARC bytes (the test/oracle twin of the parser, and a
    writer for re-sharding pipelines). Each record dict: ``url``,
    ``payload`` (bytes), optional ``record_type``/``warc_date``/
    ``record_id``/``http_status``/``http_content_type``. Response
    records wrap the payload in an HTTP message. ``compression="member"``
    gzips each record as its own member (the seekable crawl layout)."""
    out = bytearray()
    for i, r in enumerate(records):
        rtype = r.get("record_type", "response")
        body = r["payload"]
        if rtype == "response":
            status = r.get("http_status", 200)
            ctype = r.get("http_content_type", "text/html")
            body = (
                f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode() + body
        head = (
            "WARC/1.0\r\n"
            f"WARC-Type: {rtype}\r\n"
            f"WARC-Record-ID: {r.get('record_id', f'<urn:rec:{i}>')}\r\n"
            f"WARC-Date: {r.get('warc_date', '2026-01-01T00:00:00Z')}\r\n"
            + (f"WARC-Target-URI: {r['url']}\r\n" if r.get("url") else "")
            + "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode()
        member = head + bytes(body) + b"\r\n\r\n"
        if compression == "member":
            member = gzip.compress(member, mtime=0)
        out += member
    return bytes(out)


def read_warc(
    spark: SparkSession,
    path: str,
    payload: str = "http",
    record_types: list[str] | None = None,
    on_error: str = "null",
    min_partitions: int | None = None,
) -> DataFrame:
    """WARC files under ``path`` → one row per record (WARC_SCHEMA).

    ``record_types`` filters (e.g. ``["response"]``) INSIDE the parse
    task, so skipped records never cross the Arrow boundary.
    ``on_error="null"`` emits one quarantine row per unparseable FILE
    (parse_error set, other fields null) — ``"raise"`` propagates.
    """
    if on_error not in ("null", "raise"):
        raise ValueError("on_error must be 'null' or 'raise'")
    files = spark.read.format("binaryFile").load(path)
    nparts = min_partitions or spark.sparkContext.defaultParallelism
    files = files.repartition(nparts, "path")
    keep = set(record_types) if record_types else None

    def _parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                try:
                    for rec in parse_warc_bytes(bytes(content), payload=payload):
                        if keep and rec["record_type"] not in keep:
                            continue
                        rows.append(
                            {
                                "source_file": fpath,
                                "record_type": rec["record_type"],
                                "url": rec["url"],
                                "warc_date": rec["warc_date"],
                                "record_id": rec["record_id"],
                                "content_type": rec["content_type"],
                                "http_status": rec["http_status"],
                                "http_content_type": rec["http_content_type"],
                                "payload": rec["payload"],
                                "payload_len": len(rec["payload"]),
                                "parse_error": None,
                            }
                        )
                except (ValueError, zlib.error, EOFError, OSError) as e:
                    # zlib.error / EOFError / OSError (BadGzipFile) escape
                    # _gunzip_members on a truncated or corrupt gzip member;
                    # the quarantine posture is "one bad record must not
                    # kill a 1 GB shard task", so they quarantine alongside
                    # structural ValueErrors (r4 ADVICE, warc.py:218).
                    if on_error == "raise":
                        raise
                    rows.append(
                        {
                            "source_file": fpath,
                            "record_type": None,
                            "url": None,
                            "warc_date": None,
                            "record_id": None,
                            "content_type": None,
                            "http_status": None,
                            "http_content_type": None,
                            "payload": None,
                            "payload_len": None,
                            "parse_error": str(e),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "source_file", "record_type", "url", "warc_date",
                    "record_id", "content_type", "http_status",
                    "http_content_type", "payload", "payload_len",
                    "parse_error",
                ],
            )

    return files.select("path", "content").mapInPandas(_parse, WARC_SCHEMA)


def write_warc(
    df: DataFrame,
    path: str,
    url_col: str = "url",
    payload_col: str = "payload",
    n_files: int = 1,
    compression: str | None = "member",
) -> None:
    """Re-shard a (url, payload) DataFrame as WARC files — the writer
    side of crawl re-packaging (dedup → re-shard). One file per
    partition via ``foreachPartition``; rows stream through the encoder
    without driver materialization."""
    import os
    import uuid

    os.makedirs(path, exist_ok=True)
    part = df.select(
        F.col(url_col).alias("url"), F.col(payload_col).alias("payload")
    ).repartition(n_files)

    def _write(rows):
        recs = [
            {"url": r["url"], "payload": bytes(r["payload"])} for r in rows
        ]
        if not recs:
            return
        fname = os.path.join(path, f"part-{uuid.uuid4().hex}.warc")
        if compression == "member":
            fname += ".gz"
        with open(fname, "wb") as f:
            f.write(encode_warc(recs, compression=compression))

    part.foreachPartition(_write)
