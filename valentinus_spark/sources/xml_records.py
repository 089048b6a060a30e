"""XML record ingest — legacy feeds, sitemaps, and encyclopedia dumps
(the Wikipedia-dump shape: a root element wrapping one record element
per document) are still a major corpus source. The reference ingests
only CSV (examples/cosine_query_example.rs:14-43); this source parses
real XML with the stdlib ``xml.etree`` inside ``mapInPandas`` — the
WARC-source pattern: pure-stdlib parsing, Arrow-batched, one Python
pass per shard.

Scale shape: XML is not line-splittable, so parallelism is per SHARD
file (exactly the WARC posture — write shards at 100 MB–1 GB and the
cluster parallelizes across them; a single giant dump file should be
re-sharded first, which ``write_xml_records`` does on the way in).
Field text is XML-escaped on write and parsed (not regexed) on read,
so any VALID-XML text round-trips losslessly — the driver gate
checksums the full chain. Code points XML 1.0 cannot carry at all
(C0 controls other than tab/LF/CR, lone surrogates, U+FFFE/U+FFFF)
are STRIPPED on write: numeric character references for them are
equally illegal, so a document containing them has no faithful XML
1.0 representation — the round-trip is lossless modulo that strip.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Code points with NO legal XML 1.0 representation (not even as &#x..;
# references): C0 controls minus {tab, LF, CR}, surrogate halves, and
# the two non-characters at the end of the BMP.
_XML10_ILLEGAL = re.compile(
    "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\ud800-\\udfff\\ufffe\\uffff]"
)


def write_xml_records(
    df: DataFrame,
    path: str,
    fields: list[str],
    record_tag: str = "doc",
    root_tag: str = "corpus",
    n_files: int = 4,
    sort_cols: list[str] | None = None,
) -> None:
    """Write ``df`` as ``n_files`` XML shards, one ``<record_tag>``
    element per row with one child element per field (text content
    XML-escaped via the stdlib — no hand-rolled escaping; code points
    XML 1.0 forbids outright are stripped first, see
    ``_XML10_ILLEGAL``). With ``sort_cols`` the shards are
    range-partitioned so each file covers a contiguous key range."""
    cols = list(fields)
    shaped = (
        df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
        if sort_cols
        else df.repartition(n_files)
    )

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from xml.sax.saxutils import escape

        first = True
        chunks: list[str] = []
        for pdf in batches:
            if first:
                chunks.append(f"<{root_tag}>")
                first = False
            for row in pdf.itertuples(index=False):
                parts = [f"  <{record_tag}>"]
                for c, v in zip(cols, row):
                    val = (
                        ""
                        if v is None
                        else escape(_XML10_ILLEGAL.sub("", str(v)))
                    )
                    parts.append(f"    <{c}>{val}</{c}>")
                parts.append(f"  </{record_tag}>")
                chunks.append("\n".join(parts))
        if first:  # empty partition still emits a valid document
            chunks.append(f"<{root_tag}>")
        chunks.append(f"</{root_tag}>")
        yield pd.DataFrame({"value": ["\n".join(chunks)]})

    shaped.select(*cols).mapInPandas(render, schema="value string").write.mode(
        "overwrite"
    ).text(path)


def read_xml_records(
    spark: SparkSession,
    path: str,
    fields: list[str],
    record_tag: str = "doc",
    schema: str | None = None,
) -> DataFrame:
    """Parse XML shards back to one row per ``<record_tag>`` element.
    Each shard is read whole (``wholetext``) and parsed with
    ``xml.etree`` — real parsing, so escaped entities round-trip. Field
    values surface as strings unless ``schema`` (a DDL string over the
    same field names) requests casts."""
    raw = spark.read.text(path, wholetext=True)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import xml.etree.ElementTree as ET

        for pdf in batches:
            out: dict[str, list] = {c: [] for c in fields}
            for doc in pdf["value"]:
                if not doc.strip():
                    continue
                root = ET.fromstring(doc)
                for rec in root.iter(record_tag):
                    for c in fields:
                        el = rec.find(c)
                        out[c].append(None if el is None else (el.text or ""))
            yield pd.DataFrame(out)

    parsed = raw.mapInPandas(
        parse, schema=", ".join(f"{c} string" for c in fields)
    )
    if schema:
        casts = {}
        for part in schema.split(","):
            name, typ = part.strip().split(None, 1)
            casts[name] = typ
        parsed = parsed.select(
            *[
                F.col(c).cast(casts[c]).alias(c) if c in casts else F.col(c)
                for c in fields
            ]
        )
    return parsed
