"""WARC (ISO 28500) source — the format web crawls actually arrive in.

A WARC file is a sequence of records (version line, CRLF headers,
Content-Length octets of payload, blank-line terminator), usually
stored as ``.warc.gz`` with ONE GZIP MEMBER PER RECORD so readers can
skip without inflating the whole file.

Scale posture: WARC is not block-splittable (records are variable
length; per-record gzip members have no sync markers without a side
index), so the parallel unit is the FILE — exactly how crawls ship
(thousands of ~1 GB segment files).  ``binaryFile`` gives one task per
file; parsing is a streaming scan inside the task with nothing held
but the current record.  A CDX side index would enable sub-file
splits; that is the documented next step, not a requirement at the
thousands-of-files scale the format assumes.
"""

from __future__ import annotations

import io
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Output schema of read_warc.
WARC_SCHEMA = (
    "warc_file string, record_id string, warc_type string, "
    "warc_date string, target_uri string, content_type string, "
    "content_length long, payload binary"
)


def _gunzip_members(data: bytes) -> bytes:
    """Decompress CONCATENATED gzip members (the per-record layout) —
    stdlib zlib, looping members until input is exhausted."""
    out = bytearray()
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        out += d.decompress(data[pos:])
        out += d.flush()
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed
    return bytes(out)


def parse_warc_records(data: bytes) -> Iterator[dict]:
    """Parse raw (already-inflated) WARC bytes into record dicts:
    {headers: {name_lower: value}, payload: bytes}.  Tolerant of
    arbitrary inter-record CRLF padding; stops cleanly at truncation
    (a partial trailing record is dropped, matching how crawl readers
    treat interrupted segment uploads)."""
    pos = 0
    n = len(data)
    while pos < n:
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        if not data[pos : pos + 5] == b"WARC/":
            raise ValueError(f"expected WARC version line at offset {pos}")
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            break
        lines = data[pos:head_end].split(b"\r\n")
        headers: dict[str, str] = {}
        for line in lines[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("ascii")] = v.strip().decode(
                "utf-8", "replace"
            )
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            length = 0
        body_start = head_end + 4
        if body_start + length > n:
            break  # truncated trailing record
        yield {
            "headers": headers,
            "payload": data[body_start : body_start + length],
        }
        pos = body_start + length


def split_http_response(payload: bytes) -> tuple[int | None, bytes]:
    """Split an ``application/http; msgtype=response`` payload into
    (status_code, body).  Non-HTTP payloads come back (None, payload)."""
    if not payload[:5] == b"HTTP/":
        return None, payload
    head_end = payload.find(b"\r\n\r\n")
    if head_end < 0:
        return None, payload
    status_line = payload[: payload.find(b"\r\n")].split(b" ")
    try:
        status = int(status_line[1])
    except (IndexError, ValueError):
        status = None
    return status, payload[head_end + 4 :]


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read WARC / WARC.GZ files into one row per record.

    Plan: ``binaryFile`` scan (one task per file — the format's
    parallel unit), then an Arrow pass that inflates per-record gzip
    members and walks records with bounded memory.  Payloads stay
    opaque ``binary`` (the media-column contract); downstream text
    extraction decides what to decode."""
    files = spark.read.format("binaryFile").load(path)

    def parse_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list] = {
                k: []
                for k in (
                    "warc_file", "record_id", "warc_type", "warc_date",
                    "target_uri", "content_type", "content_length",
                    "payload",
                )
            }
            for fpath, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if data[:2] == b"\x1f\x8b":
                    data = _gunzip_members(data)
                for rec in parse_warc_records(data):
                    h = rec["headers"]
                    rows["warc_file"].append(fpath)
                    rows["record_id"].append(h.get("warc-record-id"))
                    rows["warc_type"].append(h.get("warc-type"))
                    rows["warc_date"].append(h.get("warc-date"))
                    rows["target_uri"].append(h.get("warc-target-uri"))
                    rows["content_type"].append(h.get("content-type"))
                    rows["content_length"].append(len(rec["payload"]))
                    rows["payload"].append(rec["payload"])
            yield pd.DataFrame(rows)

    return files.select("path", "content").mapInPandas(
        parse_batches, schema=WARC_SCHEMA
    )


def warc_documents(spark: SparkSession, path: str) -> DataFrame:
    """The crawl-to-corpus entry: response records only, HTTP envelope
    stripped, body decoded UTF-8 (errors replaced), served as
    (target_uri, warc_date, status, text) — the DataFrame the curation
    stack (normalize -> quality -> dedup) starts from."""
    recs = read_warc(spark, path).filter(F.col("warc_type") == "response")

    def body_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "target_uri": [], "warc_date": [], "status": [], "text": []
            }
            for uri, date, payload in zip(
                pdf["target_uri"], pdf["warc_date"], pdf["payload"]
            ):
                status, body = split_http_response(bytes(payload))
                out["target_uri"].append(uri)
                out["warc_date"].append(date)
                out["status"].append(status)
                out["text"].append(body.decode("utf-8", "replace"))
            yield pd.DataFrame(out)

    return recs.select("target_uri", "warc_date", "payload").mapInPandas(
        body_batches,
        schema="target_uri string, warc_date string, status int, text string",
    )
