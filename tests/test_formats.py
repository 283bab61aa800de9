"""JSONL / ORC source+sink round trips and idempotency contract."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from conte_to_fresco_etl_spark.sources.readers import read_jsonl, read_orc
from conte_to_fresco_etl_spark.sources.sinks import write_jsonl, write_orc

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def test_jsonl_roundtrip_preserves_rows(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "j")
    write_jsonl(docs, out, partition_col="source")
    back = read_jsonl(spark, out, schema=DOC_SCHEMA)
    assert back.count() == docs.count()
    a = docs.agg(F.sum("doc_id"), F.sum(F.length("text"))).collect()[0]
    b = back.agg(F.sum("doc_id"), F.sum(F.length("text"))).collect()[0]
    assert tuple(a) == tuple(b)
    # (Spark disallows queries referencing ONLY the corrupt column on a
    # raw JSON scan, so check it row-side.)
    assert sum(r["_corrupt_record"] is not None for r in back.collect()) == 0


def test_jsonl_corrupt_lines_survive_not_fail(spark, tmp_path):
    d = tmp_path / "bad"
    d.mkdir()
    (d / "x.jsonl").write_text(
        '{"doc_id": 1, "text": "ok"}\nNOT JSON AT ALL\n{"doc_id": 2}\n'
    )
    back = read_jsonl(spark, str(d), schema="doc_id long, text string")
    rows = {r["doc_id"]: r for r in back.collect()}
    assert rows[1]["text"] == "ok" and rows[1]["_corrupt_record"] is None
    assert rows[2]["text"] is None
    assert rows[None]["_corrupt_record"] == "NOT JSON AT ALL"


def test_jsonl_partition_overwrite_is_idempotent(spark, tmp_path):
    out = str(tmp_path / "j")
    df1 = spark.createDataFrame(
        [(1, "a", "web"), (2, "b", "books")], "doc_id long, text string, source string"
    )
    write_jsonl(df1, out, partition_col="source")
    # re-write ONLY the web partition; books must survive
    df2 = spark.createDataFrame(
        [(9, "z", "web")], "doc_id long, text string, source string"
    )
    write_jsonl(df2, out, partition_col="source")
    back = read_jsonl(
        spark, out, schema="doc_id long, text string, source string"
    )
    got = {(r["doc_id"], r["source"]) for r in back.collect()}
    assert got == {(9, "web"), (2, "books")}


def test_orc_roundtrip_schema_and_pushdown(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "o")
    write_orc(docs, out)
    back = read_orc(spark, out)
    assert back.schema == docs.schema
    assert back.count() == docs.count()
    plan = (
        back.filter(F.col("doc_id") == 7)
        .select("doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # filter reaches the ORC scan, projection prunes to one column
    assert "PushedFilters: [" in plan and "doc_id" in plan
    assert "text" not in plan.split("ReadSchema")[-1]
    assert any(
        f.endswith(".orc") or "part-" in f for f in os.listdir(out)
        if not f.startswith("_")
    )


def _warc_bytes():
    """Two-record WARC: a response with an HTTP envelope and a request."""
    body = b"<html>hello crawl</html>"
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    )
    rec1 = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:uuid:0001>\r\n"
        b"WARC-Date: 2024-03-01T00:00:00Z\r\n"
        b"WARC-Target-URI: http://example.com/a\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        + f"Content-Length: {len(http)}\r\n\r\n".encode()
        + http
        + b"\r\n\r\n"
    )
    req = b"GET /a HTTP/1.1\r\nHost: example.com\r\n\r\n"
    rec2 = (
        b"WARC/1.0\r\n"
        b"WARC-Type: request\r\n"
        b"WARC-Record-ID: <urn:uuid:0002>\r\n"
        b"WARC-Date: 2024-03-01T00:00:00Z\r\n"
        b"WARC-Target-URI: http://example.com/a\r\n"
        b"Content-Type: application/http; msgtype=request\r\n"
        + f"Content-Length: {len(req)}\r\n\r\n".encode()
        + req
        + b"\r\n\r\n"
    )
    return rec1 + rec2, body


def test_read_warc_plain_and_gzip(spark, tmp_path):
    import gzip

    from conte_to_fresco_etl_spark.sources.warc import read_warc

    raw, _ = _warc_bytes()
    (tmp_path / "plain").mkdir()
    (tmp_path / "plain" / "seg-00000.warc").write_bytes(raw)
    # per-record gzip members (the Common-Crawl layout): compress each
    # record separately and concatenate
    half = raw.index(b"WARC/1.0", 1)
    gz = gzip.compress(raw[:half]) + gzip.compress(raw[half:])
    (tmp_path / "gz").mkdir()
    (tmp_path / "gz" / "seg-00000.warc.gz").write_bytes(gz)

    for sub in ("plain", "gz"):
        rows = {
            r["record_id"]: r
            for r in read_warc(spark, str(tmp_path / sub)).collect()
        }
        assert set(rows) == {"<urn:uuid:0001>", "<urn:uuid:0002>"}, sub
        resp = rows["<urn:uuid:0001>"]
        assert resp["warc_type"] == "response"
        assert resp["target_uri"] == "http://example.com/a"
        assert bytes(resp["payload"]).startswith(b"HTTP/1.1 200")


def test_warc_documents_strips_http_envelope(spark, tmp_path):
    from conte_to_fresco_etl_spark.sources.warc import warc_documents

    raw, body = _warc_bytes()
    (tmp_path / "w").mkdir()
    (tmp_path / "w" / "seg.warc").write_bytes(raw)
    docs = warc_documents(spark, str(tmp_path / "w")).collect()
    assert len(docs) == 1  # request record filtered out
    assert docs[0]["status"] == 200
    assert docs[0]["text"] == body.decode()
    assert docs[0]["target_uri"] == "http://example.com/a"


def test_warc_truncated_trailing_record_dropped(spark, tmp_path):
    from conte_to_fresco_etl_spark.sources.warc import (
        parse_warc_records,
    )

    raw, _ = _warc_bytes()
    recs = list(parse_warc_records(raw[: len(raw) - 40]))
    assert len(recs) == 1  # second record truncated -> dropped cleanly
    assert recs[0]["headers"]["warc-type"] == "response"


def test_readme_crawl_pipeline_end_to_end(spark, tmp_path):
    """The README's crawl-to-corpus composition runs verbatim: WARC ->
    HTML -> normalize -> exact dedup -> classifier -> soft sample ->
    splits, with STRING document keys throughout."""
    from conte_to_fresco_etl_spark.operators.dedup import dedup_exact
    from conte_to_fresco_etl_spark.operators.text_analysis import (
        extract_html_text,
        normalize_text,
        quality_classifier,
    )
    from conte_to_fresco_etl_spark.sources.warc import warc_documents
    from conte_to_fresco_etl_spark.validation import (
        assign_splits,
        score_proportional_sample,
    )

    body = (
        b"<html><title>T</title><body><p>the archive holds many careful "
        b"documents about reliable distributed processing</p></body></html>"
    )
    http = b"HTTP/1.1 200 OK\r\n\r\n" + body
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:uuid:1>\r\n"
        b"WARC-Date: 2024-03-01T00:00:00Z\r\n"
        b"WARC-Target-URI: http://example.com/x\r\n"
        + f"Content-Length: {len(http)}\r\n\r\n".encode()
        + http + b"\r\n\r\n"
    )
    (tmp_path / "w").mkdir()
    (tmp_path / "w" / "seg.warc").write_bytes(rec)
    docs = warc_documents(spark, str(tmp_path / "w"))
    docs = extract_html_text(docs)
    docs = normalize_text(docs, id_col="target_uri")
    docs = docs.withColumnRenamed("norm_text", "text")
    docs = dedup_exact(docs)
    scored = quality_classifier(docs, id_col="target_uri")
    kept = score_proportional_sample(scored, "score", "target_uri")
    rows = assign_splits(kept, key_col="target_uri").collect()
    assert len(rows) == 1
    assert rows[0]["split"] in ("train", "val", "test")
    assert rows[0]["score"] > 0.5  # clean prose scores as keepable
