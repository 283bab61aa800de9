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
