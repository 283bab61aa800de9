"""Bucketed-table storage: the shuffle-free co-located join path.

SCALE.md's dedup/similarity/join postures repeatedly defer to "a
bucketed sort-merge join in production" — this module is that path
made concrete instead of prose.  ``write_bucketed`` persists a
DataFrame hash-bucketed (and optionally sorted) by the join/agg key
via ``bucketBy``/``saveAsTable``; any later equi-join or groupBy on
that key consumes the stored ``hashpartitioning`` directly, so the
plan contains NO Exchange on the bucketed side — at 100 TB that is
the difference between re-shuffling the fact table on every run and
shuffling it exactly once at ingest.

Works against the session's catalog (in-memory catalog + local
warehouse dir in tests; Hive/Glue metastore on a cluster — the API is
identical).  ``tests/test_bucketed.py`` pins the contract with plan
assertions: bucketed-bucketed equi-join and bucketed groupBy both run
exchange-free and match the plain-shuffle results row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def suggest_buckets(
    df: DataFrame,
    bytes_per_bucket: int = 32 * 1024 * 1024,
    lo: int = 8,
    hi: int = 4096,
) -> int:
    """Scale-adaptive bucket count from the plan's scan bytes:
    ``clamp(input_bytes / bytes_per_bucket, lo, hi)``.

    A FIXED count is wrong at both ends (r14, measured): 8 buckets
    capped the sf10 posting self-join at 8 tasks — 25–58s vs 13s at 32
    buckets on local[32] — while an input-sized count would explode the
    file count for small tables.  Co-joined tables must share ONE
    count (Spark only drops the exchange when the bucket specs agree):
    compute it from the LARGER side and pass it to both writes.
    Derived tables whose size is a known expansion of the scanned
    input (e.g. shingle postings) pass a proportionally smaller
    ``bytes_per_bucket``."""
    from conte_to_fresco_etl_spark.parallelism import estimate_input_bytes

    est = estimate_input_bytes(df)
    return max(lo, min(hi, int(est // max(1, bytes_per_bucket))))


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table hash-bucketed by ``key``.

    ``n_buckets`` fixes the layout's parallelism: pick it once per
    dataset so every co-bucketed table agrees (Spark only removes the
    exchange when BOTH sides share the bucket spec).  ``sort=True``
    additionally sorts within buckets, which upgrades the join to a
    sort-free SortMergeJoin (the stored order satisfies the join's
    sort requirement on 3.4+ when bucket counts match).
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a saved (bucketed) table back through the catalog — the
    bucket spec only survives a catalog read; ``spark.read.parquet``
    on the files would silently drop it and re-shuffle downstream."""
    return spark.table(table)


def ensure_bucketed(
    df: DataFrame,
    base: str,
    key: str | list[str],
    n_buckets: int = 8,
    token: str = "",
) -> DataFrame:
    """Write-once-per-session bucketed staging: derive a table name
    unique to (``base``, ``token``, this session's applicationId),
    write ``df`` bucketed by ``key`` only if the table is absent, and
    read it back through the catalog.

    The applicationId suffix means concurrent sessions sharing a
    warehouse dir never race on one location (the tfidf bucket-table
    discipline); ``token`` distinguishes different inputs under one
    base name (callers pass a hash of the source path).  At 100 TB
    this is the "shuffle the fact table exactly once at ingest" path:
    the write pays the key shuffle once and every downstream join or
    aggregation on ``key`` consumes the stored layout exchange-free."""
    import re

    spark = df.sparkSession
    app = re.sub(r"[^0-9A-Za-z]", "_", spark.sparkContext.applicationId)
    tok = re.sub(r"[^0-9A-Za-z]", "_", token)
    # the bucket count is part of the layout identity: a caller that
    # derives a different count (suggest_buckets on changed input) must
    # get a fresh table, never a silently mis-bucketed reuse
    base = f"{base}_b{n_buckets}"
    tbl = f"{base}_{tok}_{app}" if tok else f"{base}_{app}"
    if not spark.catalog.tableExists(tbl):
        write_bucketed(df, tbl, key, n_buckets=n_buckets)
    return read_table(spark, tbl)
