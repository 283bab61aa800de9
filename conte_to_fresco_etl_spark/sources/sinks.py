"""Sinks (SURVEY §2.1 S7-S9) with an explicit idempotency contract.

The reference appends to monthly CSVs with read-back dedup
(transform_conte_ts_data.py:1032-1049) and appends daily CSVs via
temp-file+rename (conte-etl-step-2-processor.py:113-221).  Under Spark the
contract becomes: **dropDuplicates + dynamic partition overwrite** — a
re-run of any (year, month) replaces exactly that partition, which
subsumes both the dedup-on-append and the atomic-append semantics
(SURVEY §4 "design decision"; §7.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_monthly_eav(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """S7: monthly FRESCO EAV sink, full-row dedup within month
    (transform:1043), directory-partitioned by ym instead of
    filename-encoded months (SURVEY §1.1)."""
    out = (
        df.withColumn("ym", F.date_format("Timestamp", "yyyy_MM"))
        .dropDuplicates()
        .repartition("ym")
    )
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("ym")
        .format(fmt)
        .option("header", "true")
        .save(path)
    )


def write_daily_set3_csv(df: DataFrame, path: str) -> None:
    """S8: daily set3 CSV sink — day-of-month partitioning replaces the
    reference's split-by-day + temp-file/rename append
    (conte-etl-step-2-processor.py:113-221); the task-commit protocol
    provides the atomicity."""
    (
        df.withColumn("d", F.date_format("time", "yyyy-MM-dd"))
        .repartition("d")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("d")
        .option("header", "true")
        .csv(path)
    )


def write_set3_parquet(df: DataFrame, path: str) -> None:
    """S9: snappy parquet, bounded file size via maxRecordsPerFile
    (reference 1M-row chunks, conte-etl-step-2-manager.py:36;
    ParquetWriter snappy at conte-etl-step-2-processor.py:1800)."""
    (
        df.write.mode("overwrite")
        .option("compression", "snappy")
        .option("maxRecordsPerFile", 1_000_000)
        .parquet(path)
    )
