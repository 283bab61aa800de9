"""Scan-parallelism guard for compute-dense stages.

A small parquet input (one file, one row group) scans as a SINGLE
partition, so a compute-dense downstream stage — Arrow signature
computation, codec decode, per-row scoring — runs on one core no matter
how many the session has.  ``ensure_min_parallelism`` repartitions such
inputs up to the session's default parallelism before the expensive
stage.

Scale posture: at 100 TB inputs arrive as thousands of row groups and
this is a NO-OP (the guard never down-partitions and never touches an
already-parallel scan); locally it is the difference between 1 and 32
cores doing the signature math.  The round-robin shuffle it inserts
moves only the operator's narrow input projection, and only when the
scan was too narrow to use the machine anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, factor: int = 1) -> DataFrame:
    """Repartition ``df`` up to ``defaultParallelism * factor`` when the
    current plan yields fewer partitions; pass through unchanged
    otherwise.  Semantics-neutral for every operator in this package
    (they are row-order independent)."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
