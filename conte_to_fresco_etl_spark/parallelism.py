"""Scan-parallelism guard for compute-dense stages.

A small parquet input (one file, one row group) scans as a SINGLE
partition, so a compute-dense downstream stage — Arrow signature
computation, codec decode, per-row scoring — runs on one core no matter
how many the session has.  ``ensure_min_parallelism`` repartitions such
inputs toward the session's default parallelism before the expensive
stage.

The target is COST-AWARE, not unconditional: partitions are sized from
the plan's estimated input bytes via ``bytes_per_task`` — the number of
input bytes whose downstream per-row work roughly fills one task.
Operators whose per-row compute is heavy relative to the bytes read
(md5-per-shingle signatures, codec decodes) pass a small
``bytes_per_task`` so even a 1 MB scan fans out; operators whose per-row
work is a few dozen FLOPs (embedding scoring) keep the default, so tiny
inputs are NOT shuffled for nothing but a multi-GB single-file corpus
still fans out to every core.

Scale posture: at 100 TB inputs arrive as thousands of row groups and
this is a NO-OP (the guard never down-partitions); locally it is the
difference between 1 and 32 cores doing the signature math — measured
1.58s → 0.65s on the minhash signature stage at sf0.1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: Default: one task per 4 MB of input — right for lightweight per-row
#: work (vector scoring, simple projections).
DEFAULT_BYTES_PER_TASK = 4 * 1024 * 1024

#: For compute-dense stages (per-shingle hashing, codec decode): one
#: task per 64 KB of input.
DENSE_BYTES_PER_TASK = 64 * 1024


def ensure_min_parallelism(
    df: DataFrame, bytes_per_task: int = DEFAULT_BYTES_PER_TASK
) -> DataFrame:
    """Repartition ``df`` up to ``min(defaultParallelism,
    est_bytes / bytes_per_task)`` when the current plan yields fewer
    partitions; pass through unchanged otherwise.  Semantics-neutral for
    every operator in this package (they are row-order independent)."""
    sc = df.sparkSession.sparkContext
    # Size from the scan's input files (public API — df.inputFiles()),
    # not queryExecution() stats (private _jdf access, breaks across
    # Spark versions).  inputFiles() returns percent-encoded URIs, so
    # unquote before stat'ing (a space in a path arrives as %20).
    # Non-local URIs we can't stat cheaply count as 0: conservative —
    # the guard only ever fans OUT, never down-partitions, and at
    # remote-storage scale inputs arrive as many splits anyway.
    try:
        import os
        from urllib.parse import unquote, urlparse

        est_bytes = 0
        for uri in df.inputFiles():
            parsed = urlparse(uri)
            if parsed.scheme in ("", "file"):
                try:
                    est_bytes += os.path.getsize(unquote(parsed.path))
                except OSError:
                    pass
    except Exception:  # noqa: BLE001 — stats unavailable: be conservative
        est_bytes = 0
    want = max(1, min(sc.defaultParallelism, est_bytes // bytes_per_task))
    if want > 1 and df.rdd.getNumPartitions() < want:
        return df.repartition(want)
    return df
