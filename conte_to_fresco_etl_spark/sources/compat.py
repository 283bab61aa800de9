"""Opt-in compatibility shims for mixed deployments (SURVEY §2.10
"optional compatibility shim" rows).

The engine's own contract replaces both mechanisms — partition
overwrite gives idempotent re-runs (sources/sinks.py:1-11) and the
streaming file source replaces the signal-file handshake
(streaming/pipeline.py) — but a deployment migrating incrementally may
run this engine NEXT TO the reference's manager/processor daemons.
These shims speak the reference's on-disk protocols exactly:

  * ``VersionManager`` — ``version_info.json`` version counter
    (transform_conte_ts_data.py:842-869): re-processing bumps ``_v2``,
    ``_v3``, ... and RETAINS prior versions instead of overwriting.
  * ``write_set3_parquet_versioned`` — the S9 sink wrapped in version
    retention: each call lands in a fresh ``<prefix>_v<N>`` directory.
  * ``ReadySignalShim`` — ``YYYY-MM.{ready,processing,complete,failed}``
    signal files (utils/ready_signal_creator.py:15-21 states, :85-248
    create, :250-276 precedence, :330-351 list-ready).
  * ``write_empty_compat_parquet`` — the zero-row set3-schema parquet
    the reference emits so parquet-expecting downstream workflows keep
    resolving after the CSV outputs became primary
    (conte-etl-step-2-processor.py:1798-1804).

The reference's remaining failure artifact — backup-file-before-append
(conte-etl-step-2-processor.py:156-221) — deliberately has NO analogue:
its purpose was crash recovery for in-place CSV appends, which the
task-commit + dynamic-partition-overwrite contract makes unreachable (a
failed job leaves prior partition contents untouched).

Driver-side file manipulation only — nothing here touches the plan or
executors, so there is no scale impact; at 100 TB these remain O(1)
metadata operations per month.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from enum import Enum

from pyspark.sql import DataFrame

from conte_to_fresco_etl_spark.sources.sinks import write_set3_parquet


class VersionManager:
    """Reference-format ``version_info.json`` counter
    (transform_conte_ts_data.py:842-869): ``current_version`` plus the
    list of already-uploaded versions.  File format is byte-compatible
    so the reference's uploader can read state written here."""

    def __init__(self, base_dir: str):
        self.base_dir = base_dir
        self.version_file = os.path.join(base_dir, "version_info.json")
        if os.path.exists(self.version_file):
            with open(self.version_file) as f:
                self.version_info = json.load(f)
        else:
            self.version_info = {"current_version": 1, "uploaded_versions": []}
            self._save()

    def _save(self) -> None:
        os.makedirs(self.base_dir, exist_ok=True)
        with open(self.version_file, "w") as f:
            json.dump(self.version_info, f)

    def current_version(self) -> str:
        return f"v{self.version_info['current_version']}"

    def increment_version(self) -> None:
        self.version_info["uploaded_versions"].append(
            self.version_info["current_version"]
        )
        self.version_info["current_version"] += 1
        self._save()


def write_set3_parquet_versioned(
    df: DataFrame, base_dir: str, prefix: str = "set3"
) -> str:
    """S9 sink with the reference's version-retention behavior: each
    call writes ``<base_dir>/<prefix>_v<N>`` for the manager's current
    version and bumps the counter, leaving prior versions on disk (the
    engine's default sink overwrites in place instead — SURVEY §4).
    Returns the directory written."""
    vm = VersionManager(base_dir)
    out = os.path.join(base_dir, f"{prefix}_{vm.current_version()}")
    write_set3_parquet(df, out)
    vm.increment_version()
    return out


def write_empty_compat_parquet(spark, path: str) -> None:
    """Zero-row snappy parquet with the full set3 schema
    (conte-etl-step-2-processor.py:1798-1804): satisfies downstream
    consumers that existence-check or schema-read the legacy parquet
    output even when the CSVs carry the data."""
    from conte_to_fresco_etl_spark.schemas import SET3_SCHEMA

    spark.createDataFrame([], SET3_SCHEMA).write.mode("overwrite").option(
        "compression", "snappy"
    ).parquet(path)


class JobStatus(Enum):
    """Signal states, values matching the reference's file suffixes
    (utils/ready_signal_creator.py:15-21)."""

    UNKNOWN = "unknown"
    READY = "ready"
    PROCESSING = "processing"
    COMPLETE = "complete"
    FAILED = "failed"


#: check_status precedence (ready_signal_creator.py:250-276): a month
#: can carry several signal files; the most-final state wins.
_PRECEDENCE = [
    JobStatus.COMPLETE,
    JobStatus.FAILED,
    JobStatus.PROCESSING,
    JobStatus.READY,
]


@dataclass(frozen=True)
class ReadySignalShim:
    """File-protocol twin of the reference's ReadySignalManager for
    deployments where this engine processes months that the reference's
    manager stages (or vice versa)."""

    ready_dir: str

    def _path(self, year: str, month: str, status: JobStatus) -> str:
        return os.path.join(
            self.ready_dir, f"{year}-{month.zfill(2)}.{status.value}"
        )

    def create_signal(
        self, year: str, month: str, status: JobStatus, message: str = ""
    ) -> str:
        os.makedirs(self.ready_dir, exist_ok=True)
        p = self._path(year, month, status)
        with open(p, "w") as f:
            f.write(message)
        return p

    def check_status(self, year: str, month: str) -> JobStatus:
        for status in _PRECEDENCE:
            if os.path.exists(self._path(year, month, status)):
                return status
        return JobStatus.UNKNOWN

    def is_ready(self, year: str, month: str) -> bool:
        return self.check_status(year, month) == JobStatus.READY

    def list_ready(self) -> list[tuple[str, str]]:
        """(year, month) pairs whose effective status is READY."""
        if not os.path.isdir(self.ready_dir):
            return []
        seen: set[tuple[str, str]] = set()
        for name in sorted(os.listdir(self.ready_dir)):
            base, dot, suffix = name.rpartition(".")
            if dot and suffix == JobStatus.READY.value and "-" in base:
                y, _, m = base.partition("-")
                seen.add((y, m))
        return sorted(ym for ym in seen if self.is_ready(*ym))
