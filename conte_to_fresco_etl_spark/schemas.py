"""Declared StructTypes for every table shape the engine touches.

The reference is dynamically typed at read, schema-enforced at write
(SURVEY §1.2).  We instead declare schemas up front: permissive CSV reads
against an explicit StructType (null-on-error casts reproduce pandas'
``errors='coerce'``), strict StructType on every sink.

Shapes (with reference provenance):
  * raw step-1 inputs   — FIXTURES.md §1-4; required-column lists at
    transform_conte_ts_data.py:226,328,432,556
  * FRESCO ts (EAV)     — transform_conte_ts_data.py:285-292;
    utils/upload_tester.py:17-34
  * job accounting      — conte-etl-step-2-processor.py:690-694,1219-1221
  * set3 wide output    — conte-etl-step-2-processor.py:1382-1405
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Raw step-1 CSV inputs.  Counters are read as long (they are integer jiffies
# / sectors / bytes in the raw TACC_Stats dumps); timestamps stay string and
# are parsed null-on-error downstream (F8, transform_conte_ts_data.py:267).
# ---------------------------------------------------------------------------

def _raw(cols: list[tuple[str, T.DataType]]) -> T.StructType:
    base = [
        T.StructField("jobID", T.StringType()),
        T.StructField("node", T.StringType()),
        T.StructField("timestamp", T.StringType()),
    ]
    return T.StructType(base + [T.StructField(n, t) for n, t in cols])


BLOCK_RAW_SCHEMA = _raw(
    [
        ("rd_sectors", T.LongType()),
        ("wr_sectors", T.LongType()),
        ("rd_ticks", T.LongType()),
        ("wr_ticks", T.LongType()),
    ]
)

CPU_RAW_SCHEMA = _raw(
    [
        ("user", T.LongType()),
        ("nice", T.LongType()),
        ("system", T.LongType()),
        ("idle", T.LongType()),
        ("iowait", T.LongType()),
        ("irq", T.LongType()),
        ("softirq", T.LongType()),
    ]
)

MEM_RAW_SCHEMA = _raw(
    [
        ("MemTotal", T.LongType()),
        ("MemFree", T.LongType()),
        ("FilePages", T.LongType()),
    ]
)

LLITE_RAW_SCHEMA = _raw(
    [
        ("read_bytes", T.LongType()),
        ("write_bytes", T.LongType()),
    ]
)

# ---------------------------------------------------------------------------
# FRESCO time-series (EAV) — one row per (job, host, event, timestamp) with a
# single Value + Units (transform_conte_ts_data.py:285-292).
# ---------------------------------------------------------------------------

FRESCO_TS_SCHEMA = T.StructType(
    [
        T.StructField("Job Id", T.StringType()),
        T.StructField("Host", T.StringType()),
        T.StructField("Event", T.StringType()),
        T.StructField("Value", T.DoubleType()),
        T.StructField("Units", T.StringType()),
        T.StructField("Timestamp", T.TimestampType()),
    ]
)

#: Known metric events that become ``value_<event>`` columns in set3
#: (conte-etl-step-2-processor.py:804-833; gpu_usage accepted at :814).
KNOWN_EVENTS = [
    "cpuuser",
    "gpu_usage",
    "memused",
    "memused_minus_diskcache",
    "nfs",
    "block",
]

EVENT_UNITS = {
    "block": "GB/s",
    "cpuuser": "CPU %",
    "memused": "GB",
    "memused_minus_diskcache": "GB",
    "nfs": "MB/s",
    "gpu_usage": "%",
}

# ---------------------------------------------------------------------------
# Job accounting CSV — read all-string then cast (S2,
# conte-etl-step-2-processor.py:1196-1302).  Dotted PBS names are quoted in
# column references; keep them verbatim for parity.
# ---------------------------------------------------------------------------

ACCOUNTING_COLUMNS = [
    "jobID",
    "user",
    "account",
    "queue",
    "ctime",
    "qtime",
    "etime",
    "start",
    "end",
    "timestamp",
    "Resource_List.walltime",
    "Resource_List.nodect",
    "Resource_List.ncpus",
    "group",
    "exec_host",
    "jobname",
    "jobevent",
    "Exit_status",
]

ACCOUNTING_RAW_SCHEMA = T.StructType(
    [T.StructField(c, T.StringType()) for c in ACCOUNTING_COLUMNS]
)

#: Datetime columns cast null-on-error (conte-etl-step-2-processor.py:1219-1221).
ACCOUNTING_DATETIME_COLS = ["ctime", "qtime", "etime", "start", "end", "Timestamp"]

# ---------------------------------------------------------------------------
# set3 wide output — 22 fixed columns, exact types per
# conte-etl-step-2-processor.py:1382-1405 (timestamp[UTC] x4, double x9,
# string x9).
# ---------------------------------------------------------------------------

SET3_COLUMNS: list[tuple[str, T.DataType]] = [
    ("time", T.TimestampType()),
    ("submit_time", T.TimestampType()),
    ("start_time", T.TimestampType()),
    ("end_time", T.TimestampType()),
    ("timelimit", T.DoubleType()),
    ("nhosts", T.DoubleType()),
    ("ncores", T.DoubleType()),
    ("account", T.StringType()),
    ("queue", T.StringType()),
    ("host", T.StringType()),
    ("jid", T.StringType()),
    ("unit", T.StringType()),
    ("jobname", T.StringType()),
    ("exitcode", T.StringType()),
    ("host_list", T.StringType()),
    ("username", T.StringType()),
    ("value_cpuuser", T.DoubleType()),
    ("value_gpu_usage", T.DoubleType()),
    ("value_memused", T.DoubleType()),
    ("value_memused_minus_diskcache", T.DoubleType()),
    ("value_nfs", T.DoubleType()),
    ("value_block", T.DoubleType()),
]

SET3_SCHEMA = T.StructType([T.StructField(n, t) for n, t in SET3_COLUMNS])

# ---------------------------------------------------------------------------
# Multimodal document schema — opaque binary payload + typed metadata.  The
# reference has no media path; this is the engine's extension surface for
# training-data pipelines (image/audio/video as binary columns).
# ---------------------------------------------------------------------------

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)
