"""Step-2 join pipeline tests (J1/J2/P4/R1/P6, FIXTURES.md §5-7).

Checks the invariants FIXTURES.md §7 names: one output row per (matching
ts row × matching accounting row) surviving the interval filter; exactly
one non-null value_* per row; start_time <= time <= end_time; strict
22-column schema."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from conte_to_fresco_etl_spark.operators.join import (
    join_ts_jobs,
    pivot_scatter,
    process_month,
)
from conte_to_fresco_etl_spark.schemas import (
    ACCOUNTING_RAW_SCHEMA,
    FRESCO_TS_SCHEMA,
    SET3_SCHEMA,
)


def ts_row(jid, host, event, value, units, t):
    return (jid, host, event, value, units, t)


def make_ts(spark):
    t = dt.datetime
    rows = [
        # inside [start, end] of JOB1
        ts_row("JOB1", "n1", "cpuuser", 75.5, "CPU %", t(2015, 3, 1, 10, 0)),
        ts_row("JOB1", "n1", "memused", 16.2, "GB", t(2015, 3, 1, 10, 0)),
        # outside the interval -> pruned
        ts_row("JOB1", "n1", "cpuuser", 99.0, "CPU %", t(2015, 3, 1, 23, 0)),
        # raw-form id, normalized by J2
        ts_row("jobID2", "n2", "block", 0.5, "GB/s", t(2015, 3, 2, 12, 0)),
        # no matching job
        ts_row("JOB9", "n9", "nfs", 1.0, "MB/s", t(2015, 3, 1, 10, 0)),
    ]
    return spark.createDataFrame(rows, FRESCO_TS_SCHEMA)


def make_jobs(spark):
    def job(jid, user, queue, start, end, walltime, nodect, ncpus,
            exec_host, jobevent, exit_status):
        base = {c: None for c in [f.name for f in ACCOUNTING_RAW_SCHEMA.fields]}
        base.update(
            jobID=jid, user=user, account="acct1", queue=queue,
            qtime="2015-03-01 08:00:00", start=start, end=end,
            group="g", exec_host=exec_host, jobname="jn",
            jobevent=jobevent, Exit_status=exit_status,
        )
        base["Resource_List.walltime"] = walltime
        base["Resource_List.nodect"] = nodect
        base["Resource_List.ncpus"] = ncpus
        base["ctime"] = "2015-03-01 07:00:00"
        base["etime"] = "2015-03-01 08:00:00"
        base["timestamp"] = "2015-03-01 08:00:00"
        return tuple(base[f.name] for f in ACCOUNTING_RAW_SCHEMA.fields)

    rows = [
        # two accounting events for JOB1 (S then E) -> join multiplicity
        job("1.conte-adm", "alice", "standby", "2015-03-01 09:00:00",
            "2015-03-01 11:00:00", "02:00:00", "2", "32",
            "n1/0+n1/1", "S", "0"),
        job("1.conte-adm", "alice", "standby", "2015-03-01 09:00:00",
            "2015-03-01 11:00:00", "02:00:00", "2", "32",
            "n1/0+n1/1", "E", "0"),
        job("2.conte-adm", "bob", "normal", "2015-03-02 11:00:00",
            "2015-03-02 13:00:00", "45:00", "1", "16",
            "n2/0+n3/0", "E", "137"),
    ]
    return spark.createDataFrame(rows, ACCOUNTING_RAW_SCHEMA) \
        .withColumnRenamed("timestamp", "Timestamp")


def test_join_multiplicity_and_interval(spark):
    joined = join_ts_jobs(make_ts(spark), make_jobs(spark))
    # JOB1: 2 in-interval ts rows x 2 accounting rows = 4; JOB2: 1x1; JOB9: 0
    assert joined.count() == 5
    # the out-of-interval cpuuser=99.0 row is pruned
    assert joined.filter(F.col("Value") == 99.0).count() == 0


def test_pivot_scatter_no_collapse(spark):
    out = pivot_scatter(join_ts_jobs(make_ts(spark), make_jobs(spark)))
    rows = out.collect()
    assert len(rows) == 5  # row count unchanged by pivot
    value_cols = [c for c in out.columns if c.startswith("value_")]
    for r in rows:
        non_null = [c for c in value_cols if r[c] is not None]
        assert len(non_null) == 1  # exactly one non-null value_* per row


def test_set3_schema_and_semantics(spark):
    out = process_month(make_ts(spark), make_jobs(spark))
    # names and types must match exactly; nullability may be STRICTER
    # than declared (a provably non-null expression — e.g. exitcode
    # after its fillna('') — still satisfies a nullable field; parquet
    # round-trips it as nullable either way)
    assert [(f.name, f.dataType) for f in out.schema] == [
        (f.name, f.dataType) for f in SET3_SCHEMA
    ]
    for got, want in zip(out.schema, SET3_SCHEMA):
        assert want.nullable or not got.nullable
    rows = out.collect()
    assert len(rows) == 5
    for r in rows:
        assert r["start_time"] <= r["time"] <= r["end_time"]
    j1 = [r for r in rows if r["jid"] == "JOB1"]
    assert {r["exitcode"] for r in j1} == {"STARTED", "COMPLETED"}
    assert j1[0]["timelimit"] == 7200.0
    assert j1[0]["nhosts"] == 2.0
    assert j1[0]["ncores"] == 32.0
    assert j1[0]["host_list"] == "{n1}"
    assert j1[0]["username"] == "alice"
    j2 = [r for r in rows if r["jid"] == "JOB2"][0]
    assert j2["exitcode"] == "FAILED:137"
    assert j2["timelimit"] == 2700.0
    assert j2["host_list"] == "{n2,n3}"
    assert j2["value_block"] == 0.5
    assert j2["unit"] == "GB/s"


def test_set3_broadcast_plan(spark):
    """The jobs side must broadcast (SURVEY §4: BroadcastHashJoin)."""
    plan = process_month(make_ts(spark), make_jobs(spark)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
