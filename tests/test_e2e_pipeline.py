"""End-to-end pipeline test: dirty fixture CSVs → step-1 transforms →
monthly EAV parquet → month discovery → step-2 broadcast-interval join →
daily CSV + set3 parquet sinks.

Mirrors the reference's full E1→E3 lifecycle (SURVEY §3) including the
drop/clamp/multiplicity semantics that make the dataflow non-trivial:
bad timestamps and null jobIDs dropped (P2/P3), divide-by-zero → 0.0
(F1), MemFree>MemTotal clamped (F6), Δt=0 floored (W1), accounting
multiplicity preserved through the join (J1, SURVEY §7.3), garbage
walltime → null timelimit (F10).
"""

from __future__ import annotations

import glob
import os
import shutil

import pytest

from conte_to_fresco_etl_spark.operators.join import process_month
from conte_to_fresco_etl_spark.operators.transforms import transform_folder
from conte_to_fresco_etl_spark.schemas import (
    BLOCK_RAW_SCHEMA,
    CPU_RAW_SCHEMA,
    LLITE_RAW_SCHEMA,
    MEM_RAW_SCHEMA,
)
from conte_to_fresco_etl_spark.sources.readers import (
    discover_months,
    read_accounting_csv,
    read_fresco_ts,
    read_raw_csv,
)
from conte_to_fresco_etl_spark.sources.sinks import (
    write_daily_set3_csv,
    write_monthly_eav,
    write_set3_parquet,
)

ACCT_HEADER = (
    "jobID,ctime,qtime,etime,start,end,Resource_List.walltime,"
    "Resource_List.nodect,Resource_List.ncpus,account,queue,jobname,"
    "user,group,exec_host,jobevent,Exit_status"
)
ACCT_COMMON = (
    "100001.conte-adm,03/01/2015 09:00:00,03/01/2015 09:00:00,"
    "03/01/2015 09:30:00,03/01/2015 09:55:00,03/01/2015 10:05:00"
)


@pytest.fixture(scope="module")
def fixture_dirs(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    raw = tmp / "raw"
    raw.mkdir()
    (raw / "block.csv").write_text(
        "jobID,node,timestamp,rd_sectors,wr_sectors,rd_ticks,wr_ticks\n"
        "jobID100001,conte-a084,03/01/2015 10:00:00,1000,2000,10,20\n"
        "jobID100001,conte-a084,03/01/2015 10:10:00,1500,2500,0,0\n"  # /0→0.0
        "jobID100002,conte-a085,NOT_A_DATE,1,1,1,1\n"  # bad ts → dropped
        ",conte-a085,03/01/2015 10:00:00,1,1,1,1\n"  # null jobID → dropped
    )
    (raw / "cpu.csv").write_text(
        "jobID,node,timestamp,user,nice,system,idle,iowait,irq,softirq\n"
        "jobID100001,conte-a084,03/01/2015 10:00:00,50,5,10,30,3,1,1\n"
        "jobID100001,conte-a084,03/01/2015 10:10:00,0,0,0,0,0,0,0\n"  # total=0→0.0
    )
    (raw / "mem.csv").write_text(
        "jobID,node,timestamp,MemTotal,MemFree,FilePages\n"
        "jobID100001,conte-a084,03/01/2015 10:00:00,"
        "34359738368,17179869184,1073741824\n"
        # MemFree > MemTotal → clamped to MemTotal → memused 0
        "jobID100001,conte-a084,03/01/2015 10:10:00,"
        "34359738368,68719476736,1073741824\n"
    )
    (raw / "llite.csv").write_text(
        "jobID,node,timestamp,read_bytes,write_bytes\n"
        # shuffled order; duplicate timestamp (Δt=0 floor) + counter reset
        "jobID100001,conte-a084,03/01/2015 10:10:00,2097152,2097152\n"
        "jobID100001,conte-a084,03/01/2015 10:00:00,1048576,1048576\n"
        "jobID100001,conte-a084,03/01/2015 10:10:00,1048576,1048576\n"
    )
    acct = tmp / "acct"
    acct.mkdir()
    (acct / "2015-03.csv").write_text(
        ACCT_HEADER + "\n"
        # E row: interval [09:55,10:05] keeps only the 10:00 ts rows
        + ACCT_COMMON
        + ",01:00:00,1,16,acct1,standby,myjob,alice,grp,"
        "conte-a084/0+conte-a084/1+conte-a085/0,E,0\n"
        # Q row for the same job: garbage walltime + join multiplicity
        + ACCT_COMMON
        + ",GARBAGE,1,16,acct1,standby,myjob,alice,grp,conte-a084/0,Q,\n"
    )
    yield tmp, str(raw), str(acct)


def test_e2e_pipeline(spark, fixture_dirs):
    tmp, raw, acct_dir = fixture_dirs

    frames = {
        "block": read_raw_csv(spark, f"{raw}/block.csv", BLOCK_RAW_SCHEMA),
        "cpu": read_raw_csv(spark, f"{raw}/cpu.csv", CPU_RAW_SCHEMA),
        "mem": read_raw_csv(spark, f"{raw}/mem.csv", MEM_RAW_SCHEMA),
        "llite": read_raw_csv(spark, f"{raw}/llite.csv", LLITE_RAW_SCHEMA),
    }
    eav = transform_folder(frames)
    # block 2 + cpu 2 + mem 2×2 events + nfs 3 = 11 (2 dirty rows dropped)
    assert eav.count() == 11

    monthly = str(tmp / "monthly")
    write_monthly_eav(eav, monthly)
    parts = glob.glob(f"{monthly}/ym=2015_03/*.parquet")
    assert parts

    ts_dir = str(tmp / "ts")
    os.makedirs(ts_dir, exist_ok=True)
    for i, p in enumerate(parts):
        shutil.copy(p, f"{ts_dir}/FRESCO_Conte_ts_2015_03_v1_chunk{i:03d}.parquet")

    months = discover_months(ts_dir, acct_dir)
    assert [(m.year, m.month) for m in months] == [("2015", "03")]

    ts = read_fresco_ts(spark, list(months[0].ts_files))
    jobs = read_accounting_csv(spark, months[0].accounting_file)
    set3 = process_month(ts, jobs)

    plan = set3._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan

    rows = set3.collect()
    # 5 EAV rows at 10:00 inside [09:55,10:05] × 2 accounting rows (E,Q)
    assert len(rows) == 10
    value_cols = [c for c in set3.columns if c.startswith("value_")]
    for r in rows:
        non_null = [c for c in value_cols if r[c] is not None]
        assert len(non_null) == 1  # pivot-without-collapse (R1)
        assert r["start_time"] <= r["time"] <= r["end_time"]  # P4
        assert r["jid"] == "JOB100001"
        assert r["host_list"] in ("{conte-a084,conte-a085}", "{conte-a084}")
    assert {r["exitcode"] for r in rows} == {"COMPLETED", "QUEUED"}
    assert {r["timelimit"] for r in rows} == {3600.0, None}

    out_csv, out_pq = str(tmp / "daily"), str(tmp / "set3")
    write_daily_set3_csv(set3, out_csv)
    write_set3_parquet(set3, out_pq)
    days = sorted(os.path.basename(d) for d in glob.glob(f"{out_csv}/d=*"))
    assert days == ["d=2015-03-01"]
    assert glob.glob(f"{out_pq}/*.parquet")


def test_encoding_fallback_reproduces_reference_latin1(spark, tmp_path):
    """S1 encoding posture (transform_conte_ts_data.py:62-122): the
    reference tries latin1 FIRST and latin1 decodes every byte sequence,
    so in practice the reference ALWAYS reads latin1 — genuine UTF-8
    multibyte input gets mojibaked ('café' → 'cafÃ©').  These bytes
    decode differently under latin1 vs utf-8; the engine must reproduce
    the reference's (latin1) reading for both kinds of file."""
    import pandas as pd

    utf8_name = "caf\u00e9".encode("utf-8")      # b'caf\xc3\xa9'
    latin1_name = "caf\u00e9".encode("latin-1")  # b'caf\xe9'
    p = tmp_path / "enc.csv"
    p.write_bytes(
        b"jobID,node,timestamp,rd_sectors,wr_sectors,rd_ticks,wr_ticks\n"
        b"jobID1," + utf8_name + b",03/01/2015 10:00:00,1,1,1,1\n"
        b"jobID2," + latin1_name + b",03/01/2015 10:00:00,1,1,1,1\n"
    )
    got = {
        r["jobID"]: r["node"]
        for r in read_raw_csv(spark, str(p), BLOCK_RAW_SCHEMA).collect()
    }
    # independent reference twin: pandas with the reference's chain
    # (latin1 wins on attempt 1 for any input)
    ref = pd.read_csv(p, encoding="latin1")
    want = dict(zip(ref["jobID"], ref["node"]))
    assert got == want
    assert got["jobID1"] == utf8_name.decode("latin-1")   # 'cafÃ©' mojibake
    assert got["jobID2"] == latin1_name.decode("latin-1")  # 'café' correct


def test_set3_sink_roundtrip_nonlocal_scheme(spark, tmp_path):
    """S6: the sinks/readers are scheme-agnostic Hadoop FS clients — a
    `viewfs://` mount (a real non-file:// scheme resolved through
    Hadoop's FileSystem layer, here mounted onto a local dir) must
    round-trip write_set3_parquet → read_fresco_ts bit-exactly.  This is
    the same resolution path an `s3a://` URI takes (scheme → FS impl →
    committer); retry/atomicity posture is the committer's
    (task-attempt commit + job commit), not hand-rolled."""
    mnt = tmp_path / "mnt"
    mnt.mkdir()
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hconf.set("fs.viewfs.mounttable.s6test.link./out", f"file://{mnt}")
    df = spark.range(50).selectExpr("id", "cast(id * 2 as double) as v")
    write_set3_parquet(df, "viewfs://s6test/out/set3")
    assert glob.glob(f"{mnt}/set3/*.parquet")  # landed on the mount target
    back = read_fresco_ts(spark, "viewfs://s6test/out/set3")
    assert sorted(r["id"] for r in back.collect()) == list(range(50))
    assert back.filter("v != id * 2").count() == 0


def test_accounting_reader_binds_by_name(spark, fixture_dirs):
    """Column binding must be header-name-based (pandas semantics), not
    positional: the fixture's column order differs from
    ACCOUNTING_RAW_SCHEMA field order."""
    _, _, acct_dir = fixture_dirs
    jobs = read_accounting_csv(spark, f"{acct_dir}/2015-03.csv")
    first = jobs.first()
    assert first["user"] == "alice"
    assert first["queue"] == "standby"
    assert first["start"] == "03/01/2015 09:55:00"
    # column absent from the file arrives as typed null, not misbound data
    assert first["Timestamp"] is None


def test_cli_step1_step2_and_query(spark, fixture_dirs, tmp_path, capsys):
    """The __main__ CLI drives the whole pipeline and the catalog with
    the same results as the library calls (main() invoked in-process —
    get_spark reuses the active test session)."""
    from conte_to_fresco_etl_spark.__main__ import main

    _tmp, raw, _acct = fixture_dirs
    eav = str(tmp_path / "cli_eav")
    assert main(["step1", "--raw-dir", str(raw), "--out", eav]) == 0
    out = spark.read.parquet(eav)
    assert out.count() > 0

    assert main(["list"]) == 0
    listed = capsys.readouterr().out
    assert "q1_pricing_summary\toracle" in listed

    assert (
        main(
            [
                "query", "q_minmax_summary",
                "--sf-dir", "/root/testdata/sf0.001", "--limit", "5",
            ]
        )
        == 0
    )
    shown = capsys.readouterr().out
    assert "min_price" in shown or "l_returnflag" in shown or "+" in shown

    assert main(["query", "no_such_query", "--sf-dir", "x"]) == 2
