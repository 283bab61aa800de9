"""Compatibility-shim tests: version retention + ready-signal protocol
(reference transform_conte_ts_data.py:842-869;
utils/ready_signal_creator.py:15-351)."""

from __future__ import annotations

import glob
import json
import os

from conte_to_fresco_etl_spark.sources.compat import (
    JobStatus,
    ReadySignalShim,
    VersionManager,
    write_set3_parquet_versioned,
)


def test_version_manager_roundtrip(tmp_path):
    vm = VersionManager(str(tmp_path))
    assert vm.current_version() == "v1"
    vm.increment_version()
    assert vm.current_version() == "v2"
    # reload from disk — reference-format json
    with open(tmp_path / "version_info.json") as f:
        info = json.load(f)
    assert info == {"current_version": 2, "uploaded_versions": [1]}
    vm2 = VersionManager(str(tmp_path))
    assert vm2.current_version() == "v2"


def test_versioned_sink_retains_prior_versions(spark, tmp_path):
    df = spark.range(10).selectExpr("id", "id * 2 as v")
    d1 = write_set3_parquet_versioned(df, str(tmp_path), prefix="set3")
    d2 = write_set3_parquet_versioned(df, str(tmp_path), prefix="set3")
    assert os.path.basename(d1) == "set3_v1"
    assert os.path.basename(d2) == "set3_v2"
    # v1 is RETAINED after the v2 re-process (unlike the default
    # overwrite contract), and both read back independently
    assert glob.glob(f"{d1}/*.parquet") and glob.glob(f"{d2}/*.parquet")
    assert spark.read.parquet(d1).count() == 10
    assert spark.read.parquet(d2).count() == 10


def test_empty_compat_parquet_schema(spark, tmp_path):
    from conte_to_fresco_etl_spark.schemas import SET3_SCHEMA
    from conte_to_fresco_etl_spark.sources.compat import (
        write_empty_compat_parquet,
    )

    out = str(tmp_path / "compat")
    write_empty_compat_parquet(spark, out)
    back = spark.read.parquet(out)
    assert back.count() == 0
    assert back.schema == SET3_SCHEMA  # schema readable from zero rows


def test_ready_signal_precedence_and_listing(tmp_path):
    shim = ReadySignalShim(str(tmp_path / "ready"))
    assert shim.check_status("2015", "3") == JobStatus.UNKNOWN
    shim.create_signal("2015", "3", JobStatus.READY)
    # single-digit month zero-pads like the reference (:118-120)
    assert os.path.exists(tmp_path / "ready" / "2015-03.ready")
    assert shim.is_ready("2015", "03")
    assert shim.list_ready() == [("2015", "03")]
    # processing masks ready; complete masks both (precedence :250-276)
    shim.create_signal("2015", "03", JobStatus.PROCESSING)
    assert shim.check_status("2015", "03") == JobStatus.PROCESSING
    assert shim.list_ready() == []
    shim.create_signal("2015", "03", JobStatus.COMPLETE, "done")
    assert shim.check_status("2015", "03") == JobStatus.COMPLETE
    # an unrelated ready month still lists
    shim.create_signal("2015", "04", JobStatus.READY)
    assert shim.list_ready() == [("2015", "04")]
