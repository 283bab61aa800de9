#!/usr/bin/env python
"""Decompose the per-query fixed-cost floor (optimization r14, guide §1).

For each named query (default: a 16-query floor-bound sample spanning the
catalogs) this times, separately:

- ``build_s``  — calling the query fn (plan construction: py4j round
  trips + eager per-transformation analysis),
- ``plan_s``   — forcing physical planning (``executedPlan``) on the
  built DataFrame (analyzer/optimizer/planner time, no execution),
- ``exec_s``   — the noop-sink write on the ALREADY-planned DataFrame
  (AQE re-plans internally; this is job scheduling + task run time),
- ``rebuild_exec_s`` — a fresh build + noop write end to end (what
  bench.py times per run),
- ``jobs``     — Spark jobs launched by the exec step.

Also probes primitive costs on this session: spark.read with memoized
schema, a trivial 1-exchange aggregate, a 0-exchange projection scan.

Usage: python tools/floor_probe.py [out.json] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from conte_to_fresco_etl_spark.session import get_spark, sweep_persisted  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402

DEFAULT_SAMPLE = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q10_returned_items",
    "q_token_pmi",
    "q_info_gain",
    "q_yule_k",
    "q_zipf_slope",
    "q_window_rate",
    "q_zorder_key",
    "q_wilcoxon",
    "q_winsorize",
    "q_covariate_balance",
    "q_granger",
    "q_lang_confusion",
    "q_negative_samples",
    "q_embedding_outliers",
]


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/floor_probe.json"
    names = sys.argv[2:] or DEFAULT_SAMPLE

    spark = get_spark(
        app_name="floor-probe",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    sc = spark.sparkContext
    qs = entrymod.queries()

    # warmup (mirrors bench.py)
    qs["q_minmax_summary"](spark, sf_dir).count()
    spark.range(256).repartition(int(cpus)).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    # ---- primitive probes ------------------------------------------------
    prim: dict[str, float] = {}
    from conte_to_fresco_etl_spark.plans.catalog import _t

    for label, fn in [
        ("read_t_region", lambda: _t(spark, sf_dir, "region")),
        ("read_t_lineitem", lambda: _t(spark, sf_dir, "lineitem")),
    ]:
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        prim[label] = round(min(ts), 4)

    region = _t(spark, sf_dir, "region")
    lineitem = _t(spark, sf_dir, "lineitem")
    from pyspark.sql import functions as F

    for label, build in [
        ("scan_only_region", lambda: region.select("r_regionkey")),
        ("scan_only_lineitem", lambda: lineitem.select("l_orderkey")),
        ("agg1x_region", lambda: region.groupBy().count()),
        ("agg1x_lineitem_key", lambda: lineitem.groupBy("l_orderkey").count()),
        (
            "agg2x_lineitem",
            lambda: lineitem.groupBy("l_orderkey")
            .count()
            .groupBy("count")
            .count(),
        ),
    ]:
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            _noop(build())
            ts.append(time.perf_counter() - t0)
        prim[label] = round(min(ts), 4)

    # ---- per-query decomposition ----------------------------------------
    rows: dict[str, dict] = {}
    for name in names:
        spark.catalog.clearCache()
        rec: dict = {}
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        rec["build_s"] = round(time.perf_counter() - t0, 4)
        t0 = time.perf_counter()
        df._jdf.queryExecution().executedPlan()
        rec["plan_s"] = round(time.perf_counter() - t0, 4)
        store = sc._jsc.sc().statusStore()
        jobs_before = store.jobsList(None).size()
        t0 = time.perf_counter()
        _noop(df)
        rec["exec_s"] = round(time.perf_counter() - t0, 4)
        rec["jobs"] = store.jobsList(None).size() - jobs_before
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        _noop(qs[name](spark, sf_dir))
        rec["rebuild_exec_s"] = round(time.perf_counter() - t0, 4)
        sweep_persisted(spark)
        rows[name] = rec
        print(f"# {name}: {rec}", file=sys.stderr)

    out = {"primitives": prim, "queries": rows, "cpus": cpus, "sf_dir": sf_dir}
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps(out["primitives"]))
    spark.stop()


if __name__ == "__main__":
    main()
