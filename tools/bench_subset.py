#!/usr/bin/env python
"""Bench a subset of declared queries with bench.py's exact methodology
(min-of-2 noop-sink runs, clearCache between runs, sweep_persisted after
each query, adaptive 3rd run on >1.5x disagreement) — the iteration tool
for the optimization rounds, so per-query before/after numbers are
directly comparable to the driver's bench.

Usage: python tools/bench_subset.py q_name [q_name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from conte_to_fresco_etl_spark.session import get_spark, sweep_persisted  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="bench-subset",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    qs = entrymod.queries()
    names = sys.argv[1:]
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    qs["q_minmax_summary"](spark, sf_dir).count()
    spark.range(256).repartition(int(cpus)).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    timings: dict[str, float] = {}
    for name in names:
        runs: list[float] = []
        while len(runs) < 2 or (
            len(runs) == 2 and max(runs) > 1.5 * min(runs)
        ):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(min(runs), 3)
        sweep_persisted(spark)
        print(
            f"# {name}: {timings[name]:.3f}s  (runs: "
            + ", ".join(f"{r:.3f}" for r in runs) + ")",
            file=sys.stderr,
        )
    spark.stop()
    print(json.dumps({"queries": timings,
                      "total": round(sum(timings.values()), 3)}))


if __name__ == "__main__":
    main()
