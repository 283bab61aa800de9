"""Command-line entry point: ``python -m conte_to_fresco_etl_spark``.

The reference ships shell-invoked daemons (transform_conte_ts_data.py,
conte-etl-step-2-manager.py); this CLI is their operational surface on
Spark — plus direct access to the declared query catalog, so a user of
the reference can run both the pipeline AND ad-hoc queries from one
binary:

    python -m conte_to_fresco_etl_spark step1 --raw-dir D --out O
    python -m conte_to_fresco_etl_spark step2 --ts-dir T --acct-dir A \\
        --out-parquet P [--out-csv C]
    python -m conte_to_fresco_etl_spark list
    python -m conte_to_fresco_etl_spark query q1_pricing_summary \\
        --sf-dir /data [--explain] [--limit 20]

Spark configuration comes from ``session.py:get_spark`` (UTC, AQE,
broadcast threshold); master/cores override via --master.
"""

from __future__ import annotations

import argparse
import sys


def _spark(args):
    from conte_to_fresco_etl_spark.session import get_spark

    return get_spark(
        app_name=f"conte-to-fresco-etl-spark:{args.cmd}",
        master=args.master,
    )


def _catalog():
    """Import the full query registry (all catalog modules register
    into plans.catalog.QUERIES as an import side effect)."""
    from conte_to_fresco_etl_spark.plans import (  # noqa: F401
        catalog,
        catalog_analytics,
        catalog_text,
        catalog_tpch,
    )

    return catalog.QUERIES, catalog.ORACLES


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="conte_to_fresco_etl_spark")
    p.add_argument(
        "--master",
        default="local[*]",
        help="Spark master (default local[*])",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    s1 = sub.add_parser("step1", help="raw metric CSVs -> monthly FRESCO EAV")
    s1.add_argument("--raw-dir", required=True)
    s1.add_argument("--out", required=True)
    s1.add_argument("--fmt", default="parquet", choices=["parquet", "csv"])

    s2 = sub.add_parser("step2", help="monthly EAV + accounting -> daily set3")
    s2.add_argument("--ts-dir", required=True)
    s2.add_argument("--acct-dir", required=True)
    s2.add_argument("--out-parquet", required=True)
    s2.add_argument("--out-csv", default=None)

    sub.add_parser("list", help="list the declared query catalog")

    q = sub.add_parser("query", help="run one declared catalog query")
    q.add_argument("name")
    q.add_argument("--sf-dir", required=True, help="directory of parquet tables")
    q.add_argument("--limit", type=int, default=20, help="rows to show")
    q.add_argument(
        "--explain", action="store_true", help="print the formatted plan too"
    )

    args = p.parse_args(argv)

    if args.cmd == "list":
        queries, oracles = _catalog()
        try:
            for name in sorted(queries):
                gate = "oracle" if name in oracles else "rows-only"
                print(f"{name}\t{gate}")
        except BrokenPipeError:  # `... | head` closed the pipe
            sys.stderr.close()
        return 0

    if args.cmd == "step1":
        from conte_to_fresco_etl_spark.pipeline import run_step1

        spark = _spark(args)
        run_step1(spark, args.raw_dir, args.out, fmt=args.fmt)
        return 0

    if args.cmd == "step2":
        from conte_to_fresco_etl_spark.pipeline import run_step2

        spark = _spark(args)
        results = run_step2(
            spark, args.ts_dir, args.acct_dir, args.out_parquet, args.out_csv
        )
        for r in results:
            print(f"{r.year}-{r.month}\t{r.rows} rows")
        return 0

    if args.cmd == "query":
        queries, _ = _catalog()
        if args.name not in queries:
            print(
                f"unknown query {args.name!r} — see `list`", file=sys.stderr
            )
            return 2
        spark = _spark(args)
        df = queries[args.name](spark, args.sf_dir)
        if args.explain:
            df.explain("formatted")
        df.show(args.limit, truncate=False)
        return 0

    return 2  # pragma: no cover - argparse enforces choices


if __name__ == "__main__":
    raise SystemExit(main())
