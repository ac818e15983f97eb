"""CLI face of the engine — the surface a reference-pipeline user
drives day to day:

    python -m etl_seattle_call_data_spark list [pattern]
    python -m etl_seattle_call_data_spark run <query> [--sf-dir D]
        [--out PATH] [--format parquet|csv|json] [--limit N] [--explain]
    python -m etl_seattle_call_data_spark sql "SELECT ..." [--sf-dir D] ...

`run` executes a registered query; `sql` runs an ad-hoc statement over
the registered table views (the same spark.sql surface the
sql_surface_pricing query proves). Without --out, results print to
stdout (driver-side show of at most --limit rows — the CLI is the one
place a bounded collect is the point); with --out, the DataFrame writes
distributed (partitioned by default, per the engine's writer rules) and
nothing large ever lands on the driver.
"""

from __future__ import annotations

import argparse
import fnmatch
import sys


def _build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="python -m etl_seattle_call_data_spark", description=__doc__
    )
    sub = ap.add_subparsers(dest="cmd", required=True)

    lp = sub.add_parser("list", help="list registered queries")
    lp.add_argument("pattern", nargs="?", default="*")

    for name in ("run", "sql"):
        rp = sub.add_parser(name)
        rp.add_argument("target", help="query name" if name == "run" else "SQL text")
        rp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
        rp.add_argument("--out", default=None, help="write path (distributed)")
        rp.add_argument("--format", default="parquet",
                        choices=["parquet", "csv", "json"])
        rp.add_argument("--limit", type=int, default=20,
                        help="stdout row cap when --out is not given")
        rp.add_argument("--explain", action="store_true",
                        help="print the formatted physical plan instead")
    return ap


def main(argv: list[str] | None = None) -> int:
    ns = _build_parser().parse_args(argv)
    from etl_seattle_call_data_spark.plans.queries import REGISTRY

    if ns.cmd == "list":
        names = sorted(n for n in REGISTRY if fnmatch.fnmatch(n, ns.pattern))
        for n in names:
            print(f"{n}: {REGISTRY[n].description[:100]}")
        print(f"({len(names)} queries)", file=sys.stderr)
        return 0

    from etl_seattle_call_data_spark.session import get_spark

    spark = get_spark(app_name=f"cli:{ns.cmd}")
    if ns.cmd == "run":
        if ns.target not in REGISTRY:
            print(f"unknown query {ns.target!r}; try `list`", file=sys.stderr)
            return 2
        df = REGISTRY[ns.target].spark(spark, ns.sf_dir)
    else:
        from etl_seattle_call_data_spark.sources.registry import load_tables

        load_tables(spark, ns.sf_dir)
        df = spark.sql(ns.target)

    if ns.explain:
        df.explain("formatted")
        return 0
    if ns.out:
        writer = df.write.mode("overwrite")
        if ns.format == "csv":
            writer = writer.option("header", "true")
        getattr(writer, ns.format)(ns.out)
        print(f"wrote {ns.out}", file=sys.stderr)
        return 0
    df.show(ns.limit, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
