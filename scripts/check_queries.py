"""Spot-check named registry queries against their DuckDB oracles at one
or more SF dirs — the same canonicalization/compare as driver_sim, but
filtered, for fast iteration on new queries.

Usage: python scripts/check_queries.py q1 q2 ... [--sf DIR | --sf=DIR]...
(default SFs: sf0.001 and sf0.01)
"""

from __future__ import annotations

import argparse
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.driver_sim import TABLES, canon, cells_equal  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser(
        description="Spot-check registry queries against their DuckDB oracles"
    )
    ap.add_argument("names", nargs="+", help="registry query names")
    ap.add_argument(
        "--sf",
        action="append",
        default=None,
        metavar="DIR",
        help="SF dir (repeatable; accepts --sf DIR and --sf=DIR)",
    )
    ns = ap.parse_args()
    names = ns.names
    sfs = ns.sf or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    for sf in sfs:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
            )
        for name in names:
            s = canon(qs[name](spark, sf).toPandas())
            if name not in oracles:
                print(f"{sf} {name:35s} rows-only ({len(s)} rows)")
                continue
            d = canon(con.execute(oracles[name]).df())
            ok = len(s) == len(d) and list(s.columns) == list(d.columns)
            diff = None
            if ok:
                for col in s.columns:
                    for i, (x, y) in enumerate(zip(s[col].tolist(), d[col].tolist())):
                        if not cells_equal(x, y):
                            ok, diff = False, f"{col}[{i}]: {x!r} vs {y!r}"
                            break
                    if diff:
                        break
            if ok:
                print(f"{sf} {name:35s} PASS ({len(s)} rows)")
            else:
                failures += 1
                print(
                    f"{sf} {name:35s} FAIL rows={len(s)}/{len(d)} "
                    f"cols_match={list(s.columns) == list(d.columns)} {diff}"
                )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
