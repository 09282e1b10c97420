"""Scale-up measurement for the events family (PERF.md methodology: same
plans, replicated data, warmed session, cached input so the operator — not
the parquet read — is timed).

Replication shifts user_id and event_id by k*offset per copy: per-user
event counts stay constant, so the growth axis is "more users, same
behavior" — the realistic shape for sessionization/retention (a window
family whose per-user state must NOT grow with corpus size). ts is left
identical across copies: same time range, denser traffic, which is what
stresses the tumbling/sliding window buckets.

Usage: python scripts/scaleup_events.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
from types import SimpleNamespace

from pyspark.sql import functions as F

from clinical_bi_spark.queries import events
from clinical_bi_spark.session import get_spark, tune, warm
from clinical_bi_spark.sources import load_tables

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
QUERIES = [
    "evt_sliding_window",
    "evt_json_extract",
    "evt_dedup_window",
    "evt_funnel_conversion",
    "evt_retention_cohorts",
    "evt_ohlc_downsample",
    "j_range_interval_join",
]


def main() -> None:
    spark = get_spark("scaleup-events")
    spark.sparkContext.setLogLevel("ERROR")
    warm(spark)
    base = load_tables(tune(spark), SF_DIR).events
    n_base = base.count()
    id_offset = n_base + 1
    user_offset = 1_000_000

    fns = {name: getattr(events, name) for name in QUERIES}

    for mult in (1, 10, 50):
        ev = base
        if mult > 1:
            ev = base.select(
                F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("k"),
                "*",
            ).select(
                (F.col("event_id") + F.col("k") * id_offset).alias("event_id"),
                "ts",
                (F.col("user_id") + F.col("k") * user_offset).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        ev = ev.repartition(spark.sparkContext.defaultParallelism).persist()
        ev.count()  # materialize the cache

        tables = SimpleNamespace(events=ev)
        orig = events.load_tables
        events.load_tables = lambda _spark, _sf, _t=tables: _t
        try:
            row = {"rows": n_base * mult}
            for name, fn in fns.items():
                best = float("inf")
                for _ in range(2):
                    start = time.perf_counter()
                    fn(spark, SF_DIR).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    best = min(best, time.perf_counter() - start)
                row[name] = round(best, 2)
            print(f"x{mult}", row, flush=True)
        finally:
            events.load_tables = orig
            ev.unpersist()


if __name__ == "__main__":
    main()
