"""Scale-up measurement for the parked r14 candidate
(evt_gapfill_interpolate) — events-family methodology (see
scaleup_events.py): replication shifts user_id/event_id per copy, ts
identical, so the growth axis is "more users, same behavior". That is
the honest axis for gapfill: per-user observed-bucket counts (and so
per-user gap structure and output size) stay constant while the fact
scan, the map-side-combined (user, day) groupBy, and the per-user LEAD
window all grow linearly.

Usage: python scripts/scaleup_r14cand.py [sf_dir]
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


def main() -> None:
    spark = get_spark("scaleup-r14cand")
    spark.sparkContext.setLogLevel("ERROR")
    warm(spark)
    base = load_tables(tune(spark), SF_DIR).events
    n_base = base.count()
    id_offset = n_base + 1
    user_offset = 1_000_000

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
        ev.count()

        tables = SimpleNamespace(events=ev)
        orig = events.load_tables
        events.load_tables = lambda _spark, _sf, _t=tables: _t
        try:
            row = {"events": n_base * mult}
            for fn in (
                events.evt_gapfill_interpolate,
                events.evt_time_weighted_avg,
            ):
                best = float("inf")
                for _ in range(2):
                    start = time.perf_counter()
                    fn(spark, SF_DIR).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    best = min(best, time.perf_counter() - start)
                row[fn.__name__] = round(best, 2)
            out = events.evt_gapfill_interpolate(spark, SF_DIR)
            row["gapfill_out_rows"] = out.count()
            row["interpolated"] = out.filter("src = 'interpolated'").count()
            print(f"x{mult}", row, flush=True)
        finally:
            events.load_tables = orig
            ev.unpersist()


if __name__ == "__main__":
    main()
