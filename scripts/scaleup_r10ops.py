"""Scale-up rows AT BIRTH for the round-10 additions (the r9 containment
lesson, institutionalized: a scale claim without a recorded number is a
guess — every new bench entry gets its x1/x10/x50 row the round it
lands).

Rows, on replicated lineitem (PERF.md methodology: same plans, warmed
session, cached input, min of 2):

* sketch_bottomk_quantiles — claims TakeOrderedAndProject constant
  per-partition state (k=256 rows) + one partial-agg'd count: wall
  should track the scan, not the sort.
* agg_gini_coefficient — value-level rank-sum plan: the only fact-scale
  op is the groupBy(flag, cents) count; everything downstream is bounded
  by the price DOMAIN (which replication does NOT grow — the x50 corpus
  has the same ~70k distinct cents), so wall should flatten hard.
* agg_ks_two_sample — same shape: per-value cohort counts + sharded
  running totals over distinct values.

Usage: python scripts/scaleup_r10ops.py [sf_dir]
Env:   CBS_R10_MULTS=1,10,50
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from types import SimpleNamespace

from clinical_bi_spark.queries import extended, sketchops
from clinical_bi_spark.session import get_spark, warm
from scripts.scaleup_r7ops import _replicated
from scripts.scaleup_r8ops import _time

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark("scaleup-r10ops")
    spark.sparkContext.setLogLevel("ERROR")
    warm(spark)
    par = spark.sparkContext.defaultParallelism
    li_base = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    n_li = li_base.count()
    mults = tuple(
        int(m) for m in os.environ.get("CBS_R10_MULTS", "1,10,50").split(",")
    )
    for mult in mults:
        li = _replicated(li_base, mult, {}).repartition(par).persist()
        li.count()
        t = SimpleNamespace(lineitem=li)
        row: dict = {"li": n_li * mult}
        row["bottomk_sec"], _ = _time(
            sketchops, sketchops.sketch_bottomk_quantiles, spark, t
        )
        row["gini_sec"], _ = _time(
            extended, extended.agg_gini_coefficient, spark, t
        )
        row["ks_sec"], _ = _time(
            extended, extended.agg_ks_two_sample, spark, t
        )
        li.unpersist()
        print(f"x{mult}", row, flush=True)


if __name__ == "__main__":
    main()
