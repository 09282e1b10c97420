"""Scale-up rows AT BIRTH for the two r12 registration candidates
(agg_mannwhitney_u, data_psi_drift) — recorded the round they LAND, one
round before they register, per the containment/r11 convention.

* agg_mannwhitney_u — claims: one fact-scale groupBy bounded by the
  price DOMAIN, sharded prefix sum over distinct values, constant-size
  final aggregate. Replication multiplies per-value COUNTS, not the
  distinct-value domain, so wall should go FLAT once the scan dominates
  (the same shape the value-level Gini/KS rows pinned).
* data_psi_drift — claims: one map-side-combined groupBy onto a
  ~25-row bucket domain; everything after is dashboard-sized. Wall
  should track the orders scan alone.

Usage: python scripts/scaleup_r12cand.py [sf_dir]
Env:   CBS_R12_MULTS=1,10,50
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from types import SimpleNamespace

from clinical_bi_spark.queries import extended, pipelineops
from clinical_bi_spark.session import get_spark, warm
from scripts.scaleup_r7ops import _replicated
from scripts.scaleup_r8ops import _time

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark("scaleup-r12cand")
    spark.sparkContext.setLogLevel("ERROR")
    warm(spark)
    par = spark.sparkContext.defaultParallelism

    li_base = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    od_base = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    n_li, n_od = li_base.count(), od_base.count()

    mults = tuple(
        int(m) for m in os.environ.get("CBS_R12_MULTS", "1,10,50").split(",")
    )

    for mult in mults:
        li = (
            _replicated(li_base, mult, {"l_orderkey": n_li})
            .repartition(par)
            .persist()
        )
        li.count()
        t = SimpleNamespace(lineitem=li)
        sec, n_out = _time(extended, extended.agg_mannwhitney_u, spark, t)
        li.unpersist()
        print(
            f"mwu x{mult} rows={n_li * mult} sec={sec} out={n_out}",
            flush=True,
        )

    for mult in mults:
        od = (
            _replicated(od_base, mult, {"o_orderkey": n_od})
            .repartition(par)
            .persist()
        )
        od.count()
        t = SimpleNamespace(orders=od)
        sec, n_out = _time(pipelineops, pipelineops.data_psi_drift, spark, t)
        od.unpersist()
        print(
            f"psi x{mult} rows={n_od * mult} sec={sec} out={n_out}",
            flush=True,
        )


if __name__ == "__main__":
    main()
