"""Phase attribution for agg_equidepth_histogram's scale-up tail (r9
verdict, Next #4: 3.05 -> 14.22 s at x1 -> x50 was the rank family's only
super-unit-slope line — attribute the linear term, then shave or document).

Times, on replicated lineitem at CBS_EQ_MULTS (default 1,10,50):

* ``exchange`` — range exchange + sort + persist + count (JVM only; the
  irreducible floor of any per-row-rank form);
* ``e2e_old``  — the r9 production plan, reconstructed: generic sharded
  rank (full-fact mapInPandas cumcount out through Arrow + offsets join
  + fact-sized final agg);
* ``e2e_new``  — the r10 VALUE-LEVEL production path (no per-row ranks:
  groupBy(flag, price) counts + domain-bounded prefix sums + closed-form
  bucket arithmetic — see agg_equidepth_histogram's docstring).

Attribution the r9 verdict asked for (measured r10, this script): at
x50 e2e_old = 13.5 s of which ~4.5 s is the fact range exchange and the
remaining ~9 s is the fact-sized Arrow round-trip + offsets join + final
fact-sized agg. An intermediate fused form (partial aggregation inside
the Arrow pass) removed the outbound half (13.5 -> 11.2 s at x50) but
kept the inbound fact-sized Arrow serialization + exchange; the
value-level rebuild removes the per-row rank entirely.

Usage: python scripts/profile_equidepth.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time
from types import SimpleNamespace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from clinical_bi_spark import caching
from clinical_bi_spark.operators.ranking import (
    global_row_number,
    ntile_from_rank,
)
from clinical_bi_spark.queries import relational
from clinical_bi_spark.session import get_spark, warm
from scripts.scaleup_r7ops import _replicated

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark("profile-equidepth")
    spark.sparkContext.setLogLevel("ERROR")
    warm(spark)
    par = spark.sparkContext.defaultParallelism
    li_base = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    n_li = li_base.count()
    mults = tuple(
        int(m) for m in os.environ.get("CBS_EQ_MULTS", "1,10,50").split(",")
    )
    order = [
        F.col("l_extendedprice"), F.col("l_orderkey"), F.col("l_linenumber")
    ]
    for mult in mults:
        li = _replicated(li_base, mult, {}).repartition(par).persist()
        li.count()
        row: dict = {"li": n_li * mult}

        t0 = time.perf_counter()
        ranged = (
            li.repartitionByRange(par, F.col("l_returnflag"), *order)
            .sortWithinPartitions(F.col("l_returnflag"), *order)
            .persist()
        )
        ranged.count()
        row["exchange_sec"] = round(time.perf_counter() - t0, 2)
        ranged.unpersist()

        t0 = time.perf_counter()
        grp_n = li.groupBy("l_returnflag").agg(F.count("*").alias("__ng"))
        ranked = global_row_number(
            li, order, partition_by=["l_returnflag"], out_col="__rnk"
        )
        out_old = (
            ranked.join(F.broadcast(grp_n), "l_returnflag")
            .select(
                "l_returnflag",
                "l_extendedprice",
                ntile_from_rank(F.col("__rnk"), F.col("__ng"), 8).alias(
                    "bucket"
                ),
            )
            .groupBy("l_returnflag", "bucket")
            .agg(
                F.count("*").alias("n"),
                F.round(F.min("l_extendedprice"), 4).alias("lo"),
                F.round(F.max("l_extendedprice"), 4).alias("hi"),
            )
        )
        n_old = out_old.count()
        row["e2e_old_sec"] = round(time.perf_counter() - t0, 2)
        caching.release_all(spark)

        t0 = time.perf_counter()
        _t = SimpleNamespace(lineitem=li)
        orig = relational.load_tables
        relational.load_tables = lambda _s, _d, _tt=_t: _tt
        try:
            n_new = relational.agg_equidepth_histogram(spark, SF_DIR).count()
        finally:
            relational.load_tables = orig
        row["e2e_new_sec"] = round(time.perf_counter() - t0, 2)
        caching.release_all(spark)
        assert n_old == n_new, (n_old, n_new)

        li.unpersist()
        print(f"x{mult}", row, flush=True)


if __name__ == "__main__":
    main()
