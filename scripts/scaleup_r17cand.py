"""Scale-up measurement for the parked r17 candidates
(data_compaction_plan over replicated orders, graph_adamic_adar over
replicated orders+lineitem) — replication methodology (see
scaleup_r15cand.py: shifted-key copies, warmed session, cached input,
min-of-2).

Scale claims under test:
* data_compaction_plan — the only fact-scale op is the per-day groupBy
  (map-side combined, bounded by the ~2.4k-value DATE DOMAIN); copies
  keep their dates, so replication grows rows-per-day while the
  post-groupBy prefix-sum/rollup work is INVARIANT → wall should stay
  near flat.
* graph_adamic_adar — copies get SHIFTED customer AND part keys
  (fully disjoint co-purchase subgraphs), so output pairs grow EXACTLY
  k x base and per-customer basket sizes (the quadratic term) stay
  constant → wall should grow at most linearly in output. Multipliers
  1/4/16 per the pair-join-family precedent (scaleup_linkage.py).
  (A custkey-only shift was measured first and recorded in PERF.md as
  the threshold-crossing WORST case: identical-basket copies multiply
  every pair's n_common past the >=3 floor, saturating output at the
  full co-occurrence set — the jaccard-x16 regime analogue.)

Usage: python scripts/scaleup_r17cand.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
from types import SimpleNamespace

from pyspark.sql import functions as F

from clinical_bi_spark import caching
from clinical_bi_spark.queries import graph, pipelineops
from clinical_bi_spark.session import get_spark, warm

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def _replicate(df, mult, shifts):
    """mult copies; column c in ``shifts`` offset by k * shifts[c].
    Offsets are passed EXPLICITLY so the order/lineitem join key shifts
    by the SAME stride on both sides (independent max+1 strides would
    break the o_orderkey == l_orderkey equi-join on the copies)."""
    if mult == 1:
        return df
    out = df.select(
        F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("k"), "*"
    )
    return out.select(
        *[
            (F.col(c) + F.col("k") * shifts[c]).alias(c)
            if c in shifts
            else F.col(c)
            for c in df.columns
        ]
    )


def main() -> None:
    spark = get_spark("scaleup-r17cand")
    spark.sparkContext.setLogLevel("ERROR")
    warm(spark)
    par = spark.sparkContext.defaultParallelism
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    n_ord = orders.count()

    key_off = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    cust_off = orders.agg(F.max("o_custkey")).collect()[0][0] + 1
    part_off = lineitem.agg(F.max("l_partkey")).collect()[0][0] + 1

    # --- compaction: dates unchanged, keys shifted (domain-invariance) ---
    for mult in (1, 10, 50):
        o = _replicate(orders, mult, {"o_orderkey": key_off}).repartition(
            par
        ).persist()
        o.count()
        tables = SimpleNamespace(orders=o)
        orig = pipelineops.load_tables
        pipelineops.load_tables = lambda _s, _d, _t=tables: _t
        try:
            best = float("inf")
            for _ in range(2):
                start = time.perf_counter()
                pipelineops.data_compaction_plan(spark, SF_DIR).write.format(
                    "noop"
                ).mode("overwrite").save()
                best = min(best, time.perf_counter() - start)
                # release the query's persist_tracked intermediates: the
                # CacheManager plan-matches an identical second run and
                # would skip the fact-scale groupBy under test (r15
                # review) — the INPUT persist above is the one cache the
                # methodology keeps warm
                caching.release_all(spark)
            print(
                f"x{mult}",
                {"orders": n_ord * mult, "data_compaction_plan": round(best, 2)},
                flush=True,
            )
        finally:
            pipelineops.load_tables = orig
            o.unpersist()

    # --- adamic-adar: disjoint subgraph copies (linear-output regime) ---
    for mult in (1, 4, 16):
        o = _replicate(
            orders, mult, {"o_orderkey": key_off, "o_custkey": cust_off}
        ).repartition(par).persist()
        li = _replicate(
            lineitem, mult, {"l_orderkey": key_off, "l_partkey": part_off}
        ).repartition(par).persist()
        o.count(), li.count()
        tables = SimpleNamespace(orders=o, lineitem=li)
        orig = graph.load_tables
        graph.load_tables = lambda _s, _d, _t=tables: _t
        try:
            best, pairs = float("inf"), None
            for _ in range(2):
                start = time.perf_counter()
                df = graph.graph_adamic_adar(spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - start)
                caching.release_all(spark)  # see the compaction note
            pairs = graph.graph_adamic_adar(spark, SF_DIR).count()
            caching.release_all(spark)
            print(
                f"x{mult}",
                {
                    "orders": n_ord * mult,
                    "graph_adamic_adar": round(best, 2),
                    "pairs": pairs,
                },
                flush=True,
            )
        finally:
            graph.load_tables = orig
            o.unpersist(), li.unpersist()


if __name__ == "__main__":
    main()
