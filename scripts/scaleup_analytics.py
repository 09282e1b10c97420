"""Scale-up measurement for the round-6 analytics family (PERF.md
methodology: same plans, replicated data, warmed session, cached inputs).

Replication regimes, chosen per query so the growth axis matches the
at-scale story:

* orders: shifted o_orderkey / o_custkey per copy — "more customers,
  same per-customer history" (SCD2's state is per-customer; its window
  partitions must grow in COUNT, not in size).
* lineitem: shifted l_orderkey, l_suppkey UNCHANGED — more facts into
  the same 3 stats groups (partial-agg regime) and the same 25-nation
  graph (PageRank's edge-derivation input grows while the graph — and
  therefore the iteration cost — stays constant; ranks must be
  IDENTICAL at every multiplier, asserted below).
* customer: shifted c_custkey, SAME c_nationkey — keeps the replicated
  orders joinable without growing the graph.
* events / documents / embeddings: the established shifted-id recipes.

Usage: python scripts/scaleup_analytics.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
from types import SimpleNamespace

from pyspark.sql import functions as F

from clinical_bi_spark.queries import events as events_mod
from clinical_bi_spark.queries import extended, graph, textops, vectorops
from clinical_bi_spark.session import get_spark, tune, warm
from clinical_bi_spark.sources import load_tables

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

MODULES = {
    "etl_scd2_history": extended,
    "agg_stats_battery": extended,
    "graph_pagerank": graph,
    "evt_markov_transitions": events_mod,
    "f_array_battery": vectorops,
    "text_chunk_split": textops,
}


def _replicate(df, mult: int, shifts: dict[str, int], keep: list[str]):
    if mult == 1:
        return df
    k = F.col("k").cast("bigint")  # k * offset overflows int32 at x50
    cols = [
        (F.col(c) + k * F.lit(off).cast("bigint")).alias(c)
        if c in shifts
        else F.col(c)
        for c, off in [(c, shifts.get(c, 0)) for c in keep]
    ]
    return df.select(
        F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("k"), "*"
    ).select(*cols)


def main() -> None:
    spark = get_spark("scaleup-analytics")
    spark.sparkContext.setLogLevel("ERROR")
    warm(spark)
    base = load_tables(tune(spark), SF_DIR)
    n_orders = base.orders.count()
    n_events = base.events.count()
    par = spark.sparkContext.defaultParallelism

    pagerank_fingerprint = None
    for mult in (1, 10, 50):
        orders = _replicate(
            base.orders, mult,
            {"o_orderkey": 100_000_000, "o_custkey": 10_000_000},
            ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
             "o_orderdate", "o_orderpriority"],
        )
        lineitem = _replicate(
            base.lineitem, mult,
            {"l_orderkey": 100_000_000},
            ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
             "l_quantity", "l_extendedprice", "l_discount", "l_tax",
             "l_returnflag", "l_linestatus", "l_shipdate"],
        )
        customer = _replicate(
            base.customer, mult,
            {"c_custkey": 10_000_000},
            ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
        )
        events = _replicate(
            base.events, mult,
            {"event_id": n_events + 1, "user_id": 1_000_000},
            ["event_id", "ts", "user_id", "event_type", "value", "props"],
        )
        documents = _replicate(
            base.documents, mult, {"doc_id": 10_000_000},
            ["doc_id", "text", "lang", "source", "n_chars"],
        )
        embeddings = _replicate(
            base.embeddings, mult, {"vec_id": 10_000_000},
            ["vec_id", "embedding", "label"],
        )
        cached = {}
        for name, df in [
            ("orders", orders), ("lineitem", lineitem), ("customer", customer),
            ("events", events), ("documents", documents),
            ("embeddings", embeddings),
        ]:
            cached[name] = df.repartition(par).persist()
            cached[name].count()
        tables = SimpleNamespace(
            supplier=base.supplier, nation=base.nation, **cached
        )

        originals = {m: m.load_tables for m in set(MODULES.values())}
        for m in originals:
            m.load_tables = lambda _spark, _sf, _t=tables: _t
        try:
            row = {"orders": n_orders * mult}
            for name, mod in MODULES.items():
                fn = getattr(mod, name)
                best = float("inf")
                for _ in range(2):
                    start = time.perf_counter()
                    out = fn(spark, SF_DIR)
                    if name == "graph_pagerank":
                        # invariance check: same graph -> identical ranks
                        fp = sorted(
                            (r.node, r.rank_micro) for r in out.collect()
                        )
                        if pagerank_fingerprint is None:
                            pagerank_fingerprint = fp
                        assert fp == pagerank_fingerprint, (
                            f"pagerank ranks changed at x{mult}"
                        )
                    else:
                        out.write.format("noop").mode("overwrite").save()
                    best = min(best, time.perf_counter() - start)
                    from clinical_bi_spark import caching

                    caching.release_all(spark)
                row[name] = round(best, 2)
            print(f"x{mult}", row, flush=True)
        finally:
            for m, orig in originals.items():
                m.load_tables = orig
            for df in cached.values():
                df.unpersist()


if __name__ == "__main__":
    main()
