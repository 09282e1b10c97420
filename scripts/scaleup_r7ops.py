"""Scale-up measurement for the round-7 operators (PERF.md methodology:
same plans, replicated data, warmed session, cached input).

Replication per family:

* documents — doc_id shifted per copy, text duplicated. Duplicating text
  multiplies every 3-gram's document frequency by the multiplier, so the
  boilerplate threshold scales with it (df >= 4*mult via the module
  global the query reads at call time): the BOILERPLATE SET — and hence
  output selectivity — stays constant while the corpus grows, which is
  the throughput regime (a fixed threshold would degenerate to
  strip-everything, measuring output explosion instead of the operator).
  Gopher filters take the raw replicated corpus (no knob — pure
  projection).
* events — user_id/event_id shifted per copy (more users, same per-user
  stream): CEP island collapse + pattern match per user, match count
  scales exactly linearly.
* lineitem — l_orderkey shifted per copy: distinct keys x mult; the KMV
  sketch must stay k=256 rows per group while its estimate tracks the
  grown cardinality.

graph_label_propagation is nation-level (25 nodes) — its data-volume
scaling lives entirely in edge derivation, already measured flat for
graph_pagerank in scripts/scaleup_analytics.py (same derivation joins).

Usage: python scripts/scaleup_r7ops.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
from types import SimpleNamespace

from pyspark.sql import functions as F

from clinical_bi_spark import caching
from clinical_bi_spark.queries import events as events_mod
from clinical_bi_spark.queries import sketchops, textops
from clinical_bi_spark.session import get_spark, warm

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def _replicated(base, mult: int, id_cols: dict[str, int]):
    """x mult with per-copy id shifts (id_col -> offset)."""
    if mult == 1:
        return base
    k = F.col("k").cast("bigint")
    cols = [
        (F.col(c) + k * F.lit(off).cast("bigint")).alias(c)
        if c in id_cols
        else F.col(c)
        for c in base.columns
        for off in [id_cols.get(c, 0)]
    ]
    return base.select(
        F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("k"), "*"
    ).select(*cols)


def _time(fn, spark, repeats: int = 2) -> float:
    best = float("inf")
    for _ in range(repeats):
        start = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - start)
        caching.release_all(spark)
    return round(best, 2)


def main() -> None:
    spark = get_spark("scaleup-r7ops")
    spark.sparkContext.setLogLevel("ERROR")
    warm(spark)
    par = spark.sparkContext.defaultParallelism

    docs_base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ev_base = spark.read.parquet(f"{SF_DIR}/events.parquet")
    li_base = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    n_docs, n_ev, n_li = docs_base.count(), ev_base.count(), li_base.count()

    for mult in (1, 10, 50):
        row: dict = {}

        docs = (
            _replicated(docs_base, mult, {"doc_id": n_docs + 1})
            .repartition(par)
            .persist()
        )
        docs.count()
        t_docs = SimpleNamespace(documents=docs)
        orig_t = textops.load_tables
        orig_df = textops._BOILERPLATE_DF
        textops.load_tables = lambda _s, _d, _t=t_docs: _t
        textops._BOILERPLATE_DF = 4 * mult  # constant boilerplate set
        try:
            row["docs"] = n_docs * mult
            row["boilerplate"] = _time(textops.text_boilerplate_strip, spark)
            row["gopher"] = _time(textops.text_gopher_filters, spark)
        finally:
            textops.load_tables = orig_t
            textops._BOILERPLATE_DF = orig_df
            docs.unpersist()

        ev = (
            _replicated(
                ev_base, mult,
                {"event_id": n_ev + 1, "user_id": 1_000_000},
            )
            .repartition(par)
            .persist()
        )
        ev.count()
        from clinical_bi_spark.sources import normalize_events

        t_ev = SimpleNamespace(events=normalize_events(ev))
        orig_e = events_mod.load_tables
        events_mod.load_tables = lambda _s, _d, _t=t_ev: _t
        try:
            row["events"] = n_ev * mult
            row["cep"] = _time(events_mod.evt_cep_pattern, spark)
            out = events_mod.evt_cep_pattern(spark, SF_DIR).count()
            row["cep_matches"] = out
        finally:
            events_mod.load_tables = orig_e
            ev.unpersist()

        li = (
            _replicated(li_base, mult, {"l_orderkey": 100_000_000})
            .repartition(par)
            .persist()
        )
        li.count()
        t_li = SimpleNamespace(lineitem=li)
        orig_s = sketchops.load_tables
        sketchops.load_tables = lambda _s, _d, _t=t_li: _t
        try:
            row["li"] = n_li * mult
            row["kmv"] = _time(sketchops.sketch_kmv_distinct, spark)
        finally:
            sketchops.load_tables = orig_s
            li.unpersist()

        print(f"x{mult}", row, flush=True)


if __name__ == "__main__":
    main()
