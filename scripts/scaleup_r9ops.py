"""Scale-up measurement for the round-9 operator changes (PERF.md
methodology: same plans, replicated data, warmed session, cached input).

Rows:

* evt_changepoint_cusum — the late-r8 query that missed the r8 scale
  table (r8 verdict, Next #5). Events replicate user-shifted (more
  users, same per-user stream): the one user_id exchange grows linearly,
  the per-user windows stay partition-local.
* evt_rfm_segmentation — now the SHARDED prefix-sum production path
  (r9 graduation); the r8 table measured the single-partition ntile form
  as a deliberate stress, so this row is the before/after evidence.
* m13_auc_rank — sharded global rank over the replicated orders fact.
* agg_equidepth_histogram — sharded per-group rank over replicated
  lineitem (3 groups: the low-cardinality-partition regime).
* dedup_containment_prefix / dedup_containment_superset — the r9
  rebuilt forms (u64 + length filter + two-sided positional bound),
  at the document multipliers CBS_R9_DOC_MULTS (default 1,4: the r8
  form was already disk-heavy at x1-equivalent volume; these rows
  record the new forms' growth curve on linkage-replicated docs).

Usage: python scripts/scaleup_r9ops.py [sf_dir]
Env:   CBS_R9_MULTS=1,10,50   CBS_R9_DOC_MULTS=1,4
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from types import SimpleNamespace

from clinical_bi_spark.queries import events as events_mod
from clinical_bi_spark.queries import extended, relational, textops
from clinical_bi_spark.session import get_spark, warm
from clinical_bi_spark.sources import normalize_events
from scripts.scaleup_linkage import replicate
from scripts.scaleup_r7ops import _replicated
from scripts.scaleup_r8ops import _time

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark("scaleup-r9ops")
    spark.sparkContext.setLogLevel("ERROR")
    warm(spark)
    par = spark.sparkContext.defaultParallelism

    ev_base = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ord_base = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li_base = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    n_ev, n_ord, n_li = ev_base.count(), ord_base.count(), li_base.count()

    mults = tuple(
        int(m) for m in os.environ.get("CBS_R9_MULTS", "1,10,50").split(",")
    )
    for mult in mults:
        row: dict = {}

        ev = (
            _replicated(
                ev_base, mult, {"event_id": n_ev + 1, "user_id": 1_000_000}
            )
            .repartition(par)
            .persist()
        )
        ev.count()
        t_ev = SimpleNamespace(events=normalize_events(ev))
        row["events"] = n_ev * mult
        row["cusum_sec"], row["cusum_users"] = _time(
            events_mod, events_mod.evt_changepoint_cusum, spark, t_ev
        )
        row["rfm_sharded_sec"], row["rfm_users"] = _time(
            extended, extended.evt_rfm_segmentation, spark, t_ev
        )
        ev.unpersist()

        orders = _replicated(ord_base, mult, {}).repartition(par).persist()
        orders.count()
        row["orders"] = n_ord * mult
        row["auc_sharded_sec"], _ = _time(
            relational, relational.m13_auc_rank, spark,
            SimpleNamespace(orders=orders),
        )
        orders.unpersist()

        li = _replicated(li_base, mult, {}).repartition(par).persist()
        li.count()
        row["li"] = n_li * mult
        row["equidepth_sharded_sec"], _ = _time(
            relational, relational.agg_equidepth_histogram, spark,
            SimpleNamespace(lineitem=li),
        )
        li.unpersist()

        print(f"x{mult}", row, flush=True)

    docs_base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs_base.count()
    doc_mults = tuple(
        int(m)
        for m in os.environ.get("CBS_R9_DOC_MULTS", "1,4").split(",")
    )
    for mult in doc_mults:
        docs = (
            replicate(
                docs_base.select("doc_id", "text"), mult, "doc_id", "text",
                100_000_000,
            )
            .repartition(par)
            .persist()
        )
        docs.count()
        t_docs = SimpleNamespace(documents=docs)
        row = {"docs": n_docs * mult}
        row["contain_sec"], row["contain_pairs"] = _time(
            textops, textops.dedup_containment_prefix, spark, t_docs
        )
        row["superset_sec"], row["superset_rows"] = _time(
            textops, textops.dedup_containment_superset, spark, t_docs
        )
        docs.unpersist()
        print(f"docs x{mult}", row, flush=True)


if __name__ == "__main__":
    main()
