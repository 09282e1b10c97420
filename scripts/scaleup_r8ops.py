"""Scale-up measurement for the round-8 operators (PERF.md methodology:
same plans, replicated data, warmed session, cached input).

Replication per family:

* documents — scaleup_linkage.replicate (doc_id shifted, copy-distinct
  suffix token appended) so word-set duplicate CLUSTERS stay within
  copies: keep-best survivorship output scales linearly instead of
  degenerating to everything-in-one-cluster; the suffix's rare bigrams
  cannot reach the PMI top-K (their unigram denominators are
  copy-sized). Weighted sampling keeps K=100 at any corpus size
  (top-K selection is the claim under test).
* events — user_id/event_id shifted per copy (more users, same per-user
  stream): forward-fill windows and the temporal-split audit scale in
  users; RFM's ntile is a deliberate stress — a single-partition sort
  over the per-user ENTITY relation, measured honestly as it grows.
* orders / lineitem — row replication (Benford digit counts and Welch
  power sums just scale; outputs stay 9 rows / 1 row).
* embeddings — vec_id shifted; the PCA fit trains on the 512 lowest
  ids regardless of corpus size (the bounded-sample claim), so its
  cost should be flat + one corpus scan for the sample selection.

Usage: python scripts/scaleup_r8ops.py [sf_dir]
Env:   CBS_R8_MULTS=1,10,50
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
from types import SimpleNamespace

from pyspark.sql import functions as F

from clinical_bi_spark import caching
from clinical_bi_spark.queries import (
    events as events_mod,
    extended,
    mlops,
    pipelineops,
    textops,
    vectorops,
)
from clinical_bi_spark.session import get_spark, warm
from scripts.scaleup_linkage import replicate
from scripts.scaleup_r7ops import _replicated

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def _time(mod, fn, spark, tables, repeats: int = 2):
    orig = mod.load_tables
    mod.load_tables = lambda _s, _d, _t=tables: _t
    best, n_out = float("inf"), 0
    try:
        for _ in range(repeats):
            start = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - start)
            caching.release_all(spark)
        n_out = fn(spark, SF_DIR).count()
        caching.release_all(spark)
    finally:
        mod.load_tables = orig
    return round(best, 2), n_out


def main() -> None:
    spark = get_spark("scaleup-r8ops")
    spark.sparkContext.setLogLevel("ERROR")
    warm(spark)
    par = spark.sparkContext.defaultParallelism

    docs_base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ev_base = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ord_base = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li_base = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    emb_base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_docs, n_ev = docs_base.count(), ev_base.count()
    n_ord, n_li, n_emb = ord_base.count(), li_base.count(), emb_base.count()

    mults = tuple(
        int(m) for m in os.environ.get("CBS_R8_MULTS", "1,10,50").split(",")
    )
    for mult in mults:
        row: dict = {}

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
        row["docs"] = n_docs * mult
        row["wsample_sec"], _ = _time(
            pipelineops, pipelineops.data_weighted_sample, spark, t_docs
        )
        row["keepbest_sec"], row["keepbest_rows"] = _time(
            textops, textops.dedup_keep_best, spark, t_docs
        )
        row["pmi_sec"], _ = _time(
            textops, textops.text_bigram_pmi_topk, spark, t_docs
        )
        row["entropy_sec"], _ = _time(
            textops, textops.text_char_entropy, spark, t_docs
        )
        docs.unpersist()

        from clinical_bi_spark.sources import normalize_events

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
        row["ffill_sec"], _ = _time(
            events_mod, events_mod.evt_forward_fill, spark, t_ev
        )
        row["rfm_sec"], row["rfm_users"] = _time(
            extended, extended.evt_rfm_segmentation, spark, t_ev
        )
        row["tsplit_sec"], _ = _time(
            mlops, mlops.m19_temporal_split, spark, t_ev
        )
        row["cepq_sec"], row["cepq_matches"] = _time(
            events_mod, events_mod.evt_cep_pattern_quantified, spark, t_ev
        )
        row["funnel_tb_sec"], _ = _time(
            events_mod, events_mod.evt_funnel_time_bounded, spark, t_ev
        )
        ev.unpersist()

        orders = _replicated(ord_base, mult, {}).repartition(par).persist()
        orders.count()
        row["orders"] = n_ord * mult
        row["benford_sec"], _ = _time(
            extended, extended.agg_benford_firstdigit, spark,
            SimpleNamespace(orders=orders),
        )
        # Poisson bootstrap: 200 replicate weights per row, one
        # partial-agg'd pass — the explode volume is orders x 200
        row["bootstrap_sec"], _ = _time(
            extended, extended.agg_bootstrap_ci_mean, spark,
            SimpleNamespace(orders=orders),
        )
        orders.unpersist()

        li = _replicated(li_base, mult, {}).repartition(par).persist()
        li.count()
        row["li"] = n_li * mult
        row["welch_sec"], _ = _time(
            extended, extended.agg_ttest_welch, spark,
            SimpleNamespace(lineitem=li),
        )
        row["winsor_sec"], _ = _time(
            extended, extended.agg_winsorized_mean, spark,
            SimpleNamespace(lineitem=li),
        )
        li.unpersist()

        emb = (
            _replicated(emb_base, mult, {"vec_id": n_emb + 1})
            .repartition(par)
            .persist()
        )
        emb.count()
        row["emb"] = n_emb * mult
        row["pca_sec"], _ = _time(
            vectorops, vectorops.vec_pca_power_top1, spark,
            SimpleNamespace(embeddings=emb),
        )
        emb.unpersist()

        print(f"x{mult}", row, flush=True)


if __name__ == "__main__":
    main()
