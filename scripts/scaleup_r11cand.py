"""Scale-up rows AT BIRTH for the two r11 registration candidates
(dedup_semantic_cluster, data_dsir_select) — recorded the round they
LAND, one round before they register, per the r9 containment lesson
(a scale claim without a recorded number is a guess).

* data_dsir_select — claims: feature hashing inside the explode
  projection (no feature strings in exchanges), ONE map-side-combined
  fact-scale groupBy for both bucket models, broadcast 1024-row model
  join, TakeOrderedAndProject top-K. Wall should track the token scan.
  Mults 1/10/50 on replicated documents.
* dedup_semantic_cluster — replication plants mult-1 EXACT copies of
  every vector: copies share a cell and pair at cos=1, so the pair
  output grows ~mult^2 BY CONSTRUCTION and the wall should track PAIR
  OUTPUT (the same output-bound cost model the containment join pinned
  in r9). K is held at 16 cells, the WORST case — the paper's recipe
  scales K with the corpus, which keeps |cell| and the per-cell join
  bounded (the query docstring states this; the fixed-K quadratic here
  is the honest floor of NOT doing that). Mults 1/4/10.
  Behavior cross-check at every mult: >= n_base * (mult-1) drops (every
  planted copy except its lowest-id twin must drop).

Usage: python scripts/scaleup_r11cand.py [sf_dir]
Env:   CBS_R11_DSIR_MULTS=1,10,50  CBS_R11_SEM_MULTS=1,4,10
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from types import SimpleNamespace

from clinical_bi_spark.queries import pipelineops, vectorops
from clinical_bi_spark.session import get_spark, warm
from scripts.scaleup_r7ops import _replicated
from scripts.scaleup_r8ops import _time

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark("scaleup-r11cand")
    spark.sparkContext.setLogLevel("ERROR")
    warm(spark)
    par = spark.sparkContext.defaultParallelism

    docs_base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb_base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_docs, n_emb = docs_base.count(), emb_base.count()

    dsir_mults = tuple(
        int(m)
        for m in os.environ.get("CBS_R11_DSIR_MULTS", "1,10,50").split(",")
    )
    sem_mults = tuple(
        int(m)
        for m in os.environ.get("CBS_R11_SEM_MULTS", "1,4,10").split(",")
    )

    for mult in dsir_mults:
        docs = (
            _replicated(docs_base, mult, {"doc_id": n_docs})
            .repartition(par)
            .persist()
        )
        docs.count()
        t = SimpleNamespace(documents=docs)
        sec, n_out = _time(pipelineops, pipelineops.data_dsir_select, spark, t)
        docs.unpersist()
        print(f"dsir x{mult} docs={n_docs * mult} sec={sec} rows={n_out}",
              flush=True)

    for mult in sem_mults:
        emb = (
            _replicated(emb_base, mult, {"vec_id": n_emb})
            .repartition(par)
            .persist()
        )
        emb.count()
        t = SimpleNamespace(embeddings=emb)
        sec, n_out = _time(
            vectorops, vectorops.dedup_semantic_cluster, spark, t
        )
        # drop census through the monkeypatched loader
        orig = vectorops.load_tables
        vectorops.load_tables = lambda _s, _d, _t=t: _t
        try:
            res = vectorops.dedup_semantic_cluster(spark, SF_DIR)
            n_drop = res.filter("dropped").count()
        finally:
            vectorops.load_tables = orig
        emb.unpersist()
        floor = n_emb * (mult - 1)
        ok = n_drop >= floor
        print(
            f"semdedup x{mult} vecs={n_emb * mult} sec={sec} rows={n_out} "
            f"drops={n_drop} (planted-copy floor {floor}: "
            f"{'OK' if ok else 'VIOLATED'})",
            flush=True,
        )
        if not ok:
            sys.exit(1)

    # --- K-scaling row (r10 verdict Next #7): the paper's recipe scales
    # K with the corpus, which bounds |cell| and kills the fixed-K
    # quadratic. Pin that cost model with measured numbers: hold the
    # corpus at the largest replication and sweep K upward — pair count
    # (sum over cells of |cell|-choose-2 survivors of the eps filter)
    # and wall should both FALL as cells shrink. The registered query
    # stays K=16 (what the DuckDB oracle unrolls); this sweep drives the
    # parameterized pipeline directly.
    from clinical_bi_spark.queries.vectorops import _semdedup_pipeline

    kmult = max(sem_mults)
    emb = (
        _replicated(emb_base, kmult, {"vec_id": n_emb})
        .repartition(par)
        .persist()
    )
    emb.count()
    ks = tuple(
        int(k) for k in os.environ.get("CBS_R11_SEM_KS", "16,64,256").split(",")
    )
    for k in ks:
        import time as _time_mod

        t0 = _time_mod.perf_counter()
        res = _semdedup_pipeline(spark, emb, n_cells=k).persist()
        n_out = res.count()
        sec = round(_time_mod.perf_counter() - t0, 2)
        n_drop = res.filter("dropped").count()
        pair_vol = (
            res.groupBy().sum("n_neighbors").collect()[0][0] or 0
        ) // 2
        res.unpersist()
        print(
            f"semdedup-K x{kmult} vecs={n_emb * kmult} K={k} sec={sec} "
            f"rows={n_out} eps_pairs={pair_vol} drops={n_drop}",
            flush=True,
        )
    emb.unpersist()


if __name__ == "__main__":
    main()
