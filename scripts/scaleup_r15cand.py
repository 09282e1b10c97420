"""Scale-up measurement for the parked r15 candidates
(text_bpe_train_encode over replicated documents, data_zorder_layout
over replicated orders) — replication methodology (see
scaleup_multimodal.py: shifted doc_id copies, warmed session, cached
input, min-of-2). The scale claim under test: the ONLY fact-scale work
is the word-count groupBy and the final broadcast-join encode; all
training rounds iterate on the DISTINCT-WORD relation, which is
INVARIANT to corpus replication (the fixture's vocabulary saturates),
so wall should stay flat while events-per-round stay constant.

Usage: python scripts/scaleup_r15cand.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
from types import SimpleNamespace

from pyspark.sql import functions as F

from clinical_bi_spark.queries import textops
from clinical_bi_spark.session import get_spark, warm

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark("scaleup-r15cand")
    spark.sparkContext.setLogLevel("ERROR")
    warm(spark)
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_base = base.count()
    offset = n_base + 1

    for mult in (1, 10, 50):
        docs = base
        if mult > 1:
            docs = base.select(
                F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("k"),
                "*",
            ).select(
                (F.col("doc_id") + F.col("k") * offset).alias("doc_id"),
                *[c for c in base.columns if c != "doc_id"],
            )
        docs = docs.repartition(
            spark.sparkContext.defaultParallelism
        ).persist()
        docs.count()

        tables = SimpleNamespace(documents=docs)
        orig = textops.load_tables
        textops.load_tables = lambda _spark, _sf, _t=tables: _t
        try:
            best = float("inf")
            for _ in range(2):
                start = time.perf_counter()
                textops.text_bpe_train_encode(spark, SF_DIR).write.format(
                    "noop"
                ).mode("overwrite").save()
                best = min(best, time.perf_counter() - start)
            print(
                f"x{mult}",
                {
                    "docs": n_base * mult,
                    "text_bpe_train_encode": round(best, 2),
                },
                flush=True,
            )
        finally:
            textops.load_tables = orig
            docs.unpersist()

    from clinical_bi_spark.queries import pipelineops

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    n_ord = orders.count()
    for mult in (1, 10, 50):
        o = orders
        if mult > 1:
            o = orders.select(
                F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("k"),
                "*",
            ).select(
                (F.col("o_orderkey") + F.col("k") * (n_ord + 1)).alias(
                    "o_orderkey"
                ),
                *[c for c in orders.columns if c != "o_orderkey"],
            )
        o = o.repartition(spark.sparkContext.defaultParallelism).persist()
        o.count()
        tables = SimpleNamespace(orders=o)
        orig = pipelineops.load_tables
        pipelineops.load_tables = lambda _spark, _sf, _t=tables: _t
        try:
            best = float("inf")
            for _ in range(2):
                start = time.perf_counter()
                pipelineops.data_zorder_layout(spark, SF_DIR).write.format(
                    "noop"
                ).mode("overwrite").save()
                best = min(best, time.perf_counter() - start)
            print(
                f"x{mult}",
                {"orders": n_ord * mult, "data_zorder_layout": round(best, 2)},
                flush=True,
            )
        finally:
            pipelineops.load_tables = orig
            o.unpersist()


if __name__ == "__main__":
    main()
