"""Scale-up measurement for the pipelineops family (PERF.md methodology:
same plans, replicated data, warmed session, cached input so the operator
— not the parquet read — is timed).

Replication shifts doc_id by k*offset per copy so ids stay unique (the
mixture/shuffle hashes see distinct keys); text duplicates across copies,
which is what a real crawl replay looks like to the dedup/chunk ops.

Usage: python scripts/scaleup_pipelineops.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
from types import SimpleNamespace

from pyspark.sql import functions as F

from clinical_bi_spark.queries import pipelineops
from clinical_bi_spark.session import get_spark, warm

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
QUERIES = [
    "dedup_incremental",
    "data_mixture_sample",
    "data_global_shuffle",
    "text_chunk_dedup",
]


def main() -> None:
    spark = get_spark("scaleup-pipelineops")
    spark.sparkContext.setLogLevel("ERROR")
    warm(spark)
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_base = base.count()
    offset = n_base + 1

    fns = {name: getattr(pipelineops, name) for name in QUERIES}

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
        docs = docs.repartition(spark.sparkContext.defaultParallelism).persist()
        docs.count()  # materialize the cache

        tables = SimpleNamespace(documents=docs)
        orig = pipelineops.load_tables
        pipelineops.load_tables = lambda _spark, _sf, _t=tables: _t
        try:
            row = {"rows": n_base * mult}
            for name, fn in fns.items():
                best = float("inf")
                for _ in range(2):
                    start = time.perf_counter()
                    fn(spark, SF_DIR).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    best = min(best, time.perf_counter() - start)
                row[name] = round(best, 2)
            print(f"x{mult}", row, flush=True)
        finally:
            pipelineops.load_tables = orig
            docs.unpersist()


if __name__ == "__main__":
    main()
