"""Scale-up measurement for the corpus-scoring queries (BM25; PERF.md
methodology: same plans, replicated data, warmed session, cached input so
the operator — not the parquet read — is timed).

Replication shifts doc_id by k*offset per copy (ids unique, text
duplicated — crawl-replay shape). For BM25 that growth stresses exactly
the right things: the tf table grows linearly, the df/vocabulary table
stays constant (like a real corpus past vocabulary saturation), and the
query-term join stays a 5-row broadcast at every scale.

Usage: python scripts/scaleup_text_scoring.py [sf_dir]
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
QUERIES = ["text_bm25_topk"]


def main() -> None:
    spark = get_spark("scaleup-text-scoring")
    spark.sparkContext.setLogLevel("ERROR")
    warm(spark)
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_base = base.count()
    offset = n_base + 1

    fns = {name: getattr(textops, name) for name in QUERIES}

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
        orig = textops.load_tables
        textops.load_tables = lambda _spark, _sf, _t=tables: _t
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
            textops.load_tables = orig
            docs.unpersist()


if __name__ == "__main__":
    main()
