"""Scale-up measurement for the multimodal codec family — the Arrow
mapInPandas-heaviest paths (PPM resize, WAV audio features). PERF.md
methodology: same plans, replicated documents (shifted doc_id), warmed
session, cached input, min of 2 runs per cell.

Multipliers are (1, 4, 16) rather than the batch families' (1, 10, 50):
the codec work is CPU-bound per document (not shuffle-bound), so the
linearity question is answered at 16× without burning 50× of pure pixel
arithmetic; what matters is that per-doc cost stays FLAT as the corpus
grows (no super-linear cell) and that the byte-budget repartition keeps
every Arrow batch bounded.

Usage: python scripts/scaleup_multimodal.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
from types import SimpleNamespace

from pyspark.sql import functions as F

from clinical_bi_spark.queries import multimodalops
from clinical_bi_spark.session import get_spark, warm

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
QUERIES = ["multimodal_resize", "multimodal_audio_features"]


def main() -> None:
    spark = get_spark("scaleup-multimodal")
    spark.sparkContext.setLogLevel("ERROR")
    warm(spark)
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_base = base.count()
    offset = n_base + 1

    fns = {name: getattr(multimodalops, name) for name in QUERIES}

    for mult in (1, 4, 16):
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
        docs.count()

        tables = SimpleNamespace(documents=docs)
        orig = multimodalops.load_tables
        multimodalops.load_tables = lambda _spark, _sf, _t=tables: _t
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
            multimodalops.load_tables = orig
            docs.unpersist()


if __name__ == "__main__":
    main()
