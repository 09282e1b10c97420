"""Scale-up measurement for the parked r13 mp4 candidate
(multimodal_video_mp4_samples): writer + parser + keyframe extraction is
CPU-bound per asset, so per the multimodal methodology (see
scaleup_multimodal.py) multipliers are (1, 4, 16) and the claim under
test is a FLAT per-asset cost — the operator is two chained mapInPandas
stages with no shuffle before the final projection, so any super-linear
cell would indicate an Arrow-batch or per-asset pathology, not a plan
problem.

Usage: python scripts/scaleup_mp4.py [sf_dir]
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


def main() -> None:
    spark = get_spark("scaleup-mp4")
    spark.sparkContext.setLogLevel("ERROR")
    warm(spark)
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_base = base.count()
    offset = n_base + 1

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
            best = float("inf")
            out_rows = None
            for _ in range(2):
                start = time.perf_counter()
                df = multimodalops.multimodal_video_mp4_samples(spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - start)
            out_rows = multimodalops.multimodal_video_mp4_samples(
                spark, SF_DIR
            ).count()
            print(
                f"x{mult}",
                {
                    "assets": n_base * mult,
                    "sample_rows": out_rows,
                    "multimodal_video_mp4_samples": round(best, 2),
                },
                flush=True,
            )
        finally:
            multimodalops.load_tables = orig
            docs.unpersist()


if __name__ == "__main__":
    main()
