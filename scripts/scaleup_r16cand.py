"""Scale-up measurement for the parked r16 candidates
(multimodal_audio_resample, multimodal_image_patches) — multimodal
methodology (see scaleup_multimodal.py: CPU-bound per asset ⇒
multipliers 1/4/16, replicated documents, warmed session, min-of-2).
Both are per-asset-independent mapInPandas codec paths; the claim is a
FLAT per-asset cost under replication.

Usage: python scripts/scaleup_r16cand.py [sf_dir]
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
QUERIES = ["multimodal_audio_resample", "multimodal_image_patches"]


def main() -> None:
    spark = get_spark("scaleup-r16cand")
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
        docs = docs.repartition(
            spark.sparkContext.defaultParallelism
        ).persist()
        docs.count()

        tables = SimpleNamespace(documents=docs)
        orig = multimodalops.load_tables
        multimodalops.load_tables = lambda _spark, _sf, _t=tables: _t
        try:
            row = {"assets": n_base * mult}
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
