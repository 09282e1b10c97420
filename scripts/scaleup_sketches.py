"""Scale-up measurement for the sketch family + span dedup (PERF.md
methodology: same plans, replicated data, warmed session, cached inputs so
the operator — not the parquet read — is timed; min of 2 runs per cell).

Replication is chosen per stress axis:

* lineitem copies shift l_orderkey by k*offset → the HLL's DISTINCT
  domain grows with the data (the hard case for a distinct sketch: the
  register table must stay m rows while n_distinct scales 50×).
* l_suppkey is left unchanged → the Bloom build side and its 2 KiB bitmap
  are CONSTANT while the probed fact side scales 50× (the runtime-filter
  regime at 100 TB: tiny dim, huge fact).
* documents copies shift doc_id, duplicating text verbatim → worst case
  for span dedup (every span becomes cross-doc duplicated, so the dup-fp
  set and the semi-join reach their maximum size) and the saturation
  regime for count-min (cells constant, counts 50×).

Usage: python scripts/scaleup_sketches.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
from types import SimpleNamespace

from pyspark.sql import functions as F

from clinical_bi_spark.queries import sketchops, textops
from clinical_bi_spark.session import get_spark, warm

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def replicate(df, mult: int, key: str, offset: int):
    if mult == 1:
        return df
    return df.select(
        F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("k"), "*"
    ).select(
        (F.col(key) + F.col("k") * offset).alias(key),
        *[c for c in df.columns if c != key],
    )


def main() -> None:
    spark = get_spark("scaleup-sketches")
    spark.sparkContext.setLogLevel("ERROR")
    warm(spark)
    par = spark.sparkContext.defaultParallelism
    docs0 = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    li0 = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    dims = {
        t: spark.read.parquet(f"{SF_DIR}/{t}.parquet")
        for t in ("supplier", "nation", "region")
    }
    n_docs, n_li = docs0.count(), li0.count()
    ok_off = li0.agg(F.max("l_orderkey")).collect()[0][0] + 1

    queries = {
        "a3_hll_portable": sketchops.a3_hll_portable,
        "j_bloom_prefilter_join": sketchops.j_bloom_prefilter_join,
        "sketch_countmin_topk": sketchops.sketch_countmin_topk,
        "dedup_span_ngram": textops.dedup_span_ngram,
    }

    for mult in (1, 10, 50):
        docs = replicate(docs0, mult, "doc_id", n_docs + 1).repartition(par).persist()
        li = replicate(li0, mult, "l_orderkey", ok_off).repartition(par).persist()
        docs.count(), li.count()
        tables = SimpleNamespace(documents=docs, lineitem=li, **dims)
        patched = []
        for mod in (sketchops, textops):
            patched.append((mod, mod.load_tables))
            mod.load_tables = lambda _spark, _sf, _t=tables: _t
        try:
            row = {"doc_rows": n_docs * mult, "li_rows": n_li * mult}
            for name, fn in queries.items():
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
            for mod, orig in patched:
                mod.load_tables = orig
            docs.unpersist()
            li.unpersist()


if __name__ == "__main__":
    main()
