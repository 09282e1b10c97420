"""Scale-up measurement for the record-linkage family (fuzzy
edit-distance join + prefix-filtered Jaccard join).

Replication design: verbatim copies would inflate identical-name groups
quadratically (output explosion measures nothing but fan-out), so each
copy k appends a distinct 4-letter suffix token (chr(97+k) * 4) to every
name/text. Cross-copy edit distance is then >= 4 (> K=2) and cross-copy
token sets differ, so the near-pair structure replicates WITHIN copies:
candidates, verifications, and output all scale ~linearly with the
multiplier — the throughput regime, not the blow-up regime.

Usage: python scripts/scaleup_linkage.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

from pyspark.sql import functions as F

from clinical_bi_spark.operators.fuzzy import editdist_self_join
from clinical_bi_spark.queries import textops
from clinical_bi_spark.session import get_spark, tune, warm
from clinical_bi_spark.sources import load_tables

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def replicate(df, mult, id_col, text_col, id_offset):
    if mult == 1:
        return df
    k = F.col("k").cast("bigint")
    suffix = F.concat(
        F.lit(" "),
        F.expr("repeat(chr(97 + CAST(k AS INT) % 26), 4)"),
    )
    return df.select(
        F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("k"), "*"
    ).select(
        (F.col(id_col) + k * F.lit(id_offset).cast("bigint")).alias(id_col),
        F.concat(F.col(text_col), suffix).alias(text_col),
    )


def main() -> None:
    spark = get_spark("scaleup-linkage")
    spark.sparkContext.setLogLevel("ERROR")
    warm(spark)
    t = load_tables(tune(spark), SF_DIR)
    base_parts = t.part.select("p_partkey", "p_name")
    n_parts = base_parts.count()

    for mult in (1, 4, 16):
        parts = replicate(
            base_parts, mult, "p_partkey", "p_name", 100_000_000
        ).persist()
        parts.count()
        row = {"parts": n_parts * mult}
        best, pairs = float("inf"), 0
        for _ in range(2):
            start = time.perf_counter()
            pairs = editdist_self_join(parts, "p_partkey", "p_name", k=2).count()
            best = min(best, time.perf_counter() - start)
        row["fuzzy_sec"], row["fuzzy_pairs"] = round(best, 2), pairs
        parts.unpersist()

        docs = replicate(
            t.documents.select("doc_id", "text"), mult, "doc_id", "text",
            100_000_000,
        ).persist()
        docs.count()
        # drive the jaccard-prefix query against the replicated docs via
        # the same monkeypatch pattern the other scale harnesses use
        from types import SimpleNamespace

        tables = SimpleNamespace(documents=docs)
        orig = textops.load_tables
        textops.load_tables = lambda _s, _d, _t=tables: _t
        try:
            best, pairs = float("inf"), 0
            for _ in range(2):
                start = time.perf_counter()
                pairs = textops.dedup_jaccard_prefix(spark, SF_DIR).count()
                best = min(best, time.perf_counter() - start)
                from clinical_bi_spark import caching

                caching.release_all(spark)
        finally:
            textops.load_tables = orig
        row["jaccard_sec"], row["jaccard_pairs"] = round(best, 2), pairs
        docs.unpersist()
        print(f"x{mult}", row, flush=True)


if __name__ == "__main__":
    main()
