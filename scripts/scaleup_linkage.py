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
Env:
  CBS_LINK_MULTS=1,16,50   multipliers (default 1,4,16)
  CBS_JACCARD_MODE=linear  append 20 copy-distinct tokens instead of one
                           (cross-copy Jaccard 64/104=0.62 < 0.8 — the
                           constant-duplication-ratio regime a real
                           corpus exhibits; default: worst-case single
                           shared-shape token)
  CBS_LINK_ER=1            also time entity resolution (PassJoin -> CC
                           -> canonical entities) on the replicated parts
  CBS_LINK_REPEATS=N       timing repeats per cell (default 2)
  CBS_LINK_SKIP_JACCARD=1  fuzzy/ER only (the x50 jaccard shuffle spills
                           ~10x the fuzzy one; run it as its own pass so
                           one cell's disk peak never kills another's)
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


def replicate(df, mult, id_col, text_col, id_offset, n_tokens: int = 1):
    """×mult with a copy-distinct suffix. The suffix is two 3-char runs
    keyed base-26 on the copy index, so ANY two distinct copies differ by
    edit distance >= 3 > K=2 at any multiplier (the old single-run
    chr(97+k%26) scheme collided past x26). ``n_tokens > 1`` appends that
    many copy-distinct tokens — the Jaccard linear regime, where
    cross-copy similarity drops below the threshold instead of riding
    just above it."""
    if mult == 1:
        return df
    k = F.col("k").cast("bigint")
    run = (
        "concat(repeat(chr(97 + CAST(k AS INT) / 26), 3),"
        " repeat(chr(97 + CAST(k AS INT) % 26), 3))"
    )
    parts = [F.lit(" "), F.expr(run)]
    for i in range(1, n_tokens):
        parts += [F.lit(" "), F.expr(f"concat({run}, '{i:02d}')")]
    suffix = F.concat(*parts)
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

    mults = tuple(
        int(m)
        for m in os.environ.get("CBS_LINK_MULTS", "1,4,16").split(",")
    )
    jac_tokens = (
        20 if os.environ.get("CBS_JACCARD_MODE", "") == "linear" else 1
    )
    time_er = os.environ.get("CBS_LINK_ER", "0") == "1"
    repeats = int(os.environ.get("CBS_LINK_REPEATS", "2"))

    for mult in mults:
        parts = replicate(
            base_parts, mult, "p_partkey", "p_name", 100_000_000
        ).persist()
        parts.count()
        row = {"parts": n_parts * mult}
        best, pairs = float("inf"), 0
        for _ in range(repeats):
            start = time.perf_counter()
            pairs = editdist_self_join(parts, "p_partkey", "p_name", k=2).count()
            best = min(best, time.perf_counter() - start)
        row["fuzzy_sec"], row["fuzzy_pairs"] = round(best, 2), pairs

        if time_er:
            from clinical_bi_spark.operators.dedup import connected_components

            best, n_ent = float("inf"), 0
            for _ in range(repeats):
                start = time.perf_counter()
                prs = editdist_self_join(
                    parts, "p_partkey", "p_name", k=2
                ).select("a_id", "b_id")
                comp = connected_components(
                    prs, src_col="a_id", dst_col="b_id"
                )
                n_ent = comp.select("component").distinct().count()
                best = min(best, time.perf_counter() - start)
                from clinical_bi_spark import caching

                caching.release_all(spark)
            row["er_sec"], row["er_entities"] = round(best, 2), n_ent
        parts.unpersist()

        if os.environ.get("CBS_LINK_SKIP_JACCARD", "0") == "1":
            print(f"x{mult}", row, flush=True)
            continue
        docs = replicate(
            t.documents.select("doc_id", "text"), mult, "doc_id", "text",
            100_000_000, n_tokens=jac_tokens,
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
            for _ in range(repeats):
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
