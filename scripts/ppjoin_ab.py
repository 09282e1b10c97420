"""A/B the PPJoin positional filter's candidate cut for
dedup_jaccard_prefix at replicated scale (r8 brief item #3).

For each multiplier: count candidate pairs surviving (a) length-ratio
only (the r7 form) vs (b) + positional filter (the r8 form), and time
the full query end-to-end with the filter on. The replication scheme is
scaleup_linkage.replicate (copy-distinct suffix tokens: near-pair
structure replicates within copies).

Usage: python scripts/ppjoin_ab.py [sf_dir]
Env:   CBS_PP_MULTS=1,16      multipliers (default 1,16)
       CBS_PP_E2E=1           also time the full query per cell
       CBS_PP_CAND=0          skip the candidate-count A/B (e2e only —
                              the unfiltered count at x50 worst-case is
                              the job that hits the spill-disk ceiling)
       CBS_PP_MODE=linear     20 copy-distinct suffix tokens per copy
                              (cross-copy J = 0.62 < 0.8 — the
                              constant-duplication-ratio regime a real
                              corpus exhibits; default: worst-case
                              single token)
       CBS_PP_TOKENMODES=u64,str   r9: A/B the token representation in
                              the e2e run — u64 (hash-exact w/ audit,
                              the new default) vs str (r8 baseline).
                              Each e2e cell also records the run's
                              total shuffle write bytes (UI REST API)
                              and asserts output-pair-count equality
                              across modes.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from clinical_bi_spark import caching
from clinical_bi_spark.functions.text import word_tokens
from clinical_bi_spark.queries import textops
from clinical_bi_spark.queries.textops import (
    _JACCARD_TAU,
    _jaccard_prefix_candidates,
)
from clinical_bi_spark.session import get_spark, tune, warm
from clinical_bi_spark.sources import load_tables
from scripts.scaleup_linkage import replicate

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def _shuffle_write_bytes(spark) -> int | None:
    """Total shuffle write bytes across all completed stages so far, via
    the UI REST API (None if the UI is disabled)."""
    import json
    import urllib.request

    url = spark.sparkContext.uiWebUrl
    if not url:
        return None
    app_id = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{url}/api/v1/applications/{app_id}/stages?status=complete",
            timeout=10,
        ) as resp:
            stages = json.load(resp)
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)
    except Exception:
        return None


def main() -> None:
    spark = get_spark("ppjoin-ab")
    spark.sparkContext.setLogLevel("ERROR")
    warm(spark)
    t = load_tables(tune(spark), SF_DIR)
    mults = tuple(
        int(m) for m in os.environ.get("CBS_PP_MULTS", "1,16").split(",")
    )
    e2e = os.environ.get("CBS_PP_E2E", "0") == "1"

    n_tokens = 20 if os.environ.get("CBS_PP_MODE", "") == "linear" else 1
    for mult in mults:
        docs = replicate(
            t.documents.select("doc_id", "text"), mult, "doc_id", "text",
            100_000_000, n_tokens=n_tokens,
        ).persist()
        docs.count()
        toks = docs.select(
            "doc_id",
            F.array_distinct(word_tokens(F.lower(F.col("text")))).alias(
                "words"
            ),
        ).filter(F.size("words") >= 1)
        row: dict = {"docs": docs.count()}
        cand_ab = (
            ((False, "cand_lenratio"), (True, "cand_pos"))
            if os.environ.get("CBS_PP_CAND", "1") != "0"
            else ()
        )
        for positional, label in cand_ab:
            start = time.perf_counter()
            n = _jaccard_prefix_candidates(
                toks, _JACCARD_TAU, positional=positional
            ).count()
            row[label] = n
            row[label + "_sec"] = round(time.perf_counter() - start, 2)
            caching.release_all(spark)
        if cand_ab:
            row["cut"] = round(
                row["cand_lenratio"] / max(row["cand_pos"], 1), 2
            )

        if e2e:
            from types import SimpleNamespace

            tables = SimpleNamespace(documents=docs)
            orig = textops.load_tables
            textops.load_tables = lambda _s, _d, _t=tables: _t
            modes = os.environ.get("CBS_PP_TOKENMODES", "u64").split(",")
            # restore (not just pop) the user's token mode afterwards —
            # popping an exported value would flip later runs in the
            # same shell-inherited environment (r9 ADVICE)
            prior_mode = os.environ.get("CLINICAL_BI_JACCARD_TOKENS")
            try:
                for mode in modes:
                    os.environ["CLINICAL_BI_JACCARD_TOKENS"] = mode
                    sw0 = _shuffle_write_bytes(spark)
                    start = time.perf_counter()
                    row[f"pairs_{mode}"] = textops.dedup_jaccard_prefix(
                        spark, SF_DIR
                    ).count()
                    row[f"e2e_sec_{mode}"] = round(
                        time.perf_counter() - start, 2
                    )
                    sw1 = _shuffle_write_bytes(spark)
                    if sw0 is not None and sw1 is not None:
                        row[f"shuffle_gb_{mode}"] = round(
                            (sw1 - sw0) / 1e9, 2
                        )
                    caching.release_all(spark)
                pair_counts = {row[f"pairs_{m}"] for m in modes}
                assert len(pair_counts) == 1, (
                    f"token modes disagree on output: {row}"
                )
            finally:
                textops.load_tables = orig
                if prior_mode is None:
                    os.environ.pop("CLINICAL_BI_JACCARD_TOKENS", None)
                else:
                    os.environ["CLINICAL_BI_JACCARD_TOKENS"] = prior_mode
            caching.release_all(spark)
        docs.unpersist()
        print(f"x{mult}", row, flush=True)


if __name__ == "__main__":
    main()
