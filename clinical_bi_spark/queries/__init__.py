"""Query registry — the engine's public query surface.

Every implemented operator from SURVEY.md §2 (plus the training-data
pipeline extensions) registers here as a named query:

* a Spark callable ``(spark, sf_dir) -> DataFrame`` — the engine under test
* an optional ANSI-SQL oracle string for DuckDB — the correctness contract

The driver (``__spark_entry__``) exposes exactly this registry. Names carry
the SURVEY.md §2 inventory IDs they cover so parity can be checked line by
line.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # None → driver records a rows-only check
    bench: bool = False  # include in bench.py headline set
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, bench: bool = False):
    """Register a query; the decorated fn is ``(spark, sf_dir) -> DataFrame``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, bench=bench, doc=(fn.__doc__ or "").strip()
        )
        return fn

    return deco


#: The driver records correctness rows for registry[:50] only, so ordering
#: decides which queries get a driver verdict each round. Round-5 priority:
#: (1) every query whose implementation or oracle changed this round (the
#: newly-oracled portable-hash family minhash/simhash×2/embedding-lsh, the
#: cohort Expand-removal rewrite, the LMG lstsq hardening, the
#: connected-components cache-release change feeding dedup_cluster_winnow);
#: (2) the two r4-changed queries the r4 window missed
#: (text_winnow_fingerprint, dedup_decontaminate — builder policy: changed
#: code gets a current-round row); (3) headliners; (4) the entire r2-era
#: block, now 3 rounds stale — the staleness ceiling; (5) the oldest
#: r3-green entries. Streaming sits at the window's TAIL: a wedged
#: stateful stream must only ever cost later *streaming* rows, never a
#: batch family (round-1 lesson; stream_dedup_watermark changed this
#: round, so streaming is inside the window but still last). Entries not
#: named here keep module import order after the priority block — all
#: have green r4 (or r3 rows-only) verdicts on code unchanged since.
_DRIVER_WINDOW_PRIORITY: tuple[str, ...] = (
    # -- implementation / oracle changed this round --
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_blocked",
    "dedup_embedding_lsh",
    "etl_cohort_conditional_agg",
    "m3_feature_importance",
    "dedup_cluster_winnow",
    # -- changed in r4 but missed the r4 window (stated policy) --
    "text_winnow_fingerprint",
    "dedup_decontaminate",
    # -- headliners, every round --
    "flagship_feature_query",
    "dashboard_extract",
    # -- the whole r2-era block: last driver rows are r2, 3 rounds stale --
    "j2_selfjoin_fanout",
    "f3_pattern_classifier",
    "f6_f7_date_functions",
    "f10_sed_cleanse",
    "m1_keyed_split",
    "m2_encoder_chain",
    "w1_topk_per_group",
    "w2_running_total",
    "set_ops",
    "sort_limit_topn",
    "j7_frequency_enrichment",
    "j_semi_anti_exists",
    "m12_stratified_sample",
    "w4_rank_battery",
    "m13_auc_rank",
    "text_language_id",
    "dedup_ngram_jaccard",
    "text_corpus_rollup",
    "text_repetition",
    "text_redact_pii",
    "text_tfidf_topk",
    "sim_bruteforce_topk",
    "vec_norm_rollup",
    # -- oldest r3-green entries (the rest of the r3 block rotates in r6) --
    "text_sequence_packing",
    "dedup_incremental",
    "data_mixture_sample",
    "data_global_shuffle",
    "text_chunk_dedup",
    "agg_rollup",
    "merge_upsert_emulation",
    "agg_salted_count",
    # -- new this round (exact-oracled LM scorer; learned-weights query) --
    "text_lm_score",
    "m8_vocab_embedding_trained",
    # -- streaming LAST within the checked window --
    "stream_tumbling_window",
    "stream_stream_join",
    "stream_session_window",
    "stream_dedup_watermark",
    "stream_stateful_user_stats",
    "stream_corpus_curation",
)


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (registration side effect) and return the
    registry, reordered so the driver's 50-row correctness window lands on
    the entries that most need adjudication this round (see
    ``_DRIVER_WINDOW_PRIORITY``)."""
    from clinical_bi_spark.queries import (  # noqa: F401
        relational,
        textops,
        vectorops,
        pipelineops,
        extended,
        events,
        mlops,
        multimodalops,
        streamingops,
    )

    # fail LOUDLY on a priority name that doesn't resolve: a silent skip
    # would compact the 50-slot adjudication window and slide an unintended
    # entry in while a changed query falls out — defeating the "changed
    # code gets a current-round row" policy with no failing signal
    missing = [n for n in _DRIVER_WINDOW_PRIORITY if n not in REGISTRY]
    if missing:
        raise ValueError(
            f"_DRIVER_WINDOW_PRIORITY names not in registry: {missing}"
        )
    ordered: dict[str, QuerySpec] = {}
    for name in _DRIVER_WINDOW_PRIORITY:
        ordered[name] = REGISTRY[name]
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered
