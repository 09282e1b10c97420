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
#: decides which queries get a driver verdict each round.
#:
#: ROUND-8 WINDOW. Slot budget, in priority order:
#: (1) queries whose implementation CHANGED this round —
#:     dedup_jaccard_prefix (PPJoin positional filter),
#:     evt_cep_pattern (re-expressed through the parameterized
#:     cep_pattern_match machinery), evt_cep_pattern_quantified (NEW:
#:     signup+ error{2,} view+ quantified spec) — plus the thirteen NEW r8
#:     exact-oracle queries (A-Res weighted sampling, keep-best
#:     survivorship, forward-fill, temporal split, PMI collocations,
#:     Benford audit, Welch t-test, RFM segmentation, deterministic PCA,
#:     winsorized mean, Poisson-bootstrap CI, time-bounded funnel,
#:     directed containment join):
#:     never-adjudicated new code outranks re-greening unchanged r5
#:     code (established policy), displacing w4_rank_battery / set_ops
#:     / sort_limit_topn / text_language_id / m12_stratified_sample /
#:     f6_f7_date_functions / j_semi_anti_exists / m13_auc_rank / w1_topk_per_group / m1_keyed_split /
#:     m2_encoder_chain / f3_pattern_classifier /
#:     j7_frequency_enrichment / f10_sed_cleanse to r9
#:     with the rest of the r5 block;
#: (2) the 23 r4-green entries at (past) the 3-round staleness ceiling —
#:     the r7 verdict's top rotation ask; every one leads the window;
#: (3) headliners (flagship / dashboard), every round;
#: (4) stale rows-only rotation (2-3 per round): agg_percentiles_approx
#:     (r3 row), sim_ann_pq (r4), m3_feature_importance (r5);
#: (5) the 2 oldest r5-green exact entries that still fit (the
#:     remainder — 31 more r5-green entries plus rows-only
#:     m8_vocab_embedding_trained — hit the 3-round ceiling at r9 and
#:     are due FIRST there, before any r6/r7-green entry rotates again:
#:     agg_rollup, agg_salted_count, data_global_shuffle,
#:     data_mixture_sample, dedup_incremental, dedup_ngram_jaccard,
#:     etl_cohort_conditional_agg, f6_f7_date_functions,
#:     j_semi_anti_exists, m12_stratified_sample, m13_auc_rank,
#:     merge_upsert_emulation, set_ops, sim_bruteforce_topk,
#:     sort_limit_topn, text_chunk_dedup, text_corpus_rollup,
#:     text_language_id, text_lm_score, text_redact_pii,
#:     text_repetition, text_tfidf_topk, text_winnow_fingerprint,
#:     vec_norm_rollup, w1_topk_per_group, w4_rank_battery).
#: Streaming stays at the TAIL (a wedged stream must only cost
#: streaming rows): the three whose code changed this round —
#: stream_stateful_user_stats and stream_cep_pattern (eviction
#: dual-path + chunk-order hardening in streaming/stateful.py), the
#: NEW stream_cep_pattern_quantified, and the NEW stream_forward_fill
#: (streaming LOCF; newest last).
#:
#: Round-7 rationale (history). Slot budget, in priority order:
#: (1) queries whose implementation or oracle CHANGED this round —
#:     agg_chi_square (empty-cell fix), j_fuzzy_editdist_pairs +
#:     entity_resolution_parts (short-string residue in the PassJoin
#:     operator), sim_ann_lsh (exact-arith env gate; the driver runs the
#:     exact default), sim_ann_ivf (GRADUATED: deterministic Lloyd's fit
#:     + fully exact oracle, new code);
#: (2) the 25 never-adjudicated late-r6 queries — every one gets its
#:     first driver row so the r1–r7 union covers all 146 registry
#:     entries (the r6 verdict's top ask). The two rows-only media
#:     entries (multimodal_resize_jpeg / multimodal_video_mjpeg_frames)
#:     ride along as promised: lossy codecs, rows-only by construction,
#:     error bounds pinned in pytest;
#: (3) headliners (flagship / dashboard), every round;
#: (4) the r4-green blocks at the 3-round staleness ceiling: the four
#:     etl_* domain entries and the w3/cube/pivot/unpivot window block;
#: (5) stale rows-only entries per the r6 verdict's "cycle 2–3 per
#:     round": m9 / a3_approx / agg_percentiles_approx (r3 rows) and
#:     sim_ann_pq (r4 row);
#: (6) the oldest remaining r4-green entries that fit: asof_join_events,
#:     dedup_exact, dedup_embedding_cosine, a3_multi_count_distinct,
#:     agg_pricing_summary, p_filter_conjunction, f_scalar_battery,
#:     evt_tumbling_window.
#: Streaming stays at the TAIL (a wedged stream must only cost
#: streaming rows): stream_sliding_window is the one streaming entry
#: this round and sits last. Still r4-green and deferred to r8 (window
#: full): the evt_* remainder (sliding/sessionization/json_extract/
#: dedup_window/group_zscore/group_zscore_window/funnel/retention),
#: text_stats, text_quality_score, m8_vocab_embedding,
#: multimodal_features, multimodal_resize_bmp, data_quality_select,
#: data_snapshot_diff — they are due FIRST in r8, before anything
#: r5/r6-green rotates again.
#:
#: Round-6 rationale (history):
#: (1) every query whose implementation or oracle changed this round —
#: sim_ann_lsh's new exact oracle, the repartitioned multimodal entries,
#: the tracked-persist refactor (touches every dedup/similarity/textops/
#: packing persist site), the connected-components checkpoint rewrite,
#: and the Word2Vec degenerate-corpus guard; (2) headliners; (3) the
#: whole r3-green block, now at the 3-round staleness ceiling; (4) the
#: r4-green remainder the r5 brief named as due (windows/cube/pivot/
#: unpivot, multi-count-distinct, the etl domain entries, the evt core,
#: the embedding-cosine pair miner, and the two bench watch items
#: dedup_exact / asof_join_events). Mid-round re-rotation: the six NEW
#: exact-oracle queries (scd2 / stats battery / pagerank / markov /
#: array battery / chunk split) enter the window — new code with an
#: exact oracle outranks everything else — displacing the six ROWS-ONLY
#: entries (sim_ann_ivf/pq, m8_trained, m9, a3_approx,
#: agg_percentiles_approx): a rows-only driver row only proves "runs",
#: which pytest already proves each session, while those queries' real
#: contracts (recall floors on two fixture families, error bounds,
#: parity pins) live in tests/ — the same reasoning that kept
#: multimodal_resize_jpeg outside the window. A second batch of four NEW
#: exact-oracle queries (range window / dq report / fuzzy join / CDC
#: upsert) displaced the r4-green-on-unchanged-code remainder
#: (a3_multi_count_distinct, dedup_exact, evt_tumbling_window,
#: evt_sessionization): those four carry r4 driver greens, per-session
#: pytest oracle re-runs, and — for the latter three — bench floors
#: re-confirmed twice this round; a never-adjudicated exact query
#: outranks re-confirming them a third way.
#: Streaming sits at the window's TAIL:
#: a wedged stateful stream must only ever cost later *streaming* rows,
#: never a batch family (round-1 lesson; all six streaming queries
#: changed this round — multi-batch plumbing — so they are inside the
#: window but still last). Entries not named here keep module import
#: order after the priority block — all have green r4/r5 verdicts on
#: code unchanged since (see the deferred-to-r7 list below).
_DRIVER_WINDOW_PRIORITY: tuple[str, ...] = (
    # -- (1) implementation changed / NEW this round (r8) --
    "dedup_jaccard_prefix",       # PPJoin positional filter
    "evt_cep_pattern",            # parameterized machinery refactor
    "evt_cep_pattern_quantified", # NEW: signup+ error{2,} view+
    "data_weighted_sample",       # NEW: A-Res weighted sample w/o repl.
    "dedup_keep_best",            # NEW: survivorship map, word-set clusters
    "evt_forward_fill",           # NEW: LOCF gap repair
    "m19_temporal_split",         # NEW: temporal split + leakage audit
    "text_bigram_pmi_topk",       # NEW: PMI collocation mining
    "agg_benford_firstdigit",     # NEW: Benford first-digit audit
    "agg_ttest_welch",            # NEW: Welch t from exact power sums
    "evt_rfm_segmentation",       # NEW: RFM quintile segmentation
    "vec_pca_power_top1",         # NEW: deterministic PCA power iteration
    "agg_winsorized_mean",        # NEW: exact-decomposition robust mean
    "agg_bootstrap_ci_mean",      # NEW: deterministic Poisson bootstrap
    "evt_funnel_time_bounded",    # NEW: conversion-window funnel
    "dedup_containment_prefix",   # NEW: directed containment join
    # -- (2) the 23 r4-green entries at/past the staleness ceiling --
    "a3_multi_count_distinct",
    "agg_pricing_summary",
    "asof_join_events",
    "data_quality_select",
    "data_snapshot_diff",
    "dedup_embedding_cosine",
    "dedup_exact",
    "evt_dedup_window",
    "evt_funnel_conversion",
    "evt_group_zscore",
    "evt_group_zscore_window",
    "evt_json_extract",
    "evt_retention_cohorts",
    "evt_sessionization",
    "evt_sliding_window",
    "evt_tumbling_window",
    "f_scalar_battery",
    "m8_vocab_embedding",
    "multimodal_features",
    "multimodal_resize_bmp",
    "p_filter_conjunction",
    "text_quality_score",
    "text_stats",
    # -- (3) headliners, every round --
    "flagship_feature_query",
    "dashboard_extract",
    # -- (4) stale rows-only rotation --
    "agg_percentiles_approx",
    "sim_ann_pq",
    "m3_feature_importance",
    # -- (5) oldest r5-green exact entries (16 of 33; remainder due r9) --
    "j2_selfjoin_fanout",
    "w2_running_total",
    # -- streaming LAST within the checked window (all three changed
    #    this round: eviction dual-path / parameterized CEP) --
    "stream_stateful_user_stats",
    "stream_cep_pattern",
    "stream_cep_pattern_quantified",
    "stream_forward_fill",  # NEW r8 streaming LOCF — newest last
)
# LATE-r8 additions with no window slot (the window was already
# committed when they landed; they carry session oracle checks and are
# due FIRST in r9 alongside the r5 block): text_char_entropy,
# evt_changepoint_cusum.
# Deferred to r9, due FIRST there (r5-green entries that reach the
# 3-round staleness ceiling at r9; the window could not hold all 33
# alongside the 23 r4-stale rows this round): agg_rollup,
# agg_salted_count, data_global_shuffle, data_mixture_sample,
# dedup_incremental, dedup_ngram_jaccard, etl_cohort_conditional_agg,
# merge_upsert_emulation, sim_bruteforce_topk, text_chunk_dedup,
# text_corpus_rollup, text_lm_score, text_redact_pii, text_repetition,
# text_tfidf_topk, text_winnow_fingerprint, vec_norm_rollup — plus the
# r5 rows-only m8_vocab_embedding_trained (2-3-per-round rows-only
# policy) and the r7 rows-only m9_mlp_train_eval /
# a3_approx_count_distinct as slots allow.


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
        graph,
        mlops,
        multimodalops,
        quality,
        sketchops,
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
