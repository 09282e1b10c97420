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
#: decides which queries get a driver verdict each round. Round-4 priority:
#: every query whose implementation or oracle changed this round (newly
#: oracled m8/multimodal_features/streaming trio, the curation cache
#: restructure, the winnow/CC hardening, the LMG rewrite), the whole
#: events family (the parquet nanos column now infers as TIMESTAMP_NTZ —
#: normalize_events changed, so every ts-carrying output needs a
#: current-round row), and the four entries that ceded their r3 slots
#: (agg_pivot/agg_cube/unpivot_long/w3). Streaming sits at the window's
#: TAIL: a wedged stateful stream must only ever cost later *streaming*
#: rows, never a batch family (round-1 lesson). Entries not named here
#: keep module import order after the priority block — all have green
#: r1∪r2∪r3 rows on unchanged code.
_DRIVER_WINDOW_PRIORITY: tuple[str, ...] = (
    # -- implementation / oracle changed this round --
    "pipeline_corpus_curation",
    "dedup_winnow_pairs",
    "dedup_cluster_winnow",
    "m8_vocab_embedding",
    "multimodal_features",
    "multimodal_resize",
    "multimodal_resize_bmp",
    "m3_feature_importance",
    "sim_ann_lsh",
    "sim_ann_ivf",
    "sim_ann_pq",
    # -- events family: normalize_events changed (NTZ inference drift) --
    "evt_tumbling_window",
    "evt_sliding_window",
    "evt_sessionization",
    "evt_json_extract",
    "evt_dedup_window",
    "evt_group_zscore_window",
    "evt_group_zscore",
    "evt_funnel_conversion",
    "evt_retention_cohorts",
    "asof_join_events",
    # -- ceded their r3 slots; re-confirm the r1-green rows --
    "agg_pivot",
    "agg_cube",
    "unpivot_long",
    "w3_lag_lead_first",
    # -- headliners, every round --
    "flagship_feature_query",
    "dashboard_extract",
    # -- rotation padding to exactly 50: r1/r2-green entries whose last
    # driver row predates r3, oldest families first --
    "etl_cohort_conditional_agg",
    "etl_cohort_literal_joins",
    "etl_name_keyed_rollup",
    "etl_interventions_conditions",
    "etl_calculated_values_rebuild",
    "agg_pricing_summary",
    "a3_multi_count_distinct",
    "p_filter_conjunction",
    "f_scalar_battery",
    "text_stats",
    "text_quality_score",
    "dedup_exact",
    "dedup_minhash_lsh",
    "multimodal_audio_features",
    "data_quality_select",
    "dedup_embedding_cosine",
    "data_snapshot_diff",
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

    ordered: dict[str, QuerySpec] = {}
    for name in _DRIVER_WINDOW_PRIORITY:
        if name in REGISTRY:
            ordered[name] = REGISTRY[name]
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered
