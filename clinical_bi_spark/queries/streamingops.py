"""Streaming queries exposed through the driver contract.

Each runs a real Structured Streaming job (availableNow trigger, memory
sink) and returns the final table. The tumbling-window form is
oracle-checked — in complete output mode over a bounded input the streaming
result equals the batch window aggregate, so the batch oracle applies
verbatim. Session windows and watermark dedup depend on arrival order /
state semantics with no SQL equivalent → rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from clinical_bi_spark.queries import query
from clinical_bi_spark.queries.events import _TUMBLING_ORACLE
from clinical_bi_spark.session import tune
from clinical_bi_spark.streaming.windows import (
    dedup_with_watermark,
    session_windows,
    tumbling_counts,
)


@query("stream_tumbling_window", oracle=_TUMBLING_ORACLE)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window streaming aggregate; equals the batch
    evt_tumbling_window on bounded input (same expressions, complete
    mode), so it shares that query's oracle."""
    return tumbling_counts(tune(spark), sf_dir)


@query("stream_session_window", oracle=None)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window(gap=30m) streaming aggregate — rows-only here;
    tests/test_streaming.py cross-checks it against the batch
    sessionization (evt_sessionization) field by field."""
    return session_windows(tune(spark), sf_dir)


@query("stream_dedup_watermark", oracle=None)
def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dropDuplicates with watermark-bounded state — rows-only;
    tests assert one surviving row per key."""
    return dedup_with_watermark(tune(spark), sf_dir)


@query("stream_stateful_user_stats", oracle=None)
def stream_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user running
    counters with alert tally — arbitrary state-transition logic the
    built-in window aggs can't express. Rows-only; tests pin equivalence
    to the batch groupBy on bounded input."""
    from clinical_bi_spark.streaming.stateful import user_running_stats

    return user_running_stats(tune(spark), sf_dir)


_STREAM_JOIN_ORACLE = """
SELECT
  v.event_id  AS view_id,
  p.event_id  AS purchase_id,
  v.user_id   AS user_id,
  v.ts        AS view_ts,
  p.ts        AS purchase_ts
FROM events v
JOIN events p
  ON v.user_id = p.user_id
 AND v.event_type = 'view' AND p.event_type = 'purchase'
 AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 10 MINUTE
"""


@query("stream_stream_join", oracle=_STREAM_JOIN_ORACLE)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join (view → purchase within
    10 min per user). Inner join over bounded input is deterministic, so
    it shares the batch interval-join oracle verbatim — the strongest
    correctness statement a streaming operator can make."""
    from clinical_bi_spark.streaming.windows import stream_stream_interval_join

    return stream_stream_interval_join(tune(spark), sf_dir)


@query("stream_corpus_curation", oracle=None)
def stream_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest curation: quality + language gates (stateless,
    same expressions as the batch funnel), exact dedup on the content
    fingerprint, per-source running counts. Rows-only (first-arrival
    dedup makes the per-source split order-dependent for cross-source
    duplicates); tests pin the total against the batch funnel's
    pre-near-dup stage."""
    from clinical_bi_spark.streaming.windows import (
        stream_corpus_curation as _scc,
    )

    return _scc(tune(spark), sf_dir)
