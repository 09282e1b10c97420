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
    StringType,
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


# ---------------------------------------------------------------------------
# Streaming CEP: MATCH_RECOGNIZE (view+ click+ purchase, strictly
# contiguous per user) as a custom stateful operator — the batch twin is
# evt_cep_pattern's gaps-and-islands rewrite. State per user is O(1):
# the last TWO closed islands plus the currently-open island (type,
# start, end, count as int64 nanos) — runs spanning micro-batches stitch
# through it. A match finalizes when a purchase run CLOSES with (view,
# click) context; an OPEN tail purchase run additionally emits a
# provisional snapshot each batch (update semantics) so bounded streams
# don't lose trailing matches — the consumer dedupes by (user,
# match_start) keeping the latest (done in stream_cep_matches below), so
# the final table equals the batch query however the input splits.
# ---------------------------------------------------------------------------

CEP_STATE_SCHEMA = StructType(
    [
        StructField("i2_type", StringType()),
        StructField("i2_start", LongType()),
        StructField("i2_end", LongType()),
        StructField("i2_n", LongType()),
        StructField("i1_type", StringType()),
        StructField("i1_start", LongType()),
        StructField("i1_end", LongType()),
        StructField("i1_n", LongType()),
        StructField("cur_type", StringType()),
        StructField("cur_start", LongType()),
        StructField("cur_end", LongType()),
        StructField("cur_n", LongType()),
    ]
)
CEP_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("match_start_ns", LongType()),
        StructField("match_end_ns", LongType()),
        StructField("n_view", LongType()),
        StructField("n_click", LongType()),
        StructField("n_purchase", LongType()),
    ]
)

_CEP_V, _CEP_C, _CEP_P = "view", "click", "purchase"


def _cep_update(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    import numpy as np

    (user_id,) = key
    if state.exists:
        (i2t, i2s, i2e, i2n, i1t, i1s, i1e, i1n, ct, cs, ce, cn) = state.get
    else:
        i2t = i1t = ct = None
        i2s = i2e = i2n = i1s = i1e = i1n = cs = ce = cn = 0

    out: list[tuple] = []

    def close_cur() -> None:
        nonlocal i2t, i2s, i2e, i2n, i1t, i1s, i1e, i1n
        if ct == _CEP_P and i1t == _CEP_C and i2t == _CEP_V:
            out.append((user_id, i2s, ce, i2n, i1n, cn))
        i2t, i2s, i2e, i2n = i1t, i1s, i1e, i1n
        i1t, i1s, i1e, i1n = ct, cs, ce, cn

    for pdf in batches:
        if len(pdf) == 0:
            continue
        pdf = pdf.sort_values(["ts", "event_id"])
        et = pdf["event_type"].to_numpy()
        ts = pdf["ts"].astype("int64").to_numpy()  # nanos
        cut = np.flatnonzero(et[1:] != et[:-1]) + 1
        bounds = [0, *cut.tolist(), len(et)]
        for a, b in zip(bounds[:-1], bounds[1:]):
            if ct == et[a]:  # open island continues across the boundary
                ce, cn = int(ts[b - 1]), cn + (b - a)
                continue
            if ct is not None:
                close_cur()
            ct, cs, ce, cn = et[a], int(ts[a]), int(ts[b - 1]), b - a

    # provisional tail: an OPEN purchase run with (view, click) context
    # is already a match under maximal semantics if the stream ends here;
    # later batches refresh it (same match_start) until the run closes.
    if ct == _CEP_P and i1t == _CEP_C and i2t == _CEP_V:
        out.append((user_id, i2s, ce, i2n, i1n, cn))

    state.update((i2t, i2s, i2e, i2n, i1t, i1s, i1e, i1n, ct, cs, ce, cn))
    yield pd.DataFrame(
        out,
        columns=[
            "user_id", "match_start_ns", "match_end_ns",
            "n_view", "n_click", "n_purchase",
        ],
    )


def stream_cep_matches(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
    progress_sink: list | None = None,
) -> DataFrame:
    """Run the streaming CEP operator over the bounded events stream and
    return the deduplicated final match table: one row per (user,
    match_start), latest snapshot wins — equal to the batch
    evt_cep_pattern output however the input splits into micro-batches.
    Duration is recomputed HERE with the same cast-double expression the
    batch query uses, so the float path is identical."""
    from pyspark.sql import functions as F

    from clinical_bi_spark.streaming.windows import (
        _events_stream,
        _run_to_completion,
    )

    events = _events_stream(spark, sf_dir, max_files_per_trigger).select(
        "user_id", "event_id", "ts", "event_type"
    )
    emitted = events.groupBy("user_id").applyInPandasWithState(
        _cep_update,
        outputStructType=CEP_OUTPUT_SCHEMA,
        stateStructType=CEP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    raw = _run_to_completion(emitted, "update", progress_sink)
    final = (
        raw.groupBy("user_id", "match_start_ns")
        .agg(
            F.max(
                F.struct("match_end_ns", "n_view", "n_click", "n_purchase")
            ).alias("m")
        )
        .select(
            "user_id",
            F.timestamp_micros(
                F.expr("match_start_ns div 1000")
            ).alias("match_start"),
            F.timestamp_micros(
                F.expr("m.match_end_ns div 1000")
            ).alias("match_end"),
            F.col("m.n_view").alias("n_view"),
            F.col("m.n_click").alias("n_click"),
            F.col("m.n_purchase").alias("n_purchase"),
        )
    )
    return final.withColumn(
        "duration_sec",
        F.round(
            F.col("match_end").cast("double")
            - F.col("match_start").cast("double"),
            6,
        ),
    )
