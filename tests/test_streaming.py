"""Streaming/batch parity: the streaming forms must agree with their
oracle-checked batch twins on bounded input."""

from __future__ import annotations

from pyspark.sql import functions as F

from clinical_bi_spark.queries import load_all
from clinical_bi_spark.streaming.windows import (
    dedup_with_watermark,
    session_windows,
)
from tests.conftest import SF_ORACLE


def test_session_window_matches_batch_sessionization(spark):
    """session_window(gap) and the lag/cumsum form must produce identical
    (user, start, end, n, value) session sets."""
    stream = session_windows(spark, SF_ORACLE, gap="30 minutes")
    batch = load_all()["evt_sessionization"].fn(spark, SF_ORACLE)

    s = {
        (r.user_id, r.session_start, r.n_events, round(r.total_value, 4))
        for r in stream.collect()
    }
    b = {
        (r.user_id, r.session_start, r.n_events, round(r.total_value, 4))
        for r in batch.collect()
    }
    assert s == b, (
        f"stream-only={sorted(s - b)[:3]} batch-only={sorted(b - s)[:3]}"
    )


def test_session_window_end_is_last_event_plus_gap(spark):
    """Spark's session_window end = last event + gap; the batch form's
    session_end = last event ts. Pin the documented relationship."""
    stream = {
        (r.user_id, r.session_start): r.session_end
        for r in session_windows(spark, SF_ORACLE, gap="30 minutes").collect()
    }
    batch = load_all()["evt_sessionization"].fn(spark, SF_ORACLE)
    import datetime as dt

    gap = dt.timedelta(minutes=30)
    for r in batch.collect():
        assert stream[(r.user_id, r.session_start)] == r.session_end + gap


def test_dedup_watermark_keeps_one_per_key(spark):
    out = dedup_with_watermark(spark, SF_ORACLE, keys=("user_id", "event_type"))
    events = spark.read.parquet(f"{SF_ORACLE}/events.parquet")
    n_keys = events.select("user_id", "event_type").distinct().count()
    assert out.count() == n_keys
    assert out.groupBy("user_id", "event_type").count().filter(
        F.col("count") > 1
    ).count() == 0


def test_stateful_operator_matches_batch_on_bounded_input(spark):
    from clinical_bi_spark.streaming.stateful import ALERT_THRESHOLD, user_running_stats

    out = user_running_stats(spark, SF_ORACLE)
    # 'update' mode may emit one snapshot per micro-batch; final per user wins
    final = {
        r.user_id: (r.n_events, r.total_value, r.n_alerts)
        for r in out.orderBy("n_events").collect()
    }
    events = spark.read.parquet(f"{SF_ORACLE}/events.parquet")
    batch = {
        r.user_id: (r.n, round(r.tv, 4), r.na)
        for r in events.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("tv"),
            F.sum((F.col("value") > ALERT_THRESHOLD).cast("long")).alias("na"),
        )
        .collect()
    }
    assert final == batch


def test_foreachbatch_sink_idempotent(spark, tmp_path):
    from clinical_bi_spark.streaming.windows import write_stream_foreachbatch

    out = str(tmp_path / "stream_out")
    write_stream_foreachbatch(spark, SF_ORACLE, out)
    first = spark.read.parquet(out + "/epoch=0")
    batch = load_all()["evt_tumbling_window"].fn(spark, SF_ORACLE)
    assert first.count() == batch.count()
    # replay: same epoch overwrites, no duplication
    write_stream_foreachbatch(spark, SF_ORACLE, out)
    assert spark.read.parquet(out + "/epoch=0").count() == batch.count()


def test_rate_source_unbounded_stream(spark):
    """Unbounded-source plumbing (rate source — the local stand-in for
    Kafka): windowed counts accumulate while the stream runs; confirms the
    engine's streaming surface is not file-source-only."""
    import time

    agg = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 200)
        .load()
        .withWatermark("timestamp", "5 seconds")
        .groupBy(F.window("timestamp", "1 second"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("rate_smoke")
        .outputMode("complete")
        .start()
    )
    try:
        deadline = time.time() + 20
        while time.time() < deadline:
            q.processAllAvailable()
            if spark.sql("SELECT * FROM rate_smoke").count() >= 2:
                break
            time.sleep(0.5)
        rows = spark.sql("SELECT * FROM rate_smoke").collect()
    finally:
        q.stop()
    assert len(rows) >= 2
    assert all(r.n > 0 for r in rows)


def test_stream_curation_total_matches_batch_funnel(spark):
    """The streaming curation total (quality+language gate, exact dedup)
    equals the batch funnel's pre-near-dup stage — distinct fingerprints
    are order-independent even though the per-source split is not."""
    from clinical_bi_spark.functions.text import (
        doc_fingerprint,
        language_guess,
        quality_score,
    )
    from clinical_bi_spark.streaming.windows import stream_corpus_curation

    streamed = stream_corpus_curation(spark, SF_ORACLE)
    total_streamed = streamed.agg(F.sum("n_docs")).first()[0]

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    batch_total = (
        docs.filter(
            (quality_score(F.col("text")) >= 0.85)
            & (language_guess(F.col("text")) == "en")
        )
        .select(doc_fingerprint(F.col("text")).alias("fp"))
        .distinct()
        .count()
    )
    assert total_streamed == batch_total
