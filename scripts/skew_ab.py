"""Skew-join A/B: AQE skew-split ON vs OFF on a deliberately skewed
shuffle join (PERF.md methodology: warmed session, cached inputs, min of
2 runs per cell).

Fixture: events replicated to ~5M rows with a 90%-hot join key
(key = 1 for user_id % 10 != 0, else the user id), joined to a 200-key
dim with broadcast DISABLED (autoBroadcastJoinThreshold=-1) so the join
must shuffle — the regime where one reducer owns the hot partition. This
is the documented 100 TB posture ("skewed keys → salting or AQE
skew-join"): AQE's OptimizeSkewedJoin splits the hot partition into
task-sized chunks at runtime, no manual salting needed for JOINS; the
manual salted two-phase aggregation (operators/skew.py) remains for
aggregates with non-splittable per-key state.

Prints one line per cell: mode, wall seconds, whether the final adaptive
plan marked the sort-merge join skew=true.

Usage: python scripts/skew_ab.py [sf_dir] [mult]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

from pyspark.sql import functions as F

from clinical_bi_spark.session import get_spark, warm

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
MULT = int(sys.argv[2]) if len(sys.argv) > 2 else 50


def main() -> None:
    spark = get_spark("skew-ab")
    spark.sparkContext.setLogLevel("ERROR")
    warm(spark)
    base = spark.read.parquet(f"{SF_DIR}/events.parquet")
    left = (
        base.select(
            F.explode(F.sequence(F.lit(0), F.lit(MULT - 1))).alias("c"),
            "user_id",
            "value",
        )
        .select(
            F.when(F.col("user_id") % 10 != 0, F.lit(1))
            .otherwise(F.col("user_id"))
            .cast("long")
            .alias("k"),
            "value",
        )
        .repartition(spark.sparkContext.defaultParallelism)
        .persist()
    )
    n = left.count()
    hot = left.filter("k = 1").count()
    right = spark.range(0, 200).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("payload")
    ).persist()
    right.count()
    print(f"rows={n} hot_key_rows={hot} ({100.0 * hot / n:.1f}%)", flush=True)

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # AQE's runtime broadcast has its own threshold; disable it too or the
    # 200-row dim gets broadcast at runtime and there is no shuffle join
    # left to split
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        # Skew-detection knobs sized to the fixture (at cluster scale the
        # defaults — 256 MB threshold, factor 5 — play the same role
        # against GB-sized hot blocks). Partition coalescing is disabled:
        # with 16 of 32 post-shuffle partitions empty, the coalesced read
        # was observed to mask the skew split at this scale.
        for c, v in (
            ("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"),
            (
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                "1m",
            ),
            ("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m"),
            ("spark.sql.adaptive.coalescePartitions.enabled", "false"),
        ):
            spark.conf.set(c, v)
        for skew_on in (False, True):
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower()
            )
            best, skew_marked = float("inf"), False
            for _ in range(2):
                start = time.perf_counter()
                # GLOBAL aggregate after the join, deliberately: a
                # groupBy("k") would REQUIRE the join's hash(k)
                # distribution, and OptimizeSkewedJoin refuses to split a
                # partition whose output partitioning a downstream stage
                # depends on — the split must not break co-partitioning.
                # collect() (1 row) so the SAME QueryExecution that ran is
                # the one inspected for the skew=true marker.
                df = left.join(right, "k").agg(
                    F.count("*").alias("n"),
                    F.sum(F.col("value") + F.col("payload")).alias("s"),
                )
                df.collect()
                best = min(best, time.perf_counter() - start)
                plan = df._jdf.queryExecution().executedPlan().toString()
                skew_marked = skew_marked or ("skew=true" in plan)
            print(
                f"skewJoin={'on' if skew_on else 'off'} wall={best:.2f}s "
                f"skew_split_applied={skew_marked}",
                flush=True,
            )
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.skewJoin.enabled")
        left.unpersist()
        right.unpersist()


if __name__ == "__main__":
    main()
