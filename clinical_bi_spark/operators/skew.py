"""Skew-handling helpers (SURVEY.md §4 scale posture).

AQE's skew-join splitting covers sort-merge joins automatically; explicit
salting remains necessary for skewed *aggregations* and for joins AQE
can't split (e.g. under windows). The pattern: explode the hot key into
``n_salts`` sub-keys, partial-aggregate, then merge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted(key: Column, n_salts: int = 16) -> Column:
    """Deterministic sub-key: (key, hash(row) % n_salts). Use as the first
    groupBy key for a skewed aggregation, then re-aggregate without the
    salt. ``F.rand()`` would break retry determinism — use a content hash."""
    return F.pmod(F.xxhash64(key, F.monotonically_increasing_id()), F.lit(n_salts))


def two_phase_count(df: DataFrame, key: str, n_salts: int = 16) -> DataFrame:
    """Example two-phase (salted) aggregation: COUNT per hot key without a
    single reducer absorbing the whole key. Phase 1 groups on (key, salt),
    phase 2 merges the partials — both shuffles are uniform."""
    phase1 = (
        df.withColumn("__salt", salted(F.col(key), n_salts))
        .groupBy(key, "__salt")
        .agg(F.count("*").alias("partial_n"))
    )
    return phase1.groupBy(key).agg(F.sum("partial_n").cast("bigint").alias("n"))
