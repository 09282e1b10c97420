"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The real implementation lives in ``clinical_bi_spark/``; this module just
adapts the query registry (clinical_bi_spark.queries) to the contract.

CONTRACT INVARIANT (sequential driver): ``queries()`` callables release
the PREVIOUS query's tracked operator caches on entry (``_released``),
so executor storage stays flat only when queries run strictly
sequentially — build, collect, then the next call. A concurrent harness
running N callables at once would accumulate up to N queries' caches and
may release a cache another in-flight query still reads; if you need
concurrency, call ``clinical_bi_spark.caching.release_all`` yourself at
your own barriers instead of relying on these wrappers
(tests/test_caching.py::test_sequential_replay_storage_flat pins the
sequential-replay flatness this module promises).
"""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from clinical_bi_spark import caching
from clinical_bi_spark.queries import load_all

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _released(fn: Callable[[SparkSession, str], DataFrame]):
    """Release the PREVIOUS query's operator caches before building the
    next plan. Several operators persist small intermediate relations
    (minhash signatures, winnow postings, overflow sets, edge lists) that
    their returned plan consumes lazily — they cannot unpersist inside
    the operator without losing the cache before the driver collects.
    The driver is strictly sequential (build → collect → next query), so
    the first safe release point is the next query's entry; over a
    50-query session this keeps executor storage flat instead of
    accumulating ~50 cached relations.

    The release is TARGETED (clinical_bi_spark.caching): operators
    register every persist/localCheckpoint they create, and exactly those
    are unpersisted here — caches the harness itself may have established
    survive, and connected_components' localCheckpoint blocks (which
    ``spark.catalog.clearCache()`` never reclaimed) are released too."""

    @functools.wraps(fn)
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        caching.release_all(spark)
        return fn(spark, sf_dir)

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (J1/J2 + P2-P8 + A1-A3 shape) on sf0.001."""
    registry = load_all()
    return registry["flagship_feature_query"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return {name: _released(spec.fn) for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for every oracle-checkable query; keys
    without an oracle (approximate / iterative / stateful ops) are omitted
    → the driver records a rows-only check for those."""
    return {
        name: spec.oracle for name, spec in load_all().items() if spec.oracle
    }
