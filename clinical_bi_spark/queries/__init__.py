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


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (registration side effect) and return the
    registry.

    Import order IS registry order, and the driver records correctness rows
    in registry order — so the oracle-checked batch families register first
    and the streaming queries (slow; harness-fragile by nature: state
    stores, memory sinks) register LAST. A streaming failure must never
    shadow a batch family (round-1 lesson: the run died at a stateful
    streaming query and the entire textops/vectorops family got no rows).
    """
    from clinical_bi_spark.queries import (  # noqa: F401
        relational,
        textops,
        vectorops,
        extended,
        events,
        mlops,
        multimodalops,
        streamingops,
    )

    return REGISTRY
