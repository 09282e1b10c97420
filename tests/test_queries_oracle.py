"""Differential test: every oracle-checkable registry query, Spark vs
DuckDB at sf0.01 — the same comparison the driver runs (row count, schema,
order-insensitive values).
"""

from __future__ import annotations

import pytest

from clinical_bi_spark.queries import load_all
from tests.conftest import SF_ORACLE, assert_matches_oracle

REGISTRY = load_all()
ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle)
ROWS_ONLY_QUERIES = sorted(n for n, s in REGISTRY.items() if not s.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, oracle_con, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_ORACLE)
    assert_matches_oracle(df, oracle_con, spec.oracle, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_ORACLE)
    # schema is stable and the query executes end to end
    assert df.columns
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert "revenue" in df.columns


def test_contract_shape():
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 30
