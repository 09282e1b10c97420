"""Pins the environmental assumption behind text_lm_score's exact oracle.

The micro-nat score ``ROUND(1e6 * (ln(c1+V) - ln(c12+1)))`` is exact
across engines ONLY if JVM ``Math.log`` and DuckDB's libm agree to the
last bit on the integer arguments the fixture actually produces —
neither is guaranteed correctly rounded, so a 1-ulp divergence on some
other platform could flip a ROUND near a .5 boundary. This test makes
that assumption CHECKED instead of assumed: it enumerates the fixture's
whole (c1+V, c12+1) domain and compares the rounded micro-nat value
Spark computes against DuckDB's, pair by pair. A libm/JDK change that
breaks the oracle's premise fails here, with the offending arguments in
the message, before it fails an adjudication row.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from .conftest import SF_ORACLE

_TOKENS = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"

# the fixture's (a, b) = (c1 + V, c12 + 1) argument domain
_DOMAIN_SQL = f"""
WITH tok AS (
  SELECT doc_id, {_TOKENS} AS t
  FROM read_parquet('{{sf_dir}}/documents.parquet')
), tokr AS (
  SELECT doc_id, UNNEST(t) AS w FROM tok
), uni AS (
  SELECT w, COUNT(*) AS c1 FROM tokr GROUP BY w
), v AS (
  SELECT COUNT(*) AS v FROM uni
), bigr AS (
  SELECT t[i] AS w1, t[i+1] AS w2
  FROM tok, UNNEST(range(1, len(t))) AS r(i)
), bc AS (
  SELECT w1, w2, COUNT(*) AS c12 FROM bigr GROUP BY w1, w2
)
SELECT DISTINCT u.c1 + v.v AS a, bc.c12 + 1 AS b
FROM bc JOIN uni u ON u.w = bc.w1 CROSS JOIN v
"""


@pytest.mark.parametrize(
    "sf_dir", [SF_ORACLE, "/root/testdata/sf0.001"], ids=["sf_oracle", "sf0.001"]
)
def test_micro_nat_ln_agreement_over_fixture_domain(spark, sf_dir):
    con = duckdb.connect()
    duck = con.execute(
        f"""
        SELECT a, b, CAST(ROUND(1000000.0 * (ln(a) - ln(b))) AS BIGINT) AS micro
        FROM ({_DOMAIN_SQL.format(sf_dir=sf_dir)})
        """
    ).fetchall()
    assert duck, "fixture produced an empty bigram domain?"

    pairs = spark.createDataFrame(
        [(a, b) for a, b, _ in duck], "a bigint, b bigint"
    )
    got = {
        (r["a"], r["b"]): r["micro"]
        for r in pairs.select(
            "a",
            "b",
            F.round(
                F.lit(1_000_000.0) * (F.log(F.col("a")) - F.log(F.col("b")))
            )
            .cast("bigint")
            .alias("micro"),
        ).collect()
    }
    mismatches = [
        (a, b, micro, got[(a, b)]) for a, b, micro in duck if got[(a, b)] != micro
    ]
    assert not mismatches, (
        f"JVM Math.log and DuckDB libm disagree at micro-nat rounding on "
        f"{len(mismatches)}/{len(duck)} domain pairs, e.g. {mismatches[:5]} "
        f"— the text_lm_score oracle's exactness premise is broken on this "
        f"platform"
    )
