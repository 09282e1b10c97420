"""Data-quality constraint auditing — the Deequ-style expectation
report a warehouse runs before publishing a snapshot (the engine-side
generalization of the reference's load-time sanity checks in its ETL
shell, e.g. row-count probes after db2wh-etl.sh loads).

Each rule is ONE aggregate over its table — no row-level violation
materialization, so the report costs a scan per table regardless of how
many rows violate (at 100 TB you want the COUNT first and a targeted
drill-down query second). The referential-integrity rule is a broadcast
anti-join (dimension side small by definition); every count is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clinical_bi_spark.queries import query
from clinical_bi_spark.session import tune
from clinical_bi_spark.sources import load_tables

_DQ_ORACLE = """
WITH r1 AS (
  SELECT 1 AS rule_id, 'orders.o_custkey -> customer.c_custkey' AS rule,
         'orders' AS table_name, COUNT(*) AS n_rows,
         COUNT(*) FILTER (WHERE c.c_custkey IS NULL) AS n_violations
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
), r2 AS (
  SELECT 2, 'o_totalprice > 0', 'orders', COUNT(*),
         COUNT(*) FILTER (WHERE o_totalprice IS NULL OR o_totalprice <= 0)
  FROM orders
), r3 AS (
  SELECT 3, 'c_custkey unique', 'customer', COUNT(*),
         COUNT(*) - COUNT(DISTINCT c_custkey)
  FROM customer
), r4 AS (
  SELECT 4, '(l_orderkey, l_linenumber) unique', 'lineitem', COUNT(*),
         COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber))
  FROM lineitem
), r5 AS (
  SELECT 5, 'event_type in domain', 'events', COUNT(*),
         COUNT(*) FILTER (WHERE event_type IS NULL OR event_type NOT IN
           ('click', 'view', 'purchase', 'signup', 'error'))
  FROM events
), r6 AS (
  SELECT 6, 'text non-empty', 'documents', COUNT(*),
         COUNT(*) FILTER (WHERE text IS NULL OR length(text) = 0)
  FROM documents
), u AS (
  SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r3
  UNION ALL SELECT * FROM r4 UNION ALL SELECT * FROM r5
  UNION ALL SELECT * FROM r6
)
SELECT rule_id AS rule_id, rule AS rule, table_name AS table_name,
       n_rows AS n_rows, CAST(n_violations AS BIGINT) AS n_violations,
       n_violations = 0 AS passed
FROM u
"""

_EVENT_DOMAIN = ("click", "view", "purchase", "signup", "error")


@query("dq_constraint_report", oracle=_DQ_ORACLE)
def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-constraint expectation report: referential integrity
    (orders→customer via broadcast anti-count), positivity, key
    uniqueness (single and composite), categorical domain, and
    non-empty text — one exact-count row per rule."""
    t = load_tables(tune(spark), sf_dir)
    r1 = (
        t.orders.join(
            F.broadcast(t.customer.select("c_custkey")),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.count(F.when(F.col("c_custkey").isNull(), 1)).alias(
                "n_violations"
            ),
        )
        .select(
            F.lit(1).alias("rule_id"),
            F.lit("orders.o_custkey -> customer.c_custkey").alias("rule"),
            F.lit("orders").alias("table_name"),
            "n_rows",
            "n_violations",
        )
    )
    r2 = t.orders.agg(
        F.count("*").alias("n_rows"),
        F.count(
            F.when(
                F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0), 1
            )
        ).alias("n_violations"),
    ).select(
        F.lit(2).alias("rule_id"),
        F.lit("o_totalprice > 0").alias("rule"),
        F.lit("orders").alias("table_name"),
        "n_rows",
        "n_violations",
    )
    r3 = t.customer.agg(
        F.count("*").alias("n_rows"),
        (F.count("*") - F.countDistinct("c_custkey")).alias("n_violations"),
    ).select(
        F.lit(3).alias("rule_id"),
        F.lit("c_custkey unique").alias("rule"),
        F.lit("customer").alias("table_name"),
        "n_rows",
        "n_violations",
    )
    r4 = t.lineitem.agg(
        F.count("*").alias("n_rows"),
        (
            F.count("*") - F.countDistinct("l_orderkey", "l_linenumber")
        ).alias("n_violations"),
    ).select(
        F.lit(4).alias("rule_id"),
        F.lit("(l_orderkey, l_linenumber) unique").alias("rule"),
        F.lit("lineitem").alias("table_name"),
        "n_rows",
        "n_violations",
    )
    r5 = t.events.agg(
        F.count("*").alias("n_rows"),
        F.count(
            F.when(
                F.col("event_type").isNull()
                | ~F.col("event_type").isin(*_EVENT_DOMAIN),
                1,
            )
        ).alias("n_violations"),
    ).select(
        F.lit(5).alias("rule_id"),
        F.lit("event_type in domain").alias("rule"),
        F.lit("events").alias("table_name"),
        "n_rows",
        "n_violations",
    )
    r6 = t.documents.agg(
        F.count("*").alias("n_rows"),
        F.count(
            F.when(
                F.col("text").isNull() | (F.length("text") == 0), 1
            )
        ).alias("n_violations"),
    ).select(
        F.lit(6).alias("rule_id"),
        F.lit("text non-empty").alias("rule"),
        F.lit("documents").alias("table_name"),
        "n_rows",
        "n_violations",
    )
    out = r1.unionByName(r2).unionByName(r3).unionByName(r4).unionByName(
        r5
    ).unionByName(r6)
    return out.select(
        "rule_id",
        "rule",
        "table_name",
        "n_rows",
        F.col("n_violations").cast("bigint").alias("n_violations"),
        (F.col("n_violations") == 0).alias("passed"),
    )
