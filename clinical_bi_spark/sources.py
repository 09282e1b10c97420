"""Sources: loaders for the driver's parquet tables and generic readers.

Reference mapping (SURVEY.md §2.1):
  S1  pd.read_sql_query over psycopg2 (ct_data.py:69-97)  → spark.read.parquet
      for fixtures / spark.read.jdbc for a live AACT database.
  S2  ini-file driven connection config (ct_data.py:32-40) → options dict.
  S3  pg_restore bulk source (init-user-db.sh:27-28)        → parquet snapshot.

Parquet is columnar with min/max stats: scans get predicate pushdown and
column pruning for free, which the reference's row stores never had.
"""

from __future__ import annotations

import configparser
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

#: The driver-generated tables at /root/testdata/sf*/ (TESTDATA.md).
TABLE_NAMES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@dataclass
class Tables:
    """Lazy handle bundle for one scale-factor directory.

    Each attribute is a lazily-built DataFrame (plan only — nothing is read
    until an action runs, so Catalyst prunes columns/filters into the scan).
    """

    spark: SparkSession
    sf_dir: str
    _cache: dict[str, DataFrame] = field(default_factory=dict)

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_") or name not in TABLE_NAMES:
            raise AttributeError(name)
        if name not in self._cache:
            df = self.spark.read.parquet(
                os.path.join(self.sf_dir, f"{name}.parquet")
            )
            if name == "events":
                df = normalize_events(df)
            self._cache[name] = df
        return self._cache[name]

    def register_views(self) -> None:
        """Register every table as a temp view for the spark.sql() path."""
        for name in TABLE_NAMES:
            getattr(self, name).createOrReplaceTempView(name)


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> Tables:
    """Entry point used by every query: bundle of lazy DataFrames."""
    return Tables(spark=spark, sf_dir=sf_dir)


def normalize_events(df: DataFrame) -> DataFrame:
    """The events fixture stores ts as parquet TIMESTAMP(NANOS). Depending
    on the session's conf timing Spark surfaces that either as a
    nanosecond long (spark.sql.legacy.parquet.nanosAsLong, set in
    session.RUNTIME_CONF) or as TIMESTAMP_NTZ (micros-truncated, the
    reader's native nanos handling). Normalize BOTH to a proper
    TimestampType column: every consumer — including streaming
    withWatermark, which rejects TIMESTAMP_NTZ event time — sees one
    type, and the values match DuckDB's micros truncation. The NTZ→TZ
    cast is value-preserving because session.RUNTIME_CONF pins the
    session timezone to UTC."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        # integer div keeps full precision (ns since epoch exceeds 2^53,
        # so float division would corrupt low-order digits)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(ts_type, TimestampNTZType):
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def read_ini_options(path: str, section: str) -> dict[str, str]:
    """Parity for the reference's ini-driven connection config (S2).

    Reference: ct_data.py:32-40 builds a ``k=v`` connection string from the
    ``[aact.database]`` section of aact.properties. Here the same section
    becomes an options dict for ``spark.read.format("jdbc")``.
    """
    parser = configparser.ConfigParser()
    with open(path) as fh:
        parser.read_file(fh)
    return dict(parser.items(section))


def jdbc_options_from_ini(
    path: str, section: str = "aact.database"
) -> dict[str, str]:
    """Translate the reference's psycopg2-style ini section (S2 —
    ct_data.py:32-40 builds ``k=v`` pairs: dbname/user/password/host/port)
    into the options dict ``spark.read.format("jdbc")`` expects:
    a ``jdbc:postgresql://host:port/dbname`` url + user/password/driver.

    Pure translation — contract-tested without a driver jar
    (tests/test_sinks_sources.py), which is all this container can verify;
    a live cluster points the same dict at a real database.
    """
    ini = read_ini_options(path, section)
    missing = {"dbname", "host"} - set(ini)
    if missing:
        raise ValueError(f"ini section [{section}] missing keys: {sorted(missing)}")
    port = ini.get("port", "5432")
    opts = {
        "url": f"jdbc:postgresql://{ini['host']}:{port}/{ini['dbname']}",
        "driver": "org.postgresql.Driver",
        # pushdown-friendly defaults: one round-trip per partition, stats
        # from the remote planner
        "fetchsize": "10000",
    }
    for key in ("user", "password"):
        if key in ini:
            opts[key] = ini[key]
    return opts


def jdbc_reader(spark: SparkSession, options: dict[str, str]):
    """S1 live path: JDBC scan with pushdown.

    Usage: ``jdbc_reader(spark, opts).option("dbtable", t).load()`` (+
    ``partitionColumn``/``lowerBound``/``upperBound``/``numPartitions``
    for the parallel stride read). EXECUTED LIVE in this container
    against embedded Derby (bundled with Spark) —
    tests/test_sinks_sources.py::test_jdbc_roundtrip_live_embedded_derby
    drives write → read-back → filter/column pushdown → 4-way
    partitioned read. No PostgreSQL driver jar exists here, so the
    postgres URL produced by :func:`jdbc_options_from_ini` remains
    contract-tested only; the reader machinery itself is proven.
    """
    return spark.read.format("jdbc").options(**options)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source (Spark-native, no extra jar): the columnar interchange
    format a warehouse-side consumer (Hive/Trino) most often hands over.
    Same pushdown/pruning contract as parquet — ORC carries min/max
    stripe statistics, and Spark's OrcScan reports PushedFilters the same
    way (asserted in tests/test_sinks_sources.py)."""
    return spark.read.orc(path)


def read_jsonl(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSON-lines source with an EXPLICIT schema by default-contract:
    schema inference reads the data twice and types drift run-to-run at
    100 TB — callers pass the schema; pass ``schema=None`` consciously
    for exploration only."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
