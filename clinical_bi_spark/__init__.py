"""clinical_bi_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of nastacio/clinical-bi (see SURVEY.md).

The reference ships its relational logic as SQL strings executed by
PostgreSQL/DB2 plus eager pandas dataflow (reference: src/main/py/ct_data.py,
docker/aact/docker-entrypoint-initdb.d/init-user-db.sh,
docker/db2wh/scripts/db2wh-etl.sh). This package re-expresses every operator
Spark-first: declarative DataFrame/SQL plans optimized by Catalyst + AQE,
Parquet columnar storage, and Arrow-vectorized Python only where built-ins
cannot express the semantics.
"""

from clinical_bi_spark.session import get_spark, tune
from clinical_bi_spark.sources import TABLE_NAMES, load_tables

__version__ = "0.1.0"

__all__ = ["get_spark", "tune", "load_tables", "TABLE_NAMES", "__version__"]
