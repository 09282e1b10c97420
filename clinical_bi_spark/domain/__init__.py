"""AACT domain pipeline — functional parity with the reference's three
entry points (SURVEY.md §3):

1. the flagship ML feature query + pandas feature engineering
   (ct_data.py:72-151) → :mod:`clinical_bi_spark.domain.features`
2. the init-time ETL that derives four analytics tables
   (init-user-db.sh:38-274) → :mod:`clinical_bi_spark.domain.etl`
3. the dashboard warehouse extract (db2wh-etl.sh:73-107)
   → :mod:`clinical_bi_spark.domain.features` (dashboard_extract)

A user of the reference switches by pointing :class:`AACTTables` at a
parquet snapshot of their AACT database and calling the same-named jobs.
"""

from clinical_bi_spark.domain.etl import (
    AACTTables,
    conditions_calculated_values,
    enrich_calculated_values,
    interventions_calculated_values,
    interventions_conditions,
    interventions_with_downcase_name,
    run_etl,
)
from clinical_bi_spark.domain.features import (
    dashboard_extract,
    feature_table,
    flagship_features,
    load_data,
)

__all__ = [
    "AACTTables",
    "conditions_calculated_values",
    "enrich_calculated_values",
    "interventions_calculated_values",
    "interventions_conditions",
    "interventions_with_downcase_name",
    "run_etl",
    "dashboard_extract",
    "feature_table",
    "flagship_features",
    "load_data",
]
