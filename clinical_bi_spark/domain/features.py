"""Flagship feature pipeline and dashboard extract.

* :func:`flagship_features` — the SQL the reference assembles at
  ct_data.py:72-91 (9-table join, wide GROUP BY, two count-distincts).
* :func:`feature_table` — the eager pandas feature engineering
  (ct_data.py:106-151) as lazy DataFrame expressions.
* :func:`load_data` — the end-to-end parity entry point including the
  exact-size seeded split (ct_data.py:152).
* :func:`dashboard_extract` — the warehouse extract (db2wh-etl.sh:73-107)
  with the sed cleanse in-plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clinical_bi_spark.functions.exprs import (
    ONCOLOGY_PATTERNS_DASHBOARD,
    contains_any,
    encode_categories,
    encode_last_writer_wins,
    null_to_zero,
    stage_from_title,
)

#: ct_data.py:21-26 — the s.* prefix of the select list.
SQL_COLUMN_NAMES = (
    "nct_id", "start_date", "study_type", "enrollment_type", "phase",
    "overall_status",
)
#: ct_data.py:28-29
STATUS = ("Completed", "Terminated")


def flagship_features(t, hash_long_text_keys: bool = False) -> DataFrame:
    """The flagship feature query (ct_data.py:72-91), literally.

    ``hash_long_text_keys=True`` is the 100 TB switch (SURVEY.md §7.4.7):
    the wide GROUP BY includes multi-KB text columns (brief_title,
    criteria, description) — at scale those keys dominate shuffle volume.
    The flag groups on md5(text) instead and recovers the value with
    first() (identical result for identical groups; md5 collisions are
    negligible at any realistic cardinality). Default stays raw for exact
    reference parity.

    Implicit 9-way inner join on nct_id — including the intentional
    sponsors self-join (sp filtered to 'lead' supplies agency_class; sp2
    unfiltered feeds count(distinct name)) and the dgi/interventions
    fan-out that count(dgi.id) measures (load-bearing, SURVEY.md §7.4.1).
    The studies/eligibilities/designs/brief_summaries sides are 1:1 on
    nct_id; at scale the shuffle is the interventions × sponsors × dgi
    blow-up, grouped back on nct_id immediately — AQE keeps the post-join
    partitioning; long-text group keys (criteria, description) ride along
    exactly as the reference groups them.
    """
    s = t.studies.alias("s")
    cv = t.calculated_values.alias("cv")
    e = t.eligibilities.alias("e")
    i = t.interventions.alias("i")
    sp = t.sponsors.alias("sp")
    sp2 = t.sponsors.alias("sp2")
    dgi = t.design_group_interventions.alias("dgi")
    d = t.designs.alias("d")
    bs = t.brief_summaries.alias("bs")

    key = F.col("s.nct_id")
    joined = (
        s.join(cv, key == F.col("cv.nct_id"))
        .join(e, key == F.col("e.nct_id"))
        .join(i, key == F.col("i.nct_id"))
        .join(sp, key == F.col("sp.nct_id"))
        .join(sp2, key == F.col("sp2.nct_id"))
        .join(dgi, key == F.col("dgi.nct_id"))
        .join(d, key == F.col("d.nct_id"))
        .join(bs, key == F.col("bs.nct_id"))
        .filter(
            (F.col("s.start_date") > F.lit("2019-01-01").cast("date"))
            & (F.col("cv.is_oncology") == True)  # noqa: E712
            & F.col("s.overall_status").isin(*STATUS)
            & F.col("s.enrollment").isNotNull()
            & (F.col("cv.number_of_facilities") > 0)
            & (F.col("sp.lead_or_collaborator") == "lead")
        )
    )
    if hash_long_text_keys:
        group_cols = [
            *[F.col(f"s.{c}") for c in SQL_COLUMN_NAMES],
            F.col("sp.agency_class").alias("sponsor_type"),
            F.col("cv.number_of_facilities"),
            F.col("cv.average_condition_completion_ratio"),
            F.col("e.gender"),
            F.col("cv.has_us_facility"),
            F.md5(F.col("s.brief_title")).alias("__h_title"),
            F.col("s.number_of_arms"),
            F.md5(F.col("e.criteria")).alias("__h_criteria"),
            F.col("d.allocation"),
            F.col("d.intervention_model"),
            F.col("d.primary_purpose"),
            F.md5(F.col("bs.description")).alias("__h_description"),
        ]
        grouped = joined.groupBy(*group_cols).agg(
            F.count("dgi.id").alias("design_group_intervention_count"),
            F.countDistinct("i.intervention_type").alias("intervention_type_count"),
            F.countDistinct("sp2.name").alias("sponsor_count"),
            # md5-keyed groups are constant in the hashed column: recover it
            F.first("s.brief_title").alias("brief_title"),
            F.first("bs.description").alias("description_v"),
        )
        return grouped.select(
            *SQL_COLUMN_NAMES,
            "sponsor_type",
            "number_of_facilities",
            "gender",
            "has_us_facility",
            "average_condition_completion_ratio",
            stage_from_title(F.col("brief_title")).alias("condition_stage"),
            null_to_zero(F.col("number_of_arms")).cast("int").alias("number_of_arms_clean"),
            "allocation",
            "intervention_model",
            "primary_purpose",
            F.lit(0).alias("drug_recency"),
            F.col("description_v").alias("description"),
            "design_group_intervention_count",
            "intervention_type_count",
            "sponsor_count",
        )
    return (
        joined.groupBy(
            *[F.col(f"s.{c}") for c in SQL_COLUMN_NAMES],
            F.col("sp.agency_class").alias("sponsor_type"),
            F.col("cv.number_of_facilities"),
            F.col("cv.average_condition_completion_ratio"),
            F.col("e.gender"),
            F.col("cv.has_us_facility"),
            F.col("s.brief_title"),
            F.col("s.number_of_arms"),
            F.col("e.criteria"),
            F.col("d.allocation"),
            F.col("d.intervention_model"),
            F.col("d.primary_purpose"),
            F.col("bs.description"),
        )
        .agg(
            F.count("dgi.id").alias("design_group_intervention_count"),
            F.countDistinct("i.intervention_type").alias("intervention_type_count"),
            F.countDistinct("sp2.name").alias("sponsor_count"),
        )
        .select(
            *SQL_COLUMN_NAMES,
            "sponsor_type",
            "number_of_facilities",
            "gender",
            "has_us_facility",
            "average_condition_completion_ratio",
            # mixed-type CASE: Postgres coerces THEN '1' to int (SURVEY §7.4.4)
            stage_from_title(F.col("brief_title")).alias("condition_stage"),
            null_to_zero(F.col("number_of_arms")).cast("int").alias("number_of_arms_clean"),
            "allocation",
            "intervention_model",
            "primary_purpose",
            F.lit(0).alias("drug_recency"),
            "description",
            "design_group_intervention_count",
            "intervention_type_count",
            "sponsor_count",
        )
    )


#: ct_data.py:107-146 — value-lookup encoders (order within each dict is the
#: reference's .loc statement order; none of these overlap, so order only
#: matters for the allocation chain below).
STUDY_TYPE_CODES = {
    "Expanded Access": 1, "Interventional": 2, "Observational": 3,
    "Observational [Patient Registry]": 4,
}
AGENCY_CODES = {"U.S. Fed": 0, "NIH": 1, "Industry": 2, "Other": 3}
GENDER_CODES = {"Male": 1, "Female": 2}
PRIMARY_PURPOSE_CODES = {
    "Basic Science": 1, "Device Feasibility": 2, "Diagnostic": 3,
    "Educational/Counseling/Training": 4, "Health Services Research": 5,
    "Prevention": 6, "Screening": 7, "Supportive Care": 8, "Treatment": 9,
}


def feature_table(features: DataFrame) -> DataFrame:
    """The pandas feature engineering (ct_data.py:106-151) as expressions.

    The allocation encoder is the overwrite-ordering gotcha
    (ct_data.py:127-131): five .loc masks applied in sequence, later
    writers win — including 'randomized' ⊂ 'non-randomized' substring
    overlap. encode_last_writer_wins reverses the chain to reproduce it.
    NULL descriptions: pandas str.contains yields NaN and the reference
    would fault on a NaN mask; the engine pins NULL → no match
    (documented difference, only reachable when description is NULL).
    """
    allocation_rules = [
        (F.col("allocation") == "Randomized", 1),
        (F.col("description").contains("randomized"), 1),
        (F.col("allocation") == "Non-Randomized", 2),
        (F.col("description").contains("non-randomized"), 2),
        (F.col("number_of_arms_clean") == 1, 2),
    ]
    status_rules = [
        (F.col("overall_status") == "Completed", 0),
        (F.col("overall_status") == "Terminated", 1),
    ]
    engineered = features.select(
        "*",
        F.year("start_date").alias("start_epoch"),
        encode_categories(F.col("study_type"), STUDY_TYPE_CODES).alias("study_type_category"),
        encode_categories(F.col("sponsor_type"), AGENCY_CODES).alias("agency_type_category"),
        encode_categories(F.col("gender"), GENDER_CODES).alias("gender_category"),
        encode_last_writer_wins(allocation_rules, 0).cast("int").alias("allocation_type"),
        encode_categories(
            F.col("enrollment_type"), {"Anticipated": 1}
        ).alias("enrollment_type_category"),
        encode_categories(
            F.col("primary_purpose"), PRIMARY_PURPOSE_CODES
        ).alias("primary_purpose_type"),
        encode_last_writer_wins(status_rules, 0).cast("int").alias("status"),
    )
    # ct_data.py:150-151 — drop the raw columns the encoders consumed
    return engineered.drop(
        "start_date", "overall_status", "average_condition_completion_ratio",
        "sponsor_type", "gender", "phase", "study_type", "has_us_facility",
        "allocation", "intervention_model", "primary_purpose",
        "enrollment_type", "description",
    )


def load_data(
    t, y_name: str = "status", seed: int | None = None
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """End-to-end parity with ct_data.load_data (ct_data.py:66-165):
    flagship query → feature engineering → exact-size 0.7/0.005 split."""
    from clinical_bi_spark.operators.split import exact_size_seeded_split

    df = feature_table(flagship_features(t))
    return exact_size_seeded_split(df, 0.7, 0.005, seed=seed or 42, order_key="nct_id")


def dashboard_extract(t) -> DataFrame:
    """The warehouse extract (db2wh-etl.sh:73-107): studies ⟕
    calculated_values ⟕ conditions ⟕ interventions, with the 8-pattern
    dashboard oncology classifier ('anoma', not 'lanoma' — the pattern
    sets differ per site, SURVEY.md F3) emitting 't'/'f' char flags.

    The boolean columns stay BooleanType here; sinks.write_delimited
    formats them 't'/'f' to match the psql dump the DB2 loader consumed.
    """
    s = t.studies.alias("s")
    v = t.calculated_values.alias("v")
    c = t.conditions.alias("c")
    i = t.interventions.alias("i")
    key = F.col("s.nct_id")
    onco = contains_any(F.col("c.downcase_name"), ONCOLOGY_PATTERNS_DASHBOARD)
    return (
        s.join(v, key == F.col("v.nct_id"), "left")
        .join(c, key == F.col("c.nct_id"), "left")
        .join(i, key == F.col("i.nct_id"), "left")
        .select(
            F.col("s.nct_id").alias("nct_id"),
            F.col("s.overall_status").alias("overall_status"),
            F.col("s.phase").alias("phase"),
            F.col("s.start_date").alias("start_date"),
            F.col("s.study_first_submitted_date").alias("study_first_submitted_date"),
            F.col("s.study_type").alias("study_type"),
            F.col("s.number_of_arms").alias("number_of_arms"),
            F.col("s.number_of_groups").alias("number_of_groups"),
            F.col("s.source").alias("source"),
            F.col("s.enrollment").alias("enrollment"),
            F.col("s.enrollment_type").alias("enrollment_type"),
            F.col("v.number_of_facilities").alias("number_of_facilities"),
            F.col("v.has_us_facility").alias("has_us_facility"),
            F.col("v.has_single_facility").alias("has_single_facility"),
            F.col("c.downcase_name").alias("condition"),
            F.when(onco, F.lit("t")).otherwise(F.lit("f")).alias("condition_onco"),
            F.col("i.intervention_type").alias("intervention_type"),
            F.col("i.name").alias("intervention_name"),
        )
    )
