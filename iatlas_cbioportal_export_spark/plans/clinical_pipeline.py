"""The flagship composed plan: the reference's clinical preprocessing as ONE
lazy DataFrame DAG (SURVEY.md §3.1).

Reference call graph (``clinical.py:290-362``): oncotree left join (J1) →
id remap (F4) → neoantigen outer join (J3) → header rename (P6) → regex
filter (P1) → status recode (F3) → days→months ×2 (F5) → suffix strip (F1)
→ case normalization (F2) → oncotree code expansion (J4). The reference
materializes TSV between stages and shells out twice; here it is one DAG —
Catalyst reorders/pushes filters, both dimension joins broadcast, and the
caller materializes once (``cache()``) before the patient/sample split.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iatlas_cbioportal_export_spark.functions.scalar import (
    case_normalize,
    days_to_months,
    recode_values,
)
from iatlas_cbioportal_export_spark.functions.scalar import strip_colname_suffixes
from iatlas_cbioportal_export_spark.operators.filters import regex_filter_scoped
from iatlas_cbioportal_export_spark.operators.joins import (
    broadcast_left_join,
    code_expansion_join,
)
from iatlas_cbioportal_export_spark.operators.projections import rename_columns

ONCOTREE_MERGE_COLS = ["TCGA_Study", "AMADEUS_Study", "Dataset"]
STATUS_RECODE = {0: "0:LIVING", 1: "1:DECEASED"}
SAMPLE_FILTER_PATTERN = r"-(?:nd|ad|nr)-"
SAMPLE_FILTER_DATASET = "Anders_JITC_2022"


def preprocess_clinical(
    clinical: DataFrame,
    oncotree_map: DataFrame,
    neoantigen: DataFrame | None = None,
    header_renames: Mapping[str, str] | None = None,
    case_modes: Mapping[str, str] | None = None,
    oncotree_codes: DataFrame | None = None,
) -> DataFrame:
    """One-DAG clinical preprocessing; every stage optional except the
    oncotree join so unit tests can exercise slices."""
    out = broadcast_left_join(
        clinical, oncotree_map, on=ONCOTREE_MERGE_COLS, dim_cols=["ONCOTREE_CODE"]
    )
    # F4: prefer paper ids where present (clinical.py:170-196); with no
    # study_* columns the base names promote to the canonical ids directly
    for preferred, fallback, dest in (
        ("study_sample_name", "sample_name", "SAMPLE_ID"),
        ("study_patient_name", "patient_name", "PATIENT_ID"),
    ):
        if preferred in out.columns and fallback in out.columns:
            out = out.withColumn(dest, F.coalesce(preferred, fallback)).drop(
                preferred, fallback
            )
        elif fallback in out.columns:
            out = out.withColumnRenamed(fallback, dest)
    # J3: neoantigen outer join (clinical.py:265-287); key cast to string first
    if neoantigen is not None:
        out = out.withColumn("SAMPLE_ID", F.col("SAMPLE_ID").cast("string")).join(
            neoantigen.withColumn("SAMPLE_ID", F.col("SAMPLE_ID").cast("string")),
            on="SAMPLE_ID",
            how="outer",
        )
    if header_renames:
        out = rename_columns(out, header_renames)
    # P1 scoped regex filter (clinical.py:74-95)
    out = regex_filter_scoped(
        out, "SAMPLE_ID", SAMPLE_FILTER_PATTERN, "Dataset", SAMPLE_FILTER_DATASET
    )
    # F3 status recode (clinical.py:403-422)
    for c in ("OS_STATUS", "PFS_STATUS"):
        if c in out.columns:
            out = out.withColumn(c, recode_values(c, STATUS_RECODE))
    # F5 days→months (clinical.py:515-535)
    for c in ("OS_MONTHS", "PFS_MONTHS"):
        if c in out.columns:
            out = out.withColumn(c, days_to_months(c))
    # F1 suffix strip over all string columns (clinical.py:98-133)
    out = strip_colname_suffixes(
        out, special={"AMADEUS_Study": "_amadeus", "AMADEUS_STUDY": "_amadeus"}
    )
    # F2 case normalization driven by the mapping's Case column
    for c, mode in (case_modes or {}).items():
        if c in out.columns:
            out = out.withColumn(c, case_normalize(c, mode))
    # J4 oncotree code expansion (native replacement of the subprocess)
    if oncotree_codes is not None:
        out = code_expansion_join(
            out, oncotree_codes, "ONCOTREE_CODE", ["CANCER_TYPE", "CANCER_TYPE_DETAILED"]
        )
    return out
