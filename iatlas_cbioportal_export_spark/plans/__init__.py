from iatlas_cbioportal_export_spark.plans.clinical_pipeline import (  # noqa: F401
    preprocess_clinical,
)
