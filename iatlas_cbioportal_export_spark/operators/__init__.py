from iatlas_cbioportal_export_spark.operators import (  # noqa: F401
    aggregates,
    dedup,
    filters,
    joins,
    maf,
    multimodal,
    profiling,
    projections,
    similarity,
    text,
    validation,
)
