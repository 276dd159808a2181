"""iatlas_cbioportal_export_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the data semantics of
Sage-Bionetworks/iatlas-cbioportal-export (a pandas batch ETL pipeline that
converts clinical TSVs + MAF mutation files into cBioPortal study bundles),
plus first-class large-scale training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing).

Design stance (SURVEY.md §7):
- every operator is a pure ``DataFrame -> DataFrame`` function (or a Column
  expression factory) declared with the DataFrame API so Catalyst gets the
  whole logical plan — no driver-side loops over collected data on fact
  tables, no row-at-a-time Python UDFs in any hot path;
- small mapping/dimension tables are explicitly ``broadcast()``;
- explicit schemas everywhere (kills the reference's ``%.12g`` float-format
  workaround);
- validations return findings DataFrames instead of logger side effects.
"""

__version__ = "0.1.0"

from iatlas_cbioportal_export_spark.session import get_spark  # noqa: F401
