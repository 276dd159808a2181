"""Empty-input robustness: every operator family must handle a zero-row
(but schema'd) input without raising — the behavior a scheduled pipeline
hits when an upstream drop produces an empty partition or dataset."""

import pyspark.sql.functions as F

from iatlas_cbioportal_export_spark.operators.aggregates import (
    case_list_groups,
    chunk_assignment,
    null_profile,
)
from iatlas_cbioportal_export_spark.operators.dedup import (
    exact_dedup_keep_min,
    minhash_near_duplicates,
)
from iatlas_cbioportal_export_spark.operators.maf import annotate, drop_chrm
from iatlas_cbioportal_export_spark.operators.projections import (
    prune_all_null_columns,
)
from iatlas_cbioportal_export_spark.operators.text import language_id, token_stats
from iatlas_cbioportal_export_spark.operators.validation import (
    findings_union,
    has_errors,
    no_null_keys,
)
from iatlas_cbioportal_export_spark.plans.clinical_pipeline import (
    preprocess_clinical,
)


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string, lang string")


def test_dedup_on_empty_corpus(spark):
    docs = _empty_docs(spark)
    assert exact_dedup_keep_min(docs).count() == 0
    assert minhash_near_duplicates(docs, num_hashes=8, bands=4).count() == 0


def test_text_ops_on_empty_corpus(spark):
    docs = _empty_docs(spark)
    assert token_stats(docs).count() == 0
    assert language_id(docs).count() == 0


def test_aggregates_on_empty(spark):
    df = spark.createDataFrame([], "CANCER_TYPE string, SAMPLE_ID string")
    assert case_list_groups(df).count() == 0
    assert chunk_assignment(df, "SAMPLE_ID").count() == 0
    profile = null_profile(df)
    assert profile.count() == 2  # one row per column, zero counts
    assert all(r["n_non_null"] == 0 for r in profile.collect())


def test_prune_all_null_on_empty_keeps_no_columns(spark):
    df = spark.createDataFrame([], "a string, b long")
    # zero rows → every column is all-null → everything pruned
    assert prune_all_null_columns(df).columns == []


def test_validation_suite_on_empty_is_clean(spark):
    df = spark.createDataFrame([], "SAMPLE_ID string")
    findings = findings_union([no_null_keys(df, ["SAMPLE_ID"])])
    assert not has_errors(findings)


def test_maf_path_on_empty(spark):
    maf = spark.createDataFrame(
        [], "Hugo_Symbol string, Chromosome string, Start_Position long"
    )
    assert drop_chrm(annotate(maf)).count() == 0


def test_preprocess_on_empty_clinical(spark):
    clinical = spark.createDataFrame(
        [],
        "sample_name string, patient_name string, TCGA_Study string, "
        "AMADEUS_Study string, Dataset string",
    )
    oncotree = spark.createDataFrame(
        [("X", "Y", "Z", "C")],
        "TCGA_Study string, AMADEUS_Study string, Dataset string, ONCOTREE_CODE string",
    )
    out = preprocess_clinical(clinical, oncotree)
    assert out.count() == 0
    assert "SAMPLE_ID" in out.columns and "ONCOTREE_CODE" in out.columns
