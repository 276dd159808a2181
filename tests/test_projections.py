"""P4/P5/P6 projection + pruning operators (reference
tests/test_clinical.py:352-443)."""

from iatlas_cbioportal_export_spark.operators.projections import (
    prune_all_null_columns,
    rename_columns,
    split_patient_sample,
)


def test_prune_all_null_columns(spark):
    df = spark.createDataFrame(
        [("a", None, 1.0), ("b", None, None)], "x string, dead string, y double"
    )
    out = prune_all_null_columns(df)
    assert out.columns == ["x", "y"]
    assert out.count() == 2


def test_rename_columns(spark):
    df = spark.createDataFrame([(1, 2)], "a long, b long")
    assert rename_columns(df, {"a": "A1", "b": "B1"}).columns == ["A1", "B1"]


def test_split_patient_sample(spark):
    df = spark.createDataFrame(
        [
            ("s1", "p1", "Mel", "MelD", "white", "stageII"),
            ("s2", "p1", "Mel", "MelD", "white", "stageIII"),
        ],
        "SAMPLE_ID string, PATIENT_ID string, CANCER_TYPE string, "
        "CANCER_TYPE_DETAILED string, RACE string, STAGE string",
    )
    attr_types = {"RACE": "PATIENT", "STAGE": "SAMPLE"}
    patient, sample = split_patient_sample(df, attr_types)
    # patient view: PATIENT_ID + PATIENT attrs, deduplicated
    assert patient.columns == ["PATIENT_ID", "RACE"]
    assert patient.count() == 1
    # sample view: fixed keys + SAMPLE attrs
    assert sample.columns == [
        "SAMPLE_ID", "PATIENT_ID", "CANCER_TYPE", "CANCER_TYPE_DETAILED", "STAGE"
    ]
    assert sample.count() == 2
