"""End-to-end composed clinical preprocessing plan (SURVEY.md §3.1) on a
clinical-shaped synthetic fixture (FIXTURES.md schemas)."""

import pyspark.sql.functions as F
import pytest

from iatlas_cbioportal_export_spark.plans.clinical_pipeline import preprocess_clinical


@pytest.fixture(scope="module")
def fixture(spark):
    clinical = spark.createDataFrame(
        [
            # sample, patient, paper-sample, paper-patient, dataset, tcga, amadeus,
            # os_status, os_days, tissue
            ("s1", "p1", "S1-PAPER", "P1-PAPER", "Anders_JITC_2022", "SKCM", "mel_amadeus", 0, 231.0, "liver_cancer_tissue"),
            ("s2-nd-x", "p2", None, None, "Anders_JITC_2022", "SKCM", "mel_amadeus", 1, 1000.0, "lung_cancer_tissue"),
            ("s3", "p3", None, None, "Other_2020", "LUAD", "lung_amadeus", 2, 345.0, None),
        ],
        "sample_name string, patient_name string, study_sample_name string, "
        "study_patient_name string, Dataset string, TCGA_Study string, "
        "AMADEUS_STUDY string, OS_STATUS int, OS_MONTHS double, Cancer_Tissue string",
    )
    oncotree = spark.createDataFrame(
        [
            ("SKCM", "mel_amadeus", "Anders_JITC_2022", "SKCM"),
            ("LUAD", "lung_amadeus", "Other_2020", "LUAD"),
        ],
        "TCGA_Study string, AMADEUS_Study string, Dataset string, ONCOTREE_CODE string",
    )
    codes = spark.createDataFrame(
        [("SKCM", "Melanoma", "Cutaneous Melanoma"), ("LUAD", "NSCLC", "Lung Adeno")],
        "ONCOTREE_CODE string, CANCER_TYPE string, CANCER_TYPE_DETAILED string",
    )
    return clinical, oncotree, codes


def test_preprocess_clinical_end_to_end(spark, fixture):
    clinical, oncotree, codes = fixture
    # the fixture joins on AMADEUS_Study; our table has AMADEUS_STUDY — align
    clinical = clinical.withColumnRenamed("AMADEUS_STUDY", "AMADEUS_Study")
    out = preprocess_clinical(
        clinical,
        oncotree,
        case_modes={"Cancer_Tissue": "Title Case"},
        oncotree_codes=codes,
    ).cache()
    rows = {r["SAMPLE_ID"]: r for r in out.collect()}

    # P1: the -nd- sample inside Anders_JITC_2022 was dropped
    assert set(rows) == {"S1-PAPER", "s3"}
    s1, s3 = rows["S1-PAPER"], rows["s3"]
    # F4: paper id preferred; fallback elsewhere
    assert s1["PATIENT_ID"] == "P1-PAPER" and s3["PATIENT_ID"] == "p3"
    # J1 + J4: oncotree code and expansion arrived
    assert s1["CANCER_TYPE"] == "Melanoma"
    assert s3["CANCER_TYPE_DETAILED"] == "Lung Adeno"
    # F3: recode with passthrough for 2
    assert s1["OS_STATUS"] == "0:LIVING" and s3["OS_STATUS"] == "2"
    # F5: golden conversion
    assert s1["OS_MONTHS"] == 7.59 and s3["OS_MONTHS"] == 11.33
    # F1: suffix strip (first occurrence of _cancer_tissue) then F2 title case
    assert s1["Cancer_Tissue"] == "Liver"
    # F1 special: the extra "_amadeus" strip applies ONLY to the exact
    # reference column name AMADEUS_STUDY (clinical.py:123-126, pinned by
    # test_reference_differential) — this column is AMADEUS_Study, so only
    # the general "_amadeus_study" suffix strip ran and the value is kept
    assert s1["AMADEUS_Study"] == "mel_amadeus"
    assert s3["Cancer_Tissue"] is None  # null preserved


def test_preprocess_is_single_dag_with_broadcasts(spark, fixture):
    clinical, oncotree, codes = fixture
    clinical = clinical.withColumnRenamed("AMADEUS_STUDY", "AMADEUS_Study")
    out = preprocess_clinical(clinical, oncotree, oncotree_codes=codes)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2  # both dim joins broadcast
    assert "SortMergeJoin" not in plan


def test_neoantigen_outer_join_growth(spark, fixture):
    clinical, oncotree, _ = fixture
    clinical = clinical.withColumnRenamed("AMADEUS_STUDY", "AMADEUS_Study")
    neo = spark.createDataFrame(
        [("S1-PAPER", 12), ("neo-only", 3)], "SAMPLE_ID string, neo_count long"
    )
    out = preprocess_clinical(clinical, oncotree, neoantigen=neo)
    ids = {r["SAMPLE_ID"] for r in out.select("SAMPLE_ID").collect()}
    assert "neo-only" in ids  # outer join grew the table (auditable via J3)
    assert out.filter(F.col("SAMPLE_ID") == "S1-PAPER").collect()[0]["neo_count"] == 12


def test_kaplan_meier_textbook_example(spark):
    from iatlas_cbioportal_export_spark.plans.clinical_pipeline import (
        kaplan_meier,
    )

    # classic toy cohort: events at t=1 (1 of 5), t=3 (2 of 3, after one
    # censored at t=2), censored at t=4, event at t=5 (1 of 1 -> S=0)
    rows = [
        ("a", 1, 1), ("a", 2, 0), ("a", 3, 1), ("a", 3, 1),
        ("a", 4, 0), ("a", 5, 1),
    ]
    df = spark.createDataFrame(rows, "g string, t long, ev int")
    out = {
        r["t"]: (r["n_risk"], r["n_events"], r["survival"])
        for r in kaplan_meier(df, "g", "t", "ev").collect()
    }
    s1 = round(1 - 1 / 6, 6)                      # 5/6 at t=1 (n=6)
    s3 = round((5 / 6) * (1 - 2 / 4), 6)          # n=4 at t=3
    assert out[1] == (6, 1, s1)
    assert out[3] == (4, 2, s3)
    assert out[5] == (1, 1, 0.0)                  # full-death endpoint
    assert 2 not in out and 4 not in out          # censor-only times hidden


def test_kaplan_meier_groups_independent(spark):
    from iatlas_cbioportal_export_spark.plans.clinical_pipeline import (
        kaplan_meier,
    )

    rows = [("x", 1, 1), ("x", 2, 1), ("y", 1, 1)]
    df = spark.createDataFrame(rows, "g string, t long, ev int")
    out = {
        (r["g"], r["t"]): r["survival"]
        for r in kaplan_meier(df, "g", "t", "ev").collect()
    }
    assert out[("x", 1)] == 0.5
    assert out[("x", 2)] == 0.0
    assert out[("y", 1)] == 0.0


def test_logrank_identical_groups_z_near_zero(spark):
    from iatlas_cbioportal_export_spark.plans.clinical_pipeline import (
        logrank_test,
    )

    # two groups with IDENTICAL survival experience: O_a == E_a exactly
    rows = []
    for g in ("a", "b"):
        rows += [(g, t, 1) for t in (1, 2, 3, 4)] + [(g, 5, 0)]
    df = spark.createDataFrame(rows, "g string, t long, ev int")
    r = logrank_test(df, "g", "t", "ev", "a", "b").collect()[0]
    assert r["observed_a"] == 4
    assert abs(r["observed_a"] - r["expected_a"]) < 1e-9
    assert abs(r["z"]) < 1e-6


def test_logrank_hand_computed_single_time(spark):
    from iatlas_cbioportal_export_spark.plans.clinical_pipeline import (
        logrank_test,
    )

    # one event time: group a: 2 subjects 1 death; group b: 2 subjects,
    # 0 deaths. d=1, n=4, n_a=2 -> E_a=0.5, V=1*(.5)*(.5)*(3)/3=0.25, Z=1.0
    rows = [("a", 1, 1), ("a", 1, 0), ("b", 1, 0), ("b", 1, 0)]
    df = spark.createDataFrame(rows, "g string, t long, ev int")
    r = logrank_test(df, "g", "t", "ev", "a", "b").collect()[0]
    assert (r["observed_a"], r["expected_a"], r["variance"], r["z"]) == (
        1, 0.5, 0.25, 1.0,
    )
