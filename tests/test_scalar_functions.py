"""Scalar function parity tests — golden values from the reference's own
test suite (tests/test_clinical.py) re-asserted against our Spark exprs."""

import pyspark.sql.functions as F
import pytest

from iatlas_cbioportal_export_spark.functions.scalar import (
    case_list_slug,
    case_normalize,
    coalesce_remap,
    days_to_months,
    recode_values,
    strip_colname_suffixes,
    strip_first_literal,
)


def _vals(df, col):
    return [r[col] for r in df.select(col).collect()]


# Reference golden values: tests/test_clinical.py:24-31 (231->7.59,
# 1000->32.85, 345->11.33, 706.208->23.2)
@pytest.mark.parametrize(
    "days,months",
    [(231.0, 7.59), (1000.0, 32.85), (345.0, 11.33), (706.208, 23.2), (None, None)],
)
def test_days_to_months_golden(spark, days, months):
    df = spark.createDataFrame([(days,)], "d double")
    out = df.select(days_to_months("d").alias("m")).collect()[0]["m"]
    assert out == months


@pytest.mark.parametrize(
    "value,literal,expected",
    [
        ("liver_cancer_tissue", "_cancer_tissue", "liver"),
        # repeated-suffix case (reference tests/test_clinical.py:170-181):
        # only the FIRST occurrence goes
        ("clinical_response_response", "_response", "clinical_response"),
        ("no_suffix_here", "_absent", "no_suffix_here"),
        ("_response", "_response", ""),
        (None, "_response", None),
    ],
)
def test_strip_first_literal(spark, value, literal, expected):
    df = spark.createDataFrame([(value,)], "v string")
    out = df.select(strip_first_literal("v", literal).alias("s")).collect()[0]["s"]
    assert out == expected


def test_strip_colname_suffixes_table_wide(spark):
    df = spark.createDataFrame(
        [("liver_cancer_tissue", "tcga_amadeus", 5)],
        "Cancer_Tissue string, AMADEUS_STUDY string, n long",
    )
    out = strip_colname_suffixes(df, special={"AMADEUS_STUDY": "_amadeus"}).collect()[0]
    assert out["Cancer_Tissue"] == "liver"
    assert out["AMADEUS_STUDY"] == "tcga"
    assert out["n"] == 5  # non-string untouched


def test_strip_preserves_null_count(spark):
    # reference asserts NA count unchanged (clinical.py:129-132)
    df = spark.createDataFrame(
        [("a_x",), (None,), ("b",)], "X string"
    )
    out = strip_colname_suffixes(df)
    assert out.filter(F.col("X").isNull()).count() == 1


@pytest.mark.parametrize(
    "value,mode,expected",
    [
        ("not_hispanic_or_latino", "CAPS", "NOT HISPANIC OR LATINO"),
        ("not_hispanic_or_latino", "Title Case", "Not Hispanic Or Latino"),
        ("not_hispanic_or_latino", None, "not_hispanic_or_latino"),
        (None, "CAPS", None),
    ],
)
def test_case_normalize(spark, value, mode, expected):
    df = spark.createDataFrame([(value,)], "v string")
    assert df.select(case_normalize("v", mode).alias("c")).collect()[0]["c"] == expected


def test_recode_values_passthrough(spark):
    # unmapped 2 and NULL pass through (reference tests/test_clinical.py:581-613)
    df = spark.createDataFrame([(0,), (1,), (2,), (None,)], "s int")
    out = _vals(df.select(recode_values("s", {0: "0:LIVING", 1: "1:DECEASED"}).alias("r")), "r")
    assert out == ["0:LIVING", "1:DECEASED", "2", None]


def test_coalesce_remap(spark):
    # F4: study_sample_name wins where present (clinical.py:170-196)
    df = spark.createDataFrame(
        [("paper1", "s1"), (None, "s2")], "study_sample_name string, sample_name string"
    )
    out = _vals(coalesce_remap(df, "SAMPLE_ID", "study_sample_name", "sample_name"), "SAMPLE_ID")
    assert out == ["paper1", "s2"]


@pytest.mark.parametrize(
    "value,expected",
    [
        ("Breast Cancer", "Breast_Cancer"),
        ("a,b/c d", "ab_c_d"),
        ("", "no_oncotree_code"),
        ("NA", "no_oncotree_code"),
        (None, "no_oncotree_code"),
    ],
)
def test_case_list_slug(spark, value, expected):
    df = spark.createDataFrame([(value,)], "v string")
    assert df.select(case_list_slug("v").alias("s")).collect()[0]["s"] == expected


def test_strip_colname_suffixes_matches_column_path(spark):
    # r10 regression pin for the selectExpr rendering: the SQL-string
    # builder must agree with the Column-DSL strip_first_literal applied
    # per column, including the AMADEUS double-strip special case, NULLs,
    # repeated suffixes, and columns whose names need quoting.
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            ("x_amadeus_study_amadeus", "keep_me", 1),
            ("clinical_response_response", None, 2),
            (None, "plain", 3),
            ("no_suffix_here", "o'quote_odd col", 4),
        ],
        ["AMADEUS_Study", "odd col", "n"],
    )
    special = {"AMADEUS_Study": "_amadeus"}
    out_sql = strip_colname_suffixes(df, special=special)
    exprs = []
    for field in df.schema.fields:
        if field.dataType.typeName() == "string":
            e = strip_first_literal(F.col(field.name), "_" + field.name.lower())
            if field.name in special:
                e = strip_first_literal(e, special[field.name])
            exprs.append(e.alias(field.name))
        else:
            exprs.append(F.col(field.name))
    out_col = df.select(*exprs)
    assert out_sql.columns == out_col.columns
    assert [tuple(r) for r in out_sql.orderBy("n").collect()] == [
        tuple(r) for r in out_col.orderBy("n").collect()
    ]
