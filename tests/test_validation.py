"""Validation suite V1-V14 as findings DataFrames."""

from iatlas_cbioportal_export_spark.operators.validation import (
    count_equality,
    distinct_count_equality,
    findings_df,
    has_errors,
    keyset_preserved,
    no_all_null_columns,
    no_duplicate_rows,
    no_null_keys,
    required_columns_present,
)


def test_findings_ok_and_error(spark):
    a = spark.createDataFrame([("s1",), ("s2",)], "SAMPLE_ID string")
    b = spark.createDataFrame([("s1",)], "SAMPLE_ID string")
    findings = [
        count_equality(a, a),                      # OK
        count_equality(a, b, check="shrunk"),      # ERROR
        distinct_count_equality(a, a, "SAMPLE_ID"),
        *no_null_keys(a, ["SAMPLE_ID"]),
        no_duplicate_rows(a),
        keyset_preserved(a, "SAMPLE_ID", b, "SAMPLE_ID", check="sets"),  # ERROR
        required_columns_present(a, ["SAMPLE_ID", "MISSING"], check="cols"),  # ERROR
        *no_all_null_columns(a),
    ]
    df = findings_df(spark, findings)
    status = {r["check"]: r["status"] for r in df.collect()}
    assert status["row_count_preserved"] == "OK"
    assert status["shrunk"] == "ERROR"
    assert status["sets"] == "ERROR"
    assert status["cols"] == "ERROR"
    assert status["no_all_null_columns"] == "OK"
    assert has_errors(df)
    ok_only = findings_df(spark, [count_equality(a, a)])
    assert not has_errors(ok_only)


def test_null_key_finding(spark):
    df = spark.createDataFrame([("s1",), (None,)], "SAMPLE_ID string")
    (f,) = no_null_keys(df, ["SAMPLE_ID"])
    assert f[1] == "ERROR" and f[2] == 1
