"""V12: the 118-column annotated-MAF schema contract
(reference validate.py:14-133)."""

import pyspark.sql.functions as F

from iatlas_cbioportal_export_spark.operators.validation import (
    required_columns_present,
)
from iatlas_cbioportal_export_spark.sources.maf_schema import (
    MAF_SCHEMA,
    REQUIRED_MAF_COLS,
)
from iatlas_cbioportal_export_spark.sources.readers import read_tsv


def test_schema_has_118_columns_and_types():
    assert len(REQUIRED_MAF_COLS) == 118
    assert len(MAF_SCHEMA.fields) == 118
    by_name = {f.name: f.dataType.typeName() for f in MAF_SCHEMA.fields}
    assert by_name["Start_Position"] == "long"
    assert by_name["t_alt_count"] == "long"
    assert by_name["gnomADe_AF"] == "double"
    assert by_name["Tumor_Sample_Barcode"] == "string"
    assert by_name["MHCflurry_2.1.1_presentation_score"] == "double"


def test_v12_full_maf_schema_check(spark):
    full = spark.createDataFrame([], MAF_SCHEMA)
    (ok_row,) = required_columns_present(
        full, REQUIRED_MAF_COLS, check="maf_118"
    ).collect()
    assert ok_row["status"] == "OK"

    missing_one = full.drop("gnomADe_AF")
    (err_row,) = required_columns_present(
        missing_one, REQUIRED_MAF_COLS, check="maf_118"
    ).collect()
    assert err_row["status"] == "ERROR"
    assert err_row["detail"] == "missing: gnomADe_AF"


def test_annotation_reconstitutes_118_col_schema(spark):
    # V12 end-to-end through the annotator: a raw MAF carrying only the
    # NON-annotation subset of REQUIRED_MAF_COLS, run through the fake
    # Genome Nexus stage (~40 added columns), must come out covering the
    # full 118-column surface (reference: validateData.py checks the
    # ANNOTATED output, validate.py:159-172).
    from iatlas_cbioportal_export_spark.operators.maf import (
        ANNOTATION_COLS,
        annotate,
    )
    from iatlas_cbioportal_export_spark.sources.maf_schema import _field_type
    from pyspark.sql.types import StructField, StructType

    added = {name for name, _t in ANNOTATION_COLS}
    raw_cols = [c for c in REQUIRED_MAF_COLS if c not in added]
    raw_schema = StructType(
        [StructField(c, _field_type(c), True) for c in raw_cols]
    )
    raw = spark.createDataFrame(
        [tuple(
            7674220 if c == "Start_Position" else
            "chr17" if c == "Chromosome" else
            None
            for c in raw_cols
        )],
        raw_schema,
    )
    out = annotate(raw)
    (ok_row,) = required_columns_present(
        out, REQUIRED_MAF_COLS, check="maf_118_post_annotation"
    ).collect()
    assert ok_row["status"] == "OK"
    row = out.collect()[0]
    assert row["HGVSp_Short"] == "p.chr17:7674220"
    assert row["SYMBOL"] == "SYMBOL=chr17:7674220"
    assert row["Annotation_Status"] == "SUCCESS"
    assert isinstance(row["gnomADe_AF"], float)


def test_maf_tsv_scan_with_declared_schema(spark, tmp_path):
    # S1/S2 contract: a declared schema gives typed columns straight off the
    # TSV scan — no inference pass, no %.12g float-format workaround.
    p = tmp_path / "x.maf"
    cols = "\t".join(REQUIRED_MAF_COLS)
    row = "\t".join(
        {
            "Hugo_Symbol": "TP53",
            "Start_Position": "7674220",
            "t_alt_count": "12",
            "t_ref_count": "30",
            "gnomADe_AF": "0.25",
        }.get(c, "")
        for c in REQUIRED_MAF_COLS
    )
    p.write_text("#version 2.4\n" + cols + "\n" + row + "\n")
    df = read_tsv(spark, str(p), schema=MAF_SCHEMA, comment="#")
    got = df.select(
        "Hugo_Symbol", "Start_Position", "t_alt_count", "gnomADe_AF"
    ).collect()[0]
    assert got["Hugo_Symbol"] == "TP53"
    assert got["Start_Position"] == 7674220 and isinstance(got["Start_Position"], int)
    assert got["gnomADe_AF"] == 0.25
    assert df.schema["t_alt_count"].dataType.typeName() == "long"
    assert df.filter(F.col("Chromosome").isNull()).count() == 1
