"""Reference-differential tests for the MAF/validate side: import the
actual reference ``maf`` and ``validate`` modules (same no-network Synapse
fake as ``test_reference_differential``) and pin our Spark operators
against their real pandas behavior on shared fixtures.

Covers: chrM postprocessing filter (P2 NaN semantics), ceil-division MAF
chunking (S4), folder merge with outer column alignment (S2), neoantigen↔
maf key-set equality (J6), and the allele-freq NA gate."""

from __future__ import annotations

import sys
from types import SimpleNamespace
from unittest import mock

import numpy as np
import pandas as pd
import pytest
from pandas.testing import assert_frame_equal
from pyspark.sql import functions as F

from iatlas_cbioportal_export_spark.operators.aggregates import (
    chunk_assignment,
)
from iatlas_cbioportal_export_spark.operators.filters import (
    neq_filter_keep_nulls,
)
from iatlas_cbioportal_export_spark.operators.joins import keyset_equality
from iatlas_cbioportal_export_spark.sources.readers import read_maf_folder
from tests.test_reference_differential import REF_PKG_DIR, _load_reference_clinical


def _load_reference(modname: str):
    if _load_reference_clinical() is None:
        return None
    import importlib

    return importlib.import_module(modname)


ref_maf = _load_reference("maf")
ref_val = _load_reference("validate")
from tests import test_reference_differential as _refmod

pytestmark = pytest.mark.skipif(ref_maf is None, reason=_refmod.skip_reason)


def test_chrm_postprocessing_differential(spark):
    """maf.py:181-196: pandas `!=` keeps NaN chromosomes — so must we."""
    pdf = pd.DataFrame(
        {
            "Chromosome": ["chr1", "chrM", None, "chrM", "chr22", "chrm"],
            "v": list(range(6)),
        }
    )
    exp = ref_maf.postprocessing(pdf)
    got = neq_filter_keep_nulls(
        spark.createDataFrame(pdf), "Chromosome", "chrM"
    ).toPandas()
    exp = exp.sort_values("v").reset_index(drop=True)
    got = got.sort_values("v").reset_index(drop=True)
    for c in ("Chromosome",):
        exp[c] = exp[c].where(pd.notna(exp[c]), None)
        got[c] = got[c].where(pd.notna(got[c]), None)
    assert_frame_equal(exp, got, check_dtype=False)


@pytest.mark.parametrize("n_rows,max_rows", [(10, 4), (40, 40), (1, 7), (12, 3)])
def test_chunking_differential(spark, tmp_path, n_rows, max_rows):
    """maf.py:39-72: ceil-division positional chunking — the reference's
    written chunk files must have exactly the row counts chunk_assignment
    derives (chunk i gets rows [i*max_rows, (i+1)*max_rows))."""
    (tmp_path / "add-clinical-header" / "ds").mkdir(parents=True)
    pdf = pd.DataFrame({"k": range(n_rows), "x": [f"v{i}" for i in range(n_rows)]})
    n_chunks = ref_maf.split_into_chunks(
        "ds", pdf, str(tmp_path), max_rows=max_rows
    )
    ref_sizes = {
        i: len(
            pd.read_csv(
                tmp_path / "add-clinical-header" / "ds" / f"data_mutations_{i + 1}.txt",
                sep="\t",
            )
        )
        for i in range(n_chunks)
    }
    got = (
        chunk_assignment(spark.createDataFrame(pdf), "k", max_rows=max_rows)
        .groupBy("chunk_id")
        .count()
        .collect()
    )
    got_sizes = {int(r["chunk_id"]): r["count"] for r in got}
    assert got_sizes == ref_sizes


def test_maf_folder_merge_differential(spark, tmp_path):
    """maf.py:14-36: .maf files only, '#' comments skipped, columns
    outer-aligned by name via pd.concat — vs read_maf_folder."""
    (tmp_path / "a.maf").write_text(
        "#version 2.4\nHugo_Symbol\tChromosome\nTP53\tchr17\nKRAS\tchr12\n"
    )
    (tmp_path / "b.maf").write_text(
        "Hugo_Symbol\tt_alt_count\nBRAF\t7\n"
    )
    (tmp_path / "ignored.txt").write_text("Hugo_Symbol\nNOPE\n")

    children = [
        {"name": "a.maf", "id": "syn1"},
        {"name": "ignored.txt", "id": "syn2"},
        {"name": "b.maf", "id": "syn3"},
    ]
    paths = {"syn1": str(tmp_path / "a.maf"), "syn3": str(tmp_path / "b.maf")}
    with (
        mock.patch.object(ref_maf.syn, "getChildren", return_value=children, create=True),
        mock.patch.object(
            ref_maf.syn,
            "get",
            side_effect=lambda sid: SimpleNamespace(path=paths[sid]),
        ),
    ):
        exp = ref_maf.read_and_merge_maf_files("synFolder")
    got = read_maf_folder(spark, str(tmp_path)).toPandas()
    exp = exp.sort_values("Hugo_Symbol").reset_index(drop=True)
    got = got[sorted(got.columns)].sort_values("Hugo_Symbol").reset_index(drop=True)
    exp = exp[sorted(exp.columns)]
    for c in exp.columns:
        if exp[c].dtype == object:
            exp[c] = exp[c].where(pd.notna(exp[c]), None)
        if got[c].dtype == object:
            got[c] = got[c].where(pd.notna(got[c]), None)
    assert_frame_equal(exp, got, check_dtype=False)


def test_maf_folder_empty_returns_none(spark, tmp_path):
    """Both sides return None for a folder with no .maf files."""
    (tmp_path / "notes.txt").write_text("x\n")
    with mock.patch.object(
        ref_maf.syn, "getChildren", return_value=[{"name": "notes.txt", "id": "s"}],
        create=True,
    ):
        assert ref_maf.read_and_merge_maf_files("synFolder") is None
    assert read_maf_folder(spark, str(tmp_path)) is None


@pytest.mark.parametrize(
    "maf_ids,neo_ids,expect_error",
    [
        (["S1", "S2"], ["S1", "S2"], False),
        (["S1", "S2", "S2"], ["S2", "S1"], False),  # set semantics
        (["S1"], ["S1", "S3"], True),
        ([1, 2], ["1", "2"], False),  # astype(str) standardization
    ],
)
def test_neoantigen_keyset_differential(spark, maf_ids, neo_ids, expect_error):
    """validate.py:135-157: set-equality of Tumor_Sample_Barcode vs
    Sample_ID (both astype(str)) — the reference errs iff the sets differ;
    keyset_equality's two anti-join sides are both empty iff they match."""
    maf_pdf = pd.DataFrame({"Tumor_Sample_Barcode": maf_ids})
    neo_pdf = pd.DataFrame({"Sample_ID": neo_ids, "SNV": range(len(neo_ids))})
    logger = mock.Mock()
    with (
        mock.patch.object(
            ref_val.syn, "get", return_value=SimpleNamespace(path="d.tsv")
        ),
        mock.patch.object(ref_val.pd, "read_csv", return_value=neo_pdf.copy()),
    ):
        ref_val.validate_that_neoantigen_maf_ids_are_equal(
            maf_pdf.copy(), "synN", logger=logger
        )
    assert logger.error.called == expect_error

    left = spark.createDataFrame(maf_pdf).select(
        F.col("Tumor_Sample_Barcode").cast("string").alias("k")
    )
    right = spark.createDataFrame(neo_pdf).select(
        F.col("Sample_ID").cast("string").alias("k")
    )
    lo, ro = keyset_equality(left, "k", right, "k")
    ours_unequal = bool(lo.count() or ro.count())
    assert ours_unequal == expect_error


@pytest.mark.parametrize(
    "t_ref,t_alt,has_cols,expect_error",
    [
        ([10.0, 20.0], [1.0, 2.0], True, False),
        ([10.0, np.nan], [1.0, 2.0], True, True),
        ([10.0, 20.0], [np.nan, 2.0], True, True),
        (None, None, False, False),  # columns absent → reference no-ops
    ],
)
def test_allele_freq_na_gate_differential(
    spark, t_ref, t_alt, has_cols, expect_error
):
    """maf.py:250-269: ERROR iff any NA in t_ref_count/t_alt_count when
    both columns exist — vs the equivalent Spark null-count gate."""
    if has_cols:
        pdf = pd.DataFrame({"t_ref_count": t_ref, "t_alt_count": t_alt})
    else:
        pdf = pd.DataFrame({"other": [1, 2]})
    logger = mock.Mock()
    ref_maf.validate_that_allele_freq_are_not_na(pdf, logger=logger)
    assert logger.error.called == expect_error

    sdf = spark.createDataFrame(pdf)
    cols = [c for c in ("t_ref_count", "t_alt_count") if c in sdf.columns]
    if len(cols) == 2:
        n_na = sdf.select(
            sum(
                F.count(F.when(F.col(c).isNull(), 1)) for c in cols
            ).alias("n")
        ).collect()[0]["n"]
        assert (n_na > 0) == expect_error
    else:
        assert not expect_error


@pytest.mark.parametrize(
    "cols,required,expect_error",
    [
        (["A", "B"], ["A", "B"], False),
        (["A"], ["A", "B"], True),          # missing
        (["A", "B", "C"], ["A", "B"], True),  # EXTRA also fires (set !=)
        (["B", "A"], ["A", "B"], False),    # order-insensitive
    ],
)
def test_required_columns_set_equality_differential(
    spark, cols, required, expect_error
):
    """validate.py:159-172 errs on SET inequality — extra columns too, not
    just missing ones — vs schema_matches_exactly."""
    from iatlas_cbioportal_export_spark.operators.validation import (
        schema_matches_exactly,
    )

    pdf = pd.DataFrame({c: [1] for c in cols})
    logger = mock.Mock()
    ref_val.validate_that_required_columns_are_present(
        pdf, "f.txt", list(required), logger=logger
    )
    assert logger.error.called == expect_error

    (row,) = schema_matches_exactly(
        spark.createDataFrame(pdf), list(required)
    ).collect()
    assert (row["status"] != "OK") == expect_error


@pytest.mark.parametrize(
    "inp,out,errors",
    [
        ([10, 20, 20], [10, 20], {"rows"}),           # unequal rows
        ([10, 10, 30], [10, 10, 30], {"dups"}),       # output duplicates
        ([10, 23, 30], [10, 20, 30], {"barcodes"}),   # key sets differ
        ([10, 20, 30], [10, 20, 30], set()),          # clean
    ],
    ids=["unequal_rows", "dups", "barcode_mismatch", "clean"],
)
def test_validate_export_files_differential(spark, inp, out, errors):
    """maf.py:219-247's three export checks (row counts, whole-row dups,
    barcode key-set equality — the reference's own test cases verbatim,
    tests/test_maf.py:98-121) vs our V2/V9/V13 findings operators."""
    from iatlas_cbioportal_export_spark.operators.validation import (
        count_equality,
        keyset_preserved,
        no_duplicate_rows,
    )

    in_pdf = pd.DataFrame({"Tumor_Sample_Barcode": inp})
    out_pdf = pd.DataFrame({"Tumor_Sample_Barcode": out})
    logger = mock.Mock()
    ref_maf.validate_export_files(in_pdf, out_pdf, logger=logger)
    msgs = " ".join(str(c.args[0]) for c in logger.error.call_args_list)
    assert ("not equal to input rows" in msgs) == ("rows" in errors)
    assert ("duplicates in the output" in msgs) == ("dups" in errors)
    assert ("Tumor_Sample_Barcode values are not equal" in msgs) == (
        "barcodes" in errors
    )

    sin = spark.createDataFrame(in_pdf)
    sout = spark.createDataFrame(out_pdf)
    findings = {
        "rows": count_equality(sin, sout).collect()[0],
        "dups": no_duplicate_rows(sout).collect()[0],
        "barcodes": keyset_preserved(
            sout, "Tumor_Sample_Barcode", sin, "Tumor_Sample_Barcode"
        ).collect()[0],
    }
    for key, row in findings.items():
        assert (row["status"] != "OK") == (key in errors), key


def test_error_report_assembly_differential(spark, tmp_path):
    """maf.py:133-178 (``concatenate_mafs``): the reference's failed-row
    error-report assembly — per-chunk annotated + error TSVs concatenated,
    the annotated side chrM-postprocessed, the error side passed through
    UNfiltered — vs our one-DAG equivalent (``split_annotation_errors`` +
    ``drop_chrm`` over a single unioned frame). Whole-frame equality on
    BOTH outputs, with planted failures, a chrM row (must vanish from the
    annotated side only), float/NaN columns, and a chunk-2-only error
    column (pins pd.concat's outer column alignment)."""
    import os

    from iatlas_cbioportal_export_spark.operators.maf import (
        drop_chrm,
        split_annotation_errors,
    )

    datahub = tmp_path / "datahub"
    ds_dir = datahub / "add-clinical-header" / "DSX"
    os.makedirs(ds_dir)

    ann_chunks = [
        pd.DataFrame(
            {
                "Tumor_Sample_Barcode": ["s1", "s2", "s3"],
                "Chromosome": ["chr1", "chrM", "chr2"],
                "Start_Position": [100, 200, 300],
                "t_alt_count": [12.0, 7.5, np.nan],
                "Annotation_Status": ["SUCCESS"] * 3,
            }
        ),
        pd.DataFrame(
            {
                "Tumor_Sample_Barcode": ["s4", "s5"],
                "Chromosome": ["chr3", "chrX"],
                "Start_Position": [400, 500],
                "t_alt_count": [3.0, 4.25],
                "Annotation_Status": ["SUCCESS"] * 2,
            }
        ),
    ]
    err_chunks = [
        pd.DataFrame(
            {
                "Tumor_Sample_Barcode": ["e1"],
                "Chromosome": ["chr9"],
                "Start_Position": [900],
                "Failure_Reason": ["no genome nexus response"],
            }
        ),
        pd.DataFrame(
            {
                "Tumor_Sample_Barcode": ["e2", "e3"],
                "Chromosome": ["chrM", "chr11"],
                "Start_Position": [910, 920],
                "Failure_Reason": ["timeout", "bad allele"],
                "Attempts": [3, 1],  # chunk-2-only column
            }
        ),
    ]
    for i, (a, e) in enumerate(zip(ann_chunks, err_chunks), start=1):
        a.to_csv(
            ds_dir / f"data_mutations_annotated_{i}.txt", sep="\t", index=False
        )
        e.to_csv(
            ds_dir / f"data_mutations_error_report_{i}.txt", sep="\t", index=False
        )

    out = ref_maf.concatenate_mafs("DSX", 2, str(datahub))
    exp_ok = ref_maf.postprocessing(out["annotated_maf"])
    exp_err = out["error_maf"]

    # engine: ONE frame — annotated rows SUCCESS, planted failures FAILED —
    # split into the two side-bands, chrM dropped from the ok side only
    eng_ann = pd.concat(ann_chunks)
    eng_err = pd.concat(err_chunks)
    eng_err["Annotation_Status"] = "FAILED"
    unioned = spark.createDataFrame(eng_ann).unionByName(
        spark.createDataFrame(eng_err), allowMissingColumns=True
    )
    ok, failed = split_annotation_errors(unioned)
    ok = drop_chrm(ok)

    got_ok = ok.select(*exp_ok.columns).toPandas()
    sort = ["Tumor_Sample_Barcode"]
    assert_frame_equal(
        exp_ok.sort_values(sort).reset_index(drop=True),
        got_ok.sort_values(sort).reset_index(drop=True),
        check_dtype=False,
    )
    got_err = failed.select(*exp_err.columns).toPandas()
    assert_frame_equal(
        exp_err.sort_values(sort).reset_index(drop=True),
        got_err.sort_values(sort).reset_index(drop=True),
        check_dtype=False,
    )
    # the written artifacts exist and the error report kept EVERY failure
    # (including the chrM one — postprocessing must not touch the error side)
    assert (ds_dir / "data_mutations_error_report.txt").exists()
    assert len(exp_err) == 3 and "chrM" in set(exp_err["Chromosome"])
