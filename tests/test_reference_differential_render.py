"""Reference-differential tests for the RENDERING layer: the reference's
case-list writer output compared BYTE-FOR-BYTE against ours, plus the
all-NA column pruning used before the clinical header step."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from iatlas_cbioportal_export_spark.operators.projections import (
    prune_all_null_columns,
)
from iatlas_cbioportal_export_spark.sources.sinks import render_case_list_text
from tests.test_reference_differential import _load_reference_clinical

ref = _load_reference_clinical()
from tests import test_reference_differential as _refmod

pytestmark = pytest.mark.skipif(ref is None, reason=_refmod.skip_reason)

EDGE_CANCER_TYPES = [
    "Melanoma",
    "Lung, NOS",          # comma removed in slug
    "Head/Neck Cancer",   # slash and spaces
    "",                   # displays as NA, slug no_oncotree_code
    "NA",                 # slug no_oncotree_code, name keeps NA
    "N A",                # slug N_A (NOT no_oncotree_code: check is post-replace)
]


@pytest.mark.parametrize("cancer_type", EDGE_CANCER_TYPES)
def test_case_list_text_byte_identical(tmp_path, cancer_type):
    """clinical.py:683-718 vs render_case_list_text: same filename, same
    bytes, incl. the empty/NA/slug edge family and the no-trailing-newline
    template."""
    ids = ["S1", "S2", "S10"]
    ref_path = ref.write_single_oncotree_case_list(
        cancer_type, ids, "iatlas_demo", str(tmp_path)
    )
    ref_bytes = open(ref_path, "rb").read()
    slug, text = render_case_list_text("iatlas_demo", cancer_type, ids)
    import os

    assert os.path.basename(ref_path) == f"cases_{slug}.txt"
    assert text.encode() == ref_bytes


def test_case_list_files_from_clinical_tsv(tmp_path):
    """End-to-end: the reference's create_case_lists over a clinical TSV vs
    our renderer over the same (cancer_type → ids) map — same file set,
    same bytes. Reference grouping preserves first-seen order and ours
    sorts ids; the fixture uses pre-sorted ids per group so the comparison
    pins the TEXT, not the (irrelevant) id order."""
    clin = tmp_path / "data_clinical_merged.txt"
    clin.write_text(
        "SAMPLE_ID\tCANCER_TYPE\n"
        "S1\tMelanoma\n"
        "S2\tLung, NOS\n"
        "S3\tMelanoma\n"
        "S4\t\n"
    )
    out_ref = tmp_path / "ref_lists"
    ref.create_case_lists(str(clin), str(out_ref), "iatlas_demo")

    groups = {}
    for line in clin.read_text().splitlines()[1:]:
        sid, ct = line.split("\t")
        groups.setdefault(ct, []).append(sid)
    out_ours = tmp_path / "our_lists"
    out_ours.mkdir()
    for ct, ids in groups.items():
        slug, text = render_case_list_text("iatlas_demo", ct, ids)
        (out_ours / f"cases_{slug}.txt").write_text(text)

    ref_files = {p.name: p.read_bytes() for p in out_ref.iterdir()}
    our_files = {p.name: p.read_bytes() for p in out_ours.iterdir()}
    assert ref_files == our_files


def test_all_na_column_prune_differential(spark):
    """clinical.py:538-547 get_all_non_na_columns vs prune_all_null_columns:
    the same surviving column set (order preserved)."""
    pdf = pd.DataFrame(
        {
            "KEEP1": [1.0, np.nan, 3.0],
            "DROP_ALL_NAN": [np.nan, np.nan, np.nan],
            "KEEP2": [None, "x", None],
            "DROP_ALL_NONE": [None, None, None],
            "KEEP3": ["", "", ""],  # empty strings are NOT NA
        }
    )
    exp_cols = ref.get_all_non_na_columns(pdf)
    got = prune_all_null_columns(spark.createDataFrame(pdf))
    assert got.columns == exp_cols


def test_meta_study_byte_identical(tmp_path):
    """clinical.py:645-656's native meta_study.txt vs our bundle writer's
    — same bytes (the reference's preceding subprocess call is check=False
    against a missing tool, so the native tail still runs)."""
    from iatlas_cbioportal_export_spark.sources.sinks import render_meta_file

    (tmp_path / "add-clinical-header" / "ds").mkdir(parents=True)
    ref.generate_meta_files("ds", str(tmp_path))
    ref_bytes = (
        tmp_path / "add-clinical-header" / "ds" / "meta_study.txt"
    ).read_bytes()
    ours = render_meta_file(
        {
            "cancer_study_identifier": "iatlas_ds",
            "type_of_cancer": "mixed",
            "name": "TBD",
            "pmid": "29033130",
            "reference_genome": "hg38",
            "citation": "PLACEHOLDER",
            "description": "PLACEHOLDER",
        }
    )
    assert ours.encode() == ref_bytes


def test_remove_pandas_float_differential(spark):
    """utils.py:133-153 vs tsv_text_remove_pandas_float: identical TSV
    text, INCLUDING the blunt textual edges — integral floats stripped,
    fractional kept, a string cell ending in '.0' clipped at a field
    boundary, NaN rendered empty — with and without header."""
    import importlib

    utils = importlib.import_module("utils")
    pdf = pd.DataFrame(
        {
            "ID": ["a", "b", "c", "d"],
            "MIXED": [1.0, 2.5, np.nan, 100.0],
            "COUNT": [7, 8, 9, 10],
            "NOTE": ["v1.0", "plain", "x.0", "dot.0.mid"],
            "FLAG": [True, False, True, False],
        }
    )
    sdf = spark.createDataFrame(pdf)
    from iatlas_cbioportal_export_spark.sources.sinks import (
        tsv_text_remove_pandas_float,
    )

    for header in (True, False):
        exp = utils.remove_pandas_float(pdf, header=header)
        got = tsv_text_remove_pandas_float(sdf, header=header)
        assert got == exp, f"header={header}"
