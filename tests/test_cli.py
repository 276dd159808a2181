"""CLI surface: the reference's four entry points driven end-to-end on tiny
TSV inputs (clinical → bundle → validate → load)."""

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
    (maf_dir / "x.maf").write_text(
        "#version\n"
        "Hugo_Symbol\tChromosome\tStart_Position\tTumor_Sample_Barcode\n"
        "TP53\tchr17\t100\ts1\n"
        "KRAS\tchrM\t200\ts2\n"
    )
    return clinical, oncotree, codes, maf_dir


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
